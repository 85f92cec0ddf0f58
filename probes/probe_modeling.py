"""TPU probe: modeling-program stage split at float32 (full arch).

Times: full fused program, trunk-only (with_segmentation=False), the
segmentation slab alone, and a bare 3x3x3 conv microbench to see XLA's
effective f32 FLOP rate at 96 channels.
"""

from __future__ import annotations

import statistics
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from pharmaconet_tpu.module import PharmacoNet

print(f"device: {jax.devices()[0]}", flush=True)

pm = PharmacoNet(weight_path=None, verbose=False, matmul_precision="float32")
data = pm.parse(
    "/root/reference/examples/6OIM_protein.pdb",
    "/root/reference/examples/6OIM_D_MOV.pdb",
)
print(f"atoms={data.atom_valid.sum()} tokens={data.token_valid.sum()}", flush=True)

base_args = (
    jnp.asarray(data.atom_positions),
    jnp.asarray(data.atom_features),
    jnp.asarray(data.atom_valid),
    jnp.asarray(data.tokens),
    jnp.asarray(data.token_valid),
    jnp.asarray(data.center),
)


def measure(fn, args, label, reps=3):
    # warm (compile)
    out = fn(*args)
    s = jax.tree.leaves(out)[0]
    _ = np.asarray(jnp.sum(s))
    est = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        total = sum(jnp.sum(leaf) for leaf in jax.tree.leaves(out) if leaf.dtype != bool)
        _ = float(total)
        est.append(time.time() - t0)
    med = statistics.median(est)
    print(f"{label}: {med * 1e3:.0f} ms (runs: {[f'{e*1e3:.0f}' for e in est]})", flush=True)
    return med


def full(*a):
    return pm._device_program(*a, with_segmentation=True)


def trunk(*a):
    return pm._device_program(*a, with_segmentation=False)


measure(full, base_args, "full f32 (128 hotspots)")
measure(trunk, base_args, "trunk only f32")

# segmentation slab alone, reusing a trunk run's tensors
out = trunk(*base_args)
k = pm.max_hotspots
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, int(np.asarray(data.token_valid).sum()), k).astype(np.int32))
seg_args = (
    tuple(out["pyramid"]),
    out["protein_mask"],
    out["cavity_narrow"],
    jnp.asarray(data.tokens)[idx],
    out["token_features"][idx],
    jnp.ones(k, dtype=bool),
)
measure(lambda *a: pm._segmentation_program(*a), seg_args, "segmentation slab f32 (128)")

# conv microbench: the mask-head 64^3 FPN conv shape, batch 16 (one chunk)
from flax import linen as nn

conv = nn.Conv(96, kernel_size=(3, 3, 3), padding="SAME")
x = jnp.asarray(rng.normal(0, 1, (16, 64, 64, 64, 96)).astype(np.float32))
params = conv.init(jax.random.PRNGKey(0), x)


@jax.jit
def conv_run(p, x):
    with jax.default_matmul_precision("float32"):
        return conv.apply(p, x)


t = measure(conv_run, (params, x), "bare 3^3 conv 96->96 @64^3 x16 f32")
flops = 2 * 27 * 96 * 96 * (64**3) * 16
print(f"  -> effective {flops / t / 1e12:.1f} TFLOP/s", flush=True)


@jax.jit
def conv_run_bf16(p, x):
    with jax.default_matmul_precision("bfloat16"):
        return conv.apply(p, x)


t = measure(conv_run_bf16, (params, x), "bare conv bf16-precision")
print(f"  -> effective {flops / t / 1e12:.1f} TFLOP/s", flush=True)
print("done", flush=True)
