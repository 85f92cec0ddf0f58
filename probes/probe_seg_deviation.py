"""TPU probe: mask-decoder tf32-vs-f32 numeric deviation + f32 chunk timing."""

from __future__ import annotations

import statistics
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from pharmaconet_tpu.module import PharmacoNet

print(f"device: {jax.devices()[0]}", flush=True)


def force(out):
    return float(sum(jnp.sum(o) for o in jax.tree.leaves(out) if o.dtype != bool))


def measure(fn, label, reps=3):
    force(fn())
    est = []
    for _ in range(reps):
        t0 = time.time()
        force(fn())
        est.append(time.time() - t0)
    med = statistics.median(est)
    print(f"{label}: {med * 1e3:.0f} ms", flush=True)
    return med


pm = PharmacoNet(weight_path=None, verbose=False)
pm_f32 = PharmacoNet(weight_path=None, verbose=False, segmentation_precision="float32")
data = pm.parse(
    "/root/reference/examples/6OIM_protein.pdb",
    "/root/reference/examples/6OIM_D_MOV.pdb",
)
base_args = (
    jnp.asarray(data.atom_positions),
    jnp.asarray(data.atom_features),
    jnp.asarray(data.atom_valid),
    jnp.asarray(data.tokens),
    jnp.asarray(data.token_valid),
    jnp.asarray(data.center),
)
out = pm._device_program(*base_args, with_segmentation=False)
rng = np.random.default_rng(0)
n_tok = int(np.asarray(data.token_valid).sum())
chunk = pm.segmentation_chunk

idx = jnp.asarray(rng.integers(0, n_tok, chunk).astype(np.int32))
args = (
    tuple(out["pyramid"]),
    out["protein_mask"],
    out["cavity_narrow"],
    jnp.asarray(data.tokens)[idx],
    out["token_features"][idx],
    jnp.ones(chunk, dtype=bool),
)

measure(lambda: pm_f32._segmentation_program(*args), f"seg chunk {chunk} f32")

d_mixed = np.asarray(pm._segmentation_program(*args))
d_f32 = np.asarray(pm_f32._segmentation_program(*args))
diff = np.abs(d_mixed - d_f32)
denom = max(np.abs(d_f32).max(), 1e-9)
flips = int(np.sum((d_mixed > 0) != (d_f32 > 0)))
total_on = int(np.sum(d_f32 > 0))
print(
    f"density deviation tf32 vs f32: max abs {diff.max():.3e} "
    f"(rel {diff.max() / denom:.2e}), voxel flips {flips}/{d_f32.size} "
    f"(on-voxels {total_on})",
    flush=True,
)
print("done", flush=True)
