"""TPU probe: opt-in bfloat16 mask decoder — chunk latency vs tf32/f32
and thresholded-voxel deviation.

Motivation: probe_conv_ladder.py showed the decoder's 64^3 conv runs at
98.6% of the achievable (lane-capped) MXU rate under XLA — the conv is
closed at the f32/tf32 contract, and the only remaining lever is
precision itself (bf16 single-pass peak is 3x the 3-pass rate). bf16
changes numerics (7-bit mantissa vs tf32's 10), so it ships strictly as
an opt-in (--segmentation_precision bfloat16) with this probe
quantifying the deviation on the standard 6OIM pocket.
"""

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


def measure(fn, label, reps=5):
    force(fn())
    est = []
    for _ in range(reps):
        t0 = time.time()
        force(fn())
        est.append(time.time() - t0)
    med = statistics.median(est)
    print(f"{label}: {med * 1e3:.0f} ms", flush=True)
    return med


pms = {
    p: PharmacoNet(weight_path=None, verbose=False, segmentation_precision=p)
    for p in ("float32", "tensorfloat32", "bfloat16")
}
pm = pms["tensorfloat32"]
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

times = {
    p: measure(lambda p=p: pms[p]._segmentation_program(*args),
               f"seg chunk {chunk} {p}")
    for p in ("float32", "tensorfloat32", "bfloat16")
}
print(f"bf16 speedup vs tf32: {times['tensorfloat32'] / times['bfloat16']:.2f}x, "
      f"vs f32: {times['float32'] / times['bfloat16']:.2f}x", flush=True)

d_f32 = np.asarray(pms["float32"]._segmentation_program(*args))
for p in ("tensorfloat32", "bfloat16"):
    d = np.asarray(pms[p]._segmentation_program(*args))
    diff = np.abs(d - d_f32)
    denom = max(np.abs(d_f32).max(), 1e-9)
    flips = int(np.sum((d > 0) != (d_f32 > 0)))
    total_on = int(np.sum(d_f32 > 0))
    print(
        f"density deviation {p} vs f32: max abs {diff.max():.3e} "
        f"(rel {diff.max() / denom:.2e}), voxel flips {flips}/{d_f32.size} "
        f"(on-voxels {total_on})",
        flush=True,
    )
print("done", flush=True)
