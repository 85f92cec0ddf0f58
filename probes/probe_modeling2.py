"""TPU probe: dynamic-chunk modeling latency + segmentation precision split.

Measures (full arch, 6OIM pocket):
  * trunk-only latency (f32)
  * one 16-hotspot segmentation chunk at tensorfloat32 (new default) and f32
  * projected + measured create_density_maps latency for n kept hotspots
  * numeric deviation of the density maps tf32 vs f32
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
    print(f"{label}: {med * 1e3:.0f} ms (runs: {[f'{e*1e3:.0f}' for e in est]})", flush=True)
    return med


pm = PharmacoNet(weight_path=None, verbose=False)  # mixed default
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

trunk_t = measure(lambda: pm._device_program(*base_args, with_segmentation=False), "trunk f32")

out = pm._device_program(*base_args, with_segmentation=False)
rng = np.random.default_rng(0)
n_tok = int(np.asarray(data.token_valid).sum())
chunk = pm.segmentation_chunk


def seg_slab(module, k):
    idx = jnp.asarray(rng.integers(0, n_tok, k).astype(np.int32))
    args = (
        tuple(out["pyramid"]),
        out["protein_mask"],
        out["cavity_narrow"],
        jnp.asarray(data.tokens)[idx],
        out["token_features"][idx],
        jnp.ones(k, dtype=bool),
    )
    return lambda: module._segmentation_program(*args)


t_chunk = measure(seg_slab(pm, chunk), f"seg chunk {chunk} tf32")
t_slab = measure(seg_slab(pm, 128), "seg slab 128 tf32")

pm_f32 = PharmacoNet(weight_path=None, verbose=False, segmentation_precision="float32")
t_chunk32 = measure(seg_slab(pm_f32, chunk), f"seg chunk {chunk} f32")

for n in (16, 32, 64, 128):
    proj = trunk_t + (-(-n // chunk)) * t_chunk
    print(f"projected modeling latency, {n} hotspots: {proj * 1e3:.0f} ms", flush=True)

# numeric deviation tf32 vs f32 on one chunk (same tokens/features)
idx = jnp.asarray(rng.integers(0, n_tok, chunk).astype(np.int32))
args = (
    tuple(out["pyramid"]),
    out["protein_mask"],
    out["cavity_narrow"],
    jnp.asarray(data.tokens)[idx],
    out["token_features"][idx],
    jnp.ones(chunk, dtype=bool),
)
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
