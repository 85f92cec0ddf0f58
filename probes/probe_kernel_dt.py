"""dt-precomputed fused kernel vs production (tile-store path).

PERF_NOTES round-2 ablation: the one-hot build + MXU select cost ~0.7
ms/batch of the 1.86-2.0 ms fused kernel ("nohot 1.12"). For the TILE
STORE path the distances those ops reconstruct are a pure function of
(model, ligand) — both fixed at prepack time — so tile stores can carry
a precomputed dt [T, C, tile] stream (+16 KB/tile HBM, ~+12% traffic)
and skip the build entirely (ops/screen_pallas.score_tiles_fused_dt).

This probe equality-checks the dt kernel against the production fused
kernel on the production tiled batch, then measures both with the
5-point unroll-slope fit (PERF_NOTES "measurement correction").
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

from bench import make_synthetic_ligands, make_synthetic_model

from pharmaconet_tpu.ops.screen_pallas import (
    score_tiles_fused,
    score_tiles_fused_dt,
)
from pharmaconet_tpu.scoring.batch_screen import BatchScreener
from pharmaconet_tpu.scoring.screen_tiles import tile_distances
from pharmaconet_tpu.scoring.tiled_pack import build_tiled_batch

print(f"device: {jax.devices()[0]}", flush=True)

model = make_synthetic_model()
s = BatchScreener(model)
ligs = make_synthetic_ligands(2048)
tb = build_tiled_batch(s.packed_model, ligs, threads=1)
print(
    f"tiles={tb.gtab.shape[0]} nst={tb.nst} d1={tb.depth1} d2={tb.depth2}",
    flush=True,
)

t0 = time.time()
dt_np = tile_distances(tb.pos_blocks, tb.uv)
print(f"host tile_distances: {time.time() - t0:.3f}s (prepack-time cost)", flush=True)

pos = jnp.asarray(tb.pos_blocks)
uv = jnp.asarray(tb.uv)
gtab = jnp.asarray(tb.gtab)
aux = jnp.asarray(tb.aux)
dt = jnp.asarray(dt_np)
D1, D2 = tb.depth1, tb.depth2

base = np.asarray(score_tiles_fused(pos, uv, gtab, aux, D1, D2))
got = np.asarray(score_tiles_fused_dt(dt, gtab, aux, D1, D2))
diff = float(np.max(np.abs(got - base)))
print(f"equality: max|diff|={diff:.2e} (ulp-level: XLA FMA-fuses the "
      "3-square sum, the host precompute cannot)", flush=True)
np.testing.assert_allclose(got, base, rtol=2e-5, atol=1e-4)


def slope(call, args, label):
    def make(k):
        @jax.jit
        def f(*a):
            acc = jnp.zeros((), jnp.float32)
            for i in range(k):
                out = call(*((a[0] + jnp.float32(i) * 1e-6,) + a[1:]))
                acc = acc + out[0, 0]
            return acc

        return f

    ks = (4, 8, 16, 32, 64)
    fs = {k: make(k) for k in ks}
    for f in fs.values():
        float(f(*args))
    rows = []
    for k, f in fs.items():
        ts = []
        for _ in range(5):
            t0 = time.time()
            float(f(*args))
            ts.append(time.time() - t0)
        rows.append((k, statistics.median(ts)))
    kk = np.array([k for k, _ in rows], float)
    tt = np.array([t for _, t in rows])
    A = np.vstack([kk, np.ones_like(kk)]).T
    sl, icept = np.linalg.lstsq(A, tt, rcond=None)[0]
    print(
        f"{label}: {sl * 1e3:.2f} ms/batch (+{icept * 1e3:.0f} fixed) -> "
        f"{2048 / sl:,.0f} lig/s/chip",
        flush=True,
    )
    return sl


full = slope(
    lambda p, u, g, a: score_tiles_fused(p, u, g, a, D1, D2),
    (pos, uv, gtab, aux), "full (one-hot)"
)
dtk = slope(
    lambda d, g, a: score_tiles_fused_dt(d, g, a, D1, D2),
    (dt, gtab, aux), "dt-precomputed"
)
print(f"speedup: {full / dtk:.2f}x", flush=True)
print("done", flush=True)
