"""Round-3 kernel experiments on the fused screening kernel.

PERF_NOTES round-2 ablations: full 1.86 / noscan 0.93 / nohot 1.12 ms —
the one-hot build (~0.7 ms) and the scans (~0.9 ms) are the remaining
cost above the 0.29 ms HBM floor. Two bounded experiments:

  ohbf16 — build the signed one-hot in bf16 (half the vreg traffic of the
           f32 build) and feed the MXU mixed bf16xf32 at HIGHEST. The
           selection stays exact: +-1 is exact in bf16 and the f32
           positions' bf16 splits are exact at HIGHEST.
  b4d    — skip the [P*c, tile] concat materialization of mu/inv/winv
           (96+ vreg copies/tile): compute the gaussian block broadcast
           as [P, c, tile] 3-D ops directly.

Each variant is equality-checked against the production kernel before it
is timed (unroll-slope fit, {4,16,64}).
"""

from __future__ import annotations

import statistics
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

from bench import make_synthetic_ligands, make_synthetic_model

from pharmaconet_tpu.ops import screen_pallas as sp
from pharmaconet_tpu.scoring.batch_screen import BatchScreener
from pharmaconet_tpu.scoring.tiled_pack import build_tiled_batch

print(f"device: {jax.devices()[0]}", flush=True)

model = make_synthetic_model()
s = BatchScreener(model)
ligs = make_synthetic_ligands(2048)
tb = build_tiled_batch(s.packed_model, ligs, threads=1)
print(f"tiles={tb.gtab.shape[0]} nst={tb.nst} d1={tb.depth1} d2={tb.depth2}", flush=True)

pos = jnp.asarray(tb.pos_blocks)
uv = jnp.asarray(tb.uv)
gtab = jnp.asarray(tb.gtab)
aux = jnp.asarray(tb.aux)
T, THREEC, CAP = tb.pos_blocks.shape
C = THREEC // 3
TILE = tb.uv.shape[1]
D1, D2 = tb.depth1, tb.depth2
BLOCK_P = sp.BLOCK_P


def make_kernel(mode):
    def body(pos_ref, uv_ref, g_ref, aux_ref, out_ref):
        g = g_ref[0]
        a = aux_ref[0]
        packed = uv_ref[0, 0, :]
        posv = pos_ref[0]
        mu, inv, winv = g[0], g[1], g[2]
        fb, fp = a[0:1, :], a[1:2, :]
        mninv, mnhalf, gate, thr, selff = (
            a[2:3, :], a[3:4, :], a[4:5, :], a[5:6, :], a[6:7, :]
        )
        u = packed // CAP
        v = packed % CAP
        iota = jax.lax.broadcasted_iota(jnp.int32, (CAP, TILE), 0)
        if "ohbf16" in mode:
            oh = (iota == u[None, :]).astype(jnp.bfloat16) - (
                iota == v[None, :]
            ).astype(jnp.bfloat16)
        else:
            oh = (iota == u[None, :]).astype(jnp.float32) - (
                iota == v[None, :]
            ).astype(jnp.float32)
        dvec = jnp.dot(posv, oh, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        d2 = jnp.sum((dvec * dvec).reshape(C, 3, TILE), axis=1)
        dt = jnp.sqrt(d2)
        if "b4d" in mode:
            x = (dt[None, :, :] - mu[:, None, :]) * inv[:, None, :]
            x2 = x * x
            w3 = winv[:, None, :]
            valid = w3 > 0.0
            term = jnp.where(valid, w3 * jnp.exp(-0.5 * x2), 0.0)
            hit = jnp.where(valid & (x2 < 4.0), 1.0, 0.0)
            scores = jnp.sum(term, axis=0)
            npass = jnp.sum(hit, axis=0)
        else:
            dt_b = jnp.concatenate([dt] * BLOCK_P, axis=0)
            mu_b = jnp.concatenate([mu[:, None, :]] * C, axis=1).reshape(
                BLOCK_P * C, TILE
            )
            inv_b = jnp.concatenate([inv[:, None, :]] * C, axis=1).reshape(
                BLOCK_P * C, TILE
            )
            winv_b = jnp.concatenate([winv[:, None, :]] * C, axis=1).reshape(
                BLOCK_P * C, TILE
            )
            x = (dt_b - mu_b) * inv_b
            x2 = x * x
            valid = winv_b > 0.0
            term = jnp.where(valid, winv_b * jnp.exp(-0.5 * x2), 0.0)
            hit = jnp.where(valid & (x2 < 4.0), 1.0, 0.0)
            scores = jnp.sum(term.reshape(BLOCK_P, C, TILE), axis=0)
            npass = jnp.sum(hit.reshape(BLOCK_P, C, TILE), axis=0)
        stacked = jnp.concatenate([scores, npass], axis=0)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)
        sb = sp._scan_bounded_tile(stacked, fb, D1, lanes)
        scan_s, scan_p = sb[:C], sb[C:]
        block_score = scan_s * mninv
        block_fail = jnp.where(scan_p < mnhalf, gate, 0.0)
        pb = sp._scan_bounded_tile(
            jnp.concatenate([block_score, block_fail], axis=0), fp, D2, lanes
        )
        pair_score, pair_fail = pb[:C], pb[C:]
        failed = pair_fail > thr
        out_ref[:, :] = jnp.where(failed & (selff == 0.0), -1.0, pair_score)

    grid_spec = pl.GridSpec(
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, THREEC, CAP), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, BLOCK_P, TILE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 7, TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        body, out_shape=jax.ShapeDtypeStruct((C, T * TILE), jnp.float32),
        grid_spec=grid_spec,
    )


uv3 = uv.reshape(T, 1, TILE)
base = np.asarray(make_kernel("full")(pos, uv3, gtab, aux))


def slope(call, label):
    def make(k):
        @jax.jit
        def f(pos, uv3, gtab, aux):
            acc = jnp.zeros((), jnp.float32)
            for i in range(k):
                out = call(pos + jnp.float32(i) * 1e-6, uv3, gtab, aux)
                acc = acc + out[0, 0]
            return acc
        return f

    got = np.asarray(call(pos, uv3, gtab, aux))
    diff = float(np.max(np.abs(got - base)))
    fs = {k: make(k) for k in (4, 16, 64)}
    for f in fs.values():
        float(f(pos, uv3, gtab, aux))
    row = []
    for k, f in fs.items():
        ts = []
        for _ in range(5):
            t0 = time.time()
            float(f(pos, uv3, gtab, aux))
            ts.append(time.time() - t0)
        row.append((k, statistics.median(ts)))
    ks = np.array([k for k, _ in row], float)
    ts = np.array([t for _, t in row])
    A = np.vstack([ks, np.ones_like(ks)]).T
    sl, icept = np.linalg.lstsq(A, ts, rcond=None)[0]
    print(f"{label}: {sl * 1e3:.2f} ms/batch (+{icept * 1e3:.0f} fixed) "
          f"max|diff|={diff:.2e}", flush=True)


for mode in ("full", "b4d"):
    slope(make_kernel(mode), mode)
print("done", flush=True)
