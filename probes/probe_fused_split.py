"""TPU probe: where does the fused screening kernel's 1.35 ms go?

Ablations of _fused_kernel_v2, timed with the marginal-unroll method
(unroll 8 vs 16) on the production 2048-ligand tiled batch:
  full        — production kernel
  noscan      — gaussian phase only (scores written, scans+fail skipped)
  noexp       — full, with exp(x) replaced by x (VPU transcendental cost)
  nohot       — full, with the one-hot MXU selection replaced by a
                constant positions row (selection cost)
"""

from __future__ import annotations

import functools
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

sys.path.insert(0, "/root/repo/tests")

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
        mninv, mnhalf, gate, thr, selff = a[2:3, :], a[3:4, :], a[4:5, :], a[5:6, :], a[6:7, :]
        u = packed // CAP
        v = packed % CAP
        if mode == "nohot":
            pu = jnp.broadcast_to(posv[:, 0:1], (THREEC, TILE))
            pv = jnp.broadcast_to(posv[:, 1:2], (THREEC, TILE))
        else:
            iota = jax.lax.broadcasted_iota(jnp.int32, (CAP, TILE), 0)
            oh_u = (iota == u[None, :]).astype(jnp.float32)
            oh_v = (iota == v[None, :]).astype(jnp.float32)
            pu = jnp.dot(posv, oh_u, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
            pv = jnp.dot(posv, oh_v, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        dvec = pu - pv
        d2 = jnp.sum((dvec * dvec).reshape(C, 3, TILE), axis=1)
        dt = jnp.sqrt(d2)
        scores = jnp.zeros((C, TILE), jnp.float32)
        npass = jnp.zeros((C, TILE), jnp.float32)
        for p in range(BLOCK_P):
            x = (dt - mu[p : p + 1, :]) * inv[p : p + 1, :]
            x2 = x * x
            w = winv[p : p + 1, :]
            valid = w > 0.0
            e = x2 if mode == "noexp" else jnp.exp(-0.5 * x2)
            scores = scores + jnp.where(valid, w * e, 0.0)
            npass = npass + jnp.where(valid & (x2 < 4.0), 1.0, 0.0)
        if mode == "noscan":
            out_ref[:, :] = scores + npass
            return
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)
        sb = sp._scan_bounded_tile(jnp.concatenate([scores, npass], axis=0), fb, D1, lanes)
        scan_s, scan_p = sb[:C], sb[C:]
        block_score = scan_s * mninv
        block_fail = jnp.where(scan_p < mnhalf, gate, 0.0)
        pb = sp._scan_bounded_tile(jnp.concatenate([block_score, block_fail], axis=0), fp, D2, lanes)
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
    call = pl.pallas_call(
        body, out_shape=jax.ShapeDtypeStruct((C, T * TILE), jnp.float32),
        grid_spec=grid_spec,
    )
    return call


def timed_unroll(call, label):
    def make(k):
        @jax.jit
        def f(pos, uv3, gtab, aux):
            acc = jnp.zeros((), jnp.float32)
            x = uv3
            for i in range(k):
                out = call(pos, (x + i) % (CAP * CAP), gtab, aux)
                acc = acc + out[0, 0]
            return acc
        return f

    uv3 = uv.reshape(T, 1, TILE)
    f8, f16 = make(8), make(16)
    float(f8(pos, uv3, gtab, aux))
    float(f16(pos, uv3, gtab, aux))

    def run(f):
        ts = []
        for _ in range(5):
            t0 = time.time()
            float(f(pos, uv3, gtab, aux))
            ts.append(time.time() - t0)
        return statistics.median(ts)

    t8, t16 = run(f8), run(f16)
    per = (t16 - t8) / 8
    print(f"{label}: {per * 1e3:.2f} ms/batch (unroll8 {t8 * 1e3:.0f} ms, unroll16 {t16 * 1e3:.0f} ms)", flush=True)
    return per


for mode in ("full", "noscan", "noexp", "nohot"):
    timed_unroll(make_kernel(mode), mode)
print("done", flush=True)
