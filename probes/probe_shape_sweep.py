"""Shape-sensitivity sweep of the stored screening path (VERDICT r4 #2).

All perf headlines previously rode ONE synthetic model shape (20
clusters / ~40 nodes). This probe measures the stored leaf path across
model sizes and conformer (t-scale) settings, on the real chip:

  model clusters in {4, 10, 20, 40}  x  conformers in {4, 8}

For each config it reports
  - store stats (tiles T, bucket specs or single caps, gathered window
    slots, outlier ligands)
  - the device leaf-chain marginal (ms/2048-batch and lig/s/chip), via
    the paired-unroll estimator (PERF_NOTES "measuring through the relay")
  - the host tail (load + dispatch prep + outlier DFS) ms/batch

PROBE_LEAF_LAYOUT=single sweeps the one-cap layout instead (the round-4
baseline for comparison).

Usage: python probes/probe_shape_sweep.py [batch_size] [iters]
Writes nothing; paste the table into PERF_NOTES.
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from bench import make_synthetic_ligands, make_synthetic_model
from pharmaconet_tpu.scoring.batch_screen import BatchScreener
from pharmaconet_tpu.scoring.leaf_tree import (
    leaf2_scores_device,
    leaf2_scores_multi,
)
from pharmaconet_tpu.scoring.tiled_store import TiledStore, write_v3_store

LAYOUT = os.environ.get("PROBE_LEAF_LAYOUT", "buckets")


def measure_chain(sb, iters: int) -> float:
    from pharmaconet_tpu.ops.screen_pallas import score_tiles_v3_rows

    depth, mn_cap, g_cap = sb.depth, sb.mn_cap, sb.g_cap
    dt, gid, tab, aux = (
        jnp.asarray(np.asarray(a)) for a in (sb.dt, sb.gid, sb.tab, sb.aux)
    )
    oends = jnp.asarray(np.asarray(sb.leaf2_out_ends))
    if sb.leaf_buckets is not None:
        buckets = tuple(
            tuple(jnp.asarray(np.asarray(a)) for a in b)
            for b in sb.leaf_buckets
        )
        nb = sb.leaf_nb

        def chain(args):
            rows = score_tiles_v3_rows(
                *args, depth=depth, mn_cap=mn_cap, g_cap=g_cap
            )
            scores, out_rows = leaf2_scores_multi(rows, oends, buckets, nb=nb)
            return scores.sum() + out_rows.sum()
    else:
        b, w_cap = sb.leaf2_pw.shape
        ends2 = jnp.asarray(np.asarray(sb.leaf2_ends))
        ps = jnp.asarray(np.asarray(sb.leaf2_ps))
        pc = jnp.asarray(np.asarray(sb.leaf2_pc))
        pw = jnp.asarray(np.asarray(sb.leaf2_pw))
        conf = jnp.asarray(np.asarray(sb.leaf_conf))

        def chain(args):
            rows = score_tiles_v3_rows(
                *args, depth=depth, mn_cap=mn_cap, g_cap=g_cap
            )
            scores, out_rows = leaf2_scores_device(
                rows, ends2, ps, pc, pw, conf, oends, w_cap=w_cap
            )
            return scores.sum() + out_rows.sum()

    def make(k):
        @jax.jit
        def f(a):
            tot = jnp.float32(0)
            for i in range(k):
                tot = tot + chain((a[0] + jnp.float32(i) * 1e-6,) + a[1:])
            return tot
        return f

    args = (dt, gid, tab, aux)
    f8, f32 = make(8), make(32)
    _ = float(f8(args)); _ = float(f32(args))
    ests = []
    for _ in range(iters):
        t0 = time.time(); float(f8(args)); t8 = time.time() - t0
        t0 = time.time(); float(f32(args)); t32 = time.time() - t0
        ests.append(max((t32 - t8) / 24, 1e-9))
    return statistics.median(ests) * 1e3


def measure_host_tail(store, screener, sb, iters: int) -> float:
    nb = sb.leaf_nb if sb.leaf_buckets is not None else len(sb.leaf_conf)
    stand = (
        np.zeros(nb, np.float32),
        np.zeros((len(sb.leaf2_out_ends), sb.dt.shape[1]), np.float32),
    )
    screener.postprocess_stored(sb, (stand[0], stand[1].copy()))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sb2 = store.load(0)
        scores = screener.postprocess_stored(sb2, (stand[0], stand[1].copy()))
        assert len(scores) == sb2.batch_len
        times.append(time.perf_counter() - t0)
    return statistics.median(times) * 1e3


def main() -> None:
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    print(f"layout={LAYOUT} batch={batch_size}")
    print(
        "| clusters | conf | T | layout (Bk,Lk,Wk) | slots | outliers | "
        "device ms/b | device lig/s | host ms/b |"
    )
    print("|---|---|---|---|---|---|---|---|---|")
    for nc in (4, 10, 20, 40):
        for conf in (4, 8):
            model = make_synthetic_model(num_clusters=nc, seed=0)
            screener = BatchScreener(model, engine="xla")
            ligands = make_synthetic_ligands(
                batch_size, num_conformers=conf, seed=1
            )
            tmp = tempfile.mkdtemp(prefix=f"sweep_{nc}_{conf}_")
            write_v3_store(
                tmp, screener.packed_model, ligands,
                [f"l{i}" for i in range(batch_size)],
                batch_size=batch_size, verbose=False, leaf_layout=LAYOUT,
            )
            store = TiledStore(tmp, screener.packed_model)
            sb = store.load(0)
            baked = (
                sb.leaf_buckets is not None
                or getattr(sb, "leaf2_ps", None) is not None
            )
            if not baked:
                print(f"| {nc} | {conf} | - | no leaves | - | - | - | - | - |")
                continue
            t_tiles = sb.dt.shape[0]
            if sb.leaf_buckets is not None:
                specs = [
                    (b[3].shape[0], b[1].shape[1], b[3].shape[1])
                    for b in sb.leaf_buckets
                ]
                slots = sum(bk * wk for bk, _lk, wk in specs)
                desc = " ".join(f"{bk}x{lk}x{wk}" for bk, lk, wk in specs)
            else:
                b, w_cap = sb.leaf2_pw.shape
                slots = b * w_cap
                desc = f"single {b}x{sb.leaf2_ps.shape[1]}x{w_cap}"
            n_out = len(sb.leaf2_out["live"])
            dev_ms = measure_chain(sb, iters)
            host_ms = measure_host_tail(store, screener, sb, iters)
            print(
                f"| {nc} | {conf} | {t_tiles} | {desc} | {slots} | "
                f"{n_out} | {dev_ms:.2f} | {batch_size/dev_ms*1e3:,.0f} | "
                f"{host_ms:.2f} |",
                flush=True,
            )


if __name__ == "__main__":
    main()
