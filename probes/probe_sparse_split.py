"""Sparse-wire attribution: transfer vs device chain, same session.

probe_sparse_wire.py measured END-TO-END dense 95.3 vs sparse 75.6
lig/s — but the two screens ran ~10 min apart through the axon relay,
whose throughput varies 2-3x between identical runs (SCALE_REAL chunk
timings). This probe removes the relay-variance confound by measuring
both wires interleaved in ONE process on batch 0 of the SAME stores
(/root/sparse_ab, 2048 real fragment molecules):

  T  host->device transfer of the full stored-batch operand tree
     (median of N interleaved reps, MB/s derived)
  D  device chain marginal (pair kernel + leaf2_scores_multi), paired
     unroll-8/32 slope, operands resident

The question: does the sparse wire's device-side scatter densify cost
more than its ~59 MB/batch transfer saving, or was the end-to-end A/B
just relay noise?

Usage: python probes/probe_sparse_split.py [iters]
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from bench import make_synthetic_model
from pharmaconet_tpu.ops.screen_pallas import score_tiles_v3_rows
from pharmaconet_tpu.scoring.batch_screen import PackedModel
from pharmaconet_tpu.scoring.leaf_tree import leaf2_scores_multi
from pharmaconet_tpu.scoring.tiled_store import TiledStore

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 9
WORK = Path("/root/sparse_ab")


def operand_list(sb):
    ops = [np.asarray(sb.dt), np.asarray(sb.gid), np.asarray(sb.tab),
           np.asarray(sb.aux), np.asarray(sb.leaf2_out_ends)]
    for b in sb.leaf_buckets:
        ops.extend(np.asarray(a) for a in b)
    return ops


def measure_transfer(ops, reps):
    times = []
    for _ in range(reps):
        t0 = time.time()
        bufs = [jnp.asarray(o) for o in ops]
        jax.block_until_ready(bufs)
        times.append(time.time() - t0)
        del bufs
    return statistics.median(times)


def chain_fn(sb, bufs):
    depth, mn_cap, g_cap = sb.depth, sb.mn_cap, sb.g_cap
    nb = sb.leaf_nb
    arity = len(sb.leaf_buckets[0])
    dt, gid, tab, aux, oends = bufs[:5]
    buckets = tuple(
        tuple(bufs[5 + arity * k: 5 + arity * (k + 1)])
        for k in range(len(sb.leaf_buckets))
    )

    def fn(d):
        rows = score_tiles_v3_rows(d, gid, tab, aux, depth=depth,
                                   mn_cap=mn_cap, g_cap=g_cap)
        scores, out_rows = leaf2_scores_multi(rows, oends, buckets, nb=nb)
        return scores.sum() + out_rows.sum()

    return dt, fn


def measure_chain(sb, bufs, iters):
    dt, fn = chain_fn(sb, bufs)

    def make_unrolled(k):
        @jax.jit
        def f(d):
            total = jnp.float32(0)
            for i in range(k):
                total = total + fn(d + jnp.float32(i) * 1e-6)
            return total
        return f

    f8, f32 = make_unrolled(8), make_unrolled(32)
    _ = float(f8(dt)); _ = float(f32(dt))
    ests = []
    for _ in range(max(iters, 7)):
        t0 = time.time(); _ = float(f8(dt)); t8 = time.time() - t0
        t0 = time.time(); _ = float(f32(dt)); t32 = time.time() - t0
        ests.append(max((t32 - t8) / 24, 1e-9))
    return statistics.median(ests)


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    pm = PackedModel.from_model(make_synthetic_model(seed=3), None)
    out = {}
    sbs, bufs = {}, {}
    for wire in ("dense", "sparse"):
        sb = TiledStore(WORK / f"tiles_{wire}", pm).load(0)
        ops = operand_list(sb)
        mb = sum(o.nbytes for o in ops) / 1e6
        sbs[wire] = (sb, ops)
        out[wire] = {"operand_mb": round(mb, 1)}
        print(f"{wire}: {mb:.0f} MB operands, arity "
              f"{len(sb.leaf_buckets[0])}", flush=True)

    # interleaved transfer reps (relay variance hits both wires equally)
    tt = {"dense": [], "sparse": []}
    for rep in range(ITERS):
        for wire in ("dense", "sparse"):
            tt[wire].append(measure_transfer(sbs[wire][1], 1))
    for wire in ("dense", "sparse"):
        med = statistics.median(tt[wire])
        out[wire]["transfer_s"] = round(med, 3)
        out[wire]["transfer_mbps"] = round(out[wire]["operand_mb"] / med, 1)
        print(f"{wire}: transfer {med:.2f} s median "
              f"({out[wire]['transfer_mbps']} MB/s)", flush=True)

    for wire in ("dense", "sparse"):
        sb, ops = sbs[wire]
        dev = [jnp.asarray(o) for o in ops]
        jax.block_until_ready(dev)
        ms = measure_chain(sb, dev, ITERS) * 1e3
        out[wire]["chain_ms"] = round(ms, 2)
        print(f"{wire}: device chain {ms:.2f} ms/batch marginal", flush=True)
        del dev

    Path("/root/repo/SPARSE_SPLIT.json").write_text(json.dumps(out, indent=1))
    d, s = out["dense"], out["sparse"]
    print(f"RESULT: transfer {d['transfer_s']} -> {s['transfer_s']} s, "
          f"chain {d['chain_ms']} -> {s['chain_ms']} ms", flush=True)


if __name__ == "__main__":
    main()
