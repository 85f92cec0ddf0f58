"""End-to-end prepacked-screening phase probe (real chip, via relay).

Measures per-batch wall cost of every phase of BatchScreener.score_packed
on a prepacked library batch: pack -> prep+tile -> transfer -> kernel
dispatch -> readback -> compact -> prune -> DFS. The relay adds ~20-75 ms
per dispatch and per transfer round trip; phases are timed separately so
the device-independent host costs are visible on their own.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import make_synthetic_ligands, make_synthetic_model
from pharmaconet_tpu.scoring.batch_screen import (
    BatchScreener,
    build_batch,
    compact_pair_table_tiled,
    host_prune_mask,
    _dfs_scores,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

print(f"device: {jax.devices()[0]} batch={B}", flush=True)
model = make_synthetic_model()
screener = BatchScreener(model)
packed = make_synthetic_ligands(B)


def t(f, *a, **k):
    t0 = time.perf_counter()
    out = f(*a, **k)
    return out, time.perf_counter() - t0


for rep in range(REPS):
    batch, t_pack = t(build_batch, screener.packed_model, packed)
    tiled, t_prep = t(screener.device_args_pallas, batch)

    arrays = (
        tiled.pos_blocks, tiled.uv_packed, tiled.muT, tiled.invT,
        tiled.winvT, tiled.flags_block, tiled.flags_pair,
        tiled.end_mn_inv, tiled.end_mn_half, tiled.end_fail_gate,
        tiled.thr_ns, tiled.self_ns,
    )
    nbytes = sum(a.nbytes for a in arrays)
    t0 = time.perf_counter()
    dev = [jnp.asarray(a) for a in arrays]
    for d in dev:
        d.block_until_ready()
    t_xfer = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = screener.run_device_pallas(tiled)
    t_dispatch = time.perf_counter() - t0
    expanded, t_read = t(np.asarray, out)

    table, t_compact = t(compact_pair_table_tiled, expanded, tiled.pair_end_rows)
    prune, t_prune = t(host_prune_mask, batch, screener.packed_model)
    table[: len(prune)][prune] = -1.0
    scores, t_dfs = t(_dfs_scores, batch, table)

    total = t_pack + t_prep + t_xfer + t_dispatch + t_read + t_compact + t_prune + t_dfs
    print(
        f"rep{rep}: pack={t_pack*1e3:.0f} prep+tile={t_prep*1e3:.0f} "
        f"xfer={t_xfer*1e3:.0f} ({nbytes/1e6:.0f}MB) "
        f"dispatch+run={t_dispatch*1e3:.0f} read={t_read*1e3:.0f} "
        f"compact={t_compact*1e3:.0f} prune={t_prune*1e3:.0f} "
        f"dfs={t_dfs*1e3:.0f}  total={total*1e3:.0f} ms "
        f"-> {B/total:,.0f} lig/s",
        flush=True,
    )
print("nonzero:", int(np.sum(np.asarray(scores) > 0)), "/", B)
