"""Phase-split the stored (v3+leaves) host tail: load vs postprocess.

BENCH_MODE=stored printed 8.21 ms/batch on the round-5 bucketed default
vs round-4's 4.69 ms (single layout, lower demotion ceilings). This
probe splits the per-batch host tail into
  L  store.load(bi)            (host.npz + leaf2_out.npz reads, mmap setup)
  P  postprocess_stored        (score scatter + outlier DFS)
and prints per-file sizes so the growth attributes to bytes vs code.

Usage: python probes/probe_stored_tail.py [batch_size] [iters]
Host-only (JAX_PLATFORMS=cpu is fine); no device work.
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

import numpy as np

from bench import make_synthetic_ligands, make_synthetic_model
from pharmaconet_tpu.scoring.batch_screen import BatchScreener
from pharmaconet_tpu.scoring.tiled_store import TiledStore, write_v3_store


def main() -> None:
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    layout = os.environ.get("PROBE_LEAF_LAYOUT", "buckets")

    model = make_synthetic_model(seed=0)
    screener = BatchScreener(model, engine="xla")
    ligands = make_synthetic_ligands(batch_size, seed=1)
    tmp = tempfile.mkdtemp(prefix="probe_tail_")
    write_v3_store(
        tmp, screener.packed_model, ligands,
        [f"l{i}" for i in range(batch_size)],
        batch_size=batch_size, verbose=False, leaf_layout=layout,
    )
    for f in sorted(Path(tmp, "batches", "00000").iterdir()):
        print(f"[probe] {f.name:24s} {f.stat().st_size/1e6:8.2f} MB")

    store = TiledStore(tmp, screener.packed_model)
    sb = store.load(0)
    nb = (
        sb.leaf_nb
        if getattr(sb, "leaf_buckets", None) is not None
        else len(sb.leaf_conf)
    )
    stand = (
        np.zeros(nb, np.float32),
        np.zeros((len(sb.leaf2_out_ends), sb.dt.shape[1]), np.float32),
    )
    screener.postprocess_stored(sb, (stand[0], stand[1].copy()))

    t_load, t_post = [], []
    for _ in range(iters):
        t0 = time.perf_counter()
        sb = store.load(0)
        t1 = time.perf_counter()
        scores = screener.postprocess_stored(sb, (stand[0], stand[1].copy()))
        t2 = time.perf_counter()
        assert len(scores) == batch_size
        t_load.append(t1 - t0)
        t_post.append(t2 - t1)
    ml, mp = statistics.median(t_load) * 1e3, statistics.median(t_post) * 1e3
    print(
        f"[probe] layout={layout} load {ml:.2f} ms  postprocess {mp:.2f} ms  "
        f"total {ml + mp:.2f} ms/batch -> "
        f"{batch_size / (ml + mp) * 1e3:,.0f} lig/s/core"
    )


if __name__ == "__main__":
    main()
