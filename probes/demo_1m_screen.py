"""1M-ligand sustained screening demonstration (VERDICT round 2, next #2).

BASELINE config #4: ZINC-scale batched screening of one pocket. This
composes the pieces end-to-end at full scale on the real chip:

  1. synthesize a 1M-ligand library (65,536 distinct packed ligands
     replicated with distinct names — the replication is declared)
  2. prepack it into a model-specific tile store (scoring/tiled_store.py)
  3. screen it with `screening.py --library_tiles` — including a forced
     mid-run kill + crash-resume from <out>.partial
  4. record sustained wall-clock lig/s, peak RSS, and the phase split to
     SCALE_1M.json

Run:  python probes/demo_1m_screen.py [n_ligands] [--keep]
Axon caveat: on this relay host the device upload (~140 MB/batch at
~35 MB/s) dominates; a real TPU host pays a PCIe copy instead. The
host-tail and prepack numbers are representative; the end-to-end rate is
relay-bound and recorded as such.
"""

from __future__ import annotations

import json
import os
import resource
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 1_000_000
KEEP = "--keep" in sys.argv
DISTINCT = 65_536
BATCH = 2048
WORK = Path(os.environ.get("DEMO_DIR", "/root/demo_1m"))
REPORT: dict = {"n_ligands": N, "distinct": min(N, DISTINCT), "batch_size": BATCH}


def log(msg):
    print(f"[demo] {msg}", flush=True)


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main() -> int:
    from bench import make_synthetic_model, make_synthetic_ligands
    from pharmaconet_tpu.scoring.batch_screen import PackedModel
    from pharmaconet_tpu.scoring.tiled_store import (
        write_tiled_store,
        write_v3_store,
    )

    WORK.mkdir(parents=True, exist_ok=True)
    model = make_synthetic_model(seed=3)
    model_path = WORK / "model.pm"
    model.save(str(model_path))

    # -------- 1. library ------------------------------------------------
    t0 = time.time()
    distinct = make_synthetic_ligands(min(N, DISTINCT), seed=7)
    packed = [distinct[i % len(distinct)] for i in range(N)]
    names = [f"l{i:07d}" for i in range(N)]
    REPORT["gen_seconds"] = round(time.time() - t0, 1)
    log(f"library: {N} ligands ({len(distinct)} distinct) in "
        f"{REPORT['gen_seconds']}s")

    # -------- 2. prepack tile store ------------------------------------
    weights = dict(Cation=8.0, Anion=8.0, Aromatic=4.0, HBond_donor=4.0,
                   HBond_acceptor=4.0, Halogen=4.0, Hydrophobic=1.0)
    pm = PackedModel.from_model(model, weights)
    tiles = WORK / "tiles"
    # DEMO_STORE=2 measures the v2 (row-expanded) layout; default matches
    # the prepack CLI default (v3 block-major: ~4x smaller on disk, which
    # on this disk-bound box moves the prepack rate the same factor)
    store_v = int(os.environ.get("DEMO_STORE", "3"))
    REPORT["store_version"] = store_v
    writer = write_v3_store if store_v == 3 else write_tiled_store
    t0 = time.time()
    meta = writer(tiles, pm, packed, names, batch_size=BATCH, verbose=True)
    REPORT["prepack_seconds"] = round(time.time() - t0, 1)
    du = subprocess.run(["du", "-sb", str(tiles)], capture_output=True, text=True)
    REPORT["store_bytes"] = int(du.stdout.split()[0])
    REPORT["store_meta"] = meta
    REPORT["prepack_lig_per_sec"] = round(N / REPORT["prepack_seconds"], 1)
    log(f"prepack: {REPORT['prepack_seconds']}s "
        f"({REPORT['prepack_lig_per_sec']} lig/s/core), "
        f"{REPORT['store_bytes']/1e9:.1f} GB on disk")

    # -------- 3. screen with forced crash + resume ---------------------
    out_csv = WORK / "scores.csv"
    for p in (out_csv, Path(str(out_csv) + ".partial")):
        if p.exists():
            p.unlink()
    cmd = [
        sys.executable, "screening.py", "-p", str(model_path),
        "--library_tiles", str(tiles), "-o", str(out_csv),
    ]
    env = dict(os.environ)
    log("phase A: screen, killed after 180s to exercise crash-resume")
    t0 = time.time()
    proc = subprocess.Popen(cmd, cwd="/root/repo", env=env,
                            stdout=subprocess.DEVNULL, stderr=subprocess.STDOUT)
    try:
        proc.wait(timeout=180)
        killed = False
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.wait()
        killed = True
    phase_a = time.time() - t0
    partial = Path(str(out_csv) + ".partial")
    rows_a = 0
    if partial.exists():
        rows_a = sum(1 for _ in open(partial))
    REPORT["phase_a"] = {"seconds": round(phase_a, 1), "killed": killed,
                         "rows_in_partial": rows_a}
    log(f"phase A: killed={killed} after {phase_a:.0f}s, "
        f"{rows_a} rows in partial")

    log("phase B: resume to completion")
    t0 = time.time()
    rc = subprocess.run(cmd, cwd="/root/repo", env=env).returncode
    phase_b = time.time() - t0
    assert rc == 0, f"resumed screen failed rc={rc}"
    n_rows = sum(1 for _ in open(out_csv)) - 1
    REPORT["phase_b"] = {"seconds": round(phase_b, 1), "rows": n_rows}
    total = phase_a + phase_b
    REPORT["e2e_seconds"] = round(total, 1)
    REPORT["e2e_lig_per_sec_relay"] = round(N / total, 1)
    REPORT["peak_rss_gb_driver"] = round(rss_gb(), 2)
    assert n_rows == N, f"expected {N} rows, got {n_rows}"
    log(f"end-to-end: {total:.0f}s = {N/total:,.0f} lig/s through the "
        f"axon relay (upload-bound here; see projections)")

    # replicated ligands must score identically (scan a sample)
    import random

    import numpy as np

    scores: dict[str, float] = {}
    with open(out_csv) as f:
        next(f)
        for line in f:
            name, s = line.rsplit(",", 1)
            scores[name] = float(s)
    rng = random.Random(0)
    checked = 0
    for _ in range(2000):
        i = rng.randrange(N)
        j = i % DISTINCT  # first replica of the same distinct ligand
        if i != j:
            a, b = scores[f"l{i:07d}"], scores[f"l{j:07d}"]
            assert abs(a - b) <= 1e-4 + 2e-5 * abs(a), (i, j, a, b)
            checked += 1
    REPORT["replica_equality_checked"] = checked
    log(f"replica score equality: {checked} pairs ok")

    # Round-4 derivation (prepack-baked leaves + referenced-only windows;
    # chip-measured 2026-08): the assignment DFS no longer runs on the
    # host, so the stored path needs ONE host core, not ~16. Bounds:
    #   device leaf chain (pair kernel + window gather + leaf matmuls +
    #     epilogue): 6.01 ms/2048 = 341k lig/s/chip
    #     (probes/probe_leaf_phases.py)
    #   host tail (mmap load + dispatch + outlier DFS): 4.69 ms/2048 =
    #     437k lig/s/core (BENCH_MODE=stored BENCH_STORE=v3)
    #   stream: ~92 MB/2048 batch (dt+gid+tab+aux+planes+ends) at PCIe
    #     ~20 GB/s = 4.6 ms = ~445k lig/s
    REPORT["projection"] = (
        {
            "host_tail_lig_per_sec_per_core": 437000,
            "device_chain_lig_per_sec_chip": 341000,
            "stream_mb_per_batch": 92.0,
            "note": "v3+leaf store: real TPU host (PCIe ~20 GB/s) "
                    "pipeline = min(device 341k, stream ~445k, "
                    "1 core x 437k) — device-bound ~341k lig/s/chip "
                    "from a single host core (the assignment tree is "
                    "baked at prepack; no host DFS at screen time)",
        }
        if store_v == 3
        else {
            "host_tail_lig_per_sec_per_core": 59600,
            "device_kernel_lig_per_sec_chip": 1480000,
            "stream_mb_per_batch": 245.4,
            "note": "v2 store: real TPU host (PCIe ~20 GB/s) pipeline = "
                    "min(kernel 1.48M, stream ~186k, cores x 59.6k) — "
                    "stream-bound ~186k lig/s/chip",
        }
    )
    (Path("/root/repo") / "SCALE_1M.json").write_text(json.dumps(REPORT, indent=1))
    log("wrote SCALE_1M.json")
    if not KEEP:
        subprocess.run(["rm", "-rf", str(tiles)])
        log("tile store removed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
