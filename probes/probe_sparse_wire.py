"""Sparse leaf wire A/B on real chemistry — the SCALE_REAL follow-up.

SCALE_REAL (round 5) measured the honest tradeoff of the baked-leaf
store on real chemistry: dense leaf bit-planes add ~90 MB/batch to the
~130 MB v3 core, so end-to-end screening through the ~50 MB/s axon
relay ran stream-bound at 211 lig/s (vs 1,311 on the plane-less
synthetic SCALE_1M store). The chapter named the structural fix — a
sparse leaf encoding — "measured-next". This probe is that measurement.

A/B on a 32,768-molecule slice of the SAME 262k fragment library
(/root/demo_real/lib_part_0000000.npz, packed by demo_real_screen.py),
same model (bench.make_synthetic_model(seed=3), as SCALE_REAL):

  1. prepack --tiles_out twice (CPU, like the demo): dense vs sparse
     leaf wire; record store bytes split core/leaf.
  2. screening.py --library_tiles on the real chip for each store,
     timed end to end; record lig/s.
  3. score equality: sparse CSV vs dense CSV at repo tolerance + N
     exact-host-matcher spot checks (iter_embedded seeds 2025+i, the
     demo's contract).

Writes SPARSE_WIRE.json and prints a PERF_NOTES-ready table.

Run:  python probes/probe_sparse_wire.py   (relay up for step 2)
Env:  SLICE_NPZ, N_SPOT (default 64), WORK_DIR (default /root/sparse_ab)
"""

from __future__ import annotations

import csv
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path("/root/repo")
WORK = Path(os.environ.get("WORK_DIR", "/root/sparse_ab"))
SLICE = Path(os.environ.get(
    "SLICE_NPZ", "/root/demo_real/lib_part_0000000.npz"))
SLICE_SMI = Path(str(SLICE).replace(".npz", ".smi"))
N_SPOT = int(os.environ.get("N_SPOT", "64"))
BATCH = 2048

REPORT: dict = {}


def log(msg):
    print(f"[sparse_ab] {msg}", flush=True)


def flush():
    (REPO / "SPARSE_WIRE.json").write_text(json.dumps(REPORT, indent=1))


def main() -> int:
    WORK.mkdir(parents=True, exist_ok=True)
    from bench import make_synthetic_model

    model_path = WORK / "model.pm"
    make_synthetic_model(seed=3).save(str(model_path))

    import numpy as np

    from pharmaconet_tpu.scoring.library import load_library
    packed, names = load_library(SLICE)
    n = len(packed)
    del packed
    REPORT["n_ligands"] = n
    REPORT["slice"] = str(SLICE)
    log(f"slice: {n} real molecules")

    # ---- 1. prepack both wires (CPU, as demo_real_screen does) ---------
    for wire in ("dense", "sparse"):
        tiles = WORK / f"tiles_{wire}"
        if (tiles / "meta.json").exists():
            log(f"reusing {tiles}")
        else:
            t0 = time.time()
            rc = subprocess.run(
                [sys.executable, "prepack.py", "--library", str(SLICE),
                 "-p", str(model_path), "--tiles_out", str(tiles),
                 "--batch_size", str(BATCH), "--leaf_wire", wire],
                cwd=REPO, env={**os.environ, "JAX_PLATFORMS": "cpu"},
            ).returncode
            assert rc == 0, f"prepack {wire} failed"
            REPORT[f"prepack_{wire}_seconds"] = round(time.time() - t0, 1)
        total = sum(f.stat().st_size for f in tiles.rglob("*") if f.is_file())
        leaf = sum(f.stat().st_size for f in tiles.rglob("leafb*"))
        REPORT[f"store_{wire}"] = {
            "total_bytes": total, "leaf_bytes": leaf,
            "leaf_bytes_per_ligand": round(leaf / n, 1),
            "meta": json.loads((tiles / "meta.json").read_text()),
        }
        log(f"{wire}: {total/1e9:.2f} GB total, {leaf/1e9:.2f} GB leaf "
            f"({leaf/n/1e3:.1f} KB/ligand)")
        flush()

    # ---- 2. screen both on the chip ------------------------------------
    for wire in ("dense", "sparse"):
        tiles = WORK / f"tiles_{wire}"
        out_csv = WORK / f"scores_{wire}.csv"
        for p in (out_csv, Path(str(out_csv) + ".partial")):
            if p.exists():
                p.unlink()
        t0 = time.time()
        rc = subprocess.run(
            [sys.executable, "screening.py", "-p", str(model_path),
             "--library_tiles", str(tiles), "-o", str(out_csv)],
            cwd=REPO, timeout=3600,
        ).returncode
        dt = time.time() - t0
        assert rc == 0, f"screening {wire} failed"
        rows = sum(1 for _ in open(out_csv)) - 1
        assert rows == n, (rows, n)
        REPORT[f"screen_{wire}"] = {
            "seconds": round(dt, 1), "lig_per_sec": round(n / dt, 1),
        }
        log(f"screen {wire}: {dt:.0f}s = {n/dt:.0f} lig/s end-to-end")
        flush()

    # ---- 3. equality ----------------------------------------------------
    def load_csv(p):
        with open(p) as f:
            rd = csv.reader(f)
            next(rd)
            return {r[0]: float(r[1]) for r in rd if r}

    dense = load_csv(WORK / "scores_dense.csv")
    sparse = load_csv(WORK / "scores_sparse.csv")
    assert dense.keys() == sparse.keys()
    keys = sorted(dense)
    dv = np.array([dense[k] for k in keys])
    sv = np.array([sparse[k] for k in keys])
    np.testing.assert_allclose(sv, dv, rtol=2e-5, atol=1e-4)
    REPORT["csv_equality"] = {
        "rows": len(keys),
        "max_abs_diff": float(np.abs(sv - dv).max()),
    }
    log(f"CSV equality: {len(keys)} rows, max |sparse-dense| "
        f"{np.abs(sv - dv).max():.2e}")
    flush()

    # exact-host-matcher spot checks through the demo's seed contract
    # (entry i of the slice embeds with seed 2025+i, backend jax)
    from pharmaconet_tpu.pharmacophore.model import PharmacophoreModel
    from pharmaconet_tpu.scoring.graph_match import GraphMatcher
    from pharmaconet_tpu.scoring.parse_pool import iter_embedded

    entries = [ln.split()[:2] for ln in open(SLICE_SMI) if ln.strip()]
    model = PharmacophoreModel.load(str(model_path))
    rng = np.random.default_rng(17)
    idxs = sorted(rng.choice(len(entries), N_SPOT, replace=False).tolist())
    worst, failed, checked = 0.0, 0, 0
    for i in idxs:
        smi, name = entries[i]  # lib.smi lines are "{smi} {name}"
        if name not in sparse:
            continue
        got = list(iter_embedded([(name, smi)], seed=2025 + i,
                                 backend="jax"))
        if not got:
            continue
        ref = GraphMatcher(model, got[0][1]).run()
        diff = abs(ref - sparse[name])
        worst = max(worst, diff)
        if diff > 1e-4 + 2e-5 * abs(ref):
            failed += 1
            log(f"SPOT FAIL {name}: host {ref} sparse {sparse[name]}")
        checked += 1
    REPORT["spot_check"] = {
        "checked": checked, "failed": failed,
        "max_abs_diff": round(worst, 8),
    }
    log(f"spot check {checked - failed}/{checked} ok, worst {worst:.2e}")
    flush()
    assert failed == 0 and checked >= N_SPOT // 2

    d, s = REPORT["screen_dense"], REPORT["screen_sparse"]
    log(f"RESULT: dense {d['lig_per_sec']} -> sparse {s['lig_per_sec']} "
        f"lig/s ({s['lig_per_sec'] / d['lig_per_sec']:.2f}x), leaf bytes "
        f"{REPORT['store_dense']['leaf_bytes'] / max(REPORT['store_sparse']['leaf_bytes'], 1):.1f}x smaller")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
