"""Real-chemistry at-scale screening record (VERDICT round-3, next #2).

The 1M-ligand record (SCALE_1M.json) screens synthetic packed ligands;
this demo runs the pipeline USERS run — SMILES text in, scores out — at
>=250k distinct real (fragment-enumerated, chem/fragments.py) molecules,
through the user-facing CLIs on the real chip:

  1. generate lib.smi (deterministic, seed-pinned)
  2. `prepack --smiles lib.smi -o lib.npz --embed_backend jax`
     (parse -> perception -> TPU distance-geometry conformers -> pack)
  3. `prepack --library lib.npz --tiles_out tiles` (v3 tile store +
     prepack-baked assignment-tree leaves)
  4. `screening.py --library_tiles tiles` with a forced mid-run kill +
     crash-resume from <out>.partial
  5. spot-check scores vs the exact host GraphMatcher on re-embedded
     per-index-seeded conformers (the CI equality contract)

Per-stage throughput + the parse/perception split (measured on a sample,
host is 1 vCPU here) land in SCALE_REAL.json.

Run:  python probes/demo_real_screen.py [n_ligands] [--keep]
Axon caveat: the device upload rides a ~35 MB/s relay on this box; a
real TPU host pays a PCIe copy instead. Prepack and host-tail numbers
are representative; the end-to-end screen rate is relay-bound and
recorded as such.
"""

from __future__ import annotations

import json
import os
import resource
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# the driver-side spot check re-embeds conformers; it must run on the SAME
# jax platform as the prepack CLIs (which call honor_env_platforms), or a
# JAX_PLATFORMS pin silently applies to one side only (the managed
# sitecustomize force-registers the TPU platform) and cross-backend f32
# refinement divergence fails every spot check
from pharmaconet_tpu.utils.compile_cache import honor_env_platforms  # noqa: E402

honor_env_platforms()

N = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 262_144
KEEP = "--keep" in sys.argv
BATCH = 2048
WORK = Path(os.environ.get("DEMO_DIR", "/root/demo_real"))
KILL_AFTER = float(os.environ.get("DEMO_KILL_AFTER", "120"))
REPORT: dict = {"n_ligands": N, "distinct": N, "batch_size": BATCH,
                "library": "fragment-enumerated (chem/fragments.py, seed 11)"}


def log(msg):
    print(f"[demo] {msg}", flush=True)


def flush_report():
    """Record phases incrementally (VERDICT r4: a relay flap mid-run must
    not lose the completed stages)."""
    (Path("/root/repo") / "SCALE_REAL.json").write_text(
        json.dumps(REPORT, indent=1))


def run_timed(
    label: str,
    cmd: list[str],
    cpu_only: bool = False,
    timeout_s: float | None = None,
    retries: int = 1,
) -> float:
    """Run a stage; on relay hang (timeout) kill + retry. A hung relay
    RPC blocks forever (futex + ep_poll, observed round 4/5), so every
    device-touching stage gets a generous wall-clock bound."""
    env = dict(os.environ)
    if cpu_only:
        # host-only stage: keep it off the relay so device flaps can't
        # stall it (the CLIs honor an explicit JAX_PLATFORMS)
        env["JAX_PLATFORMS"] = "cpu"
    for attempt in range(retries + 1):
        log(f"{label} (attempt {attempt + 1}): {' '.join(cmd)}")
        t0 = time.time()
        try:
            rc = subprocess.run(
                cmd, cwd="/root/repo", env=env, timeout=timeout_s
            ).returncode
        except subprocess.TimeoutExpired:
            log(f"{label}: TIMEOUT after {timeout_s:.0f}s (relay hang?)")
            REPORT.setdefault("stage_timeouts", []).append(label)
            flush_report()
            continue
        dt = time.time() - t0
        assert rc == 0, f"{label} failed rc={rc}"
        log(f"{label}: {dt:.0f}s")
        return dt
    raise TimeoutError(f"{label}: all {retries + 1} attempts timed out")


def main() -> int:
    from bench import make_synthetic_model
    from pharmaconet_tpu.chem.fragments import enumerate_fragment_smiles
    from pharmaconet_tpu.chem.ligand_perception import get_pharmacophore_nodes
    from pharmaconet_tpu.chem.smiles import parse_smiles

    WORK.mkdir(parents=True, exist_ok=True)
    model = make_synthetic_model(seed=3)
    model_path = WORK / "model.pm"
    model.save(str(model_path))

    # -------- 1. library -------------------------------------------------
    t0 = time.time()
    entries = enumerate_fragment_smiles(N, seed=11)
    smi_file = WORK / "lib.smi"
    with open(smi_file, "w") as f:
        for name, smi in entries:
            f.write(f"{smi} {name}\n")
    REPORT["complete"] = False
    REPORT["gen_seconds"] = round(time.time() - t0, 1)
    log(f"library: {N} distinct SMILES in {REPORT['gen_seconds']}s")
    flush_report()

    # -------- 1b. parse/perception split (sample, host core) -------------
    sample = entries[:: max(1, N // 16_384)][:16_384]
    t0 = time.time()
    for _name, smi in sample:
        parse_smiles(smi).strip_hydrogens()
    t_parse = time.time() - t0
    t0 = time.time()
    for _name, smi in sample:
        get_pharmacophore_nodes(parse_smiles(smi).strip_hydrogens())
    t_pp = time.time() - t0
    REPORT["stage_sample"] = {
        "n": len(sample),
        "parse_mol_per_sec_core": round(len(sample) / t_parse, 1),
        "parse_plus_perception_mol_per_sec_core": round(len(sample) / t_pp, 1),
    }
    log(f"sample split: parse {len(sample)/t_parse:,.0f}/s, "
        f"parse+perception {len(sample)/t_pp:,.0f}/s per core")
    flush_report()

    # -------- 2. SMILES -> packed library (TPU embed) ---------------------
    # Restartable: if a previous (relay-flapped) run already produced the
    # full packed library, reuse it rather than re-embedding N molecules.
    lib_npz = WORK / "lib.npz"
    reuse_lib = False
    if lib_npz.exists():
        try:
            with np.load(lib_npz, allow_pickle=False) as z:
                reuse_lib = len(z["names"]) >= N * 0.99
        except Exception:
            reuse_lib = False
    if reuse_lib:
        log(f"reusing existing packed library {lib_npz} ({N} ligands)")
        REPORT["smiles_prepack"] = {"reused": True}
    else:
        # chunked + resumable: each 32k chunk prepacks independently with
        # --seed 2025+chunk_start (entry i embeds with seed 2025+i either
        # way, so chunked output is bit-identical to one big run and the
        # spot check's per-index re-embeds still match). A relay flap
        # costs one chunk, not the whole stage.
        CHUNK = int(os.environ.get("DEMO_EMBED_CHUNK", "32768"))
        t_all = time.time()
        parts: list[Path] = []
        for c0 in range(0, N, CHUNK):
            chunk_entries = entries[c0 : c0 + CHUNK]
            part = WORK / f"lib_part_{c0:07d}.npz"
            parts.append(part)
            if part.exists():
                try:
                    with np.load(part, allow_pickle=False) as z:
                        if len(z["names"]) >= len(chunk_entries) * 0.99:
                            log(f"chunk {c0}: reusing {part.name}")
                            continue
                except Exception:
                    pass
            csmi = WORK / f"lib_part_{c0:07d}.smi"
            with open(csmi, "w") as f:
                for name, smi in chunk_entries:
                    f.write(f"{smi} {name}\n")
            run_timed(f"prepack --smiles chunk {c0}", [
                sys.executable, "prepack.py", "--smiles", str(csmi),
                "-o", str(part), "--embed_backend", "jax",
                "--seed", str(2025 + c0),
            ], timeout_s=max(600.0, len(chunk_entries) * 0.6), retries=2)
            REPORT["smiles_prepack_chunks_done"] = len(
                [p for p in parts if p.exists()])
            flush_report()
        if len(parts) == 1:
            parts[0].rename(lib_npz)
        else:
            from pharmaconet_tpu.scoring.library import (
                load_library, save_library,
            )

            packed_all, names_all = [], []
            for part in parts:
                pk, nm = load_library(part)
                packed_all.extend(pk)
                names_all.extend(nm)
            save_library(lib_npz, packed_all, names_all)
            del packed_all
        dt = time.time() - t_all
        REPORT["smiles_prepack"] = {
            "seconds": round(dt, 1),
            "lig_per_sec": round(N / dt, 1),
            "embed_backend": "jax (TPU)",
            "chunk": CHUNK,
        }
    flush_report()

    # -------- 3. packed library -> tile store ----------------------------
    tiles = WORK / "tiles"
    meta_f = tiles / "meta.json"
    reuse_tiles = False
    if meta_f.exists():
        try:
            from pharmaconet_tpu.scoring.tiled_store import model_fingerprint
            from pharmaconet_tpu.scoring.batch_screen import PackedModel

            m = json.loads(meta_f.read_text())
            reuse_tiles = (
                m.get("n_ligands", 0) >= N * 0.99
                and m.get("fingerprint")
                == model_fingerprint(PackedModel.from_model(model, None))
            )
        except Exception:
            reuse_tiles = False
    if reuse_tiles:
        log(f"reusing existing tile store {tiles}")
        REPORT["tiles_prepack"] = {
            "reused": True,
            "store_meta": json.loads(meta_f.read_text()),
        }
    else:
        dt = run_timed("prepack --tiles_out (v3 store + leaf bake)", [
            sys.executable, "prepack.py", "--library", str(lib_npz),
            "-p", str(model_path), "--tiles_out", str(tiles),
            "--batch_size", str(BATCH),
        ], cpu_only=True)
        du = subprocess.run(["du", "-sb", str(tiles)], capture_output=True,
                            text=True)
        REPORT["tiles_prepack"] = {
            "seconds": round(dt, 1),
            "lig_per_sec": round(N / dt, 1),
            "store_bytes": int(du.stdout.split()[0]),
            "store_meta": json.loads(meta_f.read_text()),
        }
    flush_report()

    # -------- 4. screen with forced crash + resume -----------------------
    out_csv = WORK / "scores.csv"
    for p in (out_csv, Path(str(out_csv) + ".partial")):
        if p.exists():
            p.unlink()
    cmd = [
        sys.executable, "screening.py", "-p", str(model_path),
        "--library_tiles", str(tiles), "-o", str(out_csv),
    ]
    log(f"phase A: screen, killed after {KILL_AFTER:.0f}s (crash-resume)")
    t0 = time.time()
    proc = subprocess.Popen(cmd, cwd="/root/repo",
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.STDOUT)
    try:
        proc.wait(timeout=KILL_AFTER)
        killed = False
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.wait()
        killed = True
    phase_a = time.time() - t0
    partial = Path(str(out_csv) + ".partial")
    rows_a = sum(1 for _ in open(partial)) if partial.exists() else 0
    REPORT["phase_a"] = {"seconds": round(phase_a, 1), "killed": killed,
                         "rows_in_partial": rows_a}
    log(f"phase A: killed={killed}, {rows_a} rows in partial")
    flush_report()

    log("phase B: resume to completion")
    t0 = time.time()
    # crash-resume doubles as relay-hang recovery: a timed-out attempt is
    # killed and the rerun picks up from <out>.partial
    phase_b_to = max(900.0, N * 0.1)
    for attempt in range(3):
        try:
            rc = subprocess.run(cmd, cwd="/root/repo",
                                timeout=phase_b_to).returncode
            break
        except subprocess.TimeoutExpired:
            log(f"phase B attempt {attempt + 1}: TIMEOUT after "
                f"{phase_b_to:.0f}s (relay hang?) — resuming from partial")
            REPORT.setdefault("stage_timeouts", []).append("phase_b")
            flush_report()
            rc = -1
    phase_b = time.time() - t0
    assert rc == 0, f"resumed screen failed rc={rc}"
    n_rows = sum(1 for _ in open(out_csv)) - 1
    REPORT["phase_b"] = {"seconds": round(phase_b, 1), "rows": n_rows}
    total = phase_a + phase_b
    REPORT["screen_seconds"] = round(total, 1)
    REPORT["screen_lig_per_sec_relay"] = round(n_rows / total, 1)
    REPORT["peak_rss_gb_driver"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)
    log(f"screen: {total:.0f}s = {n_rows/total:,.0f} lig/s through the relay "
        f"({n_rows} rows)")
    flush_report()

    # -------- 5. spot-check vs the exact host matcher --------------------
    import random

    from pharmaconet_tpu.scoring.graph_match import GraphMatcher
    from pharmaconet_tpu.scoring.parse_pool import iter_embedded

    scores: dict[str, float] = {}
    with open(out_csv) as f:
        next(f)
        for line in f:
            name, s = line.rsplit(",", 1)
            scores[name] = float(s)
    rng = random.Random(0)
    idxs = sorted(rng.sample(range(N), 256))
    checked = failed = 0
    worst = 0.0
    for i in idxs:
        name, smi = entries[i]
        if name not in scores:
            continue  # embed/parse failure was skipped by the CLI
        got_lig = list(iter_embedded([(name, smi)], seed=2025 + i,
                                     backend="jax"))
        if not got_lig:
            continue
        expected = GraphMatcher(model, got_lig[0][1]).run()
        diff = abs(scores[name] - expected)
        worst = max(worst, diff)
        if diff > 1e-4 + 2e-5 * abs(expected):
            failed += 1
            log(f"MISMATCH {name}: csv {scores[name]} exact {expected}")
        checked += 1
    REPORT["spot_check"] = {"checked": checked, "failed": failed,
                            "max_abs_diff": worst}
    log(f"spot-check vs exact matcher: {checked} checked, {failed} failed, "
        f"max |diff| {worst:.2e}")
    flush_report()
    assert failed == 0 and checked >= 200

    assert n_rows >= int(N * 0.995), (
        f"too many skipped molecules: {n_rows}/{N}")
    REPORT["skipped_molecules"] = N - n_rows
    REPORT["complete"] = True

    flush_report()
    log("wrote SCALE_REAL.json")
    if not KEEP:
        subprocess.run(["rm", "-rf", str(tiles)])
        log("tile store removed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
