"""On-chip regression battery (VERDICT round-4 next #6).

CPU-mesh CI is structurally blind to TPU numerics: the round-4 bf16
S-einsum bug (leaf scores off by up to ~4e-4 rel on real libraries) was
invisible to all 377 CPU tests and only caught by a chance chip spot
check. This battery re-runs every precision-sensitive path on the REAL
device in one command, <5 min warm (persistent compile cache):

  python probes/chip_ci.py [--fast]

Checks (each prints ok/FAIL; exit 1 on any FAIL; summary JSON last):
  C1 kernel-vs-matcher   Pallas screen of 64 real (fragment) SMILES vs
                         the exact host GraphMatcher (the CI equality
                         contract, reference graph_match.py semantics)
  C2 leaf-vs-dfs         v3 store baked-leaf device path vs the host
                         DFS on the SAME store (reference tree.py:55-104
                         semantics)
  C3 leaf-einsum-f32     device leaf einsums vs the f32 numpy mirror at
                         1e-5 rel — a default-precision (bf16) einsum
                         anywhere in the leaf chain trips this at ~1e-4+
  C4 embed-determinism   device DG embedder: solo vs batched must be
                         bit-identical (catches batch-order-dependent
                         reductions)
  C5 csv-roundtrip       screening.py CLI on a tile store, run twice ->
                         byte-identical CSVs
  C6 seg-precision       tf32 segmentation chunk vs f32 on the 6OIM
                         pocket: bounded rel deviation + voxel flips
                         (catches an accidental bf16/default-precision
                         downgrade in the decoder); skipped by --fast
  C7 sparse-density-wire on-device nonzero compaction + host scatter
                         vs the dense transfer, bit-exact (round-5
                         sparse density wire); skipped by --fast

The battery runs on whatever jax.devices() resolves to, but the POINT
is the real chip — it warns loudly when the device is not a TPU.
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

from pharmaconet_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

FAST = "--fast" in sys.argv
# CPU dry-run mode (CHIP_CI_INTERPRET=1): exercises every check's
# mechanics with interpreted Pallas so API breaks surface before relay
# time is spent; proves nothing about TPU numerics
import os as _os

INTERPRET = bool(_os.environ.get("CHIP_CI_INTERPRET"))
RESULTS: dict[str, dict] = {}
DEV = jax.devices()[0]
ON_TPU = DEV.device_kind.startswith("TPU")
print(f"device: {DEV} (kind={DEV.device_kind})", flush=True)
if not ON_TPU:
    print("WARNING: not a TPU — this battery only proves TPU numerics "
          "when run on the real chip", flush=True)


def check(name):
    def deco(fn):
        t0 = time.time()
        try:
            detail = fn() or {}
            ok = True
        except Exception as e:  # noqa: BLE001 - battery must report, not die
            detail = {"error": f"{type(e).__name__}: {e}"}
            ok = False
        dt = time.time() - t0
        RESULTS[name] = {"ok": ok, "seconds": round(dt, 1), **detail}
        print(f"[{'ok' if ok else 'FAIL'}] {name} ({dt:.1f}s) {detail}",
              flush=True)
        return fn
    return deco


from bench import make_synthetic_ligands, make_synthetic_model  # noqa: E402
from pharmaconet_tpu.chem.fragments import enumerate_fragment_smiles  # noqa: E402
from pharmaconet_tpu.scoring.batch_screen import (  # noqa: E402
    BatchScreener,
    PackedModel,
)
from pharmaconet_tpu.scoring.graph_match import GraphMatcher  # noqa: E402
from pharmaconet_tpu.scoring.parse_pool import iter_embedded  # noqa: E402

MODEL = make_synthetic_model(num_clusters=20, seed=3)
TMP = Path(tempfile.mkdtemp(prefix="chip_ci_"))


@check("C1_kernel_vs_matcher")
def c1():
    entries = enumerate_fragment_smiles(64, seed=11)
    ligs = list(iter_embedded(entries, seed=2025, backend="jax"))
    assert len(ligs) >= 56, f"embed yielded only {len(ligs)}/64"
    # auto engine: pallas on TPU; xla on the CPU dry run
    scr = BatchScreener(MODEL, engine="xla" if INTERPRET else None)
    got = scr.score_ligands([l for _, l in ligs])
    worst = 0.0
    for (name, lig), g in zip(ligs, got):
        exact = GraphMatcher(MODEL, lig).run()
        diff = abs(g - exact)
        worst = max(worst, diff)
        assert diff <= 1e-4 + 2e-5 * abs(exact), (
            f"{name}: kernel {g} vs matcher {exact}")
    return {"n": len(ligs), "engine": scr.engine, "max_abs_diff": worst}


@check("C2_leaf_store_vs_dfs")
def c2():
    from pharmaconet_tpu.scoring.tiled_store import TiledStore, write_v3_store

    pm = PackedModel.from_model(MODEL, None)
    packed = make_synthetic_ligands(256, seed=9)
    write_v3_store(TMP / "tiles", pm, packed,
                   [f"l{i}" for i in range(len(packed))],
                   batch_size=128, verbose=False)
    store = TiledStore(TMP / "tiles", pm)
    scr = BatchScreener(MODEL, engine="v3", pallas_interpret=INTERPRET)
    leaf, dfs, n_out = [], [], 0
    for bi in range(store.n_batches):
        sb = store.load(bi)
        assert sb.leaf_buckets is not None, "store has no baked leaves"
        n_out += len(sb.leaf2_out["live"])
        leaf.extend(scr.score_stored(sb))
        sb2 = store.load(bi)
        sb2.leaf_buckets = None
        sb2.leaf2_ends = sb2.leaf2_out_ends = sb2.leaf2_out = None
        dfs.extend(scr.score_stored(sb2))
    leaf, dfs = np.asarray(leaf), np.asarray(dfs)
    worst = float(np.abs(leaf - dfs).max())
    np.testing.assert_allclose(leaf, dfs, rtol=2e-5, atol=1e-4)
    return {"n": len(leaf), "outliers": n_out, "max_abs_diff": worst}


@check("C3_leaf_einsum_f32")
def c3():
    import types

    from pharmaconet_tpu.ops.screen_pallas import score_tiles_v3_rows
    from pharmaconet_tpu.scoring import leaf_tree as lt
    from pharmaconet_tpu.scoring.tiled_store import TiledStore

    pm = PackedModel.from_model(MODEL, None)
    store = TiledStore(TMP / "tiles", pm)
    sb = store.load(0)
    rows = np.asarray(score_tiles_v3_rows(
        jnp.asarray(sb.dt), jnp.asarray(sb.gid), jnp.asarray(sb.tab),
        jnp.asarray(sb.aux), depth=sb.depth, mn_cap=sb.mn_cap,
        g_cap=sb.g_cap, interpret=INTERPRET,
    ), np.float32)
    bake = types.SimpleNamespace(
        buckets=[
            types.SimpleNamespace(
                **dict(zip(
                    ("ends2", "plane_score", "plane_cross", "prune_w",
                     "conf", "lig_idx"),
                    lt.store_bucket_planes(b),
                ))
            )
            for b in sb.leaf_buckets
        ],
        out_ends=np.asarray(sb.leaf2_out_ends),
    )
    host, _ = lt.leaf2_scores_multi_host(rows, bake, sb.leaf_nb)
    buckets = tuple(
        tuple(jnp.asarray(np.asarray(a)) for a in b)
        for b in sb.leaf_buckets
    )
    dev, _ = lt.leaf2_scores_multi(
        jnp.asarray(rows), jnp.asarray(np.asarray(sb.leaf2_out_ends)),
        buckets, nb=sb.leaf_nb,
    )
    dev = np.asarray(dev)
    denom = np.maximum(np.abs(host), 1e-3)
    rel = float((np.abs(dev - host) / denom).max())
    assert rel < 1e-5, (
        f"device leaf einsums deviate {rel:.2e} rel from the f64 mirror — "
        "a default-precision (bf16) einsum crept into the leaf chain")
    return {"max_rel": rel}


@check("C4_embed_determinism")
def c4():
    entries = enumerate_fragment_smiles(16, seed=23)
    batched = dict(iter_embedded(entries, seed=77, backend="jax"))
    for k in (0, 7, 15):
        name, smi = entries[k]
        if name not in batched:
            continue
        solo = dict(iter_embedded([(name, smi)], seed=77 + k,
                                  backend="jax"))
        a = batched[name].graph.atom_positions
        b = solo[name].graph.atom_positions
        assert np.array_equal(np.asarray(a), np.asarray(b)), (
            f"{name}: solo vs batched embed differ (order-dependent "
            "reduction on device)")
    return {"n": len(batched)}


@check("C5_csv_roundtrip")
def c5():
    MODEL.save(str(TMP / "model.pm"))
    outs = []
    for run in range(2):
        out = TMP / f"scores_{run}.csv"
        rc = subprocess.run(
            [sys.executable, "screening.py", "-p", str(TMP / "model.pm"),
             "--library_tiles", str(TMP / "tiles"), "-o", str(out)],
            cwd="/root/repo", capture_output=True, text=True).returncode
        assert rc == 0, f"screening.py rc={rc}"
        outs.append(out.read_bytes())
    assert outs[0] == outs[1], "re-run produced a different CSV"
    n = len(outs[0].splitlines()) - 1
    assert n == 256, f"expected 256 rows, got {n}"
    return {"rows": n}


_C6_STATE: dict = {}

if not FAST:
    @check("C6_seg_precision")
    def c6():
        from pharmaconet_tpu.module import PharmacoNet

        pm32 = PharmacoNet(weight_path=None, verbose=False,
                           segmentation_precision="float32")
        pm = PharmacoNet(weight_path=None, verbose=False)  # tf32 default
        data = pm.parse(
            "/root/reference/examples/6OIM_protein.pdb",
            "/root/reference/examples/6OIM_D_MOV.pdb",
        )
        args = (jnp.asarray(data.atom_positions),
                jnp.asarray(data.atom_features),
                jnp.asarray(data.atom_valid), jnp.asarray(data.tokens),
                jnp.asarray(data.token_valid), jnp.asarray(data.center))
        out = pm._device_program(*args, with_segmentation=False)
        chunk = pm.segmentation_chunk
        rng = np.random.default_rng(0)
        n_tok = int(np.asarray(data.token_valid).sum())
        idx = jnp.asarray(rng.integers(0, n_tok, chunk).astype(np.int32))
        seg_args = (tuple(out["pyramid"]), out["protein_mask"],
                    out["cavity_narrow"], jnp.asarray(data.tokens)[idx],
                    out["token_features"][idx],
                    jnp.ones(chunk, dtype=bool))
        d_mixed = np.asarray(pm._segmentation_program(*seg_args))
        d_f32 = np.asarray(pm32._segmentation_program(*seg_args))
        denom = max(float(np.abs(d_f32).max()), 1e-9)
        rel = float(np.abs(d_mixed - d_f32).max() / denom)
        flips = int(np.sum((d_mixed > 0) != (d_f32 > 0)))
        on = int(np.sum(d_f32 > 0))
        # Chip-measured (v5e, random params, 6OIM, this exact seg_args):
        # HIGH ("tensorfloat32") rel = 1.59e-2 with 0/2322 voxel flips;
        # DEFAULT (bf16) rel = 8.4e-1 with 42 flips — 53x apart. The bound
        # is a regression tripwire for precision downgrades, not a
        # numerics spec: 6e-2 is ~4x the measured HIGH deviation and ~14x
        # under a DEFAULT downgrade. The semantic contract is the flips
        # assert below (tf32 faithfulness = zero thresholded-voxel flips).
        assert rel < 6e-2, f"segmentation rel deviation {rel:.2e} >= 6e-2"
        assert flips <= max(1, on // 500), (
            f"{flips} thresholded-voxel flips vs {on} on-voxels")
        _C6_STATE.update(pm=pm, seg_args=seg_args, d_mixed=d_mixed)
        return {"max_rel": rel, "voxel_flips": flips, "on_voxels": on}

    @check("C7_sparse_density_wire")
    def c7():
        # sparse device->host density wire (module.py density_wire, round
        # 5): on-device nonzero compaction + host scatter must reproduce
        # the dense transfer BIT-exactly on the real chip (reuses C6's
        # compiled trunk + slab)
        assert _C6_STATE, "C6 did not run/stash state"
        pm, seg_args = _C6_STATE["pm"], _C6_STATE["seg_args"]
        dense = _C6_STATE["d_mixed"]
        _, vals, idxs, counts = pm._segmentation_program_sparse(*seg_args)
        vals, idxs, counts = (np.asarray(vals), np.asarray(idxs),
                              np.asarray(counts))
        cap = vals.shape[1]
        assert counts.max() <= cap, (
            f"count {counts.max()} > cap {cap} on the 6OIM slab")
        recon = np.zeros_like(dense).reshape(dense.shape[0], -1)
        for k in range(dense.shape[0]):
            c = int(counts[k])
            recon[k, idxs[k, :c]] = vals[k, :c]
        recon = recon.reshape(dense.shape)
        assert np.array_equal(recon, dense), "sparse reconstruction differs"
        dense_bytes = dense.nbytes
        sparse_bytes = int(counts.sum()) * 8 + counts.nbytes
        return {"maps": int(dense.shape[0]), "max_count": int(counts.max()),
                "cap": cap, "transfer_shrink":
                round(dense_bytes / max(sparse_bytes, 1), 1)}


n_fail = sum(1 for r in RESULTS.values() if not r["ok"])
summary = {"device": str(DEV), "on_tpu": ON_TPU, "fast": FAST,
           "n_checks": len(RESULTS), "n_fail": n_fail,
           "total_seconds": round(sum(r["seconds"] for r in RESULTS.values()), 1),
           "checks": RESULTS}
print(json.dumps(summary))
if ON_TPU and n_fail == 0:
    (Path("/root/repo") / "CHIP_CI.json").write_text(
        json.dumps(summary, indent=1))
subprocess.run(["rm", "-rf", str(TMP)])
sys.exit(1 if n_fail else 0)
