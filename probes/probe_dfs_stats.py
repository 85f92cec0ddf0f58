"""Measure the assignment-search shape: frontier widths of the always-None
expansion tree, per-ligand level/candidate/slot counts, across the bench
synthetic pool and the generated real-chemistry corpus.

This sizes the fixed-width device DFS (VERDICT round-3 item 1): the device
program pays O(W x Lmax x K) regardless of pruning, so W must cover ~all
ligands with a host fallback for the tail.

Run: JAX_PLATFORMS=cpu python probes/probe_dfs_stats.py
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path[:0] = ["/root/repo", "/root/repo/tests"]

import numpy as np

from bench import make_synthetic_ligands, make_synthetic_model
from pharmaconet_tpu.scoring.batch_screen import (
    BatchScreener,
    PackedLigand,
    build_batch,
    compact_pair_table,
    score_blocks_device,
)


def simulate_bfs(batch, table, li: int):
    """Always-None expansion of one ligand's tree; returns per-level
    frontier widths (node counts) and the visited gated-tree size proxy."""
    start, _end = batch.pair_slices[li]
    active, cands = batch.candidates[li]
    c = int(batch.num_conformers[li])
    n = len(active)
    if n == 0 or c == 0:
        return [1], 0, 0
    cand_counts = [len(cands[l]) for l in active]
    # row offsets in the packer's emission order
    self_off = []
    row = 0
    for l in range(n):
        self_off.append(row)
        row += cand_counts[l]
    slots = row
    cross_off = {}
    for i1 in range(n):
        for i2 in range(i1 + 1, n):
            cross_off[(i1, i2)] = row
            row += cand_counts[i1] * cand_counts[i2]

    def cross_row(i1, j1, i2, j2):
        return start + cross_off[(i1, i2)] + j1 * cand_counts[i2] + j2

    # frontier: list of (assign tuple, alive mask [c])
    frontier = [((), np.ones(c, dtype=bool))]
    widths = [1]
    for lv in range(n):
        new = []
        for assign, alive in frontier:
            # candidate children
            for j in range(cand_counts[lv]):
                a2 = alive.copy()
                ok = True
                for k, jk in enumerate(assign):
                    if jk < 0:
                        continue
                    pair = table[cross_row(k, jk, lv, j), :c]
                    a2 &= pair > 0
                if a2.any():
                    new.append((assign + (j,), a2))
            # None child always present in the relaxed tree
            new.append((assign + (-1,), alive))
        frontier = new
        widths.append(len(frontier))
    return widths, slots, max(cand_counts)


def gated_leafs(batch, table, li: int):
    """Exact port of the gated DFS (match_dfs.cpp); returns (n_leaves,
    n_nodes, rows_per_leaf list, score) for one ligand."""
    start, _end = batch.pair_slices[li]
    active, cands = batch.candidates[li]
    c = int(batch.num_conformers[li])
    n = len(active)
    if n == 0 or c == 0:
        return 0, 0, [], 0.0
    cand_counts = [len(cands[l]) for l in active]
    self_off = []
    row = 0
    for l in range(n):
        self_off.append(row)
        row += cand_counts[l]
    cross_off = {}
    for i1 in range(n):
        for i2 in range(i1 + 1, n):
            cross_off[(i1, i2)] = row
            row += cand_counts[i1] * cand_counts[i2]

    def srow(lv, j):
        return start + self_off[lv] + j

    def xrow(i1, j1, i2, j2):
        return start + cross_off[(i1, i2)] + j1 * cand_counts[i2] + j2

    stats = {"leaves": 0, "nodes": 0, "rows": []}
    best = np.zeros(c, dtype=np.float64)

    def rec(level, assign, ps, alive, num_matches):
        stats["nodes"] += 1
        if level == n:
            stats["leaves"] += 1
            n_assigned = sum(1 for a in assign if a >= 0)
            stats["rows"].append(n_assigned + n_assigned * (n_assigned - 1) // 2)
            np.maximum(best, np.where(alive, ps, 0.0), out=best)
            return 0  # matches below a leaf
        max_matches = 0
        any_child = False
        for j in range(cand_counts[level]):
            a2 = alive.copy()
            for k in range(level):
                if assign[k] >= 0:
                    a2 &= table[xrow(k, assign[k], level, j), :c] > 0
            if not a2.any():
                continue
            any_child = True
            ps2 = ps + table[srow(level, j), :c].astype(np.float64)
            for k in range(level):
                if assign[k] >= 0:
                    ps2 = ps2 + table[xrow(k, assign[k], level, j), :c]
            nm = rec(level + 1, assign + [j], ps2, a2, num_matches + 1)
            max_matches = max(max_matches, nm + 1)
        if not any_child or num_matches + max_matches < 5:
            nm = rec(level + 1, assign + [-1], ps, alive, num_matches)
            max_matches = max(max_matches, nm)
        return max_matches

    rec(0, [], np.zeros(c, dtype=np.float64), np.ones(c, dtype=bool), 0)
    return stats["leaves"], stats["nodes"], stats["rows"], float(best.mean())


def collect_gated(batch, table, tag):
    n_lig = len(batch.ligand_clusters)
    leaves, nodes, rows = [], [], []
    for li in range(n_lig):
        lf, nd, rw, _s = gated_leafs(batch, table, li)
        leaves.append(lf)
        nodes.append(nd)
        rows.extend(rw)
    leaves = np.array(leaves)
    rows = np.array(rows) if rows else np.zeros(1)
    print(f"[GATED {tag}] ligands={n_lig}")
    print(f"  leaves: max={leaves.max()} p99={np.percentile(leaves,99):.0f} p90={np.percentile(leaves,90):.0f} mean={leaves.mean():.1f} total={leaves.sum()}")
    print(f"  nodes:  mean={np.mean(nodes):.0f} max={max(nodes)}")
    print(f"  rows/leaf: max={rows.max():.0f} p99={np.percentile(rows,99):.0f} mean={rows.mean():.1f}")


def collect(batch, table, tag):
    n_lig = len(batch.ligand_clusters)
    maxw, n_active, smax, kmax = [], [], [], []
    for li in range(n_lig):
        widths, slots, k = simulate_bfs(batch, table, li)
        maxw.append(max(widths))
        n_active.append(len(batch.candidates[li][0]))
        smax.append(slots)
        kmax.append(k)
    maxw = np.array(maxw)
    print(f"[{tag}] ligands={n_lig}")
    print(f"  n_active: max={max(n_active)} p99={np.percentile(n_active,99):.0f} mean={np.mean(n_active):.1f}")
    print(f"  slots(S): max={max(smax)} p99={np.percentile(smax,99):.0f} mean={np.mean(smax):.1f}")
    print(f"  cand(K):  max={max(kmax)}")
    for w in (16, 32, 64, 128, 256, 512, 1024, 4096):
        frac = float((maxw <= w).mean())
        print(f"  frontier<={w:5d}: {frac*100:6.2f}%")
    print(f"  frontier max={maxw.max()} p99={np.percentile(maxw,99):.0f} p90={np.percentile(maxw,90):.0f} mean={maxw.mean():.0f}")


def table_for(model, packed):
    from pharmaconet_tpu.scoring.batch_screen import host_prune_mask

    screener = BatchScreener(model, engine="xla")
    batch = build_batch(screener.packed_model, packed)
    expanded = np.asarray(screener.run_device(batch))
    table = compact_pair_table(batch, expanded)
    prune = host_prune_mask(batch, screener.packed_model)
    table[: len(prune)][prune] = -1.0
    return batch, table


def main():
    model = make_synthetic_model(num_clusters=20, seed=0)
    packed = make_synthetic_ligands(512, seed=1)  # already PackedLigand
    batch, table = table_for(model, packed)
    collect(batch, table, "bench synthetic pool (20-cluster model)")
    collect_gated(batch, table, "bench synthetic pool (20-cluster model)")

    # sanity: gated port reproduces the production DFS scores
    from pharmaconet_tpu.scoring.batch_screen import _dfs_scores
    ref_scores = _dfs_scores(batch, table)
    for li in (0, 1, 7, 100, 311):
        *_x, s = gated_leafs(batch, table, li)
        assert abs(s - ref_scores[li]) < 1e-3, (li, s, ref_scores[li])
    print("  gated port score check vs production DFS: ok")

    # real-ish corpus: the verify generator molecules
    from test_cli_scale import _random_molecule, _to_sdf
    from pharmaconet_tpu.scoring.ligand import Ligand

    rng = np.random.default_rng(42)
    packed2 = []
    import tempfile, pathlib
    with tempfile.TemporaryDirectory() as td:
        for i in range(512):
            e, c, b = _random_molecule(rng)
            p = pathlib.Path(td) / f"l{i}.sdf"
            p.write_text(_to_sdf(f"l{i}", e, c, b))
            lig = Ligand.load_from_file(p)
            pk = PackedLigand.from_ligand(lig)
            if pk.clusters:
                packed2.append(pk)
    batch2, table2 = table_for(model, packed2)
    collect(batch2, table2, "sdf corpus (20-cluster model)")
    collect_gated(batch2, table2, "sdf corpus (20-cluster model)")

    big = make_synthetic_model(num_clusters=40, seed=7)
    batch3, table3 = table_for(big, packed)
    collect(batch3, table3, "bench synthetic pool (40-cluster model)")
    collect_gated(batch3, table3, "bench synthetic pool (40-cluster model)")


if __name__ == "__main__":
    main()
