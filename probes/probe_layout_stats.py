"""Measure the screening batch's block/pair/group structure on the bench
pool — grounding data for a "v3" kernel contract (group-table select +
block-major rows) that would replace the per-row gtab stream.

Key question: the gtab stream ([3, P, tile] per tile, ~98 KB) expands a
tiny set of unique (mu, std, w) tables — one per (model cluster pair,
ligand-node type-mask pair) "group". How many distinct groups exist, how
large are they (mn), and what would each candidate layout stream/compute?
"""

from __future__ import annotations

import sys
from collections import Counter

import numpy as np

sys.path.insert(0, ".")

from bench import make_synthetic_ligands, make_synthetic_model
from pharmaconet_tpu.scoring.batch_screen import (
    BLOCK_P,
    PackedModel,
    build_batch,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    model = PackedModel.from_model(make_synthetic_model())
    ligands = make_synthetic_ligands(n, num_conformers=4)
    batch = build_batch(model, ligands)

    ns = len(batch.sub_d_idx)
    nb = len(batch.block_mn)
    npair = len(batch.pair_threshold)
    total_mn = int(batch.block_mn.sum())
    c = batch.cmax

    print(f"ligands={n} NS={ns} NB={nb} NP={npair} sum_mn={total_mn} cmax={c}")
    print(f"rows/block: NS/NB={ns/nb:.2f}")
    print(f"slot fill: sum_mn/(NS*P)={total_mn/(ns*BLOCK_P):.3f}")

    mn_hist = Counter(batch.block_mn.tolist())
    print("mn histogram (top):", sorted(mn_hist.items())[:20])
    print("mn max:", batch.block_mn.max(), " p99:",
          int(np.percentile(batch.block_mn, 99)))

    blocks_per_pair = np.bincount(batch.block_pair, minlength=npair)
    print(f"blocks/pair: mean={blocks_per_pair.mean():.2f} "
          f"max={blocks_per_pair.max()} p99={int(np.percentile(blocks_per_pair, 99))}")
    rows_per_pair = np.bincount(batch.block_pair[batch.sub_block], minlength=npair)
    print(f"rows/pair (today): mean={rows_per_pair.mean():.2f} "
          f"max={rows_per_pair.max()} p99={int(np.percentile(rows_per_pair, 99))}")

    # --- group analysis -----------------------------------------------------
    # group = (m1, m2, mask_u, mask_v): determines the block's [M, N]
    # (mu, std, w) table, mn, and fail threshold. Reconstruct per block.
    # pair_meta = (ligand, l1, l2, m1, m2, is_self); block u/v masks come
    # from the ligand node masks via sub_d_idx of the block's first row.
    ln = batch.ln
    first_row = np.zeros(nb, dtype=np.int64)
    seen = np.zeros(nb, dtype=bool)
    for row in range(ns - 1, -1, -1):
        first_row[batch.sub_block[row]] = row
    seen[:] = True
    d_idx = batch.sub_d_idx[first_row].astype(np.int64)
    li = d_idx // (ln * ln)
    rem = d_idx % (ln * ln)
    u = rem // ln
    v = rem % ln

    masks = np.zeros((len(ligands), ln), dtype=np.int64)
    for i, lig in enumerate(ligands):
        masks[i, : len(lig.node_mask)] = lig.node_mask
    mask_u = masks[li, u]
    mask_v = masks[li, v]

    meta = batch.pair_meta[batch.block_pair]
    m1 = meta[:, 3].astype(np.int64)
    m2 = meta[:, 4].astype(np.int64)
    is_self = meta[:, 5].astype(np.int64)

    gkey = (((is_self * 64 + m1) * 64 + m2) * 256 + mask_u) * 256 + mask_v
    uniq_g, g_inv, g_counts = np.unique(gkey, return_inverse=True, return_counts=True)
    print(f"distinct groups (model-wide): {len(uniq_g)}")
    g_mn = np.zeros(len(uniq_g), dtype=np.int64)
    g_mn[g_inv] = batch.block_mn  # all blocks of a group share mn
    same = np.all(g_mn[g_inv] == batch.block_mn)
    print(f"group determines mn: {same}")
    print(f"group table bytes (sum mn*3*4): {int(g_mn.sum() * 12)}")
    print(f"blocks per group: mean={g_counts.mean():.1f} max={g_counts.max()}")

    # groups per (m1, m2) family — per-tile table size if family-sorted
    fam = (is_self * 64 + m1) * 64 + m2
    fam_groups = Counter()
    for f, g in set(zip(fam.tolist(), gkey.tolist())):
        fam_groups[f] += 1
    fg = np.array(sorted(fam_groups.values()))
    print(f"families={len(fam_groups)} groups/family: mean={fg.mean():.1f} "
          f"max={fg.max()} p99={int(np.percentile(fg, 99))}")

    # --- candidate layout costs --------------------------------------------
    tile = 1024
    t_today = -(-ns // tile)
    stream_today = t_today * (3 * BLOCK_P * 4 + 4 * c + 7 * 4 + 4 * c) * tile
    print(f"\ntoday (dt kernel): T={t_today} stream~{stream_today/1e6:.0f} MB "
          f"exp={ns * BLOCK_P * c / 1e6:.0f}M")

    # v3a: one row per block; per-tile table [G_CAP, 3*MN_CAP+2]; buckets by mn
    for caps in ([8, 16, 64], [16, 64], [64]):
        rows = 0
        expw = 0
        for mn, cnt in mn_hist.items():
            cap = next(x for x in caps if mn <= x)
            rows += cnt
            expw += cnt * cap
        t3 = -(-rows // tile)
        g_cap = 32
        stream3 = t3 * ((4 * c + 4 + 4 * 4) * tile + g_cap * (3 * max(caps) + 4) * 4)
        print(f"v3a caps={caps}: rows={rows} T={t3} stream~{stream3/1e6:.0f} MB "
              f"exp={expw * c / 1e6:.0f}M")


if __name__ == "__main__":
    main()
