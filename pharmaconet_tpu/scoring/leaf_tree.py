"""Prepack-baked leaf evaluation: the assignment search without a search.

The reference's cluster-assignment DFS (/root/reference/src/pmnet/scoring/
tree.py:55-104 + graph_match.py:94-109) is the last host-side stage of
stored screening (VERDICT round-3 weak #2): ~25-34 ms per 2048-ligand batch
per core, so single-chip throughput scaled with host cores. This module
removes it from the screen-time path entirely:

* The set of leaves the gated DFS VISITS depends on the pair-score table
  only through sign bits (conformer pruning on pair > 0, tree.py:81) and
  the match-count gate (the None branch allowed when the best completable
  match count stays < 5, tree.py:98-101). Tile stores pin the model AND
  the screening weights (tiled_store.model_fingerprint), so the visited
  leaf set is STATIC per store and can be enumerated once at prepack time
  (native/match_dfs.cpp match_dfs_leaves; Python fallback below).

* Each leaf's per-conformer score is a plain sum of table rows along its
  path (self rows of assigned clusters + cross rows of assigned pairs),
  valid while every cross row stays > 0. That is a dense masked gather +
  reduction: `leaf_scores_device` evaluates ALL leaves of a batch in one
  XLA program chained behind the gaussian kernel — the screen-time host
  tail collapses to reading [B] floats.

Numerical note: the baked leaf set is exact for the table the PREPACK
computed. The screen-time device recomputes the same f32 op sequence, so
sign bits agree unless a pair score lands exactly on a ULP boundary
between backends (prepack on CPU, screen on TPU) — the same measure-zero
exposure the repo-standard rtol 2e-5 / atol 1e-4 score tolerance already
absorbs, and CI pins leaf-path scores against the host DFS on shared
tables (tests/test_leaf_tree.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

MIN_MATCHES_FOR_SKIP = 5

# sentinel table rows appended on device: +0 = score 0 (padding / empty
# pairs: compact_pair_table scores them 0.0), +1 = score -1 (pruned pairs:
# host_prune_mask forces -1.0)
SENT_ZERO = 0
SENT_NEG = 1


# ==========================================================================
# Leaf enumeration (prepack time)
# ==========================================================================
def _ligand_offsets(n_active: int, cand_counts: np.ndarray):
    """(cross_off [n, n] i64 ligand-relative, self_off [n] i64, rows)."""
    self_off = np.zeros(n_active, dtype=np.int64)
    row = 0
    for l in range(n_active):
        self_off[l] = row
        row += int(cand_counts[l])
    cross_off = np.full((n_active, n_active), -1, dtype=np.int64)
    for i1 in range(n_active):
        for i2 in range(i1 + 1, n_active):
            cross_off[i1, i2] = row
            row += int(cand_counts[i1]) * int(cand_counts[i2])
    return cross_off, self_off, row


def _enumerate_python(batch, table: np.ndarray, lmax: int):
    """Reference Python port of match_dfs_leaves (same gated semantics)."""
    pair_starts, conformers, active_offsets, cand_counts = _dfs_arrays(batch)
    num = len(conformers)
    leaves: list[np.ndarray] = []
    offsets = np.zeros(num + 1, dtype=np.int64)
    for li in range(num):
        offsets[li] = len(leaves)
        a_lo, a_hi = int(active_offsets[li]), int(active_offsets[li + 1])
        n = a_hi - a_lo
        c = int(conformers[li])
        if n == 0 or c == 0:
            continue
        cc = cand_counts[a_lo:a_hi]
        cross_off, _self_off, rows = _ligand_offsets(n, cc)
        tl = table[int(pair_starts[li]) : int(pair_starts[li]) + rows, :c]
        pos = tl > 0  # [rows, c]
        assign = np.full(lmax, -1, dtype=np.int8)

        def rec(level, alive, num_matches):
            if level >= n:
                leaves.append(assign.copy())
                return 0
            max_matches = 0
            any_child = False
            for j in range(int(cc[level])):
                m = alive
                for k in range(level):
                    jk = assign[k]
                    if jk < 0:
                        continue
                    r = cross_off[k, level] + int(jk) * int(cc[level]) + j
                    m = m & pos[r]
                    if not m.any():
                        break
                if not m.any():
                    continue
                any_child = True
                assign[level] = j
                nm = rec(level + 1, m, num_matches + 1) + 1
                max_matches = max(max_matches, nm)
            if not any_child or num_matches + max_matches < MIN_MATCHES_FOR_SKIP:
                assign[level] = -1
                nm = rec(level + 1, alive, num_matches)
                max_matches = max(max_matches, nm)
            assign[level] = -1
            return max_matches

        rec(0, np.ones(c, dtype=bool), 0)
    offsets[num] = len(leaves)
    out = (
        np.stack(leaves).astype(np.int8)
        if leaves
        else np.zeros((0, lmax), np.int8)
    )
    return out, offsets


def _dfs_arrays(batch):
    """(pair_starts, conformers, active_offsets, cand_counts) for a
    ScreenBatch / TiledBatch / V3Batch / stored batch (duck-typed)."""
    cached = getattr(batch, "dfs_arrays", None)
    if cached is not None:
        return cached
    num = len(batch.ligand_clusters)
    pair_starts = np.array([s for s, _ in batch.pair_slices], dtype=np.int64)
    conformers = batch.num_conformers.astype(np.int32)[:num]
    active_offsets = [0]
    cand_counts: list[int] = []
    for active, cands in batch.candidates:
        cand_counts.extend(len(cands[l]) for l in active)
        active_offsets.append(len(cand_counts))
    return (
        pair_starts,
        np.ascontiguousarray(conformers),
        np.asarray(active_offsets, dtype=np.int32),
        np.asarray(cand_counts, dtype=np.int32)
        if cand_counts
        else np.zeros(0, np.int32),
    )


# |pair score| below this margin is treated as sign-unstable between the
# prepack backend and the screen-time device. A cross-pair score is either
# exactly -1.0 (fail-gated; the gate compares f32 ops on STORE-SHIPPED
# dt/mu/inv inputs, so it is reproducible) or a sum of positive gaussian
# terms — its sign can only flip where one backend flushes the subnormal/
# underflow tail to exact 0.0 and the other keeps a tiny positive value
# (TPU flushes subnormals; CPU exp keeps them). That region is bounded by
# ~mn_cap * f32_min_normal ~ 3e-36; 1e-30 covers it with 5 orders of
# margin while demoting essentially nothing (a 1e-5 margin demoted ~half
# the library: tiny positive gaussian tails are common and sign-SAFE).
SIGN_EPS = 1e-30


def near_zero_gate_flags(
    batch,
    table: np.ndarray,
    pair_end_rows: np.ndarray,
    prune: np.ndarray,
    eps: float = SIGN_EPS,
) -> np.ndarray:
    """[num] bool: the ligand has a gate-relevant (cross-pair, real kernel
    row, unpruned) cell with |value| < eps among its live conformers.

    Cross rows are the only values whose SIGN the DFS gates on (conformer
    pruning on pair > 0, reference tree.py:81). Compaction sentinels
    (empty pairs, exactly 0.0 on both host and device) and pruned rows
    (forced -1.0) are sign-exact by construction and excluded. Real rows
    computed as exact 0.0 (fully underflowed sums) ARE flagged — the
    other backend may keep a subnormal positive there. Residual exposure:
    a fail-count gate comparison landing within 1 ULP of its 4.0
    boundary under different fusion (FMA) choices — per-value measure
    zero, absorbed by the repo-standard score tolerance."""
    pair_starts, conformers, active_offsets, cand_counts = _dfs_arrays(batch)
    num = len(conformers)
    bounds = np.append(pair_starts, len(pair_end_rows)).astype(np.int64)
    flags = np.zeros(num, bool)
    for li in range(num):
        a_lo, a_hi = int(active_offsets[li]), int(active_offsets[li + 1])
        n_self = int(cand_counts[a_lo:a_hi].sum())
        lo = int(bounds[li]) + n_self
        hi = int(bounds[li + 1])
        c = int(conformers[li])
        if hi <= lo or c == 0:
            continue
        real = (pair_end_rows[lo:hi] >= 0) & ~prune[lo:hi]
        if not real.any():
            continue
        sub = table[lo:hi][real][:, :c]
        flags[li] = bool((np.abs(sub) < eps).any())
    return flags


def enumerate_leaves(batch, table: np.ndarray, native: bool | None = None):
    """(assign [NL, lmax] i8, leaf_offsets [B+1] i64) of the gated tree.

    `table` must be the FINAL host-semantics pair table: empty pairs 0.0,
    pruned pairs -1.0 (what _dfs_scores consumes)."""
    pair_starts, conformers, active_offsets, cand_counts = _dfs_arrays(batch)
    num = len(conformers)
    lmax = int(
        np.max(np.diff(active_offsets)) if num else 1
    )
    lmax = max(lmax, 1)
    if native is not False:
        from ..native import get_match_dfs_leaves

        fn = get_match_dfs_leaves()
        if fn is not None:
            table_c = np.ascontiguousarray(table, dtype=np.float32)
            cap = max(64 * num, 1024)
            for _ in range(8):
                assign = np.empty((cap, lmax), dtype=np.int8)
                offsets = np.zeros(num + 1, dtype=np.int64)
                total = fn(
                    num, table_c, table_c.shape[1],
                    np.ascontiguousarray(pair_starts),
                    np.ascontiguousarray(conformers),
                    np.ascontiguousarray(active_offsets),
                    np.ascontiguousarray(cand_counts)
                    if len(cand_counts) else np.zeros(0, np.int32),
                    lmax, cap, assign, offsets,
                )
                if total < 0:
                    raise RuntimeError("match_dfs_leaves rejected the batch")
                if total <= cap:
                    return assign[:total], offsets
                cap = int(total)
            raise RuntimeError("match_dfs_leaves capacity did not converge")
        if native is True:
            raise RuntimeError("native match_dfs_leaves unavailable")
    return _enumerate_python(batch, table, lmax)

# ==========================================================================
# Dense window layout (prepack time)
# ==========================================================================
# The first device formulation of leaf evaluation gathered [NL, R] table
# rows per batch (leaf-major row indices). Chip-measured marginal:
# 54.6 ms/2048-batch — TPU row gathers run ~5 ns/row, 25x the whole pair
# kernel. This layout instead packs each ligand's pair rows into a window
# of w_cap slots ([B, W, C] table via ONE take) and bakes the leaf
# structure as bit-packed one-hot matrices, so leaf evaluation is two MXU
# batch matmuls. Heavy-tail ligands (leaves > l_cap or referenced pairs >
# w_cap, ~p97 caps) are demoted to the host DFS over a small
# device-gathered sub-table.
#
# Window slots hold only pairs REFERENCED by some leaf (a self row of an
# assigned cluster or a cross row of an assigned pair). Measured on the
# bench pool, leaves touch just 13% of pair rows (66/ligand median vs 224
# total pairs), so referenced-only windows halve w_cap and cut the
# screen-time row gather — the dominant leaf-chain cost at ~5 ns/slot —
# by ~2x (probes/probe_gather_variants.py).


@dataclass
class DenseLeafBatch:
    """Device + host arrays for one batch's baked leaves (window layout).

    plane_score bit b of [B, L, W/8] marks window slot as summed into the
    leaf; plane_cross marks it as a cross pair (leaf dies if its value
    <= 0 — the tree's per-conformer pruning, reference tree.py:81).
    ends2 maps window slots to kernel row ids (NBT = appended zero row =
    empty pair -> 0.0, the host-compaction value). prune_w folds the
    static prune mask (-1.0) into the window on device."""

    plane_score: np.ndarray  # [B, L, W//8] u8
    plane_cross: np.ndarray  # [B, L, W//8] u8
    prune_w: np.ndarray  # [B, W] bool
    ends2: np.ndarray  # [B*W] i32 into [NBT]+zero-sentinel kernel rows
    out_live: np.ndarray  # [n_out] i32 live-ligand indices (DFS fallback)
    out_ends: np.ndarray  # [NOUT_pad] i32
    out_prune: np.ndarray  # [NOUT_pad] bool
    out_pair_starts: np.ndarray  # [n_out] i64 into the out table
    out_conformers: np.ndarray  # [n_out] i32
    out_active_offsets: np.ndarray  # [n_out+1] i32
    out_cand_counts: np.ndarray  # [sum active] i32
    n_out_rows: int  # real rows in out_ends (<= NOUT_pad)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _leaf_coords(a: np.ndarray, cc: np.ndarray):
    """(leaf_idx, row_idx, is_cross) flat bit coordinates of the rows the
    leaves in `a` [Lb, n] reference: the self row of every assigned
    cluster plus the cross row of every assigned pair."""
    leaves_b, n = a.shape
    cross_off, self_off, _ = _ligand_offsets(n, cc)
    assigned = a >= 0
    lidx = np.repeat(np.arange(leaves_b), n)
    srows = (self_off[None, :] + a).ravel()
    svalid = assigned.ravel()
    parts_l = [lidx[svalid]]
    parts_r = [srows[svalid]]
    parts_x = [np.zeros(int(svalid.sum()), bool)]
    iu, ju = np.triu_indices(n, k=1)
    if len(iu):
        xr = (
            cross_off[iu, ju][None, :]
            + a[:, iu] * cc[ju][None, :]
            + a[:, ju]
        ).ravel()
        xvalid = (assigned[:, iu] & assigned[:, ju]).ravel()
        lxid = np.repeat(np.arange(leaves_b), len(iu))
        parts_l.append(lxid[xvalid])
        parts_r.append(xr[xvalid])
        parts_x.append(np.ones(int(xvalid.sum()), bool))
    return (
        np.concatenate(parts_l),
        np.concatenate(parts_r),
        np.concatenate(parts_x),
    )


def leaf_window_stats(
    assign: np.ndarray,
    offsets: np.ndarray,
    active_offsets: np.ndarray,
    cand_counts: np.ndarray,
):
    """Per-ligand (n_referenced_rows, n_leaves) — the sizing inputs for
    the store-wide w_cap/l_cap choice (write_v3_store pass 2b)."""
    num = len(offsets) - 1
    nref = np.zeros(num, np.int64)
    leaves = np.diff(offsets).astype(np.int64)
    for li in range(num):
        lo, hi = int(offsets[li]), int(offsets[li + 1])
        if hi == lo:
            continue
        a_lo, a_hi = int(active_offsets[li]), int(active_offsets[li + 1])
        n = a_hi - a_lo
        cc = cand_counts[a_lo:a_hi].astype(np.int64)
        a = assign[lo:hi, :n].astype(np.int64)
        _, rows_l, _ = _leaf_coords(a, cc)
        nref[li] = len(np.unique(rows_l))
    return nref, leaves


def build_leaf_dense(
    assign: np.ndarray,
    offsets: np.ndarray,
    pair_starts: np.ndarray,
    conformers: np.ndarray,
    active_offsets: np.ndarray,
    cand_counts: np.ndarray,
    pair_end_rows: np.ndarray,
    prune: np.ndarray,
    l_cap: int,
    w_cap: int,
    nbt: int,
    batch_size: int,
    nout_pad: int | None = None,
    force_demote: np.ndarray | None = None,
) -> DenseLeafBatch:
    """Bake the enumerated leaves into the dense window layout.

    All shape params are store-wide statics; a ligand whose leaf count or
    leaf-referenced row count exceeds the caps joins the outlier (host
    DFS) set. Window slot j of a ligand holds its j-th REFERENCED pair
    row (sorted ligand-relative order) — rows no leaf touches get no
    slot, which halves w_cap on the bench pool.

    force_demote [num] bool sends a ligand to the outlier set regardless
    of caps — used for ligands whose gate-relevant pair scores sit within
    epsilon of zero, where prepack-host vs screen-device f32 rounding
    could flip a sign bit and change the visited leaf set (the outlier
    DFS reruns the search on screen-time values, so it is always exact)."""
    num = len(conformers)
    w8 = w_cap // 8
    assert w_cap % 8 == 0
    plane_s = np.zeros((batch_size, l_cap, w_cap), bool)
    plane_c = np.zeros((batch_size, l_cap, w_cap), bool)
    prune_w = np.zeros((batch_size, w_cap), bool)
    ends2 = np.full(batch_size * w_cap, nbt, np.int32)
    np_total = len(pair_end_rows)
    row_of = np.where(pair_end_rows >= 0, pair_end_rows, nbt).astype(np.int32)
    bounds = np.append(pair_starts, np_total).astype(np.int64)

    out_live: list[int] = []
    out_rows_list: list[np.ndarray] = []
    out_prune_list: list[np.ndarray] = []
    out_ps: list[int] = []
    out_conf: list[int] = []
    out_ao: list[int] = [0]
    out_cc: list[np.ndarray] = []
    out_at = 0

    for li in range(num):
        ps, pe = int(bounds[li]), int(bounds[li + 1])
        rows_b = pe - ps
        lo, hi = int(offsets[li]), int(offsets[li + 1])
        leaves_b = hi - lo
        a_lo, a_hi = int(active_offsets[li]), int(active_offsets[li + 1])

        def demote() -> None:
            out_live.append(li)
            out_rows_list.append(row_of[ps:pe])
            out_prune_list.append(prune[ps:pe])
            out_ps.append(out_at)
            out_conf.append(int(conformers[li]))
            out_cc.append(cand_counts[a_lo:a_hi])
            out_ao.append(out_ao[-1] + (a_hi - a_lo))

        if leaves_b > l_cap or (
            force_demote is not None and force_demote[li]
        ):
            demote()
            out_at += rows_b
            continue
        if leaves_b == 0:
            # no leaves -> score 0 with an all-sentinel (empty) window
            continue
        n = a_hi - a_lo
        cc = cand_counts[a_lo:a_hi].astype(np.int64)
        a = assign[lo:hi, :n].astype(np.int64)  # [Lb, n]
        lidx, rows_l, is_x = _leaf_coords(a, cc)
        ref = np.unique(rows_l)  # referenced ligand-relative rows, sorted
        if len(ref) > w_cap:
            demote()
            out_at += rows_b
            continue
        ends2[li * w_cap : li * w_cap + len(ref)] = row_of[ps + ref]
        prune_w[li, : len(ref)] = prune[ps + ref]
        slot = np.searchsorted(ref, rows_l)
        plane_s[li, lidx, slot] = True
        plane_c[li, lidx[is_x], slot[is_x]] = True

    n_out_rows = out_at
    nout = nout_pad if nout_pad is not None else max(_round_up(out_at, 8), 8)
    if out_at > nout:
        raise ValueError(f"outlier rows {out_at} exceed nout_pad {nout}")
    out_ends = np.full(nout, nbt, np.int32)
    out_pr = np.zeros(nout, bool)
    if out_rows_list:
        out_ends[:out_at] = np.concatenate(out_rows_list)
        out_pr[:out_at] = np.concatenate(out_prune_list)
    return DenseLeafBatch(
        plane_score=np.packbits(plane_s, axis=2),
        plane_cross=np.packbits(plane_c, axis=2),
        prune_w=prune_w,
        ends2=ends2,
        out_live=np.asarray(out_live, np.int32),
        out_ends=out_ends,
        out_prune=out_pr,
        out_pair_starts=np.asarray(out_ps, np.int64),
        out_conformers=np.asarray(out_conf, np.int32),
        out_active_offsets=np.asarray(out_ao, np.int32),
        out_cand_counts=(
            np.concatenate(out_cc).astype(np.int32)
            if out_cc else np.zeros(0, np.int32)
        ),
        n_out_rows=n_out_rows,
    )


# ==========================================================================
# Bucketed window layout (prepack time) — round-5 gather attack
# ==========================================================================
# The single-cap window layout pays the ~5 ns/slot TPU row gather on
# B x W_cap slots even though the median ligand references ~66 rows vs
# the p97 cap of 384 (probe_leaf_phases: 3.34 of the 6.01 ms v3-leaf
# chain is this one take). Bucketing ligands by their referenced-row
# count into store-derived width classes (multiples of 64) shrinks the
# gathered slot count to ~E[ceil(nref/64)*64] per ligand — the windows
# and one-hot planes of narrow ligands stop paying for the wide tail.
# Each bucket k holds Bk ligands (store-wide capacity) with caps
# (Lk, Wk); evaluation is the same two-MXU-matmul program per bucket,
# with a final scatter back to batch order. Outlier (host DFS) handling
# is shared with the single layout.


@dataclass
class DenseLeafBucket:
    """One width class of a bucketed leaf bake (arrays padded to Bk)."""

    lig_idx: np.ndarray  # [Bk] i32 live-ligand index; pad = batch_size
    conf: np.ndarray  # [Bk] i32 conformer counts (1 for pads)
    plane_score: np.ndarray  # [Bk, Lk, Wk//8] u8
    plane_cross: np.ndarray  # [Bk, Lk, Wk//8] u8
    prune_w: np.ndarray  # [Bk, Wk] bool
    ends2: np.ndarray  # [Bk*Wk] i32 into [NBT]+zero-sentinel kernel rows


@dataclass
class LeafBake:
    """Bucketed bake of one batch: width-class buckets + the shared
    outlier (host DFS) arrays — same semantics as DenseLeafBatch's."""

    buckets: list[DenseLeafBucket]
    out_live: np.ndarray
    out_ends: np.ndarray
    out_prune: np.ndarray
    out_pair_starts: np.ndarray
    out_conformers: np.ndarray
    out_active_offsets: np.ndarray
    out_cand_counts: np.ndarray
    n_out_rows: int


def choose_bucket_edges(
    nref_baked: np.ndarray, granule: int = 64, max_buckets: int = 4
) -> list[int]:
    """Store-wide window width classes from the baked-ligand referenced-
    row distribution: quantile edges rounded up to `granule`, deduplicated
    ascending, last edge covering the maximum."""
    sel = nref_baked[nref_baked > 0]
    if len(sel) == 0:
        return [granule]
    qs = (0.5, 0.8, 0.95, 1.0)[-max_buckets:]
    rnd = lambda v: int(((max(int(v), 1) + granule - 1) // granule) * granule)  # noqa: E731
    edges = sorted({rnd(np.quantile(sel, q)) for q in qs})
    if edges[-1] < rnd(sel.max()):
        edges[-1] = rnd(sel.max())
    return edges


def build_leaf_buckets(
    assign: np.ndarray,
    offsets: np.ndarray,
    pair_starts: np.ndarray,
    conformers: np.ndarray,
    active_offsets: np.ndarray,
    cand_counts: np.ndarray,
    pair_end_rows: np.ndarray,
    prune: np.ndarray,
    bucket_specs: list[tuple[int, int, int]],  # (Bk, Lk, Wk) store-wide
    nbt: int,
    batch_size: int,
    nout_pad: int | None = None,
    force_demote: np.ndarray | None = None,
) -> LeafBake:
    """Bake one batch's enumerated leaves into width-class buckets.

    A ligand lands in the narrowest bucket whose (Lk, Wk) covers its
    (leaves, referenced rows); force_demote or no fitting bucket sends it
    to the outlier host-DFS set; zero-leaf ligands stay out of every
    bucket (score 0 by construction). Raises if a bucket overflows its
    store-wide Bk capacity (the writer sizes capacities from the same
    stats, so this is a programming error, not data)."""
    num = len(conformers)
    np_total = len(pair_end_rows)
    row_of = np.where(pair_end_rows >= 0, pair_end_rows, nbt).astype(np.int32)
    bounds = np.append(pair_starts, np_total).astype(np.int64)

    buckets = [
        DenseLeafBucket(
            lig_idx=np.full(bk, batch_size, np.int32),
            conf=np.ones(bk, np.int32),
            plane_score=np.zeros((bk, lk, wk), bool),
            plane_cross=np.zeros((bk, lk, wk), bool),
            prune_w=np.zeros((bk, wk), bool),
            ends2=np.full(bk * wk, nbt, np.int32),
        )
        for bk, lk, wk in bucket_specs
    ]
    fill = [0] * len(bucket_specs)

    out_live: list[int] = []
    out_rows_list: list[np.ndarray] = []
    out_prune_list: list[np.ndarray] = []
    out_ps: list[int] = []
    out_conf: list[int] = []
    out_ao: list[int] = [0]
    out_cc: list[np.ndarray] = []
    out_at = 0

    for li in range(num):
        ps, pe = int(bounds[li]), int(bounds[li + 1])
        rows_b = pe - ps
        lo, hi = int(offsets[li]), int(offsets[li + 1])
        leaves_b = hi - lo
        a_lo, a_hi = int(active_offsets[li]), int(active_offsets[li + 1])

        def demote() -> None:
            out_live.append(li)
            out_rows_list.append(row_of[ps:pe])
            out_prune_list.append(prune[ps:pe])
            out_ps.append(out_at)
            out_conf.append(int(conformers[li]))
            out_cc.append(cand_counts[a_lo:a_hi])
            out_ao.append(out_ao[-1] + (a_hi - a_lo))

        if force_demote is not None and force_demote[li]:
            demote()
            out_at += rows_b
            continue
        if leaves_b == 0:
            continue
        n = a_hi - a_lo
        cc = cand_counts[a_lo:a_hi].astype(np.int64)
        a = assign[lo:hi, :n].astype(np.int64)
        lidx, rows_l, is_x = _leaf_coords(a, cc)
        ref = np.unique(rows_l)
        k = next(
            (
                j
                for j, (_bk, lk, wk) in enumerate(bucket_specs)
                if leaves_b <= lk and len(ref) <= wk
            ),
            None,
        )
        if k is None:
            demote()
            out_at += rows_b
            continue
        b = buckets[k]
        at = fill[k]
        if at >= bucket_specs[k][0]:
            raise ValueError(
                f"bucket {k} overflow: capacity {bucket_specs[k][0]}"
            )
        fill[k] = at + 1
        wk = bucket_specs[k][2]
        b.lig_idx[at] = li
        b.conf[at] = max(int(conformers[li]), 1)
        b.ends2[at * wk : at * wk + len(ref)] = row_of[ps + ref]
        b.prune_w[at, : len(ref)] = prune[ps + ref]
        slot = np.searchsorted(ref, rows_l)
        b.plane_score[at, lidx, slot] = True
        b.plane_cross[at, lidx[is_x], slot[is_x]] = True

    for b in buckets:
        b.plane_score = np.packbits(b.plane_score, axis=2)
        b.plane_cross = np.packbits(b.plane_cross, axis=2)

    n_out_rows = out_at
    nout = nout_pad if nout_pad is not None else max(_round_up(out_at, 8), 8)
    if out_at > nout:
        raise ValueError(f"outlier rows {out_at} exceed nout_pad {nout}")
    out_ends = np.full(nout, nbt, np.int32)
    out_pr = np.zeros(nout, bool)
    if out_rows_list:
        out_ends[:out_at] = np.concatenate(out_rows_list)
        out_pr[:out_at] = np.concatenate(out_prune_list)
    return LeafBake(
        buckets=buckets,
        out_live=np.asarray(out_live, np.int32),
        out_ends=out_ends,
        out_prune=out_pr,
        out_pair_starts=np.asarray(out_ps, np.int64),
        out_conformers=np.asarray(out_conf, np.int32),
        out_active_offsets=np.asarray(out_ao, np.int32),
        out_cand_counts=(
            np.concatenate(out_cc).astype(np.int32)
            if out_cc else np.zeros(0, np.int32)
        ),
        n_out_rows=n_out_rows,
    )


# ==========================================================================
# Device evaluation (screen time)
# ==========================================================================
@partial(jax.jit, static_argnames=("w_cap",))
def leaf2_scores_device(
    rows: jax.Array,  # [NBT, C] f32 raw kernel output (score_tiles_v3_rows)
    ends2: jax.Array,  # [B*W] i32
    plane_s: jax.Array,  # [B, L, W//8] u8
    plane_c: jax.Array,  # [B, L, W//8] u8
    prune_w: jax.Array,  # [B, W] bool
    conformers: jax.Array,  # [B] i32
    out_ends: jax.Array,  # [NOUT_pad] i32
    w_cap: int,
) -> tuple[jax.Array, jax.Array]:
    """([B] scores, [NOUT_pad, C] outlier pair rows).

    One window take + two MXU batch matmuls evaluate every baked leaf:
    S[b,l,c] = sum of the leaf's selected window values, D[b,l,c] = count
    of its non-positive cross values (> 0 kills the leaf — the DFS's
    conformer pruning). The pair values stay f32 end to end: the S
    einsum MUST run at Precision.HIGHEST — TPU default matmul precision
    truncates f32 operands to one bf16 pass, which deviated real-library
    scores by up to ~4e-4 relative on chip (caught by the SCALE_REAL
    spot check; invisible to the CPU-mesh CI, where f32 matmuls are
    true f32). One-hot x f32 at HIGHEST is exact up to accumulation
    order. The D count matmul runs bf16 x bf16 -> f32, exact for 0/1
    operands at any precision."""
    c = rows.shape[1]
    b = prune_w.shape[0]
    rows_z = jnp.concatenate([rows, jnp.zeros((1, c), rows.dtype)], axis=0)
    tw = rows_z[ends2].reshape(b, w_cap, c)
    tw = jnp.where(prune_w[:, :, None], -1.0, tw)
    a_s = jnp.unpackbits(plane_s, axis=2, count=w_cap).astype(rows.dtype)
    a_c = jnp.unpackbits(plane_c, axis=2, count=w_cap).astype(jnp.bfloat16)
    s = jnp.einsum(
        "blw,bwc->blc", a_s, tw, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d = jnp.einsum(
        "blw,bwc->blc",
        a_c,
        (tw <= 0.0).astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    leaf_val = jnp.where(d > 0.5, -jnp.inf, s)
    best = jnp.maximum(leaf_val.max(axis=1), 0.0)  # [B, C]
    conf_ok = jnp.arange(c)[None, :] < conformers[:, None]
    denom = jnp.maximum(conformers, 1).astype(rows.dtype)
    scores = jnp.where(conf_ok, best, 0.0).sum(axis=1) / denom
    return scores, rows_z[out_ends]


def leaf2_scores_host(
    rows: np.ndarray, lb: DenseLeafBatch, conformers: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Numpy reference of leaf2_scores_device (tests / no-JAX paths)."""
    c = rows.shape[1]
    b, w = lb.prune_w.shape
    rows_z = np.concatenate([rows, np.zeros((1, c), rows.dtype)])
    tw = rows_z[lb.ends2].reshape(b, w, c).astype(np.float64)
    tw[lb.prune_w] = -1.0
    a_s = np.unpackbits(lb.plane_score, axis=2, count=w)
    a_c = np.unpackbits(lb.plane_cross, axis=2, count=w)
    s = np.einsum("blw,bwc->blc", a_s.astype(np.float64), tw)
    d = np.einsum("blw,bwc->blc", a_c.astype(np.float64), tw <= 0.0)
    leaf_val = np.where(d > 0.5, -np.inf, s)
    best = np.maximum(leaf_val.max(axis=1), 0.0)
    conf_ok = np.arange(c)[None, :] < conformers[:, None]
    denom = np.maximum(conformers, 1).astype(np.float64)
    scores = np.where(conf_ok, best, 0.0).sum(axis=1) / denom
    return scores, rows_z[lb.out_ends]


def _bucket_scores(rows_z, ends2, plane_s, plane_c, prune_w, conf,
                   split_s: bool = False):
    """[Bk] per-bucket leaf scores — the same two-MXU-matmul evaluation
    as leaf2_scores_device, at the bucket's (Lk, Wk) shape.

    split_s: evaluate S as two DEFAULT-precision bf16 matmuls against the
    hi/lo bf16 split of the window values instead of one HIGHEST f32
    matmul. The plane operand is exactly 0/1 (exact in bf16), so only the
    VALUE operand needs splitting — 2 MXU passes vs HIGHEST's 3+ (XLA
    splits BOTH operands). Residual error <= sum|t_i| * 2^-17, well inside
    the repo score tolerance (rtol 2e-5) but NOT bit-comparable to the f64
    mirror at 1e-5 — hence opt-in, pending the chip A/B."""
    c = rows_z.shape[1]
    bk, wk = prune_w.shape
    tw = rows_z[ends2].reshape(bk, wk, c)
    tw = jnp.where(prune_w[:, :, None], -1.0, tw)
    a_c = jnp.unpackbits(plane_c, axis=2, count=wk).astype(jnp.bfloat16)
    if split_s:
        a_s16 = jnp.unpackbits(plane_s, axis=2, count=wk).astype(jnp.bfloat16)
        tw_hi = tw.astype(jnp.bfloat16)
        tw_lo = (tw - tw_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        s = jnp.einsum(
            "blw,bwc->blc", a_s16, tw_hi,
            preferred_element_type=jnp.float32,
        ) + jnp.einsum(
            "blw,bwc->blc", a_s16, tw_lo,
            preferred_element_type=jnp.float32,
        )
        return _bucket_epilogue(s, a_c, tw, conf, rows_z.dtype)
    a_s = jnp.unpackbits(plane_s, axis=2, count=wk).astype(rows_z.dtype)
    # see leaf2_scores_device: the S einsum MUST run at HIGHEST (TPU
    # default truncates f32 operands to one bf16 pass — the round-4
    # S-einsum precision bug); the 0/1 D count is exact at any precision
    s = jnp.einsum(
        "blw,bwc->blc", a_s, tw, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return _bucket_epilogue(s, a_c, tw, conf, rows_z.dtype)


def _bucket_scores_sparse(rows_z, ends2, sidx, cidx, prune_w, conf, shp):
    """[Bk] per-bucket leaf scores from the SPARSE wire format.

    The dense one-hot planes are low-density on real chemistry (mean
    leaf depth ~7.7 set bits of Wk>=192 columns, and live leaf rows are
    25-45% of the padded Lk), so the wire/disk format ships the set-bit
    FLAT indices (i32 into [Bk, Lk, Wk], pad = out-of-bounds -> dropped
    by the scatter) and the device rebuilds the planes with one scatter
    each — the einsums see the same one-hot planes as the dense wire, so
    scores are bit-identical on CPU and within einsum accumulation-order
    rounding on TPU (chip-measured max 7.6e-6 abs on 200 real-shaped
    ligands; XLA tiles the scatter-fed and unpackbits-fed matmuls
    differently). `shp` is a [Lk, 0] placeholder whose SHAPE carries
    the static leaf cap (the sparse arrays alone cannot)."""
    c = rows_z.shape[1]
    bk, wk = prune_w.shape
    lk = shp.shape[0]
    size = bk * lk * wk
    tw = rows_z[ends2].reshape(bk, wk, c)
    tw = jnp.where(prune_w[:, :, None], -1.0, tw)
    a_s = (
        jnp.zeros(size, rows_z.dtype)
        .at[sidx].set(1, mode="drop")
        .reshape(bk, lk, wk)
    )
    a_c = (
        jnp.zeros(size, jnp.bfloat16)
        .at[cidx].set(1, mode="drop")
        .reshape(bk, lk, wk)
    )
    # see _bucket_scores: the S einsum MUST run at HIGHEST
    s = jnp.einsum(
        "blw,bwc->blc", a_s, tw, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return _bucket_epilogue(s, a_c, tw, conf, rows_z.dtype)


def planes_to_sparse(plane_u8: np.ndarray, wk: int) -> np.ndarray:
    """Set-bit flat indices (i32, C-order over [Bk, Lk, Wk]) of a packed
    bit-plane — the sparse wire form consumed by _bucket_scores_sparse."""
    bits = np.unpackbits(plane_u8, axis=2, count=wk)
    idx = np.flatnonzero(bits)
    assert idx.size == 0 or idx[-1] < np.iinfo(np.int32).max
    return idx.astype(np.int32)


def _bucket_epilogue(s, a_c, tw, conf, dtype):
    c = tw.shape[2]
    d = jnp.einsum(
        "blw,bwc->blc", a_c, (tw <= 0.0).astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    leaf_val = jnp.where(d > 0.5, -jnp.inf, s)
    best = jnp.maximum(leaf_val.max(axis=1), 0.0)  # [Bk, C]
    conf_ok = jnp.arange(c)[None, :] < conf[:, None]
    denom = jnp.maximum(conf, 1).astype(dtype)
    return jnp.where(conf_ok, best, 0.0).sum(axis=1) / denom


@partial(jax.jit, static_argnames=("nb", "split_s"))
def leaf2_scores_multi(
    rows: jax.Array,  # [NBT, C] f32 raw kernel output
    out_ends: jax.Array,  # [NOUT_pad] i32
    buckets: tuple,  # K x (ends2, plane_s, plane_c, prune_w, conf, lig_idx)
    nb: int,  # batch_size (scatter target length)
    split_s: bool = False,  # see _bucket_scores
) -> tuple[jax.Array, jax.Array]:
    """([nb] scores, [NOUT_pad, C] outlier rows) over width-class buckets.

    Per bucket: one window take + two MXU batch matmuls at the bucket's
    (Lk, Wk); scores scatter back to batch order (pad lig_idx = nb drops).
    Ligands in no bucket (zero leaves / outliers) stay 0."""
    c = rows.shape[1]
    rows_z = jnp.concatenate([rows, jnp.zeros((1, c), rows.dtype)], axis=0)
    scores = jnp.zeros(nb, rows.dtype)
    for b in buckets:
        if len(b) == 7:  # sparse wire: (ends2, sidx, cidx, pw, conf, idx, shp)
            ends2, sidx, cidx, prune_w, conf, lig_idx, shp = b
            sk = _bucket_scores_sparse(
                rows_z, ends2, sidx, cidx, prune_w, conf, shp
            )
        else:
            ends2, plane_s, plane_c, prune_w, conf, lig_idx = b
            sk = _bucket_scores(rows_z, ends2, plane_s, plane_c, prune_w,
                                conf, split_s=split_s)
        scores = scores.at[lig_idx].set(sk, mode="drop")
    return scores, rows_z[out_ends]


def store_bucket_planes(b: tuple) -> tuple:
    """Normalize a TiledStore leaf-bucket tuple to the dense 6-tuple
    (ends2, plane_score_u8, plane_cross_u8, prune_w, conf, lig_idx).

    Sparse-wire tuples (arity 7: set-bit flat indices + a [Lk, 0] shape
    placeholder) are densified on host — the f64 mirror and chip-CI
    equality checks then run identically for either wire."""
    if len(b) == 6:
        return tuple(np.asarray(a) for a in b)
    ends2, sidx, cidx, prune_w, conf, lig_idx, shp = (np.asarray(a) for a in b)
    bk, wk = prune_w.shape
    lk = shp.shape[0]
    size = bk * lk * wk
    planes = []
    for idx in (sidx, cidx):
        flat = np.zeros(size, np.uint8)
        flat[idx[idx < size]] = 1
        planes.append(np.packbits(flat.reshape(bk, lk, wk), axis=2))
    return ends2, planes[0], planes[1], prune_w, conf, lig_idx


def leaf2_scores_multi_host(
    rows: np.ndarray, bake: LeafBake, nb: int
) -> tuple[np.ndarray, np.ndarray]:
    """Numpy reference of leaf2_scores_multi (tests / no-JAX paths)."""
    c = rows.shape[1]
    rows_z = np.concatenate([rows, np.zeros((1, c), rows.dtype)])
    scores = np.zeros(nb, np.float64)
    for b in bake.buckets:
        bk, wk = b.prune_w.shape
        tw = rows_z[b.ends2].reshape(bk, wk, c).astype(np.float64)
        tw[b.prune_w] = -1.0
        a_s = np.unpackbits(b.plane_score, axis=2, count=wk)
        a_c = np.unpackbits(b.plane_cross, axis=2, count=wk)
        s = np.einsum("blw,bwc->blc", a_s.astype(np.float64), tw)
        d = np.einsum("blw,bwc->blc", a_c.astype(np.float64), tw <= 0.0)
        leaf_val = np.where(d > 0.5, -np.inf, s)
        best = np.maximum(leaf_val.max(axis=1), 0.0)
        conf_ok = np.arange(c)[None, :] < b.conf[:, None]
        denom = np.maximum(b.conf, 1).astype(np.float64)
        sk = np.where(conf_ok, best, 0.0).sum(axis=1) / denom
        live = b.lig_idx < nb
        scores[b.lig_idx[live]] = sk[live]
    return scores, rows_z[bake.out_ends]
