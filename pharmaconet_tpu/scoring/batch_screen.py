"""Batched TPU screening: device-evaluated pair-score tables + host DFS.

The reference scores one ligand at a time: numba JIT loops over
(cluster-pair, conformer) blocks (/root/reference/src/pmnet/scoring/
match_utils_numba.py:12-151) inside a fork-based multiprocessing pool
(screening.py:67-68). This module re-architects screening for TPU:

  1. HOST PACK — each ligand graph is flattened into "blocks": one block per
     (ligand-node u, ligand-node v, model-cluster-pair (a, b)) with its
     matched model-node pairs padded to BLOCK_P. Raggedness lives in ONE flat
     block axis instead of dense padded tensors, so padding waste stays
     small (~2x) and the math stays EXACT (no distance tables/interpolation).
  2. DEVICE SCORE — one jitted program per batch evaluates every block:
     gather conformer distances → Gaussian likelihood on the VPU → two-level
     segment reduction (sub-block → block for pass counting; block → cluster
     pair for scores/fails), then geometric pruning. Semantics equal the
     numba kernels: pass iff ((d-mu)/std)^2 < 4, block passes iff
     num_pass >= (M*N+1)//2, pair fails iff fails > n1*n2/2.
  3. HOST DFS — the existing assignment tree consumes the tables (tiny
     search, dominated by table math which now runs on device).

Scores match GraphMatcher.run() exactly (tests enforce equality).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import DEFAULT_WEIGHTS, MAX_MATCH_DEPTH
from .graph_match import priority_fn
from .ligand import Ligand
from .tree import ClusterMatchTreeRoot

BLOCK_P = 8  # model-node pairs per sub-block (larger blocks are split)

PHARMACOPHORE_TYPES = (
    "Hydrophobic",
    "Aromatic",
    "Cation",
    "Anion",
    "HBond_donor",
    "HBond_acceptor",
    "Halogen",
)
TYPE_INDEX = {t: i for i, t in enumerate(PHARMACOPHORE_TYPES)}


def _type_mask(types) -> int:
    mask = 0
    for t in types:
        mask |= 1 << TYPE_INDEX[t]
    return mask


# ==========================================================================
# Model-side packing (once per pocket)
# ==========================================================================
@dataclass
class PackedModel:
    mu: np.ndarray  # [Mn, Mn] edge distance means
    std: np.ndarray  # [Mn, Mn] edge distance stds
    weight: np.ndarray  # [Mn] per-node score weights
    node_type: np.ndarray  # [Mn] type ids
    cluster_nodes: list[list[int]]  # per cluster: node indices
    cluster_mask: np.ndarray  # [M] type bitmask
    cluster_center: np.ndarray  # [M, 3]
    cluster_size: np.ndarray  # [M]
    # per (cluster, type): matched node indices (precomputed candidate sets)
    cluster_type_nodes: list[list[list[int]]]

    def ct_tables(self) -> tuple[np.ndarray, np.ndarray]:
        """Flattened (cluster, type) -> node-id tables for the native packer."""
        if not hasattr(self, "_ct_tables"):
            offsets = [0]
            nodes: list[int] = []
            for per_cluster in self.cluster_type_nodes:
                for per_type in per_cluster:
                    nodes.extend(per_type)
                    offsets.append(len(nodes))
            self._ct_tables = (
                np.asarray(offsets, dtype=np.int32),
                np.asarray(nodes, dtype=np.int32),
            )
        return self._ct_tables

    @classmethod
    def from_model(cls, model, weights: dict[str, float] | None = None) -> "PackedModel":
        w = dict(DEFAULT_WEIGHTS)
        if weights:
            w.update(weights)
        nodes = model.nodes
        n = len(nodes)
        mu = np.zeros((n, n), dtype=np.float32)
        std = np.ones((n, n), dtype=np.float32)
        for node in nodes:
            for other, edge in node.neighbor_edge_dict.items():
                mu[node.index, other.index] = edge.distance_mean
                std[node.index, other.index] = edge.distance_std
        weight = np.array([w[node.type] for node in nodes], dtype=np.float32)
        node_type = np.array([TYPE_INDEX[node.type] for node in nodes], dtype=np.int32)

        clusters = model.node_clusters
        cluster_nodes = [sorted(c.node_indices) for c in clusters]
        cluster_mask = np.array(
            [_type_mask(c.node_types) for c in clusters], dtype=np.int32
        )
        cluster_center = np.array([c.center for c in clusters], dtype=np.float32)
        cluster_size = np.array([c.size for c in clusters], dtype=np.float32)
        cluster_type_nodes = [
            [
                [i for i in cluster_nodes[m] if node_type[i] == t]
                for t in range(len(PHARMACOPHORE_TYPES))
            ]
            for m in range(len(clusters))
        ]
        return cls(
            mu, std, weight, node_type, cluster_nodes, cluster_mask,
            cluster_center, cluster_size, cluster_type_nodes,
        )


# ==========================================================================
# Ligand-side packing (once per ligand, model-independent)
# ==========================================================================
@dataclass
class PackedLigand:
    node_pos: np.ndarray  # [Ln, C, 3] node positions per conformer
    node_mask: np.ndarray  # [Ln] int type bitmask per node
    clusters: list[list[int]]  # priority-ordered cluster -> node indices
    cluster_mask: np.ndarray  # [L] type bitmask
    cluster_center: np.ndarray  # [L, C, 3]
    cluster_size: np.ndarray  # [L, C]
    num_conformers: int

    def flat_clusters(self) -> tuple[np.ndarray, np.ndarray]:
        """(members [sum_n], offsets [L+1]) — cached flattening of `clusters`
        for the native packer (avoids per-ligand Python extends per batch)."""
        cached = getattr(self, "_flat_clusters", None)
        if cached is None:
            members = np.asarray(
                [n for nodes in self.clusters for n in nodes], dtype=np.int32
            )
            offsets = np.zeros(len(self.clusters) + 1, dtype=np.int32)
            offsets[1:] = np.cumsum([len(nodes) for nodes in self.clusters])
            cached = (members, offsets)
            object.__setattr__(self, "_flat_clusters", cached)
        return cached

    @classmethod
    def from_ligand(cls, ligand: Ligand) -> "PackedLigand":
        graph = ligand.graph
        if not graph.nodes:
            # featureless ligand: scores 0 (graph_match.py:95-99); packed as
            # an empty graph so batch assembly can skip it uniformly
            c = max(graph.num_conformers, 1)
            return cls(
                node_pos=np.zeros((0, c, 3), np.float32),
                node_mask=np.zeros(0, np.int32),
                clusters=[],
                cluster_mask=np.zeros(0, np.int32),
                cluster_center=np.zeros((0, c, 3), np.float32),
                cluster_size=np.zeros((0, c), np.float32),
                num_conformers=c,
            )
        node_pos = np.stack([node.positions for node in graph.nodes], axis=0).astype(
            np.float32
        )  # [Ln, C, 3]
        node_mask = np.array([_type_mask(n.types) for n in graph.nodes], dtype=np.int32)
        # sort clusters by priority; the depth cap is applied AFTER candidate
        # filtering in build_batch (graph_match.py:87-88 caps the filtered list)
        clusters_sorted = sorted(graph.node_clusters, key=priority_fn)
        clusters = [[n.index for n in c.nodes] for c in clusters_sorted]
        cluster_mask = np.array(
            [_type_mask(c.node_types) for c in clusters_sorted], dtype=np.int32
        )
        cluster_center = np.stack([c.center for c in clusters_sorted], axis=0).astype(
            np.float32
        )
        cluster_size = np.stack([c.size for c in clusters_sorted], axis=0).astype(np.float32)
        return cls(
            node_pos, node_mask, clusters, cluster_mask, cluster_center,
            cluster_size, graph.num_conformers,
        )


# ==========================================================================
# Batch assembly: flatten (ligand, cluster pair, uv, model pair) blocks
# ==========================================================================
@dataclass
class ScreenBatch:
    # sub-block arrays [NS, ...]
    sub_mu: np.ndarray  # [NS, P]
    sub_std: np.ndarray  # [NS, P]
    sub_w: np.ndarray  # [NS, P]  (0 = padding entry)
    sub_d_idx: np.ndarray  # [NS] into flattened distances [B*Ln*Ln]
    sub_block: np.ndarray  # [NS] block id
    # block arrays [NB]
    block_mn: np.ndarray  # [NB] M*N of the full block
    block_pair: np.ndarray  # [NB] pair id
    block_is_cross: np.ndarray  # [NB] 1 for cross-cluster pairs (fail logic)
    # pair arrays [NP]
    pair_threshold: np.ndarray  # [NP] fail threshold (n1*n2*0.5; inf for self)
    pair_meta: np.ndarray  # [NP, 6] (ligand, l1, l2, m1, m2, is_self)
    # ligand-level arrays
    node_pos: np.ndarray  # [B, Ln, C, 3]
    num_conformers: np.ndarray  # [B]
    lig_cluster_center: np.ndarray  # [B, L, C, 3]
    lig_cluster_size: np.ndarray  # [B, L, C]
    # host-side DFS metadata
    ligand_clusters: list  # per ligand: cluster count
    candidates: list  # per ligand: list per cluster of model cluster ids
    pair_slices: list  # per ligand: (start, end) into pair arrays
    ln: int
    cmax: int
    # [B, Ln] int32 per-node type bitmask (0 on padding nodes). Optional:
    # lets screen_v3 derive exact group keys from metadata instead of
    # hashing expanded [NB, R] float tables (see group_ids_meta).
    node_mask: np.ndarray | None = None


def build_batch(
    model: PackedModel,
    ligands: list[PackedLigand],
    ln: int | None = None,
    cmax: int | None = None,
    lmax: int | None = None,
    native: bool | None = None,
) -> ScreenBatch:
    """Flatten a ligand batch into device block arrays.

    Dispatches to the C++ block packer (pharmaconet_tpu/native) when
    available; the pure-Python path below is the semantic reference and the
    fallback. native=None means auto.
    """
    if native is not False:
        from ..native import get_block_packer

        if get_block_packer() is not None:
            return _build_batch_native(model, ligands, ln, cmax, lmax)
        if native is True:
            raise RuntimeError("native block packer unavailable")
    return _build_batch_python(model, ligands, ln, cmax, lmax)


def _build_batch_python(
    model: PackedModel,
    ligands: list[PackedLigand],
    ln: int | None = None,
    cmax: int | None = None,
    lmax: int | None = None,
) -> ScreenBatch:
    """Flatten a ligand batch into device block arrays (host, numpy).

    ln/cmax/lmax fix the node/conformer/cluster padding (for multi-shard
    batches that must share shapes); default to the batch maxima.
    """
    num_types = len(PHARMACOPHORE_TYPES)
    sub_mu, sub_std, sub_w, sub_d, sub_block = [], [], [], [], []
    block_mn, block_pair, block_cross = [], [], []
    pair_threshold, pair_meta = [], []
    candidates_all, pair_slices, cluster_counts = [], [], []

    ln = ln or max(p.node_pos.shape[0] for p in ligands)
    cmax = cmax or max(p.num_conformers for p in ligands)

    for li, lig in enumerate(ligands):
        pair_start = len(pair_threshold)
        num_clusters = len(lig.clusters)
        cluster_counts.append(num_clusters)
        # candidate model clusters per ligand cluster (type overlap), then
        # cap the DFS depth over the FILTERED list (graph_match.py:87-88)
        cands = [
            [m for m in range(len(model.cluster_nodes)) if lig.cluster_mask[l] & model.cluster_mask[m]]
            for l in range(num_clusters)
        ]
        active = [l for l in range(num_clusters) if cands[l]][:MAX_MATCH_DEPTH]
        candidates_all.append((active, cands))

        # matched model nodes per (ligand node u, model cluster m): A(u, m)
        def matched(u: int, m: int) -> list[int]:
            out = []
            umask = lig.node_mask[u]
            for t in range(num_types):
                if umask & (1 << t):
                    out.extend(model.cluster_type_nodes[m][t])
            return out

        match_cache: dict[tuple[int, int], list[int]] = {}

        def get_matched(u: int, m: int) -> list[int]:
            key = (u, m)
            if key not in match_cache:
                match_cache[key] = matched(u, m)
            return match_cache[key]

        def emit_block(u: int, v: int, a_nodes: list[int], b_nodes: list[int], pair_id: int, cross: bool):
            mn = len(a_nodes) * len(b_nodes)
            block_id = len(block_mn)
            block_mn.append(mn)
            block_pair.append(pair_id)
            block_cross.append(1 if cross else 0)
            d_idx = li * ln * ln + u * ln + v
            # flatten (p, q) pairs and split into BLOCK_P sub-blocks
            pairs = [(p, q) for p in a_nodes for q in b_nodes]
            for s in range(0, len(pairs), BLOCK_P):
                chunk = pairs[s : s + BLOCK_P]
                mu_row = np.zeros(BLOCK_P, dtype=np.float32)
                std_row = np.ones(BLOCK_P, dtype=np.float32)
                w_row = np.zeros(BLOCK_P, dtype=np.float32)
                for k, (p, q) in enumerate(chunk):
                    mu_row[k] = model.mu[p, q]
                    std_row[k] = model.std[p, q]
                    w_row[k] = model.weight[p] * model.weight[q]
                sub_mu.append(mu_row)
                sub_std.append(std_row)
                sub_w.append(w_row)
                sub_d.append(d_idx)
                sub_block.append(block_id)

        # self pairs (l, l, m, m): combinations of nodes within the cluster
        for l in active:
            for m in cands[l]:
                pair_id = len(pair_threshold)
                pair_threshold.append(np.inf)
                pair_meta.append((li, l, l, m, m, 1))
                nodes_l = lig.clusters[l]
                matched_nodes = [
                    (u, get_matched(u, m)) for u in nodes_l if get_matched(u, m)
                ]
                for i in range(len(matched_nodes)):
                    for j in range(i + 1, len(matched_nodes)):
                        u, a_nodes = matched_nodes[i]
                        v, b_nodes = matched_nodes[j]
                        emit_block(u, v, a_nodes, b_nodes, pair_id, cross=False)

        # cross pairs over the active (filtered+capped) list, in order
        for i1 in range(len(active)):
            for i2 in range(i1 + 1, len(active)):
                l1, l2 = active[i1], active[i2]
                for m1 in cands[l1]:
                    for m2 in cands[l2]:
                        pair_id = len(pair_threshold)
                        m1_nodes = [
                            (u, get_matched(u, m1))
                            for u in lig.clusters[l1]
                            if get_matched(u, m1)
                        ]
                        m2_nodes = [
                            (v, get_matched(v, m2))
                            for v in lig.clusters[l2]
                            if get_matched(v, m2)
                        ]
                        pair_threshold.append(len(m1_nodes) * len(m2_nodes) * 0.5)
                        pair_meta.append((li, l1, l2, m1, m2, 0))
                        for u, a_nodes in m1_nodes:
                            for v, b_nodes in m2_nodes:
                                emit_block(u, v, a_nodes, b_nodes, pair_id, cross=True)
        pair_slices.append((pair_start, len(pair_threshold)))

    lmax = lmax or max(len(lig.clusters) for lig in ligands)
    node_pos, num_conf, lig_center, lig_size, node_mask_arr = _ligand_arrays(ligands, ln, cmax, lmax)

    return ScreenBatch(
        sub_mu=np.asarray(sub_mu, dtype=np.float32).reshape(-1, BLOCK_P),
        sub_std=np.asarray(sub_std, dtype=np.float32).reshape(-1, BLOCK_P),
        sub_w=np.asarray(sub_w, dtype=np.float32).reshape(-1, BLOCK_P),
        sub_d_idx=np.asarray(sub_d, dtype=np.int32),
        sub_block=np.asarray(sub_block, dtype=np.int32),
        block_mn=np.asarray(block_mn, dtype=np.int32),
        block_pair=np.asarray(block_pair, dtype=np.int32),
        block_is_cross=np.asarray(block_cross, dtype=np.int32),
        pair_threshold=np.asarray(pair_threshold, dtype=np.float32),
        pair_meta=np.asarray(pair_meta, dtype=np.int32).reshape(-1, 6),
        node_pos=node_pos,
        num_conformers=num_conf,
        lig_cluster_center=lig_center,
        lig_cluster_size=lig_size,
        ligand_clusters=cluster_counts,
        candidates=candidates_all,
        pair_slices=pair_slices,
        ln=ln,
        cmax=cmax,
        node_mask=node_mask_arr,
    )


def unique_distance_table(batch: ScreenBatch) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Unique (ligand, u, v) rows referenced by sub-blocks.

    Returns (pair_u [NU], pair_v [NU] — global node rows into the flattened
    [B*Ln] position array — and sub_slot [NS] indices into that table).
    """
    ln = batch.ln
    # sort + searchsorted instead of np.unique(return_inverse=True): the
    # inverse via binary search skips the full argsort (~3x faster here)
    uniq = np.unique(batch.sub_d_idx)
    inverse = np.searchsorted(uniq, batch.sub_d_idx)
    li = uniq // (ln * ln)
    rem = uniq % (ln * ln)
    pair_u = (li * ln + rem // ln).astype(np.int32)
    pair_v = (li * ln + rem % ln).astype(np.int32)
    return pair_u, pair_v, inverse.astype(np.int32)


def segment_boundaries(ids: np.ndarray, num_segments: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(ends, starts, has) for sorted segment ids (host, vectorized).

    Single-pass bincount/cumsum (O(N + S)) rather than per-segment
    searchsorted (O(S log N)): the segment count is comparable to the row
    count here, so this is the host-bandwidth-optimal form.
    """
    counts = np.bincount(ids, minlength=num_segments)[:num_segments]
    cum = np.cumsum(counts)
    ends = (cum - 1).astype(np.int32)
    starts = (cum - counts).astype(np.int32)
    has = counts > 0
    return ends, starts, has


def _ligand_arrays(ligands, ln, cmax, lmax):
    node_pos = np.zeros((len(ligands), ln, cmax, 3), dtype=np.float32)
    num_conf = np.zeros(len(ligands), dtype=np.int32)
    lig_center = np.zeros((len(ligands), lmax, cmax, 3), dtype=np.float32)
    lig_size = np.zeros((len(ligands), lmax, cmax), dtype=np.float32)
    node_mask = np.zeros((len(ligands), ln), dtype=np.int32)
    for li, lig in enumerate(ligands):
        n, c = lig.node_pos.shape[0], lig.num_conformers
        node_mask[li, :n] = lig.node_mask
        node_pos[li, :n, :c] = lig.node_pos
        # repeat last conformer into padding (keeps distances finite)
        if c < cmax:
            node_pos[li, :n, c:] = lig.node_pos[:, -1:, :]
        num_conf[li] = c
        num_l = len(lig.clusters)
        lig_center[li, :num_l, :c] = lig.cluster_center
        lig_size[li, :num_l, :c] = lig.cluster_size
        if c < cmax:
            lig_center[li, :num_l, c:] = lig.cluster_center[:, -1:]
            lig_size[li, :num_l, c:] = lig.cluster_size[:, -1:]
    return node_pos, num_conf, lig_center, lig_size, node_mask


@dataclass
class FlatLigands:
    """Flattened ligand metadata shared by the native packers."""

    ln: int
    cmax: int
    lmax: int
    lig_cluster_offsets: np.ndarray
    member_offsets: np.ndarray  # [C_total + 1]
    members: np.ndarray
    node_mask_offsets: np.ndarray
    node_masks_flat: np.ndarray
    active_offsets: np.ndarray
    active_flat: np.ndarray
    cand_offsets: np.ndarray  # [C_total + 1]
    cands_flat: np.ndarray
    candidates_all: list
    cluster_counts: list[int]


def _flatten_ligands(
    model: PackedModel,
    ligands: list[PackedLigand],
    ln: int | None = None,
    cmax: int | None = None,
    lmax: int | None = None,
) -> FlatLigands:
    num_ligands = len(ligands)
    ln = ln or max(p.node_pos.shape[0] for p in ligands)
    cmax = cmax or max(p.num_conformers for p in ligands)
    lmax = lmax or max(len(p.clusters) for p in ligands)

    lig_cluster_offsets = np.zeros(num_ligands + 1, dtype=np.int32)
    node_mask_offsets = np.zeros(num_ligands + 1, dtype=np.int32)
    active_offsets = np.zeros(num_ligands + 1, dtype=np.int32)
    member_arrays: list[np.ndarray] = []
    member_offset_arrays: list[np.ndarray] = []
    member_base = 0
    node_masks: list[np.ndarray] = []
    active_list: list[int] = []
    candidates_all = []
    cluster_counts = []
    model_masks = model.cluster_mask  # [M]

    # candidates via bitwise mask overlap, vectorized across the whole batch
    # (one [sum_L, M] pass instead of per-ligand nonzero calls)
    all_cluster_masks = np.concatenate(
        [lig.cluster_mask for lig in ligands]
    ) if ligands else np.zeros(0, np.int64)
    overlap_all = (all_cluster_masks[:, None] & model_masks[None, :]) != 0
    row_counts = overlap_all.sum(axis=1)
    nz_cols = np.nonzero(overlap_all)[1].astype(np.int64)
    row_offsets = np.concatenate([[0], np.cumsum(row_counts)])

    row = 0
    for li, lig in enumerate(ligands):
        num_l = len(lig.clusters)
        cluster_counts.append(num_l)
        members, offsets = lig.flat_clusters()
        member_arrays.append(members)
        member_offset_arrays.append(offsets[1:] + member_base)
        member_base += len(members)
        node_masks.append(lig.node_mask)
        cands = [
            nz_cols[row_offsets[row + l] : row_offsets[row + l + 1]]
            for l in range(num_l)
        ]
        active = [l for l in range(num_l) if row_counts[row + l]][:MAX_MATCH_DEPTH]
        candidates_all.append((active, cands))
        active_list.extend(active)
        row += num_l
        lig_cluster_offsets[li + 1] = lig_cluster_offsets[li] + num_l
        node_mask_offsets[li + 1] = node_mask_offsets[li] + len(lig.node_mask)
        active_offsets[li + 1] = len(active_list)

    member_offsets = (
        np.concatenate([np.zeros(1, np.int32), *member_offset_arrays])
        if member_offset_arrays else np.zeros(1, np.int32)
    ).astype(np.int32)
    return FlatLigands(
        ln=ln, cmax=cmax, lmax=lmax,
        lig_cluster_offsets=lig_cluster_offsets,
        member_offsets=member_offsets,
        members=np.concatenate(member_arrays).astype(np.int32)
        if member_arrays else np.zeros(0, np.int32),
        node_mask_offsets=node_mask_offsets,
        node_masks_flat=np.concatenate(node_masks).astype(np.int32)
        if node_masks else np.zeros(0, np.int32),
        active_offsets=active_offsets,
        active_flat=np.asarray(active_list, dtype=np.int32)
        if active_list else np.zeros(0, np.int32),
        cand_offsets=row_offsets.astype(np.int32),
        cands_flat=nz_cols.astype(np.int32)
        if len(nz_cols) else np.zeros(0, np.int32),
        candidates_all=candidates_all,
        cluster_counts=cluster_counts,
    )


def _build_batch_native(
    model: PackedModel,
    ligands: list[PackedLigand],
    ln: int | None = None,
    cmax: int | None = None,
    lmax: int | None = None,
) -> ScreenBatch:
    """C++ block emission; produces arrays identical to the Python path."""
    from ..native import get_block_packer

    fn = get_block_packer()
    assert fn is not None
    num_ligands = len(ligands)
    fl = _flatten_ligands(model, ligands, ln, cmax, lmax)
    ln, cmax, lmax = fl.ln, fl.cmax, fl.lmax
    candidates_all = fl.candidates_all
    cluster_counts = fl.cluster_counts

    ct_offsets, ct_nodes = model.ct_tables()
    mu = np.ascontiguousarray(model.mu)
    std = np.ascontiguousarray(model.std)
    weight = np.ascontiguousarray(model.weight)

    cap_ns = max(4096, 2048 * num_ligands)
    cap_nb = cap_ns
    cap_np = max(1024, 1024 * num_ligands)
    while True:
        sub_mu = np.empty((cap_ns, BLOCK_P), dtype=np.float32)
        sub_std = np.empty((cap_ns, BLOCK_P), dtype=np.float32)
        sub_w = np.empty((cap_ns, BLOCK_P), dtype=np.float32)
        sub_d = np.empty(cap_ns, dtype=np.int32)
        sub_block = np.empty(cap_ns, dtype=np.int32)
        block_mn = np.empty(cap_nb, dtype=np.int32)
        block_pair = np.empty(cap_nb, dtype=np.int32)
        block_cross = np.empty(cap_nb, dtype=np.int32)
        pair_threshold = np.empty(cap_np, dtype=np.float32)
        pair_meta = np.empty((cap_np, 6), dtype=np.int32)
        pair_slices = np.zeros((num_ligands, 2), dtype=np.int64)
        counts = np.zeros(3, dtype=np.int64)
        rc = fn(
            len(model.cluster_nodes), len(model.weight),
            ct_offsets, ct_nodes, mu, std, weight,
            num_ligands, ln,
            fl.lig_cluster_offsets,
            fl.member_offsets,
            fl.members,
            fl.node_mask_offsets, fl.node_masks_flat,
            fl.active_offsets,
            fl.active_flat,
            fl.cand_offsets,
            fl.cands_flat,
            BLOCK_P, cap_ns, cap_nb, cap_np,
            sub_mu, sub_std, sub_w, sub_d, sub_block,
            block_mn, block_pair, block_cross,
            pair_threshold, pair_meta, pair_slices.reshape(-1), counts,
        )
        if rc == 0:
            break
        cap_ns *= 4
        cap_nb *= 4
        cap_np *= 4

    ns, nb, npairs = int(counts[0]), int(counts[1]), int(counts[2])
    node_pos, num_conf, lig_center, lig_size, node_mask_arr = _ligand_arrays(ligands, ln, cmax, lmax)
    return ScreenBatch(
        sub_mu=sub_mu[:ns], sub_std=sub_std[:ns], sub_w=sub_w[:ns],
        sub_d_idx=sub_d[:ns], sub_block=sub_block[:ns],
        block_mn=block_mn[:nb], block_pair=block_pair[:nb],
        block_is_cross=block_cross[:nb],
        pair_threshold=pair_threshold[:npairs], pair_meta=pair_meta[:npairs],
        node_pos=node_pos, num_conformers=num_conf,
        lig_cluster_center=lig_center, lig_cluster_size=lig_size,
        ligand_clusters=cluster_counts, candidates=candidates_all,
        pair_slices=[(int(a), int(b)) for a, b in pair_slices],
        ln=ln, cmax=cmax,
        node_mask=node_mask_arr,
    )


# ==========================================================================
# Device kernel
# ==========================================================================
def _bounded_segmented_scan(x: jax.Array, flags: jax.Array, depth: int) -> jax.Array:
    """Segmented inclusive scan of x [C, N] along the minor axis, for
    segments of length <= 2^depth (Hillis-Steele with boundary flags).

    The batch's segments (sub-rows per block, sub-rows per pair) are a few
    elements long, so 2-4 shift-add passes replace a full log2(N)-deep
    associative scan — each pass is pure lane-aligned elementwise work.
    """
    c, n = x.shape
    val = x
    seen = jnp.broadcast_to(flags[None, :], (c, n))
    shift = 1
    for _ in range(depth):
        val_s = jnp.pad(val, ((0, 0), (shift, 0)))[:, :n]
        seen_s = jnp.pad(seen, ((0, 0), (shift, 0)), constant_values=True)[:, :n]
        val = val + jnp.where(seen, 0.0, val_s)
        seen = seen | seen_s
        shift *= 2
    return val


@functools.partial(jax.jit, static_argnames=("depth1", "depth2"))
def score_blocks_device(
    node_pos: jax.Array,  # [B, Ln, C, 3]
    sub_mu: jax.Array,  # [P, NS] (host-pretransposed, lane-major)
    sub_inv: jax.Array,  # [P, NS]  (1/std; 1.0 padding)
    sub_winv: jax.Array,  # [P, NS]  (w/std; 0.0 padding)
    pair_u: jax.Array,  # [NU] global node row of u per unique (lig, u, v)
    pair_v: jax.Array,  # [NU]
    sub_slot: jax.Array,  # [NS] index into the unique-distance table
    flags_block: jax.Array,  # [NS] bool — first sub row of each block
    flags_pair: jax.Array,  # [NS] bool — first sub row of each pair
    end_mn_inv: jax.Array,  # [NS] f32 — 1/(M*N) at block-end rows, 0 elsewhere
    end_mn_half: jax.Array,  # [NS] f32 — (M*N+1)//2 at block ends, 0 elsewhere
    end_fail_gate: jax.Array,  # [NS] f32 — 1 at block ends of cross pairs
    thr_ns: jax.Array,  # [NS] pair fail threshold expanded to sub rows
    self_ns: jax.Array,  # [NS] bool — pair is_self expanded to sub rows
    depth1: int,
    depth2: int,
) -> jax.Array:
    """Returns the EXPANDED score array [C, NS]: the final per-pair scores
    (-1 for failed conformers) sit at each pair's last sub row; the host
    compacts them with one vectorized numpy gather (TPU gathers at this
    granularity measured 10-50x the cost of the whole rest of the kernel).

    All heavy work is lane-major elementwise math over the flat NS axis:
    Gaussian likelihood terms, then two BOUNDED segmented scans whose
    running sums land at segment-end rows (sub->block, block->pair — pair
    sums scan the block-end values in place, everything else contributes
    zero). The only device gather reads the compact unique-distance table.
    The geometric prune is applied on the host (static per batch).
    """
    b, ln, c, _ = node_pos.shape
    pos_flat = node_pos.reshape(b * ln, c, 3)
    dvec = pos_flat[pair_u] - pos_flat[pair_v]  # [NU, C, 3]
    d_table = jnp.sqrt(jnp.sum(dvec * dvec, axis=-1))  # [NU, C]

    dT = d_table[sub_slot].T  # [C, NS]
    x = (dT[None] - sub_mu[:, None, :]) * sub_inv[:, None, :]  # [P, C, NS]
    x2 = x * x
    valid = sub_winv[:, None, :] > 0.0
    gauss = jnp.where(valid, sub_winv[:, None, :] * jnp.exp(-0.5 * x2), 0.0)
    sub_scores = jnp.sum(gauss, axis=0)  # [C, NS]
    sub_pass = jnp.sum(jnp.where(valid & (x2 < 4.0), 1.0, 0.0), axis=0)  # [C, NS]

    # sub -> block: bounded scan; normalized block value lands on end rows
    scan_s = _bounded_segmented_scan(sub_scores, flags_block, depth1)
    scan_p = _bounded_segmented_scan(sub_pass, flags_block, depth1)
    block_score_ns = scan_s * end_mn_inv[None, :]  # 0 off block ends
    block_fail_ns = jnp.where(
        (scan_p < end_mn_half[None, :]), end_fail_gate[None, :], 0.0
    )

    # block -> pair: scan the block-end values across the pair's row span
    pair_score_ns = _bounded_segmented_scan(block_score_ns, flags_pair, depth2)
    pair_fail_ns = _bounded_segmented_scan(block_fail_ns, flags_pair, depth2)

    # fail logic in the expanded domain (host compacts at pair-end rows)
    failed = pair_fail_ns > thr_ns[None, :]
    return jnp.where(failed & (~self_ns[None, :]), -1.0, pair_score_ns)


def compact_pair_table(batch: ScreenBatch, expanded: np.ndarray) -> np.ndarray:
    """Gather per-pair scores [NP, C] out of the expanded [C, NS] device
    output (host-side vectorized numpy; empty pairs score 0)."""
    np_real = len(batch.pair_threshold)
    sub_pair = (
        batch.block_pair[batch.sub_block]
        if len(batch.sub_block)
        else np.zeros(0, np.int32)
    )
    ends, _, has = segment_boundaries(sub_pair, np_real)
    table = expanded[:, np.clip(ends, 0, None)].T.copy()  # [NP, C]
    table[~has] = 0.0
    return table


def compact_pair_table_rows(rows: np.ndarray, pair_end_rows: np.ndarray) -> np.ndarray:
    """Row-major pair compaction: gather [NP, C] from the device's
    [NST, C] output at the (ascending) pair-end rows; empty pairs (-1)
    score 0. The row-major layout makes this sequential 16-byte reads."""
    table = rows[np.clip(pair_end_rows, 0, None)]
    table[pair_end_rows < 0] = 0.0
    return table


def compact_pair_table_tiled(expanded: np.ndarray, pair_end_rows: np.ndarray) -> np.ndarray:
    """Gather per-pair scores [NP, C] from the tiled expanded output using
    the layout's precomputed pair-end rows (empty pairs score 0)."""
    table = expanded[:, np.clip(pair_end_rows, 0, None)].T.copy()
    table[pair_end_rows < 0] = 0.0
    return table


def host_prune_mask(
    batch: ScreenBatch, model: PackedModel, native: bool | None = None
) -> np.ndarray:
    """Geometric feasibility prune per pair (graph_match.py:267), computed
    on the host (static per batch): True where the pair must score -1.

    Dispatches to the C++ kernel (native/prep_args.cpp prune_pairs) when
    available; the numpy path below is the reference/fallback."""
    meta = batch.pair_meta
    if len(meta) == 0:
        return np.zeros(0, dtype=bool)
    if native is not False:
        from ..native import get_prune_pairs

        fn = get_prune_pairs()
        if fn is not None:
            np_real = len(meta)
            lmax = batch.lig_cluster_center.shape[1]
            cmax = batch.lig_cluster_center.shape[2]
            pruned = np.empty(np_real, dtype=bool)
            fn(
                np_real, cmax, lmax,
                np.ascontiguousarray(meta),
                np.ascontiguousarray(batch.lig_cluster_center),
                np.ascontiguousarray(batch.lig_cluster_size),
                np.ascontiguousarray(model.cluster_center),
                np.ascontiguousarray(model.cluster_size),
                pruned,
            )
            return pruned
        if native is True:
            raise RuntimeError("native prune_pairs unavailable")
    li, l1, l2 = meta[:, 0], meta[:, 1], meta[:, 2]
    m1, m2, is_self = meta[:, 3], meta[:, 4], meta[:, 5] == 1
    lc1 = batch.lig_cluster_center[li, l1]  # [NP, C, 3]
    lc2 = batch.lig_cluster_center[li, l2]
    lig_dist = np.linalg.norm(lc1 - lc2, axis=-1)  # [NP, C]
    lig_size = batch.lig_cluster_size[li, l1] + batch.lig_cluster_size[li, l2]
    model_dist = np.linalg.norm(
        model.cluster_center[m1] - model.cluster_center[m2], axis=-1
    )
    model_size = model.cluster_size[m1] + model.cluster_size[m2]
    pruned = np.min(np.abs(lig_dist - model_dist[:, None]) - lig_size, axis=-1) > model_size
    return pruned & (~is_self)


# ==========================================================================
# Host DFS + end-to-end screening
# ==========================================================================
def _dfs_scores(
    batch: ScreenBatch, table: np.ndarray, threads: int = 1
) -> list[float]:
    """Run the assignment tree per ligand from the device table.

    Dispatches to the C++ DFS (pharmaconet_tpu/native/match_dfs.cpp) when
    available; the Python tree below is the semantic reference/fallback.
    threads > 1 shards the per-ligand searches over a thread pool
    (independent searches, bit-identical scores at any thread count).
    """
    from ..native import get_match_dfs, get_match_dfs_mt

    fn = get_match_dfs()
    mt = get_match_dfs_mt() if threads > 1 else None
    cached = getattr(batch, "dfs_arrays", None)
    if fn is not None and cached is not None:
        # tile-store fast path: the conversion below was done at prepack
        # time (scoring/tiled_store.py) and stored with the batch
        pair_starts, conformers, active_offsets, cand_counts = cached
        num = len(conformers)
        out = np.zeros(num, dtype=np.float32)
        table_c = np.ascontiguousarray(table, dtype=np.float32)
        args = (
            num, table_c, table_c.shape[1],
            np.ascontiguousarray(pair_starts),
            np.ascontiguousarray(conformers),
            np.ascontiguousarray(active_offsets),
            np.ascontiguousarray(cand_counts)
            if len(cand_counts) else np.zeros(0, np.int32),
            out,
        )
        if mt is not None:
            mt(*args, threads)
        else:
            fn(*args)
        return [float(v) for v in out]
    if cached is not None:
        raise RuntimeError(
            "tile-store batches need the native DFS "
            "(pharmaconet_tpu/native/match_dfs); it is unavailable"
        )
    if fn is not None:
        num = len(batch.ligand_clusters)
        pair_starts = np.array([s for s, _ in batch.pair_slices], dtype=np.int64)
        conformers = batch.num_conformers.astype(np.int32)[:num]
        active_offsets = [0]
        cand_counts: list[int] = []
        for active, cands in batch.candidates:
            cand_counts.extend(len(cands[l]) for l in active)
            active_offsets.append(len(cand_counts))
        out = np.zeros(num, dtype=np.float32)
        table_c = np.ascontiguousarray(table, dtype=np.float32)
        args = (
            num, table_c, table_c.shape[1], pair_starts, conformers,
            np.asarray(active_offsets, dtype=np.int32),
            np.asarray(cand_counts, dtype=np.int32)
            if cand_counts else np.zeros(0, np.int32),
            out,
        )
        if mt is not None:
            mt(*args, threads)
        else:
            fn(*args)
        return [float(v) for v in out]
    return _dfs_scores_python(batch, table)


def _dfs_scores_python(batch: ScreenBatch, table: np.ndarray) -> list[float]:
    """Reference Python implementation of the assignment DFS."""
    out = []
    for li in range(len(batch.ligand_clusters)):
        start, end = batch.pair_slices[li]
        active, cands = batch.candidates[li]
        c = int(batch.num_conformers[li])
        if not active:
            out.append(0.0)
            continue
        pair_table: dict = {}
        for p in range(start, end):
            _, l1, l2, m1, m2, _ = batch.pair_meta[p]
            pair_table.setdefault((int(l1), int(l2)), {})[(int(m1), int(m2))] = tuple(
                table[p, :c].tolist()
            )
        cluster_match_dict = {l: cands[l] for l in active}
        root = ClusterMatchTreeRoot(active, cluster_match_dict, pair_table, c)
        root.run()
        scores = np.zeros(c)
        for leaf in root.iteration_leaf():
            for conf, score in leaf.pair_scores.items():
                if score > scores[conf]:
                    scores[conf] = score
        out.append(float(np.mean(scores)))
    return out


def _bucket_up(n: int, minimum: int = 1024) -> int:
    """Round up to the next half-octave bucket (1024, 1536, 2048, 3072, ...).

    Two buckets per octave bound recompilation (at most ~2x the pow2 shape
    count) while capping pad waste at 50% instead of 100% — the screening
    kernel is HBM-bound, so pad rows are paid for at full bandwidth."""
    size = minimum
    while size < n:
        if size + size // 2 >= n:
            return size + size // 2
        size *= 2
    return size


class BatchScreener:
    """Screens ligand batches against one pharmacophore model.

    engine: 'pallas' (gather-free Pallas gaussian kernel, scoring/
    screen_tiles.py + ops/screen_pallas.py), 'xla' (score_blocks_device),
    or None = auto (pallas on TPU devices, xla elsewhere).
    """

    def __init__(
        self,
        model,
        weights: dict[str, float] | None = None,
        engine: str | None = None,
        pallas_interpret: bool = False,
        pallas_fused: bool = True,
        native_pack: bool | None = None,
        pack_threads: int = 1,
    ):
        if isinstance(model, PackedModel):
            if weights is not None:
                raise ValueError("weights are baked into a PackedModel")
            self.packed_model = model
        else:
            self.packed_model = PackedModel.from_model(model, weights)
        self.engine = engine
        self.pallas_interpret = pallas_interpret
        self.pallas_fused = pallas_fused
        self.native_pack = native_pack
        self.pack_threads = pack_threads
        self._rows_hint: float = 600.0  # running rows-per-ligand estimate
        self._pack_buffers: dict = {}  # reused tiled-pack output arrays

    def _resolve_engine(self) -> str:
        if self.engine is not None:
            return self.engine
        dev = jax.devices()[0]
        self.engine = "pallas" if dev.device_kind.startswith("TPU") else "xla"
        return self.engine

    def score_ligands(self, ligands: list[Ligand]) -> list[float]:
        packed = [PackedLigand.from_ligand(lig) for lig in ligands]
        return self.score_packed(packed)

    def score_packed(self, packed: list[PackedLigand]) -> list[float]:
        # ligands with no clusters score 0 (graph_match.py:95-99)
        live = [(i, p) for i, p in enumerate(packed) if p.clusters]
        out = [0.0] * len(packed)
        if not live:
            return out
        if self._resolve_engine() == "v3":
            batch = build_batch(self.packed_model, [p for _, p in live])
            vb = self.build_vb(batch)
            for (i, _), s in zip(live, self.score_vb(vb)):
                out[i] = s
            return out
        if (
            self._resolve_engine() == "pallas"
            and self.pallas_fused
            and self.native_pack is not False
        ):
            scores = self._score_tiled_native([p for _, p in live])
            if scores is not None:
                for (i, _), s in zip(live, scores):
                    out[i] = s
                return out
            if self.native_pack is True:
                raise RuntimeError("native pack_tiled unavailable")
        batch = build_batch(self.packed_model, [p for _, p in live])
        if self._resolve_engine() == "pallas":
            tiled = self.device_args_pallas(batch)
            expanded = np.asarray(self.run_device_pallas(tiled))
            table = compact_pair_table_tiled(expanded, tiled.pair_end_rows)
        else:
            expanded = np.asarray(self.run_device(batch))  # [C, NS]
            table = compact_pair_table(batch, expanded)
        # geometric prune (host, static per batch; graph_match.py:267)
        prune = host_prune_mask(batch, self.packed_model)
        table[: len(prune)][prune] = -1.0
        scores = _dfs_scores(batch, table)
        for (i, _), s in zip(live, scores):
            out[i] = s
        return out

    def _score_tiled_native(self, live: list[PackedLigand]) -> list[float] | None:
        """Fast path: one-pass C++ pack straight to the tile-major layout +
        the fused Pallas kernel. Returns None when the native packer is
        unavailable (callers fall back to the reference path)."""
        from .tiled_pack import build_tiled_batch

        tb = build_tiled_batch(
            self.packed_model, live, threads=self.pack_threads,
            rows_hint=int(self._rows_hint * len(live)),
            buffer_cache=self._pack_buffers,
        )
        if tb is None:
            return None
        self._rows_hint = 0.7 * self._rows_hint + 0.3 * (tb.nst / max(1, len(live)))
        return self.score_tb(tb)

    def dispatch_tb(self, tb) -> jax.Array:
        """Launch the fused kernel on a packed tiled batch (async). NOTE:
        on the CPU backend jnp.asarray may alias the host arrays, so a tb
        whose buffers come from a buffer_cache must stay unmodified until
        the result is materialized (the executor releases pack slots only
        after postprocess_tb)."""
        from ..ops.screen_pallas import score_tiles_fused_rows

        return score_tiles_fused_rows(
            jnp.asarray(tb.pos_blocks), jnp.asarray(tb.uv),
            jnp.asarray(tb.gtab), jnp.asarray(tb.aux),
            depth1=tb.depth1, depth2=tb.depth2,
            interpret=self.pallas_interpret,
        )

    def postprocess_tb(self, tb, expanded_rows_dev) -> list[float]:
        """Host tail for one tiled batch: pair compaction (ascending
        C-contiguous row reads; ~5 ms/core vs ~80 ms striding the [C, NST]
        layout, and vs ~2.2 ms/batch for an on-device XLA gather — TPU
        gathers are a slow path), prune, and the assignment DFS."""
        table = compact_pair_table_rows(
            np.asarray(expanded_rows_dev), tb.pair_end_rows
        )
        prune = host_prune_mask(tb, self.packed_model)
        table[: len(prune)][prune] = -1.0
        return _dfs_scores(tb, table, threads=self.pack_threads)

    def score_tb(self, tb) -> list[float]:
        """Device + host tail for one packed tiled batch."""
        return self.postprocess_tb(tb, self.dispatch_tb(tb))

    # ------------------------------------------------------------------
    # v3 engine (block-major rows + deduplicated group tables;
    # scoring/screen_v3.py + ops/screen_pallas.score_tiles_v3)
    # ------------------------------------------------------------------
    def build_vb(self, batch: ScreenBatch):
        """v3 layout with recompile-bounded shape buckets: rows pad to the
        half-octave tile grid, the in-kernel mn axis to a half-octave of 8."""
        from .screen_tiles import TILE
        from .screen_v3 import build_v3_layout, pad_v3, padded_ends

        mn_max = int(batch.block_mn.max(initial=1))
        vb = build_v3_layout(
            batch, mn_cap=_bucket_up(mn_max, 8), model=self.packed_model
        )
        t = vb.dt.shape[0]
        t_bucket = -(-_bucket_up(max(vb.nbt, 1), TILE) // TILE)
        if t_bucket > t:
            vb = pad_v3(vb, t_bucket)
        vb.ends_padded = padded_ends(
            vb.pair_end_rows, _bucket_up(max(len(vb.pair_end_rows), 1))
        )
        return vb

    def dispatch_vb(self, vb) -> jax.Array:
        """Launch the v3 kernel on a v3 batch (async). With ends_padded
        set, pair compaction happens on device (score_tiles_v3_pairs) and
        this returns the [NPpad, c] pair table; otherwise the full
        [NBT, c] rows come back for host compaction."""
        from ..ops.screen_pallas import score_tiles_v3_pairs, score_tiles_v3_rows

        args = (
            jnp.asarray(vb.dt), jnp.asarray(vb.gid), jnp.asarray(vb.tab),
            jnp.asarray(vb.aux),
        )
        if vb.ends_padded is not None:
            return score_tiles_v3_pairs(
                *args, jnp.asarray(vb.ends_padded), depth=vb.depth,
                mn_cap=vb.mn_cap, g_cap=vb.g_cap,
                interpret=self.pallas_interpret,
            )
        return score_tiles_v3_rows(
            *args, depth=vb.depth, mn_cap=vb.mn_cap,
            g_cap=vb.g_cap, interpret=self.pallas_interpret,
        )

    def postprocess_vb(self, vb, rows_dev) -> list[float]:
        if vb.ends_padded is not None:
            table = np.asarray(rows_dev)[: len(vb.pair_end_rows)].copy()
            table[vb.pair_end_rows < 0] = 0.0
        else:
            table = compact_pair_table_rows(
                np.asarray(rows_dev), vb.pair_end_rows
            )
        prune = host_prune_mask(vb, self.packed_model)
        table[: len(prune)][prune] = -1.0
        return _dfs_scores(vb, table, threads=self.pack_threads)

    def score_vb(self, vb) -> list[float]:
        return self.postprocess_vb(vb, self.dispatch_vb(vb))

    def dispatch_stored(self, sb) -> jax.Array:
        """Launch the fused kernel on a tile-store batch (async). v2 stores
        carry prepack-time conformer distances, letting the dt kernel skip
        the in-kernel one-hot build + MXU select (~0.7 ms/batch of VPU
        work, PERF_NOTES round-2 ablation); v1 stores fall back to the
        pos/uv one-hot path."""
        if getattr(sb, "gid", None) is not None:
            # v3 store (block-major rows + group tables); pair compaction
            # on device when the store carries padded pair-end rows
            from ..ops.screen_pallas import (
                score_tiles_v3_pairs,
                score_tiles_v3_rows,
            )

            args = (
                jnp.asarray(sb.dt), jnp.asarray(sb.gid),
                jnp.asarray(sb.tab), jnp.asarray(sb.aux),
            )
            if getattr(sb, "leaf_buckets", None) is not None:
                # bucketed baked leaves (round-5 window-gather attack):
                # per width class, one window take + two MXU matmuls at
                # the class's (Lk, Wk), then a scatter back to batch order
                from .leaf_tree import leaf2_scores_multi

                rows = score_tiles_v3_rows(
                    *args, depth=sb.depth, mn_cap=sb.mn_cap,
                    g_cap=sb.g_cap, interpret=self.pallas_interpret,
                )
                buckets = tuple(
                    tuple(jnp.asarray(np.asarray(a)) for a in b)
                    for b in sb.leaf_buckets
                )
                return leaf2_scores_multi(
                    rows, jnp.asarray(np.asarray(sb.leaf2_out_ends)),
                    buckets, nb=sb.leaf_nb,
                )
            if getattr(sb, "leaf2_ps", None) is not None:
                # prepack-baked leaves: the assignment evaluation runs as
                # two MXU matmuls behind the raw kernel; the host tail is
                # reading [B] floats + a DFS over the few outlier ligands
                # (scoring/leaf_tree.py build_leaf_dense)
                from .leaf_tree import leaf2_scores_device

                rows = score_tiles_v3_rows(
                    *args, depth=sb.depth, mn_cap=sb.mn_cap,
                    g_cap=sb.g_cap, interpret=self.pallas_interpret,
                )
                return leaf2_scores_device(
                    rows,
                    jnp.asarray(np.asarray(sb.leaf2_ends)),
                    jnp.asarray(np.asarray(sb.leaf2_ps)),
                    jnp.asarray(np.asarray(sb.leaf2_pc)),
                    jnp.asarray(np.asarray(sb.leaf2_pw)),
                    jnp.asarray(sb.leaf_conf),
                    jnp.asarray(np.asarray(sb.leaf2_out_ends)),
                    w_cap=sb.leaf2_pw.shape[1],
                )
            if sb.ends_padded is not None:
                return score_tiles_v3_pairs(
                    *args, jnp.asarray(sb.ends_padded), depth=sb.depth,
                    mn_cap=sb.mn_cap, g_cap=sb.g_cap,
                    interpret=self.pallas_interpret,
                )
            return score_tiles_v3_rows(
                *args, depth=sb.depth, mn_cap=sb.mn_cap, g_cap=sb.g_cap,
                interpret=self.pallas_interpret,
            )
        if getattr(sb, "dt", None) is None:
            return self.dispatch_tb(sb)
        from ..ops.screen_pallas import score_tiles_fused_dt_rows

        return score_tiles_fused_dt_rows(
            jnp.asarray(sb.dt), jnp.asarray(sb.gtab), jnp.asarray(sb.aux),
            depth1=sb.depth1, depth2=sb.depth2,
            interpret=self.pallas_interpret,
        )

    def postprocess_stored(self, sb, expanded_rows_dev) -> list[float]:
        """Host tail for a tile-store batch: the prune mask and the DFS
        candidate arrays were precomputed at prepack time, so this is just
        the pair-row gather + the C++ DFS (~25 ms/batch/core vs ~214 ms
        for the full pack-at-screen-time path). v3 batches with device-side
        compaction hand a ready [NPpad, c] pair table instead; leaf-baked
        batches hand the final [B] score vector — no DFS at all."""
        if (
            getattr(sb, "leaf2_ps", None) is not None
            or getattr(sb, "leaf_buckets", None) is not None
        ):
            dev_scores, out_rows = expanded_rows_dev
            live_scores = np.asarray(dev_scores, dtype=np.float64)
            scores = [0.0] * sb.batch_len
            for i, s in zip(sb.live_index, live_scores):
                scores[int(i)] = float(s)
            o = sb.leaf2_out
            if len(o["live"]):
                # heavy-tail ligands above the baked caps: host DFS over
                # their device-gathered sub-table (empty pairs already 0.0
                # via the zero-sentinel row; prune applied here)
                import types

                tbl = np.asarray(out_rows)[: int(o["n_rows"])].copy()
                tbl[o["prune"][: int(o["n_rows"])]] = -1.0
                duck = types.SimpleNamespace(
                    dfs_arrays=(
                        o["pair_starts"], o["conformers"],
                        o["active_offsets"], o["cand_counts"],
                    )
                )
                out_scores = _dfs_scores(duck, tbl, threads=self.pack_threads)
                for k, li in enumerate(o["live"]):
                    scores[int(sb.live_index[int(li)])] = float(out_scores[k])
            return scores
        if getattr(sb, "pair_end_rows", 0) is None:
            # leaf-baked load deferred the DFS-tail fields; this batch is
            # taking a non-leaf fallback (mixed sharded group / stripped
            # leaves), so materialize them now
            sb.ensure_host_fields()
        if getattr(sb, "ends_padded", None) is not None:
            table = np.asarray(expanded_rows_dev)[
                : len(sb.pair_end_rows)].copy()
            table[sb.pair_end_rows < 0] = 0.0
        else:
            table = compact_pair_table_rows(
                np.asarray(expanded_rows_dev), sb.pair_end_rows
            )
        table[: len(sb.prune)][sb.prune] = -1.0
        live_scores = _dfs_scores(sb, table, threads=self.pack_threads)
        scores = [0.0] * sb.batch_len
        for i, s in zip(sb.live_index, live_scores):
            scores[int(i)] = s
        return scores

    def score_stored(self, sb) -> list[float]:
        """Device + host tail for one StoredBatch / StoredV3Batch from a
        tile store (scoring/tiled_store.py); cluster-less ligands score 0
        in place."""
        if sb.empty:
            return [0.0] * sb.batch_len
        return self.postprocess_stored(sb, self.dispatch_stored(sb))

    def device_args_pallas(self, batch: ScreenBatch, ns_tiled: int | None = None):
        """Host prep for the Pallas engine: untiled lane-major prep
        (without the unique-distance table) + the tiled re-layout."""
        from .screen_tiles import TILE, build_tiled_layout, pad_tiled

        args, (d1, d2) = self.device_args(
            batch, as_numpy=True, with_unique=False
        )
        tiled = build_tiled_layout(batch, args, (d1, d2), ns_tiled=ns_tiled)
        if ns_tiled is None:
            # half-octave bucket (recompile bound) rounded to the tile grid
            nst = ((_bucket_up(tiled.muT.shape[1]) + TILE - 1) // TILE) * TILE
            tiled = pad_tiled(tiled, nst)
        return tiled

    def run_device_pallas(self, tiled) -> jax.Array:
        from ..ops.screen_pallas import score_blocks_pallas, score_blocks_pallas_fused

        fn = score_blocks_pallas_fused if self.pallas_fused else score_blocks_pallas
        return fn(
            jnp.asarray(tiled.pos_blocks),
            jnp.asarray(tiled.uv_packed),
            jnp.asarray(tiled.muT),
            jnp.asarray(tiled.invT),
            jnp.asarray(tiled.winvT),
            jnp.asarray(tiled.flags_block),
            jnp.asarray(tiled.flags_pair),
            jnp.asarray(tiled.end_mn_inv),
            jnp.asarray(tiled.end_mn_half),
            jnp.asarray(tiled.end_fail_gate),
            jnp.asarray(tiled.thr_ns),
            jnp.asarray(tiled.self_ns),
            depth1=tiled.depth1,
            depth2=tiled.depth2,
            interpret=self.pallas_interpret,
        )

    def device_args(
        self,
        batch: ScreenBatch,
        ns_pad: int | None = None,
        np_pad: int | None = None,
        nu_pad: int | None = None,
        b_pad: int | None = None,
        depth1: int | None = None,
        depth2: int | None = None,
        native: bool | None = None,
        as_numpy: bool = False,
        with_unique: bool = True,
    ) -> tuple[tuple, tuple[int, int]]:
        """Host prep + device transfer (reusable across calls).

        Returns (args, (depth1, depth2)) for score_blocks_device. All pads
        and depths may be fixed explicitly so multi-shard batches share
        shapes; by default they come from power-of-two buckets of the batch.

        Dispatches to the fused C++ prep (native/prep_args.cpp) when
        available; the numpy path below is the semantic reference and the
        fallback (native=None means auto).
        """
        ns_real = len(batch.sub_d_idx)
        np_real = len(batch.pair_threshold)
        ns = ns_pad or _bucket_up(ns_real, minimum=1024)
        nb = len(batch.block_mn)
        del np_pad  # pair-level arrays live in the expanded NS domain

        if with_unique:
            pair_u, pair_v, sub_slot = unique_distance_table(batch)
            if nu_pad is not None:
                assert nu_pad >= len(pair_u)
                pair_u = np.pad(pair_u, (0, nu_pad - len(pair_u)))
                pair_v = np.pad(pair_v, (0, nu_pad - len(pair_v)))
            sub_slot = np.pad(sub_slot, (0, ns - ns_real))
        else:
            # the pallas engine reconstructs distances from per-tile node
            # tables — skip the np.unique pass entirely
            pair_u = pair_v = np.zeros(1, np.int32)
            sub_slot = np.zeros(ns, np.int32)

        prep = None
        if native is not False:
            from ..native import get_prep_args

            prep = get_prep_args()
            if prep is None and native is True:
                raise RuntimeError("native prep_args unavailable")

        if prep is not None:
            muT = np.empty((BLOCK_P, ns), dtype=np.float32)
            invT = np.empty((BLOCK_P, ns), dtype=np.float32)
            winvT = np.empty((BLOCK_P, ns), dtype=np.float32)
            flags_block = np.empty(ns, dtype=bool)
            flags_pair = np.empty(ns, dtype=bool)
            end_mn_inv = np.empty(ns, dtype=np.float32)
            end_mn_half = np.empty(ns, dtype=np.float32)
            end_fail_gate = np.empty(ns, dtype=np.float32)
            thr_ns = np.empty(ns, dtype=np.float32)
            self_ns = np.empty(ns, dtype=bool)
            out_max = np.zeros(2, dtype=np.int64)
            prep(
                ns_real, ns, nb, np_real, BLOCK_P,
                np.ascontiguousarray(batch.sub_mu),
                np.ascontiguousarray(batch.sub_std),
                np.ascontiguousarray(batch.sub_w),
                np.ascontiguousarray(batch.sub_block),
                np.ascontiguousarray(batch.block_pair),
                np.ascontiguousarray(batch.block_mn),
                np.ascontiguousarray(batch.block_is_cross),
                np.ascontiguousarray(batch.pair_threshold),
                np.ascontiguousarray(batch.pair_meta[:, 5])
                if np_real else np.zeros(0, np.int32),
                muT, invT, winvT, flags_block, flags_pair,
                end_mn_inv, end_mn_half, end_fail_gate, thr_ns, self_ns,
                out_max,
            )
            max_block = max(1, int(out_max[0]))
            max_pair = max(1, int(out_max[1]))
        else:
            # lane-major gaussian inputs (device never transposes)
            muT = np.zeros((BLOCK_P, ns), dtype=np.float32)
            invT = np.ones((BLOCK_P, ns), dtype=np.float32)
            winvT = np.zeros((BLOCK_P, ns), dtype=np.float32)
            muT[:, :ns_real] = batch.sub_mu.T
            invT[:, :ns_real] = (1.0 / batch.sub_std).T
            winvT[:, :ns_real] = (batch.sub_w / batch.sub_std).T

            # segment flags + block-end annotations over the NS axis
            sub_block = batch.sub_block
            sub_pair = (
                batch.block_pair[sub_block] if len(sub_block) else np.zeros(0, np.int32)
            )
            flags_block = np.ones(ns, dtype=bool)
            flags_pair = np.ones(ns, dtype=bool)
            if ns_real:
                flags_block[1:ns_real] = sub_block[1:] != sub_block[:-1]
                flags_pair[1:ns_real] = sub_pair[1:] != sub_pair[:-1]

            block_ends, _, _ = segment_boundaries(sub_block, nb)  # [NB] sub rows
            end_mn_inv = np.zeros(ns, dtype=np.float32)
            end_mn_half = np.zeros(ns, dtype=np.float32)
            end_fail_gate = np.zeros(ns, dtype=np.float32)
            end_mn_inv[block_ends] = 1.0 / np.maximum(batch.block_mn, 1)
            end_mn_half[block_ends] = (batch.block_mn + 1) // 2
            end_fail_gate[block_ends] = batch.block_is_cross.astype(np.float32)

            # pair threshold / is_self expanded to sub rows (pads: inf / self)
            thr_ns = np.full(ns, np.inf, dtype=np.float32)
            self_ns = np.ones(ns, dtype=bool)
            if ns_real:
                thr_ns[:ns_real] = batch.pair_threshold[sub_pair]
                self_ns[:ns_real] = batch.pair_meta[sub_pair, 5] == 1

            # bounded scan depths: longest block span / longest pair span
            counts_b = np.bincount(sub_block, minlength=nb)[:nb]
            max_block = max(1, int(counts_b.max(initial=1)))
            counts_p = np.bincount(sub_pair, minlength=np_real)[:np_real]
            max_pair = max(1, int(counts_p.max(initial=1)))

        d1 = depth1 if depth1 is not None else max(1, int(np.ceil(np.log2(max_block))))
        d2 = depth2 if depth2 is not None else max(2, int(np.ceil(np.log2(max_pair))))

        node_pos = batch.node_pos
        if b_pad is not None and b_pad > node_pos.shape[0]:
            extra = b_pad - node_pos.shape[0]
            node_pos = np.concatenate(
                [node_pos, np.zeros((extra, *node_pos.shape[1:]), np.float32)]
            )

        args = (
            node_pos, muT, invT, winvT, pair_u, pair_v, sub_slot,
            flags_block, flags_pair, end_mn_inv, end_mn_half, end_fail_gate,
            thr_ns, self_ns,
        )
        if not as_numpy:
            args = tuple(jnp.asarray(a) for a in args)
        return args, (d1, d2)

    def run_device(self, batch: ScreenBatch, prepared=None) -> jax.Array:
        if prepared is None:
            prepared = self.device_args(batch)
        args, (d1, d2) = prepared
        return score_blocks_device(*args, depth1=d1, depth2=d2)


