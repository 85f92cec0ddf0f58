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

    @classmethod
    def from_ligand(cls, ligand: Ligand) -> "PackedLigand":
        graph = ligand.graph
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


def build_batch(
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

    node_pos = np.zeros((len(ligands), ln, cmax, 3), dtype=np.float32)
    num_conf = np.zeros(len(ligands), dtype=np.int32)
    lmax = lmax or max(len(lig.clusters) for lig in ligands)
    lig_center = np.zeros((len(ligands), lmax, cmax, 3), dtype=np.float32)
    lig_size = np.zeros((len(ligands), lmax, cmax), dtype=np.float32)
    for li, lig in enumerate(ligands):
        n, c = lig.node_pos.shape[0], lig.num_conformers
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
    )


# ==========================================================================
# Device kernel
# ==========================================================================
@functools.partial(jax.jit, static_argnames=("num_blocks", "num_pairs"))
def score_blocks_device(
    node_pos: jax.Array,  # [B, Ln, C, 3]
    sub_mu: jax.Array,  # [NS, P]
    sub_std: jax.Array,
    sub_w: jax.Array,
    sub_d_idx: jax.Array,  # [NS]
    sub_block: jax.Array,  # [NS]
    block_mn: jax.Array,  # [NB]
    block_pair: jax.Array,  # [NB]
    block_is_cross: jax.Array,  # [NB]
    pair_threshold: jax.Array,  # [NP]
    pair_meta: jax.Array,  # [NP, 6]
    lig_cluster_center: jax.Array,  # [B, L, C, 3]
    lig_cluster_size: jax.Array,  # [B, L, C]
    model_cluster_center: jax.Array,  # [M, 3]
    model_cluster_size: jax.Array,  # [M]
    num_blocks: int,
    num_pairs: int,
) -> jax.Array:
    """Returns pair score table S [NP, C] with -1 for failed/pruned pairs."""
    b, ln, c, _ = node_pos.shape
    # all pairwise node distances per conformer
    diff = node_pos[:, :, None, :, :] - node_pos[:, None, :, :, :]  # [B,Ln,Ln,C,3]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))  # [B, Ln, Ln, C]
    dist_flat = dist.reshape(-1, c)

    d = dist_flat[sub_d_idx]  # [NS, C]
    x = (d[:, None, :] - sub_mu[:, :, None]) / sub_std[:, :, None]  # [NS, P, C]
    x2 = x * x
    valid = sub_w[:, :, None] > 0.0
    gauss = jnp.where(valid, sub_w[:, :, None] / sub_std[:, :, None] * jnp.exp(-0.5 * x2), 0.0)
    sub_scores = jnp.sum(gauss, axis=1)  # [NS, C]
    sub_pass = jnp.sum(jnp.where(valid & (x2 < 4.0), 1, 0), axis=1)  # [NS, C]

    block_scores = jax.ops.segment_sum(sub_scores, sub_block, num_segments=num_blocks)
    block_pass = jax.ops.segment_sum(sub_pass, sub_block, num_segments=num_blocks)
    block_scores = block_scores / jnp.maximum(block_mn, 1)[:, None]
    block_fail = (block_pass < ((block_mn[:, None] + 1) // 2)) & (
        block_is_cross[:, None] == 1
    )

    pair_scores = jax.ops.segment_sum(block_scores, block_pair, num_segments=num_pairs)
    pair_fails = jax.ops.segment_sum(
        block_fail.astype(jnp.int32), block_pair, num_segments=num_pairs
    )
    failed = pair_fails.astype(jnp.float32) > pair_threshold[:, None]

    # geometric prune for cross pairs (graph_match.py:267)
    li = pair_meta[:, 0]
    l1 = pair_meta[:, 1]
    l2 = pair_meta[:, 2]
    m1 = pair_meta[:, 3]
    m2 = pair_meta[:, 4]
    is_self = pair_meta[:, 5] == 1
    lc1 = lig_cluster_center[li, l1]  # [NP, C, 3]
    lc2 = lig_cluster_center[li, l2]
    lig_dist = jnp.linalg.norm(lc1 - lc2, axis=-1)  # [NP, C]
    lig_size = lig_cluster_size[li, l1] + lig_cluster_size[li, l2]  # [NP, C]
    model_dist = jnp.linalg.norm(
        model_cluster_center[m1] - model_cluster_center[m2], axis=-1
    )  # [NP]
    model_size = model_cluster_size[m1] + model_cluster_size[m2]
    pruned = (
        jnp.min(jnp.abs(lig_dist - model_dist[:, None]) - lig_size, axis=-1) > model_size
    )  # [NP] (pair-level)
    # failed is per-conformer (numba semantics: -1 only on failed conformers)
    scores = jnp.where(failed & (~is_self[:, None]), -1.0, pair_scores)
    scores = jnp.where(((~is_self) & pruned)[:, None], -1.0, scores)
    return scores


# ==========================================================================
# Host DFS + end-to-end screening
# ==========================================================================
def _dfs_scores(batch: ScreenBatch, table: np.ndarray) -> list[float]:
    """Run the assignment tree per ligand from the device table."""
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


class BatchScreener:
    """Screens ligand batches against one pharmacophore model."""

    def __init__(self, model, weights: dict[str, float] | None = None):
        self.packed_model = PackedModel.from_model(model, weights)

    def score_ligands(self, ligands: list[Ligand]) -> list[float]:
        packed = [PackedLigand.from_ligand(lig) for lig in ligands]
        return self.score_packed(packed)

    def score_packed(self, packed: list[PackedLigand]) -> list[float]:
        # ligands with no clusters score 0 (graph_match.py:95-99)
        live = [(i, p) for i, p in enumerate(packed) if p.clusters]
        out = [0.0] * len(packed)
        if not live:
            return out
        batch = build_batch(self.packed_model, [p for _, p in live])
        table = np.asarray(self.run_device(batch))
        scores = _dfs_scores(batch, table)
        for (i, _), s in zip(live, scores):
            out[i] = s
        return out

    def device_args(self, batch: ScreenBatch) -> tuple:
        """Transfer batch arrays to device once (reusable across calls)."""
        m = self.packed_model
        return (
            jnp.asarray(batch.node_pos),
            jnp.asarray(batch.sub_mu),
            jnp.asarray(batch.sub_std),
            jnp.asarray(batch.sub_w),
            jnp.asarray(batch.sub_d_idx),
            jnp.asarray(batch.sub_block),
            jnp.asarray(batch.block_mn),
            jnp.asarray(batch.block_pair),
            jnp.asarray(batch.block_is_cross),
            jnp.asarray(batch.pair_threshold),
            jnp.asarray(batch.pair_meta),
            jnp.asarray(batch.lig_cluster_center),
            jnp.asarray(batch.lig_cluster_size),
            jnp.asarray(m.cluster_center),
            jnp.asarray(m.cluster_size),
        )

    def run_device(self, batch: ScreenBatch, args: tuple | None = None) -> jax.Array:
        if args is None:
            args = self.device_args(batch)
        return score_blocks_device(
            *args,
            num_blocks=len(batch.block_mn),
            num_pairs=len(batch.pair_threshold),
        )
