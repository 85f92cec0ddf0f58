"""Mesh-sharded batch screening: ligand shards over a ('data',) mesh.

Replaces the reference's fork-based multiprocessing.Pool over ligand files
(/root/reference/screening.py:67-68) with SPMD: ligands are split into
per-device shards, each shard's block arrays are padded to common shapes,
and one shard_map program evaluates every shard's pair-score tables in
parallel. Model-side arrays are replicated (tens of KB); there is no
cross-device communication in the score phase — it is a pure map, with
results gathered to the host for the (tiny) assignment DFS.
"""

from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..scoring.batch_screen import (
    BatchScreener,
    PackedLigand,
    ScreenBatch,
    _dfs_scores,
    score_blocks_device,
    segment_boundaries,
    unique_distance_table,
)
from .mesh import DATA_AXIS, data_mesh


def _pad_batch(batch: ScreenBatch, ns: int, nb: int, np_: int, b: int) -> ScreenBatch:
    """Pad block arrays to (ns, nb, np_) with a dummy block/pair chain."""
    cur_ns, cur_nb, cur_np = len(batch.sub_d_idx), len(batch.block_mn), len(batch.pair_threshold)
    assert ns >= cur_ns and nb >= cur_nb and np_ >= cur_np

    def pad2(x, n, fill=0.0):
        out = np.full((n, x.shape[1]), fill, dtype=x.dtype)
        out[: x.shape[0]] = x
        return out

    def pad1(x, n, fill=0):
        out = np.full((n,), fill, dtype=x.dtype)
        out[: x.shape[0]] = x
        return out

    pad_ligands = b - batch.node_pos.shape[0]
    node_pos = np.concatenate(
        [batch.node_pos, np.zeros((pad_ligands, *batch.node_pos.shape[1:]), np.float32)]
    )
    lig_center = np.concatenate(
        [
            batch.lig_cluster_center,
            np.zeros((pad_ligands, *batch.lig_cluster_center.shape[1:]), np.float32),
        ]
    )
    lig_size = np.concatenate(
        [
            batch.lig_cluster_size,
            np.zeros((pad_ligands, *batch.lig_cluster_size.shape[1:]), np.float32),
        ]
    )
    meta_pad = np.zeros((np_, 6), dtype=np.int32)
    meta_pad[:cur_np] = batch.pair_meta
    meta_pad[cur_np:, 5] = 1  # dummy pairs are 'self' (never forced to -1)
    return replace(
        batch,
        sub_mu=pad2(batch.sub_mu, ns),
        sub_std=pad2(batch.sub_std, ns, fill=1.0),
        sub_w=pad2(batch.sub_w, ns),
        sub_d_idx=pad1(batch.sub_d_idx, ns),
        sub_block=pad1(batch.sub_block, ns, fill=max(nb - 1, 0)),
        block_mn=pad1(batch.block_mn, nb, fill=1),
        block_pair=pad1(batch.block_pair, nb, fill=max(np_ - 1, 0)),
        block_is_cross=pad1(batch.block_is_cross, nb),
        pair_threshold=pad1(batch.pair_threshold, np_, fill=np.float32(np.inf)),
        pair_meta=meta_pad,
        node_pos=node_pos,
        num_conformers=pad1(batch.num_conformers, b, fill=1),
        lig_cluster_center=lig_center,
        lig_cluster_size=lig_size,
    )


class ShardedScreener(BatchScreener):
    """BatchScreener that fans ligand shards over a device mesh."""

    def __init__(self, model, weights=None, mesh=None):
        super().__init__(model, weights)
        self.mesh = mesh if mesh is not None else data_mesh()

    def score_packed(self, packed: list[PackedLigand]) -> list[float]:
        live = [(i, p) for i, p in enumerate(packed) if p.clusters]
        out = [0.0] * len(packed)
        if not live:
            return out
        n_dev = self.mesh.devices.size
        if len(live) < n_dev:
            # too few ligands to shard — single-device path
            return super().score_packed(packed)

        live_packed = [p for _, p in live]
        ln = max(p.node_pos.shape[0] for p in live_packed)
        cmax = max(p.num_conformers for p in live_packed)
        lmax = max(len(p.clusters) for p in live_packed)

        # contiguous shards
        bounds = np.linspace(0, len(live_packed), n_dev + 1).astype(int)
        shards = [live_packed[bounds[i] : bounds[i + 1]] for i in range(n_dev)]
        from ..scoring.batch_screen import build_batch

        batches = [build_batch(self.packed_model, s, ln=ln, cmax=cmax, lmax=lmax) for s in shards]
        ns = max(len(b.sub_d_idx) for b in batches) + 1
        nb = max(len(b.block_mn) for b in batches) + 1
        np_ = max(len(b.pair_threshold) for b in batches) + 1
        bmax = max(b.node_pos.shape[0] for b in batches)
        padded = [_pad_batch(b, ns, nb, np_, bmax) for b in batches]

        def stack(field):
            return jnp.asarray(np.stack([getattr(b, field) for b in padded]))

        block_ends = np.stack(
            [segment_boundaries(b.sub_block, nb)[0] for b in padded]
        )
        pair_bounds = [segment_boundaries(b.block_pair, np_) for b in padded]
        pair_ends = np.stack([pb[0] for pb in pair_bounds])
        pair_has = np.stack([pb[2] for pb in pair_bounds])

        # unique distance tables, padded to a common size across shards
        tables_uvs = [unique_distance_table(b) for b in padded]
        nu = max(1, max(len(u) for u, _, _ in tables_uvs))
        pair_u = np.zeros((n_dev, nu), np.int32)
        pair_v = np.zeros((n_dev, nu), np.int32)
        sub_slot = np.stack([s for _, _, s in tables_uvs])
        for i, (u, v, _) in enumerate(tables_uvs):
            pair_u[i, : len(u)] = u
            pair_v[i, : len(v)] = v
        inv = np.stack([(1.0 / b.sub_std).astype(np.float32) for b in padded])
        winv = np.stack(
            [(b.sub_w / b.sub_std).astype(np.float32) for b in padded]
        )

        m = self.packed_model
        model_args = (
            jnp.asarray(m.cluster_center),
            jnp.asarray(m.cluster_size),
        )

        @jax.jit
        def sharded_score(*args):
            def per_shard(*shard_args):
                sharded = [a[0] for a in shard_args[:-2]]
                return score_blocks_device(
                    *sharded, *shard_args[-2:], num_blocks=nb, num_pairs=np_
                )[None]

            return jax.shard_map(
                per_shard,
                mesh=self.mesh,
                in_specs=(P(DATA_AXIS),) * (len(args) - 2) + (P(), P()),
                out_specs=P(DATA_AXIS),
            )(*args)

        tables = sharded_score(
            stack("node_pos"), stack("sub_mu"), jnp.asarray(inv), jnp.asarray(winv),
            jnp.asarray(pair_u), jnp.asarray(pair_v), jnp.asarray(sub_slot),
            stack("sub_block"), stack("block_mn"),
            stack("block_pair"), stack("block_is_cross"), jnp.asarray(block_ends),
            stack("pair_threshold"), stack("pair_meta"), jnp.asarray(pair_ends),
            jnp.asarray(pair_has),
            stack("lig_cluster_center"), stack("lig_cluster_size"),
            *model_args,
        )
        tables = np.asarray(tables)  # [n_dev, NP, C]

        scores: list[float] = []
        for shard_idx, batch in enumerate(batches):
            scores.extend(_dfs_scores(batch, tables[shard_idx]))
        for (i, _), s in zip(live, scores):
            out[i] = s
        return out
