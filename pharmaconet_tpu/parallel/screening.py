"""Mesh-sharded batch screening: ligand shards over a ('data',) mesh.

Replaces the reference's fork-based multiprocessing.Pool over ligand files
(/root/reference/screening.py:67-68) with SPMD: ligands are split into
per-device shards, each shard's arrays are padded to common shapes, and one
shard_map program evaluates every shard's pair-score tables in parallel. No
cross-device communication happens in the score phase — it is a pure map,
with results gathered to the host for the (tiny) assignment DFS.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..scoring.batch_screen import (
    BatchScreener,
    PackedLigand,
    _bucket_up,
    _dfs_scores,
    build_batch,
    compact_pair_table,
    compact_pair_table_rows,
    host_prune_mask,
    score_blocks_device,
    unique_distance_table,
)
from .mesh import DATA_AXIS, data_mesh


class ShardedScreener(BatchScreener):
    """BatchScreener that fans ligand shards over a device mesh."""

    def __init__(self, model, weights=None, mesh=None, engine=None,
                 pallas_interpret=False, pack_threads: int = 1):
        super().__init__(model, weights, engine=engine,
                         pallas_interpret=pallas_interpret,
                         pack_threads=pack_threads)
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

        # contiguous shards with common array shapes
        bounds = np.linspace(0, len(live_packed), n_dev + 1).astype(int)
        shards = [live_packed[bounds[i] : bounds[i + 1]] for i in range(n_dev)]
        if (
            self._resolve_engine() == "pallas"
            and self.pallas_fused
            and self.native_pack is not False
        ):
            scores = self._score_shards_tiled_native(shards, cmax)
            if scores is not None:
                for (i, _), s in zip(live, scores):
                    out[i] = s
                return out
        batches = [
            build_batch(self.packed_model, s, ln=ln, cmax=cmax, lmax=lmax)
            for s in shards
        ]
        if self._resolve_engine() == "pallas":
            return self._score_shards_pallas(live, batches, out)
        ns_pad = _bucket_up(max(len(b.sub_d_idx) for b in batches), minimum=1024)
        nu_pad = _bucket_up(
            max(len(unique_distance_table(b)[0]) for b in batches), minimum=256
        )
        b_pad = max(b.node_pos.shape[0] for b in batches)
        prepared = [
            self.device_args(b, ns_pad=ns_pad, nu_pad=nu_pad, b_pad=b_pad)
            for b in batches
        ]
        d1 = max(d[0] for _, d in prepared)
        d2 = max(d[1] for _, d in prepared)
        if any(d != (d1, d2) for _, d in prepared):
            prepared = [
                self.device_args(
                    b, ns_pad=ns_pad, nu_pad=nu_pad, b_pad=b_pad,
                    depth1=d1, depth2=d2,
                )
                for b in batches
            ]
        num_args = len(prepared[0][0])
        stacked = [
            jnp.stack([args[j] for args, _ in prepared]) for j in range(num_args)
        ]

        @jax.jit
        def sharded_score(*args):
            def per_shard(*shard_args):
                return score_blocks_device(
                    *[a[0] for a in shard_args], depth1=d1, depth2=d2
                )[None]

            return jax.shard_map(
                per_shard,
                mesh=self.mesh,
                in_specs=(P(DATA_AXIS),) * len(args),
                out_specs=P(DATA_AXIS),
            )(*args)

        tables = np.asarray(sharded_score(*stacked))  # [n_dev, C, NS]

        scores: list[float] = []
        for shard_idx, batch in enumerate(batches):
            table = compact_pair_table(batch, tables[shard_idx])
            prune = host_prune_mask(batch, self.packed_model)
            table[: len(prune)][prune] = -1.0
            scores.extend(_dfs_scores(batch, table, threads=self.pack_threads))
        for (i, _), s in zip(live, scores):
            out[i] = s
        return out

    def _score_shards_pallas(self, live, batches, out) -> list[float]:
        """Pallas engine fan-out: per-shard tiled layouts padded to a common
        width, one shard_map program over score_blocks_pallas."""
        from ..ops.screen_pallas import score_blocks_pallas
        from ..scoring.batch_screen import compact_pair_table_tiled
        from ..scoring.screen_tiles import pad_tiled

        tileds = [self.device_args_pallas(b, ns_tiled=None) for b in batches]
        nst = max(t.muT.shape[1] for t in tileds)
        tileds = [pad_tiled(t, nst) for t in tileds]
        d1 = max(t.depth1 for t in tileds)
        d2 = max(t.depth2 for t in tileds)

        fields = (
            "pos_blocks", "uv_packed", "muT", "invT", "winvT", "flags_block",
            "flags_pair", "end_mn_inv", "end_mn_half", "end_fail_gate",
            "thr_ns", "self_ns",
        )
        stacked = [
            jnp.asarray(np.stack([getattr(t, f) for t in tileds]))
            for f in fields
        ]
        interpret = self.pallas_interpret

        @jax.jit
        def sharded_score(*args):
            def per_shard(*shard_args):
                return score_blocks_pallas(
                    *[a[0] for a in shard_args],
                    depth1=d1, depth2=d2, interpret=interpret,
                )[None]

            return jax.shard_map(
                per_shard,
                mesh=self.mesh,
                in_specs=(P(DATA_AXIS),) * len(args),
                out_specs=P(DATA_AXIS),
                # pallas_call out_shapes carry no vma annotation; the map is
                # embarrassingly parallel so the check adds nothing here
                check_vma=False,
            )(*args)

        tables = np.asarray(sharded_score(*stacked))  # [n_dev, C, NST]
        scores: list[float] = []
        for shard_idx, batch in enumerate(batches):
            table = compact_pair_table_tiled(
                tables[shard_idx], tileds[shard_idx].pair_end_rows
            )
            prune = host_prune_mask(batch, self.packed_model)
            table[: len(prune)][prune] = -1.0
            scores.extend(_dfs_scores(batch, table, threads=self.pack_threads))
        for (i, _), s in zip(live, scores):
            out[i] = s
        return out

    def _fused_sharded_program(self, d1: int, d2: int, interpret: bool,
                               use_dt: bool = False):
        """Per-instance cache of the jitted fused shard_map program, keyed on
        the static scan depths; jax.jit's own cache then handles the
        width/depth shape bucketing without a Python-level re-trace per
        batch (the bucketing exists precisely so shapes repeat). use_dt
        selects the tile-store-v2 variant consuming prepack-time conformer
        distances instead of rebuilding them in-kernel."""
        from ..ops.screen_pallas import (
            score_tiles_fused_dt_rows,
            score_tiles_fused_rows,
        )

        if not hasattr(self, "_fused_programs"):
            self._fused_programs = {}
        key = (d1, d2, interpret, use_dt)
        prog = self._fused_programs.get(key)
        if prog is None:
            if use_dt:

                @jax.jit
                def sharded_score(dt, gtab, aux):
                    def per_shard(dt, gtab, aux):
                        return score_tiles_fused_dt_rows(
                            dt[0], gtab[0], aux[0],
                            depth1=d1, depth2=d2, interpret=interpret,
                        )[None]

                    return jax.shard_map(
                        per_shard,
                        mesh=self.mesh,
                        in_specs=(P(DATA_AXIS),) * 3,
                        out_specs=P(DATA_AXIS),
                        check_vma=False,
                    )(dt, gtab, aux)

            else:

                @jax.jit
                def sharded_score(pos, uv, gtab, aux):
                    def per_shard(pos, uv, gtab, aux):
                        return score_tiles_fused_rows(
                            pos[0], uv[0], gtab[0], aux[0],
                            depth1=d1, depth2=d2, interpret=interpret,
                        )[None]

                    return jax.shard_map(
                        per_shard,
                        mesh=self.mesh,
                        in_specs=(P(DATA_AXIS),) * 4,
                        out_specs=P(DATA_AXIS),
                        check_vma=False,
                    )(pos, uv, gtab, aux)

            prog = self._fused_programs[key] = sharded_score
        return prog

    def _v3_sharded_program(self, depth: int, mn_cap: int, g_cap: int,
                            interpret: bool, use_ends: bool,
                            w_cap: int = 0):
        """Cached jitted shard_map program over stacked v3-store batches
        (one StoredV3Batch per device slot). use_ends adds the on-device
        pair compaction (score_tiles_v3_pairs); w_cap > 0 instead chains
        the dense baked-leaf evaluation (scoring/leaf_tree.py) so each
        shard returns ([batch_size] scores, [NOUT_pad, C] outlier rows)."""
        from ..ops.screen_pallas import (
            score_tiles_v3_pairs,
            score_tiles_v3_rows,
        )
        from ..scoring.leaf_tree import leaf2_scores_device

        if not hasattr(self, "_v3_programs"):
            self._v3_programs = {}
        key = (depth, mn_cap, g_cap, interpret, use_ends, w_cap)
        prog = self._v3_programs.get(key)
        if prog is None:
            if isinstance(w_cap, tuple):
                # bucketed leaf layout: w_cap carries (nb, n_buckets,
                # arity); the flat operand order is dt,gid,tab,aux,oends
                # then `arity` arrays per bucket — 6 for the dense wire,
                # 7 for the sparse wire (leaf_tree.leaf2_scores_multi)
                from ..scoring.leaf_tree import leaf2_scores_multi

                nb, n_buckets, arity = w_cap
                n_ops = 5 + arity * n_buckets

                @jax.jit
                def sharded_score(*ops):
                    def per_shard(*ops):
                        dt, gid, tab, aux, oends = ops[:5]
                        rows = score_tiles_v3_rows(
                            dt[0], gid[0], tab[0], aux[0],
                            depth=depth, mn_cap=mn_cap, g_cap=g_cap,
                            interpret=interpret,
                        )
                        buckets = tuple(
                            tuple(
                                a[0]
                                for a in ops[5 + arity * k : 5 + arity * (k + 1)]
                            )
                            for k in range(n_buckets)
                        )
                        scores, out_rows = leaf2_scores_multi(
                            rows, oends[0], buckets, nb=nb
                        )
                        return scores[None], out_rows[None]

                    return jax.shard_map(
                        per_shard,
                        mesh=self.mesh,
                        in_specs=(P(DATA_AXIS),) * n_ops,
                        out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
                        check_vma=False,
                    )(*ops)

            elif w_cap:

                @jax.jit
                def sharded_score(dt, gid, tab, aux,
                                  ends2, ps, pc, pw, conf, oends):
                    def per_shard(dt, gid, tab, aux,
                                  ends2, ps, pc, pw, conf, oends):
                        rows = score_tiles_v3_rows(
                            dt[0], gid[0], tab[0], aux[0],
                            depth=depth, mn_cap=mn_cap, g_cap=g_cap,
                            interpret=interpret,
                        )
                        scores, out_rows = leaf2_scores_device(
                            rows, ends2[0], ps[0], pc[0], pw[0], conf[0],
                            oends[0], w_cap=w_cap,
                        )
                        return scores[None], out_rows[None]

                    return jax.shard_map(
                        per_shard,
                        mesh=self.mesh,
                        in_specs=(P(DATA_AXIS),) * 10,
                        out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
                        check_vma=False,
                    )(dt, gid, tab, aux, ends2, ps, pc, pw, conf, oends)

            elif use_ends:

                @jax.jit
                def sharded_score(dt, gid, tab, aux, ends):
                    def per_shard(dt, gid, tab, aux, ends):
                        return score_tiles_v3_pairs(
                            dt[0], gid[0], tab[0], aux[0], ends[0],
                            depth=depth, mn_cap=mn_cap, g_cap=g_cap,
                            interpret=interpret,
                        )[None]

                    return jax.shard_map(
                        per_shard,
                        mesh=self.mesh,
                        in_specs=(P(DATA_AXIS),) * 5,
                        out_specs=P(DATA_AXIS),
                        check_vma=False,
                    )(dt, gid, tab, aux, ends)

            else:

                @jax.jit
                def sharded_score(dt, gid, tab, aux):
                    def per_shard(dt, gid, tab, aux):
                        return score_tiles_v3_rows(
                            dt[0], gid[0], tab[0], aux[0],
                            depth=depth, mn_cap=mn_cap, g_cap=g_cap,
                            interpret=interpret,
                        )[None]

                    return jax.shard_map(
                        per_shard,
                        mesh=self.mesh,
                        in_specs=(P(DATA_AXIS),) * 4,
                        out_specs=P(DATA_AXIS),
                        check_vma=False,
                    )(dt, gid, tab, aux)

            prog = self._v3_programs[key] = sharded_score
        return prog

    def score_stored_group(self, sbs: list) -> list[list[float]]:
        """Score one StoredBatch per mesh device in a single shard_map
        program (scoring/tiled_store.py guarantees every batch in a store
        shares one device shape, so stacking is free of repacking). Returns
        per-batch score lists; the host tails run per shard. Handles both
        v1/v2 (gtab) and v3 (block-major) store batches."""
        n_dev = self.mesh.devices.size
        assert len(sbs) == n_dev, (len(sbs), n_dev)
        assert all(not sb.empty for sb in sbs)
        if getattr(sbs[0], "gid", None) is not None:  # v3 store
            depth = max(sb.depth for sb in sbs)
            mn_cap, g_cap = sbs[0].mn_cap, sbs[0].g_cap
            use_ends = all(sb.ends_padded is not None for sb in sbs)
            use_buckets = all(
                getattr(sb, "leaf_buckets", None) is not None for sb in sbs)
            use_leaves = use_buckets or all(
                getattr(sb, "leaf2_ps", None) is not None for sb in sbs)
            if use_buckets:
                # store-wide bucket shapes guarantee uniform stacking
                n_buckets = len(sbs[0].leaf_buckets)
                arity = len(sbs[0].leaf_buckets[0])  # 6 dense / 7 sparse
                stacked = [
                    jnp.asarray(np.stack(
                        [np.asarray(getattr(sb, f)) for sb in sbs]))
                    for f in ("dt", "gid", "tab", "aux", "leaf2_out_ends")
                ]
                for k in range(n_buckets):
                    for j in range(arity):
                        stacked.append(jnp.asarray(np.stack(
                            [np.asarray(sb.leaf_buckets[k][j])
                             for sb in sbs])))
                program = self._v3_sharded_program(
                    depth, mn_cap, g_cap, self.pallas_interpret, use_ends,
                    w_cap=(sbs[0].leaf_nb, n_buckets, arity))
            else:
                if use_leaves:
                    fields = ("dt", "gid", "tab", "aux", "leaf2_ends",
                              "leaf2_ps", "leaf2_pc", "leaf2_pw",
                              "leaf_conf", "leaf2_out_ends")
                else:
                    fields = ("dt", "gid", "tab", "aux") + (
                        ("ends_padded",) if use_ends else ())
                stacked = [
                    jnp.asarray(np.stack(
                        [np.asarray(getattr(sb, f)) for sb in sbs]))
                    for f in fields
                ]
                program = self._v3_sharded_program(
                    depth, mn_cap, g_cap, self.pallas_interpret, use_ends,
                    w_cap=sbs[0].leaf2_pw.shape[1] if use_leaves else 0)
            import dataclasses

            if use_leaves:
                # ([n_dev, B] scores, [n_dev, NOUT_pad, C] outlier rows)
                scores_d, out_rows_d = program(*stacked)
                scores_d = np.asarray(scores_d)
                out_rows_d = np.asarray(out_rows_d)
                return [
                    self.postprocess_stored(sb, (scores_d[k], out_rows_d[k]))
                    for k, sb in enumerate(sbs)
                ]
            # [n_dev, NBT|NPpad, C] raw/compacted tables
            tables = np.asarray(program(*stacked))
            if not use_ends:
                # postprocess_stored branches on ends_padded; mixed groups
                # ran uncompacted, so every tail must compact on host
                sbs = [dataclasses.replace(sb, ends_padded=None) for sb in sbs]
            # mixed groups (some leaf-baked, some not) returned raw
            # tables, so no tail may take the leaf fast path
            sbs = [
                dataclasses.replace(sb, leaf2_ps=None, leaf_buckets=None)
                for sb in sbs
            ]
            return [
                self.postprocess_stored(sb, tables[k])
                for k, sb in enumerate(sbs)
            ]
        d1 = max(sb.depth1 for sb in sbs)
        d2 = max(sb.depth2 for sb in sbs)
        use_dt = all(getattr(sb, "dt", None) is not None for sb in sbs)
        fields = ("dt", "gtab", "aux") if use_dt else (
            "pos_blocks", "uv", "gtab", "aux")
        stacked = [
            jnp.asarray(np.stack([np.asarray(getattr(sb, f)) for sb in sbs]))
            for f in fields
        ]
        program = self._fused_sharded_program(
            d1, d2, self.pallas_interpret, use_dt=use_dt)
        tables = np.asarray(program(*stacked))  # [n_dev, NST, C]
        return [
            self.postprocess_stored(sb, tables[k]) for k, sb in enumerate(sbs)
        ]

    def _score_shards_tiled_native(
        self, shards: list[list[PackedLigand]], cmax: int
    ) -> list[float] | None:
        """Fast sharded path: per-shard one-pass C++ tiled pack + the fused
        Pallas kernel under shard_map (one program, no cross-device
        communication). Returns None when the native packer is unavailable
        (callers fall back to the Python-prep shard path)."""
        from ..ops.screen_pallas import score_tiles_fused_rows
        from ..scoring.tiled_pack import build_tiled_batch

        if not hasattr(self, "_shard_pack_buffers"):
            self._shard_pack_buffers = [dict() for _ in shards]
        if len(self._shard_pack_buffers) != len(shards):
            self._shard_pack_buffers = [dict() for _ in shards]

        def pack(width=None):
            tbs = []
            for k, shard in enumerate(shards):
                tb = build_tiled_batch(
                    self.packed_model, shard, threads=self.pack_threads,
                    rows_hint=int(self._rows_hint * len(shard)),
                    width=width, cmax=cmax,
                    buffer_cache=self._shard_pack_buffers[k],
                )
                if tb is None:
                    return None
                tbs.append(tb)
            return tbs

        tbs = pack()
        if tbs is None:
            return None
        total_ligs = sum(len(s) for s in shards)
        self._rows_hint = 0.7 * self._rows_hint + 0.3 * (
            sum(tb.nst for tb in tbs) / max(1, total_ligs)
        )
        widths = {tb.gtab.shape[0] for tb in tbs}
        if len(widths) > 1:
            # shards bucketed to different tile counts: repack pinned to the
            # common maximum (the C++ neutral-fills the extra tiles)
            from ..scoring.screen_tiles import TILE

            tbs = pack(width=max(widths) * TILE)
            if tbs is None:
                return None
        d1 = max(tb.depth1 for tb in tbs)
        d2 = max(tb.depth2 for tb in tbs)
        interpret = self.pallas_interpret
        stacked = [
            jnp.asarray(np.stack([getattr(tb, f) for tb in tbs]))
            for f in ("pos_blocks", "uv", "gtab", "aux")
        ]

        sharded_score = self._fused_sharded_program(d1, d2, interpret)
        tables = np.asarray(sharded_score(*stacked))  # [n_dev, NST, C]
        scores: list[float] = []
        for k, tb in enumerate(tbs):
            table = compact_pair_table_rows(tables[k].copy(), tb.pair_end_rows)
            prune = host_prune_mask(tb, self.packed_model)
            table[: len(prune)][prune] = -1.0
            scores.extend(_dfs_scores(tb, table, threads=self.pack_threads))
        return scores
