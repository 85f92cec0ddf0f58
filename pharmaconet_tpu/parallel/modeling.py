"""Multi-pocket modeling sharded over the device mesh.

The reference processes one pocket at a time (module.py:112-125) and its
only modeling parallelism is GPU mini-batching of hotspots
(module.py:261-276). On TPU, pockets are independent programs, so the
throughput axis is the mesh: this driver pads a list of parsed pockets to
a common shape, runs the full fused modeling program per pocket under
`shard_map` over a 1-D ('data',) mesh, and reuses the orchestrator's host
post-processing per pocket (SURVEY.md §2.6 P3: pjit over pockets).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..module import PharmacoNet, ProteinData
from ..ops.postprocess import sparse_compact
from ..pharmacophore.model import PharmacophoreModel
from .mesh import data_mesh


def _pad_axis0(arr: np.ndarray, size: int) -> np.ndarray:
    if arr.shape[0] == size:
        return arr
    pad = np.zeros((size - arr.shape[0], *arr.shape[1:]), dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0)


class ShardedModeler:
    """Runs the fused per-pocket modeling program for a batch of pockets,
    one pocket per mesh slot (round-robin when the batch is larger)."""

    def __init__(self, pmnet: PharmacoNet, mesh: Mesh | None = None):
        self.pmnet = pmnet
        self.mesh = mesh or data_mesh()
        self._compiled: dict[tuple, Any] = {}

    # -- batched device program -----------------------------------------
    def _program(self, shapes_key: tuple):
        if shapes_key in self._compiled:
            return self._compiled[shapes_key]
        pmnet = self.pmnet
        mesh = self.mesh

        def one_pocket(args):
            ap, af, av, tk, tv, center = args
            with jax.default_matmul_precision(pmnet.matmul_precision):
                out = pmnet._device_program_impl(
                    ap, af, av, tk, tv, center, with_segmentation=True
                )
            # keep the cross-device outputs small: everything except the
            # pyramid/cavity tensors (density is gathered valid-only later)
            res = {
                "hotspot_index": out["hotspot_index"],
                "hotspot_valid": out["hotspot_valid"],
                "rel_scores": out["rel_scores"],
                "density_maps": out["density_maps"],
                "keep_count": jnp.sum(out["keep"].astype(jnp.int32)),
            }
            if pmnet.density_wire == "sparse":
                vals, idxs, counts = sparse_compact(
                    out["density_maps"], pmnet.sparse_transfer_cap
                )
                res.update({"sp_vals": vals, "sp_idxs": idxs, "sp_counts": counts})
            return res

        def shard_body(ap, af, av, tk, tv, center):
            # [per_device, ...] on each mesh slot; pockets run sequentially
            # per device, devices run in parallel
            return jax.lax.map(
                one_pocket, (ap, af, av, tk, tv, center)
            )

        spec = P("data")
        fn = jax.jit(
            jax.shard_map(
                shard_body,
                mesh=mesh,
                in_specs=(spec,) * 6,
                out_specs=spec,
            )
        )
        self._compiled[shapes_key] = fn
        return fn

    # -- public API -------------------------------------------------------
    def create_density_maps_batch(
        self, datas: list[ProteinData]
    ) -> list[list[dict[str, Any]]]:
        """Per-pocket hotspot infos for a batch of parsed pockets."""
        if not datas:
            return []
        n_dev = self.mesh.devices.size
        a_pad = max(d.atom_positions.shape[0] for d in datas)
        t_pad = max(d.tokens.shape[0] for d in datas)
        n = len(datas)
        n_total = ((n + n_dev - 1) // n_dev) * n_dev

        def stack(get, pad_to=None):
            arrs = [get(d) for d in datas]
            if pad_to is not None:
                arrs = [_pad_axis0(a, pad_to) for a in arrs]
            arrs += [np.zeros_like(arrs[0])] * (n_total - n)
            return jnp.asarray(np.stack(arrs))

        batch = (
            stack(lambda d: d.atom_positions, a_pad),
            stack(lambda d: d.atom_features, a_pad),
            stack(lambda d: d.atom_valid, a_pad),
            stack(lambda d: d.tokens, t_pad),
            stack(lambda d: d.token_valid, t_pad),
            stack(lambda d: d.center),
        )
        per_device = n_total // n_dev
        key = (a_pad, t_pad, per_device)
        out = self._program(key)(*batch)

        hotspot_idx = np.asarray(out["hotspot_index"])
        hotspot_valid = np.asarray(out["hotspot_valid"])
        rel_scores = np.asarray(out["rel_scores"])
        keep_counts = np.asarray(out["keep_count"])
        results = []
        for i, data in enumerate(datas):
            if keep_counts[i] > self.pmnet.max_hotspots:
                # token-rich pocket: the batched program only segmented the
                # first max_hotspots kept tokens; re-run the single-pocket
                # path, which segments every kept token in overflow slabs
                results.append(self.pmnet.create_density_maps(data))
            else:
                sparse = None
                if "sp_vals" in out:
                    sparse = (out["sp_vals"][i], out["sp_idxs"][i], out["sp_counts"][i])
                results.append(
                    self.pmnet.hotspot_infos_from_outputs(
                        data, hotspot_idx[i], hotspot_valid[i], rel_scores[i],
                        out["density_maps"][i], sparse=sparse,
                    )
                )
        return results

    def run_batch(
        self, jobs: list[tuple[str, str | None, Any]]
    ) -> list[PharmacophoreModel]:
        """jobs: (protein_pdb_path, ref_ligand_path | None, center | None).
        Parses on the host, models all pockets across the mesh."""
        datas = [
            self.pmnet.parse(path, ref_ligand_path=ref, center=center)
            for path, ref, center in jobs
        ]
        infos = self.create_density_maps_batch(datas)
        return [
            PharmacophoreModel.create(
                d.pdbblock, d.center, hi, size=self.pmnet.grid_dim
            )
            for d, hi in zip(datas, infos)
        ]


class ShardedSegmenter:
    """ONE pocket's segmentation fanned out across the mesh.

    ShardedModeler scales throughput (pockets over mesh slots); this scales
    single-pocket LATENCY: the kept-hotspot slab is sharded along the
    hotspot axis while the pyramid, masks, and parameters are replicated —
    collective-free SPMD (each device decodes its own hotspots). With the
    mask decoder at ~6.7 ms/hotspot (PERF_NOTES), a worst-case 128-hotspot
    pocket drops from ~0.86 s on one chip to ~0.11 s + trunk on a v5e-8.

    Equality with the single-device path is exercised in tests on the
     8-device CPU mesh.
    """

    def __init__(self, pmnet: PharmacoNet, mesh: Mesh | None = None):
        self.pmnet = pmnet
        self.mesh = mesh or data_mesh()
        self._compiled: dict[tuple, Any] = {}

    def _program(self, k_per_device: int):
        if k_per_device in self._compiled:
            return self._compiled[k_per_device]
        pmnet = self.pmnet
        mesh = self.mesh

        def body(pyramid, protein_mask, cavity_narrow, tokens, feats, valid):
            with jax.default_matmul_precision(pmnet.matmul_precision):
                density = pmnet._segment_slab(
                    list(pyramid), protein_mask, cavity_narrow,
                    tokens, feats, valid,
                )
            if pmnet.density_wire == "sparse":
                # flat voxel indices are map-local, so per-shard compaction
                # composes with the K-axis sharding unchanged
                vals, idxs, counts = sparse_compact(
                    density, pmnet.sparse_transfer_cap
                )
                return density, vals, idxs, counts
            return (density,)

        rep = P()
        fn = jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(rep, rep, rep, P("data"), P("data"), P("data")),
                out_specs=P("data"),
            )
        )
        self._compiled[k_per_device] = fn
        return fn

    def segment(
        self,
        data: ProteinData,
        out: dict[str, Any],
        keep_idx: np.ndarray,
    ) -> list[dict[str, Any]]:
        """Segment the given kept token indices across the mesh; returns
        hotspot infos (same contract as PharmacoNet._segment_kept)."""
        pmnet = self.pmnet
        n_dev = self.mesh.devices.size
        chunk = pmnet.segmentation_chunk
        n = len(keep_idx)
        if n == 0:
            return []
        # pad to a multiple of n_dev * chunk so every shard runs whole chunks
        step = n_dev * chunk
        k_total = ((n + step - 1) // step) * step
        idx = np.zeros(k_total, dtype=np.int32)
        idx[:n] = keep_idx
        valid = np.zeros(k_total, dtype=bool)
        valid[:n] = True
        idx_dev = jnp.asarray(idx)
        res = self._program(k_total // n_dev)(
            tuple(out["pyramid"]),
            out["protein_mask"],
            out["cavity_narrow"],
            jnp.asarray(data.tokens)[idx_dev],
            out["token_features"][idx_dev],
            jnp.asarray(valid),
        )
        density, sparse = res[0], (res[1:] if len(res) > 1 else None)
        return pmnet.hotspot_infos_from_outputs(
            data, idx, valid, np.asarray(out["rel_scores"]), density,
            sparse=sparse,
        )

    def create_density_maps(self, data: ProteinData) -> list[dict[str, Any]]:
        """Single-pocket modeling with mesh-parallel segmentation."""
        out = self.pmnet.run_trunk(data)
        keep_idx = np.nonzero(np.asarray(out["keep"]))[0]
        return self.segment(data, out, keep_idx)

    def run(
        self,
        protein_pdb_path: str,
        ref_ligand_path: str | None = None,
        center=None,
    ) -> PharmacophoreModel:
        data = self.pmnet.parse(protein_pdb_path, ref_ligand_path, center)
        infos = self.create_density_maps(data)
        return PharmacophoreModel.create(
            data.pdbblock, data.center, infos, size=self.pmnet.grid_dim
        )
