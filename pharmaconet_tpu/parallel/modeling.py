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
            return {
                "hotspot_index": out["hotspot_index"],
                "hotspot_valid": out["hotspot_valid"],
                "rel_scores": out["rel_scores"],
                "density_maps": out["density_maps"],
                "keep_count": jnp.sum(out["keep"].astype(jnp.int32)),
            }

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
                results.append(
                    self.pmnet.hotspot_infos_from_outputs(
                        data, hotspot_idx[i], hotspot_valid[i], rel_scores[i],
                        out["density_maps"][i],
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
