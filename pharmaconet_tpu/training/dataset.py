"""Per-pocket training dataset (developer/src/dataset.py:14-55 equivalent).

Each item = (frozen PharmacoNet extraction of the pocket with center-noise
augmentation, padded ligand graph batch with capped affinities). The ligand
pickle maps pocket code -> [(ligand_id, smiles, affinity)].
"""

from __future__ import annotations

import logging
import pickle
from dataclasses import dataclass
from pathlib import Path

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("pharmaconet_tpu")

from ..proxy.data import batch_graphs, half_octave, smi2graph
from ..proxy.tacogfn import graph_batch_to_arrays


@dataclass
class PocketItem:
    """All ragged axes arrive bucketed (hotspot count K and the ligand
    graph batch pad to half-octave buckets, masked exactly downstream), so
    the trainer's jitted step compiles one program per shape bucket
    instead of per pocket."""

    multi_scale_features: list
    hotspot_features: np.ndarray  # [Kpad, 192]
    hotspot_positions: np.ndarray  # [Kpad, 3]
    hotspot_valid: np.ndarray  # [Kpad] bool
    batch_arrays: tuple
    affinities: np.ndarray  # [NGpad]
    ligand_valid: np.ndarray  # [NGpad]

    def model_args(self):
        return (
            [jnp.asarray(f) for f in self.multi_scale_features],
            jnp.asarray(self.hotspot_features),
            jnp.asarray(self.hotspot_positions),
            self.batch_arrays,
            jnp.asarray(self.hotspot_valid),
        )

    def loss_args(self):
        return (
            [jnp.asarray(f) for f in self.multi_scale_features],
            jnp.asarray(self.hotspot_features),
            jnp.asarray(self.hotspot_positions),
            self.batch_arrays,
            jnp.asarray(self.affinities),
            jnp.asarray(self.ligand_valid),
            jnp.asarray(self.hotspot_valid),
        )

    def shape_key(self) -> tuple:
        """Bucket signature — items sharing it reuse one compiled step.
        (The flat-atom head removed max_atoms as a bucket axis: the
        per-graph atom count no longer shapes any array.)"""
        return (
            self.hotspot_features.shape[0],
            tuple(a.shape if hasattr(a, "shape") else a for a in self.batch_arrays),
        )


class PocketLigandDataset:
    def __init__(
        self,
        code_list: list[str],
        protein_info: dict[str, tuple[float, float, float]],
        protein_dir: str | Path,
        ligand_path: str | Path,
        pmnet,
        center_noise: float = 0.0,
    ):
        self.code_list = code_list
        self.protein_info = protein_info
        self.protein_dir = Path(protein_dir)
        self.center_noise = center_noise
        self.pmnet = pmnet
        with open(ligand_path, "rb") as f:
            self.ligand_data: dict[str, list[tuple[str, str, float]]] = pickle.load(f)

    def __len__(self) -> int:
        return len(self.code_list)

    def __getitem__(self, index: int) -> PocketItem:
        code = self.code_list[index]
        protein_path = str(self.protein_dir / f"{code}.pdb")
        center = self.protein_info[code]
        data = self.pmnet.parse(protein_path, center=center, center_noise=self.center_noise)
        features, hotspot_infos = self.pmnet.run_extraction(data)

        if hotspot_infos:
            hotspot_features = np.stack([i["hotspot_feature"] for i in hotspot_infos])
            hotspot_positions = np.array(
                [i["hotspot_position"] for i in hotspot_infos], dtype=np.float32
            )
        else:
            # a hotspot-less pocket makes the interaction-sum head predict
            # exactly 0 for every ligand (empty K axis) — the sample
            # contributes a constant, zero-gradient loss term
            logger.warning(
                "pocket %s produced no hotspots; its loss term has zero "
                "gradient (check weights / thresholds)", code,
            )
            feat_dim = getattr(self.pmnet.model, "token_feature_dim", 192)
            hotspot_features = np.zeros((0, feat_dim), dtype=np.float32)
            hotspot_positions = np.zeros((0, 3), dtype=np.float32)

        # bucket the hotspot axis (exactly masked via hotspot_valid)
        k = len(hotspot_infos)
        k_pad = half_octave(max(k, 1))
        hf = np.zeros((k_pad, hotspot_features.shape[1]), dtype=np.float32)
        hp = np.zeros((k_pad, 3), dtype=np.float32)
        hv = np.zeros(k_pad, dtype=bool)
        hf[:k], hp[:k], hv[:k] = hotspot_features, hotspot_positions, True

        ligands = self.ligand_data[code]
        graphs, affinities = [], []
        for _, smiles, affinity in ligands:
            graphs.append(smi2graph(smiles))
            affinities.append(min(float(affinity), 0.0))  # cap (dataset.py:49)
        # bucket the graph axis too (fake graphs have empty masks; their
        # predictions are 0 and ligand_valid excludes them from the loss)
        batch = batch_graphs(graphs, num_graphs_pad=half_octave(len(graphs)))
        arrays = graph_batch_to_arrays(batch, categorical=False)
        n, ng = len(graphs), batch.num_graphs
        aff = np.zeros(ng, dtype=np.float32)
        aff[:n] = affinities
        valid = np.zeros(ng, dtype=np.float32)
        valid[:n] = 1.0
        return PocketItem(
            multi_scale_features=features,
            hotspot_features=hf,
            hotspot_positions=hp,
            hotspot_valid=hv,
            batch_arrays=arrays,
            affinities=aff,
            ligand_valid=valid,
        )


def collate_identity(batch: list[PocketItem]) -> list[PocketItem]:
    """Identity collate (developer trainer.py:185-186)."""
    return batch


# --------------------------------------------------------------------------
# Data-parallel batch preparation: items re-padded to COMMON bucket shapes
# so the DP step can stack them on a leading batch axis and shard it over
# the ('data',) mesh. All padding is exactly masked downstream (hotspot
# rows via hotspot_valid; pad atoms/edges dump into the fake graph slot
# `ng` / the last invalid atom row, both excluded by atom_valid /
# ligand_valid — same invariants the per-item bucketing already relies on).
# --------------------------------------------------------------------------
def _repad_item(
    item: PocketItem, k_pad: int, vp: int, ep: int, ng: int
) -> PocketItem:
    hf0 = item.hotspot_features
    k0 = hf0.shape[0]
    ai, ag, av, es, ed, ei, ev, ng0 = item.batch_arrays
    ai, ag, av, es, ed, ei, ev = (
        np.asarray(a) for a in (ai, ag, av, es, ed, ei, ev)
    )
    if (k0, ai.shape[0], es.shape[0], int(ng0)) == (k_pad, vp, ep, ng):
        return item
    vp0, ep0 = ai.shape[0], es.shape[0]

    hf = np.zeros((k_pad, hf0.shape[1]), np.float32)
    hp = np.zeros((k_pad, 3), np.float32)
    hv = np.zeros(k_pad, bool)
    hf[:k0], hp[:k0], hv[:k0] = hf0, item.hotspot_positions, item.hotspot_valid

    ai2 = np.zeros((vp,) + ai.shape[1:], ai.dtype)
    ai2[:vp0] = ai
    # dump rows (invalid atoms) must point at the NEW fake-graph index
    ag2 = np.full(vp, ng, np.int32)
    ag2[:vp0] = np.where(av, ag, ng)
    av2 = np.zeros(vp, bool)
    av2[:vp0] = av
    es2 = np.full(ep, vp - 1, np.int32)
    es2[:ep0] = np.where(ev, es, vp - 1)
    ed2 = np.full(ep, vp - 1, np.int32)
    ed2[:ep0] = np.where(ev, ed, vp - 1)
    ei2 = np.zeros((ep,) + ei.shape[1:], ei.dtype)
    ei2[:ep0] = ei
    ev2 = np.zeros(ep, bool)
    ev2[:ep0] = ev

    aff = np.zeros(ng, np.float32)
    aff[: len(item.affinities)] = item.affinities
    lv = np.zeros(ng, np.float32)
    lv[: len(item.ligand_valid)] = item.ligand_valid
    ba = tuple(jnp.asarray(a) for a in (ai2, ag2, av2, es2, ed2, ei2, ev2)) + (ng,)
    return PocketItem(
        multi_scale_features=item.multi_scale_features,
        hotspot_features=hf, hotspot_positions=hp, hotspot_valid=hv,
        batch_arrays=ba, affinities=aff, ligand_valid=lv,
    )


def repad_items(items: list[PocketItem]) -> list[PocketItem]:
    """Re-pad a batch of items to their common (maximum) bucket shapes."""
    k = max(i.hotspot_features.shape[0] for i in items)
    vp = max(np.asarray(i.batch_arrays[0]).shape[0] for i in items)
    ep = max(np.asarray(i.batch_arrays[3]).shape[0] for i in items)
    ng = max(int(i.batch_arrays[-1]) for i in items)
    return [_repad_item(i, k, vp, ep, ng) for i in items]
