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

from ..proxy.data import batch_graphs, smi2graph
from ..proxy.tacogfn import graph_batch_to_arrays


@dataclass
class PocketItem:
    multi_scale_features: list
    hotspot_features: np.ndarray  # [K, 192]
    hotspot_positions: np.ndarray  # [K, 3]
    batch_arrays: tuple
    affinities: np.ndarray  # [N]
    ligand_valid: np.ndarray  # [N]
    max_atoms: int

    def model_args(self):
        return (
            [jnp.asarray(f) for f in self.multi_scale_features],
            jnp.asarray(self.hotspot_features),
            jnp.asarray(self.hotspot_positions),
            self.batch_arrays,
            self.max_atoms,
        )

    def loss_args(self):
        return (
            [jnp.asarray(f) for f in self.multi_scale_features],
            jnp.asarray(self.hotspot_features),
            jnp.asarray(self.hotspot_positions),
            self.batch_arrays,
            jnp.asarray(self.affinities),
            jnp.asarray(self.ligand_valid),
            self.max_atoms,
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
            hotspot_features = np.zeros((0, 192), dtype=np.float32)
            hotspot_positions = np.zeros((0, 3), dtype=np.float32)

        ligands = self.ligand_data[code]
        graphs, affinities = [], []
        for _, smiles, affinity in ligands:
            graphs.append(smi2graph(smiles))
            affinities.append(min(float(affinity), 0.0))  # cap (dataset.py:49)
        batch = batch_graphs(graphs)
        arrays = graph_batch_to_arrays(batch, categorical=False)
        max_atoms = int(((batch.num_atoms.max() + 7) // 8) * 8)
        n = batch.num_graphs
        return PocketItem(
            multi_scale_features=features,
            hotspot_features=hotspot_features,
            hotspot_positions=hotspot_positions,
            batch_arrays=arrays,
            affinities=np.asarray(affinities, dtype=np.float32),
            ligand_valid=np.ones(n, dtype=np.float32),
            max_atoms=max_atoms,
        )


def collate_identity(batch: list[PocketItem]) -> list[PocketItem]:
    """Identity collate (developer trainer.py:185-186)."""
    return batch
