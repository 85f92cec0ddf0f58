"""Mesh-sharded screening on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest

from pharmaconet_tpu.parallel.mesh import data_mesh
from pharmaconet_tpu.parallel.screening import ShardedScreener
from pharmaconet_tpu.scoring.batch_screen import BatchScreener
from pharmaconet_tpu.scoring.ligand import Ligand
from pharmaconet_tpu.chem.smallmol import parse_sdf
from pharmaconet_tpu.pharmacophore.model import PharmacophoreModel

from helpers import ACETATE_SDF, BENZENE_SDF, ETHANOL_SDF, _model_state


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


@pytest.fixture(scope="module")
def model():
    nodes = [
        ("Hydrophobic", "Hydrophobic", (0.0, 0.0, 0.0), 0.9),
        ("Aromatic", "PiStacking_P", (4.0, 1.0, 0.5), 1.4),
        ("HBond_donor", "HBond_ldon", (2.5, 3.0, 1.0), 0.8),
        ("HBond_acceptor", "HBond_pdon", (5.5, 3.5, -1.0), 0.8),
        ("Anion", "SaltBridge_lneg", (6.5, 0.0, 2.0), 1.2),
    ]
    clusters = [
        ("Hydrophobic", [0]),
        ("Aromatic", [1]),
        ("HBond", [2]),
        ("HBond", [3]),
        ("Anion", [4]),
    ]
    m = PharmacophoreModel()
    m.__setstate__(_model_state(nodes, clusters))
    return m


def _ligand_batch(n: int) -> list[Ligand]:
    rng = np.random.default_rng(0)
    templates = [ETHANOL_SDF, BENZENE_SDF, ACETATE_SDF]
    out = []
    for i in range(n):
        mol = parse_sdf(templates[i % 3])[0].strip_hydrogens()
        shift = rng.uniform(-3, 3, size=(1, 3)).astype(np.float32)
        confs = [mol.coords + shift + rng.normal(0, 0.2, mol.coords.shape).astype(np.float32)
                 for _ in range(1 + i % 3)]
        out.append(Ligand(mol, confs))
    return out


def test_sharded_matches_single(model):
    ligands = _ligand_batch(25)
    single = BatchScreener(model).score_ligands(ligands)
    sharded = ShardedScreener(model, mesh=data_mesh()).score_ligands(ligands)
    np.testing.assert_allclose(sharded, single, rtol=2e-5, atol=1e-6)
    assert max(single) > 0.0
