"""SMILES-library screening: .smi file -> embed -> pack -> device scores.

The reference can only score SMILES one molecule per call through RDKit
(pharmacophore_model.py:92-99); this path prepacks a whole SMILES library
through the in-house embedder and screens it on device, composing with
the packed-library format, executor, and crash-resume machinery.
"""

from __future__ import annotations

import numpy as np
import pytest

from bench import make_synthetic_model
from pharmaconet_tpu.cli.prepack import build_parser as prepack_parser
from pharmaconet_tpu.cli.prepack import main as prepack_main
from pharmaconet_tpu.cli.screening import build_parser as screening_parser
from pharmaconet_tpu.cli.screening import main as screening_main
from pharmaconet_tpu.scoring.graph_match import GraphMatcher
from pharmaconet_tpu.scoring.library import (
    build_library_from_smiles,
    read_smiles_file,
)
from pharmaconet_tpu.scoring.parse_pool import iter_embedded

SMILES = [
    ("ethanol", "CCO"),
    ("p-cresol", "Cc1ccc(O)cc1"),
    ("aspirin", "CC(=O)Oc1ccccc1C(=O)O"),
    ("caffeine", "Cn1cnc2c1c(=O)n(C)c(=O)n2C"),
    ("benzamidine", "NC(=N)c1ccccc1"),
    ("acetate", "CC(=O)[O-]"),
    ("chlorobenzene", "Clc1ccccc1"),
    ("piperazine", "C1CNCCN1"),
]


def test_read_smiles_file(tmp_path):
    f = tmp_path / "lib.smi"
    f.write_text(
        "CCO ethanol\n"
        "# full-line comment\n"
        "\n"
        "c1ccccc1,benzene  # trailing comment\n"
        "CC(=O)O\n"  # no name -> positional default
    )
    entries = read_smiles_file(f)
    assert entries == [
        ("ethanol", "CCO"),
        ("benzene", "c1ccccc1"),
        ("mol2", "CC(=O)O"),
    ]


def test_read_smiles_file_triple_bond_not_comment(tmp_path):
    """'#' is the SMILES triple bond: 'C#N' must survive intact (a naive
    comment-stripper silently scores methane instead of acetonitrile)."""
    f = tmp_path / "lib.smi"
    f.write_text("C#N acetonitrile\nN#Cc1ccccc1 benzonitrile # nitriles\n")
    assert read_smiles_file(f) == [
        ("acetonitrile", "C#N"),
        ("benzonitrile", "N#Cc1ccccc1"),
    ]


def test_from_smiles_dg_explicit_hydrogens():
    """Explicit [H] atoms must strip BEFORE embedding, or the heavy-only
    conformer array misaligns with the unstripped molecule (IndexError)."""
    from pharmaconet_tpu.scoring.ligand import Ligand

    lig = Ligand.load_from_smiles("[H]OC([H])([H])C", 3, engine="dg")
    assert lig.num_atoms == 3  # O, C, C
    assert lig.num_conformers == 3


@pytest.fixture(scope="module")
def smi_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("smilib")
    f = d / "lib.smi"
    lines = [f"{smi} {name}" for name, smi in SMILES]
    lines.insert(3, "C1CC garbage_unclosed_ring")  # must skip, not crash
    f.write_text("\n".join(lines) + "\n")
    return f


def test_screening_cli_smiles(smi_file, tmp_path):
    model = make_synthetic_model(seed=3)
    model_path = tmp_path / "model.pm"
    model.save(str(model_path))
    out = tmp_path / "out.csv"

    args = screening_parser().parse_args(
        ["-p", str(model_path), "--smiles", str(smi_file),
         "-o", str(out), "--batch_size", "4"]
    )
    assert screening_main(args) == 0

    rows = out.read_text().splitlines()
    assert rows[0] == "path,score"
    got = {}
    for line in rows[1:]:
        name, score = line.rsplit(",", 1)
        got[name] = float(score)
    assert set(got) == {name for name, _ in SMILES}  # garbage line skipped

    # scores sorted descending
    scores = [float(line.rsplit(",", 1)[1]) for line in rows[1:]]
    assert scores == sorted(scores, reverse=True)

    # every score equals the exact host matcher on the same embedded
    # conformers (iter_embedded reproduces the CLI's per-index seeds)
    entries = read_smiles_file(smi_file)
    for name, ligand in iter_embedded(entries, num_conformers=8):
        expected = GraphMatcher(model, ligand).run()
        assert got[name] == pytest.approx(expected, rel=2e-5, abs=1e-4), name


def test_prepack_smiles_to_tiles_composes(smi_file, tmp_path):
    """One command from .smi to a screen-ready tile store: the --smiles
    source feeds --tiles_out exactly like a file-built library."""
    model = make_synthetic_model(seed=3)
    model_path = tmp_path / "m.pm"
    model.save(str(model_path))
    tiles = tmp_path / "tiles"
    args = prepack_parser().parse_args(
        ["--smiles", str(smi_file), "-p", str(model_path),
         "--tiles_out", str(tiles), "--batch_size", "8"]
    )
    assert prepack_main(args) == 0
    out = tmp_path / "t.csv"
    sargs = screening_parser().parse_args(
        ["-p", str(model_path), "--library_tiles", str(tiles),
         "-o", str(out)]
    )
    assert screening_main(sargs) == 0
    rows = dict(
        line.rsplit(",", 1) for line in out.read_text().splitlines()[1:]
    )
    assert set(rows) == {name for name, _ in SMILES}
    entries = read_smiles_file(smi_file)
    for name, ligand in iter_embedded(entries, num_conformers=8):
        expected = GraphMatcher(model, ligand).run()
        assert float(rows[name]) == pytest.approx(expected, rel=2e-5, abs=1e-4)


def test_prepack_smiles_roundtrip(smi_file, tmp_path):
    """prepack --smiles -> .npz -> screening --library gives the same
    scores as the in-memory --smiles path (same seeds, same packing)."""
    npz = tmp_path / "lib.npz"
    args = prepack_parser().parse_args(
        ["--smiles", str(smi_file), "-o", str(npz)]
    )
    assert prepack_main(args) == 0

    from pharmaconet_tpu.scoring.library import load_library

    packed, names = load_library(npz)
    direct, names2 = build_library_from_smiles(smi_file)
    assert names == names2 == [name for name, _ in SMILES]
    for a, b in zip(packed, direct):
        np.testing.assert_allclose(a.node_pos, b.node_pos, atol=1e-6)
        np.testing.assert_array_equal(a.node_mask, b.node_mask)
