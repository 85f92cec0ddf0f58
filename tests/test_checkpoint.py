"""Reference-checkpoint loading: torch tar -> converter -> PharmacoNet."""

import numpy as np
import pytest

from pharmaconet_tpu.network.convert import (
    load_reference_checkpoint,
    synthesize_torch_state_dict,
)


@pytest.fixture(scope="module")
def torch_checkpoint(tmp_path_factory):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    state = synthesize_torch_state_dict(seed=3)
    torch_state = {k: torch.from_numpy(v) for k, v in state.items()}
    checkpoint = {
        "config": {"MODEL": {"EMBED_DIM": 96}},
        "model": torch_state,
        "score_distributions": {
            t: {"focus": rng.uniform(0, 1, 500).tolist()}
            for t in [
                "Hydrophobic", "PiStacking_P", "PiStacking_T", "PiCation_lring",
                "PiCation_pring", "HBond_ldon", "HBond_pdon", "SaltBridge_lneg",
                "SaltBridge_pneg", "XBond",
            ]
        },
    }
    path = tmp_path_factory.mktemp("ckpt") / "model.tar"
    torch.save(checkpoint, path)
    return path, state


def test_load_reference_checkpoint(torch_checkpoint):
    path, state = torch_checkpoint
    params, dists, config = load_reference_checkpoint(path)
    assert set(dists) == {
        "Hydrophobic", "PiStacking_P", "PiStacking_T", "PiCation_lring",
        "PiCation_pring", "HBond_ldon", "HBond_pdon", "SaltBridge_lneg",
        "SaltBridge_pneg", "XBond",
    }
    # spot-check a converted tensor (Linear weight transposed)
    kernel = params["params"]["token_head"]["feature_mlp_0"]["kernel"]
    np.testing.assert_allclose(kernel, state["token_head.feature_mlp.0.weight"].T)
    conv = params["params"]["cavity_head"]["short_conv"]["conv"]["kernel"]
    np.testing.assert_allclose(
        conv, np.transpose(state["cavity_head.short_head.0._conv.weight"], (2, 3, 4, 1, 0))
    )
    assert config["MODEL"]["EMBED_DIM"] == 96


def test_pharmaconet_loads_torch_tar(torch_checkpoint):
    from pharmaconet_tpu.module import PharmacoNet

    path, _ = torch_checkpoint
    pm = PharmacoNet(weight_path=path, verbose=False)
    assert pm._dist_packed.shape[0] == 10
    # params landed as jax arrays with the right structure
    assert "backbone" in pm.params["params"]


def test_convert_weights_cli(torch_checkpoint, tmp_path):
    """tar -> npz conversion CLI produces a torch-free-loadable checkpoint
    with identical parameters."""
    import jax

    from pharmaconet_tpu.cli.convert_weights import build_parser, main
    from pharmaconet_tpu.network.convert import load_npz_checkpoint

    path, _ = torch_checkpoint
    dst = tmp_path / "model.npz"
    assert main(build_parser().parse_args([str(path), str(dst)])) == 0
    params_tar, dists_tar, _ = load_reference_checkpoint(path)
    params_npz, dists_npz = load_npz_checkpoint(dst)
    for a, b in zip(jax.tree.leaves(params_tar), jax.tree.leaves(params_npz)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert set(dists_tar) == set(dists_npz)
    for t in dists_tar:
        np.testing.assert_array_equal(dists_tar[t], dists_npz[t])


def test_verify_checkpoint_cli(torch_checkpoint, tmp_path):
    """The one-command real-weight harness runs end-to-end on a synthesized
    tar: load/convert coverage + full activation parity vs the reference
    torch network built from the same weights (modeling stages are covered
    by tests/test_modeling_reference_parity.py and skipped here for time)."""
    import json

    from pharmaconet_tpu.cli.verify_checkpoint import build_parser, main

    path, _ = torch_checkpoint
    out = tmp_path / "report.json"
    rc = main(build_parser().parse_args([
        "--checkpoint", str(path), "--skip_modeling", "--out", str(out),
    ]))
    assert rc == 0
    report = json.loads(out.read_text())
    assert report["ok"]
    names = [s["stage"] for s in report["stages"]]
    assert "load_convert" in names and "activation_parity" in names
    for s in report["stages"]:
        assert s["ok"], s


def test_verify_checkpoint_cli_detects_schema_drift(torch_checkpoint, tmp_path):
    """A checkpoint missing a learned tensor (schema drift vs the published
    architecture) must fail the coverage stage cleanly, not crash."""
    torch = pytest.importorskip("torch")

    from pharmaconet_tpu.cli.verify_checkpoint import build_parser, main

    path, _ = torch_checkpoint
    checkpoint = torch.load(path, map_location="cpu", weights_only=False)
    del checkpoint["model"]["token_head.feature_mlp.0.weight"]
    checkpoint["model"]["bogus.extra.weight"] = torch.zeros(3)
    bad_path = tmp_path / "bad.tar"
    torch.save(checkpoint, bad_path)
    rc = main(build_parser().parse_args([
        "--checkpoint", str(bad_path), "--skip_modeling",
    ]))
    assert rc == 1
