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
