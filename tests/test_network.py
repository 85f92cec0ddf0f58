"""Network architecture + weight-converter tests (tiny grid for CPU speed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pharmaconet_tpu.network.convert import (
    convert_torch_state_dict,
    load_npz_checkpoint,
    save_npz_checkpoint,
    synthesize_torch_state_dict,
)
from pharmaconet_tpu.network.model import build_model
from pharmaconet_tpu.network.swin3d import window_partition, window_reverse


@pytest.fixture(scope="module")
def tiny_model_and_params():
    """Tiny-grid model with converter-produced params (init via eval_shape
    only — full model.init compiles for minutes on CPU)."""
    model = build_model(image_size=16)
    params = jax.tree.map(jnp.asarray, convert_torch_state_dict(synthesize_torch_state_dict()))
    return model, params


def _flatten(tree, prefix=""):
    out = {}
    for key, value in tree.items():
        name = f"{prefix}/{key}" if prefix else key
        if isinstance(value, dict):
            out.update(_flatten(value, name))
        else:
            out[name] = tuple(value.shape)
    return out


def test_converter_structure_matches_init(tiny_model_and_params):
    """The torch->flax converter must produce exactly the init tree."""
    model, _ = tiny_model_and_params
    image = jnp.zeros((1, 16, 16, 16, 33))
    tokens = jnp.zeros((4, 4), dtype=jnp.int32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), image, tokens)
    converted = convert_torch_state_dict(synthesize_torch_state_dict())
    init_flat = _flatten(shapes["params"])
    conv_flat = _flatten(converted["params"])
    assert set(init_flat) == set(conv_flat), (
        sorted(set(init_flat) ^ set(conv_flat))[:10]
    )
    for key in init_flat:
        assert init_flat[key] == conv_flat[key], (key, init_flat[key], conv_flat[key])


@pytest.fixture(scope="module")
def micro_model_and_params():
    """Micro architecture: cheap enough to compile on a single CPU core."""
    model = build_model(
        image_size=8, embed_dim=8, depths=(1, 1), num_heads=(1, 2), window=2,
        token_feature_dim=16,
    )
    image = jnp.zeros((1, 8, 8, 8, 33))
    tokens = jnp.zeros((2, 4), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), image, tokens)
    return model, params


def test_micro_model_runs(micro_model_and_params):
    model, params = micro_model_and_params
    image = jnp.ones((1, 8, 8, 8, 33)) * 0.1
    tokens = jnp.array([[1, 2, 3, 0], [5, 5, 5, 9]], dtype=jnp.int32)
    pyramid, narrow, wide, scores, masks = model.apply(params, image, tokens)
    assert masks.shape == (2, 8, 8, 8)
    assert [p.shape[1] for p in pyramid] == [2, 4, 8]
    assert np.all(np.isfinite(np.asarray(masks)))
    assert np.all(np.isfinite(np.asarray(scores)))


def test_npz_checkpoint_roundtrip(tmp_path):
    converted = convert_torch_state_dict(synthesize_torch_state_dict())
    dists = {"Hydrophobic": np.linspace(0, 1, 101).astype(np.float32)}
    path = tmp_path / "ckpt.npz"
    save_npz_checkpoint(path, converted, dists)
    params, loaded_dists = load_npz_checkpoint(path)
    orig = _flatten(converted)
    restored = _flatten(params)
    assert orig == restored
    np.testing.assert_array_equal(loaded_dists["Hydrophobic"], dists["Hydrophobic"])


def test_window_partition_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 5)).astype(np.float32))
    windows = window_partition(x, 4)
    assert windows.shape == (2 * 8, 64, 5)
    back = window_reverse(windows, 4, 8, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_token_gather_semantics(micro_model_and_params):
    """Token features must come from the token's own voxel."""
    model, params = micro_model_and_params
    image = jnp.asarray(np.random.default_rng(1).normal(size=(1, 8, 8, 8, 33)).astype(np.float32))
    tokens = jnp.array([[0, 0, 0, 0], [7, 3, 7, 5]], dtype=jnp.int32)
    pyramid = model.apply(params, image, method="forward_feature")
    scores, feats = model.apply(params, pyramid[-1], tokens, method="forward_token_prediction")
    # same token twice -> identical features
    tokens2 = jnp.array([[7, 3, 9, 5], [7, 3, 9, 5]], dtype=jnp.int32)
    _, feats2 = model.apply(params, pyramid[-1], tokens2, method="forward_token_prediction")
    np.testing.assert_allclose(np.asarray(feats2[0]), np.asarray(feats2[1]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(feats[1]), np.asarray(feats2[0]), rtol=1e-6)
