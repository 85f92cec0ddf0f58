"""Concrete docking proxies + registry.

Rebuilds /root/reference/src/pmnet_appl/__init__.py:26-70 (get_docking_proxy
dispatch), tacogfn_reward/proxy.py:39-105 and sbddreward/proxy.py:35-144.
"""

from __future__ import annotations

import functools
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .base import BaseProxy, Cache
from .data import batch_graphs, half_octave, smi2graph, smi2graph_list
from .sbddreward import SBDDRewardNetwork, convert_sbddreward_checkpoint
from .tacogfn import TacoAffinityHead, convert_tacogfn_checkpoint, graph_batch_to_arrays


def _cast_floating(tree, dtype):
    """Cast every floating-point leaf (params AND activations) to dtype;
    integer graph indices pass through. Used by the bfloat16 compute-dtype
    opt-in — the cast happens inside the jitted trace, so XLA folds the
    param casts at compile time and the program streams bf16 from HBM."""
    def cast(a):
        a = jnp.asarray(a)
        return a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a

    return jax.tree.map(cast, tree)


def _load_torch_state(ckpt_path: str | Path, key: str | None = None) -> dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    if key is not None and isinstance(ckpt, dict) and key in ckpt:
        ckpt = ckpt[key]
    return {k: v.numpy() for k, v in ckpt.items()}


class TacoGFN_Proxy(BaseProxy):
    """Cache = (pocket vector [256], hotspot features [K, 256])."""

    cache_gdrive_link = {
        ("QVina-ZINCDock15M", "train"): "1VibvAjhir5oXx5cmzfE0F2UVTSDsGH3v",
        ("QVina-ZINCDock15M", "test"): "1F05JjkJuc6FwU4h8MLUEan34ovewGPLz",
        ("QVina-CrossDocked2020", "train"): "1-5he-ItdtcZvlGqyI_rVU0XIk0XGzFC-",
        ("QVina-CrossDocked2020", "test"): "1Ps3-Mj2GHH_FLtnjAD1riYiRyK01C_T8",
    }
    model_gdrive_link = {
        "QVina-ZINCDock15M": "1lrH79-6YI2CfEP5sWIWzgboZsONXWkIZ",
        "QVina-CrossDocked2020": "1Kjn4xNc8458Ibf-ckWjtuUotuhGFLiHK",
    }

    def _setup_model(self):
        self.model = TacoAffinityHead()
        self.params = None

    def _load_checkpoint(self, ckpt_path):
        state = _load_torch_state(ckpt_path, key="model")
        self.params = jax.tree.map(jnp.asarray, convert_tacogfn_checkpoint(state))

    def _init_random(self, seed: int = 0):
        graphs = [smi2graph("CCO")]
        batch = graph_batch_to_arrays(batch_graphs(graphs, pad_multiple=8))
        features = [jnp.zeros((1, d, d, d, 96)) for d in (4, 8, 16, 32, 64)]
        hotspots = jnp.zeros((2, 192))
        self.params = self.model.init(jax.random.PRNGKey(seed), features, hotspots, batch)

    def _get_cache(self, multi_scale_features, hotspot_infos) -> Cache:
        if hotspot_infos:
            hotspot_features = jnp.asarray(
                np.stack([info["hotspot_feature"] for info in hotspot_infos])
            )
        else:
            hotspot_features = jnp.zeros((0, 192))
        features = [jnp.asarray(f) for f in multi_scale_features]
        pocket, token = self.model.apply(
            self.params, features, hotspot_features, method="ready_to_calculate"
        )
        return (np.asarray(pocket), np.asarray(token))

    def _scoring_list(self, cache: Cache, smiles_list: list[str]) -> np.ndarray:
        # one-pass C++ featurization (python fallback per molecule inside)
        maybe = smi2graph_list(smiles_list)
        graphs = [g for g in maybe if g is not None]
        if len(graphs) != len(smiles_list):
            bad = next(i for i, g in enumerate(maybe) if g is None)
            raise ValueError(f"unparseable SMILES: {smiles_list[bad]!r}")
        return self._score_graphs(cache, graphs, [True] * len(graphs))

    def _score_graphs(self, cache, graphs, flags) -> np.ndarray:
        """Score pre-featurized graphs (also the small-batch fallback of
        parallel/proxy.py, which reuses its own featurization pass)."""
        pocket, token = cache
        # bucket graph count + array shapes so variable batch sizes reuse a
        # handful of compiled programs instead of one per composition
        batch = batch_graphs(graphs, num_graphs_pad=half_octave(len(graphs)))
        arrays = graph_batch_to_arrays(batch, categorical=True)
        out = self._apply_affinity(
            jnp.asarray(pocket), jnp.asarray(token), arrays[:7], batch.num_graphs
        )
        scores = np.asarray(out)[: len(graphs)]
        if all(flags):
            return scores
        result = np.zeros(len(flags), dtype=np.float32)
        result[np.asarray(flags)] = scores
        return result

    # sharded-scoring hooks (parallel/proxy.py)
    _graph_categorical = True
    _invalid_smiles = "raise"

    def _cache_device_parts(self, pyramid, token_features, keep):
        """Device-side cache computation on the PADDED token axis — pure,
        traced inside the mesh cache builder's per-pocket program
        (parallel/proxy.py). The masked summary makes the result equal to
        the exact path on the kept subset. (TacoGFN caches carry no
        positions, so none are taken.)"""
        pocket, token = self.model.apply(
            self.params, list(pyramid), token_features, keep,
            method="ready_to_calculate_masked",
        )
        return {"pocket": pocket, "token": token}

    def _cache_from_parts(self, parts, token_positions, keep_idx) -> Cache:
        del token_positions
        return (
            np.asarray(parts["pocket"]),
            np.asarray(parts["token"])[keep_idx],
        )

    def _score_forward(self, cache, arrays7, num_graphs):
        """Pure scoring forward on a (pocket, token) device cache — jitted by
        callers (_apply_affinity; parallel/proxy.py's mesh-sharded program)."""
        pocket, token = cache
        return self._affinity_forward(pocket, token, arrays7, num_graphs)

    @functools.partial(jax.jit, static_argnames=("self", "num_graphs"))
    def _apply_affinity(self, pocket, token, arrays7, num_graphs):
        return self._affinity_forward(pocket, token, arrays7, num_graphs)

    def _affinity_forward(self, pocket, token, arrays7, num_graphs):
        if self.precision == "bfloat16":
            params, pocket, token, arrays7 = _cast_floating(
                (self.params, pocket, token, arrays7), jnp.bfloat16
            )
            out = self.model.apply(
                params, pocket, token, (*arrays7, num_graphs),
                method="calculate_affinity",
            )
            return jax.tree.map(lambda a: a.astype(jnp.float32), out)
        with jax.default_matmul_precision(self.precision):
            return self.model.apply(
                self.params, pocket, token, (*arrays7, num_graphs),
                method="calculate_affinity",
            )

    @classmethod
    def load(cls, docking: str, train_dataset: str, db, device=None):
        assert docking in ("QVina", "QuickVina")
        assert train_dataset in ("ZINCDock15M", "CrossDocked2020")
        return super().load("QVina", train_dataset, db, device)


class SBDDReward_Proxy(BaseProxy):
    """Cache = (hotspot X [K,128], positions [K,3], pocket Z [128], mu, std)."""

    cache_gdrive_link = {
        ("UniDock_Vina-ZINC", "train"): "",
        ("UniDock_Vina-ZINC", "test"): "",
    }
    model_gdrive_link = {"UniDock_Vina-ZINC": ""}

    def _setup_model(self):
        self.model = SBDDRewardNetwork()
        self.params = None

    def _load_checkpoint(self, ckpt_path):
        state = _load_torch_state(ckpt_path)
        self.params = jax.tree.map(jnp.asarray, convert_sbddreward_checkpoint(state))

    def _init_random(self, seed: int = 0):
        graphs = [smi2graph("CCO")]
        batch = graph_batch_to_arrays(batch_graphs(graphs, pad_multiple=8), categorical=False)
        features = [jnp.zeros((1, d, d, d, 96)) for d in (4, 8, 16, 32, 64)]
        self.params = self.model.init(
            jax.random.PRNGKey(seed), features, jnp.zeros((2, 192)), jnp.zeros((2, 3)), batch
        )

    def _get_cache(self, multi_scale_features, hotspot_infos) -> Cache:
        if hotspot_infos:
            hotspot_features = jnp.asarray(
                np.stack([info["hotspot_feature"] for info in hotspot_infos])
            )
            hotspot_positions = jnp.asarray(
                np.array([info["hotspot_position"] for info in hotspot_infos], dtype=np.float32)
            )
        else:
            hotspot_features = jnp.zeros((0, 192))
            hotspot_positions = jnp.zeros((0, 3))
        features = [jnp.asarray(f) for f in multi_scale_features]
        x, pos, z, mu, std = self.model.apply(
            self.params, features, hotspot_features, hotspot_positions, method="get_cache"
        )
        return (np.asarray(x), np.asarray(pos), np.asarray(z), float(mu), float(std))

    def _scoring_list(self, cache: Cache, smiles_list: list[str], return_sigma: bool = False) -> np.ndarray:
        # invalid-SMILES masking returns 0.0 (sbddreward/proxy.py:54-72);
        # featurization is one C++ pass (smi2graph_list), invalid -> None
        maybe = smi2graph_list(smiles_list)
        graphs = [g for g in maybe if g is not None]
        flags = [g is not None for g in maybe]
        if not any(flags):
            return np.zeros(len(smiles_list), dtype=np.float32)
        return self._score_graphs(cache, graphs, flags, return_sigma)

    def _score_graphs(self, cache, graphs, flags, return_sigma: bool = False) -> np.ndarray:
        """Score pre-featurized graphs (also the small-batch fallback of
        parallel/proxy.py, which reuses its own featurization pass)."""
        batch = batch_graphs(graphs, num_graphs_pad=half_octave(len(graphs)))
        arrays = graph_batch_to_arrays(batch, categorical=False)
        x, pos, z = jnp.asarray(cache[0]), jnp.asarray(cache[1]), jnp.asarray(cache[2])
        mu, std = float(cache[3]), float(cache[4])
        dev_cache = (x, pos, z, mu, std)
        scores = np.asarray(
            self._apply_scoring(dev_cache, arrays[:7], batch.num_graphs, return_sigma)
        )[: len(graphs)]
        if all(flags):
            return scores
        result = np.zeros(len(flags), dtype=np.float32)
        result[np.asarray(flags)] = scores
        return result

    # sharded-scoring hooks (parallel/proxy.py)
    _graph_categorical = False
    _invalid_smiles = "zero"

    def _cache_device_parts(self, pyramid, token_features, keep):
        """Device-side cache computation on the PADDED token axis — pure,
        traced inside the mesh cache builder's per-pocket program
        (parallel/proxy.py). The hotspot MLP is per-row independent and the
        pocket vector depends only on the pyramid, so no masking is needed:
        the caller selects the kept rows of x host-side. Positions stay on
        the host (get_cache passes them through untouched, so tracing them
        would only add a retrace axis — see base.get_cache)."""
        del keep
        x, _, z, mu, std = self.model.apply(
            self.params, list(pyramid), token_features,
            jnp.zeros((token_features.shape[0], 3), token_features.dtype),
            method="get_cache",
        )
        return {"x": x, "z": z, "mu": mu, "std": std}

    def _cache_from_parts(self, parts, token_positions, keep_idx) -> Cache:
        return (
            np.asarray(parts["x"])[keep_idx],
            np.asarray(token_positions, dtype=np.float32)[keep_idx],
            np.asarray(parts["z"]),
            float(parts["mu"]),
            float(parts["std"]),
        )

    @functools.partial(
        jax.jit, static_argnames=("self", "num_graphs", "return_sigma")
    )
    def _apply_scoring(self, cache, arrays7, num_graphs, return_sigma):
        return self._score_forward(cache, arrays7, num_graphs, return_sigma)

    def _score_forward(self, cache, arrays7, num_graphs, return_sigma):
        """Precision-dispatched scoring forward — pure, jitted by callers
        (_apply_scoring above; parallel/proxy.py wraps it in a
        mesh-sharded program)."""
        if self.precision == "bfloat16":
            # True bf16 COMPUTE dtype, not just MXU pass precision: the
            # flat ComplexFormer forward is HBM-bound (PERF_NOTES round-3
            # proxy split), so the lever is halving the bytes streamed —
            # params and activations in bf16 — which
            # default_matmul_precision alone cannot do. Scores deviate
            # (bf16 has ~8 mantissa bits); measured on the real chip in
            # probe_proxy_split.py and CI-bounded in test_proxy.py.
            params, cache, arrays7 = _cast_floating(
                (self.params, cache, arrays7), jnp.bfloat16
            )
            out = self.model.apply(
                params, cache, (*arrays7, num_graphs), return_sigma,
                method="scoring",
            )
            return jax.tree.map(lambda a: a.astype(jnp.float32), out)
        with jax.default_matmul_precision(self.precision):
            return self.model.apply(
                self.params, cache, (*arrays7, num_graphs), return_sigma,
                method="scoring",
            )

    def scoring(self, target, smiles, return_sigma: bool = False):
        return self._scoring_list(self._cache[target], [smiles], return_sigma)

    def scoring_list(self, target, smiles_list, return_sigma: bool = False):
        return self._scoring_list(self._cache[target], smiles_list, return_sigma)

    def get_statistic(self, target: str) -> tuple[float, float]:
        cache = self._cache[target]
        return cache[-2], cache[-1]

    @classmethod
    def load(cls, docking: str, train_dataset: str, db, device=None):
        assert docking in ("UniDock_Vina",)
        assert train_dataset in ("ZINC",)
        return super().load(docking, train_dataset, db, device)


def get_docking_proxy(
    model: str,
    docking: str,
    train_dataset: str,
    db: str | Path | None,
    device: str | None = None,
) -> BaseProxy:
    """Proxy registry (pmnet_appl/__init__.py:26-70).

    model: 'TacoGFN_Reward' | 'SBDDReward'
    docking: 'QVina' | 'UniDock_Vina'
    train_dataset: 'ZINCDock15M' | 'CrossDocked2020' | 'ZINC'
    db: 'train' | 'test' | 'all' | custom cache path | None
    """
    if model == "TacoGFN_Reward":
        return TacoGFN_Proxy.load(docking, train_dataset, db, device)
    if model == "SBDDReward":
        return SBDDReward_Proxy.load(docking, train_dataset, db, device)
    raise ValueError(f"unknown proxy model: {model}")
