"""Docking-proxy base: target-cache protocol + SMILES scoring.

Rebuilds /root/reference/src/pmnet_appl/base/proxy.py:32-278 in JAX: lazy
PharmacoNet setup, per-target pocket caches, scoring/scoring_list over
SMILES, cache-database construction with per-pocket error tolerance, and
gdown-gated weight/cache download with torch-checkpoint conversion.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any

import numpy as np

from ..utils.download_weight import default_weight_dir

logger = logging.getLogger("pharmaconet_tpu.proxy")

Cache = Any

_KEYS_DIR = Path(__file__).parent / "keys"


def load_cache_keys(dataset: str, variant: str = "base") -> list[str]:
    """CrossDocked2020 pocket keys shipped with the pretrained cache DBs.

    Mirrors the reference artifacts `pmnet_appl/keys/{train,test}.txt`
    (15,201 / 100 pockets) and the TacoGFN variant
    `pmnet_appl/tacogfn_reward/db_keys/{train,test}.txt` (15,207 / 100).
    These enumerate the keys present in the 'train'/'test' cache databases
    accepted by :meth:`BaseProxy.load`.
    """
    if dataset not in ("train", "test"):
        raise ValueError(f"dataset must be 'train' or 'test', got {dataset!r}")
    sub = {"base": _KEYS_DIR, "tacogfn": _KEYS_DIR / "tacogfn"}[variant]
    return (sub / f"{dataset}.txt").read_text().split()


class BaseProxy:
    cache_gdrive_link: dict[tuple[str, str], str] = {}
    model_gdrive_link: dict[str, str] = {}

    def __init__(self, ckpt_path: str | Path | None = None, pmnet_kwargs: dict | None = None,
                 precision: str = "float32"):
        """precision: compute precision for proxy inference. 'float32'
        (default) matches the torch reference's true-f32 linears (torch
        matmul allow_tf32 defaults False, unlike its convs).
        'tensorfloat32' lowers only the MXU pass precision — MEASURED
        USELESS here (1.02x for ~3e-2 deviation): after the flat-atom
        rewrite the ComplexFormer forward is HBM-bound, not FLOP-bound.
        'bfloat16' is the lever that fits that regime: params AND
        activations are cast to bf16 inside the trace, halving the bytes
        streamed from HBM; scores deviate at bf16's ~8 mantissa bits
        (measured on the real chip, PERF_NOTES round-3)."""
        assert precision in ("float32", "tensorfloat32", "bfloat16")
        self.pmnet = None  # lazy (base/proxy.py:44, 269-274)
        self._cache_parts_jit = None  # lazy jit of _cache_device_parts
        self._cache: dict[str, Cache] = {}
        self._pmnet_kwargs = pmnet_kwargs or {}
        self.precision = precision
        self._setup_model()
        if ckpt_path is not None:
            self._load_checkpoint(ckpt_path)

    # -- implement in subclasses ---------------------------------------
    def _setup_model(self):
        raise NotImplementedError

    def _load_checkpoint(self, ckpt_path: str | Path):
        raise NotImplementedError

    def _get_cache(self, multi_scale_features, hotspot_infos) -> Cache:
        raise NotImplementedError

    def _scoring_list(self, cache: Cache, smiles_list: list[str]) -> np.ndarray:
        raise NotImplementedError

    # -- weight management ----------------------------------------------
    @classmethod
    def _weight_dir(cls) -> Path:
        return default_weight_dir() / "proxies" / cls.__name__

    @classmethod
    def _download(cls, gdrive_id: str, path: Path):
        if path.exists():
            return
        path.parent.mkdir(parents=True, exist_ok=True)
        try:
            import gdown  # type: ignore[import-not-found]
        except ImportError as e:
            raise RuntimeError(
                f"proxy artifact {path.name} is not available locally and gdown "
                f"is not installed (gdrive id: {gdrive_id}); provision the file "
                f"at {path}"
            ) from e
        gdown.download(f"https://drive.google.com/uc?id={gdrive_id}", str(path))

    @classmethod
    def load(
        cls,
        docking: str,
        train_dataset: str,
        db: str | Path | None,
        device: str | None = None,
    ) -> "BaseProxy":
        """Load a pretrained proxy + optional CrossDocked2020 cache database
        ('train' 15,201 pockets | 'test' 100 | 'all' | custom path)."""
        del device  # JAX places computation automatically
        weight_dir = cls._weight_dir()
        suffix = f"{docking}-{train_dataset}"
        ckpt_path = weight_dir / f"model-{suffix}.pth"
        cls._download(cls.model_gdrive_link[suffix], ckpt_path)

        cache_dict: dict[str, Cache] = {}
        labels = {"train": ["train"], "test": ["test"], "all": ["train", "test"]}.get(db)
        if labels is not None:
            for label in labels:
                cache_path = weight_dir / f"cache-{label}-{suffix}.pt"
                cls._download(cls.cache_gdrive_link[(suffix, label)], cache_path)
                cache_dict.update(cls._load_cache_file(cache_path))
        elif db is not None:
            cache_dict.update(cls._load_cache_file(db))

        proxy = cls(ckpt_path)
        proxy.update_cache(cache_dict)
        return proxy

    @staticmethod
    def _load_cache_file(path: str | Path) -> dict[str, Cache]:
        import torch

        raw = torch.load(path, map_location="cpu", weights_only=False)
        return {
            key: tuple(v.numpy() if hasattr(v, "numpy") else v for v in value)
            for key, value in raw.items()
        }

    # -- cache protocol ---------------------------------------------------
    def put_cache(self, key: str, cache: Cache) -> None:
        self._cache[key] = cache

    def update_cache(self, cache_dict: dict[str, Cache]) -> None:
        self._cache.update(cache_dict)

    def get_cache(
        self,
        protein_pdb_path: str | Path,
        ref_ligand_path: str | Path | None = None,
        center=None,
        fused: bool = True,
    ) -> Cache:
        """Target cache for one pocket (base/proxy.py:190-205).

        fused=True (default) keeps the PharmacoNet trunk outputs device-
        resident and runs the pocket encoder on them directly — the
        ~100 MB multi-scale pyramid never crosses to the host. fused=False
        is the reference-shaped two-step path (feature_extraction to host
        numpy, then `_get_cache`); both are equality-tested."""
        import jax
        import jax.numpy as jnp

        self.setup_pmnet()
        # subclasses without the device hooks fall back to the two-step path
        if not fused or not hasattr(self, "_cache_device_parts"):
            features, hotspot_infos = self.pmnet.feature_extraction(
                protein_pdb_path, ref_ligand_path, center
            )
            with jax.default_matmul_precision("float32"):
                return self._get_cache(features, hotspot_infos)

        data = self.pmnet.parse(protein_pdb_path, ref_ligand_path, center)
        out = self.pmnet.run_trunk(data)
        # token_positions stay host-side: the hooks never compute on them
        # (passing the unbucketed array through jit would retrace per
        # distinct pocket token count)
        tpos = np.asarray(data.token_positions, np.float32)
        with jax.default_matmul_precision("float32"):
            parts = self._apply_cache_parts(
                tuple(out["pyramid"]), out["token_features"], out["keep"]
            )
        keep_idx = np.nonzero(np.asarray(out["keep"]))[0]
        parts = {k: np.asarray(v) for k, v in parts.items()}
        return self._cache_from_parts(parts, tpos, keep_idx)

    def _apply_cache_parts(self, pyramid, token_features, keep):
        import functools

        import jax

        if self._cache_parts_jit is None:
            self._cache_parts_jit = functools.partial(
                jax.jit, static_argnums=(0,)
            )(type(self)._cache_device_parts)
        return self._cache_parts_jit(self, pyramid, token_features, keep)

    def get_cache_database(
        self,
        pocket_info: dict[str, tuple],
        save_path: str | Path | None = None,
        verbose: bool = True,
    ) -> dict[str, Cache]:
        """Per-pocket try/except-continue cache building (base/proxy.py:223-236)."""
        import tqdm

        cache_dict: dict[str, Cache] = {}
        for key, (protein_pdb_path, pocket_center) in tqdm.tqdm(
            pocket_info.items(), disable=not verbose
        ):
            try:
                if isinstance(pocket_center, (str, Path)):
                    cache = self.get_cache(protein_pdb_path, ref_ligand_path=pocket_center)
                else:
                    cache = self.get_cache(protein_pdb_path, center=pocket_center)
            except Exception as e:  # noqa: BLE001 - tolerant batch building
                print(key, e)
            else:
                cache_dict[key] = cache
        if save_path is not None:
            self._save_cache_file(cache_dict, save_path)
        return cache_dict

    @staticmethod
    def _save_cache_file(cache_dict: dict[str, Cache], path: str | Path) -> None:
        import pickle

        with open(path, "wb") as w:
            pickle.dump(cache_dict, w)

    def setup_pmnet(self) -> None:
        if self.pmnet is None:
            from ..api import get_pmnet_dev

            self.pmnet = get_pmnet_dev(**self._pmnet_kwargs)

    # -- scoring ---------------------------------------------------------
    def scoring(self, target: str, smiles: str) -> np.ndarray:
        """Estimated docking score for one SMILES against a cached target."""
        return self._scoring_list(self._cache[target], [smiles])

    def scoring_list(self, target: str, smiles_list: list[str]) -> np.ndarray:
        """Estimated docking scores [N] for SMILES against a cached target."""
        return self._scoring_list(self._cache[target], smiles_list)
