"""Pretrained weight acquisition.

The reference fetches its torch checkpoint from Google Drive via gdown
(/root/reference/src/pmnet/utils/download_weight.py:5-26). This build:

  1. honors the PMNET_TPU_WEIGHT environment variable (pre-provisioned path,
     either a converted .npz or the reference model.tar)
  2. tries the same Google Drive artifact via gdown when network is available
     (it is then converted on the fly by network.convert)
  3. raises a clear error otherwise (air-gapped environments)
"""

from __future__ import annotations

import os
from pathlib import Path

GDRIVE_URL = "https://drive.google.com/uc?id=1gzjdM7bD3jPm23LBcDXtkSk18nETL04p"


def default_weight_dir() -> Path:
    return Path(os.environ.get("PMNET_TPU_HOME", Path.home() / ".pharmaconet_tpu"))


def resolve_weight_path(weight_path: str | Path | None = None, verbose: bool = True) -> Path:
    if weight_path is not None:
        path = Path(weight_path)
        if not path.exists():
            raise FileNotFoundError(f"weight file not found: {path}")
        return path
    env = os.environ.get("PMNET_TPU_WEIGHT")
    if env:
        path = Path(env)
        if path.exists():
            return path
        raise FileNotFoundError(f"PMNET_TPU_WEIGHT points to a missing file: {env}")
    for candidate in (default_weight_dir() / "model.npz", default_weight_dir() / "model.tar"):
        if candidate.exists():
            return candidate
    return download_pretrained_model(default_weight_dir() / "model.tar", verbose)


def download_pretrained_model(weight_path: str | Path, verbose: bool = True) -> Path:
    weight_path = Path(weight_path)
    if weight_path.exists():
        return weight_path
    weight_path.parent.mkdir(parents=True, exist_ok=True)
    try:
        import gdown  # type: ignore[import-not-found]
    except ImportError as e:
        raise RuntimeError(
            "Pretrained weights are not available locally and gdown is not "
            "installed. Provide the checkpoint via PMNET_TPU_WEIGHT or "
            f"place it at {weight_path} (reference artifact: {GDRIVE_URL})."
        ) from e
    if verbose:
        print(f"Downloading pretrained model to {weight_path} ...")
    gdown.download(GDRIVE_URL, str(weight_path), quiet=not verbose)
    return weight_path
