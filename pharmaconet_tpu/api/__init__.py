"""Developer API for using PharmacoNet-TPU inside DL training loops.

Mirrors /root/reference/src/pmnet/api/__init__.py:12-32. The reference's
`compile=True` option maps to nothing here: the device program is always
jit-compiled (module.py builds one fused XLA program).
"""

from __future__ import annotations

from ..chem.pdb import load_pdb, parse_pdb
from ..module import PharmacoNet, ProteinData

__all__ = ["PharmacoNet", "ProteinData", "get_pmnet_dev", "load_pdb", "parse_pdb"]


def get_pmnet_dev(
    device: str | None = None,
    score_threshold: float = 0.5,
    weight_path: str | None = None,
    **kwargs,
) -> PharmacoNet:
    """PharmacoNet configured for feature extraction (flat 0.5 threshold).

    device is accepted for API compatibility; JAX places computation on the
    default backend (TPU when available).
    """
    del device
    return PharmacoNet(
        weight_path=weight_path, score_threshold=score_threshold, verbose=False, **kwargs
    )
