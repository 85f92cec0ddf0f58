"""PharmacoNet-TPU: TPU-native protein pharmacophore modeling + screening.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of PharmacoNet
(Seo & Kim, Chem. Sci. 2024): protein-based pharmacophore modeling with a
frozen 3D instance-segmentation network, ultra-fast analytic virtual
screening, and pocket feature extraction for downstream deep learning —
redesigned for TPU hardware (MXU-friendly voxelization, fused single-program
modeling, mesh-sharded batch screening) instead of translated from the
PyTorch/numba reference.
"""

__version__ = "0.1.0"
__description__ = (
    f"PharmacoNet-TPU v{__version__} — TPU-native protein-based pharmacophore "
    "modeling and ultra-large-scale virtual screening (JAX/XLA/Pallas)."
)

from .pharmacophore.model import PharmacophoreModel

# Heavier surfaces resolve lazily so `import pharmaconet_tpu` stays light
# (parse workers and docs tooling import the package for
# PharmacophoreModel alone; the reference's root exports the same single
# class, src/pmnet/__init__.py) while migrating users still find every
# major entry point at the root.
_LAZY = {
    "PharmacoNet": ("pharmaconet_tpu.module", "PharmacoNet"),
    "BatchScreener": ("pharmaconet_tpu.scoring.batch_screen", "BatchScreener"),
    "Ligand": ("pharmaconet_tpu.scoring.ligand", "Ligand"),
    "get_docking_proxy": ("pharmaconet_tpu.proxy", "get_docking_proxy"),
    "get_pmnet_dev": ("pharmaconet_tpu.api", "get_pmnet_dev"),
}


def __getattr__(name: str):
    target = _LAZY.get(name)
    if target is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(target[0]), target[1])


__all__ = ["PharmacophoreModel", "__version__", *sorted(_LAZY)]
