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

__all__ = ["PharmacophoreModel", "__version__"]
