from .model import PharmacoNetModel, build_model

__all__ = ["PharmacoNetModel", "build_model"]
