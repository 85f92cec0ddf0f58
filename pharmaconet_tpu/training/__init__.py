"""Training kit: detector train step + proxy-head developer trainer."""

from .affinity_model import DevAffinityModel
from .config import Config
from .train_step import make_dummy_batch, make_optimizer, make_train_step

__all__ = [
    "DevAffinityModel",
    "Config",
    "make_dummy_batch",
    "make_optimizer",
    "make_train_step",
]
