"""Device-mesh helpers.

Parallelism design (SURVEY.md §2.6): the network is small (~31M params) and
fully replicated; the scale axis is the ligand/pocket batch. A 1-D
('data',) mesh shards ligand blocks for screening and pocket batches for
training; collectives are limited to score gathers and gradient psums over
ICI. No tensor/pipeline sharding is warranted at this model size.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DATA_AXIS = "data"


def data_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
