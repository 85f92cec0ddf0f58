"""Test configuration: force a virtual 8-device CPU mesh.

Multi-chip sharding is exercised on a CPU-simulated mesh
(xla_force_host_platform_device_count=8); the driver separately dry-runs the
multi-chip path. Real-TPU benchmarking happens in bench.py, not in tests.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the remote-TPU platform and sets
# jax_platforms="axon,cpu" regardless of the environment; re-pin to CPU so
# tests run locally (eager ops over the TPU tunnel are network roundtrips).
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

EXAMPLES = "/root/reference/examples"


@pytest.fixture(scope="session")
def protein_pdb() -> str:
    return f"{EXAMPLES}/6OIM_protein.pdb"


@pytest.fixture(scope="session")
def ref_ligand_pdb() -> str:
    return f"{EXAMPLES}/6OIM_D_MOV.pdb"
