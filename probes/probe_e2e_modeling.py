"""TPU probe: end-to-end create_density_maps via the dynamic-chunk path.

Drives parse -> trunk program -> keep sync -> slab/chunk segmentation ->
host postprocess -> PharmacophoreModel on the real chip, full arch.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from pharmaconet_tpu.module import PharmacoNet
from pharmaconet_tpu.pharmacophore.model import PharmacophoreModel

print(f"device: {jax.devices()[0]}", flush=True)

pm = PharmacoNet(weight_path=None, verbose=True, score_threshold=0.0)
pm.focus_threshold = 0.0  # random weights: open the gates so slabs run
data = pm.parse(
    "/root/reference/examples/6OIM_protein.pdb",
    "/root/reference/examples/6OIM_D_MOV.pdb",
)
print(f"atoms={data.atom_valid.sum()} tokens={data.token_valid.sum()}", flush=True)

t0 = time.time()
infos = pm.create_density_maps(data)  # cold: includes compiles
print(f"cold create_density_maps: {time.time() - t0:.1f} s, {len(infos)} hotspots", flush=True)

t0 = time.time()
infos = pm.create_density_maps(data)
warm = time.time() - t0
print(f"warm create_density_maps: {warm:.2f} s, {len(infos)} hotspots", flush=True)

model = PharmacophoreModel.create(data.pdbblock, data.center, infos, size=pm.grid_dim)
print(f"model: {len(model.nodes)} nodes, {len(model.edges)} edges", flush=True)
model.save("/tmp/probe_e2e_model.pm")
loaded = PharmacophoreModel.load("/tmp/probe_e2e_model.pm")
assert len(loaded.nodes) == len(model.nodes)
print("done", flush=True)
