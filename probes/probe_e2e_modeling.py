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

warms = []
for _ in range(5):
    t0 = time.time()
    infos = pm.create_density_maps(data)
    warms.append(time.time() - t0)
warm = sorted(warms)[len(warms) // 2]
print(f"warm create_density_maps: {warm:.2f} s median of {len(warms)} "
      f"(min {min(warms):.2f}), {len(infos)} hotspots", flush=True)

t0 = time.time()
model = PharmacophoreModel.create(data.pdbblock, data.center, infos, size=pm.grid_dim)
graph_s = time.time() - t0
print(f"model: {len(model.nodes)} nodes, {len(model.edges)} edges "
      f"({graph_s:.2f} s graph build)", flush=True)
model.save("/tmp/probe_e2e_model.pm")
loaded = PharmacophoreModel.load("/tmp/probe_e2e_model.pm")
assert len(loaded.nodes) == len(model.nodes)

t0 = time.time()
data2 = pm.parse(
    "/root/reference/examples/6OIM_protein.pdb",
    "/root/reference/examples/6OIM_D_MOV.pdb",
)
parse_s = time.time() - t0
assert int(data2.atom_valid.sum()) == int(data.atom_valid.sum())

# BENCH-style record (VERDICT r4 #8): per-pocket latency on the CURRENT
# tree vs the <1 s north star (BASELINE.md; reference: 60 s CPU / 10 s GPU)
import json

total = parse_s + warm + graph_s
record = {
    "metric": "per_pocket_modeling_latency",
    "value": round(total, 3),
    "unit": "seconds",
    "vs_baseline": round(1.0 / total, 3),
    "split": {
        "parse_seconds": round(parse_s, 3),
        "density_maps_warm_median_seconds": round(warm, 3),
        "graph_build_seconds": round(graph_s, 3),
        "cold_first_call_seconds": None,  # printed above; relay-dependent
    },
    "hotspots": len(infos),
    "device": str(jax.devices()[0]),
    "note": "6OIM, synthesized weights, open gates (score/focus threshold "
            "0.0 -> full-work worst case: every token segments)",
}
with open("/root/repo/MODELING_LATENCY.json", "w") as f:
    json.dump(record, f, indent=1)
print(json.dumps({k: record[k] for k in ("metric", "value", "unit", "vs_baseline")}), flush=True)
print("done", flush=True)
