"""TPU probe: end-to-end per-pocket modeling latency (VERDICT r4 #8).

Two scenarios on the real chip, each with the sparse AND dense density
wires (module.py density_wire):

  A. representative: the round-3 scanned synthesized checkpoint
     (seed=23, weight_scale=0.8) under DEFAULT gates — keeps ~27
     hotspots on 6OIM, the realistic per-pocket case that compares to
     the reference's 60 s CPU / 10 s GPU headline
     (/root/reference/README.md:67) and the <1 s north star.
  B. open gates (score/focus threshold 0.0): every token segments
     (289 hotspots) — the full-work ceiling, transfer-dominated through
     the axon relay.

Writes MODELING_LATENCY.json keyed on scenario A sparse.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from pharmaconet_tpu.module import PharmacoNet
from pharmaconet_tpu.network.convert import (
    convert_torch_state_dict,
    synthesize_torch_state_dict,
)
from pharmaconet_tpu.pharmacophore.model import PharmacophoreModel

PDB = "/root/reference/examples/6OIM_protein.pdb"
LIG = "/root/reference/examples/6OIM_D_MOV.pdb"

print(f"device: {jax.devices()[0]}", flush=True)

SCANNED = None  # lazily synthesized once, shared across wires


def build(scenario: str, wire: str) -> PharmacoNet:
    global SCANNED
    if scenario == "A":
        pm = PharmacoNet(weight_path=None, verbose=False, density_wire=wire)
        if SCANNED is None:
            SCANNED = jax.tree.map(
                jnp.asarray,
                convert_torch_state_dict(
                    synthesize_torch_state_dict(seed=23, weight_scale=0.8)
                ),
            )
        pm.params = SCANNED
        return pm
    pm = PharmacoNet(
        weight_path=None, verbose=False, score_threshold=0.0, density_wire=wire
    )
    pm.focus_threshold = 0.0
    return pm


def run(scenario: str, wire: str) -> dict:
    pm = build(scenario, wire)
    data = pm.parse(PDB, LIG)

    t0 = time.time()
    infos = pm.create_density_maps(data)  # cold: compiles (cache-warm across wires)
    cold = time.time() - t0

    warms = []
    for _ in range(5):
        t0 = time.time()
        infos = pm.create_density_maps(data)
        warms.append(time.time() - t0)
    warm = sorted(warms)[len(warms) // 2]

    t0 = time.time()
    model = PharmacophoreModel.create(data.pdbblock, data.center, infos, size=pm.grid_dim)
    graph_s = time.time() - t0

    t0 = time.time()
    pm.parse(PDB, LIG)
    parse_s = time.time() - t0

    nnz = [int((i["point_map"] > 0).sum()) for i in infos]
    rec = {
        "scenario": scenario,
        "wire": wire,
        "hotspots": len(infos),
        "parse_s": round(parse_s, 3),
        "density_maps_warm_median_s": round(warm, 3),
        "density_maps_warm_min_s": round(min(warms), 3),
        "graph_build_s": round(graph_s, 3),
        "total_s": round(parse_s + warm + graph_s, 3),
        "cold_s": round(cold, 1),
        "nonzero_per_map_max": max(nnz) if nnz else 0,
        "nodes": len(model.nodes),
    }
    print(json.dumps(rec), flush=True)
    return rec


results = {}
for scenario in ("A", "B"):
    for wire in ("sparse", "dense"):
        results[f"{scenario}_{wire}"] = run(scenario, wire)
        # the two wires of one scenario must agree end-to-end
    a, b = results[f"{scenario}_sparse"], results[f"{scenario}_dense"]
    assert a["hotspots"] == b["hotspots"] and a["nodes"] == b["nodes"], (a, b)

head = results["A_sparse"]
record = {
    "metric": "per_pocket_modeling_latency",
    "value": head["total_s"],
    "unit": "seconds",
    "vs_baseline": round(1.0 / head["total_s"], 3),  # north star: <1 s (BASELINE.md)
    "split": {
        "parse_seconds": head["parse_s"],
        "density_maps_warm_median_seconds": head["density_maps_warm_median_s"],
        "graph_build_seconds": head["graph_build_s"],
    },
    "hotspots": head["hotspots"],
    "device": str(jax.devices()[0]),
    "note": "6OIM, scanned synthesized checkpoint (seed 23/0.8), DEFAULT "
            "gates, sparse density wire (default). Reference headline: 60 s "
            "CPU / 10 s GPU per pocket.",
    "scenarios": results,
}
with open("/root/repo/MODELING_LATENCY.json", "w") as f:
    json.dump(record, f, indent=1)
print(json.dumps({k: record[k] for k in ("metric", "value", "unit", "vs_baseline")}), flush=True)
print("done", flush=True)
