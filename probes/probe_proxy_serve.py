"""Sustained proxy serving on the real chip: synchronous scoring_list loop
vs scoring_iter (host featurization of batch i+1 overlapped with batch i's
device program on a worker thread).

The reference RL loop scores one synchronous batch per step
(/root/reference/src/pmnet_appl/sbddreward/proxy.py:54-72); round-3 split
measurements (probe_proxy_split.py) put the host tail at ~24 ms/2048-batch
next to ~69 ms device, so full overlap should recover most of the host
share. Direct wall clock over NB batches, median of reps — conservative
(includes relay dispatch).
"""

from __future__ import annotations

import statistics
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import os

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    # honor an explicit CPU request: the axon sitecustomize force-registers
    # the relay platform regardless of the environment (see tests/conftest)
    jax.config.update("jax_platforms", "cpu")

from bench import _SMILES_POOL

from pharmaconet_tpu.parallel.proxy import ShardedProxyScorer
from pharmaconet_tpu.proxy.proxies import SBDDReward_Proxy

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
NB = int(sys.argv[2]) if len(sys.argv) > 2 else 8
# PROBE_TINY=1: CPU smoke of the script itself (tiny pocket encoder); the
# real measurement uses the production 4..64^3 pyramid on the chip
dims = (4, 4, 4, 8, 8) if os.environ.get("PROBE_TINY") else (4, 8, 16, 32, 64)
print(f"device: {jax.devices()[0]} batch={B} x {NB} dims={dims}", flush=True)

rng = np.random.default_rng(0)
features = [
    jnp.asarray(rng.normal(0, 1, (1, d, d, d, 96)).astype(np.float32))
    for d in dims
]
hotspot_infos = [
    {
        "hotspot_feature": rng.normal(0, 1, 192).astype(np.float32),
        "hotspot_position": tuple(rng.uniform(-5, 5, 3).tolist()),
    }
    for _ in range(16)
]
proxy = SBDDReward_Proxy()
proxy._init_random()
proxy.put_cache("t", proxy._get_cache(features, hotspot_infos))
scorer = ShardedProxyScorer(proxy)

# NB distinct batches (rotate the pool so host featurization is real work
# per batch; shapes stay in one compile bucket)
batches = [
    [_SMILES_POOL[(i + 7 * b) % len(_SMILES_POOL)] for i in range(B)]
    for b in range(NB)
]
stream = [s for batch in batches for s in batch]


def run_sync():
    outs = [scorer.scoring_list("t", batch) for batch in batches]
    return float(np.sum([o.sum() for o in outs]))


def run_overlap():
    outs = list(scorer.scoring_iter("t", iter(stream), batch_size=B))
    return float(np.sum([o.sum() for o in outs]))


def med(fn, reps=5):
    fn()  # warm compile + caches
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return statistics.median(ts)


t_sync = med(run_sync)
t_over = med(run_overlap)
a, b = run_sync(), run_overlap()
assert abs(a - b) < 1e-3 * max(1.0, abs(a)), (a, b)

n = B * NB
print(f"sync    : {t_sync*1e3:8.1f} ms  {n/t_sync:10.0f} mol/s")
print(f"overlap : {t_over*1e3:8.1f} ms  {n/t_over:10.0f} mol/s  ({t_sync/t_over:.2f}x)")
