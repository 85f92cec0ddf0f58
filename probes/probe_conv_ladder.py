"""Experiment ladder for the mask-decoder 64^3 conv (the segmentation
dominator: 130 of 172 GF/hotspot, PERF_NOTES round-2 modeling split).

Question: the 16-hotspot chunk runs ~132 ms at tf32 (3-pass) = ~21 TF/s
vs a 66 TF/s peak — where do the 3x go? Candidates: 96-of-128 lane
occupancy in the conv, XLA conv lowering overhead, elementwise BN/ReLU,
or the non-conv parts of the chunk. This probe measures, with the
5-point unroll-slope estimator (PERF_NOTES 'measurement correction'):

  conv96       bare 3x3x3 96->96 conv on [B,64,64,64,96]  (HIGH + HIGHEST)
  conv96+bnrelu  same + affine + ReLU (the BaseConv3d composition)
  conv128      channels padded to 128 (both sides): tests lane occupancy
  shift27      27-shifted-matmul formulation, K=96 (what a Pallas kernel
               would do, expressed in XLA first)

per-op FLOPs at 64^3: 2 * 64^3 * 27 * Cin * Cout.
"""

from __future__ import annotations

import functools
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
D = 64

print(f"device: {jax.devices()[0]} batch={B}", flush=True)

rng = np.random.default_rng(0)


def mk(*shape, scale=0.1):
    return jnp.asarray(rng.normal(0, scale, shape).astype(np.float32))


def conv_op(x, w, precision):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=precision,
    )


def shift27(x, w, precision):
    # x: [B, D, D, D, C]; w: [3,3,3,C,O] -> accumulate 27 shifted matmuls
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    out = None
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                xs = jax.lax.slice(
                    xp, (0, dz, dy, dx, 0),
                    (x.shape[0], dz + D, dy + D, dx + D, x.shape[4]),
                )
                t = jnp.einsum("bdhwc,co->bdhwo", xs, w[dz, dy, dx],
                               precision=precision)
                out = t if out is None else out + t
    return out


def slope(fn, args, label, flops):
    # CHAIN the ops (each output feeds the next input) and consume the
    # final tensor with a full sum: a scalar-indexed conv output lets
    # XLA's slice-of-conv rewrite compute ONE voxel (first attempt
    # measured an impossible 1700 TF/s), and unrolled INDEPENDENT
    # iterations materialize every 2 GB temp at once (OOM at unroll 8).
    # Chaining also kills CSE without input perturbation.
    def make(k):
        @jax.jit
        def f(*a):
            x = a[0]
            for _ in range(k):
                x = fn(*((x,) + a[1:]))
            return jnp.sum(x)

        return f

    # paired 2/8 slope (bench.py estimator): 2 compiles per variant —
    # relay compiles of 64^3 conv programs cost minutes each
    f2, f8 = make(2), make(8)
    float(f2(*args)), float(f8(*args))
    estimates = []
    for _ in range(7):
        t0 = time.time()
        float(f2(*args))
        t2 = time.time() - t0
        t0 = time.time()
        float(f8(*args))
        t8 = time.time() - t0
        estimates.append(max((t8 - t2) / 6, 1e-9))
    sl = statistics.median(estimates)
    print(
        f"{label}: {sl * 1e3:.1f} ms/op -> {flops / sl / 1e12:.1f} TF/s",
        flush=True,
    )
    return sl


HI = jax.lax.Precision.HIGH
HST = jax.lax.Precision.HIGHEST

# unit-variance-preserving weight scale (1/sqrt(27*96)): chained convs
# stay finite across the unroll depth
x96 = mk(B, D, D, D, 96)
w96 = mk(3, 3, 3, 96, 96, scale=0.0196)
scale = mk(96)
bias = mk(96)
f96 = 2.0 * B * D**3 * 27 * 96 * 96

x128 = mk(B, D, D, D, 128)
w128 = mk(3, 3, 3, 128, 128, scale=0.017)
f128 = 2.0 * B * D**3 * 27 * 128 * 128

slope(functools.partial(conv_op, precision=HI), (x96, w96),
      "conv96 HIGH (tf32-ish 3-pass)", f96)
slope(functools.partial(conv_op, precision=HST), (x96, w96),
      "conv96 HIGHEST (6-pass f32)", f96)
slope(
    lambda x, w, s, b: jnp.maximum(conv_op(x, w, HI) * s + b, 0.0),
    (x96, w96, scale, bias), "conv96+bn+relu HIGH", f96,
)
slope(functools.partial(conv_op, precision=HI), (x128, w128),
      "conv128 HIGH", f128)
slope(functools.partial(shift27, precision=HI), (x96, w96),
      "shift27 x96 HIGH", f96)

print("done", flush=True)
