"""TPU probe: bare 3^3 conv FLOP rate at the mask-head shape, by precision
and channel padding, plus upsample+add overhead."""

from __future__ import annotations

import statistics
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from flax import linen as nn

print(f"device: {jax.devices()[0]}", flush=True)
rng = np.random.default_rng(0)


def force(out):
    # the axon relay's block_until_ready returns early; force with a
    # device-side reduction + host transfer (adds ~fixed ms)
    return float(sum(jnp.sum(o) for o in jax.tree.leaves(out)))


def measure(fn, args, label, flops=None, reps=5):
    force(fn(*args))
    est = []
    for _ in range(reps):
        t0 = time.time()
        force(fn(*args))
        est.append(time.time() - t0)
    med = statistics.median(est)
    extra = f" -> {flops / med / 1e12:.1f} TF/s" if flops else ""
    print(f"{label}: {med * 1e3:.1f} ms{extra}", flush=True)
    return med


B, D, C = 16, 64, 96
x = jnp.asarray(rng.normal(0, 1, (B, D, D, D, C)).astype(np.float32))
flops = 2 * 27 * C * C * (D**3) * B

for prec in ("float32", "tensorfloat32", "bfloat16"):
    conv = nn.Conv(C, kernel_size=(3, 3, 3), padding="SAME")
    params = conv.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def run(p, x, conv=conv, prec=prec):
        with jax.default_matmul_precision(prec):
            return conv.apply(p, x)

    measure(run, (params, x), f"conv 96->96 @64^3 x16 {prec}", flops)

# channel-padded variant: 128->128 at f32 (wasted flops but full lanes?)
C2 = 128
x2 = jnp.asarray(rng.normal(0, 1, (B, D, D, D, C2)).astype(np.float32))
conv2 = nn.Conv(C2, kernel_size=(3, 3, 3), padding="SAME")
params2 = conv2.init(jax.random.PRNGKey(0), x2)


@jax.jit
def run2(p, x):
    with jax.default_matmul_precision("float32"):
        return conv2.apply(p, x)


flops2 = 2 * 27 * C2 * C2 * (D**3) * B
measure(run2, (params2, x2), "conv 128->128 @64^3 x16 f32", flops2)

# upsample+add overhead at the 32->64 level
y = jnp.asarray(rng.normal(0, 1, (B, 32, 32, 32, C)).astype(np.float32))
from pharmaconet_tpu.network.layers import upsample_nearest_2x


@jax.jit
def up(a, b):
    return a + upsample_nearest_2x(b)


measure(up, (x, y), "lateral + upsample2x @64^3 x16")
print("done", flush=True)
