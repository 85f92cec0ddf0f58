"""How much of the dt kernel is the bounded-scan phase? (VERDICT #6)

Measures score_tiles_fused_dt on the production tiled batch at the real
(depth1, depth2) and with each scan ablated to depth 0 (wrong scores,
same instruction structure otherwise), via the paired-unroll slope.
The deltas bound what any scan restructuring can win.

Usage: python probes/probe_scan_share.py [batch_size] [iters]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

from bench import make_synthetic_ligands, make_synthetic_model
from pharmaconet_tpu.ops.screen_pallas import score_tiles_fused_dt
from pharmaconet_tpu.scoring.batch_screen import BatchScreener
from pharmaconet_tpu.scoring.screen_tiles import tile_distances
from pharmaconet_tpu.scoring.tiled_pack import build_tiled_batch


def main() -> None:
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 7

    model = make_synthetic_model()
    s = BatchScreener(model)
    ligs = make_synthetic_ligands(batch_size)
    tb = build_tiled_batch(s.packed_model, ligs, threads=1)
    dt = jnp.asarray(tile_distances(tb.pos_blocks, tb.uv))
    gtab = jnp.asarray(tb.gtab)
    aux = jnp.asarray(tb.aux)
    d1, d2 = tb.depth1, tb.depth2
    print(
        f"[probe] tiles={tb.gtab.shape[0]} nst={tb.nst} d1={d1} d2={d2}",
        file=sys.stderr,
    )

    def measure(dd1, dd2, label):
        def make(k):
            @jax.jit
            def f(a):
                tot = jnp.float32(0)
                for i in range(k):
                    tot = tot + score_tiles_fused_dt(
                        a + jnp.float32(i) * 1e-6, gtab, aux, dd1, dd2
                    ).sum()
                return tot
            return f

        f8, f32 = make(8), make(32)
        _ = float(f8(dt)); _ = float(f32(dt))
        ests = []
        for _ in range(iters):
            t0 = time.time(); float(f8(dt)); t8 = time.time() - t0
            t0 = time.time(); float(f32(dt)); t32 = time.time() - t0
            ests.append(max((t32 - t8) / 24, 1e-9))
        ms = statistics.median(ests) * 1e3
        print(f"[probe] {label}: {ms:.3f} ms/batch", file=sys.stderr)
        return ms

    full = measure(d1, d2, f"full (d1={d1}, d2={d2})")
    no2 = measure(d1, 0, "d2=0 (pair scan off)")
    no1 = measure(0, d2, "d1=0 (sub scan off)")
    none = measure(0, 0, "both scans off")
    print(
        f"[probe] scan share: sub {full - no1:.3f} ms, pair "
        f"{full - no2:.3f} ms, both {full - none:.3f} ms "
        f"({(full - none) / full * 100:.0f}% of {full:.3f})",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
