"""Where does the dense-leaf chain spend its time on chip?

Splits the BENCH_ENGINE=v3-leaf device chain into cumulative phases and
measures each with the bench.py paired unroll-slope estimator:

  A  score_tiles_v3_rows (pair kernel alone)
  B  A + window build: rows_z[ends2] gather -> [B, W, C] + prune fold
  C  B + the two leaf einsums (score + dead-count)
  D  full leaf2_scores_device (C + max/mean epilogue + outlier gather)

The deltas attribute the leaf overhead to the 1M-row gather vs the
one-hot MXU matmuls — deciding whether the next kernel goes after the
gather, the einsum traffic, or both.

Usage: python probes/probe_leaf_phases.py [batch_size] [iters]
"""

from __future__ import annotations

import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from bench import make_synthetic_ligands, make_synthetic_model
from pharmaconet_tpu.ops.screen_pallas import score_tiles_v3_rows
from pharmaconet_tpu.scoring.batch_screen import BatchScreener
from pharmaconet_tpu.scoring.tiled_store import TiledStore, write_v3_store


def main_buckets(sb, iters: int) -> None:
    """Phase split of the BUCKETED leaf chain (round-5 layout):
    A kernel, B + per-bucket window gathers, C + per-bucket einsums,
    D full leaf2_scores_multi."""
    from pharmaconet_tpu.scoring.leaf_tree import (
        _bucket_scores,
        leaf2_scores_multi,
    )

    depth, mn_cap, g_cap = sb.depth, sb.mn_cap, sb.g_cap
    c = sb.dt.shape[1]
    nb = sb.leaf_nb
    buckets = tuple(
        tuple(jnp.asarray(np.asarray(a)) for a in b)
        for b in sb.leaf_buckets
    )
    specs = [
        (b[3].shape[0], b[1].shape[1], b[3].shape[1]) for b in buckets
    ]
    print(
        f"[probe] buckets={specs} "
        f"slots={sum(bk * wk for bk, _lk, wk in specs)} "
        f"outliers={len(sb.leaf2_out['live'])} "
        f"NOUT_pad={len(sb.leaf2_out_ends)}",
        file=sys.stderr,
    )
    oends = jnp.asarray(np.asarray(sb.leaf2_out_ends))
    args = tuple(
        jnp.asarray(np.asarray(a))
        for a in (sb.dt, sb.gid, sb.tab, sb.aux)
    )

    def rows_of(a):
        return score_tiles_v3_rows(
            *a, depth=depth, mn_cap=mn_cap, g_cap=g_cap
        )

    def phase_a(a):
        return rows_of(a).sum()

    def phase_b(a):
        rows = rows_of(a)
        rows_z = jnp.concatenate(
            [rows, jnp.zeros((1, c), rows.dtype)], axis=0
        )
        tot = jnp.float32(0)
        for ends2, _ps, _pc, pw, _conf, _idx in buckets:
            bk, wk = pw.shape
            tw = rows_z[ends2].reshape(bk, wk, c)
            tot = tot + jnp.where(pw[:, :, None], -1.0, tw).sum()
        return tot

    def phase_c(a):
        rows = rows_of(a)
        rows_z = jnp.concatenate(
            [rows, jnp.zeros((1, c), rows.dtype)], axis=0
        )
        tot = jnp.float32(0)
        for ends2, ps, pc, pw, conf, _idx in buckets:
            tot = tot + _bucket_scores(rows_z, ends2, ps, pc, pw, conf).sum()
        return tot

    def phase_d(a):
        scores, out_rows = leaf2_scores_multi(rows_of(a), oends, buckets, nb=nb)
        return scores.sum() + out_rows.sum()

    def measure(phase_fn, label):
        def make_unrolled(k):
            @jax.jit
            def f(a):
                total = jnp.float32(0)
                for i in range(k):
                    perturbed = (a[0] + jnp.float32(i) * 1e-6,) + a[1:]
                    total = total + phase_fn(perturbed)
                return total
            return f

        f8, f32 = make_unrolled(8), make_unrolled(32)
        _ = float(f8(args)); _ = float(f32(args))
        ests = []
        for _i in range(max(iters, 7)):
            t0 = time.time(); _ = float(f8(args)); t8 = time.time() - t0
            t0 = time.time(); _ = float(f32(args)); t32 = time.time() - t0
            ests.append(max((t32 - t8) / 24, 1e-9))
        ms = statistics.median(ests) * 1e3
        print(f"[probe] {label}: {ms:.2f} ms/batch", file=sys.stderr)
        return ms

    def phase_e(a):
        scores, out_rows = leaf2_scores_multi(
            rows_of(a), oends, buckets, nb=nb, split_s=True
        )
        return scores.sum() + out_rows.sum()

    a = measure(phase_a, "A pair kernel")
    bb = measure(phase_b, "B + bucket window gathers")
    cc = measure(phase_c, "C + bucket einsums")
    d = measure(phase_d, "D full multi chain")
    e = measure(phase_e, "E full chain, split-S einsum (2x bf16 passes)")
    print(
        f"[probe] deltas: gather {bb - a:.2f} ms, einsums {cc - bb:.2f} ms, "
        f"epilogue+outliers {d - cc:.2f} ms; split-S saves {d - e:.2f} ms",
        file=sys.stderr,
    )
    sd = np.asarray(leaf2_scores_multi(
        score_tiles_v3_rows(*args, depth=depth, mn_cap=mn_cap, g_cap=g_cap),
        oends, buckets, nb=nb)[0])
    se = np.asarray(leaf2_scores_multi(
        score_tiles_v3_rows(*args, depth=depth, mn_cap=mn_cap, g_cap=g_cap),
        oends, buckets, nb=nb, split_s=True)[0])
    rel = float((np.abs(se - sd) / np.maximum(np.abs(sd), 1e-3)).max())
    print(f"[probe] split-S max rel deviation vs HIGHEST: {rel:.2e}",
          file=sys.stderr)


def main() -> None:
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 7

    import os

    layout = os.environ.get("PROBE_LEAF_LAYOUT", "single")
    model = make_synthetic_model(seed=0)
    screener = BatchScreener(model, engine="xla")
    ligands = make_synthetic_ligands(batch_size, seed=1)
    tmp = tempfile.mkdtemp(prefix="probe_leaf_")
    write_v3_store(
        tmp, screener.packed_model, ligands,
        [f"l{i}" for i in range(batch_size)],
        batch_size=batch_size, verbose=False, leaf_layout=layout,
    )
    sb = TiledStore(tmp, screener.packed_model).load(0)
    if layout == "buckets":
        return main_buckets(sb, iters)
    assert sb.leaf2_ps is not None
    depth, mn_cap, g_cap = sb.depth, sb.mn_cap, sb.g_cap
    b, w_cap = sb.leaf2_pw.shape
    l_cap = sb.leaf2_ps.shape[1]
    c = sb.dt.shape[1]
    print(
        f"[probe] B={b} L={l_cap} W={w_cap} C={c} T={sb.dt.shape[0]} "
        f"outliers={len(sb.leaf2_out['live'])} "
        f"NOUT_pad={len(sb.leaf2_out_ends)}",
        file=sys.stderr,
    )

    dt, gid, tab, aux = (
        jnp.asarray(np.asarray(a)) for a in (sb.dt, sb.gid, sb.tab, sb.aux)
    )
    ends2 = jnp.asarray(np.asarray(sb.leaf2_ends))
    ps = jnp.asarray(np.asarray(sb.leaf2_ps))
    pc = jnp.asarray(np.asarray(sb.leaf2_pc))
    pw = jnp.asarray(np.asarray(sb.leaf2_pw))
    conf = jnp.asarray(np.asarray(sb.leaf_conf))
    oends = jnp.asarray(np.asarray(sb.leaf2_out_ends))

    def rows_of(args):
        return score_tiles_v3_rows(
            *args, depth=depth, mn_cap=mn_cap, g_cap=g_cap
        )

    def window_of(rows):
        rows_z = jnp.concatenate(
            [rows, jnp.zeros((1, c), rows.dtype)], axis=0
        )
        tw = rows_z[ends2].reshape(b, w_cap, c)
        return jnp.where(pw[:, :, None], -1.0, tw), rows_z

    def phase_a(args):
        return rows_of(args).sum()

    def phase_b(args):
        tw, _ = window_of(rows_of(args))
        return tw.sum()

    def phase_c(args):
        tw, _ = window_of(rows_of(args))
        a_s = jnp.unpackbits(ps, axis=2, count=w_cap).astype(jnp.float32)
        a_c = jnp.unpackbits(pc, axis=2, count=w_cap).astype(jnp.bfloat16)
        s = jnp.einsum(
            "blw,bwc->blc", a_s, tw, preferred_element_type=jnp.float32
        )
        d = jnp.einsum(
            "blw,bwc->blc", a_c, (tw <= 0.0).astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return s.sum() + d.sum()

    def phase_d(args):
        from pharmaconet_tpu.scoring.leaf_tree import leaf2_scores_device

        scores, out_rows = leaf2_scores_device(
            rows_of(args), ends2, ps, pc, pw, conf, oends, w_cap=w_cap
        )
        return scores.sum() + out_rows.sum()

    args = (dt, gid, tab, aux)

    def measure(phase_fn, label):
        def make_unrolled(k):
            @jax.jit
            def f(a):
                total = jnp.float32(0)
                for i in range(k):
                    perturbed = (a[0] + jnp.float32(i) * 1e-6,) + a[1:]
                    total = total + phase_fn(perturbed)
                return total
            return f

        f8, f32 = make_unrolled(8), make_unrolled(32)
        _ = float(f8(args)); _ = float(f32(args))
        ests = []
        for _i in range(max(iters, 7)):
            t0 = time.time(); _ = float(f8(args)); t8 = time.time() - t0
            t0 = time.time(); _ = float(f32(args)); t32 = time.time() - t0
            ests.append(max((t32 - t8) / 24, 1e-9))
        ms = statistics.median(ests) * 1e3
        print(f"[probe] {label}: {ms:.2f} ms/batch", file=sys.stderr)
        return ms

    a = measure(phase_a, "A pair kernel")
    bb = measure(phase_b, "B + window gather")
    cc = measure(phase_c, "C + leaf einsums")
    d = measure(phase_d, "D full chain")
    print(
        f"[probe] deltas: gather {bb - a:.2f} ms, einsums {cc - bb:.2f} ms, "
        f"epilogue+outliers {d - cc:.2f} ms",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
