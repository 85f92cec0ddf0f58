"""Can the leaf window gather (rows_z[ends2], ~1M slots) go faster in XLA?

probe_leaf_phases attributes 6.26 of the 7.7 ms leaf chain to this one
take. Variants tried here, all producing the same [B, W, C] window:

  g0  baseline rows_z[ends2]
  g1  transposed table: rows_zT[:, ends2] (lane-axis gather)
  g2  component-wise: C separate 1-D gathers
  g3  real-slots-only gather (458k) + static scatter into the padded window
  g4  sorted (monotone) gather + inverse permutation gather
  g5  one_hot matmul windowing per source-chunk (MXU gather), chunk=64k

Also prints the blocks/pairs-per-ligand distribution of the bench pool —
the sizing input for a ligand-slab (gather-free) layout.

Usage: python probes/probe_gather_variants.py [batch_size] [iters]
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
from pharmaconet_tpu.scoring.batch_screen import BatchScreener
from pharmaconet_tpu.scoring.tiled_store import TiledStore, write_v3_store


def main() -> None:
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 7

    model = make_synthetic_model(seed=0)
    screener = BatchScreener(model, engine="xla")
    ligands = make_synthetic_ligands(batch_size, seed=1)

    # distribution: blocks + pairs per ligand (slab sizing)
    from pharmaconet_tpu.scoring.batch_screen import build_batch
    vb = screener.build_vb(build_batch(screener.packed_model, ligands))
    blk_pair = vb.pair_meta[:, 0] if vb.pair_meta.ndim > 1 else None
    pair_of_lig = np.zeros(len(vb.pair_threshold), np.int64)
    for li, (s, e) in enumerate(vb.pair_slices):
        pair_of_lig[s:e] = li
    # blocks per pair from pair_end_rows deltas is not recoverable directly;
    # count real pairs + nonempty pairs per ligand
    n_lig = len(vb.pair_slices)
    pairs_per = np.array([e - s for s, e in vb.pair_slices])
    nonempty = vb.pair_end_rows >= 0
    ne_per = np.bincount(pair_of_lig[nonempty], minlength=n_lig)
    for q in (50, 90, 97, 99, 100):
        print(
            f"[dist] q{q}: pairs={np.percentile(pairs_per, q):.0f} "
            f"nonempty={np.percentile(ne_per, q):.0f}",
            file=sys.stderr,
        )

    tmp = tempfile.mkdtemp(prefix="probe_gv_")
    write_v3_store(
        tmp, screener.packed_model, ligands,
        [f"l{i}" for i in range(batch_size)],
        batch_size=batch_size, verbose=False,
    )
    sb = TiledStore(tmp, screener.packed_model).load(0)
    b, w_cap = sb.leaf2_pw.shape
    nbt = sb.dt.shape[0] * sb.dt.shape[2]
    c = sb.dt.shape[1]
    ends2 = np.asarray(sb.leaf2_ends)
    print(f"[probe] B={b} W={w_cap} NBT~{nbt} C={c}", file=sys.stderr)

    rng = np.random.default_rng(0)
    rows_np = rng.standard_normal((nbt + 1, c)).astype(np.float32)
    rows = jnp.asarray(rows_np)
    rowsT = jnp.asarray(rows_np.T.copy())
    e2 = jnp.asarray(ends2)

    real = ends2 != nbt  # sentinel slot id == appended zero row
    real_idx = np.nonzero(real)[0].astype(np.int32)
    real_src = ends2[real].astype(np.int32)
    print(
        f"[probe] real slots {real.sum()} / {len(ends2)}", file=sys.stderr
    )
    sort_perm = np.argsort(real_src, kind="stable").astype(np.int32)
    src_sorted = real_src[sort_perm]
    # pad real-slot arrays to a lane multiple
    npad = ((len(real_idx) + 127) // 128) * 128
    real_idx_p = np.pad(real_idx, (0, npad - len(real_idx)))
    real_src_p = np.pad(real_src, (0, npad - len(real_src)),
                        constant_values=nbt)
    src_sorted_p = np.pad(src_sorted, (0, npad - len(src_sorted)),
                          constant_values=nbt)
    inv_p = np.pad(sort_perm, (0, npad - len(sort_perm)))

    j_real = jnp.asarray(real_src_p)
    j_slot = jnp.asarray(real_idx_p)
    j_sorted = jnp.asarray(src_sorted_p)
    j_inv = jnp.asarray(inv_p)

    def g0(r):
        return r[e2].reshape(b, w_cap, c)

    def g1(rT):
        return rT[:, e2].reshape(c, b, w_cap).transpose(1, 2, 0)

    def g2(r):
        cols = [r[:, i][e2] for i in range(c)]
        return jnp.stack(cols, axis=-1).reshape(b, w_cap, c)

    def g3(r):
        vals = r[j_real]  # [npad, c]
        out = jnp.zeros((b * w_cap, c), r.dtype)
        return out.at[j_slot].set(vals, mode="drop").reshape(b, w_cap, c)

    def g4(r):
        vals = r[j_sorted]  # monotone gather
        vals = vals[j_inv]  # small unsort (random, npad)
        out = jnp.zeros((b * w_cap, c), r.dtype)
        return out.at[j_slot].set(vals, mode="drop").reshape(b, w_cap, c)

    variants = [("g0 baseline", g0, rows), ("g1 laneT", g1, rowsT),
                ("g2 per-comp", g2, rows), ("g3 real-only", g3, rows),
                ("g4 monotone", g4, rows)]

    for label, fn, arg in variants:
        def make(k, fn=fn):
            @jax.jit
            def f(a):
                tot = jnp.float32(0)
                for i in range(k):
                    tot = tot + fn(a + jnp.float32(i) * 1e-6).sum()
                return tot
            return f

        f4, f16 = make(4), make(16)
        try:
            _ = float(f4(arg)); _ = float(f16(arg))
        except Exception as exc:  # lowering failure on this backend
            print(f"[probe] {label}: FAILED {exc}", file=sys.stderr)
            continue
        ests = []
        for _ in range(iters):
            t0 = time.time(); float(f4(arg)); t4 = time.time() - t0
            t0 = time.time(); float(f16(arg)); t16 = time.time() - t0
            ests.append(max((t16 - t4) / 12, 1e-9))
        print(
            f"[probe] {label}: {statistics.median(ests) * 1e3:.2f} ms/batch",
            file=sys.stderr,
        )

    granule_variant(rows_np, ends2, b, w_cap, c, nbt, iters)





def granule_variant(rows_np, ends2, b, w_cap, c, nbt, iters):
    """g5: gather 8-row granules (idx>>3), select idx&7 in-register."""
    import statistics, time
    n8 = (nbt + 1 + 7) // 8
    r8 = np.zeros((n8 * 8, c), np.float32)
    r8[: nbt + 1] = rows_np
    r8 = r8.reshape(n8, 8 * c)
    j8 = jnp.asarray((ends2 >> 3).astype(np.int32))
    jm = jnp.asarray((ends2 & 7).astype(np.int32))
    tbl = jnp.asarray(r8)

    def g5(t):
        f = t[j8].reshape(-1, 8, c)  # [BW, 8, C]
        sel = (jnp.arange(8, dtype=jnp.int32)[None, :] == jm[:, None])
        return (f * sel[:, :, None]).sum(axis=1).reshape(b, w_cap, c)

    def make(k):
        @jax.jit
        def f(t):
            tot = jnp.float32(0)
            for i in range(k):
                tot = tot + g5(t + jnp.float32(i) * 1e-6).sum()
            return tot
        return f

    f4, f16 = make(4), make(16)
    _ = float(f4(tbl)); _ = float(f16(tbl))
    ests = []
    for _ in range(iters):
        t0 = time.time(); float(f4(tbl)); t4 = time.time() - t0
        t0 = time.time(); float(f16(tbl)); t16 = time.time() - t0
        ests.append(max((t16 - t4) / 12, 1e-9))
    print(f"[probe] g5 granule8: {statistics.median(ests)*1e3:.2f} ms/batch",
          file=sys.stderr)


if __name__ == "__main__":
    main()
