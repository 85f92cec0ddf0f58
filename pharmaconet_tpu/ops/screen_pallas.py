"""Pallas screening kernel: gather-free gaussian phase.

The XLA screening kernel (scoring/batch_screen.score_blocks_device) spends
~5.8 of 7.2 ms/batch in ONE gather — d_table[sub_slot], [NS] 16-byte rows at
~1 element/cycle (PERF_NOTES.md). This kernel removes the gather entirely:

  * each TILE-row chunk carries a tiny per-tile node-position table
    ([3C, NODE_CAP], built by scoring/screen_tiles.py)
  * node positions are selected with one-hot matmuls on the MXU
    (Precision.HIGHEST — one-hot selection of f32 values is exact; default
    bf16 passes would round the coordinates, the same catastrophic-
    cancellation trap the voxelizer documents)
  * conformer distances, the Gaussian likelihood terms, and the P-axis
    reduction all happen in VMEM registers; the only HBM traffic is the
    streaming read of the gaussian tables and the [2C, NS] result write.

The bounded segmented scans + fail logic stay in XLA (measured ~0.3 ms per
pass) inside the same jitted program; scan segments never cross padding
because the tiled layout only pads at ligand boundaries.

Measured on v5e-1 (2048-ligand batch, NS~1.07M): XLA kernel 7.03 ms -> this
pipeline ~2 ms (see PERF_NOTES.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scoring.screen_tiles import NODE_CAP, TILE

BLOCK_P = 8  # model-node pairs per sub-block (matches batch_screen.BLOCK_P)


def _gauss_phase(pos, packed, mu, inv, winv, *, c: int, tile: int, cap: int):
    """Shared gaussian phase (see _fused_body notes on the signed one-hot
    matmul and the sublane-packed [P*c, tile] layout). Returns stacked
    [2c, tile]: rows [0,c) scores, [c,2c) pass counts."""
    u = packed // cap
    v = packed % cap
    iota = jax.lax.broadcasted_iota(jnp.int32, (cap, tile), 0)
    oh = (iota == u[None, :]).astype(jnp.float32) - (
        iota == v[None, :]
    ).astype(jnp.float32)
    dvec = jnp.dot(pos, oh, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)  # [3c, tile]
    d2 = jnp.sum((dvec * dvec).reshape(c, 3, tile), axis=1)  # [c, tile]
    dt = jnp.sqrt(d2)
    return _gauss_phase_dt(dt, mu, inv, winv, c=c, tile=tile)


def _gauss_phase_dt(dt, mu, inv, winv, *, c: int, tile: int):
    """Gaussian phase from PRECOMPUTED conformer distances dt [c, tile]
    (the tile-store path: distances depend only on the ligand geometry
    and the model's pair enumeration — both fixed at prepack time, so the
    one-hot build + MXU select of _gauss_phase is pure re-computation
    there). Returns stacked [2c, tile]."""
    dt_b = jnp.concatenate([dt] * BLOCK_P, axis=0)  # [P*c, tile]
    mu_b = jnp.concatenate([mu[:, None, :]] * c, axis=1).reshape(BLOCK_P * c, tile)
    inv_b = jnp.concatenate([inv[:, None, :]] * c, axis=1).reshape(BLOCK_P * c, tile)
    winv_b = jnp.concatenate([winv[:, None, :]] * c, axis=1).reshape(BLOCK_P * c, tile)
    x = (dt_b - mu_b) * inv_b
    x2 = x * x
    valid = winv_b > 0.0
    term = jnp.where(valid, winv_b * jnp.exp(-0.5 * x2), 0.0)
    hit = jnp.where(valid & (x2 < 4.0), 1.0, 0.0)
    # two 3D P-sums + one concat: rows [0,c) scores, [c,2c) pass counts.
    # (A single stacked 4D reduce over [2,P,c,tile] measured ~0.3 ms/batch
    # SLOWER — Mosaic lowers the 4D strided reduce poorly.)
    scores = jnp.sum(term.reshape(BLOCK_P, c, tile), axis=0)
    npass = jnp.sum(hit.reshape(BLOCK_P, c, tile), axis=0)
    return jnp.concatenate([scores, npass], axis=0)


def _gauss_kernel(pos_ref, uv_ref, mu_ref, inv_ref, winv_ref, out_ref,
                  *, c: int, tile: int, cap: int):
    out_ref[:, :] = _gauss_phase(
        pos_ref[0], uv_ref[0, :], mu_ref[:, :], inv_ref[:, :], winv_ref[:, :],
        c=c, tile=tile, cap=cap,
    )


def gaussian_phase_pallas(
    pos_blocks: jax.Array,  # [T, 3C, cap]
    uv_packed: jax.Array,  # [1, NS]
    muT: jax.Array,  # [P, NS]
    invT: jax.Array,
    winvT: jax.Array,
    tile: int = TILE,
    cap: int = NODE_CAP,
    interpret: bool = False,
) -> jax.Array:
    """Returns stacked [2C, NS]: rows [0,C) sub_scores, [C,2C) sub_pass."""
    t, threec, _ = pos_blocks.shape
    c = threec // 3
    ns = muT.shape[1]
    assert ns == t * tile, (ns, t, tile)
    kernel = functools.partial(_gauss_kernel, c=c, tile=tile, cap=cap)
    grid_spec = pl.GridSpec(
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, threec, cap), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_P, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_P, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_P, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2 * c, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2 * c, ns), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(pos_blocks, uv_packed, muT, invT, winvT)


def _scan_bounded_tile(val, seen, depth: int, lanes):
    """Bounded segmented inclusive scan along the minor axis, in VMEM.

    val [R, tile] f32, seen [1, tile] f32 (1.0 = segment start), lanes
    [1, tile] i32 iota. Same recurrence as batch_screen._bounded_segmented_
    scan, with pad-shifts realized as pltpu.roll + edge masks (segments
    never cross tile edges — screen_tiles pair-aligns the layout)."""
    shift = 1
    for _ in range(depth):
        can = (lanes >= shift).astype(jnp.float32)  # [1, tile]
        m = can * (1.0 - seen)  # one combined [1, tile] row mask
        seen_s = jnp.maximum(pltpu.roll(seen, shift, axis=1) * can, 1.0 - can)
        val = val + pltpu.roll(val, shift, axis=1) * m
        seen = jnp.maximum(seen, seen_s)
        shift *= 2
    return val


def _fused_body(out_ref, pos, packed, mu, inv, winv, fb, fp, mninv, mnhalf,
                gate, thr, selff,
                *, c: int, tile: int, cap: int, depth1: int, depth2: int):
    """Gaussian phase + both bounded scans + fail logic, one VMEM pass.

    The XLA scan phase re-streams ~8 [C, NS] arrays through HBM (~1.3 ms of
    the 2.08 ms round-2 kernel); here every intermediate lives in VMEM and
    the only HBM traffic is the input tables and the [C, tile] result.
    All inputs are VALUES (loaded from refs by the kernel wrappers): mu/
    inv/winv [P, tile], the flag/annotation rows [1, tile] f32.

    Distance selection is ONE signed one-hot matmul: dvec = pos @ (oh_u -
    oh_v). Each column has two nonzeros (+1/-1); at Precision.HIGHEST the
    bf16 splits of each f32 position are exact, so the result differs from
    (pos@oh_u - pos@oh_v) by at most accumulation-order ulps — far inside
    the 2e-5 screening equality budget. The gaussian block then runs as
    sublane-packed [P*c, tile] ops (full 8-sublane vregs; the per-p [c,
    tile] loop at c=4 wasted half of every vector register)."""
    stacked = _gauss_phase(
        pos, packed, mu, inv, winv, c=c, tile=tile, cap=cap
    )
    _scan_fail_tail(out_ref, stacked, fb, fp, mninv, mnhalf, gate, thr,
                    selff, c=c, tile=tile, depth1=depth1, depth2=depth2)


def _scan_fail_tail(out_ref, stacked, fb, fp, mninv, mnhalf, gate, thr, selff,
                    *, c: int, tile: int, depth1: int, depth2: int):
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)

    # sub -> block (scores and pass counts share one stacked scan)
    sb = _scan_bounded_tile(stacked, fb, depth1, lanes)
    scan_s, scan_p = sb[:c], sb[c:]
    block_score = scan_s * mninv
    block_fail = jnp.where(scan_p < mnhalf, gate, 0.0)

    # block -> pair
    pb = _scan_bounded_tile(
        jnp.concatenate([block_score, block_fail], axis=0), fp, depth2, lanes
    )
    pair_score, pair_fail = pb[:c], pb[c:]
    failed = pair_fail > thr
    not_self = selff == 0.0
    out_ref[:, :] = jnp.where(failed & not_self, -1.0, pair_score)


def _fused_kernel(pos_ref, uv_ref, mu_ref, inv_ref, winv_ref, fb_ref, fp_ref,
                  mninv_ref, mnhalf_ref, gate_ref, thr_ref, self_ref, out_ref,
                  *, c: int, tile: int, cap: int, depth1: int, depth2: int):
    _fused_body(
        out_ref, pos_ref[0], uv_ref[0, :],
        mu_ref[:, :], inv_ref[:, :], winv_ref[:, :],
        fb_ref[0, :][None, :], fp_ref[0, :][None, :],
        mninv_ref[0, :][None, :], mnhalf_ref[0, :][None, :],
        gate_ref[0, :][None, :], thr_ref[0, :][None, :],
        self_ref[0, :][None, :],
        c=c, tile=tile, cap=cap, depth1=depth1, depth2=depth2,
    )


def _fused_kernel_v2(pos_ref, uv_ref, g_ref, aux_ref, out_ref,
                     *, c: int, tile: int, cap: int, depth1: int, depth2: int):
    """Tile-major variant of _fused_kernel: one gaussian-table block
    [3, P, tile] and one aux block [7, tile] per tile (the layout
    scoring/tiled_pack.py + native/pack_tiled.cpp emit directly).
    Blocks are loaded as values and sliced as values — Mosaic rejects
    width-1 sublane slices of VMEM refs but handles value slices."""
    g = g_ref[0]  # [3, P, tile]
    a = aux_ref[0]  # [7, tile]
    _fused_body(
        out_ref, pos_ref[0], uv_ref[0, 0, :],
        g[0], g[1], g[2],
        a[0:1, :], a[1:2, :], a[2:3, :], a[3:4, :], a[4:5, :], a[5:6, :],
        a[6:7, :],
        c=c, tile=tile, cap=cap, depth1=depth1, depth2=depth2,
    )


def _fused_kernel_dt(dt_ref, g_ref, aux_ref, out_ref,
                     *, c: int, tile: int, depth1: int, depth2: int):
    """Tile-store variant: conformer distances were precomputed at prepack
    time (scoring/screen_tiles.tile_distances), so the kernel skips the
    one-hot build + MXU select entirely — dt streams from HBM like the
    gaussian tables (~16 KB/tile vs ~0.7 ms/batch of VPU build cost)."""
    g = g_ref[0]  # [3, P, tile]
    a = aux_ref[0]  # [7, tile]
    stacked = _gauss_phase_dt(dt_ref[0], g[0], g[1], g[2], c=c, tile=tile)
    _scan_fail_tail(
        out_ref, stacked,
        a[0:1, :], a[1:2, :], a[2:3, :], a[3:4, :], a[4:5, :], a[5:6, :],
        a[6:7, :],
        c=c, tile=tile, depth1=depth1, depth2=depth2,
    )


@functools.partial(
    jax.jit, static_argnames=("depth1", "depth2", "tile", "interpret")
)
def score_tiles_fused_dt(
    dt: jax.Array,  # [T, C, tile] f32 precomputed conformer distances
    gtab: jax.Array,  # [T, 3, P, tile]
    aux: jax.Array,  # [T, 7, tile]
    depth1: int,
    depth2: int,
    tile: int = TILE,
    interpret: bool = False,
) -> jax.Array:
    """Fused screening program over the tile-major layout with prepack-time
    distances (tile store v2). Same output contract as score_tiles_fused."""
    t, c, _ = dt.shape
    ns = t * tile
    kernel = functools.partial(
        _fused_kernel_dt, c=c, tile=tile, depth1=depth1, depth2=depth2
    )
    grid_spec = pl.GridSpec(
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, c, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, BLOCK_P, tile), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 7, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((c, ns), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(dt, gtab, aux)


@functools.partial(
    jax.jit, static_argnames=("depth1", "depth2", "tile", "interpret")
)
def score_tiles_fused_dt_rows(
    dt: jax.Array,
    gtab: jax.Array,
    aux: jax.Array,
    depth1: int,
    depth2: int,
    tile: int = TILE,
    interpret: bool = False,
) -> jax.Array:
    """score_tiles_fused_dt transposed to [NST, C] (host pair compaction
    reads C-contiguous rows — see score_tiles_fused_rows)."""
    return score_tiles_fused_dt(
        dt, gtab, aux, depth1, depth2, tile=tile, interpret=interpret
    ).T


def _v3_kernel(dt_ref, gid_ref, tab_ref, aux_ref, out_ref,
               *, c: int, tile: int, mn_cap: int, g_cap: int, depth: int):
    """v3 block-major kernel (scoring/screen_v3.py layout): one row per
    ligand-node-pair block, model-node-pair (mn) axis in-kernel, gaussian
    parameters selected from a per-tile deduplicated group table with a
    one-hot matmul (exact at HIGHEST: single-term sums), block fail logic
    in-row, ONE pair-level bounded scan. Replaces the ~98 KB/tile gtab
    stream with a ~[G_CAP, R] table (~8 KB) + [1, tile] i32 ids."""
    dt = dt_ref[0]  # [c, tile]
    gid = gid_ref[0, 0, :]  # [tile] i32
    tab = tab_ref[0]  # [g_cap, r_pad]
    a = aux_ref[0]  # [3, tile]

    iota = jax.lax.broadcasted_iota(jnp.int32, (g_cap, tile), 0)
    oh = (iota == gid[None, :]).astype(jnp.float32)
    sel = jax.lax.dot_general(
        tab, oh, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [r_pad, tile]
    mu = sel[0:mn_cap]
    inv = sel[mn_cap : 2 * mn_cap]
    w2 = sel[2 * mn_cap : 3 * mn_cap]
    mnhalf = sel[3 * mn_cap : 3 * mn_cap + 1]  # [1, tile]

    # gaussian block, sublane-packed [mn_cap*c, tile] (the _gauss_phase_dt
    # pattern with the mn axis in place of BLOCK_P)
    dt_b = jnp.concatenate([dt] * mn_cap, axis=0)
    mu_b = jnp.concatenate([mu[:, None, :]] * c, axis=1).reshape(mn_cap * c, tile)
    inv_b = jnp.concatenate([inv[:, None, :]] * c, axis=1).reshape(mn_cap * c, tile)
    w2_b = jnp.concatenate([w2[:, None, :]] * c, axis=1).reshape(mn_cap * c, tile)
    x = (dt_b - mu_b) * inv_b
    x2 = x * x
    valid = w2_b > 0.0
    term = jnp.where(valid, w2_b * jnp.exp(-0.5 * x2), 0.0)
    hit = jnp.where(valid & (x2 < 4.0), 1.0, 0.0)
    score = jnp.sum(term.reshape(mn_cap, c, tile), axis=0)  # [c, tile]
    npass = jnp.sum(hit.reshape(mn_cap, c, tile), axis=0)

    selff = a[2:3]  # [1, tile]
    gate = 1.0 - selff  # fails only count on cross pairs
    block_fail = jnp.where(npass < mnhalf, gate, 0.0)  # [c, tile]

    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
    pb = _scan_bounded_tile(
        jnp.concatenate([score, block_fail], axis=0), a[0:1], depth, lanes
    )
    pair_score, pair_fail = pb[:c], pb[c:]
    failed = pair_fail > a[1:2]
    out_ref[:, :] = jnp.where(failed & (selff == 0.0), -1.0, pair_score)


@functools.partial(
    jax.jit, static_argnames=("depth", "mn_cap", "g_cap", "tile", "interpret")
)
def score_tiles_v3(
    dt: jax.Array,  # [T, c, tile] f32 per-block conformer distances
    gid: jax.Array,  # [T, tile] i32 group slot ids
    tab: jax.Array,  # [T, g_cap, r_pad] f32 group tables
    aux: jax.Array,  # [T, 3, tile] f32 (pair-start, thr, is_self)
    depth: int,
    mn_cap: int,
    g_cap: int,
    tile: int = TILE,
    interpret: bool = False,
) -> jax.Array:
    """Fused screening program over the v3 block-major layout. Returns the
    expanded [c, NBT] table: per-pair scores at pair-end rows (host
    compacts via V3Batch.pair_end_rows)."""
    t, c, _ = dt.shape
    nbt = t * tile
    r_pad = tab.shape[2]
    kernel = functools.partial(
        _v3_kernel, c=c, tile=tile, mn_cap=mn_cap, g_cap=g_cap, depth=depth
    )
    grid_spec = pl.GridSpec(
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, c, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g_cap, r_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((c, nbt), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(dt, gid.reshape(t, 1, tile), tab, aux)


@functools.partial(
    jax.jit, static_argnames=("depth", "mn_cap", "g_cap", "tile", "interpret")
)
def score_tiles_v3_pairs(
    dt: jax.Array,
    gid: jax.Array,
    tab: jax.Array,
    aux: jax.Array,
    ends: jax.Array,  # [NPpad] i32 pair-end rows, host-clipped to >= 0
    depth: int,
    mn_cap: int,
    g_cap: int,
    tile: int = TILE,
    interpret: bool = False,
) -> jax.Array:
    """v3 kernel + on-device pair compaction: returns the [NPpad, c] pair
    table gathered at the pair-end rows. The v3 group-sorted layout makes
    pair-end rows non-monotonic, so a host-side gather walks the full
    [NBT, c] table in random order (~23 ms/2048-batch measured on one
    core); gathering on device also shrinks the transfer ~2.3x."""
    rows = score_tiles_v3(
        dt, gid, tab, aux, depth, mn_cap, g_cap, tile=tile, interpret=interpret
    ).T  # [NBT, c]
    return jnp.take(rows, ends, axis=0)


@functools.partial(
    jax.jit, static_argnames=("depth", "mn_cap", "g_cap", "tile", "interpret")
)
def score_tiles_v3_rows(
    dt: jax.Array,
    gid: jax.Array,
    tab: jax.Array,
    aux: jax.Array,
    depth: int,
    mn_cap: int,
    g_cap: int,
    tile: int = TILE,
    interpret: bool = False,
) -> jax.Array:
    """score_tiles_v3 transposed to [NBT, c] (host pair compaction reads
    c-contiguous rows — see score_tiles_fused_rows)."""
    return score_tiles_v3(
        dt, gid, tab, aux, depth, mn_cap, g_cap, tile=tile, interpret=interpret
    ).T


@functools.partial(
    jax.jit, static_argnames=("depth1", "depth2", "tile", "cap", "interpret")
)
def score_tiles_fused(
    pos_blocks: jax.Array,  # [T, 3C, cap]
    uv: jax.Array,  # [T, tile] i32
    gtab: jax.Array,  # [T, 3, P, tile]
    aux: jax.Array,  # [T, 7, tile]
    depth1: int,
    depth2: int,
    tile: int = TILE,
    cap: int = NODE_CAP,
    interpret: bool = False,
) -> jax.Array:
    """Fused screening program over the tile-major layout. Returns the
    expanded [C, NST] table (same contract as score_blocks_pallas)."""
    t, threec, _ = pos_blocks.shape
    c = threec // 3
    ns = t * tile
    kernel = functools.partial(
        _fused_kernel_v2, c=c, tile=tile, cap=cap, depth1=depth1, depth2=depth2
    )
    grid_spec = pl.GridSpec(
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, threec, cap), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            # [T, 1, tile] view: a (1, 1, tile) block satisfies the Mosaic
            # tiling rule (second-minor block dim equals the array dim)
            pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, BLOCK_P, tile), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 7, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((c, ns), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(pos_blocks, uv.reshape(t, 1, tile), gtab, aux)


@functools.partial(
    jax.jit, static_argnames=("depth1", "depth2", "tile", "cap", "interpret")
)
def score_blocks_pallas_fused(
    pos_blocks: jax.Array,
    uv_packed: jax.Array,
    muT: jax.Array,
    invT: jax.Array,
    winvT: jax.Array,
    flags_block: jax.Array,
    flags_pair: jax.Array,
    end_mn_inv: jax.Array,
    end_mn_half: jax.Array,
    end_fail_gate: jax.Array,
    thr_ns: jax.Array,
    self_ns: jax.Array,
    depth1: int,
    depth2: int,
    tile: int = TILE,
    cap: int = NODE_CAP,
    interpret: bool = False,
) -> jax.Array:
    """Single-kernel screening table program (same contract as
    score_blocks_pallas). Requires the pair-aligned tiled layout."""
    t, threec, _ = pos_blocks.shape
    c = threec // 3
    ns = muT.shape[1]
    assert ns == t * tile, (ns, t, tile)
    row = lambda a: a.astype(jnp.float32).reshape(1, ns)
    kernel = functools.partial(
        _fused_kernel, c=c, tile=tile, cap=cap, depth1=depth1, depth2=depth2
    )
    row_spec = pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    grid_spec = pl.GridSpec(
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, threec, cap), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            row_spec,
            pl.BlockSpec((BLOCK_P, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_P, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_P, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            row_spec, row_spec, row_spec, row_spec, row_spec, row_spec, row_spec,
        ],
        out_specs=pl.BlockSpec((c, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((c, ns), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        pos_blocks, uv_packed, muT, invT, winvT,
        row(flags_block), row(flags_pair), row(end_mn_inv), row(end_mn_half),
        row(end_fail_gate), row(thr_ns), row(self_ns),
    )


@functools.partial(
    jax.jit, static_argnames=("depth1", "depth2", "tile", "cap", "interpret")
)
def score_blocks_pallas(
    pos_blocks: jax.Array,
    uv_packed: jax.Array,
    muT: jax.Array,
    invT: jax.Array,
    winvT: jax.Array,
    flags_block: jax.Array,
    flags_pair: jax.Array,
    end_mn_inv: jax.Array,
    end_mn_half: jax.Array,
    end_fail_gate: jax.Array,
    thr_ns: jax.Array,
    self_ns: jax.Array,
    depth1: int,
    depth2: int,
    tile: int = TILE,
    cap: int = NODE_CAP,
    interpret: bool = False,
) -> jax.Array:
    """Full screening table program: pallas gaussian phase + XLA bounded
    scans + fail logic. Returns the expanded [C, NS] table (same contract
    as batch_screen.score_blocks_device: per-pair scores at pair-end rows,
    host compacts)."""
    from ..scoring.batch_screen import _bounded_segmented_scan

    c = pos_blocks.shape[1] // 3
    sp = gaussian_phase_pallas(
        pos_blocks, uv_packed, muT, invT, winvT, tile=tile, cap=cap,
        interpret=interpret,
    )
    sub_scores = sp[0:c]
    sub_pass = sp[c : 2 * c]
    scan_s = _bounded_segmented_scan(sub_scores, flags_block, depth1)
    scan_p = _bounded_segmented_scan(sub_pass, flags_block, depth1)
    block_score_ns = scan_s * end_mn_inv[None, :]
    block_fail_ns = jnp.where(
        (scan_p < end_mn_half[None, :]), end_fail_gate[None, :], 0.0
    )
    pair_score_ns = _bounded_segmented_scan(block_score_ns, flags_pair, depth2)
    pair_fail_ns = _bounded_segmented_scan(block_fail_ns, flags_pair, depth2)
    failed = pair_fail_ns > thr_ns[None, :]
    return jnp.where(failed & (~self_ns[None, :]), -1.0, pair_score_ns)


@functools.partial(
    jax.jit, static_argnames=("depth1", "depth2", "tile", "cap", "interpret")
)
def score_tiles_fused_rows(
    pos_blocks: jax.Array,
    uv: jax.Array,
    gtab: jax.Array,
    aux: jax.Array,
    depth1: int,
    depth2: int,
    tile: int = TILE,
    cap: int = NODE_CAP,
    interpret: bool = False,
) -> jax.Array:
    """score_tiles_fused transposed to [NST, C] on the device, so the host's
    pair compaction (pair_end_rows are ascending by construction) reads
    C-contiguous 16-byte rows sequentially instead of striding four 8 MB
    conformer rows (~80 ms -> ~5 ms/batch on one core)."""
    expanded = score_tiles_fused(
        pos_blocks, uv, gtab, aux, depth1, depth2,
        tile=tile, cap=cap, interpret=interpret,
    )
    return expanded.T
