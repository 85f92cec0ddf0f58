"""TPU probe: Pallas strategies for the screening gaussian phase.

Variants (all produce sub_scores/sub_pass [C, NS] consumed by the existing
XLA scan phase):
  A. current XLA kernel (baseline, full pipeline)
  B. pallas-gather: d_table [NU, C] VMEM-resident, per-tile row gather
  C. pallas-onehot: per-tile node tables, distances reconstructed via
     one-hot matmuls on the MXU (no gather anywhere)

Timing: marginal unroll (t16 - t8)/8, median of 3, scalar readback.
"""

from __future__ import annotations

import functools
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import make_synthetic_ligands, make_synthetic_model
from pharmaconet_tpu.scoring.batch_screen import (
    BLOCK_P,
    BatchScreener,
    _bounded_segmented_scan,
    build_batch,
    score_blocks_device,
    unique_distance_table,
)

TILE = 1024
NODE_CAP = 64

print(f"device: {jax.devices()[0]}", flush=True)

B = 2048
model = make_synthetic_model()
screener = BatchScreener(model)
ligands = make_synthetic_ligands(B)
batch = build_batch(screener.packed_model, ligands)
args, (d1, d2) = screener.device_args(batch)
ns = args[1].shape[1]
ns_real = len(batch.sub_d_idx)
print(f"ns_real={ns_real} ns_pad={ns} d1={d1} d2={d2}", flush=True)

(node_pos_j, muT_j, invT_j, winvT_j, pair_u_j, pair_v_j, sub_slot_j,
 flags_block_j, flags_pair_j, end_mn_inv_j, end_mn_half_j, end_fail_gate_j,
 thr_ns_j, self_ns_j) = args

# pad NS up to a TILE multiple for the pallas variants
ns_t = ((ns + TILE - 1) // TILE) * TILE
T = ns_t // TILE
C = node_pos_j.shape[2]
ln = batch.ln


def pad_cols(a, width, value=0.0):
    a = np.asarray(a)
    if a.shape[-1] >= width:
        return a
    pad = [(0, 0)] * (a.ndim - 1) + [(0, width - a.shape[-1])]
    return np.pad(a, pad, constant_values=value)


muT = pad_cols(muT_j, ns_t)
invT = pad_cols(invT_j, ns_t, 1.0)
winvT = pad_cols(winvT_j, ns_t, 0.0)

# ---------------------------------------------------------------------------
# scan phase (shared by B and C) — operates on [C, ns] slices
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("depth1", "depth2", "ns"))
def scan_phase(sp, flags_block, flags_pair, end_mn_inv, end_mn_half,
               end_fail_gate, thr_ns, self_ns, depth1, depth2, ns):
    sub_scores = sp[0:4, :ns]
    sub_pass = sp[4:8, :ns]
    scan_s = _bounded_segmented_scan(sub_scores, flags_block, depth1)
    scan_p = _bounded_segmented_scan(sub_pass, flags_block, depth1)
    block_score_ns = scan_s * end_mn_inv[None, :]
    block_fail_ns = jnp.where((scan_p < end_mn_half[None, :]), end_fail_gate[None, :], 0.0)
    pair_score_ns = _bounded_segmented_scan(block_score_ns, flags_pair, depth2)
    pair_fail_ns = _bounded_segmented_scan(block_fail_ns, flags_pair, depth2)
    failed = pair_fail_ns > thr_ns[None, :]
    return jnp.where(failed & (~self_ns[None, :]), -1.0, pair_score_ns)


# ---------------------------------------------------------------------------
# Variant B: pallas gather from VMEM-resident d_table
# ---------------------------------------------------------------------------
pair_u, pair_v, sub_slot = unique_distance_table(batch)
nu = len(pair_u)
nu_pad = ((nu + 7) // 8) * 8
print(f"NU={nu} ({nu * C * 4 / 1e6:.1f} MB d_table)", flush=True)
slot_rows = np.zeros((8, ns_t), np.int32)
slot_rows[0, :ns_real] = sub_slot


def gather_kernel(d_ref, slot_ref, mu_ref, inv_ref, winv_ref, out_ref):
    slots = slot_ref[0, :]
    d_rows = d_ref[slots, :]  # [TILE, C] gather
    dT = d_rows.T  # [C, TILE]
    scores = jnp.zeros((4, TILE), jnp.float32)
    npass = jnp.zeros((4, TILE), jnp.float32)
    for p in range(BLOCK_P):
        x = (dT - mu_ref[p, :][None, :]) * inv_ref[p, :][None, :]
        x2 = x * x
        w = winv_ref[p, :][None, :]
        valid = w > 0.0
        scores = scores + jnp.where(valid, w * jnp.exp(-0.5 * x2), 0.0)
        npass = npass + jnp.where(valid & (x2 < 4.0), 1.0, 0.0)
    out_ref[0:4, :] = scores
    out_ref[4:8, :] = npass


def make_gather_fn():
    grid_spec = pl.GridSpec(
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # d_table, full
            pl.BlockSpec((8, TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_P, TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_P, TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_P, TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
    )

    @jax.jit
    def f(d_table, slot_rows, mu, inv, winv):
        return pl.pallas_call(
            gather_kernel,
            out_shape=jax.ShapeDtypeStruct((8, ns_t), jnp.float32),
            grid_spec=grid_spec,
        )(d_table, slot_rows, mu, inv, winv)

    return f


# ---------------------------------------------------------------------------
# Variant C: one-hot distance reconstruction
# ---------------------------------------------------------------------------
li = batch.sub_d_idx // (ln * ln)
rem = batch.sub_d_idx % (ln * ln)
gu = (li * ln + rem // ln).astype(np.int64)
gv = (li * ln + rem % ln).astype(np.int64)
gu_p = np.zeros(ns_t, np.int64)
gv_p = np.zeros(ns_t, np.int64)
gu_p[:ns_real] = gu
gv_p[:ns_real] = gv

t0 = time.time()
tile_nodes = np.zeros((T, NODE_CAP), np.int64)
u_loc = np.zeros((T, TILE), np.int32)
v_loc = np.zeros((T, TILE), np.int32)
max_union = 0
overflow = 0
for t in range(T):
    sl = slice(t * TILE, (t + 1) * TILE)
    nodes = np.unique(np.concatenate([gu_p[sl], gv_p[sl]]))
    max_union = max(max_union, len(nodes))
    if len(nodes) > NODE_CAP:
        overflow += 1
        nodes = nodes[:NODE_CAP]
    tile_nodes[t, : len(nodes)] = nodes
    u_loc[t] = np.clip(np.searchsorted(nodes, gu_p[sl]), 0, NODE_CAP - 1)
    v_loc[t] = np.clip(np.searchsorted(nodes, gv_p[sl]), 0, NODE_CAP - 1)
print(
    f"tiles={T} max_union={max_union} overflow={overflow} "
    f"tile-prep={time.time() - t0:.2f}s",
    flush=True,
)

pos_flat = np.asarray(node_pos_j).reshape(-1, C * 3)  # [B*Ln, C*3] c-major
pos_blocks = pos_flat[tile_nodes]  # [T, 64, 12]
pos_blocks = np.ascontiguousarray(np.transpose(pos_blocks, (0, 2, 1)))  # [T, 12, 64]
uv_rows = np.zeros((8, ns_t), np.int32)
uv_rows[0] = u_loc.reshape(-1)
uv_rows[1] = v_loc.reshape(-1)


def onehot_kernel(pos_ref, uv_ref, mu_ref, inv_ref, winv_ref, out_ref):
    u = uv_ref[0, :]
    v = uv_ref[1, :]
    iota = jax.lax.broadcasted_iota(jnp.int32, (NODE_CAP, TILE), 0)
    oh_u = (iota == u[None, :]).astype(jnp.float32)
    oh_v = (iota == v[None, :]).astype(jnp.float32)
    pos = pos_ref[0]  # [12, 64]
    # HIGHEST: bf16 MXU passes would round the positions before the
    # one-hot selection (same trap as the voxelizer's matmul-distance
    # form) — with full precision the selection is EXACT
    pu = jnp.dot(pos, oh_u, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)  # [12, TILE]
    pv = jnp.dot(pos, oh_v, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    dvec = pu - pv
    d2 = jnp.sum((dvec * dvec).reshape(4, 3, TILE), axis=1)  # [C, TILE]
    dT = jnp.sqrt(d2)
    scores = jnp.zeros((4, TILE), jnp.float32)
    npass = jnp.zeros((4, TILE), jnp.float32)
    for p in range(BLOCK_P):
        x = (dT - mu_ref[p, :][None, :]) * inv_ref[p, :][None, :]
        x2 = x * x
        w = winv_ref[p, :][None, :]
        valid = w > 0.0
        scores = scores + jnp.where(valid, w * jnp.exp(-0.5 * x2), 0.0)
        npass = npass + jnp.where(valid & (x2 < 4.0), 1.0, 0.0)
    out_ref[0:4, :] = scores
    out_ref[4:8, :] = npass


def make_onehot_fn():
    grid_spec = pl.GridSpec(
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 12, NODE_CAP), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_P, TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_P, TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_P, TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
    )

    @jax.jit
    def f(pos_blocks, uv_rows, mu, inv, winv):
        return pl.pallas_call(
            onehot_kernel,
            out_shape=jax.ShapeDtypeStruct((8, ns_t), jnp.float32),
            grid_spec=grid_spec,
        )(pos_blocks, uv_rows, mu, inv, winv)

    return f


# ---------------------------------------------------------------------------
# Correctness vs the XLA kernel
# ---------------------------------------------------------------------------
ref_out = np.asarray(score_blocks_device(*args, depth1=d1, depth2=d2))  # [C, ns]

scan_args = (
    np.asarray(flags_block_j), np.asarray(flags_pair_j), np.asarray(end_mn_inv_j),
    np.asarray(end_mn_half_j), np.asarray(end_fail_gate_j), np.asarray(thr_ns_j),
    np.asarray(self_ns_j),
)
scan_args_j = tuple(jnp.asarray(a) for a in scan_args)

results = {}

# variant B correctness
try:
    gather_fn = make_gather_fn()
    d_table_np = np.zeros((nu_pad, C), np.float32)
    pos_all = np.asarray(node_pos_j).reshape(-1, C, 3)
    d_table_np[:nu] = np.linalg.norm(pos_all[pair_u] - pos_all[pair_v], axis=-1)
    sp_b = gather_fn(jnp.asarray(d_table_np), jnp.asarray(slot_rows),
                     jnp.asarray(muT), jnp.asarray(invT), jnp.asarray(winvT))
    out_b = np.asarray(scan_phase(sp_b, *scan_args_j, depth1=d1, depth2=d2, ns=ns))
    diff_b = np.max(np.abs(out_b - ref_out))
    print(f"variant B (pallas gather): max diff vs XLA = {diff_b:.2e}", flush=True)
    results["B_ok"] = diff_b < 1e-3
except Exception as e:  # noqa: BLE001
    print(f"variant B FAILED: {type(e).__name__}: {str(e)[:500]}", flush=True)
    results["B_ok"] = False

# variant C correctness
try:
    onehot_fn = make_onehot_fn()
    sp_c = onehot_fn(jnp.asarray(pos_blocks), jnp.asarray(uv_rows),
                     jnp.asarray(muT), jnp.asarray(invT), jnp.asarray(winvT))
    out_c = np.asarray(scan_phase(sp_c, *scan_args_j, depth1=d1, depth2=d2, ns=ns))
    diff_c = np.max(np.abs(out_c - ref_out))
    print(f"variant C (pallas onehot): max diff vs XLA = {diff_c:.2e}", flush=True)
    results["C_ok"] = diff_c < 1e-3
except Exception as e:  # noqa: BLE001
    print(f"variant C FAILED: {type(e).__name__}: {str(e)[:500]}", flush=True)
    results["C_ok"] = False


# ---------------------------------------------------------------------------
# Timing (marginal unroll)
# ---------------------------------------------------------------------------
def measure(make_f, inputs, label):
    def make_unrolled(k):
        @jax.jit
        def f(inputs):
            total = jnp.float32(0)
            for i in range(k):
                perturbed = (inputs[0] + jnp.float32(i) * 1e-6,) + tuple(inputs[1:])
                out = make_f(perturbed)
                total = total + out.sum()
            return total
        return f

    f8, f16 = make_unrolled(8), make_unrolled(16)
    _ = float(f8(inputs))
    _ = float(f16(inputs))
    est = []
    for _ in range(3):
        t0 = time.time()
        outs = [f8(inputs) for _ in range(5)]
        _ = [float(o) for o in outs]
        t8 = (time.time() - t0) / 5
        t0 = time.time()
        outs = [f16(inputs) for _ in range(5)]
        _ = [float(o) for o in outs]
        t16 = (time.time() - t0) / 5
        est.append(max((t16 - t8) / 8, 1e-9))
    per = statistics.median(est)
    print(f"{label}: {per * 1e3:.2f} ms/batch -> {B / per:,.0f} lig/s", flush=True)
    return per


# A: current XLA kernel
def xla_full(a):
    return score_blocks_device(*a, depth1=d1, depth2=d2)

if not os.environ.get("SKIP_A"):
    measure(xla_full, args, "A xla-full")

if results.get("B_ok"):
    def b_full(a):
        sp = gather_fn(a[0], a[1], a[2], a[3], a[4])
        return scan_phase(sp, *scan_args_j, depth1=d1, depth2=d2, ns=ns)
    b_inputs = (jnp.asarray(d_table_np), jnp.asarray(slot_rows),
                jnp.asarray(muT), jnp.asarray(invT), jnp.asarray(winvT))
    measure(b_full, b_inputs, "B pallas-gather full")

if results.get("C_ok"):
    def c_full(a):
        sp = onehot_fn(a[0], a[1], a[2], a[3], a[4])
        return scan_phase(sp, *scan_args_j, depth1=d1, depth2=d2, ns=ns)
    c_inputs = (jnp.asarray(pos_blocks).astype(jnp.float32), jnp.asarray(uv_rows),
                jnp.asarray(muT), jnp.asarray(invT), jnp.asarray(winvT))
    measure(c_full, c_inputs, "C pallas-onehot full")

    # gaussian phase alone (to see the scan share)
    def c_gauss(a):
        return onehot_fn(a[0], a[1], a[2], a[3], a[4])
    measure(c_gauss, c_inputs, "C pallas-onehot gauss-only")

    def scans_only(a):
        return scan_phase(a[0], *scan_args_j, depth1=d1, depth2=d2, ns=ns)
    sp_c_dev = onehot_fn(*c_inputs)
    measure(scans_only, (sp_c_dev,), "scan phase only")

print("done", flush=True)
