"""Native host runtime: C++ screening block packer (ctypes binding).

Compiled lazily with g++ on first use and cached next to the source; all
callers fall back to the pure-Python packer when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

logger = logging.getLogger("pharmaconet_tpu.native")

_DIR = Path(__file__).parent
_state: dict[str, object] = {}


def _load(name: str, src: str, lib: str, extra_flags: tuple[str, ...] = ()):
    """Compile (if stale) and load a native library; None on failure."""
    if name in _state:
        return _state[name]
    src_path, lib_path = _DIR / src, _DIR / lib
    if not lib_path.exists() or lib_path.stat().st_mtime < src_path.stat().st_mtime:
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", *extra_flags,
               str(src_path), "-o", str(lib_path)]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (subprocess.SubprocessError, FileNotFoundError) as e:
            logger.warning("native build of %s failed: %s", name, e)
            _state[name] = None
            return None
    try:
        handle = ctypes.CDLL(str(lib_path))
    except OSError as e:
        logger.warning("native load of %s failed: %s", name, e)
        _state[name] = None
        return None
    _state[name] = handle
    return handle


def get_block_packer():
    """Returns the ctypes build_blocks symbol, or None if unavailable."""
    lib = _load("block_packer", "block_packer.cpp", "libblockpacker.so")
    if lib is None:
        return None
    if hasattr(lib.build_blocks, "_configured"):
        return lib.build_blocks

    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.build_blocks.restype = ctypes.c_int32
    lib.build_blocks.argtypes = [
        ctypes.c_int32, ctypes.c_int32,  # M, Mn
        i32p, i32p, f32p, f32p, f32p,  # ct_offsets, ct_nodes, mu, std, weight
        ctypes.c_int32, ctypes.c_int32,  # B, ln
        i32p, i32p, i32p,  # lig_cluster_offsets, cluster_node_offsets, cluster_nodes
        i32p, i32p,  # node_mask_offsets, node_masks
        i32p, i32p,  # active_offsets, active
        i32p, i32p,  # cand_offsets, cands
        ctypes.c_int32,  # P
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,  # caps
        f32p, f32p, f32p, i32p, i32p,  # sub arrays
        i32p, i32p, i32p,  # block arrays
        f32p, i32p,  # pair arrays
        i64p, i64p,  # pair_slices, out_counts
    ]
    lib.build_blocks._configured = True
    return lib.build_blocks


def get_prep_args():
    """Returns the ctypes prep_args symbol, or None if unavailable."""
    lib = _load("prep_args", "prep_args.cpp", "libprepargs.so")
    if lib is None:
        return None
    if not hasattr(lib.prep_args, "_configured"):
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        boolp = np.ctypeslib.ndpointer(np.bool_, flags="C_CONTIGUOUS")
        lib.prep_args.restype = ctypes.c_int32
        lib.prep_args.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,  # ns_real, ns, nb, np
            ctypes.c_int32,  # P
            f32p, f32p, f32p,  # sub_mu, sub_std, sub_w
            i32p, i32p, i32p, i32p,  # sub_block, block_pair, block_mn, block_cross
            f32p, i32p,  # pair_threshold, pair_self
            f32p, f32p, f32p,  # muT, invT, winvT
            boolp, boolp,  # flags_block, flags_pair
            f32p, f32p, f32p,  # end_mn_inv, end_mn_half, end_fail_gate
            f32p, boolp,  # thr_ns, self_ns
            i64p,  # out_max
        ]
        lib.prep_args._configured = True
    return lib.prep_args


def get_prune_pairs():
    """Returns the ctypes prune_pairs symbol, or None if unavailable."""
    lib = _load("prep_args", "prep_args.cpp", "libprepargs.so")
    if lib is None:
        return None
    if not hasattr(lib.prune_pairs, "_configured"):
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        boolp = np.ctypeslib.ndpointer(np.bool_, flags="C_CONTIGUOUS")
        lib.prune_pairs.restype = None
        lib.prune_pairs.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,  # np, cmax, lmax
            i32p,  # pair_meta
            f32p, f32p,  # lig_center, lig_size
            f32p, f32p,  # model_center, model_size
            boolp,  # pruned
        ]
        lib.prune_pairs._configured = True
    return lib.prune_pairs


def get_match_dfs():
    """Returns the ctypes match_dfs symbol, or None if unavailable."""
    lib = _load("match_dfs", "match_dfs.cpp", "libmatchdfs.so",
                extra_flags=("-pthread",))
    if lib is None:
        return None
    if not hasattr(lib.match_dfs, "_configured"):
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.match_dfs.restype = None
        lib.match_dfs.argtypes = [
            ctypes.c_int32,  # num_ligands
            f32p, ctypes.c_int64,  # table, cmax
            i64p, i32p,  # pair_starts, conformers
            i32p, i32p,  # active_offsets, cand_counts
            f32p,  # out_scores
        ]
        lib.match_dfs._configured = True
    return lib.match_dfs


def get_match_dfs_mt():
    """Returns the ctypes match_dfs_mt symbol (thread-sharded assignment
    DFS; per-ligand searches are independent, so any thread count is
    score-identical), or None if unavailable."""
    lib = _load("match_dfs", "match_dfs.cpp", "libmatchdfs.so",
                extra_flags=("-pthread",))
    if lib is None or not hasattr(lib, "match_dfs_mt"):
        return None
    if not hasattr(lib.match_dfs_mt, "_configured"):
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.match_dfs_mt.restype = None
        lib.match_dfs_mt.argtypes = [
            ctypes.c_int32,  # num_ligands
            f32p, ctypes.c_int64,  # table, cmax
            i64p, i32p,  # pair_starts, conformers
            i32p, i32p,  # active_offsets, cand_counts
            f32p,  # out_scores
            ctypes.c_int32,  # threads
        ]
        lib.match_dfs_mt._configured = True
    return lib.match_dfs_mt


def get_match_dfs_leaves():
    """Returns the ctypes match_dfs_leaves symbol (gated-tree leaf
    enumeration for prepack-time baking), or None if unavailable."""
    lib = _load("match_dfs", "match_dfs.cpp", "libmatchdfs.so",
                extra_flags=("-pthread",))
    if lib is None or not hasattr(lib, "match_dfs_leaves"):
        return None
    if not hasattr(lib.match_dfs_leaves, "_configured"):
        i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.match_dfs_leaves.restype = ctypes.c_int64
        lib.match_dfs_leaves.argtypes = [
            ctypes.c_int32,  # num_ligands
            f32p, ctypes.c_int64,  # table, cmax
            i64p, i32p,  # pair_starts, conformers
            i32p, i32p,  # active_offsets, cand_counts
            ctypes.c_int32, ctypes.c_int64,  # lmax, capacity
            i8p, i64p,  # assign_out, leaf_offsets
        ]
        lib.match_dfs_leaves._configured = True
    return lib.match_dfs_leaves


def get_smi2graph():
    """Returns the ctypes smi2graph_batch symbol, or None if unavailable."""
    lib = _load("smi_graph", "smi_graph.cpp", "libsmigraph.so")
    if lib is None:
        return None
    if not hasattr(lib.smi2graph_batch, "_configured"):
        i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.smi2graph_batch.restype = ctypes.c_int32
        lib.smi2graph_batch.argtypes = [
            ctypes.c_char_p, i64p, ctypes.c_int32,  # text, offsets, n_mols
            i32p, f32p,  # atom_class, atom_features
            i32p, i32p, i32p, f32p,  # edge_src/dst/class, edge_features
            i64p, i64p, i8p,  # v_offsets, e_offsets, status
            ctypes.c_int64, ctypes.c_int64, i64p,  # cap_v, cap_e, out
        ]
        lib.smi2graph_batch._configured = True
    return lib.smi2graph_batch


def get_tile_dt():
    """Returns the ctypes tile_dt symbol (prepack-time conformer
    distances for tile-store v2), or None if unavailable. Compiled with
    -ffp-contract=off: bit-identical to the numpy fallback."""
    lib = _load("dt_tiles", "dt_tiles.cpp", "libdttiles.so",
                extra_flags=("-ffp-contract=off",))
    if lib is None:
        return None
    if not hasattr(lib.tile_dt, "_configured"):
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.tile_dt.restype = None
        lib.tile_dt.argtypes = [
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            f32p, i32p, f32p,
        ]
        lib.tile_dt._configured = True
    return lib.tile_dt


def get_pack_tiled():
    """Returns the ctypes pack_tiled symbol (fused tiled packer), or None."""
    lib = _load("pack_tiled", "pack_tiled.cpp", "libpacktiled.so",
                extra_flags=("-pthread",))
    if lib is None:
        return None
    if not hasattr(lib.pack_tiled, "_configured"):
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.pack_tiled.restype = ctypes.c_int32
        lib.pack_tiled.argtypes = [
            ctypes.c_int32, ctypes.c_int32,  # M, Mn
            i32p, i32p, f32p, f32p, f32p,  # ct_offsets, ct_nodes, mu, std, weight
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,  # B, ln, cmax
            i32p, i32p, i32p,  # lig_cluster_offsets, cluster_node_offsets, cluster_nodes
            i32p, i32p,  # node_mask_offsets, node_masks
            i32p, i32p,  # active_offsets, active
            i32p, i32p,  # cand_offsets, cands
            f32p,  # node_pos [B*ln, cmax*3]
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,  # P, tile, cap, threads
            ctypes.c_int64, ctypes.c_int64,  # t_alloc, cap_np
            f32p, f32p, i32p, f32p,  # gtab, aux, uv, pos_blocks
            f32p, i32p, i64p, i64p,  # pair_threshold, pair_meta, pair_end_rows, pair_slices
            i64p,  # out [4]
        ]
        lib.pack_tiled._configured = True
    return lib.pack_tiled
