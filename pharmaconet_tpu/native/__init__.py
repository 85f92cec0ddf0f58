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

_SRC = Path(__file__).parent / "block_packer.cpp"
_LIB = Path(__file__).parent / "libblockpacker.so"
_lib_handle = None
_load_failed = False


def _compile() -> bool:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        str(_SRC), "-o", str(_LIB),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        logger.warning("native block packer build failed: %s", e)
        return False


def get_block_packer():
    """Returns the ctypes build_blocks symbol, or None if unavailable."""
    global _lib_handle, _load_failed
    if _lib_handle is not None:
        return _lib_handle.build_blocks
    if _load_failed:
        return None
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _compile():
            _load_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError as e:
        logger.warning("native block packer load failed: %s", e)
        _load_failed = True
        return None

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
    _lib_handle = lib
    return lib.build_blocks
