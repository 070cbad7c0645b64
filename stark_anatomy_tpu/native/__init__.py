"""Native (C++) runtime components, loaded via ctypes.

``make -C stark_anatomy_tpu/native`` builds libstark_native.so; everything
degrades gracefully to pure Python if the library is missing.  The package
also attempts a one-time automatic build on first import.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libstark_native.so")

_lib = None
_build_attempted = False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build_attempted:
        _build_attempted = True
        try:
            subprocess.run(
                ["make", "-C", _DIR, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.stark_hash_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p,
            ctypes.c_uint64,
        ]
        lib.stark_merkle_level.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p, ctypes.c_uint64,
        ]
        lib.stark_leaves_from_limbs.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p, ctypes.c_uint64,
        ]
        lib.stark_leaves_from_limb_pairs.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p, ctypes.c_uint64,
        ]
        lib.stark_limbs_to_decimal.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p,
            ctypes.c_uint64, ctypes.c_void_p,
        ]
        # blake2s-256 commitment scheme entry points
        lib.stark_hash_batch_s.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p,
        ]
        lib.stark_merkle_level_s.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p,
        ]
        lib.stark_leaves_from_limbs_s.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p,
        ]
        lib.stark_leaves_from_limb_pairs_s.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p,
        ]
        if hasattr(lib, "stark_mimc_chain"):  # absent only in stale builds
            lib.stark_mimc_chain.argtypes = [
                ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64,
                ctypes.c_uint64, ctypes.c_uint64, ctypes.c_void_p,
            ]
        _lib = lib
    except OSError:
        return None
    return _lib
