"""numpy-friendly wrappers over the native hashing library.

Commitment scheme (see commit/hashing.py): blake2s-256 digests over the
FIXED-WIDTH encoding — a field element hashes as its 16-byte little-endian
canonical value, i.e. the 8 uint16 limbs verbatim.  The C++ side
(blake2b.cpp) and the device kernels (commit/device_merkle.py) implement
the identical function; pure-hashlib fallbacks below keep everything
working without the native build.
"""

from __future__ import annotations

from hashlib import blake2s
from typing import List, Optional, Sequence

import numpy as np

from ..commit.hashing import DIGEST_LEN
from . import get_lib


def _le16_bytes(row: np.ndarray) -> bytes:
    """Canonical (8,) uint32 limb row -> 16-byte little-endian encoding."""
    return row.astype("<u2").tobytes()


def hash_encodings(encodings: Sequence[bytes]) -> np.ndarray:
    """blake2s over each byte string -> (n, DIGEST_LEN) uint8 digest array."""
    n = len(encodings)
    lib = get_lib()
    if lib is None:
        out = np.empty((n, DIGEST_LEN), dtype=np.uint8)
        for i, e in enumerate(encodings):
            out[i] = np.frombuffer(blake2s(e).digest(), dtype=np.uint8)
        return out
    data = b"".join(encodings)
    offsets = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum([len(e) for e in encodings], out=offsets[1:])
    buf = np.frombuffer(data, dtype=np.uint8)
    out = np.empty((n, DIGEST_LEN), dtype=np.uint8)
    lib.stark_hash_batch_s(
        buf.ctypes.data, offsets.ctypes.data, np.uint64(n), out.ctypes.data
    )
    return out


def merkle_level(digests: np.ndarray) -> np.ndarray:
    """(n, DIGEST_LEN) digests -> (n/2, DIGEST_LEN) parent digests."""
    n = digests.shape[0]
    lib = get_lib()
    out = np.empty((n // 2, DIGEST_LEN), dtype=np.uint8)
    if lib is None:
        for i in range(n // 2):
            out[i] = np.frombuffer(
                blake2s(
                    digests[2 * i].tobytes() + digests[2 * i + 1].tobytes()
                ).digest(),
                dtype=np.uint8,
            )
        return out
    d = np.ascontiguousarray(digests)
    lib.stark_merkle_level_s(d.ctypes.data, np.uint64(n), out.ctypes.data)
    return out


def leaves_from_limb_pairs(limbs: np.ndarray) -> np.ndarray:
    """Canonical (n, 8)-uint32 rows -> (n/2, DIGEST_LEN) PAIRED leaf digests:
    leaf i covers rows i and i+n/2 (the FRI fold pairing), hashed as
    LE16(v_i) || LE16(v_{i+n/2})."""
    n = limbs.shape[0]
    lib = get_lib()
    if lib is None:
        half = n // 2
        enc = [
            _le16_bytes(limbs[i]) + _le16_bytes(limbs[i + half])
            for i in range(half)
        ]
        return hash_encodings(enc)
    arr = np.ascontiguousarray(limbs, dtype=np.uint32)
    out = np.empty((n // 2, DIGEST_LEN), dtype=np.uint8)
    lib.stark_leaves_from_limb_pairs_s(
        arr.ctypes.data, np.uint64(n), out.ctypes.data
    )
    return out


def leaves_from_limbs(limbs: np.ndarray) -> np.ndarray:
    """Canonical (n, 8)-uint32 limb rows -> (n, DIGEST_LEN) leaf digests,
    hashing the 16-byte little-endian encoding of each field element."""
    n = limbs.shape[0]
    lib = get_lib()
    if lib is None:
        enc = [_le16_bytes(row) for row in limbs]
        return hash_encodings(enc)
    arr = np.ascontiguousarray(limbs, dtype=np.uint32)
    out = np.empty((n, DIGEST_LEN), dtype=np.uint8)
    lib.stark_leaves_from_limbs_s(arr.ctypes.data, np.uint64(n), out.ctypes.data)
    return out
