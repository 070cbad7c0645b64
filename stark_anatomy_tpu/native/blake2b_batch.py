"""numpy-friendly wrappers over the native hashing library.

Digest length follows commit.hashing.DIGEST_LEN (32 bytes — see the
deviation note there); the C++ entry points take it as a parameter so the
library never needs rebuilding when the protocol constant changes.
"""

from __future__ import annotations

from hashlib import blake2b
from typing import List, Optional, Sequence

import numpy as np

from ..commit.hashing import DIGEST_LEN
from . import get_lib

_DLEN = np.uint64(DIGEST_LEN)


def hash_encodings(encodings: Sequence[bytes]) -> np.ndarray:
    """blake2b over each byte string -> (n, DIGEST_LEN) uint8 digest array."""
    n = len(encodings)
    lib = get_lib()
    if lib is None:
        out = np.empty((n, DIGEST_LEN), dtype=np.uint8)
        for i, e in enumerate(encodings):
            out[i] = np.frombuffer(
                blake2b(e, digest_size=DIGEST_LEN).digest(), dtype=np.uint8
            )
        return out
    data = b"".join(encodings)
    offsets = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum([len(e) for e in encodings], out=offsets[1:])
    buf = np.frombuffer(data, dtype=np.uint8)
    out = np.empty((n, DIGEST_LEN), dtype=np.uint8)
    lib.stark_hash_batch(
        buf.ctypes.data, offsets.ctypes.data, np.uint64(n), out.ctypes.data, _DLEN
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
                blake2b(
                    digests[2 * i].tobytes() + digests[2 * i + 1].tobytes(),
                    digest_size=DIGEST_LEN,
                ).digest(),
                dtype=np.uint8,
            )
        return out
    d = np.ascontiguousarray(digests)
    lib.stark_merkle_level(d.ctypes.data, np.uint64(n), out.ctypes.data, _DLEN)
    return out


def leaves_from_limb_pairs(limbs: np.ndarray) -> np.ndarray:
    """Canonical (n, 8)-uint32 rows -> (n/2, DIGEST_LEN) PAIRED leaf digests:
    leaf i covers rows i and i+n/2 (the FRI fold pairing), hashed as
    b"dec(v_i)|dec(v_{i+n/2})"."""
    n = limbs.shape[0]
    lib = get_lib()
    if lib is None:
        from ..field.limbs import limbs_to_int

        half = n // 2
        enc = [
            str(limbs_to_int(limbs[i])).encode()
            + b"|"
            + str(limbs_to_int(limbs[i + half])).encode()
            for i in range(half)
        ]
        return hash_encodings(enc)
    arr = np.ascontiguousarray(limbs, dtype=np.uint32)
    out = np.empty((n // 2, DIGEST_LEN), dtype=np.uint8)
    lib.stark_leaves_from_limb_pairs(
        arr.ctypes.data, np.uint64(n), out.ctypes.data, _DLEN
    )
    return out


def leaves_from_limbs(limbs: np.ndarray) -> np.ndarray:
    """Canonical (n, 8)-uint32 limb rows -> (n, DIGEST_LEN) leaf digests,
    hashing the decimal-string encoding of each field element."""
    n = limbs.shape[0]
    lib = get_lib()
    if lib is None:
        from ..field.limbs import limbs_to_int

        enc = [str(limbs_to_int(row)).encode() for row in limbs]
        return hash_encodings(enc)
    arr = np.ascontiguousarray(limbs, dtype=np.uint32)
    out = np.empty((n, DIGEST_LEN), dtype=np.uint8)
    lib.stark_leaves_from_limbs(arr.ctypes.data, np.uint64(n), out.ctypes.data, _DLEN)
    return out
