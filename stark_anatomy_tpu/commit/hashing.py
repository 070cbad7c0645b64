"""Hash backends for commitments and transcripts.

blake2b (64-byte digests) hashes Merkle leaves/nodes; shake_256 drives
Fiat-Shamir; blake2s binds signatures to documents — same primitives as the
reference (merkle.py:1, ip.py:1, rpsss.py:3).  Transcript hashing is tiny
and sequential, so the stdlib is the right tool; *bulk leaf hashing* is the
hot host-side path and is routed through the C++ extension in
``stark_anatomy_tpu.native`` when available (built by ``make -C native``),
with a pure-Python fallback.
"""

from __future__ import annotations

from hashlib import blake2b, blake2s, shake_256
from typing import List, Sequence

DIGEST_LEN = 64


def hash_leaf(data: bytes) -> bytes:
    return blake2b(data).digest()


def hash_pair(left: bytes, right: bytes) -> bytes:
    return blake2b(left + right).digest()


def hash_leaves(leaves: Sequence[bytes]) -> List[bytes]:
    """Hash a batch of leaf encodings (native backend if available)."""
    native = _native()
    if native is not None:
        return native.hash_leaves(leaves)
    return [blake2b(leaf).digest() for leaf in leaves]


def hash_level(digests: List[bytes]) -> List[bytes]:
    """One Merkle level: hash adjacent digest pairs."""
    native = _native()
    if native is not None:
        return native.hash_level(digests)
    return [
        blake2b(digests[i] + digests[i + 1]).digest()
        for i in range(0, len(digests), 2)
    ]


_NATIVE = None
_NATIVE_CHECKED = False


def _native():
    global _NATIVE, _NATIVE_CHECKED
    if not _NATIVE_CHECKED:
        _NATIVE_CHECKED = True
        try:
            from ..native import blake2b_batch as _mod

            _NATIVE = _mod
        except Exception:
            _NATIVE = None
    return _NATIVE


def shake256(data: bytes, num_bytes: int = 32) -> bytes:
    return shake_256(data).digest(num_bytes)


def blake2s_digest(data: bytes) -> bytes:
    return blake2s(data).digest()
