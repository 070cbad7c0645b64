"""Hash primitives for commitments and transcripts.

blake2b (64-byte digests) hashes Merkle leaves/nodes; shake_256 drives
Fiat-Shamir; blake2s binds signatures to documents — same primitives as the
reference (merkle.py:1, ip.py:1, rpsss.py:3).  Transcript hashing is tiny
and sequential, so the stdlib is the right tool; BULK hashing (leaf
batches, tree levels) goes through the C++ extension — see
stark_anatomy_tpu.native.blake2b_batch, used by commit/merkle.py.
"""

from __future__ import annotations

from hashlib import blake2b, blake2s, shake_256

DIGEST_LEN = 64


def hash_leaf(data: bytes) -> bytes:
    return blake2b(data).digest()


def hash_pair(left: bytes, right: bytes) -> bytes:
    return blake2b(left + right).digest()


def shake256(data: bytes, num_bytes: int = 32) -> bytes:
    return shake_256(data).digest(num_bytes)


def blake2s_digest(data: bytes) -> bytes:
    return blake2s(data).digest()
