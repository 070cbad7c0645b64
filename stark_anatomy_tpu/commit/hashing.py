"""Hash primitives for commitments and transcripts.

blake2b hashes Merkle leaves/nodes; shake_256 drives Fiat-Shamir; blake2s
binds signatures to documents — same primitives as the reference
(merkle.py:1, ip.py:1, rpsss.py:3).  DEVIATION (DEVIATIONS.md): Merkle
digests are 32 bytes, not the reference's 64 (merkle.py:6) — 128-bit
collision resistance matches the 128-bit protocol security target, and
digests dominate proof size (hundreds of multiproof nodes per proof).
Transcript hashing is tiny and sequential, so the stdlib is the right
tool; BULK hashing (leaf batches, tree levels) goes through the C++
extension — see stark_anatomy_tpu.native.blake2b_batch, used by
commit/merkle.py.
"""

from __future__ import annotations

from hashlib import blake2b, blake2s, shake_256

DIGEST_LEN = 32


def hash_leaf(data: bytes) -> bytes:
    return blake2b(data, digest_size=DIGEST_LEN).digest()


def hash_pair(left: bytes, right: bytes) -> bytes:
    return blake2b(left + right, digest_size=DIGEST_LEN).digest()


def hash_paired_leaf(v0: int, v1: int) -> bytes:
    """Digest of a PAIRED codeword leaf covering values at i and i+n/2
    (encoding must match native stark_leaves_from_limb_pairs)."""
    return blake2b(
        str(v0).encode() + b"|" + str(v1).encode(), digest_size=DIGEST_LEN
    ).digest()


def shake256(data: bytes, num_bytes: int = 32) -> bytes:
    return shake_256(data).digest(num_bytes)


def blake2s_digest(data: bytes) -> bytes:
    return blake2s(data).digest()
