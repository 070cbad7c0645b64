"""Cached binary Merkle trees over blake2s-256, with native batch hashing.

Commitment structure mirrors the reference (merkle.py:3-44): power-of-two
leaf count, 32-byte digests, binary parent hashing.  The hash and leaf
encoding deviate (DEVIATIONS.md #12): blake2s-256 over the 16-byte
little-endian canonical element encoding (commit/hashing.py) instead of
the reference's blake2b over decimal strings (algebra.py:56-57) — chosen
so leaves and nodes each hash in ONE blake2s compression and the whole
tree can also be built on device (commit/device_merkle.py), bit-exactly.

Unlike the reference — which recursively re-hashes the whole tree for every
``open`` (merkle.py:16-24), an O(N) cost per query — :class:`MerkleTree`
materializes all levels once (as numpy digest arrays, hashed in C++ via
stark_anatomy_tpu.native when built) and serves O(log N) openings.

``MerkleTree.from_limbs`` commits a canonical limb array straight from the
device without ever creating Python big-ints: the C++ side decimal-encodes
and hashes each row.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ..native import blake2b_batch as NB
from .hashing import hash_leaf, hash_pair


class MerkleTree:
    """A fully materialized Merkle tree.

    levels[0] is the leaf-digest layer ((n, DIGEST_LEN) uint8); levels[-1]
    is (1, DIGEST_LEN).
    """

    __slots__ = ("levels",)

    def __init__(self, leaf_encodings: Sequence[bytes] = None, _digests: np.ndarray = None):
        if _digests is None:
            n = len(leaf_encodings)
            assert n > 0 and n & (n - 1) == 0, "leaf count must be a power of two"
            _digests = NB.hash_encodings(list(leaf_encodings))
        self.levels: List[np.ndarray] = [_digests]
        level = _digests
        while level.shape[0] > 1:
            level = NB.merkle_level(level)
            self.levels.append(level)

    @classmethod
    def from_limbs(cls, canonical_limbs: np.ndarray) -> "MerkleTree":
        """Commit to a codeword given as a canonical (n, NLIMBS) uint32 limb
        array (e.g. np.asarray(F.from_mont(codeword))): each leaf is
        blake2s-256 over the element's 16-byte little-endian encoding,
        hashed natively in C++ without creating Python big-ints."""
        n = canonical_limbs.shape[0]
        assert n > 0 and n & (n - 1) == 0, "leaf count must be a power of two"
        return cls(_digests=NB.leaves_from_limbs(np.asarray(canonical_limbs)))

    @classmethod
    def from_limbs_paired(cls, canonical_limbs: np.ndarray) -> "MerkleTree":
        """Commit to a codeword with PAIRED leaves: leaf i covers rows i and
        i + n/2 — the FRI split-and-fold pairing (reference: fri.py:85).
        One opening authenticates both halves of a fold pair, and the tree
        is half as deep; this is the framework's codeword commitment.
        """
        n = canonical_limbs.shape[0]
        assert n > 1 and n & (n - 1) == 0, "row count must be a power of two"
        return cls(_digests=NB.leaves_from_limb_pairs(np.asarray(canonical_limbs)))

    @property
    def root(self) -> bytes:
        return self.levels[-1][0].tobytes()

    def __len__(self) -> int:
        return self.levels[0].shape[0]

    def open(self, index: int) -> List[bytes]:
        """Authentication path (sibling digests, leaf level first)."""
        assert 0 <= index < len(self), "cannot open invalid index"
        path = []
        for level in self.levels[:-1]:
            path.append(level[index ^ 1].tobytes())
            index >>= 1
        return path

    @staticmethod
    def verify_path(root: bytes, index: int, path: List[bytes], leaf_digest: bytes) -> bool:
        assert 0 <= index < (1 << len(path)), "cannot verify invalid index"
        acc = leaf_digest
        for sibling in path:
            if index & 1:
                acc = hash_pair(sibling, acc)
            else:
                acc = hash_pair(acc, sibling)
            index >>= 1
        return acc == root


class MerkleForest(MerkleTree):
    """A Merkle tree built as a FOREST of per-shard subtrees plus a top tree.

    The commitment is BIT-IDENTICAL to the monolithic :class:`MerkleTree`
    over the concatenated leaves: a binary tree over n leaves split into S
    contiguous blocks is exactly S depth-(log2(n/S)) subtrees joined by a
    depth-log2(S) top tree.  The value is the work decomposition (SURVEY.md
    §2 parallel table: "hash leaves+subtrees locally per shard, all-gather
    the subtree roots"): each shard hashes and reduces ITS block locally;
    only the S subtree roots cross shards.  On multi-host deployments the
    per-shard calls run where the data lives; openings are served from the
    owning shard's subtree plus the shared top levels.
    """

    def __init__(self, shard_leaf_digests: List[np.ndarray]):
        S = len(shard_leaf_digests)
        assert S > 0 and S & (S - 1) == 0, "shard count must be a power of two"
        per = shard_leaf_digests[0].shape[0]
        assert all(d.shape[0] == per for d in shard_leaf_digests), (
            "all shards must hold the same number of leaves"
        )
        # shard-local subtree levels (this is the distributable work)
        sub_levels: List[List[np.ndarray]] = []
        for d in shard_leaf_digests:
            levels = [d]
            while levels[-1].shape[0] > 1:
                levels.append(NB.merkle_level(levels[-1]))
            sub_levels.append(levels)
        # stitch: full-tree level k = concatenation of shard levels k
        self.levels = [
            np.concatenate([sl[k] for sl in sub_levels])
            for k in range(len(sub_levels[0]))
        ]
        # top tree over the S subtree roots ("all-gathered")
        while self.levels[-1].shape[0] > 1:
            self.levels.append(NB.merkle_level(self.levels[-1]))

    @classmethod
    def from_limbs_paired_sharded(
        cls, canonical_limbs: np.ndarray, num_shards: int
    ) -> "MerkleForest":
        """Paired-leaf forest over a canonical (n, NLIMBS) codeword: pair
        row i with i + n/2, split the n/2 leaves into ``num_shards``
        contiguous blocks, hash each block independently."""
        n = canonical_limbs.shape[0]
        assert n > 1 and n & (n - 1) == 0
        half = n // 2
        assert half % num_shards == 0
        per = half // num_shards
        blocks = []
        for s in range(num_shards):
            lo = canonical_limbs[s * per : (s + 1) * per]
            hi = canonical_limbs[half + s * per : half + (s + 1) * per]
            blocks.append(
                NB.leaves_from_limb_pairs(np.concatenate([lo, hi], axis=0))
            )
        return cls(blocks)


class ShardedRows:
    """Element-major canonical rows of a codeword held as PER-SHARD host
    blocks — the codeword is never concatenated into one host array.

    Presents the same read interface the provers use on a monolithic
    canonical array (``rows[i]``, ``rows.shape``, iteration), mapping a
    global row index to (block, local index).  Blocks must be contiguous,
    equal-sized slices in global order (a device-sharded codeword's
    addressable shards).
    """

    __slots__ = ("blocks", "per", "shape")

    def __init__(self, blocks: List[np.ndarray]):
        self.blocks = blocks
        self.per = blocks[0].shape[0]
        assert all(b.shape == blocks[0].shape for b in blocks)
        self.shape = (self.per * len(blocks),) + blocks[0].shape[1:]

    def __len__(self) -> int:
        return self.shape[0]

    def __getitem__(self, i: int) -> np.ndarray:
        return self.blocks[i // self.per][i % self.per]

    def __iter__(self):
        for b in self.blocks:
            yield from b

    def paired_forest(self) -> MerkleForest:
        """Paired-leaf commitment hashed per shard: leaf blocks join shard
        s with shard s + S/2 (the global pairing i <-> i + n/2 falls on
        exactly that shard pair), so every leaf/subtree hash reads only two
        shard-local buffers; only subtree roots are stitched.  Bit-identical
        to MerkleTree.from_limbs_paired over the concatenated rows."""
        S = len(self.blocks)
        assert S >= 2 and S & (S - 1) == 0
        return MerkleForest(
            [
                NB.leaves_from_limb_pairs(
                    np.concatenate([self.blocks[s], self.blocks[s + S // 2]])
                )
                for s in range(S // 2)
            ]
        )


class Merkle:
    """Stateless reference-compatible API (reference: merkle.py:3-44)."""

    @staticmethod
    def commit(data_array: Sequence) -> bytes:
        return MerkleTree([bytes(obj) for obj in data_array]).root

    @staticmethod
    def open(index: int, data_array: Sequence) -> List[bytes]:
        return MerkleTree([bytes(obj) for obj in data_array]).open(index)

    @staticmethod
    def verify(root: bytes, index: int, path: List[bytes], data_element) -> bool:
        return MerkleTree.verify_path(root, index, path, hash_leaf(bytes(data_element)))


def paired_tree_from_ints(codeword: Sequence[int]) -> MerkleTree:
    """Paired-leaf tree over a host codeword of canonical ints (leaf i =
    H(LE16(c[i]) || LE16(c[i+n/2]))); matches MerkleTree.from_limbs_paired."""
    from .hashing import elt_bytes

    half = len(codeword) // 2
    enc = [
        elt_bytes(codeword[i]) + elt_bytes(codeword[i + half])
        for i in range(half)
    ]
    return MerkleTree(enc)


def open_multi(tree, indices) -> List[bytes]:
    """Minimal batched authentication proof for a SET of leaf indices.

    Per-index paths repeat shared upper-tree digests; for the STARK's
    hundreds of linked openings per commitment that is the dominant proof
    cost (the reference pays it in full: fast_stark.py:154-177).  The
    multiproof walks level by level, emitting only siblings that cannot be
    recomputed from below, in a canonical (sorted-index) order the verifier
    reproduces exactly.  Device-resident trees serve the same bytes
    through their own gather-based walk.
    """
    if hasattr(tree, "multiproof"):
        return tree.multiproof(indices)
    known = sorted(set(indices))
    proof: List[bytes] = []
    for level in tree.levels[:-1]:
        known_set = set(known)
        for i in known:
            if i ^ 1 not in known_set:
                proof.append(level[i ^ 1].tobytes())
        known = sorted({i >> 1 for i in known})
    return proof


def verify_multi(
    root: bytes,
    depth: int,
    leaf_digests: dict,
    proof: List[bytes],
) -> bool:
    """Verify a multiproof.  leaf_digests: {index: digest}."""
    nodes = dict(leaf_digests)
    pos = 0
    for _ in range(depth):
        known = sorted(nodes)
        known_set = set(known)
        parents = {}
        for i in known:
            if i ^ 1 in known_set and (i & 1):
                continue  # handled with its even sibling
            if i ^ 1 in known_set:
                left, right = nodes[i], nodes[i | 1]
            else:
                if pos >= len(proof):
                    return False
                sib = proof[pos]
                pos += 1
                if i & 1:
                    left, right = sib, nodes[i]
                else:
                    left, right = nodes[i], sib
            parents[i >> 1] = hash_pair(left, right)
        nodes = parents
    return pos == len(proof) and nodes.get(0) == root
