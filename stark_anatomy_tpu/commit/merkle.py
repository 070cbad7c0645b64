"""Cached binary Merkle trees over blake2b.

Same commitment scheme as the reference (merkle.py:3-44): power-of-two leaf
count, 64-byte blake2b digests, leaf digest = blake2b(bytes(obj)).  Unlike
the reference — which recursively re-hashes the whole tree for every
``open`` (merkle.py:16-24), an O(N) cost per query — :class:`MerkleTree`
builds all levels once and serves O(log N) openings from the cache.

The static ``Merkle.commit/open/verify`` wrappers preserve the reference's
stateless API for parity and tests.
"""

from __future__ import annotations

from typing import List, Sequence

from .hashing import hash_leaves, hash_level, hash_pair


class MerkleTree:
    """A fully materialized Merkle tree.

    levels[0] is the leaf-digest layer; levels[-1] is [root].
    """

    __slots__ = ("levels",)

    def __init__(self, leaf_encodings: Sequence[bytes]):
        n = len(leaf_encodings)
        assert n > 0 and n & (n - 1) == 0, "leaf count must be a power of two"
        level = hash_leaves(list(leaf_encodings))
        self.levels: List[List[bytes]] = [level]
        while len(level) > 1:
            level = hash_level(level)
            self.levels.append(level)

    @property
    def root(self) -> bytes:
        return self.levels[-1][0]

    def __len__(self) -> int:
        return len(self.levels[0])

    def open(self, index: int) -> List[bytes]:
        """Authentication path (sibling digests, leaf level first)."""
        assert 0 <= index < len(self), "cannot open invalid index"
        path = []
        for level in self.levels[:-1]:
            path.append(level[index ^ 1])
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
        from .hashing import hash_leaf

        return MerkleTree.verify_path(root, index, path, hash_leaf(bytes(data_element)))
