"""Merkle commitment tests (parity with reference test_merkle.py:1-47:
positive opening + negative families: wrong leaf, wrong index, false root,
corrupted path, different tree)."""

import random

from stark_anatomy_tpu.commit.hashing import hash_leaf
from stark_anatomy_tpu.commit.merkle import Merkle, MerkleTree

RNG = random.Random(7)


def random_leaves(n):
    return [bytes(RNG.randrange(256) for _ in range(RNG.randrange(1, 33))) for _ in range(n)]


def test_positive_openings():
    n = 64
    leaves = random_leaves(n)
    tree = MerkleTree(leaves)
    for index in [0, 1, n // 2, n - 1, RNG.randrange(n)]:
        path = tree.open(index)
        assert len(path) == 6
        assert MerkleTree.verify_path(tree.root, index, path, hash_leaf(leaves[index]))


def test_negative_families():
    n = 64
    leaves = random_leaves(n)
    tree = MerkleTree(leaves)
    index = RNG.randrange(n)
    path = tree.open(index)

    # wrong leaf
    wrong = bytes([leaves[index][0] ^ 1]) + leaves[index][1:]
    assert not MerkleTree.verify_path(tree.root, index, path, hash_leaf(wrong))

    # wrong index
    for j in range(n):
        if j != index:
            assert not MerkleTree.verify_path(tree.root, j, path, hash_leaf(leaves[index]))

    # false root
    fake_root = bytes(64)
    assert not MerkleTree.verify_path(fake_root, index, path, hash_leaf(leaves[index]))

    # corrupted path element
    for k in range(len(path)):
        bad = list(path)
        bad[k] = bytes([bad[k][0] ^ 1]) + bad[k][1:]
        assert not MerkleTree.verify_path(tree.root, index, bad, hash_leaf(leaves[index]))

    # path from a different tree
    other = MerkleTree(random_leaves(n))
    assert not MerkleTree.verify_path(
        tree.root, index, other.open(index), hash_leaf(leaves[index])
    )


def test_stateless_api_matches_cached_tree():
    data = [str(RNG.randrange(10**30)).encode() for _ in range(16)]
    tree = MerkleTree(data)
    assert Merkle.commit(data) == tree.root
    assert Merkle.open(5, data) == tree.open(5)
    assert Merkle.verify(tree.root, 5, tree.open(5), data[5])


def test_cached_tree_structure():
    leaves = random_leaves(8)
    tree = MerkleTree(leaves)
    assert len(tree.levels) == 4
    assert [len(l) for l in tree.levels] == [8, 4, 2, 1]


def test_merkle_forest_bit_identical_to_tree():
    """The per-shard forest (sharded commitment) must produce the same
    root AND the same multiproof bytes as the monolithic paired tree."""
    import numpy as np

    from stark_anatomy_tpu.commit.merkle import (
        MerkleForest,
        MerkleTree,
        open_multi,
    )

    rng = np.random.default_rng(42)
    canon = rng.integers(0, 1 << 16, size=(256, 8), dtype=np.uint32)
    tree = MerkleTree.from_limbs_paired(canon)
    for shards in (1, 2, 4, 8):
        forest = MerkleForest.from_limbs_paired_sharded(canon, shards)
        assert forest.root == tree.root, f"root mismatch at S={shards}"
        idx = [0, 3, 17, 64, 100, 127]
        assert open_multi(forest, idx) == open_multi(tree, idx)
        assert forest.open(5) == tree.open(5)


def test_sharded_rows_paired_forest_bit_identical():
    """ShardedRows (per-shard host blocks, never one concatenated array)
    must commit bit-identically to the monolithic paired tree, at several
    sizes including openings that cross shard boundaries."""
    import numpy as np

    from stark_anatomy_tpu.commit.merkle import (
        MerkleTree,
        ShardedRows,
        open_multi,
    )

    rng = np.random.default_rng(7)
    for n, S in ((64, 2), (256, 4), (512, 8)):
        canon = rng.integers(0, 1 << 16, size=(n, 8), dtype=np.uint32)
        blocks = [canon[s * (n // S) : (s + 1) * (n // S)] for s in range(S)]
        rows = ShardedRows(blocks)
        # row access across blocks matches the flat array
        for i in (0, n // S - 1, n // S, n - 1):
            assert np.array_equal(rows[i], canon[i])
        assert np.array_equal(np.stack(list(rows)), canon)
        forest = rows.paired_forest()
        tree = MerkleTree.from_limbs_paired(canon)
        assert forest.root == tree.root, (n, S)
        # openings at shard-boundary leaf indices (leaf space is n/2)
        per_leaf = (n // 2) // max(S // 2, 1)
        idx = sorted({0, per_leaf - 1, min(per_leaf, n // 2 - 1), n // 2 - 1})
        assert open_multi(forest, idx) == open_multi(tree, idx)


def test_reordered_multiproof_rejected():
    """A multiproof with swapped sibling digests must fail verify_multi
    (round-2 verdict: no negative coverage for proof-order tampering)."""
    import numpy as np

    from stark_anatomy_tpu.commit.merkle import (
        MerkleTree,
        open_multi,
        verify_multi,
    )
    from stark_anatomy_tpu.commit.hashing import hash_paired_leaf
    from stark_anatomy_tpu.utils.convert import int_from_row

    rng = np.random.default_rng(9)
    canon = rng.integers(0, 1 << 16, size=(64, 8), dtype=np.uint32)
    tree = MerkleTree.from_limbs_paired(canon)
    idx = [1, 7, 20, 30]
    proof = open_multi(tree, idx)
    assert len(proof) >= 2
    ld = {
        i: hash_paired_leaf(int_from_row(canon[i]), int_from_row(canon[i + 32]))
        for i in idx
    }
    depth = len(tree.levels) - 1
    assert verify_multi(tree.root, depth, ld, proof)
    swapped = list(proof)
    swapped[0], swapped[1] = swapped[1], swapped[0]
    assert not verify_multi(tree.root, depth, ld, swapped)
    assert not verify_multi(tree.root, depth, ld, proof[:-1])    # truncated
    assert not verify_multi(tree.root, depth, ld, proof + proof[:1])  # padded
