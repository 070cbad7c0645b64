"""Device-resident Merkle commitment: bit-exactness vs the host scheme.

The device tree (commit/device_merkle.py) must produce byte-identical
roots, openings and multiproofs to the host MerkleTree/C++ hasher over
the same codeword — they are two lowerings of one commitment scheme.
"""

import random

import jax.numpy as jnp
import numpy as np

from stark_anatomy_tpu.commit.device_merkle import (
    DeviceMerkleTree,
    DeviceRows,
    _paired_leaf_digests,
    device_commit_paired,
    gather_rows,
)
from stark_anatomy_tpu.commit.hashing import hash_paired_leaf
from stark_anatomy_tpu.commit.merkle import MerkleTree, open_multi
from stark_anatomy_tpu.field import ops as F
from stark_anatomy_tpu.field.scalar import P
from stark_anatomy_tpu.utils.convert import canonical_np, device_from_ints

RNG = random.Random(0xD3B1CE)


def _codeword(n):
    vals = [RNG.randrange(P) for _ in range(n)]
    return vals, device_from_ints(vals)


def test_device_tree_bit_identical_to_host():
    for n in (64, 512):
        vals, cw = _codeword(n)
        rows, dtree = device_commit_paired(cw)
        htree = MerkleTree.from_limbs_paired(canonical_np(cw))
        assert dtree.root == htree.root, n
        assert len(dtree) == len(htree)
        # per-level digests match
        for dl, hl in zip(dtree.levels, htree.levels):
            got = np.asarray(dl).astype("<u4").T.copy().view(np.uint8)
            assert got.tobytes() == hl.tobytes(), n
        # single-path and multiproof byte equality
        for i in (0, 1, n // 2 - 1):
            assert dtree.open(i) == htree.open(i), (n, i)
        idx = sorted(RNG.sample(range(n // 2), 6))
        assert dtree.multiproof(idx) == open_multi(htree, idx)


def test_device_leaf_matches_hashlib():
    vals, cw = _codeword(32)
    digs = np.asarray(_paired_leaf_digests(F.from_mont(cw)))
    for i in range(16):
        want = hash_paired_leaf(vals[i], vals[i + 16])
        got = digs[:, i].astype("<u4").tobytes()
        assert got == want, i


def test_device_rows_gather():
    vals, cw = _codeword(128)
    rows, _ = device_commit_paired(cw)
    idx = [0, 5, 77, 127]
    assert gather_rows(rows, idx) == [vals[i] for i in idx]
    # and the host-accessor path of gather_rows agrees
    canon = canonical_np(cw)
    assert gather_rows(canon, idx) == [vals[i] for i in idx]


def test_full_prover_device_commit_byte_identical(monkeypatch):
    """A proof generated with the device commitment path forced on must be
    BYTE-IDENTICAL to the host-committed proof for the same randomness —
    the two paths are lowerings of one commitment scheme."""
    import hashlib

    from stark_anatomy_tpu.models.mimc import make_stark, prove_chain, verify_chain
    from stark_anatomy_tpu.field.scalar import Field, FieldElement

    def det_urandom(seed: bytes):
        state = {"ctr": 0}

        def rand(n: int) -> bytes:
            out = b""
            while len(out) < n:
                out += hashlib.blake2b(
                    seed + state["ctr"].to_bytes(8, "big")
                ).digest()
                state["ctr"] += 1
            return out[:n]

        return rand

    x = FieldElement(RNG.randrange(P), Field.main())
    proofs = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("STARK_TPU_DEVICE_HASH", mode)
        mimc, stark = make_stark(15, 4, 4, 8)
        tz = stark.preprocess()
        out, proof, _ = prove_chain(mimc, stark, x, tz)
        # prove_chain samples randomizers through os.urandom; redo via
        # stark.prove with deterministic randomness for byte comparison
        cols = mimc.trace_columns(x.value)
        proof = stark.prove(
            None,
            mimc.transition_constraints(),
            mimc.boundary_constraints(x, out),
            tz,
            air_evaluator=mimc.air_evaluator(),
            trace_columns=cols,
            urandom=det_urandom(b"device-vs-host"),
        )
        proofs[mode] = (proof, tz.root)
        assert verify_chain(mimc, stark, x, out, proof, tz.root)
    assert proofs["0"][1] == proofs["1"][1], "preprocess roots differ"
    assert proofs["0"][0] == proofs["1"][0], "proof bytes differ across commit paths"
