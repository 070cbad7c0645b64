"""Verifier robustness: arbitrary/malformed proof bytes must be REJECTED
(return False with a structured ``last_rejection`` reason), never crash.

The reference can crash on malformed proofs (assert at fri.py:252, pickle
at ip.py:27-30); SURVEY.md §5 requires structured rejection instead.
These tests drive the public ``verify`` entry points with byte-flips,
truncations, type-confused transcripts, and corrupted multiproofs.
"""

import random

import pytest

from stark_anatomy_tpu.commit.hashing import hash_leaf
from stark_anatomy_tpu.commit.merkle import MerkleTree, open_multi, verify_multi
from stark_anatomy_tpu.field.scalar import Field
from stark_anatomy_tpu.models.rescue_prime import RescuePrime
from stark_anatomy_tpu.protocols.fast_stark import FastStark
from stark_anatomy_tpu.transcript import codec
from stark_anatomy_tpu.transcript.proof_stream import ProofStream

FIELD = Field.main()
RNG = random.Random(0xB0B)


@pytest.fixture(scope="module")
def proof_setup():
    rp = RescuePrime()
    stark = FastStark(FIELD, 4, 2, 4, rp.m, rp.N + 1, transition_constraints_degree=3)
    tz = stark.preprocess()
    input_element = FIELD.sample(b"robustness")
    output_element = rp.hash(input_element)
    trace = rp.trace(input_element)
    air = rp.transition_constraints(stark.omicron)
    boundary = rp.boundary_constraints(output_element)
    proof = stark.prove(trace, air, boundary, tz)
    assert stark.verify(proof, air, boundary, tz.root)
    return stark, air, boundary, tz, proof


def test_byte_flips_rejected_not_crash(proof_setup):
    stark, air, boundary, tz, proof = proof_setup
    n = len(proof)
    # flip a byte at positions spread across the whole proof (headers,
    # roots, leaf values, multiproof digests, last codeword)
    for frac in [0, 0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.999]:
        pos = min(int(n * frac), n - 1)
        bad = bytearray(proof)
        bad[pos] ^= 0xFF
        ok = stark.verify(bytes(bad), air, boundary, tz.root)
        assert not ok, f"tampered byte at {pos} still verified"
        assert stark.last_rejection, "rejection reason must be recorded"


def test_truncations_rejected_not_crash(proof_setup):
    stark, air, boundary, tz, proof = proof_setup
    for cut in [0, 1, 4, len(proof) // 2, len(proof) - 1]:
        assert not stark.verify(proof[:cut], air, boundary, tz.root)
        assert stark.last_rejection


def test_garbage_and_extensions_rejected(proof_setup):
    stark, air, boundary, tz, proof = proof_setup
    assert not stark.verify(b"", air, boundary, tz.root)
    assert not stark.verify(b"not a proof at all", air, boundary, tz.root)
    assert not stark.verify(bytes(RNG.randbytes(4096)), air, boundary, tz.root)
    assert not stark.verify(
        codec.MAGIC + bytes(RNG.randbytes(4096)), air, boundary, tz.root
    )
    # valid proof with trailing garbage objects changes the prover/verifier
    # Fiat-Shamir split -> must reject
    assert not stark.verify(
        proof + codec.encode_obj(12345), air, boundary, tz.root
    )


def test_type_confusion_rejected(proof_setup):
    """Swap transcript object KINDS (int where bytes expected etc.)."""
    stark, air, boundary, tz, proof = proof_setup
    objs = codec.deserialize(proof)
    # first object is a boundary-quotient Merkle root (bytes) -> make it int
    swapped = [7] + objs[1:]
    assert not stark.verify(codec.serialize(swapped), air, boundary, tz.root)
    assert "expected bytes" in (stark.last_rejection or "")
    # replace the last codeword (list of ints) with a list of bytes
    for i, o in enumerate(objs):
        if isinstance(o, list) and o and isinstance(o[0], int):
            swapped = objs[:i] + [[b"xx"] * len(o)] + objs[i + 1 :]
            assert not stark.verify(
                codec.serialize(swapped), air, boundary, tz.root
            )
            break


def test_multiproof_truncation_extension_reorder():
    leaves = [str(RNG.randrange(1 << 64)).encode() for _ in range(32)]
    tree = MerkleTree(leaves)
    indices = sorted(RNG.sample(range(32), 6))
    proof = open_multi(tree, indices)
    ld = {i: hash_leaf(leaves[i]) for i in indices}
    assert verify_multi(tree.root, 5, ld, proof)
    # truncated
    assert not verify_multi(tree.root, 5, ld, proof[:-1])
    # extended
    assert not verify_multi(tree.root, 5, ld, proof + [proof[0]])
    # reordered
    if len(proof) >= 2:
        swapped = [proof[1], proof[0]] + proof[2:]
        assert not verify_multi(tree.root, 5, ld, swapped)
    # corrupted digest
    bad = [bytes(64)] + proof[1:]
    assert not verify_multi(tree.root, 5, ld, bad)


def test_codec_roundtrip_and_malformed():
    from stark_anatomy_tpu.errors import MalformedProof

    objs = [b"root", 123, (1, 2, 3), [4, 5], [b"a", b"bb"]]
    data = codec.serialize(objs)
    assert codec.deserialize(data) == objs
    with pytest.raises(MalformedProof):
        codec.deserialize(b"BAD!!" + data[5:])
    with pytest.raises(MalformedProof):
        codec.deserialize(data[:-1])
    with pytest.raises(MalformedProof):
        codec.deserialize(data + b"\xff")  # bad tag
    ps = ProofStream()
    with pytest.raises(MalformedProof):
        ps.pull()
