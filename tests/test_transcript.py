"""Transcript/codec tests (parity with reference test_ip.py:3-18:
serialize/deserialize round-trip + prover/verifier Fiat-Shamir agreement)."""

import pytest

from stark_anatomy_tpu.transcript import codec
from stark_anatomy_tpu.transcript.proof_stream import ProofStream, SignatureProofStream


def sample_objects():
    return [
        b"\x01" * 64,                      # digest
        1,                                 # field element
        (3, 4, 5),                         # leaf triple
        [7, 8, 9, 10],                     # codeword
        [b"\x02" * 64, b"\x03" * 64],      # path
        [],                                # empty list
    ]


def test_codec_roundtrip():
    objs = sample_objects()
    data = codec.serialize(objs)
    assert codec.deserialize(data) == objs


def test_proof_stream_roundtrip_and_fs():
    ps = ProofStream()
    for o in sample_objects():
        ps.push(o)
    serialized = ps.serialize()
    ps2 = ProofStream.deserialize(serialized)
    assert ps2.objects == ps.objects

    # pull everything on the verifier side; verifier FS must match the
    # prover FS taken at the corresponding points
    prover_final = ps.prover_fiat_shamir()
    for _ in range(len(ps.objects)):
        ps2.pull()
    assert ps2.verifier_fiat_shamir() == prover_final

    # partial read: verifier FS over a strict prefix differs
    ps3 = ProofStream.deserialize(serialized)
    ps3.pull()
    assert ps3.verifier_fiat_shamir() != prover_final


def test_incremental_serialization_matches_batch():
    ps = ProofStream()
    objs = sample_objects()
    for o in objs:
        ps.push(o)
    assert ps.serialize() == codec.serialize(objs)


def test_pull_past_end_raises():
    from stark_anatomy_tpu.errors import MalformedProof

    ps = ProofStream()
    ps.push(1)
    ps.pull()
    with pytest.raises(MalformedProof):
        ps.pull()


def test_signature_stream_binds_document():
    a = SignatureProofStream(b"doc-a")
    b = SignatureProofStream(b"doc-b")
    a.push(1)
    b.push(1)
    assert a.prover_fiat_shamir() != b.prover_fiat_shamir()
    # same document -> same challenges
    a2 = SignatureProofStream(b"doc-a")
    a2.push(1)
    assert a2.prover_fiat_shamir() == a.prover_fiat_shamir()
