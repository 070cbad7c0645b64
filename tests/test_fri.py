"""FRI protocol tests (parity with reference test_fri.py:1-60: honest
prove/verify with top-level value cross-check, then corruption rejection)."""

import random

from stark_anatomy_tpu.field.scalar import Field, FieldElement, P
from stark_anatomy_tpu.protocols.fri import Fri
from stark_anatomy_tpu.transcript.proof_stream import ProofStream
from stark_anatomy_tpu.utils.convert import device_from_ints
from stark_anatomy_tpu.ops import ntt as D

RNG = random.Random(99)
FIELD = Field.main()


def make_fri(n=256, expansion=4, tests=17):
    omega = FIELD.primitive_nth_root(n).value
    offset = FIELD.generator().value
    return Fri(offset, omega, n, expansion, tests)


def test_fri_honest_prove_verify():
    n, expansion, tests = 256, 4, 17
    fri = make_fri(n, expansion, tests)
    degree = n // expansion - 1  # 63
    coeffs = [RNG.randrange(P) for _ in range(degree + 1)]
    codeword = D.coset_evaluate(device_from_ints(coeffs), fri.offset, n)

    ps = ProofStream()
    fri.prove(codeword, ps)

    # verify from a fresh deserialized stream
    vs = ProofStream.deserialize(ps.serialize())
    poly_values = []
    assert fri.verify(vs, poly_values)

    # returned top-level points must lie on the committed polynomial
    from stark_anatomy_tpu.poly.univariate import Polynomial

    poly = Polynomial.from_ints(coeffs, FIELD)
    for idx, val in poly_values:
        x = FieldElement(fri.offset * pow(fri.omega, idx, P) % P, FIELD)
        assert poly.evaluate(x).value == val


def test_fri_rejects_corrupt_codeword():
    n, expansion, tests = 256, 4, 17
    fri = make_fri(n, expansion, tests)
    degree = n // expansion - 1
    coeffs = [RNG.randrange(P) for _ in range(degree + 1)]
    # build honest codeword then corrupt the first 21 entries
    from stark_anatomy_tpu.utils.convert import ints_from_device

    codeword = D.coset_evaluate(device_from_ints(coeffs), fri.offset, n)
    vals = ints_from_device(codeword)
    for i in range(21):
        vals[i] = 0
    corrupt = device_from_ints(vals)

    ps = ProofStream()
    fri.prove(corrupt, ps)
    vs = ProofStream.deserialize(ps.serialize())
    assert not fri.verify(vs, [])


def test_fri_num_rounds():
    fri = make_fri(256, 4, 17)
    # halve until <= expansion or 4*tests >= length: 256->128->64 stops at
    # 4*17=68 >= 128? no; 68>=64 yes -> rounds: 256,128 -> 2 rounds
    assert fri.num_rounds() == 2


def test_sample_indices_distinct_and_deterministic():
    fri = make_fri(256, 4, 17)
    seed = b"seed"
    idx1 = fri.sample_indices(seed, 128, 64, 17)
    idx2 = fri.sample_indices(seed, 128, 64, 17)
    assert idx1 == idx2
    reduced = [i % 64 for i in idx1]
    assert len(set(reduced)) == len(reduced)
    assert all(0 <= i < 128 for i in idx1)


def test_fri_host_prover_byte_identical():
    """prove_host (the fused signing path's FRI) must emit a transcript
    byte-identical to the device prover's for the same codeword."""
    n, expansion, tests = 256, 4, 17
    fri = make_fri(n, expansion, tests)
    coeffs = [RNG.randrange(P) for _ in range(n // expansion)]
    codeword = D.coset_evaluate(device_from_ints(coeffs), fri.offset, n)

    ps_dev = ProofStream()
    idx_dev = fri.prove(codeword, ps_dev)

    from stark_anatomy_tpu.utils.convert import ints_from_device

    ps_host = ProofStream()
    idx_host = fri.prove_host(ints_from_device(codeword), ps_host)

    assert idx_dev == idx_host
    assert ps_dev.serialize() == ps_host.serialize()

    vs = ProofStream.deserialize(ps_host.serialize())
    assert fri.verify(vs, [])


def test_fri_fused_padded_rounds_byte_identical(monkeypatch):
    """The shape-family fused fold+commit path (fixed-width padded
    buffers, dynamic logical length — protocols/fri.py:_fold_commit_padded)
    must produce a transcript BYTE-IDENTICAL to the host fold path,
    including across a family-width boundary."""
    n, expansion, tests = 512, 4, 2
    degree = n // expansion - 1
    coeffs = [RNG.randrange(P) for _ in range(degree + 1)]

    transcripts = {}
    for mode in ("host", "fused"):
        fri = make_fri(n, expansion, tests)
        if mode == "fused":
            monkeypatch.setenv("STARK_TPU_DEVICE_HASH", "1")
            # force the device/fused path down to tiny layer sizes so the
            # padded kernel runs several rounds INCLUDING a family switch
            monkeypatch.setattr(Fri, "HOST_TAIL_MAX", 8)
        else:
            monkeypatch.setenv("STARK_TPU_DEVICE_HASH", "0")
        # family widths at n=512: halves 256,128,64 share W=256; 32,16
        # share W=32 (Fri._family_width)
        codeword = D.coset_evaluate(device_from_ints(coeffs), fri.offset, n)
        ps = ProofStream()
        fri.prove(codeword, ps)
        transcripts[mode] = ps.serialize()
        vs = ProofStream.deserialize(transcripts[mode])
        assert fri.verify(vs, [])
    assert transcripts["host"] == transcripts["fused"]
