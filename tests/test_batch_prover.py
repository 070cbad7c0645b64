"""Batch signing: B proofs through one device pipeline, each verifying
independently under the single-proof verifier."""

import pytest

from stark_anatomy_tpu.field.scalar import Field
from stark_anatomy_tpu.models.rescue_prime import RescuePrime
from stark_anatomy_tpu.parallel.batch_prover import BatchProver
from stark_anatomy_tpu.protocols.fast_stark import FastStark
from stark_anatomy_tpu.transcript.proof_stream import SignatureProofStream

FIELD = Field.main()


def test_batch_prove_verifies_individually():
    rp = RescuePrime()
    stark = FastStark(FIELD, 4, 2, 4, rp.m, rp.N + 1, transition_constraints_degree=3)
    tz = stark.preprocess()
    prover = BatchProver(stark, rp, tz)

    inputs = [FIELD.sample(bytes([i])) for i in range(3)]
    docs = [b"doc-%d" % i for i in range(3)]
    streams = [SignatureProofStream(d) for d in docs]
    proofs = prover.prove_batch(inputs, streams)
    assert len(proofs) == 3

    air = rp.transition_constraints(stark.omicron)
    for i, inp in enumerate(inputs):
        out = rp.hash(inp)
        boundary = rp.boundary_constraints(out)
        ok = stark.verify(
            proofs[i], air, boundary, tz.root,
            proof_stream_factory=lambda pr, d=docs[i]: SignatureProofStream.deserialize_with_document(pr, d),
        )
        assert ok, f"batch proof {i} failed to verify"
        # cross-document must fail
        bad = stark.verify(
            proofs[i], air, boundary, tz.root,
            proof_stream_factory=lambda pr: SignatureProofStream.deserialize_with_document(pr, b"other"),
        )
        assert not bad


def test_batch_prove_dp_sharded():
    """Batch proving with inputs sharded batch-over-dp on a mesh: the
    jitted phases run data-parallel; every proof still verifies under the
    plain single-proof verifier."""
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from stark_anatomy_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)  # dp=2, sp=4
    rp = RescuePrime()
    stark = FastStark(FIELD, 4, 2, 4, rp.m, rp.N + 1, transition_constraints_degree=3)
    tz = stark.preprocess()
    prover = BatchProver(stark, rp, tz, mesh=mesh)

    inputs = [FIELD.sample(bytes([40 + i])) for i in range(4)]
    docs = [b"dp-doc-%d" % i for i in range(4)]
    proofs = prover.prove_batch(inputs, [SignatureProofStream(d) for d in docs])

    air = rp.transition_constraints(stark.omicron)
    for i, inp in enumerate(inputs):
        boundary = rp.boundary_constraints(rp.hash(inp))
        assert stark.verify(
            proofs[i], air, boundary, tz.root,
            proof_stream_factory=lambda pr, d=docs[i]: SignatureProofStream.deserialize_with_document(pr, d),
        ), f"dp-sharded batch proof {i} failed"
