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


@pytest.mark.slow
def test_batch_of_64_full_parameters():
    """BASELINE config 5: 64 signatures through one BatchProver pipeline at
    FULL production parameters (128-bit security, 64 colinearity checks),
    dp-sharded when a multi-device mesh is available.  Records wall-clock
    and per-signature amortized time; every proof verifies independently.
    Run with -m slow (TPU: ~amortized sub-second signing)."""
    import os
    import time

    import jax

    from stark_anatomy_tpu.parallel.mesh import make_mesh

    B = int(os.environ.get("STARK_TPU_BATCH", 64))
    rp = RescuePrime()
    stark = FastStark(FIELD, 4, 64, 128, rp.m, rp.N + 1,
                      transition_constraints_degree=3)
    tz = stark.preprocess()
    mesh = make_mesh() if len(jax.devices()) > 1 else None
    prover = BatchProver(stark, rp, tz, mesh=mesh)

    inputs = [FIELD.sample(b"batch64-%d" % i) for i in range(B)]
    docs = [b"document-%d" % i for i in range(B)]

    # warm (compile) on a small batch of the same per-proof shapes is not
    # possible (B is a traced dim), so time the second full batch
    t0 = time.time()
    proofs = prover.prove_batch(inputs, [SignatureProofStream(d) for d in docs])
    t_warm = time.time() - t0
    t0 = time.time()
    proofs = prover.prove_batch(inputs, [SignatureProofStream(d) for d in docs])
    t_batch = time.time() - t0
    print(
        f"\nbatch of {B} @ full params: warm {t_warm:.1f}s, steady "
        f"{t_batch:.1f}s total = {t_batch/B*1000:.0f} ms/signature "
        f"(mesh: {dict(mesh.shape) if mesh else 'single-device'})"
    )

    air = rp.transition_constraints(stark.omicron)
    for i in (0, B // 2, B - 1):
        out = rp.hash(inputs[i])
        ok = stark.verify(
            proofs[i], air, rp.boundary_constraints(out), tz.root,
            proof_stream_factory=lambda pr, d=docs[i]: SignatureProofStream.deserialize_with_document(pr, d),
        )
        assert ok, f"batch proof {i} failed to verify"
