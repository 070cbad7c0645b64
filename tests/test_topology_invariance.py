"""Transcript invariance across topologies (SURVEY.md §4/§7): the SAME
proof, byte for byte, whether the prover runs on one device or with its
codeword axis sharded over an 8-device mesh.  Distribution must never
change proof bytes — this is the framework's key correctness property.
"""

import hashlib

import jax
import pytest

from stark_anatomy_tpu.field.scalar import Field
from stark_anatomy_tpu.models.rescue_prime import RescuePrime, make_air_evaluator
from stark_anatomy_tpu.parallel.mesh import make_mesh
from stark_anatomy_tpu.parallel.sharded_stark import ShardedFastStark
from stark_anatomy_tpu.protocols.fast_stark import FastStark
from stark_anatomy_tpu.transcript.proof_stream import ProofStream

FIELD = Field.main()

needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def det_urandom(seed: bytes):
    """Deterministic os.urandom stand-in (counter-mode blake2b stream)."""
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


def _prove(stark, rp, input_element, seed):
    output_element = rp.hash(input_element)
    trace = rp.trace(input_element)
    air = rp.transition_constraints(stark.omicron)
    boundary = rp.boundary_constraints(output_element)
    tz = stark.preprocess()
    proof = stark.prove(
        trace, air, boundary, tz,
        air_evaluator=make_air_evaluator(stark),
        urandom=det_urandom(seed),
    )
    return proof, air, boundary, tz


@needs_8
def test_sharded_prover_transcript_byte_equality():
    rp = RescuePrime()
    params = (FIELD, 4, 2, 4, rp.m, rp.N + 1)
    input_element = FIELD.sample(b"topology")

    single = FastStark(*params, transition_constraints_degree=3)
    proof1, air, boundary, tz1 = _prove(single, rp, input_element, b"seed-A")

    mesh = make_mesh(8)
    sharded = ShardedFastStark(
        *params, transition_constraints_degree=3, mesh=mesh
    )
    proof8, _, _, tz8 = _prove(sharded, rp, input_element, b"seed-A")

    assert tz1.root == tz8.root, "preprocessing must be topology-invariant"
    assert proof1 == proof8, (
        f"sharded prover changed the transcript "
        f"({len(proof1)} vs {len(proof8)} bytes)"
    )
    # and the proof verifies under the plain verifier
    assert single.verify(proof8, air, boundary, tz1.root)


@needs_8
def test_sharded_prover_actually_shards():
    """The heavy intermediates must genuinely live sharded on the mesh
    (guards against the hooks silently degrading to replicated)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    rp = RescuePrime()
    mesh = make_mesh(8)
    stark = ShardedFastStark(
        FIELD, 4, 2, 4, rp.m, rp.N + 1,
        transition_constraints_degree=3, mesh=mesh,
    )
    t = stark._interp_tables()
    sharded_spec = P(None, "sp")
    assert t["x_lde"].sharding.spec == sharded_spec
    import random

    from stark_anatomy_tpu.field.scalar import P as PRIME
    from stark_anatomy_tpu.utils.convert import device_from_ints

    rng = random.Random(7)
    cols = device_from_ints(
        [rng.randrange(PRIME) for _ in range(stark.randomized_trace_length)]
    )[None]
    lde = stark._trace_lde(cols)
    # output is (1, L, N) sharded over the last (codeword) axis
    assert "sp" in str(lde.sharding.spec), f"trace LDE not sharded: {lde.sharding}"


def test_deterministic_urandom_reproducible():
    r1, r2 = det_urandom(b"x"), det_urandom(b"x")
    assert [r1(17) for _ in range(5)] == [r2(17) for _ in range(5)]
    assert det_urandom(b"y")(17) != det_urandom(b"x")(17)
