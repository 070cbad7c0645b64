"""Slow STARK integration tests (parity with reference test_stark.py:1-60):
honest prove/verify, wrong-boundary rejection, and the slow path's
crash-on-false-witness contract."""

import random

import pytest

from stark_anatomy_tpu.field.scalar import Field, FieldElement, P
from stark_anatomy_tpu.models.rescue_prime import RescuePrime
from stark_anatomy_tpu.protocols.stark import Stark

RNG = random.Random(0xFEED)
FIELD = Field.main()


def setup_stark():
    rp = RescuePrime()
    stark = Stark(
        field=FIELD,
        expansion_factor=4,
        num_colinearity_checks=2,
        security_level=2,
        num_registers=rp.m,
        num_cycles=rp.N + 1,
    )
    return rp, stark


def test_stark_prove_verify_and_reject():
    rp, stark = setup_stark()
    input_element = FIELD.sample(b"0xdeadbeef")
    for _ in range(2):
        output_element = rp.hash(input_element)
        trace = rp.trace(input_element)
        air = rp.transition_constraints(stark.omicron)
        boundary = rp.boundary_constraints(output_element)

        proof = stark.prove(trace, air, boundary)
        assert stark.verify(proof, air, boundary)

        # false claim: wrong output boundary must be rejected
        boundary_bad = rp.boundary_constraints(output_element + FIELD.one())
        assert not stark.verify(proof, air, boundary_bad)

        input_element = output_element


def test_stark_false_witness_crashes_prover():
    """The slow prover's exact division fails loudly on an invalid witness
    (reference contract: stark.py:98/111 + univariate.py:52)."""
    rp, stark = setup_stark()
    input_element = FIELD.sample(b"witness")
    output_element = rp.hash(input_element)
    trace = rp.trace(input_element)
    air = rp.transition_constraints(stark.omicron)
    boundary = rp.boundary_constraints(output_element)

    cycle = RNG.randrange(len(trace))
    register = RNG.randrange(rp.m)
    error = FieldElement(RNG.randrange(1, P), FIELD)
    trace[cycle][register] = trace[cycle][register] + error

    with pytest.raises(AssertionError):
        stark.prove(trace, air, boundary)
