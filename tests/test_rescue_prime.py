"""Rescue-Prime tests: the reference's known-answer vectors
(test_rescue_prime.py:8-9), trace boundary check, AIR satisfaction on a
valid trace and rejection of perturbed traces — plus device-kernel
equivalence tests the reference has no analog for."""

import random

import jax.numpy as jnp

from stark_anatomy_tpu.field.scalar import Field, FieldElement, P
from stark_anatomy_tpu.models.rescue_prime import RescuePrime, hash_batch, trace_batch
from stark_anatomy_tpu.utils.convert import device_from_ints, ints_from_device

RNG = random.Random(31337)
FIELD = Field.main()

VEC1_IN, VEC1_OUT = 1, 244180265933090377212304188905974087294
VEC2_IN, VEC2_OUT = (
    57322816861100832358702415967512842988,
    89633745865384635541695204788332415101,
)


def test_hash_vectors():
    rp = RescuePrime()
    assert rp.hash(FieldElement(VEC1_IN, FIELD)).value == VEC1_OUT
    assert rp.hash(FieldElement(VEC2_IN, FIELD)).value == VEC2_OUT


def test_trace_boundaries():
    rp = RescuePrime()
    a = FieldElement(VEC2_IN, FIELD)
    trace = rp.trace(a)
    assert len(trace) == rp.N + 1
    assert trace[0][0].value == VEC2_IN
    assert trace[0][1].value == 0
    assert trace[-1][0].value == VEC2_OUT


def test_air_satisfied_on_valid_trace():
    rp = RescuePrime()
    omicron = FIELD.primitive_nth_root(1 << 10)
    air = rp.transition_constraints(omicron)
    trace = rp.trace(FieldElement(VEC2_IN, FIELD))
    for o in range(len(trace) - 1):
        point = (
            [omicron ** o]
            + [trace[o][0], trace[o][1]]
            + [trace[o + 1][0], trace[o + 1][1]]
        )
        for poly in air:
            assert poly.evaluate(point).value == 0


def test_air_rejects_perturbed_trace():
    rp = RescuePrime()
    omicron = FIELD.primitive_nth_root(1 << 10)
    air = rp.transition_constraints(omicron)
    trace = rp.trace(FieldElement(VEC2_IN, FIELD))
    for _ in range(6):
        register = RNG.randrange(rp.m)
        cycle = RNG.randrange(rp.N + 1)
        value = FieldElement(RNG.randrange(1, P), FIELD)
        bad = [list(row) for row in trace]
        bad[cycle][register] = bad[cycle][register] + value
        # at least one constraint at an adjacent step must fail
        broken = False
        for o in range(len(bad) - 1):
            point = (
                [omicron ** o]
                + [bad[o][0], bad[o][1]]
                + [bad[o + 1][0], bad[o + 1][1]]
            )
            for poly in air:
                if poly.evaluate(point).value != 0:
                    broken = True
        assert broken


def test_device_hash_matches_scalar():
    rp = RescuePrime()
    inputs = [VEC1_IN, VEC2_IN] + [RNG.randrange(P) for _ in range(6)]
    out = ints_from_device(hash_batch(device_from_ints(inputs)))
    want = [rp.hash(FieldElement(v, FIELD)).value for v in inputs]
    assert out == want
    assert out[0] == VEC1_OUT and out[1] == VEC2_OUT


def test_device_trace_matches_scalar():
    rp = RescuePrime()
    inputs = [VEC2_IN, RNG.randrange(P)]
    traces = trace_batch(device_from_ints(inputs))
    # limb-first layout: (n_cycles, m, NLIMBS, B)
    assert traces.shape == (rp.N + 1, rp.m, 8, len(inputs))
    for b, v in enumerate(inputs):
        want = rp.trace(FieldElement(v, FIELD))
        got = ints_from_device(traces[..., b : b + 1])
        flat_want = [cell.value for row in want for cell in row]
        assert got == flat_want


def test_point_air_matches_symbolic():
    """make_point_air (the verifier's factored evaluator) must agree with
    the symbolic MPolynomial constraints at random points."""
    from stark_anatomy_tpu.models.rescue_prime import make_point_air
    from stark_anatomy_tpu.protocols.stark import StarkParams

    rp = RescuePrime()
    stark = StarkParams(FIELD, 4, 64, 128, rp.m, rp.N + 1, transition_constraints_degree=3)
    air = rp.transition_constraints(stark.omicron)
    evaluator = make_point_air(stark)
    for _ in range(4):
        x = FieldElement(RNG.randrange(P), FIELD)
        cur = [FieldElement(RNG.randrange(P), FIELD) for _ in range(rp.m)]
        nxt = [FieldElement(RNG.randrange(P), FIELD) for _ in range(rp.m)]
        want = [tc.evaluate([x] + cur + nxt).value for tc in air]
        got = [v.value for v in evaluator(x, cur, nxt)]
        assert got == want
