"""MiMC chain model: device/scalar equivalence + end-to-end proofs.

No reference analog — this is the framework's large-trace workload
(models/mimc.py); small parameters here keep the suite fast, the full-size
run lives behind the slow marker / bench harness.
"""

import random

import pytest

from stark_anatomy_tpu.field.scalar import Field, FieldElement, P
from stark_anatomy_tpu.models.mimc import (
    MiMC,
    make_stark,
    prove_chain,
    verify_chain,
)
from stark_anatomy_tpu.utils.convert import ints_from_device

FIELD = Field.main()
RNG = random.Random(0x11C)


def _small_stark(num_steps):
    return make_stark(
        num_steps, expansion_factor=4, num_colinearity_checks=4, security_level=8
    )


def test_device_trace_matches_scalar():
    mimc = MiMC(17)
    x = FieldElement(RNG.randrange(P), FIELD)
    cols = mimc.trace_columns(x.value)
    assert cols.shape[0] == 1 and cols.shape[-1] == 18
    got = ints_from_device(cols[0])
    want = [row[0].value for row in mimc.trace(x)]
    assert got == want
    assert mimc.forward(x).value == want[-1]


def test_point_air_matches_symbolic():
    mimc = MiMC(4)
    air = mimc.transition_constraints()
    pe = mimc.point_air()
    for _ in range(4):
        x = FieldElement(RNG.randrange(P), FIELD)
        cur = [FieldElement(RNG.randrange(P), FIELD)]
        nxt = [FieldElement(RNG.randrange(P), FIELD)]
        want = [tc.evaluate([x] + cur + nxt).value for tc in air]
        got = [v.value for v in pe(x, cur, nxt)]
        assert got == want


def test_prove_verify_roundtrip():
    mimc, stark = _small_stark(15)
    x = FieldElement(RNG.randrange(P), FIELD)
    output, proof, tz = prove_chain(mimc, stark, x)
    assert output.value == mimc.forward(x).value
    assert verify_chain(mimc, stark, x, output, proof, tz.root)

    # wrong output boundary must be rejected
    bad = output + FIELD.one()
    assert not verify_chain(mimc, stark, x, bad, proof, tz.root)

    # wrong input boundary must be rejected
    bad_in = x + FIELD.one()
    assert not verify_chain(mimc, stark, bad_in, output, proof, tz.root)


def test_proof_tampering_rejected():
    mimc, stark = _small_stark(15)
    x = FieldElement(RNG.randrange(P), FIELD)
    output, proof, tz = prove_chain(mimc, stark, x)
    mutated = bytearray(proof)
    mutated[len(mutated) // 2] ^= 0x01
    try:
        ok = verify_chain(mimc, stark, x, output, bytes(mutated), tz.root)
    except Exception:
        ok = False  # a decode error is an acceptable rejection
    assert not ok


@pytest.mark.slow
def test_mimc_large_trace_end_to_end():
    """BASELINE north-star shape: a fast_stark proof of a LONG MiMC chain
    at full 128-bit parameters.  Step count adapts to the platform:
    2^20 on TPU (the BASELINE target), 2^14 on CPU so the test stays
    runnable in this environment (same code path, smaller domain);
    override with STARK_TPU_MIMC_STEPS."""
    import os
    import time

    import jax

    default_steps = 1 << 20 if jax.default_backend() in ("tpu", "axon") else 1 << 14
    steps = int(os.environ.get("STARK_TPU_MIMC_STEPS", default_steps))
    mimc, stark = make_stark(steps, 4, 64, 128)

    t0 = time.time()
    tz = stark.preprocess()
    t_pre = time.time() - t0
    x = FieldElement(RNG.randrange(P), FIELD)
    t0 = time.time()
    out, proof, _ = prove_chain(mimc, stark, x, tz)
    t_prove = time.time() - t0
    t0 = time.time()
    ok = verify_chain(mimc, stark, x, out, proof, tz.root)
    t_verify = time.time() - t0
    print(
        f"\nMiMC 2^{steps.bit_length()-1}: preprocess {t_pre:.1f}s "
        f"prove {t_prove:.1f}s verify {t_verify:.2f}s "
        f"proof {len(proof)/1024:.0f} kB\n{stark.timer.report()}"
    )
    assert ok
    # gap-free attribution: the phase table must account for the prover's
    # wall clock (round-3 verdict: ~45% of the 2^20 prove was invisible
    # to the profiler).  First-prove includes compile/trace time the
    # phases rightly DON'T cover, so check a steady-state prove.
    stark.timer.totals.clear()
    stark.timer.counts.clear()
    t0 = time.time()
    prove_chain(mimc, stark, x, tz)
    wall = time.time() - t0
    attributed = sum(stark.timer.totals.values())
    assert attributed > 0.8 * wall, (
        f"phase table ({attributed:.2f}s) does not cover the prove wall "
        f"clock ({wall:.2f}s)"
    )
    # false-output rejection at scale
    assert not verify_chain(mimc, stark, x, out + FIELD.one(), proof, tz.root)


def test_device_trace_chunked_path_matches_scalar():
    """Step counts divisible by the scan CHUNK take the unrolled-body
    path (models/mimc.py trace_columns); must match the scalar chain."""
    mimc = MiMC(64)
    x = FieldElement(RNG.randrange(P), FIELD)
    got = ints_from_device(mimc.trace_columns(x.value)[0])
    want = [row[0].value for row in mimc.trace(x)]
    assert got == want
