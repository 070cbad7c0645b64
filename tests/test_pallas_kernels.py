"""Pallas kernel equivalence tests (via the interpreter on CPU).

The fused-VMEM butterfly kernel, the four-step decomposition and the
prefix zerofier are the large-trace hot paths; on CPU the live dispatch
skips them (field/pallas_kernels.py:pallas_available), so these tests
drive the kernels explicitly through ``interpret=True`` and compare
bit-exactly against the scan-based reference path.  Round-2 advisory:
these paths previously shipped untested, which is how the prefix_zerofier
power-of-two crash reached the bench.
"""

import random

import jax.numpy as jnp

from stark_anatomy_tpu.field import ops as F
from stark_anatomy_tpu.field.pallas_kernels import mont_mul_pallas_core
from stark_anatomy_tpu.field.pallas_ntt import (
    four_step_core,
    fused_stages,
    split_four_step,
    stage_twiddles,
)
from stark_anatomy_tpu.field.scalar import Field, P
from stark_anatomy_tpu.ops import ntt as NTT
from stark_anatomy_tpu.ops.domain import DOMAINS
from stark_anatomy_tpu.poly.host_ntt import host_zerofier
from stark_anatomy_tpu.utils.convert import device_from_ints, ints_from_device

RNG = random.Random(0xA11A5)


def _rand_mont(n: int) -> jnp.ndarray:
    return device_from_ints([RNG.randrange(P) for _ in range(n)])


def test_mont_mul_pallas_matches_ops():
    n = 512
    a, b = _rand_mont(n), _rand_mont(n)
    got = mont_mul_pallas_core(a, b, interpret=True)
    want = F.mont_mul(a, b)
    assert jnp.array_equal(got, want)


def test_fused_stages_matches_scan_ntt():
    """One fused-VMEM program over all butterfly stages == the scan NTT."""
    for n in (128, 512):
        dom = DOMAINS.get(n)
        x = _rand_mont(n)
        want = NTT._ntt_core_jit(x, dom["bitrev"], dom["fwd_powers"], None)
        xb = jnp.take(x, dom["bitrev"], axis=-1)
        got = fused_stages(
            xb, stage_twiddles(dom["fwd_powers"], n), interpret=True
        )
        assert jnp.array_equal(got, want), n


def test_fused_stages_batched_with_post():
    """Batched input + fused post-multiply (the four-step cross twiddle
    contraction) against the unfused sequence."""
    n = 128
    B = 4
    dom = DOMAINS.get(n)
    x = jnp.stack([_rand_mont(n) for _ in range(B)])          # (B, L, n)
    post = jnp.stack([_rand_mont(n) for _ in range(B)])
    w = stage_twiddles(dom["fwd_powers"], n)
    xb = jnp.take(x, dom["bitrev"], axis=-1)
    want = F.mont_mul(fused_stages(xb, w, interpret=True), post)
    got = fused_stages(xb, w, post=post, interpret=True)
    assert jnp.array_equal(got, want)


import pytest


@pytest.mark.slow
def test_four_step_core_matches_ntt():
    """Four-step (Bailey) decomposition == the direct scan NTT, both
    directions, at the smallest size the live dispatch uses it for.

    slow-marked: the interpret-mode lowering of the two 7-stage fused
    kernels costs ~25 min of XLA:CPU compile (and does not land in the
    persistent cache), so it runs with -m slow; the components it
    composes (fused_stages with/without post-multiply) are covered
    un-marked above, and the composed path is exercised bit-exactly on
    real TPU by the NTT tests under STARK_TPU_TEST_PLATFORM=tpu."""
    n = NTT._FOUR_STEP_MIN                                    # 2^14
    n1, n2 = split_four_step(n)
    x = _rand_mont(n)
    for inverse in (False, True):
        t = NTT._four_step_tables(n, inverse)
        got = four_step_core(
            x,
            t["bitrev1"],
            t["w1"],
            t["cross"],
            t["bitrev2"],
            t["w2"],
            n1,
            n2,
            interpret=True,
        )
        if inverse:
            got = F.mont_mul(got, t["n_inv"])
        want = NTT.ntt(x, inverse=inverse)                    # scan path on CPU
        assert jnp.array_equal(got, want), inverse


def test_prefix_zerofier_matches_host_above_thresholds():
    """Counts straddling the host/device crossover (HOST_ZEROFIER_MAX) and
    the non-power-of-two table sizes that crashed in round 2."""
    f = Field.main()
    root = f.primitive_nth_root(1 << 13).value
    for count in (1500, 2049, 4096):
        pts, acc = [], 1
        for _ in range(count):
            pts.append(acc)
            acc = acc * root % P
        want = host_zerofier(pts)
        got = ints_from_device(NTT.prefix_zerofier(root, count))
        assert got == want, count
