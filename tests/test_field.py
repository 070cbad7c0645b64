"""Field arithmetic: scalar reference semantics + device limb kernels.

Mirrors the reference's known constants (algebra.py:96-114) and adds
kernel-vs-reference equivalence tests the reference lacks.
"""

import random

import numpy as np
import pytest

from stark_anatomy_tpu.field.scalar import Field, FieldElement, P, xgcd
from stark_anatomy_tpu.field import limbs as L
from stark_anatomy_tpu.field import ops as F

RNG = random.Random(0xBEEF)


def rand_ints(n):
    return [RNG.randrange(P) for _ in range(n)]


# ---------------------------------------------------------------------------
# scalar field
# ---------------------------------------------------------------------------

def test_field_constants():
    f = Field.main()
    assert f.p == 1 + 407 * (1 << 119)
    g = f.generator()
    assert g.value == 85408008396924667383611388730472331217
    # generator has order exactly 2^119
    assert (g ** (1 << 119)).value == 1
    assert (g ** (1 << 118)).value != 1


def test_primitive_nth_root():
    f = Field.main()
    for n in [1, 2, 4, 1024, 4096]:
        w = f.primitive_nth_root(n)
        assert (w ** n).value == 1
        if n > 1:
            assert (w ** (n // 2)).value != 1


def test_xgcd_inverse():
    f = Field.main()
    for v in rand_ints(10):
        a, b, g = xgcd(v, P)
        assert g == 1
        x = FieldElement(v, f)
        assert (x * x.inverse()).value == 1
        assert (x / x).value == 1


def test_scalar_ops_match_python_int():
    f = Field.main()
    for _ in range(20):
        a, b = RNG.randrange(P), RNG.randrange(1, P)
        fa, fb = FieldElement(a, f), FieldElement(b, f)
        assert (fa + fb).value == (a + b) % P
        assert (fa - fb).value == (a - b) % P
        assert (fa * fb).value == (a * b) % P
        assert (-fa).value == -a % P
        assert (fa ^ 5).value == pow(a, 5, P)


def test_sample_encoding():
    f = Field.main()
    # big-endian byte accumulation mod p (reference: algebra.py:116-120)
    assert f.sample(bytes([1, 0])).value == 256
    assert f.sample(b"").value == 0
    x = f.sample(bytes(range(32)))
    acc = 0
    for b in range(32):
        acc = (acc << 8) ^ b
    assert x.value == acc % P


def test_bytes_encoding_is_decimal_string():
    f = Field.main()
    x = FieldElement(12345678901234567890, f)
    assert bytes(x) == b"12345678901234567890"


# ---------------------------------------------------------------------------
# limb conversion
# ---------------------------------------------------------------------------

def test_limb_roundtrip():
    vals = [0, 1, P - 1] + rand_ints(17)
    arr = L.ints_to_array(vals, montgomery=False)
    assert arr.shape == (len(vals), L.NLIMBS)
    assert L.array_to_ints(arr, montgomery=False) == vals
    arr_m = L.ints_to_array(vals, montgomery=True)
    assert L.array_to_ints(arr_m, montgomery=True) == vals


def test_montgomery_constants():
    assert L.R == pow(2, 128, P)
    assert (P * -pow(P, -1, 1 << 128)) % (1 << 128) == L.NPRIME % (1 << 128) * P % (1 << 128) * 0 + (
        (P * L.NPRIME) % (1 << 128)
    )
    assert (P * L.NPRIME + 1) % (1 << 128) == 0


# ---------------------------------------------------------------------------
# device kernels vs scalar reference
# ---------------------------------------------------------------------------

def device_vals(vals):
    from stark_anatomy_tpu.utils.convert import device_from_ints

    return device_from_ints(vals)


def back(arr):
    from stark_anatomy_tpu.utils.convert import ints_from_device

    return ints_from_device(arr)


def test_mont_mul_matches_scalar():
    a = [0, 1, P - 1, 2] + rand_ints(60)
    b = [0, P - 1, 1, P - 2] + rand_ints(60)
    da, db = device_vals(a), device_vals(b)
    got = back(F.mont_mul(da, db))
    want = [(x * y) % P for x, y in zip(a, b)]
    assert got == want


def test_add_sub_neg():
    a = rand_ints(50) + [0, P - 1]
    b = rand_ints(50) + [P - 1, P - 1]
    da, db = device_vals(a), device_vals(b)
    assert back(F.add(da, db)) == [(x + y) % P for x, y in zip(a, b)]
    assert back(F.sub(da, db)) == [(x - y) % P for x, y in zip(a, b)]
    assert back(F.neg(da)) == [-x % P for x in a]


def test_pow_and_inverse():
    a = rand_ints(9) + [1]
    da = device_vals(a)
    assert back(F.mont_pow(da, 3)) == [pow(x, 3, P) for x in a]
    e = 180331931428153586757283157844700080811  # rescue alpha^{-1}
    assert back(F.mont_pow(da, e)) == [pow(x, e, P) for x in a]
    assert back(F.inv(da)) == [pow(x, P - 2, P) for x in a]


def test_to_from_mont_roundtrip():
    import jax.numpy as jnp

    vals = rand_ints(10)
    raw = jnp.asarray(L.ints_to_array(vals, montgomery=False).T)  # (8, n)
    m = F.to_mont(raw)
    assert L.array_to_ints(np.asarray(m).T, montgomery=True) == vals
    r = F.from_mont(m)
    assert L.array_to_ints(np.asarray(r).T, montgomery=False) == vals


def test_eq_iszero_mul_by_int():
    a = rand_ints(8)
    da = device_vals(a)
    assert bool(F.eq(da, da).all())
    assert not bool(F.is_zero(da).any())
    assert bool(F.is_zero(F.mont_zero(3)).all())
    assert back(F.mul_by_int(da, 7)) == [x * 7 % P for x in a]


def test_mont_mul_broadcasting():
    a = rand_ints(6)
    s = rand_ints(1)
    da = device_vals(a)          # (8, 6)
    ds = device_vals(s)          # (8, 1) broadcasts across elements
    got = back(F.mont_mul(da, ds))
    assert got == [(x * s[0]) % P for x in a]


def test_batch_inv_matches_fermat():
    """Montgomery batch inversion (the prover's inversion path) must agree
    with Fermat elementwise, including 0 -> 0, at non-divisible sizes."""
    import random

    import stark_anatomy_tpu.field.ops as F
    from stark_anatomy_tpu.field.scalar import P
    from stark_anatomy_tpu.utils.convert import device_from_ints, ints_from_device

    rng = random.Random(99)
    vals = [rng.randrange(P) for _ in range(500)] + [0, 1, P - 1, 0]
    x = device_from_ints(vals)
    got = ints_from_device(F.batch_inv(x))
    assert got == [pow(v, P - 2, P) if v else 0 for v in vals]


def test_pallas_mont_mul_matches_scalar():
    """The Pallas Montgomery kernel (the TPU hot-path lowering) must be
    bit-exact vs the scalar field; run through the Pallas interpreter so
    the exact kernel code is exercised on CPU."""
    import random

    import jax.numpy as jnp
    import numpy as np

    from stark_anatomy_tpu.field.limbs import R
    from stark_anatomy_tpu.field.pallas_kernels import BLOCK, mont_mul_pallas_core
    from stark_anatomy_tpu.field.scalar import P
    from stark_anatomy_tpu.utils.convert import device_from_ints, ints_from_device

    rng = random.Random(1234)
    n = BLOCK
    av = [rng.randrange(P) for _ in range(n)]
    bv = [rng.randrange(P) for _ in range(n)]
    a = device_from_ints(av)
    b = device_from_ints(bv)
    got = ints_from_device(mont_mul_pallas_core(a, b, interpret=True))
    # device arrays are Montgomery-encoded: mont_mul(aR, bR) = abR, so the
    # canonical decode of the result is exactly a*b mod p
    want = [x * y % P for x, y in zip(av, bv)]
    assert got == want

    # batched shape
    a2 = jnp.stack([a, b])
    b2 = jnp.stack([b, a])
    got2 = ints_from_device(mont_mul_pallas_core(a2, b2, interpret=True)[0])
    assert got2 == want
