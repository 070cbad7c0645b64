"""NTT kernels: device vs scalar reference equivalence.

Mirrors the reference's test_ntt.py property suite (ntt == evaluate_domain,
intt inverse, fast_multiply == schoolbook, coset divide recovers factors,
coset evaluation == naive) against the device kernels.
"""

import random

import jax.numpy as jnp
import numpy as np

from stark_anatomy_tpu.field import limbs as L
from stark_anatomy_tpu.field import ops as F
from stark_anatomy_tpu.field.scalar import Field, FieldElement, P
from stark_anatomy_tpu.ops import ntt as D
from stark_anatomy_tpu.poly.host_ntt import intt_ints, ntt_ints
from stark_anatomy_tpu.poly.univariate import Polynomial

RNG = random.Random(1234)
FIELD = Field.main()


def rand_ints(n):
    return [RNG.randrange(P) for _ in range(n)]


from stark_anatomy_tpu.utils.convert import device_from_ints, ints_from_device


def dev(vals):
    return device_from_ints(vals)


def back(arr):
    return ints_from_device(arr)


def poly(vals):
    return Polynomial.from_ints(vals, FIELD)


def test_ntt_matches_evaluate_domain():
    n = 32
    omega = FIELD.primitive_nth_root(n)
    coeffs = rand_ints(n)
    got = back(D.ntt(dev(coeffs)))
    domain = [omega ** i for i in range(n)]
    want = [v.value for v in poly(coeffs).evaluate_domain(domain)]
    assert got == want


def test_host_ntt_matches_device():
    n = 64
    omega = FIELD.primitive_nth_root(n).value
    coeffs = rand_ints(n)
    assert ntt_ints(coeffs, omega) == back(D.ntt(dev(coeffs)))
    evals = rand_ints(n)
    assert intt_ints(evals, omega) == back(D.intt(dev(evals)))


def test_intt_inverts_ntt():
    for n in [1, 2, 8, 128]:
        coeffs = rand_ints(n)
        assert back(D.intt(D.ntt(dev(coeffs)))) == coeffs


def test_batched_ntt():
    n, b = 16, 3
    rows = [rand_ints(n) for _ in range(b)]
    batch = jnp.stack([dev(r) for r in rows])
    out = D.ntt(batch)
    for i in range(b):
        assert back(out[i]) == back(D.ntt(dev(rows[i])))


def test_poly_multiply_matches_schoolbook():
    for _ in range(5):
        la, lb = RNG.randrange(1, 20), RNG.randrange(1, 20)
        a, b = rand_ints(la), rand_ints(lb)
        got = back(D.poly_multiply(dev(a), dev(b)))
        want = poly(a) * poly(b)
        want_c = [c.value for c in want.coefficients]
        assert got == want_c


def test_coset_evaluate_matches_naive():
    n, order = 8, 32
    offset = FIELD.generator()
    omega = FIELD.primitive_nth_root(order)
    coeffs = rand_ints(n)
    got = back(D.coset_evaluate(dev(coeffs), offset.value, order))
    pts = [offset * (omega ** i) for i in range(order)]
    want = [v.value for v in poly(coeffs).evaluate_domain(pts)]
    assert got == want


def test_coset_interpolate_roundtrip():
    order = 64
    offset = FIELD.generator()
    coeffs = rand_ints(order)
    lde = D.coset_evaluate(dev(coeffs), offset.value, order)
    assert back(D.coset_interpolate(lde, offset.value)) == coeffs


def test_coset_divide_recovers_factor():
    for _ in range(3):
        da, db = RNG.randrange(1, 10), RNG.randrange(1, 10)
        a = rand_ints(da) + [1]  # monic-ish, nonzero
        b = rand_ints(db) + [1]
        prod = poly(a) * poly(b)
        prod_c = [c.value for c in prod.coefficients]
        order = 64
        got = back(
            D.coset_divide(
                dev(prod_c), dev(b), FIELD.generator().value, order, out_len=len(a)
            )
        )
        assert got == a


def test_evaluate_domain_horner():
    coeffs = rand_ints(10)
    points = rand_ints(7)
    got = back(D.evaluate_domain_horner(dev(coeffs), dev(points)))
    want = [
        poly(coeffs).evaluate(FieldElement(x, FIELD)).value for x in points
    ]
    assert got == want


def test_zerofier_product_tree():
    for n in [1, 2, 3, 7, 8, 13]:
        pts = rand_ints(n)
        got = back(D.zerofier(dev(pts)))
        want = Polynomial.zerofier_domain([FieldElement(x, FIELD) for x in pts])
        assert got == [c.value for c in want.coefficients]


def test_prefix_zerofier_evals():
    """Rolling-evaluation zerofier (the large-trace preprocessing kernel)
    vs direct evaluation of the coefficient zerofier, across domains,
    offsets, roll units and counts incl. the full-domain edge case."""
    from stark_anatomy_tpu.ops.domain import DOMAINS, mont_const

    gen = FIELD.generator().value
    for Dlen, unit, count, offset in [
        (64, 1, 5, 1), (64, 4, 13, 1), (128, 4, 32, gen),
        (64, 2, 17, 3), (256, 1, 255, 1), (64, 1, 64, 1), (64, 1, 1, 7),
    ]:
        omega_D = FIELD.primitive_nth_root(Dlen).value
        root = pow(omega_D, unit, P)
        y = F.mont_mul(DOMAINS.get(Dlen)["fwd_powers"], mont_const(offset))
        got = back(D.prefix_zerofier_evals(y, root, unit, count))
        zpoly = Polynomial.zerofier_domain(
            [FieldElement(pow(root, i, P), FIELD) for i in range(count)]
        )
        want = [
            zpoly.evaluate(FieldElement(offset * pow(omega_D, j, P) % P, FIELD)).value
            for j in range(Dlen)
        ]
        assert got == want, (Dlen, unit, count, offset)


def test_power_table():
    from stark_anatomy_tpu.ops.domain import power_table

    base = RNG.randrange(P)
    tab = back(power_table(base, 16))
    assert tab == [pow(base, i, P) for i in range(16)]


def test_interpolate_generic_roundtrip():
    from stark_anatomy_tpu.ops.interpolate import interpolate_generic

    for n in [1, 2, 5, 16]:
        pts = rand_ints(n)
        vals = rand_ints(n)
        coeffs = back(interpolate_generic(dev(pts), dev(vals)))
        polyn = Polynomial.from_ints(coeffs, FIELD)
        for x, v in zip(pts, vals):
            assert polyn.evaluate(FieldElement(x, FIELD)).value == v
        assert polyn.degree() < n
