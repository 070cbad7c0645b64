"""Vectorized field arithmetic over limb arrays (the device compute path).

LAYOUT: all device field arrays are LIMB-FIRST uint32 arrays of shape
(..., NLIMBS, n): the limb axis is second-to-last (maps to TPU sublanes,
exactly 8), the element axis is last (maps to the 128-wide lane dimension).

KERNEL STYLE: the Montgomery pipeline is written as fully unrolled
per-limb-row arithmetic — Python lists of (..., n) arrays combined with
elementwise ops and SCALAR constants, stacked back into a limb array once
at the end.  This shape matters enormously on TPU: pad/stack/concat ops
defeat XLA's elementwise fusion and materialize every intermediate to HBM
(measured ~100x slower), whereas the unrolled form fuses into a handful of
VPU loops.  Raw u32 multiply throughput on v5e is ~7 T ops/s, so fused
mont_mul is memory-bound at ~3 HBM passes per call.

Elements are in Montgomery form: x_enc = x * 2^128 mod p.  16-bit limbs
make every half-product fit uint32 exactly and let columns of up to 16 of
them accumulate carry-free.  mont_mul replaces the reference's Python
big-int ``(a*b) % p`` (reference: algebra.py:82-83) as the throughput
kernel of the whole framework.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from .limbs import LIMB_BITS, MASK, NLIMBS, NPRIME, ONE_MONT_LIMBS, int_to_limbs, R
from .scalar import P

_U32 = jnp.uint32
_MASK = np.uint32(MASK)
_P_LIMBS = [np.uint32(v) for v in int_to_limbs(P)]
_NP_LIMBS = [np.uint32(v) for v in int_to_limbs(NPRIME)]
_ONE16 = np.uint32(1 << LIMB_BITS)
_ONE = np.uint32(1)


def _rows(a: jnp.ndarray) -> List[jnp.ndarray]:
    return [a[..., k, :] for k in range(NLIMBS)]


def _stack(rows: List[jnp.ndarray]) -> jnp.ndarray:
    return jnp.stack(rows, axis=-2)


def _carry_rows(cols: List[jnp.ndarray]):
    """Carry-propagate a list of column sums; returns (limb rows, carry)."""
    limbs = []
    carry = None
    for c in cols:
        acc = c if carry is None else c + carry
        limbs.append(acc & _MASK)
        carry = acc >> LIMB_BITS
    return limbs, carry


def _mont_mul_rows(ar: List[jnp.ndarray], br: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Montgomery product on unrolled limb rows (the fusable core)."""
    # T = a * b: 17 columns of 16-bit half-products (each < 2^21)
    lo = [[None] * NLIMBS for _ in range(NLIMBS)]
    hi = [[None] * NLIMBS for _ in range(NLIMBS)]
    for i in range(NLIMBS):
        for j in range(NLIMBS):
            p = ar[i] * br[j]
            lo[i][j] = p & _MASK
            hi[i][j] = p >> LIMB_BITS
    t_cols: List[jnp.ndarray] = [None] * (2 * NLIMBS + 1)
    for i in range(NLIMBS):
        for j in range(NLIMBS):
            k = i + j
            t_cols[k] = lo[i][j] if t_cols[k] is None else t_cols[k] + lo[i][j]
            t_cols[k + 1] = hi[i][j] if t_cols[k + 1] is None else t_cols[k + 1] + hi[i][j]

    t_low, c8 = _carry_rows(t_cols[:NLIMBS])

    # m = (T mod R) * (-p^-1) mod R  — low product with scalar constants
    m_cols: List[jnp.ndarray] = [None] * NLIMBS
    for i in range(NLIMBS):
        for j in range(NLIMBS - i):
            p = t_low[i] * _NP_LIMBS[j]
            k = i + j
            l = p & _MASK
            m_cols[k] = l if m_cols[k] is None else m_cols[k] + l
            if k + 1 < NLIMBS:
                m_cols[k + 1] = (p >> LIMB_BITS) if m_cols[k + 1] is None else m_cols[k + 1] + (p >> LIMB_BITS)
    m_rows, _ = _carry_rows(m_cols)

    # U = T + m * p;  result = U >> 128, then conditional subtract
    u_cols: List[jnp.ndarray] = [None] * (2 * NLIMBS + 1)
    for i in range(NLIMBS):
        for j in range(NLIMBS):
            p = m_rows[i] * _P_LIMBS[j]
            k = i + j
            l = p & _MASK
            h = p >> LIMB_BITS
            u_cols[k] = l if u_cols[k] is None else u_cols[k] + l
            u_cols[k + 1] = h if u_cols[k + 1] is None else u_cols[k + 1] + h
    zero = jnp.zeros_like(ar[0])
    for k in range(2 * NLIMBS + 1):
        if u_cols[k] is None:
            u_cols[k] = zero
    for k in range(NLIMBS):
        u_cols[k] = u_cols[k] + t_low[k]
    for k in range(NLIMBS, 2 * NLIMBS + 1):
        if t_cols[k] is not None:
            u_cols[k] = u_cols[k] + t_cols[k]
    u_cols[NLIMBS] = u_cols[NLIMBS] + c8

    u_limbs, final_carry = _carry_rows(u_cols)
    r = u_limbs[NLIMBS : 2 * NLIMBS]
    overflow = u_limbs[2 * NLIMBS] + final_carry
    return _cond_sub_p_rows(r, overflow)


def _cond_sub_p_rows(r: List[jnp.ndarray], overflow: jnp.ndarray) -> List[jnp.ndarray]:
    """Reduce r (< 2p, possibly with a 2^128 overflow bit) into [0, p)."""
    d = []
    borrow = None
    for k in range(NLIMBS):
        tmp = r[k] + _ONE16 - _P_LIMBS[k]
        if borrow is not None:
            tmp = tmp - borrow
        d.append(tmp & _MASK)
        borrow = _ONE - (tmp >> LIMB_BITS)
    ge = jnp.logical_or(overflow.astype(bool), borrow == 0)
    return [jnp.where(ge, d[k], r[k]) for k in range(NLIMBS)]


@jax.jit
def mont_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product a*b*R^{-1} mod p over limb-first arrays."""
    a = jnp.asarray(a, _U32)
    b = jnp.asarray(b, _U32)
    a, b = jnp.broadcast_arrays(a, b)
    return _stack(_mont_mul_rows(_rows(a), _rows(b)))


def _add_rows(ar, br):
    out = []
    carry = None
    for k in range(NLIMBS):
        acc = ar[k] + br[k]
        if carry is not None:
            acc = acc + carry
        out.append(acc & _MASK)
        carry = acc >> LIMB_BITS
    return out, carry


def _sub_rows(ar, br):
    out = []
    borrow = None
    for k in range(NLIMBS):
        tmp = ar[k] + _ONE16 - br[k]
        if borrow is not None:
            tmp = tmp - borrow
        out.append(tmp & _MASK)
        borrow = _ONE - (tmp >> LIMB_BITS)
    return out, borrow


@jax.jit
def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Field addition (encoding-agnostic: works in Montgomery form too)."""
    a, b = jnp.broadcast_arrays(jnp.asarray(a, _U32), jnp.asarray(b, _U32))
    s, carry = _add_rows(_rows(a), _rows(b))
    return _stack(_cond_sub_p_rows(s, carry))


@jax.jit
def sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Field subtraction."""
    a, b = jnp.broadcast_arrays(jnp.asarray(a, _U32), jnp.asarray(b, _U32))
    ar, br = _rows(a), _rows(b)
    d, borrow = _sub_rows(ar, br)
    dp = []
    carry = None
    for k in range(NLIMBS):
        acc = d[k] + _P_LIMBS[k]
        if carry is not None:
            acc = acc + carry
        dp.append(acc & _MASK)
        carry = acc >> LIMB_BITS
    neg_needed = borrow.astype(bool)
    return _stack([jnp.where(neg_needed, dp[k], d[k]) for k in range(NLIMBS)])


def neg(a: jnp.ndarray) -> jnp.ndarray:
    return sub(jnp.zeros_like(a), a)


def mont_one(n: int = 1, batch=()) -> jnp.ndarray:
    """Montgomery-form ones of shape (*batch, NLIMBS, n)."""
    col = jnp.asarray(np.array(ONE_MONT_LIMBS, dtype=np.uint32))[:, None]
    return jnp.broadcast_to(col, tuple(batch) + (NLIMBS, n))


def mont_zero(n: int = 1, batch=()) -> jnp.ndarray:
    return jnp.zeros(tuple(batch) + (NLIMBS, n), dtype=_U32)


@jax.jit
def to_mont(a: jnp.ndarray) -> jnp.ndarray:
    """Canonical limbs -> Montgomery form (multiply by R^2, reduce)."""
    r2 = [np.uint32(v) for v in int_to_limbs(R * R % P)]
    ar = _rows(jnp.asarray(a, _U32))
    br = [jnp.broadcast_to(v, ar[0].shape) for v in r2]
    return _stack(_mont_mul_rows(ar, br))


@jax.jit
def from_mont(a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery form -> canonical limbs (multiply by 1, reduce)."""
    ar = _rows(jnp.asarray(a, _U32))
    one = [jnp.broadcast_to(np.uint32(1 if k == 0 else 0), ar[0].shape) for k in range(NLIMBS)]
    return _stack(_mont_mul_rows(ar, one))


def _pow_bits(exponent: int) -> np.ndarray:
    return np.array([int(c) for c in bin(exponent)[2:]], dtype=np.uint32)


@functools.partial(jax.jit, static_argnames=("exponent",))
def mont_pow(x: jnp.ndarray, exponent: int) -> jnp.ndarray:
    """x^exponent for a static integer exponent (square-and-multiply scan).

    Input and output are Montgomery-form limb arrays.  The exponent bits
    are baked in as a constant array and consumed by ``lax.scan``, so the
    traced graph contains a single square/multiply body regardless of
    exponent size (128-bit exponents like Rescue's alpha^{-1} stay cheap
    to compile; reference context: rescue_prime.py:150, algebra.py:38-45).
    """
    if exponent == 0:
        return jnp.broadcast_to(
            jnp.asarray(np.array(ONE_MONT_LIMBS, dtype=np.uint32))[:, None], x.shape
        )
    bits = jnp.asarray(_pow_bits(exponent))

    def step(acc, bit):
        sq = mont_mul(acc, acc)
        sq_mul = mont_mul(sq, x)
        return jnp.where(bit > 0, sq_mul, sq), None

    acc, _ = jax.lax.scan(step, jnp.broadcast_to(x, x.shape), bits[1:])
    return acc


def inv(x: jnp.ndarray) -> jnp.ndarray:
    """Batched field inversion by Fermat: x^(p-2).  0 maps to 0."""
    return mont_pow(x, P - 2)


def mul_by_int(a: jnp.ndarray, c: int) -> jnp.ndarray:
    """Multiply Montgomery-form a by a canonical integer constant c."""
    c_mont = jnp.asarray(np.array(int_to_limbs(c % P * R % P), dtype=np.uint32))[:, None]
    return mont_mul(a, jnp.broadcast_to(c_mont, a.shape))


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise field equality -> bool array with the limb axis reduced."""
    return jnp.all(a == b, axis=-2)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=-2)
