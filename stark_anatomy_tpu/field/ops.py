"""Vectorized field arithmetic over limb arrays (the device compute path).

LAYOUT: all device field arrays are LIMB-FIRST uint32 arrays of shape
(..., NLIMBS, n): the limb axis is second-to-last (maps to TPU sublanes,
exactly 8), the element axis is last (maps to the 128-wide lane dimension).
An (n, 8) element-major layout would put the 8-limb axis on the lane
dimension and waste 15/16 of the VPU and 16x the HBM footprint — measured
~16x slower on v5e.  Host<->device converters (utils/convert.py) transpose
at the boundary.

Elements are in Montgomery form: x_enc = x * 2^128 mod p.  The core
primitive is :func:`mont_mul` — product-scanning Montgomery multiplication
with deferred carries, built entirely from uint32 VPU ops (multiply,
shift, mask, add); 16-bit limbs make every half-product fit uint32 exactly
and let a column of up to 16 of them accumulate carry-free.  This replaces
the reference's Python big-int ``(a*b) % p`` (reference: algebra.py:82-83)
as the throughput kernel of the whole framework.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .limbs import LIMB_BITS, MASK, NLIMBS, NPRIME_LIMBS, ONE_MONT_LIMBS, P_LIMBS, R2_LIMBS
from .scalar import P

_U32 = jnp.uint32
_MASK = np.uint32(MASK)
_NCOLS = 2 * NLIMBS + 1  # columns of a full 8x8 limb product (+ carry headroom)


def _constant(limbs: np.ndarray) -> jnp.ndarray:
    """(NLIMBS,) host constant -> (NLIMBS, 1) broadcastable device column."""
    return jnp.asarray(limbs, dtype=_U32)[:, None]


def _pad_limb_axis(x: jnp.ndarray, lo: int, hi: int) -> jnp.ndarray:
    pad = [(0, 0)] * (x.ndim - 2) + [(lo, hi), (0, 0)]
    return jnp.pad(x, pad)


def _full_product_columns(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Column sums of the 2N-limb product a*b, carries deferred.

    a, b: (..., NLIMBS, n).  Returns (..., 2N+1, n) with column k = sum of
    16-bit half-products landing at weight 2^(16k); each column < 2^21.
    """
    prod = a[..., :, None, :] * b[..., None, :, :]      # (..., N, N, n)
    lo = prod & _MASK
    hi = prod >> LIMB_BITS
    cols = jnp.zeros(a.shape[:-2] + (_NCOLS,) + a.shape[-1:], dtype=_U32)
    for i in range(NLIMBS):
        cols = cols + _pad_limb_axis(lo[..., i, :, :], i, _NCOLS - NLIMBS - i)
        cols = cols + _pad_limb_axis(hi[..., i, :, :], i + 1, _NCOLS - NLIMBS - i - 1)
    return cols


def _low_product_limbs(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a*b) mod 2^128 as carry-propagated 16-bit limbs."""
    prod = a[..., :, None, :] * b[..., None, :, :]
    lo = prod & _MASK
    hi = prod >> LIMB_BITS
    cols = jnp.zeros(a.shape, dtype=_U32)
    for i in range(NLIMBS):
        cols = cols + _pad_limb_axis(lo[..., i, : NLIMBS - i, :], i, 0)
        if i + 1 < NLIMBS:
            cols = cols + _pad_limb_axis(hi[..., i, : NLIMBS - i - 1, :], i + 1, 0)
    limbs, _ = _carry_propagate(cols)
    return limbs


def _carry_propagate(cols: jnp.ndarray):
    """Propagate carries across the limb axis; returns (limbs, carry_out)."""
    ncols = cols.shape[-2]
    carry = jnp.zeros(cols.shape[:-2] + cols.shape[-1:], dtype=_U32)
    limbs = []
    for k in range(ncols):
        acc = cols[..., k, :] + carry
        limbs.append(acc & _MASK)
        carry = acc >> LIMB_BITS
    return jnp.stack(limbs, axis=-2), carry


def _sub_limbs(a: jnp.ndarray, b: jnp.ndarray):
    """a - b over 16-bit limbs; returns (difference mod 2^128, borrow_out)."""
    borrow = jnp.zeros(a.shape[:-2] + a.shape[-1:], dtype=_U32)
    limbs = []
    for k in range(NLIMBS):
        tmp = a[..., k, :] + np.uint32(1 << LIMB_BITS) - b[..., k, :] - borrow
        limbs.append(tmp & _MASK)
        borrow = np.uint32(1) - (tmp >> LIMB_BITS)
    return jnp.stack(limbs, axis=-2), borrow


def _add_limbs(a: jnp.ndarray, b: jnp.ndarray):
    carry = jnp.zeros(a.shape[:-2] + a.shape[-1:], dtype=_U32)
    limbs = []
    for k in range(NLIMBS):
        acc = a[..., k, :] + b[..., k, :] + carry
        limbs.append(acc & _MASK)
        carry = acc >> LIMB_BITS
    return jnp.stack(limbs, axis=-2), carry


def _cond_sub_p(r: jnp.ndarray, overflow: jnp.ndarray) -> jnp.ndarray:
    """Reduce r (< 2p, possibly with a 2^128 overflow bit) into [0, p)."""
    p = jnp.broadcast_to(_constant(P_LIMBS), r.shape)
    d, borrow = _sub_limbs(r, p)
    ge = jnp.logical_or(overflow.astype(bool), borrow == 0)
    return jnp.where(ge[..., None, :], d, r)


@jax.jit
def mont_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product a*b*R^{-1} mod p over limb-first arrays.

    Product scanning with deferred carries: one full 8x8 limb convolution
    for T = a*b, a low convolution for m = T*(-p^{-1}) mod R, one more for
    m*p, then (T + m*p) >> 128 and a conditional subtract.
    """
    a = jnp.asarray(a, _U32)
    b = jnp.asarray(b, _U32)
    a, b = jnp.broadcast_arrays(a, b)
    t_cols = _full_product_columns(a, b)                  # (..., 17, n)
    t_low, c8 = _carry_propagate(t_cols[..., :NLIMBS, :])  # exact low 128 bits

    nprime = jnp.broadcast_to(_constant(NPRIME_LIMBS), a.shape)
    m = _low_product_limbs(t_low, nprime)                  # (..., 8, n)

    mp_cols = _full_product_columns(m, jnp.broadcast_to(_constant(P_LIMBS), a.shape))
    u_cols = mp_cols + _pad_limb_axis(t_low, 0, _NCOLS - NLIMBS)
    high = t_cols[..., NLIMBS:, :]                         # (..., 9, n)
    u_cols = u_cols + _pad_limb_axis(
        high + _pad_limb_axis(c8[..., None, :], 0, NLIMBS), NLIMBS, 0
    )
    u_limbs, final_carry = _carry_propagate(u_cols)        # low 8 limbs == 0
    r = u_limbs[..., NLIMBS : 2 * NLIMBS, :]
    overflow = u_limbs[..., 2 * NLIMBS, :] + final_carry   # the 2^128 bit
    return _cond_sub_p(r, overflow)


@jax.jit
def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Field addition (encoding-agnostic: works in Montgomery form too)."""
    a, b = jnp.broadcast_arrays(jnp.asarray(a, _U32), jnp.asarray(b, _U32))
    s, carry = _add_limbs(a, b)
    return _cond_sub_p(s, carry)


@jax.jit
def sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Field subtraction."""
    a, b = jnp.broadcast_arrays(jnp.asarray(a, _U32), jnp.asarray(b, _U32))
    d, borrow = _sub_limbs(a, b)
    dp, _ = _add_limbs(d, jnp.broadcast_to(_constant(P_LIMBS), d.shape))
    return jnp.where(borrow.astype(bool)[..., None, :], dp, d)


def neg(a: jnp.ndarray) -> jnp.ndarray:
    return sub(jnp.zeros_like(a), a)


def mont_one(n: int = 1, batch=()) -> jnp.ndarray:
    """Montgomery-form ones of shape (*batch, NLIMBS, n)."""
    return jnp.broadcast_to(_constant(ONE_MONT_LIMBS), tuple(batch) + (NLIMBS, n))


def mont_zero(n: int = 1, batch=()) -> jnp.ndarray:
    return jnp.zeros(tuple(batch) + (NLIMBS, n), dtype=_U32)


@jax.jit
def to_mont(a: jnp.ndarray) -> jnp.ndarray:
    """Canonical limbs -> Montgomery form (multiply by R^2, reduce)."""
    return mont_mul(a, jnp.broadcast_to(_constant(R2_LIMBS), a.shape))


@jax.jit
def from_mont(a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery form -> canonical limbs (multiply by 1, reduce)."""
    one = jnp.zeros_like(a).at[..., 0, :].set(1)
    return mont_mul(a, one)


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
        return jnp.broadcast_to(_constant(ONE_MONT_LIMBS), x.shape)
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
    from .limbs import R, int_to_limbs

    c_mont = _constant(np.array(int_to_limbs(c % P * R % P), dtype=np.uint32))
    return mont_mul(a, jnp.broadcast_to(c_mont, a.shape))


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise field equality -> bool array with the limb axis reduced."""
    return jnp.all(a == b, axis=-2)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=-2)
