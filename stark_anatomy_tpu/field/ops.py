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
import os
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from .limb_arith import (
    add_rows as _add_rows_impl,
    cond_sub_p_rows as _cond_sub_impl,
    sub_mod_rows as _sub_mod_impl,
    sub_rows as _sub_rows_impl,
)
from .limbs import LIMB_BITS, MASK, NLIMBS, NPRIME, ONE_MONT_LIMBS, int_to_limbs, R
from .scalar import P

_U32 = jnp.uint32
_MASK = np.uint32(MASK)
_P_LIMBS = [np.uint32(v) for v in int_to_limbs(P)]
_NP_LIMBS = [np.uint32(v) for v in int_to_limbs(NPRIME)]
_ONE16 = np.uint32(1 << LIMB_BITS)
_ONE = np.uint32(1)


def _use_compact() -> bool:
    """Pick the mont_mul lowering at trace time.

    The fully-unrolled row form below fuses beautifully on TPU but its
    ~900-op graph makes XLA:CPU compile time explode when the prover core
    instantiates it dozens of times.  On CPU we therefore trace a compact
    tensorized form (~40 ops: outer product + constant-matrix column sums
    + lax.scan carry chains) that computes the identical function.
    """
    env = os.environ.get("STARK_TPU_COMPACT_MUL")
    if env is not None:
        return env == "1"
    return jax.default_backend() == "cpu"


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
    """Reduce r (< 2p, possibly with a 2^128 overflow bit) into [0, p)
    (shared implementation: field/limb_arith.py)."""
    return _cond_sub_impl(r, overflow)


# ---------------------------------------------------------------------------
# Compact (small-graph) Montgomery multiply — the CPU lowering.
#
# Column sums over limb products are expressed as one integer einsum with a
# constant 0/1 matrix (k = i+j for the low halves, k = i+j+1 for the highs);
# carry propagation is a lax.scan over the limb axis.  Bounds: every column
# accumulates at most 16 values < 2^16 plus a small carry, well inside u32.
# ---------------------------------------------------------------------------

_S_LO = np.zeros((2 * NLIMBS + 1, NLIMBS * NLIMBS), dtype=np.uint32)
_S_HI = np.zeros((2 * NLIMBS + 1, NLIMBS * NLIMBS), dtype=np.uint32)
for _i in range(NLIMBS):
    for _j in range(NLIMBS):
        _S_LO[_i + _j, _i * NLIMBS + _j] = 1
        _S_HI[_i + _j + 1, _i * NLIMBS + _j] = 1
_NP_COL = np.array(int_to_limbs(NPRIME), dtype=np.uint32)  # (NLIMBS,)
_P_COL = np.array(int_to_limbs(P), dtype=np.uint32)


def _carry_scan(cols: jnp.ndarray):
    """Carry-propagate (..., K, n) column sums -> (limbs, carry (..., n))."""
    xs = jnp.moveaxis(cols, -2, 0)

    def step(carry, c):
        acc = c + carry
        return acc >> LIMB_BITS, acc & _MASK

    carry, limbs = jax.lax.scan(step, jnp.zeros_like(xs[0]), xs)
    return jnp.moveaxis(limbs, 0, -2), carry


def _prod_cols(a: jnp.ndarray, b_col: jnp.ndarray, k_out: int) -> jnp.ndarray:
    """Column sums of the double-width product of two limb tensors.

    a: (..., NLIMBS, n); b_col either (..., NLIMBS, n) or a (NLIMBS,) constant.
    Returns (..., k_out, n) uncarried columns.
    """
    if b_col.ndim == 1:
        bb = b_col[:, None]
        prod = a[..., :, None, :] * bb[None, :, :]
    else:
        prod = a[..., :, None, :] * b_col[..., None, :, :]
    flat = prod.reshape(prod.shape[:-3] + (NLIMBS * NLIMBS, prod.shape[-1]))
    lo = flat & _MASK
    hi = flat >> LIMB_BITS
    s_lo = jnp.asarray(_S_LO[:k_out])
    s_hi = jnp.asarray(_S_HI[:k_out])
    return jnp.einsum("kq,...qn->...kn", s_lo, lo) + jnp.einsum(
        "kq,...qn->...kn", s_hi, hi
    )


def _mont_mul_compact(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    t_cols = _prod_cols(a, b, 2 * NLIMBS + 1)                 # T = a*b
    t_low, _ = _carry_scan(t_cols[..., :NLIMBS, :])           # T mod 2^128
    m_cols = _prod_cols(t_low, jnp.asarray(_NP_COL), NLIMBS)  # m = T*N' mod R
    m_rows, _ = _carry_scan(m_cols)
    u_cols = _prod_cols(m_rows, jnp.asarray(_P_COL), 2 * NLIMBS + 1) + t_cols
    u_limbs, final_carry = _carry_scan(u_cols)                # U = T + m*p
    r = u_limbs[..., NLIMBS : 2 * NLIMBS, :]
    overflow = u_limbs[..., 2 * NLIMBS, :] + final_carry
    return _stack(_cond_sub_p_rows(_rows(r), overflow))


def _use_pallas() -> bool:
    """Opt-in Pallas lowering (STARK_TPU_PALLAS=1).

    OFF by default after round-4 measurement: on this TPU stack XLA's own
    fusion of the unrolled row pipeline runs at HBM speed (~0.12 ms for a
    full 2^20 multiply), while the Mosaic-compiled kernel runs the same
    arithmetic ~3.6x slower (tools/kernel_probe2.py, difference-method
    timing).  The kernel is kept for comparison benchmarks only.
    """
    if os.environ.get("STARK_TPU_PALLAS") != "1":
        return False
    from .pallas_kernels import pallas_available

    return pallas_available()


def _mont_mul_core(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Dispatch: compact form (CPU) or the XLA-fused unrolled row form
    (TPU — measured at HBM speed, see _use_pallas)."""
    if _use_compact():
        return _mont_mul_compact(a, b)
    if _use_pallas():
        from .pallas_kernels import BLOCK, mont_mul_pallas_core

        if a.shape[-1] % BLOCK == 0 and a.shape == b.shape:
            return mont_mul_pallas_core(a, b)
    return _stack(_mont_mul_rows(_rows(a), _rows(b)))


@jax.jit
def mont_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product a*b*R^{-1} mod p over limb-first arrays."""
    a = jnp.asarray(a, _U32)
    b = jnp.asarray(b, _U32)
    a, b = jnp.broadcast_arrays(a, b)
    return _mont_mul_core(a, b)


_add_rows = _add_rows_impl
_sub_rows = _sub_rows_impl


def _add_core(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    a, b = jnp.broadcast_arrays(jnp.asarray(a, _U32), jnp.asarray(b, _U32))
    s, carry = _add_rows(_rows(a), _rows(b))
    return _stack(_cond_sub_p_rows(s, carry))


@jax.jit
def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Field addition (encoding-agnostic: works in Montgomery form too)."""
    return _add_core(a, b)


@jax.jit
def field_sum(terms: jnp.ndarray) -> jnp.ndarray:
    """Modular sum over the LEADING axis, via lax.scan.

    IMPORTANT fusion note: a Python loop of ``add(acc, t)`` inside one jit
    is a correctness-preserving but performance-catastrophic graph — each
    add consumes ``acc`` through 8 per-limb slices, and XLA's loop fusion
    recomputes the producer per consumer, giving ~8x runtime per chain
    link (measured: 5 chained adds ~0.5s, 7 adds ~33s on CPU at N=512).
    A scan keeps exactly one instance of the add body regardless of K.
    """
    if terms.shape[0] == 1:
        return terms[0]

    def step(acc, t):
        return _add_core(acc, t), None

    acc, _ = jax.lax.scan(step, terms[0], terms[1:])
    return acc


@jax.jit
def weighted_sum(terms: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """sum_k weights[k] * terms[k] over the leading axis (Montgomery).

    terms: (K, ..., NLIMBS, n); weights: (K, ..., NLIMBS, 1) broadcastable.
    This is THE combination kernel (weighted codeword combination,
    reference: fast_stark.py:130-145) in a fusion-safe, shardable form.
    """
    return field_sum(mont_mul(terms, weights))


@jax.jit
def sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Field subtraction (shared row math: field/limb_arith.py)."""
    a, b = jnp.broadcast_arrays(jnp.asarray(a, _U32), jnp.asarray(b, _U32))
    return _stack(_sub_mod_impl(_rows(a), _rows(b)))


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
    a = jnp.asarray(a, _U32)
    r2 = np.array(int_to_limbs(R * R % P), dtype=np.uint32)[:, None]
    b = jnp.broadcast_to(jnp.asarray(r2), a.shape)
    return _mont_mul_core(a, b)


@jax.jit
def from_mont(a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery form -> canonical limbs (multiply by 1, reduce)."""
    a = jnp.asarray(a, _U32)
    one = np.zeros((NLIMBS, 1), dtype=np.uint32)
    one[0, 0] = 1
    b = jnp.broadcast_to(jnp.asarray(one), a.shape)
    return _mont_mul_core(a, b)


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


@jax.jit
def batch_inv(x: jnp.ndarray) -> jnp.ndarray:
    """Elementwise inversion via Montgomery's batch trick: ~3 multiplies
    per element instead of Fermat's ~256 (mont_pow scan over p-2's bits).

    The last axis is split into blocks of G = 256 lanes; a forward scan
    of length G accumulates running prefix products (vectorized across
    blocks), ONE Fermat inversion handles the N/G block totals, and a
    backward scan peels per-element inverses:  inv(x_i) = t_i * p_{i-1},
    t_{i-1} = t_i * x_i.  Zeros map to zero (Fermat-compatible): zero
    inputs are masked to one for the products and zeroed at the end.
    """
    n = x.shape[-1]
    G = 256
    while n % G and G > 1:
        G //= 2
    B = n // G

    zero_mask = is_zero(x)                                     # (..., n)
    ones = jnp.broadcast_to(
        jnp.asarray(np.array(ONE_MONT_LIMBS, dtype=np.uint32))[:, None], x.shape
    )
    safe = jnp.where(zero_mask[..., None, :], ones, x)

    blocks = safe.reshape(safe.shape[:-1] + (B, G))            # (..., L, B, G)
    xs = jnp.moveaxis(blocks, -1, 0)                           # (G, ..., L, B)

    def fwd(carry, xi):
        nxt = _mont_mul_core(carry, xi)
        return nxt, carry                                      # prefix BEFORE xi

    init = jnp.broadcast_to(
        jnp.asarray(np.array(ONE_MONT_LIMBS, dtype=np.uint32))[:, None],
        xs.shape[1:],
    )
    total, prefix_before = jax.lax.scan(fwd, init, xs)         # total: (..., L, B)

    inv_total = mont_pow(total, P - 2)

    def bwd(t, inp):
        xi, pb = inp
        inv_xi = _mont_mul_core(t, pb)
        return _mont_mul_core(t, xi), inv_xi

    _, invs = jax.lax.scan(bwd, inv_total, (xs, prefix_before), reverse=True)
    out = jnp.moveaxis(invs, 0, -1).reshape(x.shape)           # (..., L, n)
    return jnp.where(zero_mask[..., None, :], jnp.zeros_like(out), out)


def mul_by_int(a: jnp.ndarray, c: int) -> jnp.ndarray:
    """Multiply Montgomery-form a by a canonical integer constant c."""
    c_mont = jnp.asarray(np.array(int_to_limbs(c % P * R % P), dtype=np.uint32))[:, None]
    return mont_mul(a, jnp.broadcast_to(c_mont, a.shape))


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise field equality -> bool array with the limb axis reduced."""
    return jnp.all(a == b, axis=-2)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=-2)
