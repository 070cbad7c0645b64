"""Device NTT kernels: the throughput core of the prover.

Two lowerings of the same bit-exact transform:

* ``stage_ntt.staged_ntt`` — the HOT path for n >= MIN_STAGED: a
  four-step decomposition built from XLA-fused radix-4 butterfly passes
  over packed 16-byte elements (see ops/stage_ntt.py for the measured
  design rationale; it replaced the round-2/3 Pallas kernels after
  difference-method profiling showed XLA fusion is 4-20x faster than
  Mosaic codegen for this arithmetic on the target chip).
* ``ntt_core`` — a lax.scan over radix-2 butterfly stages: ONE traced
  multiply body regardless of log2(n).  Used for tiny transforms and for
  preprocessing recursions (prefix_zerofier) that touch many distinct
  sizes once — the staged path would pay seconds of tracing per size for
  a runtime win that never amortizes.

Public functions are thin eager wrappers that warm the domain caches and
then dispatch to jitted inner kernels — building tables inside a trace
would leak tracers into the cache.

Replaces the reference's recursive list NTT (/root/reference/code/ntt.py:3-30)
and its derived kernels fast_multiply/fast_coset_evaluate/fast_coset_divide
(ntt.py:32-176) with batched, jittable equivalents.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..field import ops as F
from .domain import DOMAINS, coset_table, mont_const, power_table
from .stage_ntt import staged_ntt, staged_ok


def _stages(x: jnp.ndarray, powers: jnp.ndarray, n: int) -> jnp.ndarray:
    """Butterfly stages on bit-reversed input x of shape (..., NLIMBS, n).

    Each stage pairs positions (j, j+m) within blocks of 2m.  Rather than
    reshaping (which would displace the limb axis from its canonical -2
    slot), the stage is expressed as full-width elementwise ops:

        t       = x * w_stage          (w tiled across blocks)
        out_lo  = x + roll(t, -m)      (u + w*v at lower positions)
        out_hi  = roll(x, m) - t       (u - w*v at upper positions)
        out     = where(bit m of j clear, out_lo, out_hi)

    which keeps every op in the (..., NLIMBS, n) layout the VPU likes.

    The stage loop is a lax.scan over the per-stage half-size m, with the
    stage twiddles GATHERED inside the scan from the shared power table
    (index (j & (m-1)) * (n/2m)).  One Montgomery-multiply body is traced
    regardless of log2(n) — an unrolled loop would inline the ~800-op
    multiply log2(n) times and blow up XLA compile time.
    """
    log_n = n.bit_length() - 1
    iota = jnp.arange(n, dtype=jnp.uint32)
    ms = jnp.asarray([1 << s for s in range(log_n)], dtype=jnp.uint32)
    half_n = jnp.uint32(n // 2)

    def stage(x, m):
        idx = (iota & (m - 1)) * (half_n // m)
        w = jnp.take(powers, idx, axis=-1)                   # (NLIMBS, n)
        mask = (iota & m) == 0                               # lower of pair
        shift = m.astype(jnp.int32)
        t = F.mont_mul(x, w)
        lo = F.add(x, jnp.roll(t, -shift, axis=-1))
        hi = F.sub(jnp.roll(x, shift, axis=-1), t)
        return jnp.where(mask, lo, hi), None

    x, _ = jax.lax.scan(stage, x, ms)
    return x


def ntt_core(values, bitrev, powers, n_inv=None):
    """Jittable NTT body with tables passed in explicitly (scan lowering)."""
    n = values.shape[-1]
    x = jnp.take(values, bitrev, axis=-1)
    x = _stages(x, powers, n)
    if n_inv is not None:
        x = F.mont_mul(x, n_inv)
    return x


_ntt_core_jit = jax.jit(ntt_core)


# When true, ntt() skips the staged path and uses the scan butterfly.
# Preprocessing recursions (prefix_zerofier) touch ~10 distinct transform
# sizes ONCE each; the staged transform would pay seconds of Python
# tracing per size per process for a ~100 ms runtime win, while the scan
# path traces one small stage body.  The per-proof hot sizes (the
# LDE/iNTT domains) keep the staged path.
_SCAN_ONLY = False


def _staged_ok(n: int) -> bool:
    return not _SCAN_ONLY and staged_ok(n)


def ntt(values: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """Forward NTT: coefficients -> evaluations on <omega_n> (natural order).

    With ``inverse=True``: evaluations -> coefficients (includes the 1/n
    scaling, like the reference's intt, ntt.py:20-30).
    """
    n = values.shape[-1]
    assert n & (n - 1) == 0, "NTT length must be a power of two"
    if n == 1:
        return values
    if _staged_ok(n):
        return staged_ntt(values, inverse)
    dom = DOMAINS.get(n)
    powers = dom["inv_powers"] if inverse else dom["fwd_powers"]
    n_inv = dom["n_inv"] if inverse else None
    return _ntt_core_jit(values, dom["bitrev"], powers, n_inv)


def intt(values: jnp.ndarray) -> jnp.ndarray:
    return ntt(values, inverse=True)


def _pad_coeffs(coeffs: jnp.ndarray, order: int) -> jnp.ndarray:
    n = coeffs.shape[-1]
    assert n <= order, f"cannot fit {n} coefficients in NTT of size {order}"
    if n == order:
        return coeffs
    pad = [(0, 0)] * (coeffs.ndim - 1) + [(0, order - n)]
    return jnp.pad(coeffs, pad)


def coset_scale(coeffs: jnp.ndarray, offset: int, inverse: bool = False) -> jnp.ndarray:
    """Substitute x -> offset*x (coefficient-wise scale by offset^i)."""
    n = coeffs.shape[-1]
    return F.mont_mul(coeffs, coset_table(offset, n, inverse))


@functools.partial(jax.jit, static_argnames=("order",))
def _lde_core(padded, scale_tab, bitrev, powers, order):
    return ntt_core(F.mont_mul(padded, scale_tab), bitrev, powers)


def coset_evaluate(coeffs: jnp.ndarray, offset: int, order: int) -> jnp.ndarray:
    """Low-degree extension: evaluate on the coset offset * <omega_order>.

    Equivalent to the reference's fast_coset_evaluate (ntt.py:132-135):
    scale by the offset then a length-``order`` NTT.  The coset scale is
    fused into the staged transform's first pass.
    """
    padded = _pad_coeffs(coeffs, order)
    scale_tab = coset_table(offset, order)
    if _staged_ok(order):
        return staged_ntt(padded, scale_pre=scale_tab)
    dom = DOMAINS.get(order)
    return _lde_core(padded, scale_tab, dom["bitrev"], dom["fwd_powers"], order)


@jax.jit
def _coset_interp_core(values, inv_scale_tab, bitrev, inv_powers, n_inv):
    coeffs = ntt_core(values, bitrev, inv_powers, n_inv)
    return F.mont_mul(coeffs, inv_scale_tab)


def coset_interpolate(values: jnp.ndarray, offset: int) -> jnp.ndarray:
    """Inverse of coset_evaluate at the same order."""
    n = values.shape[-1]
    inv_tab = coset_table(offset, n, inverse=True)
    if _staged_ok(n):
        return staged_ntt(values, inverse=True, scale_post=inv_tab)
    dom = DOMAINS.get(n)
    return _coset_interp_core(values, inv_tab, dom["bitrev"], dom["inv_powers"], dom["n_inv"])


def poly_multiply(lhs: jnp.ndarray, rhs: jnp.ndarray, out_len: Optional[int] = None) -> jnp.ndarray:
    """Polynomial product via NTT -> Hadamard -> iNTT.

    lhs/rhs are coefficient arrays (..., NLIMBS, n?); the result is
    returned with ``out_len`` coefficients (default: len+len-1).
    Device analog of the reference's fast_multiply (ntt.py:32-64).
    """
    la, lb = lhs.shape[-1], rhs.shape[-1]
    if out_len is None:
        out_len = la + lb - 1
    order = 1
    while order < la + lb - 1:
        order *= 2
    prod = intt(F.mont_mul(ntt(_pad_coeffs(lhs, order)), ntt(_pad_coeffs(rhs, order))))
    return prod[..., :out_len]


def coset_divide(
    lhs: jnp.ndarray, rhs: jnp.ndarray, offset: int, order: int, out_len: Optional[int] = None
) -> jnp.ndarray:
    """Exact polynomial division via coset-domain Hadamard quotient.

    The coset dodges the divisor's roots (which live in <omega>), exactly as
    the reference's fast_coset_divide (ntt.py:137-176).  Assumes clean
    division; a dirty quotient produces garbage coefficients that downstream
    verification rejects (same contract as the reference).
    """
    lc = ntt(coset_scale(_pad_coeffs(lhs, order), offset))
    rc = ntt(coset_scale(_pad_coeffs(rhs, order), offset))
    q = F.mont_mul(lc, F.batch_inv(rc))
    coeffs = coset_scale(intt(q), offset, inverse=True)
    if out_len is not None:
        coeffs = coeffs[..., :out_len]
    return coeffs


@jax.jit
def evaluate_domain_horner(coeffs: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Evaluate a polynomial at arbitrary points (Horner scan over coeffs).

    coeffs (..., NLIMBS, K), points (..., NLIMBS, n).  O(K) sequential
    steps of fully vectorized work over the points axis; the device
    fallback for non-smooth domains (smooth domains use ``ntt``).
    """

    def step(acc, c):
        return F.add(F.mont_mul(acc, points), c[..., :, None]), None

    rev = jnp.flip(coeffs, axis=-1)
    init = jnp.zeros_like(points)
    acc, _ = jax.lax.scan(step, init, jnp.moveaxis(rev, -1, 0))
    return acc


def zerofier(points: jnp.ndarray) -> jnp.ndarray:
    """Monic vanishing polynomial of a set of points, via a product tree.

    points: (NLIMBS, n) Montgomery form.  Returns (NLIMBS, n+1) coefficients.
    Each tree level is one batched NTT multiply over all sibling pairs, so
    the whole construction is log2(n) batched kernels (device analog of the
    reference's recursive fast_zerofier, ntt.py:66-80).
    """
    n = points.shape[-1]
    assert n >= 1
    chunks = []
    start = 0
    rem = n
    while rem:
        size = 1 << (rem.bit_length() - 1)
        chunks.append(_zerofier_pow2(points[:, start : start + size]))
        start += size
        rem -= size
    acc = chunks[0]
    for c in chunks[1:]:
        acc = poly_multiply(acc, c)
    return acc


# crossover below which zerofiers are built with host big-int accumulation
# (compiling a device product tree of many small distinct shapes costs more
# than the arithmetic saves); shared by prefix_zerofier and the fast_stark
# call sites so the thresholds cannot drift
HOST_ZEROFIER_MAX = 2048


def prefix_zerofier(root: int, count: int) -> jnp.ndarray:
    """Zerofier of the first ``count`` powers of ``root``: prod_{i<count}(x - root^i).

    Splits by index parity: even indices are the first ceil(c/2) powers of
    root^2, odd indices the same set scaled by root —
    Z_c(x) = Z_even(x) * root^b * Z_odd(x / root).  One polynomial multiply
    per level instead of the balanced product tree's 2^k per level, so the
    total work is ~2 top-level NTTs.  This is THE preprocessing kernel for
    large traces (the transition zerofier over the first T-1 omicron-domain
    points, reference: fast_stark.py:36-40 via fast_zerofier ntt.py:66-80).

    Returns (NLIMBS, count+1) Montgomery coefficients (monic).
    """
    from ..field.scalar import P
    from .domain import mont_const

    global _SCAN_ONLY
    if not _SCAN_ONLY:
        # top-level call: confine the whole recursion to the scan NTT
        _SCAN_ONLY = True
        try:
            return prefix_zerofier(root, count)
        finally:
            _SCAN_ONLY = False

    if count <= HOST_ZEROFIER_MAX:
        from ..poly.host_ntt import host_zerofier
        from ..utils.convert import device_from_ints

        pts, acc = [], 1
        for _ in range(count):
            pts.append(acc)
            acc = acc * root % P
        return device_from_ints(host_zerofier(pts))

    hi = (count + 1) // 2
    lo = count // 2
    root2 = root * root % P
    even = prefix_zerofier(root2, hi)                    # (L, hi+1)
    if lo == hi:
        odd = even
    else:
        odd = prefix_zerofier(root2, lo)                 # (L, lo+1)
    # scale: prod_{t<lo}(x - root * (root^2)^t) = root^lo * Z_lo(x / root):
    # coefficient i picks up root^(lo - i)
    root_inv = pow(root, P - 2, P)
    scale = F.mont_mul(power_table(root_inv, lo + 1), mont_const(pow(root, lo, P)))
    odd_scaled = F.mont_mul(odd, scale)
    return poly_multiply(even, odd_scaled, out_len=count + 1)


@jax.jit
def _prefix_zerofier_evals_core(y_tab, consts, shifts, bits):
    """Scan body for prefix_zerofier_evals: log2(count) rolling-product
    steps over the FULL evaluation domain, each a pair of fused
    elementwise Montgomery multiplies plus a (dynamic-shift) roll.

    consts: (K, 2, NLIMBS, 1) Montgomery scalars [c_acc, c_dbl] per step;
    shifts: (K, 2) int32 roll amounts [r_acc, r_dbl]; bits: (K,) uint32.
    One SMALL executable per (domain shape, K) — the whole point: the old
    coefficient-space recursion (prefix_zerofier) touched ~10 NTT sizes
    and ~150 distinct XLA executables per large trace, each carrying a
    multi-second cold-compile / ~0.5 s warm-load constant through the
    device tunnel (docs/design.md §9)."""
    f0 = F.sub(y_tab, jnp.broadcast_to(F.mont_one(1), y_tab.shape))
    acc0 = jnp.broadcast_to(F.mont_one(1), y_tab.shape)

    def step(carry, inp):
        fk, acc = carry
        c, sh, bit = inp
        term = F.mont_mul(jnp.roll(fk, sh[0], axis=-1), c[0])
        acc = jnp.where(bit > 0, F.mont_mul(acc, term), acc)
        fk = F.mont_mul(fk, F.mont_mul(jnp.roll(fk, sh[1], axis=-1), c[1]))
        return (fk, acc), None

    (_, acc), _ = jax.lax.scan(step, (f0, acc0), (consts, shifts, bits))
    return acc


def prefix_zerofier_evals(
    y_tab: jnp.ndarray, root: int, unit: int, count: int
) -> jnp.ndarray:
    """Evaluations of Z(x) = prod_{i<count}(x - root^i) at every point of
    ``y_tab`` — WITHOUT ever forming Z's coefficients.

    ``y_tab`` (..., NLIMBS, D) must hold a geometric evaluation domain in
    natural order, y_j = offset * omega_D^j, with ``root = omega_D^unit``
    (so multiplying a point by ``root`` is a rotation of the table by
    ``unit`` positions).  The doubling identity

        F_{k+1}(y) = F_k(y) * root^{4^k} * F_k(y * root^{-2^k})
        F_0(y)     = y - 1,  F_k(y) = prod_{i<2^k}(y - root^i)

    turns each doubling into ONE elementwise product with a rolled copy of
    the same codeword (y * root^{-s} is y_tab rolled by unit*s), and an
    arbitrary ``count`` is assembled from its binary digits with the same
    shift trick.  Total: ~2*log2(count) fused multiplies over the domain,
    a single executable.

    This computes the same values as evaluating the reference's
    fast_zerofier output (/root/reference/code/ntt.py:66-80) on the domain
    — validated bit-exactly in tests/test_ntt.py.
    """
    assert count >= 1
    D = y_tab.shape[-1]
    assert count * unit <= D, "zerofier roots must fit in the domain"
    # scan length PADDED to a fixed grid so nearby counts share one
    # executable: the 2^20-trace path calls this at counts T-1, n and
    # M-n, whose bit lengths differ by one — three compiles of the same
    # kernel (~7 s each cold) for a few wasted no-op scan steps (~2 fused
    # multiplies each, bit=0 leaves the accumulator untouched)
    K = max(count.bit_length(), 1)
    K = 32 if K <= 32 else K
    consts = np.empty((K, 2, y_tab.shape[-2], 1), dtype=np.uint32)
    shifts = np.zeros((K, 2), dtype=np.int32)
    bits = np.zeros((K,), dtype=np.uint32)
    from ..field.limbs import R, int_to_limbs
    from ..field.scalar import P

    one = int_to_limbs(R % P)
    for k in range(K):
        if k >= count.bit_length():
            consts[k, 0, :, 0] = one
            consts[k, 1, :, 0] = one
            continue
        s_above = count & ~((1 << (k + 1)) - 1)
        c_acc = pow(root, s_above << k, P)
        c_dbl = pow(root, 1 << (2 * k), P)
        consts[k, 0, :, 0] = int_to_limbs(c_acc * R % P)
        consts[k, 1, :, 0] = int_to_limbs(c_dbl * R % P)
        shifts[k, 0] = (unit * s_above) % D
        shifts[k, 1] = (unit * (1 << k)) % D
        bits[k] = (count >> k) & 1
    return _prefix_zerofier_evals_core(
        y_tab, jnp.asarray(consts), jnp.asarray(shifts), jnp.asarray(bits)
    )


def _zerofier_pow2(points: jnp.ndarray) -> jnp.ndarray:
    """Zerofier of 2^k points via a balanced product tree."""
    n = points.shape[-1]
    # level 0: linear factors (x - p): batch-major (n, NLIMBS, 2)
    neg = jnp.moveaxis(F.neg(points), -1, 0)[:, :, None]     # (n, NLIMBS, 1)
    ones = jnp.broadcast_to(F.mont_one(1), (n,) + F.mont_one(1).shape)
    polys = jnp.concatenate([neg, ones], axis=-1)            # (n, NLIMBS, 2)
    while polys.shape[0] > 1:
        d = polys.shape[-1] - 1  # monic polys of degree d
        left, right = polys[0::2], polys[1::2]
        polys = poly_multiply(left, right, out_len=2 * d + 1)
    return polys[0]
