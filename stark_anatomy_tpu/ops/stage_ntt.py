"""Four-step NTT from XLA-fused radix-4 butterfly passes (the hot kernel).

Replaces the Pallas fused-VMEM kernels of rounds 2-3 after direct
measurement (tools/kernel_probe2.py, difference-method timing on the real
chip) showed that on this TPU stack XLA's own fusion of the unrolled
Montgomery limb pipeline runs at HBM speed (0.117 ms for a full 2^20
multiply ~= 96 MB of traffic at ~820 GB/s), while Mosaic-compiled Pallas
kernels run the identical arithmetic 4-20x slower, and that XLA transposes
and gathers on these shapes are nearly free.  The fastest design is
therefore pure XLA with the fewest HBM passes:

* Butterfly stages run along a LEADING (non-lane) axis, expressed as
  reshape -> slice -> multiply/add -> concat.  Leading-axis reshapes are
  free in row-major layout; every op is a full-width elementwise kernel
  over 128-lane vectors with no lane shuffles anywhere.
* Radix-4 passes: two butterfly levels per HBM pass — the same multiply
  count as radix-2 (1 mul/element per 2 levels) in HALF the passes.
* Four-step n = n1*n2 (reference math: /root/reference/code/ntt.py:3-30,
  restructured):  bit-reverse rows -> stage passes over j1 (axis -2 of
  (L, n1, n2)) -> cross twiddle w^(k1*j2) -> transpose (cheap) ->
  bit-reverse -> stage passes over j2 -> natural order by construction
  (position [k2, k1] holds X[k1 + n1*k2], so the final reshape is free).

Bit-exact with the scan-stage path (ops/ntt.py:ntt_core) — the butterfly
order and twiddle exponents are identical; validated in tests/test_ntt.py.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import ops as F
from ..field.limb_arith import add_mod_rows, sub_mod_rows
from ..field.limbs import NLIMBS
from ..field.scalar import P
from .domain import (
    DOMAINS,
    _concrete_ctx,
    bit_reversal_permutation,
    mont_const,
)

# smallest transform routed through this module (below: the scan path).
# On TPU the staged transform wins from small sizes; on CPU its ~20x
# larger traced graph costs ~10-30 s of XLA:CPU compile per (size,
# direction) — only worth it where the scan path's O(n log n) sequential
# stages actually hurt (large slow-marked tests).
MIN_STAGED_TPU = 512
MIN_STAGED_CPU = 1 << 13


def MIN_STAGED() -> int:
    return (
        MIN_STAGED_TPU
        if jax.default_backend() in ("tpu", "axon")
        else MIN_STAGED_CPU
    )


def _mul_rows(ar: List[jnp.ndarray], br: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Montgomery product on row lists, backend-appropriate lowering.

    TPU: the unrolled row form (XLA fuses it to ~HBM speed).  CPU: the
    compact tensorized form via stack/unstack — the unrolled graph makes
    XLA:CPU compile time explode when instantiated ~24x per transform
    (field/ops.py:_use_compact)."""
    if F._use_compact():
        a = jnp.stack(ar, axis=-2)  # limb axis at -2, as compact expects
        b = jnp.stack(br, axis=-2)
        out = F._mont_mul_compact(a, b)
        return [out[..., k, :] for k in range(NLIMBS)]
    return F._mont_mul_rows(ar, br)


def _bc(w: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """Broadcast a (m,) twiddle row against (blocks, m, REST...)."""
    return jnp.broadcast_to(
        w[(None, slice(None)) + (None,) * (like.ndim - 2)], like.shape
    )


# -- optionally packed representation ---------------------------------------
# With STARK_TPU_NTT_PACKED=1, elements travel between passes as NLIMBS//2
# u32 words (16 bytes/element, the exact information content) instead of
# NLIMBS sparse 16-bit limbs (32 bytes).  Profiling (round 4) showed XLA
# materializes the unpacked rows anyway (each limb row feeds ~8 products,
# so its cost model refuses to duplicate the unpack into the multiply
# fusion) — packing then ADDS kernels and traffic, so it is OFF by
# default; the knob remains for A/B measurement.

_U16 = np.uint32(0xFFFF)
_S16 = np.uint32(16)


def _use_packed() -> bool:
    import os

    return os.environ.get("STARK_TPU_NTT_PACKED", "0") == "1"


def _unpack_rows(packed: List[jnp.ndarray]) -> List[jnp.ndarray]:
    if not _use_packed():
        return packed
    rows = []
    for r in packed:
        rows.append(r & _U16)
        rows.append(r >> _S16)
    return rows


def _pack_rows(rows: List[jnp.ndarray]) -> List[jnp.ndarray]:
    if not _use_packed():
        return rows
    return [rows[2 * k] | (rows[2 * k + 1] << _S16) for k in range(NLIMBS // 2)]


def _radix() -> int:
    import os

    return int(os.environ.get("STARK_TPU_NTT_RADIX", "4"))


def _plan_passes(log_n: int) -> Tuple[Tuple[int, int], ...]:
    """Deterministic pass plan: stage levels 0..log_n-1 grouped into
    radix-4 pairs, with a leading radix-2 level when log_n is odd.
    Entries are (radix, starting_level) — static Python ints.
    STARK_TPU_NTT_RADIX=2 forces plain radix-2 passes (A/B measurement)."""
    plan = []
    s = 0
    if _radix() == 2:
        return tuple((2, s) for s in range(log_n))
    if log_n % 2 == 1:
        plan.append((2, s))
        s += 1
    while s < log_n:
        plan.append((4, s))
        s += 2
    return tuple(plan)


def _radix2_pass(xr, w_rows, n_axis0, m):
    """One butterfly level (half-size m) along axis 0 of each PACKED row."""
    blocks = n_axis0 // (2 * m)
    xs = [v.reshape((blocks, 2, m) + v.shape[1:]) for v in xr]
    u = _unpack_rows([v[:, 0] for v in xs])
    vv = _unpack_rows([v[:, 1] for v in xs])
    if w_rows is None:  # first stage: twiddles are all one
        t = vv
    else:
        t = _mul_rows(vv, [_bc(w, u[0]) for w in w_rows])
    lo = _pack_rows(add_mod_rows(u, t))
    hi = _pack_rows(sub_mod_rows(u, t))
    return [
        jnp.concatenate([l[:, None], h[:, None]], axis=1).reshape(
            (n_axis0,) + l.shape[2:]
        )
        for l, h in zip(lo, hi)
    ]


def _radix4_pass(xr, w1_rows, w2a_rows, w2i_rows, n_axis0, m):
    """Two butterfly levels (half-sizes m, 2m) in ONE pass along axis 0.

    Derivation (two radix-2 DIT levels composed; j in [0, m)):
        t0 = A + w1 B      t1 = A - w1 B
        t2 = C + w1 D      t3 = C - w1 D
        out[j]      = t0 + w2a t2      out[j+2m] = t0 - w2a t2
        out[j+m]    = t1 + w2a*i t3    out[j+3m] = t1 - w2a*i t3
    with w1 = w^(j n/2m), w2a = w^(j n/4m), i = w^(n/4) (fourth root).
    Same multiply count as two radix-2 passes, half the HBM traffic.
    """
    blocks = n_axis0 // (4 * m)
    xs = [v.reshape((blocks, 4, m) + v.shape[1:]) for v in xr]
    a = _unpack_rows([v[:, 0] for v in xs])
    b = _unpack_rows([v[:, 1] for v in xs])
    c = _unpack_rows([v[:, 2] for v in xs])
    d = _unpack_rows([v[:, 3] for v in xs])
    if w1_rows is None:  # m == 1: w1 = w2a = 1
        wb, wd = b, d
    else:
        wb = _mul_rows(b, [_bc(w, a[0]) for w in w1_rows])
        wd = _mul_rows(d, [_bc(w, a[0]) for w in w1_rows])
    t0 = add_mod_rows(a, wb)
    t1 = sub_mod_rows(a, wb)
    t2 = add_mod_rows(c, wd)
    t3 = sub_mod_rows(c, wd)
    if w2a_rows is None:
        u2 = t2
    else:
        u2 = _mul_rows(t2, [_bc(w, t2[0]) for w in w2a_rows])
    u3 = _mul_rows(t3, [_bc(w, t3[0]) for w in w2i_rows])
    o0 = _pack_rows(add_mod_rows(t0, u2))
    o2 = _pack_rows(sub_mod_rows(t0, u2))
    o1 = _pack_rows(add_mod_rows(t1, u3))
    o3 = _pack_rows(sub_mod_rows(t1, u3))
    return [
        jnp.concatenate(
            [p0[:, None], p1[:, None], p2[:, None], p3[:, None]], axis=1
        ).reshape((n_axis0,) + p0.shape[2:])
        for p0, p1, p2, p3 in zip(o0, o1, o2, o3)
    ]


def row_stages(xr, twiddles, nk: int):
    """Run the full butterfly network along axis 0 of each PACKED row.

    xr: NLIMBS//2 packed-u32 arrays (nk, REST...), axis 0 in bit-reversed
    order.  twiddles: per-pass twiddle-array tuples from _stage_rows (a
    pure array pytree; the radix/level plan is recomputed from static nk).
    """
    plan = _plan_passes(nk.bit_length() - 1)
    for (kind, s), tw in zip(plan, twiddles):
        m = 1 << s
        if kind == 2:
            xr = _radix2_pass(xr, tw[0], nk, m)
        else:
            xr = _radix4_pass(xr, tw[0], tw[1], tw[2], nk, m)
    return xr


@functools.partial(jax.jit, static_argnames=("nk",))
def _stage_rows_core(full: jnp.ndarray, ir: jnp.ndarray, nk: int):
    """Per-pass twiddle rows for a length-nk transform, as ONE executable.

    Level s (half-size m = 2^s) twiddle j -> wk^(j * nk/(2m)), j in [0, m),
    gathered from ``full`` = [wk^0 .. wk^(nk/2 - 1)]; ``ir`` is the
    Montgomery fourth root wk^(nk/4).  The compact multiply lowering keeps
    the graph tiny — table construction is bandwidth-trivial, but the
    previous eager per-level construction compiled ~10 small unrolled
    mont_mul executables (~29 s cold, measured round 5).

    Returns a tuple (one entry per pass) of twiddle-array tuples matching
    row_stages' plan: radix-2 entries are (w_rows,), radix-4 entries are
    (w1_rows, w2a_rows, w2i_rows); absent/trivial tables are None.
    """
    log_n = nk.bit_length() - 1

    def level_rows(s):
        m = 1 << s
        if m == 1:
            return None
        idx = jnp.asarray(np.arange(m) * (nk // (2 * m)))
        t = jnp.take(full, idx, axis=-1)  # (L, m)
        return tuple(t[k] for k in range(NLIMBS))

    out = []
    for kind, s in _plan_passes(log_n):
        if kind == 2:
            out.append((level_rows(s),))
        else:
            m = 1 << s
            w1 = level_rows(s)
            w2 = level_rows(s + 1)  # (2m,) tables; first m entries = w2a
            if w2 is None:
                w2a = None
                w2i = tuple(
                    jnp.broadcast_to(ir[k], (1,)) for k in range(NLIMBS)
                )
            else:
                w2a = tuple(w[:m] for w in w2)
                w2i_arr = F._mont_mul_compact(
                    jnp.stack([w[:m] for w in w2]), ir
                )
                w2i = tuple(w2i_arr[k] for k in range(NLIMBS))
            out.append((w1, w2a, w2i))
    return tuple(out)


def _stage_rows(wk: int, nk: int, full: jnp.ndarray):
    i_root = pow(wk, nk // 4, P) if nk >= 4 else 1
    return _stage_rows_core(full, mont_const(i_root), nk)


@functools.partial(jax.jit, static_argnames=("scaled",))
def _cross_finish(cross: jnp.ndarray, scale: jnp.ndarray, scaled: bool):
    """Optionally scale the gathered (L, n1, n2) cross table (the inverse
    transform folds 1/n in here) and store it packed — one executable."""
    if scaled:
        cross = jnp.moveaxis(
            F.mont_mul(jnp.moveaxis(cross, 0, -2), scale), -2, 0
        )
    return jnp.stack(_pack_rows([cross[k] for k in range(NLIMBS)]))


class _StageTables:
    """Cached per-(n, inverse) tables for the staged four-step transform.

    Every power table here — the per-axis stage twiddles and the (n1, n2)
    cross block — is ONE gather from the process-wide master table
    (ops/domain.py:DomainCache.master): the per-size doubling
    constructions they replace each carried a multi-second XLA compile
    (docs/design.md §9, round-5 executable-count collapse)."""

    def __init__(self, n: int, inverse: bool):
        with _concrete_ctx():
            log_n = n.bit_length() - 1
            n1 = 1 << ((log_n + 1) // 2)
            n2 = n // n1
            dom = DOMAINS.get(n)
            w = dom["omega_inv"] if inverse else dom["omega"]
            sgn = -1 if inverse else 1
            self.n, self.n1, self.n2 = n, n1, n2
            self.tw1 = _stage_rows(
                pow(w, n2, P), n1,
                DOMAINS.master_powers(sgn * n2, max(n1 // 2, 1), order=n),
            )
            self.tw2 = _stage_rows(
                pow(w, n1, P), n2,
                DOMAINS.master_powers(sgn * n1, max(n2 // 2, 1), order=n),
            )
            self.br1 = jnp.asarray(bit_reversal_permutation(n1))
            self.br2 = jnp.asarray(bit_reversal_permutation(n2))
            cross = DOMAINS.master_powers_outer(sgn, n1, n2, order=n)
            # store PACKED (L/2, n1, n2): halves both residency and the
            # cross-multiply's table read; the inverse transform folds the
            # 1/n scaling into the cross table (saves a full pass)
            self.cross = _cross_finish(
                cross, mont_const(pow(n, P - 2, P)), scaled=inverse
            )


@functools.lru_cache(maxsize=None)
def stage_tables(n: int, inverse: bool) -> _StageTables:
    return _StageTables(n, inverse)


def staged_ntt_core(x, br1, br2, cross, tw1, tw2, n1: int, n2: int):
    """The jittable transform body; tables passed in as arrays.

    x: (..., NLIMBS, n) natural-order Montgomery values.  Returns the
    transform in natural order (evaluations for forward tables,
    1/n-scaled coefficients for inverse tables).  Internally elements
    travel PACKED (16 bytes each); cross is the packed (L/2, n1, n2)
    table from _StageTables.
    """
    shape = x.shape
    half = NLIMBS // 2 if _use_packed() else NLIMBS
    packed = jnp.stack(
        _pack_rows([x[..., k, :] for k in range(NLIMBS)]), axis=-2
    )  # (..., half, n)
    v = packed.reshape(shape[:-2] + (half, n1, n2))
    v = jnp.take(v, br1, axis=-2)
    # packed rows with the j1 axis LEADING: (n1, ..., n2)
    rows = [jnp.moveaxis(v[..., k, :, :], -2, 0) for k in range(half)]
    rows = row_stages(rows, tw1, n1)
    # cross twiddle: unpack both sides, multiply, repack (fuses)
    cr = [
        jnp.moveaxis(cross[k], -2, 0)[
            (slice(None),) + (None,) * (rows[0].ndim - 2) + (slice(None),)
        ]
        for k in range(half)
    ]
    ur = _unpack_rows(rows)
    uc = _unpack_rows([jnp.broadcast_to(c, rows[0].shape) for c in cr])
    rows = _pack_rows(_mul_rows(ur, uc))
    # swap transform axes: (n1, ..., n2) -> (n2, ..., n1), batch dims kept
    # in place; XLA transposes on these shapes are nearly free
    # (tools/kernel_probe2.py)
    rows = [jnp.swapaxes(r, 0, -1) for r in rows]
    rows = [jnp.take(r, br2, axis=0) for r in rows]
    rows = row_stages(rows, tw2, n2)
    # rows[k]: (n2, ..., n1) with [k2, ..., k1] = X[k1 + n1*k2]
    out8 = _unpack_rows([jnp.moveaxis(r, 0, -2) for r in rows])
    out = jnp.stack(out8, axis=-3)
    return out.reshape(shape)


@functools.partial(jax.jit, static_argnames=("n1", "n2"))
def _staged_jit(x, scale_pre, scale_post, br1, br2, cross, tw1, tw2, n1, n2):
    if scale_pre is not None:
        x = F.mont_mul(x, scale_pre)
    out = staged_ntt_core(x, br1, br2, cross, tw1, tw2, n1, n2)
    if scale_post is not None:
        out = F.mont_mul(out, scale_post)
    return out


def staged_ntt(x, inverse: bool = False, scale_pre=None, scale_post=None):
    """Transform with optional fused pre/post Hadamard scales.

    scale_pre: e.g. the coset table for an LDE; scale_post: e.g. the
    inverse coset table for coset interpolation.  1/n for the inverse
    transform is already folded into the tables.

    (A jax.export AOT path was tried here in round 4 and REVERTED: on
    this stack the deserialized module's compilation does not hit the
    persistent cache, costing ~70-100 s per big shape per process —
    worse than the plain jit's trace + cached-compile ~15 s.)
    """
    n = x.shape[-1]
    t = stage_tables(n, inverse)
    return _staged_jit(
        x, scale_pre, scale_post, t.br1, t.br2, t.cross, t.tw1, t.tw2,
        n1=t.n1, n2=t.n2,
    )


def staged_ok(n: int) -> bool:
    return n >= MIN_STAGED() and n == (n & -n)
