"""Pallas Montgomery-multiply kernel (opt-in comparison lowering).

NOT on the hot path since round 4: difference-method profiling on the
real chip (tools/ntt_probe.py) measured the XLA-fused unrolled row
pipeline at ~0.12 ms for a full 2^20 multiply (HBM-bound at ~820 GB/s)
versus ~0.42 ms for this kernel running identical arithmetic — Mosaic's
u32 codegen on this stack is several times slower than XLA's fusion.
Kept as a bit-exact alternate lowering for benchmarking (enable with
STARK_TPU_PALLAS=1) and as the reference implementation of the kernel
style; see field/ops.py:_use_pallas.

Layout contract matches field/ops.py: uint32 (..., NLIMBS, n), 16-bit
limbs, Montgomery form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .limb_arith import P_LIMBS as _P_LIMBS, cond_sub_p_rows
from .limbs import LIMB_BITS, MASK, NLIMBS, NPRIME, int_to_limbs
from .scalar import P

_MASK = np.uint32(MASK)
_NP_LIMBS = [np.uint32(v) for v in int_to_limbs(NPRIME)]

# lane-dimension block size; element counts in the framework are powers of
# two >= 256 on the hot path
BLOCK = 512


def _mont_mul_block(ar, br):
    """Unrolled Montgomery product on lists of equal-shape row arrays."""
    lo = [[None] * NLIMBS for _ in range(NLIMBS)]
    hi = [[None] * NLIMBS for _ in range(NLIMBS)]
    for i in range(NLIMBS):
        for j in range(NLIMBS):
            prod = ar[i] * br[j]
            lo[i][j] = prod & _MASK
            hi[i][j] = prod >> LIMB_BITS
    t_cols = [None] * (2 * NLIMBS + 1)
    for i in range(NLIMBS):
        for j in range(NLIMBS):
            k = i + j
            t_cols[k] = lo[i][j] if t_cols[k] is None else t_cols[k] + lo[i][j]
            t_cols[k + 1] = hi[i][j] if t_cols[k + 1] is None else t_cols[k + 1] + hi[i][j]

    t_low = []
    carry = None
    for k in range(NLIMBS):
        acc = t_cols[k] if carry is None else t_cols[k] + carry
        t_low.append(acc & _MASK)
        carry = acc >> LIMB_BITS
    c8 = carry

    m_cols = [None] * NLIMBS
    for i in range(NLIMBS):
        for j in range(NLIMBS - i):
            prod = t_low[i] * _NP_LIMBS[j]
            k = i + j
            l = prod & _MASK
            m_cols[k] = l if m_cols[k] is None else m_cols[k] + l
            if k + 1 < NLIMBS:
                h = prod >> LIMB_BITS
                m_cols[k + 1] = h if m_cols[k + 1] is None else m_cols[k + 1] + h
    m_rows = []
    carry = None
    for k in range(NLIMBS):
        acc = m_cols[k] if carry is None else m_cols[k] + carry
        m_rows.append(acc & _MASK)
        carry = acc >> LIMB_BITS

    u_cols = [None] * (2 * NLIMBS + 1)
    for i in range(NLIMBS):
        for j in range(NLIMBS):
            prod = m_rows[i] * _P_LIMBS[j]
            k = i + j
            l = prod & _MASK
            h = prod >> LIMB_BITS
            u_cols[k] = l if u_cols[k] is None else u_cols[k] + l
            u_cols[k + 1] = h if u_cols[k + 1] is None else u_cols[k + 1] + h
    zero = jnp.zeros_like(ar[0])
    for k in range(2 * NLIMBS + 1):
        if u_cols[k] is None:
            u_cols[k] = zero
    for k in range(NLIMBS):
        u_cols[k] = u_cols[k] + t_low[k]
    for k in range(NLIMBS, 2 * NLIMBS + 1):
        u_cols[k] = u_cols[k] + t_cols[k] if t_cols[k] is not None else u_cols[k]
    u_cols[NLIMBS] = u_cols[NLIMBS] + c8

    u_limbs = []
    carry = None
    for k in range(2 * NLIMBS + 1):
        acc = u_cols[k] if carry is None else u_cols[k] + carry
        u_limbs.append(acc & _MASK)
        carry = acc >> LIMB_BITS
    r = u_limbs[NLIMBS : 2 * NLIMBS]
    overflow = u_limbs[2 * NLIMBS] + carry
    return cond_sub_p_rows(r, overflow)


def _mm_kernel(a_ref, b_ref, o_ref):
    ar = [a_ref[0, k, :] for k in range(NLIMBS)]
    br = [b_ref[0, k, :] for k in range(NLIMBS)]
    rr = _mont_mul_block(ar, br)
    o_ref[0, :, :] = jnp.stack(rr, axis=0)


def mont_mul_pallas_core(
    a: jnp.ndarray, b: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Pallas Montgomery multiply on equal-shape (..., NLIMBS, n) inputs
    with n a multiple of BLOCK.  Traceable (usable inside outer jits /
    scans — this IS the hot-path lowering on TPU, see field/ops.py
    _mont_mul_core); ``interpret=True`` runs the interpreter for CPU
    correctness tests."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shape = a.shape
    n = shape[-1]
    batch = int(np.prod(shape[:-2], dtype=np.int64)) if len(shape) > 2 else 1
    a3 = a.reshape(batch, NLIMBS, n)
    b3 = b.reshape(batch, NLIMBS, n)

    grid = (batch, n // BLOCK)
    spec = pl.BlockSpec(
        (1, NLIMBS, BLOCK), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _mm_kernel,
        out_shape=jax.ShapeDtypeStruct((batch, NLIMBS, n), jnp.uint32),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(a3, b3)
    return out.reshape(shape)


@jax.jit
def mont_mul_pallas(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Standalone jitted wrapper around :func:`mont_mul_pallas_core`."""
    a, b = jnp.broadcast_arrays(jnp.asarray(a, jnp.uint32), jnp.asarray(b, jnp.uint32))
    return mont_mul_pallas_core(a, b)


def pallas_available() -> bool:
    import os

    if os.environ.get("STARK_TPU_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
