"""Shared per-limb-row modular arithmetic primitives.

Single source of truth for the unrolled row-list add/sub/conditional-
subtract logic shared by the lowerings of the same field math:
field/ops.py (XLA-fused path), ops/stage_ntt.py (staged NTT passes) and
field/pallas_kernels.py (the opt-in Pallas comparison kernel).  A modulus
or limb-layout change lands here once (round-2 advisory: the logic was
triplicated).

All helpers operate on Python lists of NLIMBS equal-shape uint32 arrays
("rows") holding 16-bit limbs, least-significant first — the layout both
XLA and Pallas fuse well (see field/ops.py module doc).
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from .limbs import LIMB_BITS, MASK, NLIMBS, int_to_limbs
from .scalar import P

_MASK = np.uint32(MASK)
_ONE16 = np.uint32(1 << LIMB_BITS)
_ONE = np.uint32(1)
P_LIMBS = [np.uint32(v) for v in int_to_limbs(P)]


def add_rows(ar: List, br: List) -> Tuple[List, jnp.ndarray]:
    """Raw limb addition; returns (limbs, carry-out)."""
    out, carry = [], None
    for k in range(NLIMBS):
        acc = ar[k] + br[k]
        if carry is not None:
            acc = acc + carry
        out.append(acc & _MASK)
        carry = acc >> LIMB_BITS
    return out, carry


def sub_rows(ar: List, br: List) -> Tuple[List, jnp.ndarray]:
    """Raw limb subtraction; returns (limbs, borrow-out: 1 if ar < br)."""
    out, borrow = [], None
    for k in range(NLIMBS):
        tmp = ar[k] + _ONE16 - br[k]
        if borrow is not None:
            tmp = tmp - borrow
        out.append(tmp & _MASK)
        borrow = _ONE - (tmp >> LIMB_BITS)
    return out, borrow


def cond_sub_p_rows(r: List, overflow: jnp.ndarray) -> List:
    """Reduce r (< 2p, possibly with a 2^128 overflow bit) into [0, p)."""
    d, borrow = sub_rows(r, P_LIMBS)
    ge = jnp.logical_or(overflow.astype(bool), borrow == 0)
    return [jnp.where(ge, d[k], r[k]) for k in range(NLIMBS)]


def add_mod_rows(ar: List, br: List) -> List:
    """Modular addition of two values in [0, p)."""
    s, carry = add_rows(ar, br)
    return cond_sub_p_rows(s, carry)


def sub_mod_rows(ar: List, br: List) -> List:
    """Modular subtraction of two values in [0, p) (adds p back on
    underflow)."""
    d, borrow = sub_rows(ar, br)
    dp, _ = add_rows(d, P_LIMBS)
    neg = borrow.astype(bool)
    return [jnp.where(neg, dp[k], d[k]) for k in range(NLIMBS)]
