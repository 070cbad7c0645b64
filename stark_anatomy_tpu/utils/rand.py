"""Bulk randomness for large-trace provers.

The reference samples each randomizer with ``os.urandom(17)`` + a host
big-int reduction (stark.py:79,117).  At BASELINE scale the randomizer
polynomial has ~2^22 coefficients — millions of per-element host calls and
object-array conversions.  This module draws ALL the bytes in one
``os.urandom`` call and reduces them to field elements on device.

Reduction: a uniform 128-bit value v satisfies v < 2p (p > 2^127), so
v mod p is a single conditional subtract.  The result's statistical
distance from uniform is ~(2^128 - p)/2^128 ≈ 0.2 bits of bias per
element — fine for proof-of-computation blinding (MiMC chains), NOT for
zero-knowledge-critical sampling; the RPSSS path keeps the reference's
per-element host sampling (DEVIATIONS.md).
"""

from __future__ import annotations

import os

import numpy as np

from ..field import ops as F
from ..field.limbs import NLIMBS


def bulk_random_mont(count: int, urandom=os.urandom):
    """``count`` pseudo-uniform field elements as a device Montgomery limb
    array (NLIMBS, count), from one bulk entropy draw.

    The raw bytes upload as uint8 and split into limbs ON DEVICE — the
    numpy strided split cost ~2.3 s at 2^22 elements and quadrupled the
    host->device transfer bytes."""
    import jax.numpy as jnp

    raw = np.frombuffer(urandom(16 * count), dtype=np.uint8).reshape(count, 16)
    b = jnp.asarray(raw).astype(jnp.uint32)                     # (count, 16)
    v = (b[:, 0::2] | (b[:, 1::2] << jnp.uint32(8))).T          # (NLIMBS, count)
    assert v.shape == (NLIMBS, count)
    # v < 2^128 < 2p: one conditional subtract lands in [0, p)
    reduced = F._stack(
        F._cond_sub_p_rows(F._rows(v), jnp.zeros_like(v[..., 0, :]))
    )
    return F.to_mont(reduced)
