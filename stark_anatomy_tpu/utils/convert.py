"""Fast host<->device conversion of field-element arrays.

Device layout is LIMB-FIRST (..., NLIMBS, n) — see field/ops.py.  The host
boundary is where Montgomery-form limb arrays become canonical Python ints
(for hashing / transcripts) and back; conversions are vectorized with
numpy (object arithmetic for the big-int side) and transpose at the edge.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ..field import ops as F
from ..field.limbs import LIMB_BITS, NLIMBS, R
from ..field.scalar import P


def device_from_ints(values: Sequence[int]):
    """Canonical ints -> device Montgomery limb array (NLIMBS, n)."""
    import jax.numpy as jnp

    if len(values) == 0:
        return jnp.zeros((NLIMBS, 0), dtype=jnp.uint32)
    vals = np.array([v % P * R % P for v in values], dtype=object)
    out = np.empty((NLIMBS, len(values)), dtype=np.uint32)
    rem = vals
    for k in range(NLIMBS):
        out[k] = (rem & 0xFFFF).astype(np.uint64).astype(np.uint32)
        rem = rem >> LIMB_BITS
    return jnp.asarray(out)


def ints_from_device(arr) -> List[int]:
    """Device Montgomery limb array (..., NLIMBS, n) -> canonical ints,
    flattened in element order."""
    canon = np.asarray(F.from_mont(arr))
    flat = np.moveaxis(canon, -2, 0).reshape(NLIMBS, -1)
    acc = flat[NLIMBS - 1].astype(object)
    for k in range(NLIMBS - 2, -1, -1):
        acc = (acc << LIMB_BITS) | flat[k].astype(object)
    return [int(v) for v in acc]


def canonical_np(arr) -> np.ndarray:
    """Montgomery device array (..., NLIMBS, n) -> canonical ELEMENT-MAJOR
    numpy limb array (..., n, NLIMBS) — the row-per-element layout the C++
    hashing extension consumes."""
    canon = np.asarray(F.from_mont(arr))
    return np.ascontiguousarray(np.moveaxis(canon, -2, -1))


def int_from_row(row: np.ndarray) -> int:
    """One canonical element-major limb row (NLIMBS,) -> Python int."""
    acc = 0
    for k in range(NLIMBS - 1, -1, -1):
        acc = (acc << LIMB_BITS) | int(row[k])
    return acc


