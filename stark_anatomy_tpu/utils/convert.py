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


def _transfer_packed() -> bool:
    """Pack limbs into u32 words before crossing the device->host boundary.

    D2H through this environment's TPU tunnel runs at ~16 MB/s, so the
    sparse 16-bit-limbs-in-u32 layout pays 2x its information content per
    transfer; packing on device (one fused kernel) halves the bytes.  On
    CPU the 'transfer' is free and packing would just add host work."""
    import jax

    return jax.default_backend() in ("tpu", "axon")


def _canon_packed_core(arr):
    import jax.numpy as jnp

    canon = F.from_mont(arr)
    lo = canon[..., 0::2, :]
    hi = canon[..., 1::2, :]
    return lo | (hi << jnp.uint32(16))          # (..., NLIMBS/2, n)


_canon_packed_jit = None


def canonical_np(arr) -> np.ndarray:
    """Montgomery device array (..., NLIMBS, n) -> canonical ELEMENT-MAJOR
    numpy limb array (..., n, NLIMBS) — the row-per-element layout the C++
    hashing extension consumes.  On TPU backends the transfer crosses the
    tunnel PACKED (16 bytes/element) and unpacks host-side."""
    if not _transfer_packed():
        canon = np.asarray(F.from_mont(arr))
        return np.ascontiguousarray(np.moveaxis(canon, -2, -1))
    global _canon_packed_jit
    if _canon_packed_jit is None:
        import jax

        _canon_packed_jit = jax.jit(_canon_packed_core)
    import jax

    words = np.asarray(jax.device_get(_canon_packed_jit(arr)))  # (..., L/2, n)
    out = np.empty(
        words.shape[:-2] + (NLIMBS, words.shape[-1]), dtype=np.uint32
    )
    out[..., 0::2, :] = words & 0xFFFF
    out[..., 1::2, :] = words >> 16
    return np.ascontiguousarray(np.moveaxis(out, -2, -1))


def int_from_row(row: np.ndarray) -> int:
    """One canonical element-major limb row (NLIMBS,) -> Python int."""
    acc = 0
    for k in range(NLIMBS - 1, -1, -1):
        acc = (acc << LIMB_BITS) | int(row[k])
    return acc


