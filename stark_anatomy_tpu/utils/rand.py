"""Bulk randomness for large-trace provers: seed-expanded ON DEVICE.

The reference samples each randomizer with ``os.urandom(17)`` + a host
big-int reduction (stark.py:79,117).  At BASELINE scale the randomizer
polynomial has ~2^22 coefficients; round 3 uploaded all the raw bytes
(16 B/element) through a ~54-107 MB/s host->device tunnel — seconds of
pure transfer per proof.  Here only a 32-byte ``os.urandom`` seed crosses
the boundary; the device expands it with blake2s-256 in counter mode
(the same bit-exact compression kernel the Merkle commitment uses,
commit/device_merkle.py) and REJECTION-SAMPLES to exact uniformity:
each 32-byte digest yields two 128-bit candidates, candidates >= p are
regenerated with a fresh round tag in an on-device ``lax.while_loop``
(P[candidate >= p] ~ 0.205, so the loop runs ~log_{1/0.205}(count) ~ 10
iterations of cheap vectorized hashing — no host round trips).

The output distribution is exactly uniform on [0, p) conditioned on
termination (standard rejection sampling); the randomness SOURCE is a
PRF expansion of a 256-bit seed rather than raw urandom per element —
documented in DEVIATIONS.md (blinding randomness, not consensus bytes).
"""

from __future__ import annotations

import os

import numpy as np

from ..field import ops as F
from ..field.limb_arith import P_LIMBS, sub_rows
from ..field.limbs import NLIMBS


def _expand_impl(seed_words, count: int):
    import jax
    import jax.numpy as jnp

    from ..commit.device_merkle import _compress_words

    half = (count + 1) // 2
    ctr = jnp.arange(half, dtype=jnp.uint32)

    def digest(round_tag):
        m = [jnp.broadcast_to(seed_words[i], (half,)) for i in range(8)]
        m.append(ctr)
        m.append(jnp.broadcast_to(round_tag, (half,)))
        m.extend(jnp.zeros((half,), jnp.uint32) for _ in range(6))
        return _compress_words(m, 40)  # 8 word arrays (half,)

    def candidates(round_tag):
        d = digest(round_tag)
        # words 0-3 -> element 2i, words 4-7 -> element 2i+1 (LE128)
        w = jnp.stack(d)                          # (8, half)
        pair = jnp.stack([w[:4], w[4:]], axis=1)  # (4, 2, half)
        words = pair.reshape(4, 2 * half)[:, :count]
        limbs = [None] * NLIMBS
        for k in range(4):
            limbs[2 * k] = words[k] & jnp.uint32(0xFFFF)
            limbs[2 * k + 1] = words[k] >> jnp.uint32(16)
        return jnp.stack(limbs)                   # (NLIMBS, count)

    def geq_p(v):
        _, borrow = sub_rows([v[k] for k in range(NLIMBS)], P_LIMBS)
        return borrow == 0                        # v >= p

    v0 = candidates(jnp.uint32(0))
    bad0 = geq_p(v0)

    def cond(state):
        v, bad, r = state
        return jnp.any(bad)

    def body(state):
        v, bad, r = state
        c = candidates(r)
        v = jnp.where(bad[None, :], c, v)
        return v, geq_p(v), r + jnp.uint32(1)

    v, _, _ = jax.lax.while_loop(cond, body, (v0, bad0, jnp.uint32(1)))
    return F.to_mont(v)


_expand_jit = None


def seed_expand_mont(count: int, seed: bytes):
    """``count`` exactly-uniform field elements as a device Montgomery limb
    array (NLIMBS, count), expanded on device from a 32-byte seed.

    The jitted expander is module-level and keyed by the STATIC count
    only; the seed rides in as an array argument (a per-call closure
    would force a full recompile per proof — measured as a 16 s
    randomizer phase)."""
    import jax
    import jax.numpy as jnp

    global _expand_jit
    if _expand_jit is None:
        _expand_jit = jax.jit(_expand_impl, static_argnames=("count",))
    assert len(seed) == 32
    seed_words = jnp.asarray(np.frombuffer(seed, dtype="<u4"))
    return _expand_jit(seed_words, count)


def bulk_random_mont(count: int, urandom=os.urandom):
    """``count`` exactly-uniform field elements as a device Montgomery limb
    array (NLIMBS, count); one 32-byte entropy draw, expanded on device."""
    return seed_expand_mont(count, urandom(32))
