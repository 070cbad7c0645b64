"""Generic-domain interpolation and evaluation (device).

The protocol hot path only ever interpolates over (prefixes of) smooth
domains, which protocols/fast_stark.py does with NTTs.  These functions
cover the reference's fully generic fast_evaluate / fast_interpolate API
(ntt.py:82-130) for arbitrary distinct points.

The interpolation algorithm is Lagrange-via-synthetic-division: with
Z = zerofier(points) and w_i = v_i / Z'(x_i), the interpolant is
f = sum_i w_i * Z/(x - x_i).  All n synthetic divisions run as ONE
lax.scan over the coefficient index, vectorized across the points axis —
O(n^2) work with O(n) sequential depth, a shape TPUs execute well for the
moderate n where a generic domain ever appears.  (The reference's
remainder-tree recursion is O(n log^2 n) but deeply sequential and
branch-heavy — the wrong trade for an accelerator at these sizes.)

Arrays are limb-first (NLIMBS, n) — see field/ops.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..field import ops as F
from ..field.limbs import NLIMBS
from .ntt import evaluate_domain_horner, zerofier


@jax.jit
def _synthetic_divide_all(z_coeffs: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Quotients Z/(x - x_i) for all i at once.

    z_coeffs: (NLIMBS, n+1) monic; points: (NLIMBS, n).
    Returns (n_coeffs=n, NLIMBS, n_points): ascending coefficient index on
    axis 0.  Synthetic division from the top coefficient down:
        q_{n-1} = z_n;  q_{k-1} = z_k + x_i * q_k.
    """
    n = points.shape[-1]

    def step(carry, z_k):
        q_next = F.add(z_k[:, None], F.mont_mul(points, carry))
        return q_next, q_next

    top = jnp.broadcast_to(z_coeffs[:, n][:, None], points.shape)  # q_{n-1}
    zs = jnp.moveaxis(jnp.flip(z_coeffs[:, 1:n], axis=-1), -1, 0)  # z_{n-1}..z_1
    _, qs = jax.lax.scan(step, top, zs)
    all_q = jnp.concatenate([top[None], qs], axis=0)   # [q_{n-1} ... q_0]
    return jnp.flip(all_q, axis=0)                      # ascending coeff idx


@jax.jit
def _tree_sum_last(terms: jnp.ndarray) -> jnp.ndarray:
    """Modular sum over the last axis by halving (log-depth adds)."""
    while terms.shape[-1] > 1:
        k = terms.shape[-1]
        if k % 2 == 1:
            terms = jnp.concatenate(
                [terms, jnp.zeros_like(terms[..., :1])], axis=-1
            )
            k += 1
        terms = F.add(terms[..., : k // 2], terms[..., k // 2 :])
    return terms[..., 0]


def _derivative(coeffs: jnp.ndarray) -> jnp.ndarray:
    """d/dx of a coefficient array: (k+1)*c_{k+1}."""
    n = coeffs.shape[-1] - 1
    kplus1 = np.arange(1, n + 1, dtype=np.uint32)
    k_limbs = np.zeros((NLIMBS, n), dtype=np.uint32)
    k_limbs[0] = kplus1 & 0xFFFF
    k_limbs[1] = kplus1 >> 16
    k_mont = F.to_mont(jnp.asarray(k_limbs))
    return F.mont_mul(coeffs[..., 1:], k_mont)


def interpolate_generic(points: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """Coefficients of the unique degree-<n polynomial through
    (points[i], values[i]).  Both (NLIMBS, n) Montgomery arrays; returns
    (NLIMBS, n).  Device analog of fast_interpolate (ntt.py:102-130)."""
    n = points.shape[-1]
    if n == 1:
        return values
    z = zerofier(points)                                   # (NLIMBS, n+1)
    dz = _derivative(z)
    dz_at = evaluate_domain_horner(dz, points)
    w = F.mont_mul(values, F.batch_inv(dz_at))                   # (NLIMBS, n)
    qs = _synthetic_divide_all(z, points)                  # (n, NLIMBS, n)
    terms = F.mont_mul(w[None, :, :], qs)
    coeffs = _tree_sum_last(terms)                         # (n, NLIMBS)
    return jnp.moveaxis(coeffs, 0, -1)                     # (NLIMBS, n)


def evaluate_generic(coeffs: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Multi-point evaluation at arbitrary points (reference: fast_evaluate,
    ntt.py:82-100)."""
    return evaluate_domain_horner(coeffs, points)
