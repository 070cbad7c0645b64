"""Batched prover core: the fully-jittable device portion of FastStark.prove
over a batch of independent witnesses (the "dp" axis), with the codeword
axis shardable over "sp".

This is the training-step analog of the framework: one call runs trace
generation, prefix interpolation, LDE, boundary quotients, AIR composition,
transition quotients and the weighted combination for a whole batch of
proofs — everything except the (host-side, inherently sequential)
Fiat-Shamir commitments.  Used by batch signing (BASELINE config 5) and by
the multi-chip dry run.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..field import ops as F
from ..models import rescue_prime as RP
from ..ops import ntt as NTT
from ..protocols.fast_stark import FastStark


def _bcast_shift(shift: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """(K, L, N) shift tables -> (K, 1..., L, N) matching ``like``'s rank."""
    extra = like.ndim - shift.ndim
    return shift.reshape(shift.shape[:1] + (1,) * extra + shift.shape[1:])


def build_prover_core(stark: FastStark, air_constants):
    """Returns a jittable fn(sk_batch, randomizer_cols, weights) -> combo.

    Limb-first layout throughout (field/ops.py):
    sk_batch:        (NLIMBS, B) Montgomery-form secret keys
    randomizer_cols: (B, R, NLIMBS, num_randomizers) random trace rows
    rand_poly:       (B, NLIMBS, max_degree+1) randomizer polynomial coeffs
    weights:         (W, NLIMBS, 1) or (B, W, NLIMBS, 1) combination weights
                     (per-proof weights for true batch signing)
    inv_bz, interp:  (R, NLIMBS, N) boundary tables (batch-independent)

    Returns the combination codeword (B, NLIMBS, N) — the FRI input.
    """
    t = stark._interp_tables()
    c1_lde, c2_lde, mds, mds_inv = air_constants
    N = stark.fri_domain_length
    R = stark.num_registers
    expansion = stark.expansion_factor

    def core(sk_batch, randomizer_cols, rand_poly, weights, inv_bz, interp,
             inv_tz, tq_shift_pows, bq_shift_pows):
        # trace: (n_cycles, m, L, B) -> columns (B, m, L, n_cycles)
        traces = RP.trace_batch(sk_batch)
        cols = jnp.transpose(traces, (3, 1, 2, 0))
        cols = jnp.concatenate([cols, randomizer_cols], axis=-1)  # (B,R,L,n)

        trace_lde = stark._trace_lde(cols)                        # (B,R,L,N)
        next_lde = jnp.roll(trace_lde, -expansion, axis=-1)

        bq_lde = F.mont_mul(F.sub(trace_lde, interp), inv_bz)     # (B,R,L,N)

        constraint = RP._rescue_air_kernel(
            trace_lde, next_lde, c1_lde, c2_lde, mds, mds_inv
        )                                                          # (B,C,L,N)
        tq_lde = F.mont_mul(constraint, inv_tz)

        rand_lde = NTT.coset_evaluate(rand_poly, stark.generator.value, N)

        # Weighted combination via the scan-based reduction kernel: a
        # Python add-chain here made the whole jitted core exponentially
        # slow at runtime on XLA:CPU (see field/ops.py:field_sum).
        # Terms in transcript weight order: randomizer, per-constraint
        # [tq, shifted tq], per-register [bq, shifted bq].
        tq_t = jnp.moveaxis(tq_lde, -3, 0)                 # (C, ..., L, N)
        bq_t = jnp.moveaxis(bq_lde, -3, 0)                 # (R, ..., L, N)
        sh_tq = F.mont_mul(_bcast_shift(tq_shift_pows, tq_t), tq_t)
        sh_bq = F.mont_mul(_bcast_shift(bq_shift_pows, bq_t), bq_t)
        terms = jnp.concatenate([
            rand_lde[None],
            jnp.stack([tq_t, sh_tq], axis=1).reshape((-1,) + tq_t.shape[1:]),
            jnp.stack([bq_t, sh_bq], axis=1).reshape((-1,) + bq_t.shape[1:]),
        ])                                                  # (W, ..., L, N)
        # weights (W, L, 1) or (B, W, L, 1) -> leading W axis, rank-matched
        w_lead = jnp.moveaxis(weights, -3, 0)
        while w_lead.ndim < terms.ndim:
            w_lead = w_lead[:, None]
        return F.weighted_sum(terms, w_lead), bq_lde, rand_lde

    return core
