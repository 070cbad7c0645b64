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

        def wgt(i):
            return weights[..., i, :, :]

        combo = F.mont_mul(wgt(0), rand_lde)
        w = 1
        C = constraint.shape[-3]
        for i in range(C):
            combo = F.add(combo, F.mont_mul(wgt(w), tq_lde[..., i, :, :]))
            w += 1
            shifted = F.mont_mul(tq_shift_pows[i], tq_lde[..., i, :, :])
            combo = F.add(combo, F.mont_mul(wgt(w), shifted))
            w += 1
        for s in range(R):
            combo = F.add(combo, F.mont_mul(wgt(w), bq_lde[..., s, :, :]))
            w += 1
            shifted = F.mont_mul(bq_shift_pows[s], bq_lde[..., s, :, :])
            combo = F.add(combo, F.mont_mul(wgt(w), shifted))
            w += 1
        return combo, bq_lde, rand_lde

    return core
