"""Distributed NTT: codeword sharded over the mesh's "sp" axis.

This is the framework's sequence-parallelism analog (SURVEY.md §5): the
reference only ever scales the NTT algorithmically (docs/faster.md); here
the evaluation domain itself is partitioned across chips.

Algorithm: four-step (Bailey) NTT for N = A*B with A = number of shards.
Viewing the coefficient vector as an A x B matrix (row-major, row a on
shard a):

  1. column NTTs of length A      — cross-shard: one all_to_all brings a
     b-slice of every row to each shard, the length-A transforms run
     locally (batched over B/A columns), twiddled by omega_N^(a*b);
  2. row NTTs of length B         — a second all_to_all regroups full rows
     so each shard transforms its own rows locally;
  3. output shuffle               — results land as Y[a][b] = X_hat[a + A*b]
     (the four-step transpose); a final all_to_all restores natural order.

All exchanges ride the "sp" axis (ICI on real hardware); compute between
exchanges is purely local.  Twiddle tables are passed in (built once by
ops/domain.py) so the shard_map body stays table-free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field import ops as F
from ..field.limbs import NLIMBS
from ..ops.domain import DOMAINS, power_table
from ..ops.ntt import ntt_core


def _local_ntt(x: jnp.ndarray, bitrev, powers, n_inv=None) -> jnp.ndarray:
    """ntt_core wrapper for (..., NLIMBS, n) blocks inside shard_map."""
    return ntt_core(x, bitrev, powers, n_inv)


def make_distributed_ntt(
    n: int,
    mesh: Mesh,
    axis: str = "sp",
    inverse: bool = False,
    batch_ndim: int = 0,
):
    """Build a jitted distributed (i)NTT over codewords of length ``n``
    sharded on the last axis over ``axis``.

    Returns fn(x) where x is (*batch, NLIMBS, n) with the LAST axis sharded
    (``batch_ndim`` leading batch axes, replicated).  Used standalone and as
    the sharded prover's LDE engine (parallel/sharded_stark.py).
    """
    S = mesh.shape[axis]
    assert n % (S * S) == 0, "need n divisible by shards^2"
    A, B = S, n // S

    dom_n = DOMAINS.get(n)
    dom_a = DOMAINS.get(A) if A > 1 else None
    dom_b = DOMAINS.get(B)
    omega = dom_n["omega_inv"] if inverse else dom_n["omega"]
    # full-size twiddle table omega_N^j (Montgomery) — reused as the
    # cross-term twiddles omega_N^(a*b)
    tw_full = power_table(omega, n)
    powers_a = (dom_a["inv_powers"] if inverse else dom_a["fwd_powers"]) if dom_a else None
    powers_b = dom_b["inv_powers"] if inverse else dom_b["fwd_powers"]
    bitrev_a = dom_a["bitrev"] if dom_a else None
    bitrev_b = dom_b["bitrev"]
    n_inv = dom_n["n_inv"] if inverse else None

    def body(x_local, tw_local):
        # x_local: (*batch, NLIMBS, B) = row a of the A x B matrix
        # (a = shard id); comments track the batch-free shapes
        lead = x_local.shape[:-2]
        # --- step 1: column NTTs of length A ---------------------------
        # split b into (a', t): (..., NLIMBS, A, B/A); all_to_all over a'
        xs = x_local.reshape(lead + (NLIMBS, A, B // A))
        a2a = xs.ndim - 2                                    # the A axis
        # after exchange: that axis indexes the ORIGINAL row a; this shard
        # holds b-slice [s*B/A, (s+1)*B/A)
        cols = jax.lax.all_to_all(xs, axis, a2a, a2a)
        # length-A NTT along the A axis (batch axes must LEAD for ntt_core
        # and mont_mul: the limb axis must sit at -2)
        c = jnp.moveaxis(cols, -1, -3)                       # (..., B/A, NLIMBS, A)
        if A > 1:
            c = ntt_core(c, bitrev_a, powers_a)
        # --- twiddle: multiply entry (a, b) by omega_N^(a*b) ------------
        # this shard's b values: b = s*(B/A) + t;  tw_local is (B/A, L, A)
        c = F.mont_mul(c, tw_local)
        cols = jnp.moveaxis(c, -3, -1)                       # (..., NLIMBS, A, B/A)
        # --- step 2: row NTTs of length B -------------------------------
        # regroup so each shard holds ONE full transformed row a = s
        rows = jax.lax.all_to_all(cols, axis, a2a, a2a)      # undo transpose
        rows = rows.reshape(lead + (NLIMBS, B))
        rows = ntt_core(rows, bitrev_b, powers_b)            # (..., NLIMBS, B)
        # --- step 3: natural-order shuffle ------------------------------
        # current: shard a holds Y[a][b'] = X_hat[a + A*b']; natural index
        # k = a + A*b' -> shard k // B must hold position k % B.
        # Split b' into (q, t): k = a + A*(q*(B/A) + t)  with q in [0,A)
        y = rows.reshape(lead + (NLIMBS, A, B // A))         # A axis = q
        y = jax.lax.all_to_all(y, axis, a2a, a2a)            # A axis = a_src
        # shard q now holds, for each a_src and t: X_hat[a_src + A*(q*(B/A)+t)]
        # natural local index j (within shard q) = a_src + A*t
        y = jnp.moveaxis(y, -2, -1)                          # (..., NLIMBS, B/A, A)
        y = y.reshape(lead + (NLIMBS, B))                    # j = t*A + a_src
        return y

    # per-shard cross twiddles: shard s needs omega_N^(a*b) for
    # a in [0,A), b in [s*B/A, (s+1)*B/A)
    import numpy as np

    # laid out per shard s: tw_shard[s][a][t] = omega_N^(a * (s*(B//A)+t))
    idx_full = np.empty((S, A, B // A), dtype=np.int64)
    for s in range(S):
        for a in range(A):
            for t in range(B // A):
                idx_full[s, a, t] = (a * (s * (B // A) + t)) % n
    tw_all = jnp.take(tw_full, jnp.asarray(idx_full.reshape(-1)), axis=-1)
    tw_all = tw_all.reshape(NLIMBS, S, A, B // A)
    # per-shard layout (B/A, NLIMBS, A): batch-leading for mont_mul
    tw_all = jnp.transpose(tw_all, (1, 3, 0, 2))  # (S, B/A, NLIMBS, A)

    from jax import shard_map

    def body_wrapper(x_local, tw_local):
        out = body(x_local, tw_local[0])
        if inverse:
            out = F.mont_mul(out, n_inv)
        return out

    x_spec = P(*([None] * (batch_ndim + 1) + [axis]))
    fn = shard_map(
        body_wrapper,
        mesh=mesh,
        in_specs=(x_spec, P(axis, None, None, None)),
        out_specs=x_spec,
        check_vma=False,
    )
    tw_sharded = jax.device_put(
        tw_all, NamedSharding(mesh, P(axis, None, None, None))
    )

    @jax.jit
    def run(x):
        return fn(x, tw_sharded)

    return run
