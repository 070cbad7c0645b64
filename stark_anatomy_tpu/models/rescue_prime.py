"""Rescue-Prime: the framework's built-in AIR workload ("model").

Scalar semantics match the reference (rescue_prime.py:5-273): m=2 state,
rate 1, capacity 1, N=27 rounds, alpha=3, with the forward/backward
half-round arithmetization trick that keeps the AIR at degree 3.

TPU-native additions the reference has no analog for:
* :func:`hash_batch` / :func:`trace_batch` — the permutation as a jitted
  device kernel over a batch of inputs (lax.scan over rounds; the x^(1/3)
  S-box is a 128-bit square-and-multiply scan, the dominant per-round cost
  — reference: rescue_prime.py:150).
* :meth:`RescuePrime.constraint_points_device` — pointwise AIR evaluation
  on LDE-domain codewords (used by the fast prover instead of symbolic
  composition).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp

from ..field import ops as F
from ..field.scalar import Field, FieldElement, P
from ..ops.domain import mont_const
from ..poly.multivariate import MPolynomial
from ..poly.univariate import Polynomial
from .rescue_constants import ALPHA, ALPHA_INV, MDS, MDS_INV, ROUND_CONSTANTS

M = 2
N_ROUNDS = 27


class RescuePrime:
    """Scalar Rescue-Prime instance over the canonical field."""

    def __init__(self):
        self.field = Field.main()
        self.p = P
        self.m = M
        self.rate = 1
        self.capacity = 1
        self.N = N_ROUNDS
        self.alpha = ALPHA
        self.alphainv = ALPHA_INV
        self.MDS = [[FieldElement(v, self.field) for v in row] for row in MDS]
        self.MDSinv = [[FieldElement(v, self.field) for v in row] for row in MDS_INV]
        self.round_constants = [FieldElement(v, self.field) for v in ROUND_CONSTANTS]

    # -- permutation ---------------------------------------------------------
    def _round(self, state: List[FieldElement], r: int) -> List[FieldElement]:
        # forward half-round: S-box x^alpha, MDS, constants
        state = [s ** self.alpha for s in state]
        state = [
            sum(
                (self.MDS[i][j] * state[j] for j in range(self.m)),
                self.field.zero(),
            )
            + self.round_constants[2 * r * self.m + i]
            for i in range(self.m)
        ]
        # backward half-round: S-box x^(1/alpha), MDS, constants
        state = [s ** self.alphainv for s in state]
        state = [
            sum(
                (self.MDS[i][j] * state[j] for j in range(self.m)),
                self.field.zero(),
            )
            + self.round_constants[2 * r * self.m + self.m + i]
            for i in range(self.m)
        ]
        return state

    def hash(self, input_element: FieldElement) -> FieldElement:
        state = [input_element] + [self.field.zero()] * (self.m - 1)
        for r in range(self.N):
            state = self._round(state, r)
        return state[0]

    def trace(self, input_element: FieldElement) -> List[List[FieldElement]]:
        state = [input_element] + [self.field.zero()] * (self.m - 1)
        trace = [list(state)]
        for r in range(self.N):
            state = self._round(state, r)
            trace.append(list(state))
        return trace

    # -- AIR -----------------------------------------------------------------
    def boundary_constraints(self, output_element: FieldElement):
        """[(cycle, register, value)] (reference: rescue_prime.py:206-215)."""
        return [
            (0, 1, self.field.zero()),          # capacity starts at zero
            (self.N, 0, output_element),        # rate ends at the hash output
        ]

    def round_constants_polynomials(self, omicron: FieldElement):
        """Interpolate the round constants over the trace domain and lift
        (reference: rescue_prime.py:217-237)."""
        domain = [omicron ** r for r in range(self.N)]
        first, second = [], []
        for i in range(self.m):
            vals = [self.round_constants[2 * r * self.m + i] for r in range(self.N)]
            first.append(MPolynomial.lift(Polynomial.interpolate_domain(domain, vals), 0))
        for i in range(self.m):
            vals = [
                self.round_constants[2 * r * self.m + self.m + i]
                for r in range(self.N)
            ]
            second.append(MPolynomial.lift(Polynomial.interpolate_domain(domain, vals), 0))
        return first, second

    def transition_constraints(self, omicron: FieldElement) -> List[MPolynomial]:
        """The AIR: m polynomials in 1+2m variables equating
        forward-half-round(prev) with backward-half-round^{-1}(next) — both
        degree alpha, which is the trick that keeps the AIR at degree 3
        (reference: rescue_prime.py:239-267)."""
        first_step, second_step = self.round_constants_polynomials(omicron)
        variables = MPolynomial.variables(1 + 2 * self.m, self.field)
        previous_state = variables[1 : 1 + self.m]
        next_state = variables[1 + self.m : 1 + 2 * self.m]
        air = []
        for i in range(self.m):
            lhs = MPolynomial.constant(self.field.zero())
            for k in range(self.m):
                lhs = lhs + MPolynomial.constant(self.MDS[i][k]) * (
                    previous_state[k] ** self.alpha
                )
            lhs = lhs + first_step[i]
            rhs = MPolynomial.constant(self.field.zero())
            for k in range(self.m):
                rhs = rhs + MPolynomial.constant(self.MDSinv[i][k]) * (
                    next_state[k] - second_step[k]
                )
            rhs = rhs ** self.alpha
            air.append(lhs - rhs)
        return air


# ---------------------------------------------------------------------------
# Device kernels
# ---------------------------------------------------------------------------

def _device_constants():
    """Round constants as a (N, 2, m, NLIMBS, 1) Montgomery device array and
    the MDS matrix entries as Montgomery constants (m, m, NLIMBS, 1)."""
    import numpy as np

    from ..field.limbs import NLIMBS, R, int_to_limbs

    rc = np.zeros((N_ROUNDS, 2, M, NLIMBS, 1), dtype=np.uint32)
    for r in range(N_ROUNDS):
        for i in range(M):
            rc[r, 0, i, :, 0] = int_to_limbs(ROUND_CONSTANTS[2 * r * M + i] * R % P)
            rc[r, 1, i, :, 0] = int_to_limbs(ROUND_CONSTANTS[2 * r * M + M + i] * R % P)
    mds = np.zeros((M, M, NLIMBS, 1), dtype=np.uint32)
    for i in range(M):
        for j in range(M):
            mds[i, j, :, 0] = int_to_limbs(MDS[i][j] * R % P)
    return jnp.asarray(rc), jnp.asarray(mds)


def _mds_mul(state: jnp.ndarray, mds: jnp.ndarray) -> jnp.ndarray:
    """state: (..., m, NLIMBS, n); 2x2 MDS matrix multiply."""
    rows = []
    for i in range(M):
        acc = F.mont_mul(state[..., 0, :, :], mds[i, 0])
        for j in range(1, M):
            acc = F.add(acc, F.mont_mul(state[..., j, :, :], mds[i, j]))
        rows.append(acc)
    return jnp.stack(rows, axis=-3)


def _permutation_scan(state: jnp.ndarray, collect_trace: bool):
    rc, mds = _device_constants()

    def round_fn(state, consts):
        fwd_c, bwd_c = consts[0], consts[1]
        # forward half-round
        s2 = F.mont_mul(state, state)
        state = F.mont_mul(s2, state)                      # x^3
        state = F.add(_mds_mul(state, mds), fwd_c)
        # backward half-round: x^(1/3) = x^ALPHA_INV
        state = F.mont_pow(state, ALPHA_INV)
        state = F.add(_mds_mul(state, mds), bwd_c)
        return state, state if collect_trace else None

    final, states = jax.lax.scan(round_fn, state, rc)
    return final, states


@jax.jit
def hash_batch(inputs: jnp.ndarray) -> jnp.ndarray:
    """Batched Rescue-Prime hash: (NLIMBS, B) mont inputs -> (NLIMBS, B)."""
    state = jnp.stack(
        [inputs, jnp.zeros_like(inputs)], axis=-3
    )  # (m, NLIMBS, B): absorb input into rate, capacity zero
    final, _ = _permutation_scan(state, collect_trace=False)
    return final[..., 0, :, :]


@jax.jit
def trace_batch(inputs: jnp.ndarray) -> jnp.ndarray:
    """Batched execution trace: (NLIMBS, B) -> (N+1, m, NLIMBS, B)."""
    state = jnp.stack([inputs, jnp.zeros_like(inputs)], axis=-3)
    final, states = _permutation_scan(state, collect_trace=True)
    # states: (N, m, NLIMBS, B); prepend the initial state
    return jnp.concatenate([state[None], states], axis=0)


# ---------------------------------------------------------------------------
# Hand-written pointwise AIR evaluator (the fast prover's hot path)
# ---------------------------------------------------------------------------

@jax.jit
def _rescue_air_kernel(trace_lde, next_lde, c1_lde, c2_lde, mds, mds_inv):
    """Pointwise Rescue AIR on LDE codewords.

    constraint_i = [ sum_k MDS[i][k] * prev_k^3 + C1_i(x) ]
                 - [ sum_k MDSinv[i][k] * (next_k - C2_k(x)) ]^3

    ~20 Montgomery multiplies per point, versus the hundreds of sparse
    dictionary terms the generic symbolic evaluator expands to
    (reference arithmetization: rescue_prime.py:239-267).
    trace_lde/next_lde: (..., m, NLIMBS, N); c1_lde/c2_lde: (m, NLIMBS, N).
    """
    outs = []
    prev3 = F.mont_mul(F.mont_mul(trace_lde, trace_lde), trace_lde)
    inner = F.sub(next_lde, c2_lde)  # (..., m, N, L)
    for i in range(M):
        lhs = F.mont_mul(prev3[..., 0, :, :], mds[i, 0])
        for k in range(1, M):
            lhs = F.add(lhs, F.mont_mul(prev3[..., k, :, :], mds[i, k]))
        lhs = F.add(lhs, c1_lde[..., i, :, :])
        rhs = F.mont_mul(inner[..., 0, :, :], mds_inv[i, 0])
        for k in range(1, M):
            rhs = F.add(rhs, F.mont_mul(inner[..., k, :, :], mds_inv[i, k]))
        rhs = F.mont_mul(F.mont_mul(rhs, rhs), rhs)
        outs.append(F.sub(lhs, rhs))
    return jnp.stack(outs, axis=-3)


def make_point_air(stark):
    """Scalar per-point AIR evaluator for the VERIFIER.

    ``FastStark.verify`` evaluates the transition constraints at each query
    point; the generic path goes through the symbolic :class:`MPolynomial`
    constraints, whose ``rhs**3`` expansion has thousands of monomials —
    seconds of host big-int work per proof.  This closure evaluates the
    SAME constraints in factored form (two MDS combines, two cubings, and
    2m degree-(N_ROUNDS-1) Horner evaluations of the round-constant
    interpolants): ~120 field multiplies per point.  Pass as
    ``air_point_evaluator=`` to FastStark.verify.
    """
    rp = RescuePrime()
    omicron = stark.omicron
    domain = [omicron ** r for r in range(rp.N)]
    first, second = [], []
    for i in range(rp.m):
        vals1 = [rp.round_constants[2 * r * rp.m + i] for r in range(rp.N)]
        vals2 = [rp.round_constants[2 * r * rp.m + rp.m + i] for r in range(rp.N)]
        first.append(Polynomial.interpolate_domain(domain, vals1))
        second.append(Polynomial.interpolate_domain(domain, vals2))

    def evaluator(x, current, next_):
        c1 = [p.evaluate(x) for p in first]
        c2 = [p.evaluate(x) for p in second]
        inner = [next_[k] - c2[k] for k in range(rp.m)]
        values = []
        for i in range(rp.m):
            lhs = c1[i]
            for k in range(rp.m):
                lhs = lhs + rp.MDS[i][k] * (current[k] ** rp.alpha)
            rhs = rp.MDSinv[i][0] * inner[0]
            for k in range(1, rp.m):
                rhs = rhs + rp.MDSinv[i][k] * inner[k]
            values.append(lhs - rhs ** rp.alpha)
        return values

    return evaluator


_RESCUE_TABLES = {}


def rescue_air_tables(stark):
    """(c1_lde, c2_lde, mds, mds_inv) round-constant tables for a Stark
    instance, built ONCE and shared by the prover evaluator, the batched
    verifier evaluator, and the batch prover (round 4: three separate
    builders each spent ~13 s re-deriving them — one batched Horner call
    replaces 32 sequential small dispatches)."""
    key = id(stark)
    if key in _RESCUE_TABLES:
        return _RESCUE_TABLES[key]
    import numpy as np

    from ..field.limbs import NLIMBS, R as MONT_R, int_to_limbs
    from ..ops.ntt import evaluate_domain_horner
    from ..utils.convert import device_from_ints

    rp = RescuePrime()
    omicron = stark.omicron
    domain = [omicron ** r for r in range(rp.N)]
    x_lde = stark._interp_tables()["x_lde"]

    # interpolate all 2m round-constant polynomials on the host, then
    # evaluate them on the FRI domain with ONE batched Horner call
    coeff_ints = []
    for half in (0, rp.m):
        for i in range(rp.m):
            vals = [rp.round_constants[2 * r * rp.m + half + i] for r in range(rp.N)]
            poly = Polynomial.interpolate_domain(domain, vals)
            cs = [c.value for c in poly.coefficients]
            cs += [0] * (rp.N - len(cs))
            coeff_ints.extend(cs)
    coeffs = device_from_ints(coeff_ints)                  # (L, 2m*N_ROUNDS)
    coeffs = jnp.moveaxis(
        coeffs.reshape(NLIMBS, 2 * rp.m, rp.N), 1, 0
    )                                                       # (2m, L, N_ROUNDS)
    both = evaluate_domain_horner(
        coeffs, jnp.broadcast_to(x_lde, (2 * rp.m,) + x_lde.shape)
    )                                                       # (2m, L, N_fri)
    c1_lde, c2_lde = both[: rp.m], both[rp.m :]

    mds_np = np.zeros((M, M, NLIMBS, 1), dtype=np.uint32)
    mdsi_np = np.zeros((M, M, NLIMBS, 1), dtype=np.uint32)
    for i in range(M):
        for j in range(M):
            mds_np[i, j, :, 0] = int_to_limbs(MDS[i][j] * MONT_R % P)
            mdsi_np[i, j, :, 0] = int_to_limbs(MDS_INV[i][j] * MONT_R % P)
    out = (c1_lde, c2_lde, jnp.asarray(mds_np), jnp.asarray(mdsi_np))
    _RESCUE_TABLES[key] = out
    return out


def make_air_evaluator(stark):
    """Build a device AIR evaluator bound to a (Fast)Stark instance.

    Caches the round-constant interpolant codewords C1_i(x), C2_i(x) on the
    FRI domain (proof-independent), so each proof pays only the ~20-multiply
    kernel above.  Pass as ``air_evaluator=`` to FastStark.prove.
    """
    c1_lde, c2_lde, mds, mds_inv = rescue_air_tables(stark)

    def evaluator(x_lde_arg, current, next_):
        return _rescue_air_kernel(current, next_, c1_lde, c2_lde, mds, mds_inv)

    return evaluator


def make_index_air_evaluator(stark):
    """Device AIR evaluator for the BATCHED VERIFIER
    (FastStark._verify_combinations_batched): the verifier's query points
    are FRI-domain positions, so the cached round-constant codewords
    serve the constants by a gather at the query indices instead of
    per-point Horner evaluation."""
    c1_lde, c2_lde, mds, mds_inv = rescue_air_tables(stark)

    def evaluator(idx, current, next_):
        c1_pts = jnp.take(c1_lde, idx, axis=-1)        # (m, L, K)
        c2_pts = jnp.take(c2_lde, idx, axis=-1)
        return _rescue_air_kernel(current, next_, c1_pts, c2_pts, mds, mds_inv)

    return evaluator
