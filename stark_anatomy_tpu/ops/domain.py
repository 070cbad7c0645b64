"""Evaluation-domain tables: root-of-unity powers, bit-reversal, coset data.

All heavy tables are built ON DEVICE from a single host-computed root
(via :func:`power_table`, a log-N doubling construction), so creating the
tables for N = 2^20 costs ~20 vectorized multiplies instead of millions of
host big-int operations.  Tables are cached per (N, ...) key and stored in
the limb-first (NLIMBS, n) device layout.

Reference context: the recursive NTT recomputes root powers on the fly
(/root/reference/code/ntt.py:3-30); here they are precomputed constants,
which is what a TPU wants.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import ops as F
from ..field.limbs import NLIMBS, int_to_limbs, R
from ..field.scalar import P, Field


def _concrete_ctx():
    """Context that forces concrete (non-tracer) results when table
    construction is triggered lazily INSIDE an outer jit trace — cached
    tables must never be tracers.  Outside a trace it is a no-op: entering
    ensure_compile_time_eval eagerly would poison Pallas kernel tracing
    (kernel-internal numpy constants become captured jax arrays, which
    pallas_call rejects)."""
    import contextlib

    try:
        from jax._src import core as _jcore

        clean = _jcore.trace_state_clean()
    except Exception:
        clean = True
    return contextlib.nullcontext() if clean else jax.ensure_compile_time_eval()


def mont_const(value: int) -> jnp.ndarray:
    """Host int -> (NLIMBS, 1) Montgomery-form broadcastable constant.

    Always concrete, even when called during an outer jit trace — table
    constants must never become tracers (they are cached process-wide).
    """
    with _concrete_ctx():
        return jnp.asarray(
            np.array(int_to_limbs(value % P * R % P), dtype=np.uint32)
        )[:, None]


@functools.partial(
    jax.jit,
    static_argnames=("n",),
    # build-only kernel: its runtime (a handful of table multiplies, run
    # once per process) is irrelevant next to its compile bill — the
    # reduced-effort XLA pipeline compiles the 2^20 build in 13.5 s vs
    # 23-35 s at default effort (measured round 5)
    compiler_options={"exec_time_optimization_effort": -1.0},
)
def _power_table_core(step: jnp.ndarray, n: int) -> jnp.ndarray:
    """Doubling construction as ONE executable: powers[2^k + i] =
    powers[2^k] * powers[i].  Keeping the whole loop in one jit matters on
    remote device tunnels where every eager dispatch costs ~25 ms — the
    unjitted form paid that 2*log2(n) times per table."""
    table = F.mont_one(1)
    size = 1
    while size < n:
        # compact lowering: ~40 traced ops per multiply instead of ~800 —
        # table building is bandwidth-trivial, but RETRACING the unrolled
        # form cost seconds per table size per process
        chunk = F._mont_mul_compact(table, jnp.broadcast_to(step, table.shape))
        table = jnp.concatenate([table, chunk], axis=-1)
        step = F._mont_mul_compact(step, step)  # base^(2*size)
        size *= 2
    return table[..., :n]


def power_table(base: int, n: int) -> jnp.ndarray:
    """Device table [base^0, ..., base^(n-1)]: (NLIMBS, n), Montgomery form.

    Arbitrary n >= 1 (over-built to the next power of two and sliced —
    prefix zerofiers need odd lengths like count//2 + 1).  Built under
    ensure_compile_time_eval when triggered inside an outer jit trace so
    cached tables are always concrete.

    The doubling executable is keyed only by the table SHAPE, so at any
    given size ONE ~20 s XLA compile serves every base — the master omega
    table and both coset-offset tables share it (a two-level
    outer-product construction was measured at ~60 s of compile for the
    same table and reverted, round 5)."""
    assert n >= 1
    with _concrete_ctx():
        return _power_table_core(mont_const(base), n)


@functools.partial(jax.jit, static_argnames=("length",))
def _master_gather(tab: jnp.ndarray, e: jnp.ndarray, length: int) -> jnp.ndarray:
    """Gather [w^0, w^e, w^(2e), ...] (length entries) from the master
    power table ``tab`` of the full group <w> of order m.

    m divides 2^32 (power-of-two subgroup), so uint32 wrap-around products
    reduce mod m exactly: idx = (i * e) & (m - 1).  One tiny executable
    per (m, length) shape serves EVERY derived table — strides, inverse
    tables, arbitrary power steps."""
    m = tab.shape[-1]
    idx = (jnp.arange(length, dtype=jnp.uint32) * e) & jnp.uint32(m - 1)
    return jnp.take(tab, idx, axis=-1)


@functools.partial(jax.jit, static_argnames=("n1", "n2"))
def _master_gather_outer(tab: jnp.ndarray, e: jnp.ndarray, n1: int, n2: int):
    """Gather the outer-product table w^(e*k1*j2) (L, n1, n2) from the
    master table — the four-step NTT's cross-twiddle block in ONE gather
    (replaces the per-size doubling construction whose unrolled graph
    cost ~12 s of XLA compile per transform size)."""
    m = tab.shape[-1]
    k1 = (jnp.arange(n1, dtype=jnp.uint32) * e)[:, None]
    idx = (k1 * jnp.arange(n2, dtype=jnp.uint32)[None, :]) & jnp.uint32(m - 1)
    return jnp.take(tab, idx.reshape(-1), axis=-1).reshape(
        tab.shape[:-1] + (n1, n2)
    )


def bit_reversal_permutation(n: int) -> np.ndarray:
    """Index array mapping natural order -> bit-reversed order."""
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros_like(idx)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


class _Domain:
    """Lazy per-size domain tables.  Each entry (fwd_powers, inv_powers,
    bitrev, n_inv) is built on first subscript access: at n = 2^24 a single
    direction's power table is 512 MB of HBM, so eagerly building all four
    tables would double the resident footprint of every large transform
    (the four-step path needs none of them).

    Power tables are DERIVED from the process-wide master table (see
    DomainCache.master_powers): the subgroup roots are coherent
    (omega_{n/2} = omega_n^2, scalar.py:primitive_nth_root), so every
    omega table at every size is one strided gather from a single built
    table — collapsing the per-size table-builder executables that
    dominated cold time-to-first-proof (docs/design.md §9)."""

    def __init__(self, n: int, field: Field, cache: "DomainCache"):
        self.n = n
        self._domains = cache
        omega = field.primitive_nth_root(n).value
        self._vals: dict = {"omega": omega, "omega_inv": pow(omega, P - 2, P)}

    def __getitem__(self, key: str):
        if key not in self._vals:
            n = self.n
            if key == "fwd_powers":
                v = self._domains.master_powers(1, n, order=n)
            elif key == "inv_powers":
                v = self._domains.master_powers(-1, n, order=n)
            elif key == "bitrev":
                with _concrete_ctx():
                    v = jnp.asarray(bit_reversal_permutation(n))
            elif key == "n_inv":
                v = mont_const(pow(n, P - 2, P))
            else:
                raise KeyError(key)
            self._vals[key] = v
        return self._vals[key]


class DomainCache:
    """Per-process cache of NTT domain tables keyed by domain size, plus
    the MASTER power table every omega table derives from."""

    def __init__(self):
        self._cache: Dict[int, _Domain] = {}
        self._field = Field.main()
        self._master: Optional[Tuple[int, jnp.ndarray]] = None  # (m, table)

    def get(self, n: int) -> _Domain:
        if n not in self._cache:
            self._cache[n] = _Domain(n, self._field, self)
        return self._cache[n]

    def master(self, n: int) -> Tuple[int, jnp.ndarray]:
        """The (m, [omega_m^0 .. omega_m^(m-1)]) master table for some
        m >= n.  Built once per process at the largest size requested so
        far; a later larger request rebuilds (prior derivations stay
        valid — they are value copies)."""
        assert n >= 1
        n = 1 << (n - 1).bit_length()  # round up to a valid subgroup order
        if self._master is None or self._master[0] < n:
            omega = self._field.primitive_nth_root(n).value
            self._master = (n, power_table(omega, n))
        return self._master

    def master_powers(
        self, step_exp: int, length: int, order: Optional[int] = None
    ) -> jnp.ndarray:
        """Table [w_order^(step_exp * i) for i < length] as ONE gather from
        the master table, where w_order is the canonical primitive root of
        the given (power-of-two) order — default: the master's own order.
        ``step_exp`` may be negative (inverse tables)."""
        order_hint = order if order is not None else length
        m, tab = self.master(max(order_hint, length))
        if order is None:
            order = m
        e = step_exp * (m // order) % m
        with _concrete_ctx():
            if e == 1:
                # identity stride: the master IS the table (a gather here
                # would duplicate the full 512 MB table at a 2^24 domain)
                return tab if length == m else tab[..., :length]
            return _master_gather(tab, jnp.uint32(e), length)

    def master_powers_outer(
        self, step_exp: int, n1: int, n2: int, order: int
    ) -> jnp.ndarray:
        """Outer-product table w_order^(step_exp * k1 * j2), shape
        (L, n1, n2), as one gather from the master table."""
        m, tab = self.master(order)
        e = step_exp * (m // order) % m
        with _concrete_ctx():
            return _master_gather_outer(tab, jnp.uint32(e), n1, n2)


DOMAINS = DomainCache()


@functools.lru_cache(maxsize=128)
def coset_table(offset: int, n: int, inverse: bool = False) -> jnp.ndarray:
    """Device table offset^{+-i} (NLIMBS, n), Montgomery form — one
    direction only (the inverse table is only ever needed for coset
    interpolation, so LDE-only callers don't pay for it)."""
    base = pow(offset, P - 2, P) if inverse else offset
    return power_table(base, n)


def coset_power_tables(offset: int, n: int):
    """(offset^i, offset^-i) device tables (NLIMBS, n), Montgomery form."""
    return coset_table(offset, n, False), coset_table(offset, n, True)
