"""FastStark: the device-accelerated STARK prover (the flagship pipeline).

Protocol parity with the reference's FastStark (fast_stark.py:8-286) —
same transcript structure (boundary-quotient roots, randomizer root,
Fiat-Shamir weights, FRI, quadrupled-index openings incl. the preprocessed
transition-zerofier section) — but the prover is redesigned TPU-first
instead of translating the reference's coefficient-space algorithms:

* Trace interpolation over the length-n PREFIX of the omicron domain is
  done with the partial-fractions identity  f = Z_n * A / (x^M - 1)  where
  A = M * rot(intt(v / Z_n'(omega^i))):  three NTTs and two Hadamard
  products — no remainder trees (the reference recurses through
  fast_interpolate, ntt.py:102-130).
* Everything downstream is evaluated POINTWISE on the FRI-domain codewords:
  boundary quotients, AIR composition (via a direct device evaluator
  instead of symbolic MPolynomial composition, multivariate.py:105-112),
  transition quotients, degree-adjustment shifts (x^shift becomes a
  pointwise power of the domain codeword) and the weighted combination.
  No coefficient-space polynomial arithmetic appears anywhere in the hot
  path.
* The preprocessed transition zerofier (reference: fast_stark.py:36-40)
  additionally caches its INVERSE codeword and its Merkle tree, so each
  proof costs one Hadamard product instead of a division, and openings are
  O(log N).
"""

from __future__ import annotations

import functools
import os
from functools import reduce
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..commit.hashing import hash_paired_leaf
from ..commit.merkle import MerkleTree, open_multi, verify_multi
from ..errors import MalformedProof, VerificationError, rejects_malformed
from ..field import ops as F
from ..field.scalar import Field, FieldElement, P
from ..ops import ntt as NTT
from ..ops.domain import DOMAINS, mont_const
from ..poly.multivariate import MPolynomial
from ..poly.univariate import Polynomial
from ..transcript.proof_stream import ProofStream
from ..utils.convert import device_from_ints, ints_from_device
from .stark import Boundary, StarkParams


class TransitionZerofier:
    """Preprocessing artifact (reference: fast_stark.py:36-40) extended with
    the cached inverse codeword and Merkle tree.

    History: rounds 2-4 serialized this to disk (v1: the 512 MB codeword,
    v2: 32 MB of coefficients) because the coefficient-space product tree
    cost ~10 minutes of XLA compiles cold.  The rolling evaluation kernel
    (ops/ntt.py:prefix_zerofier_evals) computes the codeword directly on
    the FRI domain in ONE executable and ~100 ms of device time, so the
    disk artifact — and its staleness/fingerprinting hazards (ADVICE.md
    round 4) — was removed entirely; ``preprocess()`` is now cheap enough
    to run per process."""

    def __init__(self, codeword, rows, inv_codeword, tree):
        self.codeword = codeword              # device (L, N_fri) Montgomery
        self.rows = rows                      # opening-value accessor
        self.inv_codeword = inv_codeword      # device (L, N_fri)
        self.tree = tree                      # MerkleTree / DeviceMerkleTree

    @property
    def root(self) -> bytes:
        return self.tree.root


class FastStark(StarkParams):
    # randomizer-polynomial sampling crossover: above this many
    # coefficients, prove() switches from per-element host sampling
    # (reference parity, stark.py:117) to the bulk device path
    # (utils/rand.py).  The switch changes the randomness SOURCE — proof
    # bytes differ for a fixed urandom stream across the boundary — so it
    # is an explicit, documented instance knob rather than a buried magic
    # number; tests force it low to cover the bulk branch.
    bulk_randomizer_threshold: int = 4096

    # Blocked-coset LDE: express every length-N transform as E batched
    # length-M coset transforms (M = omicron domain, N = E*M), so ONE
    # staged-NTT executable serves the trace iNTT, the trace LDE and the
    # randomizer LDE — each distinct staged shape costs 60-90 s of XLA
    # compile cold (docs/design.md §9).  Explicit flag; the sharded
    # prover turns it off and keeps its distributed-NTT hooks.
    blocked_lde: bool = True

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._interp_cache = None
        self._bz_cache: Dict[tuple, tuple] = {}
        self._xpow_cache: Dict[int, jnp.ndarray] = {}
        self._coset_scales_arr = None
        # per-phase wall-clock attribution; bench/tests read
        # ``self.timer.report()`` after prove (utils/profiling.py)
        from ..utils.profiling import PhaseTimer

        self.timer = PhaseTimer()

    # ------------------------------------------------------------------
    # preprocessing
    # ------------------------------------------------------------------
    def preprocess(self) -> TransitionZerofier:
        """Commit to the transition zerofier Z(x) = prod_{i<T-1}(x - omicron^i).

        Large traces evaluate Z DIRECTLY on the FRI domain with the rolling
        kernel (ops/ntt.py:prefix_zerofier_evals) — no coefficients, no
        NTTs, one executable; small traces keep the host coefficient path
        (no device work at all).  Both produce identical codeword values,
        hence identical commitments (reference: fast_stark.py:36-40).
        """
        count = self.original_trace_length - 1
        if count <= NTT.HOST_ZEROFIER_MAX:
            from ..poly.host_ntt import host_zerofier

            # small domains: host big-int accumulation avoids compiling
            # a device product tree of many distinct shapes
            pts = [e.value for e in self.omicron_powers(count)]
            coeffs = device_from_ints(host_zerofier(pts))
            codeword = NTT.coset_evaluate(
                coeffs, self.generator.value, self.fri_domain_length
            )
        else:
            codeword = NTT.prefix_zerofier_evals(
                self._x_lde(), self.omicron.value, self.expansion_factor, count
            )
        rows, tree = self._commit_rows(codeword)
        inv_codeword = F.batch_inv(codeword)
        # the raw codeword is NOT retained: the prover divides through
        # inv_codeword and opens through rows/tree — keeping it would pin
        # an extra 512 MB of HBM at a 2^24 domain
        return TransitionZerofier(None, rows, inv_codeword, tree)

    def _x_lde(self) -> jnp.ndarray:
        """Cached FRI-domain codeword of x itself: g * omega_N^j."""
        if getattr(self, "_x_lde_arr", None) is None:
            N = self.fri_domain_length
            self._x_lde_arr = F.mont_mul(
                DOMAINS.get(N)["fwd_powers"], mont_const(self.generator.value)
            )
        return self._x_lde_arr

    # ------------------------------------------------------------------
    # cached per-instance device tables
    # ------------------------------------------------------------------
    def _interp_tables(self):
        """Tables for prefix-domain interpolation + LDE (see module doc)."""
        if self._interp_cache is not None:
            return self._interp_cache
        n = self.randomized_trace_length
        M = self.omicron_domain_length
        N = self.fri_domain_length
        g = self.generator.value
        w = self.omicron.value
        E = self.expansion_factor
        x_lde = self._x_lde()

        if n <= NTT.HOST_ZEROFIER_MAX:
            # small traces: host coefficients; Z_n' via the coefficient
            # derivative (k+1) * z_{k+1} evaluated with one length-M NTT
            from ..poly.host_ntt import host_zerofier

            from ..field.limbs import NLIMBS

            pts = [e.value for e in self.omicron_powers(n)]
            zn = device_from_ints(host_zerofier(pts))          # (L, n+1)
            kplus1 = np.arange(1, zn.shape[-1], dtype=np.uint32)
            k_limbs = np.zeros((NLIMBS, len(kplus1)), dtype=np.uint32)
            k_limbs[0] = kplus1 & 0xFFFF
            k_limbs[1] = kplus1 >> 16
            k_mont = F.to_mont(jnp.asarray(k_limbs))
            dz = F.mont_mul(zn[..., 1:], k_mont)                # (L, n)
            dz_evals = NTT.ntt(NTT._pad_coeffs(dz, M))          # (L, M)
            inv_dz = F.batch_inv(dz_evals[..., :n])             # (L, n)
            zn_fri = NTT.coset_evaluate(zn, g, N)               # (L, N)
        else:
            # large traces: NO coefficient form of Z_n anywhere.  Z_n on
            # the FRI coset comes from the rolling evaluation kernel, and
            # 1/Z_n'(w^i) from the SUFFIX zerofier S = prod_{j>=n}(x - w^j):
            # Z_n * S = x^M - 1  =>  Z_n'(w^i) = M * w^{-i} / S(w^i) at the
            # prefix roots, so  1/Z_n'(w^i) = S(w^i) * w^i / M  — closed
            # form, no derivative, no forward NTT, no batched inversion.
            zn_fri = NTT.prefix_zerofier_evals(x_lde, w, E, n)  # (L, N)
            m_tab = DOMAINS.get(M)["fwd_powers"]                # w^i table
            if M == n:
                # degenerate (degree-1 AIR at a power-of-two randomized
                # trace): Z_n = x^M - 1, so 1/Z_n'(w^i) = w^i / M
                inv_dz = F.mont_mul(m_tab, mont_const(pow(M, P - 2, P)))
            else:
                suffix = NTT.prefix_zerofier_evals(m_tab, w, 1, M - n)
                # S(w^i) = w^{n(M-n)} * S0(w^{i-n}) and for i < n the
                # wrapped index i-n+M lands in the LAST n entries of S0
                const = pow(w, n * (M - n), P) * pow(M, P - 2, P) % P
                inv_dz = F.mont_mul(
                    F.mont_mul(suffix[..., M - n :], m_tab[..., :n]),
                    mont_const(const),
                )                                               # (L, n)

        # 1 / ((g*omega_N^j)^M - 1): period = expansion_factor, so only E
        # distinct values exist — computed as E host inversions and tiled
        # on device (a host loop over all N big-ints took minutes at 2^24)
        zeta = pow(self.omega.value, M, P)
        gM = pow(g, M, P)
        vals = [pow(gM * pow(zeta, j, P) % P - 1, P - 2, P) for j in range(E)]
        inv_xm = jnp.tile(device_from_ints(vals), (1, N // E))

        # fused table: _trace_lde multiplies by Z_n(x) and 1/(x^M - 1)
        # back-to-back, so bake their product once (halves resident tables
        # and saves one full-codeword multiply per register per proof)
        zn_over_xm = F.mont_mul(zn_fri, inv_xm)

        self._interp_cache = {
            "inv_dz": inv_dz,
            # zero-padded to the omicron domain AND pre-multiplied by M:
            # rides the blocked iNTT's fused pre-scale slot —
            # M * intt(c * t) == intt(c * (M*t)) by linearity, so the
            # eager full-width M-scaling multiply disappears
            "inv_dz_padded_m": F.mont_mul(
                NTT._pad_coeffs(inv_dz, M), mont_const(M)
            ),
            "zn_over_xm": zn_over_xm,
            "x_lde": x_lde,
            "m_const": mont_const(M),
        }
        return self._interp_cache

    # -- sharding hooks (overridden by parallel.sharded_stark) ----------
    def _place_codeword(self, arr: jnp.ndarray) -> jnp.ndarray:
        """Device-placement hook for codeword-axis arrays (identity here;
        the sharded prover places them NamedSharding over the sp axis)."""
        return arr

    def _lde(self, coeffs: jnp.ndarray, offset: int, order: int) -> jnp.ndarray:
        """LDE hook: single-device coset evaluation (the sharded prover
        substitutes a domain-sharded evaluation)."""
        return NTT.coset_evaluate(coeffs, offset, order)

    def _intt(self, values: jnp.ndarray) -> jnp.ndarray:
        """iNTT hook (the sharded prover substitutes the four-step
        distributed transform)."""
        return NTT.intt(values)

    def _merkle_from_canon(self, canon) -> MerkleTree:
        """Commitment hook: paired-leaf tree (the sharded prover
        substitutes the per-shard MerkleForest — identical bytes)."""
        return MerkleTree.from_limbs_paired(canon)

    def _commit_rows(self, codeword: jnp.ndarray):
        """Commit one (L, N) device codeword.  Returns (rows, tree): rows
        is a canonical opening-value accessor.

        On TPU backends the commitment hashes ON DEVICE
        (commit/device_merkle.py) — only the root and queried nodes/values
        cross the ~16 MB/s transfer boundary.  On CPU the codeword is
        canonicalized to host memory (free — same RAM) and hashed by the
        C++ batch hasher; the sharded prover further substitutes per-shard
        blocks (SURVEY.md §2 parallel table row 4).  All paths produce
        byte-identical commitments."""
        from ..commit.device_merkle import device_commit_paired, use_device_commit

        if use_device_commit(codeword.shape[-1]):
            return device_commit_paired(codeword)
        from ..utils.convert import canonical_np

        canon = canonical_np(codeword)
        return canon, self._merkle_from_canon(canon)

    def _commit_rows_many(self, codewords: jnp.ndarray):
        """Commit R stacked codewords (R, L, N).  On the host path all R
        are canonicalized in ONE device call + transfer (each separate
        call pays ~25 ms of tunnel dispatch latency — measurable at small
        domains where the data itself is tiny)."""
        from ..commit.device_merkle import (
            device_commit_paired_many,
            use_device_commit,
        )

        R = codewords.shape[0]
        if R == 1:
            # single-register workloads (MiMC): share the unbatched commit
            # executable instead of compiling a second (1, L, N)-shaped
            # tree graph (~40 s of XLA compile, docs/design.md §9)
            return [self._commit_rows(codewords[0])]
        if use_device_commit(codewords.shape[-1]):
            # ONE dispatch for all R trees + ONE root fetch
            return device_commit_paired_many(codewords)
        from ..utils.convert import canonical_np

        canon = canonical_np(codewords)                   # (R, N, L)
        return [(canon[s], self._merkle_from_canon(canon[s])) for s in range(R)]

    def _compiled_air(self, transition_constraints) -> "callable":
        """Generic pointwise AIR evaluator, cached by CONSTRAINT CONTENT:
        the fused quotient executable is keyed on evaluator identity, so a
        fresh compile_air closure per prove would retrace it every proof."""
        key = tuple(
            tuple(sorted((k, c.value) for k, c in tc.dictionary.items()))
            for tc in transition_constraints
        )
        cache = getattr(self, "_air_fn_cache", None)
        if cache is None:
            cache = self._air_fn_cache = {}
        if key not in cache:
            cache[key] = compile_air(transition_constraints)
        return cache[key]

    # ------------------------------------------------------------------
    # blocked-coset transforms (the single-executable transform path)
    # ------------------------------------------------------------------
    def _use_blocked(self) -> bool:
        from ..ops.stage_ntt import staged_ok

        E = self.expansion_factor
        M = self.omicron_domain_length
        return (
            self.blocked_lde
            and self.fri_domain_length == E * M
            and staged_ok(M)
        )

    def _coset_scales(self) -> jnp.ndarray:
        """(E, L, M) tables: scales[r][k] = (g * omega_N^r)^k.  Scaling
        length-M coefficients by row r and NTT-ing evaluates on the r-th
        coset of the omicron grid inside the FRI domain — the N-point LDE
        is exactly these E batched M-point transforms interleaved."""
        if self._coset_scales_arr is None:
            E = self.expansion_factor
            M = self.omicron_domain_length
            N = self.fri_domain_length
            from ..ops.domain import coset_table

            outer = DOMAINS.master_powers_outer(1, E, M, order=N)  # (L,E,M)
            gtab = coset_table(self.generator.value, M)            # (L,M)
            self._coset_scales_arr = _coset_scales_build(outer, gtab)
        return self._coset_scales_arr

    def _coset_ntt(
        self, x: jnp.ndarray, scale: jnp.ndarray, inverse: bool
    ) -> jnp.ndarray:
        """The ONE staged executable: a (..., L, M) transform with a
        fused pre-scale.  Forward and inverse calls share it (direction
        only changes table VALUES, not the traced graph).  Cosets are
        dispatched SEQUENTIALLY rather than as an (E, L, M) batch: the
        staged transform's internal working set is ~20x its data size,
        and the batched form peaked past the chip's HBM at a 2^24 FRI
        domain (measured round 5); dispatches are async, so E small
        launches pipeline on device at no wall-clock cost."""
        from ..ops.stage_ntt import staged_ntt

        if scale.shape != x.shape:
            scale = jnp.broadcast_to(scale, x.shape)
        return staged_ntt(x, inverse=inverse, scale_pre=scale)

    def _intt_blocked(self, padded: jnp.ndarray, pre_scale: jnp.ndarray):
        """iNTT of (..., L, M) through the shared executable;
        ``pre_scale`` rides the fused scale slot (the interpolation path
        feeds 1/Z' here)."""
        return self._coset_ntt(padded, pre_scale, inverse=True)

    def _lde_blocked_single(self, a: jnp.ndarray) -> jnp.ndarray:
        """(..., L, M) coefficients -> (E, ..., L, M) per-coset
        evaluations (interleave with _interleave_cosets for the (..., L, N)
        codeword).

        At most TWO transforms are left in flight before a cheap device
        sync: the staged kernel's working set is ~20x its data (~2.5 GB
        at M = 2^22), and async dispatches allocate their buffers at
        enqueue — four unthrottled launches peaked past the chip's HBM
        next to the prover's ~7 GB of resident tables (measured round 5)."""
        E = self.expansion_factor
        scales = self._coset_scales()
        outs = []
        for r in range(E):
            outs.append(self._coset_ntt(a, scales[r], inverse=False))
            # ONE transform in flight: each sync costs ~25 ms of tunnel
            # latency, but two concurrent working sets next to the
            # prover's ~7 GB of resident tables scraped the HBM ceiling
            _throttle(outs[-1])
        return jnp.stack(outs)

    def _lde_blocked_poly(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        """(L, K) coefficients (K <= N) -> (L, N) codeword via B = ceil(K/M)
        block transforms through the shared executable:
        f = sum_b x^(bM) f_b, and on the FRI coset x^(bM) depends only on
        the coset index r — a SCALAR per (b, r), so blocks combine with
        one weighted sum before interleaving."""
        E = self.expansion_factor
        M = self.omicron_domain_length
        N = self.fri_domain_length
        K = coeffs.shape[-1]
        B = -(-K // M)
        assert B * M <= N
        padded = NTT._pad_coeffs(coeffs, B * M)
        if B == 1:
            # no recombination — and no (B, E, L, M) stack copy, which at
            # a 2^24 domain is 512 MB of transient HBM
            return _interleave_cosets(self._lde_blocked_single(padded))
        blocks = jnp.moveaxis(
            padded.reshape(padded.shape[:-1] + (B, M)), -2, 0
        )                                                       # (B, L, M)
        parts = jnp.stack(
            [self._lde_blocked_single(blocks[b]) for b in range(B)]
        )                                                       # (B, E, L, M)
        g = self.generator.value
        w = self.omega.value
        consts = np.empty((B, E, parts.shape[-2], 1), dtype=np.uint32)
        from ..field.limbs import R as _R, int_to_limbs

        for b in range(B):
            for r in range(E):
                v = pow(g, M * b, P) * pow(w, r * M * b, P) % P
                consts[b, r, :, 0] = int_to_limbs(v * _R % P)
        return _interleave_cosets(
            _combine_blocks(parts, jnp.asarray(consts))
        )

    def _trace_lde(self, columns: jnp.ndarray) -> jnp.ndarray:
        """(..., R, L, n) trace columns -> (..., R, L, N_fri) LDE.

        Partial-fractions interpolation fused with the LDE: the trace
        polynomial f (degree < n) is never materialized in coefficient form.
        """
        t = self._interp_tables()
        M = self.omicron_domain_length
        N = self.fri_domain_length
        if columns.ndim == 3 and columns.shape[0] == 1:
            # single-register workloads: drop the R=1 axis so the NTT/LDE
            # executables are SHARED with the unbatched randomizer path —
            # each distinct staged-NTT shape costs 60-90 s of XLA compile
            # cold (docs/design.md §9)
            return self._trace_lde(columns[0])[None]
        if self._use_blocked():
            # M/Z'(w^i) rides the iNTT's fused pre-scale slot
            padded = NTT._pad_coeffs(columns, M)
            pre = t["inv_dz_padded_m"]
            if padded.ndim > 2:
                pre = jnp.broadcast_to(pre, padded.shape)
            e = self._intt_blocked(padded, pre)
            a = _rot1(e)                                        # A = rot(M*e)
            a_lde = _interleave_cosets(self._lde_blocked_single(a))
            return F.mont_mul(a_lde, t["zn_over_xm"])
        c = F.mont_mul(columns, t["inv_dz"])                   # v_i / Z'(w^i)
        c = NTT._pad_coeffs(c, M)                               # zeros beyond n
        c = self._place_codeword(c)
        e = self._intt(c)
        a = jnp.roll(e, -1, axis=-1)                            # A = M * rot(e)
        a = F.mont_mul(a, t["m_const"])
        a_lde = self._lde(a, self.generator.value, N)           # (..., R, L, N)
        return F.mont_mul(a_lde, t["zn_over_xm"])

    def _x_lde_pow(self, e: int) -> jnp.ndarray:
        """Codeword of x^e on the FRI coset, closed form:
        (g*omega^j)^e = g^e * omega^(j*e mod N) — one gather from the domain
        power table instead of mont_pow's ~2*bits(e) full-array multiplies
        (at N = 2^23 and e ~ 2^22 that is the difference between one HBM
        pass and ~10 GB of traffic per degree-adjustment shift)."""
        e = int(e)
        if e in self._xpow_cache:
            return self._xpow_cache[e]
        N = self.fri_domain_length
        tab = DOMAINS.get(N)["fwd_powers"]
        # index math on device: a host numpy arange at N = 2^24 is a
        # 128 MB allocation per distinct exponent.  uint32 products wrap
        # mod 2^32, and N | 2^32, so (j*e) & (N-1) is exact without x64.
        idx = (
            jnp.arange(N, dtype=jnp.uint32) * jnp.uint32(e % N)
        ) & jnp.uint32(N - 1)
        out = F.mont_mul(
            jnp.take(tab, idx, axis=-1),
            mont_const(pow(self.generator.value, e, P)),
        )
        # cache only at small domains: repeated proofs (RPSSS signing)
        # reuse the table, but at N = 2^24 each entry is 512 MB of HBM
        if N <= (1 << 22):
            self._xpow_cache[e] = out
        return out

    def _boundary_tables(self, boundary: Boundary):
        """FRI-domain codewords of the boundary zerofiers (inverted) and
        interpolants, cached by boundary structure/values.  All registers'
        Horner scans + the batched inversion run as ONE executable
        (_boundary_tables_core) — the per-register eager loop compiled
        ~2R+1 executables (~12 s cold at a 2^22 domain)."""
        key = tuple(sorted((c, r, v.value) for c, r, v in boundary))
        if key in self._bz_cache:
            return self._bz_cache[key]
        # boundaries differ per statement, and each entry pins ~1 GB of
        # HBM at a 2^24 domain — cap the cache so streaming many proofs
        # (the pipelined prover) cannot exhaust device memory
        while len(self._bz_cache) >= 2:
            self._bz_cache.pop(next(iter(self._bz_cache)))
        t = self._interp_tables()
        zerofiers = self.boundary_zerofiers(boundary)
        interpolants = self.boundary_interpolants(boundary)

        def stack_coeffs(polys):
            deg = max(max(len(p.coefficients) for p in polys), 1)
            return jnp.stack(
                [
                    NTT._pad_coeffs(
                        device_from_ints(
                            [c.value for c in p.coefficients] or [0]
                        ),
                        deg,
                    )
                    for p in polys
                ]
            )                                               # (R, L, deg)

        out = _boundary_tables_core(
            stack_coeffs(zerofiers), stack_coeffs(interpolants), t["x_lde"]
        )
        self._bz_cache[key] = out
        return out

    # ------------------------------------------------------------------
    # prover
    # ------------------------------------------------------------------
    def prove(
        self,
        trace: List[List[FieldElement]],
        transition_constraints: Sequence[MPolynomial],
        boundary: Boundary,
        transition_zerofier: TransitionZerofier,
        proof_stream: Optional[ProofStream] = None,
        air_evaluator=None,
        trace_columns=None,
        urandom=os.urandom,
    ) -> bytes:
        """Generate a proof.  ``air_evaluator``, if given, is a device
        function (x_lde, current, next_) -> (C, N, L) evaluating the
        transition constraints pointwise; otherwise the symbolic
        constraints are compiled generically.

        The trace may be supplied either as host rows (``trace``, the
        reference's interface) or as ``trace_columns`` — an (R, L, n_cycles)
        Montgomery device array straight from a device trace generator
        (e.g. models.mimc.trace_columns), skipping the host big-int
        conversion that dominates at large trace lengths."""
        if proof_stream is None:
            proof_stream = ProofStream()

        R = self.num_registers
        N = self.fri_domain_length
        t = self._interp_tables()

        # randomized trace columns on device: (R, L, n)
        rand_rows = [
            [self.field.sample(urandom(17)).value for _ in range(R)]
            for _ in range(self.num_randomizers)
        ]
        if trace_columns is not None:
            n_cycles = trace_columns.shape[-1]
            rand_cols = jnp.stack(
                [
                    device_from_ints([rand_rows[c][s] for c in range(len(rand_rows))])
                    for s in range(R)
                ]
            )
            columns = jnp.concatenate([trace_columns, rand_cols], axis=-1)
            n_rows = n_cycles + self.num_randomizers
        else:
            rows = [[v.value for v in row] for row in trace] + rand_rows
            columns = jnp.stack(
                [
                    device_from_ints([rows[c][s] for c in range(len(rows))])
                    for s in range(R)
                ]
            )
            n_rows = len(rows)

        import jax as _jax

        def _sync(arr):
            """Force completion: block_until_ready does not synchronize
            through the axon tunnel; a data-dependent host read does.
            Costs one small fetch (~25 ms) per phase boundary — the price
            of a phase table that sums to wall clock."""
            leaf = _jax.tree_util.tree_leaves(arr)[0]
            np.asarray(_jax.device_get(leaf[(slice(0, 1),) * leaf.ndim]))

        # trace LDE; the one-cycle shift (omicron = omega^expansion, so
        # trace(omicron * x) is a roll of the codeword) happens INSIDE the
        # fused AIR-quotient executable
        with self.timer.phase("trace_lde"):
            trace_lde = self._trace_lde(columns)                 # (R, L, N)
            _sync(trace_lde)

        # boundary quotients, committed
        with self.timer.phase("boundary_quotients"):
            inv_bz, interp = self._boundary_tables(boundary)
            bq_lde = _bq_core(trace_lde, interp, inv_bz)         # (R, L, N)
            _sync(bq_lde)
        with self.timer.phase("commit_bq"):
            bq_trees: List[MerkleTree] = []
            bq_rows = []                                      # opening sources
            for rows, tree in self._commit_rows_many(bq_lde):
                bq_rows.append(rows)
                bq_trees.append(tree)
                proof_stream.push(tree.root)

        # transition quotients: pointwise AIR / zerofier, one executable
        # (models cache their evaluator so the jit wrapper keyed on it
        # never retraces across proofs)
        with self.timer.phase("air_quotients"):
            if air_evaluator is None:
                # generic symbolic fallback: keep it EAGER — its per-term
                # Python add/mul chains are fusion-hostile inside one
                # executable (XLA recomputes producers per consumer; see
                # field/ops.py field_sum note).  Models on the hot path
                # supply a cached evaluator and take the fused branch.
                air_evaluator = self._compiled_air(transition_constraints)
                next_lde = jnp.roll(
                    trace_lde, -self.expansion_factor, axis=-1
                )
                constraint_lde = air_evaluator(t["x_lde"], trace_lde, next_lde)
                tq_lde = F.mont_mul(
                    constraint_lde, transition_zerofier.inv_codeword
                )
                del constraint_lde, next_lde
            else:
                air_q = _air_quotient_fn(air_evaluator, self.expansion_factor)
                tq_lde = air_q(
                    t["x_lde"], trace_lde, transition_zerofier.inv_codeword
                )
            # at N = 2^24 each full codeword is 512 MB of HBM: release the
            # trace LDE as soon as the quotients exist (nothing downstream
            # reads it)
            del trace_lde
            _sync(tq_lde)

        # randomizer polynomial
        max_degree = self.max_degree(transition_constraints)
        with self.timer.phase("randomizer_poly"):
            if max_degree + 1 > self.bulk_randomizer_threshold:
                # large traces: bulk device sampling (utils/rand.py) — the
                # per-element host path would cost minutes at 2^22 coeffs
                from ..utils.rand import bulk_random_mont

                rand_poly_dev = bulk_random_mont(max_degree + 1, urandom)
            else:
                rand_coeffs = [
                    self.field.sample(urandom(17)).value
                    for _ in range(max_degree + 1)
                ]
                rand_poly_dev = device_from_ints(rand_coeffs)
            if self._use_blocked():
                rand_lde = self._lde_blocked_poly(rand_poly_dev)
            else:
                rand_lde = self._lde(rand_poly_dev, self.generator.value, N)
            _sync(rand_lde)
        with self.timer.phase("commit_randomizer"):
            rand_rows, rand_tree = self._commit_rows(rand_lde)
            proof_stream.push(rand_tree.root)

        # Fiat-Shamir weights
        num_constraints = len(transition_constraints)
        weights = self.sample_weights(
            1 + 2 * num_constraints + 2 * R, proof_stream.prover_fiat_shamir()
        )

        # weighted combination, entirely pointwise.  The transcript weight
        # order is: randomizer, per-constraint [tq, shifted tq],
        # per-register [bq, shifted bq] (reference: fast_stark.py:130-145),
        # but algebraically  w_a*q + w_b*x^s*q = q * (w_a + w_b*x^s),  so
        # each quotient is multiplied ONCE by a fused weight codeword —
        # the shifted codewords are never materialized.  Field sums are
        # exact, so the combination VALUES (and hence the proof bytes) are
        # identical to the unfused form.  The whole reduction runs as ONE
        # jitted call (_combination_core): per-term eager ops paid ~25 ms
        # of dispatch latency each through the device tunnel.
        with self.timer.phase("combination"):
            tq_bounds = self.transition_quotient_degree_bounds(transition_constraints)
            bq_bounds = self.boundary_quotient_degree_bounds(n_rows, boundary)
            tq_shift = jnp.stack(
                [self._x_lde_pow(max_degree - b) for b in tq_bounds]
            )
            bq_shift = jnp.stack(
                [self._x_lde_pow(max_degree - b) for b in bq_bounds]
            )
            w_dev = jnp.stack([mont_const(wv.value) for wv in weights])
            combo = _combination_core(
                rand_lde, tq_lde, bq_lde, tq_shift, bq_shift, w_dev
            )
            del tq_shift, bq_shift
            _sync(combo)
        del tq_lde, bq_lde, rand_lde, rand_poly_dev

        # FRI proof over the combination codeword
        with self.timer.phase("fri"):
            indices = self.fri.prove(combo, proof_stream)
        del combo

        # linked openings at quadrupled indices (reference: fast_stark.py:154-177)
        duplicated = indices + [
            (i + self.expansion_factor) % N for i in indices
        ]
        quadrupled = sorted(duplicated + [(i + N // 2) % N for i in duplicated])
        # paired leaves: leaf l authenticates BOTH l and l + N/2, so the
        # multiproof only needs the reduced index set
        leaf_indices = sorted({i % (N // 2) for i in duplicated})

        # batched openings: per section, ONE value list + ONE multiproof
        # (the reference pushes a full path per index, fast_stark.py:158-177)
        self.timer.totals.setdefault("openings", 0.0)
        _t_open = __import__("time").perf_counter()
        from ..commit.device_merkle import gather_rows

        for s in range(R):
            proof_stream.push(gather_rows(bq_rows[s], quadrupled))
            proof_stream.push(open_multi(bq_trees[s], leaf_indices))
        proof_stream.push(gather_rows(rand_rows, quadrupled))
        proof_stream.push(open_multi(rand_tree, leaf_indices))
        proof_stream.push(gather_rows(transition_zerofier.rows, quadrupled))
        proof_stream.push(open_multi(transition_zerofier.tree, leaf_indices))
        self.timer.totals["openings"] += __import__("time").perf_counter() - _t_open
        self.timer.counts["openings"] += 1

        return proof_stream.serialize()

    # ------------------------------------------------------------------
    # verifier (host scalar; mirrors reference fast_stark.py:180-286)
    # ------------------------------------------------------------------
    @rejects_malformed
    def verify(
        self,
        proof: bytes,
        transition_constraints: Sequence[MPolynomial],
        boundary: Boundary,
        transition_zerofier_root: bytes,
        proof_stream_factory=None,
        air_point_evaluator=None,
        air_index_evaluator=None,
    ) -> bool:
        """Verify a proof.  ``air_point_evaluator``, if given, is a scalar
        function (x, current_trace, next_trace) -> constraint values used
        in place of the symbolic ``MPolynomial.evaluate`` — models whose
        constraints factor (e.g. Rescue's lhs - rhs**3,
        models/rescue_prime.py:make_point_air) evaluate orders of magnitude
        faster than their expanded monomial form."""
        original_trace_length = 1 + max(c for c, r, v in boundary)
        randomized_trace_length = original_trace_length + self.num_randomizers

        if proof_stream_factory is None:
            proof_stream = ProofStream.deserialize(proof)
        else:
            proof_stream = proof_stream_factory(proof)

        R = self.num_registers
        boundary_quotient_roots = [proof_stream.pull_typed(bytes) for _ in range(R)]
        randomizer_root = proof_stream.pull_typed(bytes)

        weights = self.sample_weights(
            1 + 2 * len(transition_constraints) + 2 * R,
            proof_stream.verifier_fiat_shamir(),
        )

        polynomial_values: List[Tuple[int, int]] = []
        if not self.fri.verify(proof_stream, polynomial_values):
            raise VerificationError(f"FRI rejected: {self.fri.last_rejection}")
        polynomial_values.sort(key=lambda iv: iv[0])
        indices = [i for i, v in polynomial_values]
        values = [v for i, v in polynomial_values]

        N = self.fri.domain_length
        # `indices` already contains each test's a AND b positions (from
        # FRI's polynomial_values), so adding the +expansion shifts yields
        # exactly the prover's sorted `quadrupled` multiset
        duplicated = sorted(
            indices + [(i + self.expansion_factor) % N for i in indices]
        )
        # paired leaves: leaf l covers positions l and l + N/2
        leaf_indices = sorted({i % (N // 2) for i in duplicated})

        depth = N.bit_length() - 2                    # paired tree: N/2 leaves

        from ..commit.hashing import hash_paired_leaf

        def pull_section(root, what: str) -> Dict[int, int]:
            values = proof_stream.pull_typed(list)
            proof = proof_stream.pull_typed(list)
            if len(values) != len(duplicated) or not all(
                isinstance(v, int) for v in values
            ):
                raise MalformedProof(f"{what}: bad opened-values section")
            section = dict(zip(duplicated, values))
            ld = {
                l: hash_paired_leaf(section[l], section[l + N // 2])
                for l in leaf_indices
            }
            if not verify_multi(root, depth, ld, proof):
                raise VerificationError(f"{what}: Merkle multiproof failed")
            return section

        leafs: List[Dict[int, int]] = []
        for r in range(R):
            leafs.append(
                pull_section(boundary_quotient_roots[r], f"boundary quotient {r}")
            )

        randomizer = pull_section(randomizer_root, "randomizer")
        zerofier_leafs = pull_section(transition_zerofier_root, "transition zerofier")

        zerofiers = self.boundary_zerofiers(boundary)
        interpolants = self.boundary_interpolants(boundary)
        tq_bounds = self.transition_quotient_degree_bounds(transition_constraints)
        bq_bounds = self.boundary_quotient_degree_bounds(
            randomized_trace_length, boundary
        )
        max_degree = self.max_degree(transition_constraints)

        if air_index_evaluator is not None:
            bad = self._verify_combinations_batched(
                indices, values, leafs, randomizer, zerofier_leafs, weights,
                zerofiers, interpolants, tq_bounds, bq_bounds, max_degree,
                air_index_evaluator,
            )
            if bad is not None:
                raise VerificationError(
                    f"combination mismatch at query index {bad}"
                )
            if proof_stream.read_index != len(proof_stream.objects):
                raise MalformedProof("trailing transcript objects")
            return True

        for i in range(len(indices)):
            current_index = indices[i]
            domain_current = self.generator * (self.omega ** current_index)
            next_index = (current_index + self.expansion_factor) % N
            domain_next = self.generator * (self.omega ** next_index)

            current_trace = []
            next_trace = []
            for s in range(R):
                bq_cur = FieldElement(leafs[s][current_index], self.field)
                bq_next = FieldElement(leafs[s][next_index], self.field)
                current_trace.append(
                    bq_cur * zerofiers[s].evaluate(domain_current)
                    + interpolants[s].evaluate(domain_current)
                )
                next_trace.append(
                    bq_next * zerofiers[s].evaluate(domain_next)
                    + interpolants[s].evaluate(domain_next)
                )

            if air_point_evaluator is not None:
                transition_values = air_point_evaluator(
                    domain_current, current_trace, next_trace
                )
            else:
                point = [domain_current] + current_trace + next_trace
                transition_values = [
                    tc.evaluate(point) for tc in transition_constraints
                ]

            terms: List[FieldElement] = [
                FieldElement(randomizer[current_index], self.field)
            ]
            tz_value = FieldElement(zerofier_leafs[current_index], self.field)
            for s in range(len(transition_values)):
                quotient = transition_values[s] / tz_value
                terms.append(quotient)
                terms.append(quotient * (domain_current ** (max_degree - tq_bounds[s])))
            for s in range(R):
                bqv = FieldElement(leafs[s][current_index], self.field)
                terms.append(bqv)
                terms.append(bqv * (domain_current ** (max_degree - bq_bounds[s])))

            combination = reduce(
                lambda a, b: a + b,
                [terms[j] * weights[j] for j in range(len(terms))],
                self.field.zero(),
            )
            if combination.value != values[i]:
                raise VerificationError(
                    f"combination mismatch at query index {current_index}"
                )

        # anti-malleability: every transcript object must have been consumed
        # (trailing junk would give distinct valid encodings of one proof)
        if proof_stream.read_index != len(proof_stream.objects):
            raise MalformedProof("trailing transcript objects")

        return True

    # ------------------------------------------------------------------
    # batched verifier core: all K query checks through the device
    # kernels (one upload, one executable, one fetch) instead of K
    # iterations of host scalar field arithmetic — the reference's hot
    # verify loop (fast_stark.py:244-284) does R boundary-polynomial
    # evaluations + the AIR + ~W combination terms per index in Python.
    # ------------------------------------------------------------------
    def _verify_combinations_batched(
        self, indices, claimed, leafs, randomizer, zerofier_leafs, weights,
        zerofiers, interpolants, tq_bounds, bq_bounds, max_degree,
        air_index_evaluator,
    ) -> Optional[int]:
        """Returns the first mismatching query index, or None if all K
        combination values check out."""
        R = self.num_registers
        N = self.fri.domain_length
        K = len(indices)
        next_indices = [(i + self.expansion_factor) % N for i in indices]

        # ONE upload: every opened value + the query points, concatenated
        flat: List[int] = []
        for s in range(R):
            flat.extend(leafs[s][i] for i in indices)
            flat.extend(leafs[s][i] for i in next_indices)
        flat.extend(randomizer[i] for i in indices)
        flat.extend(zerofier_leafs[i] for i in indices)
        g, w = self.generator.value, self.omega.value
        flat.extend(g * pow(w, i, P) % P for i in indices)
        flat.extend(g * pow(w, i, P) % P for i in next_indices)
        vals = device_from_ints(flat)                       # (L, (2R+4)K)

        def poly_coeffs(polys):
            deg = max(max(len(p.coefficients) for p in polys), 1)
            return jnp.stack(
                [
                    NTT._pad_coeffs(
                        device_from_ints(
                            [c.value for c in p.coefficients] or [0]
                        ),
                        deg,
                    )
                    for p in polys
                ]
            )                                               # (R, L, deg)

        bz = poly_coeffs(zerofiers)
        ip = poly_coeffs(interpolants)
        w_dev = jnp.stack([mont_const(wv.value) for wv in weights])
        tq_sh = tuple(max_degree - b for b in tq_bounds)
        bq_sh = tuple(max_degree - b for b in bq_bounds)
        idx_dev = jnp.asarray(np.asarray(indices, dtype=np.uint32))

        combo = _verify_core(
            vals, bz, ip, w_dev, idx_dev, air_index_evaluator,
            R, K, tq_sh, bq_sh,
        )
        got = ints_from_device(combo)
        for i in range(K):
            if got[i] != claimed[i]:
                return indices[i]
        return None


@functools.partial(
    jax.jit, static_argnames=("air_index_evaluator", "R", "K", "tq_sh", "bq_sh")
)
def _verify_core(vals, bz, ip, weights, idx, air_index_evaluator, R, K, tq_sh, bq_sh):
    """Batched combination recomputation at K query points.

    vals: (L, (2R+4)K) Montgomery — per register K current + K next
    boundary-quotient openings, then K randomizer, K zerofier openings,
    K current points, K next points.
    """
    parts = [vals[..., i * K : (i + 1) * K] for i in range(2 * R + 4)]
    bq_cur = jnp.stack(parts[0:2 * R:2])                   # (R, L, K)
    bq_next = jnp.stack(parts[1:2 * R:2])
    rand_cur = parts[2 * R]
    tz_cur = parts[2 * R + 1]
    x_cur = parts[2 * R + 2]
    x_next = parts[2 * R + 3]

    def poly_eval(coeffs, points):
        # coeffs (R, L, D), points (L, K) -> (R, L, K)
        return NTT.evaluate_domain_horner(
            coeffs, jnp.broadcast_to(points, (coeffs.shape[0],) + points.shape)
        )

    cur_trace = F.add(F.mont_mul(bq_cur, poly_eval(bz, x_cur)), poly_eval(ip, x_cur))
    next_trace = F.add(
        F.mont_mul(bq_next, poly_eval(bz, x_next)), poly_eval(ip, x_next)
    )
    constraints = air_index_evaluator(idx, cur_trace, next_trace)  # (C, L, K)
    tq = F.mont_mul(constraints, F.batch_inv(tz_cur))

    terms = [rand_cur]
    for s, e in enumerate(tq_sh):
        terms.append(tq[s])
        terms.append(F.mont_mul(tq[s], F.mont_pow(x_cur, e)))
    for s, e in enumerate(bq_sh):
        terms.append(bq_cur[s])
        terms.append(F.mont_mul(bq_cur[s], F.mont_pow(x_cur, e)))
    return F.weighted_sum(jnp.stack(terms), weights[:, None] if weights.ndim == 2 else weights)


@jax.jit
def _rot1(e: jnp.ndarray) -> jnp.ndarray:
    """Rotate the last axis down by one (a[k] = e[k+1 mod M]), as
    slice+concat — the eager jnp.roll lowering cost ~11 s of XLA compile
    at the 2^22 omicron domain (round-5 probe)."""
    return jnp.concatenate([e[..., 1:], e[..., :1]], axis=-1)


def _throttle(arr: jnp.ndarray) -> None:
    """Force completion of the queued device work (a 1-element fetch —
    block_until_ready does not synchronize through the axon tunnel).
    Used to bound how many big-working-set executables are in flight.
    Under tracing (the batch prover jits the whole LDE into one
    executable) there is no queue to drain — no-op."""
    if isinstance(arr, jax.core.Tracer):
        return
    np.asarray(jax.device_get(arr[(slice(0, 1),) * arr.ndim]))


@jax.jit
def _boundary_tables_core(bz: jnp.ndarray, ip: jnp.ndarray, x_lde: jnp.ndarray):
    """(R, L, D) boundary zerofier/interpolant coefficients -> their
    (R, L, N) FRI-domain codewords (zerofiers inverted), one executable."""
    pts = jnp.broadcast_to(x_lde, (bz.shape[0],) + x_lde.shape)
    return (
        F.batch_inv(NTT.evaluate_domain_horner(bz, pts)),
        NTT.evaluate_domain_horner(ip, pts),
    )


@jax.jit
def _bq_core(trace_lde, interp, inv_bz):
    """Boundary quotients: (trace - interpolant) / zerofier, pointwise."""
    return F.mont_mul(F.sub(trace_lde, interp), inv_bz)


@functools.lru_cache(maxsize=None)
def _air_quotient_fn(air_evaluator, expansion_factor: int):
    """Fused AIR-quotient executable for a given (cached) model
    evaluator: shifts the trace by one cycle (a roll by the expansion
    factor), evaluates the constraints pointwise and divides by the
    transition zerofier — one executable instead of the eager chain
    (roll + per-constraint ops + quotient multiply, ~5 compiles and as
    many dispatch latencies)."""

    @jax.jit
    def fn(x_lde, trace_lde, inv_tz):
        next_lde = jnp.roll(trace_lde, -expansion_factor, axis=-1)
        constraint_lde = air_evaluator(x_lde, trace_lde, next_lde)
        return F.mont_mul(constraint_lde, inv_tz)

    return fn


@jax.jit
def _coset_scales_build(outer: jnp.ndarray, gtab: jnp.ndarray) -> jnp.ndarray:
    """(L, E, M) omega_N^(r*k) outer gather x (L, M) g^k -> (E, L, M)."""
    return F.mont_mul(jnp.moveaxis(outer, 0, 1), gtab)


@jax.jit
def _interleave_cosets(x: jnp.ndarray) -> jnp.ndarray:
    """(E, ..., L, M) per-coset evaluations -> (..., L, E*M) natural-order
    codeword: FRI-domain index j = r + E*i holds coset r, position i.

    Lowered as CHUNKED moveaxis+reshape transposes (8 column blocks,
    concatenated).  Measured at a 2^24 domain against the alternatives
    (round 5): one whole-array transpose needs >6 GB of XLA scratch (it
    OOMed next to the prover's resident tables); interior-padded
    dilations OR-ed together cost 871 s (!) of XLA compile; a flat
    gather compiles in 2 s but runs 6x slower than this form
    (377 ms vs 60 ms)."""
    E, M = x.shape[0], x.shape[-1]
    C = min(8, M)
    w = M // C
    outs = []
    for c in range(C):
        blk = x[..., c * w : (c + 1) * w]              # (E, ..., L, w)
        y = jnp.moveaxis(blk, 0, -1)                   # (..., L, w, E)
        outs.append(y.reshape(y.shape[:-2] + (w * E,)))
    return jnp.concatenate(outs, axis=-1)


@jax.jit
def _combine_blocks(parts: jnp.ndarray, consts: jnp.ndarray) -> jnp.ndarray:
    """(B, E, L, M) block evaluations, (B, E, L, 1) scalars x^(bM)|coset r
    -> (E, L, M) weighted sum (the blocked-poly LDE recombination)."""
    return F.field_sum(F.mont_mul(parts, consts))


@jax.jit
def _combination_core(rand_lde, tq_lde, bq_lde, tq_shift, bq_shift, weights):
    """Weighted combination codeword in one executable.

    weights: (W, L, 1) in transcript order [w_rand, (w_tq, w_tq_sh)*C,
    (w_bq, w_bq_sh)*R]; tq_lde/tq_shift (C, L, N); bq_lde/bq_shift
    (R, L, N).  Terms are stacked and reduced with the scan-based
    field_sum — NOT a Python add-chain (field/ops.py fusion note)."""
    C = tq_lde.shape[0]
    R = bq_lde.shape[0]
    terms = [F.mont_mul(rand_lde, weights[0])]
    idx = 1
    for s in range(C):
        ws = F.add(weights[idx], F.mont_mul(weights[idx + 1], tq_shift[s]))
        terms.append(F.mont_mul(tq_lde[s], ws))
        idx += 2
    for s in range(R):
        ws = F.add(weights[idx], F.mont_mul(weights[idx + 1], bq_shift[s]))
        terms.append(F.mont_mul(bq_lde[s], ws))
        idx += 2
    return F.field_sum(jnp.stack(terms))


# ---------------------------------------------------------------------------
# generic pointwise AIR compiler
# ---------------------------------------------------------------------------

def compile_air(transition_constraints: Sequence[MPolynomial]):
    """Compile symbolic AIR constraints into a pointwise device evaluator.

    Returns fn(x_lde, current, next_) -> (C, N, L): for each constraint,
    sum over dictionary terms of coeff * prod(var_i ^ e_i), with per-variable
    power tables built by repeated multiplication.  Workloads can supply a
    hand-written evaluator instead (see models/rescue_prime.py) — this is
    the generic fallback, the device analog of MPolynomial.evaluate.
    """

    def evaluator(x_lde, current, next_):
        R = current.shape[0]
        vars_ = [x_lde] + [current[s] for s in range(R)] + [next_[s] for s in range(R)]
        nvars = len(vars_)
        # max exponent per variable across all constraints
        max_exp = [0] * nvars
        for c in transition_constraints:
            for k in c.dictionary.keys():
                for vi, e in enumerate(k):
                    if vi < nvars:
                        max_exp[vi] = max(max_exp[vi], e)
        # power tables: powers[v][e] = vars_[v]^e
        powers = []
        for v in range(nvars):
            tab = [None, vars_[v]]
            for e in range(2, max_exp[v] + 1):
                tab.append(F.mont_mul(tab[-1], vars_[v]))
            powers.append(tab)

        outs = []
        for c in transition_constraints:
            acc = None
            for k, coeff in c.dictionary.items():
                term = jnp.broadcast_to(mont_const(coeff.value), x_lde.shape)
                for vi, e in enumerate(k):
                    if e > 0 and vi < nvars:
                        term = F.mont_mul(term, powers[vi][e])
                acc = term if acc is None else F.add(acc, term)
            if acc is None:
                acc = jnp.zeros_like(x_lde)
            outs.append(acc)
        return jnp.stack(outs)

    return evaluator
