"""Batched proving: B independent STARK proofs through one device pipeline.

The reference proves one signature at a time (fast_rpsss.py:58-61); here a
whole batch shares every device kernel launch (trace generation, LDE,
AIR, combination, FRI folds run as (B, ...) tensors — shardable over the
mesh's dp axis), while the inherently per-proof host work (Merkle roots,
Fiat-Shamir challenges, transcript assembly) loops over the batch.

This is BASELINE config 5: "batch of 64 signatures sharded across hosts".
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..commit.merkle import MerkleTree, open_multi
from ..field import ops as F
from ..field.limbs import NLIMBS
from ..field.scalar import Field, FieldElement, P
from ..models import rescue_prime as RP
from ..ops import ntt as NTT
from ..ops.domain import mont_const, power_table
from ..protocols.fast_stark import FastStark, TransitionZerofier
from ..protocols.fri import _fold_kernel_batched
from ..transcript.proof_stream import SignatureProofStream
from ..commit.device_merkle import gather_rows
from ..utils.convert import device_from_ints, int_from_row

_TWO_INV = pow(2, P - 2, P)


class BatchProver:
    """Batched FastStark prover for the Rescue-Prime AIR.

    With ``mesh`` given, proof inputs are placed batch-over-dp /
    codeword-over-sp (parallel/mesh.py shardings) so the jitted phases run
    data-parallel across the mesh; the host transcript loop is untouched
    and proofs stay byte-compatible with the unsharded prover.
    """

    # below B*N total codeword elements, FRI runs entirely on the host
    # (see prove_batch) — B=1 signing at the RPSSS domain (N=4096) is the
    # main beneficiary
    HOST_FRI_MAX = 1 << 14

    def __init__(
        self,
        stark: FastStark,
        rp,
        transition_zerofier: TransitionZerofier,
        mesh=None,
        air=None,
    ):
        self.stark = stark
        self.rp = rp
        self.tz = transition_zerofier
        self.mesh = mesh
        self.field = Field.main()
        # the symbolic AIR expansion (rhs**3, thousands of monomials) is
        # expensive — callers that already built it pass it in
        self.air = air if air is not None else rp.transition_constraints(stark.omicron)
        self._phase1 = jax.jit(self._phase1_impl)
        self._phase2 = jax.jit(self._phase2_impl)
        from ..models.rescue_prime import make_air_evaluator

        self._air_eval = make_air_evaluator(stark)
        # warm tables eagerly (never build inside a trace)
        stark._interp_tables()

    # ------------------------------------------------------------------
    def _phase1_impl(self, sk_batch, randomizer_cols, rand_poly, inv_bz, interp):
        """sk (L, B); randomizers (B, R, L, nrand); rand_poly (B, L, D+1);
        inv_bz/interp (B, R, L, N) boundary tables.  Runs the ENTIRE
        pre-commitment pipeline (trace -> LDE -> AIR quotients -> boundary
        quotients -> randomizer LDE) as one executable — the boundary
        tables depend only on the public outputs, so nothing before the
        Fiat-Shamir weights needs a host round trip."""
        stark = self.stark
        t = stark._interp_tables()
        traces = RP.trace_batch(sk_batch)                  # (n_cyc, m, L, B)
        cols = jnp.transpose(traces, (3, 1, 2, 0))         # (B, R, L, n_cyc)
        cols = jnp.concatenate([cols, randomizer_cols], axis=-1)
        trace_lde = stark._trace_lde(cols)                 # (B, R, L, N)
        next_lde = jnp.roll(trace_lde, -stark.expansion_factor, axis=-1)
        constraint = self._air_eval(t["x_lde"], trace_lde, next_lde)
        tq_lde = F.mont_mul(constraint, self.tz.inv_codeword)
        rand_lde = NTT.coset_evaluate(rand_poly, stark.generator.value,
                                      stark.fri_domain_length)
        bq_lde = F.mont_mul(F.sub(trace_lde, interp), inv_bz)
        return bq_lde, tq_lde, rand_lde

    def _phase2_impl(self, bq_lde, tq_lde, rand_lde, weights, tq_shift, bq_shift):
        """weights: (B, W, L, 1).  Returns combination codeword (B, L, N).

        Stacks all W terms (in the transcript's weight order: randomizer,
        then per-constraint [tq, shifted tq], then per-register
        [bq, shifted bq]) and reduces with F.weighted_sum — a lax.scan,
        NOT a Python add-chain (see field/ops.py:field_sum fusion note).
        """
        tq_t = jnp.moveaxis(tq_lde, 1, 0)                     # (C, B, L, N)
        bq_t = jnp.moveaxis(bq_lde, 1, 0)                     # (R, B, L, N)
        sh_tq = F.mont_mul(tq_shift[:, None], tq_t)
        sh_bq = F.mont_mul(bq_shift[:, None], bq_t)
        terms = jnp.concatenate([
            rand_lde[None],
            jnp.stack([tq_t, sh_tq], axis=1).reshape((-1,) + tq_t.shape[1:]),
            jnp.stack([bq_t, sh_bq], axis=1).reshape((-1,) + bq_t.shape[1:]),
        ])                                                     # (W, B, L, N)
        return F.weighted_sum(terms, jnp.moveaxis(weights, 1, 0))

    # ------------------------------------------------------------------
    def prove_batch(
        self,
        inputs: Sequence[FieldElement],
        proof_streams: List,
    ) -> List[bytes]:
        """Prove knowledge of each input (hash preimage) -- one proof per
        transcript in ``proof_streams``."""
        stark = self.stark
        rp = self.rp
        B = len(inputs)
        R = stark.num_registers
        N = stark.fri_domain_length
        nrand = stark.num_randomizers

        boundaries = []
        for i, inp in enumerate(inputs):
            out = rp.hash(inp)
            boundaries.append(rp.boundary_constraints(out))

        sk_dev = device_from_ints([inp.value for inp in inputs])
        rand_rows = jnp.transpose(
            device_from_ints(
                [self.field.sample(os.urandom(17)).value for _ in range(B * R * nrand)]
            ).reshape(NLIMBS, B, R, nrand),
            (1, 2, 0, 3),
        )
        if self.mesh is not None and B % self.mesh.shape["dp"] == 0:
            from jax.sharding import NamedSharding, PartitionSpec as Pspec

            from .mesh import proof_batch_sharding

            sk_dev = jax.device_put(sk_dev, proof_batch_sharding(self.mesh))
            rand_rows = jax.device_put(
                rand_rows,
                NamedSharding(self.mesh, Pspec("dp", None, None, None)),
            )
        max_degree = stark.max_degree(self.air)
        rand_poly = jnp.transpose(
            device_from_ints(
                [self.field.sample(os.urandom(17)).value for _ in range(B * (max_degree + 1))]
            ).reshape(NLIMBS, B, max_degree + 1),
            (1, 0, 2),
        )

        # boundary tables are identical in STRUCTURE but differ per proof
        # (the output value differs): build per-proof, stack
        inv_bz_list, interp_list = [], []
        for b in boundaries:
            inv_bz, interp = stark._boundary_tables(b)
            inv_bz_list.append(inv_bz)
            interp_list.append(interp)
        inv_bz = jnp.stack(inv_bz_list)                   # (B, R, L, N)
        interp = jnp.stack(interp_list)

        timer = stark.timer
        with timer.phase("pipeline"):
            from ..utils.aot import aot_call as _aot_call

            # keyed by the preprocessing root: the phase-1 graph embeds
            # the interp/zerofier/round-constant tables as constants.
            # Sharded meshes bypass AOT (exports would pin shardings).
            if self.mesh is None:
                aot_call = _aot_call
            else:
                def aot_call(name, fn, a, static=None, version="1"):
                    return fn(*a, **(static or {}))
            aot_v = f"1-{self.tz.root.hex()[:16]}"
            bq_lde, tq_lde, rand_lde = aot_call(
                "rpsss_phase1",
                self._phase1,
                (sk_dev, rand_rows, rand_poly, inv_bz, interp),
                version=aot_v,
            )

            from ..utils.convert import canonical_np

            # these fetches force the phase-1 executable to completion
            bq_np = canonical_np(bq_lde)                   # (B, R, N, L)
            rand_np = canonical_np(rand_lde)               # (B, N, L)

        # per-proof commitments + Fiat-Shamir weights
        with timer.phase("commit"):
            bq_trees = [
                [MerkleTree.from_limbs_paired(bq_np[i][s]) for s in range(R)]
                for i in range(B)
            ]
            rand_trees = [MerkleTree.from_limbs_paired(rand_np[i]) for i in range(B)]
            weight_cols = []
            n_weights = 1 + 2 * len(self.air) + 2 * R
            for i in range(B):
                ps = proof_streams[i]
                for s in range(R):
                    ps.push(bq_trees[i][s].root)
                ps.push(rand_trees[i].root)
                ws = stark.sample_weights(n_weights, ps.prover_fiat_shamir())
                weight_cols.append(jnp.stack([mont_const(w.value) for w in ws]))
            weights = jnp.stack(weight_cols)               # (B, W, L, 1)

        with timer.phase("combination"):
            tq_bounds = stark.transition_quotient_degree_bounds(self.air)
            bq_bounds = stark.boundary_quotient_degree_bounds(
                stark.randomized_trace_length, boundaries[0]
            )
            # closed-form x^shift codewords (one gather each) — mont_pow
            # here was ~2*bits(e) full-array multiplies per shift
            tq_shift = jnp.stack([stark._x_lde_pow(max_degree - b) for b in tq_bounds])
            bq_shift = jnp.stack([stark._x_lde_pow(max_degree - b) for b in bq_bounds])
            combos = aot_call(
                "rpsss_phase2",
                self._phase2,
                (bq_lde, tq_lde, rand_lde, weights, tq_shift, bq_shift),
                version=aot_v,
            )

        with timer.phase("fri"):
            if B * N <= self.HOST_FRI_MAX:
                # small workloads: ONE transfer of the combination
                # codewords, then the whole FRI (folds, trees, queries) on
                # the host — the device path pays a fold dispatch + root
                # fetch per round (~25 ms each of tunnel latency;
                # protocols/fri.py:prove_host)
                combo_np = canonical_np(combos)            # (B, N, L)
                indices_per_proof = []
                for i in range(B):
                    ints = [int_from_row(combo_np[i][j]) for j in range(N)]
                    indices_per_proof.append(
                        stark.fri.prove_host(ints, proof_streams[i])
                    )
            else:
                # batched FRI commit: folds run as (B, L, n) tensors with
                # per-proof alphas; Merkle/Fiat-Shamir per proof on host
                _, _, indices_per_proof = self._fri_batch(combos, proof_streams)

        # linked openings per proof (paired leaves: multiproof over the
        # reduced index set, values at the full quadrupled set)
        proofs = []
        with timer.phase("openings"):
            for i in range(B):
                ps = proof_streams[i]
                indices = indices_per_proof[i]
                duplicated = indices + [
                    (idx + stark.expansion_factor) % N for idx in indices
                ]
                quadrupled = sorted(duplicated + [(idx + N // 2) % N for idx in duplicated])
                leaf_indices = sorted({idx % (N // 2) for idx in duplicated})
                for s in range(R):
                    ps.push([int_from_row(bq_np[i][s][j]) for j in quadrupled])
                    ps.push(open_multi(bq_trees[i][s], leaf_indices))
                ps.push([int_from_row(rand_np[i][j]) for j in quadrupled])
                ps.push(open_multi(rand_trees[i], leaf_indices))
                ps.push(gather_rows(self.tz.rows, quadrupled))
                ps.push(open_multi(self.tz.tree, leaf_indices))
                proofs.append(ps.serialize())
        return proofs

    # ------------------------------------------------------------------
    def _fri_batch(self, codewords: jnp.ndarray, proof_streams: List):
        """Batched FRI prove over (B, L, N) codewords."""
        from ..utils.convert import canonical_np

        stark = self.stark
        fri = stark.fri
        B = codewords.shape[0]
        two_inv = mont_const(_TWO_INV)
        u = fri._initial_u()

        layer_arrays = []   # list over rounds of (B, n, L) canonical numpy
        trees = [[] for _ in range(B)]
        codeword = codewords
        for r in range(fri.num_rounds()):
            canon = canonical_np(codeword)                 # (B, n, L)
            layer_arrays.append(canon)
            alphas = []
            for i in range(B):
                tree = MerkleTree.from_limbs_paired(canon[i])
                trees[i].append(tree)
                proof_streams[i].push(tree.root)
            if r == fri.num_rounds() - 1:
                break
            for i in range(B):
                alphas.append(
                    mont_const(
                        self.field.sample(proof_streams[i].prover_fiat_shamir()).value
                    )
                )
            alpha = jnp.stack(alphas)                      # (B, L, 1)
            codeword = _fold_kernel_batched(codeword, u, alpha, two_inv)
            u = F.mont_mul(u[..., : u.shape[-1] // 2], u[..., : u.shape[-1] // 2])

        indices_per_proof = []
        for i in range(B):
            ps = proof_streams[i]
            last_ints = [int_from_row(row) for row in layer_arrays[-1][i]]
            ps.push(last_ints)
            top = fri.sample_indices(
                ps.prover_fiat_shamir(),
                layer_arrays[0].shape[1] // 2,
                layer_arrays[-1].shape[1],
                fri.num_colinearity_tests,
            )
            indices = list(top)
            for rr in range(len(layer_arrays) - 1):
                half = layer_arrays[rr].shape[1] // 2
                indices = [idx % half for idx in indices]
                fri.query(layer_arrays[rr][i], trees[i][rr], indices, ps)
            indices_per_proof.append(top)
        return layer_arrays, trees, indices_per_proof


def make_batch_rpsss():
    """Convenience: a FastRPSSS-equivalent batch signer."""
    from ..models.rescue_prime import RescuePrime

    field = Field.main()
    rp = RescuePrime()
    stark = FastStark(field, 4, 64, 128, rp.m, rp.N + 1, transition_constraints_degree=3)
    tz = stark.preprocess()
    prover = BatchProver(stark, rp, tz)

    def keygen():
        sk = field.sample(os.urandom(17))
        return sk, rp.hash(sk)

    def sign_batch(sks: Sequence[FieldElement], documents: Sequence[bytes]) -> List[bytes]:
        streams = [SignatureProofStream(doc) for doc in documents]
        return prover.prove_batch(list(sks), streams)

    return prover, keygen, sign_batch
