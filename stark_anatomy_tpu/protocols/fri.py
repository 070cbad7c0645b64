"""FRI low-degree test: commit/fold on device, query/verify on host.

Protocol parity with the reference (fri.py:11-231): iterated split-and-fold
with Merkle commitments per round, Fiat-Shamir folding challenges, and
colinearity spot checks.  TPU-native deltas:

* the fold  c'[i] = 2^{-1}((1+a*u_i) c[i] + (1-a*u_i) c[N/2+i])  with
  u_i = 1/(offset*omega^i) runs on device as one fused elementwise kernel;
  the inverse-domain table u is PRECOMPUTED once and squared-in-place per
  round (u_{r+1} = u_r[:half]^2), replacing the reference's O(N) per-round
  field inversions (fri.py:85);
* Merkle trees are cached (commit/merkle.py), so query openings are
  O(log N) instead of the reference's O(N) re-hash per opening;
* the verifier checks the last codeword's degree with an O(n log n) host
  NTT (the reference used O(n^2) Lagrange, fri.py:163-174).

Deliberate deviations (documented in DEVIATIONS.md): index-sampling counter
bytes use a fixed-width encoding, and colinearity accepts degree <= 1.
"""

from __future__ import annotations

import functools
from hashlib import blake2b
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..commit.merkle import MerkleTree, open_multi, verify_multi
from ..errors import MalformedProof, VerificationError, rejects_malformed
from ..field import ops as F
from ..field.scalar import Field, P
from ..ops.domain import mont_const, power_table
from ..poly.host_ntt import intt_ints
from ..transcript.proof_stream import ProofStream
from ..utils.convert import device_from_ints, ints_from_device

_TWO_INV = pow(2, P - 2, P)


@jax.jit
def _fold_kernel(codeword, u, alpha, two_inv):
    # codeword: (NLIMBS, N) limb-first; u: (NLIMBS, N/2); alpha: (NLIMBS, 1)
    half = codeword.shape[-1] // 2
    a, b = codeword[..., :half], codeword[..., half:]
    s = F.add(a, b)
    d = F.mont_mul(F.mont_mul(alpha, u), F.sub(a, b))
    return F.mont_mul(two_inv, F.add(s, d))


@jax.jit
def _fold_kernel_batched(codeword, u, alpha, two_inv):
    """Fold a BATCH of codewords (B, NLIMBS, N) with per-proof alphas
    (B, NLIMBS, 1); u is shared (NLIMBS, N/2)."""
    half = codeword.shape[-1] // 2
    a, b = codeword[..., :half], codeword[..., half:]
    s = F.add(a, b)
    d = F.mont_mul(F.mont_mul(alpha, u), F.sub(a, b))
    return F.mont_mul(two_inv, F.add(s, d))


@jax.jit
def _square_half(u):
    half = u.shape[-1] // 2
    return F.mont_mul(u[..., :half], u[..., :half])


@functools.partial(jax.jit, static_argnames=("W",))
def _fold_commit_padded(cw, u, alpha, two_inv, half, W: int):
    """Fold + commit the FOLDED codeword in ONE executable, over a
    FIXED-width buffer with a dynamic logical length.

    cw: (L, 2W) with the true codeword (length 2*half) in its prefix;
    u: (L, W) inverse-domain table, valid prefix half.  Returns
    (next cw buffer (L, 2W), squared u, canonical folded codeword
    (L, W), padded flat Merkle levels (L, W-1)) — tail lanes beyond the
    valid prefixes are garbage the host never reads.

    Why padded: a per-round exactly-shaped kernel costs ~20-30 s of XLA
    compile PER ROUND cold (seven shapes at a 2^22 domain ~= 190 s,
    measured round 5 — docs/design.md §9).  Rounds are grouped into
    shape families (Fri._family_width, 3 halvings per family) so ~7
    round shapes collapse to 3 executables, and the top round — which
    dominates the arithmetic — runs unpadded.  Each separate call
    through the device tunnel also costs ~25 ms of dispatch latency;
    one fused call per round + one 32-byte root fetch is the round's
    entire device traffic."""
    from ..commit.device_merkle import _commit_paired_dynamic

    h = half.astype(jnp.int32)
    a = cw[..., :W]
    b = jax.lax.dynamic_slice_in_dim(cw, h, W, axis=-1)
    s = F.add(a, b)
    d = F.mont_mul(F.mont_mul(alpha, u), F.sub(a, b))
    folded = F.mont_mul(two_inv, F.add(s, d))            # valid prefix half
    canon, flat = _commit_paired_dynamic(folded, half)
    u2 = F.mont_mul(u, u)                                 # valid prefix half
    cw_next = jnp.concatenate([folded, jnp.zeros_like(folded)], axis=-1)
    return cw_next, u2, canon, flat


class Fri:
    """FRI over the coset offset*<omega> of size ``initial_domain_length``."""

    def __init__(
        self,
        offset: int,
        omega: int,
        initial_domain_length: int,
        expansion_factor: int,
        num_colinearity_tests: int,
    ):
        self.offset = offset % P
        self.omega = omega % P
        self.domain_length = initial_domain_length
        self.field = Field.main()
        self.expansion_factor = expansion_factor
        self.num_colinearity_tests = num_colinearity_tests
        self._u0 = None  # lazy inverse-domain table
        # commitment builder hook: canonical (n, NLIMBS) -> MerkleTree;
        # the sharded prover swaps in the per-shard MerkleForest
        self.tree_builder = MerkleTree.from_limbs_paired
        # full commit hook: device (L, n) codeword -> (rows, tree); the
        # sharded prover substitutes a shard-local version that never
        # gathers the codeword into one host array.  Installing a custom
        # hook MUST clear ``fused_device_commit`` — the fused
        # fold+commit kernel bypasses the hook entirely (explicit flag;
        # the round-4 bound-method identity check silently disabled the
        # fused path whenever anything wrapped the hook)
        self.commit_codeword = self._commit_codeword_local
        self.fused_device_commit = True
        assert self.num_rounds() >= 1, "cannot do FRI with less than one round"

    def _commit_codeword_local(self, codeword: jnp.ndarray):
        from ..commit.device_merkle import device_commit_paired, use_device_commit

        if use_device_commit(codeword.shape[-1]):
            # TPU: hash where the codeword lives; only the root crosses
            # the (slow) transfer boundary (commit/device_merkle.py)
            return device_commit_paired(codeword)
        from ..utils.convert import canonical_np

        canon = canonical_np(codeword)
        return canon, self.tree_builder(canon)

    # -- round structure (reference: fri.py:22-28) --------------------------
    def num_rounds(self) -> int:
        codeword_length = self.domain_length
        num = 0
        while (
            codeword_length > self.expansion_factor
            and 4 * self.num_colinearity_tests < codeword_length
        ):
            codeword_length //= 2
            num += 1
        return num

    # -- index sampling (reference: fri.py:30-51) ---------------------------
    @staticmethod
    def sample_index(byte_array: bytes, size: int) -> int:
        acc = 0
        for b in byte_array:
            acc = (acc << 8) ^ int(b)
        return acc % size

    def sample_indices(self, seed: bytes, size: int, reduced_size: int, number: int):
        assert number <= reduced_size, (
            f"cannot sample more indices than available in last codeword; "
            f"requested: {number}, available: {reduced_size}"
        )
        indices: List[int] = []
        reduced_indices: List[int] = []
        counter = 0
        while len(indices) < number:
            index = Fri.sample_index(
                blake2b(seed + counter.to_bytes(8, "big")).digest(), size
            )
            reduced = index % reduced_size
            counter += 1
            if reduced not in reduced_indices:
                indices.append(index)
                reduced_indices.append(reduced)
        return indices

    def eval_domain(self) -> List[int]:
        return [
            self.offset * pow(self.omega, i, P) % P
            for i in range(self.domain_length)
        ]

    # -- inverse-domain table ------------------------------------------------
    def _initial_u(self) -> jnp.ndarray:
        if self._u0 is None:
            half = self.domain_length // 2
            omega_inv = pow(self.omega, P - 2, P)
            offset_inv = pow(self.offset, P - 2, P)
            from ..ops.domain import DOMAINS

            if self.omega == self.field.primitive_nth_root(
                self.domain_length
            ).value:
                # canonical root: one gather from the master table instead
                # of a fresh half-size power-table build (executable-count
                # collapse, docs/design.md §9)
                tab = DOMAINS.master_powers(-1, half, order=self.domain_length)
            else:
                tab = power_table(omega_inv, half)
            self._u0 = F.mont_mul(tab, mont_const(offset_inv))
        return self._u0

    # once a folded codeword drops below this many elements the prover
    # leaves the device: remaining folds/trees/queries are host work on
    # ints (tens of ms total), while every further device round would pay
    # a dispatch + root fetch (~50 ms) and two query gathers
    HOST_TAIL_MAX = 1 << 14

    def _family_width(self, half: int) -> int:
        """Fixed buffer width serving fold rounds in groups of three
        halvings: half sizes {top, top/2, top/4} share the executable at
        W = top, {top/8, ...} the one at W = top/8, and so on — the pad
        overhead is bounded at 4x on the CHEAPER rounds while the top
        round (the bulk of the arithmetic) runs exactly-sized."""
        top = self.domain_length // 2
        k = (top // half).bit_length() - 1
        return top >> (k - k % 3)

    # -- prover --------------------------------------------------------------
    def commit(self, codeword: jnp.ndarray, proof_stream: ProofStream):
        """Fold rounds; returns (layers, MerkleTrees) where each layer is a
        canonical row accessor (DeviceRows / numpy / ShardedRows) or a host
        int list for the small tail rounds.

        Mirrors the reference's commit loop (fri.py:56-96): per round, commit
        the current codeword, draw the challenge, fold.  The last layer is
        committed AND sent in the clear.  On the device path, each round's
        fold + leaf hashing + every tree level run as ONE executable
        (_fold_commit_padded, shared across rounds in shape families) and
        only the 32-byte root crosses to the
        host; small tail rounds run entirely host-side.

        Commitments use PAIRED leaves — leaf i covers (c[i], c[i+n/2]), the
        fold pairing — so one opening authenticates a whole colinearity pair
        and the next layer's c-value check reuses the next round's opening
        (the reference reveals c separately AND re-reveals it as the next
        round's a/b, fri.py:98-113).
        """
        from ..commit.device_merkle import (
            DeviceMerkleTree,
            DeviceRows,
            gather_rows,
            use_device_commit,
        )

        two_inv = mont_const(_TWO_INV)
        u = self._initial_u()
        layers = []
        trees: List[MerkleTree] = []
        num = self.num_rounds()
        fused = self.fused_device_commit and use_device_commit(self.domain_length)
        host_ints: Optional[List[int]] = None   # set once on the host tail
        host_u: Optional[List[int]] = None
        omega_r, offset_r = self.omega, self.offset

        rows, tree = self.commit_codeword(codeword)
        for r in range(num):
            proof_stream.push(tree.root)
            layers.append(rows)
            trees.append(tree)
            if r == num - 1:
                break
            alpha = self.field.sample(proof_stream.prover_fiat_shamir()).value
            half = self.domain_length >> (r + 1)

            if host_ints is None and (not fused or half > self.HOST_TAIL_MAX):
                if fused:
                    W = self._family_width(half)
                    if codeword.shape[-1] > 2 * W:
                        # family boundary: shrink the buffers to the new
                        # width (static prefix slices — the valid data
                        # always lives in the prefix)
                        codeword = codeword[..., : 2 * W]
                        u = u[..., :W]
                    codeword, u, canon, flat = _fold_commit_padded(
                        codeword, u, mont_const(alpha), two_inv,
                        jnp.uint32(half), W=W,
                    )
                    rows = DeviceRows(canon, length=half)
                    tree = DeviceMerkleTree(flat=flat, n_leaves=half // 2)
                else:
                    codeword = _fold_kernel(codeword, u, mont_const(alpha), two_inv)
                    u = _square_half(u)
                    rows, tree = self.commit_codeword(codeword)
            else:
                if host_ints is None:
                    # leave the device: fetch the CURRENT layer once and
                    # finish on the host
                    host_ints = gather_rows(rows, range(2 * half))
                    host_u = self._tail_u(offset_r, omega_r, half)
                host_ints = [
                    _TWO_INV
                    * (
                        (1 + alpha * host_u[i]) * host_ints[i]
                        + (1 - alpha * host_u[i]) * host_ints[half + i]
                    )
                    % P
                    for i in range(half)
                ]
                host_u = [v * v % P for v in host_u[: half // 2]]
                rows, tree = host_ints, self._host_tree(host_ints)
            omega_r = omega_r * omega_r % P
            offset_r = offset_r * offset_r % P

        # send last codeword in the clear (reference: fri.py:92)
        from ..commit.device_merkle import gather_rows as _gr

        last = layers[-1]
        if isinstance(last, list):
            proof_stream.push(list(last))
        else:
            proof_stream.push(_gr(last, range(last.shape[0])))
        return layers, trees

    @staticmethod
    def _tail_u(offset_r: int, omega_r: int, half: int) -> List[int]:
        """Host inverse-domain table for round r: ((offset_r)(omega_r)^i)^-1,
        i < half — matches _initial_u squared r times."""
        omega_inv = pow(omega_r, P - 2, P)
        u = pow(offset_r, P - 2, P)
        out = []
        for _ in range(half):
            out.append(u)
            u = u * omega_inv % P
        return out

    @staticmethod
    def _layer_len(layer) -> int:
        return len(layer) if isinstance(layer, list) else layer.shape[0]

    def query(
        self,
        current_layer,
        current_tree: MerkleTree,
        c_indices: List[int],
        proof_stream: ProofStream,
    ):
        """Reveal, per test, the paired leaf (a, b) = (layer[i], layer[i+half])
        at i = c_indices[s], plus ONE multiproof for the whole index set."""
        from ..commit.device_merkle import gather_rows

        half = self._layer_len(current_layer) // 2
        idx = [c_indices[s] for s in range(self.num_colinearity_tests)]
        vals = gather_rows(
            current_layer, idx + [i + half for i in idx]
        )
        for s in range(self.num_colinearity_tests):
            proof_stream.push((vals[s], vals[s + len(idx)]))
        proof_stream.push(open_multi(current_tree, c_indices))
        return c_indices

    # -- host prover (small codewords) ---------------------------------------
    # Below a few thousand elements the transform/fold arithmetic is
    # trivial, and the device path's cost is pure tunnel latency: each
    # round pays a fold dispatch plus a root fetch (~25 ms each through
    # the axon tunnel).  Proving entirely on the host — big-int folds,
    # C++ tree hashing — costs ~10-20 ms TOTAL and zero round trips.
    # Byte-identical transcripts to the device path (test_fri.py).

    def _host_u(self) -> List[int]:
        if getattr(self, "_host_u0", None) is None:
            half = self.domain_length // 2
            omega_inv = pow(self.omega, P - 2, P)
            offset_inv = pow(self.offset, P - 2, P)
            u, us = offset_inv, []
            for _ in range(half):
                us.append(u)
                u = u * omega_inv % P
            self._host_u0 = us
        return self._host_u0

    @staticmethod
    def _host_tree(codeword: List[int]) -> MerkleTree:
        from ..commit.hashing import elt_bytes

        half = len(codeword) // 2
        return MerkleTree(
            [
                elt_bytes(codeword[i]) + elt_bytes(codeword[i + half])
                for i in range(half)
            ]
        )

    def prove_host(
        self, codeword: List[int], proof_stream: ProofStream
    ) -> List[int]:
        """Host-resident mirror of :meth:`prove` over canonical ints;
        byte-identical transcript output."""
        assert self.domain_length == len(codeword)
        two_inv = _TWO_INV
        u = self._host_u()
        layers: List[List[int]] = []
        trees: List[MerkleTree] = []
        for r in range(self.num_rounds()):
            tree = self._host_tree(codeword)
            proof_stream.push(tree.root)
            layers.append(codeword)
            trees.append(tree)
            if r == self.num_rounds() - 1:
                break
            alpha = self.field.sample(proof_stream.prover_fiat_shamir()).value
            half = len(codeword) // 2
            codeword = [
                two_inv
                * (
                    (1 + alpha * u[i]) * codeword[i]
                    + (1 - alpha * u[i]) * codeword[half + i]
                )
                % P
                for i in range(half)
            ]
            u = [v * v % P for v in u[: half // 2]]
        proof_stream.push(list(layers[-1]))

        top_level_indices = self.sample_indices(
            proof_stream.prover_fiat_shamir(),
            len(layers[0]) // 2,
            len(layers[-1]),
            self.num_colinearity_tests,
        )
        indices = list(top_level_indices)
        for i in range(len(layers) - 1):
            half = len(layers[i]) // 2
            indices = [idx % half for idx in indices]
            layer = layers[i]
            for s in range(self.num_colinearity_tests):
                proof_stream.push((layer[indices[s]], layer[indices[s] + half]))
            proof_stream.push(open_multi(trees[i], indices))
        return top_level_indices

    def prove(self, codeword: jnp.ndarray, proof_stream: ProofStream) -> List[int]:
        """codeword: device Montgomery limb array of shape (NLIMBS, N)."""
        assert self.domain_length == codeword.shape[-1], (
            "initial codeword length does not match FRI domain length"
        )
        layers, trees = self.commit(codeword, proof_stream)

        top_level_indices = self.sample_indices(
            proof_stream.prover_fiat_shamir(),
            self._layer_len(layers[0]) // 2,
            self._layer_len(layers[-1]),
            self.num_colinearity_tests,
        )
        indices = list(top_level_indices)
        for i in range(len(layers) - 1):
            indices = [idx % (self._layer_len(layers[i]) // 2) for idx in indices]
            self.query(layers[i], trees[i], indices, proof_stream)
        return top_level_indices

    # -- verifier (host scalar) ----------------------------------------------
    @rejects_malformed
    def verify(
        self, proof_stream: ProofStream, polynomial_values: List[Tuple[int, int]]
    ) -> bool:
        """Returns True iff the proof verifies.  Never raises on malformed
        transcripts: any rejection (structural or cryptographic) returns
        False with the reason recorded on ``self.last_rejection``."""
        omega = self.omega
        offset = self.offset

        roots: List[bytes] = []
        alphas: List[int] = []
        for _ in range(self.num_rounds()):
            roots.append(proof_stream.pull_typed(bytes))
            alphas.append(
                self.field.sample(proof_stream.verifier_fiat_shamir()).value
            )

        last_codeword: List[int] = proof_stream.pull_typed(list)
        if not all(isinstance(v, int) for v in last_codeword):
            raise MalformedProof("last codeword is not a list of ints")
        # reachable from attacker-controlled bytes via len(last_codeword):
        # structured rejection, NOT an assert (reference asserts, fri.py:157)
        if len(last_codeword) < 2 or (
            len(last_codeword) & (len(last_codeword) - 1)
        ) != 0:
            raise MalformedProof("last codeword length is not a power of two")
        from ..commit.hashing import elt_bytes

        half_last = len(last_codeword) // 2
        if any(not (0 <= v < P) for v in last_codeword):
            raise MalformedProof("last codeword value out of field range")
        last_enc = [
            elt_bytes(last_codeword[i]) + elt_bytes(last_codeword[i + half_last])
            for i in range(half_last)
        ]
        if roots[-1] != MerkleTree(last_enc).root:
            raise VerificationError("last codeword does not match its root")

        degree = (len(last_codeword) // self.expansion_factor) - 1
        last_omega, last_offset = omega, offset
        for _ in range(self.num_rounds() - 1):
            last_omega = last_omega * last_omega % P
            last_offset = last_offset * last_offset % P
        if pow(last_omega, len(last_codeword), P) != 1:
            raise VerificationError(
                "last codeword length inconsistent with round structure "
                "(omega order mismatch)"
            )

        # Low-degree check of the last codeword via host NTT (the reference
        # used O(n^2) Lagrange here, fri.py:163-174; docs/faster.md:450-461
        # prescribes the NTT).  The codeword holds q(omega^i) for
        # q(x) = poly(offset*x); coset scaling does not change which
        # coefficients are zero, so checking q's degree suffices.
        coeffs = intt_ints(last_codeword, last_omega)
        if any(c != 0 for c in coeffs[degree + 1 :]):
            raise VerificationError(
                f"last codeword is not low-degree (> {degree})"
            )

        top_level_indices = self.sample_indices(
            proof_stream.verifier_fiat_shamir(),
            self.domain_length >> 1,
            self.domain_length >> (self.num_rounds() - 1),
            self.num_colinearity_tests,
        )

        # pull all query-round reveals: per round, `tests` paired-leaf
        # tuples (a, b) and ONE multiproof (prover: query())
        num_query_rounds = self.num_rounds() - 1
        reveals: List[Tuple[List[Tuple[int, int]], List[bytes]]] = []
        for r in range(num_query_rounds):
            tuples: List[Tuple[int, int]] = []
            for s in range(self.num_colinearity_tests):
                leaf = proof_stream.pull_typed(tuple)
                if len(leaf) != 2 or not all(isinstance(v, int) for v in leaf):
                    raise MalformedProof("FRI paired leaf is not 2 ints")
                tuples.append(leaf)
            reveals.append((tuples, proof_stream.pull_typed(list)))

        from ..commit.hashing import hash_paired_leaf

        for r in range(num_query_rounds):
            half = self.domain_length >> (r + 1)      # = len(layer r) / 2
            c_indices = [i % half for i in top_level_indices]
            tuples, multiproof = reveals[r]

            for s in range(self.num_colinearity_tests):
                ay, by = tuples[s]
                if r == 0:
                    polynomial_values.append((c_indices[s], ay))
                    polynomial_values.append((c_indices[s] + half, by))
                # c-value: component of the NEXT layer's paired leaf (or of
                # the clear last codeword for the final query round)
                ci = c_indices[s]                      # index into layer r+1
                if r + 1 < num_query_rounds:
                    next_half = half // 2
                    na, nb = reveals[r + 1][0][s]
                    cy = na if ci < next_half else nb
                else:
                    cy = last_codeword[ci]
                # colinearity: (by-ay)*(cx-ax) == (cy-ay)*(bx-ax)
                ax = offset * pow(omega, ci, P) % P
                bx = offset * pow(omega, ci + half, P) % P
                cx = alphas[r]
                lhs = (by - ay) * (cx - ax) % P
                rhs = (cy - ay) * (bx - ax) % P
                if lhs != rhs:
                    raise VerificationError(
                        f"colinearity check failed (round {r}, test {s})"
                    )

            depth = half.bit_length() - 1              # paired tree: half leaves
            ld = {
                c_indices[s]: hash_paired_leaf(*tuples[s])
                for s in range(self.num_colinearity_tests)
            }
            if not verify_multi(roots[r], depth, ld, multiproof):
                raise VerificationError(
                    f"Merkle multiproof failed (round {r})"
                )

            omega = omega * omega % P
            offset = offset * offset % P

        return True
