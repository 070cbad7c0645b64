"""ShardedFastStark: FastStark with the codeword axis sharded over a mesh.

The prover's heavy arrays — trace LDEs, quotient codewords, zerofier
tables, the FRI codeword and its fold layers — all share one structural
axis: the FRI evaluation domain (length N).  This class places every
N-length array with ``NamedSharding(mesh, P(..., "sp"))``; JAX's
computation-follows-data then runs every pointwise kernel shard-local and
inserts collectives exactly where the math crosses shards:

* NTT butterfly stages (ops/ntt.py:_stages): the per-stage ``roll`` over
  the sharded axis becomes a collective permute for stages whose half-size
  reaches across shard boundaries — the distributed-NTT exchange pattern
  of SURVEY.md §5;
* the FRI fold (protocols/fri.py:_fold_kernel) pairs i with i + N/2 —
  shards exchange halves via the permute validated by
  tests/test_distributed.py::test_sharded_fold_matches_local;
* Merkle commitment and Fiat-Shamir stay host-side on the gathered
  canonical arrays, so the transcript is BYTE-IDENTICAL to the
  single-device prover — the framework's key invariance (SURVEY.md §7),
  enforced by tests/test_topology_invariance.py.

The reference has no distributed code at all (SURVEY.md §2); this is the
TPU-native scaling axis for one large proof (the batch prover covers the
independent-proofs axis).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import ntt as NTT
from ..ops.domain import DOMAINS, coset_table
from ..protocols.fast_stark import FastStark, TransitionZerofier


class ShardedFastStark(FastStark):
    """FastStark whose codeword axis is sharded over ``mesh``'s ``axis``."""

    # the blocked-coset single-executable path is a single-device
    # optimization; the sharded prover keeps its distributed-NTT hooks
    blocked_lde = False

    def __init__(self, *args, mesh: Mesh, axis: str = "sp", **kwargs):
        super().__init__(*args, **kwargs)
        self.mesh = mesh
        self.axis = axis
        self._tables_placed = False
        self._ntt_cache = {}

    # ------------------------------------------------------------------
    def _shard_last(self, arr: jnp.ndarray) -> jnp.ndarray:
        """Place ``arr`` sharded over its LAST axis (the codeword axis)."""
        spec = P(*([None] * (arr.ndim - 1) + [self.axis]))
        return jax.device_put(arr, NamedSharding(self.mesh, spec))

    def _dist_ntt(self, n: int, batch_ndim: int, inverse: bool):
        """Cached four-step distributed (i)NTT for this mesh (or None when
        the shape does not meet the n % shards^2 divisibility)."""
        from .ntt_dist import make_distributed_ntt

        S = self.mesh.shape[self.axis]
        if S < 2 or n % (S * S) != 0:
            return None
        key = (n, batch_ndim, inverse)
        if key not in self._ntt_cache:
            self._ntt_cache[key] = make_distributed_ntt(
                n, self.mesh, self.axis, inverse=inverse, batch_ndim=batch_ndim
            )
        return self._ntt_cache[key]

    # -- hooks consumed by FastStark.prove ------------------------------
    def _place_codeword(self, arr: jnp.ndarray) -> jnp.ndarray:
        return self._shard_last(arr)

    def _lde(self, coeffs: jnp.ndarray, offset: int, order: int) -> jnp.ndarray:
        """Domain-sharded coset evaluation: pad, place sharded, scale
        pointwise, then the four-step all_to_all NTT (parallel/ntt_dist.py);
        falls back to the in-place butterfly NTT (whose per-stage rolls
        become collective permutes) when the divisibility doesn't hold."""
        padded = self._shard_last(NTT._pad_coeffs(coeffs, order))
        scale_tab = coset_table(offset, order)
        dist = self._dist_ntt(order, padded.ndim - 2, inverse=False)
        if dist is not None:
            from ..field import ops as F

            return dist(F.mont_mul(padded, scale_tab))
        dom = DOMAINS.get(order)
        return NTT._lde_core(padded, scale_tab, dom["bitrev"], dom["fwd_powers"], order)

    def _intt(self, values: jnp.ndarray) -> jnp.ndarray:
        dist = self._dist_ntt(values.shape[-1], values.ndim - 2, inverse=True)
        if dist is not None:
            return dist(values)
        return NTT.intt(values)

    def _merkle_from_canon(self, canon):
        """Per-shard Merkle forest over an ALREADY-HOST canonical array
        (used by preprocess, whose artifact keeps the full codeword anyway).
        Bit-identical to the monolithic tree."""
        import numpy as np

        from ..commit.merkle import MerkleForest, MerkleTree

        S = self.mesh.shape[self.axis]
        half = canon.shape[0] // 2
        if S > 1 and half % S == 0:
            return MerkleForest.from_limbs_paired_sharded(np.asarray(canon), S)
        return MerkleTree.from_limbs_paired(canon)

    def _commit_rows_many(self, codewords: jnp.ndarray):
        """Per-register shard-local commits (the base class's batched
        host canonicalization would gather the full array)."""
        return [self._commit_rows(codewords[s]) for s in range(codewords.shape[0])]

    def _commit_rows(self, codeword: jnp.ndarray):
        """Shard-local commitment: canonicalize WHERE THE SHARDS LIVE
        (from_mont is elementwise, so XLA keeps it shard-local), pull each
        shard's block to host separately, and hash the paired-leaf forest
        from the per-shard blocks — the full codeword never exists in one
        host array; only subtree roots are stitched (SURVEY.md §2 parallel
        table row 4)."""
        import numpy as np

        from ..commit.device_merkle import device_commit_paired, use_device_commit
        from ..commit.merkle import ShardedRows
        from ..field import ops as F

        if use_device_commit(codeword.shape[-1]):
            # TPU mesh: hash on device — elementwise compression stays
            # shard-local under GSPMD, tree reduction crosses shards only
            # in the tiny top levels; nothing bulk reaches the host
            return device_commit_paired(codeword)

        n = codeword.shape[-1]
        canon_dev = F.from_mont(codeword)
        # one block per DISTINCT codeword-axis shard (other mesh axes
        # replicate; dedupe by slice offset)
        by_off = {}
        for sh in canon_dev.addressable_shards:
            sl = sh.index[-1] if canon_dev.ndim else slice(None)
            off = sl.start or 0
            if off not in by_off:
                by_off[off] = sh
        offs = sorted(by_off)
        S = len(offs)
        # shard-local hashing needs >= 2 aligned shards (the i <-> i+n/2
        # pairing joins shard s with shard s + S/2) of equal pow2 size
        if S < 2 or S & (S - 1) or n % S or (n // S) & (n // S - 1):
            return super()._commit_rows(codeword)
        blocks = [
            np.ascontiguousarray(np.moveaxis(np.asarray(by_off[o].data), -2, -1))
            for o in offs
        ]
        if any(b.shape[0] != n // S for b in blocks):
            return super()._commit_rows(codeword)
        rows = ShardedRows(blocks)
        return rows, rows.paired_forest()

    def _interp_tables(self):
        t = super()._interp_tables()
        if not self._tables_placed:
            for key in ("zn_over_xm", "x_lde"):
                t[key] = self._shard_last(t[key])
            # keep the instance-level x cache pointing at the sharded copy
            # (preprocess reads it too) so both copies don't stay resident
            self._x_lde_arr = t["x_lde"]
            self._tables_placed = True
        return t

    # ------------------------------------------------------------------
    def prove(self, trace, transition_constraints, boundary,
              transition_zerofier: TransitionZerofier, proof_stream=None,
              **kwargs) -> bytes:
        # shard the preprocessed zerofier tables once (cached on the object)
        tz = transition_zerofier
        if not getattr(tz, "_sharded_for", None) is self.mesh:
            tz.inv_codeword = self._shard_last(tz.inv_codeword)
            if tz.codeword is not None:
                tz.codeword = self._shard_last(tz.codeword)
            tz._sharded_for = self.mesh
        # FRI inverse-domain table: sharded so folds stay shard-local;
        # FRI layer commitments shard-local end-to-end (no full gather)
        self.fri._u0 = self._shard_last(self.fri._initial_u())
        self.fri.commit_codeword = self._commit_rows
        self.fri.fused_device_commit = False
        return super().prove(
            trace, transition_constraints, boundary, tz, proof_stream, **kwargs
        )
