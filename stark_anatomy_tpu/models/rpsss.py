"""RPSSS: Rescue-Prime STARK Signature Scheme (slow and fast variants).

A post-quantum signature: sk is a random field element, pk = RescuePrime
hash(sk); a signature is a zk-STARK proof of preimage knowledge under a
document-bound Fiat-Shamir transcript.  Parity with the reference
(rpsss.py:24-64, fast_rpsss.py:24-65): expansion 4, 64 colinearity checks,
security 128, AIR degree 3.
"""

from __future__ import annotations

import os
from typing import Tuple

from ..field.scalar import Field, FieldElement
from ..protocols.fast_stark import FastStark
from ..protocols.stark import Stark
from ..transcript.proof_stream import SignatureProofStream
from .rescue_prime import RescuePrime


class RPSSS:
    """Signature scheme over the slow scalar STARK (reference: rpsss.py:24-64)."""

    stark_class = Stark

    def __init__(self, config=None):
        from ..config import RPSSS_CONFIG

        self.field = Field.main()
        self.rp = RescuePrime()
        self.config = config or RPSSS_CONFIG
        self.stark = self.stark_class.from_config(self.config, self.field)

    def _air(self):
        # symbolic constraints are proof-independent; the rhs**3 expansion
        # is thousands of monomials, so build once per scheme instance
        if not hasattr(self, "_air_cache"):
            self._air_cache = self.rp.transition_constraints(self.stark.omicron)
        return self._air_cache

    def stark_prove(self, input_element: FieldElement, proof_stream) -> bytes:
        output_element = self.rp.hash(input_element)
        trace = self.rp.trace(input_element)
        return self.stark.prove(
            trace, self._air(), self.rp.boundary_constraints(output_element), proof_stream
        )

    def stark_verify(self, output_element, stark_proof, document) -> bool:
        boundary = self.rp.boundary_constraints(output_element)
        return self.stark.verify(
            stark_proof,
            self._air(),
            boundary,
            proof_stream_factory=lambda proof: SignatureProofStream.deserialize_with_document(
                proof, document
            ),
        )

    def keygen(self) -> Tuple[FieldElement, FieldElement]:
        sk = self.field.sample(os.urandom(17))
        pk = self.rp.hash(sk)
        return sk, pk

    def sign(self, sk: FieldElement, document: bytes) -> bytes:
        sps = SignatureProofStream(document)
        return self.stark_prove(sk, sps)

    def verify(self, pk: FieldElement, document: bytes, signature: bytes) -> bool:
        return self.stark_verify(pk, signature, document)


class FastRPSSS(RPSSS):
    """Signature scheme over the device-accelerated FastStark
    (reference: fast_rpsss.py:24-65)."""

    stark_class = FastStark

    def __init__(self):
        super().__init__()
        self.transition_zerofier = self.stark.preprocess()
        self._air_evaluator = None
        self._point_air = None
        self._batch_prover = None

    def _prover(self):
        """Fused signing pipeline: the whole pre-commitment computation
        (trace -> LDE -> quotients -> randomizer) runs as ONE device
        executable and FRI runs on the host (parallel/batch_prover.py,
        B=1) — the round-3 single-proof path paid ~8 sequential dispatch
        latencies plus a per-FRI-round fold/root round trip."""
        if self._batch_prover is None:
            from ..parallel.batch_prover import BatchProver

            self._batch_prover = BatchProver(
                self.stark, self.rp, self.transition_zerofier, air=self._air()
            )
        return self._batch_prover

    def stark_prove(self, input_element: FieldElement, proof_stream) -> bytes:
        return self._prover().prove_batch([input_element], [proof_stream])[0]

    def stark_verify(self, output_element, stark_proof, document) -> bool:
        from .rescue_prime import make_index_air_evaluator, make_point_air

        if self._point_air is None:
            self._point_air = make_point_air(self.stark)
            # batched device verifier core (FastStark ask: no per-index
            # Python field ops in the hot verify loop)
            self._index_air = make_index_air_evaluator(self.stark)
        boundary = self.rp.boundary_constraints(output_element)
        return self.stark.verify(
            stark_proof,
            self._air(),
            boundary,
            self.transition_zerofier.root,
            proof_stream_factory=lambda proof: SignatureProofStream.deserialize_with_document(
                proof, document
            ),
            air_point_evaluator=self._point_air,
            air_index_evaluator=self._index_air,
        )
