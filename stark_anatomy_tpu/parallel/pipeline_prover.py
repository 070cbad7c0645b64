"""Pipelined proof stream: overlap HOST trace generation with DEVICE
proving (SURVEY.md §2 "batch/EP-style proof parallelism", throughput
variant).

For sequential-computation workloads (MiMC chains — a VDF shape), trace
generation is inherently serial HOST work (the C++ chain,
native/mimc_chain.cpp, ~25 ns/step) while the rest of the prover is
DEVICE work.  Proving a stream of independent statements therefore
pipelines: while the device runs the phases of proof k, a worker thread
computes the trace of proof k+1.  ctypes releases the GIL during the C++
call, so the overlap is real parallelism, and the device upload in the
worker thread interleaves with the main thread's dispatches (JAX dispatch
is thread-safe).

This is the single-chip measurable core of the BASELINE ≥80%
multi-chip-efficiency argument (SCALING.md): at sp>1 shardings the
per-proof device time shrinks but host trace generation does not — the
claim that trace-gen "pipelines away in any throughput setting" is
exactly what this module implements and `bench.py` measures (sustained
proofs/sec over >= 8 consecutive 2^20-class proofs).

The reference has no analog (its prover is single-proof CPython,
fast_stark.py:43-177); batch_prover.py covers the latency-oriented
batched-device variant for SMALL statements instead.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, Iterator, List, Optional, Tuple

from ..field.scalar import FieldElement
from ..protocols.fast_stark import FastStark, TransitionZerofier


def _deprioritize_worker() -> None:
    """Lower the worker thread's scheduling priority (Linux: per-thread
    nice via its native TID).  The main thread's proof loop is
    latency-sensitive — its per-coset throttle syncs and the tunnel
    client's IO threads need the core NOW — while the prefetch chain
    only has to finish within the ~7 s the in-flight proof takes.  On a
    2-core host this is the difference between the overlap being
    positive and the worker stealing cycles from the dispatch path."""
    try:
        import threading

        os.setpriority(os.PRIO_PROCESS, threading.get_native_id(), 10)
    except (AttributeError, OSError, PermissionError):
        pass  # non-Linux or unprivileged: overlap still works, just noisier


class PipelinedMiMCProver:
    """Streams proofs for MiMC-chain statements with trace generation of
    statement k+1 overlapped against device proving of statement k."""

    def __init__(self, mimc, stark: FastStark, tz: TransitionZerofier):
        self.mimc = mimc
        self.stark = stark
        self.tz = tz
        # one worker: trace generation is serial per statement, and a
        # single prefetch depth is enough to hide it behind the device
        # phases (depth > 1 would only grow the HBM footprint)
        self._pool = ThreadPoolExecutor(
            max_workers=1, initializer=_deprioritize_worker
        )

    def _gen(self, input_element: FieldElement):
        """Worker-thread trace generation.  HOST-ONLY on the native path:
        returns packed numpy words and defers the device upload/unpack to
        the main thread — a device touch here contends on the tunnel
        stream with the in-flight proof's dispatches (measured round 5:
        it made the pipeline SLOWER than serial, 8.5 s vs 7.2 s/proof)."""
        host = self.mimc.trace_words_with_output(input_element.value)
        if host is not None:
            words, out = host
            return ("words", words), FieldElement(out, self.mimc.field)
        cols, out = self.mimc.trace_columns_with_output(input_element.value)
        return ("cols", cols), FieldElement(out, self.mimc.field)

    def prove_stream(
        self,
        inputs: Iterable[FieldElement],
        urandom=os.urandom,
    ) -> Iterator[Tuple[FieldElement, bytes]]:
        """Yields (output_element, proof) per input, pipelined."""
        inputs = list(inputs)
        if not inputs:
            return
        fut = self._pool.submit(self._gen, inputs[0])
        for k in range(len(inputs)):
            (kind, payload), output_element = fut.result()
            if k + 1 < len(inputs):
                fut = self._pool.submit(self._gen, inputs[k + 1])
            cols = (
                self.mimc.columns_from_words(payload)
                if kind == "words"
                else payload
            )
            proof = self.stark.prove(
                None,
                self.mimc.transition_constraints(),
                self.mimc.boundary_constraints(inputs[k], output_element),
                self.tz,
                air_evaluator=self.mimc.air_evaluator(),
                trace_columns=cols,
                urandom=urandom,
            )
            yield output_element, proof

    def prove_many(
        self, inputs: List[FieldElement], urandom=os.urandom
    ) -> List[Tuple[FieldElement, bytes]]:
        return list(self.prove_stream(inputs, urandom=urandom))
