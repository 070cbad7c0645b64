"""Measure the pipelined MiMC prover against serial proving (VERDICT r5:
the pipeline must HIDE host trace generation, not add tunnel contention).

Warm-cache real-chip probe: preprocess + one warm prove, then N serial
proves and a K-proof pipelined stream; prints per-proof walls and the
fraction of trace_gen hidden.

Usage: python tools/probe_pipeline.py [steps_log2=20] [K=8]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(repo, ".aot_cache")
)

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from stark_anatomy_tpu.field.scalar import Field
from stark_anatomy_tpu.models.mimc import make_stark, prove_chain
from stark_anatomy_tpu.parallel.pipeline_prover import PipelinedMiMCProver


def main():
    log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    field = Field.main()
    mimc, stark = make_stark(1 << log2, 4, 64, 128)
    t0 = time.time()
    tz = stark.preprocess()
    print(f"preprocess: {time.time()-t0:.1f}s", flush=True)

    x = field.sample(b"probe-pipe")
    t0 = time.time()
    prove_chain(mimc, stark, x, tz)
    print(f"warm prove: {time.time()-t0:.1f}s", flush=True)

    serial = []
    for i in range(3):
        t0 = time.time()
        prove_chain(mimc, stark, x, tz)
        serial.append(time.time() - t0)
    t_serial = statistics.median(serial)
    t_trace = stark.timer.totals.get("trace_gen", 0.0) / max(
        stark.timer.counts.get("trace_gen", 1), 1
    )
    print(
        f"serial: median {t_serial:.2f}s ({' '.join(f'{s:.2f}' for s in serial)}); "
        f"trace_gen avg {t_trace:.2f}s",
        flush=True,
    )

    prover = PipelinedMiMCProver(mimc, stark, tz)
    inputs = [field.sample(b"probe-pipe-%d" % i) for i in range(K)]
    t0 = time.time()
    results = prover.prove_many(inputs)
    wall = time.time() - t0
    per = wall / K
    hidden = t_serial - per
    eff = min(max(hidden / t_trace, 0.0), 1.0) if t_trace > 0 else 0.0
    print(
        f"pipelined: {K} proofs in {wall:.1f}s = {per:.2f}s/proof "
        f"vs serial {t_serial:.2f} -> {100*eff:.0f}% of trace_gen hidden "
        f"ok={all(len(p) > 0 for _, p in results)}",
        flush=True,
    )


if __name__ == "__main__":
    main()
