"""Benchmark: FastRPSSS end-to-end signing on real hardware.

Prints ONE JSON line to stdout:
  {"metric": "fast_rpsss_sign_seconds", "value": t, "unit": "s",
   "vs_baseline": 72.0 / t}

The line is printed EARLY (as soon as the steady RPSSS numbers exist) and
re-printed at the end, so a timeout in a later segment can never erase the
headline metric (round-4 lesson: the driver run hit its time limit inside
the MiMC segment and recorded nothing).

Baseline: the reference's published FastRPSSS signing time of 72 s
(CPython, unspecified CPU — /root/reference/docs/faster.md:469).  Secondary
metrics (verify time, proof size, NTT throughput, MiMC 2^20 proving,
batch-64 signing) go to stderr.  Steady-state numbers are reported as
min AND median over repeated runs with a compile/persist sentinel, so a
contention-skewed run is diagnosable from the output alone (VERDICT r4
ask #2).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

START = time.time()
# soft wall-clock budget: segments are SKIPPED (with a log line) once the
# budget is exhausted, so the process always reaches the final JSON print
BUDGET_S = float(os.environ.get("STARK_BENCH_BUDGET_S", "2400"))


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def remaining() -> float:
    return BUDGET_S - (time.time() - START)


_headline = {}


def print_headline():
    if _headline:
        print(json.dumps(_headline), flush=True)


def cache_file_count() -> int:
    try:
        return len(os.listdir(os.environ["JAX_COMPILATION_CACHE_DIR"]))
    except Exception:
        return -1


def seg_rpsss():
    from stark_anatomy_tpu.models.rpsss import FastRPSSS

    t0 = time.time()
    scheme = FastRPSSS()  # uses the device AIR evaluator + point AIR by default
    log(f"setup+preprocess: {time.time()-t0:.2f}s")

    sk, pk = scheme.keygen()
    doc = b"the quick brown fox jumps over the lazy dog"

    # warmup (compile)
    t0 = time.time()
    sig = scheme.sign(sk, doc)
    log(f"warmup sign (incl. compile): {time.time()-t0:.2f}s; size {len(sig)/1024:.1f} kB")

    t0 = time.time()
    ok = scheme.verify(pk, doc, sig)
    log(f"warmup verify: {time.time()-t0:.2f}s -> {ok}")
    assert ok, "signature did not verify"

    # timed runs — reset the phase timer first so the report below is
    # STEADY-STATE only; per-run times kept so contention shows up as a
    # min/median spread instead of silently skewing a single number
    scheme.stark.timer.totals.clear()
    scheme.stark.timer.counts.clear()
    n_runs = 5
    sign_times, verify_times = [], []
    c0 = cache_file_count()
    for _ in range(n_runs):
        t0 = time.time()
        sig = scheme.sign(sk, doc)
        sign_times.append(time.time() - t0)
    for _ in range(n_runs):
        t0 = time.time()
        ok = scheme.verify(pk, doc, sig)
        verify_times.append(time.time() - t0)
    assert ok
    new_exec = cache_file_count() - c0
    t_sign = statistics.median(sign_times)
    t_verify = statistics.median(verify_times)

    log(
        f"sign: median {t_sign:.3f}s min {min(sign_times):.3f}s  "
        f"verify: median {t_verify:.3f}s min {min(verify_times):.3f}s  "
        f"size: {len(sig)/1024:.1f} kB  "
        f"(x{n_runs}; {new_exec} new persisted executables during steady runs)"
    )
    log("(reference baselines: sign 72 s, verify 8 s, ~160 kB)")
    log(f"prover phases (steady-state, {n_runs} runs):\n" + scheme.stark.timer.report())

    _headline.update(
        {
            "metric": "fast_rpsss_sign_seconds",
            "value": round(t_sign, 4),
            "unit": "s",
            "vs_baseline": round(72.0 / t_sign, 2),
        }
    )
    print_headline()
    return t_sign


def seg_batch(t_sign):
    """Batch-of-64 signing (BASELINE config 5) — amortized per-signature
    cost through the batched device pipeline."""
    from stark_anatomy_tpu.models.rescue_prime import RescuePrime
    from stark_anatomy_tpu.parallel.batch_prover import BatchProver
    from stark_anatomy_tpu.protocols.fast_stark import FastStark
    from stark_anatomy_tpu.transcript.proof_stream import SignatureProofStream
    from stark_anatomy_tpu.field.scalar import Field

    B = 64
    field = Field.main()
    rp = RescuePrime()
    bstark = FastStark(
        field, 4, 64, 128, rp.m, rp.N + 1, transition_constraints_degree=3
    )
    btz = bstark.preprocess()
    prover = BatchProver(bstark, rp, btz)
    inputs = [field.sample(b"bench-batch-%d" % i) for i in range(B)]
    docs = [b"bench-doc-%d" % i for i in range(B)]
    proofs = prover.prove_batch(
        inputs, [SignatureProofStream(d) for d in docs]
    )  # warm/compile
    times = []
    for _ in range(3):
        t0 = time.time()
        proofs = prover.prove_batch(inputs, [SignatureProofStream(d) for d in docs])
        times.append(time.time() - t0)
    t_batch = statistics.median(times)
    air = rp.transition_constraints(bstark.omicron)
    ok = bstark.verify(
        proofs[0], air, rp.boundary_constraints(rp.hash(inputs[0])),
        btz.root,
        proof_stream_factory=lambda pr: SignatureProofStream.deserialize_with_document(pr, docs[0]),
    )
    log(
        f"batch of {B} signatures: median {t_batch:.2f}s min {min(times):.2f}s = "
        f"{t_batch/B*1000:.0f} ms/signature amortized "
        f"(vs {t_sign*1000:.0f} ms single) verify_ok={ok}"
    )


def seg_ntt():
    """NTT throughput, measured AS-USED: the (L, M)-with-fused-scale
    staged executable that the 2^20-trace prover actually dispatches
    (M = 2^22 — its omicron domain; the blocked-coset design runs every
    big transform through this ONE kernel).  Chain-differenced device
    time + honest single-call time including tunnel dispatch."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stark_anatomy_tpu.field.scalar import Field
    from stark_anatomy_tpu.ops.domain import coset_table
    from stark_anatomy_tpu.ops.stage_ntt import staged_ntt

    n = 1 << 22
    g = Field.main().generator().value
    scale = coset_table(g, n)
    x = jnp.zeros((8, n), dtype=jnp.uint32).at[0, :].set(1)

    def sync(arr):
        # block_until_ready does not reliably synchronize through the
        # axon tunnel; a data-dependent host read does
        return int(np.asarray(jax.device_get(arr.reshape(-1)[:1]))[0])

    # DEVICE time via call differencing: t(two dependent dispatches,
    # one sync) - t(one dispatch, one sync) cancels the axon tunnel's
    # per-roundtrip dispatch latency (2-6 ms, time-shared and noisy),
    # which a naive synced loop would measure instead of the transform.
    # At most two calls are ever in flight — the kernel's XLA working
    # set is ~2.5 GB per dispatch and enqueue-time allocation means a
    # longer eager chain would stack working sets into the HBM ceiling
    # (jitted k-chains would recompile the whole graph k-fold instead).
    y = staged_ntt(x, scale_pre=scale); sync(y)
    diffs = []
    single = []
    for _ in range(8):
        t0 = time.time()
        y = staged_ntt(y, scale_pre=scale); sync(y)
        t1 = time.time() - t0
        t0 = time.time()
        y = staged_ntt(y, scale_pre=scale)
        y = staged_ntt(y, scale_pre=scale); sync(y)
        t2 = time.time() - t0
        diffs.append(t2 - t1)
        single.append(t1)
    dt = float(np.median(diffs))
    dt_single = float(np.median(single))  # incl. dispatch roundtrip
    log_n = n.bit_length() - 1
    field_ops = n // 2 * log_n * 3
    # roofline: idealized fully-fused four-step — ~10 full-array HBM
    # passes at v5e's 819 GB/s; compute bound: ~(n/2)log2(n) mont_muls
    # x ~300 u32 ops at ~7 T u32-op/s.  The XLA fusion model's own
    # floor is higher (each multiply materializes ~3 arrays; see
    # docs/ntt.md), but SOL is quoted against the idealized machine.
    array_bytes = 8 * n * 4
    hbm_roofline = 10 * array_bytes / 819e9
    compute_roofline = (n / 2 * log_n * 300) / 7e12
    roofline = max(hbm_roofline, compute_roofline)
    log(
        f"NTT 2^{log_n} (as-used: fused coset scale): {dt*1000:.2f} ms "
        f"device -> {field_ops/dt/1e9:.2f} "
        f"Gfield-ops/s; roofline {roofline*1000:.2f} ms "
        f"(hbm {hbm_roofline*1000:.2f} / compute {compute_roofline*1000:.2f}) "
        f"-> {100*roofline/dt:.0f}% SOL "
        f"(single-call {dt_single*1000:.2f} ms incl tunnel dispatch)"
    )


def seg_mimc():
    """The BASELINE 2^20-trace MiMC proof (TPU only — domain 2^24 needs
    device memory/throughput a CPU host run doesn't have)."""
    from stark_anatomy_tpu.field.scalar import Field
    from stark_anatomy_tpu.models.mimc import make_stark, prove_chain, verify_chain

    steps = 1 << 20
    mimc, stark = make_stark(steps, 4, 64, 128)
    t0 = time.time()
    tz = stark.preprocess()
    t_pre = time.time() - t0
    x = Field.main().sample(b"bench-mimc")
    t0 = time.time()
    out, proof, _ = prove_chain(mimc, stark, x, tz)
    t_prove = time.time() - t0
    t0 = time.time()
    ok = verify_chain(mimc, stark, x, out, proof, tz.root)
    t_ver = time.time() - t0
    # first verify pays the device-kernel compiles; time a second one for
    # the steady state
    t0 = time.time()
    ok2 = verify_chain(mimc, stark, x, out, proof, tz.root)
    t_ver2 = time.time() - t0
    log(
        f"MiMC 2^20 trace: preprocess {t_pre:.1f}s prove {t_prove:.1f}s "
        f"verify {t_ver:.1f}s (steady {t_ver2:.2f}s) "
        f"proof {len(proof)/1024:.0f} kB verify_ok={ok and ok2}"
    )
    # steady-state proves: >= 3 runs with PER-RUN phase deltas, so the
    # report distinguishes a contention spike (min << median) and any
    # residual compile/load activity (persisted-executable sentinel)
    n_runs = 3
    walls = []
    per_phase = {}
    c0 = cache_file_count()
    for _ in range(n_runs):
        before = dict(stark.timer.totals)
        t0 = time.time()
        out, proof, _ = prove_chain(mimc, stark, x, tz)
        walls.append(time.time() - t0)
        for k, v in stark.timer.totals.items():
            per_phase.setdefault(k, []).append(v - before.get(k, 0.0))
    new_exec = cache_file_count() - c0
    log(
        f"MiMC 2^20 steady-state prove: median {statistics.median(walls):.1f}s "
        f"min {min(walls):.1f}s (x{n_runs}: "
        + " ".join(f"{w:.1f}" for w in walls)
        + f"; {new_exec} new persisted executables during steady runs)"
    )
    lines = []
    for k, vals in sorted(per_phase.items(), key=lambda kv: -min(kv[1])):
        lines.append(
            f"{k:<28s} min {min(vals)*1000:10.2f} ms  "
            f"median {statistics.median(vals)*1000:10.2f} ms"
        )
    log("mimc phases (steady-state, per-run):\n" + "\n".join(lines))
    log(
        f"mimc phase-min sum {sum(min(v) for v in per_phase.values()):.2f}s "
        f"vs min wall {min(walls):.2f}s (gap-free attribution)"
    )
    return mimc, stark, tz, statistics.median(walls), per_phase


def seg_pipeline(mimc, stark, tz, t_serial, per_phase):
    """Sustained pipelined throughput: trace generation of proof k+1
    (host C++ chain) overlapped with the device phases of proof k —
    the measured core of SCALING.md's throughput argument.  >= 8
    consecutive 2^20-class proofs."""
    from stark_anatomy_tpu.field.scalar import Field
    from stark_anatomy_tpu.parallel.pipeline_prover import PipelinedMiMCProver

    field = Field.main()
    K = 8
    prover = PipelinedMiMCProver(mimc, stark, tz)
    inputs = [field.sample(b"bench-pipe-%d" % i) for i in range(K)]
    t0 = time.time()
    results = prover.prove_many(inputs)
    wall = time.time() - t0
    ok = all(len(p) > 0 for _, p in results)
    t_trace = statistics.median(per_phase.get("trace_gen", [0.0]))
    per_proof = wall / K
    hidden = t_serial - per_proof
    eff = min(max(hidden / t_trace, 0.0), 1.0) if t_trace > 0 else 0.0
    log(
        f"pipelined throughput: {K} proofs in {wall:.1f}s = "
        f"{per_proof:.2f}s/proof ({K/wall:.3f} proofs/s) vs serial "
        f"{t_serial:.2f}s/proof; trace_gen {t_trace:.2f}s -> "
        f"{100*eff:.0f}% of trace generation hidden ok={ok}"
    )


def main():
    # The repo SHIPS its persistent compile cache (.aot_cache/, tracked in
    # git): XLA executables are deployment artifacts exactly like a CUDA
    # framework's shipped cubins.  A fresh checkout therefore warm-LOADS
    # (~0.5-0.7 s/executable) instead of cold-compiling (~4 s/executable,
    # ~340 s aggregate for the 2^20 prover — docs/design.md §9).
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".aot_cache"),
    )
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    log("devices:", jax.devices())

    t_sign = seg_rpsss()  # always runs; prints the headline JSON early

    on_tpu = jax.default_backend() in ("tpu", "axon")
    segments = []
    if on_tpu and not os.environ.get("STARK_TPU_BENCH_NO_BATCH"):
        segments.append(("batch-64", lambda: seg_batch(t_sign)))
    segments.append(("ntt", seg_ntt))
    if on_tpu and not os.environ.get("STARK_TPU_BENCH_NO_MIMC"):
        segments.append(("mimc-2^20", seg_mimc))

    mimc_ctx = None
    for name, fn in segments:
        if remaining() < 60:
            log(f"SKIPPING segment {name}: {remaining():.0f}s left of "
                f"{BUDGET_S:.0f}s budget")
            continue
        try:
            out = fn()
            if name == "mimc-2^20":
                mimc_ctx = out
        except Exception:
            import traceback

            log(f"{name} bench failed:\n" + traceback.format_exc())

    # pipelined throughput rides the warm MiMC context (it needs the
    # 2^20 executables compiled, which seg_mimc just paid for)
    if mimc_ctx is not None and remaining() > 60:
        try:
            seg_pipeline(*mimc_ctx)
        except Exception:
            import traceback

            log("pipeline bench failed:\n" + traceback.format_exc())

    print_headline()


if __name__ == "__main__":
    main()
