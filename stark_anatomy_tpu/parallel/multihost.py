"""Multi-host (DCN) support: process initialization + scaling harness.

SURVEY.md §5: the reference has no distributed communication of any kind;
this framework's multi-host story is standard JAX SPMD — every host runs
the same program, ``jax.distributed.initialize`` wires the processes into
one system, and the SAME mesh/sharding code (mesh.py, sharded_stark.py,
batch_prover.py) then spans all hosts: ``dp`` groups ride DCN-free (each
proof's tensors stay within its shard group when dp aligns with hosts),
``sp`` collectives ride ICI within a slice.

The host-side transcript stays on a single controller: proof bytes are
assembled from GATHERED canonical arrays (process 0), which is exactly
the topology-invariance contract tests/test_topology_invariance.py pins.

Launch (one command per host):

    STARK_TPU_COORD=host0:1234 STARK_TPU_NUM_PROC=4 STARK_TPU_PROC_ID=k \
        python your_prover.py

or rely on the TPU-pod auto-detection (no env needed on Cloud TPU).
"""

from __future__ import annotations

import os
import time
from typing import Optional


def init_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed from args or STARK_TPU_* env vars.

    Returns True if multi-process mode was initialized, False when running
    single-process (no coordinator configured) — callers need no branches,
    all sharding code is identical either way.
    """
    import jax

    coordinator = coordinator or os.environ.get("STARK_TPU_COORD")
    num_processes = num_processes or int(os.environ.get("STARK_TPU_NUM_PROC", 0))
    process_id = (
        process_id
        if process_id is not None
        else int(os.environ.get("STARK_TPU_PROC_ID", -1))
    )
    if not coordinator or num_processes <= 1 or process_id < 0:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def is_controller() -> bool:
    """True on the process that assembles transcripts/proof bytes."""
    import jax

    return jax.process_index() == 0


def make_mimc_scaling_prover(
    steps: int, num_colinearity_checks: int = 4, security_level: int = 8
):
    """Build ``prove_fn(num_shards)`` for :func:`scaling_report` that runs a
    REAL end-to-end ShardedFastStark MiMC proof (device NTT/AIR/FRI + host
    Merkle + transcript assembly) on a (dp=1, sp=num_shards) mesh.

    Provers and preprocessing artifacts are built once per shard count at
    factory time so the timed region is proving only.  The same factory
    runs unchanged on a real pod slice (devices come from jax.devices()).
    """
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from ..field.scalar import Field, FieldElement, P as PRIME
    from ..models.mimc import MiMC, prove_chain
    from ..protocols.fast_stark import FastStark
    from .sharded_stark import ShardedFastStark

    field = Field.main()
    mimc = MiMC(steps)
    x = FieldElement(field.sample(b"scaling-bench").value, field)
    provers = {}

    def get(s: int):
        if s not in provers:
            args = (
                field,
                4,
                num_colinearity_checks,
                security_level,
                mimc.m,
                steps + 1,
            )
            if s == 1:
                stark = FastStark(*args, transition_constraints_degree=3)
            else:
                mesh = Mesh(
                    np.array(jax.devices()[:s]).reshape(1, s),
                    axis_names=("dp", "sp"),
                )
                stark = ShardedFastStark(
                    *args, transition_constraints_degree=3, mesh=mesh
                )
            provers[s] = (stark, stark.preprocess())
        return provers[s]

    def prove_fn(s: int):
        stark, tz = get(s)
        _, proof, _ = prove_chain(mimc, stark, x, tz)
        return proof

    prove_fn.get = get          # phase/byte decomposition hooks
    prove_fn.mimc = mimc
    return prove_fn


def collective_bytes_model(stark, s: int) -> dict:
    """Analytic per-proof collective volume for a ShardedFastStark proof
    on sp = s shards (bytes that would ride ICI on a real slice).

    Every distributed NTT (parallel/ntt_dist.py) performs THREE
    all_to_all exchanges of the full (NLIMBS, n) array; an all_to_all of
    an n-element codeword moves n * 32 B * (s-1)/s across the mesh.
    The prover runs, per proof: one length-M iNTT + one length-N LDE per
    register (trace interpolation), one length-N LDE for the randomizer,
    and FRI folds are shard-local (the fold pairs i, i+n/2 live on the
    same shard after the natural-order shuffle, and commitment roots are
    32 B each — negligible).
    """
    R = stark.num_registers
    M = stark.omicron_domain_length
    N = stark.fri_domain_length
    elt = 32  # resident bytes per element (8 x u32 limbs)
    frac = (s - 1) / s if s > 1 else 0.0
    per = {}
    total = 0
    for name, count, n in (
        ("trace iNTT (M)", R, M),
        ("trace LDE (N)", R, N),
        ("randomizer LDE (N)", 1, N),
    ):
        b = 3 * count * n * elt * frac
        per[name] = b
        total += b
    # FRI folds: pairing i <-> i+n/2 moves the top half across the mesh
    # each round (a ppermute of n_r/2 elements), then the folded result
    # reshards; ~2 * n_r * 32 B per round, summing to ~2 * 2N * 32 B
    fri_bytes = 0
    n = N
    for _ in range(stark.fri.num_rounds() - 1):
        fri_bytes += 2 * n * elt * frac
        n //= 2
    per["FRI folds (sum rounds)"] = fri_bytes
    total += fri_bytes
    per["TOTAL"] = total
    return per


def scaling_report(prove_fn, shard_counts, reps: int = 3):
    """Measure prove throughput vs shard count (BASELINE: >= 80% efficiency
    from 1 to N).  ``prove_fn(num_shards)`` runs one proving step on that
    many shards and blocks until done; returns a list of dicts
    {shards, seconds, speedup, efficiency} (printed by bench harnesses).
    """
    results = []
    base = None
    for s in shard_counts:
        prove_fn(s)  # warm / compile
        t0 = time.perf_counter()
        for _ in range(reps):
            prove_fn(s)
        dt = (time.perf_counter() - t0) / reps
        if base is None:
            base = dt
        speedup = base / dt
        results.append(
            {
                "shards": s,
                "seconds": dt,
                "speedup": speedup,
                "efficiency": speedup / (s / shard_counts[0]),
            }
        )
    return results
