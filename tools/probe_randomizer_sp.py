"""Decompose the sharded prover's randomizer_poly phase vs shard count
(VERDICT r4 ask #6: the sp>=2 blow-up needs an attributed cause).

Splits the phase into: bulk sampling (host urandom -> device),
pad+placement (device_put with NamedSharding), the distributed LDE
itself, and the completion sync.  CPU virtual mesh (the real environment
has one chip); absolute times are noisy, RATIOS between components and
between shard counts are the signal.

Usage: python tools/probe_randomizer_sp.py [steps_log2=12] [reps=3]
"""
from __future__ import annotations

import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np

from jax.sharding import Mesh

from stark_anatomy_tpu.field.scalar import Field
from stark_anatomy_tpu.models.mimc import MiMC
from stark_anatomy_tpu.parallel.sharded_stark import ShardedFastStark
from stark_anatomy_tpu.protocols.fast_stark import FastStark
from stark_anatomy_tpu.ops import ntt as NTT
from stark_anatomy_tpu.utils.rand import bulk_random_mont


def sync(a):
    return int(np.asarray(jax.device_get(a.reshape(-1)[:1]))[0])


def main():
    steps_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    steps = 1 << steps_log2
    field = Field.main()
    mimc = MiMC(steps)
    tcs = mimc.transition_constraints()

    for S in (1, 2, 4, 8):
        if S > len(jax.devices()):
            continue
        args = (field, 4, 64, 128, 1, steps + 1)
        if S == 1:
            stark = FastStark(*args, transition_constraints_degree=3)
            stark.blocked_lde = False   # match the sharded transform path
        else:
            mesh = Mesh(
                np.array(jax.devices()[:S]).reshape(1, S),
                axis_names=("dp", "sp"),
            )
            stark = ShardedFastStark(
                *args, transition_constraints_degree=3, mesh=mesh
            )
        N = stark.fri_domain_length
        D = stark.max_degree(tcs) + 1
        g = stark.generator.value
        rows = {"sample": [], "pad+place": [], "lde": [], "total": []}
        for rep in range(reps + 1):
            t_all = time.time()
            t0 = time.time()
            rp = bulk_random_mont(D, os.urandom)
            sync(rp)
            t_sample = time.time() - t0
            t0 = time.time()
            padded = NTT._pad_coeffs(rp, N)
            if S > 1:
                padded = stark._shard_last(padded)
            sync(padded)
            t_place = time.time() - t0
            t0 = time.time()
            dist = (
                stark._dist_ntt(N, padded.ndim - 2, inverse=False)
                if S > 1
                else None
            )
            if dist is not None:
                from stark_anatomy_tpu.field import ops as F
                from stark_anatomy_tpu.ops.domain import coset_table

                out = dist(F.mont_mul(padded, coset_table(g, N)))
            else:
                from stark_anatomy_tpu.ops.domain import DOMAINS, coset_table

                dom = DOMAINS.get(N)
                out = NTT._lde_core(
                    padded, coset_table(g, N), dom["bitrev"], dom["fwd_powers"], N
                )
            sync(out)
            t_lde = time.time() - t0
            if rep == 0:
                continue  # warmup/compile rep
            rows["sample"].append(t_sample)
            rows["pad+place"].append(t_place)
            rows["lde"].append(t_lde)
            rows["total"].append(time.time() - t_all)
        print(
            f"sp={S}: "
            + "  ".join(
                f"{k} {np.median(v)*1000:7.1f}ms" for k, v in rows.items()
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
