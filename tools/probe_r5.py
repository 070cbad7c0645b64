"""Round-5 measurement probe: compile-time vs runtime of the cold-path
heavy executables, to steer the executable-count/compile-cost collapse.

Measures, on the real chip:
  1. scan-form NTT (ntt_core, radix-2 lax.scan) at 2^20/2^22:
     compile time + chain-differenced device time
  2. staged four-step NTT at the same sizes (compile known from the
     ttfp log; runtime re-measured for the same-session comparison)
  3. _commit_paired_core at 2^21: compile + runtime as-is

Usage: python tools/probe_r5.py [--fresh-cache]
"""
from __future__ import annotations

import os
import sys
import time

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, root)
cache = os.path.join(root, ".jax_cache_probe_r5")
os.environ["JAX_COMPILATION_CACHE_DIR"] = cache

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from stark_anatomy_tpu.field import ops as F
from stark_anatomy_tpu.ops import ntt as NTT
from stark_anatomy_tpu.ops.domain import DOMAINS
from stark_anatomy_tpu.ops.stage_ntt import staged_ntt


def sync(arr):
    return int(np.asarray(jax.device_get(arr.reshape(-1)[:1]))[0])


def timeit(fn, x, reps=6):
    """Median of reps single calls (incl. dispatch) + chain-of-4 diff."""
    y = fn(x); sync(y)
    ts = []
    for _ in range(reps):
        t0 = time.time(); y = fn(y); sync(y); ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    for log_n in (20, 22):
        n = 1 << log_n
        x = jnp.zeros((8, n), dtype=jnp.uint32).at[0, :].set(1)
        dom = DOMAINS.get(n)

        t0 = time.time()
        y = NTT._ntt_core_jit(x, dom["bitrev"], dom["fwd_powers"], None)
        sync(y)
        t_scan_compile = time.time() - t0
        t_scan = timeit(
            lambda v: NTT._ntt_core_jit(v, dom["bitrev"], dom["fwd_powers"], None), x
        )

        t0 = time.time()
        y = staged_ntt(x)
        sync(y)
        t_staged_first = time.time() - t0
        t_staged = timeit(staged_ntt, x)
        print(
            f"2^{log_n}: scan compile {t_scan_compile:.1f}s run {t_scan*1e3:.2f}ms | "
            f"staged first {t_staged_first:.1f}s run {t_staged*1e3:.2f}ms",
            flush=True,
        )

    from stark_anatomy_tpu.commit.device_merkle import _commit_paired_core

    n = 1 << 21
    x = jnp.zeros((8, n), dtype=jnp.uint32).at[0, :].set(1)
    t0 = time.time()
    canon, flat = _commit_paired_core(x)
    sync(flat)
    t_first = time.time() - t0
    ts = []
    for _ in range(5):
        t0 = time.time()
        canon, flat = _commit_paired_core(x)
        sync(flat)
        ts.append(time.time() - t0)
    print(
        f"commit 2^21: first {t_first:.1f}s run {np.median(ts)*1e3:.1f}ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
