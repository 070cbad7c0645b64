"""Decomposed compile/runtime measurements for the cold-path collapse.

Cases (each timed separately, fresh cache per mode):
  master  — master power-table build (two-level) at 2^20
  gather  — _master_gather compile at (8, 2^20)
  slice   — strided-slice derivation compile at the same shape
  staged  — staged_ntt compile (tables prebuilt) + chain-differenced run
  commit  — _commit_paired_core at 2^21 compile + run
  fold    — FRI _fold_commit_kernel at 2^22 compile + run

Usage: python tools/probe_effort.py <mode>   # default | low | o1
"""
from __future__ import annotations

import os
import shutil
import sys
import time

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, root)
mode = sys.argv[1] if len(sys.argv) > 1 else "default"
cache = os.path.join("/tmp", f".jax_cache_eff2_{mode}")
shutil.rmtree(cache, ignore_errors=True)
os.environ["JAX_COMPILATION_CACHE_DIR"] = cache

import jax

jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
if mode == "low":
    jax.config.update("jax_exec_time_optimization_effort", -1.0)
elif mode == "o1":
    jax.config.update("jax_optimization_level", 1)

import jax.numpy as jnp
import numpy as np

from stark_anatomy_tpu.ops.domain import DOMAINS, _master_gather
from stark_anatomy_tpu.ops.stage_ntt import stage_tables, staged_ntt


def sync(arr):
    return int(np.asarray(jax.device_get(arr.reshape(-1)[:1]))[0])


def out(msg):
    print(f"[{mode}] {msg}", flush=True)


def chain_run(fn, x, reps=6):
    """Chain-differenced device time: t(8 calls) - t(4 calls) over 4."""
    import functools

    def chain(k):
        @jax.jit
        def run(v):
            for _ in range(k):
                v = fn(v)
            return v
        return run

    c4, c8 = chain(4), chain(8)
    y = c4(x); sync(y)
    y = c8(x); sync(y)
    diffs = []
    for _ in range(reps):
        t0 = time.time(); y = c4(y); sync(y); t4 = time.time() - t0
        t0 = time.time(); y = c8(y); sync(y); t8 = time.time() - t0
        diffs.append((t8 - t4) / 4)
    return float(np.median(diffs))


def main():
    print(f"mode={mode} devices:", jax.devices(), file=sys.stderr)
    n = 1 << 20

    t0 = time.time()
    m, tab = DOMAINS.master(n)
    sync(tab)
    out(f"master build 2^20: {time.time()-t0:.1f}s")

    t0 = time.time()
    g = _master_gather(tab, jnp.uint32(1), n)
    sync(g)
    out(f"gather (8,2^20): first {time.time()-t0:.1f}s")

    @jax.jit
    def strided(tab):
        return jax.lax.slice(tab, (0, 0), (8, n), (1, 2))

    t0 = time.time()
    s = strided(tab)
    sync(s)
    out(f"strided slice: first {time.time()-t0:.1f}s")

    t0 = time.time()
    stage_tables(n, False)
    out(f"stage tables 2^20: {time.time()-t0:.1f}s")

    x = jnp.zeros((8, n), dtype=jnp.uint32).at[0, :].set(1)
    t0 = time.time()
    y = staged_ntt(x); sync(y)
    out(f"staged 2^20: first {time.time()-t0:.1f}s")
    out(f"staged 2^20: chain run {chain_run(staged_ntt, x)*1e3:.2f}ms")

    from stark_anatomy_tpu.commit.device_merkle import _commit_paired_core

    mN = 1 << 21
    z = jnp.zeros((8, mN), dtype=jnp.uint32).at[0, :].set(1)
    t0 = time.time()
    canon, flat = _commit_paired_core(z); sync(flat)
    out(f"commit 2^21: first {time.time()-t0:.1f}s")
    ts = []
    for _ in range(5):
        t0 = time.time(); canon, flat = _commit_paired_core(z); sync(flat)
        ts.append(time.time() - t0)
    out(f"commit 2^21: run {float(np.median(ts))*1e3:.1f}ms (incl dispatch)")

    from stark_anatomy_tpu.protocols.fri import _fold_commit_kernel
    from stark_anatomy_tpu.ops.domain import mont_const

    N = 1 << 22
    cw = jnp.zeros((8, N), dtype=jnp.uint32).at[0, :].set(1)
    u = _master_gather(DOMAINS.master(N)[1], jnp.uint32(DOMAINS.master(N)[0] - 1), N // 2)
    t0 = time.time()
    f, u2, canon, flat = _fold_commit_kernel(cw, u, mont_const(3), mont_const(5))
    sync(flat)
    out(f"fold_commit 2^22: first {time.time()-t0:.1f}s")
    ts = []
    for _ in range(5):
        t0 = time.time()
        f, u2, canon, flat = _fold_commit_kernel(cw, u, mont_const(3), mont_const(5))
        sync(flat)
        ts.append(time.time() - t0)
    out(f"fold_commit 2^22: run {float(np.median(ts))*1e3:.1f}ms (incl dispatch)")


if __name__ == "__main__":
    main()
