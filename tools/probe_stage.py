"""Decompose _StageTables build cost at 2^20: which construction step
carries the compile time?  Usage: python tools/probe_stage.py"""
from __future__ import annotations

import os
import shutil
import sys
import time

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, root)
cache = "/tmp/.jax_cache_stageprobe"
shutil.rmtree(cache, ignore_errors=True)
os.environ["JAX_COMPILATION_CACHE_DIR"] = cache

import jax

jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from stark_anatomy_tpu.field.scalar import P
from stark_anatomy_tpu.ops.domain import DOMAINS, mont_const
from stark_anatomy_tpu.ops import stage_ntt as S


def sync(arr):
    return int(np.asarray(jax.device_get(arr.reshape(-1)[:1]))[0])


def step(name, fn):
    t0 = time.time()
    r = fn()
    try:
        leaf = jax.tree_util.tree_leaves(r)[0]
        sync(leaf)
    except Exception:
        pass
    print(f"{name}: {time.time()-t0:.1f}s", flush=True)
    return r


n = 1 << 20
n1 = n2 = 1 << 10
dom = DOMAINS.get(n)
w = dom["omega"]

step("master build", lambda: DOMAINS.master(n)[1])
full1 = step("tw1 gather", lambda: DOMAINS.master_powers(n2, n1 // 2, order=n))
step("stage_rows tw1", lambda: S._stage_rows(pow(w, n2, P), n1, full1))
cross = step("outer gather", lambda: DOMAINS.master_powers_outer(1, n1, n2, order=n))
step("cross finish", lambda: S._cross_finish(cross, mont_const(pow(n, P - 2, P)), scaled=False))
step("bitrev", lambda: jnp.asarray(S.bit_reversal_permutation(n1)))
