"""Time-to-first-proof probe: fresh-process MiMC 2^20 prove with per-phase
first-run attribution and XLA compile logging, to split tracing time from
compile time from run time.  Round-4 ask #4 (VERDICT.md): first MiMC prove
< 90 s.  Usage:  python tools/ttfp_probe.py [log2_steps]
"""
from __future__ import annotations

import logging
import os
import sys
import time

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, root)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(root, ".jax_cache"))

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_log_compiles", True)
logging.basicConfig(level=logging.WARNING)
logging.getLogger("jax._src.dispatch").setLevel(logging.DEBUG)
logging.getLogger("jax._src.interpreters.pxla").setLevel(logging.DEBUG)

from stark_anatomy_tpu.field.scalar import Field
from stark_anatomy_tpu.models.mimc import make_stark, prove_chain

log2_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
steps = 1 << log2_steps

t_start = time.time()
mimc, stark = make_stark(steps, 4, 64, 128)
t0 = time.time()
tz = stark.preprocess()
print(f"[ttfp] preprocess: {time.time()-t0:.1f}s", flush=True)

x = Field.main().sample(b"bench-mimc")
t0 = time.time()
out, proof, _ = prove_chain(mimc, stark, x, tz)
t_prove = time.time() - t0
print(f"[ttfp] FIRST prove: {t_prove:.1f}s (total from import {time.time()-t_start:.1f}s)", flush=True)
print("[ttfp] first-run phases:\n" + stark.timer.report(), flush=True)
print(f"[ttfp] phases sum {sum(stark.timer.totals.values()):.1f}s vs wall {t_prove:.1f}s", flush=True)
