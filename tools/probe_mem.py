"""Per-phase HBM accounting for the 2^20 MiMC prove: prints
device memory_stats deltas so OOMs are attributable.
Usage: python tools/probe_mem.py [log2_steps]"""
from __future__ import annotations

import os
import sys
import time

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, root)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(root, ".jax_cache"))

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from stark_anatomy_tpu.field.scalar import Field
from stark_anatomy_tpu.models.mimc import make_stark, prove_chain


def mem(tag):
    try:
        s = jax.local_devices()[0].memory_stats()
        print(
            f"[mem] {tag}: in_use {s.get('bytes_in_use', 0)/2**30:.2f} GiB "
            f"peak {s.get('peak_bytes_in_use', 0)/2**30:.2f} GiB "
            f"limit {s.get('bytes_limit', 0)/2**30:.2f} GiB",
            flush=True,
        )
    except Exception as e:
        print(f"[mem] {tag}: unavailable ({e})", flush=True)


log2_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
mimc, stark = make_stark(1 << log2_steps, 4, 64, 128)
mem("start")
tz = stark.preprocess()
mem("preprocess")
x = Field.main().sample(b"bench-mimc")
try:
    t0 = time.time()
    out, proof, _ = prove_chain(mimc, stark, x, tz)
    print(f"first prove: {time.time()-t0:.1f}s, proof {len(proof)} bytes", flush=True)
    for k, v in sorted(stark.timer.totals.items()):
        print(f"  phase {k}: {v:.1f}s", flush=True)
    stark.timer.totals.clear(); stark.timer.counts.clear()
    t0 = time.time()
    out, proof, _ = prove_chain(mimc, stark, x, tz)
    print(f"STEADY prove: {time.time()-t0:.1f}s", flush=True)
    for k, v in sorted(stark.timer.totals.items(), key=lambda kv: -kv[1]):
        print(f"  steady {k}: {v*1000:.0f}ms", flush=True)
except Exception as e:
    mem("FAILED")
    for k, v in sorted(stark.timer.totals.items()):
        print(f"  phase {k}: {v:.1f}s", flush=True)
    raise
