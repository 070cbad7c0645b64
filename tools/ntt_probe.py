"""Device-time profile of the NTT and its component ops on the real TPU.

Uses the paired difference method (tools/measure.py) — the chip is
time-shared and per-call dispatch through the axon tunnel swings
20-40 ms, so naive single-call timings measure the tunnel, not the chip.

Round-4 findings this profile documented (drove the stage_ntt design):
- XLA-fused unrolled Montgomery multiply: ~0.12 ms at 2^20 (= HBM-bound
  at ~820 GB/s for its 96 MB of traffic).
- Mosaic/Pallas kernels running identical arithmetic: 4-20x slower.
- XLA transposes and takes on these shapes: < 0.1 ms (nearly free).
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from stark_anatomy_tpu.field import ops as F
from stark_anatomy_tpu.ops import ntt as NTT
from stark_anatomy_tpu.ops.stage_ntt import staged_ntt
from tools.measure import dev_time

n = 1 << 20
x = jnp.ones((8, n), dtype=jnp.uint32)

dev_time(lambda v: staged_ntt(v), x, k=4, verbose="staged_ntt 2^20")
dev_time(
    lambda v: F._stack(F._mont_mul_rows(F._rows(v), F._rows(v))), x,
    verbose="mont_mul XLA-fused rows 2^20")

n1 = n2 = 1 << 10


def tr(v):
    return jnp.transpose(v.reshape(8, n1, n2), (0, 2, 1)).reshape(8, n)


dev_time(tr, x, verbose="XLA transpose (L,n1,n2)->(L,n2,n1)")
