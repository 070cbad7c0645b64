"""Fused NTT kernels: the whole butterfly network in VMEM.

The scan-based NTT in ops/ntt.py issues, per butterfly stage, a twiddle
gather + Montgomery multiply + two lane-rolls + a select — each a separate
HBM round-trip over the whole (NLIMBS, n) codeword.  At n = 2^20 that is
~20 stages x ~6 passes x 32 MB and the measured 115 ms is pure HBM
traffic.  This module restructures the transform around VMEM residency:

* ``ntt_fused``: for n <= 8192 lanes, ONE Pallas program runs ALL log2(n)
  butterfly stages on a (G, NLIMBS, n) block that never leaves VMEM — one
  HBM read and one write for the entire transform.  The butterfly uses the
  same roll/mask form as ops/ntt.py:_stages (pairs (j, j+m) with twiddle
  indexed by j mod m), so it is bit-exact against the scan path.

* ``ntt_four_step``: for n >= 2^14, the classic four-step (Bailey) split
  n = N1*N2: column NTTs of length N1 (batched over N2, one fused-kernel
  call), the cross twiddle omega_n^(j2*k1) fused into the same kernel as a
  post-multiply, row NTTs of length N2, and a final transpose to natural
  order.  Total HBM traffic is ~10 array passes instead of ~120.

Stage order and twiddle layout match ops/ntt.py exactly; validated by the
bit-exact NTT tests (tests/test_ntt.py) plus dedicated kernel-vs-scan
equivalence tests through the Pallas interpreter on CPU.

Reference semantics: /root/reference/code/ntt.py:3-30 (recursive radix-2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .limb_arith import add_mod_rows as _add_mod, sub_mod_rows as _sub_mod
from .limbs import NLIMBS
from .pallas_kernels import _mont_mul_block

# largest transform done as a single VMEM-resident kernel (lanes)
MAX_FUSED = 8192
MIN_FUSED = 128
# cap on per-program block bytes (input only): G * NLIMBS * n * 4
_BLOCK_BYTES = 1 << 18


def _stages_kernel(n_stages, has_post, x_ref, w_ref, *rest):
    """All log2(n) butterfly stages on one (1, G, NLIMBS, n) block.

    w_ref: (n_stages, NLIMBS, n) per-stage twiddles
    (w[s, :, j] = omega^((j mod m) * n/(2m)), m = 2^s).  With has_post, a
    trailing (1, G, NLIMBS, n) input is Montgomery-multiplied into the
    result before the store (the four-step cross twiddle).
    """
    if has_post:
        post_ref, o_ref = rest
    else:
        (o_ref,) = rest
    n = x_ref.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.uint32, (1, n), 1)
    xr = [x_ref[0, :, k, :] for k in range(NLIMBS)]          # each (G, n)
    for s in range(n_stages):
        m = 1 << s
        wr = [w_ref[s, k, :] for k in range(NLIMBS)]         # (n,) -> bcast
        tr = _mont_mul_block(xr, [jnp.broadcast_to(w, xr[0].shape) for w in wr])
        t_left = [jnp.roll(t, -m, axis=-1) for t in tr]
        x_right = [jnp.roll(x, m, axis=-1) for x in xr]
        lo = _add_mod(xr, t_left)
        hi = _sub_mod(x_right, tr)
        mask = (lane & np.uint32(m)) == 0
        xr = [jnp.where(mask, lo[k], hi[k]) for k in range(NLIMBS)]
    if has_post:
        pr = [post_ref[0, :, k, :] for k in range(NLIMBS)]
        xr = _mont_mul_block(xr, pr)
    o_ref[0, :, :, :] = jnp.stack(xr, axis=1)


@functools.lru_cache(maxsize=None)
def _stage_twiddle_index(n: int) -> np.ndarray:
    """(n_stages, n) indices into the (NLIMBS, n) omega power table:
    stage s (m = 2^s), position j -> exponent (j mod m) * n/(2m)."""
    stages = n.bit_length() - 1
    idx = np.zeros((stages, n), dtype=np.int64)
    lanes = np.arange(n, dtype=np.int64)
    for s in range(stages):
        m = 1 << s
        idx[s] = (lanes % m) * (n // (2 * m))
    return idx


def _batch_rows(batch: int, n: int) -> int:
    """Rows per program: largest power of two dividing batch within the
    VMEM block budget."""
    g = 1
    while (
        batch % (2 * g) == 0 and 2 * g * NLIMBS * n * 4 <= _BLOCK_BYTES
    ):
        g *= 2
    return g


def stage_twiddles(powers: jnp.ndarray, n: int) -> jnp.ndarray:
    """(n_stages, NLIMBS, n) stage-twiddle tensor gathered from the full
    omega power table (trace-time; tiny next to the transform itself)."""
    # take inserts the (stages, n) index dims at the lane axis -> (L, S, n)
    return jnp.moveaxis(
        jnp.take(powers, jnp.asarray(_stage_twiddle_index(n)), axis=-1), 0, 1
    )


def fused_stages(
    x: jnp.ndarray,
    w_stages: jnp.ndarray,
    post: jnp.ndarray | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run all butterfly stages on bit-reversed input via one pallas_call.

    x: (..., NLIMBS, n) uint32, MIN_FUSED <= n <= MAX_FUSED.
    w_stages: (log2(n), NLIMBS, n).  post (optional): broadcast-compatible
    (..., NLIMBS, n) multiplied in before the store; its leading dims must
    either equal x's or tile them (four-step cross twiddle: x is
    (B, N2, L, n), post is (N2, L, n)).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shape = x.shape
    n = shape[-1]
    stages = n.bit_length() - 1
    batch = int(np.prod(shape[:-2], dtype=np.int64)) if len(shape) > 2 else 1
    g = _batch_rows(batch, n)
    if post is not None:
        # block rows must tile the post's period (the four-step cross
        # twiddle repeats every n2 rows)
        post_batch = (
            int(np.prod(post.shape[:-2], dtype=np.int64)) if post.ndim > 2 else 1
        )
        while post_batch % g:
            g //= 2
    x4 = x.reshape(batch // g, g, NLIMBS, n)

    spec = pl.BlockSpec(
        (1, g, NLIMBS, n), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    w_spec = pl.BlockSpec(
        (stages, NLIMBS, n), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [spec, w_spec]
    args = [x4, w_stages]
    has_post = post is not None
    if has_post:
        assert batch % post_batch == 0 and post_batch % g == 0, (
            batch,
            post_batch,
            g,
        )
        period = post_batch // g
        p4 = post.reshape(period, g, NLIMBS, n)
        in_specs.append(
            pl.BlockSpec(
                (1, g, NLIMBS, n),
                lambda i, period=period: (i % period, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(p4)

    # NOTE: a named closure, NOT functools.partial — the partial object's
    # repr (with its memory address) leaks into the serialized computation
    # and gives every process a fresh persistent-cache key, silently
    # recompiling the fused kernels on each run (measured ~4-10 s each)
    def _stages_kernel_entry(*refs):
        return _stages_kernel(stages, has_post, *refs)

    out = pl.pallas_call(
        _stages_kernel_entry,
        grid=(batch // g,),
        in_specs=in_specs,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((batch // g, g, NLIMBS, n), jnp.uint32),
        interpret=interpret,
    )(*args)
    return out.reshape(shape)


def fused_ok(n: int) -> bool:
    return MIN_FUSED <= n <= MAX_FUSED


def split_four_step(n: int) -> tuple[int, int]:
    """Balanced n = N1 * N2 with N1 >= N2, both <= MAX_FUSED."""
    log = n.bit_length() - 1
    n1 = 1 << ((log + 1) // 2)
    return n1, n // n1


def four_step_core(
    x: jnp.ndarray,
    bitrev1: jnp.ndarray,
    w1: jnp.ndarray,
    cross: jnp.ndarray,
    bitrev2: jnp.ndarray,
    w2: jnp.ndarray,
    n1: int,
    n2: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full NTT of length n = n1*n2 via four-step decomposition.

    x: (..., NLIMBS, n) natural-order coefficients (NOT bit-reversed).
    Output: natural-order evaluations, bit-exact with ops/ntt.py:ntt_core
    applied to the same omega.  cross: (n2, NLIMBS, n1) with
    cross[j2, :, k1] = omega_n^(j2*k1) (Montgomery form).
    """
    shape = x.shape
    n = n1 * n2
    batch = int(np.prod(shape[:-2], dtype=np.int64)) if len(shape) > 2 else 1
    v = x.reshape(batch, NLIMBS, n1, n2)
    # columns: j1 contiguous, batched over (batch, j2)
    v = jnp.transpose(v, (0, 3, 1, 2))                     # (B, n2, L, n1)
    v = jnp.take(v, bitrev1, axis=-1)
    v = fused_stages(v, w1, post=cross, interpret=interpret)
    # rows: j2 contiguous, batched over (batch, k1)
    y = jnp.transpose(v, (0, 3, 2, 1))                     # (B, n1, L, n2)
    y = jnp.take(y, bitrev2, axis=-1)
    y = fused_stages(y, w2, interpret=interpret)
    # natural order: X[k1 + n1*k2] -> layout (L, k2, k1)
    z = jnp.transpose(y, (0, 2, 3, 1))                     # (B, L, n2, n1)
    return z.reshape(shape)
