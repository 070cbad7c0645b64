"""Difference-method device timing for the axon tunnel.

The chip is time-shared and dispatch latency swings 20-40 ms, so single
best-of-N timings are garbage.  dev_time measures chains of K and 2K ops
INTERLEAVED (paired runs back-to-back), and reports the median of the
per-pair differences — slow periods cancel because both chains see them.
Ops must be ones XLA cannot algebraically merge.
"""

import time

import jax
import numpy as np


def _sync(arr):
    leaf = jax.tree_util.tree_leaves(arr)[0]
    return int(np.asarray(jax.device_get(leaf.reshape(-1)[:1]).view(np.uint32)[:1])[0])


def _chain(body, v, k):
    for _ in range(k):
        v = body(v)
    return v


def _timed(fn, x):
    t0 = time.time()
    y = fn(x)
    _sync(y)
    return time.time() - t0


def dev_time(body, x, k=4, pairs=12, verbose=None):
    """Marginal device time of body (x -> x-like): median over paired
    (chain 2K) - (chain K) differences, divided by K."""
    c1 = jax.jit(lambda v: _chain(body, v, k))
    c2 = jax.jit(lambda v: _chain(body, v, 2 * k))
    _timed(c1, x)  # compile + warm
    _timed(c2, x)
    diffs = []
    for _ in range(pairs):
        t1 = _timed(c1, x)
        t2 = _timed(c2, x)
        diffs.append((t2 - t1) / k)
    per = float(np.median(diffs))
    if verbose:
        lo, hi = np.percentile(diffs, [25, 75])
        print(
            f"{verbose:<46s} {per*1000:8.3f} ms/op  "
            f"(iqr {lo*1000:.3f}..{hi*1000:.3f}, k={k})"
        )
    return per
