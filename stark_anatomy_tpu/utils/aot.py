"""AOT export cache: skip per-process Python tracing of the big graphs.

The prover's hot executables are large unrolled graphs (a 2^24 staged NTT
traces ~12 s, a fused FRI fold+commit round ~8-20 s; eleven of those made
round 3's "first proof in a fresh process" cost minutes even with a warm
XLA persistent cache — tracing and lowering happen per process, BEFORE
the cache can hit).  This module persists `jax.export` artifacts
(StableHLO, post-tracing/lowering) to disk keyed by call-site name,
static configuration, and argument shapes; a warm process deserializes
the artifact (~tens of ms) and goes straight to XLA compilation, which
the persistent compile cache serves in seconds.

Usage (call-site wrapper; falls back to the plain jitted call on ANY
error so AOT can never break proving):

    out = aot_call("staged_ntt", _staged_jit, (x, ...), static={"n1": n1})

Artifacts live in STARK_TPU_AOT_DIR (default: <repo>/.artifacts/aot).
Disable entirely with STARK_TPU_AOT=0.
"""

from __future__ import annotations

import hashlib
import os
from typing import Dict, Optional, Tuple

_MEM: Dict[str, object] = {}
_DIR: Optional[str] = None


def _aot_dir() -> Optional[str]:
    global _DIR
    if os.environ.get("STARK_TPU_AOT") == "0":
        return None
    if _DIR is None:
        d = os.environ.get("STARK_TPU_AOT_DIR")
        if not d:
            root = os.path.dirname(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            )
            d = os.path.join(root, ".artifacts", "aot")
        try:
            os.makedirs(d, exist_ok=True)
        except OSError:
            return None
        _DIR = d
    return _DIR


def _arg_sig(args) -> str:
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(args)
    parts = [str(treedef)]
    for leaf in leaves:
        parts.append(f"{getattr(leaf, 'dtype', type(leaf).__name__)}"
                     f"{tuple(getattr(leaf, 'shape', ()))}")
    return hashlib.blake2s("|".join(parts).encode()).hexdigest()[:20]


def aot_call(name: str, jit_fn, args: Tuple, static: Optional[dict] = None,
             version: str = "1"):
    """Call ``jit_fn(*args, **static)`` through the AOT artifact cache.

    ``name``/``version`` identify the call site; bump ``version`` whenever
    the traced function's SEMANTICS change (shapes/dtypes are keyed
    automatically, logic is not).
    """
    static = static or {}
    d = _aot_dir()
    if d is None:
        return jit_fn(*args, **static)
    import jax

    skey = ",".join(f"{k}={static[k]}" for k in sorted(static))
    key = (
        f"{name}-v{version}-{jax.default_backend()}-{skey}-{_arg_sig(args)}"
    )
    fn = _MEM.get(key)
    if fn is not None:
        return fn(*args)

    import jax

    path = os.path.join(d, key + ".jaxexport")
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                exported = jax.export.deserialize(bytearray(f.read()))
            fn = jax.jit(exported.call)
            out = fn(*args)
            _MEM[key] = fn
            return out
        except Exception:
            try:
                os.remove(path)   # stale/corrupt artifact: rebuild below
            except OSError:
                pass

    # miss: one trace+lower produces BOTH the artifact and the callable
    try:
        exported = jax.export.export(jit_fn)(*args, **static)
        blob = exported.serialize()
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        fn = jax.jit(exported.call)
        out = fn(*args)
        _MEM[key] = fn
        return out
    except Exception:
        # any export limitation: fall back to the plain call, remember it
        if static:
            def fallback(*a, _jf=jit_fn, _st=static):
                return _jf(*a, **_st)
        else:
            fallback = jit_fn
        _MEM[key] = fallback
        return fallback(*args)
