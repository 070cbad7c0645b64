"""Profiler-based device timing: exact per-call device busy time.

The jax profiler works through the axon tunnel and gives per-kernel
device durations — far more reliable than wall-clock differencing on
this time-shared chip.  Reports the top-level jitted call's device time
and the largest component fusions.
"""

import collections
import glob
import gzip
import json
import os
import shutil


def profile_call(fn, x, reps=4, top=0, tag="op"):
    """Run fn(x) reps times under the profiler; return device ms/call."""
    import jax
    import numpy as np

    def sync(a):
        leaf = jax.tree_util.tree_leaves(a)[0]
        return int(np.asarray(jax.device_get(leaf.reshape(-1)[:1]).view(np.uint32)[:1])[0])

    y = fn(x)
    sync(y)
    tdir = f"/tmp/jaxprof_{tag}_{os.getpid()}"
    shutil.rmtree(tdir, ignore_errors=True)
    with jax.profiler.trace(tdir):
        for _ in range(reps):
            y = fn(y)
        sync(y)

    files = glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz")
    with gzip.open(files[0]) as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])
    pids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    devpids = {p for p, n in pids.items() if "TPU" in n}
    by_name = collections.defaultdict(float)
    cnt = collections.Counter()
    jit_total = 0.0
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in devpids:
            name = e["name"]
            if name.startswith("jit_"):
                jit_total += e.get("dur", 0)
            else:
                by_name[name] += e.get("dur", 0)
                cnt[name] += 1
    shutil.rmtree(tdir, ignore_errors=True)
    per_call = jit_total / reps / 1000.0
    kern_sum = sum(by_name.values()) / reps / 1000.0
    print(f"{tag:<40s} {per_call:8.3f} ms/call device (kernel sum {kern_sum:.3f})")
    if top:
        for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:top]:
            print(f"   {dur/reps/1000:8.3f} ms x{cnt[name]//reps:<3d} {name[:90]}")
    return per_call
