"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding logic is tested on a virtual device mesh (the real
environment has a single TPU chip).  The environment's sitecustomize
imports jax and registers the TPU backend before pytest starts, so plain
env vars are too late — we must update the jax config directly (backends
initialize lazily, so this still wins as long as no array has been
created yet).

Set STARK_TPU_TEST_PLATFORM=tpu to run the suite on the real chip instead.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("STARK_TPU_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: recompiling every NTT size on each pytest
# run dominates test time otherwise.
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running full-parameter tests")


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    if config.getoption("-m"):
        return
    skip_slow = _pytest.mark.skip(reason="slow; run with -m slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
