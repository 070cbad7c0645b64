"""Device-mesh helpers for multi-chip proving.

The reference has no distributed code at all (SURVEY.md §2); these are the
framework's own parallel axes, derived from the proof system's data flow:

  dp  -- data parallelism over independent proofs (batch signing)
  sp  -- "sequence" parallelism over the codeword/evaluation-domain axis
         (the NTT/FRI/Merkle domain is the structural analog of sequence
         length)

Shardings ride ICI via jax.sharding + jit; XLA inserts the collectives
(all-to-alls for the cross-shard NTT stages, gathers for Merkle roots).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def factor_mesh(n_devices: int) -> Tuple[int, int]:
    """Split n devices into (dp, sp) as evenly as possible, sp-major."""
    dp = 1
    sp = n_devices
    while sp > dp * 2 and sp % 2 == 0:
        sp //= 2
        dp *= 2
    return dp, sp


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        available = jax.devices()
        if n_devices is not None and len(available) < n_devices:
            raise ValueError(
                f"make_mesh({n_devices}) but only {len(available)} devices "
                f"are available — a silently smaller mesh would run "
                f"unsharded (for virtual CPU devices, set "
                f"XLA_FLAGS=--xla_force_host_platform_device_count=N "
                f"before the first jax import)"
            )
        devices = available[: n_devices or len(available)]
    dp, sp = factor_mesh(len(devices))
    return Mesh(np.array(devices).reshape(dp, sp), axis_names=("dp", "sp"))


def proof_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Per-proof inputs laid out (NLIMBS, B): batch axis over dp."""
    return NamedSharding(mesh, P(None, "dp"))


def codeword_sharding(mesh: Mesh, batched: bool = True) -> NamedSharding:
    """Codeword arrays in the limb-first layout (see field/ops.py):
    (B, NLIMBS, N) batch over dp + domain over sp, or (NLIMBS, N)."""
    if batched:
        return NamedSharding(mesh, P("dp", None, "sp"))
    return NamedSharding(mesh, P(None, "sp"))
