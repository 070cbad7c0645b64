"""Frozen configuration objects for the framework.

The reference's only configuration is loose constructor parameters with
asserted invariants (stark.py:8-33, rpsss.py:26-35).  Here the same
parameters live in a frozen dataclass, extended with the TPU-specific
knobs the reference has no analog for (mesh axes, hashing backend,
randomness seed).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class StarkConfig:
    """Parameters of a STARK instance (reference: stark.py:8-33)."""

    expansion_factor: int = 4
    num_colinearity_checks: int = 64
    security_level: int = 128
    num_registers: int = 2
    num_cycles: int = 28
    transition_constraints_degree: int = 3

    def __post_init__(self):
        assert self.expansion_factor & (self.expansion_factor - 1) == 0, (
            "expansion factor must be a power of 2"
        )
        assert self.expansion_factor >= 4, "expansion factor must be >= 4"
        assert 2 * self.num_colinearity_checks >= self.security_level, (
            "colinearity checks must cover half the security level"
        )

    # derived quantities (reference: stark.py:19-26)
    @property
    def num_randomizers(self) -> int:
        return 4 * self.num_colinearity_checks

    @property
    def randomized_trace_length(self) -> int:
        return self.num_cycles + self.num_randomizers

    @property
    def omicron_domain_length(self) -> int:
        return 1 << (
            self.randomized_trace_length * self.transition_constraints_degree
        ).bit_length()

    @property
    def fri_domain_length(self) -> int:
        return self.omicron_domain_length * self.expansion_factor


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Parallelism layout: dp = independent proofs, sp = codeword axis."""

    dp: int = 1
    sp: int = 1

    @property
    def num_devices(self) -> int:
        return self.dp * self.sp

    def build(self):
        """Materialize a jax Mesh with these axes (raises if the process
        has fewer than ``num_devices`` devices)."""
        import jax
        import numpy as np
        from jax.sharding import Mesh

        devices = jax.devices()
        if len(devices) < self.num_devices:
            raise ValueError(
                f"MeshConfig(dp={self.dp}, sp={self.sp}) needs "
                f"{self.num_devices} devices, have {len(devices)}"
            )
        return Mesh(
            np.array(devices[: self.num_devices]).reshape(self.dp, self.sp),
            axis_names=("dp", "sp"),
        )


RPSSS_CONFIG = StarkConfig()  # the production signature parameters
