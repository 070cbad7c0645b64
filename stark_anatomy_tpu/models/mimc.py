"""MiMC chain: the framework's scalable second AIR workload.

The Rescue-Prime/RPSSS model (models/rescue_prime.py) pins the trace at 28
cycles — the reference's only workload (rescue_prime.py:5-273).  This model
has no reference analog: it exists to exercise the prover at LARGE trace
lengths (the BASELINE target is a fast_stark proof at trace length 2^20),
which is where the TPU design pays off.

The computation is the MiMC-style cubing chain

    x_{i+1} = x_i^3 + c          (c a fixed public field constant)

— a verifiable-delay-function shape: inherently sequential to compute,
cheap to constrain.  One register, one degree-3 transition constraint with
CONSTANT coefficients (no round-constant interpolants), so the AIR stays
trivially evaluable at any domain size, and both endpoints are public
boundary conditions: the STARK here buys succinct verification of a long
computation rather than zero-knowledge.

Components mirror the Rescue model's structure: scalar forward/trace
(correctness oracle), a jitted device trace generator (lax.scan over
steps), a pointwise device AIR evaluator, and a scalar point evaluator for
the verifier.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from ..field import ops as F
from ..field.scalar import Field, FieldElement, P
from ..ops.domain import mont_const
from ..poly.multivariate import MPolynomial
from ..protocols.fast_stark import FastStark
from ..protocols.stark import Boundary

# Fixed public chain constant: sampled once from a nothing-up-my-sleeve
# string, pinned here as a literal so the AIR is stable across versions.
MIMC_C = Field.main().sample(b"stark-anatomy-tpu/mimc-chain-constant/v1").value


class MiMC:
    """The MiMC cubing-chain workload over num_steps steps
    (trace = num_steps + 1 cycles, 1 register)."""

    m = 1

    def __init__(self, num_steps: int):
        self.num_steps = num_steps
        self.field = Field.main()
        self.c = FieldElement(MIMC_C, self.field)

    # -- scalar semantics (the oracle) -----------------------------------
    def forward(self, input_element: FieldElement) -> FieldElement:
        x = input_element
        for _ in range(self.num_steps):
            x = x ** 3 + self.c
        return x

    def trace(self, input_element: FieldElement) -> List[List[FieldElement]]:
        x = input_element
        rows = [[x]]
        for _ in range(self.num_steps):
            x = x ** 3 + self.c
            rows.append([x])
        return rows

    # -- AIR ---------------------------------------------------------------
    def transition_constraints(self, omicron=None) -> List[MPolynomial]:
        """next - cur^3 - c = 0; degree 3, constant coefficients.  The
        omicron argument is accepted for interface parity with the Rescue
        model but unused — no cycle-dependent constants."""
        x, cur, nxt = MPolynomial.variables(3, self.field)
        return [nxt - cur ** 3 - MPolynomial.constant(self.c)]

    def boundary_constraints(
        self, input_element: FieldElement, output_element: FieldElement
    ) -> Boundary:
        return [
            (0, 0, input_element),
            (self.num_steps, 0, output_element),
        ]

    # -- device kernels ------------------------------------------------------
    def trace_columns(self, input_value: int) -> jnp.ndarray:
        """Trace generator: (1, NLIMBS, num_steps+1) Montgomery columns,
        suitable for FastStark.prove(trace_columns=...).

        The chain is sequential by design (a VDF shape) — the TPU's width
        buys nothing, and a device scan pays per-step dependency latency
        on (8,1)-lane vectors (~10 us/step; ~10 s at 2^20).  The C++
        native chain (native/mimc_chain.cpp) runs the same Montgomery
        arithmetic at ~25 ns/step and the result uploads ONCE, packed
        (16 B/element); the device scan remains as the fallback when the
        native library is unavailable."""
        from ..utils.convert import device_from_ints

        native = self._native_columns(input_value)
        if native is not None:
            return native

        x0 = device_from_ints([input_value])            # (L, 1)
        c = mont_const(self.c.value)
        steps = self.num_steps
        # the chain is inherently sequential, so throughput is set by the
        # scan's per-iteration overhead; a larger unrolled chunk divides
        # that overhead (64 measured ~2x faster than 16 at 2^20 steps on
        # TPU; beyond 64 the compiled body stops paying for itself)
        CHUNK = 64
        while CHUNK > 1 and steps % CHUNK:
            CHUNK //= 2

        @jax.jit
        def run(x0):
            def step(x, _):
                outs = []
                for _k in range(CHUNK):
                    x3 = F.mont_mul(F.mont_mul(x, x), x)
                    x = F.add(x3, c)
                    outs.append(x)
                return x, jnp.stack(outs)               # (CHUNK, L, 1)

            _, states = jax.lax.scan(step, x0, None, length=steps // CHUNK)
            states = states.reshape(steps, *x0.shape)    # (steps, L, 1)
            chain = jnp.concatenate([x0[None], states], axis=0)
            return jnp.moveaxis(chain[..., 0], 0, -1)[None]      # (1, L, steps+1)

        return run(x0)

    def _native_columns(self, input_value: int, want_output: bool = False):
        """C++ chain + one packed upload; None if the library is missing.
        With ``want_output``, returns (columns, canonical output int) with
        the output decoded from the HOST buffer — no device round trip,
        which matters for the pipelined prover (the output fetch would
        otherwise serialize trace generation against the device queue)."""
        from ..field.limbs import R
        from ..field.scalar import P as _P
        from ..native import get_lib

        lib = get_lib()
        if lib is None or not hasattr(lib, "stark_mimc_chain"):
            return None
        import ctypes

        import numpy as np

        steps = self.num_steps
        x_m = input_value * R % _P
        c_m = self.c.value * R % _P
        buf = np.empty((steps + 1) * 16, dtype=np.uint8)
        mask = (1 << 64) - 1
        lib.stark_mimc_chain(
            x_m & mask, x_m >> 64, c_m & mask, c_m >> 64,
            steps, buf.ctypes.data_as(ctypes.c_void_p),
        )
        # little-endian 16-byte values -> packed u32 words (4, n): upload
        # half the bytes of the sparse limb layout, unpack ON DEVICE
        words = np.ascontiguousarray(
            buf.view("<u4").reshape(steps + 1, 4).T
        )                                                    # (4, n)
        if not want_output:
            return self.columns_from_words(words)
        out_m = int.from_bytes(buf[-16:].tobytes(), "little")
        return words, out_m * pow(R, _P - 2, _P) % _P

    def columns_from_words(self, words) -> jnp.ndarray:
        """Packed host (4, n) u32 words -> (1, L, n) device trace columns
        (one upload + the on-device unpack executable)."""
        return _unpack_columns(jnp.asarray(words))

    def trace_words_with_output(self, input_value: int):
        """HOST-ONLY trace generation: (packed (4, n) numpy words, canonical
        output int), no device touch — the pipelined prover runs this in a
        worker thread so only the GIL-free C++ chain overlaps the device
        phases of the in-flight proof (a device upload/dispatch from the
        worker would contend on the tunnel stream with the prover's
        throttled big-working-set dispatches; measured round 5: the
        device-touching variant made the 8-proof pipeline SLOWER than
        serial, 8.5 s vs 7.2 s per proof).  None if the C++ chain library
        is unavailable."""
        out = self._native_columns(input_value, want_output=True)
        return out  # (words, out_int) or None

    def trace_columns_with_output(self, input_value: int):
        """(device trace columns, canonical output int) — the native path
        decodes the output host-side; the device fallback pays one fetch."""
        native = self._native_columns(input_value, want_output=True)
        if native is not None:
            words, out = native
            return self.columns_from_words(words), out
        from ..utils.convert import ints_from_device

        cols = self.trace_columns(input_value)
        return cols, ints_from_device(cols[0, :, -1:])[0]

    def air_evaluator(self):
        """Pointwise device AIR: one constraint codeword,
        next - cur^3 - c.  Cached on the instance: the prover's fused
        AIR-quotient executable is keyed by evaluator identity, so a
        fresh closure per call would retrace it every proof."""
        if getattr(self, "_air_eval", None) is None:
            c = mont_const(self.c.value)

            def evaluator(x_lde, current, next_):
                cur = current[..., 0, :, :]
                nxt = next_[..., 0, :, :]
                cur3 = F.mont_mul(F.mont_mul(cur, cur), cur)
                return jnp.expand_dims(F.sub(F.sub(nxt, cur3), c), axis=-3)

            self._air_eval = evaluator
        return self._air_eval

    def point_air(self):
        """Scalar per-point AIR for the verifier."""
        c = self.c

        def evaluator(x, current, next_):
            return [next_[0] - current[0] ** 3 - c]

        return evaluator

    def index_air(self):
        """Batched device AIR for the verifier (index argument unused:
        MiMC's constraint has no cycle-dependent constants).  Cached on
        the instance: the evaluator is a static jit argument of the
        batched verify core, keyed by identity."""
        if getattr(self, "_index_air", None) is None:
            c = mont_const(self.c.value)

            def evaluator(idx, current, next_):
                cur = current[0]
                cur3 = F.mont_mul(F.mont_mul(cur, cur), cur)
                return F.sub(F.sub(next_[0], cur3), c)[None]

            self._index_air = evaluator
        return self._index_air


def make_stark(
    num_steps: int,
    expansion_factor: int = 4,
    num_colinearity_checks: int = 64,
    security_level: int = 128,
) -> Tuple[MiMC, FastStark]:
    """Convenience constructor: the MiMC workload plus a FastStark sized
    for it."""
    mimc = MiMC(num_steps)
    stark = FastStark(
        mimc.field,
        expansion_factor,
        num_colinearity_checks,
        security_level,
        mimc.m,
        num_steps + 1,
        transition_constraints_degree=3,
    )
    return mimc, stark


def prove_chain(mimc: MiMC, stark: FastStark, input_element: FieldElement, tz=None):
    """End-to-end: compute the chain on device, prove it.  Returns
    (output_element, proof, transition_zerofier)."""
    from ..utils.convert import ints_from_device

    if tz is None:
        tz = stark.preprocess()
    with stark.timer.phase("trace_gen"):
        cols = mimc.trace_columns(input_element.value)
        # the output fetch forces the sequential chain to completion, so
        # the phase records the real trace-generation cost
        output_value = ints_from_device(cols[0, :, -1:])[0]
    output_element = FieldElement(output_value, mimc.field)
    proof = stark.prove(
        None,
        mimc.transition_constraints(),
        mimc.boundary_constraints(input_element, output_element),
        tz,
        air_evaluator=mimc.air_evaluator(),
        trace_columns=cols,
    )
    return output_element, proof, tz


def verify_chain(
    mimc: MiMC,
    stark: FastStark,
    input_element: FieldElement,
    output_element: FieldElement,
    proof: bytes,
    tz_root: bytes,
) -> bool:
    return stark.verify(
        proof,
        mimc.transition_constraints(),
        mimc.boundary_constraints(input_element, output_element),
        tz_root,
        air_point_evaluator=mimc.point_air(),
        air_index_evaluator=mimc.index_air(),
    )


@jax.jit
def _unpack_columns(words: jnp.ndarray) -> jnp.ndarray:
    """(4, n) packed u32 -> (1, NLIMBS, n) 16-bit limb rows."""
    rows = []
    for k in range(4):
        rows.append(words[k] & jnp.uint32(0xFFFF))
        rows.append(words[k] >> jnp.uint32(16))
    return jnp.stack(rows)[None]
