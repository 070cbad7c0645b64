"""RPSSS end-to-end signature tests (parity with reference test_rpsss.py:
keygen/sign/verify + wrong-document rejection + signature-size report).

The fast scheme runs at the full production parameters (128-bit security,
64 colinearity checks, FRI domain 4096 — reference: rpsss.py:26-35).  The
slow scheme's full-parameter run takes minutes in any scalar
implementation (the reference reports 250 s sign / 444 s verify,
docs/rescue-prime.md:414-416), so it is exercised at the protocol level by
test_stark.py and only smoke-tested here under -m slow.
"""

import sys

import pytest

from stark_anatomy_tpu.models.rescue_prime import make_air_evaluator
from stark_anatomy_tpu.models.rpsss import RPSSS, FastRPSSS


def test_fast_rpsss_end_to_end():
    scheme = FastRPSSS()  # wires the pointwise device AIR evaluator itself

    sk, pk = scheme.keygen()
    doc = b"Hello world: TPU-native STARK signatures"
    sig = scheme.sign(sk, doc)
    print(f"signature size: {len(sig) / 1024:.1f} kB", file=sys.stderr)

    assert scheme.verify(pk, doc, sig)
    assert not scheme.verify(pk, b"forged document", sig)

    # a different key's pk must not verify
    _, pk2 = scheme.keygen()
    assert not scheme.verify(pk2, doc, sig)


@pytest.mark.slow
def test_slow_rpsss_end_to_end():
    scheme = RPSSS()
    sk, pk = scheme.keygen()
    doc = b"slow path"
    sig = scheme.sign(sk, doc)
    assert scheme.verify(pk, doc, sig)
    assert not scheme.verify(pk, b"other", sig)
