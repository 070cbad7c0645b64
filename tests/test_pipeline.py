"""Pipelined prover: correctness of the overlapped trace-gen/prove stream
(parallel/pipeline_prover.py).  Throughput itself is measured by bench.py
on the real chip; here we check the pipeline produces valid,
independently-verifiable proofs and the right outputs."""

import random

from stark_anatomy_tpu.field.scalar import Field, FieldElement, P
from stark_anatomy_tpu.models.mimc import make_stark, verify_chain
from stark_anatomy_tpu.parallel.pipeline_prover import PipelinedMiMCProver

RNG = random.Random(1234)


def test_pipelined_proofs_verify():
    mimc, stark = make_stark(15, 4, 4, 8)
    tz = stark.preprocess()
    prover = PipelinedMiMCProver(mimc, stark, tz)
    field = Field.main()
    inputs = [FieldElement(RNG.randrange(P), field) for _ in range(3)]
    results = prover.prove_many(inputs)
    assert len(results) == 3
    for x, (out, proof) in zip(inputs, results):
        assert out == mimc.forward(x), "pipelined output mismatch"
        assert verify_chain(mimc, stark, x, out, proof, tz.root)


def test_trace_columns_with_output_matches_forward():
    mimc, _ = make_stark(31, 4, 4, 8)
    field = Field.main()
    x = FieldElement(RNG.randrange(P), field)
    cols, out = mimc.trace_columns_with_output(x.value)
    assert cols.shape[-1] == 32
    assert out == mimc.forward(x).value
    # and the column values agree with the scalar trace oracle
    from stark_anatomy_tpu.utils.convert import ints_from_device

    vals = ints_from_device(cols[0])
    trace = mimc.trace(x)
    assert vals == [row[0].value for row in trace]
