"""Device aux extension (P10 scans) vs the host reference, bit-for-bit,
on a real trace covering program/cascade/lookup/u32 activity.

These tests exercise the compiled 3-phase extension pipeline, which is
only dispatched on accelerator backends (XLA:CPU's fusion passes are
pathologically slow on the factor graphs — see extend_device.py). They
are skipped on the CPU test mesh and run against the real TPU chip via
scripts/tpu_checks.py."""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="device extension pipeline targets accelerator backends")

from triton_vm_tpu.air.challenges import SAMPLE_COUNT, Challenges
from triton_vm_tpu.air import columns
from triton_vm_tpu.fields.bfe import P
from triton_vm_tpu.models import example_programs as ex
from triton_vm_tpu.stark.proof_stream import Claim
from triton_vm_tpu.tables import extend_device, master as mt
from triton_vm_tpu.vm.machine import VM, NonDeterminism, PublicInput

A = columns.aux_index


def test_device_extend_matches_host():
    rng = np.random.default_rng(17)
    program = ex.u32_mix()  # exercises u32 + hash/cascade/lookup tables
    aet, output = VM.trace_execution(program, PublicInput([50]))
    claim = (Claim.about_program(program)
             .with_input([50]).with_output(output))
    h = aet.padded_height()
    main = mt.fill_main_table(aet, padded_height=h)
    challenges = Challenges(
        [tuple(int(c) for c in row) for row in
         rng.integers(0, P, size=(SAMPLE_COUNT, 3), dtype=np.uint64)],
        claim)

    want = mt.extend_host(main, challenges)
    got = want.copy()
    cols = [
        ("program", "InstructionLookupServerLogDerivative"),
        ("program", "PrepareChunkRunningEvaluation"),
        ("program", "SendChunkRunningEvaluation"),
        ("cascade", "HashTableServerLogDerivative"),
        ("cascade", "LookupTableClientLogDerivative"),
        ("lookup", "CascadeTableServerLogDerivative"),
        ("lookup", "PublicEvaluationArgument"),
        ("u32", "LookupServerLogDerivative"),
    ]
    for table, name in cols:
        got[:, A(table, name), :] = 0  # make sure the device fns fill them

    extend_device.extend_program_device(main, got, challenges, h)
    extend_device.extend_cascade_device(main, got, challenges, h)
    extend_device.extend_lookup_device(main, got, challenges, h)
    extend_device.extend_u32_device(main, got, challenges, h)

    for table, name in cols:
        idx = A(table, name)
        assert np.array_equal(want[:, idx, :], got[:, idx, :]), \
            f"{table}.{name} mismatch"
    # untouched columns must be untouched
    assert np.array_equal(np.delete(want, [A(t, n) for t, n in cols], 1),
                          np.delete(got, [A(t, n) for t, n in cols], 1))


def test_extend_all_device_matches_host_every_instruction():
    """Full 49-column device extension vs host, on the every-instruction
    trace (all processor/op-stack/ram/jump-stack/hash activity)."""
    from tests.test_golden_reference import every_instruction_testable_program

    rng = np.random.default_rng(23)
    program, public_input, non_determinism = \
        every_instruction_testable_program()
    aet, output = VM.trace_execution(program, public_input, non_determinism)
    claim = (Claim.about_program(program)
             .with_input(list(public_input.individual_tokens))
             .with_output(output))
    h = aet.padded_height()
    main = mt.fill_main_table(aet, padded_height=h)
    challenges = Challenges(
        [tuple(int(c) for c in row) for row in
         rng.integers(0, P, size=(SAMPLE_COUNT, 3), dtype=np.uint64)],
        claim)

    want = mt.extend_host(main, challenges)
    got = extend_device.extend_all_device(main, challenges)
    for table in ("program", "processor", "op_stack", "ram", "jump_stack",
                  "hash", "cascade", "lookup", "u32"):
        for name in columns.AUX_COLUMNS[table]:
            idx = A(table, name)
            assert np.array_equal(want[:, idx, :], got[:, idx, :]), \
                f"{table}.{name} mismatch"

