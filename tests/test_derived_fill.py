"""Degree-lowering derived-column fill: device tape (inlined
substitution chains, extend_device.fill_derived_*_device) vs the exact
host fill, and the reference's tran-phase last-row-zero semantics
(substitutions.rs:266-301)."""

import numpy as np

from triton_vm_tpu.air.challenges import SAMPLE_COUNT, Challenges
from triton_vm_tpu.fields.bfe import P
from triton_vm_tpu.stark.proof_stream import Claim
from triton_vm_tpu.tables import extend_device, master as mt
from triton_vm_tpu.vm.machine import VM, NonDeterminism, PublicInput

def test_derived_fill_device_matches_host_every_instruction():
    """Device tape derived-column fill (inlined substitution chains) vs
    the exact host fill, main + aux, on the every-instruction trace."""
    from tests.test_golden_reference import every_instruction_testable_program

    rng = np.random.default_rng(29)
    program, public_input, non_determinism = \
        every_instruction_testable_program()
    aet, output = VM.trace_execution(program, public_input, non_determinism)
    claim = (Claim.about_program(program)
             .with_input(list(public_input.individual_tokens))
             .with_output(output))
    h = aet.padded_height()
    main = mt.fill_main_table(aet, padded_height=h)

    main_host = main.copy()
    mt.fill_derived_main_columns(main_host)
    main_dev = main.copy()
    extend_device.fill_derived_main_device(main_dev)
    assert np.array_equal(main_host, main_dev)

    challenges = Challenges(
        [tuple(int(c) for c in row) for row in
         rng.integers(0, P, size=(SAMPLE_COUNT, 3), dtype=np.uint64)],
        claim)
    aux = mt.extend(main_host, challenges)
    aux_host = aux.copy()
    mt.fill_derived_aux_columns(main_host, aux_host, challenges.challenges)
    aux_dev = aux.copy()
    extend_device.fill_derived_aux_device(main_host, aux_dev,
                                          challenges.challenges)
    assert np.array_equal(aux_host, aux_dev)


def test_tran_derived_columns_zero_in_last_row():
    """ALL tran-phase derived columns leave the last row zero, even when
    their RHS has no next-row reads (substitutions.rs:266-301 slices
    s![0..num_rows-1] unconditionally)."""
    from triton_vm_tpu.air.master import master_air
    from triton_vm_tpu.models.example_programs import fibonacci

    air = master_air()
    aet, _ = VM.trace_execution(fibonacci(), PublicInput([10]),
                                NonDeterminism())
    main = mt.fill_main_table(aet)
    mt.fill_derived_main_columns(main)
    from triton_vm_tpu.air.evaluate import substitution_pairs
    tran_cols = [col for _, col, _ in substitution_pairs(air.main_subs["tran"])]
    assert len(tran_cols) == 210
    assert not main[-1, tran_cols].any()
