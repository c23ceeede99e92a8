"""The complete AIR must vanish on real, honestly-generated master tables.

This is the deepest integration test in the suite: it exercises the VM, the
AET, all 9 tables' fill/pad, the degree-lowering derived columns, the
challenge derivation, the aux-column extension, and the constraint
evaluator against each other.
"""

import numpy as np
import pytest

from triton_vm_tpu.air import circuit as C
from triton_vm_tpu.air.challenges import Challenges
from triton_vm_tpu.air.evaluate import eval_host, linearize
from triton_vm_tpu.air.master import master_air
from triton_vm_tpu.crypto import tip5
from triton_vm_tpu.fields import xfe
from triton_vm_tpu.models import example_programs as ex
from triton_vm_tpu.tables import master as mt
from triton_vm_tpu.vm.machine import VM, NonDeterminism, PublicInput


class FakeClaim:
    def __init__(self, program, inputs, outputs):
        self.program_digest = program.hash()
        self.input = list(inputs)
        self.output = list(outputs)


def build_tables(program, public_input=None, nd=None):
    aet, output = VM.trace_execution(program, public_input, nd)
    main = mt.fill_main_table(aet)
    mt.fill_derived_main_columns(main)

    claim = FakeClaim(program, public_input.individual_tokens if public_input
                      else [], output)
    sponge = tip5.Tip5Sponge()
    sponge.pad_and_absorb_all([42, 43, 44])
    challenges = Challenges(sponge.sample_scalars(59), claim)

    aux = mt.extend(main, challenges)
    mt.fill_derived_aux_columns(main, aux, challenges.challenges)
    return main, aux, challenges


def _rows(main, aux, i):
    main_row = [int(v) for v in main[i]]
    aux_row = [tuple(int(c) for c in v) for v in aux[i]]
    return main_row, aux_row


def check_all_constraints(main, aux, challenges):
    air = master_air()
    ch = challenges.challenges
    h = main.shape[0]
    failures = []

    for phase, row_sel in (("init", [0]), ("term", [h - 1])):
        steps, out_ids = linearize(air.constraints[phase])
        for i in row_sel:
            main_row, aux_row = _rows(main, aux, i)
            results = eval_host(steps, out_ids, main_row, aux_row, ch)
            for k, r in enumerate(results):
                if r != xfe.ZERO:
                    failures.append((phase, k, i, r))

    steps, out_ids = linearize(air.constraints["cons"])
    for i in range(h):
        main_row, aux_row = _rows(main, aux, i)
        results = eval_host(steps, out_ids, main_row, aux_row, ch)
        for k, r in enumerate(results):
            if r != xfe.ZERO:
                failures.append(("cons", k, i, r))

    steps, out_ids = linearize(air.constraints["tran"])
    for i in range(h - 1):
        main_row, aux_row = _rows(main, aux, i)
        next_main_row, next_aux_row = _rows(main, aux, i + 1)
        results = eval_host(steps, out_ids, main_row, aux_row, ch,
                            next_main_row, next_aux_row)
        for k, r in enumerate(results):
            if r != xfe.ZERO:
                failures.append(("tran", k, i, r))
    return failures


@pytest.mark.slow
def test_air_vanishes_on_fibonacci_trace():
    main, aux, challenges = build_tables(ex.fibonacci(), PublicInput([7]))
    failures = check_all_constraints(main, aux, challenges)
    assert not failures, f"{len(failures)} violations, first 10: {failures[:10]}"


@pytest.mark.slow
def test_air_vanishes_on_full_isa_workout():
    """Program touching RAM, hash, sponge, u32 and xfe instructions."""
    from triton_vm_tpu.isa.program import Program

    program = Program.from_code("""
        push 42 push 100 write_mem 1 pop 1
        push 100 read_mem 1 pop 2
        sponge_init
        push 0 push 0 push 0 push 0 push 0
        push 0 push 0 push 0 push 0 push 10
        sponge_absorb
        sponge_squeeze
        pop 5 pop 5
        push 9 push 8 push 7 push 6 push 5
        push 4 push 3 push 2 push 1 push 0
        hash
        pop 5
        push 12 push 10 lt pop 1
        push 12 push 10 and pop 1
        push 12 push 10 xor pop 1
        push 64 log_2_floor pop 1
        push 3 push 2 pow pop 1
        push 7 push 17 div_mod pop 2
        push 255 pop_count pop 1
        push 500 split pop 2
        push 5 push 0 push 0 push 3 push 0 push 0 xx_mul pop 3
        push 1 push 2 push 3 x_invert pop 3
        push 7 push 1 push 2 push 3 xb_mul pop 3
        push 2 push 3 add pop 1
        push 2 push 3 mul pop 1
        push 5 invert pop 1
        push 5 push 5 eq assert
        nop
        halt
    """)
    main, aux, challenges = build_tables(program)
    failures = check_all_constraints(main, aux, challenges)
    assert not failures, f"{len(failures)} violations, first 10: {failures[:10]}"
