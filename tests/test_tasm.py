"""TASM constraint-evaluator backend: the generated Triton assembly,
executed in our own VM, must reproduce the tape evaluator's 604
constraint values exactly (mirrors the reference's constraints.rs
`conventional_and_tasm_constraint_evaluators_agree` tests)."""

import numpy as np
import pytest

from triton_vm_tpu.air import evaluate as ev
from triton_vm_tpu.air import tasm
from triton_vm_tpu.air.master import master_air
from triton_vm_tpu.fields.bfe import P
from triton_vm_tpu.isa.program import Program
from triton_vm_tpu.utils.stdrng import ChaCha12Rng, seed_from_u64
from triton_vm_tpu.vm.machine import NonDeterminism, PublicInput, VMState

NM, NA, NCH = 379, 91, 63


def _random_inputs():
    rng = ChaCha12Rng(seed_from_u64(0xC0FFEE))
    return (rng.random_xfes(NM), rng.random_xfes(NA),
            rng.random_xfes(NM), rng.random_xfes(NA),
            rng.random_xfes(NCH))


def _expected_values(curr_main, curr_aux, next_main, next_aux, challenges):
    air = master_air()
    out = []
    for key in ("init", "cons", "tran", "term"):
        steps, out_ids = ev.linearize(air.constraints[key])
        out.extend(ev.eval_host(
            steps, out_ids, curr_main, curr_aux, challenges,
            next_main_row=next_main if key == "tran" else None,
            next_aux_row=next_aux if key == "tran" else None))
    return out


def _ram_from_xfes(base, xfes):
    ram = {}
    for i, x in enumerate(xfes):
        for c in range(3):
            ram[(base + 3 * i + c) % P] = x[c]
    return ram


def _run_straight_line(code_lines, ram, stack_pushes=()):
    source = "\n".join(
        [f"push {v}" for v in stack_pushes] + list(code_lines) + ["halt"])
    program = Program.from_code(source)
    state = VMState(program, PublicInput([]), NonDeterminism(ram=ram))
    while not state.halting:
        state.step()
    return state


def _read_output(state, out_ptr, n):
    vals = []
    for i in range(n):
        vals.append(tuple(state.ram.get((out_ptr + 3 * i + c) % P, 0)
                          for c in range(3)))
    return vals


CURR_MAIN = 1 << 40
CURR_AUX = CURR_MAIN + 3 * NM + 10
NEXT_MAIN = CURR_AUX + 3 * NA + 10
NEXT_AUX = NEXT_MAIN + 3 * NM + 10
CHALLENGES = NEXT_AUX + 3 * NA + 10
FREE_PAGE = 1 << 44


def _ram_for_rows(cm, ca, nm_row, na_row, ch):
    ram = {}
    ram.update(_ram_from_xfes(CURR_MAIN, cm))
    ram.update(_ram_from_xfes(CURR_AUX, ca))
    ram.update(_ram_from_xfes(NEXT_MAIN, nm_row))
    ram.update(_ram_from_xfes(NEXT_AUX, na_row))
    ram.update(_ram_from_xfes(CHALLENGES, ch))
    return ram


def test_memory_layout_integrity():
    layout = tasm.StaticTasmConstraintEvaluationMemoryLayout(
        free_mem_page_ptr=FREE_PAGE, curr_main_row_ptr=CURR_MAIN,
        curr_aux_row_ptr=CURR_AUX, next_main_row_ptr=NEXT_MAIN,
        next_aux_row_ptr=NEXT_AUX, challenges_ptr=CHALLENGES)
    assert layout.is_integral()
    overlapping = tasm.StaticTasmConstraintEvaluationMemoryLayout(
        free_mem_page_ptr=FREE_PAGE, curr_main_row_ptr=CURR_MAIN,
        curr_aux_row_ptr=CURR_MAIN + 1, next_main_row_ptr=NEXT_MAIN,
        next_aux_row_ptr=NEXT_AUX, challenges_ptr=CHALLENGES)
    assert not overlapping.is_integral()


@pytest.mark.slow
def test_static_tasm_evaluator_matches_tape_evaluator():
    cm, ca, nm_row, na_row, ch = _random_inputs()
    layout = tasm.StaticTasmConstraintEvaluationMemoryLayout(
        free_mem_page_ptr=FREE_PAGE, curr_main_row_ptr=CURR_MAIN,
        curr_aux_row_ptr=CURR_AUX, next_main_row_ptr=NEXT_MAIN,
        next_aux_row_ptr=NEXT_AUX, challenges_ptr=CHALLENGES)
    code = tasm.static_air_constraint_evaluation_tasm(layout)
    state = _run_straight_line(code, _ram_for_rows(cm, ca, nm_row,
                                                   na_row, ch))
    out_ptr = state.op_stack[0]
    assert out_ptr == (FREE_PAGE
                       + tasm.OUT_ARRAY_OFFSET * tasm.EXTENSION_DEGREE) % P
    expected = _expected_values(cm, ca, nm_row, na_row, ch)
    got = _read_output(state, out_ptr, len(expected))
    assert got == [tuple(x) for x in expected]


@pytest.mark.slow
def test_dynamic_tasm_evaluator_matches_tape_evaluator():
    cm, ca, nm_row, na_row, ch = _random_inputs()
    layout = tasm.DynamicTasmConstraintEvaluationMemoryLayout(
        free_mem_page_ptr=FREE_PAGE, challenges_ptr=CHALLENGES)
    code = tasm.dynamic_air_constraint_evaluation_tasm(layout)
    # BEFORE: _ *curr_main *curr_aux *next_main *next_aux (top)
    state = _run_straight_line(
        code, _ram_for_rows(cm, ca, nm_row, na_row, ch),
        stack_pushes=[CURR_MAIN, CURR_AUX, NEXT_MAIN, NEXT_AUX])
    out_ptr = state.op_stack[0]
    expected = _expected_values(cm, ca, nm_row, na_row, ch)
    got = _read_output(state, out_ptr, len(expected))
    assert got == [tuple(x) for x in expected]
