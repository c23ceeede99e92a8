"""Typed error taxonomy: mirrors the reference's error tests
(/root/reference/triton-vm/src/error.rs:254-360)."""

import pytest

from triton_vm_tpu import errors as E
from triton_vm_tpu.isa.program import triton_program
from triton_vm_tpu.vm.machine import VM, VMError


def _run_expecting(program_text, source_type):
    with pytest.raises(VMError) as excinfo:
        VM.run(triton_program(program_text))
    err = excinfo.value
    assert isinstance(err.source, source_type), err.source
    return err


def test_instruction_pointer_overflow():
    _run_expecting("nop", E.InstructionPointerOverflow)


def test_shrink_op_stack_too_much():
    _run_expecting("pop 3 halt", E.OpStackTooShallow)


def test_return_without_call():
    _run_expecting("return halt", E.JumpStackIsEmpty)


def test_recurse_without_call():
    _run_expecting("recurse halt", E.JumpStackIsEmpty)


def test_assert_false():
    err = _run_expecting("push 0 assert halt", E.AssertionFailed)
    assert err.source.failure.expected == 1
    assert err.source.failure.actual == 0
    assert err.source.failure.id is None


def test_assert_false_with_assertion_context():
    err = _run_expecting("push 0 assert error_id 42 halt",
                         E.AssertionFailed)
    assert err.source.failure.id == 42


def test_vector_assertion_error():
    err = _run_expecting(
        """
        push 4 push 3 push 2 push  1 push 0
        push 4 push 3 push 2 push 10 push 0
        assert_vector halt
        """, E.VectorAssertionFailed)
    assert err.source.index == 1
    assert err.source.failure.expected == 10
    assert err.source.failure.actual == 1
    assert err.source.failure.id is None


@pytest.mark.parametrize("failure_index", range(5))
def test_assertion_error_id_propagation(failure_index):
    ones = [1] * 5
    ones[failure_index] = 0
    program = "\n".join(
        f"push {v} assert error_id {i}" for i, v in enumerate(ones))
    err = _run_expecting(program + "\nhalt", E.AssertionFailed)
    assert err.source.failure.id == failure_index


def test_inverse_of_zero():
    _run_expecting("push 0 invert halt", E.InverseOfZero)


def test_division_by_zero():
    _run_expecting("push 0 push 5 div_mod halt", E.DivisionByZero)


def test_log2_of_zero():
    _run_expecting("push 0 log_2_floor halt", E.LogarithmOfZero)


def test_sponge_not_initialized():
    _run_expecting("sponge_squeeze halt", E.SpongeNotInitialized)


def test_empty_public_input():
    _run_expecting("read_io 1 halt", E.EmptyPublicInput)


def test_empty_secret_input():
    _run_expecting("divine 1 halt", E.EmptySecretInput)


def test_machine_halted_error_state_carries_vm_state():
    err = _run_expecting("push 0 assert halt", E.AssertionFailed)
    assert err.state is not None
    assert err.state.op_stack[0] == 0
