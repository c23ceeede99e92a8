"""Native VM witness core (native/vm_core.cpp) vs the Python
interpreter: bit-identical AET contents on programs covering every
instruction, nondeterminism, RAM, hashing, sponge, and u32 activity."""

import numpy as np
import pytest

from triton_vm_tpu.models import example_programs as ex
from triton_vm_tpu.vm import native
from triton_vm_tpu.vm.aet import AlgebraicExecutionTrace
from triton_vm_tpu.vm.machine import VM, NonDeterminism, PublicInput

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def _python_trace(program, public_input, non_determinism):
    state_aet = AlgebraicExecutionTrace(program)
    from triton_vm_tpu.vm.machine import VMState

    state = VMState(program, public_input, non_determinism)
    while not state.halting:
        state_aet.record_state(state)
        for call in state.step():
            state_aet.record_co_processor_call(call)
    return state_aet, state.public_output


def _assert_aets_equal(py_aet, nat_aet):
    assert list(py_aet.instruction_multiplicities) == \
        list(nat_aet.instruction_multiplicities)
    assert np.array_equal(np.array(py_aet.processor_rows, np.uint64),
                          np.asarray(nat_aet.processor_rows))
    assert [tuple(int(v) for v in r) for r in py_aet.op_stack_rows] == \
        list(nat_aet.op_stack_rows)
    assert [tuple(int(v) for v in r) for r in py_aet.ram_rows] == \
        list(nat_aet.ram_rows)
    for name in ("program_hash_rows", "hash_rows", "sponge_rows"):
        py_rows = np.array(getattr(py_aet, name), np.uint64).reshape(-1, 67)
        assert np.array_equal(py_rows, np.asarray(getattr(nat_aet, name))), \
            name
    assert py_aet.u32_entries == nat_aet.u32_entries
    assert py_aet.cascade_multiplicities == nat_aet.cascade_multiplicities
    # insertion ORDER of both dicts must match too (fill iterates dicts)
    assert list(py_aet.u32_entries) == list(nat_aet.u32_entries)
    assert list(py_aet.cascade_multiplicities) == \
        list(nat_aet.cascade_multiplicities)
    assert list(py_aet.lookup_multiplicities) == \
        list(nat_aet.lookup_multiplicities)
    assert py_aet.padded_height() == nat_aet.padded_height()


def _roundtrip(program, public_input=None, non_determinism=None):
    public_input = public_input or PublicInput()
    non_determinism = non_determinism or NonDeterminism()
    py_aet, py_out = _python_trace(program, public_input, non_determinism)
    result = native.trace_execution_native(program, public_input,
                                           non_determinism)
    assert result is not None
    nat_aet, nat_out = result
    assert list(py_out) == list(nat_out)
    _assert_aets_equal(py_aet, nat_aet)


def test_native_matches_python_fibonacci():
    _roundtrip(ex.fibonacci(), PublicInput([30]))


def test_native_matches_python_every_instruction():
    from tests.test_golden_reference import every_instruction_testable_program

    program, public_input, non_determinism = \
        every_instruction_testable_program()
    _roundtrip(program, public_input, non_determinism)


def test_native_matches_python_hash_chain():
    _roundtrip(ex.hash_chain(), PublicInput([50]))


def test_native_matches_python_merkle_auth():
    import tests  # noqa: F401
    from triton_vm_tpu.crypto import tip5
    from triton_vm_tpu.fields.bfe import P

    rng = np.random.default_rng(3)
    height = 5
    leaves = [tuple(int(x) for x in rng.integers(0, P, size=5,
                                                 dtype=np.uint64))
              for _ in range(1 << height)]
    layers = [leaves]
    while len(layers[-1]) > 1:
        prev = layers[-1]
        layers.append([tuple(tip5.hash_pair(prev[2 * i], prev[2 * i + 1]))
                       for i in range(len(prev) // 2)])
    root = layers[-1][0]
    leaf_index = 3
    digests = []
    idx = leaf_index
    for layer in layers[:-1]:
        digests.append(layer[idx ^ 1])
        idx //= 2
    inputs = ([height, leaf_index]
              + list(reversed(leaves[leaf_index])) + list(reversed(root)))
    _roundtrip(ex.merkle_verify(), PublicInput(inputs),
               NonDeterminism(digests=digests))


def test_native_error_falls_back_to_python():
    """A failing program must raise the precise typed error (the wrapper
    re-runs the Python interpreter on native failure)."""
    from triton_vm_tpu import triton_program
    from triton_vm_tpu.vm.machine import VMError

    program = triton_program("push 0 assert halt")
    with pytest.raises(VMError):
        VM.trace_execution(program, PublicInput([]), NonDeterminism())


def test_native_wired_into_vm_trace_execution():
    """VM.trace_execution (the production entry) uses the native core and
    produces the same outputs as the pure-Python path."""
    import os

    program = ex.fibonacci()
    aet_n, out_n = VM.trace_execution(program, PublicInput([25]))
    os.environ["TVM_NATIVE_VM"] = "0"
    try:
        aet_p, out_p = VM.trace_execution(program, PublicInput([25]))
    finally:
        del os.environ["TVM_NATIVE_VM"]
    assert list(out_n) == list(out_p)
    _assert_aets_equal(aet_p, aet_n)
