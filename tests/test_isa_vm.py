"""ISA (parser, program, encoding) and VM interpreter tests."""

import pytest

from triton_vm_tpu.fields.bfe import P
from triton_vm_tpu.isa.instruction import Instruction, instruction_from_opcode
from triton_vm_tpu.isa.program import Program
from triton_vm_tpu.models import example_programs as ex
from triton_vm_tpu.vm.machine import (
    VM, NonDeterminism, PublicInput, VMError, VMState)


def _fib(n):
    a, b = 0, 1
    for _ in range(n):
        a, b = b, (a + b) % P
    return a


def test_opcodes_and_encoding():
    assert Instruction("halt").opcode == 0
    assert Instruction("push", 42).to_bwords() == [1, 42]
    assert Instruction("swap", 5).size() == 2
    assert Instruction("hash").size() == 1
    assert instruction_from_opcode(50).name == "mul"
    assert Instruction("merkle_step").is_u32_instruction()
    # ib bits reconstruct the opcode
    ins = Instruction("xx_mul")
    assert sum(ins.ib(b) << b for b in range(7)) == ins.opcode


def test_program_roundtrip_and_hash():
    prog = ex.fibonacci()
    words = prog.to_bwords()
    assert prog.len_bwords() == len(words)
    digest = prog.hash()
    assert len(digest) == 5
    # different program, different digest
    assert digest != ex.factorial().hash()


def test_parser_errors():
    with pytest.raises(Exception):
        Program.from_code("frobnicate")
    with pytest.raises(Exception):
        Program.from_code("push")  # missing arg
    with pytest.raises(Exception):
        Program.from_code("call undefined_label halt")


@pytest.mark.parametrize("n", [0, 1, 7, 30])
def test_fibonacci(n):
    # the reference program starts from (0, 1), so it emits F(n+1)
    out = VM.run(ex.fibonacci(), PublicInput([n]))
    assert out == [_fib(n + 1)]


def test_factorial():
    out = VM.run(ex.factorial(), PublicInput([6]))
    assert out == [720]


def test_u32_and_xfe_ops():
    prog = Program.from_code("""
        push 12 push 10 lt      // 10 < 12 -> 1
        write_io 1
        push 12 push 10 and write_io 1
        push 12 push 10 xor write_io 1
        push 64 log_2_floor write_io 1
        push 3 push 2 pow write_io 1   // 2^3 = 8
        push 7 push 17 div_mod write_io 2  // 17 = 2*7+3 -> q=2 r=3
        push 255 pop_count write_io 1
        push 5 push 0 push 0 push 3 push 0 push 0 xx_mul
        write_io 3
        halt
    """)
    out = VM.run(prog)
    # xfe part: (3x^2)*(5x^2) = 15x^4 = -15x + 15x^2
    assert out == [1, 8, 6, 6, 8, 3, 2, 8, 0, P - 15, 15]


def test_ram_and_sponge():
    prog = Program.from_code("""
        push 42 push 100 write_mem 1 pop 1   // ram[100] = 42
        push 100 read_mem 1 pop 1 write_io 1
        sponge_init
        push 0 push 0 push 0 push 0 push 0
        push 0 push 0 push 0 push 0 push 10
        sponge_absorb
        sponge_squeeze
        write_io 5
        pop 5
        halt
    """)
    out = VM.run(prog)
    assert out[0] == 42
    from triton_vm_tpu.crypto import tip5
    sponge = tip5.Tip5Sponge()
    sponge.absorb([10, 0, 0, 0, 0, 0, 0, 0, 0, 0])
    assert out[1:6] == sponge.squeeze()[:5]


def test_hash_instruction_matches_tip5():
    prog = Program.from_code("""
        push 9 push 8 push 7 push 6 push 5
        push 4 push 3 push 2 push 1 push 0
        hash
        write_io 5
        halt
    """)
    out = VM.run(prog)
    from triton_vm_tpu.crypto import tip5
    assert out == tip5.hash_10(list(range(10)))


def test_merkle_verify_program(rng):
    import numpy as np
    from triton_vm_tpu.crypto import merkle, tip5

    height = 3
    n = 1 << height
    leaves = rng.integers(0, P, size=(n, 5), dtype=np.uint64)
    tree = merkle.MerkleTree(leaves)
    leaf_index = 5
    # auth path: sibling digests from leaf to root
    path = []
    node = leaf_index + n
    while node > 1:
        path.append(tree.node(node ^ 1))
        node //= 2
    # digests are read via read_io 5, so they go in reversed word order
    inputs = ([height, leaf_index] + list(reversed(tree.leaf(leaf_index)))
              + list(reversed(tree.root())))
    nd = NonDeterminism().with_digests(path)
    out = VM.run(ex.merkle_verify(), PublicInput(inputs), nd)
    assert out == []
    # wrong root -> assertion failure
    bad = list(inputs)
    bad[-1] = (bad[-1] + 1) % P
    with pytest.raises(VMError):
        VM.run(ex.merkle_verify(), PublicInput(bad), nd)


def test_trace_execution_shapes():
    aet, out = VM.trace_execution(ex.fibonacci(), PublicInput([10]))
    assert out == [_fib(11)]
    assert len(aet.processor_rows) > 10
    # jump stack table height equals processor height
    assert aet.height_of_table("jump_stack") == len(aet.processor_rows)
    # last recorded row is the halt instruction
    assert aet.processor_rows[-1][3] == Instruction("halt").opcode
    assert aet.padded_height() >= aet.height()
    ph = aet.padded_height()
    assert ph & (ph - 1) == 0
    # lookup table multiplicities recorded (program hashing alone hashes)
    assert sum(aet.lookup_multiplicities) > 0


def test_hash_chain_program():
    aet, out = VM.trace_execution(ex.hash_chain(), PublicInput([4]))
    assert out == []
    # 4 hash instructions -> 24 hash-trace rows
    assert len(aet.hash_rows) == 4 * 6


def test_assertion_error_reports_state():
    prog = Program.from_code("push 0 assert halt")
    with pytest.raises(VMError):
        VM.run(prog)


def test_vm_profile_spans_and_heights():
    """VM.profile mirrors vm.rs:208-242: spans per `call`, heights add up."""
    from triton_vm_tpu import VM, PublicInput
    from triton_vm_tpu.models import example_programs as ex

    out, prof = VM.profile(ex.fibonacci(), PublicInput([10]))
    assert list(out) == [89]
    assert prof.padded_height == 512
    labels = [line.label for line in prof.profile]
    assert "fib_loop" in labels
    line = prof.profile[labels.index("fib_loop")]
    contrib = line.table_height_contributions
    assert contrib.processor > 0
    assert prof.total.processor >= contrib.processor
    report = str(prof)
    assert "fib_loop" in report and "padded height: 512" in report
