"""Benchmark / example workloads (the framework's "model zoo").

Functional equivalents of the reference's example programs
(/root/reference/triton-vm/examples/factorial.rs,
/root/reference/triton-dev-util/src/example_programs.rs): the assembly is a
protocol-level test fixture, exercising the processor, hash, u32 and RAM
tables in the same proportions as the reference benchmarks (BASELINE.md
configs).
"""

from __future__ import annotations

from ..isa.program import Program

FIBONACCI = """
    push 0
    push 1
    read_io 1
    dup 0
    skiz
    call fib_loop
    pop 1
    write_io 1
    halt

    fib_loop:
        push -1
        add
        swap 2
        dup 1
        add
        swap 1
        swap 2
        dup 0
        skiz
        recurse
        return
"""

FACTORIAL = """
    read_io 1
    push 1
    call factorial
    write_io 1
    halt

    factorial:
        dup 1
        push 0 eq
        skiz
            return
        dup 1
        mul
        swap 1
        push -1 add
        swap 1
        recurse
"""

# Tip5-heavy: hash a chain of n digests (hash-table dominated trace).
HASH_CHAIN = """
    read_io 1
    push 0 push 0 push 0 push 0 push 0
    push 0 push 0 push 0 push 0 push 0
    call chain
    pop 5 pop 5
    pop 1
    halt

    chain:
        pick 10
        dup 0
        push 0 eq
        skiz
            return
        addi -1
        place 10
        hash
        push 0 push 0 push 0 push 0 push 0
        recurse
"""

# Merkle authentication-path verification via divine + merkle_step.
# input: [height, leaf_index, leaf digest reversed (d4..d0), root reversed];
# sibling digests are divined. Walks from the leaf to the root and asserts
# equality with the given root.
MERKLE_VERIFY = """
    read_io 1               // height
    push 2 pow              // num_leaves = 2^height
    read_io 1               // num_leaves, index
    add                     // node_index
    read_io 5               // node_index at ST5, leaf digest at ST0..4
    call walk_up
    read_io 5               // expected root at ST0..4, candidate at ST5..9
    assert_vector
    pop 5
    pop 1
    halt

    walk_up:
        dup 5 push 1 eq skiz return
        merkle_step
        recurse
"""

# u32-table heavy loop: repeated split/and/lt/pow on a counter.
U32_MIX = """
    read_io 1
    call loop
    pop 1
    halt

    loop:
        dup 0 push 0 eq skiz return
        addi -1
        dup 0 push 7 and pop 1
        dup 0 push 3 lt pop 1
        dup 0 split add pop 1
        recurse
"""


def fibonacci() -> Program:
    return Program.from_code(FIBONACCI)


def factorial() -> Program:
    return Program.from_code(FACTORIAL)


def hash_chain() -> Program:
    return Program.from_code(HASH_CHAIN)


def merkle_verify() -> Program:
    return Program.from_code(MERKLE_VERIFY)


def u32_mix() -> Program:
    return Program.from_code(U32_MIX)


def spin(target_log2_padded_height: int) -> tuple[Program, int]:
    """Workload generator: a program whose padded height is (roughly) the
    requested power of two (like ProgramToBench::spin,
    /root/reference/triton-dev-util/src/lib.rs:52-60). Returns the program
    and the loop-count input to feed as public input."""
    # each fib_loop iteration is 11 processor rows; overhead ~15 rows
    iterations = max(1, ((1 << target_log2_padded_height) - 16) // 11)
    return fibonacci(), iterations
