"""Golden-value tests against the reference's in-source insta snapshots.

These are the primary bit-exactness oracles available without a Rust
toolchain (VERDICT.md item 1):

- program hash of ``program_executing_every_instruction``
  (reference stark.rs:4827-4840)
- full-proof Tip5 digest for a tiny program under a pinned prover seed
  (reference proof.rs:200-225)
- full-proof Tip5 digest for the every-instruction program
  (reference stark.rs:2434-2460)
"""

import pytest

from triton_vm_tpu.crypto import tip5
from triton_vm_tpu.isa.program import triton_program

M_STEP_MEM_ADDR = 100_000

EVERY_INSTRUCTION_PROGRAM = f"""
    push {M_STEP_MEM_ADDR}
    push 0
    push 5
    read_io 5
    merkle_step
    merkle_step_mem
    divine 5
    assert_vector
    pop 5
    assert
    pop 2

    push 1 push 2 push 3
    place 2
    pick 1
    swap 2
    dup 2 assert
    addi -2 assert
    addi -1 assert
    assert

    push 0 push 0 push 0
    push 0
    push 500
    push 0 push 0
    push 1 push 1 push 1
    b_horner_step
    x_horner_step
    pop 5
    write_io 5

    push 1 push 2 push 3
    push 7 push 8 push 9
    dup 3 dup 3 dup 3
    xx_add
    dup 4 dup 4 dup 4
    xx_mul
    x_invert
    push 42
    xb_mul

    add mul
    addi 0
    invert
    mul add
    eq
    pop 1

    push 38
    push 2
    pow
    push 1337
    add
    split
    dup 1 dup 1 lt pop 1
    dup 1 and
    dup 1 xor
    push 9
    log_2_floor pop 1
    div_mod
    pop_count
    pop 2

    sponge_init
    divine 5 divine 5
    sponge_absorb
    push 42
    sponge_absorb_mem
    pop 1
    sponge_squeeze
    hash
    pop 5

    push 300
    read_mem 5
    swap 6
    write_mem 5
    pop 1

    push 0 skiz nop
    push 1 skiz nop
    push 0 push 2
    push 0 push 0 push 0
    push 0 push 0
    call rec_or_ret
    pop 5 pop 2
    push 2
    call rec
    pop 1
    halt

    rec:
        dup 0 push 0 eq
        skiz return
        push -1 add
        recurse

    rec_or_ret:
        swap 5
        push -1 add
        swap 5
        recurse_or_return
"""


def every_instruction_testable_program():
    """TestableProgram fixture from reference stark.rs:4639-4784."""
    from triton_vm_tpu.vm.machine import NonDeterminism, PublicInput

    program = triton_program(EVERY_INSTRUCTION_PROGRAM)

    tree_node_5 = (5, 5, 5, 5, 5)
    tree_node_4 = (4, 4, 4, 4, 4)
    tree_node_3 = (3, 3, 3, 3, 3)
    tree_node_2 = tuple(tip5.hash_pair(tree_node_4, tree_node_5))
    tree_node_1 = tuple(tip5.hash_pair(tree_node_2, tree_node_3))

    public_input = list(tree_node_5)
    secret_input = list(reversed(tree_node_1)) + [1337] * 10
    ram = {l: r for l, r in zip(range(1_000), range(42, 42 + 1_000))}
    for address, digest_element in zip(
            range(M_STEP_MEM_ADDR, M_STEP_MEM_ADDR + 5), tree_node_3):
        ram[address] = digest_element
    non_determinism = NonDeterminism(
        individual_tokens=secret_input, digests=[tree_node_4], ram=ram)
    return program, PublicInput(public_input), non_determinism


def test_program_hash_every_instruction():
    """Golden digest from reference stark.rs:4827-4840."""
    program, _, _ = every_instruction_testable_program()
    assert program.hash() == (
        16104359835754349618,
        14381287807966156775,
        14760563195542097310,
        2080121037799184588,
        13105746022149139394,
    )


def test_every_instruction_program_runs():
    from triton_vm_tpu.vm.machine import VM

    program, public_input, non_determinism = \
        every_instruction_testable_program()
    aet, output = VM.trace_execution(program, public_input, non_determinism)
    assert len(output) == 5


def _proof_tip5_digest(proof):
    """Tip5::hash(&proof): hash_varlen of Proof's BFieldCodec encoding.

    Proof is a one-field tuple struct around Vec<BFieldElement>
    (proof.rs:38), so its encoding is the length-prepended, then
    count-prepended word stream."""
    words = proof.words
    return tuple(tip5.hash_varlen([len(words) + 1, len(words)] + words))


@pytest.mark.slow
@pytest.mark.xfail(
    strict=False,
    reason="full-proof transcript not yet bit-identical to the reference; "
           "divergence hunt tracked in AUDIT.md (scripts/digest_grid.py)")
def test_proof_digest_small_program():
    """Golden full-proof digest from reference proof.rs:200-225:
    `current_proof_version_is_still_current`."""
    from triton_vm_tpu.stark.proof_stream import Claim
    from triton_vm_tpu.stark.prover import Prover, Stark
    from triton_vm_tpu.utils.stdrng import std_rng_seed_from_u64
    from triton_vm_tpu.vm.machine import VM, PublicInput

    program = triton_program("""
        pick 11 pick 12 pick 13 pick 14 pick 15
        read_io 5 assert_vector halt
    """)
    claim = Claim.about_program(program).with_input(program.hash())
    aet, _ = VM.trace_execution(program, PublicInput(list(claim.input)))

    seed = std_rng_seed_from_u64(4742841043836029231)
    proof = Prover(Stark(), seed=seed).prove(claim, aet)

    assert _proof_tip5_digest(proof) == (
        2390426207231576512,
        11357322246033024133,
        15595568858844533957,
        10807389618517394866,
        11786266879565336160,
    )


@pytest.mark.slow
@pytest.mark.xfail(
    strict=False,
    reason="full-proof transcript not yet bit-identical to the reference; "
           "divergence hunt tracked in AUDIT.md (scripts/digest_grid.py)")
def test_proof_digest_every_instruction():
    """Golden full-proof digest from reference stark.rs:2434-2460:
    `supplying_prover_randomness_seed_fully_derandomizes_produced_proof`.
    Uses Stark::low_security() = Stark::new(32, 2)."""
    from triton_vm_tpu.stark.proof_stream import Claim
    from triton_vm_tpu.stark.prover import Prover, Stark
    from triton_vm_tpu.utils.stdrng import std_rng_seed_from_u64
    from triton_vm_tpu.vm.machine import VM

    program, public_input, non_determinism = \
        every_instruction_testable_program()
    claim = Claim.about_program(program).with_input(
        list(public_input.individual_tokens))
    aet, output = VM.trace_execution(program, public_input, non_determinism)
    claim = claim.with_output(list(output))

    seed = std_rng_seed_from_u64(3351975627407608972)
    proof = Prover(Stark(32, 2), seed=seed).prove(claim, aet)

    assert _proof_tip5_digest(proof) == (
        8369583593597337114,
        14430538234814724839,
        9910198730687648118,
        13547514320109628452,
        7746148481830452917,
    )


def test_air_constraint_evaluators_golden_vector():
    """Reference master_table.rs `air_constraints_evaluators_have_not_
    changed` (master_table.rs:2326-2415): pseudorandom rows/challenges
    from StdRng::seed_from_u64(3508729174085202315), all eight evaluator
    invocations concatenated as polynomial coefficients, evaluated at a
    pseudorandom XFE point.

    A match pins, simultaneously: StdRng (ChaCha12 + rand_core
    seed_from_u64), twenty-first's Canon BFE sampling
    (random_range(0..=P-1)) and XFE coefficient order, the complete
    production degree-lowering output (all 604 lowered constraints,
    including node-id tie-breaks), the evaluator constraint order
    (base-evaluating constraints before extension-evaluating ones per
    phase, codegen.rs:209-214), and Horner polynomial evaluation."""
    from triton_vm_tpu.air import evaluate as ev
    from triton_vm_tpu.air.master import master_air
    from triton_vm_tpu.fields import xfe as sxfe
    from triton_vm_tpu.utils.stdrng import ChaCha12Rng, seed_from_u64

    rng = ChaCha12Rng(seed_from_u64(3508729174085202315))
    NM, NA = 379, 91
    main_base = rng.random_bfes(NM)
    main_ext = rng.random_xfes(NM)
    aux_curr = rng.random_xfes(NA)
    next_main_base = rng.random_bfes(NM)
    next_main_ext = rng.random_xfes(NM)
    aux_next = rng.random_xfes(NA)
    challenges = rng.random_xfes(63)

    air = master_air()
    coeffs = []
    for key, (nb, ne) in (("init", (None, None)), ("cons", (None, None)),
                          ("tran", (next_main_base, next_main_ext)),
                          ("term", (None, None))):
        steps, out_ids = ev.linearize(air.constraints[key])
        coeffs.extend(ev.eval_host(steps, out_ids, main_base, aux_curr,
                                   challenges, next_main_row=nb,
                                   next_aux_row=aux_next))
        coeffs.extend(ev.eval_host(steps, out_ids, main_ext, aux_curr,
                                   challenges, next_main_row=ne,
                                   next_aux_row=aux_next))
    assert len(coeffs) == 2 * 604

    x = rng.random_xfes(1)[0]
    acc = (0, 0, 0)
    for c in reversed(coeffs):
        acc = sxfe.add(sxfe.mul(acc, x), c)
    assert acc == (17974882881108171077,
                   15638927082579294872,
                   9717283721935042729)


def test_program_hash_halt_golden():
    """Golden digest of the one-instruction `halt` program
    (program.rs:494-510 `hash_simple_program`)."""
    from triton_vm_tpu import triton_program

    assert list(map(int, triton_program("halt").hash())) == [
        0x4338_de79_520b_3949,
        0xe6a2_129b_2885_0dc9,
        0xfd3c_d098_6a86_0450,
        0x69fd_ba91_0ceb_a7bc,
        0x7e5b_118c_9594_c062,
    ]


def test_bezout_coefficient_polynomials_golden():
    """Golden Bézout coefficient polynomials for RAM pointers [1, 2, 3]
    (ram.rs:429-440 `bezout_coefficient_polynomials_are_as_expected`) —
    pins the committed RAM-table contiguity-argument columns."""
    from triton_vm_tpu.tables.master import (
        bezout_coefficient_polynomials_coefficients)

    a, b = bezout_coefficient_polynomials_coefficients([1, 2, 3])
    assert list(map(int, a)) == [9, 0x7fff_ffff_7fff_fffc, 0]
    assert list(map(int, b)) == [
        5, 0xffff_fffe_ffff_fffb, 0x7fff_ffff_8000_0002]
    ea, eb = bezout_coefficient_polynomials_coefficients([])
    assert list(ea) == [] and list(eb) == []
