"""Hash table AIR: Tip5 as constraints, program attestation, sponge modes.

Transcribed from /root/reference/triton-air/src/table/hash.rs (statement
order preserved; the Montgomery limb recomposition uses R^-1 with
R = 2^64 mod p, hash.rs:29-98).
"""

from . import helpers
from ...crypto import tip5 as _tip5
from ...fields.bfe import P, R
from ...isa.instruction import Instruction

R_INV = pow(R, P - 2, P)
NUM_ROUNDS = 5
RATE = 10
DIGEST_LEN = 5

OPCODE_HASH = Instruction("hash").opcode
OPCODE_SPONGE_INIT = Instruction("sponge_init").opcode
OPCODE_SPONGE_ABSORB = Instruction("sponge_absorb").opcode
OPCODE_SPONGE_SQUEEZE = Instruction("sponge_squeeze").opcode

# HashTableMode discriminants (hash.rs:1373-1381); iteration order is the
# declaration order: ProgramHashing, Sponge, Hash, Pad.
MODE_PROGRAM_HASHING = 1
MODE_SPONGE = 2
MODE_HASH = 3
MODE_PAD = 0
_MODES_IN_ORDER = [MODE_PROGRAM_HASHING, MODE_SPONGE, MODE_HASH, MODE_PAD]

_LIMB_PARTS = ("Highest", "MidHigh", "MidLow", "Lowest")


def mds_matrix_entry(row, col):
    return _tip5.MDS_MATRIX_FIRST_COLUMN[(16 + row - col) % 16]


def _select_mode(constant, mode_node, mode_value):
    return mode_node - constant(mode_value)


def _mode_deselector(constant, mode_node, mode_to_deselect):
    acc = constant(1)
    for m in _MODES_IN_ORDER:
        if m != mode_to_deselect:
            acc = acc * (mode_node - constant(m))
    return acc


def _round_number_deselector(constant, rn_node, round_to_deselect):
    first = constant(1) if round_to_deselect == 0 else rn_node
    acc = first
    for r in range(1, NUM_ROUNDS + 1):
        if r != round_to_deselect:
            acc = acc * (rn_node - constant(r))
    return acc


def _instruction_deselector(constant, ci_node, opcode_to_deselect):
    acc = constant(1)
    for opc in (OPCODE_HASH, OPCODE_SPONGE_INIT, OPCODE_SPONGE_ABSORB,
                OPCODE_SPONGE_SQUEEZE):
        if opc != opcode_to_deselect:
            acc = acc * (ci_node - constant(opc))
    return acc


def _re_compose_16_bit_limbs(b, constant, highest, mid_high, mid_low, lowest):
    montgomery_modulus_inv = constant(R_INV)
    sum_of_shifted_limbs = (highest * constant(1 << 48)
                            + mid_high * constant(1 << 32)
                            + mid_low * constant(1 << 16)
                            + lowest)
    return sum_of_shifted_limbs * montgomery_modulus_inv


def _re_compose_states(b, constant, row_fn):
    """States 0-3 from their LkIn limbs (hash.rs:243-283)."""
    out = []
    for i in range(4):
        out.append(_re_compose_16_bit_limbs(
            b, constant,
            row_fn(f"State{i}HighestLkIn"), row_fn(f"State{i}MidHighLkIn"),
            row_fn(f"State{i}MidLowLkIn"), row_fn(f"State{i}LowestLkIn")))
    return out


def initial_constraints(b):
    challenge, constant, x_constant, main, aux = helpers(b, "hash", False)

    running_evaluation_initial = constant(1)
    lookup_arg_default_initial = constant(0)

    mode = main("Mode")
    running_evaluation_hash_input = aux("HashInputRunningEvaluation")
    running_evaluation_hash_digest = aux("HashDigestRunningEvaluation")
    running_evaluation_sponge = aux("SpongeRunningEvaluation")
    running_evaluation_receive_chunk = aux("ReceiveChunkRunningEvaluation")

    cascade_indeterminate = challenge("HashCascadeLookupIndeterminate")
    look_in_weight = challenge("HashCascadeLookInWeight")
    look_out_weight = challenge("HashCascadeLookOutWeight")
    prepare_chunk_indeterminate = challenge(
        "ProgramAttestationPrepareChunkIndeterminate")
    receive_chunk_indeterminate = challenge(
        "ProgramAttestationSendChunkIndeterminate")

    states = _re_compose_states(b, constant, main)
    state_rate_part = states + [main(f"State{i}") for i in range(4, 10)]
    compressed_chunk = running_evaluation_initial
    for state_element in state_rate_part:
        compressed_chunk = (compressed_chunk * prepare_chunk_indeterminate
                            + state_element)
    receive_chunk_init = (running_evaluation_receive_chunk
                          - receive_chunk_indeterminate * running_evaluation_initial
                          - compressed_chunk)

    def cascade_log_derivative_init(i, part):
        look_in = main(f"State{i}{part}LkIn")
        look_out = main(f"State{i}{part}LkOut")
        compressed_row = (look_in_weight * look_in + look_out_weight * look_out)
        cascade_log_derivative = aux(f"CascadeState{i}{part}ClientLogDerivative")
        return ((cascade_log_derivative - lookup_arg_default_initial)
                * (cascade_indeterminate - compressed_row) - constant(1))

    mode_is_program_hashing = _select_mode(constant, mode, MODE_PROGRAM_HASHING)
    round_number_is_0 = main("RoundNumber")
    hash_input_init = running_evaluation_hash_input - running_evaluation_initial
    hash_digest_init = running_evaluation_hash_digest - running_evaluation_initial
    sponge_init = running_evaluation_sponge - running_evaluation_initial

    out = [mode_is_program_hashing, round_number_is_0, hash_input_init,
           hash_digest_init, sponge_init, receive_chunk_init]
    for i in range(4):
        for part in _LIMB_PARTS:
            out.append(cascade_log_derivative_init(i, part))
    return out


def consistency_constraints(b):
    challenge, constant, x_constant, main, aux = helpers(b, "hash", False)

    mode = main("Mode")
    ci = main("CI")
    round_number = main("RoundNumber")

    ci_is_hash = ci - constant(OPCODE_HASH)
    ci_is_sponge_init = ci - constant(OPCODE_SPONGE_INIT)
    ci_is_sponge_absorb = ci - constant(OPCODE_SPONGE_ABSORB)
    ci_is_sponge_squeeze = ci - constant(OPCODE_SPONGE_SQUEEZE)

    mode_is_not_hash = _mode_deselector(constant, mode, MODE_HASH)
    round_number_is_not_0 = _round_number_deselector(constant, round_number, 0)

    mode_is_a_valid_mode = (_mode_deselector(constant, mode, MODE_PAD)
                            * _select_mode(constant, mode, MODE_PAD))
    if_mode_not_sponge_then_ci_is_hash = (
        _select_mode(constant, mode, MODE_SPONGE) * ci_is_hash)
    if_mode_sponge_then_ci_is_sponge = (
        _mode_deselector(constant, mode, MODE_SPONGE)
        * ci_is_sponge_init * ci_is_sponge_absorb * ci_is_sponge_squeeze)
    if_padding_then_round_number_0 = (
        _mode_deselector(constant, mode, MODE_PAD) * round_number)

    if_ci_sponge_init = ci_is_hash * ci_is_sponge_absorb * ci_is_sponge_squeeze
    if_ci_sponge_init_then_rn_0 = if_ci_sponge_init * round_number

    if_ci_sponge_init_then_rate_0 = [
        if_ci_sponge_init * main(f"State{i}") for i in range(10, 16)]

    if_hash_rn0 = round_number_is_not_0 * mode_is_not_hash
    if_hash_rn0_then_cap_1 = [
        if_hash_rn0 * (main(f"State{i}") - constant(1)) for i in range(10, 16)]

    one = constant(1)
    two_pow_16 = constant(1 << 16)
    two_pow_32 = constant(1 << 32)

    hi_limbs_minus = []
    for i in range(4):
        hi_limbs_minus.append(
            two_pow_32 - one - main(f"State{i}HighestLkIn") * two_pow_16
            - main(f"State{i}MidHighLkIn"))
    hi_inv = [main(f"State{i}Inv") for i in range(4)]
    not_all_1s = [hi_limbs_minus[i] * hi_inv[i] - one for i in range(4)]
    inv_is_inv_or_zero = [not_all_1s[i] * hi_inv[i] for i in range(4)]
    inv_is_inv_or_hi_zero = [not_all_1s[i] * hi_limbs_minus[i] for i in range(4)]

    lo_limbs = [
        main(f"State{i}MidLowLkIn") * two_pow_16 + main(f"State{i}LowestLkIn")
        for i in range(4)]
    hi_all_1_then_lo_0 = [not_all_1s[i] * lo_limbs[i] for i in range(4)]

    constraints = [
        mode_is_a_valid_mode,
        if_mode_not_sponge_then_ci_is_hash,
        if_mode_sponge_then_ci_is_sponge,
        if_padding_then_round_number_0,
        if_ci_sponge_init_then_rn_0,
        *inv_is_inv_or_zero,
        *inv_is_inv_or_hi_zero,
        *hi_all_1_then_lo_0,
    ]
    constraints.extend(if_ci_sponge_init_then_rate_0)
    constraints.extend(if_hash_rn0_then_cap_1)

    for c_idx in range(16):
        col = main(f"Constant{c_idx}")
        acc = constant(0)
        for r in range(NUM_ROUNDS):
            rc = _tip5.ROUND_CONSTANTS[r * 16 + c_idx]
            desel = _round_number_deselector(constant, round_number, r)
            acc = acc + desel * (col - constant(rc))
        constraints.append(acc)
    return constraints


def _tip5_constraints(b, challenge, constant, main, next_main):
    """(state_next, round-update constraints) — hash.rs:283-435."""
    lk_out_states = []
    for i in range(4):
        lk_out_states.append(_re_compose_16_bit_limbs(
            b, constant,
            main(f"State{i}HighestLkOut"), main(f"State{i}MidHighLkOut"),
            main(f"State{i}MidLowLkOut"), main(f"State{i}LowestLkOut")))

    before_power = [main(f"State{i}") for i in range(4, 16)]
    after_power = list(before_power)
    for _ in range(1, 7):
        for i in range(12):
            after_power[i] = after_power[i] * before_power[i]

    state_after_sbox = lk_out_states + after_power

    state_after_mds = []
    for row_idx in range(16):
        acc = constant(0)
        for col_idx in range(16):
            entry = constant(mds_matrix_entry(row_idx, col_idx))
            acc = acc + entry * state_after_sbox[col_idx]
        state_after_mds.append(acc)

    round_constants = [main(f"Constant{i}") for i in range(16)]
    state_after_rc = [st + rc for st, rc in zip(state_after_mds, round_constants)]

    state_next = (_re_compose_states(b, constant, next_main)
                  + [next_main(f"State{i}") for i in range(4, 16)])

    round_number_next = next_main("RoundNumber")
    round_updates = [
        round_number_next * (se - sn)
        for se, sn in zip(state_after_rc, state_next)]
    return state_next, round_updates


def _cascade_log_derivative_update(b, challenge, constant, next_main,
                                   aux, next_aux, i, part):
    """hash.rs:437-491."""
    cascade_indeterminate = challenge("HashCascadeLookupIndeterminate")
    look_in_weight = challenge("HashCascadeLookInWeight")
    look_out_weight = challenge("HashCascadeLookOutWeight")

    ci_next = next_main("CI")
    mode_next = next_main("Mode")
    round_number_next = next_main("RoundNumber")
    col = f"CascadeState{i}{part}ClientLogDerivative"
    cascade_log_derivative = aux(col)
    cascade_log_derivative_next = next_aux(col)

    compressed_row = (look_in_weight * next_main(f"State{i}{part}LkIn")
                      + look_out_weight * next_main(f"State{i}{part}LkOut"))

    remains = cascade_log_derivative_next - cascade_log_derivative
    updates = ((cascade_log_derivative_next - cascade_log_derivative)
               * (cascade_indeterminate - compressed_row) - constant(1))

    not_pad_or_max_or_init = (
        _select_mode(constant, mode_next, MODE_PAD)
        * (round_number_next - constant(NUM_ROUNDS))
        * (ci_next - constant(OPCODE_SPONGE_INIT)))
    rn_next_not_max = _round_number_deselector(
        constant, round_number_next, NUM_ROUNDS)
    ci_next_not_sponge_init = _instruction_deselector(
        constant, ci_next, OPCODE_SPONGE_INIT)
    next_is_padding = _mode_deselector(constant, mode_next, MODE_PAD)

    return (not_pad_or_max_or_init * updates
            + rn_next_not_max * remains
            + ci_next_not_sponge_init * remains
            + next_is_padding * remains)


def transition_constraints(b):
    challenge, constant, x_constant, main, aux, next_main, next_aux = \
        helpers(b, "hash", True)

    opcode_hash = constant(OPCODE_HASH)
    opcode_sponge_init = constant(OPCODE_SPONGE_INIT)
    opcode_sponge_absorb = constant(OPCODE_SPONGE_ABSORB)
    opcode_sponge_squeeze = constant(OPCODE_SPONGE_SQUEEZE)

    running_evaluation_initial = constant(1)

    prepare_chunk_indeterminate = challenge(
        "ProgramAttestationPrepareChunkIndeterminate")
    receive_chunk_indeterminate = challenge(
        "ProgramAttestationSendChunkIndeterminate")
    compress_program_digest_indeterminate = challenge(
        "CompressProgramDigestIndeterminate")
    expected_program_digest = challenge("CompressedProgramDigest")
    hash_input_eval_indeterminate = challenge("HashInputIndeterminate")
    hash_digest_eval_indeterminate = challenge("HashDigestIndeterminate")
    sponge_indeterminate = challenge("SpongeIndeterminate")

    mode = main("Mode")
    ci = main("CI")
    round_number = main("RoundNumber")
    running_evaluation_receive_chunk = aux("ReceiveChunkRunningEvaluation")
    running_evaluation_hash_input = aux("HashInputRunningEvaluation")
    running_evaluation_hash_digest = aux("HashDigestRunningEvaluation")
    running_evaluation_sponge = aux("SpongeRunningEvaluation")

    mode_next = next_main("Mode")
    ci_next = next_main("CI")
    round_number_next = next_main("RoundNumber")
    running_evaluation_receive_chunk_next = next_aux("ReceiveChunkRunningEvaluation")
    running_evaluation_hash_input_next = next_aux("HashInputRunningEvaluation")
    running_evaluation_hash_digest_next = next_aux("HashDigestRunningEvaluation")
    running_evaluation_sponge_next = next_aux("SpongeRunningEvaluation")

    state_current = (_re_compose_states(b, constant, main)
                     + [main(f"State{i}") for i in range(4, 16)])

    state_next, round_updates = _tip5_constraints(
        b, challenge, constant, main, next_main)

    state_weights = [challenge(f"StackWeight{i}") for i in range(16)]

    rn_not_max = _round_number_deselector(constant, round_number, NUM_ROUNDS)
    rn_0_to_4_or_rn_next_0 = rn_not_max * round_number_next

    next_pad_or_rn_max_or_inc = (
        _select_mode(constant, mode_next, MODE_PAD)
        * (ci - opcode_sponge_init)
        * (round_number - constant(NUM_ROUNDS))
        * (round_number_next - round_number - constant(1)))

    if_sponge_init_then_rn_next_0 = (
        _instruction_deselector(constant, ci, OPCODE_SPONGE_INIT)
        * round_number_next)

    compressed_digest = running_evaluation_initial
    for digest_element in state_current[:DIGEST_LEN]:
        compressed_digest = (compressed_digest
                             * compress_program_digest_indeterminate
                             + digest_element)
    prog_hash_ends_with_digest = (
        _mode_deselector(constant, mode, MODE_PROGRAM_HASHING)
        * _select_mode(constant, mode_next, MODE_PROGRAM_HASHING)
        * (compressed_digest - expected_program_digest))

    prog_hash_to_sponge_init = (
        _mode_deselector(constant, mode, MODE_PROGRAM_HASHING)
        * _mode_deselector(constant, mode_next, MODE_SPONGE)
        * (ci_next - opcode_sponge_init))

    ci_stays = ((round_number - constant(NUM_ROUNDS))
                * (ci - opcode_sponge_init) * (ci_next - ci))
    mode_stays = ((round_number - constant(NUM_ROUNDS))
                  * (ci - opcode_sponge_init) * (mode_next - mode))

    sponge_mode_transitions = (
        _mode_deselector(constant, mode, MODE_SPONGE)
        * _select_mode(constant, mode_next, MODE_SPONGE)
        * _select_mode(constant, mode_next, MODE_HASH)
        * _select_mode(constant, mode_next, MODE_PAD))
    hash_mode_transitions = (
        _mode_deselector(constant, mode, MODE_HASH)
        * _select_mode(constant, mode_next, MODE_HASH)
        * _select_mode(constant, mode_next, MODE_PAD))
    pad_mode_stays = (_mode_deselector(constant, mode, MODE_PAD)
                      * _select_mode(constant, mode_next, MODE_PAD))

    capacity_diffs = [state_next[i] - state_current[i] for i in range(RATE, 16)]
    randomized_capacity_sum = None
    for w, d in zip(state_weights[RATE:], capacity_diffs):
        term = w * d
        randomized_capacity_sum = (term if randomized_capacity_sum is None
                                   else randomized_capacity_sum + term)

    capacity_unchanged_at_section_start = (
        _round_number_deselector(constant, round_number_next, 0)
        * _select_mode(constant, mode_next, MODE_HASH)
        * _select_mode(constant, mode_next, MODE_PAD)
        * (ci_next - opcode_sponge_init)
        * randomized_capacity_sum)

    state_diffs = [sn - sc for sc, sn in zip(state_current, state_next)]
    randomized_state_sum = None
    for w, d in zip(state_weights, state_diffs):
        term = w * d
        randomized_state_sum = (term if randomized_state_sum is None
                                else randomized_state_sum + term)
    squeeze_state_unchanged = (
        _round_number_deselector(constant, round_number_next, 0)
        * _instruction_deselector(constant, ci_next, OPCODE_SPONGE_SQUEEZE)
        * randomized_state_sum)

    # hash input running evaluation
    hash_input_remains = (running_evaluation_hash_input_next
                          - running_evaluation_hash_input)
    compressed_row_from_processor = None
    for st, w in zip(state_next[:RATE], state_weights[:RATE]):
        term = w * st
        compressed_row_from_processor = (
            term if compressed_row_from_processor is None
            else compressed_row_from_processor + term)
    hash_input_updates = (running_evaluation_hash_input_next
                          - hash_input_eval_indeterminate * running_evaluation_hash_input
                          - compressed_row_from_processor)
    hash_input_updated_correctly = (
        _round_number_deselector(constant, round_number_next, 0)
        * _mode_deselector(constant, mode_next, MODE_HASH)
        * hash_input_updates
        + round_number_next * hash_input_remains
        + (constant(MODE_HASH) - mode_next) * hash_input_remains)

    # hash digest running evaluation
    round_number_next_is_num_rounds = round_number_next - constant(NUM_ROUNDS)
    hash_digest_remains = (running_evaluation_hash_digest_next
                           - running_evaluation_hash_digest)
    compressed_row_hash_digest = None
    for st, w in zip(state_next[:DIGEST_LEN], state_weights[:DIGEST_LEN]):
        term = w * st
        compressed_row_hash_digest = (
            term if compressed_row_hash_digest is None
            else compressed_row_hash_digest + term)
    hash_digest_updates = (running_evaluation_hash_digest_next
                           - hash_digest_eval_indeterminate * running_evaluation_hash_digest
                           - compressed_row_hash_digest)
    hash_digest_updated_correctly = (
        _round_number_deselector(constant, round_number_next, NUM_ROUNDS)
        * _mode_deselector(constant, mode_next, MODE_HASH)
        * hash_digest_updates
        + round_number_next_is_num_rounds * hash_digest_remains
        + _select_mode(constant, mode_next, MODE_HASH) * hash_digest_remains)

    # sponge running evaluation
    compressed_row_next = None
    for w, st in zip(state_weights[:RATE], state_next[:RATE]):
        term = w * st
        compressed_row_next = (term if compressed_row_next is None
                               else compressed_row_next + term)
    sponge_accumulated_ci = (running_evaluation_sponge_next
                             - sponge_indeterminate * running_evaluation_sponge
                             - challenge("HashCIWeight") * ci_next)
    sponge_accumulated_row = sponge_accumulated_ci - compressed_row_next
    sponge_updates = (_round_number_deselector(constant, round_number_next, 0)
                      * (ci_next - opcode_hash)
                      * sponge_accumulated_row)
    sponge_remains = running_evaluation_sponge_next - running_evaluation_sponge
    sponge_remains_rn = round_number_next * sponge_remains
    sponge_remains_ci = ((ci_next - opcode_sponge_init)
                         * (ci_next - opcode_sponge_absorb)
                         * (ci_next - opcode_sponge_squeeze)
                         * sponge_remains)
    sponge_updated_correctly = sponge_updates + sponge_remains_rn + sponge_remains_ci

    # program attestation chunk receive
    compressed_chunk = running_evaluation_initial
    for rate_element in state_next[:RATE]:
        compressed_chunk = (compressed_chunk * prepare_chunk_indeterminate
                            + rate_element)
    receive_chunk_absorbs = (running_evaluation_receive_chunk_next
                             - receive_chunk_indeterminate * running_evaluation_receive_chunk
                             - compressed_chunk)
    receive_chunk_remains = (running_evaluation_receive_chunk_next
                             - running_evaluation_receive_chunk)
    receive_chunk_updated_correctly = (
        _round_number_deselector(constant, round_number_next, 0)
        * _mode_deselector(constant, mode_next, MODE_PROGRAM_HASHING)
        * receive_chunk_absorbs
        + round_number_next * receive_chunk_remains
        + _select_mode(constant, mode_next, MODE_PROGRAM_HASHING)
        * receive_chunk_remains)

    constraints = [
        rn_0_to_4_or_rn_next_0,
        next_pad_or_rn_max_or_inc,
        if_sponge_init_then_rn_next_0,
        receive_chunk_updated_correctly,
        prog_hash_ends_with_digest,
        prog_hash_to_sponge_init,
        ci_stays,
        mode_stays,
        sponge_mode_transitions,
        hash_mode_transitions,
        pad_mode_stays,
        capacity_unchanged_at_section_start,
        squeeze_state_unchanged,
        hash_input_updated_correctly,
        hash_digest_updated_correctly,
        sponge_updated_correctly,
    ]
    for i in range(4):
        for part in _LIMB_PARTS:
            constraints.append(_cascade_log_derivative_update(
                b, challenge, constant, next_main, aux, next_aux, i, part))
    constraints.extend(round_updates)
    return constraints


def terminal_constraints(b):
    challenge, constant, x_constant, main, aux = helpers(b, "hash", False)

    mode = main("Mode")
    round_number = main("RoundNumber")

    compress_program_digest_indeterminate = challenge(
        "CompressProgramDigestIndeterminate")
    expected_program_digest = challenge("CompressedProgramDigest")
    max_round_number = constant(NUM_ROUNDS)

    states = _re_compose_states(b, constant, main)
    state_4 = main("State4")
    program_digest = states + [state_4]
    compressed_digest = constant(1)
    for digest_element in program_digest:
        compressed_digest = (compressed_digest
                             * compress_program_digest_indeterminate
                             + digest_element)
    prog_hash_digest_check = (
        _mode_deselector(constant, mode, MODE_PROGRAM_HASHING)
        * (compressed_digest - expected_program_digest))

    rn_is_max = (_select_mode(constant, mode, MODE_PAD)
                 * (main("CI") - constant(OPCODE_SPONGE_INIT))
                 * (round_number - max_round_number))

    return [prog_hash_digest_check, rn_is_max]
