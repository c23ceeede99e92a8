"""Program table AIR.

Transcribed from /root/reference/triton-air/src/table/program.rs (statement
order preserved).
"""

from . import helpers

RATE = 10


def initial_constraints(b):
    challenge, constant, x_constant, main, aux = helpers(b, "program", False)

    address = main("Address")
    instruction = main("Instruction")
    index_in_chunk = main("IndexInChunk")
    is_hash_input_padding = main("IsHashInputPadding")
    instruction_lookup_log_derivative = aux("InstructionLookupServerLogDerivative")
    prepare_chunk_running_evaluation = aux("PrepareChunkRunningEvaluation")
    send_chunk_running_evaluation = aux("SendChunkRunningEvaluation")

    lookup_arg_initial = constant(0)
    eval_arg_initial = constant(1)
    prep_ind = challenge("ProgramAttestationPrepareChunkIndeterminate")

    first_address_is_zero = address
    index_in_chunk_is_zero = index_in_chunk
    hash_input_padding_indicator_is_zero = is_hash_input_padding
    log_derivative_init = instruction_lookup_log_derivative - lookup_arg_initial
    prepare_chunk_init = (prepare_chunk_running_evaluation
                          - eval_arg_initial * prep_ind - instruction)
    send_chunk_init = send_chunk_running_evaluation - eval_arg_initial

    return [first_address_is_zero, index_in_chunk_is_zero,
            hash_input_padding_indicator_is_zero, log_derivative_init,
            prepare_chunk_init, send_chunk_init]


def consistency_constraints(b):
    challenge, constant, x_constant, main, aux = helpers(b, "program", False)

    one = constant(1)
    max_index_in_chunk = constant(RATE - 1)

    index_in_chunk = main("IndexInChunk")
    max_minus_index_in_chunk_inv = main("MaxMinusIndexInChunkInv")
    is_hash_input_padding = main("IsHashInputPadding")
    is_table_padding = main("IsTablePadding")

    max_minus_index_in_chunk = max_index_in_chunk - index_in_chunk
    inv_is_zero_or_inverse = (
        (one - max_minus_index_in_chunk * max_minus_index_in_chunk_inv)
        * max_minus_index_in_chunk_inv)
    val_is_zero_or_inverse = (
        (one - max_minus_index_in_chunk * max_minus_index_in_chunk_inv)
        * max_minus_index_in_chunk)
    is_hash_input_padding_is_bit = (
        is_hash_input_padding * (is_hash_input_padding - one))
    is_table_padding_is_bit = is_table_padding * (is_table_padding - one)
    table_padding_implies_hash_input_padding = (
        is_table_padding * (one - is_hash_input_padding))

    return [inv_is_zero_or_inverse, val_is_zero_or_inverse,
            is_hash_input_padding_is_bit, is_table_padding_is_bit,
            table_padding_implies_hash_input_padding]


def transition_constraints(b):
    challenge, constant, x_constant, main, aux, next_main, next_aux = \
        helpers(b, "program", True)

    one = constant(1)
    rate_minus_one = constant(RATE - 1)
    prepare_chunk_indeterminate = challenge(
        "ProgramAttestationPrepareChunkIndeterminate")
    send_chunk_indeterminate = challenge(
        "ProgramAttestationSendChunkIndeterminate")

    address = main("Address")
    instruction = main("Instruction")
    lookup_multiplicity = main("LookupMultiplicity")
    index_in_chunk = main("IndexInChunk")
    max_minus_index_in_chunk_inv = main("MaxMinusIndexInChunkInv")
    is_hash_input_padding = main("IsHashInputPadding")
    is_table_padding = main("IsTablePadding")
    log_derivative = aux("InstructionLookupServerLogDerivative")
    prepare_chunk_running_evaluation = aux("PrepareChunkRunningEvaluation")
    send_chunk_running_evaluation = aux("SendChunkRunningEvaluation")

    address_next = next_main("Address")
    instruction_next = next_main("Instruction")
    index_in_chunk_next = next_main("IndexInChunk")
    max_minus_index_in_chunk_inv_next = next_main("MaxMinusIndexInChunkInv")
    is_hash_input_padding_next = next_main("IsHashInputPadding")
    is_table_padding_next = next_main("IsTablePadding")
    log_derivative_next = next_aux("InstructionLookupServerLogDerivative")
    prepare_chunk_running_evaluation_next = next_aux("PrepareChunkRunningEvaluation")
    send_chunk_running_evaluation_next = next_aux("SendChunkRunningEvaluation")

    address_increases_by_one = address_next - (address + one)
    is_table_padding_is_0_or_remains = (
        is_table_padding * (is_table_padding_next - is_table_padding))

    index_in_chunk_cycles_correctly = (
        (one - max_minus_index_in_chunk_inv * (rate_minus_one - index_in_chunk))
        * index_in_chunk_next
        + max_minus_index_in_chunk_inv
        * (index_in_chunk_next - index_in_chunk - one))

    hash_input_indicator_is_0_or_remains = (
        is_hash_input_padding * (is_hash_input_padding_next - one))

    first_hash_input_padding_is_1 = (
        (is_hash_input_padding - one) * is_hash_input_padding_next
        * (instruction_next - one))

    hash_input_padding_is_0_after_first_1 = (
        is_hash_input_padding * instruction_next)

    next_row_is_table_padding_row = is_table_padding_next - one
    table_padding_starts = (
        is_hash_input_padding
        * (one - max_minus_index_in_chunk_inv * (rate_minus_one - index_in_chunk))
        * next_row_is_table_padding_row)

    log_derivative_remains = log_derivative_next - log_derivative
    compressed_row = (challenge("ProgramAddressWeight") * address
                      + challenge("ProgramInstructionWeight") * instruction
                      + challenge("ProgramNextInstructionWeight") * instruction_next)
    indeterminate = challenge("InstructionLookupIndeterminate")
    log_derivative_updates = ((log_derivative_next - log_derivative)
                              * (indeterminate - compressed_row)
                              - lookup_multiplicity)
    log_derivative_updates_iff_not_padding = (
        (one - is_hash_input_padding) * log_derivative_updates
        + is_hash_input_padding * log_derivative_remains)

    prepare_absorbs = (prepare_chunk_running_evaluation_next
                       - prepare_chunk_indeterminate * prepare_chunk_running_evaluation
                       - instruction_next)
    prepare_resets_and_absorbs = (prepare_chunk_running_evaluation_next
                                  - prepare_chunk_indeterminate
                                  - instruction_next)
    index_in_chunk_is_max = rate_minus_one - index_in_chunk
    index_in_chunk_is_not_max = (
        one - max_minus_index_in_chunk_inv * (rate_minus_one - index_in_chunk))
    prepare_chunk_resets_every_rate_rows = (
        index_in_chunk_is_max * prepare_absorbs
        + index_in_chunk_is_not_max * prepare_resets_and_absorbs)

    send_absorbs = (send_chunk_running_evaluation_next
                    - send_chunk_indeterminate * send_chunk_running_evaluation
                    - prepare_chunk_running_evaluation_next)
    send_unchanged = (send_chunk_running_evaluation_next
                      - send_chunk_running_evaluation)
    index_in_chunk_next_is_max = rate_minus_one - index_in_chunk_next
    index_in_chunk_next_is_not_max = (
        one - max_minus_index_in_chunk_inv_next * index_in_chunk_next_is_max)

    send_chunk_absorbs_iff = (
        send_absorbs * next_row_is_table_padding_row * index_in_chunk_next_is_not_max
        + send_unchanged * is_table_padding_next
        + send_unchanged * index_in_chunk_next_is_max)

    return [address_increases_by_one, is_table_padding_is_0_or_remains,
            index_in_chunk_cycles_correctly, hash_input_indicator_is_0_or_remains,
            first_hash_input_padding_is_1, hash_input_padding_is_0_after_first_1,
            table_padding_starts, log_derivative_updates_iff_not_padding,
            prepare_chunk_resets_every_rate_rows, send_chunk_absorbs_iff]


def terminal_constraints(b):
    challenge, constant, x_constant, main, aux = helpers(b, "program", False)

    index_in_chunk = main("IndexInChunk")
    is_hash_input_padding = main("IsHashInputPadding")
    is_table_padding = main("IsTablePadding")

    hash_input_padding_is_one = is_hash_input_padding - constant(1)
    index_is_max_or_padding = (
        (index_in_chunk - constant(RATE - 1)) * (is_table_padding - constant(1)))

    return [hash_input_padding_is_one, index_is_max_or_padding]
