"""Cascade table AIR (16-bit -> 2x 8-bit lookup splitting).

Transcribed from /root/reference/triton-air/src/table/cascade.rs.
"""

from . import helpers


def initial_constraints(b):
    challenge, constant, x_constant, main, aux = helpers(b, "cascade", False)

    def one():
        return constant(1)

    def two():
        return constant(2)

    two_pow_8 = constant(1 << 8)
    lookup_arg_default_initial = constant(0)

    is_padding = main("IsPadding")
    look_in_hi = main("LookInHi")
    look_in_lo = main("LookInLo")
    look_out_hi = main("LookOutHi")
    look_out_lo = main("LookOutLo")
    lookup_multiplicity = main("LookupMultiplicity")
    hash_log_derivative = aux("HashTableServerLogDerivative")
    lookup_log_derivative = aux("LookupTableClientLogDerivative")

    hash_indeterminate = challenge("HashCascadeLookupIndeterminate")
    hash_input_weight = challenge("HashCascadeLookInWeight")
    hash_output_weight = challenge("HashCascadeLookOutWeight")

    lookup_indeterminate = challenge("CascadeLookupIndeterminate")
    lookup_input_weight = challenge("LookupTableInputWeight")
    lookup_output_weight = challenge("LookupTableOutputWeight")

    compressed_row_hash = (
        hash_input_weight * (two_pow_8 * look_in_hi + look_in_lo)
        + hash_output_weight * (two_pow_8 * look_out_hi + look_out_lo))
    hash_ld_is_default_initial = hash_log_derivative - lookup_arg_default_initial
    hash_ld_accumulated_first_row = (
        (hash_log_derivative - lookup_arg_default_initial)
        * (hash_indeterminate - compressed_row_hash)
        - lookup_multiplicity)
    hash_ld_initialized_correctly = (
        (one() - is_padding) * hash_ld_accumulated_first_row
        + is_padding * hash_ld_is_default_initial)

    compressed_row_lo = (lookup_input_weight * look_in_lo
                         + lookup_output_weight * look_out_lo)
    compressed_row_hi = (lookup_input_weight * look_in_hi
                         + lookup_output_weight * look_out_hi)
    lookup_ld_is_default_initial = (lookup_log_derivative
                                    - lookup_arg_default_initial)
    lookup_ld_accumulated_first_row = (
        (lookup_log_derivative - lookup_arg_default_initial)
        * (lookup_indeterminate - compressed_row_lo)
        * (lookup_indeterminate - compressed_row_hi)
        - two() * lookup_indeterminate
        + compressed_row_lo
        + compressed_row_hi)
    lookup_ld_initialized_correctly = (
        (one() - is_padding) * lookup_ld_accumulated_first_row
        + is_padding * lookup_ld_is_default_initial)

    return [hash_ld_initialized_correctly, lookup_ld_initialized_correctly]


def consistency_constraints(b):
    challenge, constant, x_constant, main, aux = helpers(b, "cascade", False)
    one = constant(1)
    is_padding = main("IsPadding")
    is_padding_is_0_or_1 = is_padding * (one - is_padding)
    return [is_padding_is_0_or_1]


def transition_constraints(b):
    challenge, constant, x_constant, main, aux, next_main, next_aux = \
        helpers(b, "cascade", True)

    one = constant(1)
    two = constant(2)
    two_pow_8 = constant(1 << 8)

    is_padding = main("IsPadding")
    hash_log_derivative = aux("HashTableServerLogDerivative")
    lookup_log_derivative = aux("LookupTableClientLogDerivative")

    is_padding_next = next_main("IsPadding")
    look_in_hi_next = next_main("LookInHi")
    look_in_lo_next = next_main("LookInLo")
    look_out_hi_next = next_main("LookOutHi")
    look_out_lo_next = next_main("LookOutLo")
    lookup_multiplicity_next = next_main("LookupMultiplicity")
    hash_log_derivative_next = next_aux("HashTableServerLogDerivative")
    lookup_log_derivative_next = next_aux("LookupTableClientLogDerivative")

    hash_indeterminate = challenge("HashCascadeLookupIndeterminate")
    hash_input_weight = challenge("HashCascadeLookInWeight")
    hash_output_weight = challenge("HashCascadeLookOutWeight")

    lookup_indeterminate = challenge("CascadeLookupIndeterminate")
    lookup_input_weight = challenge("LookupTableInputWeight")
    lookup_output_weight = challenge("LookupTableOutputWeight")

    padding_propagates = is_padding * (one - is_padding_next)

    compressed_next_row_hash = (
        hash_input_weight * (two_pow_8 * look_in_hi_next + look_in_lo_next)
        + hash_output_weight * (two_pow_8 * look_out_hi_next + look_out_lo_next))
    hash_ld_remains = hash_log_derivative_next - hash_log_derivative
    hash_ld_accumulates = ((hash_log_derivative_next - hash_log_derivative)
                           * (hash_indeterminate - compressed_next_row_hash)
                           - lookup_multiplicity_next)
    hash_ld_updates_correctly = ((one - is_padding_next) * hash_ld_accumulates
                                 + is_padding_next * hash_ld_remains)

    compressed_row_lo_next = (lookup_input_weight * look_in_lo_next
                              + lookup_output_weight * look_out_lo_next)
    compressed_row_hi_next = (lookup_input_weight * look_in_hi_next
                              + lookup_output_weight * look_out_hi_next)
    lookup_ld_remains = lookup_log_derivative_next - lookup_log_derivative
    lookup_ld_accumulates = (
        (lookup_log_derivative_next - lookup_log_derivative)
        * (lookup_indeterminate - compressed_row_lo_next)
        * (lookup_indeterminate - compressed_row_hi_next)
        - two * lookup_indeterminate
        + compressed_row_lo_next
        + compressed_row_hi_next)
    lookup_ld_updates_correctly = ((one - is_padding_next) * lookup_ld_accumulates
                                   + is_padding_next * lookup_ld_remains)

    return [padding_propagates, hash_ld_updates_correctly,
            lookup_ld_updates_correctly]


def terminal_constraints(b):
    return []
