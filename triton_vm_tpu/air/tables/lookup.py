"""Lookup table AIR.

Transcribed from /root/reference/triton-air/src/table/lookup.rs.
"""

from . import helpers


def initial_constraints(b):
    challenge, constant, x_constant, main, aux = helpers(b, "lookup", False)

    lookup_input = main("LookIn")
    lookup_output = main("LookOut")
    lookup_multiplicity = main("LookupMultiplicity")
    cascade_log_derivative = aux("CascadeTableServerLogDerivative")
    public_evaluation_argument = aux("PublicEvaluationArgument")

    lookup_input_is_0 = lookup_input

    # the first row's lookup_input is fixed at 0, so compressing the row
    # only needs the output term
    lookup_argument_default_initial = constant(0)
    cascade_table_indeterminate = challenge("CascadeLookupIndeterminate")
    compressed_row = lookup_output * challenge("LookupTableOutputWeight")
    cascade_log_derivative_init = (
        (cascade_log_derivative - lookup_argument_default_initial)
        * (cascade_table_indeterminate - compressed_row)
        - lookup_multiplicity)

    eval_argument_default_initial = constant(1)
    public_indeterminate = challenge("LookupTablePublicIndeterminate")
    public_evaluation_argument_init = (
        public_evaluation_argument
        - eval_argument_default_initial * public_indeterminate
        - lookup_output)

    return [lookup_input_is_0, cascade_log_derivative_init,
            public_evaluation_argument_init]


def consistency_constraints(b):
    challenge, constant, x_constant, main, aux = helpers(b, "lookup", False)
    padding_is_0_or_1 = main("IsPadding") * (constant(1) - main("IsPadding"))
    return [padding_is_0_or_1]


def transition_constraints(b):
    challenge, constant, x_constant, main, aux, next_main, next_aux = \
        helpers(b, "lookup", True)

    def one():
        return constant(1)

    lookup_input = main("LookIn")
    is_padding = main("IsPadding")
    cascade_log_derivative = aux("CascadeTableServerLogDerivative")
    public_evaluation_argument = aux("PublicEvaluationArgument")

    lookup_input_next = next_main("LookIn")
    lookup_output_next = next_main("LookOut")
    lookup_multiplicity_next = next_main("LookupMultiplicity")
    is_padding_next = next_main("IsPadding")
    cascade_log_derivative_next = next_aux("CascadeTableServerLogDerivative")
    public_evaluation_argument_next = next_aux("PublicEvaluationArgument")

    padding_propagates = is_padding * (one() - is_padding_next)

    input_next_is_0_if_padding = is_padding_next * lookup_input_next
    input_increments_if_not_padding = ((one() - is_padding_next)
                                       * (lookup_input_next - lookup_input - one()))
    lookup_input_increments_iff_not_padding = (input_next_is_0_if_padding
                                               + input_increments_if_not_padding)

    cascade_table_indeterminate = challenge("CascadeLookupIndeterminate")
    compressed_row = (lookup_input_next * challenge("LookupTableInputWeight")
                      + lookup_output_next * challenge("LookupTableOutputWeight"))
    cascade_log_derivative_remains = (cascade_log_derivative_next
                                      - cascade_log_derivative)
    cascade_log_derivative_updates = (
        (cascade_log_derivative_next - cascade_log_derivative)
        * (cascade_table_indeterminate - compressed_row)
        - lookup_multiplicity_next)
    cascade_log_derivative_updates_iff_not_padding = (
        (one() - is_padding_next) * cascade_log_derivative_updates
        + is_padding_next * cascade_log_derivative_remains)

    public_indeterminate = challenge("LookupTablePublicIndeterminate")
    public_evaluation_argument_remains = (public_evaluation_argument_next
                                          - public_evaluation_argument)
    public_evaluation_argument_updates = (
        public_evaluation_argument_next
        - public_evaluation_argument * public_indeterminate
        - lookup_output_next)
    public_evaluation_argument_updates_iff_not_padding = (
        (one() - is_padding_next) * public_evaluation_argument_updates
        + is_padding_next * public_evaluation_argument_remains)

    return [padding_propagates, lookup_input_increments_iff_not_padding,
            cascade_log_derivative_updates_iff_not_padding,
            public_evaluation_argument_updates_iff_not_padding]


def terminal_constraints(b):
    challenge, constant, x_constant, main, aux = helpers(b, "lookup", False)
    terminal_matches = (aux("PublicEvaluationArgument")
                        - challenge("LookupTablePublicTerminal"))
    return [terminal_matches]
