"""RAM table AIR (contiguity via Bezout relation).

Transcribed from /root/reference/triton-air/src/table/ram.rs.
"""

from . import helpers

INSTRUCTION_TYPE_WRITE = 0
INSTRUCTION_TYPE_READ = 1
PADDING_INDICATOR = 2


def initial_constraints(b):
    challenge, constant, x_constant, main, aux = helpers(b, "ram", False)

    first_row_is_padding_row = main("InstructionType") - constant(PADDING_INDICATOR)
    first_row_is_not_padding_row = (
        (main("InstructionType") - constant(INSTRUCTION_TYPE_READ))
        * (main("InstructionType") - constant(INSTRUCTION_TYPE_WRITE)))

    bcpc0_is_0 = main("BezoutCoefficientPolynomialCoefficient0")
    bc0_is_0 = aux("BezoutCoefficient0")
    bc1_is_bcpc1 = (aux("BezoutCoefficient1")
                    - main("BezoutCoefficientPolynomialCoefficient1"))
    formal_derivative_is_1 = aux("FormalDerivative") - constant(1)
    running_product_init = (aux("RunningProductOfRAMP")
                            - challenge("RamTableBezoutRelationIndeterminate")
                            + main("RamPointer"))

    cjd_log_derivative_init = (
        aux("ClockJumpDifferenceLookupClientLogDerivative") - constant(0))

    compressed_row = (main("CLK") * challenge("RamClkWeight")
                      + main("InstructionType") * challenge("RamInstructionTypeWeight")
                      + main("RamPointer") * challenge("RamPointerWeight")
                      + main("RamValue") * challenge("RamValueWeight"))
    rppa_has_accumulated_first_row = (aux("RunningProductPermArg")
                                      - challenge("RamIndeterminate")
                                      + compressed_row)
    rppa_is_default_initial = aux("RunningProductPermArg") - constant(1)
    rppa_starts_correctly = (rppa_has_accumulated_first_row * first_row_is_padding_row
                             + rppa_is_default_initial * first_row_is_not_padding_row)

    return [bcpc0_is_0, bc0_is_0, bc1_is_bcpc1, running_product_init,
            formal_derivative_is_1, rppa_starts_correctly,
            cjd_log_derivative_init]


def consistency_constraints(b):
    challenge, constant, x_constant, main, aux = helpers(b, "ram", False)

    def instruction_type():
        return main("InstructionType")

    instruction_type_is_legal = (
        (instruction_type() - constant(INSTRUCTION_TYPE_WRITE))
        * (instruction_type() - constant(INSTRUCTION_TYPE_READ))
        * (instruction_type() - constant(PADDING_INDICATOR)))
    return [instruction_type_is_legal]


def transition_constraints(b):
    challenge, constant, x_constant, main, aux, next_main, next_aux = \
        helpers(b, "ram", True)

    one = constant(1)
    bezout_challenge = challenge("RamTableBezoutRelationIndeterminate")

    clock = main("CLK")
    ram_pointer = main("RamPointer")
    ram_value = main("RamValue")
    instruction_type = main("InstructionType")
    iord = main("InverseOfRampDifference")
    bcpc0 = main("BezoutCoefficientPolynomialCoefficient0")
    bcpc1 = main("BezoutCoefficientPolynomialCoefficient1")

    running_product_ram_pointer = aux("RunningProductOfRAMP")
    fd = aux("FormalDerivative")
    bc0 = aux("BezoutCoefficient0")
    bc1 = aux("BezoutCoefficient1")
    rppa = aux("RunningProductPermArg")
    cjd_log_derivative = aux("ClockJumpDifferenceLookupClientLogDerivative")

    clock_next = next_main("CLK")
    ram_pointer_next = next_main("RamPointer")
    ram_value_next = next_main("RamValue")
    instruction_type_next = next_main("InstructionType")
    bcpc0_next = next_main("BezoutCoefficientPolynomialCoefficient0")
    bcpc1_next = next_main("BezoutCoefficientPolynomialCoefficient1")

    running_product_ram_pointer_next = next_aux("RunningProductOfRAMP")
    fd_next = next_aux("FormalDerivative")
    bc0_next = next_aux("BezoutCoefficient0")
    bc1_next = next_aux("BezoutCoefficient1")
    rppa_next = next_aux("RunningProductPermArg")
    cjd_log_derivative_next = next_aux(
        "ClockJumpDifferenceLookupClientLogDerivative")

    next_row_is_padding_row = instruction_type_next - constant(PADDING_INDICATOR)
    padding_propagates = ((instruction_type - constant(INSTRUCTION_TYPE_READ))
                          * (instruction_type - constant(INSTRUCTION_TYPE_WRITE))
                          * next_row_is_padding_row)

    ram_pointer_difference = ram_pointer_next - ram_pointer
    ram_pointer_changes = one - ram_pointer_difference * iord

    iord_is_0_or_inverse = iord * ram_pointer_changes
    diff_is_0_or_iord_inverse = ram_pointer_difference * ram_pointer_changes

    value_stays = (ram_pointer_changes
                   * (constant(INSTRUCTION_TYPE_WRITE) - instruction_type_next)
                   * (ram_value_next - ram_value))

    bcpc0_only_changes_with_pointer = ram_pointer_changes * (bcpc0_next - bcpc0)
    bcpc1_only_changes_with_pointer = ram_pointer_changes * (bcpc1_next - bcpc1)

    rp_updates = (ram_pointer_difference
                  * (running_product_ram_pointer_next
                     - running_product_ram_pointer
                     * (bezout_challenge - ram_pointer_next))
                  + ram_pointer_changes
                  * (running_product_ram_pointer_next - running_product_ram_pointer))

    fd_updates = (ram_pointer_difference
                  * (fd_next - running_product_ram_pointer
                     - (bezout_challenge - ram_pointer_next) * fd)
                  + ram_pointer_changes * (fd_next - fd))

    bc0_updates = (ram_pointer_difference
                   * (bc0_next - bezout_challenge * bc0 - bcpc0_next)
                   + ram_pointer_changes * (bc0_next - bc0))
    bc1_updates = (ram_pointer_difference
                   * (bc1_next - bezout_challenge * bc1 - bcpc1_next)
                   + ram_pointer_changes * (bc1_next - bc1))

    compressed_row = (clock_next * challenge("RamClkWeight")
                      + ram_pointer_next * challenge("RamPointerWeight")
                      + ram_value_next * challenge("RamValueWeight")
                      + instruction_type_next * challenge("RamInstructionTypeWeight"))
    rppa_accumulates = rppa_next - rppa * (challenge("RamIndeterminate")
                                           - compressed_row)

    next_row_is_not_padding_row = (
        (instruction_type_next - constant(INSTRUCTION_TYPE_READ))
        * (instruction_type_next - constant(INSTRUCTION_TYPE_WRITE)))
    rppa_remains = rppa_next - rppa
    rppa_updates_correctly = (rppa_accumulates * next_row_is_padding_row
                              + rppa_remains * next_row_is_not_padding_row)

    clock_difference = clock_next - clock
    log_derivative_accumulates = (
        (cjd_log_derivative_next - cjd_log_derivative)
        * (challenge("ClockJumpDifferenceLookupIndeterminate") - clock_difference)
        - one)
    log_derivative_remains = cjd_log_derivative_next - cjd_log_derivative

    ld_acc_case = (log_derivative_accumulates * ram_pointer_changes
                   * next_row_is_padding_row)
    ld_rem_ptr_case = (log_derivative_remains * ram_pointer_difference
                       * next_row_is_padding_row)
    ld_rem_pad_case = log_derivative_remains * next_row_is_not_padding_row
    log_derivative_updates_correctly = ld_acc_case + ld_rem_ptr_case + ld_rem_pad_case

    return [padding_propagates, iord_is_0_or_inverse, diff_is_0_or_iord_inverse,
            value_stays, bcpc0_only_changes_with_pointer,
            bcpc1_only_changes_with_pointer, rp_updates, fd_updates,
            bc0_updates, bc1_updates, rppa_updates_correctly,
            log_derivative_updates_correctly]


def terminal_constraints(b):
    challenge, constant, x_constant, main, aux = helpers(b, "ram", False)

    bezout_relation_holds = (aux("BezoutCoefficient0") * aux("RunningProductOfRAMP")
                             + aux("BezoutCoefficient1") * aux("FormalDerivative")
                             - constant(1))
    return [bezout_relation_holds]
