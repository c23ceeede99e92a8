"""Jump-stack table AIR.

Transcribed from /root/reference/triton-air/src/table/jump_stack.rs.
"""

from . import helpers
from ...isa.instruction import Instruction

CALL = Instruction("call", 0).opcode
RETURN = Instruction("return").opcode
RECURSE_OR_RETURN = Instruction("recurse_or_return").opcode


def initial_constraints(b):
    challenge, constant, x_constant, main, aux = helpers(b, "jump_stack", False)

    clk = main("CLK")
    jsp = main("JSP")
    jso = main("JSO")
    jsd = main("JSD")
    ci = main("CI")
    rppa = aux("RunningProductPermArg")
    cjd_log_derivative = aux("ClockJumpDifferenceLookupClientLogDerivative")

    processor_perm_indeterminate = challenge("JumpStackIndeterminate")
    # clk, jsp, jso, jsd are all constrained to 0, so they are omitted here
    compressed_row = challenge("JumpStackCiWeight") * ci
    rppa_starts_correctly = rppa - (processor_perm_indeterminate - compressed_row)

    cjd_starts_correctly = cjd_log_derivative - constant(0)

    return [clk, jsp, jso, jsd, rppa_starts_correctly, cjd_starts_correctly]


def consistency_constraints(b):
    return []


def transition_constraints(b):
    challenge, constant, x_constant, main, aux, next_main, next_aux = \
        helpers(b, "jump_stack", True)

    def one():
        return constant(1)

    call_opcode = constant(CALL)
    return_opcode = constant(RETURN)
    recurse_or_return_opcode = constant(RECURSE_OR_RETURN)

    clk = main("CLK")
    ci = main("CI")
    jsp = main("JSP")
    jso = main("JSO")
    jsd = main("JSD")
    rppa = aux("RunningProductPermArg")
    cjd_log_derivative = aux("ClockJumpDifferenceLookupClientLogDerivative")

    clk_next = next_main("CLK")
    ci_next = next_main("CI")
    jsp_next = next_main("JSP")
    jso_next = next_main("JSO")
    jsd_next = next_main("JSD")
    rppa_next = next_aux("RunningProductPermArg")
    cjd_log_derivative_next = next_aux(
        "ClockJumpDifferenceLookupClientLogDerivative")

    jsp_inc_or_stays = (jsp_next - jsp - one()) * (jsp_next - jsp)

    jsp_inc_by_one_or_ci_can_return = ((jsp_next - jsp - one())
                                       * (ci - return_opcode)
                                       * (ci - recurse_or_return_opcode))
    jsp_inc_or_jso_stays = jsp_inc_by_one_or_ci_can_return * (jso_next - jso)
    jsp_inc_or_jsd_stays = jsp_inc_by_one_or_ci_can_return * (jsd_next - jsd)
    jsp_inc_or_clk_inc_or_call = (jsp_inc_by_one_or_ci_can_return
                                  * (clk_next - clk - one())
                                  * (ci - call_opcode))

    compressed_row = (challenge("JumpStackClkWeight") * clk_next
                      + challenge("JumpStackCiWeight") * ci_next
                      + challenge("JumpStackJspWeight") * jsp_next
                      + challenge("JumpStackJsoWeight") * jso_next
                      + challenge("JumpStackJsdWeight") * jsd_next)
    rppa_updates_correctly = rppa_next - rppa * (
        challenge("JumpStackIndeterminate") - compressed_row)

    log_derivative_remains = cjd_log_derivative_next - cjd_log_derivative
    clk_diff = clk_next - clk
    log_derivative_accumulates = (
        (cjd_log_derivative_next - cjd_log_derivative)
        * (challenge("ClockJumpDifferenceLookupIndeterminate") - clk_diff)
        - one())
    log_derivative_updates_correctly = (
        (jsp_next - jsp - one()) * log_derivative_accumulates
        + (jsp_next - jsp) * log_derivative_remains)

    return [jsp_inc_or_stays, jsp_inc_or_jso_stays, jsp_inc_or_jsd_stays,
            jsp_inc_or_clk_inc_or_call, rppa_updates_correctly,
            log_derivative_updates_correctly]


def terminal_constraints(b):
    return []
