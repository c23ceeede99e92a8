"""Master AIR: collect all 9 tables' constraints, add the grand cross-table
argument, run degree lowering — fixing the derived-column layout.

Mirrors /root/reference/triton-constraint-builder/src/lib.rs:31-208 (table
order, lowering phase order init->cons->tran->term with evolving column
counts) and triton-air/src/cross_table_argument.rs:105-215 (grand cross
table argument).
"""

from __future__ import annotations

import functools

from . import challenges as chal
from . import circuit as C
from . import columns
from .tables import (cascade, hash as hash_table, jump_stack, lookup,
                     op_stack, processor, program, ram, u32)

TARGET_DEGREE = 4

_TABLES = [program, processor, op_stack, ram, jump_stack, hash_table,
           cascade, lookup, u32]


def _grand_cross_table_terminal(b):
    challenge = lambda name: b.challenge(chal.ID[name])
    aux = lambda table, name: b.input(C.AUX, columns.aux_index(table, name))

    program_attestation = (aux("program", "SendChunkRunningEvaluation")
                           - aux("hash", "ReceiveChunkRunningEvaluation"))
    input_to_processor = (challenge("StandardInputTerminal")
                          - aux("processor", "InputTableEvalArg"))
    processor_to_output = (aux("processor", "OutputTableEvalArg")
                           - challenge("StandardOutputTerminal"))
    instruction_lookup = (aux("processor", "InstructionLookupClientLogDerivative")
                          - aux("program", "InstructionLookupServerLogDerivative"))
    processor_to_op_stack = (aux("processor", "OpStackTablePermArg")
                             - aux("op_stack", "RunningProductPermArg"))
    processor_to_ram = (aux("processor", "RamTablePermArg")
                        - aux("ram", "RunningProductPermArg"))
    processor_to_jump_stack = (aux("processor", "JumpStackTablePermArg")
                               - aux("jump_stack", "RunningProductPermArg"))
    hash_input = (aux("processor", "HashInputEvalArg")
                  - aux("hash", "HashInputRunningEvaluation"))
    hash_digest = (aux("hash", "HashDigestRunningEvaluation")
                   - aux("processor", "HashDigestEvalArg"))
    sponge = (aux("processor", "SpongeEvalArg")
              - aux("hash", "SpongeRunningEvaluation"))
    hash_to_cascade = aux("cascade", "HashTableServerLogDerivative")
    for i in range(4):
        for part in ("Highest", "MidHigh", "MidLow", "Lowest"):
            hash_to_cascade = hash_to_cascade - aux(
                "hash", f"CascadeState{i}{part}ClientLogDerivative")
    cascade_to_lookup = (aux("cascade", "LookupTableClientLogDerivative")
                         - aux("lookup", "CascadeTableServerLogDerivative"))
    processor_to_u32 = (aux("processor", "U32LookupClientLogDerivative")
                        - aux("u32", "LookupServerLogDerivative"))
    clock_jump_difference_lookup = (
        aux("processor", "ClockJumpDifferenceLookupServerLogDerivative")
        - aux("op_stack", "ClockJumpDifferenceLookupClientLogDerivative")
        - aux("ram", "ClockJumpDifferenceLookupClientLogDerivative")
        - aux("jump_stack", "ClockJumpDifferenceLookupClientLogDerivative"))

    return [program_attestation, input_to_processor, processor_to_output,
            instruction_lookup, processor_to_op_stack, processor_to_ram,
            processor_to_jump_stack, hash_input, hash_digest, sponge,
            hash_to_cascade, cascade_to_lookup, processor_to_u32,
            clock_jump_difference_lookup]


class MasterAir:
    """The complete degree-lowered constraint system."""

    def __init__(self):
        self.builders = {}
        self.constraints = {}
        self.substitutions = {}

        num_main = columns.NUM_MAIN_AIR_COLUMNS  # 149
        num_aux = columns.NUM_AUX_AIR_COLUMNS  # 49

        specs = [
            ("init", "initial_constraints"),
            ("cons", "consistency_constraints"),
            ("tran", "transition_constraints"),
            ("term", "terminal_constraints"),
        ]
        raw = {}
        for key, method in specs:
            b = C.Builder()
            cs = []
            for table in _TABLES:
                cs.extend(getattr(table, method)(b))
            if key == "term":
                cs.extend(_grand_cross_table_terminal(b))
            raw[key] = (b, cs)
            self.builders[key] = b

        self.num_raw = {k: len(cs) for k, (b, cs) in raw.items()}

        # degree lowering with evolving column counts (lib.rs:135-171)
        main_cols, aux_cols = num_main, num_aux
        self.main_subs = {}
        self.aux_subs = {}
        for key in ("init", "cons", "tran", "term"):
            b, cs = raw[key]
            m_subs, a_subs = C.lower_to_degree(
                b, cs, TARGET_DEGREE, main_cols, aux_cols)
            main_cols += len(m_subs)
            aux_cols += len(a_subs)
            self.main_subs[key] = m_subs
            self.aux_subs[key] = a_subs
            # substitution-induced constraints are appended (main then aux,
            # lib.rs:174-185), and the generated evaluators then PARTITION
            # each phase into base-field-evaluating constraints first,
            # extension-field ones second (codegen.rs:209-214,246-260).
            # The partitioned order is the protocol order: it fixes the
            # quotient-weight assignment and the evaluator output layout.
            combined = cs + m_subs + a_subs
            base = [c for c in combined
                    if C.evaluates_to_base_element(c.node)]
            ext = [c for c in combined
                   if not C.evaluates_to_base_element(c.node)]
            self.constraints[key] = base + ext

        self.num_main_columns = main_cols  # 379 expected
        self.num_aux_columns = aux_cols + 1  # + batch randomizer -> 91

    @property
    def counts(self):
        return {k: len(v) for k, v in self.constraints.items()}

    def max_degree(self):
        out = -1
        for cs in self.constraints.values():
            memo = {}  # node ids are per-builder; don't share memos
            for cexpr in cs:
                out = max(out, C.degree(cexpr.node, memo))
        return out


@functools.lru_cache(maxsize=1)
def master_air() -> MasterAir:
    """Build (once) the degree-lowered master constraint system."""
    return MasterAir()
