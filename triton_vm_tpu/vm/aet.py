"""Algebraic Execution Trace: the primary proving witness.

Mirrors /root/reference/triton-vm/src/aet.rs:41-362: processor trace rows,
op-stack underflow rows, RAM rows, three hash-trace segments (program
attestation / sponge / hash), u32 entry multiset, cascade & lookup table
multiplicities, padded height.
"""

from __future__ import annotations

import numpy as np

from ..air import columns
from ..crypto import tip5
from ..fields.bfe import P, R
from ..isa.instruction import Instruction

LOOKUP_TABLE_HEIGHT = 1 << 8
HASH_W = len(columns.MAIN_COLUMNS["hash"])
_H = {name: i for i, name in enumerate(columns.MAIN_COLUMNS["hash"])}

OPCODE_HASH = Instruction("hash").opcode
OPCODE_SPONGE_INIT = Instruction("sponge_init").opcode


def bfe_to_16_bit_limbs(x: int) -> list[int]:
    """sigma(R*x) 16-bit chunks, little-endian
    (/root/reference/triton-vm/src/table/hash.rs:42-45)."""
    rx = x * R % P
    return [(rx >> s) & 0xFFFF for s in (0, 16, 32, 48)]


def lookup_16_bit_limb(limb: int) -> int:
    lo = tip5.LOOKUP_TABLE[limb & 0xFF]
    hi = tip5.LOOKUP_TABLE[(limb >> 8) & 0xFF]
    return (hi << 8) | lo


def trace_row_to_hash_table_row(state, round_number: int) -> list[int]:
    """One permutation-trace state -> 67-column hash-table row (CI, Mode
    unset; /root/reference/triton-vm/src/table/hash.rs:61-235)."""
    row = [0] * HASH_W
    row[_H["RoundNumber"]] = round_number
    for i in range(4):
        limbs = bfe_to_16_bit_limbs(state[i])
        for j, part in enumerate(("Lowest", "MidLow", "MidHigh", "Highest")):
            row[_H[f"State{i}{part}LkIn"]] = limbs[j]
            row[_H[f"State{i}{part}LkOut"]] = lookup_16_bit_limb(limbs[j])
        high_limbs = (limbs[3] << 16) + limbs[2]
        to_invert = ((1 << 32) - 1 - high_limbs) % P
        row[_H[f"State{i}Inv"]] = pow(to_invert, P - 2, P) if to_invert else 0
    for i in range(4, 16):
        row[_H[f"State{i}"]] = state[i]
    if round_number < tip5.NUM_ROUNDS:
        rcs = tip5.ROUND_CONSTANTS[round_number * 16:(round_number + 1) * 16]
        for i in range(16):
            row[_H[f"Constant{i}"]] = rcs[i]
    return row


class AlgebraicExecutionTrace:
    def __init__(self, program):
        self.program = program
        self.instruction_multiplicities = [0] * program.len_bwords()
        self.processor_rows: list[list[int]] = []
        self.op_stack_rows: list[tuple] = []  # (clk, shrink, pointer, underflow)
        self.ram_rows: list[tuple] = []  # (clk, instruction_type, ptr, val)
        self.program_hash_rows: list[list[int]] = []
        self.hash_rows: list[list[int]] = []
        self.sponge_rows: list[list[int]] = []
        self.u32_entries: dict[tuple, int] = {}  # (name, lhs, rhs) -> count
        self.cascade_multiplicities: dict[int, int] = {}  # 16-bit limb -> n
        self.lookup_multiplicities = [0] * LOOKUP_TABLE_HEIGHT
        self._fill_program_hash_trace()

    # ------------------------------------------------------------- heights

    def padded_program_length(self) -> int:
        n = self.program.len_bwords() + 1
        return -(-n // tip5.RATE) * tip5.RATE

    def height_of_table(self, table: str) -> int:
        return {
            "program": self.padded_program_length(),
            "processor": len(self.processor_rows),
            "op_stack": len(self.op_stack_rows),
            "ram": len(self.ram_rows),
            "jump_stack": len(self.processor_rows),
            "hash": len(self.program_hash_rows) + len(self.hash_rows)
                    + len(self.sponge_rows),
            "cascade": len(self.cascade_multiplicities),
            "lookup": LOOKUP_TABLE_HEIGHT,
            "u32": self._u32_table_height(),
        }[table]

    def height(self) -> int:
        return max(self.height_of_table(t) for t in columns.TABLE_IDS)

    def padded_height(self) -> int:
        h = self.height()
        return 1 << (h - 1).bit_length() if h > 1 else 1

    def _u32_table_height(self) -> int:
        total = 0
        for (name, lhs, rhs) in self.u32_entries:
            dominant = rhs if name == "pow" else max(lhs, rhs)
            total += 1 if dominant == 0 else 2 + dominant.bit_length() - 1
        return total

    # ----------------------------------------------------------- recording

    def _fill_program_hash_trace(self):
        """Program attestation (aet.rs:187-213)."""
        padded = self.program.to_bwords() + [1]
        while len(padded) % tip5.RATE:
            padded.append(0)
        sponge = [0] * 16
        for i in range(0, len(padded), tip5.RATE):
            sponge[:tip5.RATE] = padded[i:i + tip5.RATE]
            trace = tip5.permutation_trace(sponge)
            sponge = list(trace[-1])
            self._increase_lookup_multiplicities(trace)
            for rn, state in enumerate(trace):
                row = trace_row_to_hash_table_row(state, rn)
                row[_H["CI"]] = OPCODE_HASH
                self.program_hash_rows.append(row)
        assert tuple(sponge[:5]) == self.program.hash()

    def record_state(self, state):
        ip = state.instruction_pointer
        if ip >= len(self.instruction_multiplicities):
            from .machine import VMError
            raise VMError("instruction pointer overflow", state)
        self.instruction_multiplicities[ip] += 1
        self.processor_rows.append(state.to_processor_row())

    def record_co_processor_call(self, call):
        from .machine import OpStackCall, RamCall, SpongeStateReset, Tip5Trace, U32Call

        if isinstance(call, Tip5Trace):
            if call.instruction == "hash":
                self._append_permutation_trace(
                    call.trace, self.hash_rows, OPCODE_HASH)
            else:
                opcode = Instruction(call.instruction).opcode
                self._append_permutation_trace(
                    call.trace, self.sponge_rows, opcode)
        elif isinstance(call, SpongeStateReset):
            row = trace_row_to_hash_table_row([0] * 16, 0)
            row[_H["CI"]] = OPCODE_SPONGE_INIT
            self.sponge_rows.append(row)
        elif isinstance(call, U32Call):
            key = (call.instruction, call.lhs, call.rhs)
            self.u32_entries[key] = self.u32_entries.get(key, 0) + 1
        elif isinstance(call, OpStackCall):
            self.op_stack_rows.append(
                (call.clk, 0 if call.is_write else 1,
                 call.op_stack_pointer, call.first_underflow_element))
        elif isinstance(call, RamCall):
            self.ram_rows.append(
                (call.clk, 0 if call.is_write else 1,
                 call.ram_pointer, call.ram_value))
        else:
            raise TypeError(f"unknown coprocessor call {call!r}")

    def _append_permutation_trace(self, trace, rows_out, opcode):
        self._increase_lookup_multiplicities(trace)
        for rn, state in enumerate(trace):
            row = trace_row_to_hash_table_row(state, rn)
            row[_H["CI"]] = opcode
            rows_out.append(row)

    def _increase_lookup_multiplicities(self, trace):
        # last trace row is the output: no lookups for it (aet.rs:301-309)
        for state in trace[:-1]:
            for elem in state[:tip5.NUM_SPLIT_AND_LOOKUP]:
                for limb in bfe_to_16_bit_limbs(elem):
                    if limb in self.cascade_multiplicities:
                        self.cascade_multiplicities[limb] += 1
                    else:
                        self.cascade_multiplicities[limb] = 1
                        self.lookup_multiplicities[limb & 0xFF] += 1
                        self.lookup_multiplicities[(limb >> 8) & 0xFF] += 1
