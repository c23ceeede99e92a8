"""Master-table column layout: names, per-table offsets, global indices.

Column orders are protocol constants, transcribed from
/root/reference/triton-air/src/table_column.rs (enum orders) and
/root/reference/triton-air/src/table.rs:53-112 (table offsets). The master
main table starts with these 149 AIR columns; degree-lowering columns are
appended after, in an order fixed by the degree-lowering algorithm.
"""

from __future__ import annotations

TABLE_IDS = ("program", "processor", "op_stack", "ram", "jump_stack",
             "hash", "cascade", "lookup", "u32")

MAIN_COLUMNS = {
    "program": [
        "Address", "Instruction", "LookupMultiplicity", "IndexInChunk",
        "MaxMinusIndexInChunkInv", "IsHashInputPadding", "IsTablePadding",
    ],
    "processor": [
        "CLK", "IsPadding", "IP", "CI", "NIA",
        "IB0", "IB1", "IB2", "IB3", "IB4", "IB5", "IB6",
        "JSP", "JSO", "JSD",
        "ST0", "ST1", "ST2", "ST3", "ST4", "ST5", "ST6", "ST7",
        "ST8", "ST9", "ST10", "ST11", "ST12", "ST13", "ST14", "ST15",
        "OpStackPointer",
        "HV0", "HV1", "HV2", "HV3", "HV4", "HV5",
        "ClockJumpDifferenceLookupMultiplicity",
    ],
    "op_stack": ["CLK", "IB1ShrinkStack", "StackPointer",
                 "FirstUnderflowElement"],
    "ram": ["CLK", "InstructionType", "RamPointer", "RamValue",
            "InverseOfRampDifference",
            "BezoutCoefficientPolynomialCoefficient0",
            "BezoutCoefficientPolynomialCoefficient1"],
    "jump_stack": ["CLK", "CI", "JSP", "JSO", "JSD"],
    "hash": (
        ["Mode", "CI", "RoundNumber"]
        + [f"State{i}{part}LkIn" for i in range(4)
           for part in ("Highest", "MidHigh", "MidLow", "Lowest")]
        + [f"State{i}{part}LkOut" for i in range(4)
           for part in ("Highest", "MidHigh", "MidLow", "Lowest")]
        + [f"State{i}" for i in range(4, 16)]
        + [f"State{i}Inv" for i in range(4)]
        + [f"Constant{i}" for i in range(16)]
    ),
    "cascade": ["IsPadding", "LookInHi", "LookInLo", "LookOutHi",
                "LookOutLo", "LookupMultiplicity"],
    "lookup": ["IsPadding", "LookIn", "LookOut", "LookupMultiplicity"],
    "u32": ["CopyFlag", "Bits", "BitsMinus33Inv", "CI", "LHS", "LhsInv",
            "RHS", "RhsInv", "Result", "LookupMultiplicity"],
}

AUX_COLUMNS = {
    "program": ["InstructionLookupServerLogDerivative",
                "PrepareChunkRunningEvaluation",
                "SendChunkRunningEvaluation"],
    "processor": ["InputTableEvalArg", "OutputTableEvalArg",
                  "InstructionLookupClientLogDerivative",
                  "OpStackTablePermArg", "RamTablePermArg",
                  "JumpStackTablePermArg", "HashInputEvalArg",
                  "HashDigestEvalArg", "SpongeEvalArg",
                  "U32LookupClientLogDerivative",
                  "ClockJumpDifferenceLookupServerLogDerivative"],
    "op_stack": ["RunningProductPermArg",
                 "ClockJumpDifferenceLookupClientLogDerivative"],
    "ram": ["RunningProductOfRAMP", "FormalDerivative", "BezoutCoefficient0",
            "BezoutCoefficient1", "RunningProductPermArg",
            "ClockJumpDifferenceLookupClientLogDerivative"],
    "jump_stack": ["RunningProductPermArg",
                   "ClockJumpDifferenceLookupClientLogDerivative"],
    "hash": (
        ["ReceiveChunkRunningEvaluation", "HashInputRunningEvaluation",
         "HashDigestRunningEvaluation", "SpongeRunningEvaluation"]
        + [f"CascadeState{i}{part}ClientLogDerivative" for i in range(4)
           for part in ("Highest", "MidHigh", "MidLow", "Lowest")]
    ),
    "cascade": ["HashTableServerLogDerivative",
                "LookupTableClientLogDerivative"],
    "lookup": ["CascadeTableServerLogDerivative", "PublicEvaluationArgument"],
    "u32": ["LookupServerLogDerivative"],
}

NUM_MAIN_AIR_COLUMNS = sum(len(v) for v in MAIN_COLUMNS.values())  # 149
NUM_AUX_AIR_COLUMNS = sum(len(v) for v in AUX_COLUMNS.values())  # 49
assert NUM_MAIN_AIR_COLUMNS == 149
assert NUM_AUX_AIR_COLUMNS == 49

MAIN_TABLE_START = {}
AUX_TABLE_START = {}
_m = _a = 0
for _t in TABLE_IDS:
    MAIN_TABLE_START[_t] = _m
    AUX_TABLE_START[_t] = _a
    _m += len(MAIN_COLUMNS[_t])
    _a += len(AUX_COLUMNS[_t])

MAIN_INDEX = {}
AUX_INDEX = {}
for _t in TABLE_IDS:
    for _i, _name in enumerate(MAIN_COLUMNS[_t]):
        MAIN_INDEX[(_t, _name)] = MAIN_TABLE_START[_t] + _i
    for _i, _name in enumerate(AUX_COLUMNS[_t]):
        AUX_INDEX[(_t, _name)] = AUX_TABLE_START[_t] + _i


def main_index(table: str, name: str) -> int:
    """Global master-main-table column index."""
    return MAIN_INDEX[(table, name)]


def aux_index(table: str, name: str) -> int:
    """Global master-aux-table column index (before degree-lowering cols)."""
    return AUX_INDEX[(table, name)]


def local_main_index(table: str, name: str) -> int:
    return MAIN_COLUMNS[table].index(name)
