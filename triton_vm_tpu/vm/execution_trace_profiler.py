"""Execution-trace profiler for Triton programs.

Mirrors /root/reference/triton-vm/src/execution_trace_profiler.rs and
`VM::profile` (vm.rs:208-242): spans open on `call` and close when the
jump stack shrinks (`return` / `recurse_or_return` in return mode);
each line records the per-table AET heights at span start and stop, so
program authors can see which code blocks dominate the padded height.
"""

from __future__ import annotations

from dataclasses import dataclass, field

_TABLES = ("program", "processor", "op_stack", "ram", "jump_stack",
           "hash", "cascade", "lookup", "u32")


@dataclass(frozen=True)
class VMTableHeights:
    """execution_trace_profiler.rs:63-75."""

    program: int = 0
    processor: int = 0
    op_stack: int = 0
    ram: int = 0
    jump_stack: int = 0
    hash: int = 0
    cascade: int = 0
    lookup: int = 0
    u32: int = 0

    @classmethod
    def of_aet(cls, aet) -> "VMTableHeights":
        return cls(**{t: aet.height_of_table(t) for t in _TABLES})

    def __sub__(self, other):
        return VMTableHeights(**{
            t: getattr(self, t) - getattr(other, t) for t in _TABLES})


@dataclass
class ProfileLine:
    """execution_trace_profiler.rs:27-41."""

    label: str
    call_depth: int
    table_heights_start: VMTableHeights
    table_heights_stop: VMTableHeights = field(
        default_factory=VMTableHeights)

    @property
    def table_height_contributions(self) -> VMTableHeights:
        return self.table_heights_stop - self.table_heights_start


@dataclass
class ExecutionTraceProfile:
    """execution_trace_profiler.rs:49-59; str() renders the report."""

    total: VMTableHeights
    profile: list[ProfileLine]
    padded_height: int

    def __str__(self) -> str:
        name_w = max([len("  " * ln.call_depth + ln.label)
                      for ln in self.profile] + [10]) + 2
        header = (f"{'span':{name_w}} " +
                  " ".join(f"{t:>10}" for t in _TABLES))
        lines = [header, "-" * len(header)]
        for ln in self.profile:
            contrib = ln.table_height_contributions
            lines.append(
                f"{'  ' * ln.call_depth + ln.label:{name_w}} " +
                " ".join(f"{getattr(contrib, t):>10}" for t in _TABLES))
        lines.append("-" * len(header))
        lines.append(f"{'total':{name_w}} " +
                     " ".join(f"{getattr(self.total, t):>10}"
                              for t in _TABLES))
        lines.append(f"padded height: {self.padded_height}")
        return "\n".join(lines)


class ExecutionTraceProfiler:
    """execution_trace_profiler.rs:76-117."""

    def __init__(self):
        self.call_stack: list[int] = []
        self.profile: list[ProfileLine] = []

    def enter_span(self, label: str, aet) -> None:
        line = ProfileLine(label, len(self.call_stack),
                           VMTableHeights.of_aet(aet))
        self.call_stack.append(len(self.profile))
        self.profile.append(line)

    def exit_span(self, aet) -> None:
        if self.call_stack:
            idx = self.call_stack.pop()
            self.profile[idx].table_heights_stop = VMTableHeights.of_aet(aet)

    def finish(self, aet) -> ExecutionTraceProfile:
        heights = VMTableHeights.of_aet(aet)
        for idx in self.call_stack:
            self.profile[idx].table_heights_stop = heights
        return ExecutionTraceProfile(heights, self.profile,
                                     aet.padded_height())
