"""Per-table AIR constraint definitions (symbolic circuits).

Each module transcribes the corresponding file in
/root/reference/triton-air/src/table/ into the Python circuit DSL, keeping
statement order (node-creation order feeds the deterministic degree
lowering).
"""

from .. import challenges as _chal
from .. import circuit as _c
from .. import columns as _cols


def helpers(b: "_c.Builder", table: str, dual: bool):
    """Constraint-building helpers bound to one table's column offsets."""
    def challenge(name):
        return b.challenge(_chal.ID[name])

    def constant(v):
        return b.b_constant(int(v))

    def x_constant(v):
        return b.x_constant(v)

    if dual:
        def main(name):
            return b.input(_c.MAIN, _cols.main_index(table, name))

        def aux(name):
            return b.input(_c.AUX, _cols.aux_index(table, name))

        def next_main(name):
            return b.input(_c.NEXT_MAIN, _cols.main_index(table, name))

        def next_aux(name):
            return b.input(_c.NEXT_AUX, _cols.aux_index(table, name))

        return challenge, constant, x_constant, main, aux, next_main, next_aux

    def main(name):
        return b.input(_c.MAIN, _cols.main_index(table, name))

    def aux(name):
        return b.input(_c.AUX, _cols.aux_index(table, name))

    return challenge, constant, x_constant, main, aux
