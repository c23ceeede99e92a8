"""Constraint-circuit DSL: hash-consed DAG + degree lowering.

Reimplements /root/reference/triton-constraint-circuit/src/lib.rs with the
same observable semantics, because the degree-lowering output fixes the
master tables' derived-column layout (a protocol constant):

  * node ids are assigned in creation order; hash-consing returns existing
    nodes ((rhs,lhs) probed before (lhs,rhs), lib.rs:666-720);
  * sub is add(lhs, mul(-1, rhs)); neg is mul(-1, x) (lib.rs:742-763);
  * add/mul absorb 0/1 operands; constant pairs fold (lib.rs:672-714);
  * degree: zero -> -1, mul adds, add maxes (lib.rs:505-519);
  * lowering picks the most-frequent (by DAG-path count) low-degree
    descendant of any too-high-degree node, ties broken by max degree then
    min id (lib.rs:906-958); substitution redirects all references and
    emits `new_var - chosen` (lib.rs:862-897).

Path-count occurrence semantics reproduce the reference's tree-flattening
iterator (lib.rs:401-436) via a DAG DP instead of exponential traversal.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from ..fields import xfe as _xfe
from ..fields.bfe import P

TARGET_DEGREE = 4

# input kinds
MAIN = "main"
AUX = "aux"
NEXT_MAIN = "next_main"
NEXT_AUX = "next_aux"


class Node:
    __slots__ = ("id", "kind", "value", "op", "lhs", "rhs")

    def __init__(self, id, kind, value=None, op=None, lhs=None, rhs=None):
        self.id = id
        self.kind = kind  # 'bconst' | 'xconst' | 'input' | 'challenge' | 'binop'
        self.value = value  # int / (c0,c1,c2) / (input_kind, col) / chal idx
        self.op = op  # '+' | '*'
        self.lhs = lhs
        self.rhs = rhs

    def is_zero(self):
        return (self.kind == "bconst" and self.value == 0) or (
            self.kind == "xconst" and self.value == _xfe.ZERO)

    def is_one(self):
        return (self.kind == "bconst" and self.value == 1) or (
            self.kind == "xconst" and self.value == _xfe.ONE)

    def key(self):
        if self.kind == "binop":
            return ("binop", self.op, self.lhs.id, self.rhs.id)
        return (self.kind, self.value)

    def __repr__(self):
        if self.kind == "binop":
            return f"({self.lhs!r} {self.op} {self.rhs!r})"
        if self.kind == "input":
            return f"{self.value[0]}[{self.value[1]}]"
        if self.kind == "challenge":
            return f"ch[{self.value}]"
        return f"{self.value}"


class Builder:
    def __init__(self):
        self.id_counter = 0
        self.nodes: dict[int, Node] = {}
        self.by_key: dict[tuple, Node] = {}

    # ------------------------------------------------------------- leaves

    def _make_leaf(self, kind, value) -> "Expr":
        if kind == "xconst":
            c0, c1, c2 = value
            if c1 == 0 and c2 == 0:
                kind, value = "bconst", c0
        key = (kind, value)
        node = self.by_key.get(key)
        if node is None:
            node = Node(self.id_counter, kind, value)
            self.nodes[node.id] = node
            self.by_key[key] = node
            self.id_counter += 1
        return Expr(self, node)

    def b_constant(self, v: int) -> "Expr":
        return self._make_leaf("bconst", v % P)

    def x_constant(self, v) -> "Expr":
        return self._make_leaf("xconst", tuple(c % P for c in v))

    def input(self, input_kind: str, col: int) -> "Expr":
        return self._make_leaf("input", (input_kind, col))

    def challenge(self, idx) -> "Expr":
        idx = int(idx)
        return self._make_leaf("challenge", idx)

    def zero(self):
        return self.b_constant(0)

    def one(self):
        return self.b_constant(1)

    def minus_one(self):
        return self.b_constant(P - 1)

    # -------------------------------------------------------------- binops

    def binop(self, op: str, lhs: "Expr", rhs: "Expr") -> "Expr":
        ln, rn = lhs.node, rhs.node
        if op == "+":
            if rn.is_zero():
                return lhs
            if ln.is_zero():
                return rhs
        if op == "*":
            if rn.is_one():
                return lhs
            if ln.is_one():
                return rhs
            if rn.is_zero():
                return rhs
            if ln.is_zero():
                return lhs
        # constant folding
        if ln.kind in ("bconst", "xconst") and rn.kind in ("bconst", "xconst"):
            lv = ln.value if ln.kind == "xconst" else _xfe.lift(ln.value)
            rv = rn.value if rn.kind == "xconst" else _xfe.lift(rn.value)
            res = _xfe.add(lv, rv) if op == "+" else _xfe.mul(lv, rv)
            if ln.kind == "bconst" and rn.kind == "bconst":
                return self.b_constant(res[0])
            return self.x_constant(res)
        # hash consing: commutative probe (rhs,lhs) first, then (lhs,rhs)
        node = self.by_key.get(("binop", op, rn.id, ln.id))
        if node is not None:
            return Expr(self, node)
        node = self.by_key.get(("binop", op, ln.id, rn.id))
        if node is not None:
            return Expr(self, node)
        node = Node(self.id_counter, "binop", op=op, lhs=ln, rhs=rn)
        self.nodes[node.id] = node
        self.by_key[node.key()] = node
        self.id_counter += 1
        return Expr(self, node)

    def redirect(self, old_id: int, new_node: Node):
        """Point every reference to `old_id` at `new_node`; drop the old
        node from the builder (lib.rs:1113-1133)."""
        self.nodes.pop(old_id, None)
        for node in self.nodes.values():
            if node.kind == "binop":
                if node.lhs.id == old_id:
                    node.lhs = new_node
                if node.rhs.id == old_id:
                    node.rhs = new_node
        # rebuild the structural key map (children ids changed)
        self.by_key = {}
        for nid in sorted(self.nodes):
            node = self.nodes[nid]
            self.by_key.setdefault(node.key(), node)


@dataclass
class Expr:
    """Monad-style wrapper for ergonomic arithmetic."""

    builder: Builder
    node: Node

    def __add__(self, other):
        return self.builder.binop("+", self, self._coerce(other))

    def __radd__(self, other):
        return self._coerce(other) + self

    def __mul__(self, other):
        return self.builder.binop("*", self, self._coerce(other))

    def __rmul__(self, other):
        return self._coerce(other) * self

    def __neg__(self):
        return self.builder.binop("*", self.builder.minus_one(), self)

    def __sub__(self, other):
        return self + (-self._coerce(other))

    def __rsub__(self, other):
        return self._coerce(other) + (-self)

    def _coerce(self, other):
        if isinstance(other, Expr):
            return other
        return self.builder.b_constant(int(other))


# --------------------------------------------------------------- analysis

def degree(node: Node, memo: Optional[dict] = None) -> int:
    if memo is None:
        memo = {}
    d = memo.get(node.id)
    if d is not None:
        return d
    if node.is_zero():
        d = -1
    elif node.kind in ("bconst", "xconst", "challenge"):
        d = 0
    elif node.kind == "input":
        d = 1
    else:
        dl = degree(node.lhs, memo)
        dr = degree(node.rhs, memo)
        if node.op == "+":
            d = max(dl, dr)
        else:
            d = -1 if min(dl, dr) <= -1 else dl + dr
    memo[node.id] = d
    return d


def evaluates_to_base_element(node: Node, memo: Optional[dict] = None) -> bool:
    if memo is None:
        memo = {}
    r = memo.get(node.id)
    if r is not None:
        return r
    if node.kind == "bconst":
        r = True
    elif node.kind == "xconst" or node.kind == "challenge":
        r = False
    elif node.kind == "input":
        r = node.value[0] in (MAIN, NEXT_MAIN)
    else:
        r = (evaluates_to_base_element(node.lhs, memo)
             and evaluates_to_base_element(node.rhs, memo))
    memo[node.id] = r
    return r


def _all_nodes(roots):
    """All distinct nodes reachable from the roots, plus per-node DAG-path
    counts matching the reference's duplicate-keeping tree iterator."""
    counts: dict[int, int] = {}
    nodes: dict[int, Node] = {}
    # topological order via DFS
    order = []
    seen = set()

    def dfs(n):
        if n.id in seen:
            return
        seen.add(n.id)
        if n.kind == "binop":
            dfs(n.lhs)
            dfs(n.rhs)
        order.append(n)
        nodes[n.id] = n

    for r in roots:
        dfs(r)
    for r in roots:
        counts[r.id] = counts.get(r.id, 0) + 1
    for n in reversed(order):  # parents before children
        c = counts.get(n.id, 0)
        if c and n.kind == "binop":
            counts[n.lhs.id] = counts.get(n.lhs.id, 0) + c
            counts[n.rhs.id] = counts.get(n.rhs.id, 0) + c
    return nodes, counts


def multicircuit_degree(constraints) -> int:
    memo = {}
    return max((degree(c.node, memo) for c in constraints), default=-1)


def pick_node_to_substitute(constraints, target_degree: int) -> int:
    """lib.rs:906-958 heuristic, path-count faithful."""
    roots = [c.node for c in constraints]
    nodes, _ = _all_nodes(roots)
    memo = {}
    degrees = {nid: degree(n, memo) for nid, n in nodes.items()}

    high_ids = []
    seen = set()
    for nid, n in nodes.items():
        if degrees[nid] > target_degree and nid not in seen:
            seen.add(nid)
            high_ids.append(nid)
    high_nodes = [nodes[i] for i in high_ids]
    # candidates: descendants (path-counted from high-degree roots) with
    # 1 < degree <= target
    _, counts = _all_nodes(high_nodes)
    cand = {nid: c for nid, c in counts.items()
            if 1 < degrees[nid] <= target_degree}
    assert cand, "cannot lower degree"
    max_count = max(cand.values())
    tied = [nid for nid, c in cand.items() if c == max_count]
    max_deg = max(degrees[nid] for nid in tied)
    tied = [nid for nid in tied if degrees[nid] == max_deg]
    return min(tied)


def lower_to_degree(builder: Builder, constraints: list, target_degree: int,
                    num_main_cols: int, num_aux_cols: int):
    """In-place degree lowering; returns (main_subs, aux_subs) where each
    substitution is the Expr `new_var - replaced_expr`
    (lib.rs:820-897)."""
    main_subs, aux_subs = [], []
    if not constraints:
        return main_subs, aux_subs
    while multicircuit_degree(constraints) > target_degree:
        chosen_id = pick_node_to_substitute(constraints, target_degree)
        chosen = None
        for c in constraints:
            found = _find_node(c.node, chosen_id)
            if found is not None:
                chosen = found
                break
        assert chosen is not None
        chosen_expr = Expr(builder, chosen)
        if evaluates_to_base_element(chosen):
            col = num_main_cols + len(main_subs)
            new_var = builder.input(MAIN, col)
        else:
            col = num_aux_cols + len(aux_subs)
            new_var = builder.input(AUX, col)
        builder.redirect(chosen_id, new_var.node)
        for c in constraints:
            if c.node.id == chosen_id:
                c.node = new_var.node
        sub = new_var - chosen_expr
        if evaluates_to_base_element(sub.node):
            main_subs.append(sub)
        else:
            aux_subs.append(sub)
    return main_subs, aux_subs


def _find_node(root: Node, nid: int) -> Optional[Node]:
    stack = [root]
    seen = set()
    while stack:
        n = stack.pop()
        if n.id == nid:
            return n
        if n.id in seen:
            continue
        seen.add(n.id)
        if n.kind == "binop":
            stack.append(n.lhs)
            stack.append(n.rhs)
    return None
