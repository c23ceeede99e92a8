"""Constraint evaluation: linearize circuit DAGs and interpret them
- on host (Python-int XFE arithmetic; used by the verifier at the OOD point
  and by tests), and
- on device (gf/gfx limb arithmetic, vectorized over rows and traced under
  jit; used by the prover's quotient computation and derived-column fill).

Replaces the reference's build-time Rust codegen
(/root/reference/triton-constraint-builder/src/codegen.rs) with runtime
tracing into XLA.
"""

from __future__ import annotations

import functools

from ..fields import xfe as sxfe
from ..fields.bfe import P
from . import circuit as C
from .challenges import ID as CHALLENGE_ID


def linearize(exprs):
    """Topologically ordered op list for the given constraint Exprs.

    Returns (steps, out_ids) where steps is a list of
    (node_id, kind, payload):
      ('bconst', int) | ('xconst', (c0,c1,c2)) | ('input', (kind, col)) |
      ('challenge', idx) | ('binop', (op, lhs_id, rhs_id))
    """
    steps = []
    seen = set()

    def visit(node):
        stack = [(node, False)]
        while stack:
            n, expanded = stack.pop()
            if n.id in seen:
                continue
            if n.kind != "binop":
                seen.add(n.id)
                steps.append((n.id, n.kind, n.value))
                continue
            if expanded:
                seen.add(n.id)
                steps.append((n.id, "binop", (n.op, n.lhs.id, n.rhs.id)))
            else:
                stack.append((n, True))
                stack.append((n.rhs, False))
                stack.append((n.lhs, False))

    for e in exprs:
        visit(e.node)
    return steps, [e.node.id for e in exprs]


def eval_host(steps, out_ids, main_row, aux_row, challenges,
              next_main_row=None, next_aux_row=None):
    """Scalar evaluation; rows are lists of XFE tuples (BFE ints allowed,
    lifted on the fly). Returns list of XFE tuples."""
    def lift(v):
        return v if isinstance(v, tuple) else sxfe.lift(v)

    env = {}
    for nid, kind, payload in steps:
        if kind == "bconst":
            env[nid] = sxfe.lift(payload)
        elif kind == "xconst":
            env[nid] = payload
        elif kind == "challenge":
            env[nid] = tuple(challenges[payload])
        elif kind == "input":
            ik, col = payload
            if ik == C.MAIN:
                env[nid] = lift(main_row[col])
            elif ik == C.AUX:
                env[nid] = lift(aux_row[col])
            elif ik == C.NEXT_MAIN:
                env[nid] = lift(next_main_row[col])
            else:
                env[nid] = lift(next_aux_row[col])
        else:
            op, lid, rid = payload
            if op == "+":
                env[nid] = sxfe.add(env[lid], env[rid])
            else:
                env[nid] = sxfe.mul(env[lid], env[rid])
    return [env[i] for i in out_ids]


def eval_device(steps, out_ids, main, aux, challenges,
                next_main=None, next_aux=None, base_flags=None):
    """Vectorized evaluation. main/next_main: gf pairs with arrays
    (num_cols, n); aux/next_aux: gfx tuples with arrays (num_cols, n);
    challenges: list of XFE tuples (python ints). base_flags: dict
    node_id -> bool (evaluates to base field), computed if not given.

    Returns a list of results; each is a gf pair (base) or gfx tuple."""
    from ..ops import gf, gfx

    n = gf.shape(main)[-1]

    def col_gf(arrs, col):
        return gf.tmap(lambda x: x[col], arrs)

    def col_gfx(arrs, col):
        return gfx.tmap(lambda x: x[col], arrs)

    env = {}
    is_base = {}
    for nid, kind, payload in steps:
        if kind == "bconst":
            env[nid] = gf.full((), payload)
            is_base[nid] = True
        elif kind == "xconst":
            env[nid] = gfx.full((), payload)
            is_base[nid] = False
        elif kind == "challenge":
            env[nid] = gfx.full((), tuple(challenges[payload]))
            is_base[nid] = False
        elif kind == "input":
            ik, col = payload
            if ik == C.MAIN:
                env[nid] = col_gf(main, col)
                is_base[nid] = True
            elif ik == C.NEXT_MAIN:
                env[nid] = col_gf(next_main, col)
                is_base[nid] = True
            elif ik == C.AUX:
                env[nid] = col_gfx(aux, col)
                is_base[nid] = False
            else:
                env[nid] = col_gfx(next_aux, col)
                is_base[nid] = False
        else:
            op, lid, rid = payload
            l, r = env[lid], env[rid]
            lb, rb = is_base[lid], is_base[rid]
            if lb and rb:
                env[nid] = gf.add(l, r) if op == "+" else gf.mul(l, r)
                is_base[nid] = True
            elif lb and not rb:
                if op == "+":
                    env[nid] = (gf.add(r[0], l), r[1], r[2])
                else:
                    env[nid] = gfx.bfe_mul(r, l)
                is_base[nid] = False
            elif rb and not lb:
                if op == "+":
                    env[nid] = (gf.add(l[0], r), l[1], l[2])
                else:
                    env[nid] = gfx.bfe_mul(l, r)
                is_base[nid] = False
            else:
                env[nid] = gfx.add(l, r) if op == "+" else gfx.mul(l, r)
                is_base[nid] = False
    return [env[i] for i in out_ids], [is_base[i] for i in out_ids]


def substitution_pairs(subs):
    """Extract (input_kind, col, rhs_expr_node) from substitution Exprs
    of the shape `new_var + (-1)*expr` (circuit.py lower_to_degree)."""
    out = []
    for s in subs:
        node = s.node
        assert node.kind == "binop" and node.op == "+"
        var = node.lhs
        neg = node.rhs
        assert var.kind == "input", "unexpected substitution shape"
        assert neg.kind == "binop" and neg.op == "*"
        assert neg.lhs.kind == "bconst" and neg.lhs.value == P - 1
        out.append((var.value[0], var.value[1], neg.rhs))
    return out


# ------------------------------------------------- vectorized host (exact)

def eval_vectorized_obj(steps, out_ids, main_cols, aux_cols, challenges,
                        next_main_cols=None, next_aux_cols=None):
    """Vectorized exact evaluation over rows using numpy object arrays of
    Python ints. XFE values are triples of object arrays.

    main_cols: numpy object array (num_cols, n) of ints;
    aux_cols: (c0, c1, c2) each numpy object array (num_cols, n).
    Returns a list of XFE-triples-of-arrays, one per constraint.
    """
    import numpy as np

    def xadd(a, b):
        return tuple((a[i] + b[i]) % P for i in range(3))

    def xmul(a, b):
        a0, a1, a2 = a
        b0, b1, b2 = b
        d0 = a0 * b0
        d1 = a0 * b1 + a1 * b0
        d2 = a0 * b2 + a1 * b1 + a2 * b0
        d3 = a1 * b2 + a2 * b1
        d4 = a2 * b2
        return ((d0 - d3) % P, (d1 + d3 - d4) % P, (d2 + d4) % P)

    zero = np.zeros((), object)
    env = {}
    for nid, kind, payload in steps:
        if kind == "bconst":
            env[nid] = (np.array(payload, object), zero, zero)
        elif kind == "xconst":
            env[nid] = tuple(np.array(c, object) for c in payload)
        elif kind == "challenge":
            env[nid] = tuple(np.array(c, object)
                             for c in challenges[payload])
        elif kind == "input":
            ik, col = payload
            if ik == C.MAIN:
                env[nid] = (main_cols[col], zero, zero)
            elif ik == C.NEXT_MAIN:
                env[nid] = (next_main_cols[col], zero, zero)
            elif ik == C.AUX:
                env[nid] = tuple(aux_cols[i][col] for i in range(3))
            else:
                env[nid] = tuple(next_aux_cols[i][col] for i in range(3))
        else:
            op, lid, rid = payload
            env[nid] = (xadd if op == "+" else xmul)(env[lid], env[rid])
    return [env[i] for i in out_ids]
