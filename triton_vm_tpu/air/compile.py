"""AIR-to-device compiler: turn linearized constraint DAGs into batched
level-parallel tapes executed on the accelerator.

This replaces the reference's build-time Rust codegen
(/root/reference/triton-constraint-builder/src/codegen.rs) with a runtime
compiler targeting XLA. The design is TPU-first rather than a translation:

- All ~3.3k multiplications of the transition AIR are grouped by
  (dependency depth, operand types, op) so each group executes as ONE
  batched vector op over all rows and all group members at once —
  arithmetic intensity comes from batching (group_width x num_rows
  lanes), not from scalar codegen.
- Values live in two register banks (base field and extension field),
  each a small set of (num_slots, num_rows) uint32 planes. Slots are
  liveness-recycled so the banks stay a few hundred slots wide even for
  the ~7.6k-step transition tape.
- The emitted computation is a static unrolled sequence of
  gather -> batched-field-op -> scatter steps, sized so XLA can fuse and
  tile it; there is no per-node dispatch at runtime.

Used by the prover's quotient computation (stark/prover.py) as the
device-side alternative to the exact host evaluator in evaluate.py.
"""

from __future__ import annotations

import functools

import numpy as np

from . import circuit as C

_SIGS = ("bb+", "bb*", "bx+", "bx*", "xx+", "xx*")


class Tape:
    """Compiled form of one (steps, out_ids) constraint list.

    Attributes:
      rb, rx: base/xfe bank sizes (slots).
      base_init, x_init: numpy uint64 arrays (rb,) / (3, rx) holding
        compile-time constants (everything else is 0).
      *_slots / *_cols: parallel int32 arrays describing runtime loads of
        main/next_main columns (base bank), aux/next_aux columns and
        challenges (xfe bank).
      levels: list of {sig: (lhs, rhs, dst) int32 arrays}.
      out_banks, out_slots: per-output bank flag (True=base) and slot.
    """

    def __init__(self):
        self.rb = 0
        self.rx = 0
        self.base_init = None
        self.x_init = None
        self.main_slots = self.main_cols = None
        self.next_main_slots = self.next_main_cols = None
        self.aux_slots = self.aux_cols = None
        self.next_aux_slots = self.next_aux_cols = None
        self.challenge_slots = self.challenge_ids = None
        self.levels = []
        self.out_banks = None
        self.out_slots = None
        self.num_binops = 0

    @property
    def num_levels(self):
        return len(self.levels)


def compile_tape(steps, out_ids) -> Tape:
    """Schedule + register-allocate the linearized DAG into a Tape."""
    kinds = {}
    payloads = {}
    for nid, kind, payload in steps:
        kinds[nid] = kind
        payloads[nid] = payload

    # --- typing (base vs xfe) and ASAP levels ---------------------------
    is_base = {}
    level = {}
    for nid, kind, payload in steps:
        if kind == "bconst":
            is_base[nid], level[nid] = True, 0
        elif kind in ("xconst", "challenge"):
            is_base[nid], level[nid] = False, 0
        elif kind == "input":
            is_base[nid] = payload[0] in (C.MAIN, C.NEXT_MAIN)
            level[nid] = 0
        else:
            _, lid, rid = payload
            is_base[nid] = is_base[lid] and is_base[rid]
            level[nid] = 1 + max(level[lid], level[rid])

    # --- level packing ---------------------------------------------------
    # The fori_loop runner (tape_scan_tables) pads every level to each
    # signature's MAXIMUM width, so ASAP scheduling wastes up to 18.5x
    # arithmetic on the transition tape (measured). Re-schedule with
    # per-signature width caps ~= count/levels: ops wait for capacity,
    # trading a few extra levels for near-uniform widths. Pure schedule
    # change — identical values, bit-identical outputs.
    def _sig_of(payload):
        op, lid, rid = payload
        lb, rb = is_base[lid], is_base[rid]
        if lb and rb:
            return "bb" + op
        if not lb and not rb:
            return "xx" + op
        return "bx" + op

    crit = max(level.values()) if level else 0
    counts: dict[str, int] = {}
    for nid, kind, payload in steps:
        if kind == "binop":
            s = _sig_of(payload)
            counts[s] = counts.get(s, 0) + 1
    budget = max(int(crit * 1.3), 1)
    caps = {s: max(1, -(-c // budget)) for s, c in counts.items()}

    deps_left = {}
    consumers: dict[int, list] = {}
    ready_at: dict[int, list] = {}  # level -> [(sig, nid)]
    for nid, kind, payload in steps:
        if kind != "binop":
            continue
        _, lid, rid = payload
        nd = sum(1 for d in (lid, rid) if kinds[d] == "binop")
        deps_left[nid] = nd
        for d in (lid, rid):
            if kinds[d] == "binop":
                consumers.setdefault(d, []).append(nid)
        if nd == 0:
            ready_at.setdefault(1, []).append((_sig_of(payload), nid))

    remaining = len(deps_left)
    waiting: dict[str, list] = {}
    lvl = 1
    while remaining:
        for sig, nid in ready_at.pop(lvl, []):
            waiting.setdefault(sig, []).append(nid)
        used = {}
        for sig, queue in waiting.items():
            take = min(caps[sig], len(queue))
            for nid in queue[:take]:
                level[nid] = lvl
                remaining -= 1
                for c in consumers.get(nid, []):
                    deps_left[c] -= 1
                    if deps_left[c] == 0:
                        ready_at.setdefault(lvl + 1, []).append(
                            (_sig_of(payloads[c]), c))
            used[sig] = take
        for sig, take in used.items():
            waiting[sig] = waiting[sig][take:]
        lvl += 1

    out_set = set(out_ids)
    # --- liveness: last level at which each node is read ----------------
    last_use = {nid: (1 << 60) if nid in out_set else -1 for nid in kinds}
    for nid, kind, payload in steps:
        if kind == "binop":
            _, lid, rid = payload
            last_use[lid] = max(last_use[lid], level[nid])
            last_use[rid] = max(last_use[rid], level[nid])

    # --- slot allocation -------------------------------------------------
    slot = {}
    next_slot = {True: 0, False: 0}
    free = {True: [], False: []}  # (available_from_level, slot)

    def alloc(nid, lvl):
        bank = is_base[nid]
        pool = free[bank]
        for i, (avail, s) in enumerate(pool):
            if avail <= lvl:
                pool.pop(i)
                slot[nid] = s
                return s
        s = next_slot[bank]
        next_slot[bank] += 1
        slot[nid] = s
        return s

    # leaves first (level 0, never freed if used; consts/loads pinned)
    for nid, kind, payload in steps:
        if kind != "binop":
            alloc(nid, 0)

    tape = Tape()
    freed = set()
    # group binops by level then signature
    by_level: dict[int, dict[str, list]] = {}
    for nid, kind, payload in steps:
        if kind != "binop":
            continue
        op, lid, rid = payload
        lvl = level[nid]
        lb, rb = is_base[lid], is_base[rid]
        if lb and rb:
            sig = "bb" + op
        elif not lb and not rb:
            sig = "xx" + op
        else:
            sig = "bx" + op
            if is_base[lid]:  # normalize: xfe operand on the left
                lid, rid = rid, lid
        d = alloc(nid, lvl)
        by_level.setdefault(lvl, {}).setdefault(sig, []).append(
            (slot[lid], slot[rid], d))
        # free operands whose last use is this level (available next level)
        for opnd in (lid, rid):
            if (last_use[opnd] == lvl and kinds[opnd] == "binop"
                    and opnd not in freed):
                freed.add(opnd)
                free[is_base[opnd]].append((lvl + 1, slot[opnd]))
        if last_use[nid] == -1 and nid not in freed:  # dead code
            freed.add(nid)
            free[is_base[nid]].append((lvl + 1, d))
        tape.num_binops += 1

    for lvl in sorted(by_level):
        tape.levels.append({
            sig: tuple(np.array(col, np.int32)
                       for col in zip(*triples))
            for sig, triples in by_level[lvl].items()})

    tape.rb = max(next_slot[True], 1)
    tape.rx = max(next_slot[False], 1)

    # --- constant init planes + load tables ------------------------------
    tape.base_init = np.zeros(tape.rb, np.uint64)
    tape.x_init = np.zeros((3, tape.rx), np.uint64)
    loads = {k: [] for k in ("main", "next_main", "aux", "next_aux", "ch")}
    for nid, kind, payload in steps:
        if kind == "bconst":
            tape.base_init[slot[nid]] = payload
        elif kind == "xconst":
            tape.x_init[:, slot[nid]] = payload
        elif kind == "challenge":
            loads["ch"].append((slot[nid], payload))
        elif kind == "input":
            ik, col = payload
            key = {C.MAIN: "main", C.NEXT_MAIN: "next_main",
                   C.AUX: "aux", C.NEXT_AUX: "next_aux"}[ik]
            loads[key].append((slot[nid], col))

    def cols2(pairs):
        if not pairs:
            return (np.zeros(0, np.int32),) * 2
        s, c = zip(*pairs)
        return np.array(s, np.int32), np.array(c, np.int32)

    tape.main_slots, tape.main_cols = cols2(loads["main"])
    tape.next_main_slots, tape.next_main_cols = cols2(loads["next_main"])
    tape.aux_slots, tape.aux_cols = cols2(loads["aux"])
    tape.next_aux_slots, tape.next_aux_cols = cols2(loads["next_aux"])
    tape.challenge_slots, tape.challenge_ids = cols2(loads["ch"])

    tape.out_banks = np.array([is_base[i] for i in out_ids])
    tape.out_slots = np.array([slot[i] for i in out_ids], np.int32)
    return tape


# ------------------------------------------------------------- execution

def run_tape(tape: Tape, main, aux, challenges, next_main=None,
             next_aux=None):
    """Execute a compiled tape. Traceable under jit.

    main/next_main: gf pairs with arrays (num_main_cols, B).
    aux/next_aux: gfx triples with arrays (num_aux_cols, B).
    challenges: gfx triple with arrays (num_challenges,).
    Returns a gfx triple with arrays (num_outputs, B) — base-field outputs
    are lifted into the extension.
    """
    import jax.numpy as jnp

    from ..ops import gf, gfx

    B = gf.shape(main)[-1]

    def bcast(plane_1d):
        return jnp.broadcast_to(jnp.asarray(plane_1d)[:, None],
                                (plane_1d.shape[0], B))

    bi_lo = (tape.base_init & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    bi_hi = (tape.base_init >> np.uint64(32)).astype(np.uint32)
    Vb = (bcast(bi_lo), bcast(bi_hi))
    Vx = tuple((bcast((tape.x_init[c] & np.uint64(0xFFFFFFFF))
                      .astype(np.uint32)),
                bcast((tape.x_init[c] >> np.uint64(32)).astype(np.uint32)))
               for c in range(3))

    def set_b(bank, slots, val):
        return tuple(p.at[slots].set(v) for p, v in zip(bank, val))

    if tape.main_slots.size:
        Vb = set_b(Vb, tape.main_slots, gf.take(main, tape.main_cols))
    if tape.next_main_slots.size:
        Vb = set_b(Vb, tape.next_main_slots,
                   gf.take(next_main, tape.next_main_cols))

    def set_x(bank, slots, val):
        return tuple(set_b(bank[c], slots, val[c]) for c in range(3))

    def take_x(bank, idx):
        return tuple(gf.take(bank[c], idx) for c in range(3))

    if tape.aux_slots.size:
        Vx = set_x(Vx, tape.aux_slots,
                   gfx.tmap(lambda a: a[tape.aux_cols], aux))
    if tape.next_aux_slots.size:
        Vx = set_x(Vx, tape.next_aux_slots,
                   gfx.tmap(lambda a: a[tape.next_aux_cols], next_aux))
    if tape.challenge_slots.size:
        ch = gfx.tmap(lambda a: jnp.broadcast_to(
            a[tape.challenge_ids][:, None],
            (tape.challenge_ids.shape[0], B)), challenges)
        Vx = set_x(Vx, tape.challenge_slots, ch)

    for groups in tape.levels:
        newVb, newVx = Vb, Vx
        for sig, (li, ri, di) in groups.items():
            if sig[0] == "b" and sig[1] == "b":
                l, r = gf.take(Vb, li), gf.take(Vb, ri)
                res = gf.add(l, r) if sig[2] == "+" else gf.mul(l, r)
                newVb = set_b(newVb, di, res)
            elif sig[0] == "x" or sig[1] == "x":
                if sig[:2] == "bx":
                    l = take_x(Vx, li)  # normalized: xfe operand slot
                    r = gf.take(Vb, ri)
                    if sig[2] == "+":
                        res = (gf.add(l[0], r), l[1], l[2])
                    else:
                        res = gfx.bfe_mul(l, r)
                else:
                    l, r = take_x(Vx, li), take_x(Vx, ri)
                    res = gfx.add(l, r) if sig[2] == "+" else gfx.mul(l, r)
                newVx = set_x(newVx, di, res)
        Vb, Vx = newVb, newVx

    # gather outputs, lifting base ones into the extension
    outs = []
    zero = None
    for bank_is_base, s in zip(tape.out_banks, tape.out_slots):
        if bank_is_base:
            v = gf.index(Vb, int(s))
            if zero is None:
                zero = gf.zeros(gf.shape(v))
            outs.append((v, zero, zero))
        else:
            outs.append(tuple(gf.index(Vx[c], int(s)) for c in range(3)))
    return tuple(gf.stack([o[c] for o in outs], axis=0) for c in range(3))


_SCAN_SIGS = ("bb+", "bb*", "bx+", "bx*", "xx+", "xx*")


def tape_scan_tables(tape: Tape):
    """Uniform per-level index tensors for the fori_loop tape runner.

    For each signature present anywhere in the tape, pad every level to
    that signature's maximum width; padded lanes read from and write to a
    dedicated dump slot (one extra slot per bank). Padding wastes
    arithmetic (up to ~18x for the transition tape) but turns the
    249-group unrolled graph into ONE loop body — the unrolled form
    lowers to ~17MB of StableHLO, which dominates per-process prover
    time on backends with slow lowering paths."""
    import numpy as np

    dump_b, dump_x = tape.rb, tape.rx
    L = len(tape.levels)
    tables = {}
    for sig in _SCAN_SIGS:
        widths = [len(lvl[sig][2]) if sig in lvl else 0
                  for lvl in tape.levels]
        W = max(widths)
        if W == 0:
            continue
        dump = dump_b if sig[:2] == "bb" else dump_x
        dump_l = dump_b if sig[:2] == "bb" else dump_x  # lhs bank
        if sig[:2] == "bx":
            dump_l = dump_x  # normalized: xfe operand on the left
        dump_r = dump_b if sig[1] == "b" or sig[:2] == "bx" else dump_x
        lhs = np.full((L, W), dump_l, np.int32)
        rhs = np.full((L, W), dump_r, np.int32)
        dst = np.full((L, W), dump, np.int32)
        for i, lvl in enumerate(tape.levels):
            if sig in lvl:
                li, ri, di = lvl[sig]
                lhs[i, :len(li)] = li
                rhs[i, :len(ri)] = ri
                dst[i, :len(di)] = di
        tables[sig] = (lhs, rhs, dst)
    return tables


def run_tape_scan(tape: Tape, main, aux, challenges, next_main=None,
                  next_aux=None):
    """run_tape with the level loop as a jax.lax.fori_loop over padded
    per-signature index tables (see tape_scan_tables). Bit-identical
    results; ~constant-size lowered module."""
    import jax
    import jax.numpy as jnp

    from ..ops import gf, gfx

    B = gf.shape(main)[-1]
    tables = tape_scan_tables(tape)
    L = len(tape.levels)

    def bcast(plane_1d):
        return jnp.broadcast_to(jnp.asarray(plane_1d)[:, None],
                                (plane_1d.shape[0], B))

    # banks with one extra dump slot each
    bi = np.concatenate([tape.base_init, np.zeros(1, np.uint64)])
    xi = np.concatenate([tape.x_init, np.zeros((3, 1), np.uint64)], axis=1)
    Vb = (bcast((bi & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
          bcast((bi >> np.uint64(32)).astype(np.uint32)))
    Vx = tuple((bcast((xi[c] & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
                bcast((xi[c] >> np.uint64(32)).astype(np.uint32)))
               for c in range(3))

    def set_b(bank, slots, val):
        return tuple(p.at[slots].set(v) for p, v in zip(bank, val))

    def set_x(bank, slots, val):
        return tuple(set_b(bank[c], slots, val[c]) for c in range(3))

    if tape.main_slots.size:
        Vb = set_b(Vb, tape.main_slots, gf.take(main, tape.main_cols))
    if tape.next_main_slots.size:
        Vb = set_b(Vb, tape.next_main_slots,
                   gf.take(next_main, tape.next_main_cols))
    if tape.aux_slots.size:
        Vx = set_x(Vx, tape.aux_slots,
                   gfx.tmap(lambda a: a[tape.aux_cols], aux))
    if tape.next_aux_slots.size:
        Vx = set_x(Vx, tape.next_aux_slots,
                   gfx.tmap(lambda a: a[tape.next_aux_cols], next_aux))
    if tape.challenge_slots.size:
        ch = gfx.tmap(lambda a: jnp.broadcast_to(
            a[tape.challenge_ids][:, None],
            (tape.challenge_ids.shape[0], B)), challenges)
        Vx = set_x(Vx, tape.challenge_slots, ch)

    idx = {sig: tuple(jnp.asarray(t) for t in tbl)
           for sig, tbl in tables.items()}

    def body(i, banks):
        Vb, Vx = banks
        writes = []
        for sig in _SCAN_SIGS:
            if sig not in idx:
                continue
            li, ri, di = (t[i] for t in idx[sig])
            if sig[:2] == "bb":
                l, r = gf.take(Vb, li), gf.take(Vb, ri)
                res = gf.add(l, r) if sig[2] == "+" else gf.mul(l, r)
                writes.append(("b", di, res))
            elif sig[:2] == "bx":
                l = tuple(gf.take(Vx[c], li) for c in range(3))
                r = gf.take(Vb, ri)
                if sig[2] == "+":
                    res = (gf.add(l[0], r), l[1], l[2])
                else:
                    res = gfx.bfe_mul(l, r)
                writes.append(("x", di, res))
            else:
                l = tuple(gf.take(Vx[c], li) for c in range(3))
                r = tuple(gf.take(Vx[c], ri) for c in range(3))
                res = gfx.add(l, r) if sig[2] == "+" else gfx.mul(l, r)
                writes.append(("x", di, res))
        for bank, di, res in writes:  # all reads happen above (pre-level)
            if bank == "b":
                Vb = set_b(Vb, di, res)
            else:
                Vx = set_x(Vx, di, res)
        return Vb, Vx

    Vb, Vx = jax.lax.fori_loop(0, L, body, (Vb, Vx))

    outs = []
    zero = None
    for bank_is_base, s in zip(tape.out_banks, tape.out_slots):
        if bank_is_base:
            v = gf.index(Vb, int(s))
            if zero is None:
                zero = gf.zeros(gf.shape(v))
            outs.append((v, zero, zero))
        else:
            outs.append(tuple(gf.index(Vx[c], int(s)) for c in range(3)))
    return tuple(gf.stack([o[c] for o in outs], axis=0) for c in range(3))


@functools.lru_cache(maxsize=None)
def phase_tape(phase: str) -> Tape:
    """Compiled tape for one constraint phase of the master AIR."""
    from .evaluate import linearize
    from .master import master_air

    steps, out_ids = linearize(master_air().constraints[phase])
    return compile_tape(steps, out_ids)
