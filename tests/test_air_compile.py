"""The AIR-to-device compiler (air/compile.py): tape scheduling, register
recycling, and bit-identity with the exact host evaluator."""

import numpy as np
import pytest

from triton_vm_tpu.air import circuit as C
from triton_vm_tpu.air.compile import compile_tape, phase_tape, run_tape
from triton_vm_tpu.air.evaluate import eval_vectorized_obj, linearize
from triton_vm_tpu.fields.bfe import P
from triton_vm_tpu.ops import gf


def _rand_inputs(rng, B, nm=8, na=4, nch=6):
    main_u = rng.integers(0, P, size=(nm, B), dtype=np.uint64)
    nmain_u = rng.integers(0, P, size=(nm, B), dtype=np.uint64)
    aux_u = rng.integers(0, P, size=(3, na, B), dtype=np.uint64)
    naux_u = rng.integers(0, P, size=(3, na, B), dtype=np.uint64)
    ch_u = rng.integers(0, P, size=(nch, 3), dtype=np.uint64)
    return main_u, nmain_u, aux_u, naux_u, ch_u


def _to_device(main_u, nmain_u, aux_u, naux_u, ch_u):
    main = gf.from_u64(main_u)
    nmain = gf.from_u64(nmain_u)
    aux = tuple(gf.from_u64(aux_u[c]) for c in range(3))
    naux = tuple(gf.from_u64(naux_u[c]) for c in range(3))
    ch = tuple(gf.from_u64(ch_u[:, c]) for c in range(3))
    return main, nmain, aux, naux, ch


def _host_ref(steps, out_ids, main_u, nmain_u, aux_u, naux_u, ch_u, B):
    ch_list = [tuple(int(x) for x in row) for row in ch_u]
    mo = main_u.astype(object)
    nmo = nmain_u.astype(object)
    ao = tuple(aux_u[c].astype(object) for c in range(3))
    nao = tuple(naux_u[c].astype(object) for c in range(3))
    res = eval_vectorized_obj(steps, out_ids, mo, ao, ch_list, nmo, nao)
    ref = np.array([[np.broadcast_to(r[c], (B,)) for c in range(3)]
                    for r in res], dtype=object)
    return np.transpose(ref, (1, 0, 2)).astype(np.uint64)  # (3, K, B)


def test_synthetic_circuit_matches_host():
    """Deep chain with shared subexpressions, mixed base/xfe typing, and
    enough width to exercise register recycling."""
    b = C.Builder()
    exprs = []
    x = b.input(C.MAIN, 0)
    y = b.input(C.NEXT_MAIN, 1)
    a0 = b.input(C.AUX, 0)
    a1 = b.input(C.NEXT_AUX, 2)
    ch = b.challenge(3)
    t = x * y + b.b_constant(17)
    for i in range(12):  # deep chain forces multi-level scheduling
        t = t * t + x * b.b_constant(i + 1)
    exprs.append(t * ch + a0)
    exprs.append((a0 + a1) * (x + y) * ch)
    exprs.append(x * x * x + y)  # pure base output
    exprs.append(b.x_constant((1, 2, 3)) * a1 + t)

    steps, out_ids = linearize(exprs)
    tape = compile_tape(steps, out_ids)
    assert tape.num_binops > 30
    assert tape.num_levels >= 13

    rng = np.random.default_rng(11)
    B = 5
    ins = _rand_inputs(rng, B)
    main, nmain, aux, naux, chv = _to_device(*ins)
    out = run_tape(tape, main, aux, chv, nmain, naux)
    dev = np.stack([gf.to_u64(out[c]) for c in range(3)])
    ref = _host_ref(steps, out_ids, *ins, B)
    assert np.array_equal(dev, ref)


def test_register_banks_are_recycled():
    """A long sequential chain must not allocate one slot per node."""
    b = C.Builder()
    t = b.input(C.MAIN, 0)
    for i in range(200):
        t = t * t + b.b_constant(i)
    steps, out_ids = linearize([t])
    tape = compile_tape(steps, out_ids)
    # ~400 binops; a fresh slot per node would need >400 slots
    assert tape.rb < 220


@pytest.mark.slow
@pytest.mark.parametrize("phase", ["init", "cons", "term", "tran"])
def test_master_air_tapes_match_host(phase):
    """Full master-AIR tapes agree bit-for-bit with the exact evaluator."""
    import jax
    from functools import partial

    rng = np.random.default_rng(3)
    B = 4
    NM, NA, NCH = 379, 91, 63
    ins = _rand_inputs(rng, B, NM, NA, NCH)
    main, nmain, aux, naux, ch = _to_device(*ins)

    from triton_vm_tpu.air.master import master_air
    tape = phase_tape(phase)
    fn = jax.jit(partial(run_tape, tape))
    if phase == "tran":
        out = fn(main, aux, ch, nmain, naux)
    else:
        out = fn(main, aux, ch)
    dev = np.stack([gf.to_u64(out[c]) for c in range(3)])

    steps, out_ids = linearize(master_air().constraints[phase])
    ref = _host_ref(steps, out_ids, *ins, B)
    assert np.array_equal(dev, ref)


@pytest.mark.slow
@pytest.mark.parametrize("phase", ["init", "cons", "term", "tran"])
def test_scan_runner_matches_unrolled(phase):
    """run_tape_scan (fori_loop over padded per-signature tables) is
    bit-identical to the unrolled run_tape."""
    import jax
    from functools import partial

    from triton_vm_tpu.air.compile import run_tape_scan

    rng = np.random.default_rng(7)
    B = 4
    NM, NA, NCH = 379, 91, 63
    ins = _rand_inputs(rng, B, NM, NA, NCH)
    main, nmain, aux, naux, ch = _to_device(*ins)
    tape = phase_tape(phase)
    args = (main, aux, ch, nmain, naux) if phase == "tran" \
        else (main, aux, ch)
    want = np.stack([gf.to_u64(c) for c in run_tape(tape, *args)])
    fn = jax.jit(partial(run_tape_scan, tape))
    got = np.stack([gf.to_u64(c) for c in fn(*args)])
    assert np.array_equal(want, got)
