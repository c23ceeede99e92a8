"""JIT (coset-tiled, memory-light) LDE mode: per-coset commitment digests
and quotient codewords must equal the cached-mode results bit-for-bit."""

import numpy as np
import pytest

from triton_vm_tpu.fields.bfe import P
from triton_vm_tpu.ops import gf, ntt, tip5_kernel
from triton_vm_tpu.stark import jit_lde
from triton_vm_tpu.stark.arithmetic_domain import Domain

rng = np.random.default_rng(21)


def _setup(nc=8, h=32, expansion=8, ntr=5):
    n = 2 * h  # randomized trace length
    E = n * expansion // 2
    eval_dom = Domain(E, 7)
    table = rng.integers(0, P, size=(nc, h), dtype=np.uint64)
    rand = rng.integers(0, P, size=(nc, ntr), dtype=np.uint64)
    # trace interpolants, zero-padded to the randomized length
    coeffs = gf.to_u64(ntt.intt(gf.from_u64(table), 1))
    coeffs_padded = np.zeros((nc, n), np.uint64)
    coeffs_padded[:, :h] = coeffs
    return table, rand, coeffs_padded, eval_dom, n, h, ntr


def _cached_committed(table, rand, eval_dom, h, ntr):
    """Reference computation: full-domain LDE + zerofier * randomizer."""
    E = eval_dom.length
    nc = table.shape[0]
    lde = ntt.lde(gf.from_u64(table), E // h, 1, eval_dom.offset)
    rand_full = np.zeros((nc, E), np.uint64)
    rand_full[:, :ntr] = rand
    rand_eval = ntt.ntt(gf.from_u64(rand_full), eval_dom.offset)
    xs = np.array(eval_dom.values(), np.uint64)
    zvals = np.array([(pow(int(x), h, P) - 1) % P for x in xs], np.uint64)
    z = gf.from_u64(np.broadcast_to(zvals, (nc, E)))
    return gf.to_u64(gf.add(lde, gf.mul(z, rand_eval)))


def test_coset_commit_matches_cached_lde():
    table, rand, coeffs, eval_dom, n, h, ntr = _setup()
    E = eval_dom.length
    m = E // n
    want = _cached_committed(table, rand, eval_dom, h, ntr)

    fn = jit_lde._coset_commit_bfe_fn(n, ntr, table.shape[0])
    tiles = jit_lde._coset_offsets_and_zerofiers(eval_dom, n, h)
    got = np.zeros_like(want)
    for t, (ladder, zvals) in enumerate(tiles):
        committed, _ = fn(gf.from_u64(coeffs), gf.from_u64(rand),
                          gf.from_u64(ladder), gf.from_u64(zvals))
        got[:, t::m] = gf.to_u64(committed)
    assert np.array_equal(want, got)


def test_committed_digests_match_full_row_hashes():
    table, rand, coeffs, eval_dom, n, h, ntr = _setup()
    E = eval_dom.length
    want_committed = _cached_committed(table, rand, eval_dom, h, ntr)
    want = gf.to_u64(tip5_kernel.sponge_absorb_rows(
        gf.from_u64(want_committed.T.copy())))

    got = jit_lde.committed_digests_bfe(
        gf.from_u64(coeffs), gf.from_u64(rand), eval_dom, E, h, ntr)
    assert np.array_equal(want, got)


def test_committed_digests_with_ldt_stride():
    """E > L: only every stride-th eval point is an LDT (hashed) row."""
    table, rand, coeffs, eval_dom, n, h, ntr = _setup(expansion=16)
    E = eval_dom.length
    L = E // 2
    want_committed = _cached_committed(table, rand, eval_dom, h, ntr)
    want = gf.to_u64(tip5_kernel.sponge_absorb_rows(
        gf.from_u64(want_committed[:, ::2].T.copy())))

    got = jit_lde.committed_digests_bfe(
        gf.from_u64(coeffs), gf.from_u64(rand), eval_dom, L, h, ntr)
    assert np.array_equal(want, got)


@pytest.mark.slow
def test_jit_quotient_codeword_matches_cached_device_path():
    """Coset-looped quotients (stark.rs:880-980 P6) equal the full-domain
    device quotient codeword on a real fibonacci trace."""
    from triton_vm_tpu.air.challenges import SAMPLE_COUNT, Challenges
    from triton_vm_tpu.fields import xfe
    from triton_vm_tpu.models import example_programs as ex
    from triton_vm_tpu.stark.prover import (
        NUM_AUX, NUM_MAIN, Stark, _all_quotients_combined_device,
        _drbg_bfes, _drbg_xfes, _powers_xfe)
    from triton_vm_tpu.stark.proof_stream import Claim
    from triton_vm_tpu.tables import master as mt
    from triton_vm_tpu.vm.machine import VM, PublicInput
    from triton_vm_tpu.air.master import master_air

    program = ex.fibonacci()
    aet, output = VM.trace_execution(program, PublicInput([7]))
    claim = (Claim.about_program(program).with_input([7])
             .with_output(output))
    stark = Stark()
    ph = aet.padded_height()
    fri, ntr, trace_dom, rand_dom, quot_dom, ldt_dom = \
        stark.derive_domains(ph)
    h, n = trace_dom.length, rand_dom.length

    main = mt.fill_main_table(aet, padded_height=h)
    mt.fill_derived_main_columns(main)
    seed = bytes(range(32))
    challenges = Challenges(
        [tuple(int(c) for c in row) for row in
         rng.integers(0, P, size=(SAMPLE_COUNT, 3), dtype=np.uint64)],
        claim)
    aux = mt.extend(main, challenges)
    mt.fill_derived_aux_columns(main, aux, challenges.challenges)
    aux[:, NUM_AUX - 1, :] = np.array(_drbg_xfes(seed, 470, h), np.uint64)

    main_rand = np.array([_drbg_bfes(seed, i, ntr)
                          for i in range(NUM_MAIN)], np.uint64)
    aux_rand = np.array([_drbg_xfes(seed, NUM_MAIN + i, ntr)
                         for i in range(NUM_AUX)], np.uint64)
    num_constraints = sum(
        len(cs) for cs in master_air().constraints.values())
    weights = _powers_xfe((3, 1, 4), num_constraints)

    # cached path: full-domain committed codewords -> device quotients
    from triton_vm_tpu.stark.prover import _commit_bfe_fn, _commit_xfe_fn
    from triton_vm_tpu.stark.prover import _trace_zerofier_values
    E = max(ldt_dom.length, quot_dom.length)
    eval_dom = ldt_dom if ldt_dom.length >= quot_dom.length else quot_dom
    zv = gf.from_u64(_trace_zerofier_values(trace_dom, eval_dom))
    main_lde, _ = _commit_bfe_fn(h, E, ldt_dom.length, eval_dom.offset,
                                 ntr, NUM_MAIN)(
        gf.from_u64(main.T.astype(np.uint64)), gf.from_u64(main_rand), zv)
    aux_lde, _ = _commit_xfe_fn(h, E, ldt_dom.length, eval_dom.offset,
                                ntr, NUM_AUX)(
        tuple(gf.from_u64(aux[:, :, c].T.copy()) for c in range(3)),
        tuple(gf.from_u64(aux_rand[:, :, c]) for c in range(3)), zv)
    stride = E // quot_dom.length
    main_q = (gf.tmap(lambda a: a[:, ::stride], main_lde)
              if stride != 1 else main_lde)
    aux_q = (tuple(gf.tmap(lambda a: a[:, ::stride], aux_lde[c])
                   for c in range(3)) if stride != 1 else aux_lde)
    want = _all_quotients_combined_device(
        main_q, aux_q, trace_dom, quot_dom, challenges, weights)

    # jit path: trace interpolants -> per-coset quotients
    mc = gf.to_u64(ntt.intt(gf.from_u64(main.T.astype(np.uint64)), 1))
    mc_p = np.zeros((NUM_MAIN, n), np.uint64)
    mc_p[:, :h] = mc
    ac_p = []
    for c in range(3):
        acc = gf.to_u64(ntt.intt(gf.from_u64(aux[:, :, c].T.copy()), 1))
        pad = np.zeros((NUM_AUX, n), np.uint64)
        pad[:, :h] = acc
        ac_p.append(gf.from_u64(pad))
    got = jit_lde.quotient_codeword_jit(
        gf.from_u64(mc_p), tuple(ac_p), gf.from_u64(main_rand),
        tuple(gf.from_u64(aux_rand[:, :, c]) for c in range(3)),
        trace_dom, quot_dom, challenges, weights, ntr)
    assert np.array_equal(want, got)


def test_jit_mode_proof_is_bit_identical_e2e():
    """Prover with TVM_CACHE_LDE=jit must produce the exact same proof
    words as the cached mode (the commitment path is transcript-
    relevant; master_table.rs:258-322, config.rs:60-94)."""
    import os

    from triton_vm_tpu import Claim, PublicInput, Stark, VM
    from triton_vm_tpu.models import example_programs as ex

    program = ex.fibonacci()
    aet, output = VM.trace_execution(program, PublicInput([10]))
    claim = (Claim.about_program(program)
             .with_input([10]).with_output(output))
    stark = Stark()
    seed = bytes(range(32))

    assert os.environ.get("TVM_CACHE_LDE") is None
    os.environ["TVM_CACHE_LDE"] = "cache"
    try:
        proof_cached = stark.prove(claim, aet, seed=seed)
        os.environ["TVM_CACHE_LDE"] = "jit"
        proof_jit = stark.prove(claim, aet, seed=seed)
    finally:
        del os.environ["TVM_CACHE_LDE"]

    assert proof_jit.words == proof_cached.words
    assert stark.verify(claim, proof_jit)


def test_config_cache_decision():
    from triton_vm_tpu import config

    # explicit overrides win
    import os
    os.environ["TVM_CACHE_LDE"] = "jit"
    try:
        assert config.cache_lde_trace(1 << 10) is config.CacheDecision.JIT
    finally:
        del os.environ["TVM_CACHE_LDE"]
    config.overwrite_lde_trace_caching_to(config.CacheDecision.JIT)
    try:
        assert config.cache_lde_trace(1 << 10) is config.CacheDecision.JIT
    finally:
        config.overwrite_lde_trace_caching_to(None)
    # heuristic: tiny tables cache, absurdly tall ones do not
    assert config.cache_lde_trace(1 << 10) is config.CacheDecision.CACHE
    assert config.cache_lde_trace(1 << 40) is config.CacheDecision.JIT


@pytest.mark.slow
def test_jit_mode_chunked_quotients_bit_identical():
    """The row-chunked coset quotient path (used when the coset is
    taller than _QUOTIENT_CHUNK_ROWS — the h=2^18 OOM fix, r5) must be
    transcript-identical to the unchunked JIT path."""
    import os

    from triton_vm_tpu import Claim, PublicInput, Stark, VM
    from triton_vm_tpu.models import example_programs as ex
    from triton_vm_tpu.stark import prover as prover_mod

    program = ex.fibonacci()
    aet, output = VM.trace_execution(program, PublicInput([10]))
    claim = (Claim.about_program(program)
             .with_input([10]).with_output(output))
    stark = Stark()
    seed = bytes(range(32))

    os.environ["TVM_CACHE_LDE"] = "jit"
    saved = prover_mod._QUOTIENT_CHUNK_ROWS
    try:
        proof_plain = stark.prove(claim, aet, seed=seed)
        prover_mod._QUOTIENT_CHUNK_ROWS = 128  # force chunking
        proof_chunked = stark.prove(claim, aet, seed=seed)
    finally:
        prover_mod._QUOTIENT_CHUNK_ROWS = saved
        del os.environ["TVM_CACHE_LDE"]

    assert proof_chunked.words == proof_plain.words
