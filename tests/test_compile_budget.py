"""Compile-time budget regression tests (XLA:CPU).

Round-2's driver run (MULTICHIP_r02) timed out because one prover kernel
took >10 minutes to compile on XLA:CPU (circular algebraic-simplifier
rewrites + 5.5x module growth in layout assignment). These tests pin a
wall-clock budget on a COLD build+run of each hot prover kernel at
dryrun-scale shapes so a future kernel change cannot silently
reintroduce a pathological compile into the CPU-mesh dryrun.

Budgets are ~5x the measured times on a 4-core CPU worker (measured:
commit 27 s incl. tracing, OOD 11 s, DEEP 8 s) — loose enough for
machine noise, tight enough that a return of the >600 s pathology fails
immediately. On a slower/loaded machine set TVM_BUDGET_SCALE (budget
multiplier, default 1) instead of editing the bounds.
"""

import os
import time

import numpy as np
import pytest

from triton_vm_tpu.fields.bfe import P
from triton_vm_tpu.ops import gf, gfx, kernels

rng = np.random.default_rng(7)
_SCALE = float(os.environ.get("TVM_BUDGET_SCALE", "1"))

# distinct shapes from other tests so per-shape jit caches are cold here
E, L, NM, NA = 1024, 1024, 379, 91


def _block(v):
    import jax

    jax.tree_util.tree_map(lambda a: a.block_until_ready(), v)


def test_ood_stage_cold_build_under_budget():
    g = pow(7, (P - 1) // E, P)
    main = gf.from_u64(rng.integers(0, P, (NM, E), dtype=np.uint64))
    aux = gfx.from_u64(rng.integers(0, P, (NA, E, 3), dtype=np.uint64))
    segs = tuple(gfx.from_u64(rng.integers(0, P, (L, 3), dtype=np.uint64))
                 for _ in range(5))
    pt = lambda: gfx.from_u64(  # noqa: E731
        rng.integers(0, P, (3,), dtype=np.uint64))
    fn = kernels.ood_stage_fn(E, L, g, 7, g, 7)
    t0 = time.time()
    _block(fn(main, aux, segs, pt(), pt(), pt(), pt()))
    assert time.time() - t0 < 60 * _SCALE, \
        "OOD stage cold build blew its budget"


def test_deep_combination_cold_build_under_budget():
    g = pow(7, (P - 1) // E, P)
    main = gf.from_u64(rng.integers(0, P, (NM, E), dtype=np.uint64))
    aux = gfx.from_u64(rng.integers(0, P, (NA, E, 3), dtype=np.uint64))
    segs = tuple(gfx.from_u64(rng.integers(0, P, (L, 3), dtype=np.uint64))
                 for _ in range(5))
    wv = lambda n: gfx.from_u64(  # noqa: E731
        rng.integers(0, P, (n, 3), dtype=np.uint64))
    dfn = kernels.deep_combination_fn(E, L, g, 7, 7, 1, 1)
    t0 = time.time()
    _block(dfn(main, aux, segs, wv(NM), wv(NA), wv(5), wv(4), wv(4), wv(4)))
    assert time.time() - t0 < 60 * _SCALE, \
        "DEEP stage cold build blew its budget"


def test_commit_cold_build_under_budget():
    from triton_vm_tpu.stark.prover import _commit_bfe_fn

    h, ntr = 256, 198
    fn = _commit_bfe_fn(h, E, L, 7, ntr, NM)
    cols = gf.from_u64(rng.integers(0, P, (NM, h), dtype=np.uint64))
    rand = gf.from_u64(rng.integers(0, P, (NM, ntr), dtype=np.uint64))
    z = gf.from_u64(rng.integers(0, P, (E,), dtype=np.uint64))
    t0 = time.time()
    _block(fn(cols, rand, z))
    assert time.time() - t0 < 150 * _SCALE, \
        "commit stage cold build blew its budget"


@pytest.mark.slow
def test_reduce_sum_execution_not_interpreted():
    """The DEEP stage once executed in 212 s at padded height 2^8 because
    reduce_sum lowered to an XLA:CPU custom-combiner reduce that is
    interpreted per element. Pin a generous execution budget on a
    2^16-element weighted sum."""
    import jax

    a = gf.from_u64(rng.integers(0, P, (64, 1 << 16), dtype=np.uint64))
    f = jax.jit(lambda v: gf.reduce_sum(v, 1))
    _block(f(a))  # build
    t0 = time.time()
    _block(f(a))
    # the pathology was 212 s; 8 s (x scale) is far above honest noise
    assert time.time() - t0 < 8 * _SCALE, \
        "reduce_sum executes pathologically slowly"
