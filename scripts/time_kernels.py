"""Measure compile vs run time of the OOD / DEEP kernels on the current
backend (used to keep the CPU-mesh dryrun inside the driver's timeout).
Run with JAX_PLATFORMS unset on TPU or with jax_platforms=cpu for the
mesh environment: `python scripts/time_kernels.py [cpu]`.
"""

import sys
import time

import jax
import numpy as np

if "cpu" in sys.argv[1:]:
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from triton_vm_tpu.ops import gf, gfx, kernels  # noqa: E402
from triton_vm_tpu.fields.bfe import P  # noqa: E402

rng = np.random.default_rng(1)

for shape, axis in [((379, 2048), 0), ((379, 2048), 1), ((5, 7), 0),
                    ((100001,), 0)]:
    a = rng.integers(0, P, shape, dtype=np.uint64)
    got = gf.to_u64(gf.reduce_sum(gf.from_u64(a), axis))
    exp = np.asarray(a.astype(object).sum(axis=axis) % P, np.uint64)
    assert (got == exp).all(), (shape, axis)
print("reduce_sum exact OK")

NM, NA, E, L, S = 379, 91, 2048, 2048, 2048
main = gf.from_u64(rng.integers(0, P, (NM, E), dtype=np.uint64))
aux = gfx.from_u64(rng.integers(0, P, (NA, E, 3), dtype=np.uint64))
segs = tuple(gfx.from_u64(rng.integers(0, P, (L, 3), dtype=np.uint64))
             for _ in range(5))


def sc():
    return gfx.from_u64(rng.integers(0, P, (3,), dtype=np.uint64).reshape(3))


def blk(v):
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), v)


g = pow(7, (P - 1) // E, P)
fn = kernels.ood_stage_fn(E, L, g, 7, g, 7)
t0 = time.time()
out = fn(main, aux, segs, sc(), sc(), sc(), sc())
blk(out)
print("ood compile+run", time.time() - t0)
t0 = time.time()
out = fn(main, aux, segs, sc(), sc(), sc(), sc())
blk(out)
print("ood run", time.time() - t0)


def wv(n):
    return gfx.from_u64(rng.integers(0, P, (n, 3), dtype=np.uint64))


dfn = kernels.deep_combination_fn(S, L, g, 7, 7, E // S, L // S)
t0 = time.time()
out = dfn(main, aux, segs, wv(NM), wv(NA), wv(5), wv(4), wv(4), wv(4))
blk(out)
print("deep compile+run", time.time() - t0)
t0 = time.time()
out = dfn(main, aux, segs, wv(NM), wv(NA), wv(5), wv(4), wv(4), wv(4))
blk(out)
print("deep run", time.time() - t0)
