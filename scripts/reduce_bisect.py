"""Bisect which reduce_sum formulation makes while-containing graphs
(inv -> mul -> sum, the OOD/DEEP shape) compile and run fast on XLA:CPU.

Usage: python scripts/reduce_bisect.py [pattern ...]
Patterns: plain inv_sum dot bary
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, __file__.rsplit("/", 2)[0])

from triton_vm_tpu.ops import gf, gfx  # noqa: E402
from triton_vm_tpu.fields.bfe import P  # noqa: E402

rng = np.random.default_rng(1)
k, n, m = 2, 2048, 379


def timed(name, fn, *args):
    t0 = time.time()
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
    c = time.time() - t0
    t0 = time.time()
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
    r = time.time() - t0
    print(f"{name}: compile+run {c:.2f}s run {r:.3f}s", flush=True)


which = sys.argv[1:] or ["plain", "inv_sum", "dot", "bary"]

xs = gf.from_u64(rng.integers(0, P, (k, n), dtype=np.uint64))
ys = gf.from_u64(rng.integers(0, P, (k, n), dtype=np.uint64))
cols = gf.from_u64(rng.integers(0, P, (m, n), dtype=np.uint64))

if "plain" in which:
    timed("sum(mul(x,y), 1)",
          jax.jit(lambda a, b: gf.reduce_sum(gf.mul(a, b), 1)), xs, ys)

if "inv_sum" in which:
    timed("sum(mul(inv(x),y), 1)",
          jax.jit(lambda a, b: gf.reduce_sum(gf.mul(gf.inv(a), b), 1)),
          xs, ys)

if "dot" in which:
    # the OOD _gf_dot_rows pattern: (m, n) x (n,) -> (m,)
    w = gf.from_u64(rng.integers(0, P, (n,), dtype=np.uint64))
    timed("dot_rows (m,n)x(n)",
          jax.jit(lambda c, w: gf.reduce_sum(
              gf.mul(c, gf.tmap(lambda a: a[None, :], w)), 1)), cols, w)

if "bary" in which:
    from triton_vm_tpu.ops import kernels
    pts = gfx.from_u64(rng.integers(0, P, (k, 3), dtype=np.uint64))
    xsv = gf.from_u64(rng.integers(0, P, (n,), dtype=np.uint64))
    timed("bary_eval_multi main-only",
          jax.jit(lambda c, x, p: kernels._bary_eval_multi(c, None, x, p)),
          cols, xsv, pts)

if "baryx" in which:
    from triton_vm_tpu.ops import kernels
    pts = gfx.from_u64(rng.integers(0, P, (k, 3), dtype=np.uint64))
    xsv = gf.from_u64(rng.integers(0, P, (n,), dtype=np.uint64))
    auxc = gfx.from_u64(rng.integers(0, P, (91, n, 3), dtype=np.uint64))
    timed("bary_eval_multi aux-only",
          jax.jit(lambda c, x, p: kernels._bary_eval_multi(None, c, x, p)),
          auxc, xsv, pts)

if "baryfull" in which:
    from triton_vm_tpu.ops import kernels
    pts = gfx.from_u64(rng.integers(0, P, (k, 3), dtype=np.uint64))
    xsv = gf.from_u64(rng.integers(0, P, (n,), dtype=np.uint64))
    auxc = gfx.from_u64(rng.integers(0, P, (91, n, 3), dtype=np.uint64))
    timed("bary_eval_multi main+aux",
          jax.jit(lambda cg, cx, x, p: kernels._bary_eval_multi(
              cg, cx, x, p)), cols, auxc, xsv, pts)
