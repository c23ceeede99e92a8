"""Bisect the simplifier loop: which sub-piece of ood_stage_fn hangs."""

import os
import sys
import time

os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from triton_vm_tpu.ops import gf, gfx, kernels  # noqa: E402
from triton_vm_tpu.fields.bfe import P  # noqa: E402
from triton_vm_tpu.stark.arithmetic_domain import Domain  # noqa: E402

E = 2048
NM = 379
rng = np.random.default_rng(0)


def rgf(shape):
    return gf.from_u64(rng.integers(0, P, size=shape, dtype=np.uint64))


def rgfx(shape):
    return tuple(rgf(shape) for _ in range(3))


main_lde = rgf((NM, E))
alpha = rgfx(())
ed = Domain(E, 7)
which = sys.argv[1]

if which == "dp":          # _domain_powers alone
    fn = jax.jit(lambda: kernels._domain_powers(ed.generator, ed.offset, E))
    args = ()
elif which == "bary_dp":   # barycentric with _domain_powers xs
    def f(cols, point):
        xs = kernels._domain_powers(ed.generator, ed.offset, E)
        return kernels._bary_eval_at(cols, None, xs, point)
    fn = jax.jit(f)
    args = (main_lde, alpha)
elif which == "bary_const":  # barycentric with host-precomputed xs constant
    xs_np = np.empty(E, np.uint64)
    x = ed.offset
    g = ed.generator
    for i in range(E):
        xs_np[i] = x
        x = x * g % P
    xs_c = gf.from_u64(xs_np)

    def f(cols, point):
        return kernels._bary_eval_at(cols, None, xs_c, point)
    fn = jax.jit(f)
    args = (main_lde, alpha)
elif which == "shift_dp":  # ood_shift_inverses with _domain_powers xs
    def f(point):
        xs = kernels._domain_powers(ed.generator, ed.offset, E)
        return kernels.ood_shift_inverses(xs, point)
    fn = jax.jit(f)
    args = (alpha,)
else:
    raise SystemExit("dp|bary_dp|bary_const|shift_dp")

t = time.time()
out = fn(*args)
jax.block_until_ready(out)
print(which, "compile+run:", round(time.time() - t, 1), "s")
