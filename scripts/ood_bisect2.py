"""Narrow the simplifier cycle further: individual gf/gfx pieces."""

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

rng = np.random.default_rng(0)


def rgf(shape):
    return gf.from_u64(rng.integers(1, P, size=shape, dtype=np.uint64))


def rgfx(shape):
    return tuple(rgf(shape) for _ in range(3))


which = sys.argv[1]
n = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

if which == "gfx_inv":
    fn = jax.jit(gfx.inv)
    args = (rgfx((n,)),)
elif which == "gf_inv":
    fn = jax.jit(gf.inv)
    args = (rgf((n,)),)
elif which == "dot":
    w = rgf((n,))
    fn = jax.jit(lambda c: kernels._gf_dot_rows(c, w))
    args = (rgf((379, n)),)
elif which == "inv_then_dot":
    def f(cols, den):
        dods = gfx.inv(den)
        return tuple(kernels._gf_dot_rows(cols, dods[c]) for c in range(3))
    fn = jax.jit(f)
    args = (rgf((379, n)), rgfx((n,)))
elif which == "inv_then_sum":
    def f(den):
        dods = gfx.inv(den)
        return tuple(kernels._sum0(dods[c]) for c in range(3))
    fn = jax.jit(f)
    args = (rgfx((n,)),)
else:
    raise SystemExit("gfx_inv|gf_inv|dot|inv_then_dot|inv_then_sum")

t = time.time()
out = fn(*args)
jax.block_until_ready(out)
print(which, n, "compile+run:", round(time.time() - t, 1), "s")
