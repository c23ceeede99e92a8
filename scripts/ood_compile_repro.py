"""Isolate the XLA:CPU algebraic-simplifier loop in ood_stage_fn."""

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

E, L = 2048, 1024
NM, NA = 379, 91
rng = np.random.default_rng(0)


def rgf(shape):
    return gf.from_u64(rng.integers(0, P, size=shape, dtype=np.uint64))


def rgfx(shape):
    return tuple(rgf(shape) for _ in range(3))


main_lde = rgf((NM, E))
aux_lde = rgfx((NA, E))
segs = tuple(rgfx((L,)) for _ in range(5))
alpha, om, apk, zapk = (rgfx(()) for _ in range(4))

from triton_vm_tpu.stark.arithmetic_domain import Domain  # noqa: E402

ed, ld = Domain(E, 7), Domain(L, 7)
fn = kernels.ood_stage_fn(E, L, ed.generator, ed.offset,
                          ld.generator, ld.offset)
t = time.time()
out = fn(main_lde, aux_lde, segs, alpha, om, apk, zapk)
jax.block_until_ready(out)
print("ood_stage_fn compile+run:", round(time.time() - t, 1), "s")
