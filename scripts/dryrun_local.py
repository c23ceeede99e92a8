"""Local reproduction of the driver's multichip dryrun on a virtual
8-device CPU mesh (the axon plugin ignores JAX_PLATFORMS from the
environment, so force the CPU backend via jax.config first)."""

import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import faulthandler  # noqa: E402

faulthandler.dump_traceback_later(240, repeat=True)

import __graft_entry__ as g  # noqa: E402

t = time.time()
g.dryrun_multichip(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
print("dryrun_multichip OK", round(time.time() - t, 1), "s")
