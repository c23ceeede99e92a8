"""Run the accelerator-only checks against the real TPU chip.

The CPU test mesh (tests/conftest.py) skips tests that exercise compiled
device pipelines whose XLA:CPU compiles are pathological (see
tables/extend_device.py). This script runs exactly those tests on the
default (TPU) backend:

    python scripts/tpu_checks.py

It must be invoked WITHOUT JAX_PLATFORMS=cpu so the axon/TPU backend is
selected.
"""

import subprocess
import sys


def main() -> int:
    import os

    env = dict(os.environ, TVM_TPU_TESTS="1")
    cmd = [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
           "tests/test_extend_device.py"]
    return subprocess.call(cmd, env=env)


if __name__ == "__main__":
    sys.exit(main())
