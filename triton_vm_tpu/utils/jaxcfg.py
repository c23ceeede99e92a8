"""Process-wide JAX configuration for the framework.

Enables the persistent compilation cache (the Tip5/NTT graphs are large;
recompiling them per process is the dominant cost in tests and CLI runs).
"""

from __future__ import annotations

import os

_DONE = False


def setup():
    global _DONE
    if _DONE:
        return
    _DONE = True
    import jax

    cache_dir = os.environ.get(
        "TVM_JAX_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"),
    )
    if os.environ.get("TVM_JAX_CACHE", "1") == "0":
        return
    try:
        # The XLA:CPU AOT cache mis-detects machine features in this
        # environment and fails to load every entry (wasting time and
        # spamming stderr); only use the persistent cache on real backends.
        if jax.default_backend() != "cpu":
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              0.5)
    except Exception:
        pass
