"""Run-time configuration: the cache-or-JIT low-degree-extension decision.

TPU-native re-design of the reference's config system
(/root/reference/triton-vm/src/config.rs:24-94): the reference decides
whether to cache the low-degree-extended trace based on an environment
variable override and available host memory; here the budget is the
accelerator's HBM (the committed codewords live on device), queried from
the JAX backend, with the same override knob semantics.

Decision inputs, in precedence order (config.rs:60-94):
  1. `TVM_CACHE_LDE=cache|jit`    — explicit override (the reference's
     `TVM_LDE_TRACE=cache|no_cache`, renamed for this backend).
  2. programmatic override via `overwrite_lde_trace_caching_to(...)`.
  3. heuristic: cache iff the committed main+aux+quotient codewords fit
     in a fraction of the device's free/total memory.
"""

from __future__ import annotations

import os
from enum import Enum


class CacheDecision(Enum):
    CACHE = "cache"
    JIT = "jit"


_override: CacheDecision | None = None

# Committed-codeword bytes per LDT-domain row: 379 main (u32 hi+lo limb
# pairs = 8 B per BFE) + 91 aux XFE (24 B) + 5 quotient segment XFE.
_BYTES_PER_LDT_ROW = 379 * 8 + 91 * 24 + 5 * 24

# Use at most this fraction of device memory for cached codewords; the
# prover also needs working space for NTTs, hashes, and quotients.
_MEM_FRACTION = 0.4


def overwrite_lde_trace_caching_to(decision: CacheDecision | None) -> None:
    """Programmatic analog of config.rs `overwrite_lde_trace_caching_to`."""
    global _override
    _override = decision


def _device_memory_bytes() -> int:
    """Best-effort device memory budget (bytes)."""
    backend = "cpu"
    try:
        import jax

        backend = jax.default_backend()
        dev = jax.devices()[0]
        stats = dev.memory_stats()
        if stats:
            limit = stats.get("bytes_limit") or stats.get(
                "bytes_reservable_limit")
            if limit:
                in_use = stats.get("bytes_in_use", 0)
                return max(int(limit) - int(in_use), 0)
    except Exception:
        pass
    if backend != "cpu":
        # Accelerator that exposes no memory stats (the tunneled axon
        # TPU backend): falling back to HOST memory here chose CACHE at
        # L = 2^21 and OOMed a 15.75 GB chip (BENCH spin_262144, r5).
        # Assume one v5e-class chip's HBM unless told otherwise.
        return int(os.environ.get("TVM_DEVICE_HBM_BYTES", str(15 << 30)))
    # CPU backend: use host memory
    try:
        import os as _os

        page = _os.sysconf("SC_PAGE_SIZE")
        avail = _os.sysconf("SC_AVPHYS_PAGES")
        return page * avail
    except (ValueError, OSError):
        return 8 << 30


def cache_lde_trace(ldt_domain_len: int) -> CacheDecision:
    """Decide whether the prover materializes the full committed
    codewords (CACHE) or recomputes them coset-by-coset (JIT).

    Mirrors config.rs:60-94: env override first, then programmatic
    override, then a memory heuristic.
    """
    env = os.environ.get("TVM_CACHE_LDE", "").lower()
    if env in ("cache", "1"):
        return CacheDecision.CACHE
    if env in ("jit", "no_cache", "0"):
        return CacheDecision.JIT
    if _override is not None:
        return _override
    needed = ldt_domain_len * _BYTES_PER_LDT_ROW
    budget = _device_memory_bytes() * _MEM_FRACTION
    return CacheDecision.CACHE if needed <= budget else CacheDecision.JIT
