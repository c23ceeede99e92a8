"""Benchmark entry point. Prints JSON lines for the driver; the LAST
line is the authoritative result.

Measures end-to-end prover wall-clock for a BASELINE.md workload
(default: config 1, fibonacci at padded height 2^10; select others with
TVM_BENCH). The NTT/LDE/Tip5/Merkle/quotient stages run on the default
device (real TPU under the driver); witness generation and proof
serialization are host-side.

Robustness against driver timeouts (the round-3/4 failure mode):
 - a provisional JSON line is printed (and flushed) IMMEDIATELY after
   the first (cold) prove, so a timeout during the warm prove or verify
   still records a number;
 - a watchdog thread emits a best-known partial line shortly before the
   budget (TVM_BENCH_BUDGET_S, default 540 s) expires, so even a
   timeout during the cold prove records the phase reached;
 - the warm prove and verify are skipped when the remaining budget is
   too short for them.

NOTE: under the axon TPU platform, block_until_ready() lies; end-to-end
wall-clock (which includes host readbacks) is the honest measure here.
"""

import json
import os
import sys
import threading
import time

_T0 = time.perf_counter()
_BUDGET = float(os.environ.get("TVM_BENCH_BUDGET_S", "540"))
_STATE = {
    "phase": "import",      # mutated as the run advances
    "line": None,           # best-known result dict
    "final": False,         # True once the authoritative line is out
}
_LOCK = threading.Lock()


def _elapsed():
    return time.perf_counter() - _T0


def _emit(line):
    """Print one JSON line and flush; the driver reads the tail."""
    print(json.dumps(line), flush=True)


def _watchdog():
    """Emit whatever we know just before the budget expires."""
    deadline = _BUDGET - 15.0
    while True:
        wait = deadline - _elapsed()
        if wait <= 0:
            break
        time.sleep(min(wait, 5.0))
    with _LOCK:
        if _STATE["final"]:
            return
        line = _STATE["line"]
        if line is None:
            # Not a prover measurement: a lower bound showing where the
            # run was when the budget ran out.
            line = {
                "metric": _STATE.get("metric", "bench"),
                "value": round(_elapsed(), 3),
                "unit": "s",
                "vs_baseline": 0.0,
                "incomplete": True,
                "phase_reached": _STATE["phase"],
            }
        _emit(line)


def _merkle_auth_fixture(height: int):
    """Merkle authentication-path workload (BASELINE config 4): verify
    several divined paths in a height-`height` tree."""
    import numpy as np

    from triton_vm_tpu.crypto import tip5
    from triton_vm_tpu.models import example_programs as ex
    from triton_vm_tpu.vm.machine import NonDeterminism

    rng = np.random.default_rng(11)
    from triton_vm_tpu.fields.bfe import P
    leaves = [tuple(int(x) for x in rng.integers(0, P, size=5))
              for _ in range(1 << height)]
    layers = [leaves]
    while len(layers[-1]) > 1:
        prev = layers[-1]
        layers.append([tuple(tip5.hash_pair(prev[2 * i], prev[2 * i + 1]))
                       for i in range(len(prev) // 2)])
    root = layers[-1][0]

    leaf_index = 5
    digests = []
    idx = leaf_index
    for layer in layers[:-1]:
        digests.append(layer[idx ^ 1])
        idx //= 2
    inputs = ([height, leaf_index]
              + list(reversed(leaves[leaf_index])) + list(reversed(root)))
    return (ex.merkle_verify(), inputs,
            NonDeterminism(digests=digests))


def _recursive_verifier_fixture():
    """BASELINE config 5: the inner proof is a small fib proof; the
    benchmarked workload proves the VM execution of the verifier-core
    program checking that proof (models/recursive_verifier.py)."""
    from triton_vm_tpu import Claim, Stark, PublicInput, VM
    from triton_vm_tpu.models import example_programs as ex
    from triton_vm_tpu.models import recursive_verifier as rv

    program = ex.fibonacci()
    aet, output = VM.trace_execution(program, PublicInput([7]))
    claim = (Claim.about_program(program)
             .with_input([7]).with_output(output))
    inner = Stark().prove(claim, aet, seed=bytes(range(32)))
    r = rv.build(claim, inner, Stark(), num_queries=1)
    return r.programs["combined"], [], r.non_determinism


def main():
    os.environ.setdefault("TVM_JAX_CACHE", "1")
    threading.Thread(target=_watchdog, daemon=True).start()

    from triton_vm_tpu import Claim, Stark, PublicInput, VM, profiler
    from triton_vm_tpu.models import example_programs as ex

    # BASELINE.md benchmark configs; select with TVM_BENCH
    def spin16():
        program, iterations = ex.spin(16)
        return program, [iterations]

    configs = {
        # 85 loop iterations put the padded height at 2^10 (config 1)
        "fib_1024": (ex.fibonacci, [85], "prove_fib_padded_height_1024"),
        "factorial_4096": (ex.factorial, [500],
                           "prove_factorial_padded_height_4096"),
        # config 2: loop workload at padded height 2^16
        "spin_65536": (spin16, None, "prove_spin_padded_height_65536"),
        "hash_chain": (ex.hash_chain, [200],
                       "prove_hash_chain_hash_table_dominated"),
        # config 4: Merkle authentication-path verification (divine +
        # merkle_step; RAM-light, hash-heavy)
        "merkle_auth": (None, None, "prove_merkle_auth_path"),
        # config 5: prove the execution of the recursive-verifier core
        # (models/recursive_verifier.py — STARK verification inside the
        # VM; AIR eval + OOD check + Merkle walks + DEEP updates)
        "recursive_verifier": (None, None, "prove_recursive_verifier"),
    }
    which = os.environ.get("TVM_BENCH", "fib_1024")
    if which.startswith("spin_") and which not in configs:
        # arbitrary spin height: TVM_BENCH=spin_<2^k> (e.g. spin_262144)
        log2h = int(which.split("_")[1]).bit_length() - 1

        def make_spin(log2h=log2h):
            program, iterations = ex.spin(log2h)
            return program, [iterations]

        configs[which] = (make_spin, None,
                          f"prove_spin_padded_height_{1 << log2h}")
    if which not in configs:
        raise SystemExit(f"unknown TVM_BENCH={which!r}; "
                         f"choose from {sorted(configs)}")
    make_program, inputs, metric = configs[which]
    _STATE["metric"] = metric + "_wall_clock"
    _STATE["phase"] = "witness"
    non_determinism = None
    if which.startswith("spin_"):
        program, inputs = make_program()
    elif which == "merkle_auth":
        program, inputs, non_determinism = _merkle_auth_fixture(height=10)
    elif which == "recursive_verifier":
        program, inputs, non_determinism = _recursive_verifier_fixture()
    else:
        program = make_program()
    aet, output = VM.trace_execution(program, PublicInput(inputs),
                                     non_determinism)
    claim = (Claim.about_program(program)
             .with_input(inputs).with_output(output))
    stark = Stark()

    # Warm the device link before the timed window: the first transfer +
    # dispatch of a process pays a one-time session ramp (measured 45s to
    # 430s on the tunneled TPU backend, independent of payload); it is
    # environment setup, not prover work.
    _STATE["phase"] = "device_link_ramp"
    import numpy as _np
    from triton_vm_tpu.ops import gf as _gf
    _warm = _gf.from_u64(_np.zeros((64, 4096), _np.uint64))
    _np.asarray(_gf.add(_warm, _warm)[0])
    ramp_s = _elapsed()

    # vs_baseline: reference prover wall-clock / ours (>1 = we beat it).
    # No Rust toolchain exists in this environment and the reference
    # publishes no absolute numbers; the anchors below are DERIVED from
    # the reference's own operation counts (NTT butterflies, Tip5
    # permutations/row, constraint-evaluation ops) priced at standard
    # single-core Rust throughputs — full calculation with all inputs in
    # BASELINE.md "Derived absolute anchors". fib-2^10 uses the
    # aggressive end of the derived 0.9-1.1 s single-core range
    # (conservative against us); spin-2^16 anchors the 64-core rayon
    # prover at ~60% parallel efficiency.
    baselines_s = {"fib_1024": 0.5, "spin_65536": 1.6}
    base = baselines_s.get(which)
    base_src = ("BASELINE.md derived-anchor table "
                "(op counts x published per-op throughputs)"
                if base else "none")

    def result(seconds, **extra):
        line = {
            "metric": metric + "_wall_clock",
            "value": round(seconds, 3),
            "unit": "s",
            "vs_baseline": round(base / seconds, 4) if base else 0.0,
            "baseline_source": base_src,
        }
        line.update(extra)
        return line

    # Cold prove: includes per-process XLA trace + executable load cost
    # (compiles themselves hit the persistent cache). Steady-state prove:
    # the production figure — a prover service proves many claims per
    # process, and the Rust reference has no per-proof compile either.
    _STATE["phase"] = "cold_prove"
    t0 = time.perf_counter()
    proof = stark.prove(claim, aet, seed=bytes(range(32)))
    cold_seconds = time.perf_counter() - t0
    with _LOCK:
        _STATE["line"] = result(
            cold_seconds, partial=True, cold_prove_s=round(cold_seconds, 3),
            ramp_s=round(ramp_s, 1))
        _emit(_STATE["line"])

    # Warm prove — the headline number — only if the budget allows
    # roughly another cold-prove-free run plus margin.
    warm_budget = max(2.0 * cold_seconds / 8.0, 30.0)
    if _elapsed() + warm_budget < _BUDGET - 20.0:
        _STATE["phase"] = "warm_prove"
        profiler.start("prove " + which)
        t0 = time.perf_counter()
        proof = stark.prove(claim, aet, seed=bytes(range(32)))
        prove_seconds = time.perf_counter() - t0
        report = (profiler.finish()
                  .with_cycle_count(aet.height_of_table("processor"))
                  .with_padded_height(aet.padded_height()))
        if os.environ.get("TVM_PROFILE") == "1":
            print(report, file=sys.stderr)
        stages = {name: round(seconds, 3)
                  for name, seconds, _cat in report.spans()}
        with _LOCK:
            _STATE["line"] = result(
                prove_seconds, cold_prove_s=round(cold_seconds, 3),
                ramp_s=round(ramp_s, 1), stages=stages)
            _emit(_STATE["line"])

    # Speed-of-light accounting (TVM_BENCH_SOL=1): per-kernel throughput
    # vs the chip's HBM bandwidth — the honest ceiling for these
    # bandwidth-bound kernels (one read + one write per element).
    if (os.environ.get("TVM_BENCH_SOL") == "1"
            and _elapsed() + 60.0 < _BUDGET - 20.0):
        _STATE["phase"] = "sol"
        import numpy as np
        from triton_vm_tpu.fields.bfe import P as _P
        from triton_vm_tpu.ops import gf, tip5_kernel

        peak_gbps = float(os.environ.get("TVM_HBM_GBPS", "819"))
        rng = np.random.default_rng(3)

        def fence(v):
            leaf = v
            while isinstance(leaf, tuple):
                leaf = leaf[0]
            np.asarray(leaf[(0,) * leaf.ndim])

        def rate(f, arg, n=3):
            fence(f(arg))  # build + warm
            t0 = time.perf_counter()
            for _ in range(n):
                fence(f(arg))
            return (time.perf_counter() - t0) / n

        sol = {}
        b = 1 << 18
        st = gf.from_u64(rng.integers(0, _P, (16, b), dtype=np.uint64))
        t = rate(tip5_kernel.permutation, st)
        gbps = 2 * 16 * b * 8 / t / 1e9  # one read + one write of state
        sol["tip5_perms_per_s"] = round(b / t)
        sol["tip5_ns_per_perm"] = round(1e9 * t / b, 2)
        sol["tip5_hbm_gbps"] = round(gbps, 1)
        sol["tip5_pct_of_hbm_sol"] = round(100 * gbps / peak_gbps, 1)
        rows = gf.from_u64(rng.integers(0, _P, (b, 379), dtype=np.uint64))
        t = rate(tip5_kernel.sponge_absorb_rows, rows)
        gbps = (b * 379 * 8 + b * 40) / t / 1e9
        sol["row_sponge_rows_per_s"] = round(b / t)
        sol["row_sponge_hbm_gbps"] = round(gbps, 1)
        sol["row_sponge_pct_of_hbm_sol"] = round(100 * gbps / peak_gbps, 1)
        from triton_vm_tpu.ops import ntt as _ntt
        cols = gf.from_u64(rng.integers(0, _P, (379, 1 << 12),
                                        dtype=np.uint64))
        t = rate(lambda v: _ntt.lde(v, 4, 1, 7), cols)
        limbs = 379 * (1 << 12) * 4
        sol["lde4x_limbs_per_s_379x4096"] = round(limbs / t)
        with _LOCK:
            _STATE["line"] = dict(_STATE["line"], sol=sol)
            _emit(_STATE["line"])

    verify_s = None
    if _elapsed() + 30.0 < _BUDGET - 10.0:
        _STATE["phase"] = "verify"
        t0 = time.perf_counter()
        assert stark.verify(claim, proof)
        verify_s = time.perf_counter() - t0
        with _LOCK:
            _STATE["line"] = dict(_STATE["line"],
                                  verify_s=round(verify_s, 3))

    with _LOCK:
        _STATE["final"] = True
        _emit(_STATE["line"])


if __name__ == "__main__":
    main()
