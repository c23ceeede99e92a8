"""The Triton VM zk-STARK prover and verifier.

Transcribes /root/reference/triton-vm/src/stark.rs: parameter derivation
(randomized trace length, max degree, FRI setup), the full DEEP-ALI proving
pipeline (stark.rs:331-719) and verification (stark.rs:1388-1763).

Compute placement: NTT/LDE/iNTT, Merkle/Tip5 hashing, quotient AIR
evaluation (compiled tapes, air/compile.py), DEEP codewords, OOD
barycentric numerators and weighted column sums all run on device
(ops/kernels.py); witness generation, aux extension, Fiat-Shamir, and the
O(num_cols * num_trace_randomizers) randomizer algebra are host-side.
The host<->device boundary uses numpy uint64 arrays; all device math is
bit-exact mod-P (differential-tested in tests/test_prover_helpers.py).
"""

from __future__ import annotations

import functools

import numpy as np

from ..air import circuit as C
from ..air import columns
from ..air.challenges import SAMPLE_COUNT, Challenges
from ..air.evaluate import eval_host, eval_vectorized_obj, linearize
from ..air.master import master_air
from ..crypto import merkle, tip5
from ..fields import bfe, poly, xfe
from ..fields.bfe import P
from ..ldt.fri import Fri, FriParameters, LdtError
from ..ops import gf, gfx, kernels, ntt, tip5_kernel
from ..tables import master as mt
from .arithmetic_domain import Domain
from .proof_item import ProofItem
from .proof_stream import Claim, Proof, ProofStream

import os as _os
import time as _time

from ..utils import profiler as _profiler

_TRACE = _os.environ.get("TVM_TRACE") == "1"
_T0 = _time.time()
_CURRENT_STAGE = None


def _trace(msg, category=None):
    """Stage marker: closes the previous prover stage span (if any) and
    opens a new one in the global profiler; also prints under TVM_TRACE=1.
    Call with msg=None to close the final stage."""
    global _CURRENT_STAGE
    if _CURRENT_STAGE is not None:
        _profiler.exit(_CURRENT_STAGE)
    _CURRENT_STAGE = msg
    if msg is not None:
        _profiler.enter(msg, category)
    if _TRACE and msg is not None:
        print(f"[{_time.time() - _T0:8.1f}s] {msg}", flush=True)

NUM_QUOTIENT_SEGMENTS = 4
NUM_RANDOMIZED_QUOTIENT_SEGMENTS = 5
NUM_DEEP_CODEWORD_COMPONENTS = 4
NUM_MAIN = 379
NUM_AUX = 91
ZETA = 3


class ProvingError(RuntimeError):
    pass


class VerificationError(RuntimeError):
    pass


# ------------------------------------------------------ deterministic RNG

def _drbg_bfes(seed: bytes, offset: int, n: int) -> list[int]:
    """Deterministic BFE stream from a 32-byte seed and an offset:
    rand::StdRng (ChaCha12) seeded with the reference's per-purpose
    seed-offset scheme (master_table.rs:631-663, trace randomizer
    generation at :423-434). See utils/stdrng.py; AUDIT.md item 1 tracks
    validation against Rust-generated vectors."""
    from ..utils.stdrng import ChaCha12Rng

    return ChaCha12Rng(_offset_seed(seed, offset)).random_bfes(n)


def _drbg_bfes_rows(seed: bytes, offsets, n: int) -> np.ndarray:
    """Batched `_drbg_bfes` (vectorized ChaCha keystream): (B, n) u64."""
    from ..utils.stdrng import drbg_bfes_batch

    return drbg_bfes_batch(seed, offsets, n).astype(np.uint64)


def _drbg_xfes_rows(seed: bytes, offsets, n: int) -> np.ndarray:
    """Batched `_drbg_xfes`: (B, n, 3) u64."""
    from ..utils.stdrng import drbg_xfes_batch

    return drbg_xfes_batch(seed, offsets, n).astype(np.uint64)


def _offset_seed(seed: bytes, offset: int) -> bytes:
    total = (int.from_bytes(seed, "little") + offset) % (1 << (8 * len(seed)))
    return total.to_bytes(len(seed), "little")


def _drbg_xfes(seed: bytes, offset: int, n: int) -> list[tuple]:
    flat = _drbg_bfes(seed, offset, 3 * n)
    return [tuple(flat[3 * i:3 * i + 3]) for i in range(n)]


# ------------------------------------------------------------- parameters

@functools.lru_cache(maxsize=1)
def _max_constraint_degrees() -> dict:
    """Per-phase maximum constraint degree of the lowered master AIR
    (walked once; Stark.max_degree is called by prover AND verifier)."""
    air = master_air()
    out = {}
    for phase, cs in air.constraints.items():
        memo = {}
        out[phase] = max((C.degree(c.node, memo) for c in cs), default=0)
    return out


class Stark:
    """Protocol parameters (stark.rs:113-145): security level, expansion
    factor, LDT choice override, and the proximity-gap soundness regime
    (`proven` Johnson bound / `conjectured` list-decoding capacity,
    low_degree_test/mod.rs:120-155)."""

    ZETA = ZETA

    def __init__(self, security_level=160, log2_ldt_expansion_factor=2,
                 ldt_choice=None, soundness="proven"):
        assert log2_ldt_expansion_factor > 0
        assert ldt_choice in (None, "fri", "stir")
        assert soundness in ("proven", "conjectured")
        self.security_level = security_level
        self.log2_ldt_expansion_factor = log2_ldt_expansion_factor
        self.ldt_choice = ldt_choice
        self.soundness = soundness

    def with_ldt_choice(self, choice):
        return Stark(self.security_level, self.log2_ldt_expansion_factor,
                     choice, self.soundness)

    def with_soundness(self, soundness):
        return Stark(self.security_level, self.log2_ldt_expansion_factor,
                     self.ldt_choice, soundness)

    @classmethod
    def low_security(cls):
        return cls(32, 2)

    # -- degree bookkeeping ------------------------------------------------

    @staticmethod
    def num_quotient_table_randomizers(num_trace_randomizers):
        return (num_trace_randomizers + 1) * NUM_RANDOMIZED_QUOTIENT_SEGMENTS

    @classmethod
    def randomized_trace_len(cls, padded_height, num_trace_randomizers):
        n = max(padded_height + num_trace_randomizers,
                2 * num_trace_randomizers + 1,
                cls.num_quotient_table_randomizers(num_trace_randomizers))
        return 1 << (n - 1).bit_length()

    @classmethod
    def interpolant_degree(cls, padded_height, num_trace_randomizers):
        return cls.randomized_trace_len(
            padded_height, num_trace_randomizers) - 1

    @classmethod
    @functools.lru_cache(maxsize=64)
    def max_degree(cls, padded_height, num_trace_randomizers):
        d = cls.interpolant_degree(padded_height, num_trace_randomizers)
        zerofier_deg = {"init": 1, "cons": padded_height,
                        "tran": padded_height - 1, "term": 1}
        best = 0
        for phase, deg in _max_constraint_degrees().items():
            best = max(best, deg * d - zerofier_deg[phase])
        smallest_domain = 1 << (best - 1).bit_length()
        return smallest_domain - 1

    @staticmethod
    def num_trace_randomizers(fri: Fri) -> int:
        # h = t + k*e*f + 1 (stark.rs:2083-2089)
        return fri.num_first_round_queries() + NUM_QUOTIENT_SEGMENTS * 3 * 2 + 1

    def fri(self, padded_height: int) -> Fri:
        log2_ph = max(padded_height, 1).bit_length() - 1
        log2_bound = log2_ph
        for _ in range(33):
            log2_bound += 1
            fri = Fri(FriParameters(
                security_level=self.security_level,
                log2_initial_expansion_factor=self.log2_ldt_expansion_factor,
                log2_high_degree_bound=log2_bound,
                soundness=self.soundness))
            ntr = self.num_trace_randomizers(fri)
            rand_len = self.randomized_trace_len(padded_height, ntr)
            if fri.initial_domain().length >= rand_len * (
                    1 << self.log2_ldt_expansion_factor):
                return fri
        raise ProvingError("no suitable FRI parameters found")

    def stir(self, padded_height: int) -> "Stir":
        """Derive a usable STIR instance (stark.rs:2007-2060): k = 4, high
        degree bound grown until the initial domain covers the randomized
        trace times the expansion factor."""
        from ..ldt.stir import Stir as StirLdt
        from ..ldt.stir import StirParameters

        log2_ph = max(padded_height, 1).bit_length() - 1
        log2_bound = log2_ph
        for _ in range(33):
            log2_bound += 1
            stir = StirLdt(StirParameters(
                security_level=self.security_level,
                log2_folding_factor=2,
                log2_initial_expansion_factor=self.log2_ldt_expansion_factor,
                log2_high_degree_bound=log2_bound,
                soundness=self.soundness))
            ntr = self.num_trace_randomizers(stir)
            rand_len = self.randomized_trace_len(padded_height, ntr)
            if stir.initial_domain().length >= rand_len * (
                    1 << self.log2_ldt_expansion_factor):
                return stir
        raise ProvingError("no suitable STIR parameters found")

    def ldt(self, padded_height: int):
        """Pick the low-degree test (stark.rs:1942-1958): FRI below padded
        height 2^16 (proven regime) / 2^17 (conjectured regime), STIR
        above; `ldt_choice` overrides."""
        choice = self.ldt_choice
        if choice is None:
            log2_ph = max(padded_height, 1).bit_length() - 1
            cutoff = 16 if self.soundness == "proven" else 17
            choice = "fri" if log2_ph < cutoff else "stir"
        return self.fri(padded_height) if choice == "fri" \
            else self.stir(padded_height)

    def derive_domains(self, padded_height):
        fri = self.ldt(padded_height)
        ntr = self.num_trace_randomizers(fri)
        rand_len = self.randomized_trace_len(padded_height, ntr)
        max_deg = self.max_degree(padded_height, ntr)
        trace = Domain(rand_len // 2)
        randomized_trace = Domain(rand_len)
        ldt = fri.initial_domain()
        q_len = 1 << (max_deg - 1).bit_length()  # next_power_of_two
        quotient = Domain(q_len, ldt.offset)
        return fri, ntr, trace, randomized_trace, quotient, ldt

    def prove(self, claim: Claim, aet, seed: bytes = None) -> Proof:
        return Prover(self, seed).prove(claim, aet)

    def verify(self, claim: Claim, proof: Proof):
        return Verifier(self).verify(claim, proof)


# ----------------------------------------------------------------- prover

class Prover:
    def __init__(self, parameters: Stark, seed: bytes = None):
        self.parameters = parameters
        if seed is None:
            import os
            seed = os.urandom(32)
        assert len(seed) == 32
        self.seed = seed

    def prove(self, claim: Claim, aet) -> Proof:
        try:
            return self._prove(claim, aet)
        finally:
            # Close any stage span left open by an exception so a failed
            # prove cannot poison the global profiler session state.
            _trace(None)

    def _prove(self, claim: Claim, aet) -> Proof:
        stark = self.parameters
        proof_stream = ProofStream()
        proof_stream.alter_fiat_shamir_state_with(claim.encode())

        padded_height = aet.padded_height()
        fri, ntr, trace_dom, rand_dom, quot_dom, ldt_dom = \
            stark.derive_domains(padded_height)
        proof_stream.enqueue(ProofItem(
            "Log2PaddedHeight", padded_height.bit_length() - 1))

        h = trace_dom.length
        L = ldt_dom.length
        Q = quot_dom.length
        E = max(L, Q)  # evaluation domain length
        eval_dom = ldt_dom if L >= Q else quot_dom

        # ------------------------------------------------------ main table
        import jax as _jax

        from ..parallel import sharding
        from ..tables import extend_device
        from .. import config as tvm_config
        from . import jit_lde

        mesh = sharding.active_mesh()
        # Cache-or-JIT commitment decision (config.rs:24-94 analog): the
        # JIT path never materializes the (num_cols, L) codewords; it
        # commits and reveals coset-by-coset (master_table.rs:258-322,
        # stark.rs:805-1006). Mesh sharding implies the cached path.
        use_jit = (mesh is None and tvm_config.cache_lde_trace(L)
                   is tvm_config.CacheDecision.JIT)
        # Device-resident witness (accelerators, cache path): derived
        # columns + aux extension + randomizer column all computed on
        # device from ONE upload of the 149 AIR columns — the numpy flow
        # round-trips the full tables through the ~10-80 MB/s tunnel.
        # Same tapes/scans as the host flow: bit-identical.
        # TVM_DEVICE_WITNESS=1 forces the path ON even on CPU (so CI can
        # bit-identity-test it); =0 forces it OFF; default 'auto' uses it
        # on real accelerators.
        _dw = _os.environ.get("TVM_DEVICE_WITNESS", "auto")
        device_witness = (not use_jit
                          and (_dw == "1"
                               or (_dw == "auto"
                                   and _jax.default_backend() != "cpu")))

        _trace("fill main", "witness")
        main = mt.fill_main_table(aet, padded_height=h)
        main_dev = None
        if device_witness:
            main_dev = extend_device.main_witness_dev(main)
        else:
            mt.fill_derived_main_columns(main)

        main_rand_coeffs = _drbg_bfes_rows(self.seed, range(NUM_MAIN), ntr)
        _trace("main LDE", "LDE")
        zvals_dev = gf.from_u64(_trace_zerofier_values(trace_dom, eval_dom))
        if mesh is not None:
            zvals_dev = sharding.replicate(mesh, zvals_dev)

        def pad_cols(arr, ncp):
            if ncp == arr.shape[0]:
                return arr
            pad = np.zeros((ncp - arr.shape[0],) + arr.shape[1:], np.uint64)
            return np.concatenate([arr, pad])

        def col_sharded(arr, ncp):
            v = gf.from_u64(pad_cols(np.ascontiguousarray(arr), ncp))
            return sharding.shard(mesh, v, 0, arr.ndim) if mesh else v

        def col_sharded_dev(v, ncp):
            # device gf pair (nc, h): pad the column axis, then shard
            nc = v[0].shape[0]
            if ncp != nc:
                import jax.numpy as jnp

                v = gf.tmap(
                    lambda a: jnp.pad(a, ((0, ncp - nc), (0, 0))), v)
            return sharding.shard(mesh, v, 0, 2) if mesh else v

        main_lde_dev = main_coeffs_dev = None
        main_rand_dev = gf.from_u64(np.asarray(main_rand_coeffs, np.uint64))
        if use_jit:
            main_coeffs_dev = jit_lde.interpolate_columns_bfe(
                gf.from_u64(main.T.astype(np.uint64)), rand_dom.length)
            dg = jit_lde.committed_digests_bfe(
                main_coeffs_dev, main_rand_dev, eval_dom, L, h, ntr)
            _trace("main merkle", "hash")
            main_tree = merkle.MerkleTree(dg.T)
        else:
            ncp_main = (-(-NUM_MAIN // mesh.size) * mesh.size if mesh
                        else NUM_MAIN)
            main_cols_in = (col_sharded_dev(main_dev, ncp_main)
                            if device_witness else
                            col_sharded(main.T.astype(np.uint64), ncp_main))
            main_lde_dev, main_flat = _commit_bfe_fn(
                h, E, L, eval_dom.offset, ntr, NUM_MAIN, ncp_main)(
                    main_cols_in,
                    col_sharded(np.asarray(main_rand_coeffs, np.uint64),
                                ncp_main),
                    zvals_dev)

            _trace("main merkle", "hash")
            main_tree = merkle.MerkleTree.from_flat(
                tip5_kernel.assemble_flat_device(*main_flat), L)
        proof_stream.enqueue(ProofItem("MerkleRoot", main_tree.root()))
        challenges = Challenges(proof_stream.sample_scalars(SAMPLE_COUNT),
                                claim)

        # ------------------------------------------------------- aux table
        _trace("extend aux", "witness")
        aux = aux_dev = None
        if device_witness:
            batch_rand = np.asarray(_drbg_xfes_rows(
                self.seed, [NUM_MAIN + NUM_AUX], h)[0], np.uint64)
            aux_dev = extend_device.aux_witness_dev(
                main_dev, challenges, batch_rand)
        else:
            aux = mt.extend(main, challenges)
            mt.fill_derived_aux_columns(main, aux, challenges.challenges)
            aux[:, NUM_AUX - 1, :] = _drbg_xfes_rows(
                self.seed, [NUM_MAIN + NUM_AUX], h)[0]

        aux_rand_coeffs = _drbg_xfes_rows(
            self.seed, range(NUM_MAIN, NUM_MAIN + NUM_AUX), ntr)
        _trace("aux LDE", "LDE")
        rc = np.array(aux_rand_coeffs, np.uint64)  # (NUM_AUX, ntr, 3)
        aux_lde_dev = aux_coeffs_dev = None
        aux_rand_dev = tuple(gf.from_u64(rc[:, :, c]) for c in range(3))
        if use_jit:
            aux_coeffs_dev = jit_lde.interpolate_columns_xfe(
                tuple(gf.from_u64(aux[:, :, c].T.astype(np.uint64))
                      for c in range(3)), rand_dom.length)
            dg = jit_lde.committed_digests_xfe(
                aux_coeffs_dev, aux_rand_dev, eval_dom, L, h, ntr)
            _trace("aux merkle", "hash")
            aux_tree = merkle.MerkleTree(dg.T)
        else:
            ncp_aux = (-(-NUM_AUX // mesh.size) * mesh.size if mesh
                       else NUM_AUX)
            aux_cols_in = (tuple(col_sharded_dev(aux_dev[c], ncp_aux)
                                 for c in range(3))
                           if device_witness else
                           tuple(col_sharded(aux[:, :, c].T, ncp_aux)
                                 for c in range(3)))
            aux_lde_dev, aux_flat = _commit_xfe_fn(
                h, E, L, eval_dom.offset, ntr, NUM_AUX, ncp_aux)(
                    aux_cols_in,
                    tuple(col_sharded(rc[:, :, c], ncp_aux)
                          for c in range(3)),
                    zvals_dev)

            _trace("aux merkle", "hash")
            aux_tree = merkle.MerkleTree.from_flat(
                tip5_kernel.assemble_flat_device(*aux_flat), L)
        proof_stream.enqueue(ProofItem("MerkleRoot", aux_tree.root()))

        initial_quot_weight = proof_stream.sample_scalars(1)[0]
        num_constraints = sum(
            len(cs) for cs in master_air().constraints.values())
        quot_weights = _powers_xfe(initial_quot_weight, num_constraints)

        # --------------------------------------------- quotient segments
        stride = E // Q
        _trace("quotients", "quotient")
        if use_jit:
            quotient_np = jit_lde.quotient_codeword_jit(
                main_coeffs_dev, aux_coeffs_dev, main_rand_dev,
                aux_rand_dev, trace_dom, quot_dom, challenges,
                quot_weights, ntr)
            quotient_dev = gfx.from_u64(quotient_np)
        elif _use_device_quotients():
            main_q = (gf.tmap(lambda a: a[:, ::stride], main_lde_dev)
                      if stride != 1 else main_lde_dev)
            aux_q = (gfx.tmap(lambda a: a[:, ::stride], aux_lde_dev)
                     if stride != 1 else aux_lde_dev)
            quotient_dev = _all_quotients_combined_device(
                main_q, aux_q, trace_dom, quot_dom, challenges,
                quot_weights, return_device=True)
        else:
            main_lde_np = gf.to_u64(main_lde_dev)
            aux_lde_np = np.stack(
                [gf.to_u64(aux_lde_dev[c]) for c in range(3)])
            main_q = main_lde_np[:, ::stride] if stride != 1 else main_lde_np
            aux_q = (aux_lde_np[:, :, ::stride] if stride != 1
                     else aux_lde_np)
            quotient_np = np.asarray(_all_quotients_combined(
                main_q, aux_q, trace_dom, quot_dom, challenges,
                quot_weights), np.uint64)
            quotient_dev = gfx.from_u64(quotient_np)

        # ------------------------------ segmentify + randomize + commit
        # (stark.rs:1128-1360) — one fused device dispatch
        _trace("segmentify", "quotient")
        n_qr = Stark.num_quotient_table_randomizers(ntr)
        q_randomizer = _drbg_xfes_rows(
            self.seed, [NUM_MAIN + NUM_AUX + 1], n_qr)[0]
        polys_dev, cws_dev, quot_flat = _segmentify_fn(
            Q, L, n_qr, quot_dom.offset, ldt_dom.offset)(
                quotient_dev, gfx.from_u64(q_randomizer))
        # small host copies of the 5 segment polynomials, needed only on
        # the JIT path (the cached path evaluates the committed segment
        # codewords barycentrically on device instead)
        rand_seg_polys = ([gfx.to_u64(p) for p in polys_dev] if use_jit
                          else None)

        _trace("quot merkle", "hash")
        quot_tree = merkle.MerkleTree.from_flat(
            tip5_kernel.assemble_flat_device(*quot_flat), L)
        proof_stream.enqueue(ProofItem("MerkleRoot", quot_tree.root()))

        # ------------------------------------------------------- OOD rows
        _trace("OOD", "DEEP")
        alpha = proof_stream.sample_scalars(1)[0]
        omega_alpha = xfe.bfe_mul(alpha, trace_dom.generator)
        alpha_pow_k = xfe.mod_pow(alpha, NUM_QUOTIENT_SEGMENTS)
        zeta_alpha = xfe.bfe_mul(alpha, ZETA)
        zeta_alpha_pow_k = xfe.mod_pow(zeta_alpha, NUM_QUOTIENT_SEGMENTS)

        if use_jit:
            ood_main_curr, ood_aux_curr = _ood_rows(
                main, aux, main_rand_coeffs, aux_rand_coeffs, trace_dom,
                alpha)
            ood_main_next, ood_aux_next = _ood_rows(
                main, aux, main_rand_coeffs, aux_rand_coeffs, trace_dom,
                omega_alpha)
            ood_quot_p = [_poly_eval_arr(rand_seg_polys[i], alpha_pow_k)
                          for i in range(NUM_QUOTIENT_SEGMENTS)]
            ood_quot_r = [_poly_eval_arr(rand_seg_polys[i + 1],
                                         zeta_alpha_pow_k)
                          for i in range(NUM_QUOTIENT_SEGMENTS)]
        else:
            # one fused dispatch: barycentric rows at alpha / omega*alpha
            # over the committed codewords + all 5 segment evaluations
            m1, a1, m2, a2, s1, s2 = kernels.ood_stage_fn(
                E, L, eval_dom.generator, eval_dom.offset,
                ldt_dom.generator, ldt_dom.offset)(
                    main_lde_dev, aux_lde_dev, tuple(cws_dev),
                    gfx.full((), tuple(alpha)),
                    gfx.full((), tuple(omega_alpha)),
                    gfx.full((), tuple(alpha_pow_k)),
                    gfx.full((), tuple(zeta_alpha_pow_k)))
            ood_main_curr, ood_aux_curr = _gfx_to_rows(m1), _gfx_to_rows(a1)
            ood_main_next, ood_aux_next = _gfx_to_rows(m2), _gfx_to_rows(a2)
            seg_p, seg_r = _gfx_to_rows(s1), _gfx_to_rows(s2)
            ood_quot_p = seg_p[:NUM_QUOTIENT_SEGMENTS]
            ood_quot_r = seg_r[1:]
        proof_stream.enqueue(ProofItem("OutOfDomainMainRow", ood_main_curr))
        proof_stream.enqueue(ProofItem("OutOfDomainAuxRow", ood_aux_curr))
        proof_stream.enqueue(ProofItem("OutOfDomainMainRow", ood_main_next))
        proof_stream.enqueue(ProofItem("OutOfDomainAuxRow", ood_aux_next))
        proof_stream.enqueue(ProofItem("OutOfDomainQuotientSegments",
                                       ood_quot_p))
        proof_stream.enqueue(ProofItem("OutOfDomainQuotientSegments",
                                       ood_quot_r))

        # --------------------------------------- combination + DEEP + FRI
        weights = _sample_combination_weights(proof_stream)
        short_dom = ldt_dom if L <= Q else quot_dom

        _trace("weighted sum", "DEEP")
        if use_jit:
            main_aux_poly = _weighted_sum_of_columns(
                main, aux, main_rand_coeffs, aux_rand_coeffs, trace_dom,
                weights["main"], weights["aux"])
            main_aux_arr = np.array(main_aux_poly, np.uint64).reshape(-1, 3)
            main_aux_codeword = _eval_xfe_poly_on_domain_arr(
                main_aux_arr, short_dom)

            w_qs = weights["quot_segments"]
            shared_poly = None
            for i in range(1, NUM_RANDOMIZED_QUOTIENT_SEGMENTS - 1):
                term = _xfe_scalar_mul_arr(rand_seg_polys[i], w_qs[i])
                shared_poly = term if shared_poly is None else _np_poly_add(
                    shared_poly, term)
            poly_p = _np_poly_add(
                _xfe_scalar_mul_arr(rand_seg_polys[0], w_qs[0]), shared_poly)
            poly_r = _np_poly_add(
                _xfe_scalar_mul_arr(rand_seg_polys[-1], w_qs[-1]),
                shared_poly)
            codeword_p = _eval_xfe_poly_on_domain_arr(poly_p, short_dom)
            codeword_r = _eval_xfe_poly_on_domain_arr(poly_r, short_dom)

            deep = []
            deep.append(_deep_codeword_arr(
                main_aux_codeword, short_dom, alpha,
                _poly_eval_arr(main_aux_arr, alpha)))
            deep.append(_deep_codeword_arr(
                main_aux_codeword, short_dom, omega_alpha,
                _poly_eval_arr(main_aux_arr, omega_alpha)))
            deep.append(_deep_codeword_arr(
                codeword_p, short_dom, alpha_pow_k,
                _poly_eval_arr(poly_p, alpha_pow_k)))
            deep.append(_deep_codeword_arr(
                codeword_r, short_dom, zeta_alpha_pow_k,
                _poly_eval_arr(poly_r, zeta_alpha_pow_k)))

            w_deep = weights["deep"]
            combination = np.zeros((short_dom.length, 3), np.uint64)
            for w, cw in zip(w_deep, deep):
                combination = _np_xadd(combination,
                                       _xfe_scalar_mul_arr(cw, w))
            if short_dom.length != L:
                comb_coeffs = _interp_xfe_codeword_arr(
                    combination, short_dom)
                combination = _eval_xfe_poly_on_domain_arr(
                    comb_coeffs, ldt_dom)
        else:
            # one fused dispatch: weighted column sum + zeta-chain segment
            # combination + 4 DEEP codewords + LDE onto the FRI domain.
            # The four out-of-domain values are the weighted sums of the
            # already-revealed OOD rows / segment evaluations (identical
            # field elements to evaluating the weighted polynomials).
            v_curr = _linear_sum(ood_main_curr, ood_aux_curr, weights)
            v_next = _linear_sum(ood_main_next, ood_aux_next, weights)
            w_qs = weights["quot_segments"]
            v_p = xfe.ZERO
            for x, w in zip(ood_quot_p, w_qs[:-1]):
                v_p = xfe.add(v_p, xfe.mul(x, w))
            v_r = xfe.ZERO
            for x, w in zip(ood_quot_r, w_qs[1:]):
                v_r = xfe.add(v_r, xfe.mul(x, w))
            S = short_dom.length
            combination = kernels.deep_combination_fn(
                S, L, short_dom.generator, short_dom.offset,
                ldt_dom.offset, E // S, L // S)(
                    main_lde_dev, aux_lde_dev, tuple(cws_dev),
                    _gfx_rows_dev(weights["main"]),
                    _gfx_rows_dev(weights["aux"]),
                    _gfx_rows_dev(w_qs), _gfx_rows_dev(weights["deep"]),
                    _gfx_rows_dev([alpha, omega_alpha, alpha_pow_k,
                                   zeta_alpha_pow_k]),
                    _gfx_rows_dev([v_curr, v_next, v_p, v_r]))

        _trace("FRI", "FRI")
        if mesh is not None and not use_jit:
            # Un-shard the combination codeword before the LDT: FRI's fold
            # kernels halve every round and are a rounding error next to
            # the commit stage, but feeding them mesh-sharded inputs forces
            # an SPMD recompile of every per-round executable (the XLA:CPU
            # simplifier goes circular on those — the MULTICHIP_r02
            # timeout). One small (L, 3) host round-trip instead.
            combination = gfx.from_u64(
                np.stack([gf.to_u64(combination[c]) for c in range(3)],
                         axis=-1))
        revealed_indices = fri.prove(combination, proof_stream)
        _trace("reveal", "FRI")

        # ZK guard (stark.rs:644-663)
        if alpha_pow_k[1] == 0 and alpha_pow_k[2] == 0:
            bad = {ldt_dom.value(i) for i in revealed_indices}
            zk = alpha_pow_k[0]
            zk2 = zk * pow(ZETA, NUM_QUOTIENT_SEGMENTS, P) % P
            if zk in bad or zk2 in bad:
                raise ProvingError("zero-knowledge violation")

        # ------------------------------------------------ open trace rows
        # gather only the revealed rows from the device-resident codewords
        idx = np.array(revealed_indices, np.int64)
        sel3 = qsel_batched = None
        if use_jit:
            sel = jit_lde.reveal_rows_bfe(
                main_coeffs_dev, main_rand_dev, eval_dom, L, h, ntr,
                revealed_indices).T  # (NM, k)
        else:
            # ONE dispatch for every revealed row (main + aux + quotient
            # segments): the per-array gathers were ~20 round-trips over
            # the tunneled backend (~55 ms each — the bulk of the reveal
            # stage at small heights)
            msel_d, a3_d, qsel_d = _reveal_gather_fn(
                main_lde_dev, aux_lde_dev, cws_dev, idx, stride=E // L)
            sel = gf.to_u64(msel_d)
            sel3 = [gf.to_u64(a3_d[c]) for c in range(3)]
            qsel_batched = [
                np.stack([gf.to_u64(qsel_d[s][c]) for c in range(3)],
                         axis=1)
                for s in range(NUM_RANDOMIZED_QUOTIENT_SEGMENTS)]
        main_rows = [[int(v) for v in sel[:, j]]
                     for j in range(len(revealed_indices))]
        proof_stream.enqueue(ProofItem("MasterMainTableRows", main_rows))
        proof_stream.enqueue(ProofItem(
            "AuthenticationStructure",
            main_tree.authentication_structure(revealed_indices)))

        if use_jit:
            rev = jit_lde.reveal_rows_xfe(
                aux_coeffs_dev, aux_rand_dev, eval_dom, L, h, ntr,
                revealed_indices)  # (k, NA, 3)
            sel3 = [rev[:, :, c].T for c in range(3)]
        aux_rows = [[tuple(int(sel3[c][j, i]) for c in range(3))
                     for j in range(NUM_AUX)]
                    for i in range(len(revealed_indices))]
        proof_stream.enqueue(ProofItem("MasterAuxTableRows", aux_rows))
        proof_stream.enqueue(ProofItem(
            "AuthenticationStructure",
            aux_tree.authentication_structure(revealed_indices)))

        qsel = (qsel_batched if qsel_batched is not None else
                [np.stack([gf.to_u64(gf.take(cws_dev[s][c], idx, axis=0))
                           for c in range(3)], axis=1)
                 for s in range(NUM_RANDOMIZED_QUOTIENT_SEGMENTS)])
        quot_rows = [[tuple(int(x) for x in qsel[s][j])
                      for s in range(NUM_RANDOMIZED_QUOTIENT_SEGMENTS)]
                     for j in range(len(revealed_indices))]
        proof_stream.enqueue(ProofItem("QuotientSegmentsElements", quot_rows))
        proof_stream.enqueue(ProofItem(
            "AuthenticationStructure",
            quot_tree.authentication_structure(revealed_indices)))

        _trace("serialize", "FS")
        proof = proof_stream.to_proof()
        _trace(None)
        return proof


# ----------------------------------------------------------- verification

class Verifier:
    def __init__(self, parameters: Stark):
        self.parameters = parameters

    def verify(self, claim: Claim, proof: Proof, collector: dict | None = None):
        """Verify `proof` against `claim`.

        `collector`, when given, is filled with the verifier's
        intermediate values (challenges, OOD rows, weights, revealed
        rows, ...) — consumed by models/recursive_verifier.py to lay a
        concrete verification instance into Triton VM RAM."""
        stark = self.parameters
        proof_stream = ProofStream.decode(proof.words)
        if collector is not None:
            collector["fs_events"] = proof_stream.enable_fs_recording()
        proof_stream.alter_fiat_shamir_state_with(claim.encode())

        log2_padded_height = proof_stream.dequeue().expect("Log2PaddedHeight")
        if log2_padded_height >= 32:
            raise VerificationError("log2 padded height too large")
        padded_height = 1 << log2_padded_height
        fri, ntr, trace_dom, rand_dom, quot_dom, ldt_dom = \
            stark.derive_domains(padded_height)
        trace_domain_len = rand_dom.length // 2
        merkle_height = ldt_dom.length.bit_length() - 1
        trace_gen = Domain(trace_domain_len).generator

        main_root = proof_stream.dequeue().expect("MerkleRoot")
        challenges = Challenges(proof_stream.sample_scalars(SAMPLE_COUNT),
                                claim)
        aux_root = proof_stream.dequeue().expect("MerkleRoot")

        initial_quot_weight = proof_stream.sample_scalars(1)[0]
        num_constraints = sum(
            len(cs) for cs in master_air().constraints.values())
        quot_weights = _powers_xfe(initial_quot_weight, num_constraints)
        quot_root = proof_stream.dequeue().expect("MerkleRoot")

        alpha = proof_stream.sample_scalars(1)[0]
        omega_alpha = xfe.bfe_mul(alpha, trace_gen)
        alpha_pow_k = xfe.mod_pow(alpha, NUM_QUOTIENT_SEGMENTS)
        zeta_alpha = xfe.bfe_mul(alpha, ZETA)
        zeta_alpha_pow_k = xfe.mod_pow(zeta_alpha, NUM_QUOTIENT_SEGMENTS)

        ood_main_curr = proof_stream.dequeue().expect("OutOfDomainMainRow")
        ood_aux_curr = proof_stream.dequeue().expect("OutOfDomainAuxRow")
        ood_main_next = proof_stream.dequeue().expect("OutOfDomainMainRow")
        ood_aux_next = proof_stream.dequeue().expect("OutOfDomainAuxRow")
        ood_quot_p = proof_stream.dequeue().expect(
            "OutOfDomainQuotientSegments")
        ood_quot_r = proof_stream.dequeue().expect(
            "OutOfDomainQuotientSegments")

        # evaluate the AIR at the OOD point
        ch = challenges.challenges
        values = []
        for phase in ("init", "cons", "tran", "term"):
            steps, out_ids = _linearized_phase(phase)
            if phase == "tran":
                res = eval_host(steps, out_ids, ood_main_curr, ood_aux_curr,
                                ch, ood_main_next, ood_aux_next)
            else:
                res = eval_host(steps, out_ids, ood_main_curr, ood_aux_curr,
                                ch)
            values.append(res)
        init_vals, cons_vals, tran_vals, term_vals = values

        one = xfe.ONE
        init_zi = xfe.inv(xfe.sub(alpha, one))
        cons_zi = xfe.inv(xfe.sub(xfe.mod_pow(alpha, trace_domain_len), one))
        except_last = xfe.sub(alpha, xfe.lift(bfe.inv(trace_gen)))
        tran_zi = xfe.mul(except_last, cons_zi)
        term_zi = xfe.inv(except_last)

        summands = ([xfe.mul(v, init_zi) for v in init_vals]
                    + [xfe.mul(v, cons_zi) for v in cons_vals]
                    + [xfe.mul(v, tran_zi) for v in tran_vals]
                    + [xfe.mul(v, term_zi) for v in term_vals])
        ood_quotient_value = xfe.ZERO
        for w, s in zip(quot_weights, summands):
            ood_quotient_value = xfe.add(ood_quotient_value, xfe.mul(w, s))

        derand_curr = xfe.ZERO
        for i, x in enumerate(ood_quot_p):
            derand_curr = xfe.add(derand_curr,
                                  xfe.mul(xfe.mod_pow(alpha, i), x))
        derand_zeta = xfe.ZERO
        for i, x in enumerate(ood_quot_r):
            derand_zeta = xfe.add(
                derand_zeta, xfe.mul(xfe.mod_pow(zeta_alpha, i), x))
        if ood_quotient_value != xfe.add(derand_curr, derand_zeta):
            raise VerificationError("out-of-domain quotient value mismatch")

        weights = _sample_combination_weights(proof_stream)

        ood_curr_main_aux = _linear_sum(ood_main_curr, ood_aux_curr, weights)
        ood_next_main_aux = _linear_sum(ood_main_next, ood_aux_next, weights)
        w_qs = weights["quot_segments"]
        ood_quot_p_value = xfe.ZERO
        for x, w in zip(ood_quot_p, w_qs[:-1]):
            ood_quot_p_value = xfe.add(ood_quot_p_value, xfe.mul(x, w))
        ood_quot_r_value = xfe.ZERO
        for x, w in zip(ood_quot_r, w_qs[1:]):
            ood_quot_r_value = xfe.add(ood_quot_r_value, xfe.mul(x, w))

        revealed_indices, revealed_values = fri.verify(proof_stream)
        t = fri.num_first_round_queries()
        if len(revealed_indices) != t or len(revealed_values) != t:
            raise VerificationError("wrong number of revealed FRI values")

        main_rows = proof_stream.dequeue().expect("MasterMainTableRows")
        if len(main_rows) != t:
            raise VerificationError("wrong number of main rows")
        main_auth = proof_stream.dequeue().expect("AuthenticationStructure")
        main_arr = np.asarray(main_rows, np.uint64)  # (t, 379)
        main_digests = _row_digests(main_arr)
        if not merkle.verify_authentication_structure(
                tuple(main_root), ldt_dom.length, revealed_indices,
                main_digests, main_auth):
            raise VerificationError("main codeword authentication failure")

        aux_rows = proof_stream.dequeue().expect("MasterAuxTableRows")
        if len(aux_rows) != t:
            raise VerificationError("wrong number of aux rows")
        aux_auth = proof_stream.dequeue().expect("AuthenticationStructure")
        aux_arr = np.asarray(aux_rows, np.uint64)  # (t, 91, 3)
        aux_digests = _row_digests(aux_arr.reshape(t, -1))
        if not merkle.verify_authentication_structure(
                tuple(aux_root), ldt_dom.length, revealed_indices,
                aux_digests, aux_auth):
            raise VerificationError("aux codeword authentication failure")

        quot_rows = proof_stream.dequeue().expect("QuotientSegmentsElements")
        if len(quot_rows) != t:
            raise VerificationError("wrong number of quotient rows")
        quot_auth = proof_stream.dequeue().expect("AuthenticationStructure")
        quot_arr = np.asarray(quot_rows, np.uint64)  # (t, segs, 3)
        quot_digests = _row_digests(quot_arr.reshape(t, -1))
        if not merkle.verify_authentication_structure(
                tuple(quot_root), ldt_dom.length, revealed_indices,
                quot_digests, quot_auth):
            raise VerificationError("quotient codeword authentication failure")

        # batch-invert all 4*t DEEP denominators in one pass
        ood_points = (alpha, omega_alpha, alpha_pow_k, zeta_alpha_pow_k)
        denominators = [
            xfe.sub(xfe.lift(ldt_dom.value(idx)), pt)
            for idx in revealed_indices for pt in ood_points]
        denominator_invs = _batch_inverse_xfe(denominators)

        # all t combination-codeword checks in one vectorized host pass
        # (was a scalar-Python loop, t x ~470 XFE muls — the verify
        # hotspot; same algebra via ops/npfield)
        from ..ops import npfield as nf

        w_main = np.asarray(weights["main"], np.uint64)    # (379, 3)
        w_aux = np.asarray(weights["aux"], np.uint64)      # (91, 3)
        w_qs_arr = np.asarray(w_qs, np.uint64)             # (segs+1, 3)
        main_aux_elem = nf.xfe_add(
            nf.xfe_sum(nf.xfe_bfe_mul(w_main[None], main_arr), 1),
            nf.xfe_sum(nf.xfe_mul(w_aux[None], aux_arr), 1))   # (t, 3)
        shared = nf.xfe_sum(
            nf.xfe_mul(quot_arr[:, 1:-1], w_qs_arr[None, 1:-1]), 1)
        quot_elem_p = nf.xfe_add(
            nf.xfe_mul(quot_arr[:, 0], w_qs_arr[None, 0]), shared)
        quot_elem_r = nf.xfe_add(
            nf.xfe_mul(quot_arr[:, -1], w_qs_arr[None, -1]), shared)

        invs = np.asarray(denominator_invs, np.uint64).reshape(t, 4, 3)
        deep_vals = np.stack([
            nf.xfe_mul(nf.xfe_sub(main_aux_elem,
                                  np.asarray(ood_curr_main_aux, np.uint64)),
                       invs[:, 0]),
            nf.xfe_mul(nf.xfe_sub(main_aux_elem,
                                  np.asarray(ood_next_main_aux, np.uint64)),
                       invs[:, 1]),
            nf.xfe_mul(nf.xfe_sub(quot_elem_p,
                                  np.asarray(ood_quot_p_value, np.uint64)),
                       invs[:, 2]),
            nf.xfe_mul(nf.xfe_sub(quot_elem_r,
                                  np.asarray(ood_quot_r_value, np.uint64)),
                       invs[:, 3]),
        ], axis=1)  # (t, 4, 3)
        w_deep = np.asarray(weights["deep"], np.uint64)    # (4, 3)
        acc = nf.xfe_sum(nf.xfe_mul(deep_vals, w_deep[None]), 1)
        if not np.array_equal(acc, np.asarray(revealed_values, np.uint64)):
            raise VerificationError("combination codeword mismatch")

        if collector is not None:
            collector.update(
                padded_height=padded_height,
                trace_domain_len=trace_domain_len,
                trace_gen=trace_gen, merkle_height=merkle_height,
                ldt_dom=ldt_dom, challenges=list(challenges.challenges),
                quot_weights=list(quot_weights), alpha=alpha,
                ood_main_curr=ood_main_curr, ood_aux_curr=ood_aux_curr,
                ood_main_next=ood_main_next, ood_aux_next=ood_aux_next,
                ood_quot_p=list(ood_quot_p), ood_quot_r=list(ood_quot_r),
                init_vals=init_vals, cons_vals=cons_vals,
                tran_vals=tran_vals, term_vals=term_vals,
                weights=weights, revealed_indices=list(revealed_indices),
                revealed_values=list(revealed_values),
                main_rows=main_arr, aux_rows=aux_arr, quot_rows=quot_arr,
                main_digests=main_digests, aux_digests=aux_digests,
                quot_digests=quot_digests,
                main_auth=main_auth, aux_auth=aux_auth,
                quot_auth=quot_auth,
                main_root=tuple(main_root), aux_root=tuple(aux_root),
                quot_root=tuple(quot_root))

        if not proof_stream.is_exhausted():
            raise VerificationError("superfluous proof items")
        return True


# ----------------------------------------------------------- helper zone

@functools.lru_cache(maxsize=1)
def _reveal_gather_jit():
    import jax

    def fn(main_lde, aux_lde, cws, idx, stride):
        sl = ((lambda a: gf.tmap(lambda x: x[:, ::stride], a))
              if stride != 1 else (lambda a: a))
        msel = gf.take(sl(main_lde), idx, axis=1)
        a3 = tuple(gf.take(sl(aux_lde[c]), idx, axis=1) for c in range(3))
        qsel = tuple(tuple(gf.take(cws[s][c], idx, axis=0)
                           for c in range(3)) for s in range(len(cws)))
        return msel, a3, qsel

    return jax.jit(fn, static_argnames=("stride",))


def _reveal_gather_fn(main_lde, aux_lde, cws, idx, *, stride):
    return _reveal_gather_jit()(main_lde, aux_lde, tuple(cws), idx,
                                stride=stride)


def _row_digests(rows_u64: np.ndarray) -> list:
    """Tip5 hash_varlen of every row of a (t, n) u64 array.

    On accelerators: ONE batched device dispatch (the Pallas row sponge —
    the same kernel the prover commits with). On CPU: the scalar host
    sponge, which beats paying an XLA:CPU compile per (t, n) shape for
    the handful of rows a verify touches. TVM_VERIFY_DEVICE_HASH=1/0
    forces the choice (CI pins bit-identity of the device path)."""
    import jax

    mode = _os.environ.get("TVM_VERIFY_DEVICE_HASH", "auto")
    use_device = (mode == "1"
                  or (mode == "auto" and jax.default_backend() != "cpu"))
    if use_device:
        from ..ops import tip5_kernel

        digests = gf.to_u64(
            tip5_kernel.sponge_absorb_rows(gf.from_u64(rows_u64))).T
        return [tuple(int(x) for x in d) for d in digests]
    return [tuple(tip5.hash_varlen([int(x) for x in row]))
            for row in rows_u64]


@functools.lru_cache(maxsize=None)
def _linearized_phase(phase):
    """Per-phase linearized AIR op list, cached across verify calls (the
    circuit DAG is immutable; re-linearizing ~600 constraints per verify
    dominated small-proof verification)."""
    return linearize(master_air().constraints[phase])


def _powers_xfe(x, n):
    out = [xfe.ONE]
    for _ in range(n - 1):
        out.append(xfe.mul(out[-1], x))
    return out


def _sample_combination_weights(proof_stream):
    """CombinationCodewordWeights::sample (stark.rs:2166-2209)."""
    initials = proof_stream.sample_scalars(3)
    w_main_all = _powers_xfe(initials[0], NUM_MAIN + NUM_AUX)
    return {
        "main": w_main_all[:NUM_MAIN],
        "aux": w_main_all[NUM_MAIN:],
        "quot_segments": _powers_xfe(initials[1],
                                     NUM_RANDOMIZED_QUOTIENT_SEGMENTS),
        "deep": _powers_xfe(initials[2], NUM_DEEP_CODEWORD_COMPONENTS),
    }


def _linear_sum(main_row_xfe, aux_row, weights):
    acc = xfe.ZERO
    for v, w in zip(main_row_xfe, weights["main"]):
        acc = xfe.add(acc, xfe.mul(w, v))
    for v, w in zip(aux_row, weights["aux"]):
        acc = xfe.add(acc, xfe.mul(w, v))
    return acc


def _deep_update(x_bfe, in_value, ood_point, ood_value):
    num = xfe.sub(in_value, ood_value)
    den = xfe.sub(xfe.lift(x_bfe), ood_point)
    return xfe.mul(num, xfe.inv(den))


def _batch_inverse_xfe(values):
    """Montgomery's trick over XFEs: one inversion for n elements."""
    if not values:
        return []
    prefix = [xfe.ONE]
    for v in values:
        prefix.append(xfe.mul(prefix[-1], v))
    inv_all = xfe.inv(prefix[-1])
    out = [None] * len(values)
    for i in range(len(values) - 1, -1, -1):
        out[i] = xfe.mul(prefix[i], inv_all)
        inv_all = xfe.mul(inv_all, values[i])
    return out


def _gfx_to_rows(v):
    """gfx (m,) -> list of m XFE int tuples."""
    arr = np.stack([gf.to_u64(v[c]) for c in range(3)], axis=1)
    return [tuple(int(c) for c in row) for row in arr]


def _gfx_rows_dev(rows):
    """List of XFE tuples -> gfx (m,)."""
    return gfx.from_u64(np.array(rows, np.uint64))


# ------------------------------------------- device-assisted linear algebra



def _trace_zerofier_values(trace_dom, eval_dom):
    """Z_trace(x) = x^h - offset^h over eval_dom, as numpy u64 (E,)."""
    h = trace_dom.length
    xs = eval_dom.values()
    off_h = pow(trace_dom.offset, h, P)
    return np.array([(pow(x, h, P) - off_h) % P for x in xs], np.uint64)





@functools.lru_cache(maxsize=8)
def _commit_bfe_fn(h, E, L, offset, ntr, nc, ncp=None):
    """One-dispatch commit stage for base-field columns: LDE + randomizer
    + row hashing + full Merkle tree (master_table.rs:258-322,443-503).
    Returns (committed gf (nc, E), heap-ordered tree gf (5, 2L-1)).

    `ncp` (>= nc) is the padded column count used on a device mesh so the
    column axis divides the mesh; the zero pad columns are sliced away
    before row hashing."""
    import jax
    import jax.numpy as jnp

    stride = E // L
    ncp = ncp or nc

    def fn(cols, rand, zvals):
        lde = ntt.lde(cols, E // h, 1, offset)
        rand_full = gf.tmap(
            lambda a: jnp.zeros((ncp, E), jnp.uint32).at[:, :ntr].set(a),
            rand)
        rand_eval = ntt.ntt(rand_full, offset)
        z = gf.tmap(lambda a: a[None, :], zvals)
        committed = gf.add(lde, gf.mul(z, rand_eval))
        if ncp != nc:
            committed = gf.tmap(lambda a: a[:nc], committed)
        ldt = (gf.tmap(lambda a: a[:, ::stride], committed)
               if stride != 1 else committed)
        rows = gf.tmap(lambda a: a.T, ldt)
        return committed, tip5_kernel.commit_rows(rows)

    return jax.jit(fn)


@functools.lru_cache(maxsize=8)
def _commit_xfe_fn(h, E, L, offset, ntr, nc, ncp=None):
    """Extension-field commit stage; rows interleave each XFE's three
    components in column order (master_table.rs row encoding)."""
    import jax
    import jax.numpy as jnp

    stride = E // L
    ncp = ncp or nc

    def fn(cols3, rand3, zvals):
        z = gf.tmap(lambda a: a[None, :], zvals)
        comps = []
        for c in range(3):
            lde = ntt.lde(cols3[c], E // h, 1, offset)
            rand_full = gf.tmap(
                lambda a: jnp.zeros((ncp, E), jnp.uint32).at[:, :ntr].set(a),
                rand3[c])
            rand_eval = ntt.ntt(rand_full, offset)
            full = gf.add(lde, gf.mul(z, rand_eval))
            if ncp != nc:
                full = gf.tmap(lambda a: a[:nc], full)
            comps.append(full)
        committed = tuple(comps)
        ldt = (gfx.tmap(lambda a: a[:, ::stride], committed)
               if stride != 1 else committed)
        rows = tuple(
            jnp.stack([ldt[c][p].T for c in range(3)], axis=2)
            .reshape(L, nc * 3) for p in range(2))
        return committed, tip5_kernel.commit_rows(rows)

    return jax.jit(fn)







@functools.lru_cache(maxsize=8)
def _segmentify_fn(Q, L, n_qr, quot_offset, ldt_offset):
    """One-dispatch quotient segmentation (stark.rs:1128-1360): iNTT the
    quotient codeword, split into 4 segment polynomials, add the
    zeta-chain randomization, evaluate all 5 randomized segments over the
    LDT domain, and Merkle-commit the segment rows.

    Returns (5 randomized segment polys, 5 segment codewords (L,),
    heap-ordered tree (5, 2L-1)) — all device values."""
    import jax
    import jax.numpy as jnp

    assert Q // NUM_QUOTIENT_SEGMENTS <= L and n_qr <= L
    zeta_to_k = pow(ZETA, NUM_QUOTIENT_SEGMENTS, P)

    def pad_add(a, b):
        na = gf.shape(a[0])[0]
        nb = gf.shape(b[0])[0]
        m = max(na, nb)
        pa = gfx.tmap(lambda x: jnp.pad(x, (0, m - na)), a)
        pb = gfx.tmap(lambda x: jnp.pad(x, (0, m - nb)), b)
        return gfx.add(pa, pb)

    def eval_ldt(p):
        n = gf.shape(p[0])[0]
        padded = gfx.tmap(lambda x: jnp.pad(x, (0, L - n)), p)
        return ntt.xfe_map(ntt.ntt, padded, ldt_offset)

    def fn(qcw, qrand):
        coeffs = ntt.xfe_map(ntt.intt, qcw, quot_offset)
        polys = [gfx.tmap(lambda a: a[s::NUM_QUOTIENT_SEGMENTS], coeffs)
                 for s in range(NUM_QUOTIENT_SEGMENTS)] + [qrand]
        cws = [eval_ldt(p) for p in polys]
        for i in range(NUM_QUOTIENT_SEGMENTS - 1, -1, -1):
            n1 = gf.shape(polys[i + 1][0])[0]
            fac = (_bfe_powers_np(zeta_to_k, n1).astype(object)
                   * (P - pow(ZETA, i, P)) % P).astype(np.uint64)
            addend = gfx.bfe_mul(polys[i + 1], gf.from_u64(fac))
            cws[i] = gfx.add(cws[i], eval_ldt(addend))
            polys[i] = pad_add(polys[i], addend)
        rows = tuple(
            jnp.stack([cws[s][c][p]
                       for s in range(NUM_RANDOMIZED_QUOTIENT_SEGMENTS)
                       for c in range(3)], axis=1)
            for p in range(2))
        return polys, cws, tip5_kernel.commit_rows(rows)

    return jax.jit(fn)


def _use_device_quotients() -> bool:
    """TVM_DEVICE_QUOTIENT=1 forces the compiled device tapes, =0 forces
    the exact host evaluator; default 'auto' uses the device path on real
    accelerators and the host path on CPU (where the one-time XLA compile
    of the transition tape dominates small test workloads)."""
    import jax

    mode = _os.environ.get("TVM_DEVICE_QUOTIENT", "auto")
    return mode == "1" or (mode == "auto"
                           and jax.default_backend() != "cpu")


def _gf_sum0(v):
    """Sum a gf pair over axis 0 (exact mod-p; see gf.reduce_sum)."""
    return gf.reduce_sum(v, 0)


@functools.lru_cache(maxsize=8)
def _quotient_chunk_fn(h, gen_inv):
    """Jitted all-phase quotient combiner over a ROW CHUNK of the
    quotient domain. Same math as _quotient_fn but next-row values are
    passed in (gathered by the caller), so the evaluation is pointwise
    and tiles freely: the tape scan's value banks are O(num_slots x
    chunk) HBM — the untiled version needed 44.8 GB at Q = 2^19 on a
    15.75 GB chip (BENCH spin_65536 OOM)."""
    import jax

    from ..air import compile as aircomp

    tapes = {ph: aircomp.phase_tape(ph)
             for ph in ("init", "cons", "tran", "term")}

    def fn(main, aux, next_main, next_aux, ch, ws, xs):
        one = gf.full((), 1)
        gi = gf.full((), gen_inv)
        init_zi = gf.inv(gf.sub(xs, one))
        xh = gf.pow_const(xs, h)
        cons_zi = gf.inv(gf.sub(xh, one))
        tran_zi = gf.mul(gf.sub(xs, gi), cons_zi)
        term_zi = gf.inv(gf.sub(xs, gi))
        zis = {"init": init_zi, "cons": cons_zi, "tran": tran_zi,
               "term": term_zi}
        acc = gfx.zeros(gf.shape(xs))
        for i, ph in enumerate(("init", "cons", "tran", "term")):
            if ph == "tran":
                outs = aircomp.run_tape_scan(tapes[ph], main, aux, ch,
                                             next_main, next_aux)
            else:
                outs = aircomp.run_tape_scan(tapes[ph], main, aux, ch)
            wk = gfx.tmap(lambda a: a[:, None], ws[i])
            prod = gfx.mul(outs, wk)
            inner = tuple(_gf_sum0(c) for c in prod)
            acc = gfx.add(acc, gfx.bfe_mul(inner, zis[ph]))
        return acc

    return jax.jit(fn)


# Above this many quotient-domain rows, evaluate quotients in row chunks
# (single-chip path). 2^16 rows keep the tape banks ~5-6 GB of HBM temps.
_QUOTIENT_CHUNK_ROWS = 1 << 16


@functools.lru_cache(maxsize=8)
def _quotient_fn(Q, unit, h, gen_inv):
    """Jitted all-phase quotient combiner over the quotient domain
    (device counterpart of _all_quotients_combined; the constraint DAGs
    execute as compiled tapes, see air/compile.py)."""
    import jax
    import jax.numpy as jnp

    from ..air import compile as aircomp

    tapes = {ph: aircomp.phase_tape(ph)
             for ph in ("init", "cons", "tran", "term")}

    def fn(main, aux, ch, ws, xs):
        next_main = gf.tmap(lambda a: jnp.roll(a, -unit, axis=1), main)
        next_aux = gfx.tmap(lambda a: jnp.roll(a, -unit, axis=1), aux)
        one = gf.full((), 1)
        gi = gf.full((), gen_inv)
        init_zi = gf.inv(gf.sub(xs, one))
        xh = gf.pow_const(xs, h)
        cons_zi = gf.inv(gf.sub(xh, one))
        tran_zi = gf.mul(gf.sub(xs, gi), cons_zi)
        term_zi = gf.inv(gf.sub(xs, gi))
        zis = {"init": init_zi, "cons": cons_zi, "tran": tran_zi,
               "term": term_zi}
        acc = gfx.zeros((Q,))
        for i, ph in enumerate(("init", "cons", "tran", "term")):
            if ph == "tran":
                outs = aircomp.run_tape_scan(tapes[ph], main, aux, ch,
                                             next_main, next_aux)
            else:
                outs = aircomp.run_tape_scan(tapes[ph], main, aux, ch)
            wk = gfx.tmap(lambda a: a[:, None], ws[i])
            prod = gfx.mul(outs, wk)
            inner = tuple(_gf_sum0(c) for c in prod)
            acc = gfx.add(acc, gfx.bfe_mul(inner, zis[ph]))
        return acc

    return jax.jit(fn)


def _all_quotients_combined_device(main_q, aux_q, trace_dom, quot_dom,
                                   challenges, quot_weights,
                                   return_device=False):
    """Device path for master_table.rs:1264-1363: run the compiled AIR
    tapes over the quotient domain and combine with weights + zerofier
    inverses, all in one jitted graph. Bit-identical to the host path
    (validated in tests/test_air_compile.py)."""
    air = master_air()
    Q = quot_dom.length
    unit = Q // trace_dom.length

    if isinstance(main_q, np.ndarray):
        main = gf.from_u64(main_q.astype(np.uint64))
        aux = tuple(gf.from_u64(aux_q[c].astype(np.uint64))
                    for c in range(3))
    else:  # already device-resident gf/gfx values
        main, aux = main_q, aux_q
    ch_u = np.array(challenges.challenges, np.uint64)  # (63, 3)
    ch = tuple(gf.from_u64(ch_u[:, c]) for c in range(3))

    w = np.array(quot_weights, np.uint64)  # (num_constraints, 3)
    ws = []
    off = 0
    for ph in ("init", "cons", "tran", "term"):
        k = len(air.constraints[ph])
        wp = w[off:off + k]
        off += k
        ws.append(tuple(gf.from_u64(wp[:, c]) for c in range(3)))

    xs = gf.from_u64(np.array(quot_dom.values(), np.uint64))
    gen_inv = bfe.inv(trace_dom.generator)

    from ..parallel import sharding as _sh

    mesh = _sh.active_mesh()
    if mesh is not None:
        # row-parallel quotient evaluation (SURVEY §2.5 P4): reshard the
        # committed codewords from column- to row-sharded; GSPMD lowers
        # this to the one all-to-all the stage needs.
        main = _sh.shard(mesh, main, 1, 2)
        aux = _sh.shard(mesh, aux, 1, 2)
        ch = _sh.replicate(mesh, ch)
        xs = _sh.shard(mesh, xs, 0, 1)

    if mesh is None and Q > _QUOTIENT_CHUNK_ROWS:
        # tile over rows: pointwise evaluation, next-row values gathered
        # per chunk ((i + unit) mod Q stays a cheap strided gather)
        C = _QUOTIENT_CHUNK_ROWS
        fn = _quotient_chunk_fn(trace_dom.length, gen_inv)
        parts = []
        for s in range(0, Q, C):
            idx = np.arange(s, s + C, dtype=np.int64)
            nidx = (idx + unit) % Q
            acc = fn(gf.take(main, idx, axis=1),
                     gfx.tmap(lambda a: a[:, idx], aux),
                     gf.take(main, nidx, axis=1),
                     gfx.tmap(lambda a: a[:, nidx], aux),
                     ch, tuple(ws), gf.take(xs, idx))
            parts.append(acc)
        acc = tuple(gf.concatenate([p[c] for p in parts], axis=0)
                    for c in range(3))
    else:
        fn = _quotient_fn(Q, unit, trace_dom.length, gen_inv)
        acc = fn(main, aux, ch, tuple(ws), xs)
    if return_device:
        return acc  # gfx (Q,)
    return np.stack([gf.to_u64(acc[c]) for c in range(3)], axis=1)  # (Q, 3)


def _all_quotients_combined(main_lde, aux_lde, trace_dom, quot_dom,
                            challenges, quot_weights):
    """master_table.rs:1264-1363 on the quotient-domain codewords."""
    air = master_air()
    ch = challenges.challenges
    Q = quot_dom.length
    unit = Q // trace_dom.length

    main_obj = main_lde.astype(object)
    aux_obj = tuple(aux_lde[c].astype(object) for c in range(3))
    main_next = np.roll(main_obj, -unit, axis=1)
    aux_next = tuple(np.roll(a, -unit, axis=1) for a in aux_obj)

    xs = quot_dom.values()
    one = 1
    init_zi = bfe.batch_inverse([(x - 1) % P for x in xs])
    xs_pow_h = [pow(x, trace_dom.length, P) for x in xs]
    cons_zi = bfe.batch_inverse([(xh - 1) % P for xh in xs_pow_h])
    gen_inv = bfe.inv(trace_dom.generator)
    tran_zi = [((x - gen_inv) % P) * czi % P for x, czi in zip(xs, cons_zi)]
    term_zi = bfe.batch_inverse([(x - gen_inv) % P for x in xs])

    zerofiers = {"init": init_zi, "cons": cons_zi, "tran": tran_zi,
                 "term": term_zi}

    quotient = tuple(np.zeros(Q, object) for _ in range(3))
    w_idx = 0
    for phase in ("init", "cons", "tran", "term"):
        steps, out_ids = linearize(air.constraints[phase])
        if phase == "tran":
            results = eval_vectorized_obj(steps, out_ids, main_obj, aux_obj,
                                          ch, main_next, aux_next)
        else:
            results = eval_vectorized_obj(steps, out_ids, main_obj, aux_obj,
                                          ch)
        inner = tuple(np.zeros(Q, object) for _ in range(3))
        for res in results:
            w = quot_weights[w_idx]
            w_idx += 1
            prod = _xmul_obj(res, tuple(np.array(c, object) for c in w))
            inner = tuple((inner[i] + prod[i]) % P for i in range(3))
        zi = np.array(zerofiers[phase], object)
        quotient = tuple((quotient[i] + inner[i] * zi) % P for i in range(3))
    return [tuple(int(quotient[c][i]) for c in range(3)) for i in range(Q)]


def _xmul_obj(a, b):
    a0, a1, a2 = a
    b0, b1, b2 = b
    d0 = a0 * b0
    d1 = a0 * b1 + a1 * b0
    d2 = a0 * b2 + a1 * b1 + a2 * b0
    d3 = a1 * b2 + a2 * b1
    d4 = a2 * b2
    return ((d0 - d3) % P, (d1 + d3 - d4) % P, (d2 + d4) % P)


_U64_P = np.uint64(P)
_U64_EPS = np.uint64(0xFFFFFFFF)  # 2^64 mod P


def _np_gadd(a, b):
    """Vectorized Goldilocks addition on numpy uint64 (values < P)."""
    s = a + b  # wraps mod 2^64
    carry = (s < a).astype(np.uint64)
    return (s % _U64_P + carry * _U64_EPS) % _U64_P


def _np_gsub(a, b):
    d = (a - b) % _U64_P  # wraps mod 2^64 first
    borrow = a < b  # true value is d_wrapped - 2^64; 2^64 mod P = EPS
    return np.where(borrow,
                    np.where(d >= _U64_EPS, d - _U64_EPS,
                             d + (_U64_P - _U64_EPS)),
                    d)


def _np_xadd(a, b):
    """XFE addition on (..., 3) uint64 arrays."""
    return _np_gadd(a, b)


def _bfe_powers_np(base: int, n: int) -> np.ndarray:
    """[1, base, base^2, ...] as numpy uint64 (vectorized host ladder)."""
    from ..ops.kernels import _powers_ladder_u64

    return _powers_ladder_u64(base, 1, n)


def _xfe_scale_poly_arr(coeffs: np.ndarray, s: int, mul_const: int = 1):
    """coeff_j <- mul_const * s^j * coeff_j on a (n, 3) u64 array
    (device muls). Implements Polynomial::scale + scalar mul."""
    n = coeffs.shape[0]
    pws = _bfe_powers_np(s, n)
    if mul_const != 1:
        pws = (pws.astype(object) * mul_const % P).astype(np.uint64)
    out = kernels.xfe_scale_poly(gfx.from_u64(coeffs), gf.from_u64(pws))
    return gfx.to_u64(out)


def _interp_xfe_codeword_arr(codeword: np.ndarray, domain) -> np.ndarray:
    """iNTT of an XFE codeword (n, 3) u64 over `domain` -> (n, 3) coeffs."""
    v = gfx.from_u64(codeword)
    coeffs = ntt.xfe_map(ntt.intt, v, domain.offset)
    return gfx.to_u64(coeffs)




def _poly_eval_arr(coeffs: np.ndarray, x) -> tuple:
    """Horner-evaluate a (n, 3) u64 XFE coefficient array at XFE x."""
    acc = xfe.ZERO
    for k in range(coeffs.shape[0] - 1, -1, -1):
        acc = xfe.add(xfe.mul(acc, x), tuple(int(c) for c in coeffs[k]))
    return acc


def _np_poly_add(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Add two (n, 3) u64 XFE coefficient arrays (unequal lengths ok)."""
    if len(a) < len(b):
        a, b = b, a
    out = a.copy()
    out[:len(b)] = _np_xadd(a[:len(b)], b)
    return out


def _xfe_scalar_mul_arr(coeffs: np.ndarray, w) -> np.ndarray:
    """w * coeffs for an XFE scalar w on a (n, 3) u64 array (device)."""
    out = kernels.xfe_scalar_mul(gfx.from_u64(coeffs), gfx.full((), tuple(w)))
    return gfx.to_u64(out)


@functools.lru_cache(maxsize=16)
def _domain_values_u64_cached(length, offset):
    return np.array(Domain(length, offset).values(), np.uint64)


def _domain_values_u64(domain) -> np.ndarray:
    return _domain_values_u64_cached(domain.length, domain.offset)


def _deep_codeword_arr(cw: np.ndarray, domain, ood_point, ood_value):
    """(cw - ood_value) / (x - ood_point) over `domain`, on device.
    cw: (n, 3) u64; returns (n, 3) u64 (stark.rs deep codeword)."""
    xs = gf.from_u64(_domain_values_u64(domain))
    out = kernels.deep_codeword(gfx.from_u64(cw), xs,
                                gfx.full((), tuple(ood_point)),
                                gfx.full((), tuple(ood_value)))
    return gfx.to_u64(out)


def _eval_xfe_poly_on_domain_arr(coeffs, domain) -> np.ndarray:
    """Evaluate an XFE coefficient list over `domain` (device NTT); handles
    polynomials longer than the domain by batching the chunks
    (arithmetic_domain.rs:141-170). Returns numpy uint64 (n, 3)."""
    n = domain.length
    if not isinstance(coeffs, np.ndarray):
        coeffs = np.array(coeffs or [xfe.ZERO], np.uint64).reshape(-1, 3)
    nz = np.nonzero(coeffs.any(axis=1))[0]
    coeffs = coeffs[:nz[-1] + 1] if nz.size else coeffs[:1]
    num_chunks = (len(coeffs) + n - 1) // n
    arr = np.zeros((num_chunks * n, 3), np.uint64)
    arr[:len(coeffs)] = coeffs
    # (chunks, 3, n): batch all chunks through one device NTT per component
    chunks = arr.reshape(num_chunks, n, 3).transpose(0, 2, 1)
    v = tuple(gf.from_u64(chunks[:, c, :]) for c in range(3))
    ev = tuple(ntt.ntt(v[c], domain.offset) for c in range(3))
    if num_chunks == 1:
        return np.stack([gf.to_u64(ev[c])[0] for c in range(3)], axis=1)
    # values = sum_k offset^(k*n) * chunk_k(x)
    scales = np.array([pow(domain.offset, k * n, P)
                       for k in range(num_chunks)], np.uint64)
    sc = gf.from_u64(scales)
    acc = tuple(gf.mul(ev[c], gf.tmap(lambda a: a[:, None], sc))
                for c in range(3))
    out = tuple(_gf_sum0(acc[c]) for c in range(3))
    return np.stack([gf.to_u64(out[c]) for c in range(3)], axis=1)


def _eval_xfe_poly_on_domain(coeffs, domain):
    """List-of-XFE-tuples wrapper around _eval_xfe_poly_on_domain_arr."""
    out = _eval_xfe_poly_on_domain_arr(coeffs, domain)
    return [tuple(int(c) for c in row) for row in out]


def _ood_rows(main, aux, main_rand, aux_rand, trace_dom, alpha):
    """Barycentric OOD rows for BOTH tables at one point, incl. the
    randomizer-polynomial contribution (master_table.rs:348-390).

    Column dot products run on device (kernels.ood_column_dot); the
    randomizer Horner evaluation (O(num_cols * ntr)) is vectorized host
    object math. Returns (main_row, aux_row) as lists of XFE tuples."""
    ds = gf.from_u64(_domain_values_u64(trace_dom))
    alpha_g = gfx.full((), tuple(alpha))
    dods, denom_parts = kernels.ood_shift_inverses(ds, alpha_g)
    main_cols = gf.from_u64(main.T.astype(np.uint64))
    aux_cols = tuple(gf.from_u64(aux[:, :, c].T.astype(np.uint64))
                     for c in range(3))
    num_main, num_aux = kernels.ood_column_dot(main_cols, aux_cols, dods)
    nm = np.stack([gf.to_u64(num_main[c]) for c in range(3)], axis=1)
    na = np.stack([gf.to_u64(num_aux[c]) for c in range(3)], axis=1)
    denom = tuple(int(gf.to_u64(denom_parts[c])) for c in range(3))
    denom_inv = xfe.inv(denom)
    z_at_alpha = trace_dom.zerofier_at(alpha)

    mr = np.array(main_rand, object)  # (num_main, ntr) of ints
    zero = np.zeros_like(mr)
    r_main = _horner_at_point((mr, zero, zero), alpha)
    ar = np.array(aux_rand, object)  # (num_aux, ntr, 3)
    r_aux = _horner_at_point(tuple(ar[:, :, c] for c in range(3)), alpha)
    return (_combine_ood(nm, denom_inv, z_at_alpha, r_main),
            _combine_ood(na, denom_inv, z_at_alpha, r_aux))


def _horner_at_point(coeffs3, point):
    """Vectorized Horner: coeffs3 = 3 object arrays (m, ntr); returns
    3 object arrays (m,) with the per-row polynomial value at XFE point."""
    p = tuple(np.array(c, object) for c in point)
    m, ntr = coeffs3[0].shape
    acc = tuple(np.zeros(m, object) for _ in range(3))
    for k in range(ntr - 1, -1, -1):
        acc = _xmul_obj(acc, p)
        acc = tuple((acc[c] + coeffs3[c][:, k]) % P for c in range(3))
    return acc


def _combine_ood(num_u64, denom_inv, z_at_alpha, r3):
    """num/denom + Z(alpha) * r, per row; num_u64 (m, 3)."""
    n3 = tuple(num_u64[:, c].astype(object) for c in range(3))
    t1 = _xmul_obj(n3, tuple(np.array(c, object) for c in denom_inv))
    t2 = _xmul_obj(r3, tuple(np.array(c, object) for c in z_at_alpha))
    out = tuple((t1[c] + t2[c]) % P for c in range(3))
    m = num_u64.shape[0]
    return [tuple(int(out[c][i]) for c in range(3)) for i in range(m)]


def _weighted_sum_of_columns(main, aux, main_rand, aux_rand, trace_dom,
                             w_main, w_aux):
    """master_table.rs:512-542 for main and aux tables combined.

    Column sums and the trace interpolation run on device
    (kernels.weighted_column_sum); the randomizer-polynomial contribution
    (O(num_cols * num_trace_randomizers)) stays in host object math.
    Returns a (h + ntr, 3) uint64 coefficient array."""
    h = main.shape[0]
    wm = np.array(w_main, np.uint64)  # (num_main, 3)
    wa = np.array(w_aux, np.uint64)
    main_cols = gf.from_u64(main.T.astype(np.uint64))
    aux_cols = tuple(gf.from_u64(aux[:, :, c].T.astype(np.uint64))
                     for c in range(3))
    values = kernels.weighted_column_sum(
        main_cols, aux_cols,
        tuple(gf.from_u64(wm[:, c]) for c in range(3)),
        tuple(gf.from_u64(wa[:, c]) for c in range(3)))
    coeffs = ntt.xfe_map(ntt.intt, values, trace_dom.offset)
    trace_poly = np.stack([gf.to_u64(coeffs[c]) for c in range(3)], axis=1)

    # randomizer contribution: zerofier * sum_i w_i * r_i (host, object)
    ntr = len(main_rand[0])
    mr = np.array(main_rand, object)  # (num_main, ntr)
    wmo = wm.astype(object)
    rand_sum = [ (mr * wmo[:, c:c + 1] % P).sum(axis=0) % P
                 for c in range(3)]  # 3 x (ntr,)
    ar = np.array(aux_rand, object)  # (num_aux, ntr, 3)
    wao = wa.astype(object)
    prod = _xmul_obj(tuple(ar[:, :, c] for c in range(3)),
                     tuple(wao[:, c:c + 1] for c in range(3)))
    rand_sum = np.stack(
        [(rand_sum[c] + prod[c].sum(axis=0)) % P for c in range(3)],
        axis=1).astype(np.uint64)  # (ntr, 3)

    # contribution = (x^h - offset^h) * rand_poly
    off_h = pow(trace_dom.offset, h, P)
    scaled = (rand_sum.astype(object) * off_h % P).astype(np.uint64)
    contribution = np.zeros((h + ntr, 3), np.uint64)
    contribution[h:h + ntr] = rand_sum
    contribution[:ntr] = _np_gsub(contribution[:ntr], scaled)
    return _np_poly_add(
        np.concatenate([trace_poly, np.zeros((ntr, 3), np.uint64)]),
        contribution)
