"""The Triton VM zk-STARK prover and verifier.

Transcribes /root/reference/triton-vm/src/stark.rs: parameter derivation
(randomized trace length, max degree, FRI setup), the full DEEP-ALI proving
pipeline (stark.rs:331-719) and verification (stark.rs:1388-1763).

Compute placement (round 1): NTT/LDE and iNTT run on device
(triton_vm_tpu.ops.ntt); constraint evaluation over the quotient domain
uses the exact vectorized host evaluator; running arguments and Fiat-Shamir
are host-side. Device-side batching of the remaining hot loops is tracked
as follow-up work in SURVEY.md §2.5.
"""

from __future__ import annotations

import functools
import hashlib

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
from ..ops import gf, gfx, ntt, tip5_kernel
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
    """Deterministic BFE stream from a 32-byte seed and an offset,
    mirroring the reference's per-column seed offsetting
    (master_table.rs:630-662).

    AUDIT(bit-exactness): the reference uses rand's StdRng (ChaCha12) with
    twenty-first's BFE distribution; replicate for transcript parity with
    Rust-seeded test vectors."""
    seed = _offset_seed(seed, offset)
    out = []
    counter = 0
    while len(out) < n:
        block = hashlib.blake2b(seed + counter.to_bytes(8, "little"),
                                digest_size=64).digest()
        for i in range(0, 64, 8):
            v = int.from_bytes(block[i:i + 8], "little")
            out.append(v % P)
            if len(out) == n:
                break
        counter += 1
    return out


def _offset_seed(seed: bytes, offset: int) -> bytes:
    total = (int.from_bytes(seed, "little") + offset) % (1 << (8 * len(seed)))
    return total.to_bytes(len(seed), "little")


def _drbg_xfes(seed: bytes, offset: int, n: int) -> list[tuple]:
    flat = _drbg_bfes(seed, offset, 3 * n)
    return [tuple(flat[3 * i:3 * i + 3]) for i in range(n)]


# ------------------------------------------------------------- parameters

class Stark:
    ZETA = ZETA

    def __init__(self, security_level=160, log2_ldt_expansion_factor=2):
        assert log2_ldt_expansion_factor > 0
        self.security_level = security_level
        self.log2_ldt_expansion_factor = log2_ldt_expansion_factor

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
    def max_degree(cls, padded_height, num_trace_randomizers):
        d = cls.interpolant_degree(padded_height, num_trace_randomizers)
        air = master_air()
        zerofier_deg = {"init": 1, "cons": padded_height,
                        "tran": padded_height - 1, "term": 1}
        best = 0
        for phase, cs in air.constraints.items():
            memo = {}
            for cexpr in cs:
                deg = C.degree(cexpr.node, memo)
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
                log2_high_degree_bound=log2_bound))
            ntr = self.num_trace_randomizers(fri)
            rand_len = self.randomized_trace_len(padded_height, ntr)
            if fri.initial_domain().length >= rand_len * (
                    1 << self.log2_ldt_expansion_factor):
                return fri
        raise ProvingError("no suitable FRI parameters found")

    def derive_domains(self, padded_height):
        fri = self.fri(padded_height)
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
        _trace("fill main", "witness")
        main = mt.fill_main_table(aet, padded_height=h)
        mt.fill_derived_main_columns(main)

        main_rand_coeffs = [
            _drbg_bfes(self.seed, i, ntr) for i in range(NUM_MAIN)]
        _trace("main LDE", "LDE")
        main_lde = _lde_bfe_columns(main, main_rand_coeffs, trace_dom,
                                    eval_dom)
        main_ldt = main_lde[:, :: E // L] if E != L else main_lde

        _trace("main merkle", "hash")
        main_tree = _merkle_tree_over_bfe_rows(main_ldt)
        proof_stream.enqueue(ProofItem("MerkleRoot", main_tree.root()))
        challenges = Challenges(proof_stream.sample_scalars(SAMPLE_COUNT),
                                claim)

        # ------------------------------------------------------- aux table
        _trace("extend aux", "witness")
        aux = mt.extend(main, challenges)
        mt.fill_derived_aux_columns(main, aux, challenges.challenges)
        batch_rand = _drbg_xfes(self.seed, NUM_MAIN + NUM_AUX, h)
        aux[:, NUM_AUX - 1, :] = np.array(batch_rand, np.uint64)

        aux_rand_coeffs = [
            _drbg_xfes(self.seed, NUM_MAIN + i, ntr) for i in range(NUM_AUX)]
        _trace("aux LDE", "LDE")
        aux_lde = _lde_xfe_columns(aux, aux_rand_coeffs, trace_dom, eval_dom)
        aux_ldt = aux_lde[:, :: E // L] if E != L else aux_lde

        _trace("aux merkle", "hash")
        aux_tree = _merkle_tree_over_xfe_rows(aux_ldt)
        proof_stream.enqueue(ProofItem("MerkleRoot", aux_tree.root()))

        initial_quot_weight = proof_stream.sample_scalars(1)[0]
        num_constraints = sum(
            len(cs) for cs in master_air().constraints.values())
        quot_weights = _powers_xfe(initial_quot_weight, num_constraints)

        # --------------------------------------------- quotient segments
        stride = E // Q
        main_q = main_lde[:, ::stride] if stride != 1 else main_lde
        aux_q = aux_lde[:, :, ::stride] if stride != 1 else aux_lde
        _trace("quotients", "quotient")
        quotient_codeword = _quotients_dispatch(
            main_q, aux_q, trace_dom, quot_dom, challenges, quot_weights)

        _trace("segmentify", "quotient")
        segment_polys = _interpolate_quotient_segments(
            quotient_codeword, quot_dom)
        segment_codewords = [
            _eval_xfe_poly_on_domain(sp, ldt_dom) for sp in segment_polys]

        # randomization (stark.rs:1302-1360)
        n_qr = Stark.num_quotient_table_randomizers(ntr)
        q_randomizer = _drbg_xfes(self.seed, NUM_MAIN + NUM_AUX + 1, n_qr)
        rand_seg_polys = [list(p) for p in segment_polys] + [list(q_randomizer)]
        rand_seg_codewords = segment_codewords + [
            _eval_xfe_poly_on_domain(q_randomizer, ldt_dom)]
        zeta_to_k = pow(ZETA, NUM_QUOTIENT_SEGMENTS, P)
        for i in range(NUM_QUOTIENT_SEGMENTS - 1, -1, -1):
            zeta_to_i = pow(ZETA, i, P)
            addend_poly = poly.scalar_mul(
                poly.scale(rand_seg_polys[i + 1], xfe.lift(zeta_to_k), xfe),
                xfe.lift(P - zeta_to_i), xfe)
            addend_codeword = _eval_xfe_poly_on_domain(addend_poly, ldt_dom)
            rand_seg_codewords[i] = [
                xfe.add(a, b) for a, b in
                zip(rand_seg_codewords[i], addend_codeword)]
            rand_seg_polys[i] = poly.add(rand_seg_polys[i], addend_poly, xfe)

        _trace("quot merkle", "hash")
        quot_tree = _merkle_tree_over_xfe_segment_rows(rand_seg_codewords)
        proof_stream.enqueue(ProofItem("MerkleRoot", quot_tree.root()))

        # ------------------------------------------------------- OOD rows
        _trace("OOD", "DEEP")
        alpha = proof_stream.sample_scalars(1)[0]
        omega_alpha = xfe.bfe_mul(alpha, trace_dom.generator)

        ood_main_curr = _ood_row_bfe(main, main_rand_coeffs, trace_dom, alpha)
        proof_stream.enqueue(ProofItem("OutOfDomainMainRow", ood_main_curr))
        ood_aux_curr = _ood_row_xfe(aux, aux_rand_coeffs, trace_dom, alpha)
        proof_stream.enqueue(ProofItem("OutOfDomainAuxRow", ood_aux_curr))
        ood_main_next = _ood_row_bfe(main, main_rand_coeffs, trace_dom,
                                     omega_alpha)
        proof_stream.enqueue(ProofItem("OutOfDomainMainRow", ood_main_next))
        ood_aux_next = _ood_row_xfe(aux, aux_rand_coeffs, trace_dom,
                                    omega_alpha)
        proof_stream.enqueue(ProofItem("OutOfDomainAuxRow", ood_aux_next))

        alpha_pow_k = xfe.mod_pow(alpha, NUM_QUOTIENT_SEGMENTS)
        zeta_alpha = xfe.bfe_mul(alpha, ZETA)
        zeta_alpha_pow_k = xfe.mod_pow(zeta_alpha, NUM_QUOTIENT_SEGMENTS)

        ood_quot_p = [poly.evaluate(rand_seg_polys[i], alpha_pow_k, xfe)
                      for i in range(NUM_QUOTIENT_SEGMENTS)]
        proof_stream.enqueue(ProofItem("OutOfDomainQuotientSegments",
                                       ood_quot_p))
        ood_quot_r = [poly.evaluate(rand_seg_polys[i + 1], zeta_alpha_pow_k,
                                    xfe)
                      for i in range(NUM_QUOTIENT_SEGMENTS)]
        proof_stream.enqueue(ProofItem("OutOfDomainQuotientSegments",
                                       ood_quot_r))

        # --------------------------------------- combination + DEEP + FRI
        weights = _sample_combination_weights(proof_stream)
        short_dom = ldt_dom if L <= Q else quot_dom

        _trace("weighted sum", "DEEP")
        main_aux_poly = _weighted_sum_of_columns(
            main, aux, main_rand_coeffs, aux_rand_coeffs, trace_dom,
            weights["main"], weights["aux"])
        main_aux_codeword = _eval_xfe_poly_on_domain(main_aux_poly, short_dom)

        w_qs = weights["quot_segments"]
        shared_poly = None
        for i in range(1, NUM_RANDOMIZED_QUOTIENT_SEGMENTS - 1):
            term = poly.scalar_mul(rand_seg_polys[i], w_qs[i], xfe)
            shared_poly = term if shared_poly is None else poly.add(
                shared_poly, term, xfe)
        poly_p = poly.add(
            poly.scalar_mul(rand_seg_polys[0], w_qs[0], xfe), shared_poly, xfe)
        poly_r = poly.add(
            poly.scalar_mul(rand_seg_polys[-1], w_qs[-1], xfe), shared_poly,
            xfe)
        codeword_p = _eval_xfe_poly_on_domain(poly_p, short_dom)
        codeword_r = _eval_xfe_poly_on_domain(poly_r, short_dom)

        deep = []
        deep.append(_deep_codeword(
            main_aux_codeword, short_dom, alpha,
            poly.evaluate(main_aux_poly, alpha, xfe)))
        deep.append(_deep_codeword(
            main_aux_codeword, short_dom, omega_alpha,
            poly.evaluate(main_aux_poly, omega_alpha, xfe)))
        deep.append(_deep_codeword(
            codeword_p, short_dom, alpha_pow_k,
            poly.evaluate(poly_p, alpha_pow_k, xfe)))
        deep.append(_deep_codeword(
            codeword_r, short_dom, zeta_alpha_pow_k,
            poly.evaluate(poly_r, zeta_alpha_pow_k, xfe)))

        w_deep = weights["deep"]
        combination = [xfe.ZERO] * short_dom.length
        for w, cw in zip(w_deep, deep):
            combination = [xfe.add(acc, xfe.mul(w, v))
                           for acc, v in zip(combination, cw)]
        if short_dom.length != L:
            comb_coeffs = _interp_xfe_codeword(combination, short_dom)
            combination = _eval_xfe_poly_on_domain(comb_coeffs, ldt_dom)

        _trace("FRI", "FRI")
        revealed_indices = fri.prove(combination, proof_stream)

        # ZK guard (stark.rs:644-663)
        if alpha_pow_k[1] == 0 and alpha_pow_k[2] == 0:
            bad = {ldt_dom.value(i) for i in revealed_indices}
            zk = alpha_pow_k[0]
            zk2 = zk * pow(ZETA, NUM_QUOTIENT_SEGMENTS, P) % P
            if zk in bad or zk2 in bad:
                raise ProvingError("zero-knowledge violation")

        # -------------------------------------------------- open trace rows
        main_rows = [[int(v) for v in main_ldt[:, i]]
                     for i in revealed_indices]
        proof_stream.enqueue(ProofItem("MasterMainTableRows", main_rows))
        proof_stream.enqueue(ProofItem(
            "AuthenticationStructure",
            main_tree.authentication_structure(revealed_indices)))

        # aux_ldt layout: (3, NUM_AUX, L) -> per row list of XFE tuples
        aux_rows = [[tuple(int(aux_ldt[c, j, i]) for c in range(3))
                     for j in range(NUM_AUX)] for i in revealed_indices]
        proof_stream.enqueue(ProofItem("MasterAuxTableRows", aux_rows))
        proof_stream.enqueue(ProofItem(
            "AuthenticationStructure",
            aux_tree.authentication_structure(revealed_indices)))

        quot_rows = [[rand_seg_codewords[s][i]
                      for s in range(NUM_RANDOMIZED_QUOTIENT_SEGMENTS)]
                     for i in revealed_indices]
        proof_stream.enqueue(ProofItem("QuotientSegmentsElements", quot_rows))
        proof_stream.enqueue(ProofItem(
            "AuthenticationStructure",
            quot_tree.authentication_structure(revealed_indices)))

        _trace(None)
        return proof_stream.to_proof()


# ----------------------------------------------------------- verification

class Verifier:
    def __init__(self, parameters: Stark):
        self.parameters = parameters

    def verify(self, claim: Claim, proof: Proof):
        stark = self.parameters
        proof_stream = ProofStream.decode(proof.words)
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
        air = master_air()
        ch = challenges.challenges
        values = []
        for phase in ("init", "cons", "tran", "term"):
            steps, out_ids = linearize(air.constraints[phase])
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
        main_digests = [tuple(tip5.hash_varlen(row)) for row in main_rows]
        if not merkle.verify_authentication_structure(
                tuple(main_root), ldt_dom.length, revealed_indices,
                main_digests, main_auth):
            raise VerificationError("main codeword authentication failure")

        aux_rows = proof_stream.dequeue().expect("MasterAuxTableRows")
        if len(aux_rows) != t:
            raise VerificationError("wrong number of aux rows")
        aux_auth = proof_stream.dequeue().expect("AuthenticationStructure")
        aux_digests = [
            tuple(tip5.hash_varlen([c for x in row for c in x]))
            for row in aux_rows]
        if not merkle.verify_authentication_structure(
                tuple(aux_root), ldt_dom.length, revealed_indices,
                aux_digests, aux_auth):
            raise VerificationError("aux codeword authentication failure")

        quot_rows = proof_stream.dequeue().expect("QuotientSegmentsElements")
        if len(quot_rows) != t:
            raise VerificationError("wrong number of quotient rows")
        quot_auth = proof_stream.dequeue().expect("AuthenticationStructure")
        quot_digests = [
            tuple(tip5.hash_varlen([c for x in row for c in x]))
            for row in quot_rows]
        if not merkle.verify_authentication_structure(
                tuple(quot_root), ldt_dom.length, revealed_indices,
                quot_digests, quot_auth):
            raise VerificationError("quotient codeword authentication failure")

        for idx, main_row, aux_row, quot_row, revealed in zip(
                revealed_indices, main_rows, aux_rows, quot_rows,
                revealed_values):
            x = ldt_dom.value(idx)
            main_aux_elem = _linear_sum(
                [xfe.lift(v) for v in main_row], aux_row, weights)
            shared = xfe.ZERO
            for v, w in zip(quot_row[1:-1], w_qs[1:-1]):
                shared = xfe.add(shared, xfe.mul(v, w))
            quot_elem_p = xfe.add(xfe.mul(quot_row[0], w_qs[0]), shared)
            quot_elem_r = xfe.add(xfe.mul(quot_row[-1], w_qs[-1]), shared)

            deep_vals = [
                _deep_update(x, main_aux_elem, alpha, ood_curr_main_aux),
                _deep_update(x, main_aux_elem, omega_alpha,
                             ood_next_main_aux),
                _deep_update(x, quot_elem_p, alpha_pow_k, ood_quot_p_value),
                _deep_update(x, quot_elem_r, zeta_alpha_pow_k,
                             ood_quot_r_value),
            ]
            acc = xfe.ZERO
            for w, v in zip(weights["deep"], deep_vals):
                acc = xfe.add(acc, xfe.mul(w, v))
            if acc != revealed:
                raise VerificationError("combination codeword mismatch")

        if not proof_stream.is_exhausted():
            raise VerificationError("superfluous proof items")
        return True


# ----------------------------------------------------------- helper zone

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


def _deep_codeword(codeword, domain, ood_point, ood_value):
    xs = domain.values()
    denoms = [xfe.sub(xfe.lift(x), ood_point) for x in xs]
    inv = _batch_inv_xfe(denoms)
    return [xfe.mul(xfe.sub(v, ood_value), iv)
            for v, iv in zip(codeword, inv)]


def _batch_inv_xfe(values):
    n = len(values)
    prefix = [xfe.ONE] * (n + 1)
    for i, v in enumerate(values):
        prefix[i + 1] = xfe.mul(prefix[i], v)
    acc = xfe.inv(prefix[n])
    out = [None] * n
    for i in range(n - 1, -1, -1):
        out[i] = xfe.mul(prefix[i], acc)
        acc = xfe.mul(acc, values[i])
    return out


# ------------------------------------------- device-assisted linear algebra

def _lde_bfe_columns(table, rand_coeffs, trace_dom, eval_dom):
    """Committed codewords: LDE(columns) + zerofier * randomizer, evaluated
    over eval_dom. Returns numpy uint64 (num_cols, E)."""
    h, num_cols = table.shape
    E = eval_dom.length
    cols = gf.from_u64(table.T.astype(np.uint64))
    lde = ntt.lde(cols, E // h, 1, eval_dom.offset)
    rand = np.zeros((num_cols, E), np.uint64)
    ntr = len(rand_coeffs[0])
    rand[:, :ntr] = np.array(rand_coeffs, np.uint64)[:, :]
    if ntr > E:
        raise ProvingError("too many randomizer coefficients")
    rand_eval = ntt.ntt(gf.from_u64(rand), eval_dom.offset)
    zvals = _trace_zerofier_values(trace_dom, eval_dom)
    z = gf.from_u64(np.broadcast_to(zvals, (num_cols, E)))
    committed = gf.add(lde, gf.mul(z, rand_eval))
    return gf.to_u64(committed)


def _lde_xfe_columns(aux, rand_coeffs, trace_dom, eval_dom):
    """Same for XFE columns. aux: (h, num_cols, 3) u64; rand_coeffs:
    list over cols of list of XFE tuples. Returns (3, num_cols, E) u64."""
    h, num_cols, _ = aux.shape
    E = eval_dom.length
    out = np.zeros((3, num_cols, E), np.uint64)
    zvals = _trace_zerofier_values(trace_dom, eval_dom)
    z = gf.from_u64(np.broadcast_to(zvals, (num_cols, E)))
    rc = np.array(rand_coeffs, np.uint64)  # (num_cols, ntr, 3)
    for c in range(3):
        cols = gf.from_u64(aux[:, :, c].T.astype(np.uint64))
        lde = ntt.lde(cols, E // h, 1, eval_dom.offset)
        rand = np.zeros((num_cols, E), np.uint64)
        rand[:, :rc.shape[1]] = rc[:, :, c]
        rand_eval = ntt.ntt(gf.from_u64(rand), eval_dom.offset)
        committed = gf.add(lde, gf.mul(z, rand_eval))
        out[c] = gf.to_u64(committed)
    return out


def _trace_zerofier_values(trace_dom, eval_dom):
    """Z_trace(x) = x^h - offset^h over eval_dom, as numpy u64 (E,)."""
    h = trace_dom.length
    xs = eval_dom.values()
    off_h = pow(trace_dom.offset, h, P)
    return np.array([(pow(x, h, P) - off_h) % P for x in xs], np.uint64)


def _merkle_tree_over_bfe_rows(cols_by_rows):
    """cols_by_rows: (num_cols, L) u64; hashes rows (row-major order)."""
    rows = gf.from_u64(cols_by_rows.T.copy())
    digests = tip5_kernel.sponge_absorb_rows(rows)
    return merkle.MerkleTree(digests)


def _merkle_tree_over_xfe_rows(aux_lde):
    """aux_lde: (3, num_cols, L); row encoding flattens each XFE as
    (c0, c1, c2) in column order."""
    _, num_cols, L = aux_lde.shape
    flat = np.empty((L, num_cols * 3), np.uint64)
    for c in range(3):
        flat[:, c::3] = aux_lde[c].T
    digests = tip5_kernel.sponge_absorb_rows(gf.from_u64(flat))
    return merkle.MerkleTree(digests)


def _merkle_tree_over_xfe_segment_rows(segment_codewords):
    """segment_codewords: list over segments of list over rows of XFE."""
    L = len(segment_codewords[0])
    num_segments = len(segment_codewords)
    flat = np.empty((L, num_segments * 3), np.uint64)
    for s, cw in enumerate(segment_codewords):
        arr = np.array(cw, np.uint64)  # (L, 3)
        flat[:, 3 * s:3 * s + 3] = arr
    digests = tip5_kernel.sponge_absorb_rows(gf.from_u64(flat))
    return merkle.MerkleTree(digests)


def _quotients_dispatch(main_q, aux_q, trace_dom, quot_dom, challenges,
                        quot_weights):
    """Pick the quotient evaluation backend.

    TVM_DEVICE_QUOTIENT=1 forces the compiled device tapes, =0 forces the
    exact host evaluator; default 'auto' uses the device path on real
    accelerators and the host path on CPU (where the one-time XLA compile
    of the transition tape dominates small test workloads)."""
    import jax

    mode = _os.environ.get("TVM_DEVICE_QUOTIENT", "auto")
    use_device = mode == "1" or (mode == "auto"
                                 and jax.default_backend() != "cpu")
    if use_device:
        return _all_quotients_combined_device(
            main_q, aux_q, trace_dom, quot_dom, challenges, quot_weights)
    return _all_quotients_combined(
        main_q, aux_q, trace_dom, quot_dom, challenges, quot_weights)


def _gf_sum0(v):
    """Sum a gf pair over axis 0 by halving (log-depth, mod-reduced)."""
    import jax.numpy as jnp
    K = gf.shape(v)[0]
    Kp = 1 << max(K - 1, 0).bit_length()
    if Kp != K:
        pad = ((0, Kp - K),) + ((0, 0),) * (len(gf.shape(v)) - 1)
        v = gf.tmap(lambda a: jnp.pad(a, pad), v)
    while Kp > 1:
        half = Kp // 2
        v = gf.add(gf.tmap(lambda a: a[:half], v),
                   gf.tmap(lambda a: a[half:], v))
        Kp = half
    return gf.tmap(lambda a: a[0], v)


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
        init_zi = gf.batch_inverse(gf.sub(xs, one), axis=0)
        xh = gf.pow_const(xs, h)
        cons_zi = gf.batch_inverse(gf.sub(xh, one), axis=0)
        tran_zi = gf.mul(gf.sub(xs, gi), cons_zi)
        term_zi = gf.batch_inverse(gf.sub(xs, gi), axis=0)
        zis = {"init": init_zi, "cons": cons_zi, "tran": tran_zi,
               "term": term_zi}
        acc = gfx.zeros((Q,))
        for i, ph in enumerate(("init", "cons", "tran", "term")):
            if ph == "tran":
                outs = aircomp.run_tape(tapes[ph], main, aux, ch,
                                        next_main, next_aux)
            else:
                outs = aircomp.run_tape(tapes[ph], main, aux, ch)
            wk = gfx.tmap(lambda a: a[:, None], ws[i])
            prod = gfx.mul(outs, wk)
            inner = tuple(_gf_sum0(c) for c in prod)
            acc = gfx.add(acc, gfx.bfe_mul(inner, zis[ph]))
        return acc

    return jax.jit(fn)


def _all_quotients_combined_device(main_q, aux_q, trace_dom, quot_dom,
                                   challenges, quot_weights):
    """Device path for master_table.rs:1264-1363: run the compiled AIR
    tapes over the quotient domain and combine with weights + zerofier
    inverses, all in one jitted graph. Bit-identical to the host path
    (validated in tests/test_air_compile.py)."""
    air = master_air()
    Q = quot_dom.length
    unit = Q // trace_dom.length

    main = gf.from_u64(main_q.astype(np.uint64))
    aux = tuple(gf.from_u64(aux_q[c].astype(np.uint64)) for c in range(3))
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

    fn = _quotient_fn(Q, unit, trace_dom.length, gen_inv)
    acc = fn(main, aux, ch, tuple(ws), xs)
    out = np.stack([gf.to_u64(acc[c]) for c in range(3)])  # (3, Q)
    return [tuple(int(out[c][i]) for c in range(3)) for i in range(Q)]


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


def _interp_xfe_codeword(codeword, domain):
    """iNTT of an XFE codeword over `domain` -> coefficient list."""
    arr = np.array(codeword, np.uint64)  # (n, 3)
    v = gfx.from_u64(arr)
    coeffs = ntt.xfe_map(ntt.intt, v, domain.offset)
    out = gfx.to_u64(coeffs)  # (n, 3)
    return [tuple(int(c) for c in row) for row in out]


def _interpolate_quotient_segments(quotient_codeword, quot_dom):
    coeffs = _interp_xfe_codeword(quotient_codeword, quot_dom)
    segments = []
    for s in range(NUM_QUOTIENT_SEGMENTS):
        segments.append(coeffs[s::NUM_QUOTIENT_SEGMENTS])
    return segments


def _eval_xfe_poly_on_domain(coeffs, domain):
    """Evaluate an XFE coefficient list over `domain` (device NTT); handles
    polynomials longer than the domain by chunking
    (arithmetic_domain.rs:141-170). Returns list of XFE tuples."""
    n = domain.length
    coeffs = poly.trim(coeffs, xfe) or [xfe.ZERO]
    values = [xfe.ZERO] * n
    for k in range(0, len(coeffs), n):
        chunk = coeffs[k:k + n]
        chunk = chunk + [xfe.ZERO] * (n - len(chunk))
        arr = np.array(chunk, np.uint64)  # (n, 3)
        ev = gfx.to_u64(ntt.xfe_map(ntt.ntt, gfx.from_u64(arr),
                                    domain.offset))
        scale = pow(domain.offset, k, P)
        for i in range(n):
            e = tuple(int(c) for c in ev[i])
            if scale != 1:
                e = xfe.bfe_mul(e, scale)
            values[i] = xfe.add(values[i], e)
    return values


def _ood_row_bfe(table, rand_coeffs, trace_dom, alpha):
    """Barycentric OOD row incl. randomizers (master_table.rs:348-390)."""
    columns_ = [[int(v) for v in table[:, i]] for i in range(table.shape[1])]
    rand = [[xfe.lift(int(c)) for c in rc] for rc in rand_coeffs]
    return _ood_row(columns_, rand, trace_dom, alpha, lift=True)


def _ood_row_xfe(aux, rand_coeffs, trace_dom, alpha):
    cols = []
    for i in range(aux.shape[1]):
        cols.append([tuple(int(c) for c in aux[j, i]) for j in
                     range(aux.shape[0])])
    rand = [[tuple(c) for c in rc] for rc in rand_coeffs]
    return _ood_row(cols, rand, trace_dom, alpha, lift=False)


def _ood_row(columns_, rand_polys, trace_dom, alpha, lift):
    ds = trace_dom.values()
    shifts = [xfe.sub(alpha, xfe.lift(d)) for d in ds]
    shift_invs = _batch_inv_xfe(shifts)
    dods = [xfe.bfe_mul(inv, d) for d, inv in zip(ds, shift_invs)]
    denom = xfe.ZERO
    for v in dods:
        denom = xfe.add(denom, v)
    denom_inv = xfe.inv(denom)
    zerofier_at_alpha = trace_dom.zerofier_at(alpha)

    out = []
    for col, rand in zip(columns_, rand_polys):
        num = xfe.ZERO
        if lift:
            for c, w in zip(col, dods):
                num = xfe.add(num, xfe.bfe_mul(w, c))
        else:
            for c, w in zip(col, dods):
                num = xfe.add(num, xfe.mul(w, c))
        r_at_alpha = xfe.ZERO
        for c in reversed(rand):
            c_x = c if isinstance(c, tuple) else xfe.lift(c)
            r_at_alpha = xfe.add(xfe.mul(r_at_alpha, alpha), c_x)
        out.append(xfe.add(xfe.mul(num, denom_inv),
                           xfe.mul(zerofier_at_alpha, r_at_alpha)))
    return out


def _weighted_sum_of_columns(main, aux, main_rand, aux_rand, trace_dom,
                             w_main, w_aux):
    """master_table.rs:512-542 for main and aux tables combined."""
    h = main.shape[0]
    main_obj = main.astype(object)
    aux_obj = [aux[:, :, c].astype(object) for c in range(3)]
    # weighted sum per row: iterate columns (object math), vectorized rows
    acc = tuple(np.zeros(h, object) for _ in range(3))
    for i in range(main.shape[1]):
        w = w_main[i]
        col = main_obj[:, i]
        acc = tuple((acc[c] + col * w[c]) % P for c in range(3))
    for j in range(aux.shape[1]):
        w = w_aux[j]
        col = tuple(aux_obj[c][:, j] for c in range(3))
        prod = _xmul_obj(col, tuple(np.array(c, object) for c in w))
        acc = tuple((acc[c] + prod[c]) % P for c in range(3))
    values = [tuple(int(acc[c][r]) for c in range(3)) for r in range(h)]
    trace_poly = _interp_xfe_codeword(values, trace_dom)

    # randomizer contribution: zerofier * sum_i w_i * r_i
    rand_sum = [xfe.ZERO] * max(len(main_rand[0]), 1)
    for i, rc in enumerate(main_rand):
        w = w_main[i]
        for k, c in enumerate(rc):
            rand_sum[k] = xfe.add(rand_sum[k], xfe.bfe_mul(w, c))
    for j, rc in enumerate(aux_rand):
        w = w_aux[j]
        for k, c in enumerate(rc):
            rand_sum[k] = xfe.add(rand_sum[k], xfe.mul(w, tuple(c)))
    # zerofier: x^h - offset^h
    off_h = pow(trace_dom.offset, h, P)
    shifted = [xfe.ZERO] * h + rand_sum
    scaled = [xfe.bfe_mul(c, off_h) for c in rand_sum]
    contribution = poly.sub(shifted, scaled, xfe)
    return poly.add(trace_poly, contribution, xfe)
