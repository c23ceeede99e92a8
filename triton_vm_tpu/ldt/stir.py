"""STIR ("Shift To Improve Rate") low-degree test.

Transcribed from /root/reference/triton-vm/src/low_degree_test/stir.rs
(eprint 2024/390): per full round, the committed codeword is k-wise
folded, re-evaluated over a 2x-smaller shifted domain, quotiented by the
interpolant through all in- and out-of-domain queries, and
degree-corrected; the final round sends the folded polynomial in the
clear. Fiat-Shamir order, query-count derivations (including the
oversampling margin for unique folded indices), and the Merkle leaf
stacking all follow the reference exactly.

Compute placement: interpolation/evaluation of full codewords runs on the
device NTT (ops/ntt.py); leaf hashing and Merkle trees are batched device
kernels; per-query coset work (size k = folding factor) is scalar host
math, matching the verifier-side cost profile of the reference.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from ..crypto import merkle, tip5
from ..fields import poly, xfe
from ..fields.bfe import P
from ..ops import gf, gfx, ntt, tip5_kernel
from ..stark.arithmetic_domain import Domain
from ..stark.proof_item import ProofItem
from .code import LOG2_FIELD_SIZE_F, ReedSolomonCode, log2_binomial_coefficient
from .fri import GENERATOR, LdtError

LOG2_FIELD_SIZE = 8 * 8 * 3  # stir.rs:411-412 (BYTES * 8 * EXTENSION_DEGREE)
LOG2_DOMAIN_SHRINKAGE = 1  # stir.rs:421


@dataclass(frozen=True)
class StirParameters:
    """stir.rs:59-106."""

    security_level: int
    log2_folding_factor: int
    log2_initial_expansion_factor: int
    log2_high_degree_bound: int
    soundness: str = "proven"

    def max_degree(self) -> int:
        return (1 << self.log2_high_degree_bound) - 1

    def expansion_factor(self) -> int:
        return 1 << self.log2_initial_expansion_factor

    # ---------------------------------------------------- query counts

    def _num_unique_in_domain_queries(self, log2_expansion_factor) -> int:
        """stir.rs:633-639."""
        code = ReedSolomonCode(log2_expansion_factor, self.soundness)
        delta = code.proximity_parameter()
        return math.ceil(-float(self.security_level)
                         / math.log2(1.0 - delta))

    def _num_total_in_domain_queries(self, log2_domain_len, k) -> int:
        """stir.rs:758-778: oversampling so >= k unique folded indices
        survive with probability 1 - 2^-security_level."""
        k_minus_1 = k - 1
        assert k_minus_1 >= 0, "too few queries"
        domain_len = 1 << log2_domain_len
        ell = min(k_minus_1, domain_len // 2)
        log2_u_choose_l = log2_binomial_coefficient(domain_len, ell)
        log2_k_minus_1 = max(math.log2(k_minus_1) if k_minus_1 else 0.0, 0.0)
        n = ((float(self.security_level) + log2_k_minus_1 + log2_u_choose_l)
             / (float(log2_domain_len) - log2_k_minus_1))
        return math.ceil(n)

    def num_in_domain_queries(self, log2_domain_size,
                              log2_expansion_factor) -> int:
        """stir.rs:597-609. `log2_domain_size` is of the FOLDED domain."""
        uniques = self._num_unique_in_domain_queries(log2_expansion_factor)
        uniques = min(uniques, 1 << log2_domain_size)
        return self._num_total_in_domain_queries(log2_domain_size, uniques)

    def num_ood_queries(self, log2_poly_degree,
                        log2_expansion_factor) -> int:
        """stir.rs:831-852 (Lemma 4.5 of the STIR paper)."""
        code = ReedSolomonCode(log2_expansion_factor, self.soundness)
        log2_list_size = code.log2_list_size(log2_poly_degree)
        s = ((float(self.security_level) - 1.0 + 2.0 * log2_list_size)
             / float(LOG2_FIELD_SIZE - log2_poly_degree))
        return math.ceil(s)


class Stir:
    """stir.rs:112-147 + setup at :437-559."""

    def __init__(self, params: StirParameters):
        if params.log2_folding_factor < 2:
            raise LdtError("log2 folding factor must be >= 2")
        if params.log2_initial_expansion_factor == 0:
            raise LdtError("expansion factor too small")
        if params.log2_high_degree_bound < params.log2_folding_factor:
            raise LdtError("high-degree bound below folding factor")

        self.params = params
        k = 1 << params.log2_folding_factor
        self.folding_factor = k

        folded_poly_degree = params.max_degree() // k
        log2_expansion = params.log2_initial_expansion_factor
        log2_domain_len = (params.log2_high_degree_bound
                           + params.log2_initial_expansion_factor)
        self.domain = Domain(1 << log2_domain_len, GENERATOR)
        log2_folded_domain = log2_domain_len - params.log2_folding_factor
        self.round_queries: list[tuple[int, int]] = []  # (in_domain, ood)

        while folded_poly_degree > k:
            in_domain = params.num_in_domain_queries(
                log2_folded_domain, log2_expansion)
            log2_next_expansion = (log2_expansion
                                   + params.log2_folding_factor
                                   - LOG2_DOMAIN_SHRINKAGE)
            log2_folded_poly_degree = folded_poly_degree.bit_length() - 1
            out_of_domain = params.num_ood_queries(
                log2_folded_poly_degree, log2_next_expansion)

            # stop before the quotient collapses to zero (stir.rs:502-541)
            next_folded_poly_deg = folded_poly_degree // k
            if in_domain + out_of_domain > next_folded_poly_deg:
                break
            self.round_queries.append((in_domain, out_of_domain))
            folded_poly_degree = next_folded_poly_deg
            log2_expansion = log2_next_expansion
            log2_folded_domain -= LOG2_DOMAIN_SHRINKAGE

        self.final_num_in_domain_queries = params.num_in_domain_queries(
            log2_folded_domain, log2_expansion)
        self.final_degree = folded_poly_degree

    # -------------------------------------------------- LowDegreeTest

    def initial_domain(self) -> Domain:
        return self.domain

    def num_first_round_queries(self) -> int:
        if self.round_queries:
            return self.round_queries[0][0]
        return self.final_num_in_domain_queries

    @staticmethod
    def next_round_domain(domain: Domain) -> Domain:
        """stir.rs:1149-1155: halve, then shift by the previous offset."""
        nxt = domain.pow(1 << LOG2_DOMAIN_SHRINKAGE)
        return Domain(nxt.length, nxt.offset * domain.offset % P)

    @staticmethod
    def fold_polynomial(coeffs, k, randomness):
        """stir.rs:1132-1147: chunk coefficients k-wise, Horner-evaluate
        each chunk at the folding randomness."""
        out = []
        for i in range(0, max(len(coeffs), 1), k):
            out.append(poly.evaluate(coeffs[i:i + k], randomness, xfe))
        return out

    # ------------------------------------------------------------ prove

    def prove(self, codeword, proof_stream) -> list[int]:
        """stir.rs:885-993. Returns the first round's raw query indices."""
        import os

        import jax

        domain = self.domain
        force = os.environ.get("TVM_STIR_DEVICE")
        use_dev = (force == "1" or
                   (force != "0" and jax.default_backend() != "cpu"))
        if use_dev:
            if not isinstance(codeword, tuple):
                cw = np.asarray(codeword, np.uint64).reshape(-1, 3)
                codeword = gfx.from_u64(cw)
            if gfx.shape(codeword)[0] != domain.length:
                raise LdtError("initial codeword length mismatch")
            return self._prove_device(codeword, proof_stream)
        if isinstance(codeword, tuple):  # gfx device value
            from ..ops import gfx as _gfx
            codeword = [tuple(int(c) for c in row)
                        for row in _gfx.to_u64(codeword)]
        if len(codeword) != domain.length:
            raise LdtError("initial codeword length mismatch")
        k = self.folding_factor

        commitment = _StirMerkleTree(codeword, k)
        proof_stream.enqueue(ProofItem("MerkleRoot", commitment.root()))
        coeffs = _xfe_interpolate(codeword, domain)
        first_round_indices = None

        for in_domain, out_of_domain in self.round_queries:
            folding_randomness = proof_stream.sample_scalars(1)[0]
            folded = self.fold_polynomial(coeffs, k, folding_randomness)
            next_domain = self.next_round_domain(domain)

            folded_evaluations = _xfe_evaluate(folded, next_domain)
            folded_commitment = _StirMerkleTree(folded_evaluations, k)
            proof_stream.enqueue(ProofItem("MerkleRoot",
                                           folded_commitment.root()))

            ood_queries = proof_stream.sample_scalars(out_of_domain)
            ood_values = [poly.evaluate(folded, x, xfe)
                          for x in ood_queries]
            proof_stream.enqueue(ProofItem("StirOutOfDomainValues",
                                           list(ood_values)))

            queried_indices = proof_stream.sample_indices(
                domain.length, in_domain)
            folded_domain = domain.pow(k)
            folded_queried_indices = _unique(
                i % folded_domain.length for i in queried_indices)
            proof_stream.enqueue(ProofItem(
                "StirResponse",
                commitment.inclusion_proof(folded_queried_indices)))

            # witness polynomial for the next round (stir.rs:937-967)
            queried_domain_values = [folded_domain.value(i)
                                     for i in folded_queried_indices]
            points_to_quotient_out = (
                [poly.evaluate(folded, xfe.lift(x), xfe)
                 for x in queried_domain_values] + list(ood_values))
            domain_values_out = ([xfe.lift(x) for x in
                                  queried_domain_values] + list(ood_queries))
            answer_poly = poly.interpolate(domain_values_out,
                                           points_to_quotient_out, xfe)
            zerofier = poly.zerofier(domain_values_out, xfe)
            quotient, rem = poly.divide(
                poly.sub(folded, answer_poly, xfe), zerofier, xfe)
            assert poly.trim(rem, xfe) == [], "non-zero quotient remainder"

            dc_randomness = proof_stream.sample_scalars(1)[0]
            dc_poly = _powers(dc_randomness,
                              len(points_to_quotient_out) + 1)
            coeffs = poly.mul(quotient, dc_poly, xfe)
            domain = next_domain
            commitment = folded_commitment
            if first_round_indices is None:
                first_round_indices = queried_indices

        # final round: no quotienting (stir.rs:976-992)
        folding_randomness = proof_stream.sample_scalars(1)[0]
        final_poly = self.fold_polynomial(coeffs, k, folding_randomness)
        proof_stream.enqueue(ProofItem(
            "Polynomial", [tuple(c) for c in poly.trim(final_poly, xfe)]))

        folded_domain = domain.pow(k)
        queried_indices = proof_stream.sample_indices(
            domain.length, self.final_num_in_domain_queries)
        folded_queried_indices = _unique(
            i % folded_domain.length for i in queried_indices)
        proof_stream.enqueue(ProofItem(
            "StirResponse",
            commitment.inclusion_proof(folded_queried_indices)))

        return (first_round_indices if first_round_indices is not None
                else queried_indices)

    def _prove_device(self, cw_dev, proof_stream) -> list[int]:
        """Device round loop: identical transcript to `prove` (every
        emitted value is the same exact field element), with the
        codeword, folds, NTTs, point evaluations and the
        quotient-by-zerofier on device. The quotient is computed in the
        NEXT evaluation domain — exact because deg(quotient * dc) <
        |next domain| and the quotient points provably avoid the domain
        (offsets are powers of the field generator, whose order divides
        no 2-power; checked per round anyway).

        Behavioral divergence from the host path: if a sampled OOD
        query or a queried-domain point DOES land on the next
        evaluation domain (probability ~2^-170 per prove), this path
        raises LdtError, while the host loop would succeed via exact
        polynomial division. A production caller may catch LdtError and
        retry via the host prover; completeness is otherwise identical."""
        import jax.numpy as jnp

        def pad_to(v, n):
            cur = gfx.shape(v)[0]
            if cur == n:
                return v
            return gfx.tmap(lambda a: jnp.pad(a, (0, n - cur)), v)

        k = self.folding_factor
        domain = self.domain
        commitment = _StirMerkleTreeDev(cw_dev, k)
        proof_stream.enqueue(ProofItem("MerkleRoot", commitment.root()))
        # tall single-column transforms distribute over the active mesh
        # (six-step, ops/ntt_sharded) — P1 intra-column sharding
        from ..ops import ntt_sharded

        coeffs_dev = ntt_sharded.xfe_intt_auto(cw_dev, domain.offset)
        first_round_indices = None

        global _QNV_FN
        if _QNV_FN is None:
            _QNV_FN = _quotient_next_vals_fn()

        for in_domain, out_of_domain in self.round_queries:
            folding_randomness = proof_stream.sample_scalars(1)[0]
            folded_dev = _fold_device(coeffs_dev, k, folding_randomness)
            next_domain = self.next_round_domain(domain)
            nd_len = next_domain.length

            folded_evals_dev = ntt_sharded.xfe_ntt_auto(
                pad_to(folded_dev, nd_len), next_domain.offset)
            folded_commitment = _StirMerkleTreeDev(folded_evals_dev, k)
            proof_stream.enqueue(ProofItem("MerkleRoot",
                                           folded_commitment.root()))

            ood_queries = proof_stream.sample_scalars(out_of_domain)
            queried_indices = None  # sampled after OOD values are sent
            for pt in ood_queries:
                if _point_on_domain(pt, next_domain):
                    raise LdtError("OOD query on evaluation domain")
            ood_values = _eval_folded_at(folded_dev, ood_queries)
            proof_stream.enqueue(ProofItem("StirOutOfDomainValues",
                                           list(ood_values)))

            queried_indices = proof_stream.sample_indices(
                domain.length, in_domain)
            folded_domain = domain.pow(k)
            folded_queried_indices = _unique(
                i % folded_domain.length for i in queried_indices)
            proof_stream.enqueue(ProofItem(
                "StirResponse",
                commitment.inclusion_proof(folded_queried_indices)))

            queried_domain_values = [folded_domain.value(i)
                                     for i in folded_queried_indices]
            pt_lifts = [xfe.lift(x) for x in queried_domain_values]
            for pt in pt_lifts:
                if _point_on_domain(pt, next_domain):
                    raise LdtError("quotient point on evaluation domain")
            pt_evals = _eval_folded_at(folded_dev, pt_lifts)
            points_to_quotient_out = pt_evals + list(ood_values)
            domain_values_out = pt_lifts + list(ood_queries)
            answer_poly = poly.interpolate(domain_values_out,
                                           points_to_quotient_out, xfe)

            dc_randomness = proof_stream.sample_scalars(1)[0]
            dc_coeffs = _powers(dc_randomness,
                                len(points_to_quotient_out) + 1)
            ans_evals = _eval_poly_on_domain_dev(answer_poly, next_domain)
            z_evals = _zerofier_on_domain_dev(domain_values_out,
                                              next_domain)
            dc_evals = _eval_poly_on_domain_dev(dc_coeffs, next_domain)
            next_vals = _QNV_FN(nd_len)(folded_evals_dev, ans_evals,
                                        z_evals, dc_evals)
            coeffs_dev = ntt.xfe_map(ntt.intt, next_vals,
                                     next_domain.offset)
            domain = next_domain
            commitment = folded_commitment
            if first_round_indices is None:
                first_round_indices = queried_indices

        folding_randomness = proof_stream.sample_scalars(1)[0]
        final_dev = _fold_device(coeffs_dev, k, folding_randomness)
        final_poly = [tuple(int(c) for c in row)
                      for row in gfx.to_u64(final_dev)]
        proof_stream.enqueue(ProofItem(
            "Polynomial", [tuple(c) for c in poly.trim(final_poly, xfe)]))

        folded_domain = domain.pow(k)
        queried_indices = proof_stream.sample_indices(
            domain.length, self.final_num_in_domain_queries)
        folded_queried_indices = _unique(
            i % folded_domain.length for i in queried_indices)
        proof_stream.enqueue(ProofItem(
            "StirResponse",
            commitment.inclusion_proof(folded_queried_indices)))

        return (first_round_indices if first_round_indices is not None
                else queried_indices)

    # ----------------------------------------------------------- verify

    def verify(self, proof_stream):
        """stir.rs:995-1110. Returns
        (first_round_indices, partial_first_codeword) like Fri.verify."""
        k = self.folding_factor
        domain = self.domain
        partial_first_codeword = None
        first_round_indices = None
        prev_quotienting = None
        prev_root = proof_stream.dequeue().expect("MerkleRoot")

        for in_domain, out_of_domain in self.round_queries:
            folding_randomness = proof_stream.sample_scalars(1)[0]
            cur_root = proof_stream.dequeue().expect("MerkleRoot")
            ood_queries = proof_stream.sample_scalars(out_of_domain)
            ood_answers = proof_stream.dequeue().expect(
                "StirOutOfDomainValues")
            queries, raw_indices = self._extract_inclusion_proof(
                proof_stream, domain, in_domain, prev_root)
            if partial_first_codeword is None:
                partial_first_codeword = self._partial_codeword(
                    domain, queries)
                first_round_indices = raw_indices

            if prev_quotienting is None:
                answers = _initial_in_domain_answers(
                    queries, folding_randomness)
            else:
                answers = _subsequent_in_domain_answers(
                    prev_quotienting, queries, folding_randomness)

            # de-duplicate by query point (stir.rs:1026-1033)
            quotient_set, quotient_answers = [], []
            seen = set()
            all_points = ([xfe.lift(q["point"]) for q in queries]
                          + list(ood_queries))
            all_answers = list(answers) + list(ood_answers)
            for pt, ans in zip(all_points, all_answers):
                if pt in seen:
                    continue
                seen.add(pt)
                quotient_set.append(pt)
                quotient_answers.append(ans)
            dc_randomness = proof_stream.sample_scalars(1)[0]
            prev_quotienting = (quotient_set, quotient_answers,
                                dc_randomness)
            domain = self.next_round_domain(domain)
            prev_root = cur_root

        folding_randomness = proof_stream.sample_scalars(1)[0]
        final_poly = proof_stream.dequeue().expect("Polynomial")
        if poly.degree(final_poly, xfe) > self.final_degree:
            raise LdtError("last round polynomial has too high degree")

        queries, raw_indices = self._extract_inclusion_proof(
            proof_stream, domain, self.final_num_in_domain_queries,
            prev_root)
        if prev_quotienting is None:
            final_answers = _initial_in_domain_answers(
                queries, folding_randomness)
        else:
            final_answers = _subsequent_in_domain_answers(
                prev_quotienting, queries, folding_randomness)
        for q, answer in zip(queries, final_answers):
            evaluation = poly.evaluate(final_poly, xfe.lift(q["point"]),
                                       xfe)
            if answer != evaluation:
                raise LdtError("last round polynomial evaluation mismatch")

        if partial_first_codeword is None:
            partial_first_codeword = self._partial_codeword(domain, queries)
            first_round_indices = raw_indices
        return first_round_indices, partial_first_codeword

    # ---------------------------------------------------------- helpers

    def _extract_inclusion_proof(self, proof_stream, round_domain,
                                 num_queries, root):
        """stir.rs:1157-1243: sample indices, dequeue + authenticate the
        response, and assemble per-query data."""
        k = self.folding_factor
        queried_indices = proof_stream.sample_indices(
            round_domain.length, num_queries)
        response = proof_stream.dequeue().expect("StirResponse")
        queried_leaves = response["queried_leaves"]
        auth_structure = response["auth_structure"]

        folded_domain = round_domain.pow(k)
        folded_len = folded_domain.length
        folded_indices = _unique(i % folded_len for i in queried_indices)
        if len(queried_leaves) != len(folded_indices):
            raise LdtError("incorrect number of revealed leaves")

        digests = [tuple(tip5.hash_varlen(
            [c for x in leaf for c in x])) for leaf in queried_leaves]
        if not merkle.verify_authentication_structure(
                root, folded_len, folded_indices, digests, auth_structure):
            raise LdtError("bad STIR merkle authentication")

        by_folded = dict(zip(folded_indices, queried_leaves))
        kth_root = pow(round_domain.generator, folded_len, P)
        queries = []
        for index in queried_indices:
            qi = index % folded_len
            queries.append({
                "index": index,
                "point": folded_domain.value(qi),
                "root": round_domain.value(qi),
                "kth_root": kth_root,
                "values": by_folded[qi],
            })
        return queries, queried_indices

    def _partial_codeword(self, domain, queries):
        """stir.rs:1245-1257: pick the one revealed element per query that
        corresponds to the raw (unfolded) index."""
        folded_len = domain.pow(self.folding_factor).length
        return [tuple(q["values"][q["index"] // folded_len])
                for q in queries]


def _unique(it):
    seen = set()
    out = []
    for x in it:
        if x not in seen:
            seen.add(x)
            out.append(x)
    return out


def _powers(x, n):
    out = [xfe.ONE]
    for _ in range(n - 1):
        out.append(xfe.mul(out[-1], x))
    return out


def _coset_interpolate(root_bfe, values):
    """Polynomial through (root*omega_k^j, values[j]); k is tiny (the
    folding factor), so Lagrange interpolation is fine."""
    kk = len(values)
    omega = Domain(kk).generator
    pts = [xfe.lift(root_bfe * pow(omega, j, P) % P) for j in range(kk)]
    return poly.interpolate(pts, list(values), xfe)


def _initial_in_domain_answers(queries, folding_randomness):
    """stir.rs:1259-1272."""
    out = []
    for q in queries:
        p = _coset_interpolate(q["root"], q["values"])
        out.append(poly.evaluate(p, folding_randomness, xfe))
    return out


def _subsequent_in_domain_answers(quotienting, queries,
                                  folding_randomness):
    """stir.rs:1275-1323: quotient + degree-correct the revealed coset
    values, then fold."""
    quotient_set, quotient_answers, dc_randomness = quotienting
    answer_poly = poly.interpolate(quotient_set, quotient_answers, xfe)
    zerofier = poly.zerofier(quotient_set, xfe)
    degree_difference = len(quotient_set) + 1

    out = []
    for q in queries:
        coset_evaluations = []
        current_root = q["root"]
        for evaluation in q["values"]:
            ans = poly.evaluate(answer_poly, xfe.lift(current_root), xfe)
            z = poly.evaluate(zerofier, xfe.lift(current_root), xfe)
            quotient = xfe.mul(xfe.sub(tuple(evaluation), ans), xfe.inv(z))

            common = xfe.bfe_mul(dc_randomness, current_root)
            if common == xfe.ONE:
                dc_factor = xfe.lift(degree_difference % P)
            else:
                num = xfe.sub(xfe.ONE, xfe.mod_pow(common,
                                                   degree_difference))
                dc_factor = xfe.mul(num, xfe.inv(xfe.sub(xfe.ONE, common)))
            coset_evaluations.append(xfe.mul(dc_factor, quotient))
            current_root = current_root * q["kth_root"] % P
        p = _coset_interpolate(q["root"], coset_evaluations)
        out.append(poly.evaluate(p, folding_randomness, xfe))
    return out


# ------------------------------------------------ codeword <-> polynomial

def _xfe_interpolate(codeword, domain) -> list[tuple]:
    """Device iNTT of an XFE codeword over `domain`."""
    arr = np.array(codeword, np.uint64).reshape(-1, 3)
    out = gfx.to_u64(ntt.xfe_map(ntt.intt, gfx.from_u64(arr),
                                 domain.offset))
    return [tuple(int(c) for c in row) for row in out]


def _xfe_evaluate(coeffs, domain) -> list[tuple]:
    """Device NTT evaluation of XFE coefficients over `domain`."""
    n = domain.length
    assert len(coeffs) <= n, "polynomial longer than evaluation domain"
    arr = np.zeros((n, 3), np.uint64)
    if coeffs:
        arr[:len(coeffs)] = np.array(coeffs, np.uint64).reshape(-1, 3)
    out = gfx.to_u64(ntt.xfe_map(ntt.ntt, gfx.from_u64(arr),
                                 domain.offset))
    return [tuple(int(c) for c in row) for row in out]


class _StirMerkleTree:
    """stir.rs:321-331,1374-1433: leaves are k-element "stacks" of the
    codeword (stride = len/k), hashed as variable-length Tip5 input; row
    hashing and tree layers run as batched device kernels."""

    def __init__(self, codeword, stack_height):
        n = len(codeword)
        distance = -(-n // stack_height)  # ceil
        self.stacked = [[tuple(codeword[j]) for j in range(i, n, distance)]
                        for i in range(distance)]
        rows = np.array(
            [[c for x in stack for c in x] for stack in self.stacked],
            np.uint64)  # (distance, 3k)
        digests = tip5_kernel.sponge_absorb_rows(gf.from_u64(rows))
        self.tree = merkle.MerkleTree(digests)

    def root(self):
        return self.tree.root()

    def inclusion_proof(self, indices):
        return {
            "queried_leaves": [list(self.stacked[i]) for i in indices],
            "auth_structure": self.tree.authentication_structure(indices),
        }


# ------------------------------------------------- device prove pipeline
# The host round loop above evaluates the folded polynomial at ~150
# points and divides by the query zerofier in pure-Python XFE arithmetic
# — tens of millions of host field ops at 2^16 (measured ~46 s, and it
# scales linearly with the degree bound). The device pipeline keeps the
# codeword/coefficients on device the whole way: k-wise fold, NTT
# re-evaluation, batched barycentric point evaluation, and the
# quotient-by-zerofier computed in the NEXT evaluation domain (exact: the
# quotient-times-degree-correction polynomial has degree < |next domain|,
# and the quotient points provably avoid the domain — checked per round).
# Every emitted transcript value is the same exact field element as the
# host path's (differential test: test_stir.py device-vs-host transcript).


_EVAL_BLOCK = 128


def _horner_pts_cache():
    import functools

    import jax
    import jax.numpy as jnp

    @functools.lru_cache(maxsize=32)
    def fn(n, m):
        B = _EVAL_BLOCK

        def eval_pts(coeffs, pts):
            # coeffs gfx (n,) low->high; pts gfx (m,) -> gfx (m,)
            nb = n // B
            ch = gfx.tmap(
                lambda a: a.reshape(nb, B)[::-1], coeffs)  # high block 1st
            # x^B per point via log2(B) squarings
            xB = pts
            for _ in range(B.bit_length() - 1):
                xB = gfx.mul(xB, xB)

            def step(acc, block):
                # block gfx (B,); Horner over the block, high->low
                bacc = gfx.tmap(
                    lambda a: jnp.broadcast_to(a[B - 1], (m,)), block)
                for t in range(B - 2, -1, -1):
                    bacc = gfx.add(
                        gfx.mul(bacc, pts),
                        gfx.tmap(lambda a, t=t: jnp.broadcast_to(
                            a[t], (m,)), block))
                return gfx.add(gfx.mul(acc, xB), bacc), None

            acc, _ = jax.lax.scan(step, gfx.zeros((m,)), ch)
            return acc

        return jax.jit(eval_pts)

    return fn


_HPTS_FN = None


def _eval_folded_at(coeffs_dev, points):
    """Evaluate the polynomial with device coefficients `coeffs_dev`
    (gfx (n,), low->high, zero-padded) at a list of XFE points —
    blocked Horner on device, exact field arithmetic (identical values
    to poly.evaluate). Points processed in shape-stable chunks of 16."""
    global _HPTS_FN
    if _HPTS_FN is None:
        _HPTS_FN = _horner_pts_cache()
    import jax.numpy as jnp

    n = gfx.shape(coeffs_dev)[0]
    if n % _EVAL_BLOCK:
        npad = -(-n // _EVAL_BLOCK) * _EVAL_BLOCK
        coeffs_dev = gfx.tmap(lambda a: jnp.pad(a, (0, npad - n)),
                              coeffs_dev)
        n = npad
    fn = _HPTS_FN(n, 16)
    out = []
    for i in range(0, len(points), 16):
        chunk = list(points[i:i + 16])
        real = len(chunk)
        while len(chunk) < 16:  # shape-stable: pad with a dummy point
            chunk.append((1, 2, 3))
        pts = gfx.from_u64(np.array(chunk, np.uint64))
        got = gfx.to_u64(fn(coeffs_dev, pts))
        out += [tuple(int(c) for c in row) for row in got[:real]]
    return out


def _fold_dev_fn():
    import functools

    import jax

    @functools.lru_cache(maxsize=32)
    def make(n, k):
        def fold(coeffs, r):
            # coeffs gfx (n,) -> gfx (n/k,): Horner over each k-chunk
            ch = gfx.tmap(lambda a: a.reshape(n // k, k), coeffs)
            acc = gfx.tmap(lambda a: a[:, k - 1], ch)
            for t in range(k - 2, -1, -1):
                acc = gfx.add(gfx.mul(acc, r),
                              gfx.tmap(lambda a, t=t: a[:, t], ch))
            return acc

        return jax.jit(fold)

    return make


_FOLD_FN = None


def _fold_device(coeffs_dev, k, randomness):
    global _FOLD_FN
    if _FOLD_FN is None:
        _FOLD_FN = _fold_dev_fn()
    n = gfx.shape(coeffs_dev)[0]
    r = gfx.from_u64(np.array(randomness, np.uint64))
    return _FOLD_FN(n, k)(coeffs_dev, r)


def _horner_domain_fn():
    import functools

    import jax

    @functools.lru_cache(maxsize=32)
    def make(n, m):
        def f(coeffs, xs):
            # coeffs gfx (m,) high-to-low padded; evaluate at gf xs (n,)
            acc = gfx.tmap(lambda a: jnp_broadcast(a[0], n), coeffs)
            for t in range(1, m):
                acc = gfx.add(gfx.bfe_mul(acc, xs),
                              gfx.tmap(lambda a, t=t: jnp_broadcast(a[t], n),
                                       coeffs))
            return acc

        import jax.numpy as jnp

        def jnp_broadcast(v, n):
            return jnp.broadcast_to(v, (n,))

        return jax.jit(f)

    return make


_HORNER_FN = None


def _eval_poly_on_domain_dev(coeffs, domain: Domain, pad_to=None):
    """Evaluate a SHORT (host-list) XFE polynomial on every point of
    `domain`, on device. Returns gfx (n,)."""
    global _HORNER_FN
    if _HORNER_FN is None:
        _HORNER_FN = _horner_domain_fn()
    from ..ops import kernels

    coeffs = list(coeffs) or [xfe.ZERO]
    m = pad_to or _ceil16(len(coeffs))
    # high-to-low order, zero-padded at the HIGH end (harmless for Horner)
    arr = np.zeros((m, 3), np.uint64)
    arr[m - len(coeffs):] = np.array(coeffs[::-1], np.uint64)
    xs = kernels._domain_powers(domain.generator, domain.offset,
                                domain.length)
    return _HORNER_FN(domain.length, m)(gfx.from_u64(arr), xs)


def _quotient_next_vals_fn():
    import functools

    import jax

    @functools.lru_cache(maxsize=32)
    def make(n):
        def f(folded_evals, ans_evals, z_evals, dc_evals):
            num = gfx.sub(folded_evals, ans_evals)
            return gfx.mul(gfx.mul(num, gfx.inv(z_evals)), dc_evals)

        return jax.jit(f)

    return make


_QNV_FN = None


def _point_on_domain(point, domain: Domain) -> bool:
    """Exact membership check of an XFE point in a base-field coset."""
    if point[1] or point[2]:
        return False
    x = point[0] * pow(domain.offset, P - 2, P) % P
    return pow(x, domain.length, P) == 1


class _StirMerkleTreeDev:
    """_StirMerkleTree over a DEVICE codeword: leaf rows are assembled,
    hashed, and tree-built on device; only queried stacks and auth nodes
    are ever read back. Same leaf layout, same digests."""

    _rows_cache = {}

    def __init__(self, cw_dev, stack_height):
        n = gfx.shape(cw_dev)[0]
        self._k = stack_height
        self._distance = n // stack_height
        rows = self._rows_fn(n, stack_height)(cw_dev)
        digests = tip5_kernel.sponge_absorb_rows(rows)
        self.tree = merkle.MerkleTree(digests)
        self._cw = cw_dev

    @classmethod
    def _rows_fn(cls, n, k):
        key = (n, k)
        if key not in cls._rows_cache:
            import jax
            import jax.numpy as jnp

            d = n // k

            def rows(cw):
                # (distance, 3k): row i = [cw[i], cw[i+d], ...] flattened
                planes = []
                for pair in cw:  # 3 coefficients
                    planes.append(tuple(a.reshape(k, d).T for a in pair))
                return tuple(
                    jnp.stack([planes[c][p] for c in range(3)], axis=2)
                    .reshape(d, 3 * k) for p in range(2))

            cls._rows_cache[key] = jax.jit(rows)
        return cls._rows_cache[key]

    def root(self):
        return self.tree.root()

    def inclusion_proof(self, indices):
        idx = np.array([i + s * self._distance for i in indices
                        for s in range(self._k)], np.int64)
        sel = gfx.to_u64(gfx.tmap(lambda a: a[idx], self._cw))
        k = self._k
        leaves = [[tuple(int(c) for c in sel[j * k + s]) for s in range(k)]
                  for j in range(len(indices))]
        return {"queried_leaves": leaves,
                "auth_structure": self.tree.authentication_structure(
                    indices)}


def _ceil16(m: int) -> int:
    return -(-m // 16) * 16


def _zerofier_fn_cache():
    import functools

    import jax
    import jax.numpy as jnp

    @functools.lru_cache(maxsize=32)
    def make(n, m):
        def f(pts, mask, xs):
            # prod over i of (lift(xs) - pts[i]), masked entries -> 1
            acc = gfx.ones((n,))
            one = gfx.ones((n,))
            for i in range(m):
                p0 = gfx.tmap(lambda a, i=i: a[i], pts)
                term = (gf.sub(xs, gf.broadcast_to(p0[0], (n,))),
                        gf.broadcast_to(gf.neg(p0[1]), (n,)),
                        gf.broadcast_to(gf.neg(p0[2]), (n,)))
                term = gfx.select(jnp.broadcast_to(mask[i], (n,)),
                                  term, one)
                acc = gfx.mul(acc, term)
            return acc

        return jax.jit(f)

    return make


_ZERO_FN = None


def _zerofier_on_domain_dev(points, domain: Domain):
    """Zerofier of `points` (XFE list) evaluated on every domain point,
    on device; point count padded to 16 so shapes are proof-independent."""
    global _ZERO_FN
    if _ZERO_FN is None:
        _ZERO_FN = _zerofier_fn_cache()
    from ..ops import kernels

    m = _ceil16(len(points))
    arr = np.zeros((m, 3), np.uint64)
    arr[:len(points)] = np.array(points, np.uint64)
    mask = np.zeros(m, bool)
    mask[:len(points)] = True
    xs = kernels._domain_powers(domain.generator, domain.offset,
                                domain.length)
    import jax

    return _ZERO_FN(domain.length, m)(gfx.from_u64(arr),
                                      jax.device_put(mask), xs)
