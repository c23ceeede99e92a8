"""STIR low-degree test: parameter derivation, prove/verify roundtrip,
degree-bound rejection, and tamper rejection."""

import numpy as np
import pytest

from triton_vm_tpu.fields import poly, xfe
from triton_vm_tpu.fields.bfe import P
from triton_vm_tpu.ldt.fri import LdtError
from triton_vm_tpu.ldt.stir import Stir, StirParameters, _xfe_evaluate
from triton_vm_tpu.stark.proof_stream import ProofStream

PARAMS = StirParameters(security_level=80, log2_folding_factor=2,
                        log2_initial_expansion_factor=2,
                        log2_high_degree_bound=12)


def _random_codeword(stir, degree, seed=0):
    rng = np.random.default_rng(seed)
    coeffs = [tuple(int(c) for c in row)
              for row in rng.integers(0, P, size=(degree + 1, 3),
                                      dtype=np.uint64)]
    return coeffs, _xfe_evaluate(coeffs, stir.initial_domain())


def test_parameter_derivation_has_full_rounds():
    stir = Stir(PARAMS)
    assert stir.folding_factor == 4
    assert len(stir.round_queries) >= 1
    assert stir.final_degree > 0
    assert stir.num_first_round_queries() == stir.round_queries[0][0]
    # domain shrinks 2x per round while degree drops 4x: rate improves
    assert stir.initial_domain().length == 1 << 14


def test_prove_verify_roundtrip():
    stir = Stir(PARAMS)
    _, codeword = _random_codeword(stir, PARAMS.max_degree())
    ps = ProofStream()
    indices = stir.prove(codeword, ps)

    ps2 = ProofStream.decode(ps.encode())
    indices2, partial = stir.verify(ps2)
    assert indices2 == indices
    assert partial == [tuple(codeword[i]) for i in indices]


def test_rejects_high_degree_polynomial():
    stir = Stir(PARAMS)
    _, codeword = _random_codeword(stir, PARAMS.max_degree() + 1, seed=3)
    ps = ProofStream()
    stir.prove(codeword, ps)
    with pytest.raises(LdtError):
        stir.verify(ProofStream.decode(ps.encode()))


def test_rejects_tampered_proof():
    stir = Stir(PARAMS)
    _, codeword = _random_codeword(stir, PARAMS.max_degree(), seed=5)
    ps = ProofStream()
    stir.prove(codeword, ps)
    words = ps.encode()
    words[len(words) // 2] = (words[len(words) // 2] + 1) % P
    with pytest.raises(Exception):
        stir.verify(ProofStream.decode(words))


def test_device_prove_transcript_matches_host():
    """The device round loop (_prove_device) must emit the exact same
    transcript words as the host reference loop."""
    import os

    import numpy as np

    from triton_vm_tpu.fields.bfe import P
    from triton_vm_tpu.ldt.stir import Stir, StirParameters
    from triton_vm_tpu.stark.proof_stream import ProofStream

    params = StirParameters(security_level=64, log2_folding_factor=2,
                            log2_initial_expansion_factor=2,
                            log2_high_degree_bound=8)
    stir = Stir(params)
    rng = np.random.default_rng(21)
    # a true low-degree codeword
    from triton_vm_tpu.ops import gfx, ntt
    coeffs = np.zeros((stir.domain.length, 3), np.uint64)
    coeffs[:params.max_degree() + 1] = rng.integers(
        0, P, (params.max_degree() + 1, 3), dtype=np.uint64)
    cw = gfx.to_u64(ntt.xfe_map(ntt.ntt, gfx.from_u64(coeffs),
                                stir.domain.offset))
    codeword = [tuple(int(c) for c in row) for row in cw]

    prev = os.environ.get("TVM_STIR_DEVICE")
    try:
        os.environ["TVM_STIR_DEVICE"] = "0"
        ps_host = ProofStream()
        idx_host = stir.prove(list(codeword), ps_host)
        os.environ["TVM_STIR_DEVICE"] = "1"
        ps_dev = ProofStream()
        idx_dev = stir.prove(list(codeword), ps_dev)
    finally:
        if prev is None:
            os.environ.pop("TVM_STIR_DEVICE", None)
        else:
            os.environ["TVM_STIR_DEVICE"] = prev

    assert idx_host == idx_dev
    assert ps_host.to_proof().words == ps_dev.to_proof().words
