"""Intra-column sharded NTT (six-step over the mesh) bit-identity.

Runs on the conftest-provided virtual 8-device CPU mesh; the same
shard_map graph compiles for real TPU meshes (P1 completion, SURVEY
§2.5; reference mechanism stark.rs:867-878)."""

import numpy as np
import pytest

from triton_vm_tpu.fields.bfe import P
from triton_vm_tpu.ops import gf, ntt, ntt_sharded
from triton_vm_tpu.parallel.sharding import AXIS


@pytest.fixture
def mesh():
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devices[:8]), (AXIS,))


@pytest.mark.parametrize("log_n", [6, 12])
@pytest.mark.parametrize("offset", [1, 7])
def test_ntt_sharded_matches_single_device(mesh, rng, log_n, offset):
    n = 1 << log_n
    coeffs = rng.integers(0, P, n, dtype=np.uint64)
    want = gf.to_u64(ntt.ntt(gf.from_u64(coeffs), offset))
    got = gf.to_u64(ntt_sharded.ntt_sharded(gf.from_u64(coeffs),
                                            mesh, offset))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("offset", [1, 7])
def test_intt_sharded_matches_single_device(mesh, rng, offset):
    n = 1 << 12
    values = rng.integers(0, P, n, dtype=np.uint64)
    want = gf.to_u64(ntt.intt(gf.from_u64(values), offset))
    got = gf.to_u64(ntt_sharded.intt_sharded(gf.from_u64(values),
                                             mesh, offset))
    assert np.array_equal(got, want)


def test_stir_device_prove_with_intra_column_sharding(rng):
    """STIR's device round loop with the intra-column sharded NTT forced
    on (TVM_MESH=8, low TVM_INTRA_NTT_MIN) emits the exact transcript of
    the host loop — the 'selected by height' wire-in, bit-identical."""
    import os

    from triton_vm_tpu.ldt.stir import Stir, StirParameters
    from triton_vm_tpu.ops import gfx, ntt as nttmod
    from triton_vm_tpu.stark.proof_stream import ProofStream

    params = StirParameters(security_level=64, log2_folding_factor=2,
                            log2_initial_expansion_factor=2,
                            log2_high_degree_bound=8)
    stir = Stir(params)
    coeffs = np.zeros((stir.domain.length, 3), np.uint64)
    coeffs[:params.max_degree() + 1] = rng.integers(
        0, P, (params.max_degree() + 1, 3), dtype=np.uint64)
    cw = gfx.to_u64(nttmod.xfe_map(nttmod.ntt, gfx.from_u64(coeffs),
                                   stir.domain.offset))
    codeword = [tuple(int(c) for c in row) for row in cw]

    saved = {k: os.environ.get(k)
             for k in ("TVM_STIR_DEVICE", "TVM_MESH", "TVM_INTRA_NTT_MIN")}
    try:
        os.environ["TVM_STIR_DEVICE"] = "0"
        os.environ.pop("TVM_MESH", None)
        ps_host = ProofStream()
        idx_host = stir.prove(list(codeword), ps_host)
        os.environ["TVM_STIR_DEVICE"] = "1"
        os.environ["TVM_MESH"] = "8"
        os.environ["TVM_INTRA_NTT_MIN"] = "64"
        ps_dev = ProofStream()
        idx_dev = stir.prove(list(codeword), ps_dev)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v

    assert idx_host == idx_dev
    assert ps_host.to_proof().words == ps_dev.to_proof().words


def test_roundtrip_large(mesh, rng):
    """2^18: the height at which intra-column sharding starts mattering
    (VERDICT r4 ask #5 names 2^18 on the virtual mesh)."""
    n = 1 << 18
    coeffs = rng.integers(0, P, n, dtype=np.uint64)
    vals = ntt_sharded.ntt_sharded(gf.from_u64(coeffs), mesh, 7)
    back = gf.to_u64(ntt_sharded.intt_sharded(vals, mesh, 7))
    assert np.array_equal(back, coeffs)
    # spot-check the forward values against the single-device kernel
    want = gf.to_u64(ntt.ntt(gf.from_u64(coeffs), 7))
    got = gf.to_u64(vals)
    assert np.array_equal(got, want)
