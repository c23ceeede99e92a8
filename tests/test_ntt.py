"""NTT/LDE against a slow host DFT reference."""

import numpy as np
import pytest

from triton_vm_tpu.fields import bfe
from triton_vm_tpu.fields.bfe import P
from triton_vm_tpu.ops import gf, ntt


def slow_dft(coeffs, offset=1):
    """Evaluate poly with given coefficients on offset*<omega_n>, naturally."""
    n = len(coeffs)
    w = bfe.primitive_root_of_unity(n) if n > 1 else 1
    return [
        sum(int(c) * pow(offset * pow(w, k, P) % P, i, P) for i, c in enumerate(coeffs)) % P
        for k in range(n)
    ]


@pytest.mark.parametrize("n", [1, 2, 4, 8, 32, 128])
def test_ntt_matches_slow_dft(rng, n):
    coeffs = rng.integers(0, P, size=n, dtype=np.uint64)
    got = gf.to_u64(ntt.ntt(gf.from_u64(coeffs)))
    want = slow_dft(coeffs)
    np.testing.assert_array_equal(got, np.array(want, np.uint64))


@pytest.mark.parametrize("offset", [1, 7, 12345])
def test_coset_ntt(rng, offset):
    n = 16
    coeffs = rng.integers(0, P, size=n, dtype=np.uint64)
    got = gf.to_u64(ntt.ntt(gf.from_u64(coeffs), offset))
    np.testing.assert_array_equal(got, np.array(slow_dft(coeffs, offset), np.uint64))


def test_roundtrip_batch(rng):
    vals = rng.integers(0, P, size=(5, 64), dtype=np.uint64)
    v = gf.from_u64(vals)
    c = ntt.coeffs_bitrev_from_values(v, offset=7)
    back = ntt.values_from_coeffs_bitrev(c, offset=7)
    np.testing.assert_array_equal(gf.to_u64(back), vals)
    # natural-order roundtrip too
    np.testing.assert_array_equal(gf.to_u64(ntt.intt(ntt.ntt(v))), vals)


def test_lde_matches_direct_evaluation(rng):
    n, expansion = 16, 4
    coeffs = rng.integers(0, P, size=n, dtype=np.uint64)
    # values on trace domain (offset 1)
    values = ntt.ntt(gf.from_u64(coeffs))
    extended = ntt.lde(values, expansion, in_offset=1, out_offset=7)
    padded = list(coeffs) + [0] * (n * (expansion - 1))
    want = slow_dft(padded, offset=7)
    np.testing.assert_array_equal(gf.to_u64(extended), np.array(want, np.uint64))


def test_xfe_ntt(rng):
    from triton_vm_tpu.ops import gfx

    n = 8
    coeffs = rng.integers(0, P, size=(n, 3), dtype=np.uint64)
    v = gfx.from_u64(coeffs)  # (3, 2, n)
    got = gfx.to_u64(ntt.xfe_map(ntt.ntt, v))
    for j in range(3):
        want = slow_dft(coeffs[:, j])
        np.testing.assert_array_equal(got[:, j], np.array(want, np.uint64))
