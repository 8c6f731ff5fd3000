"""Golden-vector pinning of the integer CDF quantizer.

The C++ dcae_pmf_to_quantized_cdf implements the published ryg_rans-derived
normalization used by the reference's entropy-coding dependency (round to
precision bits -> integer renormalize by the total -> prefix sum -> force
top to 2^precision -> fix zero buckets by stealing one count from the
lowest-frequency bucket with freq > 1, shifting the range between thief and
victim). These tests pin that semantics two ways:

  1. against an INDEPENDENT pure-python re-statement of the algorithm over
     randomized pmfs (catches C++ implementation bugs);
  2. against hardcoded expected outputs (catches accidental semantic
     changes; the quantized table bytes determine the bitstream, see
     /root/reference/export_checkpoint.py:13-43).

Live-CompressAI cross-validation is not possible in this environment (the
package is not installed); the deployment story does not depend on it:
tables are baked once and shipped with checkpoints (.tables.npz), exactly
the reference's own protocol for cross-machine bit-agreement.
"""

import numpy as np
import pytest

from dcae_tpu.entropy import rans


def ref_quantize(pmf, precision=16):
    """Independent python re-statement of the published algorithm."""
    one = 1 << precision
    counts = np.zeros(len(pmf) + 1, dtype=np.uint64)
    for i, p in enumerate(pmf):
        p = float(p)
        if not (p > 0.0 and np.isfinite(p)):
            p = 0.0
        counts[i + 1] = int(round(p * one))
    total = int(counts.sum())
    assert total > 0
    cdf = [(one * int(c)) // total for c in counts]
    for i in range(1, len(cdf)):
        cdf[i] += cdf[i - 1]
    cdf[-1] = one
    n = len(pmf)
    for i in range(n):
        if cdf[i] == cdf[i + 1]:
            best_freq, best_steal = 1 << 62, -1
            for j in range(n):
                freq = cdf[j + 1] - cdf[j]
                if 1 < freq < best_freq:
                    best_freq, best_steal = freq, j
            assert best_steal >= 0
            if best_steal < i:
                for j in range(best_steal + 1, i + 1):
                    cdf[j] -= 1
            else:
                for j in range(i + 1, best_steal + 1):
                    cdf[j] += 1
    return np.asarray(cdf, dtype=np.uint32)


class TestAgainstIndependentReimplementation:
    @pytest.mark.parametrize("seed", range(8))
    def test_random_gaussian_pmfs(self, seed):
        r = np.random.default_rng(seed)
        scale = float(r.uniform(0.11, 30.0))
        n = int(r.integers(3, 120))
        xs = np.arange(n) - n // 2
        pmf = np.exp(-0.5 * (xs / scale) ** 2).astype(np.float32)
        pmf = pmf / pmf.sum() * (1 - 1e-6)
        pmf = np.concatenate([pmf, [1e-6]]).astype(np.float32)
        got = rans.pmf_to_quantized_cdf(pmf, precision=16)
        np.testing.assert_array_equal(got, ref_quantize(pmf))

    def test_many_zero_buckets(self):
        pmf = np.array([0.0, 0.5, 0.0, 0.5, 0.0, 1e-9], dtype=np.float32)
        got = rans.pmf_to_quantized_cdf(pmf)
        np.testing.assert_array_equal(got, ref_quantize(pmf))
        freqs = np.diff(got.astype(np.int64))
        assert (freqs > 0).all()
        assert got[-1] == 1 << 16


class TestHardcodedGoldenVectors:
    def test_simple_quarters(self):
        pmf = np.array([0.25, 0.5, 0.25], dtype=np.float32)
        got = rans.pmf_to_quantized_cdf(pmf, precision=16)
        np.testing.assert_array_equal(
            got, np.array([0, 16384, 49152, 65536], dtype=np.uint32))

    def test_zero_bucket_steal(self):
        # bucket 1 rounds to zero; one count is stolen from the smallest
        # bucket with freq > 1 (bucket 2, freq 3 at precision 3)
        pmf = np.array([0.5, 0.0, 0.375, 0.125], dtype=np.float32)
        got = rans.pmf_to_quantized_cdf(pmf, precision=3)
        np.testing.assert_array_equal(
            got, np.array([0, 4, 5, 7, 8], dtype=np.uint32))

    def test_uniform_with_tail(self):
        pmf = np.array([0.3333, 0.3333, 0.3333, 1e-4], dtype=np.float32)
        got = rans.pmf_to_quantized_cdf(pmf, precision=16)
        np.testing.assert_array_equal(got, ref_quantize(pmf))
        # pinned values (computed once; semantic change detector)
        np.testing.assert_array_equal(
            got, np.array([0, 21843, 43686, 65529, 65536], dtype=np.uint32))
