"""Round-trip and property tests for the native rANS coder.

The reference treats the range coder as an external black box; its real
correctness bar is "encoded-on-one-device bitstream decodes bit-exactly on
another" (SURVEY.md §4). Here we pin that down with explicit tests: exact
round-trips (incl. escape/bypass symbols), stream determinism, streaming
(multi-call) decode, and integer CDF construction invariants.
"""

import os

import numpy as np
import pytest

from dcae_tpu.entropy import rans


def make_gaussian_cdfs(n_rows=8, max_len=24, seed=0):
    """Build a bank of quantized CDFs from random discretized Gaussians."""
    rng = np.random.default_rng(seed)
    cdfs = np.zeros((n_rows, max_len + 2), dtype=np.int32)
    lengths = np.zeros(n_rows, dtype=np.int32)
    offsets = np.zeros(n_rows, dtype=np.int32)
    for i in range(n_rows):
        L = int(rng.integers(3, max_len))
        scale = float(rng.uniform(0.3, 8.0))
        xs = np.arange(L) - L // 2
        pmf = np.exp(-0.5 * (xs / scale) ** 2)
        pmf = pmf / pmf.sum() * (1 - 1e-6)
        tail = 1e-6
        cdf = rans.pmf_to_quantized_cdf(
            np.concatenate([pmf, [tail]]).astype(np.float32))
        cdfs[i, : len(cdf)] = cdf
        lengths[i] = len(cdf)          # pmf_length + 2
        offsets[i] = -(L // 2)
    return cdfs, lengths, offsets


class TestPmfToQuantizedCdf:
    def test_basic_invariants(self):
        pmf = np.array([0.25, 0.5, 0.2, 0.05], dtype=np.float32)
        cdf = rans.pmf_to_quantized_cdf(pmf, precision=16)
        assert cdf[0] == 0
        assert cdf[-1] == 1 << 16
        assert np.all(np.diff(cdf) >= 1), "every bucket must be codable"

    def test_zero_bucket_fix(self):
        # a zero-probability bucket must still get frequency >= 1
        pmf = np.array([0.5, 0.0, 0.5, 1e-9], dtype=np.float32)
        cdf = rans.pmf_to_quantized_cdf(pmf)
        assert np.all(np.diff(cdf) >= 1)
        assert cdf[-1] == 1 << 16

    def test_tiny_tail(self):
        pmf = np.full(65, 1.0 / 65, dtype=np.float32)
        cdf = rans.pmf_to_quantized_cdf(pmf)
        assert len(cdf) == 66
        assert np.all(np.diff(cdf) >= 1)

    def test_proportionality(self):
        pmf = np.array([0.75, 0.25], dtype=np.float32)
        cdf = rans.pmf_to_quantized_cdf(pmf)
        freqs = np.diff(cdf)
        assert abs(freqs[0] / (1 << 16) - 0.75) < 0.01


class TestRansRoundTrip:
    @pytest.mark.parametrize("n", [1, 7, 1000, 50_000])
    def test_in_range_symbols(self, n):
        cdfs, lengths, offsets = make_gaussian_cdfs()
        rng = np.random.default_rng(n)
        indexes = rng.integers(0, cdfs.shape[0], size=n).astype(np.int32)
        # symbols within each row's valid (non-escape) range
        max_vals = lengths[indexes] - 2
        symbols = (rng.integers(0, 1 << 16, size=n) % max_vals).astype(
            np.int32) + offsets[indexes]
        stream = rans.encode_with_indexes(symbols, indexes, cdfs, lengths,
                                          offsets)
        decoded = rans.decode_with_indexes(stream, indexes, cdfs, lengths,
                                           offsets)
        np.testing.assert_array_equal(decoded, symbols)

    def test_escape_symbols(self):
        """Out-of-range symbols must survive via bypass coding."""
        cdfs, lengths, offsets = make_gaussian_cdfs()
        indexes = np.zeros(64, dtype=np.int32)
        # mix of wildly out-of-range values, both signs
        symbols = np.array(
            [0, -1, 1, -500, 500, 12345, -12345, 2**20, -(2**20)] * 7 + [3],
            dtype=np.int32)
        stream = rans.encode_with_indexes(symbols, indexes, cdfs, lengths,
                                          offsets)
        decoded = rans.decode_with_indexes(stream, indexes, cdfs, lengths,
                                           offsets)
        np.testing.assert_array_equal(decoded, symbols)

    def test_deterministic_stream(self):
        cdfs, lengths, offsets = make_gaussian_cdfs()
        rng = np.random.default_rng(3)
        indexes = rng.integers(0, 8, size=512).astype(np.int32)
        symbols = rng.integers(-10, 10, size=512).astype(np.int32)
        s1 = rans.encode_with_indexes(symbols, indexes, cdfs, lengths, offsets)
        s2 = rans.encode_with_indexes(symbols, indexes, cdfs, lengths, offsets)
        assert s1 == s2

    def test_compression_beats_raw(self):
        """Low-entropy data should compress well below 16 bits/symbol."""
        cdfs, lengths, offsets = make_gaussian_cdfs(n_rows=1, max_len=16)
        n = 10_000
        rng = np.random.default_rng(0)
        # concentrated near the mode of row 0
        center = -offsets[0]
        symbols = (np.clip(rng.normal(0, 0.7, n), -2, 2).round()
                   .astype(np.int32))
        indexes = np.zeros(n, dtype=np.int32)
        stream = rans.encode_with_indexes(symbols, indexes, cdfs, lengths,
                                          offsets)
        bits_per_symbol = len(stream) * 8 / n
        assert bits_per_symbol < 4.0
        decoded = rans.decode_with_indexes(stream, indexes, cdfs, lengths,
                                           offsets)
        np.testing.assert_array_equal(decoded, symbols)
        del center


class TestStreamingDecoder:
    def test_multi_call_decode(self):
        """Decoding in chunks (the per-slice pattern) must equal one-shot."""
        cdfs, lengths, offsets = make_gaussian_cdfs()
        rng = np.random.default_rng(7)
        n = 5 * 321
        indexes = rng.integers(0, 8, size=n).astype(np.int32)
        symbols = rng.integers(-8, 8, size=n).astype(np.int32)
        stream = rans.encode_with_indexes(symbols, indexes, cdfs, lengths,
                                          offsets)

        dec = rans.RansDecoder()
        dec.set_stream(stream)
        chunks = []
        for k in range(5):
            sl = slice(k * 321, (k + 1) * 321)
            chunks.append(dec.decode_stream(indexes[sl], cdfs, lengths,
                                            offsets))
        np.testing.assert_array_equal(np.concatenate(chunks), symbols)

    def test_buffered_encoder_matches_oneshot(self):
        cdfs, lengths, offsets = make_gaussian_cdfs()
        rng = np.random.default_rng(9)
        enc = rans.RansEncoder()
        all_syms, all_idx = [], []
        for _ in range(5):
            idx = rng.integers(0, 8, size=100).astype(np.int32)
            sym = rng.integers(-5, 5, size=100).astype(np.int32)
            enc.encode_with_indexes(sym, idx, cdfs, lengths, offsets)
            all_syms.append(sym)
            all_idx.append(idx)
        buffered = enc.flush()
        oneshot = rans.encode_with_indexes(
            np.concatenate(all_syms), np.concatenate(all_idx), cdfs, lengths,
            offsets)
        assert buffered == oneshot

    def test_empty_flush(self):
        assert rans.RansEncoder().flush() == b""


class TestLutDecode:
    def test_lut_matches_binary_search(self):
        """LUT decode is find_symbol tabulated: identical output on the
        same streams (incl. escape symbols)."""
        cdfs, lengths, offsets = make_gaussian_cdfs(n_rows=12)
        lut = rans.build_decode_lut(cdfs, lengths)
        assert lut.shape == (12, 1 << 16) and lut.dtype == np.uint64
        rng = np.random.default_rng(21)
        n = 4096
        indexes = rng.integers(0, 12, size=n).astype(np.int32)
        symbols = rng.integers(-40, 40, size=n).astype(np.int32)  # escapes too
        stream = rans.encode_with_indexes(symbols, indexes, cdfs, lengths,
                                          offsets)
        plain = rans.decode_with_indexes(stream, indexes, cdfs, lengths,
                                         offsets)
        fast = rans.decode_with_indexes(stream, indexes, cdfs, lengths,
                                        offsets, lut=lut)
        np.testing.assert_array_equal(fast, plain)
        np.testing.assert_array_equal(fast, symbols)

    def test_lut_covers_every_slot(self):
        """Every 16-bit slot's fused entry carries the (symbol, start,
        freq) the binary search would find."""
        cdfs, lengths, offsets = make_gaussian_cdfs(n_rows=3, seed=4)
        lut = rans.build_decode_lut(cdfs, lengths)
        for r in range(3):
            row = cdfs[r, : lengths[r]]
            want = np.searchsorted(row, np.arange(1 << 16), side="right") - 1
            np.testing.assert_array_equal(lut[r] & 0xFFFF, want)
            np.testing.assert_array_equal((lut[r] >> 16) & 0xFFFF, row[want])
            np.testing.assert_array_equal((lut[r] >> 32) & 0xFFFF,
                                          row[want + 1] - row[want])

    def test_codec_tables_lazy_lut(self):
        from dcae_tpu.entropy.tables import build_gaussian_table

        t = build_gaussian_table()
        assert t._lut is None
        lut = t.lut
        assert lut.shape == (t.quantized_cdf.shape[0], 1 << 16)
        assert t.lut is lut  # cached

    def test_lut_speedup_microbench(self):
        """LUT and binary-search decodes must agree exactly; the speedup is
        printed for the record and only sanity-bounded (>1.05x over the
        best of 3), because this host's wall clock swings 2-20x under
        time-sharing (docs/PERF.md) and a tight ratio assert would flake.
        Recorded quiet-machine numbers: 2.5x (uint16 LUT, r3), 3.5x
        (fused uint64 LUT)."""
        import time

        from dcae_tpu.entropy.tables import build_gaussian_table

        t = build_gaussian_table()  # the real 64-row bank
        lut = t.lut
        rng = np.random.default_rng(5)
        n = 400_000
        indexes = rng.integers(40, 64, size=n).astype(np.int32)  # long rows
        symbols = rng.integers(-60, 60, size=n).astype(np.int32)
        stream = rans.encode_with_indexes(
            symbols, indexes, t.quantized_cdf, t.cdf_length, t.offset)

        def run(use_lut):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = rans.decode_with_indexes(
                    stream, indexes, t.quantized_cdf, t.cdf_length, t.offset,
                    lut=lut if use_lut else None)
                best = min(best, time.perf_counter() - t0)
            return best, out

        t_plain, out_plain = run(False)
        t_lut, out_lut = run(True)
        np.testing.assert_array_equal(out_lut, out_plain)
        msym_plain = n / t_plain / 1e6
        msym_lut = n / t_lut / 1e6
        print(f"decode: {msym_plain:.1f} -> {msym_lut:.1f} Msym/s "
              f"({t_plain / t_lut:.2f}x)")
        # Timing asserts are opt-in: the 32 MB LUT's advantage depends on
        # LLC residency, and a co-loaded host can push it below 1x
        # (observed 0.62x with another full-size model saturating the
        # machine). Exact agreement above is the always-on correctness
        # check; quiet-machine speed is asserted under DCAE_PERF_ASSERTS.
        if os.environ.get("DCAE_PERF_ASSERTS"):
            assert t_lut < t_plain / 1.05, (msym_plain, msym_lut)
