"""K-lane interleaved rANS: C++ encoder <-> device (XLA) decoder.

The profile exists so decode can run without host round trips
(entropy/device_decode.py); these tests pin the format three ways:
C++ encode -> C++ reference decode, C++ encode -> XLA decode (the
production pairing), and corruption/escape detection.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dcae_tpu.entropy import rans
from dcae_tpu.entropy.device_decode import (build_slot_tables,
                                            decode_interleaved)


@pytest.fixture(scope="module")
def tables():
    rng = np.random.default_rng(7)
    rows, maxlen = 9, 60
    cdfs = np.zeros((rows, maxlen + 2), np.int32)
    lengths = np.zeros(rows, np.int32)
    offsets = rng.integers(-25, 6, rows).astype(np.int32)
    for r in range(rows):
        n = int(rng.integers(3, maxlen))
        pmf = rng.uniform(0.001, 1, n).astype(np.float32)
        pmf /= pmf.sum() * 1.0005
        cdf = rans.pmf_to_quantized_cdf(
            np.concatenate([pmf, [1 - pmf.sum()]]))
        cdfs[r, :len(cdf)] = cdf
        lengths[r] = len(cdf)
    return cdfs, lengths, offsets


def _draw(tables, n, seed):
    cdfs, lengths, offsets = tables
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, cdfs.shape[0], n).astype(np.int32)
    val = (rng.random(n) * (lengths[idx] - 2)).astype(np.int32)
    return val + offsets[idx], idx


@pytest.mark.parametrize("n,K", [(50_000, 1024), (49_152, 512), (777, 16),
                                 (5, 8), (64, 64), (1, 1)])
def test_cpp_roundtrip(tables, n, K):
    cdfs, lengths, offsets = tables
    sym, idx = _draw(tables, n, seed=n)
    stream, states = rans.encode_interleaved(sym, idx, cdfs, lengths,
                                             offsets, K)
    out = rans.decode_interleaved_ref(stream, states, idx, cdfs, lengths,
                                      offsets, K)
    np.testing.assert_array_equal(out, sym)


@pytest.mark.parametrize("n,K", [(50_000, 1024), (777, 16), (64, 64)])
def test_device_decode_matches(tables, n, K):
    cdfs, lengths, offsets = tables
    sym, idx = _draw(tables, n, seed=100 + n)
    stream, states = rans.encode_interleaved(sym, idx, cdfs, lengths,
                                             offsets, K)
    lut_sym, lut_sf = build_slot_tables(cdfs, lengths, offsets)
    words = np.frombuffer(stream, np.uint16)
    out, ok = decode_interleaved(
        jnp.asarray(words), jnp.int32(len(words)), jnp.asarray(states),
        jnp.asarray(idx), jnp.asarray(lut_sym), jnp.asarray(lut_sf), K)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(out), sym)


def test_device_decode_padded_words(tables):
    """The word buffer may be padded past n_words (static-shape buckets)."""
    cdfs, lengths, offsets = tables
    sym, idx = _draw(tables, 10_000, seed=3)
    K = 256
    stream, states = rans.encode_interleaved(sym, idx, cdfs, lengths,
                                             offsets, K)
    lut_sym, lut_sf = build_slot_tables(cdfs, lengths, offsets)
    words = np.frombuffer(stream, np.uint16)
    padded = np.concatenate([words, np.zeros(1000, np.uint16)])
    out, ok = decode_interleaved(
        jnp.asarray(padded), jnp.int32(len(words)), jnp.asarray(states),
        jnp.asarray(idx), jnp.asarray(lut_sym), jnp.asarray(lut_sf), K)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(out), sym)


def test_checksum_flags_corruption(tables):
    cdfs, lengths, offsets = tables
    sym, idx = _draw(tables, 30_000, seed=4)
    K = 256
    stream, states = rans.encode_interleaved(sym, idx, cdfs, lengths,
                                             offsets, K)
    lut_sym, lut_sf = build_slot_tables(cdfs, lengths, offsets)
    words = np.frombuffer(stream, np.uint16).copy()
    words[50] ^= 0xFFFF
    _, ok = decode_interleaved(
        jnp.asarray(words), jnp.int32(len(words)), jnp.asarray(states),
        jnp.asarray(idx), jnp.asarray(lut_sym), jnp.asarray(lut_sf), K)
    assert not bool(ok)

    st2 = states.copy()
    st2[0] += 1
    words_ok = np.frombuffer(stream, np.uint16)
    _, ok = decode_interleaved(
        jnp.asarray(words_ok), jnp.int32(len(words_ok)), jnp.asarray(st2),
        jnp.asarray(idx), jnp.asarray(lut_sym), jnp.asarray(lut_sf), K)
    assert not bool(ok)


def test_escape_raises(tables):
    cdfs, lengths, offsets = tables
    sym, idx = _draw(tables, 1000, seed=5)
    sym[123] = 99_999
    with pytest.raises(rans.EscapeError):
        rans.encode_interleaved(sym, idx, cdfs, lengths, offsets, 64)


@pytest.mark.parametrize("K", [64, 1024])
def test_device_encode_adversarial_freqs(K):
    """The device encoder's f32-reciprocal division must be EXACT for
    every (state, freq) it can see — stress it with near-degenerate
    tables (freq 1 buckets next to a freq ~2^16 bucket drive the
    division through its extremes) and require bit-identical streams to
    the C++ encoder."""
    from dcae_tpu.entropy.device_decode import (build_enc_tables,
                                                encode_interleaved_device)

    rng = np.random.default_rng(11)
    rows = 6
    maxlen = 34
    cdfs = np.zeros((rows, maxlen + 2), np.int32)
    lengths = np.zeros(rows, np.int32)
    offsets = np.zeros(rows, np.int32)
    for r in range(rows):
        n = int(rng.integers(3, maxlen))
        # one dominant bucket, the rest width-1: freq in {1, 65536-n+1}
        counts = np.ones(n, np.int64)
        counts[int(rng.integers(0, n))] = (1 << 16) - n + 1
        cdf = np.concatenate([[0], np.cumsum(counts)])
        cdfs[r, :len(cdf)] = cdf
        lengths[r] = len(cdf)
    n_sym = 200_000
    idx = rng.integers(0, rows, n_sym).astype(np.int32)
    val = (rng.random(n_sym) * (lengths[idx] - 2)).astype(np.int32)
    sym = val + offsets[idx]
    stream, states = rans.encode_interleaved(sym, idx, cdfs, lengths,
                                             offsets, K)
    enc_sf, offs_i, maxpos, stride = build_enc_tables(cdfs, lengths,
                                                      offsets)
    buf, nw, st, esc = encode_interleaved_device(
        jnp.asarray(sym), jnp.asarray(idx), jnp.asarray(enc_sf),
        jnp.asarray(offs_i), jnp.asarray(maxpos), stride, K)
    assert not bool(esc)
    np.testing.assert_array_equal(np.asarray(st), states)
    dev_stream = np.asarray(buf)[:int(nw)][::-1].tobytes()
    assert dev_stream == stream


def test_size_overhead_is_states_only(tables):
    """Interleaving must not cost stream bytes beyond the K lane states."""
    cdfs, lengths, offsets = tables
    sym, idx = _draw(tables, 100_000, seed=6)
    classic = rans.encode_with_indexes(sym, idx, cdfs, lengths, offsets)
    stream, states = rans.encode_interleaved(sym, idx, cdfs, lengths,
                                             offsets, 1024)
    total = len(stream) + 4 * len(states)
    assert total <= len(classic) * 1.10  # ~4 KB states on ~60 KB payload


class TestCodecInterleavedProfile:
    """Full-codec round trip of the device-decodable profile."""

    @pytest.fixture(scope="class")
    def codec(self):
        import jax
        from dcae_tpu.config import DCAEConfig
        from dcae_tpu.models.codec import DCAECodec

        cfg = DCAEConfig.tiny()
        c = DCAECodec(cfg, seed=0)
        c.update(force=True)
        return c

    @pytest.fixture(scope="class")
    def image(self, codec):
        rng = np.random.default_rng(0)
        p = codec.cfg.pad_multiple
        return (rng.uniform(0, 1, (2, p, p, 3)) * 255).astype(np.uint8)

    def test_roundtrip_matches_classic(self, codec, image):
        classic_enc = codec.compress(image)
        classic = codec.decompress(classic_enc["strings"],
                                   classic_enc["shape"])
        enc = codec.compress_interleaved(image)
        dec = codec.decompress_interleaved(enc)
        assert bool(dec["ok"])
        np.testing.assert_array_equal(np.asarray(dec["x_hat"]),
                                      np.asarray(classic["x_hat"]))

    def test_corrupted_stream_flags_not_ok(self, codec, image):
        enc = codec.compress_interleaved(image)
        bad = dict(enc)
        s0 = bytearray(enc["istreams"][0])
        if len(s0) >= 2:
            s0[0] ^= 0xFF
        bad["istreams"] = [bytes(s0)] + list(enc["istreams"][1:])
        dec = codec.decompress_interleaved(bad)
        assert not bool(dec["ok"])

    def test_escape_symbols_ride_patches(self, codec, image, monkeypatch):
        """Out-of-table symbols (wild Gaussian-tail outliers the classic
        format bypass-codes) must NOT disqualify the profile: the stream
        carries them clamped and a patch list restores the exact value
        after device entropy decode — x_hat stays bit-identical to the
        classic path seeing the same spiked symbols.

        The spike goes in the LAST slice: these post-hoc host-side spikes
        never entered the device-computed y_hat context chain, so a spike
        in an earlier slice would desynchronize the decoder's recomputed
        indexes for the slices after it (in classic AND interleaved) — the
        last slice's y_hat feeds only synthesis. Real encoder escapes are
        in-chain by construction and need no such care."""
        orig = codec._fetch_encode_arrays

        def spiked(out):
            z_sym, y_sym, y_idx = orig(out)
            y_sym = np.array(y_sym)
            y_sym.reshape(y_sym.shape[0], -1)[-1, 0] = 10_000
            return z_sym, y_sym, y_idx

        monkeypatch.setattr(codec, "_fetch_encode_arrays", spiked)
        # split mode reaches the classic coder through the same (spiked)
        # _fetch_encode_arrays hand-off; staged mode fetches per slice and
        # would never see the spike
        classic_enc = codec.compress(image, mode="split")  # bypass-codes it
        classic = codec.decompress(classic_enc["strings"],
                                   classic_enc["shape"])
        enc = codec.compress_interleaved(image)
        assert sum(len(p[0]) for p in enc["patches"]) >= 1
        assert 10_000 in np.concatenate([p[1] for p in enc["patches"]])
        dec = codec.decompress_interleaved(enc)
        assert bool(dec["ok"])
        np.testing.assert_array_equal(np.asarray(dec["x_hat"]),
                                      np.asarray(classic["x_hat"]))

    def test_patch_overflow_raises_for_fallback(self, codec, image,
                                                monkeypatch):
        """More escapes than the patch budget must surface as EscapeError
        so callers fall back to classic compress."""
        orig = codec._fetch_encode_arrays

        def spiked(out):
            z_sym, y_sym, y_idx = orig(out)
            y_sym = np.array(y_sym)
            y_sym.reshape(y_sym.shape[0], -1)[-1, 0] = 10_000
            return z_sym, y_sym, y_idx

        monkeypatch.setattr(codec, "_fetch_encode_arrays", spiked)
        monkeypatch.setattr(codec, "patch_cap", 0)
        with pytest.raises(rans.EscapeError):
            codec.compress_interleaved(image)

    def test_device_encode_patches_and_clamping(self, codec, image,
                                                monkeypatch):
        """Force heavy clamping in the DEVICE encoder (narrowed in-range
        window) and require the patched round trip to still reproduce the
        undoctored classic reconstruction bitwise: clamping restricts
        which bucket a symbol may occupy, never its coded (start, freq),
        so the original decode tables read the stream fine and the patch
        scatter restores every true symbol."""
        import jax.numpy as jnp

        classic_enc = codec.compress(image)
        classic = codec.decompress(classic_enc["strings"],
                                   classic_enc["shape"])
        yd = codec.cfg.y_downsample
        n = (image.shape[0] * (image.shape[1] // yd)
             * (image.shape[2] // yd) * codec.cfg.slice_dim)
        orig = codec._enc_luts

        def narrowed():
            enc_sf, offs, mp, stride = orig()
            return enc_sf, offs, jnp.minimum(mp, 2), stride

        monkeypatch.setattr(codec, "_enc_luts", narrowed)
        monkeypatch.setattr(codec, "patch_cap", n)
        enc = codec.compress_device(image)
        assert sum(len(p[0]) for p in enc["patches"]) >= 1
        dec = codec.decompress_interleaved(enc)
        assert bool(dec["ok"])
        np.testing.assert_array_equal(np.asarray(dec["x_hat"]),
                                      np.asarray(classic["x_hat"]))

    def test_compress_device_matches_host_encode(self, codec, image):
        """The in-program device entropy encoder must emit bit-identical
        streams (and patch lists) to the host (C++) encoder,
        interchangeably decodable."""
        a = codec.compress_interleaved(image)
        b = codec.compress_device(image)
        assert a["istreams"] == b["istreams"]
        np.testing.assert_array_equal(a["states"], b["states"])
        assert a["z_strings"] == b["z_strings"]
        assert len(a["patches"]) == len(b["patches"])
        for (pa, va), (pb, vb) in zip(a["patches"], b["patches"]):
            np.testing.assert_array_equal(pa, pb)
            np.testing.assert_array_equal(va, vb)
        dec = codec.decompress_interleaved(b)
        assert bool(dec["ok"])

    def test_certified_bucket_sticky_and_growth(self, codec, image):
        """The certify-first encode seeds each batch's word bucket from
        the previous batch's fixed point (steady state = exactly one
        replay+re-encode pass) and must converge from a deliberately
        tiny seed via the growth loop — with identical streams and the
        same fixed-point bucket either way."""
        from dcae_tpu.models.codec import _len_bucket

        a = codec.compress_device(image)
        assert len(codec._il_bucket) == 1  # one (cap, lanes) in this class
        (key, fixed_bucket), = codec._il_bucket.items()
        assert a["bucket"] == fixed_bucket
        # poison the sticky seed: the smallest possible bucket
        codec._il_bucket[key] = _len_bucket(1, key[0])
        b = codec.compress_device(image)
        assert b["istreams"] == a["istreams"]
        np.testing.assert_array_equal(b["states"], a["states"])
        assert b["bucket"] == fixed_bucket
        assert codec._il_bucket[key] == fixed_bucket
        dec = codec.decompress_interleaved(b)
        assert bool(dec["ok"])

    def test_uncertified_env_path_matches(self, codec, image, monkeypatch):
        """DCAE_IL_CERTIFY=0 (single-program encoder, no replay) must
        emit the same streams on a single platform and still decode ok —
        it is the fallback when the replay cost is not wanted and the
        deployment is same-program (e.g. loopback)."""
        a = codec.compress_device(image)
        monkeypatch.setenv("DCAE_IL_CERTIFY", "0")
        b = codec.compress_device(image)
        assert b["istreams"] == a["istreams"]
        np.testing.assert_array_equal(b["states"], a["states"])
        assert b["z_strings"] == a["z_strings"]
        dec = codec.decompress_interleaved(b)
        assert bool(dec["ok"])

    def test_pipeline_matches_sequential(self, codec, image):
        seq_enc = codec.compress_interleaved(image)
        seq = codec.decompress_interleaved(seq_enc)
        outs = codec.encdec_pipeline_interleaved([image, image], inflight=2)
        assert len(outs) == 2
        for o in outs:
            assert bool(o["ok"])
            np.testing.assert_array_equal(np.asarray(o["x_hat"]),
                                          np.asarray(seq["x_hat"]))

    def test_pipeline_escape_falls_back_to_classic(self, codec, image,
                                                   monkeypatch):
        """A batch whose symbols escape the shipped tables must not kill
        the serving loop: that batch rides the classic bypass-coded path
        and every batch still returns a correct result in order."""
        seq = codec.decompress_interleaved(codec.compress_interleaved(image))
        orig = codec._compress_device_fetch
        calls = {"n": 0}

        def flaky(pend):
            calls["n"] += 1
            if calls["n"] == 2:  # second batch escapes
                raise rans.EscapeError("synthetic out-of-table symbol")
            return orig(pend)

        monkeypatch.setattr(codec, "_compress_device_fetch", flaky)
        outs = codec.encdec_pipeline_interleaved([image] * 3, inflight=2)
        assert [o["profile"] for o in outs] == [
            "interleaved", "classic", "interleaved"]
        for o in outs:
            assert bool(o["ok"])
            np.testing.assert_array_equal(np.asarray(o["x_hat"]),
                                          np.asarray(seq["x_hat"]))

    def test_pipeline_producer_failure_propagates(self, codec, image,
                                                  monkeypatch):
        def boom(*a, **k):
            raise RuntimeError("encode died")

        monkeypatch.setattr(codec, "_compress_device_dispatch", boom)
        with pytest.raises(RuntimeError, match="encode died"):
            codec.encdec_pipeline_interleaved([image] * 3)

    def test_bf16_config_roundtrip(self, image):
        """The deployment config (bf16 transform bodies) must round-trip:
        the profile's safety rests on the f32 entropy side + the lanes
        checksum, not on bf16 bit-stability."""
        from dcae_tpu.config import DCAEConfig
        from dcae_tpu.models.codec import DCAECodec

        cfg = DCAEConfig.tiny(compute_dtype="bfloat16")
        c = DCAECodec(cfg, seed=0)
        c.update(force=True)
        enc = c.compress_interleaved(image)
        dec = c.decompress_interleaved(enc)
        assert bool(dec["ok"])
        fwd = np.clip(np.asarray(c.forward(image)["x_hat"]), 0, 1)
        np.testing.assert_allclose(np.asarray(dec["x_hat"]), fwd, atol=2e-2)


@pytest.mark.parametrize("unroll", [2, 3, 8])
def test_unroll_identical(tables, unroll):
    cdfs, lengths, offsets = tables
    sym, idx = _draw(tables, 10_000, seed=42)
    K = 128
    stream, states = rans.encode_interleaved(sym, idx, cdfs, lengths,
                                             offsets, K)
    lut_sym, lut_sf = build_slot_tables(cdfs, lengths, offsets)
    words = np.frombuffer(stream, np.uint16)
    args = (jnp.asarray(words), jnp.int32(len(words)), jnp.asarray(states),
            jnp.asarray(idx), jnp.asarray(lut_sym), jnp.asarray(lut_sf), K)
    base, ok0 = decode_interleaved(*args)
    out, ok = decode_interleaved(*args, unroll)
    assert bool(ok0) and bool(ok)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(base))
    np.testing.assert_array_equal(np.asarray(base), sym)


@pytest.mark.parametrize("n,K,unroll", [(50_000, 1024, 1), (777, 16, 2),
                                        (64, 64, 4)])
def test_device_decode_paired_lut_matches(tables, n, K, unroll):
    """paired=True (one in-loop (df, pos) pair gather, no post-loop symbol
    gather — round-4 xprof item) decodes bit-identically to the classic
    two-table layout."""
    cdfs, lengths, offsets = tables
    sym, idx = _draw(tables, n, seed=500 + n)
    stream, states = rans.encode_interleaved(sym, idx, cdfs, lengths,
                                             offsets, K)
    row_offs, lut2 = build_slot_tables(cdfs, lengths, offsets, paired=True)
    assert lut2.shape == (cdfs.shape[0] * 65536, 2)
    words = np.frombuffer(stream, np.uint16)
    out, ok = decode_interleaved(
        jnp.asarray(words), jnp.int32(len(words)), jnp.asarray(states),
        jnp.asarray(idx), jnp.asarray(row_offs), jnp.asarray(lut2), K,
        unroll, True)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(out), sym)


def test_paired_flag_rides_dti1_container():
    from dcae_tpu.runtime import container

    enc = {"istreams": [b"ab"], "states": np.ones((1, 4), "<u4"),
           "patches": [(np.zeros(0, np.int32), np.zeros(0, np.int32))],
           "z_strings": [b"z"], "lanes": 4, "bucket": 123, "unroll": 2,
           "paired": True}
    blob = container.pack_bin_interleaved(enc, (100, 160))
    got, _, _ = container.unpack_bin_interleaved(blob)
    assert got["paired"] is True and got["unroll"] == 2 \
        and got["bucket"] == 123
    enc["paired"] = False
    got, _, _ = container.unpack_bin_interleaved(
        container.pack_bin_interleaved(enc, (100, 160)))
    assert got["paired"] is False and got["unroll"] == 2


class TestChainedLaneSet:
    """Round-5 chained format: ONE K-lane state set spans all slices
    (header 5x smaller — VERDICT r4 item 2). Pins the format four ways:
    C++ chained encode <-> C++ chained decode, device chained decode of
    the C++ streams, device chained ENCODE bit-identity with C++, and
    the end-of-chain base-state checksum."""

    @pytest.mark.parametrize("S,n,K", [(3, 4096, 64), (5, 2048, 16),
                                       (2, 1000, 128)])
    def test_chain_bit_identity(self, tables, S, n, K):
        from dcae_tpu.entropy.device_decode import (
            RANS_L16, build_enc_tables, decode_interleaved_chain,
            encode_slices_with_patches)

        cdfs, lengths, offsets = tables
        sym = np.stack([_draw(tables, n, seed=1000 + s * 7)[0]
                        for s in range(S)])
        idx = np.stack([_draw(tables, n, seed=1000 + s * 7)[1]
                        for s in range(S)])

        # C++ chained encode (reverse slice order, threaded states)
        streams, st = [None] * S, None
        for s in reversed(range(S)):
            streams[s], st = rans.encode_interleaved(
                sym[s], idx[s], cdfs, lengths, offsets, K, init_states=st)
        header = st.copy()

        # C++ chained decode threads the final states forward
        cur = header
        for s in range(S):
            out, cur = rans.decode_interleaved_ref(
                streams[s], cur, idx[s], cdfs, lengths, offsets, K,
                return_states=True)
            np.testing.assert_array_equal(out, sym[s])
        assert np.all(cur == RANS_L16)

        # device chained decode of the same streams
        lsym, lsf = build_slot_tables(cdfs, lengths, offsets, paired=True)
        cur = jnp.asarray(header)
        for s in range(S):
            w = np.frombuffer(streams[s], np.uint16)
            syms_d, ok, cur = decode_interleaved_chain(
                jnp.asarray(w), jnp.int32(len(w)), cur,
                jnp.asarray(idx[s]), jnp.asarray(lsym), jnp.asarray(lsf),
                K, 2, True)
            assert bool(ok)
            np.testing.assert_array_equal(np.asarray(syms_d), sym[s])
        assert np.all(np.asarray(cur) == RANS_L16)

        # device chained ENCODE is bit-identical to the C++ encoder
        enc_sf, offs_i, maxpos, stride = build_enc_tables(cdfs, lengths,
                                                          offsets)
        res = encode_slices_with_patches(
            jnp.asarray(sym), jnp.asarray(idx), jnp.asarray(enc_sf),
            jnp.asarray(offs_i), jnp.asarray(maxpos), stride, K, 2, 16,
            chain=True)
        assert not bool(res["escape"])
        np.testing.assert_array_equal(np.asarray(res["states"]), header)
        for s in range(S):
            nw = int(np.asarray(res["n_words"])[s])
            assert (np.asarray(res["words"])[s][:nw][::-1].tobytes()
                    == streams[s])

    def test_corruption_detected_at_chain_end(self, tables):
        from dcae_tpu.entropy.device_decode import (
            RANS_L16, build_slot_tables, decode_interleaved_chain)

        cdfs, lengths, offsets = tables
        S, n, K = 3, 2048, 32
        sym = np.stack([_draw(tables, n, seed=50 + s)[0] for s in range(S)])
        idx = np.stack([_draw(tables, n, seed=50 + s)[1] for s in range(S)])
        streams, st = [None] * S, None
        for s in reversed(range(S)):
            streams[s], st = rans.encode_interleaved(
                sym[s], idx[s], cdfs, lengths, offsets, K, init_states=st)
        # flip a byte in the middle slice's stream
        bad = bytearray(streams[1])
        bad[len(bad) // 2] ^= 0xFF
        streams[1] = bytes(bad)
        lsym, lsf = build_slot_tables(cdfs, lengths, offsets, paired=True)
        cur = jnp.asarray(st)
        ok_all = True
        for s in range(S):
            w = np.frombuffer(streams[s], np.uint16)
            _, ok, cur = decode_interleaved_chain(
                jnp.asarray(w), jnp.int32(len(w)), cur,
                jnp.asarray(idx[s]), jnp.asarray(lsym), jnp.asarray(lsf),
                K, 2, True)
            ok_all = ok_all and bool(ok)
        # either a stream under/overrun fired, or the end-of-chain base
        # check must catch the corruption
        assert not (ok_all and np.all(np.asarray(cur) == RANS_L16))
