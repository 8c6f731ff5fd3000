"""Container (.bin) and TCP transport tests — byte-level format checks."""

import os
import socket
import threading
import time

import numpy as np
import pytest

from dcae_tpu.runtime import container
from dcae_tpu.runtime.service import BitstreamServer, send_bytes


class TestBinContainer:
    def test_layout_exact_bytes(self):
        """Field-for-field layout parity with the reference container
        (>H h, >H w, >I len(y), y, >I len(z), z)."""
        y, z = b"yy-payload", b"z-data"
        blob = container.pack_bin([[y], [z]], (512, 768))
        assert blob[0:2] == (512).to_bytes(2, "big")
        assert blob[2:4] == (768).to_bytes(2, "big")
        assert blob[4:8] == len(y).to_bytes(4, "big")
        assert blob[8:8 + len(y)] == y
        off = 8 + len(y)
        assert blob[off:off + 4] == len(z).to_bytes(4, "big")
        assert blob[off + 4:] == z

    def test_round_trip_and_geometry(self, tmp_path):
        y = os.urandom(1000)
        z = os.urandom(64)
        path = str(tmp_path / "img.bin")
        container.save_bin(path, [[y], [z]], (500, 750))
        strings, z_shape, padding, size = container.read_bin(path)
        assert strings == [[y], [z]]
        assert size == (500, 750)
        # pad 500x750 -> 512x768; z = /64
        assert z_shape == (512 // 64, 768 // 64)
        l, r, t, b = padding
        assert (t + 500 + b, l + 750 + r) == (512, 768)

    def test_padding_identity_when_aligned(self):
        _, padding = container.calculate_padding(512, 768)[0], \
            container.calculate_padding(512, 768)[1]
        assert padding == (0, 0, 0, 0)


class TestTcpService:
    def test_send_receive_round_trip(self, tmp_path):
        received = {}
        done = threading.Event()

        def on_payload(name, data):
            received[name] = data
            done.set()

        server = BitstreamServer(0, str(tmp_path), on_payload)
        server.start(background=True)
        time.sleep(0.1)
        port = server.bound_port

        payload = os.urandom(300_000)  # force chunked receive
        send_bytes("kodim01.bin", payload, "localhost", port)
        assert done.wait(timeout=10)
        server.stop()

        assert received["kodim01.bin"] == payload
        on_disk = tmp_path / "received_kodim01.bin"
        assert on_disk.read_bytes() == payload


def test_interleaved_container_roundtrip():
    """DTI1 pack/unpack preserves streams, states, lanes, and geometry."""
    import numpy as np
    from dcae_tpu.runtime import container

    rng = np.random.default_rng(0)
    streams = [rng.bytes(2 * int(n)) for n in rng.integers(5, 60, 5)]
    states = rng.integers(1 << 16, 1 << 32, (5, 64), dtype=np.uint64
                          ).astype(np.uint32)
    patches = [(np.empty(0, np.int32), np.empty(0, np.int32))] * 4 + [
        (np.array([7, 191], np.int32), np.array([-300, 10_000], np.int32))]
    enc = {"istreams": streams, "states": states, "lanes": 64,
           "patches": patches, "bucket": 4096, "unroll": 2,
           "z_strings": [rng.bytes(33)], "shape": (2, 3)}
    data = container.pack_bin_interleaved(enc, (80, 100))
    assert container.is_interleaved_bin(data)
    assert not container.is_interleaved_bin(b"\x00\x01classic")
    dec, padding, (h, w) = container.unpack_bin_interleaved(data, p=128,
                                                            z_downsample=64)
    assert (h, w) == (80, 100)
    assert dec["lanes"] == 64
    assert dec["istreams"] == streams
    assert dec["z_strings"] == [enc["z_strings"][0]]
    np.testing.assert_array_equal(dec["states"], states)
    assert dec["shape"] == (128 // 64, 128 // 64)
    assert dec["bucket"] == 4096
    assert dec["unroll"] == 2  # certified decode-loop unroll rides along
    for (pa, va), (pb, vb) in zip(dec["patches"], patches):
        np.testing.assert_array_equal(pa, pb)
        np.testing.assert_array_equal(va, vb)
    # an enc without patches/bucket/unroll keys (host-encoded streams)
    # packs as zero patches / bucket 0 / unroll 0 and unpacks to the same
    enc2 = dict(enc)
    del enc2["patches"]
    del enc2["bucket"]
    del enc2["unroll"]
    dec2, _, _ = container.unpack_bin_interleaved(
        container.pack_bin_interleaved(enc2, (80, 100)))
    assert all(len(p) == 0 and len(v) == 0 for p, v in dec2["patches"])
    assert dec2["bucket"] == 0
    assert dec2["unroll"] == 0
    # field-range guard: bucket must fit 24 bits, unroll 8
    enc3 = dict(enc)
    enc3["bucket"] = 1 << 24
    try:
        container.pack_bin_interleaved(enc3, (80, 100))
        raise AssertionError("expected ValueError for oversized bucket")
    except ValueError:
        pass


def test_chained_container_dti2_roundtrip():
    """DTI2 (round 5): chained layout stores the lane-state header ONCE
    for the whole slice chain; DTI1 (per-slice states) stays readable."""
    import numpy as np
    from dcae_tpu.runtime import container

    rng = np.random.default_rng(1)
    streams = [rng.bytes(2 * int(n)) for n in rng.integers(5, 60, 5)]
    states = rng.integers(1 << 16, 1 << 32, (64,), dtype=np.uint64
                          ).astype(np.uint32)
    patches = [(np.empty(0, np.int32), np.empty(0, np.int32))] * 5
    enc = {"istreams": streams, "states": states, "lanes": 64,
           "patches": patches, "bucket": 2048, "unroll": 2,
           "paired": True, "chained": True,
           "z_strings": [rng.bytes(21)], "shape": (2, 3)}
    data = container.pack_bin_interleaved(enc, (80, 100))
    assert data[:4] == b"DTI2"
    assert container.is_interleaved_bin(data)
    # DTI2 header cost = 4*lanes bytes TOTAL (not per slice)
    data_unchained = container.pack_bin_interleaved(
        {**enc, "chained": False,
         "states": np.tile(states, (5, 1))}, (80, 100))
    assert len(data_unchained) - len(data) == 4 * 64 * 4
    dec, _, (h, w) = container.unpack_bin_interleaved(data)
    assert (h, w) == (80, 100)
    assert dec["chained"] is True
    assert dec["states"].shape == (64,)
    np.testing.assert_array_equal(dec["states"], states)
    assert dec["istreams"] == streams
    assert dec["bucket"] == 2048 and dec["unroll"] == 2 and dec["paired"]
    # legacy DTI1 blobs still parse (chained=False, (S, K) states)
    dec1, _, _ = container.unpack_bin_interleaved(data_unchained)
    assert dec1["chained"] is False
    assert dec1["states"].shape == (5, 64)
