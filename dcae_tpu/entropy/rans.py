"""Python bindings for the native rANS entropy coder.

The reference relies on an external C++ range coder reached through Python-list
marshalling (`encode_with_indexes(symbols_list, indexes_list, ...)` with
``.tolist()`` conversions at /root/reference/models/dcae.py:742-743,755 — a
known CPU bottleneck). Here the coder is an in-repo C++ library
(dcae_tpu/native/rans.cpp) driven through ctypes on contiguous numpy int32
arrays: zero marshalling, and the GIL is released for the duration of each
call so multiple streams can be coded from a thread pool.

Public API:
  - RansEncoder().encode_with_indexes(symbols, indexes, cdfs, cdf_lengths,
    offsets) -> bytes
  - RansDecoder().set_stream(bytes); .decode_stream(indexes, cdfs,
    cdf_lengths, offsets) -> np.ndarray
  - decode_with_indexes(...) one-shot
  - pmf_to_quantized_cdf(pmf, precision=16) -> np.ndarray[int32]
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_NATIVE_DIR = os.path.join(os.path.dirname(_HERE), "native")
_SRC = os.path.join(_NATIVE_DIR, "rans.cpp")
_LIB_PATH = os.path.join(_NATIVE_DIR, "librans.so")

_build_lock = threading.Lock()
_lib = None


def _build_library() -> None:
    cxx = os.environ.get("CXX", "g++")
    cmd = [
        cxx, "-O3", "-std=c++17", "-fPIC", "-shared",
        "-o", _LIB_PATH, _SRC,
    ]
    subprocess.run(cmd, check=True, cwd=_NATIVE_DIR, capture_output=True)


def _load() -> ctypes.CDLL:
    """Load (building if needed) the native library."""
    global _lib
    if _lib is not None:
        return _lib
    with _build_lock:
        if _lib is not None:
            return _lib
        needs_build = (not os.path.exists(_LIB_PATH)) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
        )
        if needs_build:
            _build_library()
        lib = ctypes.CDLL(_LIB_PATH)

        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        u32p = ctypes.POINTER(ctypes.c_uint32)

        lib.dcae_rans_encode_with_indexes.restype = ctypes.c_int64
        lib.dcae_rans_encode_with_indexes.argtypes = [
            i32p, i32p, ctypes.c_int64,
            i32p, ctypes.c_int64, ctypes.c_int64,
            i32p, i32p, u8p, ctypes.c_int64,
        ]
        lib.dcae_rans_dec_new.restype = ctypes.c_void_p
        lib.dcae_rans_dec_new.argtypes = [u8p, ctypes.c_int64]
        lib.dcae_rans_dec_free.restype = None
        lib.dcae_rans_dec_free.argtypes = [ctypes.c_void_p]
        lib.dcae_rans_dec_decode.restype = ctypes.c_int32
        lib.dcae_rans_dec_decode.argtypes = [
            ctypes.c_void_p, i32p, ctypes.c_int64,
            i32p, ctypes.c_int64, ctypes.c_int64,
            i32p, i32p, i32p,
        ]
        lib.dcae_rans_decode_with_indexes.restype = ctypes.c_int32
        lib.dcae_rans_decode_with_indexes.argtypes = [
            u8p, ctypes.c_int64, i32p, ctypes.c_int64,
            i32p, ctypes.c_int64, ctypes.c_int64,
            i32p, i32p, i32p,
        ]
        lib.dcae_pmf_to_quantized_cdf.restype = ctypes.c_int32
        lib.dcae_pmf_to_quantized_cdf.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_int32, u32p,
        ]
        u64p = ctypes.POINTER(ctypes.c_uint64)
        lib.dcae_rans_build_lut.restype = ctypes.c_int32
        lib.dcae_rans_build_lut.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int64, i32p, u64p,
        ]
        lib.dcae_rans_dec_decode_lut.restype = ctypes.c_int32
        lib.dcae_rans_dec_decode_lut.argtypes = [
            ctypes.c_void_p, i32p, ctypes.c_int64,
            i32p, ctypes.c_int64, ctypes.c_int64,
            i32p, i32p, u64p, i32p,
        ]
        u16p = ctypes.POINTER(ctypes.c_uint16)
        lib.dcae_rans_encode_interleaved.restype = ctypes.c_int64
        lib.dcae_rans_encode_interleaved.argtypes = [
            i32p, i32p, ctypes.c_int64,
            i32p, ctypes.c_int64, ctypes.c_int64,
            i32p, i32p, ctypes.c_int32,
            u16p, ctypes.c_int64, u32p, u32p,
        ]
        lib.dcae_rans_decode_interleaved.restype = ctypes.c_int32
        lib.dcae_rans_decode_interleaved.argtypes = [
            u16p, ctypes.c_int64, u32p, i32p, ctypes.c_int64,
            i32p, ctypes.c_int64, ctypes.c_int64,
            i32p, i32p, ctypes.c_int32, i32p, u32p, ctypes.c_int32,
        ]
        _lib = lib
        return _lib


def _as_i32(a) -> np.ndarray:
    arr = np.ascontiguousarray(np.asarray(a).reshape(-1), dtype=np.int32)
    return arr


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _check_tables(cdfs, cdf_lengths, offsets):
    cdfs = np.ascontiguousarray(np.asarray(cdfs), dtype=np.int32)
    if cdfs.ndim != 2:
        raise ValueError("cdfs must be 2D [rows, stride]")
    cdf_lengths = _as_i32(cdf_lengths)
    offsets = _as_i32(offsets)
    if len(cdf_lengths) != cdfs.shape[0] or len(offsets) != cdfs.shape[0]:
        raise ValueError("cdf_lengths/offsets must match cdfs rows")
    return cdfs, cdf_lengths, offsets


def encode_with_indexes(symbols, indexes, cdfs, cdf_lengths, offsets) -> bytes:
    """Encode integer symbols into a single rANS stream."""
    lib = _load()
    symbols = _as_i32(symbols)
    indexes = _as_i32(indexes)
    if symbols.shape != indexes.shape:
        raise ValueError("symbols and indexes must have equal length")
    cdfs, cdf_lengths, offsets = _check_tables(cdfs, cdf_lengths, offsets)
    n = symbols.size
    # worst case: every symbol escapes with ~10 bypass chunks -> 1 word each,
    # plus slack; grow-and-retry keeps this robust.
    capacity = 16 * n + 64
    while True:
        out = np.empty(capacity, dtype=np.uint8)
        written = lib.dcae_rans_encode_with_indexes(
            _i32p(symbols), _i32p(indexes), n,
            _i32p(cdfs), cdfs.shape[0], cdfs.shape[1],
            _i32p(cdf_lengths), _i32p(offsets),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), capacity,
        )
        if written == -1:
            capacity *= 2
            continue
        if written < 0:
            raise ValueError(f"rANS encode failed (rc={written})")
        return out[:written].tobytes()


def decode_with_indexes(stream: bytes, indexes, cdfs, cdf_lengths,
                        offsets, lut: np.ndarray | None = None) -> np.ndarray:
    """One-shot decode of `len(indexes)` symbols from `stream`."""
    if lut is not None:
        dec = RansDecoder()
        dec.set_stream(stream)
        try:
            return dec.decode_stream(indexes, cdfs, cdf_lengths, offsets,
                                     lut=lut)
        finally:
            dec.close()
    lib = _load()
    indexes = _as_i32(indexes)
    cdfs, cdf_lengths, offsets = _check_tables(cdfs, cdf_lengths, offsets)
    buf = np.frombuffer(stream, dtype=np.uint8)
    out = np.empty(indexes.size, dtype=np.int32)
    rc = lib.dcae_rans_decode_with_indexes(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.size,
        _i32p(indexes), indexes.size,
        _i32p(cdfs), cdfs.shape[0], cdfs.shape[1],
        _i32p(cdf_lengths), _i32p(offsets), _i32p(out),
    )
    if rc != 0:
        raise ValueError(f"rANS decode failed (rc={rc})")
    return out


PRECISION_SLOTS = 1 << 16


def build_decode_lut(cdfs, cdf_lengths) -> np.ndarray:
    """Tabulate find_symbol: (rows, 2^16) uint64 table whose entries fuse
    (symbol | start << 16 | freq << 32), so decode is ONE dependent load
    per symbol. A pure function of the quantized CDFs — build once per
    table bake (the 64-row Gaussian bank costs 32 MB)."""
    lib = _load()
    cdfs = np.ascontiguousarray(np.asarray(cdfs), dtype=np.int32)
    cdf_lengths = _as_i32(cdf_lengths)
    lut = np.empty((cdfs.shape[0], PRECISION_SLOTS), dtype=np.uint64)
    rc = lib.dcae_rans_build_lut(
        _i32p(cdfs), cdfs.shape[0], cdfs.shape[1], _i32p(cdf_lengths),
        lut.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    if rc != 0:
        raise ValueError(f"rANS LUT build failed (rc={rc})")
    return lut


class RansEncoder:
    """Buffered encoder: accumulate (symbols, indexes) then flush to bytes.

    Mirrors the reference coder's buffered API so all channel-AR slices of an
    image share one stream (/root/reference/models/dcae.py:722-756).
    """

    def __init__(self):
        self._symbols = []
        self._indexes = []
        self._tables = None

    def encode_with_indexes(self, symbols, indexes, cdfs, cdf_lengths,
                            offsets) -> None:
        self._symbols.append(_as_i32(symbols))
        self._indexes.append(_as_i32(indexes))
        self._tables = (cdfs, cdf_lengths, offsets)

    def flush(self) -> bytes:
        if self._tables is None:
            return b""
        symbols = np.concatenate(self._symbols) if self._symbols else np.empty(0, np.int32)
        indexes = np.concatenate(self._indexes) if self._indexes else np.empty(0, np.int32)
        cdfs, cdf_lengths, offsets = self._tables
        out = encode_with_indexes(symbols, indexes, cdfs, cdf_lengths, offsets)
        self._symbols, self._indexes, self._tables = [], [], None
        return out


class RansDecoder:
    """Streaming decoder; decode_stream may be called repeatedly, state
    persists across calls (needed by the sequential slice loop)."""

    def __init__(self):
        self._handle = None
        self._lib = _load()

    def set_stream(self, stream: bytes) -> None:
        self.close()
        buf = np.frombuffer(stream, dtype=np.uint8)
        self._buf = buf  # keep alive
        handle = self._lib.dcae_rans_dec_new(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.size)
        if not handle:
            raise ValueError("invalid rANS stream")
        self._handle = handle

    def decode_stream(self, indexes, cdfs, cdf_lengths, offsets,
                      lut: np.ndarray | None = None) -> np.ndarray:
        """lut: optional build_decode_lut(cdfs, cdf_lengths) table — same
        output, ~2-3x faster symbol search (see tests/test_rans.py
        microbench)."""
        if self._handle is None:
            raise RuntimeError("set_stream must be called first")
        indexes = _as_i32(indexes)
        cdfs, cdf_lengths, offsets = _check_tables(cdfs, cdf_lengths, offsets)
        out = np.empty(indexes.size, dtype=np.int32)
        if lut is not None:
            if lut.dtype != np.uint64 or lut.shape != (cdfs.shape[0],
                                                       PRECISION_SLOTS):
                raise ValueError("bad LUT shape/dtype")
            rc = self._lib.dcae_rans_dec_decode_lut(
                self._handle, _i32p(indexes), indexes.size,
                _i32p(cdfs), cdfs.shape[0], cdfs.shape[1],
                _i32p(cdf_lengths), _i32p(offsets),
                lut.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
                _i32p(out),
            )
        else:
            rc = self._lib.dcae_rans_dec_decode(
                self._handle, _i32p(indexes), indexes.size,
                _i32p(cdfs), cdfs.shape[0], cdfs.shape[1],
                _i32p(cdf_lengths), _i32p(offsets), _i32p(out),
            )
        if rc != 0:
            raise ValueError(f"rANS decode failed (rc={rc})")
        return out

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.dcae_rans_dec_free(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def pmf_to_quantized_cdf(pmf, precision: int = 16) -> np.ndarray:
    """Exact integer PMF->CDF quantization.

    `pmf` must include the tail mass as its final entry (the escape bucket);
    the returned CDF has len(pmf)+1 entries with cdf[-1] == 2**precision.
    """
    lib = _load()
    pmf = np.ascontiguousarray(np.asarray(pmf).reshape(-1), dtype=np.float32)
    out = np.empty(pmf.size + 1, dtype=np.uint32)
    rc = lib.dcae_pmf_to_quantized_cdf(
        pmf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), pmf.size,
        precision, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
    )
    if rc != 0:
        raise ValueError(f"pmf_to_quantized_cdf failed (rc={rc})")
    return out.astype(np.int32)


class EscapeError(ValueError):
    """An interleaved-profile encode met a symbol outside its CDF row's
    in-range buckets (the device decoder has no bypass path). Callers fall
    back to the classic host-decoded stream format."""


def encode_interleaved(symbols, indexes, cdfs, cdf_lengths, offsets,
                       lanes: int, init_states=None
                       ) -> tuple[bytes, np.ndarray]:
    """K-lane interleaved rANS encode (device-decodable profile).

    uint32 lane states, 16-bit renorm words, strict round-robin symbol
    order, ONE shared word stream. Returns (stream_bytes, states_u32[K]);
    states are the decode-START states. Raises EscapeError when a symbol
    falls outside its row's in-range buckets (caller falls back to the
    classic format). See native/rans.cpp dcae_rans_encode_interleaved and
    dcae_tpu/entropy/device_decode.py for the decoder.

    init_states (K,) uint32: start the lanes from these states instead of
    the 2^16 base — the CHAINED format encodes slice s+1 first and feeds
    its final states here when encoding slice s (one lane set spans all
    slices; header 5x smaller)."""
    lib = _load()
    symbols = _as_i32(symbols)
    indexes = _as_i32(indexes)
    if symbols.shape != indexes.shape:
        raise ValueError("symbols and indexes must have equal length")
    cdfs, cdf_lengths, offsets = _check_tables(cdfs, cdf_lengths, offsets)
    n = symbols.size
    states = np.empty(lanes, dtype=np.uint32)
    capacity = 2 * n + lanes + 64  # words; <=1 renorm word per symbol
    out = np.empty(capacity, dtype=np.uint16)
    init_p = None
    if init_states is not None:
        init_states = np.ascontiguousarray(np.asarray(init_states),
                                           dtype=np.uint32)
        if init_states.size != lanes:
            raise ValueError("init_states must have `lanes` entries")
        init_p = init_states.ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint32))
    written = lib.dcae_rans_encode_interleaved(
        _i32p(symbols), _i32p(indexes), n,
        _i32p(cdfs), cdfs.shape[0], cdfs.shape[1],
        _i32p(cdf_lengths), _i32p(offsets), lanes,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), capacity,
        states.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), init_p,
    )
    if written == -3:
        raise EscapeError("symbol outside in-range CDF buckets")
    if written < 0:
        raise ValueError(f"interleaved rANS encode failed (rc={written})")
    return out[:written].tobytes(), states


def decode_interleaved_ref(stream: bytes, states, indexes, cdfs,
                           cdf_lengths, offsets, lanes: int,
                           return_states: bool = False):
    """C++ reference decoder for the interleaved profile (tests + host
    fallback); the production decoder runs on-device
    (entropy/device_decode.py).

    return_states=True: decode an INTERMEDIATE slice of the chained
    format — skip the base-state checksum (it applies only after the
    chain's last slice) and return (symbols, final_states) so the caller
    threads the states into the next slice."""
    lib = _load()
    indexes = _as_i32(indexes)
    cdfs, cdf_lengths, offsets = _check_tables(cdfs, cdf_lengths, offsets)
    words = np.frombuffer(stream, dtype=np.uint16)
    words = np.ascontiguousarray(words)
    states = np.ascontiguousarray(np.asarray(states), dtype=np.uint32)
    if states.size != lanes:
        raise ValueError("states must have `lanes` entries")
    out = np.empty(indexes.size, dtype=np.int32)
    fin = np.empty(lanes, dtype=np.uint32)
    rc = lib.dcae_rans_decode_interleaved(
        words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), words.size,
        states.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        _i32p(indexes), indexes.size,
        _i32p(cdfs), cdfs.shape[0], cdfs.shape[1],
        _i32p(cdf_lengths), _i32p(offsets), lanes, _i32p(out),
        fin.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        0 if return_states else 1,
    )
    if rc != 0:
        raise ValueError(f"interleaved rANS decode failed (rc={rc})")
    if return_states:
        return out, fin
    return out
