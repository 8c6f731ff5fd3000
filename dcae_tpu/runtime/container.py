""".bin bitstream container — byte-level parity with the reference.

Layout (/root/reference/compress_and_decompress.py:110-148):
    >H height | >H width | >I len(y_string) | y_string
    | >I len(z_string) | z_string
(h, w are the ORIGINAL unpadded image dims; the decoder recomputes the
pad-to-128 geometry and z_shape = padded/64.)
"""

from __future__ import annotations

import struct
from typing import List, Sequence, Tuple


def calculate_padding(h: int, w: int, p: int = 128):
    """(padded_size, (left, right, top, bottom)) — centered pad to multiple
    of p (ref compress_and_decompress.py:124-135)."""
    new_h = (h + p - 1) // p * p
    new_w = (w + p - 1) // p * p
    left = (new_w - w) // 2
    right = new_w - w - left
    top = (new_h - h) // 2
    bottom = new_h - h - top
    return (new_h, new_w), (left, right, top, bottom)


def pack_bin(strings: Sequence[Sequence[bytes]],
             size: Tuple[int, int]) -> bytes:
    """strings = [[y_string], [z_string]]; size = (h, w) unpadded."""
    y_string = strings[0][0]
    z_string = strings[1][0]
    out = struct.pack(">H", size[0])
    out += struct.pack(">H", size[1])
    out += struct.pack(">I", len(y_string))
    out += y_string
    out += struct.pack(">I", len(z_string))
    out += z_string
    return out


def unpack_bin(data: bytes, p: int = 128, z_downsample: int = 64):
    """-> (strings, z_shape, padding, (h, w)). z_downsample is the total
    x->z stride (cfg.z_downsample; 64 for the reference topology)."""
    h, w = struct.unpack(">HH", data[:4])
    off = 4
    (ylen,) = struct.unpack(">I", data[off: off + 4])
    off += 4
    y_string = data[off: off + ylen]
    off += ylen
    (zlen,) = struct.unpack(">I", data[off: off + 4])
    off += 4
    z_string = data[off: off + zlen]
    padded, padding = calculate_padding(h, w, p)
    z_shape = (padded[0] // z_downsample, padded[1] // z_downsample)
    return [[y_string], [z_string]], z_shape, padding, (h, w)


def save_bin(path: str, strings, size: Tuple[int, int]) -> None:
    with open(path, "wb") as f:
        f.write(pack_bin(strings, size))


def read_bin(path: str, p: int = 128, z_downsample: int = 64):
    with open(path, "rb") as f:
        return unpack_bin(f.read(), p, z_downsample)


# ---- v2: the interleaved (device-decode) profile -----------------------
#
# A DISTINCT magic-tagged container for the TPU-native stream format
# (entropy/device_decode.py): per-slice K-lane interleaved rANS y streams
# + their uint32 lane states, classic z stream. No reference analog — the
# classic .bin above keeps byte parity with the reference; this is the
# opt-in profile for decode-on-accelerator deployments.
#
# Layout:
#   b"DTI1" | >H h | >H w | >H lanes | >B n_slices | >I bucket |
#   per slice: >I len(stream) | stream | lanes*4 bytes of LE uint32 states
#              | >H n_patches | n_patches * (LE uint32 pos | LE int32 val)
#   | >I len(z_string) | z_string
#
# bucket is the certified word-buffer width of compress_device (0 = none,
# host-encoded stream): the decoder pads its per-slice word arrays to this
# width so it runs the exact executable the certification replayed
# (models/codec.py compress_device/_certify_encode). The field's top byte
# carries the certified decode-loop UNROLL in bits 24-30 (0 = unspecified,
# legacy containers / host-encoded streams) and the paired-slot-LUT flag
# in bit 31; the low 24 bits are the bucket itself.
#
# Format-history note (ADVICE r4): the unroll field was 8 bits (24-31)
# before the paired flag claimed bit 31. No writer ever emitted unroll
# outside {0, 1, 2, 4} (the certified values models/codec.py accepts are
# small powers of two; the packer has always defaulted to 1-4), so no
# pre-paired blob can have bit 31 set and the narrowing is
# backward-compatible in practice. To keep a corrupt/foreign blob from
# silently misparsing, the unpacker now REJECTS unroll values that no
# writer version ever produced (must be a power of two <= 64) with a
# format hint instead of handing the decoder a wrong executable shape.
#
# Patches are the (rare) Gaussian-tail symbols the stream carries clamped
# into their CDF row's in-range buckets; the decoder scatters the exact
# values back right after entropy decode (models/codec.py
# compress_interleaved / DCAE.decode_device_streams) — the classic format
# bypass-codes these instead (ref CompressAI RansEncoder bypass).

_MAGIC_V2 = b"DTI1"
# DTI2 (round 5): the CHAINED layout — ONE K-lane state set spans all
# slices (encoded in reverse slice order, decoded forward with threaded
# states), so the lane-state header is written ONCE after the bucket
# field instead of per slice (5x smaller; the interleaved profile's rate
# tax drops to ~2-3% at trained rates — VERDICT r4 item 2). Everything
# else (bucket/unroll/paired field, per-slice streams + patches, z)
# matches DTI1.
_MAGIC_V2_CHAIN = b"DTI2"


def pack_bin_interleaved(enc: dict, size: Tuple[int, int]) -> bytes:
    """enc: compress_interleaved output (batch 1); size = (h, w) unpadded.
    Chained enc dicts (states (K,), enc["chained"]) pack as DTI2; legacy
    per-slice state dicts pack as DTI1."""
    import numpy as np

    states = np.asarray(enc["states"], dtype="<u4")
    lanes = int(enc["lanes"])
    streams = enc["istreams"]
    chained = bool(enc.get("chained", states.ndim == 1))
    patches = enc.get("patches") or [
        (np.empty(0, np.int32),) * 2 for _ in streams]
    out = _MAGIC_V2_CHAIN if chained else _MAGIC_V2
    out += struct.pack(">HHHB", size[0], size[1], lanes, len(streams))
    bucket = int(enc.get("bucket") or 0)
    unroll = int(enc.get("unroll") or 0)
    # top byte = unroll (7 bits) | paired-LUT flag (bit 31): all three are
    # part of the certified decode-executable shape (models/codec.py)
    paired = 1 if enc.get("paired") else 0
    if bucket >= 1 << 24 or unroll >= 1 << 7:
        raise ValueError(f"bucket/unroll out of field range: "
                         f"{bucket}/{unroll}")
    out += struct.pack(">I", bucket | (unroll << 24) | (paired << 31))
    if chained:
        out += states.reshape(-1).tobytes()  # once, for the whole chain
    for s, stream in enumerate(streams):
        out += struct.pack(">I", len(stream))
        out += stream
        if not chained:
            out += states[s].tobytes()
        pos, val = patches[s]
        out += struct.pack(">H", len(pos))
        out += np.asarray(pos, "<u4").tobytes()
        out += np.asarray(val, "<i4").tobytes()
    z = enc["z_strings"][0]
    out += struct.pack(">I", len(z))
    out += z
    return out


def unpack_bin_interleaved(data: bytes, p: int = 128,
                           z_downsample: int = 64):
    """-> (enc dict for decompress_interleaved, padding, (h, w))."""
    import numpy as np

    if data[:4] not in (_MAGIC_V2, _MAGIC_V2_CHAIN):
        raise ValueError("not a DTI1/DTI2 interleaved container")
    chained = data[:4] == _MAGIC_V2_CHAIN
    h, w, lanes, n_slices = struct.unpack(">HHHB", data[4:11])
    (bucket_field,) = struct.unpack(">I", data[11:15])
    bucket = bucket_field & 0xFFFFFF
    unroll = (bucket_field >> 24) & 0x7F
    paired = bool(bucket_field >> 31)
    if unroll not in (0, 1, 2, 4, 8, 16, 32, 64):
        raise ValueError(
            f"DTI unroll field {unroll} was never produced by any writer "
            "(certified unrolls are small powers of two); the blob is "
            "corrupt or from an incompatible format revision")
    off = 15
    chain_states = None
    if chained:
        chain_states = np.frombuffer(data[off: off + 4 * lanes], "<u4")
        off += 4 * lanes
    streams: List[bytes] = []
    states = []
    patches = []
    for _ in range(n_slices):
        (slen,) = struct.unpack(">I", data[off: off + 4])
        off += 4
        streams.append(data[off: off + slen])
        off += slen
        if not chained:
            states.append(np.frombuffer(data[off: off + 4 * lanes], "<u4"))
            off += 4 * lanes
        (n_patch,) = struct.unpack(">H", data[off: off + 2])
        off += 2
        pos = np.frombuffer(data[off: off + 4 * n_patch], "<u4"
                            ).astype(np.int32)
        off += 4 * n_patch
        val = np.frombuffer(data[off: off + 4 * n_patch], "<i4"
                            ).astype(np.int32)
        off += 4 * n_patch
        patches.append((pos, val))
    (zlen,) = struct.unpack(">I", data[off: off + 4])
    off += 4
    z_string = data[off: off + zlen]
    padded, padding = calculate_padding(h, w, p)
    z_shape = (padded[0] // z_downsample, padded[1] // z_downsample)
    enc = {"istreams": streams,
           "states": (chain_states if chained else np.stack(states)),
           "patches": patches, "z_strings": [z_string], "shape": z_shape,
           "lanes": lanes, "bucket": bucket, "unroll": unroll,
           "paired": paired, "chained": chained}
    return enc, padding, (h, w)


def is_interleaved_bin(data: bytes) -> bool:
    return data[:4] in (_MAGIC_V2, _MAGIC_V2_CHAIN)


# ---------------------------------------------------------------------------
# Latent-handoff container ("DLT1"): the DCAE_4 deployment profile ships the
# RAW analysis latent y instead of an entropy-coded stream (ref
# models/dcae_4.py:728-732, eval_3.py:103; compress_and_decompress_cpu_gpu.py
# saves y as a .pt file, and check.py:668-679 casts those files to int8 as a
# size experiment). Layout:
#     DLT1 | >H h | >H w | B dtype_code | >f scale | B ndim | >I dim... | raw
# (h, w unpadded; scale is the int8 dequant multiplier, 1.0 for floats.)

_MAGIC_LATENT = b"DLT1"
_LATENT_DTYPES = {0: "float32", 1: "float16", 2: "bfloat16", 3: "int8"}
_LATENT_CODES = {v: k for k, v in _LATENT_DTYPES.items()}


def pack_latent(y, size: Tuple[int, int], dtype: str = "float32") -> bytes:
    """y: (B, yh, yw, M) analysis latent; dtype selects the shipped
    representation. int8 uses max-abs scaling with round-to-nearest
    (strictly better than the reference experiment's plain truncating
    cast, check.py:668-679; scale rides in the header)."""
    import numpy as np

    import ml_dtypes

    if dtype not in _LATENT_CODES:
        raise ValueError(f"unsupported latent dtype {dtype!r}")
    y = np.asarray(y, np.float32)
    scale = 1.0
    if dtype == "int8":
        amax = float(np.max(np.abs(y))) or 1.0
        scale = amax / 127.0
        payload = np.clip(np.rint(y / scale), -128, 127).astype(np.int8)
    elif dtype == "bfloat16":
        payload = y.astype(ml_dtypes.bfloat16)
    else:
        payload = y.astype(dtype)
    out = _MAGIC_LATENT
    out += struct.pack(">HHBf", size[0], size[1], _LATENT_CODES[dtype],
                       scale)
    out += struct.pack(">B", y.ndim)
    for d in y.shape:
        out += struct.pack(">I", d)
    out += payload.tobytes()
    return out


def unpack_latent(data: bytes, p: int = 128):
    """-> (y float32 (B, yh, yw, M), padding, (h, w))."""
    import numpy as np

    import ml_dtypes

    if data[:4] != _MAGIC_LATENT:
        raise ValueError("not a DLT1 latent container")
    h, w, code, scale = struct.unpack(">HHBf", data[4:13])
    (ndim,) = struct.unpack(">B", data[13:14])
    off = 14
    shape = []
    for _ in range(ndim):
        (d,) = struct.unpack(">I", data[off: off + 4])
        shape.append(d)
        off += 4
    dtype = _LATENT_DTYPES[code]
    np_dtype = ml_dtypes.bfloat16 if dtype == "bfloat16" else dtype
    y = np.frombuffer(data[off:], dtype=np_dtype).reshape(shape)
    y = y.astype(np.float32)
    if dtype == "int8":
        y = y * scale
    _, padding = calculate_padding(h, w, p)
    return y, padding, (h, w)


def is_latent_bin(data: bytes) -> bool:
    return data[:4] == _MAGIC_LATENT
