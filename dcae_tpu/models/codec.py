"""Host codec driver: real bitstream compress()/decompress().

Orchestration (cf. ref call stack SURVEY.md §3.2):
  compress   — ONE device program computes y, z, all slice contexts, symbols
               and coding indexes (the channel-AR recursion is replayed on
               device, no host round-trips); the host rANS-encodes z and y
               per image. Multi-image batches encode to one stream per image
               (streams are independent and decodable in parallel).
  decompress — alternates device context evaluation with host rANS decode,
               5x per image batch (the slice recursion is inherently
               sequential, ref models/dcae.py:859-910).

Symbol serialization order inside a stream is channel-major (NCHW flatten)
per slice, matching the reference's `.reshape(-1)` on NCHW tensors, and the
`.bin` container layout is preserved by dcae_tpu.runtime.container.

API parity (SURVEY.md §8): update() must precede real coding; compress
returns {"strings": [y_strings, z_strings], "shape": (zh, zw)}.
"""

from __future__ import annotations

import functools
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dcae_tpu.config import DCAEConfig
from dcae_tpu.entropy import rans
from dcae_tpu.entropy.gaussian import get_scale_table
from dcae_tpu.entropy.tables import CodecTables, build_codec_tables
from dcae_tpu.models.dcae import DCAE
from dcae_tpu.utils.profiling import force_sync


def _len_bucket(n: int, cap: int) -> int:
    """Smallest of {cap/16, cap/8, cap/4, cap/2, cap} >= n: a handful of
    static shapes regardless of per-batch stream-length jitter."""
    for d in (16, 8, 4, 2):
        if n <= cap // d:
            return max(cap // d, 1)
    return cap


def _auto_lanes(n_symbols: int) -> int:
    """Lane count for the interleaved profile: enough lanes to keep the
    device loop short (T = n/K iterations), few enough that the K uint32
    state header stays a small fraction of the payload."""
    for k in (1024, 512, 256, 128):
        if n_symbols >= k * 256:
            return k
    return 64


def _nchw_flat(x_nhwc: np.ndarray) -> np.ndarray:
    """(H,W,C) -> channel-major flat int32 (reference symbol order)."""
    return np.ascontiguousarray(x_nhwc.transpose(2, 0, 1)).reshape(-1)


def _unflatten_chw(flat: np.ndarray, h: int, w: int, c: int) -> np.ndarray:
    return flat.reshape(c, h, w).transpose(1, 2, 0)


def _unpack_sym4(packed: np.ndarray) -> np.ndarray:
    """Inverse of encode_rest's int4 pack: two two's-complement nibbles per
    byte along the last axis -> int8 symbols."""
    lo = (packed & 0xF).astype(np.int8)
    hi = (packed >> 4).astype(np.int8)
    out = np.empty((*packed.shape[:-1], packed.shape[-1] * 2), np.int8)
    out[..., 0::2] = (lo ^ 8) - 8  # sign-extend 4 bits
    out[..., 1::2] = (hi ^ 8) - 8
    return out


def maybe_unpack_idx6(arr: np.ndarray, c: int) -> np.ndarray:
    """Undo DCAE.pack_idx6 when `arr` is the packed hand-off (its last
    axis is 3c/4 instead of c) — the ONE place the 'is it packed?'
    inference lives; every consumer of the per-slice index fetch must go
    through here so the pack condition can change in one spot."""
    if arr.shape[-1] != c:
        return _unpack_idx6(arr, c).astype(np.int32)
    return arr.astype(np.int32)


def _unpack_idx6(packed: np.ndarray, c: int) -> np.ndarray:
    """Inverse of encode_rest's 6-bit index pack: 4 indexes per 3 bytes
    along the last axis -> uint8 indexes (all < 64)."""
    w = packed.reshape(*packed.shape[:-1], -1, 3).astype(np.uint32)
    u = w[..., 0] | (w[..., 1] << 8) | (w[..., 2] << 16)
    out = np.stack([u & 63, (u >> 6) & 63, (u >> 12) & 63,
                    (u >> 18) & 63], axis=-1)
    return out.reshape(*packed.shape[:-1], c).astype(np.uint8)


class DCAECodec:
    """Owns model params + baked tables + jitted device programs."""

    def __init__(self, cfg: DCAEConfig, params=None,
                 tables: Optional[CodecTables] = None,
                 dtype=None, seed: int = 0, device=None):
        """device: optional jax.Device to pin this codec's programs to
        (the reference's DCAE_1 exposes explicit encode/decode device
        placement, ref models/dcae_1.py:697-699,782-784; here placement is
        per-codec — build one codec per device role). Params are committed
        to the device; jitted programs follow their inputs' placement."""
        self.device = device
        if dtype is None and cfg.compute_dtype == "bfloat16":
            dtype = jnp.bfloat16
        # inference-only fused attention kernels on TPU backends (the
        # einsum path stays for CPU tests and for training, which needs
        # the VJP; parameter trees are identical)
        import dataclasses as _dc
        import os as _os
        backend = (device.platform if device is not None
                   else jax.default_backend())
        if (backend == "tpu" and not cfg.pallas_attention
                and _os.environ.get("DCAE_PALLAS") != "0"):
            cfg = _dc.replace(cfg, pallas_attention=True)
        # cfg.unroll_scan is NOT auto-enabled: it saves ~8 ms/run of scan
        # weight-slicing but changes bf16 g_a fusion enough to break the
        # 1-call fused encoder's bit-agreement (self_check then picks the
        # 2-call split mode, which costs more than 8 ms on a high-latency
        # dispatch link). Enable it for co-located deployments.
        self.cfg = cfg  # the cfg the model is actually built from
        self.model = DCAE(cfg, dtype=dtype)
        if params is None:
            dummy = jnp.zeros((1, cfg.pad_multiple, cfg.pad_multiple,
                               cfg.in_channels), jnp.float32)
            params = self.model.init(
                {"params": jax.random.PRNGKey(seed)}, dummy)["params"]
        if dtype == jnp.bfloat16:
            # store the one-sided transforms' weights in bf16 directly:
            # flax would cast f32 params to bf16 at every use anyway
            # (convert ops measured ~7% of encode device time), and the
            # lax.scan over the deep stage re-reads its stacked weights
            # every iteration — half the bytes. Entropy-side nets keep f32
            # masters (their math must be bitwise reproducible).
            cast = lambda t: jax.tree.map(  # noqa: E731
                lambda a: a.astype(jnp.bfloat16)
                if (hasattr(a, "dtype") and a.dtype == jnp.float32) else a,
                t)
            params = dict(params)
            for k in ("g_a", "g_s", "h_a"):
                if k in params:
                    params[k] = cast(params[k])
        # commit the tree to the device ONCE: checkpoint-restored params
        # arrive as host numpy arrays, and jit re-uploads host inputs on
        # every call — for the 119M-param tree that is ~240 MB (bf16)
        # through a ~80 MB/s tunnel PER PROGRAM CALL, the structural 10x
        # wall slowdown round 2 misread as chip contention on every
        # trained-checkpoint bench (cast first so the upload is half-size)
        params = jax.device_put(params, device)
        self.params = params
        self.tables = tables
        self._scale_table = get_scale_table(cfg.scales_min, cfg.scales_max,
                                            cfg.scales_levels)
        self._st_dev = None  # lazily device-committed scale table
        self._st_src = None  # host array the device copy was made from
        self._slot_dev = None  # device slot LUTs (interleaved profile)
        self._slot_src = None  # CodecTables they were built from
        self._slot_paired = None  # layout the cached LUTs were built for
        self._enc_lut_dev = None  # device encode tables (interleaved)
        self._enc_lut_src = None
        # interleaved-profile escape patches: max out-of-table symbols a
        # slice may carry exactly (beyond -> EscapeError -> classic
        # fallback). Static so patch tensors never churn program shapes.
        # default raised 128 -> 512 in round 4: low-rate trained
        # checkpoints (narrow tables) escape more on hard content, and a
        # patch costs 8 container bytes only when USED — losing the
        # whole interleaved profile to overflow is the expensive outcome
        self.patch_cap = int(os.environ.get("DCAE_PATCH_CAP", "512"))
        # staged encode by default (cross-program bit-agreement by
        # construction); self_check() upgrades to "split" (2 device calls)
        # or "fused" (1 device call) when the streams bit-match
        self.encode_mode = "staged"
        # per-image streams are independent; the C coder releases the GIL,
        # so batches entropy-code in parallel
        self._pool = ThreadPoolExecutor(max_workers=8)
        # optimistic int4-packed symbol fetch until a batch overflows
        self._sym_tier4 = True
        # sticky certified word bucket per (cap, lanes): the certify-first
        # encode seeds each batch's program shape from the last batch's
        # fixed point, so steady-state serving pays exactly one
        # replay+re-encode pass (rate jitter between batches rides the
        # cap-relative bucket granularity)
        self._il_bucket: dict = {}
        self._build_jits()

    # -------------------------------------------------------------- jits --

    def _build_jits(self):
        model = self.model

        def _norm(x):
            # uint8 ingress: images cross the link at 1 byte/px (4x less
            # h2d than f32 — measured 81 MB/s through the tunnel, so a
            # batch-8 768x512 upload is 116 ms vs 465 ms) and normalize
            # on device. dtype is static under jit, so the f32 path
            # traces unchanged.
            if x.dtype == jnp.uint8:
                return x.astype(jnp.float32) / 255.0
            return x

        self._forward = jax.jit(
            lambda p, x: model.apply({"params": p}, _norm(x),
                                     training=False))

        def _enc_full(p, x, st):
            out = dict(model.apply({"params": p}, _norm(x), st,
                                   method=DCAE.encode_arrays))
            out.update(DCAE.narrow_z(out.pop("z_symbols")))
            return out

        self._encode = jax.jit(_enc_full)

        def _analyze_fn(p, x):
            y, z_symbols, z_hat = model.apply(
                {"params": p}, _norm(x), method=DCAE.encode_analysis)
            # narrow z leaves in the SAME program so the split encoder's
            # hand-off ships int8 z (the fused path gets this via
            # narrow_z already; without it split fetched int32 z — 4x
            # the bytes on a ~25 MB/s link)
            return y, DCAE.narrow_z(z_symbols), z_hat

        self._analyze = jax.jit(_analyze_fn)

        self._encode_rest = jax.jit(
            lambda p, y, z_hat, st: model.apply(
                {"params": p}, y, z_hat, st, method=DCAE.encode_rest))

        def _pack6(idx):
            # decode-side use of the shared 6-bit index pack: the
            # per-slice index fetch is the decode loop's only bulk d2h
            # (6 x 786 KB per batch-8 through a 16-36 MB/s link), so it
            # ships at 0.75 B/idx; the host unpacks (_unpack_idx6)
            if idx.shape[-1] % 4:
                return idx
            return DCAE.pack_idx6(idx)

        def _start_fn(p, z_hat, st):
            ls, lm, support, mu, indexes = model.apply(
                {"params": p}, z_hat, st, method=DCAE.decode_start)
            return ls, lm, support, mu, _pack6(indexes)

        self._start = jax.jit(_start_fn)

        @functools.partial(jax.jit, static_argnums=(0,))
        def _step(i, p, ls, lm, y_hat_prev, support, mu, symbols, st):
            y_hat, support, mu, indexes = model.apply(
                {"params": p}, i, ls, lm, y_hat_prev,
                support, mu, symbols, st, method=DCAE.decode_step)
            return y_hat, support, mu, _pack6(indexes)

        @functools.partial(jax.jit, donate_argnums=())
        def _end(p, y_hat_prev, support, mu, symbols):
            return model.apply({"params": p}, y_hat_prev, support, mu,
                               symbols, method=DCAE.decode_end)

        self._step = _step
        self._end = _end
        self._decode_all = jax.jit(
            lambda p, z_hat, symbols: model.apply(
                {"params": p}, z_hat, symbols, method=DCAE.decode_all))
        def _dec_streams_fn(p, z_hat, words, n_words, states, ppos, pval,
                            override, true_syms, lsym, lsf, st, unroll,
                            paired, chained):
            return model.apply(
                {"params": p}, z_hat, words, n_words, states, ppos, pval,
                override, true_syms, lsym, lsf, st, unroll, paired, chained,
                method=DCAE.decode_device_streams)

        # ONE jit for decoder AND certified-encode replay: executable
        # identity is what makes the replayed index chain the decoder's
        # (override is a traced input, never a static arg)
        self._decode_streams = jax.jit(_dec_streams_fn,
                                       static_argnums=(12, 13, 14))

        def _reencode_fn(y_syms, rawidx, enc_sf, offs, maxpos, stride,
                         lanes, unroll, patch_cap, chain):
            from dcae_tpu.entropy.device_decode import (
                encode_slices_with_patches)
            return encode_slices_with_patches(
                y_syms, rawidx, enc_sf, offs, maxpos, stride, lanes,
                unroll, patch_cap, chain=chain)

        self._reencode = jax.jit(_reencode_fn,
                                 static_argnums=(5, 6, 7, 8, 9))

        def _enc_streams_fn(p, x, st, enc_sf, offs, maxpos, stride, lanes,
                            unroll, patch_cap, chain):
            return model.apply(
                {"params": p}, _norm(x), st, enc_sf, offs, maxpos, stride,
                lanes, unroll, patch_cap, chain,
                method=DCAE.encode_device_streams)

        self._encode_streams = jax.jit(_enc_streams_fn,
                                       static_argnums=(6, 7, 8, 9, 10))
        self._synthesis = jax.jit(
            lambda p, y_hat: model.apply(
                {"params": p}, y_hat, method=DCAE.decode_synthesis))
        self._g_a = jax.jit(
            lambda p, x: model.apply({"params": p}, _norm(x),
                                     method=DCAE.analysis))
        self._latent_dec = jax.jit(
            lambda p, y: model.apply(
                {"params": p}, y, method=DCAE.latent_decompress))
        self._aux = jax.jit(
            lambda p: model.apply({"params": p}, method=DCAE.aux_loss))

    # ------------------------------------------------------------- public --

    def forward(self, x) -> dict:
        """Eval-mode forward pass (likelihood bpp, no bitstream)."""
        return self._forward(self.params, jnp.asarray(x))

    def aux_loss(self) -> float:
        return float(self._aux(self.params))

    def update(self, scale_table=None, force: bool = False) -> bool:
        """Bake integer coding tables from the current parameters. Must be
        called before compress/decompress (reference contract,
        ref models/dcae.py:616-621)."""
        if self.tables is not None and not force:
            return False
        if scale_table is None:
            scale_table = self._scale_table
        eb = jax.tree.map(np.asarray, dict(self.params["entropy_bottleneck"]))
        self.tables = build_codec_tables(eb, scale_table,
                                         tail_mass=self.cfg.gc_tail_mass)
        self._scale_table = np.asarray(scale_table, np.float32)
        self._st_dev = None  # refresh the cached device copy
        return True

    def _require_tables(self) -> CodecTables:
        if self.tables is None:
            raise RuntimeError("call update() before real coding")
        return self.tables

    @property
    def fused_encode(self) -> bool:
        return self.encode_mode == "fused"

    @fused_encode.setter
    def fused_encode(self, v: bool):
        self.encode_mode = "fused" if v else "staged"

    def compress(self, x, fused: Optional[bool] = None,
                 mode: Optional[str] = None) -> dict:
        """x: (B,H,W,3) float in [0,1], H and W multiples of cfg.pad_multiple.
        Returns {"strings": [y_strings, z_strings], "shape": (zh, zw)}.

        Three encoder modes:
          staged (default) — drives the SAME compiled slice-context programs
            the decoder uses, so the mu/sigma the encoder codes against are
            bit-identical to the decoder's by construction (the cross-program
            analog of the reference fork's drift problem cannot occur).
            6 device round trips.
          split — 2 device calls (analysis, then all slice contexts fused);
            bit-agreement still holds when only the analysis transforms run
            reduced precision (their y/z are computed once and shared).
          fused — one device program for the whole encode (fastest).
        self_check() picks the fastest mode whose stream bit-matches staged.
        """
        if mode is None:
            mode = ("fused" if fused else "staged") if fused is not None \
                else self.encode_mode
        if mode == "fused":
            return self._compress_fused(x)
        if mode == "split":
            return self._compress_split(x)
        return self._compress_staged(x)

    def _st(self):
        """Device-resident scale table (uploaded once, not per call).
        Keyed by the host array's identity so direct `_scale_table`
        assignment (tools/eval.py CrossDeviceCodec.update propagates the
        encoder's rebaked table that way) invalidates the cache — a stale
        device copy would desynchronize the decoder's sigma->index chain."""
        if self._st_dev is None or self._st_src is not self._scale_table:
            self._st_src = self._scale_table
            self._st_dev = jax.device_put(
                jnp.asarray(self._scale_table), self.device)
        return self._st_dev

    def _as_input(self, x):
        """Upload an image batch preserving uint8 (normalized on device by
        the jitted programs' _norm; 4x cheaper on the link than f32).
        Anything else is coerced to f32 [0,1] as before."""
        if getattr(x, "dtype", None) == np.uint8:
            return jnp.asarray(x)
        return jnp.asarray(x, jnp.float32)

    def _encode_z(self, z_sym: np.ndarray) -> List[bytes]:
        t = self._require_tables()
        B, zh, zw, C = z_sym.shape
        z_index_flat = np.repeat(np.arange(C, dtype=np.int32), zh * zw)
        return list(self._pool.map(
            lambda b: rans.encode_with_indexes(
                _nchw_flat(z_sym[b]), z_index_flat,
                t.factorized.quantized_cdf, t.factorized.cdf_length,
                t.factorized.offset), range(B)))

    def _compress_fused(self, x) -> dict:
        out = self._encode(self.params, self._as_input(x),
                           self._st())
        return self._finish_fused(out)

    def _compress_split(self, x) -> dict:
        """2-call encode: analysis program, then one fused slice-context
        program (bit-safe with reduced-precision analysis transforms)."""
        y, z_narrow, z_hat = self._analyze(self.params, self._as_input(x))
        out = dict(self._encode_rest(self.params, y, z_hat, self._st()))
        out.update(z_narrow)
        return self._finish_fused(out)

    def compress_many(self, batches: Sequence, fused: Optional[bool] = None,
                      pipeline: bool = False) -> List[dict]:
        """Multi-batch encode. pipeline=True dispatches batch n+1's device
        program before host-coding batch n — a win on dedicated hardware,
        but measurably harmful on contended/time-shared chips (overlapping
        dispatch queues serialize badly), so it is opt-in."""
        mode = (("fused" if fused else "staged") if fused is not None
                else self.encode_mode)
        if mode != "fused" or not pipeline:
            return [self.compress(x, mode=mode) for x in batches]
        st = self._st()
        results: List[dict] = []
        pending = None
        for x in list(batches) + [None]:
            out = None
            if x is not None:
                out = self._encode(self.params, self._as_input(x),
                                   st)  # async dispatch
            if pending is not None:
                results.append(self._finish_fused(pending))
            pending = out
        return results

    def _fetch_encode_arrays(self, out):
        """ONE synchronizing device_get for the whole encode hand-off
        (device_get on a pytree starts every leaf's d2h copy before
        blocking, so all transfers overlap in a single round trip; per-leaf
        gets cost ~30 ms each on a tunneled link). The narrow (int8) copies
        are fetched optimistically; the rare overflow case pays one extra
        fetch. Returns (z_sym int32 (B,zh,zw,C), y_sym int32 (S,B,h,w,sd),
        y_idx uint8)."""
        has_z8 = "z_symbols8" in out
        z_key = "z_symbols8" if has_z8 else "z_symbols"
        zover = out["z_overflow8"] if has_z8 else False
        # sticky symbol tier: fetch the int4-packed copy first while it
        # keeps fitting (trained-model symbols live in [-8,7]); one
        # overflow downgrades the NEXT batch's first fetch to int8 so a
        # high-rate workload doesn't pay a wasted packed fetch per batch
        use4 = self._sym_tier4 and "y_packed4" in out
        y_key = "y_packed4" if use4 else "y_symbols8"
        idx_key = "y_indexes_p6" if "y_indexes_p6" in out else "y_indexes"
        z_val, zover, over4, over8, over16, y_val, idx_val = jax.device_get(
            (out[z_key], zover, out.get("y_overflow4", True),
             out["y_overflow8"], out["y_overflow"],
             out[y_key], out[idx_key]))
        if bool(zover):
            z_val = jax.device_get(out["z_symbols"])
        z_sym = np.asarray(z_val).astype(np.int32)  # (B,zh,zw,C)
        self._sym_tier4 = "y_packed4" in out and not bool(over4)
        if use4 and not bool(over4):
            y_sym = _unpack_sym4(np.asarray(y_val)).astype(np.int32)
        elif not bool(over8):
            y8 = jax.device_get(out["y_symbols8"]) if use4 else y_val
            y_sym = np.asarray(y8).astype(np.int32)
        elif bool(over16):
            y_sym = np.asarray(jax.device_get(out["y_symbols"]))
        else:
            y_sym = np.asarray(jax.device_get(out["y_symbols16"])).astype(
                np.int32)
        if idx_key == "y_indexes_p6":
            y_idx = _unpack_idx6(np.asarray(idx_val), y_sym.shape[-1])
        else:
            y_idx = np.asarray(idx_val)  # uint8
        return z_sym, y_sym, y_idx

    def _finish_fused(self, out) -> dict:
        """Host rANS encode of a device hand-off -> classic streams."""
        t = self._require_tables()
        z_sym, y_sym, y_idx = self._fetch_encode_arrays(out)
        B, zh, zw, _ = z_sym.shape
        z_strings = self._encode_z(z_sym)

        def encode_one(b: int) -> bytes:
            syms = np.concatenate(
                [_nchw_flat(y_sym[s, b]) for s in range(y_sym.shape[0])])
            idxs = np.concatenate(
                [_nchw_flat(y_idx[s, b]) for s in range(y_idx.shape[0])])
            return rans.encode_with_indexes(
                syms, idxs, t.gaussian.quantized_cdf, t.gaussian.cdf_length,
                t.gaussian.offset)

        y_strings = list(self._pool.map(encode_one, range(B)))
        return {"strings": [y_strings, z_strings], "shape": (zh, zw)}

    def _compress_staged(self, x) -> dict:
        """Encode by replaying the decoder's exact compiled programs
        (decode_start/step), computing symbols by host rounding."""
        t = self._require_tables()
        y, z_narrow, z_hat = self._analyze(self.params, self._as_input(x))
        z8, zover = jax.device_get((z_narrow["z_symbols8"],
                                    z_narrow["z_overflow8"]))
        z_sym = np.asarray(jax.device_get(z_narrow["z_symbols"])) \
            if bool(zover) else np.asarray(z8).astype(np.int32)
        B, zh, zw, _ = z_sym.shape
        z_strings = self._encode_z(z_sym)

        st = self._st()
        ls, lm, support, mu, indexes = self._start(self.params, z_hat, st)
        y_np = np.asarray(jax.device_get(y))
        y_h, y_w = y_np.shape[1], y_np.shape[2]
        sd = self.cfg.slice_dim

        sym_chunks = [[] for _ in range(B)]
        idx_chunks = [[] for _ in range(B)]
        y_hat = jnp.zeros((B, y_h, y_w, 0), jnp.float32)
        symbols = None
        for i in range(self.cfg.num_slices):
            if i > 0:
                y_hat, support, mu, indexes = self._step(
                    i, self.params, ls, lm, y_hat, support, mu,
                    jnp.asarray(symbols, jnp.float32), st)
            mu_np, idx_np = jax.device_get((mu, indexes))  # one round trip
            mu_np = np.asarray(mu_np)
            idx_np = np.asarray(idx_np)
            idx_np = maybe_unpack_idx6(idx_np, sd)
            y_slice = y_np[..., i * sd: (i + 1) * sd]
            symbols = np.round(y_slice - mu_np).astype(np.int32)
            for b in range(B):
                sym_chunks[b].append(_nchw_flat(symbols[b]))
                idx_chunks[b].append(_nchw_flat(idx_np[b]))

        y_strings = [rans.encode_with_indexes(
            np.concatenate(sym_chunks[b]), np.concatenate(idx_chunks[b]),
            t.gaussian.quantized_cdf, t.gaussian.cdf_length,
            t.gaussian.offset) for b in range(B)]
        return {"strings": [y_strings, z_strings], "shape": (zh, zw)}

    def _il_paired(self) -> bool:
        """Paired (df, pos) slot LUT: the decode loop records bucket
        positions directly, eliminating the post-loop symbol gather
        (33.8 ms/batch-8 in the r4 xprof budget). DCAE_IL_PAIRED=0
        selects the classic two-table layout (same streams either way;
        the flag is part of the certified executable shape and rides
        the DTI1 container like unroll)."""
        return os.environ.get("DCAE_IL_PAIRED", "1") == "1"

    def _slot_luts(self, paired=None):
        """Device-resident slot LUTs for the on-device entropy decoder
        (built once per table bake; ~34 MB classic / ~50 MB paired for
        the 64-row Gaussian bank). paired overrides the env choice (the
        decoder must build the layout the encoder's container recorded)."""
        t = self._require_tables()
        if paired is None:
            paired = self._il_paired()
        if (self._slot_dev is None or self._slot_src is not t
                or self._slot_paired != paired):
            from dcae_tpu.entropy.device_decode import build_slot_tables
            g = t.gaussian
            lsym, lsf = build_slot_tables(g.quantized_cdf, g.cdf_length,
                                          g.offset, paired=paired)
            self._slot_dev = (jax.device_put(lsym, self.device),
                              jax.device_put(lsf, self.device))
            self._slot_src = t
            self._slot_paired = paired
        return self._slot_dev

    def _enc_luts(self):
        """Device-resident encode-side tables for the interleaved profile
        (~400 KB; built once per table bake)."""
        t = self._require_tables()
        if self._enc_lut_dev is None or self._enc_lut_src is not t:
            from dcae_tpu.entropy.device_decode import build_enc_tables
            g = t.gaussian
            enc_sf, offs, maxpos, stride = build_enc_tables(
                g.quantized_cdf, g.cdf_length, g.offset)
            self._enc_lut_dev = (jax.device_put(enc_sf, self.device),
                                 jax.device_put(offs, self.device),
                                 jax.device_put(maxpos, self.device),
                                 stride)
            self._enc_lut_src = t
        return self._enc_lut_dev

    def compress_device(self, x, lanes: Optional[int] = None) -> dict:
        """Fully device-side encode of the interleaved profile: analysis,
        symbol/index computation AND per-slice rANS encoding run in ONE
        device program (DCAE.encode_device_streams); the host fetches
        entropy-sized streams instead of raw packed symbols — the encode
        wire payload drops to the entropy bound (~8x smaller at trained
        rates). Decodes with decompress_interleaved.
        Out-of-table Gaussian-tail symbols (the ones the classic format
        bypass-codes) ride a per-slice patch list — clamped in-stream,
        exact value restored after device entropy decode (see
        DCAE.encode_device_streams). Raises rans.EscapeError only when a
        patch list overflows DCAE_PATCH_CAP (default 128/slice) or a
        symbol's row has no in-range buckets at all (fall back to the
        classic format).

        CERTIFY-FIRST ENCODE (default; DCAE_IL_CERTIFY=0 reverts to the
        encoder's own single-program index chain, which bit-matches
        compress_interleaved): sigma->index chains are not bitwise stable
        across different XLA programs — trained models park many sigmas
        exactly on scale-table boundaries, where one-ulp cross-program
        jitter flips searchsorted and desynchronizes the decoder's rANS
        (measured: 54 flipped indexes in slice 2 cascade into a dead
        stream; docs/PERF.md). The fix is structural: the encoder
        teacher-forces THE DECODER'S OWN compiled program (same executable
        => bitwise-identical chain) with the raw latent y — that replay IS
        the encoder's only channel-AR pass, computing both the symbols
        (round(y - mu) under the decoder's own mu) and the coding indexes
        — then a re-encode program emits the streams under exactly that
        (symbols, indexes) pair. The real decode then reproduces the chain
        by induction, and `ok` still detects residual divergence (e.g. a
        decoder built with different flags) rather than corrupting.

        Cost shape (the round-3 bench showed the first certified design
        2x the classic encode): analysis program + ONE replay of the
        decoder's context/entropy program (synthesis lives in its own
        program precisely so the replay never pays it) + the re-encode
        program, with a single host sync that fetches streams, states,
        patches and the narrow z together. The word bucket is seeded from
        the previous batch (self._il_bucket) so the fixed-point loop runs
        once at steady state.

        Internally split into a no-sync dispatch phase and a fetch phase
        so the serving pipeline can overlap batch i's fetch (d2h + host
        z-encode) with batch i+1's device programs."""
        return self._compress_device_fetch(
            self._compress_device_dispatch(x, lanes))

    def _compress_device_dispatch(self, x, lanes: Optional[int] = None
                                  ) -> dict:
        """Phase 1 of compress_device: queue this batch's device programs
        (analysis -> decoder-program replay -> re-encode) with NO host
        sync; returns the pending handle _compress_device_fetch completes.
        The uncertified env path has an inherent sync and rides through
        as a finished result."""
        x = self._as_input(x)
        enc_sf, offs, maxpos, stride = self._enc_luts()
        B, H, W = x.shape[0], x.shape[1], x.shape[2]
        yd = self.cfg.y_downsample
        n_slice = B * (H // yd) * (W // yd) * self.cfg.slice_dim
        K = lanes or _auto_lanes(n_slice)
        # decode-loop unroll default 2: U symbols/lane/iteration halve the
        # fori_loop's per-iteration overhead (same-window A/B with fresh
        # input buffers: decode program 203 -> 180 ms/batch-8 at the
        # trained rate; u=4 flat). Identical results by construction; the
        # value ships in the container so decoders run the certified
        # executable shape.
        unroll = int(os.environ.get("DCAE_IL_UNROLL", "2"))
        # chained lane set (round 5, default): ONE K-lane state vector
        # spans all slices — the header drops from S*K to K uint32
        # (the interleaved profile's bpp tax falls 5x; VERDICT r4 item 2)
        chain = os.environ.get("DCAE_IL_CHAIN", "1") == "1"
        cap = n_slice + 1  # encode word-buffer width (<=1 word/symbol)
        if os.environ.get("DCAE_IL_CERTIFY", "1") == "0":
            return {"_sync": self._compress_device_uncertified(
                x, K, unroll, enc_sf, offs, maxpos, stride, cap, chain)}
        y, z_narrow, z_hat = self._analyze(self.params, x)
        # cap-relative stream-length buckets (cap/16, cap/8, ...) so rate
        # jitter between batches cannot churn slice-program recompiles;
        # sticky seed from the last batch, cap//8 (~2 bits/symbol) first
        bucket = self._il_bucket.get((cap, K),
                                     _len_bucket(max(1, cap // 8), cap))
        res = self._dispatch_replay_reencode(
            y, z_hat, bucket, cap, K, unroll, enc_sf, offs, maxpos, stride,
            chain)
        return {"y": y, "z_narrow": z_narrow, "z_hat": z_hat, "res": res,
                "bucket": bucket, "cap": cap, "K": K, "unroll": unroll,
                "chain": chain, "luts": (enc_sf, offs, maxpos, stride)}

    def _dispatch_replay_reencode(self, y, z_hat, bucket: int, cap: int,
                                  K: int, unroll: int, enc_sf, offs,
                                  maxpos, stride: int, chain: bool) -> dict:
        """Queue the certified replay (the decoder's own executable,
        teacher-forced with y) and the re-encode program at the given
        word bucket; no host sync."""
        S = self.cfg.num_slices
        P = self.patch_cap
        lsym, lsf = self._slot_luts()
        dummy_ppos = jnp.full((S, P), cap - 1, jnp.int32)
        dummy_pval = jnp.zeros((S, P), jnp.int32)
        dummy_nw = jnp.zeros((S,), jnp.int32)
        dummy_states = jnp.full((K,) if chain else (S, K), 1 << 16,
                                jnp.uint32)
        dwords = jnp.zeros((S, bucket), jnp.uint16)
        _, _, rawidx, syms = self._decode_streams(
            self.params, z_hat, dwords, dummy_nw, dummy_states,
            dummy_ppos, dummy_pval, np.bool_(True), y,
            lsym, lsf, self._st(), unroll, self._slot_paired, chain)
        return self._reencode(syms, rawidx, enc_sf, offs, maxpos,
                              stride, K, unroll, P, chain)

    def _compress_device_fetch(self, pend: dict) -> dict:
        """Phase 2 of compress_device: ONE host sync for everything the
        container needs (streams at the current bucket, states, patches,
        narrow z); iterates the word bucket to its fixed point — rare
        under the sticky seed — by re-dispatching the replay at the grown
        bucket. Raises rans.EscapeError exactly like compress_device."""
        if "_sync" in pend:
            return pend["_sync"]
        z_narrow = pend["z_narrow"]
        cap, K, unroll = pend["cap"], pend["K"], pend["unroll"]
        chain = pend["chain"]
        enc_sf, offs, maxpos, stride = pend["luts"]
        bucket, res = pend["bucket"], pend["res"]
        S = self.cfg.num_slices
        for _ in range(5):
            (n_words, states, escape, poverflow, ppos, pval, pcnt, words,
             z8, zover) = jax.device_get(
                (res["n_words"], res["states"], res["escape"],
                 res["patch_overflow"], res["patch_pos"], res["patch_val"],
                 res["patch_count"], res["words"][:, :bucket],
                 z_narrow["z_symbols8"], z_narrow["z_overflow8"]))
            b2 = _len_bucket(int(np.asarray(n_words).max()), cap)
            if b2 <= bucket:
                break
            bucket = b2
            res = self._dispatch_replay_reencode(
                pend["y"], pend["z_hat"], bucket, cap, K, unroll,
                enc_sf, offs, maxpos, stride, chain)
        else:
            raise rans.EscapeError(
                "certified encode: word bucket did not reach a fixed point")
        self._il_bucket[(cap, K)] = bucket
        if bool(escape):
            raise rans.EscapeError(
                "symbol outside in-range CDF buckets (device encode)")
        if bool(poverflow):
            raise rans.EscapeError(
                f"escape patch list overflow (> {self.patch_cap}/slice)")
        z_sym = (np.asarray(jax.device_get(z_narrow["z_symbols"]))
                 if bool(zover) else np.asarray(z8).astype(np.int32))
        z_strings = self._encode_z(z_sym)
        patches = [(np.asarray(ppos[s][:int(pcnt[s])]),
                    np.asarray(pval[s][:int(pcnt[s])]))
                   for s in range(S)]
        n_words = np.asarray(n_words)
        words = np.asarray(words)
        streams = [words[s, :int(n_words[s])][::-1].tobytes()
                   for s in range(S)]
        return {
            "istreams": streams,
            "states": np.asarray(states),
            "patches": patches,
            # the certified word bucket: the decoder must build its padded
            # words array at THIS width so it runs the same executable the
            # certification replayed (the bucket is part of program shape)
            "bucket": bucket,
            # ... and the same decode-loop unroll, the other static knob
            # of the decode executable's shape (rides the container next
            # to the bucket; decoders honor it over their own env)
            "unroll": unroll,
            # ... and the slot-LUT layout (paired df+pos vs classic),
            # the third static knob of the certified executable shape
            "paired": self._slot_paired,
            # chained lane set: states is (K,) spanning all slices (the
            # fourth static knob; rides the container as the DTI2 layout)
            "chained": chain,
            "z_strings": z_strings,
            "shape": (z_sym.shape[1], z_sym.shape[2]),
            "lanes": K,
        }

    def _compress_device_uncertified(self, x, K: int, unroll: int,
                                     enc_sf, offs, maxpos, stride: int,
                                     cap: int, chain: bool = False) -> dict:
        """DCAE_IL_CERTIFY=0 path: one fused device program computes the
        symbol/index chain AND emits the streams (encode_device_streams) —
        bit-identical to the host encoder (compress_interleaved), but the
        decoder must reproduce the ENCODER's index chain, which trained
        boundary-sitting sigmas break across programs (docs/PERF.md)."""
        out = self._encode_streams(self.params, x, self._st(), enc_sf,
                                   offs, maxpos, stride, K, unroll,
                                   self.patch_cap, chain)
        (n_words, escape, z8, zover, states, poverflow, ppos, pval,
         pcnt) = jax.device_get(
            (out["n_words"], out["escape"], out["z_symbols8"],
             out["z_overflow8"], out["states"], out["patch_overflow"],
             out["patch_pos"], out["patch_val"], out["patch_count"]))
        if bool(escape):
            raise rans.EscapeError(
                "symbol outside in-range CDF buckets (device encode)")
        if bool(poverflow):
            raise rans.EscapeError(
                f"escape patch list overflow (> {self.patch_cap}/slice)")
        z_sym = (np.asarray(jax.device_get(out["z_symbols"]))
                 if bool(zover) else np.asarray(z8).astype(np.int32))
        z_strings = self._encode_z(z_sym)
        patches = [(np.asarray(ppos[s][:int(pcnt[s])]),
                    np.asarray(pval[s][:int(pcnt[s])]))
                   for s in range(ppos.shape[0])]
        n_words = np.asarray(n_words)
        bucket = _len_bucket(int(n_words.max()), cap)
        words = np.asarray(jax.device_get(out["words"][:, :bucket]))
        streams = [words[s, :int(n_words[s])][::-1].tobytes()
                   for s in range(words.shape[0])]
        return {
            "istreams": streams,
            "states": np.asarray(states),
            "patches": patches,
            "bucket": bucket,
            "unroll": unroll,
            "chained": chain,
            "z_strings": z_strings,
            "shape": (z_sym.shape[1], z_sym.shape[2]),
            "lanes": K,
        }

    def compress_interleaved(self, x, lanes: Optional[int] = None) -> dict:
        """Encode into the K-lane interleaved (device-decodable) profile:
        per-slice interleaved rANS y streams + a classic z stream. The
        matching decode (decompress_interleaved) runs the WHOLE decode —
        entropy decode included — as one device program: no host round
        trips. Out-of-table symbols are clamped into their row's in-range
        buckets for the stream and shipped exactly in a per-slice patch
        list (bit-identical clamping to compress_device; the decoder
        restores them after entropy decode, so x_hat == classic). Raises
        rans.EscapeError only on patch-list overflow or a row with no
        in-range buckets (callers fall back to classic compress).

        Payload overhead vs classic: ONE K-uint32 lane-state header for
        the whole chain (round 5: slices share one lane set, encoded in
        reverse slice order — ~2-3% at trained rates vs the old per-slice
        headers' ~15%) + 8 bytes per (rare) escape patch.
        DCAE_IL_CHAIN=0 reverts to per-slice lane sets (DTI1 layout)."""
        t = self._require_tables()
        x = self._as_input(x)
        chain = os.environ.get("DCAE_IL_CHAIN", "1") == "1"
        if self.encode_mode == "fused":
            out = dict(self._encode(self.params, x, self._st()))
        else:
            y, z_narrow, z_hat = self._analyze(self.params, x)
            out = dict(self._encode_rest(self.params, y, z_hat, self._st()))
            out.update(z_narrow)
        z_sym, y_sym, y_idx = self._fetch_encode_arrays(out)
        z_strings = self._encode_z(z_sym)
        y_idx = y_idx.astype(np.int32)
        S = y_sym.shape[0]
        K = lanes or _auto_lanes(y_sym[0].size)
        g = t.gaussian
        row_off = np.asarray(g.offset, np.int32)
        row_mp = np.asarray(g.cdf_length, np.int32) - 2  # in-range buckets

        def clamp_slice(s: int):
            sym = y_sym[s].reshape(-1).astype(np.int32)
            idx = y_idx[s].reshape(-1)
            offs = row_off[idx]
            mp = row_mp[idx]
            csym = (np.clip(sym - offs, 0, np.maximum(mp - 1, 0))
                    + offs)
            pos = np.flatnonzero(csym != sym).astype(np.int32)
            if pos.size > self.patch_cap:
                raise rans.EscapeError(
                    f"escape patch list overflow (> {self.patch_cap}"
                    "/slice)")
            return csym, idx, (pos, sym[pos])

        clamped = list(self._pool.map(clamp_slice, range(S)))
        if chain:
            # sequential by construction: slice s starts from slice s+1's
            # final states (the decoder threads them forward)
            streams = [None] * S
            st = None
            for s in reversed(range(S)):
                csym, idx, _ = clamped[s]
                streams[s], st = rans.encode_interleaved(
                    csym, idx, g.quantized_cdf, g.cdf_length, g.offset, K,
                    init_states=st)
            states = st
        else:
            def encode_slice(s: int):
                csym, idx, _ = clamped[s]
                return rans.encode_interleaved(
                    csym, idx, g.quantized_cdf, g.cdf_length, g.offset, K)

            pairs = list(self._pool.map(encode_slice, range(S)))
            streams = [p[0] for p in pairs]
            states = np.stack([p[1] for p in pairs])
        return {
            "istreams": streams,
            "states": np.asarray(states),
            "patches": [c[2] for c in clamped],
            "chained": chain,
            "z_strings": z_strings,
            "shape": (z_sym.shape[1], z_sym.shape[2]),
            "lanes": K,
        }

    def decompress_interleaved(self, enc: dict) -> dict:
        """Decode the interleaved profile: host-decode the (tiny) z stream,
        then the device does everything else with NO host sync — one
        program for slice contexts + on-device rANS (the executable the
        certified encode replayed), one for synthesis (kept separate so
        the encoder's replay never pays for g_s). Returns {"x_hat", "ok"};
        ok is the lanes-checksum device scalar (False on stream corruption
        or an encoder/decoder index-chain divergence)."""
        zh, zw = int(enc["shape"][0]), int(enc["shape"][1])
        z_hat = self._decode_z_hat(enc["z_strings"], zh, zw)
        streams = enc["istreams"]
        states = np.ascontiguousarray(np.asarray(enc["states"]), np.uint32)
        S = len(streams)
        n_words = np.array([len(b) // 2 for b in streams], np.int32)
        # bucket the padded word buffer so stream-length jitter doesn't
        # recompile the decode program (cap-relative buckets; cap = the
        # per-slice symbol count, the emission-count upper bound)
        r = self.cfg.hyper_ratio
        cap = (z_hat.shape[0] * (zh * r) * (zw * r) * self.cfg.slice_dim
               + 1)
        # honor the encoder's certified bucket when it is sane (program-
        # shape identity with the certification replay, compress_device);
        # otherwise derive it from the stream lengths as before
        w_max = int(enc.get("bucket") or 0)
        if w_max < int(n_words.max()) or w_max > cap:
            w_max = _len_bucket(int(n_words.max()), cap)
        words = np.zeros((S, w_max), np.uint16)
        for s, b in enumerate(streams):
            w = np.frombuffer(b, np.uint16)
            words[s, :len(w)] = w
        # escape patches: pad to the (static) patch_cap; padding rows get
        # position n_flat — out of bounds for the slice's flat symbols, so
        # the device-side scatter drops them (mode="drop")
        n_flat = cap - 1
        P = self.patch_cap
        ppos = np.full((S, P), n_flat, np.int32)
        pval = np.zeros((S, P), np.int32)
        for s, (pos, val) in enumerate(enc.get("patches") or []):
            if len(pos):
                ppos[s, :len(pos)] = pos
                pval[s, :len(val)] = val
        # the encoder's recorded unroll and LUT layout win (certified-
        # executable shape, like the bucket); env defaults otherwise
        want = enc.get("paired")
        paired = self._il_paired() if want is None else bool(want)
        lsym, lsf = self._slot_luts(paired=paired)
        unroll = int(enc.get("unroll")
                     or os.environ.get("DCAE_IL_UNROLL", "2"))
        # chained layout is self-describing: a 1-D state vector IS the
        # chain header (the enc-dict flag wins when present)
        chained = bool(enc.get("chained", states.ndim == 1))
        B = z_hat.shape[0]
        true0 = jnp.zeros((B, zh * r, zw * r,
                           self.cfg.slice_dim * self.cfg.num_slices),
                          jnp.float32)
        y_hat, ok, _idx, _syms = self._decode_streams(
            self.params, jnp.asarray(z_hat), jnp.asarray(words),
            jnp.asarray(n_words), jnp.asarray(states), jnp.asarray(ppos),
            jnp.asarray(pval), np.bool_(False), true0, lsym, lsf,
            self._st(), unroll, paired, chained)
        return {"x_hat": self._synthesis(self.params, y_hat), "ok": ok}

    def compress_latent(self, x) -> np.ndarray:
        """Latent-handoff encode (ref DCAE_4 compress, models/dcae_4.py:728):
        ship raw y instead of a bitstream (no entropy coding)."""
        return np.asarray(jax.device_get(
            self._g_a(self.params, self._as_input(x))))

    def decompress_latent(self, y) -> dict:
        """Latent-handoff decode; see DCAE.latent_decompress."""
        return {"x_hat": self._latent_dec(self.params, jnp.asarray(y))}

    def analyze_sizes(self, x) -> dict:
        """Byte accounting of codec payloads vs raw tensors (ref eval.py
        analyze_data_size mode, eval.py:3341) + model size."""
        x = np.asarray(x)
        enc = self.compress(x)
        y = self.compress_latent(x)
        strings_bytes = sum(len(s) for grp in enc["strings"] for s in grp)
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree.leaves(self.params))
        return {
            "image_bytes_uint8": int(np.prod(x.shape)),
            "y_string_bytes": sum(len(s) for s in enc["strings"][0]),
            "z_string_bytes": sum(len(s) for s in enc["strings"][1]),
            "total_stream_bytes": strings_bytes,
            "raw_latent_bytes_f32": int(np.prod(y.shape) * 4),
            "raw_latent_bytes_bf16": int(np.prod(y.shape) * 2),
            "stream_vs_image_ratio": float(np.prod(x.shape)) / strings_bytes,
            "model_params": n_params,
            "model_bytes_f32": n_params * 4,
        }

    def self_check(self, image=None) -> bool:
        """Compress one image with the fast encoder modes; enable the first
        whose stream bit-matches the staged (decoder-replay) reference.
        Returns True when a fast path (split or fused) is now on.

        Two acceptance criteria, tried in order per mode:

        1. Stream equality with the staged encode (cheap — one extra
           compress). Sufficient but NOT necessary: with bf16 analysis
           transforms the fused single-program encoder recomputes y inside
           its own XLA program, and bf16 rounding is fusion-context-
           sensitive — measured on a trained checkpoint, y differs across
           two jits of the same function by up to 2^-6 on 79% of elements.
           A different y means different symbols, hence a different (but
           not wrong!) stream.
        2. Decode-replay exactness (the necessary-and-sufficient
           condition): decode the candidate stream with the real staged
           decoder programs and require the decoded (indexes, symbols) to
           equal the encoder's bitwise at every slice. This is what
           correctness actually demands — the decoder's sigma->index chain
           must reproduce the encoder's; the encoder's y itself is content,
           not protocol.

        split is checked first by default: its y comes from the same
        _analyze program as the staged path (and all math after y is f32),
        so criterion 1 passes even with trained bf16 weights, and it skips
        compiling the big fused program. Set DCAE_PREFER_FUSED=1 to try the
        1-call fused encoder (criterion 1 then 2) before split — one fewer
        dispatch round trip per batch."""
        if image is None:
            rng = np.random.default_rng(0)
            p = self.cfg.pad_multiple
            image = rng.uniform(0, 1, (1, p, p, self.cfg.in_channels)
                                ).astype(np.float32)
        staged = self.compress(image, mode="staged")
        prefer_fused = os.environ.get("DCAE_PREFER_FUSED") == "1"
        modes = ("fused", "split") if prefer_fused else ("split", "fused")
        fused_rt_tried = False
        for mode in modes:
            if self.compress(image, mode=mode)["strings"] \
                    == staged["strings"]:
                self.encode_mode = mode
                return True
            if mode == "fused" and prefer_fused:
                # criterion 2 must run BEFORE falling back to split here,
                # or the flag is a no-op on exactly the bf16 trained
                # deployments it targets (split's criterion 1 always
                # passes structurally)
                fused_rt_tried = True
                if self._roundtrip_check(image, mode="fused"):
                    self.encode_mode = "fused"
                    return True
        if not fused_rt_tried and self._roundtrip_check(image, mode="fused"):
            self.encode_mode = "fused"
            return True
        self.encode_mode = "staged"
        return False

    def _roundtrip_check(self, image, mode: str = "fused") -> bool:
        """Criterion-2 self_check: encode `image` with `mode`, then decode
        the stream with the staged decoder programs and compare the decoded
        per-slice (indexes, symbols) to the encoder's, bitwise. True means
        the stream is exactly decodable — the only property deployment
        needs (z is already replay-exact: integer symbols, shared table)."""
        x = self._as_input(image)
        if mode == "fused":
            out = dict(self._encode(self.params, x, self._st()))
        else:
            y, z_narrow, z_hat = self._analyze(self.params, x)
            out = dict(self._encode_rest(self.params, y, z_hat, self._st()))
            out.update(z_narrow)
        enc = self._finish_fused(out)
        y_sym, y_idx = jax.device_get((out["y_symbols"], out["y_indexes"]))
        y_sym = np.asarray(y_sym)
        y_idx = np.asarray(y_idx).astype(np.int32)
        rec: List[Tuple[np.ndarray, np.ndarray]] = []
        job = self._DecodeJob(self, enc["strings"], enc["shape"], record=rec)
        while job.advance():
            pass
        if len(rec) != y_sym.shape[0]:
            return False
        return all(
            np.array_equal(idx_s.astype(np.int32), y_idx[s])
            and np.array_equal(sym_s.astype(np.int32), y_sym[s])
            for s, (idx_s, sym_s) in enumerate(rec))

    def compress_with_indexes(self, x) -> dict:
        """Fused compress that additionally returns the encoder's coding
        indexes (ref DCAE_6, models/dcae_6.py:760-778): ship them with the
        stream so the decoder can skip/validate its own sigma->index
        recomputation when hunting cross-device drift."""
        out = self._encode(self.params, self._as_input(x), self._st())
        result = self._finish_fused(out)
        result["indexes"] = np.asarray(jax.device_get(out["y_indexes"]))
        return result

    class _DecodeJob:
        """One batch's decode as an explicit state machine so multiple
        batches can interleave: while this job's host rANS runs, another
        job's device step executes."""

        def __init__(self, codec: "DCAECodec", strings, shape, record=None):
            self.c = codec
            t = codec._require_tables()
            self.t = t
            # record (optional list): appended (indexes, symbols) np arrays
            # per slice — the decode-replay self_check compares these
            # against the encoder's to prove a stream exactly decodable
            self.record = record
            y_strings, z_strings = strings
            self.B = len(z_strings)
            zh, zw = int(shape[0]), int(shape[1])
            C = codec.cfg.eb_channels
            r = codec.cfg.hyper_ratio
            self.y_h, self.y_w = zh * r, zw * r
            self.sd = codec.cfg.slice_dim
            self.st = codec._st()

            z_hat = codec._decode_z_hat(z_strings, zh, zw)

            self.decoders = []
            for b in range(self.B):
                d = rans.RansDecoder()
                d.set_stream(y_strings[b])
                self.decoders.append(d)

            # async dispatch of the first device stage
            (self.ls, self.lm, self.support, self.mu,
             self.local_idx) = codec._start(codec.params,
                                            jnp.asarray(z_hat), self.st)
            self._start_idx_copy()
            self.y_hat = jnp.zeros((self.B, self.y_h, self.y_w, 0),
                                   jnp.float32)
            self.slice_index = 0
            self.x_hat = None

        def _start_idx_copy(self):
            """Enqueue the d2h copy of the indexes the moment the producing
            program is dispatched, so the transfer overlaps the other
            interleaved jobs' work instead of starting at the blocking
            device_get."""
            try:
                self.local_idx.copy_to_host_async()
            except AttributeError:
                pass

        def _host_decode(self) -> np.ndarray:
            idx_np = maybe_unpack_idx6(
                np.asarray(jax.device_get(self.local_idx)), self.sd)
            lut = self.t.gaussian.lut  # build once, outside the pool

            def decode_one(b: int) -> np.ndarray:
                flat = self.decoders[b].decode_stream(
                    _nchw_flat(idx_np[b]), self.t.gaussian.quantized_cdf,
                    self.t.gaussian.cdf_length, self.t.gaussian.offset,
                    lut=lut)
                return _unflatten_chw(flat, self.y_h, self.y_w, self.sd)

            symbols = np.stack(list(self.c._pool.map(decode_one,
                                                     range(self.B))))
            if self.record is not None:
                self.record.append((idx_np, symbols))
            return symbols

        def advance(self) -> bool:
            """One pipeline tick: host-decode the current slice's symbols
            (syncs on this job only) and async-dispatch the next device
            stage. Returns False when done."""
            if self.x_hat is not None:
                return False
            symbols = jnp.asarray(self._host_decode(), jnp.float32)
            i = self.slice_index + 1
            if i < self.c.cfg.num_slices:
                (self.y_hat, self.support, self.mu,
                 self.local_idx) = self.c._step(
                    i, self.c.params, self.ls, self.lm, self.y_hat,
                    self.support, self.mu, symbols, self.st)
                self._start_idx_copy()
                self.slice_index = i
                return True
            self.x_hat = self.c._end(self.c.params, self.y_hat,
                                     self.support, self.mu, symbols)
            return False

    def decompress(self, strings: Sequence[Sequence[bytes]],
                   shape: Tuple[int, int], indexes=None) -> dict:
        """strings: [y_strings, z_strings]; shape: (zh, zw) of z.
        Returns {"x_hat": (B,H,W,3) in [0,1]}.

        indexes (optional): encoder-shipped per-slice coding indexes
        (S,B,yh,yw,c) — used instead of the locally recomputed ones
        (DCAE_6 table-shipping semantics). With indexes known upfront the
        host rANS needs no device output at all, so the entire decode runs
        as: host-decode every slice, then ONE fused device program
        (DCAE.decode_all) — 1 dispatch round trip instead of 6."""
        if indexes is not None:
            return self._decompress_shipped_indexes(strings, shape, indexes)
        job = self._DecodeJob(self, strings, shape)
        while job.advance():
            pass
        return {"x_hat": job.x_hat}

    def _decode_z_hat(self, z_strings, zh: int, zw: int) -> np.ndarray:
        """Host-decode the z streams and dequantize around the LIVE medians
        — exactly what the encoder's device graph used (a baked copy may
        lag a training step). No LUT: z is ~1% of the symbol volume and the
        factorized bank has eb_channels rows — a 2^16-slot fused LUT would
        cost ~96 MB host RAM for an unmeasurable win."""
        t = self._require_tables()
        B = len(z_strings)
        C = self.cfg.eb_channels
        z_index_flat = np.repeat(np.arange(C, dtype=np.int32), zh * zw)
        z_hat = np.empty((B, zh, zw, C), np.float32)
        for b in range(B):
            sym = rans.decode_with_indexes(
                z_strings[b], z_index_flat, t.factorized.quantized_cdf,
                t.factorized.cdf_length, t.factorized.offset)
            z_hat[b] = _unflatten_chw(sym.astype(np.float32), zh, zw, C)
        medians = np.asarray(
            self.params["entropy_bottleneck"]["quantiles"])[:, 0, 1]
        return z_hat + medians.reshape(1, 1, 1, C)

    def _decompress_shipped_indexes(self, strings, shape, indexes) -> dict:
        """Single-round-trip decode for the indexes-shipped (DCAE_6) mode."""
        t = self._require_tables()
        y_strings, z_strings = strings
        B = len(z_strings)
        zh, zw = int(shape[0]), int(shape[1])
        r = self.cfg.hyper_ratio
        y_h, y_w = zh * r, zw * r
        sd = self.cfg.slice_dim
        S = self.cfg.num_slices

        z_hat = self._decode_z_hat(z_strings, zh, zw)

        idx = np.asarray(indexes).astype(np.int32)  # (S, B, yh, yw, sd)
        lut = t.gaussian.lut

        def decode_one(b: int) -> np.ndarray:
            flat_idx = np.concatenate(
                [_nchw_flat(idx[s, b]) for s in range(S)])
            flat = rans.decode_with_indexes(
                y_strings[b], flat_idx, t.gaussian.quantized_cdf,
                t.gaussian.cdf_length, t.gaussian.offset, lut=lut)
            per = y_h * y_w * sd
            return np.concatenate(
                [_unflatten_chw(flat[s * per:(s + 1) * per], y_h, y_w, sd)
                 for s in range(S)], axis=-1)

        symbols = np.stack(list(self._pool.map(decode_one, range(B))))
        x_hat = self._decode_all(self.params, jnp.asarray(z_hat),
                                 jnp.asarray(symbols, jnp.int32))
        return {"x_hat": x_hat}

    def _start_encode_producer(self, batches: List, encode_fn, maxsize: int,
                               dispatch_fn=None, fetch_fn=None):
        """Shared serving-loop producer: a daemon thread encodes batches
        into a bounded queue with next-batch image-upload prefetch (the
        h2d transfer rides the link while this batch's fetch blocks).
        When (dispatch_fn, fetch_fn) are given instead of encode_fn, the
        producer runs dispatch-ahead buffering: batch i+D's device
        programs are queued BEFORE batch i's host sync, so the fetch's
        d2h + host coding hide behind the next batches' device time.
        D = DCAE_IL_DISPATCH_AHEAD (default 1, i.e. double buffering;
        deeper holds D batches of device buffers in flight).
        Returns (queue, dead_event, thread, err_list); the consumer must
        `dead.set(); thread.join()` in a finally block so a consumer
        failure never leaves the producer blocked on the full queue, and
        re-raise err_list[0] if present. A None in the queue marks a
        producer failure."""
        import queue as _queue
        import threading

        q: "_queue.Queue" = _queue.Queue(maxsize=maxsize)
        err: List[BaseException] = []
        dead = threading.Event()  # consumer died: stop producing

        def _put(item) -> bool:
            while not dead.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except _queue.Full:
                    continue
            return False

        def producer():
            try:
                from collections import deque
                depth = max(1, int(os.environ.get(
                    "DCAE_IL_DISPATCH_AHEAD", "1")))
                nxt = None
                pend: "deque" = deque()
                for i, x in enumerate(batches):
                    cur = nxt if nxt is not None else self._as_input(x)
                    nxt = (self._as_input(batches[i + 1])
                           if i + 1 < len(batches) else None)
                    if dispatch_fn is None:
                        if not _put(encode_fn(cur)):
                            return
                        continue
                    pend.append((dispatch_fn(cur), cur))
                    if (len(pend) > depth
                            and not _put(fetch_fn(*pend.popleft()))):
                        return
                while pend:
                    if not _put(fetch_fn(*pend.popleft())):
                        return
            except BaseException as e:  # surface in the consumer
                err.append(e)
                _put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        return q, dead, t, err

    def encdec_pipeline(self, batches: Sequence, decode_interleave: int = 2,
                        queue_depth: int = 3) -> List[dict]:
        """Steady-state serving loop: encode of batch i+1 overlaps decode of
        batch i, so throughput is set by max(encode, decode) per batch
        instead of their sum (the reference serves encode and decode from
        different processes/devices for the same reason, ref rpc/server.py
        + models/dcae_1.py's encoder/decoder device split).

        A dedicated producer thread runs compress() — its device_get waits
        and GIL-free C rANS leave the interpreter mostly idle, so the
        consumer's decode driver genuinely runs in parallel even on one
        core; the chip itself serializes device programs, which is fine
        because both stages are dispatch/host-bound on a tunneled link.
        queue_depth bounds in-flight encodes (device memory backpressure).

        decode_interleave consecutive encoded batches decode as one
        decompress_many group: each batch keeps its full-size device
        programs (splitting WITHIN a batch measured slower — smaller
        device batches), while the ~28 ms dispatch round trips of the
        grouped jobs overlap each other.

        Returns per-batch dicts {"strings", "shape", "x_hat"} in order."""
        batches = list(batches)
        k = max(1, int(decode_interleave))
        q, dead, t, err = self._start_encode_producer(
            batches, self.compress, maxsize=max(k, queue_depth))
        results: List[dict] = []

        def flush(group: List[dict]):
            if len(group) == 1:
                decs = [self.decompress(group[0]["strings"],
                                        group[0]["shape"])]
            else:
                decs = self.decompress_many(
                    [(e["strings"], e["shape"]) for e in group],
                    interleave=len(group))
            for e, d in zip(group, decs):
                results.append({"strings": e["strings"],
                                "shape": e["shape"], "x_hat": d["x_hat"]})

        group: List[dict] = []
        stop = False
        try:
            for _ in batches:
                enc = q.get()
                if enc is None:
                    stop = True
                    break
                group.append(enc)
                if len(group) >= k:
                    flush(group)
                    group = []
            if group and not stop:
                flush(group)
        finally:
            # a consumer failure must not leave the producer blocked on
            # the bounded queue forever (thread + device-buffer leak)
            dead.set()
            t.join()
        if err:
            raise err[0]
        return results

    def encdec_pipeline_interleaved(self, batches: Sequence,
                                    inflight: int = 3) -> List[dict]:
        """Serving loop for the device-decode profile: a producer thread
        encodes (device_get waits + GIL-free C rANS), while the consumer
        merely DISPATCHES each batch's single decode program — the device
        queue itself is the pipeline, so encode of batch i+1 overlaps
        decode of batch i with no slice-level interleaving machinery.
        `inflight` bounds un-synced decodes (device-memory backpressure).

        Escape-robust: a batch whose symbols fall outside the shipped
        tables (untrained weights, extreme inputs) transparently falls
        back to the classic bypass-coded codec for that batch — the loop
        returns a result for EVERY batch, tagged by "profile".
        Returns per-batch {"x_hat", "ok", "shape", "profile"} in order."""
        batches = list(batches)

        def dispatch(x):
            # escape/overflow surfaces at fetch time for the certified
            # path; the uncertified path syncs here, so route its escape
            # to the fetch-side fallback too
            try:
                return self._compress_device_dispatch(x)
            except rans.EscapeError:
                return None

        def fetch(d, x):
            try:
                if d is None:
                    raise rans.EscapeError("dispatch-time escape")
                return self._compress_device_fetch(d)
            except rans.EscapeError:
                return {"_classic": self.compress(x)}

        q, dead, t, err = self._start_encode_producer(
            batches, None, maxsize=max(1, inflight),
            dispatch_fn=dispatch, fetch_fn=fetch)
        results: List[dict] = []
        pending: List[dict] = []

        def drain(d):
            # force_sync, not block_until_ready: the latter can return
            # before execution completes on some PJRT plugins (docs/PERF.md
            # measurement traps), which would break both the inflight
            # backpressure and any timing bracket around this loop
            force_sync(d["x_hat"])
            results.append(d)

        try:
            for _ in batches:
                enc = q.get()
                if enc is None:
                    break
                if "_classic" in enc:
                    c = enc["_classic"]
                    # classic decode is synchronous (host rANS in the
                    # loop) — the pipeline loses overlap for this batch
                    # only; bit-exactness is its construction guarantee
                    d = self.decompress(c["strings"], c["shape"])
                    pending.append({"x_hat": d["x_hat"], "ok": True,
                                    "shape": c["shape"],
                                    "profile": "classic"})
                else:
                    dec = self.decompress_interleaved(enc)  # async dispatch
                    pending.append({**dec, "shape": enc["shape"],
                                    "profile": "interleaved"})
                if len(pending) > inflight:
                    drain(pending.pop(0))
            for d in pending:
                drain(d)
        finally:
            dead.set()
            t.join()
        if err:
            raise err[0]
        return results

    def decompress_many(self, jobs: Sequence, interleave: int = 2
                        ) -> List[dict]:
        """Interleaved decode of multiple (strings, shape) jobs: one job's
        host entropy decode overlaps another's device step, hiding the
        per-sync round-trip floor of the channel-AR loop."""
        results: List[Optional[dict]] = [None] * len(jobs)
        pending = list(enumerate(jobs))
        active: List[Tuple[int, DCAECodec._DecodeJob]] = []
        while pending or active:
            while pending and len(active) < interleave:
                idx, (strings, shape) = pending.pop(0)
                active.append((idx, self._DecodeJob(self, strings, shape)))
            next_active = []
            for idx, job in active:
                if job.advance():
                    next_active.append((idx, job))
                else:
                    results[idx] = {"x_hat": job.x_hat}
            active = next_active
        return results  # type: ignore[return-value]
