"""DCAE model: dictionary-based channel-autoregressive learned image codec.

Behavioral contract (SURVEY.md §8, ref /root/reference/models/dcae.py:623-910):
  forward(x)   -> {x_hat, likelihoods{y,z}, para{means,scales,y}}
  + pure-device codec graphs for real coding (encode_arrays / decode_* below;
    the host rANS driver lives in dcae_tpu.models.codec).

TPU-first structure:
  * NHWC everywhere; the 5-slice channel-AR loop is unrolled inside one jit —
    a static graph, no host round-trips during encode (the reference's
    encoder simulates the z-decode on host; here round(z - median) + median is
    computed on device, which equals the decoded value by construction).
  * The drift-robust variant (reference fork's dcae_7 DriftSimulator) is a
    config option: uniform noise on the decoder-side support/mu/sigma and the
    transferred z_hat during training only.
"""

from __future__ import annotations

from typing import Any, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from dcae_tpu.config import DCAEConfig
from dcae_tpu.entropy import gaussian
from dcae_tpu.entropy.bottleneck import EntropyBottleneck
from dcae_tpu.entropy.ops import ste_round
from dcae_tpu.models.transforms import (
    GAnalysis,
    GSynthesis,
    HyperAnalysis,
    HyperSynthesis,
    SliceNet,
)

Dtype = Any


class DCAE(nn.Module):
    cfg: DCAEConfig
    dtype: Optional[Dtype] = None

    def setup(self):
        cfg = self.cfg
        # dtype (e.g. bfloat16) applies ONLY to the one-sided transforms:
        # g_a/h_a run on the encoder only and g_s on the decoder only, and
        # their f32-cast outputs are quantized once, so reduced-precision
        # bodies cannot cause encoder/decoder drift. The entropy-side nets
        # (hyper synthesis, dictionary attention, slice context nets) always
        # run float32 — encoder and decoder must reproduce mu/sigma/LRP
        # bitwise across *different compiled programs*, and bf16 results are
        # not stable across XLA fusion contexts.
        self.g_a = GAnalysis(cfg, dtype=self.dtype)
        self.g_s = GSynthesis(cfg, dtype=self.dtype)
        self.h_a = HyperAnalysis(cfg, dtype=self.dtype)
        self.h_z_s1 = HyperSynthesis(cfg)  # latent scales (f32, see above)
        self.h_z_s2 = HyperSynthesis(cfg)  # latent means

        self.dt = self.param(
            "dt", nn.initializers.normal(stddev=1.0),
            (cfg.dict_num, cfg.dict_dim))

        from dcae_tpu.ops.dictionary import DictionaryCrossAttention
        self.dt_cross_attention = [
            DictionaryCrossAttention(
                output_dim=cfg.M, head_num=cfg.dict_head_num,
                head_dim=cfg.dict_head_dim, mlp_rate=cfg.mlp_rate,
                qkv_bias=cfg.qkv_bias, pallas=cfg.pallas_attention)
            for _ in range(cfg.num_slices)
        ]
        self.cc_mean_transforms = [
            SliceNet(cfg) for _ in range(cfg.num_slices)]
        self.cc_scale_transforms = [
            SliceNet(cfg) for _ in range(cfg.num_slices)]
        self.lrp_transforms = [
            SliceNet(cfg) for _ in range(cfg.num_slices)]

        self.entropy_bottleneck = EntropyBottleneck(
            channels=cfg.eb_channels, filters=cfg.eb_filters,
            init_scale=cfg.eb_init_scale, tail_mass=cfg.eb_tail_mass)

    # ------------------------------------------------------------------
    # pieces (each independently invocable via apply(..., method=...))
    # ------------------------------------------------------------------

    def analysis(self, x: jax.Array) -> jax.Array:
        return self.g_a(x)

    def synthesis(self, y_hat: jax.Array) -> jax.Array:
        return self.g_s(y_hat)

    def hyper_analysis(self, y: jax.Array) -> jax.Array:
        return self.h_a(y)

    def hyper_synthesis(self, z_hat: jax.Array):
        return self.h_z_s1(z_hat), self.h_z_s2(z_hat)

    def eb_medians(self) -> jax.Array:
        return self.entropy_bottleneck.medians()

    def aux_loss(self) -> jax.Array:
        return self.entropy_bottleneck.aux_loss()

    def _drift(self, x: jax.Array, enabled: bool) -> jax.Array:
        """Uniform +/-noise injection (training-time drift robustness,
        ref models/dcae_7.py:424-438)."""
        if not enabled or self.cfg.drift_noise <= 0:
            return x
        rng = self.make_rng("drift")
        noise = (jax.random.uniform(rng, x.shape, x.dtype) - 0.5)
        return x + noise * (2 * self.cfg.drift_noise)

    def _slice_context(self, slice_index: int, latent_scales: jax.Array,
                       latent_means: jax.Array,
                       y_hat_slices: List[jax.Array], y_h: int, y_w: int,
                       drift: bool = False):
        """Context for slice i: query -> dictionary cross-attn -> support ->
        (support, mu, sigma). (ref models/dcae.py:643-655)"""
        cfg = self.cfg
        support_slices = y_hat_slices[: cfg.max_support_slices] \
            if cfg.max_support_slices >= 0 else y_hat_slices
        query = jnp.concatenate([latent_scales, latent_means] +
                                list(support_slices), axis=-1)
        dict_info = self.dt_cross_attention[slice_index](query, self.dt)
        support = jnp.concatenate([query, dict_info], axis=-1)
        support = self._drift(support, drift)
        # entropy parameters always leave in float32 (quantization/coding
        # precision), whatever the transform compute dtype is
        mu = self.cc_mean_transforms[slice_index](support)[
            :, :y_h, :y_w, :].astype(jnp.float32)
        sigma = self.cc_scale_transforms[slice_index](support)[
            :, :y_h, :y_w, :].astype(jnp.float32)
        mu = self._drift(mu, drift)
        sigma = self._drift(sigma, drift)
        return support, mu, sigma

    def _slice_lrp(self, slice_index: int, support: jax.Array,
                   y_hat_slice: jax.Array) -> jax.Array:
        lrp_in = jnp.concatenate([support, y_hat_slice], axis=-1)
        return 0.5 * jnp.tanh(self.lrp_transforms[slice_index](lrp_in))

    # ------------------------------------------------------------------
    # training / eval forward
    # ------------------------------------------------------------------

    def encode_half(self, x: jax.Array, training: bool = False):
        """Encoder-side training forward (g_a, h_a, entropy bottleneck):
        returns (y, z_hat, z_likelihoods). The transfer-drift injection on
        z_hat models the cross-device handoff (ref dcae_7 CompressModel
        forward + DCAE.transfer_drift, models/dcae_7.py:539-547,757-760)."""
        y = self.g_a(x).astype(jnp.float32)
        z = self.h_a(y).astype(jnp.float32)
        _, z_likelihoods = self.entropy_bottleneck(z, training=training)
        medians = self.eb_medians().reshape(1, 1, 1, -1)
        z_hat = ste_round(z - medians) + medians
        z_hat = self._drift(z_hat, training)  # transfer drift (dcae_7)
        return y, z_hat, z_likelihoods

    def decode_half(self, y: jax.Array, z_hat: jax.Array,
                    training: bool = False):
        """Decoder-side training forward (hyper synthesis, dictionary
        context nets, g_s): consumes raw y + quantized z_hat, returns
        (x_hat, y_likelihoods, means, scales, y_hat).
        (ref dcae_7 DecompressModel.forward, models/dcae_7.py:630-683)"""
        cfg = self.cfg
        B, y_h, y_w, _ = y.shape
        latent_scales, latent_means = self.hyper_synthesis(z_hat)

        y_slices = jnp.split(y, cfg.num_slices, axis=-1)
        y_hat_slices: List[jax.Array] = []
        y_likelihoods, mu_list, scale_list = [], [], []
        for i, y_slice in enumerate(y_slices):
            support, mu, sigma = self._slice_context(
                i, latent_scales, latent_means, y_hat_slices, y_h, y_w,
                drift=training)
            mu_list.append(mu)
            scale_list.append(sigma)
            rng = self.make_rng("noise") if training else None
            _, like = gaussian.apply(y_slice, sigma, mu, training=training,
                                     rng=rng, scale_bound=cfg.scales_min)
            y_likelihoods.append(like)
            y_hat_slice = ste_round(y_slice - mu) + mu
            y_hat_slice = y_hat_slice + self._slice_lrp(i, support,
                                                        y_hat_slice)
            y_hat_slices.append(y_hat_slice)

        y_hat = jnp.concatenate(y_hat_slices, axis=-1)
        x_hat = self.g_s(y_hat).astype(jnp.float32)
        return (x_hat, jnp.concatenate(y_likelihoods, axis=-1),
                jnp.concatenate(mu_list, axis=-1),
                jnp.concatenate(scale_list, axis=-1), y_hat)

    def __call__(self, x: jax.Array, training: bool = False):
        y, z_hat, z_likelihoods = self.encode_half(x, training)
        x_hat, y_likelihoods, means, scales, y_hat = self.decode_half(
            y, z_hat, training)
        return {
            "x_hat": x_hat,
            "likelihoods": {"y": y_likelihoods, "z": z_likelihoods},
            # y_hat/z_hat are extra keys vs the reference contract (consumed
            # by the precision-regularization pass, dcae_tpu.train.step)
            "para": {"means": means, "scales": scales, "y": y,
                     "y_hat": y_hat, "z_hat": z_hat},
        }

    def decode_from_quantized(self, y_hat: jax.Array, z_hat: jax.Array
                              ) -> jax.Array:
        """Decoder-half training forward on an ALREADY-quantized latent: no
        re-rounding; each received slice gets the LRP correction and feeds
        the next slice's context. This is the reference split decoder's
        training forward, used as the second pass of the
        precision-regularization penalty (ref models/dcae_5.py:1759-1795,
        train_5.py:3320-3337)."""
        cfg = self.cfg
        B, y_h, y_w, _ = y_hat.shape
        latent_scales, latent_means = self.hyper_synthesis(z_hat)
        y_slices = jnp.split(y_hat.astype(jnp.float32), cfg.num_slices,
                             axis=-1)
        out_slices: List[jax.Array] = []
        for i, y_slice in enumerate(y_slices):
            support, _, _ = self._slice_context(
                i, latent_scales, latent_means, out_slices, y_h, y_w)
            out_slices.append(
                y_slice + self._slice_lrp(i, support, y_slice))
        return self.g_s(jnp.concatenate(out_slices, axis=-1)
                        ).astype(jnp.float32)

    # ------------------------------------------------------------------
    # real-codec device graphs
    # ------------------------------------------------------------------

    def encode_arrays(self, x: jax.Array, scale_table: jax.Array):
        """Single-jit encoder graph: everything the host coder needs.

        Returns dict with int32 symbol/index tensors:
          z_symbols (B,zh,zw,C), y_symbols/y_indexes (S,B,yh,yw,slice_dim).
        The decoder-side y_hat recursion (round + mu + LRP) is replicated
        exactly so encoder and decoder contexts agree.
        (ref compress(): models/dcae.py:698-761)
        """
        y, z_symbols, z_hat = self.encode_analysis(x)
        out = self.encode_rest(y, z_hat, scale_table)
        out["z_symbols"] = z_symbols
        return out

    def encode_rest(self, y: jax.Array, z_hat: jax.Array,
                    scale_table: jax.Array):
        """Everything after the analysis transforms, as ONE device program:
        hyper synthesis + all slice contexts + symbols/indexes. Paired with
        encode_analysis this gives a 2-round-trip encode whose slice math is
        the same f32 graph the decoder replays — used when g_a/h_a run in a
        reduced-precision dtype (their y/z outputs are computed once here,
        so the fully-fused single-program path can't bit-match the staged
        decoder replay, but this split can). (ref compress():
        models/dcae.py:698-761)"""
        cfg = self.cfg
        y = y.astype(jnp.float32)
        B, y_h, y_w, _ = y.shape
        latent_scales, latent_means = self.hyper_synthesis(z_hat)

        y_slices = jnp.split(y, cfg.num_slices, axis=-1)
        y_hat_slices: List[jax.Array] = []
        sym_list, idx_list = [], []
        for i, y_slice in enumerate(y_slices):
            support, mu, sigma = self._slice_context(
                i, latent_scales, latent_means, y_hat_slices, y_h, y_w)
            indexes = gaussian.build_indexes(
                sigma, scale_table, cfg.scales_min).astype(jnp.uint8)
            symbols = jnp.round(y_slice - mu).astype(jnp.int32)
            y_hat_slice = symbols.astype(jnp.float32) + mu
            sym_list.append(symbols)
            idx_list.append(indexes)
            y_hat_slice = y_hat_slice + self._slice_lrp(i, support,
                                                        y_hat_slice)
            y_hat_slices.append(y_hat_slice)

        y_symbols = jnp.stack(sym_list)
        y_indexes = jnp.stack(idx_list)
        # narrow copies for the (bandwidth-limited) host fetch: int4-packed
        # when every symbol fits [-8,7] (the common case for trained
        # models), then int8/int16/int32 tiers. The tunnel link moves
        # ~20-80 MB/s (tools/bench_link.py), so the 7.9 MB/batch-8
        # symbol+index payload is a first-order encode cost; packing takes
        # it to 4.9 MB.
        out = {
            "y_symbols": y_symbols,
            "y_symbols16": y_symbols.astype(jnp.int16),
            "y_symbols8": y_symbols.astype(jnp.int8),
            "y_overflow": jnp.any(jnp.abs(y_symbols) > 32767),
            "y_overflow8": jnp.any(jnp.abs(y_symbols) > 127),
            "y_indexes": y_indexes,
        }
        sd = y_symbols.shape[-1]
        if sd % 2 == 0:
            # two's-complement low nibbles, two symbols per byte
            nib = (y_symbols & 0xF).astype(jnp.uint8)
            out["y_packed4"] = nib[..., 0::2] | (nib[..., 1::2] << 4)
            out["y_overflow4"] = jnp.any((y_symbols < -8) | (y_symbols > 7))
        if sd % 4 == 0:
            out["y_indexes_p6"] = self.pack_idx6(y_indexes)
        return out

    @staticmethod
    def pack_idx6(indexes: jax.Array) -> jax.Array:
        """6-bit pack of coding indexes (always < 64 scale rows): 4 per
        3 bytes along the last axis, lossless. Shared by the encode
        hand-off and the decode-side per-slice fetch; the single host
        inverse is codec._unpack_idx6 — keep all three bit-compatible.
        Last axis must be divisible by 4 (callers fall back to raw
        uint8 otherwise)."""
        c = indexes.shape[-1]
        g = indexes.astype(jnp.uint32).reshape(
            *indexes.shape[:-1], c // 4, 4)
        w = (g[..., 0] | (g[..., 1] << 6) | (g[..., 2] << 12)
             | (g[..., 3] << 18))
        return jnp.stack(
            [w & 0xFF, (w >> 8) & 0xFF, (w >> 16) & 0xFF],
            axis=-1).astype(jnp.uint8).reshape(
                *indexes.shape[:-1], c // 4 * 3)

    @staticmethod
    def narrow_z(z_symbols: jax.Array) -> dict:
        """int8 copy of the z symbols for the host fetch (trained-model z
        symbols are tiny; the int32 original stays available for the
        pathological case)."""
        return {
            "z_symbols": z_symbols,
            "z_symbols8": z_symbols.astype(jnp.int8),
            "z_overflow8": jnp.any(jnp.abs(z_symbols) > 127),
        }

    def encode_analysis(self, x: jax.Array):
        """Encoder-only front half: (y, z_symbols, z_hat) for the staged
        compress path (the rest reuses the decoder's programs)."""
        y = self.g_a(x).astype(jnp.float32)
        z = self.h_a(y).astype(jnp.float32)
        medians = self.eb_medians().reshape(1, 1, 1, -1)
        z_symbols = jnp.round(z - medians).astype(jnp.int32)
        z_hat = z_symbols.astype(jnp.float32) + medians
        return y, z_symbols, z_hat

    def _ctx_and_indexes(self, slice_index: int, latent_scales, latent_means,
                         y_hat_prev: jax.Array, scale_table):
        prev = ([] if slice_index == 0 else
                list(jnp.split(y_hat_prev, slice_index, axis=-1)))
        y_h, y_w = latent_scales.shape[1], latent_scales.shape[2]
        support, mu, sigma = self._slice_context(
            slice_index, latent_scales, latent_means, prev, y_h, y_w)
        indexes = gaussian.build_indexes(
            sigma, scale_table, self.cfg.scales_min).astype(jnp.uint8)
        return support, mu, indexes

    def _apply_symbols(self, slice_index: int, support, mu, symbols):
        y_hat_slice = symbols.astype(jnp.float32) + mu
        lrp = self._slice_lrp(slice_index, support, y_hat_slice)
        return y_hat_slice + lrp.astype(jnp.float32)

    # The decode driver is latency-bound by host<->device round trips (the
    # host rANS must run between slices), so the graphs are fused to one
    # device call per slice: apply slice i-1's symbols AND build slice i's
    # context in the same program. 12 calls -> 6 vs the naive staging.

    def decode_start(self, z_hat: jax.Array, scale_table: jax.Array):
        """Call 1: hyper synthesis + slice-0 context.
        Returns (ls, lm, support0, mu0, indexes0)."""
        latent_scales, latent_means = self.hyper_synthesis(z_hat)
        B = z_hat.shape[0]
        y_h, y_w = latent_scales.shape[1], latent_scales.shape[2]
        empty = jnp.zeros((B, y_h, y_w, 0), jnp.float32)
        support, mu, indexes = self._ctx_and_indexes(
            0, latent_scales, latent_means, empty, scale_table)
        return latent_scales, latent_means, support, mu, indexes

    def decode_step(self, slice_index: int, latent_scales, latent_means,
                    y_hat_prev, support_prev, mu_prev, symbols_prev,
                    scale_table):
        """Call i+1 (1<=i<S): finish slice i-1 with its decoded symbols,
        then emit slice i's context. Returns (y_hat, support, mu, indexes)."""
        y_hat_slice = self._apply_symbols(slice_index - 1, support_prev,
                                          mu_prev, symbols_prev)
        y_hat = jnp.concatenate([y_hat_prev, y_hat_slice], axis=-1)
        support, mu, indexes = self._ctx_and_indexes(
            slice_index, latent_scales, latent_means, y_hat, scale_table)
        return y_hat, support, mu, indexes

    def decode_end(self, y_hat_prev, support_last, mu_last, symbols_last):
        """Final call: apply the last slice and synthesize the image."""
        y_hat_slice = self._apply_symbols(self.cfg.num_slices - 1,
                                          support_last, mu_last, symbols_last)
        y_hat = jnp.concatenate([y_hat_prev, y_hat_slice], axis=-1)
        return jnp.clip(self.g_s(y_hat).astype(jnp.float32), 0.0, 1.0)

    def decode_synthesis(self, y_hat: jax.Array) -> jax.Array:
        return jnp.clip(self.g_s(y_hat).astype(jnp.float32), 0.0, 1.0)

    def encode_device_streams(self, x: jax.Array, scale_table: jax.Array,
                              enc_sf: jax.Array, enc_offsets: jax.Array,
                              enc_maxpos: jax.Array, stride: int,
                              lanes: int, unroll: int = 1,
                              patch_cap: int = 128, chain: bool = False):
        """Whole ENCODE in one device program, entropy coding included:
        analysis + channel-AR symbol/index computation (encode_arrays) and
        K-lane interleaved rANS encoding of every slice
        (entropy/device_decode.py encode_interleaved_device, bit-identical
        to the C++ encoder). The host then fetches entropy-SIZED streams
        (~1-2 bits/symbol trained) instead of packed raw symbols — on a
        remote-accelerator link that fetch is the encode wire bound.

        Out-of-table symbols (Gaussian-tail outliers the classic format
        bypass-codes, ref CompressAI RansEncoder bypass) don't invalidate
        the profile: the STREAM carries the symbol clamped into its row's
        in-range buckets, and a per-slice patch list (flat position + true
        value, <= patch_cap entries) rides alongside so the decoder
        restores the exact symbol right after entropy decode — the y_hat
        chain (and hence x_hat) stays bit-identical to the classic path.
        patch_count > patch_cap sets patch_overflow (caller falls back to
        classic); escape now only fires for rows with no in-range buckets
        at all (mp <= 0 — unclampable, classic fallback).

        Returns per-slice emission-order word buffers + counts + lane
        states + patch arrays + escape/overflow flags, plus the narrow z
        hand-off (z stays host-coded: ~1% of symbol volume, with bypass).
        The device-resident extras y_symbols (true symbols) and z_hat feed
        the certified-encode replay (models/codec.py compress_device) —
        they are never fetched to the host."""
        from dcae_tpu.entropy.device_decode import encode_slices_with_patches

        out = dict(self.encode_arrays(x, scale_table))
        y_sym = out["y_symbols"]
        y_idx = out["y_indexes"].astype(jnp.int32)
        res = encode_slices_with_patches(
            y_sym, y_idx, enc_sf, enc_offsets, enc_maxpos, stride,
            lanes, unroll, patch_cap, chain=chain)
        res["y_symbols"] = y_sym
        medians = self.eb_medians().reshape(1, 1, 1, -1)
        res["z_hat"] = out["z_symbols"].astype(jnp.float32) + medians
        res.update(self.narrow_z(out["z_symbols"]))
        return res

    def decode_device_streams(self, z_hat: jax.Array, words: jax.Array,
                              n_words: jax.Array, states: jax.Array,
                              patch_pos: jax.Array, patch_val: jax.Array,
                              override: jax.Array, true_y: jax.Array,
                              lut_sym: jax.Array, lut_sf: jax.Array,
                              scale_table: jax.Array, unroll: int = 1,
                              paired: bool = False, chained: bool = False):
        """Slice contexts + ON-DEVICE entropy decode of the K-lane
        interleaved rANS streams (entropy/device_decode.py) in one device
        program: the channel-AR chain needs no host round trips at all —
        the TPU-native redesign of the reference's CPU-decode step (ref
        models/dcae.py:875-893). Synthesis is deliberately NOT in this
        program (decode_synthesis is dispatched right after, still with no
        host sync): the certified ENCODE replays this very program, and
        keeping g_s out of it means the encoder never pays for synthesis.

        words: (S, Wmax) uint16 per-slice streams (padded); n_words: (S,)
        true word counts; states: (S, K) uint32 decode-start lane states;
        patch_pos/patch_val: (S, P) int32 escape patches (see
        encode_device_streams) — true symbol values scattered over the
        clamped stream symbols right after entropy decode (padding rows
        carry an out-of-range position and are dropped), which is what
        keeps the y_hat chain equal to the classic bypass-coded path.

        override/true_y ((), bool / (B, yh, yw, M) f32) exist for the
        ENCODER: sigma->index chains are not bitwise stable across
        *different* XLA programs (boundary-sitting trained sigmas flip
        searchsorted buckets), so the encoder teacher-forces THIS VERY
        PROGRAM with the raw latent y (override=True: each slice's symbols
        are computed in-program as round(y_i - mu_i), and the y_hat chain
        reads them instead of the entropy-decoded symbols), then encodes
        the streams under the (indexes, symbols) this program returns —
        the certified-encode handshake, now also the encoder's ONLY
        channel-AR pass. A deterministic executable makes the real decode
        (override=False) reproduce those indexes bitwise as long as the
        decoded symbols equal the returned ones, which holds
        slice-by-slice by induction once the encoder codes exactly those
        symbols under exactly those indexes. Decoders pass override=False
        and zeros for true_y.

        chained=True (round-5 default stream format): `states` is ONE
        (K,) lane-state vector spanning all slices — slice i's decode
        starts from slice i-1's final states, and the base-state
        checksum applies once, after the last slice (the 5x smaller
        header; entropy/device_decode.py encode_slices_with_patches).
        chained=False keeps the legacy per-slice (S, K) states.

        Returns (y_hat, ok, idxs, syms) — ok is the all-slices checksum
        (stream fully consumed + every lane back at 2^16), which catches
        stream corruption and any residual index divergence (e.g. a
        decoder compiled with different flags) at decode time; idxs
        (S, B, yh, yw, sd) int8 and syms (same, int32) are the per-slice
        index/symbol chains (consumed by the certified encoder, ignored
        and never fetched by decoders)."""
        from dcae_tpu.entropy.device_decode import (RANS_L16,
                                                    decode_interleaved,
                                                    decode_interleaved_chain)

        latent_scales, latent_means = self.hyper_synthesis(z_hat)
        B = z_hat.shape[0]
        y_h, y_w = latent_scales.shape[1], latent_scales.shape[2]
        sd = self.cfg.slice_dim
        K = states.shape[-1]
        y_slices = jnp.split(true_y.astype(jnp.float32),
                             self.cfg.num_slices, axis=-1)
        y_hat = jnp.zeros((B, y_h, y_w, 0), jnp.float32)
        ok = jnp.bool_(True)
        chain_states = states if chained else None  # (K,) threaded
        idx_list, sym_list = [], []
        for i in range(self.cfg.num_slices):
            prev = ([] if i == 0 else list(jnp.split(y_hat, i, axis=-1)))
            support, mu, sigma = self._slice_context(
                i, latent_scales, latent_means, prev, y_h, y_w)
            indexes = gaussian.build_indexes(
                sigma, scale_table, self.cfg.scales_min).astype(jnp.int32)
            idx_list.append(indexes.astype(jnp.int8))
            # the certified-encode replay (override=True) never reads the
            # decoded symbols, so the entropy-decode loop sits behind a
            # RUNTIME branch: the encoder skips its cost entirely while
            # both modes still run the one shared executable (lax.cond
            # executes a single branch at run time; the integer decode
            # has no numerics to perturb, and the f32 context chain —
            # the part cross-program certification exists for — stays
            # outside the branch)
            n_i = indexes.size
            if chained:
                sym, ok_i, chain_states = jax.lax.cond(
                    override,
                    lambda st: (jnp.zeros((n_i,), jnp.int32),
                                jnp.bool_(True), st),
                    lambda st: decode_interleaved_chain(
                        words[i], n_words[i], st, indexes.reshape(-1),
                        lut_sym, lut_sf, K, unroll, paired),
                    chain_states)
            else:
                sym, ok_i = jax.lax.cond(
                    override,
                    lambda: (jnp.zeros((n_i,), jnp.int32), jnp.bool_(True)),
                    lambda: decode_interleaved(
                        words[i], n_words[i], states[i], indexes.reshape(-1),
                        lut_sym, lut_sf, K, unroll, paired))
            sym = sym.at[patch_pos[i]].set(patch_val[i], mode="drop")
            sym_enc = jnp.round(y_slices[i] - mu).astype(jnp.int32)
            sym = jnp.where(override, sym_enc.reshape(-1), sym)
            sym_list.append(sym.reshape(B, y_h, y_w, sd))
            y_hat_slice = self._apply_symbols(
                i, support, mu,
                sym.reshape(B, y_h, y_w, sd).astype(jnp.float32))
            y_hat = jnp.concatenate([y_hat, y_hat_slice], axis=-1)
            ok = ok & ok_i
        if chained:
            # the end-to-end checksum moves to the end of the chain: every
            # lane must return to the 2^16 base after the LAST slice
            ok = ok & (jnp.all(chain_states == jnp.uint32(RANS_L16))
                       | override)
        return y_hat, ok, jnp.stack(idx_list), jnp.stack(sym_list)

    def decode_all(self, z_hat: jax.Array, symbols: jax.Array) -> jax.Array:
        """Whole-decode-in-one-program: all slices' symbols are already
        known (encoder-shipped coding indexes, ref DCAE_6 models/dcae_6.py:
        760-778, let the host rANS run to completion without the per-slice
        device round trips), so the full channel-AR chain + synthesis fuses
        into a single device call — decode latency drops from 6 dispatch
        round trips to 1. symbols: (B, yh, yw, M) int.
        No bit-agreement constraint applies here: sigma->index recomputation
        is skipped entirely (indexes were shipped), so cross-program f32
        fusion differences cannot desynchronize the stream."""
        latent_scales, latent_means = self.hyper_synthesis(z_hat)
        B = z_hat.shape[0]
        y_h, y_w = latent_scales.shape[1], latent_scales.shape[2]
        sd = self.cfg.slice_dim
        y_hat = jnp.zeros((B, y_h, y_w, 0), jnp.float32)
        for i in range(self.cfg.num_slices):
            prev = ([] if i == 0 else list(jnp.split(y_hat, i, axis=-1)))
            support, mu, _sigma = self._slice_context(
                i, latent_scales, latent_means, prev, y_h, y_w)
            y_hat_slice = self._apply_symbols(
                i, support, mu,
                symbols[..., i * sd:(i + 1) * sd].astype(jnp.float32))
            y_hat = jnp.concatenate([y_hat, y_hat_slice], axis=-1)
        return jnp.clip(self.g_s(y_hat).astype(jnp.float32), 0.0, 1.0)

    def latent_decompress(self, y: jax.Array) -> jax.Array:
        """Latent-handoff decode (ref DCAE_4, models/dcae_4.py:867-918):
        the 'bitstream' is the raw latent y; z is re-derived on the decoder,
        and each slice is re-quantized against its own context. One fused
        device program."""
        cfg = self.cfg
        B, y_h, y_w, _ = y.shape
        y = y.astype(jnp.float32)
        z = self.h_a(y).astype(jnp.float32)
        medians = self.eb_medians().reshape(1, 1, 1, -1)
        z_hat = jnp.round(z - medians) + medians
        latent_scales, latent_means = self.hyper_synthesis(z_hat)

        y_slices = jnp.split(y, cfg.num_slices, axis=-1)
        y_hat_slices: List[jax.Array] = []
        for i, y_slice in enumerate(y_slices):
            support, mu, _ = self._slice_context(
                i, latent_scales, latent_means, y_hat_slices, y_h, y_w)
            y_hat_slice = jnp.round(y_slice - mu) + mu
            y_hat_slice = y_hat_slice + self._slice_lrp(i, support,
                                                        y_hat_slice)
            y_hat_slices.append(y_hat_slice)
        y_hat = jnp.concatenate(y_hat_slices, axis=-1)
        return jnp.clip(self.g_s(y_hat).astype(jnp.float32), 0.0, 1.0)
