"""On-device rANS decode of the K-lane interleaved profile.

The classic decode path is host-bound: the channel-AR loop must ship
sigma->CDF indexes to the host, rANS-decode there, and ship symbols back —
6 dispatch round trips per batch on a remote-accelerator link. This module
decodes the interleaved stream format (native/rans.cpp
`dcae_rans_encode_interleaved`) entirely inside an XLA program:

  * K lanes advance in lock-step as (K,)-vector uint32 ops — one symbol per
    lane per `lax.fori_loop` iteration (VPU work, no data-dependent shapes);
  * the slot->(symbol, start, freq) search is a flat device-resident LUT
    gather (rows x 2^16 entries, built once per table bake) instead of a
    per-symbol binary search;
  * lanes share ONE word stream: which lanes renorm this iteration is a
    mask, and each consuming lane's word position is ptr + cumsum(mask) —
    the exact positions the encoder's reversed round-robin emitted.

Everything is uint32 arithmetic (16-bit renorm words), so it runs under
JAX's default 32-bit ints on TPU and CPU alike. The decoder returns an
`ok` flag (stream fully consumed AND every lane back at the encoder's
initial state 2^16) — a free end-to-end checksum.

No reference analog: the reference decodes on the CPU via CompressAI's
rANS (ref models/dcae.py:875-893). This is the TPU-native redesign of that
step; the classic host path remains the default/compatibility format.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

SLOTS = 1 << 16
RANS_L16 = 1 << 16


def build_slot_tables(cdfs, cdf_lengths, offsets, paired: bool = False
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Flat slot LUTs for the device decoder.

    paired=False (classic) returns (lut_sym, lut_df), each (rows * 2^16,):
      lut_sym int32 — the decoded SYMBOL VALUE (bucket + row offset baked);
      lut_df uint32 — (slot - cdf start) in the low 16 | freq-1 in the
        high 16. Storing slot-start instead of start keeps the state
        update x2 = freq*(x>>16) + (slot-start) to ONE in-loop gather
        (data-dependent gathers are scalar-core bound on TPU, ~15 ns per
        element; the symbol lookup moves to one amortized post-loop
        gather — see decode_interleaved).

    paired=True returns (row_offsets int32 (rows,), lut2 u32 (rows*2^16, 2))
      lut2[:, 0] — the df word above; lut2[:, 1] — the BUCKET POSITION.
      The decode loop gathers the (df, pos) PAIR with one index (same
      scalar-core fetch count, contiguous second element) and records pos
      directly, so the 3.9M-element post-loop symbol gather disappears —
      symbols become pos + row offset via a broadcast compare-sum over
      the tiny row table (one VPU pass; round-4 xprof: the post-loop
      gather was 33.8 ms/batch-8, the biggest single decode op).
    """
    cdfs = np.asarray(cdfs, np.int64)
    cdf_lengths = np.asarray(cdf_lengths, np.int64).reshape(-1)
    offsets = np.asarray(offsets, np.int64).reshape(-1)
    rows = cdfs.shape[0]
    lut_sym = np.zeros((rows, SLOTS), np.int32)
    lut_df = np.zeros((rows, SLOTS), np.uint32)
    lut_pos = np.zeros((rows, SLOTS), np.uint32) if paired else None
    slot_ids = np.arange(SLOTS, dtype=np.uint32)
    for r in range(rows):
        L = int(cdf_lengths[r])
        cdf = cdfs[r, :L]
        if L < 2 or cdf[0] != 0 or cdf[-1] != SLOTS:
            raise ValueError(f"row {r}: invalid CDF (len {L})")
        counts = np.diff(cdf)  # (L-1,) bucket frequencies, sum == 2^16
        pos = np.repeat(np.arange(L - 1, dtype=np.int64), counts)
        lut_sym[r] = (pos + offsets[r]).astype(np.int32)
        starts = np.repeat(cdf[:-1], counts).astype(np.uint32)
        freqs = np.repeat(counts, counts).astype(np.uint32)
        lut_df[r] = (slot_ids - starts) | ((freqs - 1) << np.uint32(16))
        if paired:
            lut_pos[r] = pos.astype(np.uint32)
    if paired:
        lut2 = np.stack([lut_df.reshape(-1), lut_pos.reshape(-1)], axis=1)
        return offsets.astype(np.int32), lut2
    return lut_sym.reshape(-1), lut_df.reshape(-1)


def row_offset_bcast(indexes: jax.Array, offsets: jax.Array) -> jax.Array:
    """Per-symbol row offset WITHOUT a data-dependent gather: broadcast
    compare+weighted-sum over the tiny row table (the searchsorted
    replacement transform, docs/PERF.md round 2). indexes (n,) int32,
    offsets (rows,) int32 -> (n,) int32."""
    rows = offsets.shape[0]
    ge = indexes[:, None] >= jnp.arange(1, rows, dtype=jnp.int32)
    return offsets[0] + jnp.sum(
        jnp.where(ge, jnp.diff(offsets)[None, :], 0), axis=-1)


def decode_interleaved(words: jax.Array, n_words: jax.Array,
                       states: jax.Array, indexes: jax.Array,
                       lut_sym: jax.Array, lut_df: jax.Array,
                       lanes: int, unroll: int = 1, paired: bool = False
                       ) -> Tuple[jax.Array, jax.Array]:
    """Env-flag resolving wrapper: the word-select VARIANT knobs
    (DCAE_IL_SELECT2 / DCAE_IL_WINDOW) are part of the jit cache key, so
    flipping the env mid-process retraces instead of silently no-oping
    (ADVICE r4). The variants are NOT recorded in the DTI1 container —
    unlike lanes/unroll/paired they do not change the stream format or
    the decoded bits: INVARIANT (load-bearing): every select variant
    must be exact-integer-equivalent to `_select_flat`; a variant that
    is only approximately equal would silently break cross-process
    encode/decode agreement, so it must instead become a certified,
    container-recorded knob like unroll/paired."""
    import os
    select2 = os.environ.get("DCAE_IL_SELECT2", "0") == "1"
    window = os.environ.get("DCAE_IL_WINDOW", "1") == "1"
    scan = os.environ.get("DCAE_IL_SCAN", "0") == "1"
    syms, ok, _ = _decode_interleaved(words, n_words, states, indexes,
                                      lut_sym, lut_df, lanes, unroll,
                                      paired, select2, window,
                                      scan=scan)
    return syms, ok


def decode_interleaved_chain(words: jax.Array, n_words: jax.Array,
                             states: jax.Array, indexes: jax.Array,
                             lut_sym: jax.Array, lut_df: jax.Array,
                             lanes: int, unroll: int = 1,
                             paired: bool = False
                             ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One CHAINED slice decode: like decode_interleaved, but the lane
    states thread across consecutive streams (round-5 format: ONE K-lane
    set spans all slices, so the header is K states instead of S*K —
    the interleaved profile's rate tax drops 5x, VERDICT r4 item 2).
    `ok` here checks stream consumption only; the caller verifies the
    returned final states equal the 2^16 base AFTER the LAST slice
    (the end-to-end checksum moves to the end of the chain).
    Returns (symbols, ok_stream, final_states)."""
    import os
    select2 = os.environ.get("DCAE_IL_SELECT2", "0") == "1"
    window = os.environ.get("DCAE_IL_WINDOW", "1") == "1"
    scan = os.environ.get("DCAE_IL_SCAN", "0") == "1"
    return _decode_interleaved(words, n_words, states, indexes, lut_sym,
                               lut_df, lanes, unroll, paired, select2,
                               window, check_base=False, scan=scan)


@functools.partial(jax.jit, static_argnames=(
    "lanes", "unroll", "paired", "select2", "window", "check_base",
    "scan"))
def _decode_interleaved(words: jax.Array, n_words: jax.Array,
                        states: jax.Array, indexes: jax.Array,
                        lut_sym: jax.Array, lut_df: jax.Array,
                        lanes: int, unroll: int = 1, paired: bool = False,
                        select2: bool = False, window: bool = True,
                        check_base: bool = True, scan: bool = False
                        ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Decode `indexes.shape[0]` symbols from the interleaved stream.

    words: (W,) uint16 (W >= n_words; padding ignored); n_words: scalar
    int32 true word count; states: (lanes,) uint32 decode-start states;
    indexes: (n,) int32 CDF-row per symbol in stream order.
    unroll: symbols decoded per lane per loop iteration (amortizes the
    fori_loop's per-iteration overhead; results are identical).

    Data-dependent gathers dominate this loop (~15 ns/element on the
    scalar core, independent of table size), so the loop does exactly
    ONE: the packed (slot-start | freq-1) state-update LUT. The renorm
    WORD fetch — whose positions are ptr + cumsum(consume-mask), all
    within [ptr, ptr+K) — is instead a contiguous dynamic_slice window
    (a DMA, not a gather) plus a one-hot compare-select-reduce over the
    window (pure VPU): measured same-window on the TPU, the full decode
    program drops 159.7 -> 135.0 ms/batch-8 at trained rates. The
    decoded SLOTS are what the loop records; the slot->symbol lookup
    happens once, vectorized, after the loop (big gathers amortize ~2x
    better than in-loop ones).

    paired=True (round 4): lut_sym/lut_df are build_slot_tables(...,
    paired=True)'s (row_offsets, lut2) — the loop gathers the (df, pos)
    pair with ONE index and records the bucket position, so the
    post-loop symbol gather (33.8 ms/batch-8, the largest single decode
    op in the r4 xprof budget) is replaced by a broadcast compare-sum
    over the tiny row-offset table.

    Returns (symbols (n,) int32, ok bool)."""
    n = indexes.shape[0]
    K = lanes
    U = max(1, int(unroll))
    T = -(-n // K)
    Tp = -(-T // U) * U
    pad = Tp * K - n
    idx = jnp.concatenate(
        [indexes.astype(jnp.int32), jnp.zeros((pad,), jnp.int32)]
    ).reshape(Tp, K)
    active_rows = (jnp.arange(Tp * K, dtype=jnp.int32) < n).reshape(Tp, K)
    # K safety slots so the word window at ptr == n_words stays in bounds
    words_u32 = jnp.concatenate(
        [words.astype(jnp.uint32), jnp.zeros((K,), jnp.uint32)])
    u16mask = jnp.uint32(0xFFFF)
    lane_iota = jnp.arange(K, dtype=jnp.int32)
    # two-level word select (round 4): the flat one-hot select is a
    # K x K compare+where+reduce on the VPU every iteration (~1M element
    # ops at K=1024). Splitting local = hi*32 + lo turns the heavy part
    # into a (K, K/32) @ (K/32, 32) f32 MXU matmul (exact: u16 words and
    # 0/1 weights are f32-representable, exactly one nonzero per row)
    # and leaves only K x 32 VPU work. Falls back to the flat select for
    # small K (tests use K down to 1).
    LO = 32
    # Negative result, kept for the record (round 4): the two-level MXU
    # select lost to the flat VPU compare-reduce by ~20-30 ms/batch-8 in
    # BOTH alternating same-window A/B rounds (the tiny in-loop f32
    # HIGHEST matmul pipelines worse than the K x K VPU pass). Default
    # OFF; DCAE_IL_SELECT2=1 re-enables for experiments (a static jit
    # arg via the wrapper above, so env flips retrace).
    two_level = K >= 128 and K % LO == 0 and select2
    hi_iota = jnp.arange(K // LO, dtype=jnp.int32)
    lo_iota = jnp.arange(LO, dtype=jnp.int32)

    # Windowed select (round 4): the flat select compares every lane
    # against all K window positions (3 VPU passes over K x K), but only
    # ~bits/16 of lanes renorm per iteration (~4% at trained rates) — the
    # consumed prefix nearly always fits in K/4 positions. The cheap path
    # selects from the first WSEL positions (K x WSEL work); a lax.cond
    # falls back to the full K x K select on the (astronomically rare at
    # real rates, but possible) overflow step, preserving exactness.
    # DCAE_IL_WINDOW=0 disables (a static jit arg, like SELECT2).
    WSEL = max(32, K // 4)
    use_window = K >= 128 and not two_level and window
    wsel_iota = jnp.arange(WSEL, dtype=jnp.int32)

    def _select_flat(window, local):
        oh = local[:, None] == lane_iota[None, :]
        return jnp.sum(jnp.where(oh, window[None, :], jnp.uint32(0)),
                       axis=1)

    def _select_words(window, local, consumed):
        if not two_level and not use_window:
            return _select_flat(window, local)
        if use_window:
            return jax.lax.cond(
                consumed > WSEL,
                lambda w, l: _select_flat(w, l),
                lambda w, l: jnp.sum(
                    jnp.where(l[:, None] == wsel_iota[None, :],
                              w[None, :WSEL], jnp.uint32(0)), axis=1),
                window, local)
        hi = local // LO
        lo = local % LO
        oh_hi = (hi[:, None] == hi_iota[None, :]).astype(jnp.float32)
        win2 = window.reshape(K // LO, LO).astype(jnp.float32)
        rows = jax.lax.dot(oh_hi, win2,
                           precision=jax.lax.Precision.HIGHEST)  # (K, LO)
        picked = jnp.sum(
            jnp.where(lo[:, None] == lo_iota[None, :], rows, 0.0), axis=1)
        return picked.astype(jnp.uint32)

    def step(t, x, ptr, out):
        active = active_rows[t]
        idx_t = idx[t]
        slot = x & u16mask
        flat = idx_t * SLOTS + slot.astype(jnp.int32)
        if paired:
            pair = lut_df[flat]        # (K, 2): one gather, 2 values
            df = pair[:, 0]
            rec = pair[:, 1].astype(jnp.int32)  # bucket position
        else:
            df = lut_df[flat]
            rec = slot.astype(jnp.int32)
        delta = df & u16mask  # slot - cdf_start, baked per slot
        freq = (df >> jnp.uint32(16)) + jnp.uint32(1)
        x2 = freq * (x >> jnp.uint32(16)) + delta
        need = (x2 < jnp.uint32(RANS_L16)) & active
        need_i = need.astype(jnp.int32)
        cum = jnp.cumsum(need_i)
        local = cum - need_i  # in [0, K)
        window = jax.lax.dynamic_slice(words_u32, (ptr,), (K,))
        w = _select_words(window, local, cum[-1])
        x2 = jnp.where(need, (x2 << jnp.uint32(16)) | w, x2)
        x = jnp.where(active, x2, x)
        out = jax.lax.dynamic_update_index_in_dim(
            out, jnp.where(active, rec, 0), t, 0)
        return x, ptr + cum[-1], out

    def body(i, carry):
        x, ptr, out = carry
        for s in range(U):
            x, ptr, out = step(i * U + s, x, ptr, out)
        return x, ptr, out

    x0 = states.astype(jnp.uint32)
    if scan:
        # lax.scan variant (experiment, round 5): the recorded rows ride
        # scan's stacked ys instead of a (Tp, K) carry buffer mutated
        # with dynamic_update per iteration, and idx/active rows arrive
        # as sliced xs. Bit-identical math; A/B'd against the fori_loop
        # via xprof (docs/PERF.md round-5).
        def step_scan(x, ptr, idx_t, active):
            slot = x & u16mask
            flat = idx_t * SLOTS + slot.astype(jnp.int32)
            if paired:
                pair = lut_df[flat]
                df = pair[:, 0]
                rec = pair[:, 1].astype(jnp.int32)
            else:
                df = lut_df[flat]
                rec = slot.astype(jnp.int32)
            delta = df & u16mask
            freq = (df >> jnp.uint32(16)) + jnp.uint32(1)
            x2 = freq * (x >> jnp.uint32(16)) + delta
            need = (x2 < jnp.uint32(RANS_L16)) & active
            need_i = need.astype(jnp.int32)
            cum = jnp.cumsum(need_i)
            local = cum - need_i
            window = jax.lax.dynamic_slice(words_u32, (ptr,), (K,))
            w = _select_words(window, local, cum[-1])
            x2 = jnp.where(need, (x2 << jnp.uint32(16)) | w, x2)
            x = jnp.where(active, x2, x)
            return x, ptr + cum[-1], jnp.where(active, rec, 0)

        def scan_body(carry, xs):
            x, ptr = carry
            idx_u, act_u = xs          # (U, K) each
            recs = []
            for s in range(U):
                x, ptr, rec = step_scan(x, ptr, idx_u[s], act_u[s])
                recs.append(rec)
            return (x, ptr), jnp.stack(recs)

        (x, ptr), out = jax.lax.scan(
            scan_body, (x0, jnp.int32(0)),
            (idx.reshape(Tp // U, U, K), active_rows.reshape(Tp // U, U,
                                                            K)))
        out = out.reshape(Tp, K)
    else:
        out0 = jnp.zeros((Tp, K), jnp.int32)
        x, ptr, out = jax.lax.fori_loop(0, Tp // U, body,
                                        (x0, jnp.int32(0), out0))
    ok = ptr == n_words.astype(jnp.int32)
    if check_base:
        ok = ok & jnp.all(x == jnp.uint32(RANS_L16))
    rec = out.reshape(-1)[:n]
    if paired:
        syms = rec + row_offset_bcast(indexes.astype(jnp.int32), lut_sym)
    else:
        syms = lut_sym[indexes.astype(jnp.int32) * SLOTS + rec]
    return syms, ok, x


def build_enc_tables(cdfs, cdf_lengths, offsets
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Encode-side lookup for the interleaved profile.

    Returns (enc_sf, offsets_i32, maxpos_i32, stride):
      enc_sf (rows * stride,) uint32 — cdf start (low 16) | freq-1 (high 16)
        for bucket position p of row r at [r * stride + p];
      offsets_i32 (rows,) — symbol -> bucket position offset;
      maxpos_i32 (rows,) — number of IN-RANGE buckets (length-2; the escape
        bucket itself is out of range for this profile);
      stride — row stride of enc_sf.
    """
    cdfs = np.asarray(cdfs, np.int64)
    cdf_lengths = np.asarray(cdf_lengths, np.int64).reshape(-1)
    offsets = np.asarray(offsets, np.int64).reshape(-1)
    rows = cdfs.shape[0]
    stride = int(cdf_lengths.max())  # >= length-1 buckets + slack
    enc_sf = np.zeros((rows, stride), np.uint32)
    for r in range(rows):
        L = int(cdf_lengths[r])
        cdf = cdfs[r, :L]
        starts = cdf[:-1].astype(np.uint32)
        # TRUE freq in the high bits (unlike the decode LUT's freq-1):
        # 0 marks a zero-width bucket, which the device encoder must
        # ESCAPE exactly like the C++ encoder ('if (freq == 0) return
        # -3') — pmf_to_quantized_cdf never produces one, but externally
        # supplied tables can. freq 2^16 (single-bucket row) wraps to 0
        # and correctly escapes too: its row has no in-range buckets.
        freqs = np.diff(cdf).astype(np.uint32)
        enc_sf[r, :L - 1] = starts | (freqs << np.uint32(16))
    return (enc_sf.reshape(-1),
            offsets.astype(np.int32),
            (cdf_lengths - 2).astype(np.int32),
            stride)


@functools.partial(jax.jit, static_argnames=("lanes", "unroll"))
def encode_interleaved_device(symbols: jax.Array, indexes: jax.Array,
                              enc_sf: jax.Array, offsets: jax.Array,
                              maxpos: jax.Array, stride: int,
                              lanes: int, unroll: int = 1):
    """On-device K-lane interleaved rANS ENCODE (mirror of
    decode_interleaved; the streams are bit-identical to the C++
    encoder's). symbols/indexes: (n,) int32 in stream order.

    The sequential loop only advances lane states and records each
    iteration's emitted words as a CONTIGUOUS (Tp, K) row write (the
    same shape of store the decode loop uses) — per-word stream
    positions are NOT computed in-loop. They are a pure function of the
    emission mask, so one vectorized cumsum+scatter after the loop
    assembles the stream (the previous in-loop 1-word-granularity
    scatter + per-iteration cumsum made the encode loop ~3.5x the cost
    of the whole analysis transform on TPU; docs/PERF.md).

    Unlike the decoder, every table lookup here depends only on the
    INPUT (symbols, indexes) — so the (start | freq) gather and escape
    detection happen once, vectorized, before the loop, and the loop
    body is pure lane-state arithmetic. The u32 state division becomes
    an f32 reciprocal multiply (reciprocals precomputed outside) with a
    two-step integer correction — exact (q is within +-1 of truth: the
    renorm invariant bounds x < freq*2^16, so the f32 error is < 0.02),
    and ~30 ms/batch cheaper than u32 // on the VPU.

    Returns (words (cap,) uint16 in EMISSION order — the byte stream is
    the reversed prefix words[:n_words] — n_words int32, states (K,)
    uint32 decode-start states, escape bool). escape=True means some
    symbol fell outside its row's in-range buckets: the stream is invalid
    and the caller must fall back to the classic format."""
    idx1 = indexes.astype(jnp.int32)
    sym1 = symbols.astype(jnp.int32)
    pos = sym1 - offsets[idx1]
    in_range = (pos >= 0) & (pos < maxpos[idx1])
    pos_c = jnp.clip(pos, 0, stride - 1)
    return _encode_core(pos_c, idx1, in_range, enc_sf, stride, K=lanes,
                        U=max(1, int(unroll)))


def _encode_core(pos_c: jax.Array, idx1: jax.Array, in_range: jax.Array,
                 enc_sf: jax.Array, stride: int, K: int, U: int,
                 init_states: jax.Array = None):
    """encode_interleaved_device's engine, taking PRE-CLAMPED bucket
    positions and a row-validity mask so batch callers
    (encode_slices_with_patches) that already gathered the per-symbol
    offset/maxpos tables for clamping don't pay those 3.9M-element
    gathers twice (each costs ~29 ms/batch-8; see docs/PERF.md).

    init_states (K,) uint32: lane states to start from — the chained
    format (one lane set spanning all slices) feeds slice s+1's final
    encode states in as slice s's initial states; None = the 2^16 base
    (the classic per-slice format, and the LAST-encoded slice of a
    chain)."""
    n = idx1.shape[0]
    T = -(-n // K)
    Tp = -(-T // U) * U
    pad = Tp * K - n
    cap = n + 1  # <=1 renorm word per symbol
    idx = jnp.concatenate(
        [idx1, jnp.zeros((pad,), jnp.int32)]).reshape(Tp, K)
    posp = jnp.concatenate(
        [pos_c, jnp.zeros((pad,), jnp.int32)]).reshape(Tp, K)
    okp = jnp.concatenate(
        [in_range, jnp.zeros((pad,), bool)]).reshape(Tp, K)
    active_rows = (jnp.arange(Tp * K, dtype=jnp.int32) < n).reshape(Tp, K)
    u16mask = jnp.uint32(0xFFFF)

    # everything table-driven, hoisted out of the loop (one amortized
    # gather instead of Tp scalar-core-bound in-loop gathers)
    sf = enc_sf[idx * stride + posp]
    start_all = sf & u16mask
    freq_raw = sf >> jnp.uint32(16)  # TRUE freq; 0 = zero-width bucket
    esc = jnp.any(active_rows & ~(okp & (freq_raw > jnp.uint32(0))))
    freq_all = jnp.maximum(freq_raw, jnp.uint32(1))  # div-safety
    recip_all = 1.0 / freq_all.astype(jnp.float32)

    def step(t, x, wbuf):
        active = active_rows[t]
        start = start_all[t]
        freq = freq_all[t]
        need = ((x >> jnp.uint32(16)) >= freq) & active
        # -1 marks "no word emitted" for the post-loop compaction
        word = jnp.where(need, (x & u16mask).astype(jnp.int32), -1)
        wbuf = jax.lax.dynamic_update_index_in_dim(wbuf, word, t, 0)
        x2 = jnp.where(need, x >> jnp.uint32(16), x)
        # exact q = x2 // freq via f32 reciprocal + 2-step correction
        q = (x2.astype(jnp.float32) * recip_all[t]).astype(jnp.uint32)
        hi = x2 - q * freq
        q = q - (hi >> jnp.uint32(31))   # q one high: wrapped negative
        r = x2 - q * freq
        q = q + (r >= freq).astype(jnp.uint32)
        r = x2 - q * freq
        x = jnp.where(active, (q << jnp.uint32(16)) + r + start, x)
        return x, wbuf

    def body(i, carry):
        x, wbuf = carry
        for s in range(U):
            x, wbuf = step(Tp - 1 - (i * U + s), x, wbuf)
        return x, wbuf

    x0 = (jnp.full((K,), jnp.uint32(RANS_L16)) if init_states is None
          else init_states.astype(jnp.uint32))
    wbuf0 = jnp.full((Tp, K), -1, jnp.int32)
    x, wbuf = jax.lax.fori_loop(0, Tp // U, body, (x0, wbuf0))
    # assemble the stream: the loop ran t = Tp-1 .. 0 and (matching the
    # C++ encoder / decode_interleaved's consumption order) lanes emit
    # DESCENDING within an iteration, so emission order is wbuf reversed
    # on both axes; word positions are the running count of emissions
    seq = wbuf[::-1, ::-1].reshape(-1)
    emit = seq >= 0
    emit_i = emit.astype(jnp.int32)
    cum = jnp.cumsum(emit_i)
    wpos = jnp.where(emit, cum - 1, cap)  # cap -> dropped
    buf = jnp.zeros((cap,), jnp.int32).at[wpos].set(seq, mode="drop")
    return buf.astype(jnp.uint16), cum[-1], x, esc


def encode_slices_with_patches(y_syms: jax.Array, idxs: jax.Array,
                               enc_sf: jax.Array, offsets: jax.Array,
                               maxpos: jax.Array, stride: int, lanes: int,
                               unroll: int, patch_cap: int,
                               chain: bool = False) -> dict:
    """Per-slice interleaved rANS encode with the escape-patch side
    channel (shared by DCAE.encode_device_streams and the certified
    re-encode in models/codec.py).

    y_syms: (S, ...) int32 true symbols; idxs: (S, ...) int coding-index
    rows (any int dtype; flattened per slice). Each symbol is clamped
    into its row's in-range buckets for the stream; the true value of a
    clamped position rides the (pos, val) patch list, <= patch_cap
    entries per slice (patch_overflow set beyond — caller falls back to
    the classic format). escape fires only for rows with no in-range
    buckets at all.

    chain=True (round-5 default format): ONE K-lane state set spans all
    S slices — slices encode in REVERSE order (s = S-1 .. 0), each
    starting from the next slice's final states; the returned "states"
    is the single (K,) decode-start vector (after slice 0), and the
    header rate cost drops S-fold (VERDICT r4 item 2). The per-slice
    encode loops then run sequentially instead of vmapped (the decode
    side was always slice-sequential — channel-AR context); same-window
    A/B of the cost is in docs/PERF.md round 5. chain=False keeps the
    legacy per-slice (S, K) states (DTI1 containers)."""
    S = y_syms.shape[0]
    n = y_syms[0].size
    sym2 = y_syms.reshape(S, -1).astype(jnp.int32)
    idx2 = idxs.reshape(S, -1).astype(jnp.int32)
    # offset and maxpos per symbol WITHOUT a data-dependent gather: the
    # row table is tiny (the scale-table length), so both lookups ride
    # one broadcast compare+weighted-sum over row boundaries — the same
    # transform that replaced searchsorted in gaussian.build_indexes
    # (docs/PERF.md round 2). A row gather om[idx2] is a 3.9M-element
    # scalar-core gather (~29 ms/batch-8); this fuses to one VPU pass
    # over the indexes. Values pack into one int32 (offset biased to
    # 16 bits, maxpos in the high bits) so there is ONE pass, not two;
    # integer adds keep the prefix sums exact.
    om = ((offsets.astype(jnp.int32) + (1 << 15))
          + (maxpos.astype(jnp.int32) << 16))
    rows = om.shape[0]
    ge = idx2[..., None] >= jnp.arange(1, rows, dtype=jnp.int32)
    g = om[0] + jnp.sum(jnp.where(ge, jnp.diff(om)[(None, None)], 0),
                        axis=-1)
    offs = (g & 0xFFFF) - (1 << 15)
    mp = g >> 16
    pos_raw = sym2 - offs
    pos_cl = jnp.clip(pos_raw, 0, jnp.maximum(mp - 1, 0))
    esc_mask = pos_cl != pos_raw
    pcnt = esc_mask.sum(axis=1)

    # patch-position extraction (nonzero => cumsum + full-length scatter)
    # costs as much as the encode loop itself, but at trained rates most
    # slices have ZERO escapes — so it sits behind a per-slice runtime
    # lax.cond (outside the vmap: a real branch, not a select)
    def _extract(mask, sym):
        pos = jnp.nonzero(mask, size=patch_cap,
                          fill_value=n)[0].astype(jnp.int32)
        return pos, sym[jnp.minimum(pos, n - 1)]

    def _none():
        return (jnp.full((patch_cap,), n, jnp.int32),
                jnp.zeros((patch_cap,), jnp.int32))

    ppos, pval = [], []
    for s in range(S):
        pos, val = jax.lax.cond(
            pcnt[s] > 0,
            lambda m, sy: _extract(m, sy),
            lambda m, sy: _none(),
            esc_mask[s], sym2[s])
        ppos.append(pos)
        pval.append(val)

    if chain:
        # chained: slice s starts from slice s+1's final states, so the
        # S loops are strictly sequential (encode order S-1 .. 0)
        w_l, nw_l, esc_l = [None] * S, [None] * S, [None] * S
        st = None
        for s in reversed(range(S)):
            w_l[s], nw_l[s], st, esc_l[s] = _encode_core(
                pos_cl[s], idx2[s], (mp > 0)[s], enc_sf, stride,
                K=lanes, U=max(1, int(unroll)), init_states=st)
        words = jnp.stack(w_l)
        n_words = jnp.stack(nw_l)
        states = st  # (K,): the decode-start states (after slice 0)
        escs = jnp.stack(esc_l)
    else:
        # vmap over slices: all S sequential encode loops advance in ONE
        # fori_loop (S*K lanes of vector work per iteration instead of
        # K), amortizing the per-iteration loop overhead S-fold; the
        # clamped bucket positions feed the core directly (the clip
        # above already bounds them by maxpos-1 <= stride-1, and mp > 0
        # is row validity)
        words, n_words, states, escs = jax.vmap(
            lambda pc, ix, ok: _encode_core(pc, ix, ok, enc_sf, stride,
                                            K=lanes, U=max(1, int(unroll)))
        )(pos_cl, idx2, mp > 0)
    return {
        "words": words,
        "n_words": n_words,
        "states": states,
        "patch_pos": jnp.stack(ppos),
        "patch_val": jnp.stack(pval),
        "patch_count": pcnt,
        "patch_overflow": jnp.any(pcnt > patch_cap),
        "escape": jnp.any(escs),
    }
