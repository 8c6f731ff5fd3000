"""Model/runtime configuration.

The reference encodes every variant as a separate forked model file
(/root/reference/models/dcae*.py — 11 near-identical copies). Here every
variant is *configuration* of one codec: drift-robust training, split
deployment, table shipping, and device placement are all fields or runtime
options, not forks.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class DCAEConfig:
    """Hyperparameters of the DCAE codec.

    Defaults reproduce the reference model (see
    /root/reference/models/dcae.py:512-614): N=192, M=320, 5 channel-AR
    slices, feature dims (96,144,256), (1,2,12) transformer blocks per stage,
    window 8 (main) / 4 (hyper), a 128x640 dictionary with 20 heads.
    """

    N: int = 192                      # hyper transform width
    M: int = 320                      # latent (y) channels
    num_slices: int = 5               # channel-AR slices
    max_support_slices: int = 5
    feature_dim: Tuple[int, int, int] = (96, 144, 256)
    block_num: Tuple[int, int, int] = (1, 2, 12)
    head_dim: Tuple[int, int, int, int, int, int] = (8, 16, 32, 32, 16, 8)
    window_size: int = 8
    hyper_window_size: int = 4
    hyper_head_dim: int = 32
    in_channels: int = 3
    out_channels: int = 3

    # dictionary cross-attention entropy model
    dict_num: int = 128
    dict_head_num: int = 20
    dict_head_dim: int = 32
    mlp_rate: int = 4
    qkv_bias: bool = True

    # per-slice context-transform hidden widths (cc_mean/cc_scale/lrp nets,
    # ref models/dcae.py:584-611)
    cc_hidden: Tuple[int, int] = (224, 128)

    # entropy bottleneck (factorized prior over z)
    eb_channels: int = 192
    eb_filters: Tuple[int, ...] = (3, 3, 3, 3)
    eb_init_scale: float = 10.0
    eb_tail_mass: float = 1e-9

    # Gaussian conditional scale table
    scales_min: float = 0.11
    scales_max: float = 256.0
    scales_levels: int = 64
    gc_tail_mass: float = 1e-9

    # drift-robust training (reference fork's DriftSimulator,
    # /root/reference/models/dcae_7.py:424-438): uniform +/-noise injected
    # into decoder-side support/mu/sigma and the transferred z_hat during
    # training. 0 disables (the paper model).
    drift_noise: float = 0.0

    # compute dtype for the transforms ("float32" or "bfloat16"); entropy
    # parameters/likelihoods always run in float32.
    compute_dtype: str = "float32"

    # fused Pallas kernels (ops/pallas/wmsa_v3 window attention + conv_glu
    # LN+GLU, incl. the DCA entropy-model GLU) in shapes that qualify.
    # DCAECodec flips it on automatically on TPU backends. Training keeps
    # the einsum path by default: the kernels' custom VJP recomputes the
    # forward, measured 0.47x vs XLA's stored-residual backward
    # (docs/PERF.md round-3 A/B) — a memory lever, not a speed one.
    # Parameter trees are identical either way.
    pallas_attention: bool = False

    # unroll the deep-stage lax.scan at trace time (same stacked param
    # tree): removes the scan's per-iteration dynamic-slice of ~8 MB of
    # stacked weights (measured 17% -> 0 of the encode program,
    # docs/PERF.md) at the cost of compile time and — under bf16 — of the
    # 1-call fused encoder's cross-program bit-agreement. Worth enabling
    # when the host-device dispatch latency is low (co-located serving);
    # off by default for the high-latency tunnel benched here.
    unroll_scan: bool = False

    @property
    def dict_dim(self) -> int:
        return self.dict_head_dim * self.dict_head_num

    @property
    def slice_dim(self) -> int:
        return self.M // self.num_slices

    @property
    def prior_dim(self) -> int:
        return self.M

    def query_dim(self, slice_index: int) -> int:
        """Channels of the slice-i query: latent_scales + latent_means +
        previously decoded slices."""
        i = min(slice_index, self.max_support_slices)
        return 2 * self.M + self.slice_dim * i

    def support_dim(self, slice_index: int) -> int:
        """query + dictionary info (M channels)."""
        return self.query_dim(slice_index) + self.M

    @property
    def y_downsample(self) -> int:
        """Total stride of g_a (x -> y): one stride-2 per feature stage plus
        the final conv (ref models/dcae.py:541-558)."""
        return 2 ** (len(self.feature_dim) + 1)

    @property
    def z_downsample(self) -> int:
        """Total stride of x -> z: g_a then h_a's two stride-2 layers
        (ref models/dcae.py:560-566)."""
        return self.y_downsample * self.hyper_ratio

    @property
    def hyper_ratio(self) -> int:
        """Spatial ratio between y and z (h_a: RBBS stride 2 + conv stride
        2); the decoder derives y's geometry as z_shape * hyper_ratio."""
        return 4

    @property
    def pad_multiple(self) -> int:
        # windows at y-resolution need divisibility by window_size:
        # 16*8 = 128, matching the reference eval protocol.
        return self.y_downsample * self.window_size

    @classmethod
    def tiny(cls, **overrides) -> "DCAEConfig":
        """A small config for unit tests (same topology, tiny dims)."""
        base = dict(
            N=16,
            M=20,
            num_slices=5,
            feature_dim=(8, 12, 16),
            block_num=(1, 1, 2),
            head_dim=(4, 4, 4, 4, 4, 4),
            window_size=4,
            hyper_window_size=2,
            hyper_head_dim=8,
            dict_num=8,
            dict_head_num=2,
            dict_head_dim=8,
            cc_hidden=(16, 12),
            eb_channels=16,
            eb_init_scale=10.0,
        )
        base.update(overrides)
        return cls(**base)
