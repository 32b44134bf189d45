"""Frozen configuration dataclasses for the MIMAMO-TPU framework.

The reference (wtomin/MIMAMO-Net) scatters its hyperparameters across
argparse defaults and constructor kwargs (``save_size=112``, ``phase_size=48``,
``num_phase=12`` — see SURVEY.md §5 "Config / flag system"; the reference
mount is empty, so values follow SURVEY.md Appendix B defaults). Here every
knob lives in one frozen, hashable dataclass tree so configs can be closed
over by ``jax.jit`` as static arguments.

Conventions pinned for parity (SURVEY.md Appendix A):
  * Pyramid radial coordinate normalized so the spectrum edge midpoint is
    r = pi; raised-cosine transitions are one octave wide in log2(r).
  * Band at scale index ``s`` (0-based) lives on a grid of spatial size
    (H / 2**s, W / 2**s) — scale 0 is full resolution, matching the
    reference's recursive frequency-domain cropping.
  * Phase diff: ``angle(c_t * conj(c_{t-1}))`` (product form), wrapped to
    (-pi, pi], resized to ``phase_size`` with bilinear interpolation.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class PyramidSpec:
    """Complex steerable pyramid configuration (SURVEY.md Appendix A.1)."""

    height: int = 3           # number of oriented band scales S
    orientations: int = 4     # number of angular bands K
    input_size: Tuple[int, int] = (112, 112)  # H, W of grayscale crops
    # Include the (-i)**(K-1) analytic-band constant (SCFpyr convention).
    complex_factor: bool = True
    # "fft": jnp.fft (exact); "matmul": DFT as complex matmuls on the MXU
    # with fftshift baked into the matrices (XLA's TPU FFT lowering is
    # slow at these sizes); "auto": matmul on TPU, fft elsewhere.
    # Parity between the modes is oracle-tested to ~1e-4.
    fft_mode: str = "auto"
    # MXU pass count for the DFT matmuls (matmul mode only; CPU f32 is
    # exact regardless): "highest" = 6-pass bf16 error compensation,
    # "high" = 3-pass. MEASURED ON HARDWARE against the float64 NumPy
    # oracle at the flagship 112x112 shape
    # (bench/phase_precision_experiments.py, BASELINE.md round 4):
    # "highest" 1.7e-5 max phase error; "high" **1.40 rad** — phase at
    # low-amplitude band coefficients amplifies the uncompensated bf16
    # residual unboundedly, so "high" FAILS the 1e-3 parity budget and
    # saves only ~5% of the phase stage. Keep "highest".
    dft_precision: str = "highest"

    def band_shape(self, scale: int) -> Tuple[int, int]:
        h, w = self.input_size
        return h >> scale, w >> scale

    def __post_init__(self):
        h, w = self.input_size
        if h % (1 << self.height) or w % (1 << self.height):
            raise ValueError(
                f"input_size {self.input_size} must be divisible by "
                f"2**height = {1 << self.height}"
            )
        if self.fft_mode not in ("auto", "fft", "matmul"):
            raise ValueError(f"fft_mode must be 'auto', 'fft' or "
                             f"'matmul', got {self.fft_mode!r}")
        if self.dft_precision not in ("highest", "high"):
            raise ValueError(f"dft_precision must be 'highest' or "
                             f"'high', got {self.dft_precision!r}")


@dataclasses.dataclass(frozen=True)
class PhaseSpec:
    """Inter-frame phase-difference (micro-motion) configuration (A.2)."""

    phase_size: int = 48       # output resolution of each phase-diff map
    # num_phase channels = pyramid.height * pyramid.orientations (12 default)
    amplitude_weighting: bool = False  # SURVEY.md App. B item 4: default off


@dataclasses.dataclass(frozen=True)
class BackboneSpec:
    """ResNet-50 FER+ appearance stream (SURVEY.md Appendix A.5)."""

    input_size: int = 224
    feature_dim: int = 2048    # pool5 embedding width
    num_classes: int = 8       # FER+ emotion classes (classifier head kept
    #                            for checkpoint parity; unused downstream)
    # MatConvNet-converted preprocessing: float32 pixels in 0..255, per-
    # channel mean subtraction, NO /255, NO std. Mean must be overwritten
    # from real checkpoint metadata when assets are available (SURVEY A.5).
    mean_rgb: Tuple[float, float, float] = (131.0912, 103.8827, 91.4953)
    channel_order: str = "rgb"  # "rgb" | "bgr"; set from checkpoint metadata
    dtype: str = "float32"      # compute dtype: "float32" | "bfloat16"
    # Fold inference-mode BN into conv kernels/biases on the inference
    # path (backbone.fold_batchnorm): removes ~53 elementwise passes over
    # activations per forward. Training (train=True) always uses real BN.
    fold_bn_inference: bool = True
    # Opt-in serving profile (NOT reference parity, like input_size=112):
    # run the ResNet on every k-th frame only and linearly interpolate
    # pool5 embeddings between anchors. Appearance changes slowly across
    # adjacent frames while the backbone is ~80% of step time; the
    # micro-motion stream still sees EVERY frame, preserving the model's
    # phase sensitivity. Measured numbers in BASELINE.md. Scope: applies
    # wherever embed_frames runs (inference paths and frozen-backbone
    # training); the fine-tuning path ignores it (gradients need the
    # real per-frame backbone). Streaming chunks anchor per chunk, so
    # for k > 1 chunked-streaming outputs differ slightly from batch
    # prediction of the same frames (anchor grids shift at chunk seams).
    # Error bar (bench/stride_drift.py, flagship shapes, chunk 16,
    # smooth drifting clip, random-init weights, 2026-08-17): max
    # |stream - batch| ~= 0.005 absolute ~= 3.5-3.8% of output std at
    # k=2 and k=4; drift is provably zero before the first in-chunk
    # anchor clamp (tests/test_runner.py seam-drift test).
    appearance_stride: int = 1
    # Stem lowering for the fused inference path when input_size is
    # exactly 2x the crop size. "composite" folds the 2x bilinear
    # upscale INTO conv1 as one 5x5 stride-1 conv on the half-res crop
    # (with an exact 2-pixel edge correction — backbone.composite_stem),
    # eliminating the 224-square input materialization, the largest
    # intermediate on the serving path (~4 ms of a ~40 ms step,
    # BASELINE.md round-4 row). Same math as upscale-then-conv up to
    # f32-accumulation reassociation; parity-tested against the
    # reference lowering in tests/test_backbone.py. "upscale" keeps the
    # reference two-step lowering. Training and non-folded-BN paths
    # always use "upscale".
    stem_mode: str = "composite"   # "composite" | "upscale"
    # layer2 lowering for the fused bf16 inference path. "pallas" runs
    # the four layer2 bottlenecks as ONE VMEM-resident kernel
    # (pallas/layer2_kernel.py): the roofline's biggest bytes-bound
    # stage (74% of measured HBM BW at 46% MFU) fused past XLA's
    # conv-boundary fusion limit. Requires fold_bn_inference, bf16
    # backbone dtype, and a real TPU (non-TPU backends fall back to
    # the conv path at trace time). Default per the measured verdict
    # in BASELINE.md round 4; training and non-folded paths always use
    # "conv".
    layer2_mode: str = "conv"      # "conv" | "pallas"

    def __post_init__(self):
        if self.appearance_stride < 1:
            raise ValueError(
                f"appearance_stride must be >= 1, got "
                f"{self.appearance_stride}")
        if self.stem_mode not in ("composite", "upscale"):
            raise ValueError(f"stem_mode must be 'composite' or "
                             f"'upscale', got {self.stem_mode!r}")
        if self.layer2_mode not in ("conv", "pallas"):
            raise ValueError(f"layer2_mode must be 'conv' or 'pallas', "
                             f"got {self.layer2_mode!r}")


@dataclasses.dataclass(frozen=True)
class TemporalSpec:
    """Two-stream GRU temporal model."""

    # Stream ablations (the MIMAMO paper's results table compares the
    # micro-only and macro-only baselines against the fused model):
    # "both" | "micro" | "macro". Single-stream models create no
    # parameters for (and never compute) the inactive stream — the
    # runner skips the pyramid for "macro" and the ResNet for "micro".
    streams: str = "both"
    micro_cnn_features: Tuple[int, ...] = (64, 128)  # conv widths
    micro_embed_dim: int = 256
    macro_embed_dim: int = 256   # projection of the 2048-d feature
    gru_hidden: int = 256        # per-stream GRU hidden size
    gru_layers: int = 1          # stacked GRU layers per stream
    fusion_hidden: int = 256
    num_outputs: int = 2         # (valence, arousal)
    output_activation: str = "linear"  # "linear" | "tanh"
    # Snippet aggregation (MIMAMO paper structure, SURVEY.md App. B #3):
    # 1 = per-frame GRU steps (default); W > 1 groups the clip into
    # T/W snippets — within-snippet pair embeddings are mean-pooled and
    # frame features snippet-averaged, the GRUs step once per snippet,
    # and outputs are broadcast back to frames.
    snippet_len: int = 1
    # Advance both streams' recurrences inside ONE lax.scan (identical
    # math; halves the sequential matmul chain — the GRUs are latency-
    # bound on TPU). False runs the two scans back-to-back.
    fused_gru: bool = True
    # lax.scan unroll factor for the GRU recurrences (identical math,
    # op-for-op — bit-parity tested; the scan body is replicated k
    # times per iteration, amortizing per-step loop overhead on the
    # latency-bound recurrence). Hardware A/B in BASELINE.md round 4.
    scan_unroll: int = 1
    dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class ClipSpec:
    """Clip / window hyperparameters (north-star: 48-frame clips)."""

    clip_len: int = 48
    stride: int = 24            # sliding-window stride (clip_len // 2)
    crop_size: int = 112        # aligned face-crop size (reference: 112)
    fps: Optional[float] = None  # metadata only


@dataclasses.dataclass(frozen=True)
class TrainSpec:
    learning_rate: float = 1e-4
    weight_decay: float = 0.0
    # "constant" | "cosine" (linear warmup over warmup_steps, cosine
    # decay to 0 over the run; needs total_steps at optimizer build).
    lr_schedule: str = "constant"
    warmup_steps: int = 0
    batch_size: int = 4          # clips per step per replica
    epochs: int = 20
    loss: str = "ccc"            # "ccc" | "ccc+mse"
    mse_weight: float = 0.0
    # On-device augmentation inside the jitted train step (deterministic
    # per step: rng folded from seed + state.step). Only valid when the
    # appearance stream runs online — cached .feat.npy features cannot
    # reflect an augmented crop, so augment + batch["features"] raises.
    augment: bool = False            # per-clip random horizontal flip
    brightness_jitter: float = 0.0   # per-clip scale in [1-j, 1+j]
    # CCC axis: "time" = per-clip over frames (frame-level labels, e.g.
    # Aff-Wild2); "batch" = over the clip batch using time-averaged
    # predictions (utterance-level labels, e.g. OMG — per-clip time-CCC
    # is degenerate there because the target is constant over the clip).
    loss_axis: str = "time"
    seed: int = 0
    freeze_backbone: bool = True  # reference trains on cached features

    def __post_init__(self):
        # loss and mse_weight are one knob wearing two flags (the train
        # step consumes only mse_weight); enforce coherence so a config
        # can't claim "ccc" while silently training with an MSE term
        # (VERDICT round-4 missing item 4: these were config-only and
        # unvalidated).
        if self.loss not in ("ccc", "ccc+mse"):
            raise ValueError(f"loss must be 'ccc' or 'ccc+mse', got "
                             f"{self.loss!r}")
        if self.loss == "ccc+mse" and self.mse_weight <= 0:
            raise ValueError("loss='ccc+mse' requires mse_weight > 0")
        if self.loss == "ccc" and self.mse_weight:
            raise ValueError(f"mse_weight={self.mse_weight} requires "
                             f"loss='ccc+mse'")
        if self.weight_decay < 0:
            raise ValueError(f"weight_decay must be >= 0, got "
                             f"{self.weight_decay}")
    # Rematerialize the backbone forward in the backward pass (only
    # relevant with freeze_backbone=False): trades ~1.3x compute for
    # activation memory, letting full fine-tuning fit larger clip
    # batches per chip.
    remat_backbone: bool = True


@dataclasses.dataclass(frozen=True)
class MimamoConfig:
    """Top-level config for the full pipeline."""

    pyramid: PyramidSpec = PyramidSpec()
    phase: PhaseSpec = PhaseSpec()
    backbone: BackboneSpec = BackboneSpec()
    temporal: TemporalSpec = TemporalSpec()
    clip: ClipSpec = ClipSpec()
    train: TrainSpec = TrainSpec()
    # Use the Pallas fused phase-diff kernel (pallas/phase_kernel.py) on
    # TPU. Default False: measured on v5e 2026-08-16, XLA's own fusion of
    # the same chain remains fastest at flagship shapes (phase path:
    # XLA 10.5k f/s vs blocked-Pallas 10.0k; a per-pair variant measured
    # 8.8k and was removed — negative result in BASELINE.md). The blocked
    # kernel is kept, parity-tested (<5e-7), implements the
    # amplitude_weighting knob in-kernel, and wins at smaller
    # (band-count-poor) shapes where XLA leaves the VPU idle.
    use_pallas: bool = False

    @property
    def num_phase(self) -> int:
        return self.pyramid.height * self.pyramid.orientations


DEFAULT_CONFIG = MimamoConfig()
