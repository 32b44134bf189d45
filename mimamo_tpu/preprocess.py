"""On-device preprocessing: face crop/resize/normalize + clip windowing.

Reference behavior: the reference shells out to the OpenFace C++ binary to
detect/align/crop faces to 112x112 *on the host, one image file per frame*
(SURVEY.md §2 "Video preprocessor", L0/L1), then re-reads crops from disk.

TPU-first design (NORTH-STAR: "preprocessing moves on-device so video
decode is the only host-side step"): given per-frame face boxes from the
host decoder, crop + bilinear-resize is expressed as two *batched matmuls*
with per-frame interpolation matrices built on device from the box
coordinates (a hat-function of position differences — no gathers, rides
the MXU), followed by grayscale conversion and backbone normalization, all
inside the same XLA program as the model.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import BackboneSpec, ClipSpec
from .phase import resize_bilinear

# ITU-R BT.601 luma weights (cv2.cvtColor RGB2GRAY convention).
_LUMA_RGB = (0.299, 0.587, 0.114)


def _interp_matrix(starts: jnp.ndarray, sizes: jnp.ndarray, src: int,
                   dst: int) -> jnp.ndarray:
    """Per-frame bilinear sampling matrices as a hat function.

    Args:
      starts, sizes: [T] box start/size in source pixels (float, one axis).
      src: source extent; dst: output extent.

    Returns:
      [T, dst, src] weights; row i of frame t samples source position
      ``starts[t] + (i + 0.5) * sizes[t]/dst - 0.5`` with edge clamping.
    """
    i = jnp.arange(dst, dtype=jnp.float32)
    pos = starts[:, None] + (i[None, :] + 0.5) * (
        sizes[:, None] / dst) - 0.5                       # [T, dst]
    pos = jnp.clip(pos, 0.0, src - 1.0)
    j = jnp.arange(src, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, :, None] - j[None, None, :]))


def crop_and_resize(frames: jnp.ndarray, boxes: jnp.ndarray,
                    out_size: int) -> jnp.ndarray:
    """Crop per-frame face boxes and resize to (out_size, out_size).

    Args:
      frames: [T, H, W, C] float or uint8 source frames.
      boxes: [T, 4] pixel-space (y0, x0, height, width) face boxes.
      out_size: output spatial size (reference: 112).

    Returns:
      [T, out_size, out_size, C] float32 crops.
    """
    t, h, w, _c = frames.shape
    x = frames.astype(jnp.float32)
    ry = _interp_matrix(boxes[:, 0], boxes[:, 2], h, out_size)
    rx = _interp_matrix(boxes[:, 1], boxes[:, 3], w, out_size)
    return jnp.einsum("tph,thwc,tqw->tpqc", ry, x, rx,
                      preferred_element_type=jnp.float32)


def to_grayscale(frames_rgb: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, 3] RGB -> [..., H, W] BT.601 luma."""
    wts = jnp.asarray(_LUMA_RGB, frames_rgb.dtype)
    return jnp.tensordot(frames_rgb, wts, axes=([-1], [0]))


def for_backbone(crops_rgb: jnp.ndarray, spec: BackboneSpec) -> jnp.ndarray:
    """112x112 RGB crops (0..255) -> backbone input (resize + mean-sub).

    Matches the reference's upscale of aligned crops to the ResNet's
    224x224 input (SURVEY.md Appendix A.5), as fixed-matrix bilinear
    resize on the channel-last layout.
    """
    x = crops_rgb.astype(jnp.float32)
    if x.shape[-2] != spec.input_size:
        # DEFAULT matmul precision: the backbone casts to bf16 at conv1
        # anyway, so a HIGHEST-precision (3-pass) upscale buys nothing.
        prec = (jax.lax.Precision.HIGHEST if spec.dtype == "float32"
                else jax.lax.Precision.DEFAULT)
        x = jnp.moveaxis(
            resize_bilinear(jnp.moveaxis(x, -1, -3),
                            (spec.input_size, spec.input_size),
                            precision=prec), -3, -1)
    mean = jnp.asarray(spec.mean_rgb, jnp.float32)
    if spec.channel_order == "bgr":
        x = x[..., ::-1]
        mean = mean[::-1]
    return x - mean


def sliding_windows(x: jnp.ndarray, clip_len: int, stride: int
                    ) -> Tuple[jnp.ndarray, np.ndarray]:
    """Slice [T, ...] into overlapping [N, clip_len, ...] windows.

    The final window is right-aligned to cover the sequence tail, matching
    sliding-window inference over full videos. Returns (windows, starts).
    """
    t = x.shape[0]
    if t < clip_len:
        raise ValueError(f"sequence length {t} < clip_len {clip_len}")
    starts = list(range(0, t - clip_len + 1, stride))
    if starts[-1] != t - clip_len:
        starts.append(t - clip_len)
    starts = np.asarray(starts, np.int32)
    idx = starts[:, None] + np.arange(clip_len)[None, :]
    return x[jnp.asarray(idx)], starts


def merge_window_predictions(preds: jnp.ndarray, starts: np.ndarray,
                             total_len: int) -> jnp.ndarray:
    """Overlap-average [N, clip_len, D] window outputs back to [T, D].

    The reference maps window predictions back to frames with interpolation/
    smoothing (SURVEY.md §3.1 postprocess); overlap-averaging is the
    deterministic equivalent used here.
    """
    n, clip_len, d = preds.shape
    acc = jnp.zeros((total_len, d), preds.dtype)
    cnt = jnp.zeros((total_len, 1), preds.dtype)
    for i, s in enumerate(np.asarray(starts)):
        s = int(s)
        acc = acc.at[s:s + clip_len].add(preds[i])
        cnt = cnt.at[s:s + clip_len].add(1.0)
    return acc / jnp.maximum(cnt, 1.0)
