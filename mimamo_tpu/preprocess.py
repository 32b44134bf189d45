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
    # Two explicit batched GEMMs (t-batched [P,h]@[h,w*c], then
    # [Q,w]@[w,P*c]) — the fused three-operand einsum lowers poorly.
    y = jnp.einsum("tph,thwc->tpwc", ry, x,
                   preferred_element_type=jnp.float32)
    return jnp.einsum("tqw,tpwc->tpqc", rx, y,
                      preferred_element_type=jnp.float32)


def to_grayscale(frames_rgb: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, 3] RGB -> [..., H, W] BT.601 luma."""
    wts = jnp.asarray(_LUMA_RGB, frames_rgb.dtype)
    return jnp.tensordot(frames_rgb, wts, axes=([-1], [0]))


def _upscale2x_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Exact 2x bilinear upscale (half-pixel centers, edge clamp) along
    ``axis`` as a fixed 2-tap interleave.

    Output sample 2i sits at source position i - 0.25 (0.25*x[i-1] +
    0.75*x[i]); sample 2i+1 at i + 0.25 (0.75*x[i] + 0.25*x[i+1]) —
    identical weights to the ``_resize_matrix`` convention, but pure
    elementwise ops that XLA fuses, instead of a tiny-contraction einsum
    that lowers terribly on TPU (measured 28 ms of the 35 ms backbone
    stage before this change).
    """
    prev = _shift_clamp(x, 1, axis)
    nxt = _shift_clamp(x, -1, axis)
    even = 0.25 * prev + 0.75 * x
    odd = 0.75 * x + 0.25 * nxt
    stacked = jnp.stack([even, odd], axis=axis % x.ndim + 1)
    shape = list(x.shape)
    shape[axis % x.ndim] *= 2
    return stacked.reshape(shape)


def _shift_clamp(x: jnp.ndarray, shift: int, axis: int) -> jnp.ndarray:
    """Shift by +-1 along ``axis`` replicating the edge value (clamp).

    Slice + concat (not a gather): XLA fuses these into the surrounding
    elementwise ops.
    """
    n = x.shape[axis]
    if shift == 1:
        body = jax.lax.slice_in_dim(x, 0, n - 1, axis=axis)
        edge = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
        return jnp.concatenate([edge, body], axis=axis)
    assert shift == -1
    body = jax.lax.slice_in_dim(x, 1, n, axis=axis)
    edge = jax.lax.slice_in_dim(x, n - 1, n, axis=axis)
    return jnp.concatenate([body, edge], axis=axis)


def upscale2x(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear 2x upscale of the (-3, -2) spatial axes of [..., H, W, C].

    Bit-matches ``resize_bilinear`` at scale factor exactly 2 (tested);
    used for the reference's 112 -> 224 crop upscale.
    """
    return _upscale2x_axis(_upscale2x_axis(x, x.ndim - 3), x.ndim - 2)


def for_backbone(crops_rgb: jnp.ndarray, spec: BackboneSpec) -> jnp.ndarray:
    """112x112 RGB crops (0..255) -> backbone input (resize + mean-sub).

    Matches the reference's upscale of aligned crops to the ResNet's
    224x224 input (SURVEY.md Appendix A.5). The common exact-2x case
    uses the fused interleave upscale; other ratios fall back to the
    matmul-form resize on the channel-last layout.
    """
    # bf16 backbone: run the upscale + mean-sub chain in bf16 — the
    # backbone rounds its input to bf16 at conv1 anyway (0..255 ints are
    # exact in bf16; only interpolated fractions see one extra
    # rounding), and it halves the HBM traffic of the 224x224
    # materialization, the largest intermediate on the serving path.
    work = (jnp.bfloat16 if spec.dtype == "bfloat16" else jnp.float32)
    x = crops_rgb.astype(work)
    if x.shape[-2] != spec.input_size:
        if spec.input_size == 2 * x.shape[-2] == 2 * x.shape[-3]:
            x = upscale2x(x)
        else:
            # DEFAULT matmul precision: the backbone casts to bf16 at
            # conv1 anyway, so a HIGHEST (3-pass) upscale buys nothing.
            prec = (jax.lax.Precision.HIGHEST if spec.dtype == "float32"
                    else jax.lax.Precision.DEFAULT)
            x = jnp.moveaxis(
                resize_bilinear(jnp.moveaxis(x.astype(jnp.float32), -1,
                                             -3),
                                (spec.input_size, spec.input_size),
                                precision=prec), -3, -1).astype(work)
    mean = jnp.asarray(spec.mean_rgb, work)
    if spec.channel_order == "bgr":
        x = x[..., ::-1]
        mean = mean[::-1]
    return x - mean


def similarity_from_eyes(eyes: np.ndarray, out_size: int,
                         eye_y: float = 0.38, eye_dx: float = 0.28
                         ) -> np.ndarray:
    """Per-frame similarity transforms from eye landmarks (host side).

    The reference's OpenFace stage aligns faces with a similarity
    transform from tracked landmarks (SURVEY.md §2 "OpenFace"). Given
    ``eyes`` [T, 2, 2] = ((left_y, left_x), (right_y, right_x)) in source
    pixels, returns [T, 2, 3] inverse maps A such that output pixel
    (y, x) samples source position ``A @ (y, x, 1)``, placing the eyes at
    canonical positions (eye_y, 0.5 -/+ eye_dx) * out_size.

    Rotation+scale+translation only (no shear) — matching the aligned
    112x112 crops the reference consumes.
    """
    eyes = np.asarray(eyes, np.float64)
    t = eyes.shape[0]
    # canonical eye positions in output pixels
    dst_l = np.asarray([eye_y, 0.5 - eye_dx]) * out_size
    dst_r = np.asarray([eye_y, 0.5 + eye_dx]) * out_size
    dst_vec = dst_r - dst_l
    out = np.empty((t, 2, 3), np.float32)
    for i in range(t):
        src_vec = eyes[i, 1] - eyes[i, 0]
        denom = dst_vec @ dst_vec
        # complex-ratio form of the 2D similarity (y as real, x as imag):
        # c = src_vec / dst_vec with c = a + ib
        a = (src_vec @ dst_vec) / denom
        b = (src_vec[1] * dst_vec[0] - src_vec[0] * dst_vec[1]) / denom
        rot = np.asarray([[a, -b], [b, a]])
        trans = eyes[i, 0] - rot @ dst_l
        out[i, :, :2] = rot
        out[i, :, 2] = trans
    return out


def _umeyama_fit(dst: np.ndarray, src: np.ndarray) -> np.ndarray:
    """Least-squares similarity mapping ``dst`` points onto ``src``.

    Complex-number form of the 2-D Procrustes/Umeyama fit (points as
    y + i*x): minimizes sum |c*d + t - s|^2 over rotation+scale ``c`` and
    translation ``t``. Returns the [2, 3] matrix A with
    A @ (y, x, 1) ~= src — i.e. an *inverse map* in the
    :func:`warp_similarity` convention when ``dst`` is in output pixels.
    """
    d = dst[:, 0] + 1j * dst[:, 1]
    s = src[:, 0] + 1j * src[:, 1]
    dm, sm = d.mean(), s.mean()
    d0, s0 = d - dm, s - sm
    denom = np.real(d0 @ d0.conj())
    if denom < 1e-12:
        raise ValueError("degenerate landmark set (all points coincide)")
    c = (d0.conj() @ s0) / denom
    t = sm - c * dm
    a, b = c.real, c.imag
    return np.asarray([[a, -b, t.real], [b, a, t.imag]], np.float64)


def similarity_from_landmarks68(landmarks: np.ndarray, out_size: int,
                                eye_y: float = 0.38, eye_dx: float = 0.28,
                                template: Optional[np.ndarray] = None,
                                gpa_iters: int = 3,
                                eye_indices: Optional[Tuple[int, int]]
                                = None) -> np.ndarray:
    """Per-frame similarity transforms from dense (68-point) landmarks.

    The reference's OpenFace stage (SURVEY.md §2 "OpenFace") aligns faces
    by a similarity transform fit to the full tracked landmark set — far
    more stable than a 2-point eye fit under expression change, blinks,
    and tracker jitter. Given ``landmarks`` [T, K>=3, 2] in (y, x) source
    pixels:

    1. ``template`` (the canonical shape, [K, 2]) defaults to the
       generalized-Procrustes mean of the video's own landmarks — no
       external model file needed; pass OpenFace's PDM mean shape for
       exact reference framing.
    2. The template is anchored into output pixels by the same eye
       convention as :func:`similarity_from_eyes` (template eye centers
       at (eye_y, 0.5 -/+ eye_dx) * out_size). For K == 68 the iBUG
       eye clusters define the centers; other K need
       ``eye_indices=(left, right)`` for exact framing (without it, the
       two extremal-x template points stand in, with a UserWarning —
       approximate for non-eye-like point sets).
    3. Each frame's transform is the least-squares similarity
       (:func:`_umeyama_fit`) from the anchored template to that frame's
       landmarks — an inverse map consumable by :func:`warp_similarity`.

    Returns [T, 2, 3] float32.
    """
    from .io.openface import eyes_from_landmarks68
    lm = np.asarray(landmarks, np.float64)
    t, k = lm.shape[:2]
    if template is None:
        # generalized Procrustes mean of this video's shapes
        mean = lm[0]
        for _ in range(gpa_iters):
            aligned = np.empty_like(lm)
            for i in range(t):
                a = _umeyama_fit(lm[i], mean)   # frame -> mean space
                aligned[i] = lm[i] @ a[:, :2].T + a[:, 2]
            mean = aligned.mean(axis=0)
        template = mean
    template = np.asarray(template, np.float64)
    if template.shape != (k, 2):
        raise ValueError(f"template shape {template.shape} != {(k, 2)}")

    # anchor the template into output pixels via the eye convention
    if eye_indices is not None:
        eyes = np.stack([template[eye_indices[0]],
                         template[eye_indices[1]]])
    elif k == 68:
        eyes = eyes_from_landmarks68(template[None])[0]
    else:
        # Generic K-point sets: no eye semantics are known, so the two
        # extremal-x template points stand in for eye centers. For
        # trackers whose point sets are not eye-like (jaw-contour-heavy
        # sets etc.) this places crop scale/position only approximately
        # — pass eye_indices=(left, right) (or an anchored template)
        # for the documented eye convention (round-2 advisor finding).
        import warnings
        warnings.warn(
            f"{k}-point landmark set: anchoring the crop by the two "
            f"extremal-x template points as pseudo-eyes; pass "
            f"eye_indices=(left, right) for exact eye-convention "
            f"framing", stacklevel=2)
        order = np.argsort(template[:, 1])
        eyes = np.stack([template[order[0]], template[order[-1]]])
    a_m = similarity_from_eyes(eyes[None].astype(np.float32), out_size,
                               eye_y=eye_y, eye_dx=eye_dx)[0]
    # invert A_m (out px -> template space) to place template in out px
    rot = np.asarray(a_m[:, :2], np.float64)
    inv = np.linalg.inv(rot)
    anchored = (template - a_m[:, 2]) @ inv.T

    out = np.empty((t, 2, 3), np.float32)
    for i in range(t):
        out[i] = _umeyama_fit(anchored, lm[i]).astype(np.float32)
    return out


def similarity_from_landmarks(landmarks: np.ndarray, out_size: int,
                              **kwargs) -> np.ndarray:
    """Shape-dispatching alignment: [T, 2, 2] eye pairs go through the
    2-point fit, [T, K>=3, 2] dense sets (e.g. OpenFace 68) through the
    Procrustes fit."""
    landmarks = np.asarray(landmarks)
    if landmarks.ndim != 3 or landmarks.shape[-1] != 2:
        raise ValueError(
            f"landmarks must be [T, K, 2], got {landmarks.shape}")
    if landmarks.shape[1] == 2:
        return similarity_from_eyes(landmarks, out_size, **kwargs)
    return similarity_from_landmarks68(landmarks, out_size, **kwargs)


def warp_similarity(frames: jnp.ndarray, transforms: jnp.ndarray,
                    out_size: int) -> jnp.ndarray:
    """On-device aligned crops via inverse-map bilinear sampling.

    Args:
      frames: [T, H, W, C] source frames.
      transforms: [T, 2, 3] inverse maps (see similarity_from_eyes).
      out_size: output spatial size.

    Returns:
      [T, out_size, out_size, C] float32 aligned crops (edge-clamped).

    Rotation makes the sampling non-separable, so this path gathers
    four taps per output pixel instead of the matmul form of
    :func:`crop_and_resize`. MEASURED COST (v5e, 2026-08-19,
    bench/crop_probe.py): ~169 ms per 384 frames (~2,275 f/s) — XLA's
    per-pixel gather lowering is ~500x the matmul crop's real compute,
    NOT "negligible" as previously claimed. The tap gathers use
    take_along_axis on the flattened H*W axis: +13% over advanced
    indexing (190 ms), bit-exact. The closed alternatives (same probe):
    bf16 gather values change nothing (op-overhead-bound, not bytes);
    one lax.gather of [2,2,C] patches OOMs at compile (the gather
    output gets a T(8,128)-padded layout, 42.7x expansion). This op
    binds only when alignment runs on-device faster than decode (the
    Python predict path is decode-bound well below 2k f/s; the corpus
    path warps on the host in C++); see BASELINE.md round-5 rows
    before putting it on a hot path.
    """
    t, h, w, _c = frames.shape
    x = frames.astype(jnp.float32)
    grid_y, grid_x = jnp.meshgrid(
        jnp.arange(out_size, dtype=jnp.float32) + 0.5,
        jnp.arange(out_size, dtype=jnp.float32) + 0.5, indexing="ij")
    # Coordinates ELEMENTWISE, never through a matmul: on TPU a K=3
    # coordinate einsum rounds its operands to bf16 (default matmul
    # precision), shifting the sampling positions by ~0.26 px at
    # 128-px sources and ~1.75 px at HD-scale offsets (measured on
    # v5e, 2026-08-19) — a real alignment error with no counterpart
    # in the reference's CPU float warps. Elementwise FMAs stay f32
    # and the contraction is too small for the MXU to matter.
    a = transforms.astype(jnp.float32)[:, None, None]   # [T, 1, 1, 2, 3]
    src = (a[..., 0] * grid_y[None, :, :, None]
           + a[..., 1] * grid_x[None, :, :, None]
           + a[..., 2]) - 0.5                           # [T, S, S, 2]
    sy = jnp.clip(src[..., 0], 0.0, h - 1.0)
    sx = jnp.clip(src[..., 1], 0.0, w - 1.0)
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    fy, fx = sy - y0, sx - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)

    flat = x.reshape(t, h * w, x.shape[-1])

    def g(yy, xx):                                      # [T,S,S,C]
        idx = (yy * w + xx).reshape(t, out_size * out_size, 1)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(
            t, out_size, out_size, x.shape[-1])

    top = g(y0, x0) * (1 - fx)[..., None] + g(y0, x1) * fx[..., None]
    bot = g(y1, x0) * (1 - fx)[..., None] + g(y1, x1) * fx[..., None]
    return top * (1 - fy)[..., None] + bot * fy[..., None]


def pad_short_clip(crops, clip_len: int):
    """Pad a < clip_len crop sequence by repeating the last crop.

    THE short-video policy (one place for both Python call sites; the
    native C++ loader mirrors it — loader.cpp, ABI v3): a static tail
    contributes ~zero phase diffs, so it barely perturbs the GRU state
    for the real frames; callers trim outputs back to the true length.
    Works on numpy or jax arrays of shape [T, ...] with T >= 1.
    """
    t = crops.shape[0]
    if t >= clip_len:
        return crops
    xp = np if isinstance(crops, np.ndarray) else jnp
    return xp.concatenate(
        [crops, xp.repeat(crops[-1:], clip_len - t, axis=0)])


def window_starts(t: int, clip_len: int, stride: int) -> np.ndarray:
    """Sliding-window start frames over a T-frame sequence (host math).

    The final window is right-aligned to cover the sequence tail,
    matching sliding-window inference over full videos.
    """
    if t < clip_len:
        raise ValueError(f"sequence length {t} < clip_len {clip_len}")
    starts = list(range(0, t - clip_len + 1, stride))
    if starts[-1] != t - clip_len:
        starts.append(t - clip_len)
    return np.asarray(starts, np.int32)


def sliding_windows(x: jnp.ndarray, clip_len: int, stride: int
                    ) -> Tuple[jnp.ndarray, np.ndarray]:
    """Slice [T, ...] into overlapping [N, clip_len, ...] windows.

    Returns (windows, starts); see :func:`window_starts`.
    """
    starts = window_starts(x.shape[0], clip_len, stride)
    idx = starts[:, None] + np.arange(clip_len)[None, :]
    return x[jnp.asarray(idx)], starts


def merge_window_predictions(preds, starts: np.ndarray,
                             total_len: int) -> np.ndarray:
    """Overlap-average [N, clip_len, D] window outputs back to [T, D].

    The reference maps window predictions back to frames with interpolation/
    smoothing (SURVEY.md §3.1 postprocess); overlap-averaging is the
    deterministic equivalent used here.

    Host-side numpy ON PURPOSE (round 4): the inputs/outputs are tiny
    ([N, clip_len, 2] -> [T, 2]) and every call site already sits on the
    host between device fetches, so a device version costs one full
    accelerator round trip PER VIDEO on the corpus path (measured ~0.2 s
    each through the TPU tunnel, BASELINE.md round-4 e2e row).
    Accumulates in float64, returns the input dtype — at least as
    accurate as the previous f32 on-device scatter-add.
    """
    preds = np.asarray(preds)
    n, clip_len, d = preds.shape
    idx = (np.asarray(starts)[:, None]
           + np.arange(clip_len)[None, :]).reshape(-1)
    acc = np.zeros((total_len, d), np.float64)
    cnt = np.zeros((total_len, 1), np.float64)
    np.add.at(acc, idx, preds.reshape(-1, d).astype(np.float64))
    np.add.at(cnt, idx, 1.0)
    return (acc / np.maximum(cnt, 1.0)).astype(preds.dtype)
