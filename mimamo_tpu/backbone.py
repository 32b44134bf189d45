"""Flax ResNet-50 appearance backbone (FER+ layout) for the macro stream.

Reference behavior (SURVEY.md §2 "ResNet-50 FER+ graph def", Appendix A.5;
mount empty): the reference uses an auto-generated, MatConvNet-converted
``resnet50_ferplus_dag`` — a standard ResNet-50 taking float32 images in
0..255 with per-channel mean subtraction (no /255, no std), emitting the
2048-d ``pool5_7x7_s1`` global-average embedding consumed by the temporal
model.

TPU-first design: NHWC layout, bfloat16-capable compute with fp32 batch
norm statistics, frames batched (B*T) through one forward so the conv stack
tiles onto the MXU. ``stride_in_1x1=True`` reproduces the Caffe/MatConvNet
bottleneck (stride on the first 1x1 conv) that converted checkpoints
expect; set False for torchvision-style v1.5 placement. Padding is
explicit everywhere to match torch's symmetric conv/pool padding (flax
'SAME' differs for stride 2 — a classic parity trap, covered by
tests/test_backbone.py against a torch-CPU mirror).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .config import BackboneSpec

STAGE_SIZES = (3, 4, 6, 3)            # ResNet-50
STAGE_WIDTHS = (64, 128, 256, 512)    # bottleneck inner widths

# FER+ label order (Barsoum et al. 2016; the albanie ferplus models'
# classifier emits logits in this order — 8 classes incl. contempt).
FERPLUS_CLASSES = ("neutral", "happiness", "surprise", "sadness",
                   "anger", "disgust", "fear", "contempt")


class Bottleneck(nn.Module):
    width: int
    stride: int
    stride_in_1x1: bool
    dtype: Any
    fused_bn: bool = False   # inference-only: BN folded into conv weights

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        s1 = self.stride if self.stride_in_1x1 else 1
        s3 = 1 if self.stride_in_1x1 else self.stride
        out_width = self.width * 4
        bias = self.fused_bn

        def bn(name):
            if self.fused_bn:
                return lambda y: y
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=name)

        residual = x
        if x.shape[-1] != out_width or self.stride != 1:
            residual = nn.Conv(out_width, (1, 1), strides=(self.stride,) * 2,
                               use_bias=bias, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = bn("downsample_bn")(residual)

        y = nn.Conv(self.width, (1, 1), strides=(s1,) * 2, use_bias=bias,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.width, (3, 3), strides=(s3,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=bias,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(out_width, (1, 1), use_bias=bias, dtype=self.dtype,
                    name="conv3")(y)
        y = bn("bn3")(y)
        return nn.relu(y + residual)


class ResNet50(nn.Module):
    """ResNet-50 emitting (pool5 2048-d embedding, FER+ logits).

    ``fused_bn=True`` builds the inference-only variant whose parameters
    come from :func:`fold_batchnorm`: every BatchNorm is pre-multiplied
    into the preceding conv's kernel + bias, removing ~53 elementwise
    scale/shift passes over activations per forward (HBM-bandwidth win
    on TPU; VERDICT round 1 "backbone MFU" item).

    ``skip_stem=True`` builds the trunk-only variant consumed by the
    composite-stem serving path (:func:`composite_stem`): ``__call__``
    then takes post-pool stem features [N, S/4, S/4, 64] instead of
    images and creates no conv1/bn1 params — apply it with the full
    folded variables dict (flax ignores the unused conv1 entry).
    """

    spec: BackboneSpec
    stride_in_1x1: bool = True
    fused_bn: bool = False
    skip_stem: bool = False
    # Trunk segmentation for externally-lowered stages (the Pallas
    # fused layer2 — pallas/layer2_kernel.py): ``stages`` picks which
    # of layer1..layer4 this module applies (absolute indices, so flax
    # param names stay aligned with the full model and one variables
    # dict serves every segment); ``features_only`` skips pool5/fc and
    # returns the [N, H', W', C] feature map.
    stages: Tuple[int, ...] = (0, 1, 2, 3)
    features_only: bool = False

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """images: [N, H, W, 3] *already preprocessed* (see preprocess_images).

        Returns (embeddings [N, 2048], logits [N, num_classes]);
        with ``features_only`` just the trunk feature map.
        """
        if self.fused_bn and train:
            raise ValueError("fused_bn is an inference-only variant")
        dtype = jnp.bfloat16 if self.spec.dtype == "bfloat16" else jnp.float32
        x = images.astype(dtype)
        if not self.skip_stem:
            x = nn.Conv(64, (7, 7), strides=(2, 2),
                        padding=((3, 3), (3, 3)),
                        use_bias=self.fused_bn, dtype=dtype,
                        name="conv1")(x)
            if not self.fused_bn:
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5, dtype=dtype,
                                 name="bn1")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))
        for stage, (blocks, width) in enumerate(
                zip(STAGE_SIZES, STAGE_WIDTHS)):
            if stage not in self.stages:
                continue
            for block in range(blocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                x = Bottleneck(width, stride, self.stride_in_1x1, dtype,
                               fused_bn=self.fused_bn,
                               name=f"layer{stage + 1}_{block}")(
                                   x, train=train)
        if self.features_only:
            return x
        emb = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # pool5_7x7_s1
        logits = nn.Dense(self.spec.num_classes, name="fc")(emb)
        return emb, logits


def fold_batchnorm(variables: Dict[str, Any],
                   eps: float = 1e-5) -> Dict[str, Any]:
    """Fold inference-mode BN into conv kernels/biases.

    ``y = gamma * (conv(x) - mean) / sqrt(var + eps) + beta`` becomes
    ``conv'(x) + bias'`` with ``kernel' = kernel * gamma/sqrt(var+eps)``
    (broadcast over the HWIO output axis) and
    ``bias' = beta - mean * gamma/sqrt(var+eps)``.

    Pure ``jnp`` — safe to call inside a jitted program on traced
    variables (the fold is ~100 MFLOP against the ~3 TFLOP forward).
    Returns variables for ``ResNet50(spec, fused_bn=True)``.
    """
    params, stats = variables["params"], variables["batch_stats"]

    def fold(p_node, s_node, conv, bn):
        s = p_node[bn]["scale"] / jnp.sqrt(s_node[bn]["var"] + eps)
        return {"kernel": p_node[conv]["kernel"] * s,
                "bias": p_node[bn]["bias"] - s_node[bn]["mean"] * s}

    out: Dict[str, Any] = {"conv1": fold(params, stats, "conv1", "bn1"),
                           "fc": params["fc"]}
    for name, node in params.items():
        if not name.startswith("layer"):
            continue
        sn = stats[name]
        new = {f"conv{i}": fold(node, sn, f"conv{i}", f"bn{i}")
               for i in (1, 2, 3)}
        if "downsample_conv" in node:
            new["downsample_conv"] = fold(node, sn, "downsample_conv",
                                          "downsample_bn")
        out[name] = new
    return {"params": out}


# ---------------------------------------------------------------------------
# Composite stem: fold the 2x bilinear upscale INTO conv1
# ---------------------------------------------------------------------------

# Interleave-upscale tap matrix: output tap d = k - 3 of the 7x7 conv
# reads u[2j + d], and u[2i] = 0.25 x[i-1] + 0.75 x[i],
# u[2i+1] = 0.75 x[i] + 0.25 x[i+1] (preprocess._upscale2x_axis).
# Substituting gives a 5-tap stride-1 kernel over x[j-2 .. j+2]:
# _UP[k, u] is the weight of x[j + u - 2] in u[2j + k - 3].
_UP = np.zeros((7, 5), np.float32)
for _k, (_i, _w) in enumerate([(0, 0.75), (0, 0.25), (1, 0.75),
                               (1, 0.25), (2, 0.75), (2, 0.25),
                               (3, 0.75)]):
    _UP[_k, _i] = _w
    _UP[_k, _i + 1] = 1.0 - _w
del _k, _i, _w


def composite_stem(crops_rgb: jnp.ndarray, conv1_kernel: jnp.ndarray,
                   conv1_bias: jnp.ndarray, spec: BackboneSpec
                   ) -> jnp.ndarray:
    """Fused stem on half-res crops: upscale2x + meansub + conv1 + relu +
    maxpool as ONE 5x5 stride-1 conv (+ exact edge correction) + pool.

    Reference behavior (SURVEY.md §3.1 / A.5): aligned 112x112 crops are
    bilinearly upscaled to the ResNet's 224x224 input. TPU-first design:
    the upscale is linear, so ``conv1(upscale2x(x))`` collapses into a
    single 5x5 stride-1 convolution directly on the 112x112 crop —
    eliminating the [N, 224, 224, 3] materialization, the largest
    intermediate on the serving path (measured ~4 ms of a ~40 ms step,
    BASELINE.md). The composite kernel is exact in the interior; the
    2-pixel output border (where conv zero-padding in u-space and the
    upscale's edge clamp interact) is recomputed exactly via four thin
    reference-path slabs and pasted, so the whole function matches
    ``max_pool(relu(conv1(for_backbone(crops)) + b))`` up to fp
    reassociation (parity-tested in tests/test_backbone.py).

    Args:
      crops_rgb: [N, S, S, 3] RGB crops in 0..255 (S even, >= 8).
      conv1_kernel / conv1_bias: folded conv1 params (HWIO [7,7,3,64]).

    Returns:
      [N, S//2, S//2, 64] post-pool stem features (work dtype).
    """
    n, s, s2, _c = crops_rgb.shape
    if s != s2 or s % 2 or s < 8:
        raise ValueError(f"composite_stem needs square, even crops "
                         f">= 8 px, got {crops_rgb.shape}")
    work = (jnp.bfloat16 if spec.dtype == "bfloat16" else jnp.float32)
    x = crops_rgb.astype(work)
    mean = jnp.asarray(spec.mean_rgb, work)
    if spec.channel_order == "bgr":
        x = x[..., ::-1]
        mean = mean[::-1]
    # meansub BEFORE the upscale (commutes: the interleave taps sum to
    # exactly 1); one extra bf16 rounding vs the reference order, same
    # tolerance class as the round-2 bf16 upscale chain.
    x = x - mean

    k7 = conv1_kernel.astype(jnp.float32)
    up = jnp.asarray(_UP)
    k5 = jnp.einsum("ku,lv,klcO->uvcO", up, up, k7).astype(work)

    def conv(v, kern, strides, pad):
        return jax.lax.conv_general_dilated(
            v, kern.astype(work), strides, pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    y = conv(x, k5, (1, 1), [(2, 2), (2, 2)])          # [N, S, S, 64]

    # Exact edge correction: output rows/cols {0, 1, S-2, S-1} mix the
    # conv's zero padding (in u-space) with the upscale's edge clamp —
    # recompute them through the reference lowering on 5-row/col slabs.
    # upscale2x(slab) rows 1.. are exact u values (only the slab-edge
    # row 0 / row -1 sees a wrong clamp, and it is sliced away).
    from . import preprocess as pp
    u_top = pp.upscale2x(x[:, :5])[:, :6]              # u rows 0..5
    top = conv(u_top, k7, (2, 2), [(3, 0), (3, 3)])    # out rows 0, 1
    u_bot = pp.upscale2x(x[:, -5:])[:, 3:]             # u rows 2S-7..2S-1
    bot = conv(u_bot, k7, (2, 2), [(0, 2), (3, 3)])    # out rows S-2, S-1
    u_lft = pp.upscale2x(x[:, :, :5])[:, :, :6]
    lft = conv(u_lft, k7, (2, 2), [(3, 3), (3, 0)])    # out cols 0, 1
    u_rgt = pp.upscale2x(x[:, :, -5:])[:, :, 3:]
    rgt = conv(u_rgt, k7, (2, 2), [(3, 3), (0, 2)])    # out cols S-2, S-1

    rows = jnp.concatenate([top, y[:, 2:-2], bot], axis=1)
    y = jnp.concatenate([lft, rows[:, :, 2:-2], rgt], axis=2)

    y = jax.nn.relu(y + conv1_bias.astype(work))
    return nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


def preprocess_images(images_0_255: jnp.ndarray,
                      spec: BackboneSpec) -> jnp.ndarray:
    """MatConvNet-style preprocessing: 0..255 floats, mean subtraction only.

    ``spec.mean_rgb``/``channel_order`` must be set from the real
    checkpoint's metadata when assets are available (SURVEY.md A.5).
    Input/output: [..., H, W, 3] RGB.
    """
    x = images_0_255.astype(jnp.float32)
    mean = jnp.asarray(spec.mean_rgb, jnp.float32)
    if spec.channel_order == "bgr":
        x = x[..., ::-1]
        mean = mean[::-1]
    return x - mean


# ---------------------------------------------------------------------------
# PyTorch ``state_dict`` importer (checkpoint-loadable weights — NORTH-STAR)
# ---------------------------------------------------------------------------

def _torch_block_prefix(stage: int, block: int) -> str:
    return f"layer{stage + 1}.{block}."


def torch_key_map() -> Dict[str, str]:
    """Canonical torch-name -> flax-path map for ResNet-50.

    The canonical schema is torchvision-style (``conv1.weight``,
    ``layer1.0.conv2.weight``, ...). Real ``resnet50_ferplus_dag``
    checkpoints use MatConvNet-derived names; pass a ``rename`` dict to
    :func:`load_torch_state_dict` to translate those onto this schema
    (documented external-asset risk — SURVEY.md §7 hard part 5).
    """
    m = {
        "conv1.weight": "conv1/kernel",
        "bn1.weight": "bn1/scale", "bn1.bias": "bn1/bias",
        "bn1.running_mean": "bn1/mean@stats",
        "bn1.running_var": "bn1/var@stats",
        "fc.weight": "fc/kernel@t", "fc.bias": "fc/bias",
    }
    for stage, blocks in enumerate(STAGE_SIZES):
        for block in range(blocks):
            tp = _torch_block_prefix(stage, block)
            fp = f"layer{stage + 1}_{block}/"
            for i in (1, 2, 3):
                m[f"{tp}conv{i}.weight"] = f"{fp}conv{i}/kernel"
                m[f"{tp}bn{i}.weight"] = f"{fp}bn{i}/scale"
                m[f"{tp}bn{i}.bias"] = f"{fp}bn{i}/bias"
                m[f"{tp}bn{i}.running_mean"] = f"{fp}bn{i}/mean@stats"
                m[f"{tp}bn{i}.running_var"] = f"{fp}bn{i}/var@stats"
            if block == 0:  # only the first block of a stage downsamples
                m[f"{tp}downsample.0.weight"] = f"{fp}downsample_conv/kernel"
                m[f"{tp}downsample.1.weight"] = f"{fp}downsample_bn/scale"
                m[f"{tp}downsample.1.bias"] = f"{fp}downsample_bn/bias"
                m[f"{tp}downsample.1.running_mean"] = \
                    f"{fp}downsample_bn/mean@stats"
                m[f"{tp}downsample.1.running_var"] = \
                    f"{fp}downsample_bn/var@stats"
    return m


def ferplus_dag_rename() -> Dict[str, str]:
    """Full ``resnet50_ferplus_dag`` -> canonical torchvision name map.

    The real FER+ checkpoint (SURVEY.md §2 "Pretrained assets") is an
    albanie pytorch-benchmarks MatConvNet conversion whose module names
    follow the deterministic Caffe scheme: ``conv1_7x7_s2`` (+ ``_bn``),
    per-bottleneck ``conv{stage+2}_{block+1}_1x1_reduce / _3x3 /
    _1x1_increase`` with ``_bn`` variants, ``_1x1_proj`` (+ ``_bn``) on
    each stage's first block, and a 1x1-conv ``classifier``. This
    generates all 267 parameter renames onto the canonical torchvision
    schema consumed by :func:`torch_key_map`, so the advertised
    one-command ``cli convert`` needs zero hand-written JSON (VERDICT
    round 2 missing item 1).

    The map covers parameter tensors only (MatConvNet ResNet convs are
    bias-free — biases live in the BN layers); the classifier's 4-D
    [C, 2048, 1, 1] kernel is squeezed by
    :func:`normalize_dag_state_dict`, not here.
    """
    bn_parts = ("weight", "bias", "running_mean", "running_var")
    m = {"conv1_7x7_s2.weight": "conv1.weight",
         "classifier.weight": "fc.weight",
         "classifier.bias": "fc.bias"}
    for p in bn_parts:
        m[f"conv1_7x7_s2_bn.{p}"] = f"bn1.{p}"
    for stage, blocks in enumerate(STAGE_SIZES):
        for block in range(blocks):
            dp = f"conv{stage + 2}_{block + 1}"       # caffe stage names
            cp = f"layer{stage + 1}.{block}"
            for suffix, i in (("1x1_reduce", 1), ("3x3", 2),
                              ("1x1_increase", 3)):
                m[f"{dp}_{suffix}.weight"] = f"{cp}.conv{i}.weight"
                for p in bn_parts:
                    m[f"{dp}_{suffix}_bn.{p}"] = f"{cp}.bn{i}.{p}"
            if block == 0:   # projection shortcut on first block only
                m[f"{dp}_1x1_proj.weight"] = f"{cp}.downsample.0.weight"
                for p in bn_parts:
                    m[f"{dp}_1x1_proj_bn.{p}"] = f"{cp}.downsample.1.{p}"
    return m


def looks_like_ferplus_dag(state_dict: Dict[str, Any]) -> bool:
    """Heuristic: does this state_dict use the MatConvNet dag names?"""
    return "conv1_7x7_s2.weight" in state_dict


def resolve_torch_names(state_dict: Dict[str, np.ndarray],
                        rename: Optional[Dict[str, str]] = None):
    """Canonical (torchvision-named) view of a source state_dict.

    THE single source of the importer's precedence — an explicit rename
    map wins over the dag auto-detect — shared by ``cli convert``'s
    import path and its ``--verify`` torch-CPU forward so the parity
    gate always forwards exactly the tensors that were converted.

    Returns ``(tv_state_dict, how)`` with ``how`` in
    ``("rename", "dag", "as-is")``.
    """
    if rename is not None:
        return ({rename.get(k, k): v for k, v in state_dict.items()},
                "rename")
    if looks_like_ferplus_dag(state_dict):
        return normalize_dag_state_dict(state_dict), "dag"
    return state_dict, "as-is"


def normalize_dag_state_dict(state_dict: Dict[str, np.ndarray]
                             ) -> Dict[str, np.ndarray]:
    """dag-named state_dict -> canonical torchvision names.

    Applies :func:`ferplus_dag_rename` and squeezes the MatConvNet
    1x1-conv classifier kernel ([C, 2048, 1, 1] -> [C, 2048]) so the
    result feeds :func:`load_torch_state_dict` with no ``rename``.
    BN ``num_batches_tracked`` counters pass through (the loader skips
    them); any other unrecognized key passes through unchanged and is
    caught by the loader's strict mode.
    """
    rename = ferplus_dag_rename()
    out = {}
    for k, v in state_dict.items():
        if k.endswith("num_batches_tracked"):
            continue
        nk = rename.get(k, k)
        arr = np.asarray(v)
        if nk == "fc.weight" and arr.ndim == 4:
            if arr.shape[2:] != (1, 1):
                raise ValueError(
                    f"classifier.weight: expected a 1x1 conv kernel, "
                    f"got shape {arr.shape}")
            arr = arr.reshape(arr.shape[0], arr.shape[1])
        out[nk] = arr
    return out


def load_torch_state_dict(
    state_dict: Dict[str, np.ndarray],
    rename: Optional[Dict[str, str]] = None,
    strict: bool = True,
) -> Dict[str, Any]:
    """Convert a torch ResNet-50 ``state_dict`` into flax variables.

    Args:
      state_dict: name -> numpy array (call ``.numpy()`` on tensors first,
        or pass the dict from ``checkpoints.load_pth``).
      rename: optional source-name -> canonical-torch-name translation for
        non-torchvision schemas (e.g. the FER+ dag names).
      strict: fail on unmapped/missing keys.

    Returns:
      ``{"params": ..., "batch_stats": ...}`` matching :class:`ResNet50`.
    """
    if rename:
        state_dict = {rename.get(k, k): v for k, v in state_dict.items()}
    key_map = torch_key_map()
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    seen = set()
    for tkey, arr in state_dict.items():
        if tkey.endswith("num_batches_tracked"):
            continue
        if tkey not in key_map:
            if strict:
                raise KeyError(f"unmapped torch key: {tkey}")
            continue
        seen.add(tkey)
        fkey = key_map[tkey]
        arr = np.asarray(arr)
        is_stats = fkey.endswith("@stats")
        fkey = fkey.replace("@stats", "")
        if fkey.endswith("@t"):
            fkey = fkey[:-2]
            arr = arr.T                      # Dense: [O, I] -> [I, O]
        elif fkey.endswith("kernel") and arr.ndim == 4:
            arr = arr.transpose(2, 3, 1, 0)  # Conv: OIHW -> HWIO
        tree = stats if is_stats else params
        parts = fkey.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(arr)
    if strict:
        missing = set(key_map) - seen
        if missing:
            raise KeyError(f"missing torch keys: {sorted(missing)[:5]} ...")
    return {"params": params, "batch_stats": stats}
