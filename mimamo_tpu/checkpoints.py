"""Checkpointing: Orbax for training state + PyTorch ``.pth`` importers.

Reference behavior (SURVEY.md §5 "Checkpoint / resume"): ``torch.save/load``
of the best-val ``state_dict`` plus consumption of the MatConvNet-converted
``resnet50_ferplus_dag.pth``. "Checkpoint-loadable weights" is an explicit
north-star requirement, so both directions are covered:

  * :func:`save` / :func:`restore` — Orbax round-trip of the full
    ``TrainState`` (resumable training / batch runs).
  * :func:`load_pth` — read a torch checkpoint file into numpy arrays
    (no CUDA needed; torch-CPU only, soft dependency).
  * backbone weights: ``backbone.load_torch_state_dict``.
  * :func:`load_temporal_state_dict` — map a reference-style two-stream
    ``state_dict`` (micro-CNN conv/BN, GRU, FC tensors) onto the flax
    temporal model; strict by default (unmapped keys raise).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
except ImportError:  # pragma: no cover
    ocp = None


def save(path: str, state: Any, step: Optional[int] = None) -> str:
    """Orbax-save a pytree (e.g. TrainState) under ``path/step``."""
    if ocp is None:
        raise RuntimeError("orbax-checkpoint is required for save()")
    path = os.path.abspath(path)
    step = int(step if step is not None else np.asarray(state.step))
    with ocp.CheckpointManager(path) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()
    return os.path.join(path, str(step))


def restore(path: str, target: Any, step: Optional[int] = None) -> Any:
    """Restore a pytree saved by :func:`save`; ``target`` supplies the
    structure/shapes (an abstract or concrete TrainState)."""
    if ocp is None:
        raise RuntimeError("orbax-checkpoint is required for restore()")
    path = os.path.abspath(path)
    with ocp.CheckpointManager(path) as mgr:
        if step is None:
            step = mgr.latest_step()
            if step is None:
                raise FileNotFoundError(
                    f"no checkpoint steps found under {path}")
        return mgr.restore(int(step),
                           args=ocp.args.StandardRestore(target))


def latest_step(path: str) -> Optional[int]:
    if ocp is None or not os.path.isdir(path):
        return None
    with ocp.CheckpointManager(os.path.abspath(path)) as mgr:
        return mgr.latest_step()


def _torch_load(path: str):
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("torch is required to read .pth files") from e
    return torch.load(path, map_location="cpu", weights_only=True)


def _extract_state_dict(obj) -> Dict[str, np.ndarray]:
    for key in ("state_dict", "model", "model_state_dict"):
        if isinstance(obj, dict) and key in obj and isinstance(
                obj[key], dict):
            obj = obj[key]
            break
    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
    return out


def load_pth(path: str) -> Dict[str, np.ndarray]:
    """Load a torch ``.pth``/``.pt`` checkpoint into name -> numpy arrays.

    Accepts either a raw ``state_dict`` or a dict containing one under a
    conventional key. The real FER+/MIMAMO assets are offline-unreachable
    (SURVEY.md §7 hard part 5); the key-map contract is frozen here and
    tested against synthetically generated checkpoints.
    """
    return _extract_state_dict(_torch_load(path))


def load_pth_all(path: str
                 ) -> "tuple[Dict[str, np.ndarray], Optional[Dict]]":
    """(state_dict, meta) in ONE deserialization — a real FER+ ``.pth``
    is ~100 MB, and ``cli convert`` needs both."""
    obj = _torch_load(path)
    return _extract_state_dict(obj), _extract_meta(obj)


def load_pth_meta(path: str) -> Optional[Dict[str, Any]]:
    """Preprocessing metadata from a MatConvNet-converted ``.pth``, if
    any (see :func:`load_pth_all` to read tensors + meta in one pass).

    albanie pytorch-benchmarks conversions carry a ``meta`` dict
    (``mean``, ``std``, ``imageSize``, sometimes ``imageOrder``) whose
    values define the model's expected input convention (SURVEY.md A.5 —
    0..255 pixels, mean subtraction only). Returns a sanitized
    ``{"mean": [r, g, b], "std": [...], "image_size": int,
    "channel_order": "rgb"|"bgr"}`` subset (absent fields omitted), or
    None when the file carries no meta (a bare state_dict).
    """
    return _extract_meta(_torch_load(path))


def _extract_meta(obj) -> Optional[Dict[str, Any]]:
    if not isinstance(obj, dict):
        return None
    meta = obj.get("meta")
    if not isinstance(meta, dict):
        return None
    out: Dict[str, Any] = {}
    for key in ("mean", "std"):
        v = meta.get(key)
        if v is not None:
            v = np.asarray(v, np.float64).reshape(-1)
            if v.size == 3:
                out[key] = [float(x) for x in v]
    size = meta.get("imageSize")
    if size is not None:
        size = np.asarray(size).reshape(-1)
        out["image_size"] = int(size[0])
    order = meta.get("imageOrder", meta.get("channel_order"))
    if isinstance(order, str) and order.lower() in ("rgb", "bgr"):
        out["channel_order"] = order.lower()
    return out or None


_BACKBONE_META_FILE = "backbone_meta.json"


def save_backbone_meta(ckpt_dir: str, mean_rgb, channel_order: str) -> str:
    """Record the backbone preprocessing convention next to a checkpoint.

    ``cli convert`` writes this sidecar from the source ``.pth``'s meta;
    :func:`apply_backbone_meta` reads it back wherever ``--ckpt`` is
    consumed, so the classic MatConvNet parity trap (wrong mean /
    channel order — SURVEY.md A.5) cannot recur once converted.
    """
    import json
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(os.path.abspath(ckpt_dir), _BACKBONE_META_FILE)
    with open(path, "w") as f:
        json.dump({"mean_rgb": [float(x) for x in mean_rgb],
                   "channel_order": str(channel_order)}, f)
    return path


def load_backbone_meta(ckpt_dir: str) -> Optional[Dict[str, Any]]:
    import json
    path = os.path.join(os.path.abspath(ckpt_dir), _BACKBONE_META_FILE)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def apply_backbone_meta(config, ckpt_dir: Optional[str]):
    """Overlay a checkpoint's recorded preprocessing onto the config.

    Returns ``config`` unchanged when ``ckpt_dir`` is falsy or has no
    ``backbone_meta.json``. The replace only touches ``mean_rgb`` /
    ``channel_order`` — tree structure is unaffected, so a state
    restored against the returned config matches the saved one.
    """
    import dataclasses
    if not ckpt_dir:
        return config
    meta = load_backbone_meta(ckpt_dir)
    if not meta:
        return config
    return dataclasses.replace(
        config, backbone=dataclasses.replace(
            config.backbone,
            mean_rgb=tuple(meta["mean_rgb"]),
            channel_order=meta["channel_order"]))


# -- reference two-stream checkpoint mapping --------------------------------

_GRU_KEY = re.compile(
    r"^(gru_micro|gru_macro)\.(weight_ih|weight_hh|bias_ih|bias_hh)"
    r"_l(\d+)$")
_GRU_FLAX = {"weight_ih": "w_ih", "weight_hh": "w_hh",
             "bias_ih": "b_ih", "bias_hh": "b_hh"}
_MICRO_KEY = re.compile(
    r"^micro_cnn\.(conv|bn)(\d+)\.(weight|bias|running_mean|running_var)$")
_DENSES = ("macro_proj", "fusion", "head")


def micro_fc_input_shape(spec, phase_size: int
                         ) -> "tuple[int, int, int]":
    """(H, W, C) of the micro-CNN activation flattened into its fc layer.

    Each conv block halves the spatial extent via 2x2 max-pool; the last
    conv width is the channel count (temporal.MicroCNN layout).
    """
    side = phase_size >> len(spec.micro_cnn_features)
    return side, side, spec.micro_cnn_features[-1]


def load_temporal_state_dict(state_dict: Dict[str, np.ndarray],
                             prefix_map: Optional[Dict[str, str]] = None,
                             spec=None,
                             phase_size: Optional[int] = None,
                             strict: bool = True) -> Dict[str, Any]:
    """Map a torch two-stream ``state_dict`` onto flax temporal variables.

    Canonical torch schema (documented contract; translate foreign names
    via ``prefix_map`` source-prefix -> canonical-prefix):
      gru_micro.{weight_ih_l<i>, weight_hh_l<i>, bias_*_l<i>}  gru_macro.{...}
      micro_cnn.conv<i>.weight   micro_cnn.bn<i>.{weight,bias,
          running_mean,running_var}   micro_cnn.fc.{weight,bias}
      macro_proj.{weight,bias}  fusion.{weight,bias}  head.{weight,bias}

    Args:
      spec, phase_size: ``TemporalSpec`` + phase-map resolution; required
        only when the state_dict contains ``micro_cnn.fc.weight`` — the
        fc kernel must be permuted from torch's NCHW flatten order to
        flax's NHWC flatten order, which needs the pre-flatten shape.
      strict: raise on state-dict keys that map to nothing (the silent-
        drop failure mode: a foreign schema without ``prefix_map`` would
        otherwise load nothing and leave random weights in place).

    Returns a partial ``{"params": ..., "batch_stats": ...}`` tree to
    merge over initialized variables (see :func:`merge_params`).
    """
    sd = dict(state_dict)
    if prefix_map:
        for src, dst in prefix_map.items():
            for k in list(sd):
                if k.startswith(src):
                    sd[dst + k[len(src):]] = sd.pop(k)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    unconsumed = []

    def put(tree, path, arr):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jax.numpy.asarray(arr)

    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        arr = np.asarray(v)
        m = _GRU_KEY.match(k)
        if m:
            stream, part, li = m.group(1), m.group(2), int(m.group(3))
            prefix = "" if li == 0 else f"l{li}_"
            put(params, (stream, prefix + _GRU_FLAX[part]), arr)
            continue
        m = _MICRO_KEY.match(k)
        if m:
            kind, idx, part = m.groups()
            layer = f"{kind}{idx}"
            if kind == "conv" and part == "weight":
                put(params, ("micro_cnn", layer, "kernel"),
                    arr.transpose(2, 3, 1, 0))       # OIHW -> HWIO
            elif kind == "bn" and part in ("weight", "bias"):
                put(params, ("micro_cnn", layer,
                             "scale" if part == "weight" else "bias"), arr)
            elif kind == "bn":
                put(stats, ("micro_cnn", layer,
                            part.replace("running_", "")), arr)
            else:
                unconsumed.append(k)
            continue
        if k == "micro_cnn.fc.weight":
            if spec is None or phase_size is None:
                raise ValueError(
                    "micro_cnn.fc.weight present: pass spec= "
                    "(TemporalSpec) and phase_size= so the NCHW->NHWC "
                    "flatten permutation can be computed")
            h, w, c = micro_fc_input_shape(spec, phase_size)
            if arr.shape[1] != h * w * c:
                raise ValueError(
                    f"micro_cnn.fc.weight in-dim {arr.shape[1]} != "
                    f"H*W*C = {h}*{w}*{c} from spec/phase_size — the "
                    f"checkpoint's CNN layout differs from the config")
            # torch flattens NCHW as (c, h, w); flax flattens NHWC as
            # (h, w, c). Permute the kernel's input axis accordingly.
            arr = arr.reshape(-1, c, h, w).transpose(0, 2, 3, 1)
            put(params, ("micro_cnn", "fc", "kernel"),
                arr.reshape(arr.shape[0], -1).T)
            continue
        if k == "micro_cnn.fc.bias":
            put(params, ("micro_cnn", "fc", "bias"), arr)
            continue
        dense = k.rsplit(".", 1)[0]
        if dense in _DENSES and k.endswith(".weight"):
            put(params, (dense, "kernel"), arr.T)
            continue
        if dense in _DENSES and k.endswith(".bias"):
            put(params, (dense, "bias"), arr)
            continue
        unconsumed.append(k)
    if strict and unconsumed:
        raise KeyError(
            f"unmapped state_dict keys (pass prefix_map to translate, or "
            f"strict=False to skip): {sorted(unconsumed)}")
    return {"params": params, "batch_stats": stats}


def merge_variables(variables: Dict[str, Any], overlay: Dict[str, Any]
                    ) -> Dict[str, Any]:
    """Merge a ``{"params", "batch_stats"}`` overlay over flax variables
    (empty overlay collections leave the originals untouched)."""
    out = dict(variables)
    for col, sub in overlay.items():
        if sub:
            out[col] = merge_params(variables.get(col, {}), sub)
    return out


def merge_params(base: Dict[str, Any], overlay: Dict[str, Any]
                 ) -> Dict[str, Any]:
    """Deep-merge ``overlay`` onto ``base`` (checkpoint partial loads)."""
    out = dict(base)
    for k, v in overlay.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_params(out[k], v)
        else:
            out[k] = v
    return out
