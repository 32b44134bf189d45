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
    ``state_dict`` (GRU/FC tensors) onto the flax temporal model.
"""

from __future__ import annotations

import os
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


def load_pth(path: str) -> Dict[str, np.ndarray]:
    """Load a torch ``.pth``/``.pt`` checkpoint into name -> numpy arrays.

    Accepts either a raw ``state_dict`` or a dict containing one under a
    conventional key. The real FER+/MIMAMO assets are offline-unreachable
    (SURVEY.md §7 hard part 5); the key-map contract is frozen here and
    tested against synthetically generated checkpoints.
    """
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("torch is required to read .pth files") from e
    obj = torch.load(path, map_location="cpu", weights_only=True)
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


# -- reference two-stream checkpoint mapping --------------------------------

_GRU_PARTS = ("w_ih", "w_hh", "b_ih", "b_hh")
_TORCH_GRU = ("weight_ih_l{i}", "weight_hh_l{i}", "bias_ih_l{i}",
              "bias_hh_l{i}")
_MAX_GRU_LAYERS = 8


def load_temporal_state_dict(state_dict: Dict[str, np.ndarray],
                             prefix_map: Optional[Dict[str, str]] = None
                             ) -> Dict[str, Any]:
    """Map a torch two-stream ``state_dict`` onto flax temporal params.

    Canonical torch schema (documented contract; translate foreign names
    via ``prefix_map`` source-prefix -> canonical-prefix):
      gru_micro.{weight_ih_l0,...}   gru_macro.{...}
      macro_proj.{weight,bias}  fusion.{weight,bias}  head.{weight,bias}

    Returns a partial ``{"params": ...}`` tree to merge over initialized
    variables (micro-CNN weights are framework-native, trained here).
    """
    sd = dict(state_dict)
    if prefix_map:
        for src, dst in prefix_map.items():
            for k in list(sd):
                if k.startswith(src):
                    sd[dst + k[len(src):]] = sd.pop(k)
    params: Dict[str, Any] = {}
    for stream in ("gru_micro", "gru_macro"):
        node = {}
        # Layer 0 keeps flat flax names; stacked layers are prefixed
        # l<i>_ (see temporal.GRU).
        for li in range(_MAX_GRU_LAYERS):
            prefix = "" if li == 0 else f"l{li}_"
            for flax_name, torch_tpl in zip(_GRU_PARTS, _TORCH_GRU):
                key = f"{stream}.{torch_tpl.format(i=li)}"
                if key in sd:
                    node[prefix + flax_name] = jax.numpy.asarray(sd[key])
        if node:
            params[stream] = node
    for dense in ("macro_proj", "fusion", "head"):
        if f"{dense}.weight" in sd:
            params[dense] = {
                "kernel": jax.numpy.asarray(sd[f"{dense}.weight"]).T,
                "bias": jax.numpy.asarray(sd[f"{dense}.bias"]),
            }
    return {"params": params}


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
