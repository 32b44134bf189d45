"""Training: optax Adam on CCC loss, data-parallel over a device mesh.

Reference behavior (SURVEY.md §3.3): argparse -> Datasets -> DataLoader ->
Adam loop with ``1 - ccc`` loss per head -> per-epoch val CCC ->
``torch.save`` best checkpoint; backbone frozen (training consumes cached
ResNet features).

TPU-first: one jitted ``train_step`` (donated state) containing the full
forward (phase pyramid in-graph, optionally frozen backbone), value_and_grad
and the optax update; batch sharded over ``Mesh(('data',))`` with replicated
params so XLA GSPMD inserts the gradient psum — no hand-written collectives
(SURVEY.md §5 "Distributed communication backend").
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from . import preprocess
from .compile import tuned_jit
from .config import MimamoConfig
from .losses import ccc, ccc_loss
from .phase import micro_motion_features
from .runner import Mimamo


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any          # {"backbone": ..., "temporal": ...}
    batch_stats: Any
    opt_state: Any


def _split_variables(variables: Dict[str, Any]
                     ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    params = {k: v["params"] for k, v in variables.items()}
    stats = {k: v.get("batch_stats", {}) for k, v in variables.items()}
    return params, stats


def _join_variables(params, stats) -> Dict[str, Any]:
    return {k: {"params": params[k], "batch_stats": stats[k]}
            for k in params}


def make_optimizer(config: MimamoConfig,
                   total_steps: Optional[int] = None
                   ) -> optax.GradientTransformation:
    """Adam/AdamW with optional warmup-cosine schedule.

    ``total_steps`` (epochs * steps-per-epoch) is required for the
    cosine schedule; the CLI computes it from the dataset length.
    """
    t = config.train
    if t.lr_schedule == "cosine":
        if not total_steps:
            raise ValueError("lr_schedule='cosine' needs total_steps")
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=t.learning_rate,
            warmup_steps=min(t.warmup_steps, max(total_steps - 1, 1)),
            decay_steps=total_steps)
    elif t.lr_schedule == "constant":
        lr = (optax.linear_schedule(0.0, t.learning_rate, t.warmup_steps)
              if t.warmup_steps else t.learning_rate)
    else:
        raise ValueError(f"unknown lr_schedule {t.lr_schedule!r}")
    tx = (optax.adamw(lr, weight_decay=t.weight_decay)
          if t.weight_decay else optax.adam(lr))
    if t.freeze_backbone:
        # Zero-out backbone updates; params stay exactly as loaded.
        def label(params):
            return {k: jax.tree_util.tree_map(
                lambda _: "train" if k != "backbone" else "frozen", v)
                for k, v in params.items()}
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, label)
    return tx


def create_train_state(model: Mimamo, rng: jax.Array,
                       tx: Optional[optax.GradientTransformation] = None,
                       variables: Optional[Dict[str, Any]] = None
                       ) -> Tuple[TrainState, optax.GradientTransformation]:
    tx = tx or make_optimizer(model.config)
    if variables is None:
        # jitted: eager init traces the full ResNet-50 + temporal init
        # op-by-op, and on the axon tunnel every eager op is a separate
        # minutes-long remote compile (CLAUDE.md). Every --ckpt entry
        # point (eval/predict-corpus/serve startup) pays this before
        # restore() even overwrites the values (round-5 review finding).
        # run_settled: the init program counts against the process-wide
        # in-flight cap and is synced before any pipeline dispatches
        # next to it (round-5 review finding #2).
        from . import dispatch as _dp
        variables = _dp.run_settled(jax.jit(model.init_variables), rng)
    params, stats = _split_variables(variables)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=stats,
                      opt_state=tx.init(params)), tx


def make_train_step(model: Mimamo, tx: optax.GradientTransformation
                    ) -> Callable:
    """Returns jitted ``train_step(state, batch) -> (state, metrics)``.

    batch: {"clips": [B, T, S, S, 3] float 0..255 aligned crops,
            "labels": [B, T, 2] valence/arousal in [-1, 1],
            "mask":   [B, T] float validity mask,
            optional "features": [B, T, F] cached appearance embeddings
            (the reference's training input — skips the frozen backbone
            forward entirely; requires freeze_backbone=True)}.
    """
    cfg = model.config
    freeze = cfg.train.freeze_backbone
    augmenting = cfg.train.augment or cfg.train.brightness_jitter > 0

    def _augment(clips, step):
        """On-device per-clip augmentation, deterministic in ``step``.

        Horizontal flip (valence/arousal are flip-invariant) and a
        brightness scale — both per CLIP, not per frame, so the
        micro-motion stream sees temporally consistent crops.
        """
        rng = jax.random.fold_in(jax.random.PRNGKey(cfg.train.seed), step)
        r_flip, r_bright = jax.random.split(rng)
        b = clips.shape[0]
        if cfg.train.augment:
            flip = jax.random.bernoulli(r_flip, 0.5, (b,))
            clips = jnp.where(flip[:, None, None, None, None],
                              clips[:, :, :, ::-1, :], clips)
        j = cfg.train.brightness_jitter
        if j > 0:
            scale = jax.random.uniform(r_bright, (b,), minval=1.0 - j,
                                       maxval=1.0 + j)
            clips = jnp.clip(clips * scale[:, None, None, None, None],
                             0.0, 255.0)
        return clips

    def loss_fn(params, batch_stats, batch, step):
        variables = _join_variables(params, batch_stats)
        # Cast BEFORE any math, mirroring runner.forward: uint8 is the
        # preferred feed/storage dtype for crops, and to_grayscale
        # casts its luma weights to the INPUT dtype — uint8 clips
        # would silently zero the entire micro-motion stream
        # (round-4 review finding).
        clips = batch["clips"].astype(jnp.float32)
        if augmenting:
            if "features" in batch:
                raise ValueError(
                    "augmentation requires the online appearance stream "
                    "— cached features cannot reflect augmented crops "
                    "(drop batch['features'] or disable augment/"
                    "brightness_jitter)")
            clips = _augment(clips, step)
        streams = cfg.temporal.streams
        phase_stacks = None
        if streams in ("both", "micro"):
            gray = preprocess.to_grayscale(clips)
            phase_stacks = micro_motion_features(gray, cfg.pyramid,
                                                 cfg.phase)
        new_stats = dict(batch_stats)
        if streams == "micro":
            emb = None
        elif "features" in batch:
            if not freeze:
                raise ValueError(
                    "cached features cannot be used with "
                    "freeze_backbone=False (fine-tuning must run the "
                    "real backbone)")
            emb = jax.lax.stop_gradient(batch["features"])
        elif freeze:
            emb = jax.lax.stop_gradient(
                model.embed_frames(variables, clips))
        else:
            # Train-mode BN with mutated running stats (fine-tuning).
            b, t = clips.shape[:2]
            imgs = preprocess.for_backbone(
                clips.reshape((b * t,) + clips.shape[2:]),
                cfg.backbone)

            def bb_fwd(bvars, x):
                (e, _), mut = model.backbone.apply(
                    bvars, x, train=True, mutable=["batch_stats"])
                return e, mut["batch_stats"]

            if cfg.train.remat_backbone:
                # Recompute backbone activations in the backward pass
                # instead of storing ~50 ResNet feature maps per frame.
                bb_fwd = jax.checkpoint(bb_fwd)
            emb, bstats = bb_fwd(variables["backbone"], imgs)
            emb = emb.reshape(b, t, -1)
            new_stats["backbone"] = bstats
        (out, _), mutated = model.temporal.apply(
            variables["temporal"], phase_stacks, emb, train=True,
            num_frames=clips.shape[1], mutable=["batch_stats"])
        # Clip validity: all-padding clips (from pad_to_multiple for mesh
        # divisibility) must not contribute to the loss or metrics.
        clip_w = (jnp.sum(batch["mask"], axis=1) > 0).astype(jnp.float32)
        if cfg.train.loss_axis == "batch":
            # Utterance-level protocol (OMG): CCC across the clip batch of
            # time-averaged predictions vs the per-clip labels. Per-clip
            # time-CCC would be degenerate (constant targets over T).
            m = batch["mask"][..., None]
            p = jnp.sum(out * m, axis=1) / (jnp.sum(m, axis=1) + 1e-8)
            y = batch["labels"][:, 0]                     # [B, 2]
            loss = ccc_loss(p, y, mask=clip_w,
                            mse_weight=cfg.train.mse_weight)
            ccc_vec = ccc(p, y, mask=clip_w)
        else:
            # Frame-level protocol (Aff-Wild2): CCC over time per clip.
            per_clip = jax.vmap(
                lambda p, y, m: ccc_loss(p, y, mask=m,
                                         mse_weight=cfg.train.mse_weight))(
                out, batch["labels"], batch["mask"])
            denom = jnp.sum(clip_w) + 1e-8
            loss = jnp.sum(per_clip * clip_w) / denom
            ccc_vec = jnp.stack([
                jnp.sum(clip_w * jax.vmap(
                    lambda p, y, m: ccc(p[:, d], y[:, d], mask=m))(
                    out, batch["labels"], batch["mask"])) / denom
                for d in range(2)])
        # macro-only models have no BN in the temporal tree
        new_stats["temporal"] = mutated.get("batch_stats", {})
        metrics = {"loss": loss, "ccc_v": ccc_vec[0], "ccc_a": ccc_vec[1]}
        return loss, (new_stats, metrics)

    @functools.partial(tuned_jit, donate_argnums=0)
    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        grads, (new_stats, metrics) = jax.grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch,
                                   state.step)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=new_params,
                          batch_stats=new_stats,
                          opt_state=new_opt), metrics

    return train_step


def make_eval_step(model: Mimamo) -> Callable:
    """``eval_step(state, batch) -> [B, T, 2]`` predictions (jitted)."""

    def eval_step(state: TrainState, batch) -> jnp.ndarray:
        variables = _join_variables(state.params, state.batch_stats)
        return model.predict_clips(variables, batch["clips"])

    return eval_step


def variables_from_state(state: TrainState) -> Dict[str, Any]:
    return _join_variables(state.params, state.batch_stats)
