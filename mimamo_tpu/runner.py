"""End-to-end jitted pipeline: face-crop clips -> per-frame (valence, arousal).

This is the TPU-native replacement for the reference's stage-coupled demo
path (``API.predict``: OpenFace subprocess -> ResNet over image files ->
pyramid in DataLoader workers -> GRU; three disk round-trips — SURVEY.md
§3.1). Here the whole frame->prediction path is ONE compiled XLA program
(NORTH-STAR): grayscale + steerable-pyramid phase diffs, backbone
embeddings, dual GRU and fusion head, optionally preceded by on-device
box crop/resize.

Entry points:
  * ``Mimamo.predict_clips``      — [B, T, S, S, 3] crops -> [B, T, 2]
  * ``Mimamo.predict_stream``     — chunked full-video streaming w/ carries
  * ``Mimamo.predict_video``      — raw frames + boxes -> per-frame series
  * ``Mimamo.predict_batch``      — mesh-sharded batched inference
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import parallel, preprocess
from .backbone import ResNet50
from .compile import tuned_jit
from .config import MimamoConfig
from .phase import micro_motion_features
from .temporal import TwoStreamRNN, init_carries

Variables = Dict[str, Any]
Carries = Tuple[jnp.ndarray, jnp.ndarray]


from .pyramid import on_default_tpu as _on_tpu


def stride_anchor_plan(t: int, k: int):
    """Trace-time interpolation plan for ``appearance_stride``.

    Frame f sits at anchor position f/k between anchors floor and
    floor+1 (clamped — tail frames past the last anchor hold it).
    Returns (i0 [T], i1 [T], frac [T]) as numpy arrays; shared by the
    fused path and FeatureExtractor so cached features match exactly.
    """
    n = -(-t // k)                             # number of anchors
    i0 = np.minimum(np.arange(t) // k, n - 1)
    i1 = np.minimum(i0 + 1, n - 1)
    frac = np.where(i1 > i0, (np.arange(t) / k) - i0, 0.0)
    return i0.astype(np.int32), i1.astype(np.int32), \
        frac.astype(np.float32)


def interp_anchor_features(emb: jnp.ndarray, t: int, k: int
                           ) -> jnp.ndarray:
    """[B, N, F] anchor embeddings -> [B, T, F] per-frame embeddings.

    Gather + lerp (NOT a matmul): anchors stay bit-exact in any dtype
    (a default-precision f32 einsum on TPU would bf16-round them), and
    the embedding dtype is preserved (fracs cast to it).
    """
    i0, i1, frac = stride_anchor_plan(t, k)
    w = jnp.asarray(frac).astype(emb.dtype)[None, :, None]
    a = jnp.take(emb, jnp.asarray(i0), axis=1)
    bb = jnp.take(emb, jnp.asarray(i1), axis=1)
    return a * (1 - w) + bb * w


class Mimamo:
    """Bundles config + module defs + jitted programs.

    Variables layout (one pytree for checkpointing):
      {"backbone": <flax vars of ResNet50>, "temporal": <flax vars>}
    """

    def __init__(self, config: Optional[MimamoConfig] = None):
        self.config = config or MimamoConfig()
        self.backbone = ResNet50(self.config.backbone)
        # Inference-only twin with BN pre-folded into conv weights
        # (backbone.fold_batchnorm); same math, fewer HBM passes.
        self.backbone_fused = ResNet50(self.config.backbone, fused_bn=True)
        # Trunk-only twin for the composite-stem serving path
        # (backbone.composite_stem runs upscale+conv1+pool as one fused
        # 5x5 conv on the half-res crops; the trunk consumes its
        # post-pool features). Applied with the same folded variables.
        self.backbone_trunk = ResNet50(self.config.backbone,
                                       fused_bn=True, skip_stem=True)
        # Trunk segments for the Pallas fused-layer2 path
        # (pallas/layer2_kernel.py, layer2_mode="pallas"): layer1-only
        # feature segments (with/without stem, matching the two fused
        # entry shapes) and the layer3/4 + head tail. All segments
        # apply with the one folded variables dict (absolute stage
        # names; flax ignores unused entries).
        bs = self.config.backbone
        self.backbone_l1 = ResNet50(bs, fused_bn=True, skip_stem=True,
                                    stages=(0,), features_only=True)
        self.backbone_stem_l1 = ResNet50(bs, fused_bn=True, stages=(0,),
                                         features_only=True)
        self.backbone_l34 = ResNet50(bs, fused_bn=True, skip_stem=True,
                                     stages=(2, 3))
        self.temporal = TwoStreamRNN(self.config.temporal)

    # -- initialization ----------------------------------------------------

    def init_variables(self, rng: jax.Array, clip_len: int = 2
                       ) -> Variables:
        cfg = self.config
        r1, r2 = jax.random.split(rng)
        s = cfg.backbone.input_size
        bvars = self.backbone.init(r1, jnp.zeros((1, s, s, 3)))
        p = cfg.phase.phase_size
        tvars = self.temporal.init(
            r2,
            jnp.zeros((1, clip_len - 1, cfg.num_phase, p, p)),
            jnp.zeros((1, clip_len, cfg.backbone.feature_dim)))
        return {"backbone": bvars, "temporal": tvars}

    # -- pure forward pieces (used by train.py too) ------------------------

    def embed_frames(self, variables: Variables,
                     crops_rgb: jnp.ndarray) -> jnp.ndarray:
        """[B, T, S, S, 3] 0..255 crops -> [B, T, F] pool5 embeddings.

        Inference-mode BN (running stats); the training path in train.py
        applies the backbone itself so BN stat mutation is handled there.
        With ``appearance_stride=k > 1`` (opt-in serving profile), the
        backbone runs on frames 0, k, 2k, ... only and the remaining
        embeddings are linear interpolations between anchors (tail
        frames past the last anchor hold it).
        """
        b, t = crops_rgb.shape[:2]
        k = self.config.backbone.appearance_stride
        if k > 1 and t > 1:
            crops_rgb = crops_rgb[:, ::k]
        emb = self._embed_every(variables, crops_rgb)
        if k > 1 and t > 1:
            emb = interp_anchor_features(emb, t, k)
        return emb

    def _composite_stem_ok(self, crop_hw) -> bool:
        bs = self.config.backbone
        h, w = crop_hw
        return (bs.stem_mode == "composite" and bs.fold_bn_inference
                and h == w and bs.input_size == 2 * w
                and w >= 8 and w % 2 == 0)

    def _pallas_layer2_ok(self) -> bool:
        """Trace-time gate for the fused-layer2 kernel: opt-in config,
        bf16 backbone, real TPU (Mosaic; tests force interpreter mode
        via layer2_kernel._FORCE_INTERPRET); shape is checked at the
        split site (layer1 features must be [N, 56, 56, 256])."""
        from .pallas import layer2_kernel
        bs = self.config.backbone
        return (bs.layer2_mode == "pallas" and bs.dtype == "bfloat16"
                and (_on_tpu() or layer2_kernel._FORCE_INTERPRET))

    def _finish_from_layer1(self, folded, feats):
        """layer1 features -> (emb, logits) via the Pallas fused layer2
        (pallas/layer2_kernel.py) + the layer3/4 trunk tail."""
        from .pallas import layer2_kernel
        y = layer2_kernel.layer2_fused(
            feats, layer2_kernel.pack_layer2_params(folded["params"]),
            interpret=layer2_kernel._FORCE_INTERPRET)
        return self.backbone_l34.apply(folded, y)

    def _apply_fused(self, variables: Variables, crops_flat: jnp.ndarray):
        """Folded-BN backbone forward on [N, S, S, 3] raw 0..255 crops,
        via the composite stem / fused layer2 when config+shape allow."""
        from .backbone import composite_stem, fold_batchnorm
        folded = fold_batchnorm(variables["backbone"])
        if self._composite_stem_ok(crops_flat.shape[-3:-1]):
            stem = composite_stem(crops_flat,
                                  folded["params"]["conv1"]["kernel"],
                                  folded["params"]["conv1"]["bias"],
                                  self.config.backbone)
            if self._pallas_layer2_ok():
                feats = self.backbone_l1.apply(folded, stem)
                if feats.shape[1:] == (56, 56, 256):
                    return self._finish_from_layer1(folded, feats)
            return self.backbone_trunk.apply(folded, stem)
        x = preprocess.for_backbone(crops_flat, self.config.backbone)
        if self._pallas_layer2_ok():
            feats = self.backbone_stem_l1.apply(folded, x)
            if feats.shape[1:] == (56, 56, 256):
                return self._finish_from_layer1(folded, feats)
        return self.backbone_fused.apply(folded, x)

    def _embed_every(self, variables: Variables,
                     crops_rgb: jnp.ndarray) -> jnp.ndarray:
        b, t = crops_rgb.shape[:2]
        crops_flat = crops_rgb.reshape((b * t,) + crops_rgb.shape[2:])
        if self.config.backbone.fold_bn_inference:
            emb, _ = self._apply_fused(variables, crops_flat)
        else:
            emb, _ = self.backbone.apply(
                variables["backbone"],
                preprocess.for_backbone(crops_flat, self.config.backbone))
        return emb.reshape(b, t, -1)

    @functools.partial(tuned_jit, static_argnums=0)
    def _classify(self, variables: Variables,
                  crops_rgb: jnp.ndarray) -> jnp.ndarray:
        b, t = crops_rgb.shape[:2]
        crops_flat = crops_rgb.astype(jnp.float32).reshape(
            (b * t,) + crops_rgb.shape[2:])
        if self.config.backbone.fold_bn_inference:
            _, logits = self._apply_fused(variables, crops_flat)
        else:
            _, logits = self.backbone.apply(
                variables["backbone"],
                preprocess.for_backbone(crops_flat, self.config.backbone))
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1
                              ).reshape(b, t, -1)

    def classify_frames(self, variables: Variables,
                        crops_rgb: jnp.ndarray) -> jnp.ndarray:
        """[B, T, S, S, 3] 0..255 crops -> [B, T, num_classes] FER+
        emotion probabilities.

        The FER+ classifier head rides along with every converted
        ``resnet50_ferplus_dag`` checkpoint (backbone.FERPLUS_CLASSES
        gives the label order); the reference's extractor discards it,
        but it is a real per-frame emotion classifier for free —
        exposed via ``api.MimamoAPI.predict(emotions=True)`` /
        ``cli predict --emotions``.
        """
        return self._classify(variables, crops_rgb)

    def forward(self, variables: Variables, crops_rgb: jnp.ndarray,
                carries: Optional[Carries] = None,
                include_first_pair: bool = False,
                first_pair_invalid: Optional[jnp.ndarray] = None
                ) -> Tuple[jnp.ndarray, Carries]:
        """Full forward on aligned crops.

        Args:
          crops_rgb: [B, T, S, S, 3] aligned face crops in 0..255,
            S = config.clip.crop_size. uint8 is the preferred feed dtype
            (4x less host->device transfer than float32 — the dominant
            cost on the serving path); the cast to float32 happens here,
            where the on-device math starts, so outputs are bit-identical
            for integral inputs.
          carries: GRU carries from the previous chunk (streaming mode).
          include_first_pair: in streaming mode the caller prepends the
            previous chunk's last frame so every frame here has a
            predecessor pair; the temporal model then receives T pairs for
            T frames (no zero-pad).

        Returns:
          ([B, T, 2] per-frame (valence, arousal), new carries).
        """
        cfg = self.config
        crops_rgb = crops_rgb.astype(jnp.float32)
        streams = cfg.temporal.streams
        t = crops_rgb.shape[1] - (1 if include_first_pair else 0)
        phase_stacks = emb = None
        if streams in ("both", "micro"):
            gray = preprocess.to_grayscale(crops_rgb)
            phase_stacks = self._micro_motion(gray)
        if streams in ("both", "macro"):
            emb = self.embed_frames(variables, crops_rgb)
            if include_first_pair:
                emb = emb[:, 1:]
        return self.temporal.apply(variables["temporal"], phase_stacks,
                                   emb, carries,
                                   first_pair_invalid=first_pair_invalid,
                                   num_frames=t)

    def _micro_motion(self, gray: jnp.ndarray) -> jnp.ndarray:
        """Micro-motion features, fused Pallas kernel when applicable.

        Trace-time dispatch: the fused path needs a real TPU (Mosaic).
        Amplitude weighting is fused in-kernel (no silent fallback).
        """
        cfg = self.config
        if cfg.use_pallas and _on_tpu():
            from .pallas.phase_kernel import micro_motion_features_fused
            return micro_motion_features_fused(gray, cfg.pyramid,
                                               cfg.phase)
        return micro_motion_features(gray, cfg.pyramid, cfg.phase)

    # -- jitted entry points ------------------------------------------------

    @functools.partial(tuned_jit, static_argnums=0)
    def _predict_clips(self, variables: Variables,
                       crops_rgb: jnp.ndarray) -> jnp.ndarray:
        out, _ = self.forward(variables, crops_rgb)
        return out

    def predict_clips(self, variables: Variables,
                      crops_rgb: jnp.ndarray) -> jnp.ndarray:
        """[B, T, S, S, 3] aligned crops -> [B, T, 2], one XLA program."""
        return self._predict_clips(variables, crops_rgb)

    @functools.partial(tuned_jit, static_argnums=0)
    def _predict_stream(self, variables: Variables,
                        last_frame: jnp.ndarray, crops_rgb: jnp.ndarray,
                        carries: Carries,
                        first_pair_invalid: Optional[jnp.ndarray] = None
                        ) -> Tuple[jnp.ndarray, Carries, jnp.ndarray]:
        # The pair-context concat and the next-carry frame slice live
        # IN-GRAPH: as eager ops they were extra outstanding tunnel
        # executions under the caller's single dispatch slot (round-4
        # review finding; StreamingSession._advance already does this).
        chunk = jnp.concatenate([last_frame, crops_rgb], axis=1)
        out, new_carries = self.forward(
            variables, chunk, carries, include_first_pair=True,
            first_pair_invalid=first_pair_invalid)
        return out, new_carries, crops_rgb[:, -1:]

    def predict_stream(self, variables: Variables, crops_rgb: jnp.ndarray,
                       carries: Optional[Carries] = None
                       ) -> Tuple[jnp.ndarray, Carries]:
        """Streaming chunk inference (BASELINE.json config 3).

        Call repeatedly with consecutive chunks [B, chunk, S, S, 3]; the
        GRU hidden state and one frame of pair context are threaded across
        calls, so a full-length video runs in O(chunk) memory. The first
        chunk emits T predictions (frame 0 pairs with zero-pad, clip
        semantics); later chunks emit one prediction per frame.
        """
        if carries is None:
            out, new_carries, last = self._predict_clips_with_carries(
                variables, crops_rgb)
            return out, (new_carries, last)
        gru_carries, last_frame = carries
        out, new_gru, last = self._predict_stream(
            variables, last_frame, crops_rgb, gru_carries)
        return out, (new_gru, last)

    @functools.partial(tuned_jit, static_argnums=0)
    def _predict_clips_with_carries(self, variables, crops_rgb):
        out, carries = self.forward(variables, crops_rgb)
        # the next-chunk pair-context frame, sliced in-graph (an eager
        # slice would be an uncapped tunnel execution — see
        # _predict_stream)
        return out, carries, crops_rgb[:, -1:]

    def predict_video(self, variables: Variables, frames_rgb: np.ndarray,
                      boxes: np.ndarray,
                      batch_clips: int = 8,
                      landmarks: Optional[np.ndarray] = None
                      ) -> np.ndarray:
        """Raw decoded video -> per-frame (valence, arousal) time series.

        [T, H, W, 3] frames + [T, 4] face boxes: on-device crop/resize,
        sliding clip windows (clip_len/stride from config), batched clip
        inference, overlap-averaged back to per-frame outputs — the
        reference's ``API.predict`` equivalent (SURVEY.md §3.1) without
        the disk round-trips. Videos shorter than one clip are padded by
        repeating the last crop (static tail: ~zero phase diffs) and
        the outputs trimmed back to the real length. With ``landmarks`` ([T, 2, 2] eye points
        or [T, K>=3, 2] dense sets, e.g. OpenFace 68), crops are
        similarity-*aligned* on device (the OpenFace role) instead of
        axis-aligned box crops.
        """
        cfg = self.config.clip
        if landmarks is not None:
            params = preprocess.similarity_from_landmarks(landmarks,
                                                          cfg.crop_size)
        else:
            params = np.asarray(boxes, np.float32)
        crops = self.crop_video_chunked(frames_rgb, params,
                                        align=landmarks is not None)
        return self.predict_from_crops(variables, crops,
                                       t_real=frames_rgb.shape[0],
                                       batch_clips=batch_clips)

    def predict_from_crops(self, variables: Variables, crops,
                           t_real: Optional[int] = None,
                           batch_clips: int = 8) -> np.ndarray:
        """[T, S, S, 3] aligned crops -> [T, 2] windowed series.

        The back half of :meth:`predict_video` (pad-short, sliding
        windows, batched clip inference, overlap-averaged merge),
        shared with the streaming-decode path in ``api.MimamoAPI``
        which builds crops window-by-window so a long source video
        never sits in host RAM at once.
        """
        cfg = self.config.clip
        t_real = int(crops.shape[0]) if t_real is None else t_real
        from . import dispatch as _dp
        on_host = isinstance(crops, np.ndarray)
        # short videos: one last-crop-padded clip, outputs trimmed below
        if crops.shape[0] < cfg.clip_len:
            crops = (preprocess.pad_short_clip(crops, cfg.clip_len)
                     if on_host else
                     _dp.run_settled(preprocess.pad_short_clip, crops,
                                     cfg.clip_len))
        starts = preprocess.window_starts(crops.shape[0], cfg.clip_len,
                                          cfg.stride)
        idx = starts[:, None] + np.arange(cfg.clip_len)[None, :]
        # Materialize each batch of windows BEFORE the predict
        # pipeline, each gather capped + probe-synced: eager gathers/
        # slices/pads interleaved with the capped depth-2 dispatches
        # were extra outstanding tunnel executions (round-4 review
        # finding). The final partial batch repeats its last window
        # (per-clip independence: kept outputs are unchanged; the
        # repeats are trimmed after fetch).
        batches = []
        for i in range(0, len(starts), batch_clips):
            sel = idx[i:i + batch_clips]
            pad = batch_clips - len(sel)
            if pad:
                sel = np.concatenate([sel, np.repeat(sel[-1:], pad,
                                                     axis=0)])
            win = (crops[sel] if on_host else
                   _dp.run_settled(lambda c, ix: c[ix], crops,
                                   jnp.asarray(sel)))
            batches.append((win, batch_clips - pad))
        # Depth-2 dispatch pipeline under the PROCESS-WIDE in-flight
        # cap (mimamo_tpu.dispatch): fetch batch i-1 (tiny [B, T, 2])
        # while batch i runs. The axon tunnel wedges past ~2
        # outstanding async executions (CLAUDE.md); the serve daemon
        # runs this concurrently with stream feeds on another thread,
        # so the budget is shared — when another caller holds a slot,
        # the non-blocking second dispatch fails and this pipeline
        # degrades to depth-1 instead of stacking a 3rd execution.
        preds, pending = [], None

        def fetch(p, keep):
            out = p.fetch()
            preds.append(out[:keep] if keep < out.shape[0] else out)

        # The new dispatch is stored in `pending` BEFORE the previous
        # one is fetched, and the whole pipeline releases the held
        # Pending on the way out: a fetch that raises (tunnel error,
        # OOM) while a slot is held would otherwise permanently shrink
        # — and on the second failure deadlock — the process-wide
        # dispatch budget shared with the serve daemon (round-5 review
        # finding; same class as corpus.run's finally).
        try:
            for win, keep in batches:
                p = _dp.dispatch(self.predict_clips, variables, win,
                                 _block=pending is None)
                if p is None:                  # budget contended
                    fetch(*pending)
                    pending = None
                    p = _dp.dispatch(self.predict_clips, variables, win)
                    prev = None
                else:
                    prev = pending
                pending = (p, keep)
                if prev is not None:
                    fetch(*prev)               # Pending.fetch releases
            fetch(*pending)
            pending = None
        finally:
            if pending is not None:
                pending[0].release()           # idempotent
        merged = preprocess.merge_window_predictions(
            np.concatenate(preds, axis=0), starts,
            max(t_real, cfg.clip_len))
        return merged[:t_real]

    def crop_video_chunked(self, frames_rgb: np.ndarray,
                           params: np.ndarray, align: bool = False,
                           chunk: int = 64) -> jnp.ndarray:
        """Host frames -> on-device crops, in fixed-size chunks.

        A full decoded video at source resolution does not fit HBM (a
        60 s 1080p clip is ~37 GB as f32), so the crop/align stage runs
        chunk-by-chunk (padded tail -> one compiled program per source
        resolution). Frames ship in their host dtype (uint8 from the
        decoder: 4x less tunnel/PCIe traffic than f32); the [T, S, S, 3]
        f32 crops stay on device.

        ``params``: [T, 4] boxes, or [T, 2, 3] similarity transforms
        with ``align=True``.
        """
        crop_fn = self._align_video if align else self._crop_video
        t = frames_rgb.shape[0]
        if t == 0:
            raise ValueError("crop_video_chunked: empty video "
                             "(0 decoded frames)")
        pieces = []
        # Chunk programs go through the process-wide in-flight cap
        # (mimamo_tpu.dispatch) at pipeline depth 2: an unbounded loop
        # of async dispatches would stack ceil(T/chunk) outstanding
        # executions on the tunnel, which wedges past ~2 (round-4
        # review finding). The crops stay ON DEVICE — the slot is
        # released after a 1-element probe fetch, the only real sync
        # through the tunnel (block_until_ready is a no-op there,
        # CLAUDE.md). Outputs are collected only AFTER their program
        # settles (a tail slice of a still-computing chunk would be a
        # long-lived execution OUTSIDE the cap — second-pass review
        # finding), and the final concatenate runs under the cap too.
        from . import dispatch as _dp

        def settle_collect(pend, n):
            try:
                jax.device_get(pend.value[:1, :1, :1, :1])
            finally:
                # a probe fetch that raises must still free the slot
                # (round-5 review finding: a leaked slot permanently
                # shrinks the process-wide budget the serve daemon
                # shares)
                pend.release()
            # full chunks are appended as-is: no eager slice op at all
            pieces.append(pend.value[:n] if n < chunk else pend.value)

        pending = None                          # (Pending, real_count)
        try:
            for s in range(0, t, chunk):
                f = np.asarray(frames_rgb[s:s + chunk])
                p = np.asarray(params[s:s + chunk])
                n = f.shape[0]
                if n < chunk:
                    f = np.concatenate(
                        [f, np.repeat(f[-1:], chunk - n, axis=0)])
                    p = np.concatenate(
                        [p, np.repeat(p[-1:], chunk - n, axis=0)])
                fd, pd = jnp.asarray(f), jnp.asarray(p)
                pend = _dp.dispatch(crop_fn, None, fd, pd,
                                    _block=pending is None)
                if pend is None:                # budget contended
                    settle_collect(*pending)
                    pending = None
                    pend = _dp.dispatch(crop_fn, None, fd, pd)
                    prev = None
                else:
                    prev = pending
                pending = (pend, n)
                if prev is not None:
                    settle_collect(*prev)
            settle_collect(*pending)
            pending = None
        finally:
            if pending is not None:
                pending[0].release()            # idempotent
        if len(pieces) == 1:
            return pieces[0]
        return _dp.run_settled(jnp.concatenate, pieces, axis=0)

    @functools.partial(tuned_jit, static_argnums=0)
    def _crop_video(self, variables: Variables, frames: jnp.ndarray,
                    boxes: jnp.ndarray) -> jnp.ndarray:
        del variables  # crop is parameter-free; kept for API uniformity
        return preprocess.crop_and_resize(frames, boxes,
                                          self.config.clip.crop_size)

    @functools.partial(tuned_jit, static_argnums=0)
    def _align_video(self, variables: Variables, frames: jnp.ndarray,
                     transforms: jnp.ndarray) -> jnp.ndarray:
        del variables
        return preprocess.warp_similarity(frames, transforms,
                                          self.config.clip.crop_size)

    # -- mesh-sharded batch inference (config 5) -----------------------------

    def predict_batch(self, variables: Variables, crops_rgb: jnp.ndarray,
                      mesh=None) -> jnp.ndarray:
        """Data-parallel clip inference over a device mesh.

        Shards the clip batch over ``mesh`` (default: all devices) with
        replicated params; the same jitted program serves 1..N chips.

        Contract: the replicated weights are cached by the IDENTITY of
        ``variables`` (see `_replicated_for`) — mutating leaves of the
        same dict in place between calls would silently serve the old
        weights. Pass a fresh dict (e.g. a new `variables_from_state`
        result, as every in-repo caller does) after updating params.
        """
        mesh = mesh or parallel.make_mesh()
        n = mesh.devices.size
        b = crops_rgb.shape[0]
        # Avoid a blocking device->host round trip when the caller
        # already holds a host batch (the corpus runner now pre-shards
        # and dispatches its own program — this API serves direct
        # callers like cli eval and the dryrun).
        x_np = (crops_rgb if isinstance(crops_rgb, np.ndarray)
                else np.asarray(crops_rgb))
        padded = parallel.pad_to_multiple({"x": x_np}, n)["x"]
        x = parallel.shard_batch(jnp.asarray(padded), mesh)
        v = self._replicated_for(variables, mesh)
        out = self._predict_clips(v, x)
        return out if out.shape[0] == b else out[:b]

    def _replicated_for(self, variables: Variables, mesh) -> Variables:
        """Replicate-once cache for repeated predict_batch calls.

        Re-replicating the full weights pytree per batch was a device
        round-trip per call (round-4 VERDICT weak item 4; the corpus
        runner already replicates once and documents why). Keyed by
        (variables identity, mesh): direct callers pass the same dict
        every call, so identity is the cheap correct key — a new
        variables object (or mesh) replaces the single cached copy.
        """
        cached = getattr(self, "_repl_cache", None)
        if (cached is not None and cached[0] is variables
                and cached[1] == mesh):
            return cached[2]
        v = parallel.replicate(variables, mesh)
        self._repl_cache = (variables, mesh, v)
        return v
