"""End-to-end runner tests: single jitted program, streaming, windowing,
and mesh-sharded inference == single-device (SURVEY.md §4 items 3-4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mimamo_tpu import parallel, preprocess
from mimamo_tpu.config import (BackboneSpec, ClipSpec, MimamoConfig,
                               PhaseSpec, PyramidSpec, TemporalSpec)
from mimamo_tpu.runner import Mimamo


def tiny_config(clip_len=6, stride=3):
    """Small shapes so CPU tests stay fast; structure identical to full."""
    return MimamoConfig(
        pyramid=PyramidSpec(height=2, orientations=2, input_size=(32, 32)),
        phase=PhaseSpec(phase_size=16),
        backbone=BackboneSpec(input_size=32),
        temporal=TemporalSpec(micro_cnn_features=(8,), micro_embed_dim=16,
                              macro_embed_dim=16, gru_hidden=16,
                              fusion_hidden=16),
        clip=ClipSpec(clip_len=clip_len, stride=stride, crop_size=32),
    )


@pytest.fixture(scope="module")
def model_and_vars():
    model = Mimamo(tiny_config())
    variables = model.init_variables(jax.random.PRNGKey(0))
    return model, variables


def _clips(b=2, t=6, s=32, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.uniform(0, 255, (b, t, s, s, 3)).astype(np.float32))


class TestEndToEnd:
    def test_clip_predictions(self, model_and_vars):
        model, variables = model_and_vars
        out = model.predict_clips(variables, _clips())
        assert out.shape == (2, 6, 2)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_streaming_matches_clip(self, model_and_vars):
        """Chunked streaming over a long clip == one-shot clip forward."""
        model, variables = model_and_vars
        clips = _clips(t=12)
        full = np.asarray(model.predict_clips(variables, clips))
        outs, carries = [], None
        for start in range(0, 12, 4):
            out, carries = model.predict_stream(
                variables, clips[:, start:start + 4], carries)
            outs.append(np.asarray(out))
        got = np.concatenate(outs, axis=1)
        np.testing.assert_allclose(got, full, atol=1e-4)

    def test_predict_video_end_to_end(self, model_and_vars):
        model, variables = model_and_vars
        rng = np.random.default_rng(1)
        frames = rng.uniform(0, 255, (14, 48, 64, 3)).astype(np.float32)
        boxes = np.tile(np.asarray([[8.0, 16.0, 32.0, 32.0]], np.float32),
                        (14, 1))
        series = model.predict_video(variables, frames, boxes,
                                     batch_clips=2)
        assert series.shape == (14, 2)
        assert np.all(np.isfinite(series))

    def test_predict_video_shorter_than_clip(self, model_and_vars):
        """Videos with fewer frames than clip_len must still predict
        (last-crop padding, outputs trimmed to the real length)."""
        model, variables = model_and_vars
        rng = np.random.default_rng(4)
        frames = rng.uniform(0, 255, (4, 48, 64, 3)).astype(np.float32)
        boxes = np.tile(np.asarray([[8.0, 16.0, 32.0, 32.0]], np.float32),
                        (4, 1))
        series = model.predict_video(variables, frames, boxes,
                                     batch_clips=2)
        assert series.shape == (4, 2)
        assert np.all(np.isfinite(series))

    def test_uint8_feed_bit_identical(self, model_and_vars):
        """uint8 crops (the 4x-cheaper transfer dtype) must produce
        bit-identical outputs to the same values fed as float32 — the
        cast happens on device where the f32 math starts."""
        model, variables = model_and_vars
        rng = np.random.default_rng(9)
        u8 = rng.integers(0, 256, (2, 6, 32, 32, 3), dtype=np.uint8)
        out_u8 = np.asarray(
            model.predict_clips(variables, jnp.asarray(u8)))
        out_f32 = np.asarray(model.predict_clips(
            variables, jnp.asarray(u8.astype(np.float32))))
        np.testing.assert_array_equal(out_u8, out_f32)

        frames = rng.integers(0, 256, (14, 48, 64, 3), dtype=np.uint8)
        boxes = np.tile(
            np.asarray([[8.0, 16.0, 32.0, 32.0]], np.float32), (14, 1))
        s_u8 = model.predict_video(variables, frames, boxes,
                                   batch_clips=2)
        s_f32 = model.predict_video(variables,
                                    frames.astype(np.float32), boxes,
                                    batch_clips=2)
        np.testing.assert_array_equal(s_u8, s_f32)


class TestMotionSensitivity:
    """SURVEY.md §4 item 3: a moving Gabor patch through the WHOLE jitted
    clip->(v,a) program must change predictions vs the static clip, and
    that change must be driven by the micro (phase) stream."""

    @staticmethod
    def _gabor_clip(t=6, size=32, shift_per_frame=0.0, seed=0):
        yy, xx = np.meshgrid(np.arange(size, dtype=np.float64),
                             np.arange(size, dtype=np.float64),
                             indexing="ij")
        env = np.exp(-((yy - size / 2) ** 2 + (xx - size / 2) ** 2)
                     / (2 * (size / 6) ** 2))
        freq = 2 * np.pi / 8.0          # 8-pixel carrier period
        frames = np.stack([
            127.0 + 100.0 * env * np.cos(freq * (xx - i * shift_per_frame))
            for i in range(t)])
        return np.repeat(frames[..., None], 3, axis=-1).astype(np.float32)

    def test_micro_motion_drives_predictions(self, model_and_vars):
        model, variables = model_and_vars
        cfg = model.config
        t = cfg.clip.clip_len
        static = jnp.asarray(self._gabor_clip(t=t)[None])
        moving = jnp.asarray(self._gabor_clip(
            t=t, shift_per_frame=0.5)[None])   # sub-pixel micro-motion

        out_static = np.asarray(model.predict_clips(variables, static))
        out_moving = np.asarray(model.predict_clips(variables, moving))
        full_diff = np.abs(out_moving - out_static).max()
        assert full_diff > 1e-4, "model is motion-blind end-to-end"

        # Ablation: the same forward with the phase channels zeroed. On
        # the static clip the real phase diffs ARE ~zero, so zeroing
        # them must not move the output; on the moving clip it must —
        # proving the micro stream (not appearance) carries the motion
        # response end-to-end.
        p = cfg.phase.phase_size
        zero_phase = jnp.zeros((1, t - 1, cfg.num_phase, p, p))

        def no_phase(clips):
            emb = model.embed_frames(variables, clips)
            out, _ = model.temporal.apply(variables["temporal"],
                                          zero_phase, emb)
            return np.asarray(out)

        static_gap = np.abs(out_static - no_phase(static)).max()
        moving_gap = np.abs(out_moving - no_phase(moving)).max()
        assert static_gap < 1e-3, (
            f"static clip: zeroing (already-zero) phase moved the output "
            f"by {static_gap}")
        assert moving_gap > 10 * max(static_gap, 1e-5), (
            f"moving clip: phase channels contribute nothing "
            f"(gap {moving_gap:.6f} vs static {static_gap:.6f})")


class TestSharding:
    def test_mesh_inference_matches_single_device(self, model_and_vars):
        """8-virtual-device data-parallel == single-device (SURVEY §4.4)."""
        model, variables = model_and_vars
        clips = _clips(b=8)
        single = np.asarray(model.predict_clips(variables, clips))
        mesh = parallel.make_mesh()
        assert mesh.devices.size == 8
        sharded = np.asarray(model.predict_batch(variables, clips, mesh))
        np.testing.assert_allclose(sharded, single, atol=1e-5)

    def test_uneven_batch_padding(self, model_and_vars):
        model, variables = model_and_vars
        clips = _clips(b=3)
        single = np.asarray(model.predict_clips(variables, clips))
        out = np.asarray(model.predict_batch(variables, clips))
        assert out.shape == (3, 6, 2)
        np.testing.assert_allclose(out, single, atol=1e-5)

    def test_predict_batch_replicates_once(self, model_and_vars,
                                           monkeypatch):
        """Repeated predict_batch calls with the same variables/mesh
        reuse the cached replicated pytree (round-4 VERDICT weak item
        4: a full weights device_put per batch); a different variables
        object re-replicates."""
        model, variables = model_and_vars
        mesh = parallel.make_mesh()
        calls = []
        real = parallel.replicate

        def spy(tree, m):
            calls.append(1)
            return real(tree, m)

        monkeypatch.setattr(parallel, "replicate", spy)
        model._repl_cache = None
        a = np.asarray(model.predict_batch(variables, _clips(b=8), mesh))
        b = np.asarray(model.predict_batch(variables, _clips(b=8, seed=1),
                                           mesh))
        assert len(calls) == 1, "second call re-replicated the weights"
        assert a.shape == b.shape
        v2 = dict(variables)
        model.predict_batch(v2, _clips(b=8), mesh)
        assert len(calls) == 2, "new variables object must re-replicate"

    def test_sharded_ccc_masked_ragged_batch(self):
        """sharded_ccc with a mask on a mesh-PADDED batch == the host
        ccc on the unpadded rows (VERDICT round-3 weak item 5: without
        the mask, pad_to_multiple's zero rows bias every moment);
        unmasked on an unpadded batch still matches."""
        from mimamo_tpu.data.eval import ccc_np
        rng = np.random.default_rng(0)
        mesh = parallel.make_mesh()
        n = mesh.devices.size
        b_real = n + 3                         # ragged: needs padding
        p = rng.standard_normal((b_real, 2)).astype(np.float32)
        y = (0.6 * p + 0.4 * rng.standard_normal(
            (b_real, 2))).astype(np.float32)
        want = ccc_np(p, y)
        padded = parallel.pad_to_multiple({"p": p, "y": y}, n)
        mask = np.zeros(padded["p"].shape[0], np.float32)
        mask[:b_real] = 1.0
        sp = parallel.shard_batch(
            {k: jnp.asarray(v) for k, v in padded.items()}, mesh)
        got = np.asarray(parallel.sharded_ccc(
            sp["p"], sp["y"], mesh,
            mask=parallel.shard_batch(jnp.asarray(mask), mesh)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
        # the padded zero rows DO bias the unmasked metric — the mask
        # is load-bearing, not cosmetic
        biased = np.asarray(parallel.sharded_ccc(sp["p"], sp["y"], mesh))
        assert np.abs(biased - want).max() > 1e-3
        # unmasked + unpadded (the dryrun's contract) still exact
        p8 = jnp.asarray(p[:n])
        y8 = jnp.asarray(y[:n])
        got8 = np.asarray(parallel.sharded_ccc(
            parallel.shard_batch(p8, mesh),
            parallel.shard_batch(y8, mesh), mesh))
        np.testing.assert_allclose(got8, ccc_np(p[:n], y[:n]),
                                   rtol=1e-4, atol=1e-5)

    def test_sharded_ccc_bf16_count_exact(self):
        """The masked row count accumulates in f32 even for bf16
        inputs: bf16 can't represent 257 (spacing 2 above 256), which
        would bias every moment's divisor (round-4 review finding)."""
        from mimamo_tpu.data.eval import ccc_np
        rng = np.random.default_rng(1)
        mesh = parallel.make_mesh()
        n = mesh.devices.size
        b = 257 - (257 % n) + n                # divisible, > 256
        p = rng.standard_normal((b, 2)).astype(np.float32)
        y = (0.5 * p + 0.5 * rng.standard_normal((b, 2))
             ).astype(np.float32)
        got = np.asarray(parallel.sharded_ccc(
            parallel.shard_batch(jnp.asarray(p, jnp.bfloat16), mesh),
            parallel.shard_batch(jnp.asarray(y, jnp.bfloat16), mesh),
            mesh))
        # bf16 data => loose value tolerance, but the count itself must
        # be exact: a 256-vs-260 divisor shows up at the 1e-2 level
        np.testing.assert_allclose(
            got, ccc_np(p, y), rtol=2e-2, atol=2e-2)


class TestPreprocess:
    def test_crop_and_resize_identity_box(self):
        rng = np.random.default_rng(2)
        frames = jnp.asarray(
            rng.uniform(0, 255, (3, 32, 32, 3)).astype(np.float32))
        boxes = jnp.tile(jnp.asarray([[0.0, 0.0, 32.0, 32.0]]), (3, 1))
        out = preprocess.crop_and_resize(frames, boxes, 32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(frames),
                                   atol=1e-4)

    def test_crop_matches_manual_slice(self):
        """Integer box + matching output size == plain slicing."""
        rng = np.random.default_rng(3)
        frames = jnp.asarray(
            rng.uniform(0, 255, (2, 40, 40, 3)).astype(np.float32))
        boxes = jnp.tile(jnp.asarray([[4.0, 8.0, 16.0, 16.0]]), (2, 1))
        out = preprocess.crop_and_resize(frames, boxes, 16)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(frames[:, 4:20, 8:24]),
                                   atol=1e-3)

    def test_sliding_windows_cover_tail(self):
        x = jnp.arange(10)
        windows, starts = preprocess.sliding_windows(x, 4, 3)
        assert list(starts) == [0, 3, 6]
        np.testing.assert_array_equal(np.asarray(windows[-1]),
                                      [6, 7, 8, 9])

    def test_merge_overlap_average(self):
        preds = jnp.stack([jnp.ones((4, 2)), 3 * jnp.ones((4, 2))])
        merged = preprocess.merge_window_predictions(
            preds, np.asarray([0, 2]), 6)
        np.testing.assert_allclose(np.asarray(merged[:2]), 1.0)
        np.testing.assert_allclose(np.asarray(merged[2:4]), 2.0)
        np.testing.assert_allclose(np.asarray(merged[4:]), 3.0)

    def test_upscale2x_matches_resize_matrix(self):
        """The fused 2-tap interleave upscale == the matmul-form bilinear
        resize (and therefore torch F.interpolate) at scale factor 2."""
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.uniform(0, 255, (3, 16, 16, 5)).astype(
            np.float32))
        got = np.asarray(preprocess.upscale2x(x))
        want = np.asarray(jnp.moveaxis(preprocess.resize_bilinear(
            jnp.moveaxis(x, -1, -3), (32, 32)), -3, -1))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=0)

    def test_for_backbone_bf16_close_to_f32(self):
        """The bf16 backbone profile runs the upscale + mean-sub chain
        in bf16 (halved HBM traffic for the 224^2 materialization); its
        output must stay within bf16 rounding of the f32 chain."""
        import dataclasses
        from mimamo_tpu.config import BackboneSpec
        rng = np.random.default_rng(7)
        crops = jnp.asarray(rng.integers(
            0, 256, (2, 16, 16, 3)).astype(np.float32))
        f32 = BackboneSpec(input_size=32, dtype="float32")
        b16 = dataclasses.replace(f32, dtype="bfloat16")
        a = np.asarray(preprocess.for_backbone(crops, f32))
        b = np.asarray(preprocess.for_backbone(crops, b16),
                       dtype=np.float32)
        assert b.dtype == np.float32  # cast for comparison
        # bf16 has ~2^-8 relative precision; values are O(255) and the
        # chain rounds twice (upscale + mean-sub) -> grid step 1.0 near
        # 255, worst observed ~1.7
        np.testing.assert_allclose(b, a, atol=2.0, rtol=0)
        assert preprocess.for_backbone(crops, b16).dtype == jnp.bfloat16

    def test_grayscale_bt601(self):
        x = jnp.zeros((1, 2, 2, 3)).at[..., 1].set(100.0)
        np.testing.assert_allclose(
            np.asarray(preprocess.to_grayscale(x)), 58.7, atol=1e-3)


class TestAppearanceStride:
    """Opt-in serving profile: ResNet on every k-th frame + linear
    embedding interpolation (BackboneSpec.appearance_stride)."""

    def _cfg(self, k):
        import dataclasses
        cfg = tiny_config()
        return dataclasses.replace(
            cfg, backbone=dataclasses.replace(cfg.backbone,
                                              appearance_stride=k))

    def test_anchor_frames_match_full_computation(self):
        rng = np.random.default_rng(5)
        clips = jnp.asarray(
            rng.uniform(0, 255, (2, 6, 32, 32, 3)).astype(np.float32))
        full_m = Mimamo(self._cfg(1))
        variables = full_m.init_variables(jax.random.PRNGKey(0))
        full = np.asarray(full_m.embed_frames(variables, clips))
        strided = np.asarray(
            Mimamo(self._cfg(2)).embed_frames(variables, clips))
        # anchors 0, 2, 4 computed exactly up to cross-program noise
        # (the strided program convolves a different batch size ->
        # different tiling/reduction order; ~1e-4 abs on O(30)
        # activations, relative ~4e-6); odd frames are midpoints
        tol = dict(rtol=1e-5, atol=1e-3)
        for a in (0, 2, 4):
            np.testing.assert_allclose(strided[:, a], full[:, a], **tol)
        np.testing.assert_allclose(
            strided[:, 1], (full[:, 0] + full[:, 2]) / 2, **tol)
        # frame 5 is past the last anchor (4): holds it
        np.testing.assert_allclose(strided[:, 5], full[:, 4], **tol)

    def test_streaming_seam_drift_localized_and_quantified(self):
        """k>1 chunked streaming re-anchors per chunk (config.py
        documents the divergence); pin its STRUCTURE: frames before the
        first in-chunk anchor clamp are identical to batch prediction
        (same anchor grid; only cross-program fp noise), and the seam
        drift on a smooth clip stays a small fraction of the output
        scale (the error bar quoted in BackboneSpec.appearance_stride
        docs comes from bench/stride_drift.py on flagship shapes)."""
        rng = np.random.default_rng(8)
        t, chunk = 16, 4
        base = rng.uniform(60, 200, (1, 1, 32, 32, 3))
        drift = np.linspace(0, 6, t)[None, :, None, None, None]
        clips = jnp.asarray(np.clip(base + drift, 0, 255).astype(
            np.float32))
        variables = Mimamo(self._cfg(1)).init_variables(
            jax.random.PRNGKey(0))
        for k in (2, 4):
            m = Mimamo(self._cfg(k))
            batch = np.asarray(m.predict_clips(variables, clips))
            outs, carries = [], None
            for s in range(0, t, chunk):
                o, carries = m.predict_stream(
                    variables, clips[:, s:s + chunk], carries)
                outs.append(np.asarray(o))
            stream = np.concatenate(outs, axis=1)
            # first frame whose in-chunk interpolation clamps (batch
            # would reach the next global anchor): k*(ceil(c/k)-1)+1
            f_star = k * (-(-chunk // k) - 1) + 1
            np.testing.assert_allclose(stream[:, :f_star],
                                       batch[:, :f_star],
                                       rtol=1e-5, atol=1e-3)
            drift_max = np.abs(stream - batch).max()
            scale = np.abs(batch).max()
            assert np.isfinite(stream).all()
            assert drift_max < 0.5 * max(scale, 0.1), (
                f"k={k}: seam drift {drift_max} vs scale {scale}")

    def test_invalid_stride_rejected(self):
        import dataclasses
        from mimamo_tpu.config import BackboneSpec
        with pytest.raises(ValueError, match="appearance_stride"):
            BackboneSpec(appearance_stride=0)

    def test_full_pipeline_and_outputs_close(self):
        rng = np.random.default_rng(6)
        # slowly-varying clip: strided appearance should barely move
        # the predictions
        base = rng.uniform(60, 200, (1, 1, 32, 32, 3))
        drift = np.linspace(0, 4, 6)[None, :, None, None, None]
        clips = jnp.asarray(
            np.clip(base + drift, 0, 255).astype(np.float32))
        variables = Mimamo(self._cfg(1)).init_variables(
            jax.random.PRNGKey(0))
        full = np.asarray(
            Mimamo(self._cfg(1)).predict_clips(variables, clips))
        strided = np.asarray(
            Mimamo(self._cfg(3)).predict_clips(variables, clips))
        assert strided.shape == full.shape
        assert np.all(np.isfinite(strided))
        assert np.abs(strided - full).max() < 0.05, (
            f"strided diverged {np.abs(strided - full).max():.4f}")


class TestStreamAblationRunner:
    """Ablation configs through the full jitted pipeline + train step."""

    def _cfg(self, streams):
        import dataclasses
        cfg = tiny_config()
        return dataclasses.replace(
            cfg, temporal=dataclasses.replace(cfg.temporal,
                                              streams=streams))

    def test_predict_clips_all_modes(self):
        rng = np.random.default_rng(0)
        clips = jnp.asarray(
            rng.uniform(0, 255, (2, 6, 32, 32, 3)).astype(np.float32))
        for streams in ("both", "micro", "macro"):
            model = Mimamo(self._cfg(streams))
            variables = model.init_variables(jax.random.PRNGKey(0))
            out = model.predict_clips(variables, clips)
            assert out.shape == (2, 6, 2), streams
            assert np.all(np.isfinite(np.asarray(out))), streams

    def test_macro_only_output_independent_of_motion(self):
        """Appearance-identical clips with different micro-motion must
        produce identical macro-only predictions (and different
        two-stream predictions)."""
        rng = np.random.default_rng(1)
        base = rng.uniform(40, 215, (1, 6, 32, 32, 3)).astype(np.float32)
        moved = base.copy()
        moved[:, 1:] = np.roll(moved[:, 1:], 2, axis=3)  # translate
        macro = Mimamo(self._cfg("macro"))
        mv = macro.init_variables(jax.random.PRNGKey(0))
        a = np.asarray(macro.predict_clips(mv, jnp.asarray(base)))
        b = np.asarray(macro.predict_clips(mv, jnp.asarray(moved)))
        # motion changed pixel content, so appearance embeddings differ
        # per-frame; compare frame 0 (identical pixels) only
        np.testing.assert_allclose(a[:, 0], b[:, 0], atol=1e-6)

    def test_train_step_all_modes(self):
        from mimamo_tpu import train as train_mod
        import dataclasses
        rng = np.random.default_rng(2)
        batch = {
            "clips": jnp.asarray(rng.uniform(
                0, 255, (2, 6, 32, 32, 3)).astype(np.float32)),
            "labels": jnp.asarray(np.tanh(rng.standard_normal(
                (2, 6, 2))).astype(np.float32)),
            "mask": jnp.ones((2, 6), jnp.float32),
        }
        for streams in ("micro", "macro"):
            model = Mimamo(self._cfg(streams))
            state, tx = train_mod.create_train_state(
                model, jax.random.PRNGKey(0))
            step = train_mod.make_train_step(model, tx)
            s1, m1 = step(jax.tree_util.tree_map(jnp.copy, state), batch)
            s2, m2 = step(s1, batch)
            assert np.isfinite(float(m2["loss"])), streams
            assert float(m2["loss"]) < float(m1["loss"]) + 1e-6, streams


class TestPipelineSlotRelease:
    """A fetch that raises mid-pipeline must not leak a dispatch slot.

    The in-flight budget (mimamo_tpu.dispatch) is process-wide and
    shared with the serve daemon: a slot leaked on a tunnel/OOM error
    would permanently shrink it to depth-1, and a second failure would
    deadlock every later caller (round-5 review finding; the fix wraps
    both depth-2 pipelines in try/finally + release)."""

    @staticmethod
    def _assert_budget_intact():
        from mimamo_tpu import dispatch as _dp
        assert _dp.inflight() == 0
        # both slots must still be acquirable (BoundedSemaphore would
        # raise on over-release; None here would mean a leaked slot)
        a = _dp.dispatch(jnp.add, jnp.ones(()), jnp.ones(()))
        b = _dp.dispatch(jnp.add, jnp.ones(()), jnp.ones(()),
                         _block=False)
        assert b is not None
        a.release()
        b.release()

    def test_predict_from_crops_releases_on_fetch_failure(
            self, model_and_vars, monkeypatch):
        model, variables = model_and_vars
        crops = np.asarray(_clips(b=1, t=15)[0])  # 4 windows

        def boom(*a, **k):
            raise RuntimeError("tunnel dropped")

        monkeypatch.setattr(jax, "device_get", boom)
        with pytest.raises(RuntimeError, match="tunnel dropped"):
            model.predict_from_crops(variables, crops, batch_clips=1)
        monkeypatch.undo()
        self._assert_budget_intact()

    def test_crop_video_chunked_releases_on_fetch_failure(
            self, model_and_vars, monkeypatch):
        model, _ = model_and_vars
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 255, (10, 48, 48, 3), dtype=np.uint8)
        boxes = np.tile(np.array([8, 8, 40, 40], np.float32), (10, 1))

        def boom(*a, **k):
            raise RuntimeError("tunnel dropped")

        monkeypatch.setattr(jax, "device_get", boom)
        with pytest.raises(RuntimeError, match="tunnel dropped"):
            model.crop_video_chunked(frames, boxes, chunk=4)
        monkeypatch.undo()
        self._assert_budget_intact()
