"""Training-step tests: loss decreases, frozen backbone stays frozen,
sharded step == single-device step, checkpoint round-trip."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mimamo_tpu import checkpoints, parallel, train
from mimamo_tpu.data import datasets
from mimamo_tpu.runner import Mimamo

from test_runner import tiny_config


@pytest.fixture(scope="module")
def setup():
    model = Mimamo(tiny_config())
    state, tx = train.create_train_state(model, jax.random.PRNGKey(0))
    step = train.make_train_step(model, tx)
    return model, state, tx, step


def _batch(b=2, t=6, s=32, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "clips": jnp.asarray(
            rng.uniform(0, 255, (b, t, s, s, 3)).astype(np.float32)),
        "labels": jnp.asarray(
            np.tanh(rng.standard_normal((b, t, 2))).astype(np.float32)),
        "mask": jnp.ones((b, t), jnp.float32),
    }


class TestTrainStep:
    def test_loss_decreases(self, setup):
        model, state, tx, step = setup
        state = jax.tree_util.tree_map(jnp.copy, state)  # step donates input
        batch = _batch()
        first = None
        for i in range(8):
            state, metrics = step(state, batch)
            if first is None:
                first = float(metrics["loss"])
        assert float(metrics["loss"]) < first
        assert int(state.step) == 8

    def test_uint8_batch_matches_float32(self, setup):
        """uint8 clips (the preferred storage/feed dtype) must train
        bit-identically to the same values as float32. Guards the
        unconditional cast in loss_fn: to_grayscale casts its luma
        weights to the INPUT dtype, so an uncast uint8 batch would
        silently zero the whole micro-motion stream (round-4 review
        finding)."""
        model, state, tx, step = setup
        rng = np.random.default_rng(7)
        u8 = rng.integers(0, 256, (2, 6, 32, 32, 3), dtype=np.uint8)
        labels = jnp.asarray(
            np.tanh(rng.standard_normal((2, 6, 2))).astype(np.float32))
        mask = jnp.ones((2, 6), jnp.float32)
        b_u8 = {"clips": jnp.asarray(u8), "labels": labels, "mask": mask}
        b_f32 = {"clips": jnp.asarray(u8.astype(np.float32)),
                 "labels": labels, "mask": mask}
        s1, m1 = step(jax.tree_util.tree_map(jnp.copy, state), b_u8)
        s2, m2 = step(jax.tree_util.tree_map(jnp.copy, state), b_f32)
        assert float(m1["loss"]) == float(m2["loss"])
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s2.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_frozen_backbone_unchanged(self, setup):
        model, state, tx, step = setup
        before = jax.tree_util.tree_leaves(state.params["backbone"])
        new_state, _ = step(
            jax.tree_util.tree_map(jnp.copy, state), _batch(seed=1))
        after = jax.tree_util.tree_leaves(new_state.params["backbone"])
        for a, b in zip(before, after):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # temporal params DID change
        tb = jax.tree_util.tree_leaves(state.params["temporal"])
        ta = jax.tree_util.tree_leaves(new_state.params["temporal"])
        assert any(float(jnp.abs(x - y).max()) > 0 for x, y in zip(tb, ta))

    def test_sharded_step_matches_single(self):
        """Data-parallel grad psum == single-device step (SURVEY §4.4)."""
        model = Mimamo(tiny_config())
        state, tx = train.create_train_state(model, jax.random.PRNGKey(1))
        step = train.make_train_step(model, tx)
        batch = _batch(b=8, seed=2)

        s_single, m_single = step(
            jax.tree_util.tree_map(jnp.copy, state), batch)

        mesh = parallel.make_mesh()
        sharded_batch = parallel.shard_batch(batch, mesh)
        state_r = parallel.replicate(
            jax.tree_util.tree_map(jnp.copy, state), mesh)
        s_shard, m_shard = step(state_r, sharded_batch)

        np.testing.assert_allclose(float(m_single["loss"]),
                                   float(m_shard["loss"]), atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(s_single.params),
                        jax.tree_util.tree_leaves(s_shard.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

    def test_batch_axis_loss_trains_on_constant_labels(self):
        """OMG-style utterance labels (constant over the clip): time-axis
        CCC is degenerate (stuck at loss 1.0); batch-axis must learn."""
        import dataclasses
        from mimamo_tpu.config import TrainSpec
        cfg = dataclasses.replace(tiny_config(),
                                  train=TrainSpec(loss_axis="batch",
                                                  learning_rate=1e-3))
        model = Mimamo(cfg)
        state, tx = train.create_train_state(model, jax.random.PRNGKey(3))
        step = train.make_train_step(model, tx)
        rng = np.random.default_rng(5)
        clips = rng.uniform(0, 255, (4, 6, 32, 32, 3)).astype(np.float32)
        per_clip = np.tanh(rng.standard_normal((4, 1, 2))).astype(
            np.float32)
        batch = {"clips": jnp.asarray(clips),
                 "labels": jnp.asarray(np.tile(per_clip, (1, 6, 1))),
                 "mask": jnp.ones((4, 6), jnp.float32)}
        losses = []
        for _ in range(10):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert losses[0] > 0.5          # not degenerate-zero
        assert losses[-1] < losses[0]   # actually learning

    def test_unfrozen_backbone_with_remat(self):
        """freeze_backbone=False + remat: backbone params receive grads."""
        import dataclasses
        from mimamo_tpu.config import TrainSpec
        cfg = dataclasses.replace(
            tiny_config(),
            train=TrainSpec(freeze_backbone=False, remat_backbone=True))
        model = Mimamo(cfg)
        state, tx = train.create_train_state(model, jax.random.PRNGKey(4))
        step = train.make_train_step(model, tx)
        before = [np.asarray(x) for x in
                  jax.tree_util.tree_leaves(state.params["backbone"])]
        state, metrics = step(state, _batch(seed=6))
        after = jax.tree_util.tree_leaves(state.params["backbone"])
        assert np.isfinite(float(metrics["loss"]))
        assert any(float(jnp.abs(jnp.asarray(a) - b).max()) > 0
                   for a, b in zip(after, before))

    def test_masked_clip_labels_do_not_affect_loss(self, setup):
        """A fully-masked clip's labels are weighted out of loss and
        metrics on both CCC axes (mesh-padding defense). Train-mode BN
        still sees the clip pixels, so the comparison varies only the
        masked clip's *labels* — identical inputs, different garbage."""
        import dataclasses
        from mimamo_tpu.config import TrainSpec
        for axis in ("time", "batch"):
            cfg = dataclasses.replace(tiny_config(),
                                      train=TrainSpec(loss_axis=axis))
            model = Mimamo(cfg)
            state, tx = train.create_train_state(model,
                                                 jax.random.PRNGKey(7))
            step = train.make_train_step(model, tx)
            batch = _batch(b=4, seed=8)
            if axis == "batch":  # constant-over-time labels
                batch["labels"] = jnp.tile(batch["labels"][:, :1],
                                           (1, 6, 1))
            mask = np.ones((4, 6), np.float32)
            mask[3] = 0.0                      # clip 3 is padding
            batch["mask"] = jnp.asarray(mask)
            alt = dict(batch)
            alt["labels"] = batch["labels"].at[3].set(99.0)
            _s1, m1 = step(jax.tree_util.tree_map(jnp.copy, state), batch)
            _s2, m2 = step(jax.tree_util.tree_map(jnp.copy, state), alt)
            for k in m1:
                np.testing.assert_allclose(float(m1[k]), float(m2[k]),
                                           atol=1e-5,
                                           err_msg=f"axis={axis} {k}")

    def test_cached_features_match_frozen_backbone(self, setup):
        """Training from cached .feat.npy appearance features (the
        reference's actual workflow — SURVEY.md §3.2/3.3) produces the
        same loss/grads as running the frozen backbone in-graph."""
        model, state, tx, step = setup
        batch = _batch(seed=11)
        variables = train.variables_from_state(state)
        feats = model.embed_frames(variables, batch["clips"])
        cached = dict(batch, features=jnp.asarray(feats))
        s1, m1 = step(jax.tree_util.tree_map(jnp.copy, state), batch)
        s2, m2 = step(jax.tree_util.tree_map(jnp.copy, state), cached)
        # small fp slack: the cached features come from a separately
        # jitted program, so fusion differences shift last bits
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

    def test_cached_features_reject_finetuning(self):
        import dataclasses
        from mimamo_tpu.config import TrainSpec
        cfg = dataclasses.replace(
            tiny_config(), train=TrainSpec(freeze_backbone=False,
                                           remat_backbone=False))
        model = Mimamo(cfg)
        state, tx = train.create_train_state(model, jax.random.PRNGKey(9))
        step = train.make_train_step(model, tx)
        batch = _batch(seed=12)
        batch["features"] = jnp.zeros(
            (2, 6, cfg.backbone.feature_dim), jnp.float32)
        with pytest.raises(ValueError, match="freeze_backbone"):
            step(state, batch)

    def test_metrics_reported(self, setup):
        model, state, tx, step = setup
        _, metrics = step(jax.tree_util.tree_map(jnp.copy, state), _batch())
        assert set(metrics) == {"loss", "ccc_v", "ccc_a"}
        assert all(np.isfinite(float(v)) for v in metrics.values())


class TestMultiHostAssembly:
    """Multi-host training plumbing (SURVEY.md §7 step 7). Real DCN
    needs multiple processes; here the 8-virtual-device mesh proves
    (a) the assembly primitive is exactly shard_batch on one process,
    and (b) the per-process pipeline (disjoint interleaved dataset
    slices, assembled in process order — the layout
    make_array_from_process_local_data produces, since make_mesh's
    device order is process-contiguous) yields the same loss and
    updated params as the single-process run over the same clips."""

    def test_global_batch_single_process_equals_shard_batch(self):
        mesh = parallel.make_mesh()
        batch = _batch(b=8, seed=7)
        got = parallel.global_batch(
            {k: np.asarray(v) for k, v in batch.items()}, mesh)
        want = parallel.shard_batch(batch, mesh)
        for k in batch:
            np.testing.assert_array_equal(np.asarray(got[k]),
                                          np.asarray(want[k]))
            assert got[k].sharding.is_equivalent_to(want[k].sharding,
                                                    got[k].ndim)

    def test_simulated_two_process_loss_parity(self, tmp_path):
        from mimamo_tpu.data import datasets
        datasets.make_synthetic_affwild2(str(tmp_path), n_videos=4,
                                         frames=12, size=32, seed=4)
        cfg = tiny_config()
        ds = datasets.AffWild2Dataset(str(tmp_path), clip=cfg.clip)
        assert len(ds) >= 4
        model = Mimamo(cfg)
        state, tx = train.create_train_state(model, jax.random.PRNGKey(2))
        step = train.make_train_step(model, tx)
        mesh = parallel.make_mesh(jax.devices()[:4])

        # Single-process reference: one global batch of 4.
        single = next(iter(ds.batches(4, shuffle=True, seed=9,
                                      drop_remainder=True)))
        sb = parallel.shard_batch(
            {k: jnp.asarray(v) for k, v in single.items()}, mesh)
        s_ref, m_ref = step(jax.tree_util.tree_map(jnp.copy, state), sb)

        # Two simulated processes: each draws 2 clips from its slice.
        locals_ = [next(iter(ds.batches(2, shuffle=True, seed=9,
                                        drop_remainder=True,
                                        process_id=p, process_count=2)))
                   for p in range(2)]
        assembled = {k: np.concatenate([loc[k] for loc in locals_])
                     for k in locals_[0]}
        # Same clip multiset as the single-process batch (disjoint slices
        # of the same shuffled index), just process-interleaved order.
        key = sorted(float(c.sum()) for c in single["clips"])
        assert sorted(float(c.sum())
                      for c in assembled["clips"]) == pytest.approx(key)
        gb = parallel.shard_batch(
            {k: jnp.asarray(v) for k, v in assembled.items()}, mesh)
        s_got, m_got = step(jax.tree_util.tree_map(jnp.copy, state), gb)

        np.testing.assert_allclose(float(m_got["loss"]),
                                   float(m_ref["loss"]), atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(s_got.params),
                        jax.tree_util.tree_leaves(s_ref.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


class TestAugmentAndSchedules:
    @staticmethod
    def _model(**train_kw):
        import dataclasses
        from mimamo_tpu.config import TrainSpec
        cfg = tiny_config()
        cfg = dataclasses.replace(cfg, train=TrainSpec(**train_kw))
        return Mimamo(cfg)

    def test_augment_changes_metrics_deterministically(self):
        """Flip/jitter alter the step's loss vs un-augmented, and the
        same (seed, step) reproduces bit-identical metrics."""
        plain = self._model(epochs=1)
        aug = self._model(epochs=1, augment=True, brightness_jitter=0.2)
        state0, tx0 = train.create_train_state(plain,
                                               jax.random.PRNGKey(0))
        state1, tx1 = train.create_train_state(aug, jax.random.PRNGKey(0))
        batch = _batch(seed=3)
        _, m_plain = train.make_train_step(plain, tx0)(
            jax.tree_util.tree_map(jnp.copy, state0), batch)
        step_aug = train.make_train_step(aug, tx1)
        _, m_aug = step_aug(
            jax.tree_util.tree_map(jnp.copy, state1), batch)
        _, m_aug2 = step_aug(
            jax.tree_util.tree_map(jnp.copy, state1), batch)
        assert float(m_aug["loss"]) != float(m_plain["loss"])
        assert float(m_aug["loss"]) == float(m_aug2["loss"])
        assert np.isfinite(float(m_aug["loss"]))

    def test_augment_rejects_cached_features(self):
        model = self._model(epochs=1, augment=True)
        state, tx = train.create_train_state(model, jax.random.PRNGKey(0))
        step = train.make_train_step(model, tx)
        batch = _batch()
        batch["features"] = jnp.zeros(
            (2, 6, model.config.backbone.feature_dim))
        with pytest.raises(ValueError, match="augmentation requires"):
            step(state, batch)

    def test_cosine_schedule_trains_and_requires_total_steps(self):
        with pytest.raises(ValueError, match="total_steps"):
            train.make_optimizer(
                self._model(epochs=1, lr_schedule="cosine").config)
        model = self._model(epochs=1, lr_schedule="cosine",
                            warmup_steps=2)
        tx = train.make_optimizer(model.config, total_steps=6)
        state, tx = train.create_train_state(model, jax.random.PRNGKey(0),
                                             tx=tx)
        step = train.make_train_step(model, tx)
        batch = _batch()
        # warmup step 0 has lr=0: params must be unchanged
        s1, m = step(jax.tree_util.tree_map(jnp.copy, state), batch)
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(s1.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for _ in range(5):
            s1, m = step(s1, batch)
        assert np.isfinite(float(m["loss"]))

    def test_cosine_resume_respans_horizon(self):
        """A cosine run resumed past its decay horizon would train at
        lr ~= 0 forever; rebuilding the optimizer with total_steps =
        resumed + planned (the CLI's --resume behavior) must keep the
        restored opt_state valid AND produce non-zero updates."""
        model = self._model(epochs=1, lr_schedule="cosine")
        tx1 = train.make_optimizer(model.config, total_steps=3)
        state, tx1 = train.create_train_state(model, jax.random.PRNGKey(0),
                                              tx=tx1)
        step1 = train.make_train_step(model, tx1)
        batch = _batch()
        for _ in range(3):
            state, _ = step1(state, batch)
        # past the horizon with the ORIGINAL tx: lr decayed to 0
        frozen, _ = step1(jax.tree_util.tree_map(jnp.copy, state), batch)
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(frozen.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-7)
        # re-spanned tx (structure-identical opt_state): updates resume
        tx2 = train.make_optimizer(model.config, total_steps=3 + 3)
        step2 = train.make_train_step(model, tx2)
        resumed, _ = step2(jax.tree_util.tree_map(jnp.copy, state), batch)
        tb = jax.tree_util.tree_leaves(state.params["temporal"])
        ta = jax.tree_util.tree_leaves(resumed.params["temporal"])
        assert any(float(jnp.abs(x - y).max()) > 1e-7
                   for x, y in zip(tb, ta))

    def test_unknown_schedule_rejected(self):
        with pytest.raises(ValueError, match="lr_schedule"):
            train.make_optimizer(
                self._model(epochs=1, lr_schedule="nope").config,
                total_steps=5)


class TestCheckpoints:
    def test_orbax_roundtrip(self, setup, tmp_path):
        model, state, tx, step = setup
        state2, _ = step(jax.tree_util.tree_map(jnp.copy, state), _batch())
        path = str(tmp_path / "ckpt")
        checkpoints.save(path, state2)
        restored = checkpoints.restore(path, jax.tree_util.tree_map(
            np.asarray, state2))
        for a, b in zip(jax.tree_util.tree_leaves(state2),
                        jax.tree_util.tree_leaves(restored)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        assert checkpoints.latest_step(path) == 1

    def test_pth_roundtrip_temporal(self, tmp_path):
        """Synthetic reference-style .pth loads into the temporal model
        and changes its outputs accordingly (SURVEY §4 item 6)."""
        import torch
        model = Mimamo(tiny_config())
        variables = model.init_variables(jax.random.PRNGKey(0))
        h = model.config.temporal.gru_hidden
        f = model.config.backbone.feature_dim
        torch.manual_seed(0)
        sd = {}
        for stream, din in (("gru_micro", model.config.temporal
                             .micro_embed_dim),
                            ("gru_macro", model.config.temporal
                             .macro_embed_dim)):
            sd[f"{stream}.weight_ih_l0"] = torch.randn(3 * h, din)
            sd[f"{stream}.weight_hh_l0"] = torch.randn(3 * h, h)
            sd[f"{stream}.bias_ih_l0"] = torch.randn(3 * h)
            sd[f"{stream}.bias_hh_l0"] = torch.randn(3 * h)
        sd["head.weight"] = torch.randn(2, model.config.temporal
                                        .fusion_hidden)
        sd["head.bias"] = torch.randn(2)
        p = str(tmp_path / "two_stream.pth")
        torch.save(sd, p)

        loaded = checkpoints.load_pth(p)
        overlay = checkpoints.load_temporal_state_dict(loaded)
        tvars = variables["temporal"]
        merged = checkpoints.merge_params(tvars["params"],
                                          overlay["params"])
        np.testing.assert_allclose(
            np.asarray(merged["gru_micro"]["w_ih"]),
            sd["gru_micro.weight_ih_l0"].numpy())
        np.testing.assert_allclose(
            np.asarray(merged["head"]["kernel"]),
            sd["head.weight"].numpy().T)
        # merge preserved untouched (framework-native) micro-CNN params
        assert "micro_cnn" in merged

    def test_stacked_gru_checkpoint_mapping(self):
        """2-layer torch GRU tensors map onto the l1_-prefixed flax
        names (docs/WEIGHTS.md contract)."""
        h, d = 4, 6
        sd = {}
        for li in (0, 1):
            din = d if li == 0 else h
            sd[f"gru_macro.weight_ih_l{li}"] = np.full(
                (3 * h, din), float(li), np.float32)
            sd[f"gru_macro.weight_hh_l{li}"] = np.zeros((3 * h, h),
                                                        np.float32)
            sd[f"gru_macro.bias_ih_l{li}"] = np.zeros(3 * h, np.float32)
            sd[f"gru_macro.bias_hh_l{li}"] = np.zeros(3 * h, np.float32)
        out = checkpoints.load_temporal_state_dict(sd)
        node = out["params"]["gru_macro"]
        assert node["w_ih"].shape == (12, 6)
        assert node["l1_w_ih"].shape == (12, 4)
        assert float(node["l1_w_ih"][0, 0]) == 1.0

    def test_prefix_map_translation(self):
        h = 4
        sd = {"rnn1.weight_ih_l0": np.zeros((3 * h, 8), np.float32),
              "rnn1.weight_hh_l0": np.zeros((3 * h, h), np.float32),
              "rnn1.bias_ih_l0": np.zeros(3 * h, np.float32),
              "rnn1.bias_hh_l0": np.zeros(3 * h, np.float32)}
        out = checkpoints.load_temporal_state_dict(
            sd, prefix_map={"rnn1.": "gru_micro."})
        assert out["params"]["gru_micro"]["w_ih"].shape == (12, 8)

    def test_strict_rejects_unknown_keys(self):
        """A foreign schema without prefix_map must error, not load
        nothing (ADVICE round 1: silent-drop failure mode)."""
        sd = {"some_module.weight": np.zeros((2, 2), np.float32)}
        with pytest.raises(KeyError):
            checkpoints.load_temporal_state_dict(sd)
        out = checkpoints.load_temporal_state_dict(sd, strict=False)
        assert out["params"] == {}

    def test_gru_layers_beyond_old_cap(self):
        """Layer indices are parsed, not enumerated — no silent cap."""
        h = 4
        sd = {"gru_macro.weight_ih_l9": np.zeros((3 * h, h), np.float32)}
        out = checkpoints.load_temporal_state_dict(sd)
        assert "l9_w_ih" in out["params"]["gru_macro"]

    def test_micro_cnn_import_forward_parity(self):
        """Imported micro-CNN weights reproduce the torch mirror's eval
        forward — incl. the NCHW->NHWC fc flatten permutation."""
        import torch
        from mimamo_tpu import temporal
        cfg = tiny_config()
        spec, p = cfg.temporal, cfg.phase.phase_size
        ref = _TorchMicroCNN(cfg.num_phase, spec.micro_cnn_features,
                             spec.micro_embed_dim, p)
        ref.eval()
        sd = {f"micro_cnn.{k}": v.numpy()
              for k, v in ref.state_dict().items()}
        overlay = checkpoints.load_temporal_state_dict(
            sd, spec=spec, phase_size=p)
        x = np.random.default_rng(0).standard_normal(
            (3, p, p, cfg.num_phase)).astype(np.float32)
        got = temporal.MicroCNN(spec).apply(
            {"params": overlay["params"]["micro_cnn"],
             "batch_stats": overlay["batch_stats"]["micro_cnn"]},
            jnp.asarray(x))
        with torch.no_grad():
            want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   atol=1e-4)

    def test_full_two_stream_checkpoint_roundtrip(self, tmp_path):
        """Every tensor of a full reference-shaped .pth lands in the
        variables tree (zero unmapped keys) and changes model output —
        the 'checkpoint-loadable weights' north-star contract."""
        import torch
        cfg = tiny_config()
        model = Mimamo(cfg)
        variables = model.init_variables(jax.random.PRNGKey(0))
        spec, p, h = cfg.temporal, cfg.phase.phase_size, \
            cfg.temporal.gru_hidden
        torch.manual_seed(0)
        cnn = _TorchMicroCNN(cfg.num_phase, spec.micro_cnn_features,
                             spec.micro_embed_dim, p)
        sd = {f"micro_cnn.{k}": v for k, v in cnn.state_dict().items()}
        for stream, din in (("gru_micro", spec.micro_embed_dim),
                            ("gru_macro", spec.macro_embed_dim)):
            sd[f"{stream}.weight_ih_l0"] = torch.randn(3 * h, din)
            sd[f"{stream}.weight_hh_l0"] = torch.randn(3 * h, h)
            sd[f"{stream}.bias_ih_l0"] = torch.randn(3 * h)
            sd[f"{stream}.bias_hh_l0"] = torch.randn(3 * h)
        for name, (din, dout) in (
                ("macro_proj", (cfg.backbone.feature_dim,
                                spec.macro_embed_dim)),
                ("fusion", (2 * h, spec.fusion_hidden)),
                ("head", (spec.fusion_hidden, spec.num_outputs))):
            lin = torch.nn.Linear(din, dout)
            sd[f"{name}.weight"] = lin.weight.detach()
            sd[f"{name}.bias"] = lin.bias.detach()
        path = str(tmp_path / "full_two_stream.pth")
        torch.save(sd, path)

        loaded = checkpoints.load_pth(path)
        overlay = checkpoints.load_temporal_state_dict(
            loaded, spec=spec, phase_size=p)  # strict: zero unmapped
        n_tensors = len([k for k in sd if "num_batches_tracked" not in k])
        assert len(jax.tree_util.tree_leaves(overlay)) == n_tensors
        merged = checkpoints.merge_variables(variables["temporal"],
                                             overlay)
        # Same structure and shapes as the initialized tree — every
        # overlay tensor replaced an existing leaf, none dangled.
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(a.shape, b.shape),
            merged, variables["temporal"])
        v2 = dict(variables)
        v2["temporal"] = merged
        rng = np.random.default_rng(1)
        clips = jnp.asarray(rng.uniform(
            0, 255, (1, cfg.clip.clip_len, 32, 32, 3)).astype(np.float32))
        out1 = np.asarray(model.predict_clips(variables, clips))
        out2 = np.asarray(model.predict_clips(v2, clips))
        assert np.abs(out1 - out2).max() > 1e-4

    def test_fc_shape_mismatch_raises(self):
        cfg = tiny_config()
        sd = {"micro_cnn.fc.weight": np.zeros((4, 99), np.float32)}
        with pytest.raises(ValueError):
            checkpoints.load_temporal_state_dict(
                sd, spec=cfg.temporal, phase_size=cfg.phase.phase_size)
        with pytest.raises(ValueError):
            checkpoints.load_temporal_state_dict(sd)  # no spec given


class TestConvertCLI:
    def test_convert_then_restore(self, tmp_path):
        """cli convert: a canonical two-stream .pth becomes an orbax
        checkpoint whose restored weights match the source tensors."""
        import torch
        from mimamo_tpu import cli
        from mimamo_tpu.config import (MimamoConfig, PyramidSpec,
                                       PhaseSpec, ClipSpec, BackboneSpec)
        # the CLI's _config with these flags: default TemporalSpec dims
        cfg = MimamoConfig(
            pyramid=PyramidSpec(height=2, orientations=2,
                                input_size=(32, 32)),
            phase=PhaseSpec(phase_size=16),
            backbone=BackboneSpec(input_size=32),
            clip=ClipSpec(clip_len=8, stride=4, crop_size=32))
        spec = cfg.temporal
        torch.manual_seed(3)
        h = spec.gru_hidden
        cnn = _TorchMicroCNN(cfg.pyramid.height * 2,
                             spec.micro_cnn_features,
                             spec.micro_embed_dim, 16)
        sd = {f"micro_cnn.{k}": v for k, v in cnn.state_dict().items()}
        for stream, din in (("gru_micro", spec.micro_embed_dim),
                            ("gru_macro", spec.macro_embed_dim)):
            sd[f"{stream}.weight_ih_l0"] = torch.randn(3 * h, din)
            sd[f"{stream}.weight_hh_l0"] = torch.randn(3 * h, h)
            sd[f"{stream}.bias_ih_l0"] = torch.randn(3 * h)
            sd[f"{stream}.bias_hh_l0"] = torch.randn(3 * h)
        for name, (din, dout) in (
                ("macro_proj", (cfg.backbone.feature_dim,
                                spec.macro_embed_dim)),
                ("fusion", (2 * h, spec.fusion_hidden)),
                ("head", (spec.fusion_hidden, spec.num_outputs))):
            lin = torch.nn.Linear(din, dout)
            sd[f"{name}.weight"] = lin.weight.detach()
            sd[f"{name}.bias"] = lin.bias.detach()
        pth = str(tmp_path / "two_stream.pth")
        torch.save(sd, pth)

        ckpt = str(tmp_path / "ckpt")
        rc = cli.main([
            "convert", "--temporal-pth", pth, "--out", ckpt,
            "--crop-size", "32", "--backbone-size", "32",
            "--pyramid-height", "2", "--orientations", "2",
            "--phase-size", "16", "--clip-len", "8", "--stride", "4",
            "--cpu"])
        assert rc == 0

        model = Mimamo(cfg)
        state, _ = train.create_train_state(model, jax.random.PRNGKey(9))
        restored = checkpoints.restore(ckpt, state)
        got = np.asarray(
            restored.params["temporal"]["gru_micro"]["w_ih"])
        np.testing.assert_allclose(
            got, sd["gru_micro.weight_ih_l0"].numpy(), atol=1e-6)
        got_head = np.asarray(
            restored.params["temporal"]["head"]["kernel"])
        np.testing.assert_allclose(got_head, sd["head.weight"].numpy().T,
                                   atol=1e-6)

    def test_convert_prunes_inactive_stream(self, tmp_path, capsys):
        """Converting a FULL two-stream .pth into a micro-only config
        drops the macro tensors (no dangling params in the checkpoint)
        and reports the count."""
        import json as _json
        import torch
        from mimamo_tpu import cli, checkpoints, train as train_mod
        from mimamo_tpu.config import (MimamoConfig, PyramidSpec,
                                       PhaseSpec, ClipSpec, BackboneSpec,
                                       TemporalSpec)
        cfg = MimamoConfig(
            pyramid=PyramidSpec(height=2, orientations=2,
                                input_size=(32, 32)),
            phase=PhaseSpec(phase_size=16),
            backbone=BackboneSpec(input_size=32),
            temporal=TemporalSpec(streams="micro"),
            clip=ClipSpec(clip_len=8, stride=4, crop_size=32))
        spec, h = cfg.temporal, cfg.temporal.gru_hidden
        torch.manual_seed(5)
        cnn = _TorchMicroCNN(4, spec.micro_cnn_features,
                             spec.micro_embed_dim, 16)
        sd = {f"micro_cnn.{k}": v for k, v in cnn.state_dict().items()}
        for stream, din in (("gru_micro", spec.micro_embed_dim),
                            ("gru_macro", spec.macro_embed_dim)):
            sd[f"{stream}.weight_ih_l0"] = torch.randn(3 * h, din)
            sd[f"{stream}.weight_hh_l0"] = torch.randn(3 * h, h)
            sd[f"{stream}.bias_ih_l0"] = torch.randn(3 * h)
            sd[f"{stream}.bias_hh_l0"] = torch.randn(3 * h)
        for name, (din, dout) in (
                ("macro_proj", (cfg.backbone.feature_dim,
                                spec.macro_embed_dim)),
                ("fusion", (h, spec.fusion_hidden)),   # micro-only: 1*h
                ("head", (spec.fusion_hidden, spec.num_outputs))):
            lin = torch.nn.Linear(din, dout)
            sd[f"{name}.weight"] = lin.weight.detach()
            sd[f"{name}.bias"] = lin.bias.detach()
        pth = str(tmp_path / "full.pth")
        torch.save(sd, pth)
        ckpt = str(tmp_path / "ck")
        rc = cli.main([
            "convert", "--temporal-pth", pth, "--out", ckpt,
            "--streams", "micro", "--crop-size", "32",
            "--backbone-size", "32", "--pyramid-height", "2",
            "--orientations", "2", "--phase-size", "16",
            "--clip-len", "8", "--stride", "4", "--cpu"])
        assert rc == 0
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        # gru_macro (4 tensors) + macro_proj (2) dropped
        assert out["temporal_dropped_for_config"] == 6
        model = Mimamo(cfg)
        state, _ = train_mod.create_train_state(model,
                                                jax.random.PRNGKey(1))
        restored = checkpoints.restore(ckpt, state)
        assert "gru_macro" not in restored.params["temporal"]
        got = np.asarray(
            restored.params["temporal"]["gru_micro"]["w_ih"])
        np.testing.assert_allclose(
            got, sd["gru_micro.weight_ih_l0"].numpy(), atol=1e-6)

        # A TRUE full checkpoint has fusion [2H, F]; against the
        # micro-only config ([H, F]) strict convert must fail with the
        # exact path, and --no-strict must drop it (6 + 1 tensors).
        sd["fusion.weight"] = torch.randn(spec.fusion_hidden, 2 * h)
        torch.save(sd, pth)
        args = ["convert", "--temporal-pth", pth,
                "--out", str(tmp_path / "ck2"), "--streams", "micro",
                "--crop-size", "32", "--backbone-size", "32",
                "--pyramid-height", "2", "--orientations", "2",
                "--phase-size", "16", "--clip-len", "8",
                "--stride", "4", "--cpu"]
        with pytest.raises(SystemExit, match="fusion/kernel"):
            cli.main(args)
        capsys.readouterr()
        assert cli.main(args + ["--no-strict"]) == 0
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["temporal_dropped_for_config"] == 7

    def test_convert_backbone_dag_zero_json(self, tmp_path, capsys):
        """The real FER+ asset shape: dag-named tensors + meta dict.
        convert detects the dag schema (no --backbone-rename), applies
        the generated map strictly, folds meta['mean']/imageOrder into
        the config, and records a backbone_meta.json sidecar that
        --ckpt consumers (MimamoAPI) inherit."""
        import json as _json
        import torch
        from mimamo_tpu import cli, checkpoints
        from oracles import resnet_torch
        from test_backbone import make_dag_state_dict

        torch.manual_seed(11)
        tmodel = resnet_torch.ResNet50(num_classes=8,
                                       stride_in_1x1=True).eval()
        resnet_torch.randomize_bn_stats(tmodel, seed=11)
        sd = {k: torch.from_numpy(np.asarray(v))
              for k, v in make_dag_state_dict(tmodel).items()}
        pth = str(tmp_path / "resnet50_ferplus_dag.pth")
        mean = [131.0912, 103.8827, 91.4953]
        torch.save({"state_dict": sd,
                    "meta": {"mean": mean, "std": [1.0, 1.0, 1.0],
                             "imageSize": [224, 224, 3],
                             "imageOrder": "bgr"}}, pth)

        ckpt = str(tmp_path / "ck_dag")
        rc = cli.main([
            "convert", "--backbone-pth", pth, "--out", ckpt,
            "--crop-size", "32", "--backbone-size", "32",
            "--pyramid-height", "2", "--orientations", "2",
            "--phase-size", "16", "--clip-len", "8", "--stride", "4",
            "--cpu"])
        assert rc == 0
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["backbone_dag_rename"] == "auto"
        assert out["backbone_meta"]["channel_order"] == "bgr"
        np.testing.assert_allclose(out["backbone_meta"]["mean_rgb"],
                                   mean, atol=1e-4)
        meta = checkpoints.load_backbone_meta(ckpt)
        assert meta["channel_order"] == "bgr"

        # --ckpt consumers inherit the recorded convention and weights.
        from mimamo_tpu.api import MimamoAPI
        from mimamo_tpu.config import (MimamoConfig, PyramidSpec,
                                       PhaseSpec, ClipSpec, BackboneSpec)
        cfg = MimamoConfig(
            pyramid=PyramidSpec(height=2, orientations=2,
                                input_size=(32, 32)),
            phase=PhaseSpec(phase_size=16),
            backbone=BackboneSpec(input_size=32),
            clip=ClipSpec(clip_len=8, stride=4, crop_size=32))
        api = MimamoAPI(config=cfg, checkpoint_dir=ckpt)
        assert api.model.config.backbone.channel_order == "bgr"
        got = np.asarray(
            api.variables["backbone"]["params"]["conv1"]["kernel"])
        want = sd["conv1_7x7_s2.weight"].numpy().transpose(2, 3, 1, 0)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_convert_requires_some_input(self, tmp_path):
        from mimamo_tpu import cli
        with pytest.raises(SystemExit, match="convert needs"):
            cli.main(["convert", "--out", str(tmp_path / "x"), "--cpu"])

    def test_convert_rejects_bad_map_file(self, tmp_path):
        import torch
        from mimamo_tpu import cli
        pth = str(tmp_path / "t.pth")
        torch.save({"x.weight": torch.zeros(3)}, pth)
        bad = str(tmp_path / "map.json")
        with open(bad, "w") as f:
            f.write('["not", "a", "dict"]')
        with pytest.raises(SystemExit, match="expected a flat"):
            cli.main(["convert", "--temporal-pth", pth,
                      "--temporal-prefix-map", bad,
                      "--out", str(tmp_path / "x"), "--cpu"])


class TestConvertVerify:
    """cli convert --verify: the one-command parity gate (forward the
    SOURCE .pth under torch-CPU vs the converted Flax model; VERDICT
    round-3 missing item 1 last mile)."""

    def _make_pths(self, tmp_path):
        import torch
        from oracles.resnet_torch import (ResNet50 as TorchRN,
                                          randomize_bn_stats)
        torch.manual_seed(0)
        bb_model = randomize_bn_stats(TorchRN(num_classes=8))
        bb = str(tmp_path / "bb.pth")
        torch.save(bb_model.state_dict(), bb)
        # canonical two-stream .pth (4 = height*orientations channels,
        # phase 16, matching the CLI flags below)
        h, feat_dim = 256, 2048
        cnn = _TorchMicroCNN(4, (64, 128), 256, 16)
        sd = {f"micro_cnn.{k}": v for k, v in cnn.state_dict().items()}
        for stream, din in (("gru_micro", 256), ("gru_macro", 256)):
            sd[f"{stream}.weight_ih_l0"] = torch.randn(3 * h, din) * 0.2
            sd[f"{stream}.weight_hh_l0"] = torch.randn(3 * h, h) * 0.2
            sd[f"{stream}.bias_ih_l0"] = torch.randn(3 * h) * 0.1
            sd[f"{stream}.bias_hh_l0"] = torch.randn(3 * h) * 0.1
        for name, (din, dout) in (("macro_proj", (feat_dim, 256)),
                                  ("fusion", (2 * h, 256)),
                                  ("head", (256, 2))):
            lin = torch.nn.Linear(din, dout)
            sd[f"{name}.weight"] = lin.weight.detach()
            sd[f"{name}.bias"] = lin.bias.detach()
        tp = str(tmp_path / "two_stream.pth")
        torch.save(sd, tp)
        return bb, tp

    _FLAGS = ["--crop-size", "32", "--backbone-size", "64",
              "--pyramid-height", "2", "--orientations", "2",
              "--phase-size", "16", "--clip-len", "8", "--stride", "4",
              "--cpu"]

    def test_verify_passes_and_reports(self, tmp_path, capsys):
        import json as _json
        from mimamo_tpu import cli
        bb, tp = self._make_pths(tmp_path)
        ckpt = str(tmp_path / "ck")
        rc = cli.main(["convert", "--backbone-pth", bb,
                       "--temporal-pth", tp, "--out", ckpt,
                       "--verify"] + self._FLAGS)
        assert rc == 0
        err = capsys.readouterr().err
        row = _json.loads([ln for ln in err.splitlines()
                           if ln.startswith('{"verify"')][-1])
        v = row["verify"]
        for part in ("backbone_embeddings", "backbone_logits",
                     "temporal_outputs"):
            assert v[part]["rel"] < 1e-3, (part, v[part])
        assert os.path.isdir(ckpt)

    def test_verify_catches_corrupted_conversion(self, tmp_path,
                                                 monkeypatch):
        """A semantically wrong (same-shape) conversion — negated conv1
        kernel — must trip --verify BEFORE any checkpoint is written."""
        from mimamo_tpu import backbone as backbone_mod
        from mimamo_tpu import cli
        bb, _tp = self._make_pths(tmp_path)
        real = backbone_mod.load_torch_state_dict

        def corrupted(sd, rename=None, strict=True):
            out = real(sd, rename=rename, strict=strict)
            k = out["params"]["conv1"]["kernel"]
            out["params"]["conv1"]["kernel"] = -k
            return out

        monkeypatch.setattr(backbone_mod, "load_torch_state_dict",
                            corrupted)
        ckpt = str(tmp_path / "ck_bad")
        with pytest.raises(SystemExit, match="verify FAILED"):
            cli.main(["convert", "--backbone-pth", bb, "--out", ckpt,
                      "--verify"] + self._FLAGS)
        assert not os.path.exists(ckpt)


class TestTrainMetaOverlay:
    def test_train_inherits_backbone_meta(self, tmp_path, monkeypatch):
        """cmd_train overlays backbone_meta.json from --ckpt exactly
        like the other --ckpt consumers (round-3 advisor finding:
        fine-tuning a converted bgr checkpoint otherwise silently
        trained with rgb-default preprocessing while eval of the same
        checkpoint used the right one)."""
        import os
        from mimamo_tpu import cli
        from mimamo_tpu.data import datasets
        import mimamo_tpu.runner as runner_mod
        root = str(tmp_path / "omg")
        os.makedirs(root)
        manifest = datasets.make_synthetic_omg(root, n_videos=1,
                                               n_utts=2, frames=12,
                                               size=32)
        ckpt = str(tmp_path / "ck")
        os.makedirs(ckpt)
        checkpoints.save_backbone_meta(ckpt, (1.0, 2.0, 3.0), "bgr")
        seen = []
        real = runner_mod.Mimamo.__init__

        def spy(self, config=None):
            seen.append(config)
            real(self, config)

        monkeypatch.setattr(runner_mod.Mimamo, "__init__", spy)
        rc = cli.main([
            "train", "--dataset", "omg", "--root", root,
            "--manifest", manifest, "--epochs", "1", "--batch", "2",
            "--ckpt", ckpt, "--eval-root", root, "--eval-every", "1",
            "--clip-len", "8", "--stride", "4",
            "--crop-size", "32", "--backbone-size", "32",
            "--pyramid-height", "2", "--phase-size", "16", "--cpu"])
        assert rc == 0
        assert seen, "cmd_train never built a Mimamo"
        assert seen[0].backbone.channel_order == "bgr"
        np.testing.assert_allclose(seen[0].backbone.mean_rgb,
                                   (1.0, 2.0, 3.0))
        # The checkpoints train WRITES carry the active convention too:
        # both the per-epoch dir and the standalone best-val dir
        # (round-4 review finding: _best had no backbone_meta.json, so
        # predict/eval --ckpt <dir>_best silently fell back to rgb
        # defaults — the round-3 bug one directory over).
        for d in (ckpt, ckpt + "_best"):
            meta = checkpoints.load_backbone_meta(d)
            assert meta is not None, f"no backbone_meta.json in {d}"
            assert meta["channel_order"] == "bgr"
            np.testing.assert_allclose(meta["mean_rgb"], (1.0, 2.0, 3.0))


class TestOverfit:
    """Training must LEARN — reach CCC >= 0.9 on its own training data
    — not merely reduce the loss, for BOTH loss_axis protocols (VERDICT
    round-4 directive 7: the batch-axis + stratification path had no
    end-to-end learning proof). Synthetic corpora are built so the
    labels are a simple deterministic function of the cached appearance
    features; crops are noise (the micro stream learns to ignore them).
    Budget-boxed: tiny shapes, cached-feature path (the reference's own
    workflow), bounded epochs."""

    FEATURE_DIM = 2048      # tiny_config keeps the default feature_dim

    def _direction(self, seed):
        rng = np.random.default_rng(seed)
        u = rng.standard_normal(self.FEATURE_DIM)
        return (u / np.linalg.norm(u)).astype(np.float32)

    def _train_until(self, ds, cfg, stratify, target=0.9,
                     max_steps=400):
        from mimamo_tpu.runner import Mimamo
        model = Mimamo(cfg)
        state, tx = train.create_train_state(
            model, jax.random.PRNGKey(0))
        step_fn = train.make_train_step(model, tx)
        best, steps, epoch = -2.0, 0, 0
        while steps < max_steps:
            cccs = []
            for batch in ds.batches(cfg.train.batch_size, shuffle=True,
                                    seed=epoch, drop_remainder=True,
                                    stratify=stratify):
                assert "features" in batch, "sidecars must be picked up"
                jb = {k: jnp.asarray(v) for k, v in batch.items()}
                state, metrics = step_fn(state, jb)
                cccs.append([float(metrics["ccc_v"]),
                             float(metrics["ccc_a"])])
                steps += 1
            epoch += 1
            m = np.asarray(cccs).mean(axis=0)
            best = max(best, float(m.min()))
            if m.min() >= target:
                return steps, m
        raise AssertionError(
            f"no learning: CCC(v,a) never reached {target} in "
            f"{max_steps} steps (best min-dim {best:.3f})")

    def _cfg(self, lr=1e-2):
        import dataclasses
        from mimamo_tpu.config import TrainSpec
        return dataclasses.replace(
            tiny_config(clip_len=8, stride=8),
            train=TrainSpec(learning_rate=lr, batch_size=4,
                            loss_axis="time"))

    def test_overfit_time_axis(self, tmp_path):
        """Aff-Wild2 protocol: per-frame labels = linear ramp encoded in
        the feature sidecar; frame-level CCC must exceed 0.9."""
        import dataclasses
        root = str(tmp_path / "aw2")
        os.makedirs(os.path.join(root, "crops"))
        os.makedirs(os.path.join(root, "annotations"))
        rng = np.random.default_rng(0)
        u = self._direction(1)
        frames = 16
        for v, slope in ((0, 1.0), (1, -1.0)):
            r = slope * np.linspace(-1.0, 1.0, frames,
                                    dtype=np.float32)
            crops = rng.uniform(0, 255, (frames, 32, 32, 3)).astype(
                np.uint8)
            np.save(os.path.join(root, "crops", f"vid{v}.npy"), crops)
            feats = (r[:, None] * u[None]
                     + 0.01 * rng.standard_normal(
                         (frames, self.FEATURE_DIM))).astype(np.float32)
            np.save(os.path.join(root, "crops", f"vid{v}.feat.npy"),
                    feats)
            labels = np.stack([0.8 * r, -0.5 * r], axis=1)
            with open(os.path.join(root, "annotations",
                                   f"vid{v}.txt"), "w") as f:
                f.write("valence,arousal\n" + "\n".join(
                    f"{a:.6f},{b:.6f}" for a, b in labels) + "\n")
        cfg = self._cfg()
        ds = datasets.AffWild2Dataset(root, clip=cfg.clip)
        steps, ccc = self._train_until(ds, cfg, stratify=False)
        assert ccc.min() >= 0.9, (steps, ccc)

    def test_overfit_batch_axis_stratified(self, tmp_path):
        """OMG protocol: utterance-constant labels, CCC across the
        stratified clip batch of time-averaged predictions >= 0.9."""
        import dataclasses
        from mimamo_tpu.config import TrainSpec
        root = str(tmp_path / "omg")
        os.makedirs(root)
        rng = np.random.default_rng(2)
        u, w = self._direction(3), self._direction(4)
        labels = [(-0.8, -0.4), (-0.3, 0.2), (0.3, -0.2), (0.8, 0.6)]
        rows = ["video,utterance,valence,arousal"]
        vdir = os.path.join(root, "video0")
        os.makedirs(vdir)
        for i, (val, ar) in enumerate(labels):
            crops = rng.uniform(0, 255, (8, 32, 32, 3)).astype(np.uint8)
            np.save(os.path.join(vdir, f"utt{i}.npy"), crops)
            # both label dims linearly encoded along independent
            # feature directions — learnable, not memorization-hard
            feats = (val * u[None] + ar * w[None]
                     + 0.01 * rng.standard_normal(
                         (8, self.FEATURE_DIM))).astype(np.float32)
            np.save(os.path.join(vdir, f"utt{i}.feat.npy"), feats)
            rows.append(f"video0,utt{i},{val},{ar}")
        manifest = os.path.join(root, "manifest.csv")
        with open(manifest, "w") as f:
            f.write("\n".join(rows) + "\n")
        cfg = dataclasses.replace(
            self._cfg(), train=TrainSpec(learning_rate=1e-2,
                                         batch_size=4,
                                         loss_axis="batch"))
        ds = datasets.OMGEmotionDataset(root, manifest, cfg.clip)
        steps, ccc = self._train_until(ds, cfg, stratify=True)
        assert ccc.min() >= 0.9, (steps, ccc)


class TestCLIKnobs:
    """Round-4 VERDICT missing item 4: loss/optimizer/lowering knobs
    were config-only; these prove the CLI flags land in the config."""

    def _spy_config(self, monkeypatch):
        import mimamo_tpu.runner as runner_mod
        seen = []

        def spy(self, config=None):
            seen.append(config)
            raise RuntimeError("stop-after-config")  # skip the training

        monkeypatch.setattr(runner_mod.Mimamo, "__init__", spy)
        return seen

    def _run_train(self, tmp_path, extra):
        import os
        from mimamo_tpu import cli
        from mimamo_tpu.data import datasets
        root = str(tmp_path / "omg")
        if not os.path.isdir(root):
            os.makedirs(root)
            self.manifest = datasets.make_synthetic_omg(
                root, n_videos=1, n_utts=2, frames=12, size=32)
        return cli.main([
            "train", "--dataset", "omg", "--root", root,
            "--manifest", self.manifest, "--epochs", "1", "--batch", "2",
            "--clip-len", "8", "--stride", "4", "--crop-size", "32",
            "--backbone-size", "32", "--pyramid-height", "2",
            "--phase-size", "16", "--cpu"] + extra)

    def test_train_flags_round_trip_into_config(self, tmp_path,
                                                monkeypatch):
        seen = self._spy_config(monkeypatch)
        with pytest.raises(RuntimeError, match="stop-after-config"):
            self._run_train(tmp_path, [
                "--loss", "ccc+mse", "--mse-weight", "0.3",
                "--weight-decay", "0.01", "--fft-mode", "fft",
                "--stem-mode", "upscale", "--use-pallas"])
        cfg = seen[0]
        assert cfg.train.loss == "ccc+mse"
        assert cfg.train.mse_weight == pytest.approx(0.3)
        assert cfg.train.weight_decay == pytest.approx(0.01)
        assert cfg.pyramid.fft_mode == "fft"
        assert cfg.backbone.stem_mode == "upscale"
        assert cfg.use_pallas is True

    def test_mse_weight_alone_implies_composite_loss(self, tmp_path,
                                                     monkeypatch):
        seen = self._spy_config(monkeypatch)
        with pytest.raises(RuntimeError, match="stop-after-config"):
            self._run_train(tmp_path, ["--mse-weight", "0.5"])
        assert seen[0].train.loss == "ccc+mse"
        assert seen[0].train.mse_weight == pytest.approx(0.5)

    def test_composite_loss_without_weight_fails_fast(self, tmp_path,
                                                      monkeypatch):
        self._spy_config(monkeypatch)   # must never be reached
        with pytest.raises(SystemExit, match="mse_weight"):
            self._run_train(tmp_path, ["--loss", "ccc+mse"])

    def test_trainspec_coherence_validation(self):
        from mimamo_tpu.config import TrainSpec
        TrainSpec(loss="ccc+mse", mse_weight=0.1)        # ok
        with pytest.raises(ValueError, match="mse_weight"):
            TrainSpec(loss="ccc+mse")
        with pytest.raises(ValueError, match="ccc\\+mse"):
            TrainSpec(loss="ccc", mse_weight=0.2)
        with pytest.raises(ValueError, match="loss"):
            TrainSpec(loss="mse")
        with pytest.raises(ValueError, match="weight_decay"):
            TrainSpec(weight_decay=-1.0)


class TestBenchAutoRepeat:
    """bench.py's pass-repeat guard (round-5: the scoreboard's defense
    against the r4 driver-capture failure mode — one cold fresh-process
    pass becoming the recorded number). Pure-logic unit; the import
    resolves to bench.py (module beats the bench/ namespace dir)."""

    def test_band_guard_repeats_low_first_pass(self):
        import bench
        low = bench.EXPECTED_LOW_FPS
        # cold first pass well under 90% of the band low edge
        assert bench.want_another_pass([0.5 * low], 1, 3, True)
        # recovered second pass: stop
        assert not bench.want_another_pass([0.5 * low, low], 1, 3, True)
        # still low after max_passes: stop (no infinite repeats)
        assert not bench.want_another_pass([0.5 * low] * 3, 1, 3, True)

    def test_band_guard_only_for_default_tpu_config(self):
        import bench
        assert not bench.want_another_pass([1.0], 1, 3, False)

    def test_forced_passes_run_regardless_of_band(self):
        import bench
        assert bench.want_another_pass([1e9], 2, 3, False)
        assert not bench.want_another_pass([1e9, 1e9], 2, 3, False)
        # band guard may extend beyond --passes when still low
        assert bench.want_another_pass([1.0, 1.0], 2, 3, True)

    def test_healthy_first_pass_single(self):
        import bench
        assert not bench.want_another_pass(
            [bench.EXPECTED_LOW_FPS * 1.05], 1, 3, True)


class _TorchMicroCNN:
    """torch mirror of temporal.MicroCNN, built lazily (import guard)."""

    def __new__(cls, c_in, features, embed, phase_size):
        import torch

        class Mirror(torch.nn.Module):
            def __init__(self):
                super().__init__()
                ci = c_in
                for i, c in enumerate(features):
                    self.add_module(f"conv{i + 1}", torch.nn.Conv2d(
                        ci, c, 3, padding=1, bias=False))
                    bn = torch.nn.BatchNorm2d(c)
                    with torch.no_grad():   # non-trivial eval-mode stats
                        bn.running_mean.normal_(0.0, 0.3)
                        bn.running_var.uniform_(0.5, 2.0)
                        bn.weight.normal_(1.0, 0.2)
                        bn.bias.normal_(0.0, 0.2)
                    self.add_module(f"bn{i + 1}", bn)
                    ci = c
                side = phase_size >> len(features)
                self.fc = torch.nn.Linear(ci * side * side, embed)
                self.n = len(features)

            def forward(self, x):
                for i in range(self.n):
                    x = getattr(self, f"conv{i + 1}")(x)
                    x = getattr(self, f"bn{i + 1}")(x)
                    x = torch.relu(x)
                    x = torch.nn.functional.max_pool2d(x, 2)
                return self.fc(x.flatten(1))

        return Mirror()
