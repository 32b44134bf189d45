"""Backbone parity vs torch-CPU mirror + .pth key-map importer tests
(SURVEY.md §4 items 1 and 6)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from mimamo_tpu.config import BackboneSpec
from mimamo_tpu import backbone

from oracles import resnet_torch


def _build_pair(stride_in_1x1=True, seed=0):
    torch.manual_seed(seed)
    tmodel = resnet_torch.ResNet50(num_classes=8,
                                   stride_in_1x1=stride_in_1x1).eval()
    resnet_torch.randomize_bn_stats(tmodel, seed=seed)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    fmodel = backbone.ResNet50(BackboneSpec(), stride_in_1x1=stride_in_1x1)
    variables = backbone.load_torch_state_dict(sd)
    return tmodel, fmodel, variables


class TestTorchParity:
    @pytest.mark.parametrize("stride_in_1x1", [True, False])
    def test_forward_matches_torch(self, stride_in_1x1):
        tmodel, fmodel, variables = _build_pair(stride_in_1x1)
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            want_emb, want_logits = tmodel(
                torch.from_numpy(x.transpose(0, 3, 1, 2)))
        got_emb, got_logits = fmodel.apply(variables, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got_emb), want_emb.numpy(),
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(got_logits),
                                   want_logits.numpy(), atol=2e-4,
                                   rtol=1e-3)


class TestFoldBatchnorm:
    def test_fused_matches_unfused(self):
        """BN folded into conv weights == real inference-mode BN; also
        transitively matches the torch mirror via TestTorchParity."""
        _t, fmodel, variables = _build_pair(seed=3)
        fused_model = backbone.ResNet50(BackboneSpec(), fused_bn=True)
        fused_vars = backbone.fold_batchnorm(variables)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(
            np.float32))
        want_emb, want_logits = fmodel.apply(variables, x)
        got_emb, got_logits = fused_model.apply(fused_vars, x)
        np.testing.assert_allclose(np.asarray(got_emb),
                                   np.asarray(want_emb), atol=2e-4,
                                   rtol=1e-3)
        np.testing.assert_allclose(np.asarray(got_logits),
                                   np.asarray(want_logits), atol=2e-4,
                                   rtol=1e-3)

    def test_fused_rejects_train_mode(self):
        fused = backbone.ResNet50(BackboneSpec(), fused_bn=True)
        with pytest.raises(ValueError):
            fused.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                       train=True)


class TestImporter:
    def test_strict_rejects_unknown_keys(self):
        with pytest.raises(KeyError):
            backbone.load_torch_state_dict({"bogus.weight": np.zeros(3)})

    def test_strict_rejects_missing_keys(self):
        with pytest.raises(KeyError):
            backbone.load_torch_state_dict(
                {"conv1.weight": np.zeros((64, 3, 7, 7), np.float32)})

    def test_rename_hook(self):
        """FER+ dag-style names can be translated via the rename dict."""
        tmodel = resnet_torch.ResNet50().eval()
        sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
        # Simulate a foreign schema for one key.
        sd["conv1_7x7_s2.weight"] = sd.pop("conv1.weight")
        variables = backbone.load_torch_state_dict(
            sd, rename={"conv1_7x7_s2.weight": "conv1.weight"})
        assert variables["params"]["conv1"]["kernel"].shape == (7, 7, 3, 64)


def make_dag_state_dict(tmodel):
    """Canonical torch mirror state_dict -> MatConvNet dag-named dict,
    including the 1x1-conv classifier layout and BN counters the real
    ``resnet50_ferplus_dag.pth`` would carry."""
    inv = {v: k for k, v in backbone.ferplus_dag_rename().items()}
    sd = {}
    for k, v in tmodel.state_dict().items():
        arr = v.detach().numpy()
        if k.endswith("num_batches_tracked"):
            # name the counter after its dag BN module
            mod = inv[k.replace("num_batches_tracked", "running_mean")]
            sd[mod.replace(".running_mean", ".num_batches_tracked")] = arr
            continue
        dag = inv[k]
        if dag == "classifier.weight":
            arr = arr.reshape(arr.shape + (1, 1))   # dense -> 1x1 conv
        sd[dag] = arr
    return sd


class TestFerplusDag:
    def test_rename_covers_canonical_schema_exactly(self):
        """Every canonical torch key is produced exactly once — the
        generated map is complete (no hand-written JSON needed) and
        collision-free."""
        m = backbone.ferplus_dag_rename()
        assert sorted(m.values()) == sorted(backbone.torch_key_map())
        assert len(set(m.values())) == len(m) == 267

    def test_dag_checkpoint_loads_with_zero_json(self):
        """A full dag-named .pth-style dict converts strictly with the
        built-in map and matches the torch mirror's forward."""
        tmodel, fmodel, want_vars = _build_pair(stride_in_1x1=True, seed=7)
        sd = make_dag_state_dict(tmodel)
        assert backbone.looks_like_ferplus_dag(sd)
        variables = backbone.load_torch_state_dict(
            backbone.normalize_dag_state_dict(sd), strict=True)
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(
            np.float32))
        want_emb, want_logits = fmodel.apply(want_vars, x)
        got_emb, got_logits = fmodel.apply(variables, x)
        np.testing.assert_allclose(np.asarray(got_emb),
                                   np.asarray(want_emb), atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_logits),
                                   np.asarray(want_logits), atol=1e-6)

    def test_classify_frames_matches_torch_softmax(self):
        """The FER+ classifier head exposed via Mimamo.classify_frames
        == softmax of the torch mirror's logits on the same pixels."""
        from mimamo_tpu.runner import Mimamo
        from mimamo_tpu.config import (BackboneSpec, ClipSpec,
                                       MimamoConfig, PhaseSpec,
                                       PyramidSpec)
        tmodel, _f, variables = _build_pair(stride_in_1x1=True, seed=5)
        cfg = MimamoConfig(
            pyramid=PyramidSpec(height=2, orientations=2,
                                input_size=(32, 32)),
            phase=PhaseSpec(phase_size=16),
            backbone=BackboneSpec(input_size=32, mean_rgb=(0, 0, 0)),
            clip=ClipSpec(clip_len=4, stride=2, crop_size=32))
        model = Mimamo(cfg)
        mvars = {"backbone": variables,
                 "temporal": model.init_variables(
                     jax.random.PRNGKey(0))["temporal"]}
        rng = np.random.default_rng(5)
        crops = rng.uniform(0, 255, (1, 3, 32, 32, 3)).astype(np.float32)
        got = np.asarray(model.classify_frames(
            mvars, jnp.asarray(crops)))
        assert got.shape == (1, 3, 8)
        np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-5)
        with torch.no_grad():
            # mean_rgb=0: preprocessing is identity on 0..255 pixels
            _emb, logits = tmodel(torch.from_numpy(
                crops[0].transpose(0, 3, 1, 2)))
            want = torch.softmax(logits, dim=-1).numpy()
        np.testing.assert_allclose(got[0], want, rtol=1e-4, atol=1e-4)

    def test_classifier_squeeze_rejects_non_1x1(self):
        with pytest.raises(ValueError, match="1x1"):
            backbone.normalize_dag_state_dict(
                {"classifier.weight": np.zeros((8, 2048, 3, 3))})


class TestPreprocess:
    def test_mean_subtraction_no_scaling(self):
        spec = BackboneSpec(mean_rgb=(10.0, 20.0, 30.0), channel_order="rgb")
        x = jnp.full((1, 4, 4, 3), 100.0)
        out = np.asarray(backbone.preprocess_images(x, spec))
        np.testing.assert_allclose(out[..., 0], 90.0)
        np.testing.assert_allclose(out[..., 2], 70.0)

    def test_bgr_flip(self):
        spec = BackboneSpec(mean_rgb=(10.0, 20.0, 30.0), channel_order="bgr")
        x = jnp.zeros((1, 2, 2, 3)).at[..., 0].set(255.0)  # pure red
        out = np.asarray(backbone.preprocess_images(x, spec))
        # red channel moves to position 2 and gets the red mean subtracted
        np.testing.assert_allclose(out[..., 2], 245.0)
        np.testing.assert_allclose(out[..., 0], -30.0)


class TestCompositeStem:
    """composite_stem == upscale-then-conv1-then-pool (the exact-edge
    fused serving stem; BackboneSpec.stem_mode docs + BASELINE.md r4)."""

    @staticmethod
    def _reference(crops, k7, bias, spec):
        import flax.linen as nn
        from mimamo_tpu import preprocess
        imgs = preprocess.for_backbone(crops, spec)
        y = jax.lax.conv_general_dilated(
            imgs, jnp.asarray(k7), (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return nn.max_pool(nn.relu(y + bias), (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)))

    @pytest.mark.parametrize("order", ["rgb", "bgr"])
    def test_matches_reference_chain_f32(self, order):
        """f32 exactness incl. the 2-px edge-correction border (the
        composite kernel alone is interior-exact only — this test fails
        without the slab paste)."""
        rng = np.random.default_rng(0)
        spec = BackboneSpec(dtype="float32", input_size=64,
                            channel_order=order)
        crops = jnp.asarray(
            rng.uniform(0, 255, (3, 32, 32, 3)).astype(np.float32))
        k7 = rng.normal(0, 0.05, (7, 7, 3, 64)).astype(np.float32)
        bias = jnp.asarray(rng.normal(0, 0.1, (64,)).astype(np.float32))
        want = np.asarray(self._reference(crops, k7, bias, spec))
        got = np.asarray(backbone.composite_stem(
            crops, jnp.asarray(k7), bias, spec))
        assert got.shape == want.shape == (3, 16, 16, 64)
        scale = np.abs(want).max()
        np.testing.assert_allclose(got, want, atol=1e-5 * scale, rtol=0)

    def test_embed_path_matches_upscale_mode(self):
        """Mimamo end-to-end embeddings: stem_mode=composite ==
        stem_mode=upscale (f32, tiny config)."""
        import dataclasses
        from test_runner import tiny_config
        from mimamo_tpu.runner import Mimamo
        cfg = tiny_config()
        cfg = dataclasses.replace(cfg, backbone=dataclasses.replace(
            cfg.backbone, input_size=2 * cfg.clip.crop_size))
        m_comp = Mimamo(dataclasses.replace(
            cfg, backbone=dataclasses.replace(cfg.backbone,
                                              stem_mode="composite")))
        m_up = Mimamo(dataclasses.replace(
            cfg, backbone=dataclasses.replace(cfg.backbone,
                                              stem_mode="upscale")))
        variables = jax.jit(m_comp.init_variables)(jax.random.PRNGKey(0))
        rng = np.random.default_rng(5)
        crops = jnp.asarray(
            rng.uniform(0, 255, (1, 3, cfg.clip.crop_size,
                                 cfg.clip.crop_size, 3))
            .astype(np.float32))
        want = np.asarray(m_up.embed_frames(variables, crops))
        got = np.asarray(m_comp.embed_frames(variables, crops))
        # cross-program tolerance (CLAUDE.md: two differently-jitted
        # programs of the same ResNet drift ~1e-4 on this host)
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)

    def test_non_square_crops_fall_back_to_resize_path(self):
        """[B, T, 48, 32, 3] with input_size=64: width matches
        input_size/2 but the crop is non-square, so the composite stem
        must NOT engage (round-4 review finding: a width-only guard
        raised from composite_stem instead of falling back)."""
        import dataclasses
        from test_runner import tiny_config
        from mimamo_tpu.runner import Mimamo
        cfg = tiny_config()
        cfg = dataclasses.replace(cfg, backbone=dataclasses.replace(
            cfg.backbone, input_size=2 * cfg.clip.crop_size))
        m = Mimamo(cfg)
        assert not m._composite_stem_ok((cfg.clip.crop_size + 16,
                                         cfg.clip.crop_size))
        variables = jax.jit(m.init_variables)(jax.random.PRNGKey(0))
        crops = jnp.asarray(np.random.default_rng(0).uniform(
            0, 255, (1, 2, cfg.clip.crop_size + 16, cfg.clip.crop_size,
                     3)).astype(np.float32))
        emb = m.embed_frames(variables, crops)   # must not raise
        assert np.isfinite(np.asarray(emb)).all()

    def test_rejects_odd_or_tiny_crops(self):
        spec = BackboneSpec(dtype="float32", input_size=62)
        k7 = jnp.zeros((7, 7, 3, 64))
        b = jnp.zeros((64,))
        with pytest.raises(ValueError, match="composite_stem"):
            backbone.composite_stem(jnp.zeros((1, 31, 31, 3)), k7, b,
                                    spec)
        with pytest.raises(ValueError, match="composite_stem"):
            backbone.composite_stem(jnp.zeros((1, 6, 6, 3)), k7, b,
                                    BackboneSpec(input_size=12))


class TestPallasLayer2:
    """Fused-layer2 kernel (pallas/layer2_kernel.py) vs the XLA
    bottleneck chain, plus the trunk segmentation it rides on."""

    @staticmethod
    def _folded(dtype):
        spec = BackboneSpec(dtype=dtype)
        full = backbone.ResNet50(spec)
        variables = full.init(jax.random.PRNGKey(4),
                              jnp.zeros((1, 64, 64, 3)))
        return spec, backbone.fold_batchnorm(variables)

    def test_kernel_matches_xla_layer2(self):
        from mimamo_tpu.pallas.layer2_kernel import (layer2_fused,
                                                     pack_layer2_params)
        spec, folded = self._folded("bfloat16")
        seg = backbone.ResNet50(spec, fused_bn=True, skip_stem=True,
                                stages=(1,), features_only=True)
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.standard_normal((2, 56, 56, 256))
                        .astype(np.float32)).astype(jnp.bfloat16)
        want = np.asarray(seg.apply(folded, x), np.float32)
        got = np.asarray(layer2_fused(
            x, pack_layer2_params(folded["params"]), interpret=True),
            np.float32)
        assert got.shape == want.shape == (2, 28, 28, 512)
        err = np.abs(got - want).max() / max(1e-6, np.abs(want).max())
        assert err < 2e-2, err  # bf16 class: f32-accum dots vs XLA conv

    def test_trunk_segmentation_matches_full_trunk(self):
        """stages/features_only segmentation (layer1 -> layer2 ->
        layer3/4+head) == the whole trunk, same folded dict (f32)."""
        spec, folded = self._folded("float32")
        trunk = backbone.ResNet50(spec, fused_bn=True, skip_stem=True)
        l1 = backbone.ResNet50(spec, fused_bn=True, skip_stem=True,
                               stages=(0,), features_only=True)
        l2 = backbone.ResNet50(spec, fused_bn=True, skip_stem=True,
                               stages=(1,), features_only=True)
        l34 = backbone.ResNet50(spec, fused_bn=True, skip_stem=True,
                                stages=(2, 3))
        rng = np.random.default_rng(7)
        stem = jnp.asarray(rng.standard_normal((2, 56, 56, 64))
                           .astype(np.float32))
        want_emb, want_logits = trunk.apply(folded, stem)
        got_emb, got_logits = l34.apply(
            folded, l2.apply(folded, l1.apply(folded, stem)))
        np.testing.assert_allclose(np.asarray(got_emb),
                                   np.asarray(want_emb),
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(got_logits),
                                   np.asarray(want_logits),
                                   atol=2e-4, rtol=1e-3)

    def test_layer2_mode_validated(self):
        with pytest.raises(ValueError):
            BackboneSpec(layer2_mode="bogus")

    def test_pallas_mode_on_cpu_falls_back_to_conv(self):
        """layer2_mode='pallas' off-TPU must trace the conv path (the
        kernel needs Mosaic) and match layer2_mode='conv' exactly."""
        import dataclasses
        from test_runner import tiny_config
        from mimamo_tpu.runner import Mimamo
        cfg = tiny_config()
        mk = lambda mode: Mimamo(dataclasses.replace(
            cfg, backbone=dataclasses.replace(
                cfg.backbone, dtype="bfloat16", layer2_mode=mode)))
        m_conv, m_pal = mk("conv"), mk("pallas")
        variables = jax.jit(m_conv.init_variables)(jax.random.PRNGKey(0))
        rng = np.random.default_rng(8)
        crops = jnp.asarray(
            rng.uniform(0, 255, (1, 3, cfg.clip.crop_size,
                                 cfg.clip.crop_size, 3))
            .astype(np.float32))
        want = np.asarray(m_conv.embed_frames(variables, crops))
        got = np.asarray(m_pal.embed_frames(variables, crops))
        np.testing.assert_allclose(got, want, atol=0, rtol=0)

    def test_runner_pallas_split_matches_conv_at_flagship_shape(self):
        """The REAL wiring: embed_frames with layer2_mode='pallas'
        (kernel forced to interpreter mode — CPU) == the conv path, at
        the flagship 112-crop/224-backbone shape the kernel requires.
        Covers folded-param packing inside the jitted program, the
        layer1/layer2/layer3+4 segmentation, and the kernel itself."""
        import dataclasses
        from mimamo_tpu.config import (BackboneSpec, ClipSpec,
                                       MimamoConfig)
        from mimamo_tpu.pallas import layer2_kernel
        from mimamo_tpu.runner import Mimamo
        mk = lambda mode: Mimamo(MimamoConfig(
            backbone=BackboneSpec(dtype="bfloat16", layer2_mode=mode),
            clip=ClipSpec(clip_len=2, stride=1)))
        m_conv, m_pal = mk("conv"), mk("pallas")
        variables = jax.jit(m_conv.init_variables)(jax.random.PRNGKey(1))
        rng = np.random.default_rng(9)
        crops = jnp.asarray(rng.uniform(0, 255, (1, 2, 112, 112, 3))
                            .astype(np.float32))
        want = np.asarray(m_conv.embed_frames(variables, crops))
        layer2_kernel._FORCE_INTERPRET = True

        def _must_not_run(*_a, **_k):  # pragma: no cover - failure path
            raise AssertionError("conv fallback traced — the pallas "
                                 "split path did not engage")

        try:
            # the split path must actually ENGAGE — runner falls back
            # to conv silently when the gate rejects, which would make
            # this comparison vacuous (round-4 review finding). Positive
            # signal: the conv fallback twins raise if traced (asserting
            # got != want bit-wise instead would spuriously fail if a
            # future XLA version happened to round identically —
            # round-5 advisor finding).
            assert m_pal._pallas_layer2_ok()
            m_pal.backbone_trunk.apply = _must_not_run
            m_pal.backbone_fused.apply = _must_not_run
            got = np.asarray(m_pal.embed_frames(variables, crops))
        finally:
            layer2_kernel._FORCE_INTERPRET = False
        assert got.shape == want.shape
        scale = max(1e-6, np.abs(want).max())
        diff = np.abs(got - want).max() / scale
        assert diff < 2e-2  # bf16 class
