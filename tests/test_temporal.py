"""Temporal model tests: GRU parity vs torch.nn.GRU (SURVEY.md A.4),
streaming-carry equivalence, shapes and gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from mimamo_tpu.config import TemporalSpec
from mimamo_tpu import temporal


SPEC = TemporalSpec()


class TestGRUTorchParity:
    def test_matches_torch_gru(self):
        """Copied weights must reproduce torch.nn.GRU outputs exactly —
        catches the reset-gate-applies-to-hidden-bias divergence."""
        b, t, d, h = 3, 11, 7, 5
        torch.manual_seed(0)
        ref = torch.nn.GRU(d, h, batch_first=True)
        xs = torch.randn(b, t, d)
        h0 = torch.randn(1, b, h)
        with torch.no_grad():
            want_ys, want_h = ref(xs, h0)

        gru = temporal.GRU(hidden=h)
        params = {
            "params": {
                "w_ih": jnp.asarray(ref.weight_ih_l0.detach().numpy()),
                "w_hh": jnp.asarray(ref.weight_hh_l0.detach().numpy()),
                "b_ih": jnp.asarray(ref.bias_ih_l0.detach().numpy()),
                "b_hh": jnp.asarray(ref.bias_hh_l0.detach().numpy()),
            }
        }
        got_ys, got_h = gru.apply(params, jnp.asarray(xs.numpy()),
                                  jnp.asarray(h0[0].numpy()))
        np.testing.assert_allclose(np.asarray(got_ys), want_ys.numpy(),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_h), want_h[0].numpy(),
                                   atol=1e-5)

    def test_stacked_matches_torch_two_layer(self):
        """layers=2 reproduces torch.nn.GRU(num_layers=2) exactly."""
        b, t, d, h = 2, 7, 5, 4
        torch.manual_seed(1)
        ref = torch.nn.GRU(d, h, num_layers=2, batch_first=True)
        xs = torch.randn(b, t, d)
        h0 = torch.randn(2, b, h)
        with torch.no_grad():
            want_ys, want_h = ref(xs, h0)
        params = {"params": {
            "w_ih": jnp.asarray(ref.weight_ih_l0.detach().numpy()),
            "w_hh": jnp.asarray(ref.weight_hh_l0.detach().numpy()),
            "b_ih": jnp.asarray(ref.bias_ih_l0.detach().numpy()),
            "b_hh": jnp.asarray(ref.bias_hh_l0.detach().numpy()),
            "l1_w_ih": jnp.asarray(ref.weight_ih_l1.detach().numpy()),
            "l1_w_hh": jnp.asarray(ref.weight_hh_l1.detach().numpy()),
            "l1_b_ih": jnp.asarray(ref.bias_ih_l1.detach().numpy()),
            "l1_b_hh": jnp.asarray(ref.bias_hh_l1.detach().numpy()),
        }}
        got_ys, got_h = temporal.GRU(hidden=h, layers=2).apply(
            params, jnp.asarray(xs.numpy()), jnp.asarray(h0.numpy()))
        np.testing.assert_allclose(np.asarray(got_ys), want_ys.numpy(),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_h), want_h.numpy(),
                                   atol=1e-5)

    def test_streaming_carry_equals_full_sequence(self):
        """GRU over [0:T] == GRU over [0:k] then [k:T] with carried state —
        the mechanism behind full-video streaming (config 3)."""
        b, t, d, h, k = 2, 16, 6, 8, 7
        rng = jax.random.PRNGKey(1)
        gru = temporal.GRU(hidden=h)
        xs = jax.random.normal(rng, (b, t, d))
        params = gru.init(jax.random.PRNGKey(2), xs)
        full_ys, full_h = gru.apply(params, xs)
        ys1, h1 = gru.apply(params, xs[:, :k])
        ys2, h2 = gru.apply(params, xs[:, k:], h1)
        np.testing.assert_allclose(
            np.asarray(jnp.concatenate([ys1, ys2], axis=1)),
            np.asarray(full_ys), atol=1e-6)
        np.testing.assert_allclose(np.asarray(h2), np.asarray(full_h),
                                   atol=1e-6)


class TestTwoStream:
    def _inputs(self, b=2, t=6, c=12, p=48, f=2048, seed=0):
        rng = np.random.default_rng(seed)
        phase = rng.standard_normal((b, t - 1, c, p, p)).astype(np.float32)
        feats = rng.standard_normal((b, t, f)).astype(np.float32)
        return jnp.asarray(phase), jnp.asarray(feats)

    def test_output_shapes_and_range(self):
        phase, feats = self._inputs()
        model = temporal.TwoStreamRNN(SPEC)
        variables = model.init(jax.random.PRNGKey(0), phase, feats)
        out, (hm, hM) = model.apply(variables, phase, feats)
        assert out.shape == (2, 6, 2)
        assert hm.shape == hM.shape == (2, SPEC.gru_hidden)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_tanh_head_bounded(self):
        spec = TemporalSpec(output_activation="tanh")
        phase, feats = self._inputs()
        model = temporal.TwoStreamRNN(spec)
        variables = model.init(jax.random.PRNGKey(0), phase, feats)
        out, _ = model.apply(variables, phase, feats)
        assert np.abs(np.asarray(out)).max() <= 1.0

    def test_streaming_matches_clip(self):
        """Full-clip forward == two chunked forwards with carried state.
        (Micro-stream pair alignment: the second chunk gets T pairs by
        including the boundary pair, so chunk tm1 == t there.)"""
        phase, feats = self._inputs(t=8)
        model = temporal.TwoStreamRNN(SPEC)
        variables = model.init(jax.random.PRNGKey(0), phase, feats)
        full, _ = model.apply(variables, phase, feats)
        k = 4
        out1, car = model.apply(variables, phase[:, :k - 1], feats[:, :k])
        out2, _ = model.apply(variables, phase[:, k - 1:], feats[:, k:],
                              car)
        got = jnp.concatenate([out1, out2], axis=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                                   atol=1e-5)

    def test_snippet_mode_shapes_and_constancy(self):
        """snippet_len=W: one GRU step per W-frame snippet, per-frame
        outputs constant within each snippet."""
        spec = TemporalSpec(snippet_len=4)
        phase, feats = self._inputs(t=8)
        model = temporal.TwoStreamRNN(spec)
        variables = model.init(jax.random.PRNGKey(0), phase, feats)
        out, (hm, _) = model.apply(variables, phase, feats)
        assert out.shape == (2, 8, 2)
        o = np.asarray(out)
        np.testing.assert_allclose(o[:, 0], o[:, 3])   # within snippet 0
        np.testing.assert_allclose(o[:, 4], o[:, 7])   # within snippet 1
        assert np.abs(o[:, 0] - o[:, 4]).max() > 0     # across snippets

    def test_snippet_mode_rejects_indivisible(self):
        spec = TemporalSpec(snippet_len=5)
        phase, feats = self._inputs(t=8)
        model = temporal.TwoStreamRNN(spec)
        with np.testing.assert_raises(ValueError):
            model.init(jax.random.PRNGKey(0), phase, feats)

    def test_fused_dual_gru_matches_sequential(self):
        """fused_gru=True (one shared scan) == two separate GRU scans,
        same variables — incl. stacked layers and streaming carries."""
        import dataclasses
        for layers in (1, 2):
            spec_f = TemporalSpec(gru_layers=layers, fused_gru=True)
            spec_s = dataclasses.replace(spec_f, fused_gru=False)
            phase, feats = self._inputs(t=6, seed=layers)
            mf = temporal.TwoStreamRNN(spec_f)
            ms = temporal.TwoStreamRNN(spec_s)
            variables = mf.init(jax.random.PRNGKey(layers), phase, feats)
            out_f, (hm_f, hM_f) = mf.apply(variables, phase, feats)
            out_s, (hm_s, hM_s) = ms.apply(variables, phase, feats)
            np.testing.assert_array_equal(np.asarray(out_f),
                                          np.asarray(out_s))
            np.testing.assert_array_equal(np.asarray(hm_f),
                                          np.asarray(hm_s))
            np.testing.assert_array_equal(np.asarray(hM_f),
                                          np.asarray(hM_s))
            # carries round-trip through the fused path too
            out2, _ = mf.apply(variables, phase, feats,
                               carries=(hm_f, hM_f))
            assert np.isfinite(np.asarray(out2)).all()

    def test_scan_unroll_bit_parity(self):
        """scan_unroll replicates the scan body k times per iteration —
        identical math, so outputs/carries must be BIT-equal to
        unroll=1 (incl. a T not divisible by the unroll factor). The
        knob is perf-only (hardware A/B: BASELINE.md round 4 — no win
        at flagship shapes; kept for latency-bound deployments)."""
        import dataclasses
        spec1 = TemporalSpec()
        phase, feats = self._inputs(t=7, seed=3)
        m1 = temporal.TwoStreamRNN(spec1)
        variables = m1.init(jax.random.PRNGKey(0), phase, feats)
        out1, (hm1, hM1) = m1.apply(variables, phase, feats)
        for u in (2, 4):
            mu = temporal.TwoStreamRNN(
                dataclasses.replace(spec1, scan_unroll=u))
            outu, (hmu, hMu) = mu.apply(variables, phase, feats)
            np.testing.assert_array_equal(np.asarray(out1),
                                          np.asarray(outu))
            np.testing.assert_array_equal(np.asarray(hm1),
                                          np.asarray(hmu))
            np.testing.assert_array_equal(np.asarray(hM1),
                                          np.asarray(hMu))

    def test_gradients_flow(self):
        phase, feats = self._inputs(t=4)
        model = temporal.TwoStreamRNN(SPEC)
        variables = model.init(jax.random.PRNGKey(0), phase, feats)

        def loss_fn(params):
            out, _ = model.apply({"params": params,
                                  "batch_stats": variables["batch_stats"]},
                                 phase, feats)
            return jnp.mean(out ** 2)

        grads = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
        assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


class TestStreamAblations:
    """Paper baselines: micro-only / macro-only (TemporalSpec.streams)."""

    def _inputs(self, b=2, t=6, c=12, p=48, f=2048, seed=0):
        rng = np.random.default_rng(seed)
        phase = rng.standard_normal((b, t - 1, c, p, p)).astype(np.float32)
        feats = rng.standard_normal((b, t, f)).astype(np.float32)
        return jnp.asarray(phase), jnp.asarray(feats)

    def test_micro_only_ignores_feats_and_has_no_macro_params(self):
        spec = TemporalSpec(streams="micro")
        phase, feats = self._inputs()
        model = temporal.TwoStreamRNN(spec)
        variables = model.init(jax.random.PRNGKey(0), phase, feats)
        assert "macro_proj" not in variables["params"]
        assert "gru_macro" not in variables["params"]
        out1, (hm, hM) = model.apply(variables, phase, feats)
        out2, _ = model.apply(variables, phase, None, num_frames=6)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
        assert out1.shape == (2, 6, 2)
        assert hm.shape == hM.shape == (2, spec.gru_hidden)
        np.testing.assert_allclose(np.asarray(hM), 0.0)  # passthrough

    def test_macro_only_ignores_phase_and_has_no_micro_params(self):
        spec = TemporalSpec(streams="macro")
        phase, feats = self._inputs()
        model = temporal.TwoStreamRNN(spec)
        variables = model.init(jax.random.PRNGKey(0), phase, feats)
        assert "micro_cnn" not in variables["params"]
        assert "gru_micro" not in variables["params"]
        out1, _ = model.apply(variables, phase, feats)
        out2, _ = model.apply(variables, None, feats)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
        assert out1.shape == (2, 6, 2)

    def test_missing_active_input_raises(self):
        phase, feats = self._inputs()
        for streams, args in (("micro", (None, feats)),
                              ("macro", (phase, None)),
                              ("both", (None, feats)),
                              ("both", (phase, None))):
            spec = TemporalSpec(streams=streams)
            model = temporal.TwoStreamRNN(spec)
            with np.testing.assert_raises(ValueError):
                model.init(jax.random.PRNGKey(0), *args)

    def test_streaming_matches_clip_single_stream(self):
        for streams in ("micro", "macro"):
            spec = TemporalSpec(streams=streams)
            phase, feats = self._inputs(t=8)
            model = temporal.TwoStreamRNN(spec)
            variables = model.init(jax.random.PRNGKey(0), phase, feats)
            full, _ = model.apply(variables, phase, feats)
            k = 4
            out1, car = model.apply(variables, phase[:, :k - 1],
                                    feats[:, :k])
            out2, _ = model.apply(variables, phase[:, k - 1:],
                                  feats[:, k:], car,
                                  num_frames=4)
            got = jnp.concatenate([out1, out2], axis=1)
            np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                                       atol=1e-5, err_msg=streams)
