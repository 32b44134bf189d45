"""CCC loss/metric tests (SURVEY.md Appendix A.3)."""

import numpy as np
import jax.numpy as jnp

from mimamo_tpu import losses


def _ccc_np(p, y):
    """Independent reference: population moments."""
    mp, my = p.mean(0), y.mean(0)
    vp, vy = p.var(0), y.var(0)
    cov = ((p - mp) * (y - my)).mean(0)
    return 2 * cov / (vp + vy + (mp - my) ** 2)


class TestCCC:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        p = rng.standard_normal((200, 2)).astype(np.float32)
        y = (0.7 * p + 0.3 * rng.standard_normal((200, 2))).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(losses.ccc(jnp.asarray(p), jnp.asarray(y))),
            _ccc_np(p, y), atol=1e-5)

    def test_perfect_agreement(self):
        x = jnp.asarray(np.random.default_rng(1).standard_normal(100))
        assert float(losses.ccc(x, x)) > 0.999999

    def test_affine_mismatch_penalized(self):
        """CCC (unlike Pearson) is NOT invariant to scale/shift."""
        x = jnp.asarray(np.random.default_rng(2).standard_normal(100))
        assert float(losses.ccc(x, 2.0 * x + 1.0)) < 0.8

    def test_mask_ignores_padding(self):
        rng = np.random.default_rng(3)
        p = rng.standard_normal(50).astype(np.float32)
        y = rng.standard_normal(50).astype(np.float32)
        pad_p = np.concatenate([p, np.full(10, 99.0, np.float32)])
        pad_y = np.concatenate([y, np.zeros(10, np.float32)])
        mask = np.concatenate([np.ones(50), np.zeros(10)]).astype(np.float32)
        np.testing.assert_allclose(
            float(losses.ccc(jnp.asarray(pad_p), jnp.asarray(pad_y),
                             mask=jnp.asarray(mask))),
            float(_ccc_np(p[:, None], y[:, None])[0]), atol=1e-4)

    def test_loss_value_and_grad(self):
        import jax
        rng = np.random.default_rng(4)
        p = jnp.asarray(rng.standard_normal((64, 2)).astype(np.float32))
        y = jnp.asarray(rng.standard_normal((64, 2)).astype(np.float32))
        val, grad = jax.value_and_grad(losses.ccc_loss)(p, y)
        assert np.isfinite(float(val))
        assert np.all(np.isfinite(np.asarray(grad)))
        # loss of identical sequences is ~0
        assert float(losses.ccc_loss(y, y)) < 1e-5

    def test_masked_mse_matches_unmasked_on_full_mask(self):
        """An all-ones mask must not change the MSE term: the masked
        denominator has to count N*D elements, not N rows (round-4
        review finding — the old code scaled the MSE term by D)."""
        rng = np.random.default_rng(5)
        p = jnp.asarray(rng.standard_normal((16, 2)).astype(np.float32))
        y = jnp.asarray(rng.standard_normal((16, 2)).astype(np.float32))
        full = losses.ccc_loss(p, y, mse_weight=1.0)
        masked = losses.ccc_loss(p, y, mask=jnp.ones(16),
                                 mse_weight=1.0)
        np.testing.assert_allclose(float(masked), float(full), rtol=1e-6)
        # and a genuinely masked batch == the dense loss on kept rows
        m = np.ones(16, np.float32)
        m[10:] = 0.0
        np.testing.assert_allclose(
            float(losses.ccc_loss(p, y, mask=jnp.asarray(m),
                                  mse_weight=0.7)),
            float(losses.ccc_loss(p[:10], y[:10], mse_weight=0.7)),
            rtol=1e-5)
