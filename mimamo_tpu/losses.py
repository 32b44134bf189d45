"""Concordance correlation coefficient (CCC) loss and metric.

Reference behavior (SURVEY.md §2 "CCC loss & metric", Appendix A.3; mount
empty): ``ccc = 2*cov(p,y) / (var(p) + var(y) + (mean(p)-mean(y))**2)``
with population (biased, 1/N) moments; training loss is ``1 - ccc`` averaged
over the valence and arousal heads.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def ccc(pred: jnp.ndarray, target: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        eps: float = 1e-8) -> jnp.ndarray:
    """CCC over the leading (time/sample) axis.

    Args:
      pred, target: [N] or [N, D] sequences.
      mask: optional [N] validity mask (1 = valid) for padded sequences.

    Returns:
      scalar (or [D]) CCC in [-1, 1].
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if mask is not None:
        m = mask.astype(jnp.float32)
        while m.ndim < pred.ndim:
            m = m[..., None]
        n = jnp.sum(m, axis=0) + eps
        mu_p = jnp.sum(pred * m, axis=0) / n
        mu_t = jnp.sum(target * m, axis=0) / n
        dp, dt = (pred - mu_p) * m, (target - mu_t) * m
        var_p = jnp.sum(dp * dp, axis=0) / n
        var_t = jnp.sum(dt * dt, axis=0) / n
        cov = jnp.sum(dp * dt, axis=0) / n
    else:
        mu_p, mu_t = jnp.mean(pred, axis=0), jnp.mean(target, axis=0)
        var_p, var_t = jnp.var(pred, axis=0), jnp.var(target, axis=0)
        cov = jnp.mean((pred - mu_p) * (target - mu_t), axis=0)
    return 2.0 * cov / (var_p + var_t + (mu_p - mu_t) ** 2 + eps)


def ccc_loss(pred: jnp.ndarray, target: jnp.ndarray,
             mask: Optional[jnp.ndarray] = None,
             mse_weight: float = 0.0) -> jnp.ndarray:
    """``1 - ccc`` averaged over output dims, optionally + mse_weight*MSE."""
    loss = jnp.mean(1.0 - ccc(pred, target, mask=mask))
    if mse_weight:
        if mask is not None:
            m = mask.astype(jnp.float32)
            while m.ndim < pred.ndim:
                m = m[..., None]
            # broadcast BEFORE the denominator sum: dividing the
            # N*D-element numerator by the N-row mask count scaled the
            # masked MSE term by D vs the unmasked jnp.mean (round-4
            # review finding, verified numerically)
            m = jnp.broadcast_to(m, pred.shape)
            mse = jnp.sum(m * (pred - target) ** 2) / (jnp.sum(m) + 1e-8)
        else:
            mse = jnp.mean((pred - target) ** 2)
        loss = loss + mse_weight * mse
    return loss
