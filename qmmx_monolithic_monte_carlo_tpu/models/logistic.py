"""Batched logistic regression in pure JAX, coefficient-compatible with sklearn.

The reference retrains ``sklearn.linear_model.LogisticRegression(max_iter=1000)``
(defaults: L2, C=1.0, lbfgs, fit_intercept=True) on features built from
``contact_events`` joined to trades (qmmx_monolithic.py:3833-3894).  BASELINE
config #1 requires the JAX retrain to match sklearn coefficients to 1e-6.

sklearn's objective (C=1):  min_{w,b}  0.5 ||w||^2 + sum_i log(1 + exp(-y_i (x_i.w + b)))
with y in {-1,+1} and the intercept unpenalized.  The objective is strictly
convex, so full Newton (IRLS) driven to gradient ~0 lands on the same unique
optimum lbfgs approaches; parity is limited only by sklearn's own tol.

``fit`` is jit-compiled with static iteration count (``lax.scan`` over Newton
steps with a Levenberg damping fallback); ``fit_batched`` vmaps it across a
symbol axis for the per-symbol policy refresh (BASELINE config #4).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from functools import partial


class LRModel(NamedTuple):
    coef: jnp.ndarray       # f32/f64[D]
    intercept: jnp.ndarray  # scalar
    n_iter: jnp.ndarray     # i32
    grad_norm: jnp.ndarray  # final max-abs gradient


def _prep(x, y, sample_weight):
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    y_pm = jnp.where(y > 0, 1.0, -1.0).astype(x.dtype)
    if sample_weight is None:
        sample_weight = jnp.ones(y.shape, x.dtype)
    return x, y_pm, jnp.asarray(sample_weight, x.dtype)


@partial(jax.jit, static_argnames=("max_iter",))
def fit(x, y, sample_weight=None, *, c: float = 1.0, max_iter: int = 100) -> LRModel:
    """Newton/IRLS fit of sklearn's binary logistic objective.

    x: [N, D] features; y: [N] labels in {0,1} (or {-1,+1}); sample_weight
    doubles as a validity mask (0 = padding row), enabling fixed-shape batches.
    Uses float64 when enabled, else float32 (tests enable x64 on CPU for the
    1e-6 parity check).
    """
    x, y_pm, w_s = _prep(x, y, sample_weight)
    n, d = x.shape
    # augmented design: last column is the intercept
    xa = jnp.concatenate([x, jnp.ones((n, 1), x.dtype)], axis=1)
    reg = jnp.concatenate([jnp.ones((d,), x.dtype), jnp.zeros((1,), x.dtype)])
    c = jnp.asarray(c, x.dtype)

    def grad_hess(beta):
        z = y_pm * (xa @ beta)
        p = jax.nn.sigmoid(z)           # P(correct side)
        g_data = xa.T @ (w_s * (p - 1.0) * y_pm)
        g = c * g_data + reg * beta
        s = w_s * p * (1.0 - p)
        h = c * (xa.T * s) @ xa + jnp.diag(reg)
        return g, h

    def step(carry, _):
        beta, done = carry
        g, h = grad_hess(beta)
        # Levenberg damping for safety on degenerate batches
        h = h + 1e-12 * jnp.eye(d + 1, dtype=x.dtype)
        delta = jnp.linalg.solve(h, g)
        gmax = jnp.max(jnp.abs(g))
        converged = gmax < 1e-12
        new_beta = jnp.where(jnp.logical_or(done, converged), beta, beta - delta)
        return (new_beta, jnp.logical_or(done, converged)), gmax

    (beta, _), gnorms = jax.lax.scan(
        step, (jnp.zeros((d + 1,), x.dtype), jnp.asarray(False)), None, length=max_iter
    )
    g, _ = grad_hess(beta)
    return LRModel(
        coef=beta[:d],
        intercept=beta[d],
        n_iter=jnp.sum((gnorms >= 1e-12).astype(jnp.int32)),
        grad_norm=jnp.max(jnp.abs(g)),
    )


@partial(jax.jit, static_argnames=("max_iter",))
def fit_batched(xs, ys, sample_weights=None, *, c: float = 1.0, max_iter: int = 100) -> LRModel:
    """vmap of ``fit`` over a leading symbol axis: xs [S, N, D], ys [S, N],
    sample_weights [S, N] (0-weight rows pad symbols with fewer samples)."""
    if sample_weights is None:
        sample_weights = jnp.ones(jnp.asarray(ys).shape, jnp.asarray(xs).dtype)
    return jax.vmap(lambda x, y, w: fit(x, y, w, c=c, max_iter=max_iter))(
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(sample_weights)
    )


def predict_proba(model: LRModel, x) -> jnp.ndarray:
    """P(label=1 | x), matching sklearn ``predict_proba[:, 1]``."""
    return jax.nn.sigmoid(jnp.asarray(x) @ model.coef + model.intercept)


@partial(jax.jit, static_argnames=("epochs",))
def fit_sgd(x, y, *, lr: float = 0.05, l2: float = 1e-4, epochs: int = 100) -> LRModel:
    """Plain minibatch-free SGD variant (one pass = one scan over rows), for
    parity experiments with the OnlinePolicy update rule at batch scale."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    n, d = x.shape
    xa = jnp.concatenate([x, jnp.ones((n, 1), jnp.float32)], axis=1)

    def epoch(beta, _):
        def row(beta, i):
            pred = jax.nn.sigmoid(xa[i] @ beta)
            g = (pred - y[i]) * xa[i] + l2 * beta
            return beta - lr * g, None

        beta, _ = jax.lax.scan(row, beta, jnp.arange(n))
        return beta, None

    beta, _ = jax.lax.scan(epoch, jnp.zeros((d + 1,), jnp.float32), None, length=epochs)
    return LRModel(coef=beta[:d], intercept=beta[d],
                   n_iter=jnp.int32(epochs), grad_norm=jnp.float32(0.0))
