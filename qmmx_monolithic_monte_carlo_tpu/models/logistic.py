"""Batched logistic regression in pure JAX, coefficient-compatible with sklearn.

The reference retrains ``sklearn.linear_model.LogisticRegression(max_iter=1000)``
(defaults: L2, C=1.0, lbfgs, fit_intercept=True) on features built from
``contact_events`` joined to trades (qmmx_monolithic.py:3833-3894).  BASELINE
config #1 requires the JAX retrain to match sklearn coefficients to 1e-6.

sklearn's objective (C=1):  min_{w,b}  0.5 ||w||^2 + sum_i log(1 + exp(-y_i (x_i.w + b)))
with y in {-1,+1} and the intercept unpenalized.  The objective is strictly
convex, so full Newton (IRLS) driven to gradient ~0 lands on the same unique
optimum lbfgs approaches; parity is limited only by sklearn's own tol.

``fit`` is jit-compiled as an early-exit Newton loop (``lax.while_loop`` that
stops at gradient convergence, with Levenberg damping for degenerate batches) —
a well-conditioned retrain converges in ~10 iterations, so wall-clock tracks
the true Newton count instead of a static ``max_iter`` worth of no-op solves.
``fit_batched`` vmaps it across a symbol axis for the per-symbol policy refresh
(BASELINE config #4); under vmap the loop runs until every symbol converges,
with per-symbol masked updates.
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
def fit(x, y, sample_weight=None, *, c: float = 1.0, max_iter: int = 100,
        tol: float = 1e-12) -> LRModel:
    """Early-exit Newton/IRLS fit of sklearn's binary logistic objective.

    x: [N, D] features; y: [N] labels in {0,1} (or {-1,+1}); sample_weight
    doubles as a validity mask (0 = padding row), enabling fixed-shape batches.
    Uses float64 when enabled, else float32 (tests enable x64 on CPU for the
    1e-6 parity check).  The Newton loop is a ``lax.while_loop`` that stops as
    soon as max|grad| < ``tol`` — wall-clock scales with actual iterations
    (~10 on well-conditioned retrains), not ``max_iter``.
    """
    x, y_pm, w_s = _prep(x, y, sample_weight)
    n, d = x.shape
    # augmented design: last column is the intercept
    xa = jnp.concatenate([x, jnp.ones((n, 1), x.dtype)], axis=1)
    reg = jnp.concatenate([jnp.ones((d,), x.dtype), jnp.zeros((1,), x.dtype)])
    c = jnp.asarray(c, x.dtype)
    tol = jnp.asarray(tol, x.dtype)

    def grad(beta):
        z = y_pm * (xa @ beta)
        p = jax.nn.sigmoid(z)           # P(correct side)
        return c * (xa.T @ (w_s * (p - 1.0) * y_pm)) + reg * beta

    def hess(beta):
        z = y_pm * (xa @ beta)
        p = jax.nn.sigmoid(z)
        s = w_s * p * (1.0 - p)
        return c * (xa.T * s) @ xa + jnp.diag(reg)

    def cond(state):
        _, it, gmax = state
        return jnp.logical_and(it < max_iter, gmax >= tol)

    def body(state):
        beta, it, _ = state
        g = grad(beta)
        gmax = jnp.max(jnp.abs(g))
        # Levenberg damping for safety on degenerate batches
        h = hess(beta) + 1e-12 * jnp.eye(d + 1, dtype=x.dtype)
        delta = jnp.linalg.solve(h, g)
        # if this evaluation already satisfies tol, hold position (matters
        # under vmap, where converged symbols keep riding the batched loop)
        beta = jnp.where(gmax < tol, beta, beta - delta)
        return beta, it + 1, gmax

    beta, n_iter, _ = jax.lax.while_loop(
        cond, body,
        (jnp.zeros((d + 1,), x.dtype), jnp.int32(0),
         jnp.asarray(jnp.inf, x.dtype)),
    )
    return LRModel(
        coef=beta[:d],
        intercept=beta[d],
        n_iter=n_iter,
        grad_norm=jnp.max(jnp.abs(grad(beta))),
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
