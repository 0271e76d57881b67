"""JAX IRLS logistic regression vs scikit-learn coefficient parity (BASELINE #1)."""

import numpy as np
import pytest

import jax


def _make_data(rng, n=200, d=3):
    x = rng.normal(0, 1, (n, d))
    w_true = rng.normal(0, 2, d)
    p = 1 / (1 + np.exp(-(x @ w_true + 0.3)))
    y = (rng.uniform(size=n) < p).astype(int)
    return x, y


@pytest.fixture(scope="module")
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_irls_matches_sklearn_tight(seed, x64):
    """Against a tightly-converged sklearn (tol=1e-12), parity to 1e-6."""
    from sklearn.linear_model import LogisticRegression

    from qmmx_monolithic_monte_carlo_tpu.models import logistic as L

    rng = np.random.default_rng(seed)
    x, y = _make_data(rng)
    sk = LogisticRegression(max_iter=10000, tol=1e-12).fit(x, y)
    ours = L.fit(x.astype(np.float64), y, max_iter=50)
    np.testing.assert_allclose(np.asarray(ours.coef), sk.coef_[0], atol=1e-6)
    np.testing.assert_allclose(float(ours.intercept), sk.intercept_[0], atol=1e-6)


def test_irls_matches_sklearn_reference_settings(x64):
    """Against the reference's exact call LogisticRegression(max_iter=1000)
    (defaults: lbfgs tol=1e-4) — sklearn's own looseness bounds the gap."""
    from sklearn.linear_model import LogisticRegression

    from qmmx_monolithic_monte_carlo_tpu.models import logistic as L

    rng = np.random.default_rng(7)
    # the reference feature shape: [lvl_type, distance, approach_up], n>=50 (:3838)
    n = 120
    x = np.column_stack([
        rng.integers(0, 2, n),
        rng.uniform(0, 0.5, n),
        rng.integers(0, 2, n),
    ]).astype(float)
    y = (rng.uniform(size=n) < 0.4 + 0.2 * x[:, 0]).astype(int)
    sk = LogisticRegression(max_iter=1000).fit(x, y)
    ours = L.fit(x, y, max_iter=50)
    # lbfgs at its default tol=1e-4 stops ~4e-4 short of the optimum our Newton
    # reaches; the tight-tol test above shows true 1e-6 agreement at the optimum.
    np.testing.assert_allclose(np.asarray(ours.coef), sk.coef_[0], atol=1e-3)
    np.testing.assert_allclose(float(ours.intercept), sk.intercept_[0], atol=1e-3)


def test_predict_proba_matches_sklearn(x64):
    from sklearn.linear_model import LogisticRegression

    from qmmx_monolithic_monte_carlo_tpu.models import logistic as L

    rng = np.random.default_rng(3)
    x, y = _make_data(rng)
    sk = LogisticRegression(max_iter=10000, tol=1e-12).fit(x, y)
    ours = L.fit(x.astype(np.float64), y, max_iter=50)
    xq = rng.normal(0, 1, (20, 3))
    np.testing.assert_allclose(
        np.asarray(L.predict_proba(ours, xq)), sk.predict_proba(xq)[:, 1], atol=1e-6
    )


def test_sample_weight_zero_equals_dropping_rows(x64):
    from qmmx_monolithic_monte_carlo_tpu.models import logistic as L

    rng = np.random.default_rng(4)
    x, y = _make_data(rng, n=100)
    w = np.ones(100)
    w[80:] = 0.0
    a = L.fit(x, y, w, max_iter=50)
    b = L.fit(x[:80], y[:80], max_iter=50)
    np.testing.assert_allclose(np.asarray(a.coef), np.asarray(b.coef), atol=1e-8)


def test_fit_batched_symbols(x64):
    """vmapped per-symbol refresh (BASELINE config #4 shape)."""
    from qmmx_monolithic_monte_carlo_tpu.models import logistic as L

    rng = np.random.default_rng(5)
    xs, ys = [], []
    for _ in range(4):
        x, y = _make_data(rng, n=150)
        xs.append(x)
        ys.append(y)
    xs = np.stack(xs)
    ys = np.stack(ys)
    batched = L.fit_batched(xs, ys, max_iter=50)
    for s in range(4):
        single = L.fit(xs[s], ys[s], max_iter=50)
        np.testing.assert_allclose(
            np.asarray(batched.coef[s]), np.asarray(single.coef), atol=1e-8
        )
