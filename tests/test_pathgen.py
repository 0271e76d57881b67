"""Path samplers: shape/ordering invariants, reproducibility, statistics."""

import jax
import numpy as np

from qmmx_monolithic_monte_carlo_tpu.ops import pathgen as PG


def test_gbm_shapes_and_ordering():
    key = jax.random.key(0)
    p = PG.gbm_paths(key, num_paths=64, num_bars=40, s0=100.0, sigma=0.2)
    for arr in p:
        assert arr.shape == (64, 40)
    o, h, l, c = map(np.asarray, p)
    assert np.all(h >= np.maximum(o, c) - 1e-5)
    assert np.all(l <= np.minimum(o, c) + 1e-5)
    assert np.all(l > 0)


def test_gbm_reproducible_and_key_sensitive():
    k = jax.random.key(7)
    a = PG.gbm_paths(k, num_paths=8, num_bars=16, s0=50.0)
    b = PG.gbm_paths(k, num_paths=8, num_bars=16, s0=50.0)
    c = PG.gbm_paths(jax.random.key(8), num_paths=8, num_bars=16, s0=50.0)
    np.testing.assert_array_equal(np.asarray(a.close), np.asarray(b.close))
    assert not np.allclose(np.asarray(a.close), np.asarray(c.close))


def test_gbm_antithetic_pairs_cancel_drift():
    key = jax.random.key(1)
    p = PG.gbm_paths(key, num_paths=1024, num_bars=8, s0=100.0, mu=0.0,
                     sigma=0.3, dt=1e-4, antithetic=True)
    logc = np.log(np.asarray(p.close))
    half = 512
    # antithetic pairing: log-returns of path i and i+half are exact negations
    # around the deterministic drift
    drift = (0.0 - 0.5 * 0.3 ** 2) * 1e-4
    dev1 = logc[:half, -1] - np.log(100.0) - 8 * drift
    dev2 = logc[half:, -1] - np.log(100.0) - 8 * drift
    np.testing.assert_allclose(dev1, -dev2, atol=1e-4)


def test_gbm_moments():
    key = jax.random.key(2)
    sigma, dt, nb = 0.25, 1e-4, 32
    p = PG.gbm_paths(key, num_paths=8192, num_bars=nb, s0=100.0, sigma=sigma, dt=dt)
    logr = np.diff(np.log(np.asarray(p.close)), axis=1).ravel()
    assert abs(logr.std() - sigma * np.sqrt(dt)) < 0.02 * sigma * np.sqrt(dt) * 10


def test_bootstrap_shapes_and_rebase():
    rng = np.random.default_rng(0)
    n = 100
    c = 100 + np.cumsum(rng.normal(0, 0.2, n))
    h = c + np.abs(rng.normal(0, 0.1, n))
    l = c - np.abs(rng.normal(0, 0.1, n))
    o = c + rng.normal(0, 0.05, n)
    p = PG.bootstrap_paths(
        jax.random.key(3),
        hist_open=o, hist_high=h, hist_low=l, hist_close=c,
        num_paths=32, num_bars=20, s0=200.0,
    )
    assert p.close.shape == (32, 20)
    ch = np.asarray(p.close)
    assert np.all(ch > 0)
    # first bar chains from s0: close_0 = s0 * exp(sampled log-return)
    hist_prev = np.concatenate([c[:1], c[:-1]])
    ratios = sorted((c / hist_prev).tolist())
    first_ratio = ch[:, 0] / 200.0
    assert np.all(first_ratio >= min(ratios) - 1e-5)
    assert np.all(first_ratio <= max(ratios) + 1e-5)
