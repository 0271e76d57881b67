"""Path samplers: shape/ordering invariants, reproducibility, statistics."""

import jax
import numpy as np
import pytest

from qmmx_monolithic_monte_carlo_tpu.ops import pathgen as PG


def test_gbm_shapes_and_ordering():
    key = jax.random.key(0)
    p = PG.gbm_paths(key, num_paths=64, num_bars=40, s0=100.0, sigma=0.2)
    for arr in p:
        assert arr.shape == (64, 40)
    o, h, l, c, _v = map(np.asarray, p)
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


def test_block_bootstrap_preserves_dependence():
    """Block bootstrap must carry more of the history's volatility clustering
    than i.i.d. resampling."""
    rng = np.random.default_rng(1)
    n = 2000
    # history with strong vol clustering: alternating calm/wild regimes
    vol = np.where((np.arange(n) // 50) % 2 == 0, 0.02, 0.3)
    r = rng.normal(0, 1, n) * vol * 1e-2
    c = 100 * np.exp(np.cumsum(r))
    h = c * np.exp(np.abs(rng.normal(0, 0.3, n)) * vol * 1e-2)
    l = c * np.exp(-np.abs(rng.normal(0, 0.3, n)) * vol * 1e-2)
    o = np.concatenate([[c[0]], c[:-1]])
    kw = dict(hist_open=o, hist_high=h, hist_low=l, hist_close=c,
              num_paths=256, num_bars=100, s0=100.0)
    blk = PG.block_bootstrap_paths(jax.random.key(0), block_len=25, **kw)
    iid = PG.bootstrap_paths(jax.random.key(0), **kw)

    def absret_autocorr(p):
        lr = np.abs(np.diff(np.log(np.asarray(p.close)), axis=1))
        x = lr[:, :-1].ravel()
        y = lr[:, 1:].ravel()
        return np.corrcoef(x, y)[0, 1]

    assert absret_autocorr(blk) > absret_autocorr(iid) + 0.1


def test_block_bootstrap_shapes_and_validation():
    rng = np.random.default_rng(2)
    c = 100 + np.cumsum(rng.normal(0, 0.1, 50))
    kw = dict(hist_open=c, hist_high=c + 0.1, hist_low=c - 0.1, hist_close=c,
              num_paths=8, num_bars=33, s0=100.0)
    p = PG.block_bootstrap_paths(jax.random.key(1), block_len=10, **kw)
    assert p.close.shape == (8, 33)
    with pytest.raises(ValueError):
        PG.block_bootstrap_paths(jax.random.key(1), block_len=60, **kw)


def test_heston_paths_statistics():
    key = jax.random.key(3)
    p = PG.heston_paths(key, num_paths=2048, num_bars=64, s0=100.0,
                        v0=0.09, theta=0.09, kappa=2.0, xi=0.5, rho=-0.7,
                        dt=1e-4)
    o, h, l, c, _v = map(np.asarray, p)
    assert np.all(h >= np.maximum(o, c) - 1e-5)
    assert np.all(l <= np.minimum(o, c) + 1e-5)
    assert np.all(c > 0)
    # per-bar return variance near v0*dt at the start (vol starts at v0)
    lr = np.diff(np.log(c), axis=1)
    early_var = lr[:, :8].var()
    assert abs(early_var - 0.09 * 1e-4) < 0.4 * 0.09 * 1e-4


def test_heston_vol_clustering():
    key = jax.random.key(4)
    p = PG.heston_paths(key, num_paths=512, num_bars=256, s0=100.0,
                        v0=0.04, theta=0.04, kappa=1.0, xi=1.0, rho=-0.5,
                        dt=1e-4)
    lr = np.abs(np.diff(np.log(np.asarray(p.close)), axis=1))
    x = lr[:, :-1].ravel()
    y = lr[:, 1:].ravel()
    ac = np.corrcoef(x, y)[0, 1]
    gbm = PG.gbm_paths(jax.random.key(5), num_paths=512, num_bars=256,
                       s0=100.0, sigma=0.2, dt=1e-4)
    lr2 = np.abs(np.diff(np.log(np.asarray(gbm.close)), axis=1))
    ac_gbm = np.corrcoef(lr2[:, :-1].ravel(), lr2[:, 1:].ravel())[0, 1]
    assert ac > ac_gbm + 0.02


def test_heston_antithetic():
    p = PG.heston_paths(jax.random.key(6), num_paths=64, num_bars=16,
                        s0=100.0, antithetic=True)
    assert p.close.shape == (64, 16)
    with pytest.raises(ValueError):
        PG.heston_paths(jax.random.key(6), num_paths=63, num_bars=16,
                        s0=100.0, antithetic=True)


# ---- volume (round 3: generated paths carry per-bar volume) ----

def test_gbm_volume_properties():
    key = jax.random.key(7)
    vm = PG.VolumeModel(base=1e6, u_amp=0.6, noise_sigma=0.3, ret_coupling=0.5,
                        day_minutes=390, open_minute=0)
    p = PG.gbm_paths(key, num_paths=2048, num_bars=390, s0=100.0, sigma=0.2,
                     dt=1e-4, volume_model=vm)
    v = np.asarray(p.volume)
    assert v.shape == (2048, 390)
    assert np.all(v > 0)
    # lognormal(mean 1) x unit-mean U-shape -> overall mean near base
    assert abs(v.mean() / 1e6 - 1.0) < 0.1
    # intraday U-shape: session edges print more than midday
    edges = np.concatenate([v[:, :30], v[:, -30:]], axis=1).mean()
    mid = v[:, 180:210].mean()
    assert edges > 1.2 * mid
    # |return| coupling: big price moves print big volume
    lr = np.abs(np.diff(np.log(np.asarray(p.close)), axis=1))
    corr = np.corrcoef(lr.ravel(), v[:, 1:].ravel())[0, 1]
    assert corr > 0.1
    # determinism
    p2 = PG.gbm_paths(key, num_paths=2048, num_bars=390, s0=100.0, sigma=0.2,
                      dt=1e-4, volume_model=vm)
    np.testing.assert_array_equal(v, np.asarray(p2.volume))


def test_volume_model_never_perturbs_prices():
    key = jax.random.key(8)
    base = PG.gbm_paths(key, num_paths=256, num_bars=40, s0=100.0, sigma=0.2)
    other = PG.gbm_paths(key, num_paths=256, num_bars=40, s0=100.0, sigma=0.2,
                         volume_model=PG.VolumeModel(base=5e5, noise_sigma=0.9))
    for f in ("open", "high", "low", "close"):
        np.testing.assert_array_equal(
            np.asarray(getattr(base, f)), np.asarray(getattr(other, f)))
    assert not np.array_equal(np.asarray(base.volume), np.asarray(other.volume))


def test_bootstrap_volume_carries_real_bars():
    rng = np.random.default_rng(0)
    n = 100
    c = (100 + np.cumsum(rng.normal(0, 0.1, n))).astype(np.float32)
    vols = (1e6 + 10.0 * np.arange(n)).astype(np.float32)  # unique per bar
    p = PG.bootstrap_paths(
        jax.random.key(9),
        hist_open=np.concatenate([c[:1], c[:-1]]), hist_high=c + 0.05,
        hist_low=c - 0.05, hist_close=c,
        num_paths=64, num_bars=20, s0=100.0, hist_volume=vols,
    )
    v = np.asarray(p.volume)
    # every sampled volume is a real historical bar volume...
    assert np.isin(v, vols).all()
    # ...and stays paired with that bar's log-return
    prev = np.concatenate([c[:1], c[:-1]])
    logc = np.log(c / prev)
    idx = np.rint((v - 1e6) / 10.0).astype(int)
    got_lr = np.diff(np.log(np.asarray(p.close)), axis=1)
    np.testing.assert_allclose(got_lr, logc[idx][:, 1:], rtol=0, atol=1e-4)


def test_block_bootstrap_and_heston_volume():
    rng = np.random.default_rng(1)
    n = 100
    c = (100 + np.cumsum(rng.normal(0, 0.1, n))).astype(np.float32)
    vols = (1e6 + 10.0 * np.arange(n)).astype(np.float32)
    p = PG.block_bootstrap_paths(
        jax.random.key(10),
        hist_open=np.concatenate([c[:1], c[:-1]]), hist_high=c + 0.05,
        hist_low=c - 0.05, hist_close=c,
        num_paths=32, num_bars=20, s0=100.0, block_len=5, hist_volume=vols,
    )
    v = np.asarray(p.volume)
    assert np.isin(v, vols).all()
    # contiguity: within a 5-bar block, volumes step by exactly +10
    dv = np.diff(v[:, :5], axis=1)
    assert (np.abs(dv - 10.0) < 1e-3).mean() > 0.9

    h = PG.heston_paths(jax.random.key(11), num_paths=64, num_bars=40, s0=100.0)
    hv = np.asarray(h.volume)
    assert hv.shape == (64, 40) and np.all(hv > 0)
