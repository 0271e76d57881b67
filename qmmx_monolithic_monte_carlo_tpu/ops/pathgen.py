"""Price-path samplers: GBM with Brownian-bridge bar extremes, bootstrap, antithetic.

The reference has no generative sampler — its Monte Carlo reuses one recorded bar
window and only jitters trade parameters (qmmx_monolithic.py:3449-3461).  The
rebuild's north star (BASELINE.json) adds true path sampling so robustness sweeps
draw fresh 1-minute OHLC paths:

* ``gbm_paths`` — geometric Brownian motion closes; per-bar highs/lows sampled from
  the exact law of the max/min of a Brownian bridge between consecutive log-closes
  (max: M = ((a+b) + sqrt((b-a)^2 - 2 sigma^2 dt ln U)) / 2, U ~ Uniform(0,1)),
  so generated bars have statistically consistent wicks rather than ad-hoc noise.
* ``bootstrap_paths`` — i.i.d. resampling of historical bar *relative* geometry
  (log close-to-close return, high/low/open offsets relative to prev close),
  rebased onto ``s0``; preserves the empirical bar-shape distribution.
* ``antithetic`` — pairs each path with its sign-flipped Gaussian driver for
  variance reduction (BASELINE config #3).

All samplers are shape-static and keyed per path via fold_in, so they vmap/shard
cleanly over the path axis.  These are the pure-XLA reference implementations; the
fused Pallas kernel (ops/pallas_mc.py) regenerates the same paths in VMEM without
materializing them in HBM.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import prng


class PathBars(NamedTuple):
    """Generated OHLC paths: f32[paths, bars] each."""

    open: jnp.ndarray
    high: jnp.ndarray
    low: jnp.ndarray
    close: jnp.ndarray


def _bridge_extremes(key_hi, key_lo, log_a, log_b, sig2dt):
    """Sample (log_high, log_low) of a Brownian bridge from log_a to log_b with
    variance sig2dt, via inverse-CDF of the bridge max/min laws."""
    u = jax.random.uniform(key_hi, log_a.shape, jnp.float32, 1e-12, 1.0)
    v = jax.random.uniform(key_lo, log_a.shape, jnp.float32, 1e-12, 1.0)
    d2 = (log_b - log_a) ** 2
    log_hi = 0.5 * (log_a + log_b + jnp.sqrt(d2 - 2.0 * sig2dt * jnp.log(u)))
    log_lo = 0.5 * (log_a + log_b - jnp.sqrt(d2 - 2.0 * sig2dt * jnp.log(v)))
    return log_hi, log_lo


def gbm_paths(
    key: jax.Array,
    *,
    num_paths: int,
    num_bars: int,
    s0,
    mu: float = 0.0,
    sigma: float = 0.15,
    dt: float = 1.0 / (390.0 * 252.0),
    antithetic: bool = False,
) -> PathBars:
    """GBM 1-minute OHLC paths.  With ``antithetic`` the second half of the path
    axis reuses the first half's normals negated (num_paths must be even)."""
    if antithetic and num_paths % 2 != 0:
        raise ValueError("antithetic requires an even num_paths")
    n_draw = num_paths // 2 if antithetic else num_paths

    kz = prng.key_for(key, prng.STREAM_PATH)
    khi = prng.key_for(key, prng.STREAM_BRIDGE_HI)
    klo = prng.key_for(key, prng.STREAM_BRIDGE_LO)

    z = jax.random.normal(kz, (n_draw, num_bars), jnp.float32)
    if antithetic:
        z = jnp.concatenate([z, -z], axis=0)

    sig_dt = jnp.float32(sigma) * jnp.sqrt(jnp.float32(dt))
    drift = jnp.float32(mu - 0.5 * sigma * sigma) * jnp.float32(dt)
    log_s0 = jnp.log(jnp.asarray(s0, jnp.float32))
    log_close = log_s0 + jnp.cumsum(drift + sig_dt * z, axis=-1)
    log_open = jnp.concatenate(
        [jnp.full((num_paths, 1), log_s0, jnp.float32), log_close[:, :-1]], axis=-1
    )

    # Bridge extremes are drawn fresh for every path (antithetic pairing applies to
    # the close-to-close driver only).
    sig2dt = sig_dt * sig_dt
    log_hi, log_lo = _bridge_extremes(khi, klo, log_open, log_close, sig2dt)
    return PathBars(
        open=jnp.exp(log_open),
        high=jnp.exp(log_hi),
        low=jnp.exp(log_lo),
        close=jnp.exp(log_close),
    )


def bootstrap_paths(
    key: jax.Array,
    *,
    hist_open: jnp.ndarray,
    hist_high: jnp.ndarray,
    hist_low: jnp.ndarray,
    hist_close: jnp.ndarray,
    num_paths: int,
    num_bars: int,
    s0,
) -> PathBars:
    """Resample historical bar geometry with replacement and rebase onto ``s0``.

    Each historical bar contributes (r, ho, lo, oo): log return vs prev close and
    log offsets of high/low/open vs prev close.  Sampled bars chain multiplicatively.
    """
    hist_close = jnp.asarray(hist_close, jnp.float32)
    prev_close = jnp.concatenate([hist_close[:1], hist_close[:-1]])
    logc = jnp.log(hist_close / prev_close)
    logh = jnp.log(jnp.asarray(hist_high, jnp.float32) / prev_close)
    logl = jnp.log(jnp.asarray(hist_low, jnp.float32) / prev_close)
    logo = jnp.log(jnp.asarray(hist_open, jnp.float32) / prev_close)

    kb = prng.key_for(key, prng.STREAM_BOOTSTRAP)
    idx = jax.random.randint(kb, (num_paths, num_bars), 0, hist_close.shape[0])
    r = logc[idx]
    log_prev = jnp.log(jnp.asarray(s0, jnp.float32)) + jnp.concatenate(
        [jnp.zeros((num_paths, 1), jnp.float32), jnp.cumsum(r[:, :-1], axis=-1)], axis=-1
    )
    return PathBars(
        open=jnp.exp(log_prev + logo[idx]),
        high=jnp.exp(log_prev + logh[idx]),
        low=jnp.exp(log_prev + logl[idx]),
        close=jnp.exp(log_prev + r),
    )


def block_bootstrap_paths(
    key: jax.Array,
    *,
    hist_open: jnp.ndarray,
    hist_high: jnp.ndarray,
    hist_low: jnp.ndarray,
    hist_close: jnp.ndarray,
    num_paths: int,
    num_bars: int,
    s0,
    block_len: int = 10,
) -> PathBars:
    """Block bootstrap: resample contiguous ``block_len``-bar runs of historical
    bar geometry, preserving short-range dependence (vol clustering, intraday
    momentum) that i.i.d. resampling destroys.  Blocks chain multiplicatively
    like ``bootstrap_paths``."""
    hist_close = jnp.asarray(hist_close, jnp.float32)
    n_hist = hist_close.shape[0]
    if n_hist <= block_len:
        raise ValueError("history shorter than block_len")
    prev_close = jnp.concatenate([hist_close[:1], hist_close[:-1]])
    logc = jnp.log(hist_close / prev_close)
    logh = jnp.log(jnp.asarray(hist_high, jnp.float32) / prev_close)
    logl = jnp.log(jnp.asarray(hist_low, jnp.float32) / prev_close)
    logo = jnp.log(jnp.asarray(hist_open, jnp.float32) / prev_close)

    n_blocks = -(-num_bars // block_len)
    kb = prng.key_for(key, prng.STREAM_BOOTSTRAP)
    starts = jax.random.randint(kb, (num_paths, n_blocks), 0, n_hist - block_len)
    offs = jnp.arange(block_len)
    idx = (starts[:, :, None] + offs[None, None, :]).reshape(num_paths, -1)
    idx = idx[:, :num_bars]

    r = logc[idx]
    log_prev = jnp.log(jnp.asarray(s0, jnp.float32)) + jnp.concatenate(
        [jnp.zeros((num_paths, 1), jnp.float32), jnp.cumsum(r[:, :-1], axis=-1)],
        axis=-1,
    )
    return PathBars(
        open=jnp.exp(log_prev + logo[idx]),
        high=jnp.exp(log_prev + logh[idx]),
        low=jnp.exp(log_prev + logl[idx]),
        close=jnp.exp(log_prev + r),
    )


def heston_paths(
    key: jax.Array,
    *,
    num_paths: int,
    num_bars: int,
    s0,
    v0: float = 0.04,
    kappa: float = 3.0,
    theta: float = 0.04,
    xi: float = 0.6,
    rho: float = -0.7,
    mu: float = 0.0,
    dt: float = 1.0 / (390.0 * 252.0),
    antithetic: bool = False,
) -> PathBars:
    """Heston stochastic-volatility paths (full-truncation Euler) with bridge
    bar extremes using each bar's local vol.  Produces the vol clustering and
    leverage effect GBM cannot; drops into the same replay/reduction pipeline."""
    if antithetic and num_paths % 2 != 0:
        raise ValueError("antithetic requires an even num_paths")
    n_draw = num_paths // 2 if antithetic else num_paths

    kz = prng.key_for(key, prng.STREAM_PATH, 1)
    kv = prng.key_for(key, prng.STREAM_PATH, 2)
    z1 = jax.random.normal(kz, (n_draw, num_bars), jnp.float32)
    zv = jax.random.normal(kv, (n_draw, num_bars), jnp.float32)
    if antithetic:
        z1 = jnp.concatenate([z1, -z1], axis=0)
        zv = jnp.concatenate([zv, -zv], axis=0)
    rho = jnp.float32(rho)
    z2 = rho * z1 + jnp.sqrt(1.0 - rho * rho) * zv  # vol shock corr w/ price

    dtf = jnp.float32(dt)

    def step(carry, zs):
        logp, v = carry
        z_s, z_v = zs
        v_pos = jnp.maximum(v, 0.0)
        sig_dt = jnp.sqrt(v_pos * dtf)
        logp_new = logp + (jnp.float32(mu) - 0.5 * v_pos) * dtf + sig_dt * z_s
        v_new = v + jnp.float32(kappa) * (jnp.float32(theta) - v_pos) * dtf \
            + jnp.float32(xi) * sig_dt * z_v
        return (logp_new, v_new), (logp_new, sig_dt)

    log_s0 = jnp.log(jnp.asarray(s0, jnp.float32))
    init = (jnp.full((num_paths,), log_s0), jnp.full((num_paths,), jnp.float32(v0)))
    (_, _), (log_close_t, sig_dt_t) = jax.lax.scan(
        step, init, (z1.T, z2.T)
    )
    log_close = log_close_t.T                     # [P, W]
    sig_dt = sig_dt_t.T
    log_open = jnp.concatenate(
        [jnp.full((num_paths, 1), log_s0), log_close[:, :-1]], axis=-1
    )

    khi = prng.key_for(key, prng.STREAM_BRIDGE_HI, 1)
    klo = prng.key_for(key, prng.STREAM_BRIDGE_LO, 1)
    log_hi, log_lo = _bridge_extremes(khi, klo, log_open, log_close, sig_dt * sig_dt)
    return PathBars(
        open=jnp.exp(log_open), high=jnp.exp(log_hi),
        low=jnp.exp(log_lo), close=jnp.exp(log_close),
    )
