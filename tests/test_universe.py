"""Multi-symbol universe MC + per-symbol policy refresh (BASELINE config #4)."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from qmmx_monolithic_monte_carlo_tpu.config import EngineParams
from qmmx_monolithic_monte_carlo_tpu.parallel import universe as U
from qmmx_monolithic_monte_carlo_tpu.sim import pathsim

PARAMS = EngineParams.default()


def _universe(s=4):
    rows = [
        [{"color": "blue", "type": "solid", "index": 0, "price": 100.0 + 10 * i}]
        for i in range(s)
    ]
    levels = U.stack_levels(rows, max_levels=4)
    s0 = np.array([100.0 + 10 * i for i in range(s)], np.float32)
    sigma = np.array([0.2 + 0.05 * i for i in range(s)], np.float32)
    return levels, s0, sigma


def test_universe_mc_batches_per_symbol():
    levels, s0, sigma = _universe(4)
    stats = U.universe_mc(
        jax.random.key(0), levels, PARAMS, s0, sigma,
        paths_per_symbol=1 << 12, num_bars=24, block_paths=1 << 12,
    )
    assert stats.n.shape == (4,)
    assert np.all(np.asarray(stats.n) == 1 << 12)
    # each symbol enters near its own level (spot == level); higher-vol symbols
    # jump out of the contact window more often
    entered = np.asarray(stats.n_entered)
    assert np.all(entered > 0.7 * (1 << 12))
    assert entered[0] > entered[-1]  # vol ordering
    # per-symbol results must equal a single-symbol run with the same keying
    from qmmx_monolithic_monte_carlo_tpu.utils import prng

    single = U.universe_mc(
        jax.random.key(0),
        jax.tree_util.tree_map(lambda x: x[:1], levels),
        PARAMS, s0[:1], sigma[:1],
        paths_per_symbol=1 << 12, num_bars=24, block_paths=1 << 12,
    )
    np.testing.assert_allclose(float(stats.sum_r[0]), float(single.sum_r[0]),
                               rtol=1e-6)


def test_sharded_universe_on_2d_mesh():
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("paths", "symbols"))
    levels, s0, sigma = _universe(4)
    stats = U.sharded_universe(
        mesh, jax.random.key(1), levels, PARAMS, s0, sigma,
        paths_per_symbol=1 << 12, num_bars=16, block_paths=1 << 12,
    )
    assert stats.n.shape == (4,)
    local = U.universe_mc(
        jax.random.key(1), levels, PARAMS, s0, sigma,
        paths_per_symbol=1 << 12, num_bars=16, block_paths=1 << 12,
    )
    np.testing.assert_allclose(np.asarray(stats.sum_r), np.asarray(local.sum_r),
                               rtol=1e-5)


def test_universe_policy_refresh_sharded():
    rng = np.random.default_rng(0)
    s, n, d = 6, 80, 3
    xs = rng.normal(0, 1, (s, n, d))
    w_true = rng.normal(0, 1.5, (s, d))
    p = 1 / (1 + np.exp(-np.einsum("snd,sd->sn", xs, w_true)))
    ys = (rng.uniform(size=(s, n)) < p).astype(np.int32)
    devs = np.array(jax.devices()[:6]).reshape(1, 6)
    mesh = Mesh(devs, ("paths", "symbols"))
    models = U.universe_policy_refresh(mesh, xs, ys)
    assert models.coef.shape == (s, d)
    # agrees with the unsharded batched fit
    from qmmx_monolithic_monte_carlo_tpu.models import logistic as L

    plain = L.fit_batched(xs, ys, max_iter=30)
    np.testing.assert_allclose(np.asarray(models.coef), np.asarray(plain.coef),
                               atol=1e-5)


def test_universe_mc_gated_lifecycle():
    """Per-symbol gated lifecycle on the XLA universe pipeline: trade
    accounting holds per symbol and multi-trade activity shows up."""
    from qmmx_monolithic_monte_carlo_tpu.sim.gatedpath import GateConfig

    levels, s0, sigma = _universe(4)
    stats = U.universe_mc(
        jax.random.key(0), levels, PARAMS, s0, sigma,
        paths_per_symbol=1 << 12, num_bars=24, block_paths=1 << 12,
        gate=GateConfig.default(touch_limit=100, touch_gap_bars=1),
    )
    assert stats.n.shape == (4,)
    np.testing.assert_allclose(
        np.asarray(stats.n_tp + stats.n_stop + stats.n_open),
        np.asarray(stats.sum_trades),
    )
    assert np.all(np.asarray(stats.sum_trades) >= np.asarray(stats.n_entered))
    assert np.asarray(stats.sum_trades).sum() > np.asarray(stats.n_entered).sum()
    assert np.all(np.asarray(stats.max_dd) >= 0)
