"""Correlated multi-symbol MC + portfolio-level risk (beyond the reference).

The reference trades ONE symbol at a time — its engine loop holds a single
ticker and its Monte Carlo replays that symbol's own bars
(qmmx_monolithic.py:3353-3538); nothing in it can express co-movement between
symbols or risk at the book level.  A production deployment runs a universe
whose symbols co-move, and the risk that matters is the JOINT law: two
perfectly correlated symbols double exposure, two independent ones diversify,
and only per-path portfolio aggregation can tell those apart (per-symbol
marginals are identical in both cases).

This module adds the scaled analog the reference never had:

* **One-factor market model** — per (path, bar) the symbol-s price shock is

      z_s = beta_s * z_mkt + sqrt(1 - beta_s^2) * eps_s

  with one shared market draw ``z_mkt`` and independent idiosyncratic draws
  ``eps_s`` (bridge extremes and tie coins stay independent per symbol: bar
  INTERIORS are microstructure, the factor model drives closes).  beta_s = 0
  recovers independent symbols; beta_s = 1 moves every symbol with the
  market.  The classic equity one-factor (beta) model — full correlation
  matrices reduce to it for one dominant factor, and it is the form the
  fused kernel can run without cross-symbol residency.
* **True portfolio aggregation** — per path, the weighted per-symbol equity
  CURVES sum into a portfolio curve; final portfolio R feeds a PathStats
  (histogram → portfolio VaR/CVaR), and the portfolio max drawdown is
  peak-tracked over TIME on the combined curve (a book can draw down while
  every symbol's own final equity is flat — summing final dds overstates,
  summing final equities misses it).

The per-symbol lifecycle is the gated multi-trade state machine
(sim/gatedpath.gated_path_replay — cooldown, touch budgets, confidence
gate), the same semantics the fused gated kernel runs on-chip; the
correlated gated universe kernel (ops/pallas_mc.mc_paths_pallas_gated_corr)
is exactness-tested against this pipeline under injected uniforms.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import EngineParams
from ..ops import pathgen as PG
from ..sim import pathsim
from ..sim.gatedpath import GateConfig, gated_path_replay
from ..sim.pathsim import PathStats
from ..types import Levels
from ..utils import prng


def _bars_from_shocks(z, khi, klo, *, s0, mu, sigma, dt) -> PG.PathBars:
    """GBM OHLC bars from GIVEN close-to-close shocks ``z`` [P, W]
    (ops/pathgen.gbm_paths with the normal draw replaced by the correlated
    factor combination; bridge extremes drawn fresh from ``khi``/``klo``)."""
    z = jnp.asarray(z, jnp.float32)
    p, w = z.shape
    sig_dt = jnp.asarray(sigma, jnp.float32) * jnp.sqrt(jnp.float32(dt))
    drift = (jnp.float32(mu) - 0.5 * jnp.asarray(sigma, jnp.float32) ** 2
             ) * jnp.float32(dt)
    log_s0 = jnp.log(jnp.asarray(s0, jnp.float32))
    log_close = log_s0 + jnp.cumsum(drift + sig_dt * z, axis=-1)
    log_open = jnp.concatenate(
        [jnp.full((p, 1), log_s0, jnp.float32), log_close[:, :-1]], axis=-1)
    log_hi, log_lo = PG._bridge_extremes(
        khi, klo, log_open, log_close, sig_dt * sig_dt)
    return PG.PathBars(
        open=jnp.exp(log_open), high=jnp.exp(log_hi), low=jnp.exp(log_lo),
        close=jnp.exp(log_close), volume=jnp.zeros((p, w), jnp.float32))


@partial(jax.jit, static_argnames=("num_paths", "num_bars", "block_paths"))
def portfolio_mc(
    key,
    levels: Levels,           # batched [S, L]
    params: EngineParams,     # shared scalars
    s0,                       # f32[S]
    sigma,                    # f32[S]
    beta,                     # f32[S] market loadings in [-1, 1]
    weights,                  # f32[S] book weights (sum ~1 keeps the
                              # portfolio histogram inside the LIFE range)
    gate: GateConfig | None = None,
    *,
    num_paths: int,
    num_bars: int = 40,
    dt: float = 1.0 / (390.0 * 252.0),
    mu: float = 0.0,
    block_paths: int = 1 << 13,
) -> tuple[PathStats, PathStats]:
    """Correlated-universe gated MC: returns ([S] per-symbol PathStats,
    portfolio PathStats).

    Path i carries the SAME market shocks across all symbols, so the
    portfolio fields are a true joint-law Monte Carlo: ``hist``/``quantile``/
    ``cvar`` describe per-path portfolio total R, ``max_dd`` is the worst
    peak-tracked drawdown of the per-path portfolio equity CURVE, ``n_tp``/
    ``n_stop``/``sum_trades`` aggregate trades over the whole book, and
    ``n_entered`` counts paths where ANY symbol traded."""
    if gate is None:
        gate = GateConfig.from_params(params)
    if num_paths % block_paths != 0:
        raise ValueError("num_paths must be a multiple of block_paths")
    n_blocks = num_paths // block_paths
    s0 = jnp.asarray(s0, jnp.float32)
    sigma = jnp.asarray(sigma, jnp.float32)
    beta = jnp.asarray(beta, jnp.float32)
    weights = jnp.asarray(weights, jnp.float32)
    n_sym = s0.shape[0]
    sym_idx = jnp.arange(n_sym, dtype=jnp.uint32)

    def one_block(b):
        km = prng.key_for(key, prng.STREAM_MARKET, b)
        z_m = jax.random.normal(km, (block_paths, num_bars), jnp.float32)

        def per_symbol(carry, xs):
            port_curve, trades_tot, wins_tot, losses_tot, open_any = carry
            si, lv, s0s, sgs, bts, wts = xs
            ks = prng.key_for(key, prng.STREAM_PATH, b, si)
            eps = jax.random.normal(ks, (block_paths, num_bars), jnp.float32)
            z = bts * z_m + jnp.sqrt(
                jnp.maximum(0.0, 1.0 - bts * bts)) * eps
            bars = _bars_from_shocks(
                z, prng.key_for(ks, prng.STREAM_BRIDGE_HI),
                prng.key_for(ks, prng.STREAM_BRIDGE_LO),
                s0=s0s, mu=mu, sigma=sgs, dt=dt)
            tie = jax.random.uniform(
                prng.key_for(ks, prng.STREAM_TIE_COIN),
                (block_paths, num_bars), jnp.float32)
            out, curve = gated_path_replay(
                bars, lv, params, gate, tie, return_curve=True)
            stats = PathStats.from_lifecycle(
                equity=out.equity, trades=out.trades, wins=out.wins,
                losses=out.losses, open_at_end=out.open_at_end,
                max_dd=out.max_dd)
            carry = (port_curve + wts * curve,
                     trades_tot + out.trades,
                     wins_tot + out.wins,
                     losses_tot + out.losses,
                     jnp.logical_or(open_any, out.open_at_end))
            return carry, stats

        zero_curve = jnp.zeros((num_bars, block_paths), jnp.float32)
        zi = jnp.zeros((block_paths,), jnp.int32)
        (port_curve, trades_tot, wins_tot, losses_tot, open_any), sym_stats = (
            jax.lax.scan(
                per_symbol,
                (zero_curve, zi, zi, zi, jnp.zeros((block_paths,), bool)),
                (sym_idx, levels, s0, sigma, beta, weights),
            )
        )
        # portfolio curve → final R + TRUE time-tracked drawdown (peak over
        # the combined curve, reference per-trial dd semantics :3491-3510
        # lifted to the book level)
        final = port_curve[-1]
        peak = jax.lax.cummax(jnp.maximum(port_curve, 0.0), axis=0)
        port_dd = jnp.max(peak - port_curve, axis=0)
        port_stats = PathStats.from_lifecycle(
            equity=final, trades=trades_tot, wins=wins_tot,
            losses=losses_tot, open_at_end=open_any, max_dd=port_dd)
        return sym_stats, port_stats

    def body(carry, b):
        sym_c, port_c = carry
        sym_s, port_s = one_block(b)
        return (sym_c.merge(sym_s), port_c.merge(port_s)), None

    zero_sym = jax.vmap(
        lambda _: PathStats.zero(pathsim.LIFE_HIST_LO, pathsim.LIFE_HIST_HI)
    )(sym_idx)
    zero_port = PathStats.zero(pathsim.LIFE_HIST_LO, pathsim.LIFE_HIST_HI)
    (sym_stats, port_stats), _ = jax.lax.scan(
        body, (zero_sym, zero_port), jnp.arange(n_blocks, dtype=jnp.uint32))
    return sym_stats, port_stats
