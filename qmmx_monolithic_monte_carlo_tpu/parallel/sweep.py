"""Hyperparameter grid sweeps over the Monte Carlo engine (BASELINE config #5).

The reference exposes STOP_PADDING / TP_PADDING / cooldown as settings evaluated
one configuration at a time; the rebuild sweeps a whole grid per jit call:
``vmap`` over the grid axis within a device × ``shard_map`` over the mesh for the
path axis.  Each grid point shares the path sampler draws (common random numbers
— the classic variance-reduction trick for comparing configurations).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import EngineParams
from ..ops import pathgen as PG
from ..sim import pathsim
from ..types import Levels
from ..utils import prng


def grid_params(base: EngineParams, *, stop_paddings, tp_paddings) -> EngineParams:
    """Build a [G]-batched EngineParams over the cartesian grid."""
    sp, tp = jnp.meshgrid(
        jnp.asarray(stop_paddings, jnp.float32),
        jnp.asarray(tp_paddings, jnp.float32),
        indexing="ij",
    )
    sp = sp.reshape(-1)
    tp = tp.reshape(-1)
    g = sp.shape[0]
    tile = lambda x: jnp.broadcast_to(jnp.asarray(x), (g,) + jnp.shape(jnp.asarray(x)))
    batched = jax.tree_util.tree_map(tile, base)
    return batched.replace(stop_padding=sp, tp_padding=tp)


def grid_params_gated(
    base: EngineParams,
    base_gate,
    *,
    stop_paddings=None,
    tp_paddings=None,
    touch_limits=None,
    q_min_probs=None,
):
    """Cartesian (stop × tp × touch_limit × q_min_prob) grid → a [G]-batched
    (EngineParams, GateConfig) pair for the gated decision-surface sweep.
    Omitted axes stay at their base value (singleton axis)."""
    from ..sim.gatedpath import GateConfig  # noqa: F401  (type of base_gate)

    axes = [
        jnp.asarray(stop_paddings if stop_paddings is not None
                    else [base.stop_padding], jnp.float32).reshape(-1),
        jnp.asarray(tp_paddings if tp_paddings is not None
                    else [base.tp_padding], jnp.float32).reshape(-1),
        jnp.asarray(touch_limits if touch_limits is not None
                    else [base_gate.touch_limit], jnp.float32).reshape(-1),
        jnp.asarray(q_min_probs if q_min_probs is not None
                    else [base_gate.q_min_prob], jnp.float32).reshape(-1),
    ]
    sp, tp, tl, qm = (m.reshape(-1) for m in jnp.meshgrid(*axes, indexing="ij"))
    g = sp.shape[0]
    tile = lambda x: jnp.broadcast_to(jnp.asarray(x), (g,) + jnp.shape(jnp.asarray(x)))
    params_g = jax.tree_util.tree_map(tile, base).replace(
        stop_padding=sp, tp_padding=tp)
    gate_g = jax.tree_util.tree_map(tile, base_gate).replace(
        touch_limit=tl.astype(jnp.int32), q_min_prob=qm)
    return params_g, gate_g


def _broadcast_gate(gate, g: int):
    """GateConfig leaves → leading [G] axis (scalar leaves broadcast)."""
    def tile(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] == g:
            return x
        return jnp.broadcast_to(x, (g,) + x.shape)

    return jax.tree_util.tree_map(tile, gate)


@partial(jax.jit, static_argnames=("num_paths", "num_bars", "block_paths",
                                   "sampler", "block_len"))
def sweep_paths(
    key,
    levels: Levels,
    grid: EngineParams,          # [G]-batched params
    *,
    num_paths: int,
    num_bars: int = 40,
    s0=100.0,
    mu: float = 0.0,
    sigma: float = 0.15,
    dt: float = 1.0 / (390.0 * 252.0),
    block_paths: int = 1 << 14,
    sampler: str = "gbm",
    hist_bars=None,
    block_len: int = 10,
    heston=None,
) -> pathsim.PathStats:
    """All grid points on one device: [G] PathStats, common random paths
    from any sampler (gbm / bootstrap / block_bootstrap / heston)."""
    if num_paths % block_paths != 0 or num_paths < block_paths:
        raise ValueError(
            f"num_paths ({num_paths}) must be a positive multiple of "
            f"block_paths ({block_paths})")
    n_blocks = num_paths // block_paths

    def body(carry, b):
        bkey = prng.key_for(key, prng.STREAM_PATH, b)
        paths = pathsim.sample_block(
            bkey, block_paths=block_paths, num_bars=num_bars, s0=s0, mu=mu,
            sigma=sigma, dt=dt, sampler=sampler, hist_bars=hist_bars,
            antithetic=False, block_len=block_len, heston=heston)
        tie = jax.random.uniform(
            prng.key_for(bkey, prng.STREAM_TIE_COIN), (block_paths,), jnp.float32
        )

        def per_cfg(p):
            r, outcome, entered = pathsim.path_replay(paths, levels, p, tie)
            return pathsim.PathStats.from_outcomes(r, outcome, entered)

        stats = jax.vmap(per_cfg)(grid)
        return carry.merge(stats), None

    zero = jax.vmap(lambda _: pathsim.PathStats.zero())(
        jnp.arange(jax.tree_util.tree_leaves(grid)[0].shape[0])
    )
    out, _ = jax.lax.scan(body, zero, jnp.arange(n_blocks, dtype=jnp.uint32))
    return out


@partial(jax.jit, static_argnames=("num_paths", "num_bars", "block_paths",
                                   "sampler", "block_len"))
def sweep_paths_gated(
    key,
    levels: Levels,
    grid: EngineParams,          # [G]-batched params (stop/tp vary)
    gate=None,                   # GateConfig: shared scalars OR [G]-batched
    *,
    num_paths: int,
    num_bars: int = 40,
    s0=100.0,
    mu: float = 0.0,
    sigma: float = 0.15,
    dt: float = 1.0 / (390.0 * 252.0),
    block_paths: int = 1 << 14,
    sampler: str = "gbm",
    hist_bars=None,
    block_len: int = 10,
    heston=None,
) -> pathsim.PathStats:
    """Grid sweep of the engine-gated multi-trade lifecycle: each block's
    paths and per-bar tie coins are generated ONCE and every configuration
    replays the full lifecycle against them (common random numbers), so grid
    points differ only by their parameters.  ``gate`` may be [G]-batched to
    carry gate knobs (touch_limit, q_min_prob, cooldown…) on the grid axis —
    the engine's decision surface, not just the barrier scaffold
    (``grid_params_gated`` builds the cartesian pair)."""
    from ..sim import gatedpath

    if gate is None:
        gate = gatedpath.GateConfig.default()
    if num_paths % block_paths != 0 or num_paths < block_paths:
        raise ValueError(
            f"num_paths ({num_paths}) must be a positive multiple of "
            f"block_paths ({block_paths})")
    n_blocks = num_paths // block_paths
    g = jax.tree_util.tree_leaves(grid)[0].shape[0]
    gate_g = _broadcast_gate(gate, g)

    def body(carry, b):
        bkey = prng.key_for(key, prng.STREAM_PATH, b)
        paths = pathsim.sample_block(
            bkey, block_paths=block_paths, num_bars=num_bars, s0=s0, mu=mu,
            sigma=sigma, dt=dt, sampler=sampler, hist_bars=hist_bars,
            antithetic=False, block_len=block_len, heston=heston)
        tie = jax.random.uniform(
            prng.key_for(bkey, prng.STREAM_TIE_COIN),
            (block_paths, num_bars), jnp.float32,
        )

        def per_cfg(p, gt):
            out = gatedpath.gated_path_replay(paths, levels, p, gt, tie)
            return pathsim.PathStats.from_lifecycle(
                equity=out.equity, trades=out.trades, wins=out.wins,
                losses=out.losses, open_at_end=out.open_at_end,
                max_dd=out.max_dd,
            )

        stats = jax.vmap(per_cfg)(grid, gate_g)
        return carry.merge(stats), None

    zero = jax.vmap(
        lambda _: pathsim.PathStats.zero(pathsim.LIFE_HIST_LO, pathsim.LIFE_HIST_HI)
    )(jnp.arange(jax.tree_util.tree_leaves(grid)[0].shape[0]))
    out, _ = jax.lax.scan(body, zero, jnp.arange(n_blocks, dtype=jnp.uint32))
    return out


def sharded_sweep(
    mesh: Mesh,
    key,
    levels: Levels,
    grid: EngineParams,
    *,
    num_paths: int,
    num_bars: int = 40,
    s0=100.0,
    sigma: float = 0.15,
    block_paths: int = 1 << 14,
    axis: str = "paths",
) -> pathsim.PathStats:
    """Grid sweep with the path axis sharded over the mesh (pod-scale shape)."""
    from jax import shard_map

    n_dev = mesh.shape[axis]
    if num_paths % (n_dev * block_paths) != 0:
        raise ValueError("num_paths must divide devices × block_paths")
    per_dev = num_paths // n_dev

    @partial(shard_map, mesh=mesh, in_specs=(P(axis),), out_specs=P(),
             check_vma=False)
    def run(dev_idx):
        dkey = prng.key_for(key, prng.STREAM_PATH, dev_idx[0])
        local = sweep_paths(
            dkey, levels, grid, num_paths=per_dev, num_bars=num_bars,
            s0=s0, sigma=sigma, block_paths=block_paths,
        )
        merged = jax.tree_util.tree_map(lambda x: jax.lax.psum(x, axis), local)
        return merged.replace(
            min_r=jax.lax.pmin(local.min_r, axis),
            max_r=jax.lax.pmax(local.max_r, axis),
            max_dd=jax.lax.pmax(local.max_dd, axis),
        )

    idx = jax.device_put(
        jnp.arange(n_dev, dtype=jnp.uint32), NamedSharding(mesh, P(axis))
    )
    return run(idx)
