"""Multi-symbol universe runs: per-symbol MC + batched policy refresh.

BASELINE config #4: "100-symbol universe × 1M paths with per-symbol batched LR
policy refresh".  Each symbol has its own level set, spot and vol; paths vmap
within a device and shard across a 2-D (paths × symbols) mesh:

* ``universe_mc`` — vmapped generated-path MC per symbol (shared EngineParams,
  per-symbol Levels/s0/sigma), PathStats batched over the symbol axis;
* ``sharded_universe`` — the same with the symbol axis laid out over the mesh's
  ``symbols`` dimension and the per-symbol path blocks over ``paths``;
* ``universe_policy_refresh`` — per-symbol IRLS logistic refresh
  (models.logistic.fit_batched) with the symbol batch sharded over the mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import EngineParams
from ..models import logistic as L
from ..sim import pathsim
from ..types import Levels
from ..utils import prng


def stack_levels(level_rows_per_symbol: list[list[dict]], max_levels: int = 16) -> Levels:
    """Host helper: [S] lists of level dicts → Levels batched on a leading axis."""
    built = [Levels.from_rows(rows, max_levels=max_levels)
             for rows in level_rows_per_symbol]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *built)


@partial(jax.jit, static_argnames=("paths_per_symbol", "num_bars", "block_paths"))
def universe_mc(
    key,
    levels: Levels,           # batched [S, L]
    params: EngineParams,     # shared scalars
    s0,                       # f32[S]
    sigma,                    # f32[S]
    *,
    paths_per_symbol: int,
    num_bars: int = 40,
    dt: float = 1.0 / (390.0 * 252.0),
    block_paths: int = 1 << 14,
    gate=None,                # GateConfig → per-symbol gated lifecycle MC
) -> pathsim.PathStats:
    """[S]-batched PathStats, one independent MC per symbol (first-contact
    replay, or the engine-gated multi-trade lifecycle when ``gate`` is set).

    Loop order is scan-over-blocks OUTER, vmap-over-symbols INNER: one scan body
    containing a single [S]-batched block compiles in O(1) of the symbol count
    (the reverse nesting traces the scan once per vmapped symbol and compiles
    ~S× slower for wide universes)."""
    n_blocks = paths_per_symbol // block_paths
    s = jax.tree_util.tree_leaves(levels)[0].shape[0]
    sym_idx = jnp.arange(s, dtype=jnp.uint32)
    s0 = jnp.asarray(s0, jnp.float32)
    sigma = jnp.asarray(sigma, jnp.float32)

    if gate is not None:
        from ..sim.gatedpath import _one_block_gated
        one_block = partial(_one_block_gated, gate=gate)
        hist_range = (pathsim.LIFE_HIST_LO, pathsim.LIFE_HIST_HI)
    else:
        one_block = pathsim._one_block
        hist_range = (pathsim.HIST_LO, pathsim.HIST_HI)

    def one_block_all_symbols(b):
        def per_symbol(si, lv, s0s, sgs):
            skey = prng.key_for(key, prng.STREAM_PATH, si)
            return one_block(
                skey, b, levels=lv, params=params, block_paths=block_paths,
                num_bars=num_bars, s0=s0s, mu=0.0, sigma=sgs, dt=dt,
                sampler="gbm", hist_bars=None, antithetic=False,
            )

        return jax.vmap(per_symbol)(sym_idx, levels, s0, sigma)

    def body(carry, b):
        return carry.merge(one_block_all_symbols(b)), None

    zero = jax.vmap(lambda _: pathsim.PathStats.zero(*hist_range))(sym_idx)
    out, _ = jax.lax.scan(body, zero, jnp.arange(n_blocks, dtype=jnp.uint32))
    return out


def sharded_universe(
    mesh: Mesh,
    key,
    levels: Levels,
    params: EngineParams,
    s0,
    sigma,
    *,
    paths_per_symbol: int,
    num_bars: int = 40,
    block_paths: int = 1 << 12,
    symbols_axis: str = "symbols",
    gate=None,
) -> pathsim.PathStats:
    """Symbol axis sharded over the mesh; each shard runs its symbols locally."""
    sym_sharding = NamedSharding(mesh, P(symbols_axis))
    levels = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(symbols_axis))), levels
    )
    s0 = jax.device_put(jnp.asarray(s0, jnp.float32), sym_sharding)
    sigma = jax.device_put(jnp.asarray(sigma, jnp.float32), sym_sharding)
    return universe_mc(
        key, levels, params, s0, sigma,
        paths_per_symbol=paths_per_symbol, num_bars=num_bars,
        block_paths=block_paths, gate=gate,
    )


def universe_policy_refresh(mesh: Mesh | None, xs, ys, weights=None, *,
                            max_iter: int = 30,
                            symbols_axis: str = "symbols") -> L.LRModel:
    """Per-symbol batched LR refresh; xs [S, N, D], ys [S, N], optional 0/1
    weights padding symbols with fewer samples.  With a mesh, the symbol axis is
    sharded; XLA partitions the vmapped Newton solve with no communication."""
    xs = jnp.asarray(xs)
    ys = jnp.asarray(ys)
    if weights is None:
        weights = jnp.ones(ys.shape, xs.dtype)
    if mesh is not None:
        sh = NamedSharding(mesh, P(symbols_axis))
        xs = jax.device_put(xs, sh)
        ys = jax.device_put(ys, sh)
        weights = jax.device_put(jnp.asarray(weights, xs.dtype), sh)
    return L.fit_batched(xs, ys, weights, max_iter=max_iter)
