"""Checkpointed, resumable Monte Carlo runs (failure detection / elastic recovery).

The reference absorbs failures with blanket try/except + sleep (qmmx_monolithic.py:
3192-3195) and has no notion of resuming long work.  Pod-scale sweeps need one:
this runner splits a large path budget into *chunks* of blocks, persists the
merged ``PathStats`` + a block watermark after each chunk (the same exactly-once
watermark pattern as the SQLite training store, ref :3758/:3800), and resumes
from the watermark after a crash.  Because every block's RNG is keyed by its
global block index, a resumed run is **bitwise identical** to an uninterrupted
one.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineParams
from ..types import Levels
from . import pathsim

STATE_FILE = "mc_state.json"
STATS_FILE = "mc_stats.npz"


def _fingerprint(key, *, num_paths, num_bars, s0, sigma, dt, block_paths,
                 gate) -> str:
    """Run-config hash stored in mc_state.json: resuming with different flags
    (gated vs first-contact, gate knobs, shapes, seed) is refused instead of
    silently merging incompatible stats."""
    gd = None
    if gate is not None:
        gd = {k: float(np.asarray(v)) for k, v in sorted(gate.__dict__.items())}
    blob = json.dumps({
        "key": np.asarray(jax.random.key_data(key)).tolist(),
        "num_paths": int(num_paths), "num_bars": int(num_bars),
        "s0": float(s0), "sigma": float(sigma), "dt": float(dt),
        "block_paths": int(block_paths), "gate": gd,
    }, sort_keys=True)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def _save(ckpt_dir: str, stats: pathsim.PathStats, next_block: int,
          total_blocks: int, config: str) -> None:
    os.makedirs(ckpt_dir, exist_ok=True)
    tmp = os.path.join(ckpt_dir, STATS_FILE + ".tmp.npz")
    np.savez(tmp[:-4], **{k: np.asarray(v) for k, v in stats.__dict__.items()})
    os.replace(tmp, os.path.join(ckpt_dir, STATS_FILE))
    with open(os.path.join(ckpt_dir, STATE_FILE + ".tmp"), "w") as f:
        json.dump({"next_block": next_block, "total_blocks": total_blocks,
                   "config": config}, f)
    os.replace(os.path.join(ckpt_dir, STATE_FILE + ".tmp"),
               os.path.join(ckpt_dir, STATE_FILE))


def _load(ckpt_dir: str, config: str) -> tuple[pathsim.PathStats, int] | None:
    """Load a checkpoint; None when absent or from an incompatible PathStats
    schema (missing/extra fields start a fresh run instead of crashing);
    ValueError when the run config differs from the checkpoint's."""
    try:
        with open(os.path.join(ckpt_dir, STATE_FILE)) as f:
            state = json.load(f)
        z = np.load(os.path.join(ckpt_dir, STATS_FILE))
        expected = {f.name for f in dataclasses.fields(pathsim.PathStats)}
        if set(z.files) != expected:
            return None
        static = {"hist_lo", "hist_hi"}  # non-pytree metadata: plain floats
        stats = pathsim.PathStats(
            **{k: jnp.asarray(z[k]) for k in z.files if k not in static},
            **{k: float(z[k]) for k in static},
        )
    except (OSError, KeyError, ValueError, TypeError, json.JSONDecodeError):
        return None
    saved = state.get("config")
    if saved is not None and saved != config:
        raise ValueError(
            f"checkpoint in {ckpt_dir!r} was written by a different run "
            f"config (saved {saved}, current {config}); refusing to resume — "
            "use a fresh --ckpt-dir or rerun with the original flags"
        )
    return stats, int(state["next_block"])


def run_resumable(
    key,
    levels: Levels,
    params: EngineParams,
    *,
    num_paths: int,
    ckpt_dir: str,
    num_bars: int = 40,
    s0=100.0,
    sigma: float = 0.15,
    dt: float = 1.0 / (390.0 * 252.0),
    block_paths: int = 1 << 14,
    blocks_per_chunk: int = 8,
    gate=None,                              # GateConfig → gated lifecycle MC
    fail_after_chunks: int | None = None,   # fault injection for tests
) -> pathsim.PathStats:
    """Run (or resume) a chunked MC; checkpoint after every chunk.

    Pass ``gate`` (sim.gatedpath.GateConfig) to run the engine-gated
    multi-trade lifecycle instead of first-contact replay — same watermark
    semantics, since both accumulators merge associatively and every block's
    RNG is keyed by its global index."""
    if num_paths % block_paths != 0:
        raise ValueError("num_paths must be a multiple of block_paths")
    total_blocks = num_paths // block_paths

    if gate is not None:
        from functools import partial

        from .gatedpath import _one_block_gated
        one_block = partial(_one_block_gated, gate=gate)
    else:
        one_block = pathsim._one_block

    config = _fingerprint(
        key, num_paths=num_paths, num_bars=num_bars, s0=s0, sigma=sigma,
        dt=dt, block_paths=block_paths, gate=gate,
    )
    if gate is not None:
        zero = pathsim.PathStats.zero(pathsim.LIFE_HIST_LO, pathsim.LIFE_HIST_HI)
    else:
        zero = pathsim.PathStats.zero()
    resumed = _load(ckpt_dir, config)
    if resumed is not None:
        stats, next_block = resumed
        if next_block > total_blocks:
            raise ValueError("checkpoint belongs to a larger run")
    else:
        stats, next_block = zero, 0

    @jax.jit
    def chunk(start, carry):
        def body(c, i):
            st = one_block(
                key, (start + i).astype(jnp.uint32),
                levels=levels, params=params, block_paths=block_paths,
                num_bars=num_bars, s0=s0, mu=0.0, sigma=sigma, dt=dt,
                sampler="gbm", hist_bars=None, antithetic=False,
            )
            return c.merge(st), None

        out, _ = jax.lax.scan(body, carry,
                              jnp.arange(blocks_per_chunk, dtype=jnp.uint32))
        return out

    chunks_done = 0
    while next_block < total_blocks:
        n = min(blocks_per_chunk, total_blocks - next_block)
        if n == blocks_per_chunk:
            stats = chunk(jnp.uint32(next_block), stats)
        else:  # ragged tail
            for i in range(n):
                st = one_block(
                    key, np.uint32(next_block + i),
                    levels=levels, params=params, block_paths=block_paths,
                    num_bars=num_bars, s0=s0, mu=0.0, sigma=sigma, dt=dt,
                    sampler="gbm", hist_bars=None, antithetic=False,
                )
                stats = stats.merge(st)
        next_block += n
        jax.block_until_ready(stats.sum_r)
        _save(ckpt_dir, stats, next_block, total_blocks, config)
        chunks_done += 1
        if fail_after_chunks is not None and chunks_done >= fail_after_chunks \
                and next_block < total_blocks:
            raise RuntimeError(f"injected failure after {chunks_done} chunks")
    return stats
