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
                 gate, engine=False, sampler="gbm", hist_bars=None,
                 block_len=10, heston=None) -> str:
    """Run-config hash stored in mc_state.json: resuming with different flags
    (engine vs gated vs first-contact, gate knobs, shapes, seed) is refused
    instead of silently merging incompatible stats."""
    gd = None
    if gate is not None:
        gd = {k: float(np.asarray(v)) for k, v in sorted(gate.__dict__.items())}
    d = {
        "key": np.asarray(jax.random.key_data(key)).tolist(),
        "num_paths": int(num_paths), "num_bars": int(num_bars),
        "s0": float(s0), "sigma": float(sigma), "dt": float(dt),
        "block_paths": int(block_paths), "gate": gd,
    }
    if engine:   # only when set, so pre-engine checkpoints keep their hash
        d["engine"] = True
    if sampler != "gbm":   # same back-compat rule for pre-sampler checkpoints
        d["sampler"] = sampler
        if hist_bars is not None:
            # the recorded history IS part of the run's identity: resuming a
            # bootstrap run against different bars would merge incompatible
            # stats silently
            h = hashlib.sha256()
            for f in ("open", "high", "low", "close", "volume"):
                v = getattr(hist_bars, f, None)
                if v is not None:
                    h.update(np.ascontiguousarray(
                        np.asarray(v, np.float32)).tobytes())
            d["hist_sha"] = h.hexdigest()[:16]
        if sampler == "block_bootstrap":
            d["block_len"] = int(block_len)
        if sampler == "heston":
            d["heston"] = {k: float(v)
                           for k, v in sorted((heston or {}).items())}
    blob = json.dumps(d, sort_keys=True)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def _save(ckpt_dir: str, stats: pathsim.PathStats, next_block: int,
          total_blocks: int, config: str, extras: dict | None = None) -> None:
    os.makedirs(ckpt_dir, exist_ok=True)
    tmp = os.path.join(ckpt_dir, STATS_FILE + ".tmp.npz")
    payload = {k: np.asarray(v) for k, v in stats.__dict__.items()}
    for k, v in (extras or {}).items():
        payload["aux_" + k] = np.asarray(v)
    np.savez(tmp[:-4], **payload)
    os.replace(tmp, os.path.join(ckpt_dir, STATS_FILE))
    with open(os.path.join(ckpt_dir, STATE_FILE + ".tmp"), "w") as f:
        json.dump({"next_block": next_block, "total_blocks": total_blocks,
                   "config": config}, f)
    os.replace(os.path.join(ckpt_dir, STATE_FILE + ".tmp"),
               os.path.join(ckpt_dir, STATE_FILE))


def _load(ckpt_dir: str, config: str, aux_keys: tuple = ()
          ) -> tuple[pathsim.PathStats, dict, int] | None:
    """Load a checkpoint; None when absent or from an incompatible schema
    (missing/extra fields start a fresh run instead of crashing); ValueError
    when the run config differs from the checkpoint's.  ``aux_keys`` names
    non-PathStats arrays the run persists alongside (engine skip table /
    escalation count)."""
    try:
        with open(os.path.join(ckpt_dir, STATE_FILE)) as f:
            state = json.load(f)
    except (OSError, json.JSONDecodeError):
        return None
    # refuse a DIFFERENT run config before any schema leniency: a mismatched
    # run must neither merge into nor silently overwrite the checkpoint
    saved = state.get("config")
    if saved is not None and saved != config:
        raise ValueError(
            f"checkpoint in {ckpt_dir!r} was written by a different run "
            f"config (saved {saved}, current {config}); refusing to resume — "
            "use a fresh --ckpt-dir or rerun with the original flags"
        )
    try:
        z = np.load(os.path.join(ckpt_dir, STATS_FILE))
        expected = {f.name for f in dataclasses.fields(pathsim.PathStats)}
        expected |= {"aux_" + k for k in aux_keys}
        if set(z.files) != expected:
            return None
        static = {"hist_lo", "hist_hi"}  # non-pytree metadata: plain floats
        stats = pathsim.PathStats(
            **{k: jnp.asarray(z[k]) for k in z.files
               if k not in static and not k.startswith("aux_")},
            **{k: float(z[k]) for k in static},
        )
        extras = {k: jnp.asarray(z["aux_" + k]) for k in aux_keys}
    except (OSError, KeyError, ValueError, TypeError):
        return None
    return stats, extras, int(state["next_block"])


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
    engine: bool = False,                   # FULL 12-gate engine lifecycle
    sampler: str = "gbm",                   # | bootstrap | block_bootstrap
    hist_bars=None,                         #   | heston (any sim sampler)
    block_len: int = 10,
    heston=None,
    fail_after_chunks: int | None = None,   # fault injection for tests
):
    """Run (or resume) a chunked MC; checkpoint after every chunk.

    Pass ``gate`` (sim.gatedpath.GateConfig) to run the engine-gated
    multi-trade lifecycle, or ``engine=True`` to run the FULL 12-gate engine
    (sim/enginepath.py) instead of first-contact replay — same watermark
    semantics, since every accumulator merges associatively and every block's
    RNG is keyed by its global index.  Engine runs return
    (PathStats, skip_counts, escalations) and persist the skip table +
    escalation count in the checkpoint; others return PathStats."""
    if num_paths % block_paths != 0:
        raise ValueError("num_paths must be a multiple of block_paths")
    if engine and gate is not None:
        raise ValueError("pass either gate= (gated lifecycle) or engine=True")
    total_blocks = num_paths // block_paths

    if engine:
        from .enginepath import SKIP_REASONS, _one_block_engine
        one_block = _one_block_engine
        aux_keys = ("skips", "escal")
    elif gate is not None:
        from functools import partial

        from .gatedpath import _one_block_gated
        one_block = partial(_one_block_gated, gate=gate)
        aux_keys = ()
    else:
        one_block = pathsim._one_block
        aux_keys = ()

    config = _fingerprint(
        key, num_paths=num_paths, num_bars=num_bars, s0=s0, sigma=sigma,
        dt=dt, block_paths=block_paths, gate=gate, engine=engine,
        sampler=sampler, hist_bars=hist_bars, block_len=block_len,
        heston=heston,
    )
    if engine or gate is not None:
        zero = pathsim.PathStats.zero(pathsim.LIFE_HIST_LO, pathsim.LIFE_HIST_HI)
    else:
        zero = pathsim.PathStats.zero()
    extras = ({"skips": jnp.zeros((len(SKIP_REASONS),), jnp.float32),
               "escal": jnp.zeros((), jnp.int32)} if engine else {})
    resumed = _load(ckpt_dir, config, aux_keys)
    if resumed is not None:
        stats, extras, next_block = resumed
        if next_block > total_blocks:
            raise ValueError("checkpoint belongs to a larger run")
    else:
        stats, next_block = zero, 0

    def _merge(stats, extras, out):
        if engine:
            st, sk, es = out[:3]
            return stats.merge(st), {"skips": extras["skips"] + sk,
                                     "escal": extras["escal"] + es}
        return stats.merge(out), extras

    @jax.jit
    def chunk(start, stats, extras):
        def body(c, i):
            out = one_block(
                key, (start + i).astype(jnp.uint32),
                levels=levels, params=params, block_paths=block_paths,
                num_bars=num_bars, s0=s0, mu=0.0, sigma=sigma, dt=dt,
                sampler=sampler, hist_bars=hist_bars, antithetic=False,
                block_len=block_len, heston=heston,
            )
            return _merge(c[0], c[1], out), None

        out, _ = jax.lax.scan(body, (stats, extras),
                              jnp.arange(blocks_per_chunk, dtype=jnp.uint32))
        return out

    chunks_done = 0
    while next_block < total_blocks:
        n = min(blocks_per_chunk, total_blocks - next_block)
        if n == blocks_per_chunk:
            stats, extras = chunk(jnp.uint32(next_block), stats, extras)
        else:  # ragged tail
            for i in range(n):
                out = one_block(
                    key, np.uint32(next_block + i),
                    levels=levels, params=params, block_paths=block_paths,
                    num_bars=num_bars, s0=s0, mu=0.0, sigma=sigma, dt=dt,
                    sampler="gbm", hist_bars=None, antithetic=False,
                )
                stats, extras = _merge(stats, extras, out)
        next_block += n
        jax.block_until_ready(stats.sum_r)
        _save(ckpt_dir, stats, next_block, total_blocks, config,
              extras if engine else None)
        chunks_done += 1
        if fail_after_chunks is not None and chunks_done >= fail_after_chunks \
                and next_block < total_blocks:
            raise RuntimeError(f"injected failure after {chunks_done} chunks")
    if engine:
        return stats, extras["skips"], extras["escal"]
    return stats
