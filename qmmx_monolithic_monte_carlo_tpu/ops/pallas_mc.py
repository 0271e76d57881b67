"""Fused Monte Carlo path kernel (Pallas/TPU): generate → replay → reduce in VMEM.

The pure-XLA pipeline (sim/pathsim.py) materializes each path block's OHLC
arrays in HBM between the sampler and the replay.  This kernel fuses the whole
path lifecycle on-chip:

  per grid step (one path block of B lanes × W bars):
    1. seed the per-core PRNG from (seed, block_id); draw uniforms with
       ``pltpu.prng_random_bits`` and form normals via Box-Muller — no RNG
       state ever touches HBM;
    2. log-price cumsum as a lower-triangular (W×W) matmul on the MXU
       (a 40×40×B contraction beats a serial scan for the cumsum);
    3. Brownian-bridge bar extremes from two more uniform draws;
    4. unrolled nearest-level pass (≤8 levels), first-contact detection via the
       min-iota trick (reductions over the sublane axis only);
    5. stop/target first-hit with the distance-weighted same-bar coin flip
       (qmmx_monolithic.py:3467-3480 semantics);
    6. block-local reduction into a (8, 128) accumulator: scalar sums row,
       64-bin R histogram row, running min-R / max-R rows (sequential grid).

The pipeline body is shared by three kernels that differ only in where their
parameters come from and how the accumulator is indexed:

* ``_mc_kernel``        — one (levels, s0, sigma) configuration;
* ``_universe_kernel``  — per-symbol s0/sigma/levels slabs, (symbol, block) grid;
* ``_sweep_kernel``     — one path block replayed against a whole stop/target
                          grid with common random numbers.

Host-side, the per-block rows unpack into the same ``PathStats`` accumulator
the XLA pipeline produces — including min_r/max_r — so the two backends are
drop-in interchangeable (cross-checked in tests via interpret mode on CPU and
statistically on TPU).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import EngineParams
from ..sim.pathsim import (
    HIST_BINS,
    HIST_HI,
    HIST_LO,
    LIFE_HIST_HI,
    LIFE_HIST_LO,
    PathStats,
)
from ..types import Levels

LANES = 2048         # paths per block (lane axis, multiple of 128) for the
                     # universe/sweep kernels, whose G/S-batched accumulators
                     # need the VMEM headroom.  The single-config kernel takes
                     # a per-call ``lanes`` width instead (default
                     # SINGLE_LANES): re-swept round 2 on v5e after the
                     # pipeline dedupe — 2048→264M, 4096→277M, 8192→283M
                     # paths/s — 8192 wins ~7% and fits comfortably
                     # (~10 MB of (W, 8192) f32 live arrays).
SINGLE_LANES = 8192

# accumulator row layout (rows of the (…, 8, 128) output block)
ROW_SUM = 0          # lanes [n, entered, tp, stop, open, sum_r, sum_r2] — '+' combine
ROW_HIST = 1         # 64-bin R histogram — '+' combine
ROW_MIN = 2          # running min R over entered paths — 'min' combine
ROW_MAX = 3          # running max R — 'max' combine

_TWO_PI = 6.283185307179586
_BIG = 3.4e38        # f32-max sentinel (Mosaic handles ±inf poorly in minimum chains)


def _uniform(shape):
    """U(0,1) in (0,1): top 24 bits of the PRNG stream."""
    bits = pltpu.prng_random_bits(shape)
    # keep the int32 domain: Mosaic lacks a uint32->f32 cast; a logical shift by 8
    # leaves 24 bits, which int32 represents exactly
    u24 = jax.lax.shift_right_logical(
        pltpu.bitcast(bits, jnp.int32), jnp.int32(8)
    )
    return u24.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24)) + jnp.float32(1e-12)


class _Bars(NamedTuple):
    """One block of generated GBM bars, (W, B) each."""

    opens: jnp.ndarray
    close: jnp.ndarray
    high: jnp.ndarray
    low: jnp.ndarray


class _Contact(NamedTuple):
    """First level contact per lane; per-lane rows are (1, B) — Mosaic cannot
    reshape/broadcast i1 vectors, so 1-D bool intermediates are avoided."""

    entered: jnp.ndarray   # (1, B) bool
    we: jnp.ndarray        # (1, B) f32 entered weight
    entry: jnp.ndarray     # (1, B) entry price
    lvl: jnp.ndarray       # (1, B) contacted level price
    is_long: jnp.ndarray   # (1, B) bool
    after: jnp.ndarray     # (W, B) bars strictly after the entry bar
    iota_w: jnp.ndarray    # (W, B) bar-index iota


class _Replay(NamedTuple):
    """One stop/target configuration replayed over a contacted block."""

    r: jnp.ndarray         # (1, B) R outcome, zeroed on non-entered lanes
    is_tp: jnp.ndarray     # (1, B) bool
    is_stop: jnp.ndarray
    is_open: jnp.ndarray
    blk_min: jnp.ndarray   # scalar min R over entered lanes (_BIG if none)
    blk_max: jnp.ndarray   # scalar max R over entered lanes (-_BIG if none)


def bm_pair(u1, u2):
    """Paired Box-Muller: (r·cos a, r·sin a) for a = 2π·u2, r = √(−2 ln u1).

    Round-5 negative result, measured and REJECTED: replacing the sin branch
    with sign(sin)·√(1−cos²) — motivated by benchmarks/vpu_roofline.py
    showing a STANDALONE cos/sin chain costs ~20-26 mul-equivalents while
    exp/log cost 1.2-1.6 — made the flagship kernel 2.5% SLOWER (335.1M →
    326.5/326.8M paths/s, 3 bench.py reps).  Mosaic evidently shares the
    range reduction/polynomial pipeline between sin and cos of the SAME
    angle, so the second branch is nearly free and the swap only added a
    sqrt+select to the critical path.  The roofline's single-op trig cost
    does NOT compose additively for sincos pairs — priced per-pair, trig is
    ~13 mul-equivalents for BOTH normals, not 50."""
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    a = _TWO_PI * u2
    return r * jnp.cos(a), r * jnp.sin(a)


def _gbm_block(draw: Callable, *, w: int, b: int, drift, sig_dt, log_s0,
               antithetic: bool = False) -> _Bars:
    """Stages 1-3: Box-Muller normals → MXU-cumsum GBM closes → bridge extremes.

    Both Box-Muller branches are used — draws 0/1 are (w//2, b) uniforms and
    each (u1, u2) pair yields TWO normals via ``bm_pair``, halving the
    ln/sqrt transcendental count of increment generation (+12% kernel
    throughput on v5e round 2; the sin→sqrt swap inside bm_pair is round 5).
    ``drift``/``sig_dt``/``log_s0`` may be Python floats (static
    config) or traced scalars (per-symbol slabs)."""
    u1 = draw(0)                       # (w//2, b)
    u2 = draw(1)
    z1, z2 = bm_pair(u1, u2)
    z = jnp.concatenate([z1, z2], axis=0)   # (w, b)
    if antithetic:
        # lane-paired sign-flip (ops/pathgen.gbm_paths antithetic analog);
        # the right half-lanes' z draws are consumed-but-unused, so the
        # stream layout matches the plain run (CRN alignment)
        zh = z[:, :b // 2]
        z = jnp.concatenate([zh, -zh], axis=1)
    incr = jnp.float32(1.0) * drift + sig_dt * z
    row = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
    tril = (col <= row).astype(jnp.float32)
    log_rel = jnp.dot(tril, incr, preferred_element_type=jnp.float32)  # cumsum
    log_close = log_s0 + log_rel
    log_open = log_close - incr
    close = jnp.exp(log_close)
    opens = jnp.exp(log_open)

    u3 = draw(2)
    u4 = draw(3)
    sig2dt = sig_dt * sig_dt
    d2 = (log_close - log_open) ** 2
    high = jnp.exp(0.5 * (log_open + log_close + jnp.sqrt(d2 - 2.0 * sig2dt * jnp.log(u3))))
    low = jnp.exp(0.5 * (log_open + log_close - jnp.sqrt(d2 - 2.0 * sig2dt * jnp.log(u4))))
    return _Bars(opens=opens, close=close, high=high, low=low)


def _heston_block(draw, draw_q, *, w: int, b: int, hes, log_s0) -> _Bars:
    """Heston stochastic-vol bars in block form (ops/pathgen.heston_paths
    mirror; full-truncation Euler).  The variance chain is the ONLY serial
    part — price shocks z and vol shocks zq are drawn up front as paired
    Box-Muller blocks, the v_t recursion walks (1, b) rows, and the
    log-price cumsum still rides the MXU tril matmul like `_gbm_block`
    (the increments are elementwise once each bar's sigma row is known).
    Bridge extremes use each bar's LOCAL variance ``v_pos·dt``."""
    h_v0, h_kap, h_th, h_xi, h_rho, h_mu, h_dt = [float(x) for x in hes]
    rho_perp = float(np.sqrt(max(0.0, 1.0 - h_rho * h_rho)))
    u1 = draw(0)                       # (w//2, b)
    u2 = draw(1)
    radius = jnp.sqrt(-2.0 * jnp.log(u1))
    angle = _TWO_PI * u2
    z = jnp.concatenate([radius * jnp.cos(angle), radius * jnp.sin(angle)],
                        axis=0)        # (w, b)
    uq1 = draw_q(0)
    uq2 = draw_q(1)
    qrad = jnp.sqrt(-2.0 * jnp.log(uq1))
    qang = _TWO_PI * uq2
    zq = jnp.concatenate([qrad * jnp.cos(qang), qrad * jnp.sin(qang)], axis=0)
    z2 = jnp.float32(h_rho) * z + jnp.float32(rho_perp) * zq  # vol shock

    dtf = jnp.float32(h_dt)
    v = jnp.full((1, b), jnp.float32(h_v0), jnp.float32)
    incr_rows = []
    sig2_rows = []
    for t in range(w):
        v_pos = jnp.maximum(v, 0.0)
        sig_bar = jnp.sqrt(v_pos * dtf)
        incr_rows.append((jnp.float32(h_mu) - 0.5 * v_pos) * dtf
                         + sig_bar * z[t:t + 1])
        sig2_rows.append(v_pos * dtf)
        v = (v + jnp.float32(h_kap) * (jnp.float32(h_th) - v_pos) * dtf
             + jnp.float32(h_xi) * sig_bar * z2[t:t + 1])
    incr = jnp.concatenate(incr_rows, axis=0)       # (w, b)
    sig2dt = jnp.concatenate(sig2_rows, axis=0)     # per-bar local variance

    row = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
    tril = (col <= row).astype(jnp.float32)
    log_rel = jnp.dot(tril, incr, preferred_element_type=jnp.float32)
    log_close = log_s0 + log_rel
    log_open = log_close - incr

    u3 = draw(2)
    u4 = draw(3)
    d2 = (log_close - log_open) ** 2
    high = jnp.exp(0.5 * (log_open + log_close
                          + jnp.sqrt(d2 - 2.0 * sig2dt * jnp.log(u3))))
    low = jnp.exp(0.5 * (log_open + log_close
                         - jnp.sqrt(d2 - 2.0 * sig2dt * jnp.log(u4))))
    return _Bars(opens=jnp.exp(log_open), close=jnp.exp(log_close),
                 high=high, low=low)


def _bootstrap_block(draw_idx, hist_row, *, w: int, b: int, hist_len: int,
                     log_s0, block_len: int = 0) -> _Bars:
    """Recorded-bar resampling (the reference MC walks recorded bars,
    qmmx_monolithic.py:3353-3538; scaled analog ops/pathgen.bootstrap_paths):
    one uniform per (path, bar) → ``idx = floor(u·H)``; the four
    relative-geometry channels gather by per-lane ``take_along_axis`` over
    lane-tiled tables; the log-return cumsum rides the MXU tril matmul like
    the GBM block.  ``hist_row(ch, off, width)`` yields a (1, width) slice of
    channel ``ch``'s padded table."""
    u = draw_idx()                              # (w, b)
    hf = jnp.float32(hist_len)
    if block_len:
        # contiguous block_len-bar runs (block_bootstrap_paths): bar j's
        # index = start-of-its-block + offset; the block structure is static
        # here, so starts are just row-sliced from the uniform block
        bl = jnp.float32(block_len)
        starts = jnp.minimum(jnp.floor(u * (hf - bl)), hf - bl - 1.0)
        rows = []
        for j in range(w):
            k = (j // block_len) * block_len
            rows.append(starts[k:k + 1] + jnp.float32(j - k))
        idx_f = jnp.concatenate(rows, axis=0)
    else:
        idx_f = jnp.minimum(jnp.floor(u * hf), hf - 1.0)
    idx = idx_f.astype(jnp.int32)
    h_tiles = -(-hist_len // 128)

    def gather(ch):
        # Mosaic dynamic_gather wants a one-vreg-wide source along the lane
        # axis: gather every (w, 128) index chunk from every (w, 128) table
        # chunk, then concatenate the lane chunks back
        cols = []
        for j in range(b // 128):
            idx_j = idx[:, 128 * j:128 * (j + 1)]
            acc = jnp.zeros((w, 128), jnp.float32)
            for ti in range(h_tiles):
                tab = jnp.broadcast_to(hist_row(ch, ti * 128, 128), (w, 128))
                local = idx_j - jnp.int32(ti * 128)
                in_r = jnp.logical_and(local >= 0, local < 128)
                li = jnp.clip(local, 0, 127)
                g = jnp.take_along_axis(tab, li, axis=1)
                acc = acc + g * in_r.astype(jnp.float32)
            cols.append(acc)
        return jnp.concatenate(cols, axis=1) if len(cols) > 1 else cols[0]

    logc = gather(0)
    row = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
    tril = (col <= row).astype(jnp.float32)
    log_rel = jnp.dot(tril, logc, preferred_element_type=jnp.float32)
    log_close = log_s0 + log_rel
    log_prev = log_close - logc
    return _Bars(
        opens=jnp.exp(log_prev + gather(3)),
        close=jnp.exp(log_close),
        high=jnp.exp(log_prev + gather(1)),
        low=jnp.exp(log_prev + gather(2)),
    )


HIST_CHANNELS = 5    # bootstrap tables: logc / logh / logl / logo / volume


def _hist_slab_flat(hist_bars):
    """Bootstrap tables as a (4, h_tiles*128) row slab — the block-form
    first-contact kernels gather with a (1, width) ``hist_row`` slice
    broadcast over bars, so no sublane duplication is needed (volume is
    unused: first-contact replay has no volume gates)."""
    from .pathgen import bootstrap_tables

    tabs = bootstrap_tables(hist_bars.open, hist_bars.high,
                            hist_bars.low, hist_bars.close)
    h = int(tabs[0].shape[0])
    hp = -(-h // 128) * 128
    return jnp.stack([jnp.pad(t, (0, hp - h)) for t in tabs[:4]], axis=0), h


def _hist_slab_flat_batched(hist_bars):
    """Per-symbol recorded histories as an (S, 4, h_tiles*128) slab — one
    ``_hist_slab_flat`` layout per symbol row, indexed by the universe
    kernel's symbol grid axis ([S, H] rectangular histories)."""
    from .pathgen import bootstrap_tables

    o = jnp.asarray(hist_bars.open, jnp.float32)
    if o.ndim != 2:
        raise ValueError("universe bootstrap needs [S, H]-batched hist_bars "
                         "(one recorded history row per symbol)")
    tabs = jax.vmap(bootstrap_tables)(
        o, jnp.asarray(hist_bars.high, jnp.float32),
        jnp.asarray(hist_bars.low, jnp.float32),
        jnp.asarray(hist_bars.close, jnp.float32))
    _n_sym, h = tabs[0].shape
    hp = -(-h // 128) * 128
    return jnp.stack([jnp.pad(t, ((0, 0), (0, hp - h)))
                      for t in tabs[:4]], axis=1), h


def _hist_slab(hist_bars, lanes: int):
    """Stack the bootstrap tables into a (HIST_CHANNELS*8, h_tiles*128) VMEM
    slab: each channel row sublane-broadcast so every (8, 128) chunk is a
    direct ``take_along_axis`` operand (Mosaic dynamic_gather needs a
    one-vreg-wide source along the gather axis)."""
    from .pathgen import bootstrap_tables

    tabs = bootstrap_tables(
        hist_bars.open, hist_bars.high, hist_bars.low, hist_bars.close,
        getattr(hist_bars, "volume", None))
    h = tabs[0].shape[0]
    hp = -(-h // 128) * 128
    rows = [jnp.broadcast_to(jnp.pad(t, (0, hp - h))[None, :], (8, hp))
            for t in tabs]
    return jnp.concatenate(rows, axis=0), h


def _hist_slab_batched(hist_bars, lanes: int):
    """Per-symbol recorded histories as an (S, HIST_CHANNELS*8,
    h_tiles*128) VMEM slab — one ``_hist_slab`` layout per symbol row,
    indexed by the universe kernels' symbol grid axis.  Histories are
    rectangular [S, H]: every symbol resamples its OWN recorded bars over a
    common lookback window (the reference MC replays each symbol's last N
    recorded bars, :3353-3538)."""
    from .pathgen import bootstrap_tables

    o = jnp.asarray(hist_bars.open, jnp.float32)
    if o.ndim != 2:
        raise ValueError("universe bootstrap needs [S, H]-batched hist_bars "
                         "(one recorded history row per symbol)")
    vol = getattr(hist_bars, "volume", None)
    vol = jnp.zeros_like(o) if vol is None else jnp.asarray(vol, jnp.float32)
    tabs = jax.vmap(bootstrap_tables)(
        o, jnp.asarray(hist_bars.high, jnp.float32),
        jnp.asarray(hist_bars.low, jnp.float32),
        jnp.asarray(hist_bars.close, jnp.float32), vol)
    n_sym, h = tabs[0].shape
    hp = -(-h // 128) * 128
    rows = [jnp.broadcast_to(jnp.pad(t, ((0, 0), (0, hp - h)))[:, None, :],
                             (n_sym, 8, hp)) for t in tabs]
    return jnp.concatenate(rows, axis=1), h


def _hist_gather_tiles(get_tile, h_tiles: int, idx_f, *, rows: int):
    """Per-lane gather of lane-tiled history tables at (f32 small-int exact)
    indices ``idx_f`` [rows, lanes].  Mosaic's ``dynamic_gather`` requires
    the SOURCE to span one vreg along the gather (lane) axis, so both the
    table and the index tile are processed in 128-lane chunks: every
    (rows, 128) index chunk gathers from every (rows, 128) table chunk
    (``get_tile(ti)``), range-selected by arithmetic blend, and the outputs
    concatenate back to (rows, lanes)."""
    idx = idx_f.astype(jnp.int32)
    lanes = idx_f.shape[1]
    cols = []
    for j in range(lanes // 128):
        idx_j = idx[:, 128 * j:128 * (j + 1)]
        acc = jnp.zeros((rows, 128), jnp.float32)
        for ti in range(h_tiles):
            local = idx_j - jnp.int32(128 * ti)
            in_r = jnp.logical_and(local >= 0, local < 128)
            li = jnp.clip(local, 0, 127)
            g = jnp.take_along_axis(get_tile(ti), li, axis=1)
            acc = acc + g * in_r.astype(jnp.float32)
        cols.append(acc)
    return jnp.concatenate(cols, axis=1) if len(cols) > 1 else cols[0]


def _first_contact(
    bars: _Bars, get_level: Callable, max_levels: int, prox, *, w: int, b: int
) -> _Contact:
    """Stage 4: unrolled nearest-level pass + first-contact bar via min-iota.
    ``get_level(i) -> (price, valid)`` abstracts the level-slab ref layout."""
    inf = jnp.float32(_BIG)
    best_d = jnp.full((w, b), inf, jnp.float32)
    best_p = jnp.zeros((w, b), jnp.float32)
    for i in range(max_levels):
        lp, lv = get_level(i)
        d = jnp.where(lv > 0, jnp.abs(bars.close - lp), inf)
        take = d < best_d
        best_p = jnp.where(take, lp, best_p)
        best_d = jnp.where(take, d, best_d)
    near = best_d <= prox

    iota_w = jax.lax.broadcasted_iota(jnp.int32, (w, b), 0)
    ebar = jnp.min(jnp.where(near, iota_w, w), axis=0, keepdims=True)   # (1, b)
    entered = ebar < w
    at_entry = iota_w == ebar
    entry = jnp.sum(jnp.where(at_entry, bars.close, 0.0), axis=0, keepdims=True)
    lvl = jnp.sum(jnp.where(at_entry, best_p, 0.0), axis=0, keepdims=True)
    prev = jnp.sum(jnp.where(at_entry, bars.opens, 0.0), axis=0, keepdims=True)
    return _Contact(
        entered=entered,
        we=entered.astype(jnp.float32),
        entry=entry,
        lvl=lvl,
        is_long=entry > prev,
        after=iota_w > ebar,
        iota_w=iota_w,
    )


def _replay_config(
    ct: _Contact, bars: _Bars, stop_pad, tp_pad, tie_u, *, w: int, slips=None
) -> _Replay:
    """Stage 5: stop/target first-hit after the entry bar, same-bar tie broken
    by the distance-weighted coin (qmmx_monolithic.py:3467-3480).  ``slips``
    (execution noise, :3458-3461): optional (stop_slip, target_slip) (1, b)
    offsets applied to the barriers AFTER the level-derived scaffold — the
    caller pre-jitters ct.lvl/ct.entry (:3453-3455)."""
    stop = jnp.where(ct.is_long, ct.lvl - stop_pad, ct.lvl + stop_pad)
    target = jnp.where(ct.is_long, ct.lvl + tp_pad, ct.lvl - tp_pad)
    if slips is not None:
        stop = stop + slips[0]
        target = target + slips[1]

    # NOTE: select over i1 operands lowers to an unsupported i8->i1 trunc in
    # Mosaic; compose hit masks with and/or instead of jnp.where.
    nil = jnp.logical_not(ct.is_long)
    stop_hit = jnp.logical_or(
        jnp.logical_and(ct.is_long, bars.low <= stop),
        jnp.logical_and(nil, bars.high >= stop),
    )
    tgt_hit = jnp.logical_or(
        jnp.logical_and(ct.is_long, bars.high >= target),
        jnp.logical_and(nil, bars.low <= target),
    )
    j_stop = jnp.min(jnp.where(jnp.logical_and(ct.after, stop_hit), ct.iota_w, w),
                     axis=0, keepdims=True)
    j_tgt = jnp.min(jnp.where(jnp.logical_and(ct.after, tgt_hit), ct.iota_w, w),
                    axis=0, keepdims=True)
    none_hit = jnp.logical_and(j_stop >= w, j_tgt >= w)
    j_first = jnp.minimum(j_stop, j_tgt)
    tie = jnp.logical_and(j_stop == j_tgt, jnp.logical_not(none_hit))

    at_hit = ct.iota_w == jnp.minimum(j_first, w - 1)
    hh = jnp.sum(jnp.where(at_hit, bars.high, 0.0), axis=0, keepdims=True)
    ll = jnp.sum(jnp.where(at_hit, bars.low, 0.0), axis=0, keepdims=True)
    up_span = jnp.maximum(0.0, hh - ct.entry)
    dn_span = jnp.maximum(0.0, ct.entry - ll)
    p_tp = up_span / (up_span + dn_span + 1e-9)
    coin_tp = tie_u < p_tp
    target_first = jnp.logical_or(
        jnp.logical_and(tie, coin_tp),
        jnp.logical_and(jnp.logical_not(tie), j_tgt < j_stop),
    )

    risk = jnp.maximum(jnp.abs(ct.entry - stop), 1e-9)
    reward = jnp.abs(target - ct.entry)
    r = jnp.where(none_hit, 0.0, jnp.where(target_first, reward / risk, -1.0))
    r = r * ct.we                                                     # (1, b)

    not_open = jnp.logical_not(none_hit)
    return _Replay(
        r=r,
        is_tp=jnp.logical_and(ct.entered, jnp.logical_and(not_open, target_first)),
        is_stop=jnp.logical_and(
            ct.entered, jnp.logical_and(not_open, jnp.logical_not(target_first))
        ),
        is_open=jnp.logical_and(ct.entered, none_hit),
        # entered lanes carry their R (open → 0, matching the XLA pipeline);
        # empty blocks leave the ±_BIG sentinels for the host to strip
        blk_min=jnp.min(jnp.where(ct.entered, r, jnp.float32(_BIG))),
        blk_max=jnp.max(jnp.where(ct.entered, r, jnp.float32(-_BIG))),
    )


def _init_acc(acc_ref) -> None:
    """Zero the accumulator and seed the min/max rows with their identities.
    Works for any (…, 8, 128) block shape (single / universe / sweep)."""
    pre = (slice(None),) * (len(acc_ref.shape) - 2)
    acc_ref[pre + (slice(None), slice(None))] = jnp.zeros(
        acc_ref.shape, jnp.float32
    )
    row_shape = acc_ref.shape[:-2] + (1, acc_ref.shape[-1])
    acc_ref[pre + (slice(ROW_MIN, ROW_MIN + 1), slice(None))] = jnp.full(
        row_shape, _BIG, jnp.float32
    )
    acc_ref[pre + (slice(ROW_MAX, ROW_MAX + 1), slice(None))] = jnp.full(
        row_shape, -_BIG, jnp.float32
    )


def _accumulate(acc_ref, pre: tuple, rep: _Replay, ct: _Contact, *, b: int) -> None:
    """Stage 6: fold one replayed block into accumulator rows at prefix ``pre``
    (e.g. ``()`` for a (8,128) block, ``(0,)`` / ``(g,)`` for batched blocks)."""
    def row(k):
        return pre + (slice(k, k + 1), slice(None))

    col = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    scalars = (
        jnp.float32(b), jnp.sum(ct.we), jnp.sum(rep.is_tp.astype(jnp.float32)),
        jnp.sum(rep.is_stop.astype(jnp.float32)),
        jnp.sum(rep.is_open.astype(jnp.float32)),
        jnp.sum(rep.r), jnp.sum(rep.r * rep.r),
    )
    svec = jnp.zeros((1, 128), jnp.float32)
    for k, v in enumerate(scalars):
        svec = svec + jnp.where(col == k, v, 0.0)
    acc_ref[row(ROW_SUM)] += svec

    bin_f = (rep.r - jnp.float32(HIST_LO)) * jnp.float32(HIST_BINS / (HIST_HI - HIST_LO))
    # route (1,b) -> (b,1) through f32/i32 transposes (i1 reshapes unsupported)
    bin_col = jnp.transpose(jnp.clip(bin_f.astype(jnp.int32), 0, HIST_BINS - 1))
    we_col = jnp.transpose(ct.we)
    bins = jax.lax.broadcasted_iota(jnp.int32, (b, 128), 1)
    onehot = jnp.where(
        jnp.logical_and(bins == bin_col, we_col > 0.0), 1.0, 0.0
    )
    acc_ref[row(ROW_HIST)] += jnp.sum(onehot, axis=0, keepdims=True)

    acc_ref[row(ROW_MIN)] = jnp.minimum(acc_ref[row(ROW_MIN)], rep.blk_min)
    acc_ref[row(ROW_MAX)] = jnp.maximum(acc_ref[row(ROW_MAX)], rep.blk_max)


def _unpack_acc(acc) -> PathStats:
    """Host-side: accumulator block(s) [..., 8, 128] → PathStats, converting
    the ±_BIG empty sentinels to the ±inf identities PathStats.zero() uses.

    Trade/drawdown fields are exact derivations for single-trade replay:
    every entered path is one trade; the only negative R is the stop's exact
    -1.0, so sum_dd == n_stop and max_dd == max(0, -min_r)."""
    tot = acc[..., ROW_SUM, :]
    entered = tot[..., 1]
    mn = jnp.where(entered > 0, acc[..., ROW_MIN, 0], jnp.inf)
    mx = jnp.where(entered > 0, acc[..., ROW_MAX, 0], -jnp.inf)
    return PathStats(
        n=tot[..., 0], n_entered=entered, n_tp=tot[..., 2], n_stop=tot[..., 3],
        n_open=tot[..., 4], sum_r=tot[..., 5], sum_r2=tot[..., 6],
        min_r=mn,
        max_r=mx,
        sum_trades=entered,
        sum_dd=tot[..., 3],
        max_dd=jnp.where(entered > 0, jnp.maximum(0.0, -mn), 0.0),
        hist=acc[..., ROW_HIST, :HIST_BINS],
    )


def _level_rows(levels_price, levels_valid, max_levels: int, lanes: int = 128):
    """Broadcast level slabs to (…, L, 128) VMEM rows; invalid slots carry +inf
    prices upstream — zero them so the kernel's arithmetic stays finite."""
    lp = jnp.broadcast_to(levels_price[..., None], levels_price.shape + (lanes,))
    lp = jnp.where(jnp.isfinite(lp), lp, 0.0)
    lv = jnp.broadcast_to(
        jnp.asarray(levels_valid, jnp.float32)[..., None],
        levels_valid.shape + (lanes,),
    )
    return lp, lv


# --------------------------------------------------------------------------
# kernel 1: single configuration
# --------------------------------------------------------------------------

def _mc_kernel(
    seed_ref,          # SMEM (1,1) i32
    knobs_ref,         # SMEM (1,8) f32: [prox, stop_pad, tp_pad, _,
                       #                  lvl_jit, entry_slip, stop_slip, tgt_slip]
    level_price_ref,   # VMEM (L, 128) f32 (row-broadcast level prices)
    level_valid_ref,   # VMEM (L, 128) f32 (1/0)
    *refs,             # [hist_ref (bootstrap)], [u_ref (external rng)], acc_ref
    num_bars: int,
    s0: float,
    drift: float,
    sig_dt: float,
    max_levels: int,
    lanes: int = SINGLE_LANES,
    external_rng: bool = False,
    use_noise: bool = False,
    sampler: str = "gbm",
    hist_len: int = 0,
    block_len: int = 0,
    heston=None,
    antithetic: bool = False,
):
    w, b = num_bars, lanes
    if sampler in ("bootstrap", "block_bootstrap"):
        # uniform layout: u_idx w rows, tie one row (+4 noise rows)
        offs = (0, None, None, None, w, w + 1, w + 2, w + 3, w + 4)
        lens = (w, None, None, None, 1, 1, 1, 1, 1)
    elif sampler == "heston":
        # gbm layout + the vol-shock Box-Muller pair (uq1/uq2, w//2 rows
        # each) appended AFTER the tie/noise rows → 4w+1 (+4) rows
        qoff = 3 * w + 1 + (4 if use_noise else 0)
        offs = (0, w // 2, w, 2 * w, 3 * w, 3 * w + 1, 3 * w + 2, 3 * w + 3,
                3 * w + 4, qoff, qoff + w // 2)
        lens = (w // 2, w // 2, w, w, 1, 1, 1, 1, 1, w // 2, w // 2)
    else:
        # u1/u2 are (w//2) rows each (paired Box-Muller), u3/u4 full (w)
        # rows, tie one row → 3w+1 rows; with noise, four more single rows
        offs = (0, w // 2, w, 2 * w, 3 * w, 3 * w + 1, 3 * w + 2, 3 * w + 3,
                3 * w + 4)
        lens = (w // 2, w // 2, w, w, 1, 1, 1, 1, 1)
    refs = list(refs)
    hist_ref = refs.pop(0) if sampler in ("bootstrap", "block_bootstrap") else None
    if external_rng:
        u_ref, acc_ref = refs

        def draw(k):
            return u_ref[0, pl.ds(offs[k], lens[k]), :]
    else:
        (acc_ref,) = refs
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))

        def draw(k):
            return _uniform((lens[k], b))

    if sampler in ("bootstrap", "block_bootstrap"):
        bars = _bootstrap_block(
            lambda: draw(0),
            lambda ch, off, width: hist_ref[ch:ch + 1, off:off + width],
            w=w, b=b, hist_len=hist_len, log_s0=jnp.float32(np.log(s0)),
            block_len=block_len,
        )
    elif sampler == "heston":
        bars = _heston_block(
            draw, lambda k: draw(9 + k), w=w, b=b, hes=heston,
            log_s0=jnp.float32(np.log(s0)),
        )
    else:
        bars = _gbm_block(
            draw, w=w, b=b, drift=jnp.float32(drift),
            sig_dt=jnp.float32(sig_dt), log_s0=jnp.float32(np.log(s0)),
            antithetic=antithetic,
        )
    ct = _first_contact(
        bars, lambda i: (level_price_ref[i, 0], level_valid_ref[i, 0]),
        max_levels, knobs_ref[0, 0], w=w, b=b,
    )
    slips = None
    if use_noise:
        # execution noise (sim/pathsim.path_replay :3453-3461 mirror): level
        # jitter + entry slip perturb the contact BEFORE the scaffold, barrier
        # slips go to _replay_config; contact detection saw the true levels
        r1 = jnp.sqrt(-2.0 * jnp.log(draw(5)))
        a1 = _TWO_PI * draw(6)
        r2 = jnp.sqrt(-2.0 * jnp.log(draw(7)))
        a2 = _TWO_PI * draw(8)
        ct = ct._replace(
            lvl=ct.lvl + r1 * jnp.cos(a1) * knobs_ref[0, 4],
            entry=ct.entry + r1 * jnp.sin(a1) * knobs_ref[0, 5],
        )
        slips = (r2 * jnp.cos(a2) * knobs_ref[0, 6],
                 r2 * jnp.sin(a2) * knobs_ref[0, 7])
    rep = _replay_config(ct, bars, knobs_ref[0, 1], knobs_ref[0, 2], draw(4),
                         w=w, slips=slips)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        _init_acc(acc_ref)

    _accumulate(acc_ref, (), rep, ct, b=b)


@functools.partial(
    jax.jit,
    static_argnames=("num_paths", "num_bars", "s0", "mu", "sigma", "dt",
                     "lanes", "sampler", "block_len", "heston", "antithetic",
                     "interpret"),
)
def _mc_paths_pallas_jit(
    seed,
    levels: Levels,
    params: EngineParams,
    *,
    num_paths: int,
    num_bars: int = 40,
    s0: float = 100.0,
    mu: float = 0.0,
    sigma: float = 0.15,
    dt: float = 1.0 / (390.0 * 252.0),
    lanes: int = SINGLE_LANES,
    noise=None,               # montecarlo.McNoise — per-path execution noise
    antithetic: bool = False, # lane-paired sign-flipped normals (gbm only)
    sampler: str = "gbm",     # "gbm" | "bootstrap" | "block_bootstrap" | "heston"
    hist_bars=None,           # PathBars-like 1-D o/h/l/c history (bootstrap)
    block_len: int = 10,      # block_bootstrap: contiguous run length
    heston=None,              # static (v0, kappa, theta, xi, rho, mu, dt) tuple
    interpret=False,
    external_uniforms=None,   # f32[n_blocks, 3*num_bars+1 (+4 with noise), lanes]
                              # (bootstrap: num_bars+1 (+4); heston: 4*num_bars+1 (+4))
) -> PathStats:
    """Fused-kernel MC.  Same PathStats contract as sim.pathsim.mc_paths,
    including the McNoise execution-noise knobs (level jitter / entry slip /
    stop+target slip as per-path gaussians, qmmx_monolithic.py:3453-3461).
    ``sampler="bootstrap"`` resamples RECORDED bar geometry in-VMEM
    (ops/pathgen.bootstrap_paths's scaled analog — the reference MC walks
    recorded bars, :3353-3538) instead of generating GBM; ``"heston"``
    generates stochastic-vol bars in block form (`_heston_block` — the
    serial variance chain walks (1, b) rows, the cumsum stays on the MXU).

    NOTE: the noise stream differs from the XLA pipeline (per-core hardware PRNG
    vs threefry), so results agree statistically, not bitwise.
    """
    if num_paths % lanes != 0:
        raise ValueError(f"num_paths must be a multiple of {lanes}")
    if sampler in ("gbm", "heston") and num_bars % 2 != 0:
        raise ValueError("num_bars must be even (paired Box-Muller draws)")
    if levels.max_levels > 8:
        raise ValueError("pallas kernel supports up to 8 level slots")
    if sampler not in ("gbm", "bootstrap", "block_bootstrap", "heston"):
        raise ValueError(
            "samplers: 'gbm' | 'bootstrap' | 'block_bootstrap' | 'heston'")
    if sampler in ("bootstrap", "block_bootstrap") and hist_bars is None:
        raise ValueError("sampler='bootstrap' requires hist_bars")
    if antithetic and sampler != "gbm":
        raise ValueError("kernel antithetic pairs gbm normals only")
    if antithetic and lanes % 256 != 0:
        raise ValueError("antithetic needs lanes % 256 == 0 (half-tile pairs)")
    n_blocks = num_paths // lanes

    drift = (mu - 0.5 * sigma * sigma) * dt
    sig_dt = sigma * float(np.sqrt(dt))

    external_rng = external_uniforms is not None
    use_noise = noise is not None
    if sampler in ("bootstrap", "block_bootstrap"):
        n_rows = num_bars + 1 + (4 if use_noise else 0)
        hist, hist_len = _hist_slab_flat(hist_bars)
    elif sampler == "heston":
        n_rows = 4 * num_bars + 1 + (4 if use_noise else 0)
        hist, hist_len = None, 0
    else:
        n_rows = 3 * num_bars + 1 + (4 if use_noise else 0)
        hist, hist_len = None, 0
    kernel = functools.partial(
        _mc_kernel,
        num_bars=num_bars,
        s0=s0,
        drift=drift,
        sig_dt=sig_dt,
        max_levels=levels.max_levels,
        lanes=lanes,
        external_rng=external_rng,
        use_noise=use_noise,
        sampler=sampler,
        hist_len=hist_len,
        heston=heston,
        antithetic=bool(antithetic),
        block_len=int(block_len) if sampler == "block_bootstrap" else 0,
    )
    zero = jnp.float32(0.0)
    knobs = jnp.stack([
        jnp.asarray(params.contact_prox, jnp.float32),
        jnp.asarray(params.stop_padding, jnp.float32),
        jnp.asarray(params.tp_padding, jnp.float32),
        zero,
        jnp.asarray(noise.level_jitter_std, jnp.float32) if use_noise else zero,
        jnp.asarray(noise.entry_slip_std, jnp.float32) if use_noise else zero,
        jnp.asarray(noise.stop_slip_std, jnp.float32) if use_noise else zero,
        jnp.asarray(noise.target_slip_std, jnp.float32) if use_noise else zero,
    ]).reshape(1, 8)

    lp, lv = _level_rows(levels.price, levels.valid, levels.max_levels)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)

    acc = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((levels.max_levels, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((levels.max_levels, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + ([
            pl.BlockSpec(hist.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        ] if hist is not None else []) + ([
            pl.BlockSpec((1, n_rows, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        ] if external_rng else []),
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )(*((seed_arr, knobs, lp, lv)
         + ((hist,) if hist is not None else ())
         + ((jnp.asarray(external_uniforms, jnp.float32),) if external_rng else ())))

    return _unpack_acc(acc)


def mc_paths_pallas(seed, levels, params, *, sampler="gbm", heston=None,
                    mu=0.0, dt=1.0 / (390.0 * 252.0), **kw):
    """Public first-contact kernel entry (see ``_mc_paths_pallas_jit``):
    thin unjitted shim that freezes the heston dict into the static float
    tuple the kernel is specialized on (dicts are unhashable for jit
    statics)."""
    hes = _heston_tuple(heston, mu, dt) if sampler == "heston" else None
    return _mc_paths_pallas_jit(seed, levels, params, sampler=sampler,
                                heston=hes, mu=mu, dt=dt, **kw)


# --------------------------------------------------------------------------
# kernel 2: per-symbol universe
# --------------------------------------------------------------------------

def _universe_kernel(
    seed_ref,          # SMEM (1,1) i32
    sym_ref,           # VMEM (1, 1, 128) f32 per-symbol row:
                       #   [s0, sigma, prox, stop_pad, tp_pad, ...]
    level_price_ref,   # VMEM (1, L, 128) f32 — THIS symbol's level slab
    level_valid_ref,   # VMEM (1, L, 128) f32
    *refs,             # [hist_ref (bootstrap, THIS symbol's table slab)],
                       # [u_ref (external rng, interpret tests only)], acc_ref
    num_bars: int,
    dt: float,
    max_levels: int,
    external_rng: bool = False,
    sampler: str = "gbm",
    hist_len: int = 0,
    block_len: int = 0,
    heston=None,
):
    """Per-(symbol, block) grid step: the shared fused pipeline with the
    symbol's s0/sigma AND engine knobs (prox, stop_pad, tp_pad) read from its
    VMEM slab row, and a per-symbol accumulator row.
    ``sampler="bootstrap"`` resamples each symbol's OWN recorded history
    (symbol-indexed table slab, :3353-3538)."""
    w, b = num_bars, LANES
    # host-derived constants (cols 9-11): bit-identical to the single-config
    # kernels' static baking — deriving them on-device from s0/sigma put
    # Mosaic's log/sqrt ulps between universe and single runs (_derived_consts)
    log_s0 = sym_ref[0, 0, SYM_LOG_S0]
    sig_dt = sym_ref[0, 0, SYM_SIG_DT]
    drift = sym_ref[0, 0, SYM_DRIFT]

    if sampler in ("bootstrap", "block_bootstrap"):
        # uniform layout: u_idx w rows, tie one row
        offs = (0, None, None, None, w)
        lens = (w, None, None, None, 1)
    elif sampler == "heston":
        # gbm layout + the vol-shock pair appended after the tie row
        offs = (0, w // 2, w, 2 * w, 3 * w, None, None, None, None,
                3 * w + 1, 3 * w + 1 + w // 2)
        lens = (w // 2, w // 2, w, w, 1, None, None, None, None,
                w // 2, w // 2)
    else:
        offs = (0, w // 2, w, 2 * w, 3 * w)   # paired Box-Muller layout
        lens = (w // 2, w // 2, w, w, 1)
    refs = list(refs)
    hist_ref = refs.pop(0) if sampler in ("bootstrap", "block_bootstrap") else None
    if external_rng:
        u_ref, acc_ref = refs

        def draw(k):
            return u_ref[0, 0, pl.ds(offs[k], lens[k]), :]
    else:
        (acc_ref,) = refs
        pltpu.prng_seed(
            seed_ref[0, 0]
            + pl.program_id(0) * (pl.num_programs(1) + 1)
            + pl.program_id(1)
        )

        def draw(k):
            return _uniform((lens[k], b))

    if sampler in ("bootstrap", "block_bootstrap"):
        bars = _bootstrap_block(
            lambda: draw(0),
            lambda ch, off, width: hist_ref[0, ch:ch + 1, off:off + width],
            w=w, b=b, hist_len=hist_len, log_s0=log_s0,
            block_len=block_len,
        )
    elif sampler == "heston":
        bars = _heston_block(draw, lambda k: draw(9 + k), w=w, b=b,
                             hes=heston, log_s0=log_s0)
    else:
        bars = _gbm_block(draw, w=w, b=b, drift=drift, sig_dt=sig_dt,
                          log_s0=log_s0)
    ct = _first_contact(
        bars, lambda i: (level_price_ref[0, i, 0], level_valid_ref[0, i, 0]),
        max_levels, sym_ref[0, 0, 2], w=w, b=b,
    )
    rep = _replay_config(ct, bars, sym_ref[0, 0, 3], sym_ref[0, 0, 4], draw(4), w=w)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        _init_acc(acc_ref)

    _accumulate(acc_ref, (0,), rep, ct, b=b)


@functools.partial(
    jax.jit,
    static_argnames=("paths_per_symbol", "num_bars", "dt", "sampler",
                     "block_len", "heston", "interpret"),
)
def _mc_paths_pallas_universe_jit(
    seed,
    levels: Levels,        # batched [S, L<=8]
    params: EngineParams,  # contact_prox/stop_padding/tp_padding: scalar or [S]
    s0,                    # f32[S]
    sigma,                 # f32[S]
    *,
    paths_per_symbol: int,
    num_bars: int = 40,
    dt: float = 1.0 / (390.0 * 252.0),
    sampler: str = "gbm",     # "gbm" | "bootstrap" (per-symbol recorded bars)
    hist_bars=None,           # PathBars-like [S, H] o/h/l/c histories
    block_len: int = 10,      # block_bootstrap: contiguous run length
    heston=None,              # static (v0, kappa, theta, xi, rho, mu, dt) tuple
    derived=None,             # host-computed (log_s0, sig_dt, drift) [S] triple
    interpret=False,
    external_uniforms=None,   # f32[S, n_blocks, 3*num_bars+1, LANES] (tests)
                              # (bootstrap: num_bars+1; heston: 4*num_bars+1 rows)
) -> PathStats:
    """Per-symbol fused MC over a (symbol, block) grid; returns [S]-batched
    PathStats (BASELINE config #4's hot path — ~20x the XLA universe pipeline).
    Engine knobs (prox, stop_pad, tp_pad) ride the per-symbol slab and may be
    [S] vectors for per-symbol calibration.  ``sampler="bootstrap"`` streams
    each symbol's OWN recorded bars (``hist_bars`` [S, H]-batched — the
    reference MC is a per-symbol recorded-bar replay, :3353-3538);
    ``"heston"`` shares one stochastic-vol parameter set across symbols
    (per-symbol s0; sigma unused — variance comes from the v_t chain)."""
    if paths_per_symbol % LANES != 0:
        raise ValueError(f"paths_per_symbol must be a multiple of {LANES}")
    if sampler in ("gbm", "heston") and num_bars % 2 != 0:
        raise ValueError("num_bars must be even (paired Box-Muller draws)")
    lv_price = jnp.asarray(levels.price)
    n_sym, n_lv = lv_price.shape
    if n_lv > 8:
        raise ValueError("pallas universe kernel supports up to 8 level slots")
    if sampler not in ("gbm", "bootstrap", "block_bootstrap", "heston"):
        raise ValueError(
            "samplers: 'gbm' | 'bootstrap' | 'block_bootstrap' | 'heston'")
    if sampler in ("bootstrap", "block_bootstrap") and hist_bars is None:
        raise ValueError("sampler='bootstrap' requires hist_bars ([S, H] "
                         "recorded o/h/l/c histories, one row per symbol)")
    n_blocks = paths_per_symbol // LANES
    if sampler in ("bootstrap", "block_bootstrap"):
        n_rows = num_bars + 1
        hist, hist_len = _hist_slab_flat_batched(hist_bars)
    elif sampler == "heston":
        n_rows = 4 * num_bars + 1
        hist, hist_len = None, 0
    else:
        n_rows = 3 * num_bars + 1
        hist, hist_len = None, 0

    external_rng = external_uniforms is not None
    kernel = functools.partial(
        _universe_kernel, num_bars=num_bars, dt=dt, max_levels=n_lv,
        external_rng=external_rng, sampler=sampler, hist_len=hist_len,
        block_len=int(block_len) if sampler == "block_bootstrap" else 0,
        heston=heston,
    )
    lp, lvv = _level_rows(lv_price, levels.valid, n_lv)
    sym = _symbol_slab(params, s0, sigma, n_sym, derived=derived)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)

    acc = pl.pallas_call(
        kernel,
        grid=(n_sym, n_blocks),
        in_specs=[
            pl.BlockSpec((1, 1), lambda s, b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 128), lambda s, b: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_lv, 128), lambda s, b: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_lv, 128), lambda s, b: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + ([
            pl.BlockSpec((1,) + hist.shape[1:], lambda s, b: (s, 0, 0),
                         memory_space=pltpu.VMEM)
        ] if hist is not None else []) + ([
            pl.BlockSpec((1, 1, n_rows, LANES),
                         lambda s, b: (s, b, 0, 0), memory_space=pltpu.VMEM)
        ] if external_rng else []),
        out_specs=pl.BlockSpec((1, 8, 128), lambda s, b: (s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_sym, 8, 128), jnp.float32),
        interpret=interpret,
    )(*((seed_arr, sym, lp, lvv)
         + ((hist,) if hist is not None else ())
         + ((jnp.asarray(external_uniforms, jnp.float32),)
            if external_rng else ())))

    return _unpack_acc(acc)


def mc_paths_pallas_universe(seed, levels, params, s0, sigma, *,
                             sampler="gbm", heston=None,
                             dt=1.0 / (390.0 * 252.0), **kw):
    """Public first-contact universe entry (see
    ``_mc_paths_pallas_universe_jit``): freezes the heston dict into the
    static float tuple and derives (log_s0, sig_dt, drift) per symbol ON
    HOST in f64 (``_derived_consts``) so universe runs are bit-identical
    to single-config runs of the same symbols."""
    hes = _heston_tuple(heston, 0.0, dt) if sampler == "heston" else None
    return _mc_paths_pallas_universe_jit(
        seed, levels, params, s0, sigma, sampler=sampler, heston=hes, dt=dt,
        derived=_derived_consts(s0, sigma, dt), **kw)


# --------------------------------------------------------------------------
# kernel 4: engine-gated multi-trade lifecycle, fully fused
# --------------------------------------------------------------------------

GATED_SUB = 8        # state-tile sublanes: (8, GATED_LANES) rows use full vregs
GATED_LANES = 1024   # default lanes per state tile (one block = 8×lanes paths);
                     # per-call ``lanes`` overrides.  Swept on v5e round 3
                     # (benchmarks/gated_lanes_study.py, 2^27 × 40 bars):
                     # 512→236M, 1024→248M, 2048→180M, 4096→170M paths/s —
                     # unlike the stateless first-contact kernel (wider wins),
                     # the ~30 live (8, lanes) state tiles leave 1024 the
                     # sweet spot before VMEM pressure kills the pipeline.
GATED_BLOCK = GATED_SUB * GATED_LANES
ROW_MAXDD = 4        # worst per-path drawdown — 'max' combine, zero identity


def _heston_tuple(heston, mu, dt):
    """Static (v0, kappa, theta, xi, rho, mu, dt) floats for the kernels
    (defaults = ops/pathgen.heston_paths); hashable for jit static args."""
    h = dict(v0=0.04, kappa=3.0, theta=0.04, xi=0.6, rho=-0.7)
    h.update(heston or {})
    return (float(h["v0"]), float(h["kappa"]), float(h["theta"]),
            float(h["xi"]), float(h["rho"]), float(mu), float(dt))


def _gated_stride(sampler: str, use_noise: bool) -> int:
    """Uniform blocks consumed per double-bar step by the gated loop.

    GBM: (u1, u2) Box-Muller pair + 2×(u3, u4, tie) bridge/tie draws = 8
    (+8 noise blocks).  Bootstrap: (u_idx0, u_idx1, tie0, tie1) = 4 (+8);
    block bootstrap keeps the same layout (non-start bars ignore their
    index uniform) so CRN streams align across the bootstrap family."""
    if sampler in ("bootstrap", "block_bootstrap"):
        return 12 if use_noise else 4
    if sampler == "heston":
        # price pair + vol-shock pair + 2x(u3, u4, tie)
        return 18 if use_noise else 10
    return 16 if use_noise else 8


def _gated_kernel(
    seed_ref,          # SMEM (1,1) i32
    knobs_ref,         # SMEM (1,8) f32: [prox, stop_pad, tp_pad, _,
                       #                  lvl_jit, entry_slip, stop_slip, tgt_slip]
    gate_ref,          # SMEM (1,8) f32: [qmin, touch_limit, cooldown_bars,
                       #                  touch_gap_bars, use_confidence, ...]
    level_price_ref,   # VMEM (L, 128) f32
    level_valid_ref,   # VMEM (L, 128) f32
    level_kind_ref,    # VMEM (L, 128) f32 (1 solid / 0 dashed)
    *refs,             # [hist_ref (bootstrap)], [u_ref (external rng,
                       # interpret tests only)], acc_ref
    num_bars: int,
    s0: float,
    drift: float,
    sig_dt: float,
    max_levels: int,
    lanes: int = GATED_LANES,
    external_rng: bool = False,
    use_noise: bool = False,
    sampler: str = "gbm",
    hist_len: int = 0,
    block_len: int = 0,
    heston=None,
    antithetic: bool = False,
):
    """The QMMX engine per path, entirely on-chip: bars are generated
    bar-by-bar inside the loop (no (W,B) residency, no cumsum matmul — the
    log-price accumulates in the carry) and the multi-trade state machine
    (sim/gatedpath.py semantics: cooldown, per-level fresh-touch latch with
    the LEVEL_OVERTOUCHED budget, confidence gate, per-path equity/peak/
    drawdown) advances over full (8, lanes) vector registers.
    ``sampler="bootstrap"`` resamples recorded bars from the VMEM table
    slab instead of generating GBM (the reference MC walks recorded bars,
    :3353-3538).

    All counters are f32 (small integers are exact; keeps every op in one
    vreg type).  Bool algebra is composed with and/or — Mosaic cannot select
    over i1 operands — while f32 selects use jnp.where freely.
    """
    s, b = GATED_SUB, lanes
    stride = _gated_stride(sampler, use_noise)
    refs = list(refs)
    if sampler in ("bootstrap", "block_bootstrap"):
        hist_ref = refs.pop(0)
        hist = (lambda ch, ti: hist_ref[8 * ch:8 * (ch + 1),
                                        ti * 128:(ti + 1) * 128],
                hist_len)
    else:
        hist = None
    if external_rng:
        u_ref, acc_ref = refs

        # 8 uniform blocks per double-bar step (normals pair + 2×(u3,u4,tie));
        # with noise, 8 more (two Box-Muller pairs per half → the four
        # per-entry execution-noise normals of each bar) at k = 8..15
        def draw(t2, k):
            blk = u_ref[0, pl.ds(t2 * stride + k, 1)]  # (1, s, b)
            return blk.reshape(s, b)
    else:
        (acc_ref,) = refs
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))

        def draw(t2, k):
            return _uniform((s, b))

    final = _gated_lifecycle_loop(
        draw, lambda i: (level_price_ref[i, 0], level_valid_ref[i, 0],
                         level_kind_ref[i, 0]),
        num_bars=num_bars, drift=jnp.float32(drift),
        sig_dt=jnp.float32(sig_dt), log_s0=jnp.float32(np.log(s0)),
        knobs=(knobs_ref[0, 0], knobs_ref[0, 1], knobs_ref[0, 2]),
        gates=tuple(gate_ref[0, k] for k in range(5)),
        max_levels=max_levels, lanes=lanes,
        noise=(tuple(knobs_ref[0, 4 + k] for k in range(4))
               if use_noise else None),
        sampler=sampler, hist=hist, block_len=block_len,
        heston=heston, antithetic=antithetic,
    )

    @pl.when(pl.program_id(0) == 0)
    def _init():
        _init_acc(acc_ref)

    _gated_accumulate(acc_ref, (), final, n_paths=s * b)


def _gated_lifecycle_loop(draw, get_level, *, num_bars, drift, sig_dt, log_s0,
                          knobs, gates, max_levels, lanes=GATED_LANES,
                          noise=None, sampler="gbm", hist=None,
                          block_len=0, heston=None, antithetic=False,
                          corr=None, curve=None):
    """The streaming generate+trade loop shared by the gated kernels.

    Each ``fori_loop`` iteration processes TWO bars from one paired
    Box-Muller draw (both branches of the (u1, u2) pair used — see
    ``_gbm_block``), so ``num_bars`` must be even.  ``draw(t2, k)`` yields
    the k-th (8, lanes) uniform block of double-bar step t2 (k: 0/1 normals
    pair, then 2-4 and 5-7 the bridge+tie uniforms of each half);
    ``get_level(i)`` yields (price, valid, kind) scalars for level slot i;
    drift/sig_dt/log_s0 may be static floats or traced per-symbol scalars.
    ``knobs`` is the (prox, stop_pad, tp_pad) scalar triple and ``gates``
    the (qmin, touch_limit, cooldown_bars, touch_gap, use_conf) scalar
    five-tuple — callers read them from SMEM refs (single config), a grid
    row (sweep) or the per-symbol slab (universe).  ``noise``: optional
    (lvl_jitter, entry_slip, stop_slip, tgt_slip) std scalars — per-ENTRY
    gaussian execution noise (sim/gatedpath.gated_path_replay semantics,
    reference MC :3453-3461) drawn as two extra Box-Muller pairs per bar
    (draw ks 8..15 per double-bar step; bootstrap: ks 4..11).

    ``sampler="bootstrap"`` resamples RECORDED bar geometry in-loop (the
    reference MC walks recorded bars, :3353-3538): ``hist =
    (get_hist_tile, hist_len)`` exposes the precomputed relative-geometry
    tables (ops/pathgen.bootstrap_tables) as (8, lanes) VMEM tiles; each
    bar draws ONE uniform → ``idx = floor(u·H)``, gathers logc/logh/logl
    (+ logo on bar 0 — gated_path_replay seeds bar-0 prev-close from
    ``open[0]``) and chains ``log_close = log_prev + logc[idx]``.
    Bootstrap draw layout per double-bar step: (u_idx0, u_idx1, tie0,
    tie1) [+ 8 noise blocks at ks 4..11].  Returns the final
    (side, equity, dd, trades, wins, losses)."""
    s, b = GATED_SUB, lanes
    bootstrap = sampler in ("bootstrap", "block_bootstrap")
    block = sampler == "block_bootstrap"
    hes = sampler == "heston"
    carry_x = block or hes        # one extra sampler-state tile in the carry
    if hes:
        h_v0, h_kap, h_th, h_xi, h_rho, h_mu, h_dt = [
            float(x) for x in heston]
        h_rho_perp = float(np.sqrt(max(0.0, 1.0 - h_rho * h_rho)))

    def _anti(z):
        """Antithetic lane pairing (gbm only): right half-lanes reuse the
        left half's normals negated; bridge/tie draws stay fresh, and the
        right half's z draws are consumed-but-unused so the stream layout
        matches the plain run (CRN alignment)."""
        half = z[:, :z.shape[1] // 2]
        return jnp.concatenate([half, -half], axis=1)
    if bootstrap:
        get_hist_tile, hist_len = hist
        h_tiles = -(-int(hist_len) // 128)
        if block and int(hist_len) <= int(block_len):
            raise ValueError("block_bootstrap needs history longer than "
                             f"block_len ({hist_len} <= {block_len})")

        def _hgather(ch, idx_f):
            return _hist_gather_tiles(
                lambda ti: get_hist_tile(ch, ti), h_tiles, idx_f, rows=s)
    prox, stop_pad, tp_pad = knobs
    qmin, touch_limit, cooldown_bars, touch_gap, use_conf = gates

    zero = jnp.zeros((s, b), jnp.float32)
    init = (
        zero + log_s0,                 # log_s
        # bar 0's prev close must equal open[0] = exp(log_s0) BITWISE (the
        # XLA pipeline compares close vs paths.open[:, 0]); seeding the raw
        # s0 instead flips direction for paths whose first close lands in
        # the ~1-ulp gap between s0 and exp(log(s0))
        jnp.exp(zero + log_s0),        # prev_c
    ) + ((zero,) if block else ()) + (  # block-bootstrap current block start
    ) + ((zero + jnp.float32(h_v0),) if hes else (  # heston variance v_t
    )) + (
        zero, zero, zero, zero,       # side / entry / stop / target
        zero,                          # cooldown (bars remaining)
        zero, zero, zero,              # equity / peak / dd
        zero, zero, zero,              # trades / wins / losses
        tuple(zero for _ in range(max_levels)),            # touch counts
        tuple(jnp.full((s, b), -1e9, jnp.float32)
              for _ in range(max_levels)),                 # last touch bar
    )

    def body(t2, st, first=False):
        if bootstrap:
            if corr is not None:
                # JOINT recorded days (book semantics, ops/pallas_engine
                # corr-bootstrap mirror): resample indices come from the
                # SHARED market stream — every book member replays the SAME
                # historical bar each step (beta unused; ties/noise stay
                # idiosyncratic).  Market ks first (k == stride reseeds the
                # market stream), then ties on ks 0/1 (k == 0 reseeds the
                # per-symbol stream).
                mk0 = _gated_stride(sampler, noise is not None)
                z_pair = (draw(t2, mk0), draw(t2, mk0 + 1))
            else:
                z_pair = (draw(t2, 0), draw(t2, 1))  # per-bar index uniforms
            ties = ((draw(t2, 0), draw(t2, 1)) if corr is not None
                    else (draw(t2, 2), draw(t2, 3)))
            noise_k0 = 4
        else:
            if corr is not None:
                # shared market factor (parallel/portfolio.py model): the
                # market pair is drawn FIRST each step — ks (mk0, mk0+1), a
                # symbol-independent stream (the corr kernel's draw wrapper
                # reseeds the PRNG / reads the shared market ref on mk0)
                mk0 = _gated_stride(sampler, noise is not None)
                mrad = jnp.sqrt(-2.0 * jnp.log(draw(t2, mk0)))
                mang = _TWO_PI * draw(t2, mk0 + 1)
                zm_pair = (mrad * jnp.cos(mang), mrad * jnp.sin(mang))
                if antithetic:
                    # antithetic BOOK pairs flip the market shock too
                    zm_pair = (_anti(zm_pair[0]), _anti(zm_pair[1]))
                if hes:
                    # second market pair: the variance shock's factor
                    # component (market-wide vol regime)
                    qmrad = jnp.sqrt(-2.0 * jnp.log(draw(t2, mk0 + 2)))
                    qmang = _TWO_PI * draw(t2, mk0 + 3)
                    zqm_pair = (qmrad * jnp.cos(qmang),
                                qmrad * jnp.sin(qmang))
            u1 = draw(t2, 0)
            u2 = draw(t2, 1)
            radius = jnp.sqrt(-2.0 * jnp.log(u1))
            angle = _TWO_PI * u2
            z_pair = (radius * jnp.cos(angle), radius * jnp.sin(angle))
            if antithetic:
                z_pair = (_anti(z_pair[0]), _anti(z_pair[1]))
            if corr is not None:
                beta_s = corr
                perp = jnp.sqrt(jnp.maximum(0.0, 1.0 - beta_s * beta_s))
                z_pair = (beta_s * zm_pair[0] + perp * z_pair[0],
                          beta_s * zm_pair[1] + perp * z_pair[1])
            ties = None
            noise_k0 = 8
            if hes:
                qradius = jnp.sqrt(-2.0 * jnp.log(draw(t2, 2)))
                qangle = _TWO_PI * draw(t2, 3)
                zq_pair = (qradius * jnp.cos(qangle),
                           qradius * jnp.sin(qangle))
                if corr is not None:
                    # one-factor vol co-movement, same beta loading as price
                    zq_pair = (beta_s * zqm_pair[0] + perp * zq_pair[0],
                               beta_s * zqm_pair[1] + perp * zq_pair[1])
                noise_k0 = 10
        for half in range(2):
            t_f = (2 * t2 + half).astype(jnp.float32)
            if noise is not None:
                r1 = jnp.sqrt(-2.0 * jnp.log(draw(t2, noise_k0 + 4 * half)))
                a1 = _TWO_PI * draw(t2, noise_k0 + 1 + 4 * half)
                r2 = jnp.sqrt(-2.0 * jnp.log(draw(t2, noise_k0 + 2 + 4 * half)))
                a2 = _TWO_PI * draw(t2, noise_k0 + 3 + 4 * half)
                nz = (r1 * jnp.cos(a1), r1 * jnp.sin(a1),
                      r2 * jnp.cos(a2), r2 * jnp.sin(a2))
            else:
                nz = None
            if bootstrap:
                st = _one_bar(st, t_f, z_pair[half], None, None,
                              ties[half], nz, bar0=first and half == 0)
            elif hes:
                st = _one_bar(
                    st, t_f, z_pair[half],
                    draw(t2, 4 + 3 * half), draw(t2, 5 + 3 * half),
                    draw(t2, 6 + 3 * half), nz, zq=zq_pair[half],
                )
            else:
                st = _one_bar(
                    st, t_f, z_pair[half],
                    draw(t2, 2 + 3 * half), draw(t2, 3 + 3 * half),
                    draw(t2, 4 + 3 * half), nz,
                )
        return st

    def _one_bar(st, t_f, z, u3, u4, tie, nz, bar0=False, zq=None):
        if carry_x:
            samp_st = st[2]               # block start / heston variance
            st = st[:2] + st[3:]
        if block:
            blk_start = samp_st
        (log_s, prev_c, side, entry, stop, target, cooldown,
         equity, peak, dd, trades, wins, losses, touch, last_tb) = st

        if bootstrap:
            # ---- resample one RECORDED bar (relative geometry, :3353) ----
            hf = jnp.float32(hist_len)
            if block:
                # contiguous block_len-bar runs (block_bootstrap_paths):
                # one start uniform per block, non-start bars reuse it
                bl = jnp.float32(block_len)
                off = t_f - bl * jnp.floor(t_f / bl)
                new_start = jnp.minimum(jnp.floor(z * (hf - bl)),
                                        hf - bl - 1.0)
                blk_start = jnp.where(off == 0.0, new_start, blk_start)
                samp_st = blk_start
                idx_f = blk_start + off
            else:
                idx_f = jnp.minimum(jnp.floor(z * hf), hf - 1.0)
            log_close = log_s + _hgather(0, idx_f)
            c = jnp.exp(log_close)
            high = jnp.exp(log_s + _hgather(1, idx_f))
            low = jnp.exp(log_s + _hgather(2, idx_f))
            # bar 0's prev close is open[0] in gated_path_replay — recorded
            # bars have real open gaps, so gather logo on the statically
            # peeled first bar only (zero cost in the steady-state loop)
            if bar0:
                prev_c = jnp.exp(log_s + _hgather(3, idx_f))
        else:
            # ---- generate this bar (streaming GBM/Heston + bridge) ----
            log_open = log_s                  # open == previous close, exact
            if hes:
                # full-truncation Euler (ops/pathgen.heston_paths mirror)
                dtf = jnp.float32(h_dt)
                v_pos = jnp.maximum(samp_st, 0.0)
                sig_bar = jnp.sqrt(v_pos * dtf)
                log_close = (log_s
                             + (jnp.float32(h_mu) - 0.5 * v_pos) * dtf
                             + sig_bar * z)
                sig2dt = v_pos * dtf
                samp_st = (samp_st
                           + jnp.float32(h_kap)
                           * (jnp.float32(h_th) - v_pos) * dtf
                           + jnp.float32(h_xi) * sig_bar
                           * (jnp.float32(h_rho) * z
                              + jnp.float32(h_rho_perp) * zq))
            else:
                log_close = log_s + (drift + sig_dt * z)
                sig2dt = sig_dt * sig_dt
            c = jnp.exp(log_close)
            d2 = (log_close - log_open) ** 2
            high = jnp.exp(0.5 * (log_open + log_close
                                  + jnp.sqrt(d2 - 2.0 * sig2dt * jnp.log(u3))))
            low = jnp.exp(0.5 * (log_open + log_close
                                 - jnp.sqrt(d2 - 2.0 * sig2dt * jnp.log(u4))))

        # ---- 1) position management ----
        is_open = side != 0.0
        is_long = side > 0.0
        nil = jnp.logical_and(is_open, jnp.logical_not(is_long))
        stop_hit = jnp.logical_or(
            jnp.logical_and(jnp.logical_and(is_open, is_long), low <= stop),
            jnp.logical_and(nil, high >= stop),
        )
        tgt_hit = jnp.logical_or(
            jnp.logical_and(jnp.logical_and(is_open, is_long), high >= target),
            jnp.logical_and(nil, low <= target),
        )
        both = jnp.logical_and(stop_hit, tgt_hit)
        up_span = jnp.maximum(0.0, high - entry)
        dn_span = jnp.maximum(0.0, entry - low)
        p_tp = up_span / (up_span + dn_span + 1e-9)
        target_first = jnp.logical_or(
            jnp.logical_and(both, tie < p_tp),
            jnp.logical_and(tgt_hit, jnp.logical_not(stop_hit)),
        )
        closed = jnp.logical_or(stop_hit, tgt_hit)
        closed_f = closed.astype(jnp.float32)
        risk = jnp.maximum(jnp.abs(entry - stop), 1e-9)
        reward = jnp.abs(target - entry)
        r = closed_f * jnp.where(target_first, reward / risk, -1.0)
        equity = equity + r
        peak = jnp.maximum(peak, equity)
        dd = jnp.maximum(dd, peak - equity)
        wins = wins + jnp.logical_and(closed, target_first).astype(jnp.float32)
        losses = losses + jnp.logical_and(
            closed, jnp.logical_not(target_first)).astype(jnp.float32)
        side = side * (1.0 - closed_f)
        if curve is not None:
            # portfolio hook (corr kernel): accumulate this symbol's weighted
            # post-bar equity into the per-bar portfolio-curve scratch (the
            # book's drawdown is peak-tracked over TIME on the combined
            # curve — per-symbol final equities cannot see it)
            curve_ref, w_s = curve
            bar_i = t_f.astype(jnp.int32)
            curve_ref[pl.ds(bar_i, 1)] = (curve_ref[pl.ds(bar_i, 1)]
                                          + (w_s * equity)[None])

        # ---- 2) entry evaluation (flat-at-bar-start paths only) ----
        was_flat = jnp.logical_not(is_open)
        cd_ok = cooldown <= 0.0
        cooldown = jnp.where(closed, cooldown_bars,
                             jnp.maximum(cooldown - 1.0, 0.0))

        dir_known = c != prev_c
        go_long = c > prev_c
        inf = jnp.float32(_BIG)
        best_d = jnp.full((s, b), inf, jnp.float32)
        best_p = zero
        best_k = zero
        best_i = zero
        for i in range(max_levels):
            lp, lv, lk = get_level(i)
            d = jnp.where(lv > 0, jnp.abs(c - lp), inf)
            take = d < best_d
            best_p = jnp.where(take, lp, best_p)
            best_k = jnp.where(take, lk, best_k)
            best_i = jnp.where(take, jnp.float32(i), best_i)
            best_d = jnp.where(take, d, best_d)
        near = best_d <= prox
        signal = jnp.logical_and(
            jnp.logical_and(was_flat, cd_ok),
            jnp.logical_and(dir_known, near),
        )

        # per-(path, level) fresh-touch latch via f32 one-hots; best_i matches
        # exactly one slot, so the masked sums are exact gathers
        tc_old = zero
        last_t = zero
        ohs = []
        for i in range(max_levels):
            oh = (best_i == jnp.float32(i)).astype(jnp.float32)
            ohs.append(oh)
            tc_old = tc_old + touch[i] * oh
            last_t = last_t + last_tb[i] * oh
        fresh = jnp.logical_and(signal, (t_f - last_t) >= touch_gap)
        fresh_f = fresh.astype(jnp.float32)
        tc_new = tc_old + fresh_f
        touch = tuple(touch[i] + ohs[i] * fresh_f for i in range(max_levels))
        last_tb = tuple(
            jnp.where(jnp.logical_and(fresh, ohs[i] > 0), t_f, last_tb[i])
            for i in range(max_levels)
        )

        overtouched = tc_new >= touch_limit
        # confidence (ops/confidence.compute_confidence order, f32)
        base = jnp.maximum(0.0, 1.0 - best_d / jnp.maximum(jnp.float32(1e-4), prox))
        base = base + jnp.where(best_k > 0.5, 0.08, 0.02)
        base = base + jnp.where(tc_new <= 1.0, 0.10,
                                jnp.where(tc_new == 2.0, -0.08, -0.16))
        base = base + 0.03  # direction always known inside a signal
        conf = jnp.clip(base, 0.0, 1.0)
        conf_ok = jnp.logical_or(use_conf < 0.5, conf >= qmin)
        enter = jnp.logical_and(
            signal, jnp.logical_and(jnp.logical_not(overtouched), conf_ok)
        )
        new_side = jnp.where(go_long, 1.0, -1.0)
        side = jnp.where(enter, new_side, side)
        if nz is not None:
            # per-entry execution noise (gated_path_replay :3453-3461): level
            # jitter shifts the whole scaffold, entry slip moves the fill,
            # barrier slips move each bound; gates saw the true level
            lvl_jit, entry_slip, stop_slip, tgt_slip = noise
            lvl_eff = best_p + nz[0] * lvl_jit
            fill = c + nz[1] * entry_slip
            new_stop = (jnp.where(go_long, lvl_eff - stop_pad, lvl_eff + stop_pad)
                        + nz[2] * stop_slip)
            new_tgt = (jnp.where(go_long, lvl_eff + tp_pad, lvl_eff - tp_pad)
                       + nz[3] * tgt_slip)
        else:
            fill = c
            new_stop = jnp.where(go_long, best_p - stop_pad, best_p + stop_pad)
            new_tgt = jnp.where(go_long, best_p + tp_pad, best_p - tp_pad)
        entry = jnp.where(enter, fill, entry)
        stop = jnp.where(enter, new_stop, stop)
        target = jnp.where(enter, new_tgt, target)
        trades = trades + enter.astype(jnp.float32)

        ret = (log_close, c, side, entry, stop, target, cooldown,
               equity, peak, dd, trades, wins, losses, touch, last_tb)
        if carry_x:
            ret = ret[:2] + (samp_st,) + ret[2:]
        return ret

    if bootstrap:
        # static peel of the first double-bar step (bar-0 logo gather)
        st = body(jnp.int32(0), init, first=True)
        st = jax.lax.fori_loop(1, num_bars // 2, body, st)
    else:
        st = jax.lax.fori_loop(0, num_bars // 2, body, init)
    if carry_x:
        st = st[:2] + st[3:]                   # drop the sampler-state carry
    (_, _, side, _, _, _, _, equity, _, dd, trades, wins, losses, _, _) = st
    return side, equity, dd, trades, wins, losses


def _gated_accumulate(acc_ref, pre: tuple, final, *, n_paths: int) -> None:
    """Fold one gated block's final state into accumulator rows at prefix
    ``pre`` (``()`` single-config, ``(0,)`` per-symbol block)."""
    side, equity, dd, trades, wins, losses = final

    def row(k):
        return pre + (slice(k, k + 1), slice(None))

    entered = trades > 0.0
    we = entered.astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    scalars = (
        jnp.float32(n_paths), jnp.sum(we), jnp.sum(wins), jnp.sum(losses),
        jnp.sum((side != 0.0).astype(jnp.float32)),
        jnp.sum(equity), jnp.sum(equity * equity),
        jnp.sum(trades), jnp.sum(dd),
    )
    svec = jnp.zeros((1, 128), jnp.float32)
    for k, v in enumerate(scalars):
        svec = svec + jnp.where(col == k, v, 0.0)
    acc_ref[row(ROW_SUM)] += svec

    # lifecycle totals bin over the WIDER multi-trade range (sim/pathsim.py
    # LIFE_HIST_*): totals of -2R and beyond must keep resolving for VaR/CVaR
    bin_idx = jnp.clip(
        ((equity - jnp.float32(LIFE_HIST_LO))
         * jnp.float32(HIST_BINS / (LIFE_HIST_HI - LIFE_HIST_LO))).astype(jnp.int32),
        0, HIST_BINS - 1,
    )
    hvec = jnp.zeros((1, 128), jnp.float32)
    for k in range(HIST_BINS):
        cnt = jnp.sum(jnp.where(bin_idx == k, we, 0.0))
        hvec = hvec + jnp.where(col == k, cnt, 0.0)
    acc_ref[row(ROW_HIST)] += hvec

    blk_min = jnp.min(jnp.where(entered, equity, jnp.float32(_BIG)))
    blk_max = jnp.max(jnp.where(entered, equity, jnp.float32(-_BIG)))
    acc_ref[row(ROW_MIN)] = jnp.minimum(acc_ref[row(ROW_MIN)], blk_min)
    acc_ref[row(ROW_MAX)] = jnp.maximum(acc_ref[row(ROW_MAX)], blk_max)
    acc_ref[row(ROW_MAXDD)] = jnp.maximum(acc_ref[row(ROW_MAXDD)], jnp.max(dd))


def _gated_universe_kernel(
    seed_ref,          # SMEM (1,1) i32
    gate_ref,          # SMEM (1,8) f32 gate knobs
    sym_ref,           # VMEM (1, 1, 128) f32 per-symbol row:
                       #   [s0, sigma, prox, stop_pad, tp_pad,
                       #    lvl_jit, entry_slip, stop_slip, tgt_slip, ...]
    level_price_ref,   # VMEM (1, L, 128) f32 — THIS symbol's level slab
    level_valid_ref,   # VMEM (1, L, 128) f32
    level_kind_ref,    # VMEM (1, L, 128) f32
    *refs,             # [hist_ref (bootstrap, THIS symbol's table slab)],
                       # [u_ref (external rng, interpret tests only)], acc_ref
    num_bars: int,
    dt: float,
    max_levels: int,
    external_rng: bool = False,
    use_noise: bool = False,
    sampler: str = "gbm",
    hist_len: int = 0,
    block_len: int = 0,
    heston=None,
):
    """Per-(symbol, block) gated lifecycle: the shared streaming loop with the
    symbol's s0/sigma AND engine knobs (prox, stop_pad, tp_pad — plus its own
    noise stds) read from its VMEM slab row, and a per-symbol accumulator
    block.  ``sampler="bootstrap"`` resamples each symbol's OWN recorded
    history (symbol-indexed table slab, :3353-3538)."""
    s, b = GATED_SUB, GATED_LANES
    stride = _gated_stride(sampler, use_noise)
    refs = list(refs)
    if sampler in ("bootstrap", "block_bootstrap"):
        hist_ref = refs.pop(0)
        hist = (lambda ch, ti: hist_ref[0, 8 * ch:8 * (ch + 1),
                                        ti * 128:(ti + 1) * 128],
                hist_len)
    else:
        hist = None
    # host-derived constants (cols 9-11, _derived_consts): bit-identical to
    # the single-config kernel's static baking
    log_s0 = sym_ref[0, 0, SYM_LOG_S0]
    sig_dt = sym_ref[0, 0, SYM_SIG_DT]
    drift = sym_ref[0, 0, SYM_DRIFT]

    if external_rng:
        u_ref, acc_ref = refs

        def draw(t2, k):
            return u_ref[0, 0, pl.ds(t2 * stride + k, 1)].reshape(s, b)
    else:
        (acc_ref,) = refs
        pltpu.prng_seed(
            seed_ref[0, 0]
            + pl.program_id(0) * (pl.num_programs(1) + 1)
            + pl.program_id(1)
        )

        def draw(t2, k):
            return _uniform((s, b))

    final = _gated_lifecycle_loop(
        draw, lambda i: (level_price_ref[0, i, 0], level_valid_ref[0, i, 0],
                         level_kind_ref[0, i, 0]),
        num_bars=num_bars, drift=drift, sig_dt=sig_dt, log_s0=log_s0,
        knobs=(sym_ref[0, 0, 2], sym_ref[0, 0, 3], sym_ref[0, 0, 4]),
        gates=tuple(gate_ref[0, k] for k in range(5)),
        max_levels=max_levels,
        noise=(tuple(sym_ref[0, 0, 5 + k] for k in range(4))
               if use_noise else None),
        sampler=sampler, hist=hist, block_len=block_len,
        heston=heston,
    )

    @pl.when(pl.program_id(1) == 0)
    def _init():
        _init_acc(acc_ref)

    _gated_accumulate(acc_ref, (0,), final, n_paths=s * b)


def _derived_consts(s0, sigma, dt, mu=0.0):
    """Host-side f64 derivation of per-symbol (log_s0, sig_dt, drift) —
    BIT-IDENTICAL to the single-config kernels' static baking (np.log /
    np.sqrt in f64, rounded once to f32).  The universe kernels used to
    derive these ON-DEVICE from the slab's raw s0/sigma; Mosaic's log/sqrt
    approximations differ from host libm by ulps, which flipped ~0.2-1% of
    boundary decisions between universe and single-config runs on real v5e
    (every failing cell of the round-4b on-chip bootstrap pin was a
    universe variant — the single/sweep cells, whose constants are host
    statics, were exact)."""
    s0 = np.asarray(s0, np.float64)
    sg = np.asarray(sigma, np.float64)
    return (np.log(s0).astype(np.float32),
            (sg * np.sqrt(dt)).astype(np.float32),
            ((mu - 0.5 * sg * sg) * dt).astype(np.float32))


# symbol-slab column layout (cols 9-11 are the host-derived constants;
# 12-13 the correlated-universe factor loading and book weight)
SYM_LOG_S0 = 9
SYM_SIG_DT = 10
SYM_DRIFT = 11
SYM_BETA = 12
SYM_WEIGHT = 13


def _symbol_slab(params: EngineParams, s0, sigma, n_sym: int, noise=None,
                 derived=None, beta=None, weights=None):
    """Pack [s0, sigma, prox, stop_pad, tp_pad, 4×noise-std, log_s0,
    sig_dt, drift] per symbol into the (S, 1, 128) VMEM slab rows the
    universe kernels read.  Engine knobs (and noise stds) may be scalars
    (shared) or [S] vectors (per-symbol paddings — reference engines are
    single-symbol so its settings are global, but a universe run wants
    per-symbol calibration).  ``derived`` is the host-computed
    (log_s0, sig_dt, drift) triple from ``_derived_consts`` — falls back
    to in-graph derivation (device transcendentals) when None, e.g. for
    callers that jit over traced s0/sigma."""
    zero = jnp.float32(0.0)
    s0 = jnp.asarray(s0, jnp.float32)
    sigma = jnp.asarray(sigma, jnp.float32)
    if derived is None:
        raise ValueError("_symbol_slab requires host-derived constants "
                         "(use _derived_consts) — on-device log/sqrt "
                         "diverge from the single-config kernels by ulps")
    log_s0, sig_dt, drift = [jnp.asarray(d, jnp.float32) for d in derived]
    cols = [s0, sigma,
            jnp.asarray(params.contact_prox, jnp.float32),
            jnp.asarray(params.stop_padding, jnp.float32),
            jnp.asarray(params.tp_padding, jnp.float32),
            jnp.asarray(noise.level_jitter_std, jnp.float32)
            if noise is not None else zero,
            jnp.asarray(noise.entry_slip_std, jnp.float32)
            if noise is not None else zero,
            jnp.asarray(noise.stop_slip_std, jnp.float32)
            if noise is not None else zero,
            jnp.asarray(noise.target_slip_std, jnp.float32)
            if noise is not None else zero,
            log_s0, sig_dt, drift,
            jnp.asarray(beta, jnp.float32) if beta is not None else zero,
            jnp.asarray(weights, jnp.float32) if weights is not None else zero]
    sym = jnp.stack([jnp.broadcast_to(c, (n_sym,)) for c in cols], axis=1)
    return jnp.pad(sym, ((0, 0), (0, 128 - sym.shape[1])))[:, None, :]


@functools.partial(
    jax.jit,
    static_argnames=("paths_per_symbol", "num_bars", "dt", "sampler",
                     "block_len", "heston", "interpret"),
)
def _mc_paths_pallas_gated_universe_jit(
    seed,
    levels: Levels,        # batched [S, L<=8]
    params: EngineParams,  # contact_prox/stop_padding/tp_padding: scalar or [S]
    s0,                    # f32[S]
    sigma,                 # f32[S]
    gate=None,
    *,
    paths_per_symbol: int,
    num_bars: int = 40,
    dt: float = 1.0 / (390.0 * 252.0),
    noise=None,               # montecarlo.McNoise; leaves may be [S]
    sampler: str = "gbm",     # "gbm" | "bootstrap" (per-symbol recorded bars)
    hist_bars=None,           # PathBars-like [S, H] o/h/l/c histories
    block_len: int = 10,      # block_bootstrap: contiguous run length
    heston=None,              # heston: dict(v0, kappa, theta, xi, rho)
    derived=None,             # host-computed (log_s0, sig_dt, drift) [S] triple
    interpret=False,
    external_uniforms=None,   # f32[S, n_blocks, 4*num_bars (8* w/ noise), 8, GATED_LANES]
                              # (bootstrap: 2*num_bars (6*) rows)
) -> PathStats:
    """Per-symbol fused gated-lifecycle MC over a (symbol, block) grid;
    returns [S]-batched PathStats with lifecycle semantics.  Engine knobs
    (prox, stop_pad, tp_pad) and McNoise stds ride the per-symbol slab, so a
    universe can mix per-symbol calibrations in one launch.
    ``sampler="bootstrap"`` streams each symbol's OWN recorded bars
    (``hist_bars`` [S, H]-batched — the reference MC is a per-symbol
    recorded-bar replay, :3353-3538)."""
    from ..sim.gatedpath import GateConfig

    if gate is None:
        gate = GateConfig.from_params(params)
    if paths_per_symbol % GATED_BLOCK != 0:
        raise ValueError(f"paths_per_symbol must be a multiple of {GATED_BLOCK}")
    if num_bars % 2 != 0:
        raise ValueError("num_bars must be even (paired Box-Muller draws)")
    lv_price = jnp.asarray(levels.price)
    n_sym, n_lv = lv_price.shape
    if n_lv > 8:
        raise ValueError("pallas gated universe kernel supports up to 8 level slots")
    if sampler not in ("gbm", "bootstrap", "block_bootstrap", "heston"):
        raise ValueError(
            "samplers: 'gbm' | 'bootstrap' | 'block_bootstrap' | 'heston'")
    if sampler in ("bootstrap", "block_bootstrap") and hist_bars is None:
        raise ValueError("sampler='bootstrap' requires hist_bars ([S, H] "
                         "recorded o/h/l/c histories, one row per symbol)")
    n_blocks = paths_per_symbol // GATED_BLOCK
    use_noise = noise is not None
    u_rows = _gated_stride(sampler, use_noise) * (num_bars // 2)
    if sampler in ("bootstrap", "block_bootstrap"):
        hist, hist_len = _hist_slab_batched(hist_bars, GATED_LANES)
    else:
        hist, hist_len = None, 0

    external_rng = external_uniforms is not None
    kernel = functools.partial(
        _gated_universe_kernel, num_bars=num_bars, dt=dt, max_levels=n_lv,
        external_rng=external_rng, use_noise=use_noise,
        sampler=sampler, hist_len=hist_len, block_len=int(block_len) if sampler == "block_bootstrap" else 0,
        heston=heston,
    )
    gvec = jnp.stack([
        jnp.asarray(gate.q_min_prob, jnp.float32),
        jnp.asarray(gate.touch_limit, jnp.float32),
        jnp.asarray(gate.cooldown_bars, jnp.float32),
        jnp.asarray(gate.touch_gap_bars, jnp.float32),
        jnp.asarray(gate.use_confidence, jnp.float32),
        jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
    ]).reshape(1, 8)
    lp, lvv = _level_rows(lv_price, levels.valid, n_lv)
    lk = jnp.broadcast_to(
        jnp.asarray(levels.kind, jnp.float32)[..., None], (n_sym, n_lv, 128))
    sym = _symbol_slab(params, s0, sigma, n_sym, noise=noise,
                       derived=derived)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)

    acc = pl.pallas_call(
        kernel,
        grid=(n_sym, n_blocks),
        in_specs=[
            pl.BlockSpec((1, 1), lambda sy, bl: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8), lambda sy, bl: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 128), lambda sy, bl: (sy, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_lv, 128), lambda sy, bl: (sy, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_lv, 128), lambda sy, bl: (sy, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_lv, 128), lambda sy, bl: (sy, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + ([
            pl.BlockSpec((1,) + hist.shape[1:], lambda sy, bl: (sy, 0, 0),
                         memory_space=pltpu.VMEM)
        ] if hist is not None else []) + ([
            pl.BlockSpec((1, 1, u_rows, GATED_SUB, GATED_LANES),
                         lambda sy, bl: (sy, bl, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        ] if external_rng else []),
        out_specs=pl.BlockSpec((1, 8, 128), lambda sy, bl: (sy, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_sym, 8, 128), jnp.float32),
        interpret=interpret,
    )(*((seed_arr, gvec, sym, lp, lvv, lk)
         + ((hist,) if hist is not None else ())
         + ((jnp.asarray(external_uniforms, jnp.float32),)
            if external_rng else ())))

    return _unpack_acc_gated(acc)


def _unpack_acc_gated(acc) -> PathStats:
    """Gated accumulator → PathStats with lifecycle semantics (n_tp/n_stop are
    trade-level wins/losses; hist/extremes cover per-path TOTAL R)."""
    tot = acc[..., ROW_SUM, :]
    entered = tot[..., 1]
    mn = jnp.where(entered > 0, acc[..., ROW_MIN, 0], jnp.inf)
    mx = jnp.where(entered > 0, acc[..., ROW_MAX, 0], -jnp.inf)
    return PathStats(
        n=tot[..., 0], n_entered=entered, n_tp=tot[..., 2], n_stop=tot[..., 3],
        n_open=tot[..., 4], sum_r=tot[..., 5], sum_r2=tot[..., 6],
        min_r=mn, max_r=mx,
        sum_trades=tot[..., 7], sum_dd=tot[..., 8],
        max_dd=acc[..., ROW_MAXDD, 0],
        hist=acc[..., ROW_HIST, :HIST_BINS],
        hist_lo=LIFE_HIST_LO, hist_hi=LIFE_HIST_HI,
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_paths", "num_bars", "s0", "mu", "sigma", "dt",
                     "lanes", "sampler", "block_len", "heston", "antithetic",
                     "interpret"),
)
def _mc_paths_pallas_gated_jit(
    seed,
    levels: Levels,
    params: EngineParams,
    gate=None,               # sim.gatedpath.GateConfig (traced values OK)
    *,
    num_paths: int,
    num_bars: int = 40,
    s0: float = 100.0,
    mu: float = 0.0,
    sigma: float = 0.15,
    dt: float = 1.0 / (390.0 * 252.0),
    lanes: int = GATED_LANES,
    noise=None,               # montecarlo.McNoise — per-entry execution noise
    sampler: str = "gbm",     # "gbm" | "bootstrap" (recorded-bar resampling)
    hist_bars=None,           # PathBars-like 1-D o/h/l/c history (bootstrap)
    block_len: int = 10,      # block_bootstrap: contiguous run length
    heston=None,              # heston: dict(v0, kappa, theta, xi, rho)
    antithetic: bool = False, # lane-paired sign-flipped normals (gbm only)
    interpret=False,
    external_uniforms=None,   # f32[n_blocks, 4*num_bars (8* with noise), 8, lanes]
                              # (bootstrap: 2*num_bars (6*) rows)
) -> PathStats:
    """Fused-kernel engine-gated MC: the sim/gatedpath.py lifecycle entirely
    on-chip, including the McNoise per-entry execution-noise knobs.  Same
    PathStats lifecycle contract as ``mc_paths_gated``; the noise stream is
    the per-core hardware PRNG (statistical agreement with the XLA pipeline;
    exact parity is tested under injected uniforms).
    ``sampler="bootstrap"`` resamples RECORDED bar geometry in-loop
    (ops/pathgen.bootstrap_paths's scaled analog — the reference MC walks
    recorded bars, :3353-3538) instead of generating GBM."""
    from ..sim.gatedpath import GateConfig

    if gate is None:
        gate = GateConfig.from_params(params)
    block = GATED_SUB * lanes
    if num_paths % block != 0:
        raise ValueError(f"num_paths must be a multiple of {block}")
    if num_bars % 2 != 0:
        raise ValueError("num_bars must be even (paired Box-Muller draws)")
    if levels.max_levels > 8:
        raise ValueError("pallas gated kernel supports up to 8 level slots")
    if sampler not in ("gbm", "bootstrap", "block_bootstrap", "heston"):
        raise ValueError(
            "samplers: 'gbm' | 'bootstrap' | 'block_bootstrap' | 'heston'")
    if sampler in ("bootstrap", "block_bootstrap") and hist_bars is None:
        raise ValueError("sampler='bootstrap' requires hist_bars")
    if antithetic and sampler != "gbm":
        raise ValueError("kernel antithetic pairs gbm normals only")
    if antithetic and lanes % 256 != 0:
        raise ValueError("antithetic needs lanes % 256 == 0 (half-tile pairs)")
    n_blocks = num_paths // block

    drift = (mu - 0.5 * sigma * sigma) * dt
    sig_dt = sigma * float(np.sqrt(dt))
    external_rng = external_uniforms is not None
    use_noise = noise is not None
    u_rows = _gated_stride(sampler, use_noise) * (num_bars // 2)
    if sampler in ("bootstrap", "block_bootstrap"):
        hist, hist_len = _hist_slab(hist_bars, lanes)
    else:
        hist, hist_len = None, 0
    kernel = functools.partial(
        _gated_kernel, num_bars=num_bars, s0=s0, drift=drift, sig_dt=sig_dt,
        max_levels=levels.max_levels, lanes=lanes, external_rng=external_rng,
        use_noise=use_noise, sampler=sampler, hist_len=hist_len,
        block_len=int(block_len) if sampler == "block_bootstrap" else 0,
        heston=heston, antithetic=bool(antithetic),
    )
    zero = jnp.float32(0.0)
    knobs = jnp.stack([
        jnp.asarray(params.contact_prox, jnp.float32),
        jnp.asarray(params.stop_padding, jnp.float32),
        jnp.asarray(params.tp_padding, jnp.float32),
        zero,
        jnp.asarray(noise.level_jitter_std, jnp.float32) if use_noise else zero,
        jnp.asarray(noise.entry_slip_std, jnp.float32) if use_noise else zero,
        jnp.asarray(noise.stop_slip_std, jnp.float32) if use_noise else zero,
        jnp.asarray(noise.target_slip_std, jnp.float32) if use_noise else zero,
    ]).reshape(1, 8)
    gvec = jnp.stack([
        jnp.asarray(gate.q_min_prob, jnp.float32),
        jnp.asarray(gate.touch_limit, jnp.float32),
        jnp.asarray(gate.cooldown_bars, jnp.float32),
        jnp.asarray(gate.touch_gap_bars, jnp.float32),
        jnp.asarray(gate.use_confidence, jnp.float32),
        jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
    ]).reshape(1, 8)
    lp, lv = _level_rows(levels.price, levels.valid, levels.max_levels)
    lk = jnp.broadcast_to(
        jnp.asarray(levels.kind, jnp.float32)[:, None], (levels.max_levels, 128))
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)

    acc = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((levels.max_levels, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((levels.max_levels, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((levels.max_levels, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + ([
            pl.BlockSpec(hist.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        ] if hist is not None else []) + ([
            pl.BlockSpec((1, u_rows, GATED_SUB, lanes),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
        ] if external_rng else []),
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )(*((seed_arr, knobs, gvec, lp, lv, lk)
         + ((hist,) if hist is not None else ())
         + ((jnp.asarray(external_uniforms, jnp.float32),)
            if external_rng else ())))

    return _unpack_acc_gated(acc)


# --------------------------------------------------------------------------
# kernel 3: stop/target grid sweep with common random numbers
# --------------------------------------------------------------------------

def _sweep_kernel(
    seed_ref,          # SMEM (1,1) i32
    knobs_ref,         # SMEM (1,4) f32: [prox, _, _, _]
    grid_ref,          # SMEM (G, 2) f32 rows: [stop_pad, tp_pad]
    level_price_ref,   # VMEM (8, 128) f32
    level_valid_ref,   # VMEM (8, 128) f32
    *refs,             # [hist_ref (bootstrap)], acc_ref
    num_bars: int,
    s0: float,
    drift: float,
    sig_dt: float,
    max_levels: int,
    n_grid: int,
    sampler: str = "gbm",
    hist_len: int = 0,
    block_len: int = 0,
    heston=None,
):
    """One path block evaluated against the ENTIRE stop/target grid: path
    generation + first-contact detection run once, then each configuration
    replays against the same bars (common random numbers — the classic
    variance-reduction layout for comparing configurations).
    ``sampler="bootstrap"`` generates the shared bars by recorded-bar
    resampling instead (every grid row replays the same resampled
    history walk, :3353-3538)."""
    w, b = num_bars, LANES
    refs = list(refs)
    hist_ref = refs.pop(0) if sampler in ("bootstrap", "block_bootstrap") else None
    (acc_ref,) = refs
    pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))

    if sampler in ("bootstrap", "block_bootstrap"):
        lens = (w, None, None, None, 1)      # u_idx block + tie row
    elif sampler == "heston":
        # ks 9/10 are the vol-shock pair; the PRNG draw ORDER (u1, u2, uq1,
        # uq2, u3, u4, tie) matches the single kernel's _heston_block call
        # sequence so same-seed sweep rows reproduce single runs bitwise
        lens = (w // 2, w // 2, w, w, 1, None, None, None, None,
                w // 2, w // 2)
    else:
        lens = (w // 2, w // 2, w, w, 1)     # paired Box-Muller layout

    def draw(k):
        return _uniform((lens[k], b))

    if sampler in ("bootstrap", "block_bootstrap"):
        bars = _bootstrap_block(
            lambda: draw(0),
            lambda ch, off, width: hist_ref[ch:ch + 1, off:off + width],
            w=w, b=b, hist_len=hist_len, log_s0=jnp.float32(np.log(s0)),
            block_len=block_len,
        )
    elif sampler == "heston":
        bars = _heston_block(draw, lambda k: draw(9 + k), w=w, b=b,
                             hes=heston, log_s0=jnp.float32(np.log(s0)))
    else:
        bars = _gbm_block(
            draw, w=w, b=b, drift=jnp.float32(drift),
            sig_dt=jnp.float32(sig_dt), log_s0=jnp.float32(np.log(s0)),
        )
    ct = _first_contact(
        bars, lambda i: (level_price_ref[i, 0], level_valid_ref[i, 0]),
        max_levels, knobs_ref[0, 0], w=w, b=b,
    )
    tie_u = draw(4)  # shared across configs (CRN)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        _init_acc(acc_ref)

    for g in range(n_grid):
        rep = _replay_config(ct, bars, grid_ref[g, 0], grid_ref[g, 1], tie_u, w=w)
        _accumulate(acc_ref, (g,), rep, ct, b=b)


@functools.partial(
    jax.jit,
    static_argnames=("num_paths", "num_bars", "s0", "mu", "sigma", "dt",
                     "sampler", "block_len", "heston", "interpret"),
)
def _mc_paths_pallas_sweep_jit(
    seed,
    levels: Levels,
    params: EngineParams,
    grid_stops,            # f32[G]
    grid_tps,              # f32[G]
    *,
    num_paths: int,
    num_bars: int = 40,
    s0: float = 100.0,
    mu: float = 0.0,
    sigma: float = 0.15,
    dt: float = 1.0 / (390.0 * 252.0),
    sampler: str = "gbm",     # "gbm" | "bootstrap" (recorded-bar resampling)
    hist_bars=None,           # PathBars-like 1-D o/h/l/c history (bootstrap)
    block_len: int = 10,      # block_bootstrap: contiguous run length
    heston=None,              # static (v0, kappa, theta, xi, rho, mu, dt) tuple
    interpret=False,
) -> PathStats:
    """Whole stop/target grid per path block with shared path draws (CRN).
    Returns [G]-batched PathStats; path generation amortizes across the grid,
    so G configs cost far less than G independent kernel runs.
    ``sampler="bootstrap"`` sweeps the grid over recorded-bar resampled
    paths (every row replays the same resampled history walk,
    :3353-3538)."""
    if num_paths % LANES != 0:
        raise ValueError(f"num_paths must be a multiple of {LANES}")
    if sampler in ("gbm", "heston") and num_bars % 2 != 0:
        raise ValueError("num_bars must be even (paired Box-Muller draws)")
    if levels.max_levels > 8:
        raise ValueError("pallas kernel supports up to 8 level slots")
    if sampler not in ("gbm", "bootstrap", "block_bootstrap", "heston"):
        raise ValueError(
            "samplers: 'gbm' | 'bootstrap' | 'block_bootstrap' | 'heston'")
    if sampler in ("bootstrap", "block_bootstrap") and hist_bars is None:
        raise ValueError("sampler='bootstrap' requires hist_bars")
    grid_stops = jnp.asarray(grid_stops, jnp.float32).reshape(-1)
    grid_tps = jnp.asarray(grid_tps, jnp.float32).reshape(-1)
    g = grid_stops.shape[0]
    if grid_tps.shape[0] != g:
        raise ValueError("grid_stops and grid_tps must have equal length")
    n_blocks = num_paths // LANES

    if sampler in ("bootstrap", "block_bootstrap"):
        hist, hist_len = _hist_slab_flat(hist_bars)
    else:
        hist, hist_len = None, 0
    drift = (mu - 0.5 * sigma * sigma) * dt
    sig_dt = sigma * float(np.sqrt(dt))
    kernel = functools.partial(
        _sweep_kernel, num_bars=num_bars, s0=s0, drift=drift, sig_dt=sig_dt,
        max_levels=levels.max_levels, n_grid=g,
        sampler=sampler, hist_len=hist_len,
        block_len=int(block_len) if sampler == "block_bootstrap" else 0,
        heston=heston,
    )
    knobs = jnp.stack([
        jnp.asarray(params.contact_prox, jnp.float32),
        jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
    ]).reshape(1, 4)
    grid = jnp.stack([grid_stops, grid_tps], axis=1)  # (G, 2)
    lp, lv = _level_rows(levels.price, levels.valid, levels.max_levels)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)

    acc = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((g, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((levels.max_levels, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((levels.max_levels, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + ([
            pl.BlockSpec(hist.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        ] if hist is not None else []),
        out_specs=pl.BlockSpec((g, 8, 128), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, 8, 128), jnp.float32),
        interpret=interpret,
    )(*((seed_arr, knobs, grid, lp, lv)
         + ((hist,) if hist is not None else ())))

    return _unpack_acc(acc)


def mc_paths_pallas_sweep(seed, levels, params, grid_stops, grid_tps, *,
                          sampler="gbm", heston=None, mu=0.0,
                          dt=1.0 / (390.0 * 252.0), **kw):
    """Public first-contact sweep entry (see ``_mc_paths_pallas_sweep_jit``):
    freezes the heston dict into the static float tuple the kernel is
    specialized on."""
    hes = _heston_tuple(heston, mu, dt) if sampler == "heston" else None
    return _mc_paths_pallas_sweep_jit(
        seed, levels, params, grid_stops, grid_tps, sampler=sampler,
        heston=hes, mu=mu, dt=dt, **kw)


# --------------------------------------------------------------------------
# kernel 5: GATE-knob grid sweep over the gated lifecycle (CRN)
# --------------------------------------------------------------------------

def _gated_sweep_kernel(
    seed_ref,          # SMEM (1,1) i32
    knobs_ref,         # SMEM (1,4) f32: [prox, _, _, _]
    grid_ref,          # SMEM (G, 12) f32 rows: [stop_pad, tp_pad, qmin,
                       #   touch_limit, cooldown_bars, touch_gap_bars,
                       #   use_conf, _, lvl_jit, entry_slip, stop_slip,
                       #   tgt_slip]
    level_price_ref,   # VMEM (L, 128) f32
    level_valid_ref,   # VMEM (L, 128) f32
    level_kind_ref,    # VMEM (L, 128) f32
    *refs,             # [hist_ref (bootstrap)], [u_ref (external rng,
                       # interpret tests only)], acc_ref
    num_bars: int,
    s0: float,
    drift: float,
    sig_dt: float,
    max_levels: int,
    n_grid: int,
    external_rng: bool = False,
    use_noise: bool = False,
    sampler: str = "gbm",
    hist_len: int = 0,
    block_len: int = 0,
    heston=None,
):
    """One path block replayed through the FULL gated lifecycle for every
    grid configuration.  Common random numbers come from RESEEDING: the
    hardware PRNG is re-seeded to the block's seed before each config's
    lifecycle run, so every configuration consumes the identical uniform
    stream (bars, tie coins — and with noise, the SAME per-entry noise
    normals scaled by each row's stds) — the sweep compares decision
    surfaces, not sampling noise.  Unlike the first-contact sweep (which
    generates once and replays barriers), gate knobs change which trades
    OPEN, so the whole generate+trade loop re-runs per config; generation is
    ~40% of the loop, an acceptable price for zero cross-config variance.
    ``sampler="bootstrap"`` sweeps the grid over recorded-bar resampled
    paths — identical resample indices per row (CRN on recorded history)."""
    s, b = GATED_SUB, GATED_LANES
    stride = _gated_stride(sampler, use_noise)
    refs = list(refs)
    if sampler in ("bootstrap", "block_bootstrap"):
        hist_ref = refs.pop(0)
        hist = (lambda ch, ti: hist_ref[8 * ch:8 * (ch + 1),
                                        ti * 128:(ti + 1) * 128],
                hist_len)
    else:
        hist = None
    if external_rng:
        u_ref, acc_ref = refs

        def draw(t2, k):
            return u_ref[0, pl.ds(t2 * stride + k, 1)].reshape(s, b)

        def reseed():
            pass
    else:
        (acc_ref,) = refs

        def draw(t2, k):
            return _uniform((s, b))

        def reseed():
            pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))

    @pl.when(pl.program_id(0) == 0)
    def _init():
        _init_acc(acc_ref)

    for g in range(n_grid):
        reseed()
        final = _gated_lifecycle_loop(
            draw, lambda i: (level_price_ref[i, 0], level_valid_ref[i, 0],
                             level_kind_ref[i, 0]),
            num_bars=num_bars, drift=jnp.float32(drift),
            sig_dt=jnp.float32(sig_dt), log_s0=jnp.float32(np.log(s0)),
            knobs=(knobs_ref[0, 0], grid_ref[g, 0], grid_ref[g, 1]),
            gates=tuple(grid_ref[g, 2 + k] for k in range(5)),
            max_levels=max_levels,
            noise=(tuple(grid_ref[g, 8 + k] for k in range(4))
                   if use_noise else None),
            sampler=sampler, hist=hist, block_len=block_len,
        heston=heston,
        )
        _gated_accumulate(acc_ref, (g,), final, n_paths=s * b)


@functools.partial(
    jax.jit,
    static_argnames=("num_paths", "num_bars", "s0", "mu", "sigma", "dt",
                     "sampler", "block_len", "heston", "interpret"),
)
def _mc_paths_pallas_gated_sweep_jit(
    seed,
    levels: Levels,
    params: EngineParams,
    grid_stops,            # f32[G]
    grid_tps,              # f32[G]
    grid_gate=None,        # GateConfig with [G] (or scalar) leaves
    *,
    num_paths: int,
    num_bars: int = 40,
    s0: float = 100.0,
    mu: float = 0.0,
    sigma: float = 0.15,
    dt: float = 1.0 / (390.0 * 252.0),
    noise=None,               # montecarlo.McNoise; leaves may be [G]
    sampler: str = "gbm",     # "gbm" | "bootstrap" (recorded-bar resampling)
    hist_bars=None,           # PathBars-like 1-D o/h/l/c history (bootstrap)
    block_len: int = 10,      # block_bootstrap: contiguous run length
    heston=None,              # heston: dict(v0, kappa, theta, xi, rho)
    interpret=False,
    external_uniforms=None,   # f32[n_blocks, 4*num_bars (8* w/ noise), 8, GATED_LANES]
                              # (bootstrap: 2*num_bars (6*) rows)
) -> PathStats:
    """Gate-knob grid sweep over the fused gated lifecycle with common random
    numbers: the grid axis carries (stop_pad, tp_pad, q_min_prob, touch_limit,
    cooldown_bars, touch_gap_bars, use_confidence) tuples, so the decision
    surface the reference engine raises (touch budgets, Q_MIN_PROB) sweeps in
    ONE kernel launch over shared paths.  ``noise`` (McNoise; scalar or [G]
    leaves) adds per-entry execution noise — every row sees the SAME noise
    normals scaled by its own stds.  ``sampler="bootstrap"`` sweeps the grid
    over recorded-bar resampled paths (identical resample indices per row —
    CRN on recorded history, :3353-3538).  Returns [G]-batched lifecycle
    PathStats."""
    from ..sim.gatedpath import GateConfig

    if grid_gate is None:
        grid_gate = GateConfig.from_params(params)
    if num_paths % GATED_BLOCK != 0:
        raise ValueError(f"num_paths must be a multiple of {GATED_BLOCK}")
    if num_bars % 2 != 0:
        raise ValueError("num_bars must be even (paired Box-Muller draws)")
    if levels.max_levels > 8:
        raise ValueError("pallas gated sweep supports up to 8 level slots")
    if sampler not in ("gbm", "bootstrap", "block_bootstrap", "heston"):
        raise ValueError(
            "samplers: 'gbm' | 'bootstrap' | 'block_bootstrap' | 'heston'")
    if sampler in ("bootstrap", "block_bootstrap") and hist_bars is None:
        raise ValueError("sampler='bootstrap' requires hist_bars")
    grid_stops = jnp.asarray(grid_stops, jnp.float32).reshape(-1)
    grid_tps = jnp.asarray(grid_tps, jnp.float32).reshape(-1)
    g = grid_stops.shape[0]
    if grid_tps.shape[0] != g:
        raise ValueError("grid_stops and grid_tps must have equal length")
    n_blocks = num_paths // GATED_BLOCK
    use_noise = noise is not None
    u_rows = _gated_stride(sampler, use_noise) * (num_bars // 2)
    if sampler in ("bootstrap", "block_bootstrap"):
        hist, hist_len = _hist_slab(hist_bars, GATED_LANES)
    else:
        hist, hist_len = None, 0

    def gcol(x):
        return jnp.broadcast_to(jnp.asarray(x, jnp.float32).reshape(-1), (g,))

    zcol = jnp.zeros((g,), jnp.float32)
    grid = jnp.stack([
        grid_stops, grid_tps,
        gcol(grid_gate.q_min_prob), gcol(grid_gate.touch_limit),
        gcol(grid_gate.cooldown_bars), gcol(grid_gate.touch_gap_bars),
        gcol(grid_gate.use_confidence), zcol,
        gcol(noise.level_jitter_std) if use_noise else zcol,
        gcol(noise.entry_slip_std) if use_noise else zcol,
        gcol(noise.stop_slip_std) if use_noise else zcol,
        gcol(noise.target_slip_std) if use_noise else zcol,
    ], axis=1)  # (G, 12)

    drift = (mu - 0.5 * sigma * sigma) * dt
    sig_dt = sigma * float(np.sqrt(dt))
    external_rng = external_uniforms is not None
    kernel = functools.partial(
        _gated_sweep_kernel, num_bars=num_bars, s0=s0, drift=drift,
        sig_dt=sig_dt, max_levels=levels.max_levels, n_grid=g,
        external_rng=external_rng, use_noise=use_noise,
        sampler=sampler, hist_len=hist_len, block_len=int(block_len) if sampler == "block_bootstrap" else 0,
        heston=heston,
    )
    knobs = jnp.stack([
        jnp.asarray(params.contact_prox, jnp.float32),
        jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
    ]).reshape(1, 4)
    lp, lv = _level_rows(levels.price, levels.valid, levels.max_levels)
    lk = jnp.broadcast_to(
        jnp.asarray(levels.kind, jnp.float32)[:, None], (levels.max_levels, 128))
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)

    acc = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((g, 12), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((levels.max_levels, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((levels.max_levels, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((levels.max_levels, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + ([
            pl.BlockSpec(hist.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        ] if hist is not None else []) + ([
            pl.BlockSpec((1, u_rows, GATED_SUB, GATED_LANES),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
        ] if external_rng else []),
        out_specs=pl.BlockSpec((g, 8, 128), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, 8, 128), jnp.float32),
        interpret=interpret,
    )(*((seed_arr, knobs, grid, lp, lv, lk)
         + ((hist,) if hist is not None else ())
         + ((jnp.asarray(external_uniforms, jnp.float32),)
            if external_rng else ())))

    return _unpack_acc_gated(acc)


def mc_paths_pallas_gated(seed, levels, params, gate=None, *, sampler="gbm",
                          heston=None, mu=0.0,
                          dt=1.0 / (390.0 * 252.0), **kw):
    """Public gated-kernel entry (see ``_mc_paths_pallas_gated_jit``): thin
    unjitted shim that freezes the heston dict into the static float tuple
    the kernel is specialized on (dicts are unhashable for jit statics)."""
    hes = _heston_tuple(heston, mu, dt) if sampler == "heston" else None
    return _mc_paths_pallas_gated_jit(
        seed, levels, params, gate, sampler=sampler, heston=hes, mu=mu,
        dt=dt, **kw)


def mc_paths_pallas_gated_sweep(seed, levels, params, grid_stops, grid_tps,
                                grid_gate=None, *, sampler="gbm",
                                heston=None, mu=0.0,
                                dt=1.0 / (390.0 * 252.0), **kw):
    """Public gated-sweep entry (see ``_mc_paths_pallas_gated_sweep_jit``)."""
    hes = _heston_tuple(heston, mu, dt) if sampler == "heston" else None
    return _mc_paths_pallas_gated_sweep_jit(
        seed, levels, params, grid_stops, grid_tps, grid_gate,
        sampler=sampler, heston=hes, mu=mu, dt=dt, **kw)


def mc_paths_pallas_gated_universe(seed, levels, params, s0, sigma,
                                   gate=None, *, sampler="gbm", heston=None,
                                   dt=1.0 / (390.0 * 252.0), **kw):
    """Public gated-universe entry (see
    ``_mc_paths_pallas_gated_universe_jit``); derives (log_s0, sig_dt,
    drift) per symbol ON HOST (``_derived_consts``) so universe runs are
    bit-identical to single-config runs of the same symbols."""
    hes = _heston_tuple(heston, 0.0, dt) if sampler == "heston" else None
    return _mc_paths_pallas_gated_universe_jit(
        seed, levels, params, s0, sigma, gate, sampler=sampler, heston=hes,
        dt=dt, derived=_derived_consts(s0, sigma, dt), **kw)


# --------------------------------------------------------------------------
# kernel 4c: CORRELATED gated universe + on-chip portfolio risk
# --------------------------------------------------------------------------

def _gated_corr_kernel(
    seed_ref,          # SMEM (1,2) i32: [seed, block_offset]
    gate_ref,          # SMEM (1,8) f32 gate knobs
    sym_ref,           # VMEM (1, 1, 128) f32 per-symbol row (_symbol_slab
                       #   cols incl. SYM_LOG_S0..SYM_DRIFT, SYM_BETA,
                       #   SYM_WEIGHT)
    level_price_ref,   # VMEM (1, L, 128) f32 — THIS symbol's level slab
    level_valid_ref,   # VMEM (1, L, 128) f32
    level_kind_ref,    # VMEM (1, L, 128) f32
    *refs,             # [hist_ref (bootstrap, THIS symbol's table slab)],
                       # [um_ref, u_ref (external rng)], acc_ref, port_ref,
                       # curve_ref + 4 portfolio scratch tiles
    num_bars: int,
    max_levels: int,
    n_sym: int,
    lanes: int,
    external_rng: bool = False,
    use_noise: bool = False,
    sampler: str = "gbm",
    hist_len: int = 0,
    block_len: int = 0,
    heston=None,
    antithetic: bool = False,
):
    """Correlated gated universe (parallel/portfolio.py model) on a
    (block, symbol) grid — SYMBOL IS THE INNER AXIS so one path block's
    portfolio scratch stays resident while every symbol walks the same
    market shocks:

      z_s = beta_s * z_mkt + sqrt(1 - beta_s^2) * eps_s

    The market pair is a symbol-INDEPENDENT stream (reseeded per (block,
    step) from a market salt, or read from the shared ``market_uniforms``
    ref in tests), so path i sees the same market across symbols.  Each
    symbol's lifecycle adds its weighted per-bar equity into the
    ``curve_ref`` scratch; the last symbol folds the combined curve into
    the portfolio accumulator — final R histogram (→ VaR/CVaR of the BOOK)
    plus TRUE time-tracked portfolio drawdown (peak over the combined
    curve), which no per-symbol aggregation can produce.

    Samplers ride the market/idio split (ops/pallas_engine corr mirror):
    bootstrap/block_bootstrap draw the resample indices from the MARKET
    stream (JOINT recorded days); heston draws a SECOND market pair for
    the variance shock's factor component."""
    s, b = GATED_SUB, lanes
    stride = _gated_stride(sampler, use_noise)
    m_stride = 4 if sampler == "heston" else 2
    bi = pl.program_id(0)
    si = pl.program_id(1)
    refs = list(refs)
    if sampler in ("bootstrap", "block_bootstrap"):
        hist_ref = refs.pop(0)
        hist = (lambda ch, ti: hist_ref[0, 8 * ch:8 * (ch + 1),
                                        ti * 128:(ti + 1) * 128],
                hist_len)
    else:
        hist = None
    if external_rng:
        um_ref = refs.pop(0)
        u_ref = refs.pop(0)
    acc_ref, port_ref, curve_ref, pt_ref, pw_ref, plo_ref, po_ref = refs

    if external_rng:
        def draw(t2, k):
            if k >= stride:        # market rows (shared across symbols)
                blk = um_ref[0, pl.ds(t2 * m_stride + (k - stride), 1)]
            else:
                blk = u_ref[0, 0, pl.ds(t2 * stride + k, 1)]
            return blk.reshape(s, b)
    else:
        seed0 = seed_ref[0, 0]
        # global block index: local grid step + the launch's block offset
        # (sharded runs give device d offset d*blocks_per_dev, so the union
        # of (market, idio) salts — and every count — is bitwise independent
        # of the mesh shape, the same property the per-block kernels get
        # from seed+block seeding)
        gbi = bi + seed_ref[0, 1]

        def draw(t2, k):
            # per-step reseeding: the market stream hashes (seed, block,
            # step) ONLY — every symbol regenerates the same market draws —
            # while the idiosyncratic stream also folds the symbol in.
            # int32 multiply-mix wraps; constants are odd and < 2^31.
            if k == stride:
                pltpu.prng_seed(seed0 + jnp.int32(0x5bd1e995)
                                + gbi * jnp.int32(0x27D4EB2F)
                                + t2 * jnp.int32(0x165667B1))
            if k == 0:
                pltpu.prng_seed(seed0 + (si + 1) * jnp.int32(0x61C88647)
                                + gbi * jnp.int32(0x7FEB352D)
                                + t2 * jnp.int32(0x45D9F3B5))
            return _uniform((s, b))

    @pl.when(jnp.logical_and(bi == 0, si == 0))
    def _init():
        _init_acc(acc_ref)
        _init_acc(port_ref)

    @pl.when(si == 0)
    def _zero_port():
        curve_ref[...] = jnp.zeros(curve_ref.shape, jnp.float32)
        for r in (pt_ref, pw_ref, plo_ref, po_ref):
            r[...] = jnp.zeros(r.shape, jnp.float32)

    final = _gated_lifecycle_loop(
        draw, lambda i: (level_price_ref[0, i, 0], level_valid_ref[0, i, 0],
                         level_kind_ref[0, i, 0]),
        num_bars=num_bars, drift=sym_ref[0, 0, SYM_DRIFT],
        sig_dt=sym_ref[0, 0, SYM_SIG_DT], log_s0=sym_ref[0, 0, SYM_LOG_S0],
        knobs=(sym_ref[0, 0, 2], sym_ref[0, 0, 3], sym_ref[0, 0, 4]),
        gates=tuple(gate_ref[0, k] for k in range(5)),
        max_levels=max_levels, lanes=lanes,
        noise=(tuple(sym_ref[0, 0, 5 + k] for k in range(4))
               if use_noise else None),
        sampler=sampler, hist=hist, block_len=block_len, heston=heston,
        antithetic=antithetic,
        corr=sym_ref[0, 0, SYM_BETA],
        curve=(curve_ref, sym_ref[0, 0, SYM_WEIGHT]),
    )
    side, equity, dd, trades, wins, losses = final
    _gated_accumulate(acc_ref.at[si], (), final, n_paths=s * b)

    pt_ref[...] += trades
    pw_ref[...] += wins
    plo_ref[...] += losses
    po_ref[...] = jnp.maximum(po_ref[...], jnp.abs(side))

    @pl.when(si == n_sym - 1)
    def _portfolio():
        finals = curve_ref[num_bars - 1, :, :]
        peak = jnp.zeros((s, b), jnp.float32)
        pdd = jnp.zeros((s, b), jnp.float32)
        for t in range(num_bars):
            row = curve_ref[t, :, :]
            peak = jnp.maximum(peak, row)
            pdd = jnp.maximum(pdd, peak - row)
        _gated_accumulate(
            port_ref, (),
            (po_ref[...], finals, pdd, pt_ref[...], pw_ref[...],
             plo_ref[...]),
            n_paths=s * b)


@functools.partial(
    jax.jit,
    static_argnames=("paths_per_symbol", "num_bars", "dt", "lanes",
                     "sampler", "block_len", "heston", "antithetic",
                     "interpret"),
)
def _mc_paths_pallas_gated_corr_jit(
    seed,
    levels: Levels,        # batched [S, L<=8]
    params: EngineParams,  # knob leaves scalar or [S]
    s0,                    # f32[S]
    sigma,                 # f32[S]
    beta,                  # f32[S] market loadings
    weights,               # f32[S] book weights
    gate=None,
    *,
    paths_per_symbol: int,
    num_bars: int = 40,
    dt: float = 1.0 / (390.0 * 252.0),
    lanes: int = GATED_LANES,
    noise=None,
    derived=None,
    sampler: str = "gbm",
    hist_bars=None,           # PathBars-like [S, H] (bootstrap family)
    block_len: int = 0,
    heston=None,              # static _heston_tuple (wrapper converts)
    antithetic: bool = False, # market AND idio lane-flipped (gbm only)
    interpret=False,
    external_uniforms=None,   # f32[S, n_blocks, stride*(W//2), 8, lanes]
    market_uniforms=None,     # f32[n_blocks, m*(W//2), 8, lanes] (shared;
                              # m = 4 for heston, else 2)
    block_offset=0,           # global index of this launch's first block
                              # (sharded runs: device d passes its start)
):
    """Correlated gated universe, fully fused: per-symbol [S] PathStats AND
    the on-chip portfolio accumulator (final-R histogram + time-tracked book
    drawdown) from ONE launch.  Exactness-tested against
    parallel/portfolio.portfolio_mc under injected uniforms."""
    from ..sim.gatedpath import GateConfig

    if gate is None:
        gate = GateConfig.from_params(params)
    block = GATED_SUB * lanes
    if paths_per_symbol % block != 0:
        raise ValueError(f"paths_per_symbol must be a multiple of {block}")
    if num_bars % 2 != 0:
        raise ValueError("num_bars must be even (paired Box-Muller draws)")
    lv_price = jnp.asarray(levels.price)
    n_sym, n_lv = lv_price.shape
    if n_lv > 8:
        raise ValueError("pallas corr kernel supports up to 8 level slots")
    if (external_uniforms is None) != (market_uniforms is None):
        raise ValueError("external_uniforms and market_uniforms go together")
    n_blocks = paths_per_symbol // block
    use_noise = noise is not None
    external_rng = external_uniforms is not None
    stride = _gated_stride(sampler, use_noise)
    m_stride = 4 if sampler == "heston" else 2
    u_rows = stride * (num_bars // 2)
    if sampler in ("bootstrap", "block_bootstrap"):
        hist, hist_len = _hist_slab_batched(hist_bars, lanes)
    else:
        hist, hist_len = None, 0

    kernel = functools.partial(
        _gated_corr_kernel, num_bars=num_bars, max_levels=n_lv, n_sym=n_sym,
        lanes=lanes, external_rng=external_rng, use_noise=use_noise,
        sampler=sampler, hist_len=hist_len, block_len=block_len,
        heston=heston, antithetic=antithetic,
    )
    gvec = jnp.stack([
        jnp.asarray(gate.q_min_prob, jnp.float32),
        jnp.asarray(gate.touch_limit, jnp.float32),
        jnp.asarray(gate.cooldown_bars, jnp.float32),
        jnp.asarray(gate.touch_gap_bars, jnp.float32),
        jnp.asarray(gate.use_confidence, jnp.float32),
        jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
    ]).reshape(1, 8)
    sym = _symbol_slab(params, s0, sigma, n_sym, noise=noise,
                       derived=derived, beta=beta, weights=weights)
    lp, lv = _level_rows(lv_price, levels.valid, n_lv)
    lk = jnp.broadcast_to(
        jnp.asarray(levels.kind, jnp.float32)[..., None], (n_sym, n_lv, 128))
    seed_arr = jnp.stack([
        jnp.asarray(seed, jnp.int32).reshape(()),
        jnp.asarray(block_offset, jnp.int32).reshape(()),
    ]).reshape(1, 2)

    acc, port = pl.pallas_call(
        kernel,
        grid=(n_blocks, n_sym),
        in_specs=[
            pl.BlockSpec((1, 2), lambda bi, si: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8), lambda bi, si: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 128), lambda bi, si: (si, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_lv, 128), lambda bi, si: (si, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_lv, 128), lambda bi, si: (si, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_lv, 128), lambda bi, si: (si, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + ([
            pl.BlockSpec((1,) + hist.shape[1:], lambda bi, si: (si, 0, 0),
                         memory_space=pltpu.VMEM)
        ] if hist is not None else []) + ([
            pl.BlockSpec((1, m_stride * (num_bars // 2), GATED_SUB, lanes),
                         lambda bi, si: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, u_rows, GATED_SUB, lanes),
                         lambda bi, si: (si, bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] if external_rng else []),
        out_specs=[
            pl.BlockSpec((n_sym, 8, 128), lambda bi, si: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda bi, si: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_sym, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((num_bars, GATED_SUB, lanes), jnp.float32),
            pltpu.VMEM((GATED_SUB, lanes), jnp.float32),
            pltpu.VMEM((GATED_SUB, lanes), jnp.float32),
            pltpu.VMEM((GATED_SUB, lanes), jnp.float32),
            pltpu.VMEM((GATED_SUB, lanes), jnp.float32),
        ],
        interpret=interpret,
    )(*((seed_arr, gvec, sym, lp, lv, lk)
         + ((hist,) if hist is not None else ())
         + ((jnp.asarray(market_uniforms, jnp.float32),
             jnp.asarray(external_uniforms, jnp.float32))
            if external_rng else ())))

    return _unpack_acc_gated(acc), _unpack_acc_gated(port)


def mc_paths_pallas_gated_corr(seed, levels, params, s0, sigma, beta,
                               weights, gate=None, *,
                               dt=1.0 / (390.0 * 252.0), sampler="gbm",
                               hist_bars=None, block_len=10, heston=None,
                               antithetic=False, **kw):
    """Public correlated gated-universe entry (see
    ``_mc_paths_pallas_gated_corr_jit``): host-derives the per-symbol
    constants (``_derived_consts``) like every universe shim.  Samplers:
    ``bootstrap``/``block_bootstrap`` replay JOINT recorded days (shared
    market resample indices over each symbol's own [S, H] ``hist_bars``;
    beta unused, ties idiosyncratic); ``heston`` beta-mixes the market
    factor into both the price and the variance shocks."""
    if sampler not in ("gbm", "bootstrap", "block_bootstrap", "heston"):
        raise ValueError("gated corr kernel samplers: 'gbm' | 'bootstrap' | "
                         "'block_bootstrap' | 'heston'")
    if sampler in ("bootstrap", "block_bootstrap") and hist_bars is None:
        raise ValueError("sampler='bootstrap' requires hist_bars ([S, H] "
                         "recorded o/h/l/c/v histories, one row per symbol)")
    if antithetic and sampler != "gbm":
        raise ValueError("kernel antithetic pairs gbm normals only")
    if antithetic and kw.get("lanes", GATED_LANES) % 256 != 0:
        raise ValueError("antithetic needs lanes % 256 == 0 (half-tile pairs)")
    return _mc_paths_pallas_gated_corr_jit(
        seed, levels, params, s0, sigma, beta, weights, gate, dt=dt,
        derived=_derived_consts(s0, sigma, dt), sampler=sampler,
        hist_bars=hist_bars,
        block_len=int(block_len) if sampler == "block_bootstrap" else 0,
        heston=_heston_tuple(heston, 0.0, dt), antithetic=bool(antithetic),
        **kw)
