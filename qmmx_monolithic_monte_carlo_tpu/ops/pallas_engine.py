"""The FULL 12-gate QMMX engine, fused on-chip (Pallas/TPU).

``sim/enginepath.py`` runs the complete ``evaluate_entry`` ladder
(qmmx_monolithic.py:1492-1771) + OnlinePolicy gate (:3076-3093) + target
escalation (:1950-2012) over generated paths in XLA, streaming OHLCV blocks
through HBM.  This kernel keeps the whole thing in vector registers: bars AND
volumes are generated in-loop (paired Box-Muller, two bars per draw — one
pair for price shocks, one for the volume model's lognormal noise), and every
piece of engine state advances on (8, lanes) f32 tiles:

  lifecycle   side/entry/stop/target/risk0/cooldown/last_dir + equity block
  contact     per-level fresh-touch latch + counts (gate 7, :1557-1587)
  touch mem   per-(level, side) count/last_ts/last_px (:1112-1239) with the
              bounce budget / per-level cooldown / decay multiplier, plus a
              3-deep per-edge tap stack for edge fatigue — the reference's
              30-min tap window only ever consults the newest
              ``fatigue_hits``(=3) in-window taps, and taps age monotonically,
              so the newest 3 taps ARE the exact window statistic
  guard       box = running min/max of bar extremes while ``num_bars <= 61``
              (bitwise the 60-min window, :1247); longer horizons carry
              61-slot extreme rings and take the windowed min/max per bar
              (full-day 390-bar runs stay on-chip); 20-slot volume ring for
              the 5/20-bar MAs, regime/inside_count machine (:1241-1356)
  exits       5-slot close ring + the volume ring drive should_escalate_on_
              target (:897-960): volume-trend-toward-level, approach
              inference, next-level target, stop trailing
  skips       16 first-fail counters (the log-analyzer's table, per block)

All counters are f32 (small integers exact); bool algebra composes with
and/or (Mosaic cannot select over i1); per-lane one-hots gather the per-level
state.  ``decay ** count`` is an unrolled where-product (exact for counts
<= 8, and counts >= max_bounces are budget-blocked anyway) because lax.pow
has no stable Mosaic lowering.

Exactness: with injected uniforms the kernel reproduces
``sim/enginepath.engine_path_replay`` on bars/volumes regenerated from the
same draws — counts, per-gate skip table and escalations exactly, sums to
reduction-order ulps (tests/test_pallas_engine.py).  Hardware mode uses the
per-core PRNG (statistical agreement).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import EngineParams
from ..engine.state import MlModel
from ..models import harvest as HV
from ..models import online_policy as OP
from ..ops import guard as G
from ..ops import touch as T
from ..ops.features import POLICY_FEATURE_DIM
from ..ops.pathgen import VolumeModel
from ..reasons import Reason
from ..sim.enginepath import SKIP_REASONS
from ..sim.pathsim import HIST_BINS, LIFE_HIST_HI, LIFE_HIST_LO, PathStats
from ..types import Levels
from .pallas_mc import (
    HIST_CHANNELS,
    _derived_consts,
    _heston_tuple,
    ROW_HIST,
    ROW_MAX,
    ROW_MAXDD,
    ROW_MIN,
    ROW_SUM,
    _BIG,
    _TWO_PI,
    _hist_gather_tiles,
    _hist_slab,
    _hist_slab_batched,
    _init_acc,
    _level_rows,
    _uniform,
)

ENGINE_SUB = 8
ENGINE_LANES = 256   # ~145 (8, lanes) f32 state tiles → 1.2 MB at 256 lanes.
                     # Swept on v5e round 3 (benchmarks/engine_kernel_bench.py,
                     # 2^24 × 40 bars): 128→24.7M, 256→33.1M, 512→31.9M,
                     # 1024→30.5M paths/s — the engine carries ~5× the gated
                     # kernel's state so narrow wins, but 128 under-fills the
                     # VPU; 256 is the sweet spot.
ENGINE_BLOCK = ENGINE_SUB * ENGINE_LANES
ROW_SKIP = 5         # skip counters cols 0..15, escalations col 16 ('+')
ROW_HARVEST = 6      # packed flywheel harvest (models/harvest.py layout, '+')

GUARD_WINDOW_BARS = 61   # ops/regular.py GUARD_WINDOW_BARS (60-min box, :1247)
MAX_KERNEL_LEVELS = 64   # per-level state/ops grow linearly; the reference's
                         # own recovered session runs 30 levels (:2712-2755)
                         # and its levels editor is unbounded (VERDICT r4
                         # missing #3) — 64 slots compile/validate (round-5
                         # cost curve in RESULTS); 32 is still the sweet spot
                         # and the XLA fallback handles anything beyond
VOL_RING = 20            # longest volume window (guard MA-20 / minute-close 20)
CLOSE_RING = 5           # exits: volume-trend lookback 5, approach needs 2
TAP_SLOTS = 3            # == TouchMemoryParams.fatigue_hits (static, :1127)
_NEVER = -1e9   # "no prior touch/tap" timestamp sentinel (plain float: a
                # jnp constant here would be captured by the kernel closure,
                # which pallas_call rejects)

# 10 uniform blocks per double-bar step: price-normal pair, volume-normal
# pair, then (u_high, u_low, tie) per half; with execution noise, 8 more
# (two Box-Muller pairs per half → the four per-entry noise normals of each
# bar) at ks 10..17
DRAWS_PER_PAIR = 10
DRAWS_PER_PAIR_NOISE = 18
# bootstrap sampler layout: (u_idx0, u_idx1, tie0, tie1) per double-bar step
# (+ 8 noise blocks at ks 4..11) — recorded bars need no price/volume normals
BOOT_DRAWS_PER_PAIR = 4
BOOT_DRAWS_PER_PAIR_NOISE = 12
# heston layout: price pair, volume pair, vol-shock pair, 2x(u3, u4, tie)
HESTON_DRAWS_PER_PAIR = 12
HESTON_DRAWS_PER_PAIR_NOISE = 20
# HIST_CHANNELS (bootstrap table channels) re-exported from pallas_mc


def _young_bars(guard_params) -> int:
    """Static leading-bar count eligible for the reduced minute-close body
    (bars t with t + 1 < min_bars; see the young-bar peel note in
    ``_one_bar``).  Falls back to 0 — always correct, just slower — when
    min_bars is not concrete at trace time."""
    try:
        return max(0, int(guard_params.min_bars) - 1)
    except (TypeError, jax.errors.ConcretizationTypeError):
        return 0


def _draw_stride(sampler: str, use_noise: bool) -> int:
    if sampler == "heston":
        return (HESTON_DRAWS_PER_PAIR_NOISE if use_noise
                else HESTON_DRAWS_PER_PAIR)
    if sampler in ("bootstrap", "block_bootstrap"):
        # block bootstrap keeps the iid layout (one index uniform per bar);
        # non-block-start bars simply ignore theirs — CRN streams stay
        # aligned across samplers of the same family
        return BOOT_DRAWS_PER_PAIR_NOISE if use_noise else BOOT_DRAWS_PER_PAIR
    return DRAWS_PER_PAIR_NOISE if use_noise else DRAWS_PER_PAIR



def _decay_pow(decay, cnt, max_steps: int = 8):
    """decay ** cnt as an exact unrolled where-product (cnt a small-int f32
    tile).  Counts beyond ``max_steps`` saturate — they are budget-blocked
    (cnt >= max_bounces) before the multiplier is ever used."""
    out = jnp.ones_like(cnt)
    for j in range(max_steps):
        out = out * jnp.where(cnt > jnp.float32(j), decay, 1.0)
    return out


def _sigmoid_clamped(z):
    """OnlinePolicy ``_sigmoid`` (:20-26): exactly 0/1 outside +/-50."""
    return jnp.where(z < -50.0, 0.0, jnp.where(z > 50.0, 1.0, jax.nn.sigmoid(z)))


def _engine_lifecycle_loop(
    draw, get_level, *, num_bars, drift, sig_dt, log_s0,
    eng, ml, pol_w, tm, gd, max_levels, lanes, vm, escalation: bool,
    noise=None, harvest: bool = False, sampler: str = "gbm", hist=None,
    block_len: int = 0, heston=None, antithetic: bool = False,
    gen_only: bool = False, skip_d: bool = False, policy_off: bool = False,
    young_bars: int = 0, corr=None, curve=None, ring_refs=None,
):
    """The streaming generate+full-engine loop.

    ``draw(t2, k)`` yields the k-th (8, lanes) uniform block of double-bar
    step t2 (layout above); ``get_level(i) -> (price, valid, kind)`` scalars;
    ``eng``/``ml``/``tm``/``gd`` are scalar tuples (engine knobs, ML model,
    touch params, guard params); ``pol_w`` is the 3×7 policy entry head as
    nested scalar tuples; ``vm`` the static VolumeModel floats.  ``noise``:
    optional (lvl_jitter, entry_slip, stop_slip, tgt_slip) std scalars —
    per-ENTRY gaussian execution noise (sim/enginepath semantics, reference
    MC :3453-3461; gates see the un-noised scaffold) drawn as two extra
    Box-Muller pairs per bar (draw ks 10..17 per double-bar step).  Returns
    the final lifecycle tiles + skip-counter tiles.

    Horizons: for ``num_bars <= 61`` the guard box is the running min/max
    (bitwise the 60-min window, :1247); longer horizons carry 61-slot
    high/low extreme rings and take the windowed min/max per bar (the
    ``ops/regular.py guard_push`` form, exactness-tested there) — full-day
    (390-bar) and longer runs stay on-chip.  Odd ``num_bars`` runs a final
    half step using the first Box-Muller branch of one extra draw block.

    Samplers: ``"gbm"`` streams generated bars + the synthetic volume model;
    ``"bootstrap"`` resamples RECORDED bar geometry in-loop (the reference MC
    walks recorded bars, :3353-3538): ``hist = (get_hist_tile, hist_len)``
    exposes the precomputed relative-geometry tables
    (ops/pathgen.bootstrap_tables — logc/logh/logl/logo/vol) as (8, lanes)
    VMEM tiles; each bar draws ONE uniform → ``idx = floor(u·H)``, gathers
    the five channels by per-lane ``take_along_axis`` over the lane-tiled
    tables, and chains ``log_close = log_prev + logc[idx]`` — real highs,
    lows and VOLUMES (the guard/veto gates finally see recorded volume at
    kernel rates).  Bootstrap draw layout per double-bar step: (u_idx0,
    u_idx1, tie0, tie1) [+ 8 noise blocks at ks 4..11]."""
    s, b = ENGINE_SUB, lanes
    windowed_guard = num_bars > GUARD_WINDOW_BARS
    bootstrap = sampler in ("bootstrap", "block_bootstrap")
    block = sampler == "block_bootstrap"
    hes = sampler == "heston"
    carry_x = block or hes        # one extra sampler-state tile in the carry

    def _anti(z):
        """Antithetic lane pairing (ops/pathgen.gbm_paths semantics mapped
        onto the tile): the right half-lanes reuse the left half's normals
        negated; bridge/tie/volume draws stay fresh per lane.  The right
        half's z draws are consumed-but-unused so the stream layout (and
        CRN alignment) is identical to the plain run."""
        half = z[:, :z.shape[1] // 2]
        return jnp.concatenate([half, -half], axis=1)
    if hes:
        # (v0, kappa, theta, xi, rho, mu, dt) — full-truncation Euler
        # (ops/pathgen.heston_paths mirror); rho_perp precomputed statically
        h_v0, h_kap, h_th, h_xi, h_rho, h_mu, h_dt = [
            float(x) for x in heston]
        h_rho_perp = float(np.sqrt(max(0.0, 1.0 - h_rho * h_rho)))
    if bootstrap:
        get_hist_tile, hist_len = hist
        h_tiles = -(-int(hist_len) // 128)
        if block and int(hist_len) <= int(block_len):
            raise ValueError("block_bootstrap needs history longer than "
                             f"block_len ({hist_len} <= {block_len})")
    (prox, stop_pad, tp_pad, qmin, cooldown_ms, enable_veto, veto_strong,
     veto_prox, disable_ml, use_blend, w_rules_raw, w_ml_raw, confl_within,
     overtouch_limit, policy_disabled, bar0_minute, has_levels) = eng
    ml_c0, ml_c1, ml_c2, ml_c3, ml_b, ml_usable = ml
    (tol_bps, min_gap_ms, min_px_bps, decay, max_bounces,
     fat_win_ms, fat_vol_k) = tm
    (g_min_bars, g_comp_bp, g_vol_k, g_clear_bars) = gd
    vm_base, vm_uamp, vm_sigma, vm_rc, vm_day, vm_open = vm
    n_skip = len(SKIP_REASONS)

    # ML/blend weight normalization (engine/gates.py:333-335 mirror)
    s_w = w_rules_raw + w_ml_raw
    safe_sw = jnp.where(s_w <= 0, 1.0, s_w)
    w_rules = jnp.where(s_w <= 0, 1.0, w_rules_raw / safe_sw)
    w_ml = jnp.where(s_w <= 0, 0.0, w_ml_raw / safe_sw)

    # volume-model constants (ops/pathgen.py VolumeModel.volumes mirror)
    vm_mean_abs = jnp.float32(np.sqrt(2.0 / np.pi))
    vm_sd_abs = jnp.float32(np.sqrt(1.0 - 2.0 / np.pi))

    # per-level static scalars
    lvl = [get_level(i) for i in range(max_levels)]
    lvl_round = [jnp.round(lp * 100.0) / 100.0 for lp, _, _ in lvl]

    zero = jnp.zeros((s, b), jnp.float32)

    def zs(n):
        return tuple(zero for _ in range(n))

    # The bar-history rings are SINGLE (slots*8, lanes) carries shifted along
    # the sublane axis, not tuples of (8, lanes) tiles: a tuple ring is a
    # pure-copy shift chain (slot j := old slot j-1) whose deep slots Mosaic's
    # loop layout inference pins to the replicated constant-init layout, then
    # fails with an invalid tile→replicated relayout once real data reaches
    # them.  One array carry has one layout and the shift is a concat+slice.
    def ring_push(ring, new):
        return jnp.concatenate([new, ring[:-s]], axis=0)

    def ring_slot(ring, j):
        return ring[s * j:s * (j + 1)]

    # Rotating-pointer scratch rings (round 5): the concat+slice push above
    # physically moves VOL_RING+CLOSE_RING = 25 (8, lanes) tiles EVERY bar
    # (~50 vreg copies — a large share of the minute-close stage, paid on
    # young bars too).  With ``ring_refs`` (two VMEM scratch buffers), bar u
    # writes ONE slot at rows 8·(u mod R) and readers address slots by bar
    # index: pre-push slot j == bar t-1-j, post-push == bar t-j.  Unwritten
    # slots hold the zeros the scratch is cleared to at loop start, exactly
    # like the zero-init carry ring, and every reader visits slots in the
    # SAME newest-first order — the reduction association order, and hence
    # every f32 result, is bitwise identical to the carry form.
    if ring_refs is not None:
        rv_ref, rc_ref = ring_refs
        rv_ref[...] = jnp.zeros((VOL_RING * s, b), jnp.float32)
        rc_ref[...] = jnp.zeros((CLOSE_RING * s, b), jnp.float32)

        def _rot_rows(u, R):
            # slot row base for bar u (u traced i32, may be negative early)
            return pl.multiple_of(
                s * jax.lax.rem(u + jnp.int32(8 * R), jnp.int32(R)), s)

    init = ((
        zero + log_s0,                 # log_s
        jnp.exp(zero + log_s0),        # prev_c (== open[0] bitwise)
    ) + ((zero,) if block else ()) + (  # block-bootstrap current block start
    ) + ((zero + jnp.float32(h_v0),) if hes else (  # heston variance v_t
    )) + (
        zero,                          # side
        zero, zero, zero, zero,        # entry / stop / target / risk0
        zero + _NEVER,                 # cooldown_until_ms (expired)
        zero,                          # last_dir (DIR_UNKNOWN)
        zero, zero, zero,              # equity / peak / dd
        zero, zero, zero, zero,        # trades / wins / losses / escal
        zs(max_levels),                # contact counts
        zs(max_levels),                # contact latch (0/1)
        zs(2 * max_levels),            # touch count   [i*2 + side]
        tuple(zero + _NEVER for _ in range(2 * max_levels)),  # touch last_ts
        zs(2 * max_levels),            # touch last_px
        tuple(zero + _NEVER for _ in range(2 * TAP_SLOTS)),   # tap ts [e*3+k]
        zs(2 * TAP_SLOTS),             # tap ratio
        # guard extremes: running box for <= 61 bars; 61-slot newest-first
        # extreme rings for longer horizons (sentinel-filled → min/max
        # identities on unfilled slots)
        (jnp.full((GUARD_WINDOW_BARS * s, b), _BIG, jnp.float32)
         if windowed_guard else zero + jnp.float32(_BIG)),    # low(s)
        (jnp.full((GUARD_WINDOW_BARS * s, b), -_BIG, jnp.float32)
         if windowed_guard else zero - jnp.float32(_BIG)),    # high(s)
        zero, zero, zero,              # box_low / box_high / box_valid
        zero, zero,                    # regime / inside_count
        # bar-history rings: zero-placeholder carries in scratch mode (the
        # live slots then rotate in ring_refs; positions kept stable)
        (zero if ring_refs is not None
         else jnp.zeros((VOL_RING * s, b), jnp.float32)),    # volume ring
        (zero if ring_refs is not None
         else jnp.zeros((CLOSE_RING * s, b), jnp.float32)),  # close ring
        zs(n_skip),                    # skip counters
        # learning-flywheel harvest (models/harvest.py): entry-time pending
        # features + per-(bucket, label) tally tiles, empty when off
        (zs(4) + zs(2 * HV.ML_BUCKETS) + zs(3 * 2 * HV.POL_BUCKETS)
         if harvest else ()),
    ))

    def body(t2, st, young=False, esc_modes=("static", "static")):
        if bootstrap:
            if corr is not None:
                # JOINT recorded days (book semantics): the resample indices
                # come from the SHARED market stream — every book member
                # replays the SAME historical bar each step, so the book's
                # cross-sectional co-movement is exactly what the joint
                # history had (beta is unused under bootstrap; ties/noise
                # stay idiosyncratic).  Hardware draw-order discipline:
                # market ks first (k == stride reseeds the market stream),
                # then the idio ks (k == 0 reseeds the per-symbol stream) —
                # ties ride ks 0/1 so the idio reseed always fires.
                mk0 = _draw_stride(sampler, noise is not None)
                z_pair = (draw(t2, mk0), draw(t2, mk0 + 1))
                ties = (draw(t2, 0), draw(t2, 1))
            else:
                z_pair = (draw(t2, 0), draw(t2, 1))  # per-bar index uniforms
                ties = (draw(t2, 2), draw(t2, 3))
            zv_pair = (None, None)
            noise_k0 = 4
        else:
            if corr is not None:
                # shared market factor (parallel/portfolio.py model): the
                # market pair is drawn FIRST each step — ks (mk0, mk0+1), a
                # symbol-independent stream (the corr kernel's draw wrapper
                # reseeds the PRNG / reads the shared market ref on mk0)
                mk0 = _draw_stride(sampler, noise is not None)
                mrad = jnp.sqrt(-2.0 * jnp.log(draw(t2, mk0)))
                mang = _TWO_PI * draw(t2, mk0 + 1)
                zm_pair = (mrad * jnp.cos(mang), mrad * jnp.sin(mang))
                if antithetic:
                    # a true antithetic BOOK pair flips the market shock
                    # too — flipping only the idio residual would leave the
                    # pair beta-correlated instead of mirrored
                    zm_pair = (_anti(zm_pair[0]), _anti(zm_pair[1]))
                if hes:
                    # second market pair: the variance shock's factor
                    # component (market-wide vol regime — a selloff raises
                    # every book member's vol through the same loading)
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
                # z_s = beta_s z_mkt + sqrt(1-beta_s^2) eps_s — applied
                # BEFORE the volume model so market moves print volume on
                # every symbol (portfolio_mc_engine semantics)
                perp = jnp.sqrt(jnp.maximum(0.0, 1.0 - corr * corr))
                z_pair = (corr * zm_pair[0] + perp * z_pair[0],
                          corr * zm_pair[1] + perp * z_pair[1])
            uv1 = draw(t2, 2)
            uv2 = draw(t2, 3)
            vradius = jnp.sqrt(-2.0 * jnp.log(uv1))
            vangle = _TWO_PI * uv2
            zv_pair = (vradius * jnp.cos(vangle), vradius * jnp.sin(vangle))
            ties = None
            noise_k0 = 10
            if hes:
                uq1 = draw(t2, 4)
                uq2 = draw(t2, 5)
                qradius = jnp.sqrt(-2.0 * jnp.log(uq1))
                qangle = _TWO_PI * uq2
                zq_pair = (qradius * jnp.cos(qangle),
                           qradius * jnp.sin(qangle))
                if corr is not None:
                    # one-factor vol co-movement, same beta loading as price
                    zq_pair = (corr * zqm_pair[0] + perp * zq_pair[0],
                               corr * zqm_pair[1] + perp * zq_pair[1])
                noise_k0 = 12
        for half in range(2):
            t_i = 2 * t2 + half
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
                st = _one_bar(st, t_i, z_pair[half], None, None, None,
                              ties[half], nz, young=young,
                              esc_mode=esc_modes[half])
            elif hes:
                st = _one_bar(
                    st, t_i, z_pair[half], zv_pair[half],
                    draw(t2, 6 + 3 * half), draw(t2, 7 + 3 * half),
                    draw(t2, 8 + 3 * half), nz, young=young,
                    zq=zq_pair[half], esc_mode=esc_modes[half],
                )
            else:
                st = _one_bar(
                    st, t_i, z_pair[half], zv_pair[half],
                    draw(t2, 4 + 3 * half), draw(t2, 5 + 3 * half),
                    draw(t2, 6 + 3 * half), nz, young=young,
                    esc_mode=esc_modes[half],
                )
        return st

    def _one_bar(st, t_i, z, zv, u3, u4, tie, nz, young=False,
                 zq=None, esc_mode="static"):
        if carry_x:
            samp_st = st[2]               # block start / heston variance
            st = st[:2] + st[3:]
        if block:
            blk_start = samp_st
        (log_s, prev_c, side, entry, stop, target, risk0, cooldown_until,
         last_dir, equity, peak, dd, trades, wins, losses, escal,
         c_counts, c_latch, tm_cnt, tm_ts, tm_px, tap_ts, tap_ratio,
         run_low, run_high, box_low, box_high, box_valid, regime,
         inside_cnt, ring_v, ring_c, skips, hstate) = st
        if harvest:
            pend_mlb, pend_polb, pend_x1, pend_x6 = hstate[:4]
            hm = list(hstate[4:4 + 2 * HV.ML_BUCKETS])
            off = 4 + 2 * HV.ML_BUCKETS
            hp_cnt = list(hstate[off:off + 2 * HV.POL_BUCKETS])
            hp_x1 = list(hstate[off + 2 * HV.POL_BUCKETS:
                                off + 4 * HV.POL_BUCKETS])
            hp_x6 = list(hstate[off + 4 * HV.POL_BUCKETS:
                                off + 6 * HV.POL_BUCKETS])
        t_f = t_i.astype(jnp.float32)
        now_ms = t_f * 60000.0
        # bars held by the rings during entry eval: 0..t-1 (stage D pushes t)
        n_hist = t_f   # == min(t, ring) for every window that matters (<= 20)

        # newest-first slot readers (pre-push: slot j == bar t-1-j)
        if ring_refs is not None:
            rv_pre = lambda j: rv_ref[pl.ds(_rot_rows(t_i - 1 - j, VOL_RING), s)]
            rc_pre = lambda j: rc_ref[pl.ds(_rot_rows(t_i - 1 - j, CLOSE_RING), s)]
        else:
            rv_pre = lambda j: ring_slot(ring_v, j)
            rc_pre = lambda j: ring_slot(ring_c, j)

        if bootstrap:
            # ---- resample one RECORDED bar (relative geometry, :3353) ----
            hf = jnp.float32(hist_len)
            if block:
                # contiguous block_len-bar runs (ops/pathgen
                # block_bootstrap_paths): one start uniform per block — the
                # reference MC replays contiguous recorded sequences, so
                # block resampling preserves the vol clustering / intraday
                # momentum iid resampling destroys.  Non-start bars ignore
                # their index uniform (same draw layout as iid).
                bl = jnp.float32(block_len)
                off = t_f - bl * jnp.floor(t_f / bl)
                new_start = jnp.minimum(jnp.floor(z * (hf - bl)),
                                        hf - bl - 1.0)
                blk_start = jnp.where(off == 0.0, new_start, blk_start)
                samp_st = blk_start
                idx_f = blk_start + off
            else:
                idx_f = jnp.minimum(jnp.floor(z * hf), hf - 1.0)
            logc_t = _hist_gather(0, idx_f)
            logh_t = _hist_gather(1, idx_f)
            logl_t = _hist_gather(2, idx_f)
            log_close = log_s + logc_t
            c = jnp.exp(log_close)
            h = jnp.exp(log_s + logh_t)
            low = jnp.exp(log_s + logl_t)
            v = _hist_gather(4, idx_f)      # REAL recorded volume
        else:
            # ---- generate this bar (streaming GBM/Heston + bridge + volume)
            log_open = log_s
            if hes:
                # full-truncation Euler (ops/pathgen.heston_paths mirror):
                # the bar's LOCAL vol drives both the close move and the
                # bridge extremes; the vol shock correlates with the price
                # shock through rho
                dtf = jnp.float32(h_dt)
                v_pos = jnp.maximum(samp_st, 0.0)
                sig_bar = jnp.sqrt(v_pos * dtf)
                log_close = (log_s + (jnp.float32(h_mu) - 0.5 * v_pos) * dtf
                             + sig_bar * z)
                sig2dt = v_pos * dtf
                samp_st = (samp_st
                           + jnp.float32(h_kap) * (jnp.float32(h_th) - v_pos)
                           * dtf
                           + jnp.float32(h_xi) * sig_bar
                           * (jnp.float32(h_rho) * z
                              + jnp.float32(h_rho_perp) * zq))
            else:
                log_close = log_s + (drift + sig_dt * z)
                sig2dt = sig_dt * sig_dt
            c = jnp.exp(log_close)
            d2 = (log_close - log_open) ** 2
            h = jnp.exp(0.5 * (log_open + log_close
                               + jnp.sqrt(d2 - 2.0 * sig2dt * jnp.log(u3))))
            low = jnp.exp(0.5 * (log_open + log_close
                                 - jnp.sqrt(d2 - 2.0 * sig2dt * jnp.log(u4))))
            # VolumeModel.volumes (ops/pathgen.py:75-94) per bar
            m_min = jnp.mod(jnp.float32(vm_open) + t_f, jnp.float32(vm_day))
            x_u = 2.0 * m_min / jnp.float32(max(vm_day - 1, 1)) - 1.0
            ushape = 1.0 + jnp.float32(vm_uamp) * (x_u * x_u
                                                   - jnp.float32(1.0 / 3.0))
            vnoise = jnp.exp(jnp.float32(vm_sigma) * zv
                             - 0.5 * jnp.float32(vm_sigma) * jnp.float32(vm_sigma))
            v = jnp.float32(vm_base) * ushape * vnoise
            if vm_rc != 0.0:
                v = v * (1.0 + jnp.float32(vm_rc) * ((jnp.abs(z) - vm_mean_abs)
                                                     / vm_sd_abs))
            v = jnp.maximum(v, jnp.float32(0.05 * vm_base))


        if gen_only:
            # roofline stage split (benchmarks/engine_kernel_bench.py
            # --stage-split): consume the generated bar, skip the engine.
            # equity's dependency chain keeps generation + accumulation live.
            equity = equity + (c - h) + (low - c) * 0.5 + v * 1e-12
            ret = (log_close, c, side, entry, stop, target, risk0,
                   cooldown_until, last_dir, equity, peak, dd, trades, wins,
                   losses, escal, c_counts, c_latch, tm_cnt, tm_ts, tm_px,
                   tap_ts, tap_ratio, run_low, run_high, box_low, box_high,
                   box_valid, regime, inside_cnt, ring_v, ring_c, skips,
                   hstate)
            if carry_x:
                ret = ret[:2] + (samp_st,) + ret[2:]
            return ret

        # ---- nearest-level scan at the close (shared by stage B's
        # escalation check and gate 6 — one pass instead of two) ----------
        inf = jnp.float32(_BIG)
        best_d = jnp.full((s, b), inf, jnp.float32)
        best_p = zero
        best_k = zero
        best_i = zero
        lvl_dist = []
        for i in range(max_levels):
            lp, lv, lk = lvl[i]
            d_i = jnp.where(lv > 0, jnp.abs(c - lp), inf)
            lvl_dist.append(d_i)
            take = d_i < best_d
            best_p = jnp.where(take, lp, best_p)
            best_k = jnp.where(take, lk, best_k)
            best_i = jnp.where(take, jnp.float32(i), best_i)
            best_d = jnp.where(take, d_i, best_d)

        # ---- B) position management (enginepath step, :2966-3014) ----------
        is_open = side != 0.0
        is_long = side > 0.0
        op_long = jnp.logical_and(is_open, is_long)
        op_short = jnp.logical_and(is_open, jnp.logical_not(is_long))
        stop_hit = jnp.logical_or(jnp.logical_and(op_long, low <= stop),
                                  jnp.logical_and(op_short, h >= stop))
        tgt_hit = jnp.logical_or(jnp.logical_and(op_long, h >= target),
                                 jnp.logical_and(op_short, low <= target))
        both = jnp.logical_and(stop_hit, tgt_hit)
        up_span = jnp.maximum(0.0, h - entry)
        dn_span = jnp.maximum(0.0, entry - low)
        p_tp = up_span / (up_span + dn_span + 1e-9)
        target_first = jnp.logical_or(
            jnp.logical_and(both, tie < p_tp),
            jnp.logical_and(tgt_hit, jnp.logical_not(stop_hit)),
        )
        hit = jnp.logical_or(stop_hit, tgt_hit)

        if escalation and esc_mode != "off":
            # esc_mode == "off" ⟺ this bar has t < CLOSE_RING statically:
            # trend_def is false, can_decide false, esc_go false — the whole
            # walk is dead and elided (the loop segmentation below proves
            # the bar bound).  Active bars have t >= CLOSE_RING, so the walk
            # folds n5/trend_def/in_win/is_first to constants.
            esc_go, esc_tgt, esc_trail = _escalation(
                side=side, is_long=is_long, entry=entry, c=c,
                rc_slot=rc_pre, rv_slot=rv_pre,
                bp=best_p, bd=best_d)
            near_target = jnp.abs(c - target) <= prox
            escalate = jnp.logical_and(
                jnp.logical_and(jnp.logical_and(hit, target_first), near_target),
                esc_go)
        else:
            escalate = jnp.zeros((s, b), bool)

        closed = jnp.logical_and(hit, jnp.logical_not(escalate))
        closed_f = closed.astype(jnp.float32)
        exit_px = jnp.where(target_first, target, stop)
        pnl = closed_f * jnp.where(is_long, exit_px - entry, entry - exit_px)
        r = closed_f * (pnl / jnp.maximum(risk0, 1e-9))
        equity = equity + r
        peak = jnp.maximum(peak, equity)
        dd = jnp.maximum(dd, peak - equity)
        if curve is not None:
            # portfolio hook (corr kernel): accumulate this symbol's weighted
            # post-bar equity into the per-bar portfolio-curve scratch (the
            # book's drawdown is peak-tracked over TIME on the combined
            # curve — per-symbol final equities cannot see it)
            curve_ref, w_s = curve
            curve_ref[pl.ds(t_i, 1)] = (curve_ref[pl.ds(t_i, 1)]
                                        + (w_s * equity)[None])
        wins = wins + jnp.logical_and(closed, pnl > 0).astype(jnp.float32)
        losses = losses + jnp.logical_and(closed, pnl <= 0).astype(jnp.float32)
        if harvest:
            # label by pnl sign at close (:1934-1945); entry-time buckets
            # latched in pend_* tiles.  One shared bucket-compare per bucket
            # feeds both label masks.
            pos_f = jnp.logical_and(closed, pnl > 0).astype(jnp.float32)
            neg_f = closed_f - pos_f
            for bb in range(HV.ML_BUCKETS):
                ind = (pend_mlb == jnp.float32(bb)).astype(jnp.float32)
                hm[2 * bb] = hm[2 * bb] + ind * neg_f
                hm[2 * bb + 1] = hm[2 * bb + 1] + ind * pos_f
            for bb in range(HV.POL_BUCKETS):
                ind = (pend_polb == jnp.float32(bb)).astype(jnp.float32)
                ind_n = ind * neg_f
                ind_p = ind * pos_f
                hp_cnt[2 * bb] = hp_cnt[2 * bb] + ind_n
                hp_cnt[2 * bb + 1] = hp_cnt[2 * bb + 1] + ind_p
                hp_x1[2 * bb] = hp_x1[2 * bb] + ind_n * pend_x1
                hp_x1[2 * bb + 1] = hp_x1[2 * bb + 1] + ind_p * pend_x1
                hp_x6[2 * bb] = hp_x6[2 * bb] + ind_n * pend_x6
                hp_x6[2 * bb + 1] = hp_x6[2 * bb + 1] + ind_p * pend_x6
        if escalation and esc_mode != "off":
            stop = jnp.where(escalate, esc_trail, stop)
            target = jnp.where(escalate, esc_tgt, target)
            escal = escal + escalate.astype(jnp.float32)
        side = side * (1.0 - closed_f)
        cooldown_until = jnp.where(closed, now_ms + cooldown_ms, cooldown_until)


        # ---- C) the 12-gate ladder at the close (:1492-1771 + :3046-3112) --
        was_flat = jnp.logical_not(is_open)
        reason = zero  # Reason.OK == 0
        # skip tally INLINE with the first-fail masks (round 5): first_fail
        # already computes the "this gate is the first fail" indicator, and
        # each (path, bar) sets exactly one code (every writer is guarded by
        # reason == 0), so accumulating the mask here equals the old 16-way
        # end-of-ladder equality tally bitwise — minus its 16 compares per
        # bar, and minus everything on young bars whose gates are elided.
        skips = list(skips)

        def first_fail(reason, fail, code):
            m = jnp.logical_and(reason == 0.0, fail)
            skips[SKIP_REASONS.index(code)] = (
                skips[SKIP_REASONS.index(code)] + m.astype(jnp.float32))
            return jnp.where(m, jnp.float32(int(code)), reason)

        reason = first_fail(reason, jnp.logical_not(was_flat), Reason.IN_POSITION)
        reason = first_fail(reason, now_ms < cooldown_until, Reason.COOLDOWN)
        reason = first_fail(reason, has_levels < 0.5, Reason.NOLEVELS)
        # 5) direction (eps band; flat tick reuses last direction, :1529-1540)
        eps = jnp.float32(1e-9)
        up = c > prev_c + eps
        down = c < prev_c - eps
        t_pos = t_f > 0.0
        direction = jnp.where(up, 1.0, jnp.where(down, -1.0, last_dir))
        direction = direction * t_pos.astype(jnp.float32)  # t=0 → UNKNOWN
        reason = first_fail(reason, direction == 0.0, Reason.DIR_UNKNOWN)
        # 6) nearest level (first-min tie-break, hoisted scan) / TOO_FAR
        reason = first_fail(reason, best_d > prox, Reason.TOO_FAR)

        # 7) contact latch + LEVEL_OVERTOUCHED (:1557-1587); mutates exactly
        # when gates 2-6 passed
        reached7 = reason == 0.0
        tc = zero
        ohs = []
        c_counts2, c_latch2 = [], []
        for i in range(max_levels):
            lp, lv, _ = lvl[i]
            oh = (best_i == jnp.float32(i)).astype(jnp.float32)
            ohs.append(oh)
            inside = lvl_dist[i] <= prox
            is_near = oh > 0.0
            latch_b = c_latch[i] > 0.0
            fresh = jnp.logical_and(
                is_near, jnp.logical_and(inside, jnp.logical_not(latch_b)))
            cnt_new = c_counts[i] + fresh.astype(jnp.float32)
            # (near & inside) | (~near & latch & inside) == inside & (near|latch)
            latch_new = jnp.logical_and(inside,
                                        jnp.logical_or(is_near, latch_b))
            latch_new = jnp.logical_and(latch_new, lv > 0)
            cnt_i = jnp.where(reached7, cnt_new, c_counts[i])
            lat_i = jnp.where(reached7, latch_new.astype(jnp.float32), c_latch[i])
            c_counts2.append(cnt_i)
            c_latch2.append(lat_i)
            tc = tc + cnt_i * oh
        c_counts = tuple(c_counts2)
        c_latch = tuple(c_latch2)
        reason = first_fail(reason, tc >= overtouch_limit,
                            Reason.LEVEL_OVERTOUCHED)

        # 7b) accumulation gates (:1589-1621).  On young bars regime is
        # identically UNKNOWN (the guard machine hasn't run yet — see the
        # young-bar peel note in stage D), so the accumulation-gated
        # predicates (edge fatigue, touch budget/cooldown, decay) and the
        # breakout counter-trend gate below are statically inert: their
        # reason codes cannot fire and decay_mult == 1.0 (conf * 1.0 is
        # bitwise conf in f32).
        if not young:
            accumulating = regime == jnp.float32(G.REGIME_ACCUMULATION)

            def edge_fatigued(e):
                # newest 3 taps == the window statistic (see module docstring)
                in_w = [tap_ts[e * TAP_SLOTS + k] >= now_ms - fat_win_ms
                        for k in range(TAP_SLOTS)]
                n3 = in_w[TAP_SLOTS - 1]  # oldest slot in window → >= 3 in window
                avg = (tap_ratio[e * TAP_SLOTS + 0] + tap_ratio[e * TAP_SLOTS + 1]
                       + tap_ratio[e * TAP_SLOTS + 2]) / 3.0
                return jnp.logical_and(n3, avg >= fat_vol_k)

            fat_top = edge_fatigued(0)
            fat_bot = edge_fatigued(1)
            fatigued_edge = jnp.where(fat_top, jnp.float32(T.EDGE_TOP),
                                      jnp.where(fat_bot, jnp.float32(T.EDGE_BOT),
                                                jnp.float32(T.EDGE_NONE)))
            edge_for_this = jnp.where(direction < 0.0, jnp.float32(T.EDGE_TOP),
                                      jnp.float32(T.EDGE_BOT))
            reason = first_fail(
                reason,
                jnp.logical_and(accumulating, fatigued_edge == edge_for_this),
                Reason.EDGE_FATIGUE)
            # touch_allow (:1222-1239): gather (nearest level, trade side)
            is_short_dir = direction < 0.0   # T.TM_SHORT when approaching down
            tmc = zero
            tmts = zero + _NEVER
            for i in range(max_levels):
                cnt_side = jnp.where(is_short_dir, tm_cnt[2 * i + 1], tm_cnt[2 * i])
                ts_side = jnp.where(is_short_dir, tm_ts[2 * i + 1], tm_ts[2 * i])
                tmc = tmc + cnt_side * ohs[i]
                tmts = jnp.where(ohs[i] > 0.0, ts_side, tmts)
            budget_blocked = tmc >= max_bounces
            has_tm = tmts > jnp.float32(-5e8)
            cooldown_blocked = jnp.logical_and(has_tm, now_ms - tmts < min_gap_ms)
            tm_ok = jnp.logical_not(jnp.logical_or(budget_blocked, cooldown_blocked))
            tm_fail = jnp.logical_and(accumulating, jnp.logical_not(tm_ok))
            reason = first_fail(reason, jnp.logical_and(tm_fail, budget_blocked),
                                Reason.TOUCH_BUDGET)
            reason = first_fail(
                reason, jnp.logical_and(tm_fail, jnp.logical_not(budget_blocked)),
                Reason.TOUCH_COOLDOWN)
            decay_mult = jnp.where(
                jnp.logical_and(accumulating, tm_ok),
                jnp.where(tm_ok, _decay_pow(decay, tmc), 1.0), 1.0)

        # 8) confidence × decay (:1626-1641 via :1415-1427)
        conf = jnp.maximum(0.0, 1.0 - best_d / jnp.maximum(jnp.float32(1e-4), prox))
        conf = conf + jnp.where(best_k > 0.5, 0.08, 0.02)
        conf = conf + jnp.where(tc <= 1.0, 0.10,
                                jnp.where(tc == 2.0, -0.08, -0.16))
        conf = conf + jnp.where(direction != 0.0, 0.03, 0.0)
        conf = jnp.clip(conf, 0.0, 1.0)
        if not young:
            conf = conf * decay_mult
        reason = first_fail(reason, conf < qmin, Reason.CONF_LOW)


        # 9) side + clean scaffold; 9b) breakout counter-trend (:1652-1666)
        go_long = direction > 0.0
        stop_clean = jnp.where(go_long, best_p - stop_pad, best_p + stop_pad)
        if not young:
            blocked = jnp.logical_or(
                jnp.logical_and(regime == jnp.float32(G.REGIME_BREAKOUT_UP),
                                jnp.logical_not(go_long)),
                jnp.logical_and(regime == jnp.float32(G.REGIME_BREAKOUT_DOWN),
                                go_long))
            reason = first_fail(reason, blocked, Reason.ACC_BREAKOUT_GATE)

        # 10) soft volume veto (:1773-1794); slope over the last 6 volumes
        vslope = _volume_slope6(rv_pre, n_hist)
        confl_d = []
        for i in range(max_levels):
            lp, lv, _ = lvl[i]
            confl_d.append((jnp.abs(lp - best_p), lv))
        confl_veto = _confluence_thresh(confl_d, confl_within) >= 2.0
        weak = jnp.logical_and(jnp.abs(vslope) < 0.05,
                               jnp.logical_not(confl_veto))
        near_v = best_d <= jnp.maximum(veto_prox, prox * 0.12)
        # approach_from_below == direction DIR_UP (incl. last-dir reuse), NOT
        # the raw eps-band `up` of this tick (enginepath.py:324); i1 selects
        # compose with and/or (Mosaic cannot trunci to i1)
        dir_up = direction > 0.0
        dir_dn = jnp.logical_not(dir_up)
        contra_long = jnp.logical_or(
            jnp.logical_and(dir_up, vslope < -veto_strong),
            jnp.logical_and(dir_dn, vslope > veto_strong))
        contra_short = jnp.logical_or(
            jnp.logical_and(dir_up, vslope > veto_strong),
            jnp.logical_and(dir_dn, vslope < -veto_strong))
        veto_long = jnp.logical_and(jnp.logical_and(near_v, go_long), contra_long)
        veto_short = jnp.logical_and(
            jnp.logical_and(near_v, jnp.logical_not(go_long)), contra_short)
        vetoed = jnp.logical_and(jnp.logical_not(weak),
                                 jnp.logical_or(veto_long, veto_short))
        veto_fail = jnp.logical_and(enable_veto > 0.5, vetoed)
        veto_code = jnp.where(veto_long, jnp.float32(int(Reason.CONTRA_VOL_LONG)),
                              jnp.float32(int(Reason.CONTRA_VOL_SHORT)))
        veto_m = jnp.logical_and(reason == 0.0, veto_fail)
        skips[SKIP_REASONS.index(Reason.CONTRA_VOL_LONG)] = (
            skips[SKIP_REASONS.index(Reason.CONTRA_VOL_LONG)]
            + jnp.logical_and(veto_m, veto_long).astype(jnp.float32))
        skips[SKIP_REASONS.index(Reason.CONTRA_VOL_SHORT)] = (
            skips[SKIP_REASONS.index(Reason.CONTRA_VOL_SHORT)]
            + jnp.logical_and(veto_m,
                              jnp.logical_not(veto_long)).astype(jnp.float32))
        reason = jnp.where(veto_m, veto_code, reason)

        # 11) ML / blended gate (:1707-1756 via :1454-1466)
        zml = (ml_c0 * best_k + ml_c1 * jnp.abs(best_p - stop_clean)
               + ml_c2 * tc + ml_c3 * go_long.astype(jnp.float32) + ml_b)
        ml_proba = jax.nn.sigmoid(zml)
        usable = ml_usable > 0.5
        ok_ml = jnp.logical_or(jnp.logical_not(usable), ml_proba >= qmin)
        ran_ml = disable_ml < 0.5
        mlp = jnp.where(jnp.logical_and(ran_ml, usable), ml_proba, conf)
        blended = w_rules * conf + w_ml * mlp
        reason = first_fail(
            reason,
            jnp.logical_and(use_blend > 0.5, blended < qmin),
            Reason.COMBINED_LOW)
        reason = first_fail(
            reason,
            jnp.logical_and(use_blend < 0.5,
                            jnp.logical_and(ran_ml, jnp.logical_not(ok_ml))),
            Reason.ML_CONF_LOW)

        # 12) OnlinePolicy two-head gate (:3046-3112); features :308-331
        glf = go_long.astype(jnp.float32)
        if harvest or not policy_off:
            x1 = jnp.minimum(1.0, best_d)
            confl_pol = (_confluence_thresh(confl_d, jnp.float32(0.6)) > 1.0
                         ).astype(jnp.float32)
            x6 = jnp.minimum(1.0, (bar0_minute + t_f) / 390.0)
        if not policy_off:
            # feature 2 (vol_trend) is identically zero at path scale, so its
            # +-0.0 term is dropped (x + -0.0 == x bitwise; the +0.0-vs--0.0
            # accumulator corner is absorbed by sigmoid(+-0) == 0.5), and the
            # bias term w0 * 1.0 == w0 broadcasts without the multiply.
            feats = (x1, 1.0 - glf, glf, confl_pol, x6)
            w_ix = (1, 3, 4, 5, 6)

            def pol_score(a):
                zp = zero + pol_w[a][0]
                for d_i, f in zip(w_ix, feats):
                    zp = zp + pol_w[a][d_i] * f
                return _sigmoid_clamped(zp)

            s_long, s_short, s_skip = pol_score(0), pol_score(1), pol_score(2)
            chosen = jnp.where(go_long, s_long, s_short)
            pol_pass = jnp.logical_or(
                policy_disabled > 0.5,
                jnp.logical_and(chosen >= 0.60, s_skip < 0.55))
            reason = first_fail(reason, jnp.logical_not(pol_pass),
                                Reason.ONLINE_POLICY)
        # else: policy_gate_disabled is STATIC at every call site — pol_pass
        # is identically true and the ONLINE_POLICY counter never fires, so
        # the three head scores are skipped at trace time.

        enter = reason == 0.0
        skips = tuple(skips)

        enter_f = enter.astype(jnp.float32)
        new_side = jnp.where(go_long, 1.0, -1.0)
        if nz is not None:
            # noised execution scaffold (enginepath :376-388, ref :3453-3461):
            # gates saw the UN-noised stop_clean; the opened trade's level/
            # fill/barriers jitter per entry
            lvl_jit, entry_slip, stop_slip, tgt_slip = noise
            lvl_eff = best_p + nz[0] * lvl_jit
            fill = c + nz[1] * entry_slip
            stop_new = (jnp.where(go_long, lvl_eff - stop_pad, lvl_eff + stop_pad)
                        + nz[2] * stop_slip)
            tgt_new = (jnp.where(go_long, lvl_eff + tp_pad, lvl_eff - tp_pad)
                       + nz[3] * tgt_slip)
        else:
            fill = c
            stop_new = stop_clean
            tgt_new = jnp.where(go_long, best_p + tp_pad, best_p - tp_pad)
        side = jnp.where(enter, new_side, side)
        entry = jnp.where(enter, fill, entry)
        stop = jnp.where(enter, stop_new, stop)
        target = jnp.where(enter, tgt_new, target)
        risk0 = jnp.where(enter, jnp.abs(fill - stop_new), risk0)
        trades = trades + enter_f
        if harvest:
            mlb_new = (jnp.minimum(tc, jnp.float32(HV.TC_CAP - 1)) * 4.0
                       + best_k * 2.0 + glf)
            polb_new = glf * 2.0 + confl_pol
            pend_mlb = jnp.where(enter, mlb_new, pend_mlb)
            pend_polb = jnp.where(enter, polb_new, pend_polb)
            pend_x1 = jnp.where(enter, x1, pend_x1)
            pend_x6 = jnp.where(enter, x6, pend_x6)

        # direction state (:2952-2955): exact != (no eps band)
        moved = jnp.logical_and(t_pos, c != prev_c)
        last_dir = jnp.where(moved, jnp.where(c > prev_c, 1.0, -1.0), last_dir)


        if skip_d:
            # roofline split: freeze the minute-close state (rings/guard/
            # touch) — isolates stage D's cost as full minus this
            return (log_close, c, side, entry, stop, target, risk0,
                    cooldown_until, last_dir, equity, peak, dd, trades, wins,
                    losses, escal, c_counts, c_latch, tm_cnt, tm_ts, tm_px,
                    tap_ts, tap_ratio, run_low, run_high, box_low, box_high,
                    box_valid, regime, inside_cnt, ring_v, ring_c, skips,
                    hstate)

        # ---- D) minute close of bar t (:1813-1855) -------------------------
        if ring_refs is not None:
            rv_ref[pl.ds(_rot_rows(t_i, VOL_RING), s)] = v
            rc_ref[pl.ds(_rot_rows(t_i, CLOSE_RING), s)] = c
            rv_post = lambda j: rv_ref[pl.ds(_rot_rows(t_i - j, VOL_RING), s)]
        else:
            ring_v = ring_push(ring_v, v)
            ring_c = ring_push(ring_c, c)
            rv_post = lambda j: ring_slot(ring_v, j)
        n_after = t_f + 1.0
        # guard extremes (:1268-1339): running box == the 60-min window while
        # num_bars <= 61; longer horizons shift 61-slot extreme rings
        # (sentinels on unfilled slots are min/max identities, so the
        # young-window case needs no masking).  Pushed on EVERY bar — the
        # young prefix below consumes them later.
        if windowed_guard:
            run_low = ring_push(run_low, low)
            run_high = ring_push(run_high, h)
        else:
            run_low = jnp.minimum(run_low, low)
            run_high = jnp.maximum(run_high, h)
        # Young-bar peel (static): while n_after < g_min_bars the guard
        # forcibly zeroes regime/box_valid/inside_cnt, so those end exactly
        # as carried (0), acc_now is false (no touch registration, taps or
        # breakout reset can fire), mid-bar breakouts are impossible (the
        # box is set from extremes that include this bar, so close cannot
        # be outside it the bar it is set), and the stale box_low/high
        # writes are dead (every box_valid-setting bar rewrites them before
        # any box_valid-gated read).  Only the rings and running extremes
        # carry information — the MA sums, guard regime machine, touch
        # registration, edge taps and breakout reset are all skipped for
        # bars t < young_bars == min_bars - 1 (bitwise-identical outputs).
        if not young:
            # One sequential pass over the volume ring feeds all four MAs: the
            # minute-close tail means (:1827) and the guard window means
            # (:1279-1283) share the same slot sums bitwise — unfilled slots hold
            # exactly 0.0 (zero-init ring), so the young-window mask only ever
            # changes the DENOMINATOR, never the sum.  sum20 extends sum5 in the
            # same association order as the old per-window loops.
            sum5 = rv_post(0)
            for slot in range(1, 5):
                sum5 = sum5 + rv_post(slot)
            sum20 = sum5
            for slot in range(5, VOL_RING):
                sum20 = sum20 + rv_post(slot)
            # minute-close MAs (denominator max(1, min(k, n)), :1827)
            vol_ma_s = sum5 / jnp.maximum(1.0, jnp.minimum(jnp.float32(5.0), n_after))
            vol_ma_l = sum20 / jnp.maximum(
                1.0, jnp.minimum(jnp.float32(VOL_RING), n_after))
            if windowed_guard:
                win_low = _ring_fold(run_low, jnp.minimum)
                win_high = _ring_fold(run_high, jnp.maximum)
            else:
                win_low = run_low
                win_high = run_high
            box_height = win_high - win_low
            compress_thresh = c * (g_comp_bp / 10000.0)
            # guard MAs from the shared sums (:1279-1283 semantics: defined only
            # at >= k bars).  The masked select is an arithmetic blend: a
            # scalar-predicate jnp.where over a tile operand makes Mosaic
            # demand an impossible replicated relayout of the tile.
            s_def = n_after >= jnp.float32(5.0)
            l_def = n_after >= jnp.float32(VOL_RING)
            gma_s = (sum5 / 5.0) * s_def.astype(jnp.float32)
            gma_l = (sum20 / jnp.float32(VOL_RING)) * l_def.astype(jnp.float32)
            mas_ok = jnp.logical_and(jnp.logical_and(s_def, gma_s != 0.0),
                                     jnp.logical_and(l_def, gma_l != 0.0))
            in_breakout = jnp.logical_or(
                regime == jnp.float32(G.REGIME_BREAKOUT_UP),
                regime == jnp.float32(G.REGIME_BREAKOUT_DOWN))
            compressed = box_height <= jnp.maximum(1e-6, compress_thresh)
            regime = jnp.where(
                in_breakout, regime,
                jnp.where(compressed, jnp.float32(G.REGIME_ACCUMULATION),
                          jnp.float32(G.REGIME_UNKNOWN)))
            box_low = jnp.where(compressed, win_low, box_low)
            box_high = jnp.where(compressed, win_high, box_high)
            box_valid = jnp.maximum(box_valid, compressed.astype(jnp.float32))
            spike = jnp.logical_and(mas_ok, gma_s > g_vol_k * gma_l)
            can_check = jnp.logical_and(box_valid > 0.5, mas_ok)
            bo_up = jnp.logical_and(
                can_check, jnp.logical_and(c > box_high + 1e-6, spike))
            bo_dn = jnp.logical_and(
                jnp.logical_and(can_check, jnp.logical_not(bo_up)),
                jnp.logical_and(c < box_low - 1e-6, spike))
            regime = jnp.where(bo_up, jnp.float32(G.REGIME_BREAKOUT_UP),
                               jnp.where(bo_dn, jnp.float32(G.REGIME_BREAKOUT_DOWN),
                                         regime))
            inside_cnt = jnp.where(jnp.logical_or(bo_up, bo_dn), 0.0, inside_cnt)
            in_bo2 = jnp.logical_or(
                regime == jnp.float32(G.REGIME_BREAKOUT_UP),
                regime == jnp.float32(G.REGIME_BREAKOUT_DOWN))
            inside = jnp.logical_and(box_low <= c, c <= box_high)
            do_track = jnp.logical_and(in_bo2, box_valid > 0.5)
            inside_cnt = jnp.where(
                do_track, jnp.where(inside, inside_cnt + 1.0, 0.0), inside_cnt)
            cleared = jnp.logical_and(
                do_track, jnp.logical_and(inside, inside_cnt >= g_clear_bars))
            regime = jnp.where(cleared, jnp.float32(G.REGIME_ACCUMULATION), regime)
            # too-few-bars reset (REGIME_UNKNOWN == 0): scalar-predicate select
            # as a blend (see the guard-MA blend note)
            enough = (n_after >= g_min_bars).astype(jnp.float32)
            regime = regime * enough
            box_valid = box_valid * enough
            inside_cnt = inside_cnt * enough


            # touch_register on the finished bar (:1158-1197)
            acc_now = regime == jnp.float32(G.REGIME_ACCUMULATION)
            tm_cnt2, tm_ts2, tm_px2 = [], [], []
            for i in range(max_levels):
                lp, lv, _ = lvl[i]
                lr = lvl_round[i]
                valid_i = lv > 0
                pierced = jnp.logical_and(low - 1e-9 <= lr, lr <= h + 1e-9)
                bps_c = jnp.where(lr <= 0, 0.0, jnp.abs(c - lr) / lr * 1e4)
                near_i = jnp.logical_and(
                    jnp.logical_or(pierced, bps_c <= tol_bps), valid_i)
                hit_i = jnp.logical_and(near_i, acc_now)
                side_short = c > lr
                # Only the ACTIVE side (short iff c > lr) can register this bar,
                # so the de-dup predicates are computed once from the active
                # side's gathered state and the update scattered back — bitwise
                # the same per-(level, side) transitions as the two-sided form
                # (the inactive side's ``counted`` is identically false).
                ts_a = jnp.where(side_short, tm_ts[2 * i + 1], tm_ts[2 * i])
                px_a = jnp.where(side_short, tm_px[2 * i + 1], tm_px[2 * i])
                has_a = ts_a > jnp.float32(-5e8)
                too_soon = jnp.logical_and(has_a, now_ms - ts_a < min_gap_ms)
                bps_last = jnp.where(px_a <= 0, 0.0,
                                     jnp.abs(c - px_a) / px_a * 1e4)
                too_close = jnp.logical_and(has_a, bps_last < min_px_bps)
                counted_a = jnp.logical_and(
                    hit_i, jnp.logical_not(jnp.logical_or(too_soon, too_close)))
                cnt_long = jnp.logical_and(counted_a, jnp.logical_not(side_short))
                cnt_short = jnp.logical_and(counted_a, side_short)
                for sd, counted in ((0, cnt_long), (1, cnt_short)):
                    j = 2 * i + sd
                    tm_cnt2.append(tm_cnt[j] + counted.astype(jnp.float32))
                    tm_ts2.append(jnp.where(counted, now_ms, tm_ts[j]))
                    tm_px2.append(jnp.where(counted, c, tm_px[j]))
            tm_cnt, tm_ts, tm_px = tuple(tm_cnt2), tuple(tm_ts2), tuple(tm_px2)

            # edge taps (:1189-1197) from the minute-close MAs
            ratio_ok = jnp.logical_and(vol_ma_s != 0.0, vol_ma_l > 0.0)
            ratio = jnp.where(ratio_ok, vol_ma_s / jnp.maximum(vol_ma_l, 1e-30), 1.0)
            at_top = jnp.logical_and(
                jnp.logical_and(box_valid > 0.5, h >= box_high - 1e-9), acc_now)
            at_bot = jnp.logical_and(
                jnp.logical_and(box_valid > 0.5, low <= box_low + 1e-9), acc_now)
            tap_ts2 = list(tap_ts)
            tap_ratio2 = list(tap_ratio)
            for e, do_edge in enumerate((at_top, at_bot)):
                o = e * TAP_SLOTS
                for k in range(TAP_SLOTS - 1, 0, -1):
                    tap_ts2[o + k] = jnp.where(do_edge, tap_ts[o + k - 1],
                                               tap_ts[o + k])
                    tap_ratio2[o + k] = jnp.where(do_edge, tap_ratio[o + k - 1],
                                                  tap_ratio[o + k])
                tap_ts2[o] = jnp.where(do_edge, now_ms, tap_ts[o])
                tap_ratio2[o] = jnp.where(do_edge, ratio, tap_ratio[o])
            # breakout resets the touch box (:1154-1156 via enginepath D)
            breakout = jnp.logical_or(
                regime == jnp.float32(G.REGIME_BREAKOUT_UP),
                regime == jnp.float32(G.REGIME_BREAKOUT_DOWN))
            bf = breakout.astype(jnp.float32)
            keep = 1.0 - bf
            tm_cnt = tuple(x * keep for x in tm_cnt)
            tm_ts = tuple(jnp.where(breakout, _NEVER, x) for x in tm_ts)
            tm_px = tuple(x * keep for x in tm_px)
            tap_ts = tuple(jnp.where(breakout, _NEVER, x) for x in tap_ts2)
            tap_ratio = tuple(x * keep for x in tap_ratio2)

        hstate = ((pend_mlb, pend_polb, pend_x1, pend_x6)
                  + tuple(hm) + tuple(hp_cnt) + tuple(hp_x1) + tuple(hp_x6)
                  ) if harvest else hstate
        ret = (log_close, c, side, entry, stop, target, risk0, cooldown_until,
               last_dir, equity, peak, dd, trades, wins, losses, escal,
               c_counts, c_latch, tm_cnt, tm_ts, tm_px, tap_ts, tap_ratio,
               run_low, run_high, box_low, box_high, box_valid, regime,
               inside_cnt, ring_v, ring_c, skips, hstate)
        if carry_x:
            ret = ret[:2] + (samp_st,) + ret[2:]
        return ret

    def _confluence_thresh(confl_d, within):
        cnt = zero
        for d_i, lv in confl_d:
            near = jnp.logical_and(d_i <= within, lv > 0)
            cnt = cnt + near.astype(jnp.float32)
        return cnt

    def _hist_gather(ch, idx_f):
        """Per-lane gather of channel ``ch`` of the recorded-bar tables at
        indices ``idx_f`` (shared 128-lane-chunked dynamic_gather helper)."""
        return _hist_gather_tiles(
            lambda ti: get_hist_tile(ch, ti), h_tiles, idx_f, rows=s)

    def _ring_fold(ring, op):
        """Elementwise fold of every (8, lanes) slot of a stacked ring with a
        balanced tree (log-depth dependency chain for the VPU)."""
        vals = [ring_slot(ring, j) for j in range(ring.shape[0] // s)]
        while len(vals) > 1:
            nxt = [op(vals[i], vals[i + 1])
                   for i in range(0, len(vals) - 1, 2)]
            if len(vals) % 2:
                nxt.append(vals[-1])
            vals = nxt
        return vals[0]

    def _volume_slope6(rv_slot, n_bars):
        """_calc_volume_slope (:1796-1811), window 6 over the newest-first
        volume ring holding bars <= t-1 (n_bars of them)."""
        n = jnp.minimum(n_bars, jnp.float32(VOL_RING))
        m = jnp.minimum(jnp.float32(6.0), n)
        half = jnp.maximum(2.0, jnp.floor(m / 2.0))
        # newest-first slot j holds window-index (m-1-j), oldest == index 0
        v1 = zero
        v2 = zero
        for j in range(6):
            jf = jnp.float32(j)
            in_win = jf < m
            idx = (m - 1.0) - jf
            w1 = jnp.logical_and(in_win, idx < half).astype(jnp.float32)
            w2 = jnp.logical_and(in_win, idx >= m - half).astype(jnp.float32)
            v1 = v1 + rv_slot(j) * w1
            v2 = v2 + rv_slot(j) * w2
        v1 = v1 / half
        v2 = v2 / half
        slope = (v2 - v1) / (jnp.abs(v1) + 1e-9)
        slope = jnp.where(jnp.logical_and(v1 == 0.0, v2 == 0.0), 0.0, slope)
        # scalar-predicate select as a blend (see the guard-MA blend note)
        return slope * (n >= 3.0).astype(jnp.float32)

    def _escalation(*, side, is_long, entry, c, rc_slot, rv_slot,
                    bp, bd):
        """should_escalate_on_target (:897-960) on the pre-push rings;
        ``bp``/``bd`` are the bar's shared nearest-level scan (the live loop
        evaluates both at the same close price).

        STATIC precondition (proved by the caller's loop segmentation): this
        bar has ``t >= CLOSE_RING``, so the ring holds a full 5-bar window —
        ``n5 == 5``, ``trend_def`` true, every slot in-window, slot 4 the
        oldest — and those former per-bar tile computations fold to Python
        constants (round-5 escalation diet; bars t < CLOSE_RING skip the
        walk entirely via ``esc_mode="off"``)."""
        pw = jnp.float32(0.35)       # PROXIMITY_WINDOW (:704-718)
        inf = jnp.float32(_BIG)
        near = bd <= pw
        # |close - level| per ring slot, computed once and shared by the
        # approach inference AND every (d_j, d_prev) pair of the trend mask
        darr = [jnp.abs(rc_slot(j) - bp) for j in range(CLOSE_RING)]
        # approach: last two ring closes (infer_approach :554-565);
        # inferred_ok == toward (n_hist >= 2 holds statically)
        p1 = rc_slot(1)
        toward = darr[0] < darr[1]
        # from_above when price > level; bool select via and/or (no i1 where)
        appr_from_below = jnp.logical_or(
            jnp.logical_and(toward, p1 <= bp),
            jnp.logical_and(jnp.logical_not(toward), c <= bp))
        # volume trend toward the level over the last 5 bars (:567-601);
        # n5 == 5, all slots in-window, slot 4 is the oldest (kept always —
        # its keep compare darr[4] <= darr[4] is vacuously true too)
        sel = [darr[j] <= darr[j + 1] for j in range(CLOSE_RING - 1)]
        cnt = jnp.float32(1.0) + zero   # slot 4, always selected
        for j in range(CLOSE_RING - 1):
            cnt = cnt + sel[j].astype(jnp.float32)
        use_all = cnt < 3.0               # min_bars_for_trend
        msel = [jnp.where(use_all, 1.0, sel[j].astype(jnp.float32))
                for j in range(CLOSE_RING - 1)]
        mcnt = jnp.where(use_all, jnp.float32(CLOSE_RING), cnt)
        # halves averages, k = max(2, cnt//2); order index counts oldest-first
        k2 = jnp.maximum(2.0, jnp.floor(mcnt / 2.0))
        # slot 4 (oldest, weight 1, older == 0): 0 < k2 always (k2 >= 2), so
        # it joins first_sum unconditionally; its in_last test stays dynamic
        first_sum = rv_slot(CLOSE_RING - 1) + zero
        last_sum = rv_slot(CLOSE_RING - 1) * (
            jnp.float32(0.0) >= mcnt - k2).astype(jnp.float32)
        older = jnp.float32(1.0) + zero
        for j in range(CLOSE_RING - 2, -1, -1):   # oldest → newest
            w = msel[j]
            in_first = (older < k2).astype(jnp.float32) * w
            in_last = (older >= mcnt - k2).astype(jnp.float32) * w
            first_sum = first_sum + rv_slot(j) * in_first
            last_sum = last_sum + rv_slot(j) * in_last
            older = older + w
        trend = (last_sum - first_sum) / k2
        vol_trend = trend            # trend_def holds statically
        reversal = vol_trend < 0.0
        # direction the predicted move points (:830-831, :865-866); the
        # nested bool selects compose with and/or (no i1 where in Mosaic):
        # reversal bounces DOWN when approaching from below; continuation
        # punches DOWN when approaching from above — the move is against the
        # trade when it points down for longs / up for shorts
        move_down = jnp.logical_or(
            jnp.logical_and(reversal, appr_from_below),
            jnp.logical_and(jnp.logical_not(reversal),
                            jnp.logical_not(appr_from_below)))
        against = jnp.logical_or(
            jnp.logical_and(is_long, move_down),
            jnp.logical_and(jnp.logical_not(is_long),
                            jnp.logical_not(move_down)))
        level_valid = jnp.logical_and(has_levels > 0.5, near)
        can_decide = level_valid          # trend_def holds statically
        do_exit = jnp.logical_and(can_decide, against)
        continuation = jnp.logical_and(can_decide, jnp.logical_not(reversal))
        # next level beyond the anchor (:1038-1049)
        anchor = jnp.where(level_valid, bp, c)
        eps = jnp.float32(1e-9)
        up_px = jnp.full((s, b), inf, jnp.float32)
        dn_px = jnp.full((s, b), -inf, jnp.float32)
        any_up = jnp.zeros((s, b), bool)
        any_dn = jnp.zeros((s, b), bool)
        for i in range(max_levels):
            lp, lv, _ = lvl[i]
            hi = jnp.logical_and(lv > 0, lp > anchor + eps)
            lo = jnp.logical_and(lv > 0, lp < anchor - eps)
            up_px = jnp.where(hi, jnp.minimum(up_px, lp), up_px)
            dn_px = jnp.where(lo, jnp.maximum(dn_px, lp), dn_px)
            any_up = jnp.logical_or(any_up, hi)
            any_dn = jnp.logical_or(any_dn, lo)
        nxt = jnp.where(is_long, up_px, dn_px)
        found = jnp.logical_or(jnp.logical_and(is_long, any_up),
                               jnp.logical_and(jnp.logical_not(is_long), any_dn))
        trail = jnp.where(is_long, jnp.maximum(entry, anchor - pw),
                          jnp.minimum(entry, anchor + pw))
        trail = jnp.round(trail * 100.0) / 100.0   # cents (:952)
        go = jnp.logical_and(
            jnp.logical_and(jnp.logical_not(do_exit), continuation), found)
        return go, nxt, trail

    # static young-bar peel: double-bar steps whose BOTH bars satisfy
    # t < young_bars run the reduced minute-close body (see _one_bar).
    # The escalation peel composes with it: steps < 2 (bars 0-3) have both
    # bars below CLOSE_RING (walk statically dead), step 2 mixes bar 4
    # (dead) with bar 5 (the first live bar), and steps >= 3 run the
    # static-fold walk.  Segment boundaries honor both peels.
    k2 = max(0, min(num_bars // 2, young_bars // 2))
    nsteps = num_bars // 2
    final = init

    def _esc_modes(step):
        if step >= (CLOSE_RING + 1) // 2 + 1:
            return ("static", "static")
        if 2 * step + 1 < CLOSE_RING:
            return ("off", "off")
        return ("off" if 2 * step < CLOSE_RING else "static",
                "off" if 2 * step + 1 < CLOSE_RING else "static")

    bounds = sorted({0, min(2, nsteps), min(3, nsteps),
                     min(k2, nsteps), nsteps})
    for a, b2 in zip(bounds, bounds[1:]):
        young_seg = b2 <= k2
        modes = _esc_modes(a)
        assert all(_esc_modes(t) == modes for t in range(a, b2))
        if b2 - a == 1:
            final = body(jnp.int32(a), final, young=young_seg,
                         esc_modes=modes)
        else:
            final = jax.lax.fori_loop(
                a, b2, functools.partial(body, young=young_seg,
                                         esc_modes=modes), final)
    if num_bars % 2:
        # final half step: first Box-Muller branch of one extra draw block
        t2 = jnp.int32(num_bars // 2)
        nk0 = 4 if bootstrap else (12 if hes else 10)
        if noise is not None:
            r1 = jnp.sqrt(-2.0 * jnp.log(draw(t2, nk0)))
            a1 = _TWO_PI * draw(t2, nk0 + 1)
            r2 = jnp.sqrt(-2.0 * jnp.log(draw(t2, nk0 + 2)))
            a2 = _TWO_PI * draw(t2, nk0 + 3)
            nz_last = (r1 * jnp.cos(a1), r1 * jnp.sin(a1),
                       r2 * jnp.cos(a2), r2 * jnp.sin(a2))
        else:
            nz_last = None
        young_last = (num_bars - 1) < young_bars
        esc_last = "off" if (num_bars - 1) < CLOSE_RING else "static"
        if bootstrap:
            final = _one_bar(final, jnp.int32(num_bars - 1), draw(t2, 0),
                             None, None, None, draw(t2, 2), nz_last,
                             young=young_last, esc_mode=esc_last)
        elif hes:
            z_last = jnp.sqrt(-2.0 * jnp.log(draw(t2, 0))) * jnp.cos(
                _TWO_PI * draw(t2, 1))
            zv_last = jnp.sqrt(-2.0 * jnp.log(draw(t2, 2))) * jnp.cos(
                _TWO_PI * draw(t2, 3))
            zq_last = jnp.sqrt(-2.0 * jnp.log(draw(t2, 4))) * jnp.cos(
                _TWO_PI * draw(t2, 5))
            final = _one_bar(final, jnp.int32(num_bars - 1), z_last, zv_last,
                             draw(t2, 6), draw(t2, 7), draw(t2, 8), nz_last,
                             young=young_last, zq=zq_last, esc_mode=esc_last)
        else:
            z_last = jnp.sqrt(-2.0 * jnp.log(draw(t2, 0))) * jnp.cos(
                _TWO_PI * draw(t2, 1))
            if antithetic:
                z_last = _anti(z_last)
            zv_last = jnp.sqrt(-2.0 * jnp.log(draw(t2, 2))) * jnp.cos(
                _TWO_PI * draw(t2, 3))
            final = _one_bar(final, jnp.int32(num_bars - 1), z_last, zv_last,
                             draw(t2, 4), draw(t2, 5), draw(t2, 6), nz_last,
                             young=young_last, esc_mode=esc_last)
    if carry_x:
        final = final[:2] + final[3:]          # drop the sampler-state carry
    (_, _, side, _, _, _, _, _, _, equity, _, dd, trades, wins, losses, escal,
     *_rest) = final
    skips = final[-2]
    hstate = final[-1][4:] if harvest else ()   # tally tiles (pend_* dropped)
    return side, equity, dd, trades, wins, losses, escal, skips, hstate


def _engine_accumulate(acc_ref, pre: tuple, final, *, n_paths: int) -> None:
    """Fold one block's final engine state into accumulator rows at prefix
    ``pre`` (``()`` single-config, ``(g,)`` per-grid-row for the sweep)."""
    side, equity, dd, trades, wins, losses, escal, skips, hstate = final

    def row(k):
        return pre + (slice(k, k + 1), slice(None))

    col = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    entered = trades > 0.0
    we = entered.astype(jnp.float32)
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

    bin_idx = jnp.clip(
        ((equity - jnp.float32(LIFE_HIST_LO))
         * jnp.float32(HIST_BINS / (LIFE_HIST_HI - LIFE_HIST_LO))).astype(jnp.int32),
        0, HIST_BINS - 1)
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

    kvec = jnp.zeros((1, 128), jnp.float32)
    for k, sk in enumerate(skips):
        kvec = kvec + jnp.where(col == k, jnp.sum(sk), 0.0)
    kvec = kvec + jnp.where(col == len(skips), jnp.sum(escal), 0.0)
    acc_ref[row(ROW_SKIP)] += kvec

    if hstate:
        # learning-flywheel harvest: one packed (1, 128) '+'-combine row,
        # models/harvest.py layout (64 ml counts, then pol counts/Σx1/Σx6)
        hvec = jnp.zeros((1, 128), jnp.float32)
        for k, tile in enumerate(hstate):
            hvec = hvec + jnp.where(col == k, jnp.sum(tile), 0.0)
        acc_ref[row(ROW_HARVEST)] += hvec


def _engine_keepalive(acc_ref, final) -> None:
    """Roofline probe half of ``no_fold``: keep every final-state channel
    live with one (1, 128) slice-add per tile — no cross-lane reductions,
    no histogram, no min/max — so Mosaic cannot dead-code the engine loop
    while the fold's cost is excluded.  Output stats are meaningless; the
    mode exists to measure what `_engine_accumulate` costs (RESULTS.md
    §4g / ROADMAP item 0)."""
    side, equity, dd, trades, wins, losses, escal, skips, hstate = final
    v = jnp.zeros((1, 128), jnp.float32)
    for ch in ((side, equity, dd, trades, wins, losses, escal)
               + tuple(skips) + tuple(hstate)):
        # consume EVERY lane half (a 0:128 slice alone lets Mosaic
        # dead-code the other vreg of the whole upstream dataflow)
        for off in range(0, ch.shape[1], 128):
            v = v + ch[0:1, off:off + 128]
    acc_ref[ROW_SUM:ROW_SUM + 1, :] += v


def _engine_kernel(
    seed_ref,          # SMEM (1,1) i32
    eng_ref,           # SMEM (1,ENG_COLS) f32 engine knobs + noise stds
    ml_ref,            # SMEM (1,8) f32: [c0..c3, intercept, usable, _, _]
    pol_ref,           # SMEM (3,8) f32: w_entry rows (7 dims + pad)
    tm_ref,            # SMEM (1,8) f32 touch params
    gd_ref,            # SMEM (1,8) f32 guard params
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
    lanes: int,
    vm: tuple,
    escalation: bool,
    external_rng: bool = False,
    use_noise: bool = False,
    use_harvest: bool = False,
    sampler: str = "gbm",
    hist_len: int = 0,
    block_len: int = 0,
    heston=None,
    antithetic: bool = False,
    gen_only: bool = False,
    skip_d: bool = False,
    no_fold: bool = False,
    policy_off: bool = False,
    young_bars: int = 0,
    rot_rings: bool = False,
):
    s, b = ENGINE_SUB, lanes
    stride = _draw_stride(sampler, use_noise)
    refs = list(refs)
    ring_refs = None
    if rot_rings:
        ring_refs = tuple(refs[-2:])   # trailing VMEM scratch buffers
        refs = refs[:-2]
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
    else:
        (acc_ref,) = refs
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))

        def draw(t2, k):
            return _uniform((s, b))

    final = _engine_lifecycle_loop(
        draw, lambda i: (level_price_ref[i, 0], level_valid_ref[i, 0],
                         level_kind_ref[i, 0]),
        num_bars=num_bars, drift=jnp.float32(drift),
        sig_dt=jnp.float32(sig_dt), log_s0=jnp.float32(np.log(s0)),
        eng=tuple(eng_ref[0, k] for k in range(17)),
        ml=tuple(ml_ref[0, k] for k in range(6)),
        pol_w=tuple(tuple(pol_ref[a, d] for d in range(POLICY_FEATURE_DIM))
                    for a in range(3)),
        tm=tuple(tm_ref[0, k] for k in range(7)),
        gd=tuple(gd_ref[0, k] for k in range(4)),
        max_levels=max_levels, lanes=lanes, vm=vm, escalation=escalation,
        noise=(tuple(eng_ref[0, 17 + k] for k in range(4))
               if use_noise else None),
        harvest=use_harvest, sampler=sampler, hist=hist, block_len=block_len,
        heston=heston, antithetic=antithetic, gen_only=gen_only,
        skip_d=skip_d, policy_off=policy_off, young_bars=young_bars,
        ring_refs=ring_refs,
    )

    @pl.when(pl.program_id(0) == 0)
    def _init():
        _init_acc(acc_ref)

    if no_fold:
        _engine_keepalive(acc_ref, final)
    else:
        _engine_accumulate(acc_ref, (), final, n_paths=s * b)


ENG_COLS = 21   # 17 engine knobs + 4 execution-noise stds (zero when off)


def _pack_eng(params: EngineParams, policy_gate_disabled, bar0_minute,
              has_levels, g: int | None = None, noise=None):
    """Pack the engine-knob row(s) the kernels read from SMEM: 17 knobs plus
    the 4 McNoise stds (lvl_jitter, entry_slip, stop_slip, tgt_slip; zeros
    when noise is off).  With ``g``, EngineParams leaves may be [G] vectors
    (or scalars, which broadcast) → (G, ENG_COLS) grid rows; otherwise a
    (1, ENG_COLS) single row."""
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    zero = jnp.float32(0.0)
    cols = [
        f32(params.contact_prox), f32(params.stop_padding),
        f32(params.tp_padding), f32(params.q_min_prob),
        f32(params.cooldown_s) * 1000.0, f32(params.enable_veto),
        f32(params.veto_vol_strong), f32(params.veto_prox),
        f32(params.disable_ml_gate), f32(params.use_blend),
        f32(params.w_rules), f32(params.w_ml), f32(params.confluence_within),
        f32(params.overtouch_limit), jnp.float32(bool(policy_gate_disabled)),
        jnp.float32(int(bar0_minute)), f32(has_levels),
        f32(noise.level_jitter_std) if noise is not None else zero,
        f32(noise.entry_slip_std) if noise is not None else zero,
        f32(noise.stop_slip_std) if noise is not None else zero,
        f32(noise.target_slip_std) if noise is not None else zero,
    ]
    if g is None:
        return jnp.stack(cols).reshape(1, ENG_COLS)
    return jnp.stack(
        [jnp.broadcast_to(c.reshape(-1), (g,)) for c in cols], axis=1)


def _pack_eng_sg(params: EngineParams, policy_gate_disabled, bar0_minute,
                 n_sym: int, n_grid: int, noise=None):
    """(S, G, ENG_COLS) knob slab for the sweep-of-universes kernel: every
    EngineParams (and McNoise std) leaf may be a scalar (shared), a [G]
    vector (shared grid), or an [S, G] matrix (per-symbol grids)."""
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    zero = jnp.float32(0.0)
    cols = [
        f32(params.contact_prox), f32(params.stop_padding),
        f32(params.tp_padding), f32(params.q_min_prob),
        f32(params.cooldown_s) * 1000.0, f32(params.enable_veto),
        f32(params.veto_vol_strong), f32(params.veto_prox),
        f32(params.disable_ml_gate), f32(params.use_blend),
        f32(params.w_rules), f32(params.w_ml), f32(params.confluence_within),
        f32(params.overtouch_limit), jnp.float32(bool(policy_gate_disabled)),
        jnp.float32(int(bar0_minute)), jnp.float32(1.0),   # has_levels: per-sym
        f32(noise.level_jitter_std) if noise is not None else zero,
        f32(noise.entry_slip_std) if noise is not None else zero,
        f32(noise.stop_slip_std) if noise is not None else zero,
        f32(noise.target_slip_std) if noise is not None else zero,
    ]

    def sg(c):
        if c.ndim == 0:
            c = c.reshape(1, 1)
        elif c.ndim == 1:
            c = c.reshape(1, -1)
        return jnp.broadcast_to(c, (n_sym, n_grid))

    return jnp.stack([sg(c) for c in cols], axis=-1)   # (S, G, ENG_COLS)


def _pack_shared(policy, ml_model, touch_params, guard_params):
    """The grid-invariant SMEM rows: ML model, policy entry head, touch
    params, guard params."""
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    ml_usable = jnp.logical_and(ml_model.present, ml_model.n_features == 4)
    mlv = jnp.concatenate([
        f32(ml_model.coef).reshape(4), f32(ml_model.intercept).reshape(1),
        f32(ml_usable).reshape(1), jnp.zeros((2,), jnp.float32),
    ]).reshape(1, 8)
    polv = jnp.pad(f32(policy.w_entry), ((0, 0), (0, 8 - POLICY_FEATURE_DIM)))
    tmv = jnp.stack([
        f32(touch_params.tol_bps), f32(touch_params.min_time_gap_ms),
        f32(touch_params.min_price_gap_bps), f32(touch_params.decay),
        f32(touch_params.max_bounces), f32(touch_params.fatigue_window_ms),
        f32(touch_params.fatigue_vol_k), jnp.float32(0.0),
    ]).reshape(1, 8)
    gdv = jnp.stack([
        f32(guard_params.min_bars), f32(guard_params.compression_bp),
        f32(guard_params.vol_k), f32(guard_params.reenter_clear_bars),
        jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
    ]).reshape(1, 8)
    return mlv, polv, tmv, gdv


def _unpack_acc_engine(acc, n_skip: int, harvest: bool = False):
    tot = acc[..., ROW_SUM, :]
    entered = tot[..., 1]
    mn = jnp.where(entered > 0, acc[..., ROW_MIN, 0], jnp.inf)
    mx = jnp.where(entered > 0, acc[..., ROW_MAX, 0], -jnp.inf)
    stats = PathStats(
        n=tot[..., 0], n_entered=entered, n_tp=tot[..., 2], n_stop=tot[..., 3],
        n_open=tot[..., 4], sum_r=tot[..., 5], sum_r2=tot[..., 6],
        min_r=mn, max_r=mx,
        sum_trades=tot[..., 7], sum_dd=tot[..., 8],
        max_dd=acc[..., ROW_MAXDD, 0],
        hist=acc[..., ROW_HIST, :HIST_BINS],
        hist_lo=LIFE_HIST_LO, hist_hi=LIFE_HIST_HI,
    )
    skips = acc[..., ROW_SKIP, :n_skip]
    escal = acc[..., ROW_SKIP, n_skip]
    if harvest:
        hv = HV.EngineHarvest.from_acc_row(
            acc[..., ROW_HARVEST, :HV.HARVEST_COLS])
        return stats, skips, escal, hv
    return stats, skips, escal


def mc_paths_pallas_engine(
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
    lanes: int = ENGINE_LANES,
    policy=None,
    ml_model: MlModel | None = None,
    touch_params: T.TouchMemoryParams | None = None,
    guard_params: G.GuardParams | None = None,
    policy_gate_disabled: bool | None = None,
    escalation: bool = True,
    bar0_minute: int = 0,
    volume_model: VolumeModel | None = None,
    noise=None,               # montecarlo.McNoise — per-entry execution noise
    harvest: bool = False,    # collect flywheel label stats (models/harvest.py)
    sampler: str = "gbm",     # "gbm" | "bootstrap" (recorded-bar resampling)
    hist_bars=None,           # PathBars-like 1-D o/h/l/c/v history (bootstrap)
    block_len: int = 10,      # block_bootstrap: contiguous run length
    heston=None,              # heston: dict(v0, kappa, theta, xi, rho)
    antithetic: bool = False, # lane-paired sign-flipped normals (gbm only)
    gen_only: bool = False,   # roofline mode: generate bars, skip the engine
    skip_d: bool = False,     # roofline mode: skip the minute-close pipeline
    no_fold: bool = False,    # roofline mode: full engine, skip the fold
                              # (keepalive slice-adds only; stats meaningless)
    rot_rings: bool = True,   # rotating scratch rings (A/B probe knob; the
                              # carry-ring form is bitwise identical, slower)
    interpret=False,
    external_uniforms=None,   # f32[n_blocks, stride*ceil(num_bars/2), 8, lanes]
):
    """Fused-kernel FULL-ENGINE MC: ``sim/enginepath.mc_paths_engine``'s
    lifecycle entirely on-chip, including the McNoise per-entry execution
    noise knobs.  Returns (PathStats, skip_counts[16], escalations) with the
    same semantics; hardware mode uses the per-core PRNG (statistical
    agreement; exact parity under injected uniforms).  ``harvest=True``
    accumulates the closed-trade label statistics on-chip (entry-time
    ML/policy bucket tallies in extra state tiles, reduced into accumulator
    row ROW_HARVEST) and returns a 4-tuple ending in the ``EngineHarvest``.

    Kernel-specialized constants (validated here, outside jit): the guard's
    5/20-bar volume MAs and the 3-hit edge-fatigue stack are compiled in, so
    ``guard_params.vol_short/vol_long`` and ``touch_params.fatigue_hits``
    must keep their reference defaults."""
    if touch_params is None:
        touch_params = T.TouchMemoryParams.default()
    if guard_params is None:
        guard_params = G.GuardParams.default()
    if ml_model is None:
        ml_model = MlModel.absent()
    if policy_gate_disabled is None:
        policy_gate_disabled = policy is None
    if policy is None:
        policy = OP.PolicyParams.init()
    if volume_model is None:
        volume_model = VolumeModel()
    block = ENGINE_SUB * lanes
    if num_paths % block != 0:
        raise ValueError(f"num_paths must be a multiple of {block}")
    if levels.max_levels > MAX_KERNEL_LEVELS:
        raise ValueError(
            f"pallas engine kernel supports up to {MAX_KERNEL_LEVELS} level "
            "slots (the reference's recovered 30-level session fits)")
    if int(touch_params.fatigue_hits) != TAP_SLOTS:
        raise ValueError(f"engine kernel is built for fatigue_hits == {TAP_SLOTS}")
    if int(guard_params.vol_short) != 5 or int(guard_params.vol_long) != VOL_RING:
        raise ValueError("engine kernel is built for 5/20-bar guard MAs")
    if sampler not in ("gbm", "bootstrap", "block_bootstrap", "heston"):
        raise ValueError("engine kernel samplers: 'gbm' | 'bootstrap' | "
                         "'block_bootstrap' | 'heston'")
    if antithetic and sampler != "gbm":
        raise ValueError("kernel antithetic pairs gbm normals only")
    if antithetic and lanes % 256 != 0:
        raise ValueError("antithetic needs lanes % 256 == 0 (half-tile pairs)")
    if sampler in ("bootstrap", "block_bootstrap") and hist_bars is None:
        raise ValueError("sampler='bootstrap' requires hist_bars (recorded "
                         "o/h/l/c/v history)")
    return _engine_impl(
        seed, levels, params, policy, ml_model, touch_params, guard_params,
        noise, hist_bars, external_uniforms,
        num_paths=num_paths, num_bars=num_bars, s0=s0, mu=mu, sigma=sigma,
        dt=dt, lanes=lanes,
        policy_gate_disabled=bool(policy_gate_disabled),
        escalation=escalation, bar0_minute=int(bar0_minute),
        volume_model=volume_model, harvest=bool(harvest), sampler=sampler,
        block_len=int(block_len) if sampler == "block_bootstrap" else 0,
        heston=_heston_tuple(heston, mu, dt), antithetic=bool(antithetic),
        gen_only=bool(gen_only), skip_d=bool(skip_d), no_fold=bool(no_fold),
        young_bars=_young_bars(guard_params), interpret=interpret,
        rot_rings=bool(rot_rings),
    )


# _hist_slab / _hist_slab_batched (bootstrap-table VMEM slabs) live in
# pallas_mc and are shared by the gated kernel family.


@functools.partial(
    jax.jit,
    static_argnames=("rot_rings", "num_paths", "num_bars", "s0", "mu", "sigma", "dt",
                     "lanes", "volume_model", "escalation", "bar0_minute",
                     "policy_gate_disabled", "harvest", "sampler", "block_len",
                     "heston", "antithetic", "gen_only", "skip_d", "no_fold",
                     "young_bars", "interpret"),
)
def _engine_impl(
    seed, levels, params, policy, ml_model, touch_params, guard_params,
    noise, hist_bars, external_uniforms, *, num_paths, num_bars, s0, mu,
    sigma, dt, lanes, policy_gate_disabled, escalation, bar0_minute,
    volume_model, harvest, sampler, block_len, heston, antithetic, gen_only,
    skip_d, no_fold, young_bars, interpret, rot_rings=True,
):
    block = ENGINE_SUB * lanes
    n_blocks = num_paths // block
    n_skip = len(SKIP_REASONS)

    drift = (mu - 0.5 * sigma * sigma) * dt
    sig_dt = sigma * float(np.sqrt(dt))
    external_rng = external_uniforms is not None
    use_noise = noise is not None
    stride = _draw_stride(sampler, use_noise)
    vm = (float(volume_model.base), float(volume_model.u_amp),
          float(volume_model.noise_sigma), float(volume_model.ret_coupling),
          int(volume_model.day_minutes), int(volume_model.open_minute))
    if sampler in ("bootstrap", "block_bootstrap"):
        hist, hist_len = _hist_slab(hist_bars, lanes)
    else:
        hist, hist_len = None, 0
    kernel = functools.partial(
        _engine_kernel, num_bars=num_bars, s0=s0, drift=drift, sig_dt=sig_dt,
        max_levels=levels.max_levels, lanes=lanes, vm=vm,
        escalation=escalation, external_rng=external_rng, use_noise=use_noise,
        use_harvest=harvest, sampler=sampler, hist_len=hist_len,
        block_len=block_len, heston=heston, antithetic=antithetic,
        gen_only=gen_only, skip_d=skip_d, no_fold=no_fold,
        policy_off=bool(policy_gate_disabled),
        young_bars=young_bars, rot_rings=rot_rings,
    )
    eng = _pack_eng(params, policy_gate_disabled, bar0_minute,
                    levels.count > 0, noise=noise)
    mlv, polv, tmv, gdv = _pack_shared(policy, ml_model, touch_params,
                                       guard_params)
    lp, lv = _level_rows(levels.price, levels.valid, levels.max_levels)
    lk = jnp.broadcast_to(
        jnp.asarray(levels.kind, jnp.float32)[:, None], (levels.max_levels, 128))
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)

    acc = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ENG_COLS), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((3, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
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
            pl.BlockSpec((1, stride * ((num_bars + 1) // 2), ENGINE_SUB, lanes),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
        ] if external_rng else []),
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=([
            pltpu.VMEM((VOL_RING * ENGINE_SUB, lanes), jnp.float32),
            pltpu.VMEM((CLOSE_RING * ENGINE_SUB, lanes), jnp.float32),
        ] if rot_rings else []),
        interpret=interpret,
    )(*((seed_arr, eng, mlv, polv, tmv, gdv, lp, lv, lk)
         + ((hist,) if hist is not None else ())
         + ((jnp.asarray(external_uniforms, jnp.float32),)
            if external_rng else ())))

    return _unpack_acc_engine(acc, n_skip, harvest=harvest)


# --------------------------------------------------------------------------
# engine-knob grid sweep with common random numbers
# --------------------------------------------------------------------------

def _engine_sweep_kernel(
    seed_ref,          # SMEM (1,1) i32
    grid_ref,          # SMEM (G, ENG_COLS) f32 engine-knob rows (_pack_eng
                       # layout incl. per-row noise stds at cols 17..20)
    ml_ref,            # SMEM (1,8) f32 (shared across the grid)
    pol_ref,           # SMEM (3,8) f32
    tm_ref,            # SMEM (1,8) f32
    gd_ref,            # SMEM (1,8) f32
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
    lanes: int,
    vm: tuple,
    escalation: bool,
    n_grid: int,
    external_rng: bool = False,
    use_noise: bool = False,
    sampler: str = "gbm",
    hist_len: int = 0,
    block_len: int = 0,
    heston=None,
    policy_off: bool = False,
    young_bars: int = 0,
    rot_rings: bool = False,
):
    """One path block run through the FULL engine once per grid row.  The
    hardware PRNG is re-seeded to the block's seed before each row, so every
    knob configuration consumes the identical uniform stream (bars, volumes,
    ties — and with noise, the SAME noise normals scaled by each row's stds:
    a slippage-sensitivity sweep) — pure decision-surface comparison, zero
    cross-config sampling variance.  Engine knobs change which trades open
    AND how the touch/guard state evolves, so the whole generate+engine loop
    re-runs per row.  ``sampler="bootstrap"`` resamples the shared recorded
    history instead of generating GBM bars — identical resample indices per
    row, so the sweep compares knobs over the SAME recorded-bar paths."""
    s, b = ENGINE_SUB, lanes
    stride = _draw_stride(sampler, use_noise)
    refs = list(refs)
    ring_refs = None
    if rot_rings:
        ring_refs = tuple(refs[-2:])   # trailing VMEM scratch buffers
        refs = refs[:-2]
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
        final = _engine_lifecycle_loop(
            draw, lambda i: (level_price_ref[i, 0], level_valid_ref[i, 0],
                             level_kind_ref[i, 0]),
            num_bars=num_bars, drift=jnp.float32(drift),
            sig_dt=jnp.float32(sig_dt), log_s0=jnp.float32(np.log(s0)),
            eng=tuple(grid_ref[g, k] for k in range(17)),
            ml=tuple(ml_ref[0, k] for k in range(6)),
            pol_w=tuple(tuple(pol_ref[a, d] for d in range(POLICY_FEATURE_DIM))
                        for a in range(3)),
            tm=tuple(tm_ref[0, k] for k in range(7)),
            gd=tuple(gd_ref[0, k] for k in range(4)),
            max_levels=max_levels, lanes=lanes, vm=vm, escalation=escalation,
            noise=(tuple(grid_ref[g, 17 + k] for k in range(4))
                   if use_noise else None),
            sampler=sampler, hist=hist, block_len=block_len, heston=heston,
            policy_off=policy_off, young_bars=young_bars,
            ring_refs=ring_refs,
        )
        _engine_accumulate(acc_ref, (g,), final, n_paths=s * b)


def mc_paths_pallas_engine_sweep(
    seed,
    levels: Levels,
    grid_params: EngineParams,   # leaves may be [G] vectors or scalars
    *,
    num_paths: int,
    num_bars: int = 40,
    s0: float = 100.0,
    mu: float = 0.0,
    sigma: float = 0.15,
    dt: float = 1.0 / (390.0 * 252.0),
    lanes: int = ENGINE_LANES,
    policy=None,
    ml_model: MlModel | None = None,
    touch_params: T.TouchMemoryParams | None = None,
    guard_params: G.GuardParams | None = None,
    policy_gate_disabled: bool | None = None,
    escalation: bool = True,
    bar0_minute: int = 0,
    volume_model: VolumeModel | None = None,
    noise=None,               # McNoise; leaves may be [G] for std sweeps
    n_grid: int | None = None,
    sampler: str = "gbm",     # "gbm" | "bootstrap" (recorded-bar resampling)
    hist_bars=None,           # PathBars-like 1-D o/h/l/c/v history (bootstrap)
    block_len: int = 10,      # block_bootstrap: contiguous run length
    heston=None,              # heston: dict(v0, kappa, theta, xi, rho)
    interpret=False,
    external_uniforms=None,
):
    """Engine-knob grid sweep over the fused FULL-ENGINE kernel with common
    random numbers: the grid axis carries complete 17-knob engine rows
    (prox, paddings, q_min, cooldown, veto thresholds, blend weights,
    overtouch limit, ...) built from [G]-leaved EngineParams, so the
    reference engine's whole decision surface sweeps in ONE kernel launch
    over shared paths.  ``noise`` (McNoise; scalar or [G] leaves) adds
    per-entry execution noise — every row sees the SAME noise normals scaled
    by its own stds, so [G]-leaved stds sweep slippage sensitivity under CRN.
    ``sampler="bootstrap"`` sweeps the knob grid over recorded-bar resampled
    paths (the reference MC replays recorded bars, :3353-3538) — CRN gives
    every row the identical resampled history walk.  Returns [G]-batched
    (PathStats, skips, escalations).

    Same kernel-specialized constants as ``mc_paths_pallas_engine``."""
    if touch_params is None:
        touch_params = T.TouchMemoryParams.default()
    if guard_params is None:
        guard_params = G.GuardParams.default()
    if ml_model is None:
        ml_model = MlModel.absent()
    if policy_gate_disabled is None:
        policy_gate_disabled = policy is None
    if policy is None:
        policy = OP.PolicyParams.init()
    if volume_model is None:
        volume_model = VolumeModel()
    if n_grid is None:
        sizes = {np.asarray(x).shape[0]
                 for x in jax.tree_util.tree_leaves(grid_params)
                 if np.asarray(x).ndim == 1}
        if len(sizes) != 1:
            raise ValueError(
                "pass n_grid or give grid_params at least one [G] leaf "
                f"(found sizes {sorted(sizes)})")
        (n_grid,) = sizes
    block = ENGINE_SUB * lanes
    if num_paths % block != 0:
        raise ValueError(f"num_paths must be a multiple of {block}")
    if levels.max_levels > MAX_KERNEL_LEVELS:
        raise ValueError(
            f"pallas engine sweep supports up to {MAX_KERNEL_LEVELS} level slots")
    if int(touch_params.fatigue_hits) != TAP_SLOTS:
        raise ValueError(f"engine kernel is built for fatigue_hits == {TAP_SLOTS}")
    if int(guard_params.vol_short) != 5 or int(guard_params.vol_long) != VOL_RING:
        raise ValueError("engine kernel is built for 5/20-bar guard MAs")
    if sampler not in ("gbm", "bootstrap", "block_bootstrap", "heston"):
        raise ValueError("engine kernel samplers: 'gbm' | 'bootstrap' | "
                         "'block_bootstrap' | 'heston'")
    if sampler in ("bootstrap", "block_bootstrap") and hist_bars is None:
        raise ValueError("sampler='bootstrap' requires hist_bars (recorded "
                         "o/h/l/c/v history)")
    return _engine_sweep_impl(
        seed, levels, grid_params, policy, ml_model, touch_params,
        guard_params, noise, hist_bars, external_uniforms,
        num_paths=num_paths, num_bars=num_bars, s0=s0, mu=mu, sigma=sigma,
        dt=dt, lanes=lanes, n_grid=int(n_grid),
        policy_gate_disabled=bool(policy_gate_disabled),
        escalation=escalation, bar0_minute=int(bar0_minute),
        volume_model=volume_model, sampler=sampler, block_len=int(block_len) if sampler == "block_bootstrap" else 0,
        heston=_heston_tuple(heston, mu, dt),
        young_bars=_young_bars(guard_params),
        interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_paths", "num_bars", "s0", "mu", "sigma", "dt",
                     "lanes", "n_grid", "volume_model", "escalation",
                     "bar0_minute", "policy_gate_disabled", "sampler", "block_len",
                     "heston", "young_bars", "interpret"),
)
def _engine_sweep_impl(
    seed, levels, grid_params, policy, ml_model, touch_params, guard_params,
    noise, hist_bars, external_uniforms, *, num_paths, num_bars, s0, mu,
    sigma, dt, lanes, n_grid, policy_gate_disabled, escalation, bar0_minute,
    volume_model, sampler, block_len, heston, young_bars, interpret,
):
    block = ENGINE_SUB * lanes
    n_blocks = num_paths // block
    n_skip = len(SKIP_REASONS)

    drift = (mu - 0.5 * sigma * sigma) * dt
    sig_dt = sigma * float(np.sqrt(dt))
    external_rng = external_uniforms is not None
    use_noise = noise is not None
    stride = _draw_stride(sampler, use_noise)
    vm = (float(volume_model.base), float(volume_model.u_amp),
          float(volume_model.noise_sigma), float(volume_model.ret_coupling),
          int(volume_model.day_minutes), int(volume_model.open_minute))
    if sampler in ("bootstrap", "block_bootstrap"):
        hist, hist_len = _hist_slab(hist_bars, lanes)
    else:
        hist, hist_len = None, 0
    kernel = functools.partial(
        _engine_sweep_kernel, num_bars=num_bars, s0=s0, drift=drift,
        sig_dt=sig_dt, max_levels=levels.max_levels, lanes=lanes, vm=vm,
        escalation=escalation, n_grid=n_grid, external_rng=external_rng,
        use_noise=use_noise, sampler=sampler, hist_len=hist_len, block_len=block_len, heston=heston,
        policy_off=bool(policy_gate_disabled),
        young_bars=young_bars,
        rot_rings=True,
    )
    grid = _pack_eng(grid_params, policy_gate_disabled, bar0_minute,
                     levels.count > 0, g=n_grid, noise=noise)
    mlv, polv, tmv, gdv = _pack_shared(policy, ml_model, touch_params,
                                       guard_params)
    lp, lv = _level_rows(levels.price, levels.valid, levels.max_levels)
    lk = jnp.broadcast_to(
        jnp.asarray(levels.kind, jnp.float32)[:, None], (levels.max_levels, 128))
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)

    acc = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((n_grid, ENG_COLS), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((3, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
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
            pl.BlockSpec((1, stride * ((num_bars + 1) // 2), ENGINE_SUB, lanes),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
        ] if external_rng else []),
        out_specs=pl.BlockSpec((n_grid, 8, 128), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_grid, 8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((VOL_RING * ENGINE_SUB, lanes), jnp.float32),
            pltpu.VMEM((CLOSE_RING * ENGINE_SUB, lanes), jnp.float32),
        ],
        interpret=interpret,
    )(*((seed_arr, grid, mlv, polv, tmv, gdv, lp, lv, lk)
         + ((hist,) if hist is not None else ())
         + ((jnp.asarray(external_uniforms, jnp.float32),)
            if external_rng else ())))

    return _unpack_acc_engine(acc, n_skip)


# --------------------------------------------------------------------------
# per-symbol universe: the full engine over a (symbol, block) grid
# --------------------------------------------------------------------------

def _engine_universe_kernel(
    seed_ref,          # SMEM (1,1) i32
    ml_ref,            # SMEM (1,8) f32 (shared across symbols)
    pol_ref,           # SMEM (3,8) f32
    tm_ref,            # SMEM (1,8) f32
    gd_ref,            # SMEM (1,8) f32
    sym_ref,           # VMEM (1, 1, 128) f32 per-symbol row:
                       #   [s0, sigma, eng[0..ENG_COLS-1] (_pack_eng layout,
                       #    incl. per-symbol noise stds at eng cols 17..20)]
    level_price_ref,   # VMEM (1, L, 128) f32 — THIS symbol's level slab
    level_valid_ref,   # VMEM (1, L, 128) f32
    level_kind_ref,    # VMEM (1, L, 128) f32
    *refs,             # [hist_ref (bootstrap, THIS symbol's table slab)],
                       # [u_ref (external rng, interpret tests only)], acc_ref
    num_bars: int,
    dt: float,
    max_levels: int,
    lanes: int,
    vm: tuple,
    escalation: bool,
    external_rng: bool = False,
    use_noise: bool = False,
    use_harvest: bool = False,
    sampler: str = "gbm",
    hist_len: int = 0,
    block_len: int = 0,
    heston=None,
    policy_off: bool = False,
    young_bars: int = 0,
    rot_rings: bool = False,
):
    """Per-(symbol, block) FULL-ENGINE lifecycle: the shared streaming loop
    with the symbol's s0/sigma AND all 17 engine knobs (plus its own noise
    stds) read from its VMEM slab row, and a per-symbol accumulator block.
    ``sampler="bootstrap"`` resamples each symbol's OWN recorded history
    (symbol-indexed table slab) — the scaled analog of the reference's
    per-symbol recorded-bar MC (:3353-3538)."""
    s, b = ENGINE_SUB, lanes
    stride = _draw_stride(sampler, use_noise)
    refs = list(refs)
    ring_refs = None
    if rot_rings:
        ring_refs = tuple(refs[-2:])   # trailing VMEM scratch buffers
        refs = refs[:-2]
    if sampler in ("bootstrap", "block_bootstrap"):
        hist_ref = refs.pop(0)
        hist = (lambda ch, ti: hist_ref[0, 8 * ch:8 * (ch + 1),
                                        ti * 128:(ti + 1) * 128],
                hist_len)
    else:
        hist = None
    # host-derived constants (cols 2+ENG_COLS..+2, pallas_mc._derived_consts):
    # bit-identical to the single-config kernel's static baking — on-device
    # log/sqrt diverge from host libm by ulps
    log_s0 = sym_ref[0, 0, 2 + ENG_COLS]
    sig_dt = sym_ref[0, 0, 2 + ENG_COLS + 1]
    drift = sym_ref[0, 0, 2 + ENG_COLS + 2]

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

    final = _engine_lifecycle_loop(
        draw, lambda i: (level_price_ref[0, i, 0], level_valid_ref[0, i, 0],
                         level_kind_ref[0, i, 0]),
        num_bars=num_bars, drift=drift, sig_dt=sig_dt, log_s0=log_s0,
        eng=tuple(sym_ref[0, 0, 2 + k] for k in range(17)),
        ml=tuple(ml_ref[0, k] for k in range(6)),
        pol_w=tuple(tuple(pol_ref[a, d] for d in range(POLICY_FEATURE_DIM))
                    for a in range(3)),
        tm=tuple(tm_ref[0, k] for k in range(7)),
        gd=tuple(gd_ref[0, k] for k in range(4)),
        max_levels=max_levels, lanes=lanes, vm=vm, escalation=escalation,
        noise=(tuple(sym_ref[0, 0, 2 + 17 + k] for k in range(4))
               if use_noise else None),
        harvest=use_harvest, sampler=sampler, hist=hist, block_len=block_len, heston=heston,
        policy_off=policy_off, young_bars=young_bars,
        ring_refs=ring_refs,
    )

    @pl.when(pl.program_id(1) == 0)
    def _init():
        _init_acc(acc_ref)

    _engine_accumulate(acc_ref, (0,), final, n_paths=s * b)


def mc_paths_pallas_engine_universe(
    seed,
    levels: Levels,        # batched [S, L<=8]
    params: EngineParams,  # leaves may be scalars (shared) or [S] vectors
    s0,                    # f32[S]
    sigma,                 # f32[S]
    *,
    paths_per_symbol: int,
    num_bars: int = 40,
    dt: float = 1.0 / (390.0 * 252.0),
    lanes: int = ENGINE_LANES,
    policy=None,
    ml_model: MlModel | None = None,
    touch_params: T.TouchMemoryParams | None = None,
    guard_params: G.GuardParams | None = None,
    policy_gate_disabled: bool | None = None,
    escalation: bool = True,
    bar0_minute: int = 0,
    volume_model: VolumeModel | None = None,
    noise=None,               # McNoise; leaves may be [S] for per-symbol stds
    harvest: bool = False,    # per-symbol flywheel label stats
    sampler: str = "gbm",     # "gbm" | "bootstrap" (per-symbol recorded bars)
    hist_bars=None,           # PathBars-like [S, H] o/h/l/c/v histories
    block_len: int = 10,      # block_bootstrap: contiguous run length
    heston=None,              # heston: dict(v0, kappa, theta, xi, rho)
    interpret=False,
    external_uniforms=None,   # f32[S, n_blocks, 5*num_bars (9* w/ noise), 8, lanes]
):
    """Per-symbol fused FULL-ENGINE MC over a (symbol, block) grid: every
    symbol runs the complete 12-gate lifecycle with its own s0/sigma/levels
    AND its own engine knobs ([S]-leaved EngineParams — per-symbol paddings,
    thresholds, veto settings; ``noise`` likewise scalar or [S]-leaved).
    Returns [S]-batched (PathStats, skips, escalations); with ``harvest=True``
    a 4-tuple ending in the [S]-batched ``EngineHarvest`` (per-symbol labeled
    trade statistics for the config-4 policy refresh).
    ``sampler="bootstrap"`` streams each symbol's OWN recorded bars
    (``hist_bars`` [S, H]-batched, real volumes) — the reference MC is a
    per-symbol recorded-bar replay (:3353-3538).  Same kernel-specialized
    constants as ``mc_paths_pallas_engine``."""
    if touch_params is None:
        touch_params = T.TouchMemoryParams.default()
    if guard_params is None:
        guard_params = G.GuardParams.default()
    if ml_model is None:
        ml_model = MlModel.absent()
    if policy_gate_disabled is None:
        policy_gate_disabled = policy is None
    if policy is None:
        policy = OP.PolicyParams.init()
    if volume_model is None:
        volume_model = VolumeModel()
    block = ENGINE_SUB * lanes
    if paths_per_symbol % block != 0:
        raise ValueError(f"paths_per_symbol must be a multiple of {block}")
    lv_price = jnp.asarray(levels.price)
    if lv_price.ndim != 2:
        raise ValueError("levels must be [S, L]-batched (parallel.universe."
                         "stack_levels)")
    if lv_price.shape[1] > MAX_KERNEL_LEVELS:
        raise ValueError(
            f"pallas engine universe supports up to {MAX_KERNEL_LEVELS} level slots")
    if int(touch_params.fatigue_hits) != TAP_SLOTS:
        raise ValueError(f"engine kernel is built for fatigue_hits == {TAP_SLOTS}")
    if int(guard_params.vol_short) != 5 or int(guard_params.vol_long) != VOL_RING:
        raise ValueError("engine kernel is built for 5/20-bar guard MAs")
    if sampler not in ("gbm", "bootstrap", "block_bootstrap", "heston"):
        raise ValueError("engine kernel samplers: 'gbm' | 'bootstrap' | "
                         "'block_bootstrap' | 'heston'")
    if sampler in ("bootstrap", "block_bootstrap") and hist_bars is None:
        raise ValueError("sampler='bootstrap' requires hist_bars ([S, H] "
                         "recorded o/h/l/c/v histories, one row per symbol)")
    return _engine_universe_impl(
        seed, levels, params, jnp.asarray(s0, jnp.float32),
        jnp.asarray(sigma, jnp.float32), policy, ml_model, touch_params,
        guard_params, noise, hist_bars, external_uniforms,
        _derived_consts(s0, sigma, dt),
        paths_per_symbol=paths_per_symbol, num_bars=num_bars, dt=dt,
        lanes=lanes, policy_gate_disabled=bool(policy_gate_disabled),
        escalation=escalation, bar0_minute=int(bar0_minute),
        volume_model=volume_model, harvest=bool(harvest), sampler=sampler,
        block_len=int(block_len) if sampler == "block_bootstrap" else 0, heston=_heston_tuple(heston, 0.0, dt),
        young_bars=_young_bars(guard_params), interpret=interpret,
    )


def _engine_universe_sweep_kernel(
    seed_ref,          # SMEM (1,1) i32
    grid_ref,          # VMEM (1, G, 128) f32 — THIS symbol's knob-grid slab
                       #   (_pack_eng layout cols 0..ENG_COLS-1; has_levels
                       #   col 16 is overridden per symbol).  Per-symbol rows
                       #   let each symbol sweep around its own calibration.
    ml_ref,            # SMEM (1,8) f32 (shared)
    pol_ref,           # SMEM (3,8) f32
    tm_ref,            # SMEM (1,8) f32
    gd_ref,            # SMEM (1,8) f32
    sym_ref,           # VMEM (1, 1, 128) f32: [s0, sigma, has_levels, ...]
    level_price_ref,   # VMEM (1, L, 128) f32 — THIS symbol's level slab
    level_valid_ref,   # VMEM (1, L, 128) f32
    level_kind_ref,    # VMEM (1, L, 128) f32
    *refs,             # [hist_ref (bootstrap, THIS symbol's table slab)],
                       # [u_ref (external rng, interpret tests only)], acc_ref
    num_bars: int,
    dt: float,
    max_levels: int,
    lanes: int,
    vm: tuple,
    escalation: bool,
    n_grid: int,
    external_rng: bool = False,
    use_noise: bool = False,
    sampler: str = "gbm",
    hist_len: int = 0,
    block_len: int = 0,
    heston=None,
    policy_off: bool = False,
    young_bars: int = 0,
    rot_rings: bool = False,
):
    """Sweep-of-universes: per (symbol, block) grid step, every knob-grid row
    replays the symbol's identical uniform stream (PRNG re-seeded per row) —
    an (S × G) decision surface from ONE launch, CRN within each symbol.
    The grid slab is symbol-indexed, so [S, G]-leaved EngineParams give every
    symbol its own knob rows (per-symbol calibration × grid, ROADMAP item).
    ``sampler="bootstrap"`` sweeps each symbol's grid over its OWN recorded
    bars — identical resample indices per row (CRN on recorded history)."""
    s, b = ENGINE_SUB, lanes
    stride = _draw_stride(sampler, use_noise)
    refs = list(refs)
    ring_refs = None
    if rot_rings:
        ring_refs = tuple(refs[-2:])   # trailing VMEM scratch buffers
        refs = refs[:-2]
    if sampler in ("bootstrap", "block_bootstrap"):
        hist_ref = refs.pop(0)
        hist = (lambda ch, ti: hist_ref[0, 8 * ch:8 * (ch + 1),
                                        ti * 128:(ti + 1) * 128],
                hist_len)
    else:
        hist = None
    # host-derived constants (cols 3-5, pallas_mc._derived_consts): the sym
    # row is [s0, sigma, has_levels, log_s0, sig_dt, drift]
    log_s0 = sym_ref[0, 0, 3]
    sig_dt = sym_ref[0, 0, 4]
    drift = sym_ref[0, 0, 5]

    if external_rng:
        u_ref, acc_ref = refs

        def draw(t2, k):
            return u_ref[0, 0, pl.ds(t2 * stride + k, 1)].reshape(s, b)

        def reseed():
            pass
    else:
        (acc_ref,) = refs

        def reseed():
            pltpu.prng_seed(
                seed_ref[0, 0]
                + pl.program_id(0) * (pl.num_programs(1) + 1)
                + pl.program_id(1)
            )

        def draw(t2, k):
            return _uniform((s, b))

    @pl.when(pl.program_id(1) == 0)
    def _init():
        _init_acc(acc_ref)

    for g in range(n_grid):
        reseed()
        final = _engine_lifecycle_loop(
            draw, lambda i: (level_price_ref[0, i, 0], level_valid_ref[0, i, 0],
                             level_kind_ref[0, i, 0]),
            num_bars=num_bars, drift=drift, sig_dt=sig_dt, log_s0=log_s0,
            eng=(tuple(grid_ref[0, g, k] for k in range(16))
                 + (sym_ref[0, 0, 2],)),
            ml=tuple(ml_ref[0, k] for k in range(6)),
            pol_w=tuple(tuple(pol_ref[a, d] for d in range(POLICY_FEATURE_DIM))
                        for a in range(3)),
            tm=tuple(tm_ref[0, k] for k in range(7)),
            gd=tuple(gd_ref[0, k] for k in range(4)),
            max_levels=max_levels, lanes=lanes, vm=vm, escalation=escalation,
            noise=(tuple(grid_ref[0, g, 17 + k] for k in range(4))
                   if use_noise else None),
            sampler=sampler, hist=hist, block_len=block_len, heston=heston,
            policy_off=policy_off, young_bars=young_bars,
            ring_refs=ring_refs,
        )
        _engine_accumulate(acc_ref, (0, g), final, n_paths=s * b)


def mc_paths_pallas_engine_universe_sweep(
    seed,
    levels: Levels,        # batched [S, L<=8]
    grid_params: EngineParams,   # leaves may be [G] vectors or scalars
    s0,                    # f32[S]
    sigma,                 # f32[S]
    *,
    paths_per_symbol: int,
    num_bars: int = 40,
    dt: float = 1.0 / (390.0 * 252.0),
    lanes: int = ENGINE_LANES,
    policy=None,
    ml_model: MlModel | None = None,
    touch_params: T.TouchMemoryParams | None = None,
    guard_params: G.GuardParams | None = None,
    policy_gate_disabled: bool | None = None,
    escalation: bool = True,
    bar0_minute: int = 0,
    volume_model: VolumeModel | None = None,
    noise=None,            # McNoise; leaves may be [G]
    n_grid: int | None = None,
    sampler: str = "gbm",  # "gbm" | "bootstrap" (per-symbol recorded bars)
    hist_bars=None,        # PathBars-like [S, H] o/h/l/c/v histories
    block_len: int = 10,   # block_bootstrap: contiguous run length
    heston=None,           # heston: dict(v0, kappa, theta, xi, rho)
    interpret=False,
    external_uniforms=None,
):
    """(symbol × engine-knob-grid) FULL-ENGINE sweep in ONE kernel launch:
    every symbol runs with its own s0/sigma/levels, and every knob-grid row
    replays that symbol's identical uniform stream (CRN within each symbol).
    Returns [S, G]-batched (PathStats, skips, escalations).

    ``grid_params`` (and ``noise``) leaves may be scalars, [G] vectors (one
    grid shared by all symbols) or [S, G] matrices — per-symbol knob grids,
    so each symbol sweeps around its OWN calibration in the same launch.
    ``sampler="bootstrap"`` runs the whole (S × G) surface over each
    symbol's OWN recorded bars (``hist_bars`` [S, H]-batched) with CRN."""
    if touch_params is None:
        touch_params = T.TouchMemoryParams.default()
    if guard_params is None:
        guard_params = G.GuardParams.default()
    if ml_model is None:
        ml_model = MlModel.absent()
    if policy_gate_disabled is None:
        policy_gate_disabled = policy is None
    if policy is None:
        policy = OP.PolicyParams.init()
    if volume_model is None:
        volume_model = VolumeModel()
    if n_grid is None:
        sizes = {np.asarray(x).shape[-1]
                 for x in jax.tree_util.tree_leaves(grid_params)
                 if np.asarray(x).ndim in (1, 2)}
        if len(sizes) != 1:
            raise ValueError(
                "pass n_grid or give grid_params at least one [G] or [S, G] "
                f"leaf (found sizes {sorted(sizes)})")
        (n_grid,) = sizes
    block = ENGINE_SUB * lanes
    if paths_per_symbol % block != 0:
        raise ValueError(f"paths_per_symbol must be a multiple of {block}")
    lv_price = jnp.asarray(levels.price)
    if lv_price.ndim != 2:
        raise ValueError("levels must be [S, L]-batched")
    for x in jax.tree_util.tree_leaves(grid_params):
        if np.asarray(x).ndim == 2 and np.asarray(x).shape[0] != lv_price.shape[0]:
            raise ValueError("[S, G] grid leaves must match the symbol count")
    if lv_price.shape[1] > MAX_KERNEL_LEVELS:
        raise ValueError(f"supports up to {MAX_KERNEL_LEVELS} level slots")
    if int(touch_params.fatigue_hits) != TAP_SLOTS:
        raise ValueError(f"engine kernel is built for fatigue_hits == {TAP_SLOTS}")
    if int(guard_params.vol_short) != 5 or int(guard_params.vol_long) != VOL_RING:
        raise ValueError("engine kernel is built for 5/20-bar guard MAs")
    if sampler not in ("gbm", "bootstrap", "block_bootstrap", "heston"):
        raise ValueError("engine kernel samplers: 'gbm' | 'bootstrap' | "
                         "'block_bootstrap' | 'heston'")
    if sampler in ("bootstrap", "block_bootstrap") and hist_bars is None:
        raise ValueError("sampler='bootstrap' requires hist_bars ([S, H] "
                         "recorded o/h/l/c/v histories, one row per symbol)")
    return _engine_universe_sweep_impl(
        seed, levels, grid_params, jnp.asarray(s0, jnp.float32),
        jnp.asarray(sigma, jnp.float32), policy, ml_model, touch_params,
        guard_params, noise, hist_bars, external_uniforms,
        _derived_consts(s0, sigma, dt),
        paths_per_symbol=paths_per_symbol, num_bars=num_bars, dt=dt,
        lanes=lanes, n_grid=int(n_grid),
        policy_gate_disabled=bool(policy_gate_disabled),
        escalation=escalation, bar0_minute=int(bar0_minute),
        volume_model=volume_model, sampler=sampler, block_len=int(block_len) if sampler == "block_bootstrap" else 0,
        heston=_heston_tuple(heston, 0.0, dt),
        young_bars=_young_bars(guard_params),
        interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("paths_per_symbol", "num_bars", "dt", "lanes", "n_grid",
                     "volume_model", "escalation", "bar0_minute",
                     "policy_gate_disabled", "sampler", "block_len", "heston",
                     "young_bars", "interpret"),
)
def _engine_universe_sweep_impl(
    seed, levels, grid_params, s0, sigma, policy, ml_model, touch_params,
    guard_params, noise, hist_bars, external_uniforms, derived, *,
    paths_per_symbol,
    num_bars, dt, lanes, n_grid, policy_gate_disabled, escalation,
    bar0_minute, volume_model, sampler, block_len, heston, young_bars,
    interpret,
):
    block = ENGINE_SUB * lanes
    n_blocks = paths_per_symbol // block
    n_skip = len(SKIP_REASONS)
    n_sym, n_lv = jnp.asarray(levels.price).shape

    external_rng = external_uniforms is not None
    use_noise = noise is not None
    stride = _draw_stride(sampler, use_noise)
    vm = (float(volume_model.base), float(volume_model.u_amp),
          float(volume_model.noise_sigma), float(volume_model.ret_coupling),
          int(volume_model.day_minutes), int(volume_model.open_minute))
    if sampler in ("bootstrap", "block_bootstrap"):
        hist, hist_len = _hist_slab_batched(hist_bars, lanes)
    else:
        hist, hist_len = None, 0
    kernel = functools.partial(
        _engine_universe_sweep_kernel, num_bars=num_bars, dt=dt,
        max_levels=n_lv, lanes=lanes, vm=vm, escalation=escalation,
        n_grid=n_grid, external_rng=external_rng, use_noise=use_noise,
        sampler=sampler, hist_len=hist_len, block_len=block_len, heston=heston,
        policy_off=bool(policy_gate_disabled), young_bars=young_bars,
        rot_rings=True,
    )
    grid = _pack_eng_sg(grid_params, policy_gate_disabled, bar0_minute,
                        n_sym, n_grid, noise=noise)      # (S, G, ENG_COLS)
    grid = jnp.pad(grid, ((0, 0), (0, 0), (0, 128 - ENG_COLS)))
    sym = jnp.stack([
        jnp.broadcast_to(s0.reshape(-1), (n_sym,)),
        jnp.broadcast_to(sigma.reshape(-1), (n_sym,)),
        (levels.count > 0).astype(jnp.float32),
    ] + [jnp.broadcast_to(jnp.asarray(d, jnp.float32).reshape(-1), (n_sym,))
         for d in derived], axis=1)
    sym = jnp.pad(sym, ((0, 0), (0, 128 - sym.shape[1])))[:, None, :]
    mlv, polv, tmv, gdv = _pack_shared(policy, ml_model, touch_params,
                                       guard_params)
    lp, lv = _level_rows(levels.price, levels.valid, n_lv)
    lk = jnp.broadcast_to(
        jnp.asarray(levels.kind, jnp.float32)[..., None], (n_sym, n_lv, 128))
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)

    acc = pl.pallas_call(
        kernel,
        grid=(n_sym, n_blocks),
        in_specs=[
            pl.BlockSpec((1, 1), lambda si, bi: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_grid, 128), lambda si, bi: (si, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda si, bi: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((3, 8), lambda si, bi: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8), lambda si, bi: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8), lambda si, bi: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 128), lambda si, bi: (si, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_lv, 128), lambda si, bi: (si, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_lv, 128), lambda si, bi: (si, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_lv, 128), lambda si, bi: (si, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + ([
            pl.BlockSpec((1,) + hist.shape[1:], lambda si, bi: (si, 0, 0),
                         memory_space=pltpu.VMEM)
        ] if hist is not None else []) + ([
            pl.BlockSpec((1, 1, stride * ((num_bars + 1) // 2), ENGINE_SUB,
                          lanes),
                         lambda si, bi: (si, bi, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        ] if external_rng else []),
        out_specs=pl.BlockSpec((1, n_grid, 8, 128),
                               lambda si, bi: (si, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_sym, n_grid, 8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((VOL_RING * ENGINE_SUB, lanes), jnp.float32),
            pltpu.VMEM((CLOSE_RING * ENGINE_SUB, lanes), jnp.float32),
        ],
        interpret=interpret,
    )(*((seed_arr, grid, mlv, polv, tmv, gdv, sym, lp, lv, lk)
         + ((hist,) if hist is not None else ())
         + ((jnp.asarray(external_uniforms, jnp.float32),)
            if external_rng else ())))

    return _unpack_acc_engine(acc, n_skip)


@functools.partial(
    jax.jit,
    static_argnames=("paths_per_symbol", "num_bars", "dt", "lanes",
                     "volume_model", "escalation", "bar0_minute",
                     "policy_gate_disabled", "harvest", "sampler", "block_len",
                     "heston", "young_bars", "interpret"),
)
def _engine_universe_impl(
    seed, levels, params, s0, sigma, policy, ml_model, touch_params,
    guard_params, noise, hist_bars, external_uniforms, derived, *,
    paths_per_symbol,
    num_bars, dt, lanes, policy_gate_disabled, escalation, bar0_minute,
    volume_model, harvest, sampler, block_len, heston, young_bars,
    interpret,
):
    block = ENGINE_SUB * lanes
    n_blocks = paths_per_symbol // block
    n_skip = len(SKIP_REASONS)
    n_sym, n_lv = jnp.asarray(levels.price).shape

    external_rng = external_uniforms is not None
    use_noise = noise is not None
    stride = _draw_stride(sampler, use_noise)
    vm = (float(volume_model.base), float(volume_model.u_amp),
          float(volume_model.noise_sigma), float(volume_model.ret_coupling),
          int(volume_model.day_minutes), int(volume_model.open_minute))
    if sampler in ("bootstrap", "block_bootstrap"):
        hist, hist_len = _hist_slab_batched(hist_bars, lanes)
    else:
        hist, hist_len = None, 0
    kernel = functools.partial(
        _engine_universe_kernel, num_bars=num_bars, dt=dt, max_levels=n_lv,
        lanes=lanes, vm=vm, escalation=escalation, external_rng=external_rng,
        use_noise=use_noise, use_harvest=harvest, sampler=sampler,
        hist_len=hist_len, block_len=block_len, heston=heston,
        policy_off=bool(policy_gate_disabled), young_bars=young_bars,
        rot_rings=True,
    )
    eng = _pack_eng(params, policy_gate_disabled, bar0_minute,
                    levels.count > 0, g=n_sym, noise=noise)   # (S, ENG_COLS)
    sym = jnp.concatenate([
        jnp.broadcast_to(s0.reshape(-1), (n_sym,))[:, None],
        jnp.broadcast_to(sigma.reshape(-1), (n_sym,))[:, None],
        eng,
    ] + [jnp.broadcast_to(jnp.asarray(d, jnp.float32).reshape(-1),
                          (n_sym,))[:, None] for d in derived], axis=1)
    sym = jnp.pad(sym, ((0, 0), (0, 128 - sym.shape[1])))[:, None, :]
    mlv, polv, tmv, gdv = _pack_shared(policy, ml_model, touch_params,
                                       guard_params)
    lp, lv = _level_rows(levels.price, levels.valid, n_lv)
    lk = jnp.broadcast_to(
        jnp.asarray(levels.kind, jnp.float32)[..., None], (n_sym, n_lv, 128))
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)

    acc = pl.pallas_call(
        kernel,
        grid=(n_sym, n_blocks),
        in_specs=[
            pl.BlockSpec((1, 1), lambda si, bi: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8), lambda si, bi: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((3, 8), lambda si, bi: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8), lambda si, bi: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8), lambda si, bi: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 128), lambda si, bi: (si, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_lv, 128), lambda si, bi: (si, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_lv, 128), lambda si, bi: (si, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_lv, 128), lambda si, bi: (si, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + ([
            pl.BlockSpec((1,) + hist.shape[1:], lambda si, bi: (si, 0, 0),
                         memory_space=pltpu.VMEM)
        ] if hist is not None else []) + ([
            pl.BlockSpec((1, 1, stride * ((num_bars + 1) // 2), ENGINE_SUB,
                          lanes),
                         lambda si, bi: (si, bi, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        ] if external_rng else []),
        out_specs=pl.BlockSpec((1, 8, 128), lambda si, bi: (si, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_sym, 8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((VOL_RING * ENGINE_SUB, lanes), jnp.float32),
            pltpu.VMEM((CLOSE_RING * ENGINE_SUB, lanes), jnp.float32),
        ],
        interpret=interpret,
    )(*((seed_arr, mlv, polv, tmv, gdv, sym, lp, lv, lk)
         + ((hist,) if hist is not None else ())
         + ((jnp.asarray(external_uniforms, jnp.float32),)
            if external_rng else ())))

    return _unpack_acc_engine(acc, n_skip, harvest=harvest)


def _engine_corr_kernel(
    seed_ref,          # SMEM (1,2) i32: [seed, block_offset]
    ml_ref,            # SMEM (1,8) f32 (shared across symbols)
    pol_ref,           # SMEM (3,8) f32
    tm_ref,            # SMEM (1,8) f32
    gd_ref,            # SMEM (1,8) f32
    sym_ref,           # VMEM (1, 1, 128) f32 per-symbol row: the universe
                       #   slab layout + beta/weight at cols 2+ENG_COLS+3/+4
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
    vm: tuple,
    escalation: bool,
    external_rng: bool = False,
    use_noise: bool = False,
    use_harvest: bool = False,
    sampler: str = "gbm",
    hist_len: int = 0,
    block_len: int = 0,
    heston=None,
    antithetic: bool = False,
    policy_off: bool = False,
    young_bars: int = 0,
    rot_rings: bool = False,
):
    """Correlated FULL-ENGINE universe (parallel/portfolio.py model) on a
    (block, symbol) grid — SYMBOL IS THE INNER AXIS so one path block's
    portfolio scratch stays resident while every symbol walks the same
    market shocks:

      z_s = beta_s * z_mkt + sqrt(1 - beta_s^2) * eps_s

    The market pair is a symbol-INDEPENDENT stream (reseeded per (block,
    step) from a market salt, or read from the shared ``market_uniforms``
    ref in tests), so path i sees the same market across symbols — and the
    correlated shock also drives each symbol's volume model, so a market
    move prints volume on EVERY book member (exactly the regime the guard /
    volume-veto gates care about).  Each symbol's complete 12-gate lifecycle
    adds its weighted per-bar equity into ``curve_ref``; the last symbol
    folds the combined curve into the portfolio accumulator — final-R
    histogram (book VaR/CVaR) plus TRUE time-tracked portfolio drawdown.

    Samplers ride the market/idio split: ``bootstrap``/``block_bootstrap``
    draw the resample indices from the MARKET stream — JOINT recorded days,
    every book member replays the same historical bar each step, so the
    cross-sectional co-movement is exactly the joint history's (beta unused;
    ties/noise idiosyncratic); ``heston`` draws a SECOND market Box-Muller
    pair for the variance shock's factor component (market-wide vol regime
    through the same beta loading as price)."""
    s, b = ENGINE_SUB, lanes
    stride = _draw_stride(sampler, use_noise)
    # market blocks per double-bar step: heston adds the vol-shock pair
    m_stride = 4 if sampler == "heston" else 2
    bi = pl.program_id(0)
    si = pl.program_id(1)
    refs = list(refs)
    ring_refs = None
    if rot_rings:
        ring_refs = tuple(refs[-2:])   # trailing VMEM scratch buffers
        refs = refs[:-2]
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

    # host-derived constants (pallas_mc._derived_consts): bit-identical to
    # the single-config kernel's static baking — on-device log/sqrt diverge
    # from host libm by ulps
    log_s0 = sym_ref[0, 0, 2 + ENG_COLS]
    sig_dt = sym_ref[0, 0, 2 + ENG_COLS + 1]
    drift = sym_ref[0, 0, 2 + ENG_COLS + 2]
    beta_s = sym_ref[0, 0, 2 + ENG_COLS + 3]
    weight = sym_ref[0, 0, 2 + ENG_COLS + 4]

    if external_rng:
        def draw(t2, k):
            if k >= stride:        # market rows (shared across symbols)
                blk = um_ref[0, pl.ds(t2 * m_stride + (k - stride), 1)]
                return blk.reshape(s, b)
            return u_ref[0, 0, pl.ds(t2 * stride + k, 1)].reshape(s, b)
    else:
        seed0 = seed_ref[0, 0]
        # global block index (local grid step + launch offset): sharded runs
        # pass device d's starting block so counts are bitwise independent
        # of the mesh shape
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
        for r_ in (pt_ref, pw_ref, plo_ref, po_ref):
            r_[...] = jnp.zeros(r_.shape, jnp.float32)

    final = _engine_lifecycle_loop(
        draw, lambda i: (level_price_ref[0, i, 0], level_valid_ref[0, i, 0],
                         level_kind_ref[0, i, 0]),
        num_bars=num_bars, drift=drift, sig_dt=sig_dt, log_s0=log_s0,
        eng=tuple(sym_ref[0, 0, 2 + k] for k in range(17)),
        ml=tuple(ml_ref[0, k] for k in range(6)),
        pol_w=tuple(tuple(pol_ref[a, d] for d in range(POLICY_FEATURE_DIM))
                    for a in range(3)),
        tm=tuple(tm_ref[0, k] for k in range(7)),
        gd=tuple(gd_ref[0, k] for k in range(4)),
        max_levels=max_levels, lanes=lanes, vm=vm, escalation=escalation,
        noise=(tuple(sym_ref[0, 0, 2 + 17 + k] for k in range(4))
               if use_noise else None),
        harvest=use_harvest, sampler=sampler, hist=hist,
        block_len=block_len, heston=heston, antithetic=antithetic,
        policy_off=policy_off, young_bars=young_bars,
        corr=beta_s, curve=(curve_ref, weight), ring_refs=ring_refs,
    )
    side, equity, dd, trades, wins, losses, escal, skips, hstate = final
    _engine_accumulate(acc_ref.at[si], (), final, n_paths=s * b)

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
        _engine_accumulate(
            port_ref, (),
            (po_ref[...], finals, pdd, pt_ref[...], pw_ref[...], plo_ref[...],
             jnp.zeros((s, b), jnp.float32), (), ()),
            n_paths=s * b)


@functools.partial(
    jax.jit,
    static_argnames=("paths_per_symbol", "num_bars", "dt", "lanes",
                     "volume_model", "escalation", "bar0_minute",
                     "policy_gate_disabled", "harvest", "sampler",
                     "block_len", "heston", "antithetic", "young_bars",
                     "interpret"),
)
def _engine_corr_impl(
    seed, levels, params, s0, sigma, beta, weights, policy, ml_model,
    touch_params, guard_params, noise, hist_bars, external_uniforms,
    market_uniforms, derived, block_offset, *,
    paths_per_symbol, num_bars, dt, lanes, policy_gate_disabled, escalation,
    bar0_minute, volume_model, harvest, sampler, block_len, heston,
    antithetic, young_bars, interpret,
):
    block = ENGINE_SUB * lanes
    n_blocks = paths_per_symbol // block
    n_skip = len(SKIP_REASONS)
    n_sym, n_lv = jnp.asarray(levels.price).shape

    external_rng = external_uniforms is not None
    use_noise = noise is not None
    stride = _draw_stride(sampler, use_noise)
    m_stride = 4 if sampler == "heston" else 2
    vm = (float(volume_model.base), float(volume_model.u_amp),
          float(volume_model.noise_sigma), float(volume_model.ret_coupling),
          int(volume_model.day_minutes), int(volume_model.open_minute))
    if sampler in ("bootstrap", "block_bootstrap"):
        hist, hist_len = _hist_slab_batched(hist_bars, lanes)
    else:
        hist, hist_len = None, 0
    kernel = functools.partial(
        _engine_corr_kernel, num_bars=num_bars, max_levels=n_lv,
        n_sym=n_sym, lanes=lanes, vm=vm, escalation=escalation,
        external_rng=external_rng, use_noise=use_noise, use_harvest=harvest,
        sampler=sampler, hist_len=hist_len, block_len=block_len,
        heston=heston, antithetic=antithetic,
        policy_off=bool(policy_gate_disabled), young_bars=young_bars,
        rot_rings=True,
    )
    eng = _pack_eng(params, policy_gate_disabled, bar0_minute,
                    levels.count > 0, g=n_sym, noise=noise)   # (S, ENG_COLS)
    bcast = lambda x: jnp.broadcast_to(
        jnp.asarray(x, jnp.float32).reshape(-1), (n_sym,))[:, None]
    sym = jnp.concatenate(
        [bcast(s0), bcast(sigma), eng]
        + [bcast(d) for d in derived] + [bcast(beta), bcast(weights)], axis=1)
    sym = jnp.pad(sym, ((0, 0), (0, 128 - sym.shape[1])))[:, None, :]
    mlv, polv, tmv, gdv = _pack_shared(policy, ml_model, touch_params,
                                       guard_params)
    lp, lv = _level_rows(levels.price, levels.valid, n_lv)
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
            pl.BlockSpec((3, 8), lambda bi, si: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8), lambda bi, si: (0, 0),
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
            pl.BlockSpec((1, m_stride * (num_bars // 2), ENGINE_SUB, lanes),
                         lambda bi, si: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, stride * (num_bars // 2), ENGINE_SUB, lanes),
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
            pltpu.VMEM((num_bars, ENGINE_SUB, lanes), jnp.float32),
            pltpu.VMEM((ENGINE_SUB, lanes), jnp.float32),
            pltpu.VMEM((ENGINE_SUB, lanes), jnp.float32),
            pltpu.VMEM((ENGINE_SUB, lanes), jnp.float32),
            pltpu.VMEM((ENGINE_SUB, lanes), jnp.float32),
        
            pltpu.VMEM((VOL_RING * ENGINE_SUB, lanes), jnp.float32),
            pltpu.VMEM((CLOSE_RING * ENGINE_SUB, lanes), jnp.float32),
        ],
        interpret=interpret,
    )(*((seed_arr, mlv, polv, tmv, gdv, sym, lp, lv, lk)
         + ((hist,) if hist is not None else ())
         + ((jnp.asarray(market_uniforms, jnp.float32),
             jnp.asarray(external_uniforms, jnp.float32))
            if external_rng else ())))

    port_stats, _, _ = _unpack_acc_engine(port, 0)
    if harvest:
        sym_stats, sym_skips, sym_escal, hv = _unpack_acc_engine(
            acc, n_skip, harvest=True)
        return sym_stats, port_stats, sym_skips, sym_escal, hv
    sym_stats, sym_skips, sym_escal = _unpack_acc_engine(acc, n_skip)
    return sym_stats, port_stats, sym_skips, sym_escal


def mc_paths_pallas_engine_corr(
    seed,
    levels: Levels,        # batched [S, L<=32]
    params: EngineParams,  # leaves may be scalars (shared) or [S] vectors
    s0,                    # f32[S]
    sigma,                 # f32[S]
    beta,                  # f32[S] market loadings in [-1, 1]
    weights,               # f32[S] book weights
    *,
    paths_per_symbol: int,
    num_bars: int = 40,
    dt: float = 1.0 / (390.0 * 252.0),
    lanes: int = ENGINE_LANES,
    policy=None,
    ml_model: MlModel | None = None,
    touch_params: T.TouchMemoryParams | None = None,
    guard_params: G.GuardParams | None = None,
    policy_gate_disabled: bool | None = None,
    escalation: bool = True,
    bar0_minute: int = 0,
    volume_model: VolumeModel | None = None,
    noise=None,               # McNoise; leaves may be [S] for per-symbol stds
    harvest: bool = False,    # per-symbol flywheel label stats
    sampler: str = "gbm",     # "gbm" | "bootstrap" | "block_bootstrap"
                              # (JOINT recorded days) | "heston"
    hist_bars=None,           # PathBars-like [S, H] o/h/l/c/v histories
    block_len: int = 10,      # block_bootstrap: contiguous run length
    heston=None,              # heston: dict(v0, kappa, theta, xi, rho)
    antithetic: bool = False, # lane-paired sign-flipped normals — market
                              # AND idio flipped (gbm only)
    interpret=False,
    external_uniforms=None,   # f32[S, n_blocks, stride*(W//2), 8, lanes]
    market_uniforms=None,     # f32[n_blocks, m*(W//2), 8, lanes] (shared;
                              # m = 4 for heston, else 2)
    block_offset=0,           # global index of this launch's first block
                              # (sharded runs: device d passes its start)
):
    """Correlated FULL-ENGINE universe, fully fused: per-symbol [S]
    (PathStats, skip tables, escalations) AND the on-chip book accumulator
    (final-R histogram + TRUE time-tracked portfolio drawdown) from ONE
    launch — the fused form of ``parallel/portfolio.portfolio_mc_engine``,
    exactness-tested against it under injected uniforms.  GBM bars with the
    in-loop synthetic volume model (the correlated shock drives each
    symbol's volume, so market-wide moves print volume on every book
    member).  Per-symbol engine knobs ([S]-leaved EngineParams / noise
    stds) ride the same slab as ``mc_paths_pallas_engine_universe``.
    Returns ``(sym_stats, port_stats, skip_counts, escalations)`` in
    ``portfolio_mc_engine`` order; with ``harvest=True`` a 5-tuple ending
    in the [S]-batched ``EngineHarvest`` (the learning flywheel's labeled
    trade statistics, harvested from the CORRELATED book).

    Samplers: ``"bootstrap"``/``"block_bootstrap"`` replay JOINT recorded
    days — the per-bar resample indices come from the shared market stream,
    so every book member replays the SAME historical bar each step and the
    book's cross-sectional co-movement is exactly what the joint [S, H]
    ``hist_bars`` history had (``beta`` is unused; ties/noise stay
    idiosyncratic — the reference MC replays one symbol's recorded bars,
    :3353-3538; a book replays the joint days).  ``"heston"`` correlates
    BOTH the price shock and the variance shock through the same beta
    loading (a market selloff raises every member's vol)."""
    if touch_params is None:
        touch_params = T.TouchMemoryParams.default()
    if guard_params is None:
        guard_params = G.GuardParams.default()
    if ml_model is None:
        ml_model = MlModel.absent()
    if policy_gate_disabled is None:
        policy_gate_disabled = policy is None
    if policy is None:
        policy = OP.PolicyParams.init()
    if volume_model is None:
        volume_model = VolumeModel()
    block = ENGINE_SUB * lanes
    if paths_per_symbol % block != 0:
        raise ValueError(f"paths_per_symbol must be a multiple of {block}")
    if num_bars % 2 != 0:
        raise ValueError("num_bars must be even (paired Box-Muller draws)")
    lv_price = jnp.asarray(levels.price)
    if lv_price.ndim != 2:
        raise ValueError("levels must be [S, L]-batched (parallel.universe."
                         "stack_levels)")
    if lv_price.shape[1] > MAX_KERNEL_LEVELS:
        raise ValueError(
            f"pallas engine corr supports up to {MAX_KERNEL_LEVELS} level slots")
    if int(touch_params.fatigue_hits) != TAP_SLOTS:
        raise ValueError(f"engine kernel is built for fatigue_hits == {TAP_SLOTS}")
    if int(guard_params.vol_short) != 5 or int(guard_params.vol_long) != VOL_RING:
        raise ValueError("engine kernel is built for 5/20-bar guard MAs")
    if (external_uniforms is None) != (market_uniforms is None):
        raise ValueError("external_uniforms and market_uniforms go together")
    if sampler not in ("gbm", "bootstrap", "block_bootstrap", "heston"):
        raise ValueError("engine corr kernel samplers: 'gbm' | 'bootstrap' | "
                         "'block_bootstrap' | 'heston'")
    if sampler in ("bootstrap", "block_bootstrap") and hist_bars is None:
        raise ValueError("sampler='bootstrap' requires hist_bars ([S, H] "
                         "recorded o/h/l/c/v histories, one row per symbol)")
    if antithetic and sampler != "gbm":
        raise ValueError("kernel antithetic pairs gbm normals only")
    if antithetic and lanes % 256 != 0:
        raise ValueError("antithetic needs lanes % 256 == 0 (half-tile pairs)")
    return _engine_corr_impl(
        seed, levels, params, jnp.asarray(s0, jnp.float32),
        jnp.asarray(sigma, jnp.float32), jnp.asarray(beta, jnp.float32),
        jnp.asarray(weights, jnp.float32), policy, ml_model, touch_params,
        guard_params, noise, hist_bars, external_uniforms, market_uniforms,
        _derived_consts(s0, sigma, dt), block_offset,
        paths_per_symbol=paths_per_symbol, num_bars=num_bars, dt=dt,
        lanes=lanes, policy_gate_disabled=bool(policy_gate_disabled),
        escalation=escalation, bar0_minute=int(bar0_minute),
        volume_model=volume_model, harvest=bool(harvest), sampler=sampler,
        block_len=int(block_len) if sampler == "block_bootstrap" else 0,
        heston=_heston_tuple(heston, 0.0, dt),
        antithetic=bool(antithetic),
        young_bars=_young_bars(guard_params),
        interpret=interpret,
    )
