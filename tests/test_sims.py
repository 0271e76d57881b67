"""Replay + Monte Carlo sims vs the scalar sim oracle (exact noise injection)."""

import jax
import numpy as np
import pytest

from qmmx_monolithic_monte_carlo_tpu.config import CompatFlags, EngineParams
from qmmx_monolithic_monte_carlo_tpu.sim import montecarlo as MC
from qmmx_monolithic_monte_carlo_tpu.sim import replay as RP
from qmmx_monolithic_monte_carlo_tpu.sim.candidates import find_candidates
from qmmx_monolithic_monte_carlo_tpu.types import (
    OUTCOME_OPEN,
    OUTCOME_STOP,
    OUTCOME_TP,
    Bars,
    Levels,
)
from qmmx_monolithic_monte_carlo_tpu.utils import prng

from .oracle import sims as OS
from .oracle.engine import EngineOracle

LEVEL_ROWS = [
    {"color": "blue", "type": "solid", "index": 0, "price": 100.0},
    {"color": "blue", "type": "dashed", "index": 1, "price": 100.45},
    {"color": "orange", "type": "solid", "index": 0, "price": 99.6},
    {"color": "teal", "type": "dashed", "index": 0, "price": 100.1},
]
OUT_NAME = {OUTCOME_TP: "tp", OUTCOME_STOP: "stop", OUTCOME_OPEN: "open"}


def _bars(seed, n=240):
    rng = np.random.default_rng(seed)
    c = np.round(100.0 + np.cumsum(rng.normal(0, 0.04, n)), 2)
    h = np.round(c + np.abs(rng.normal(0, 0.05, n)), 2)
    l = np.round(c - np.abs(rng.normal(0, 0.05, n)), 2)
    o = np.concatenate([[c[0]], c[:-1]])
    rows = [{"o": float(o[i]), "h": float(h[i]), "l": float(l[i]), "c": float(c[i])}
            for i in range(n)]
    ts = (np.arange(n, dtype=np.int64) * 60_000 + 10_000_000)
    bars = Bars.from_arrays(ts.astype(np.int32), o, h, l, c)
    return rows, bars


@pytest.mark.parametrize("seed,touch_limit,with_gates", [
    (0, 1, False), (1, 2, False), (2, 1, True), (3, 2, True), (4, 1, True),
])
@pytest.mark.parametrize("mode", ["replay", "mc"])
def test_candidates_match_oracle(seed, touch_limit, with_gates, mode):
    rows, bars = _bars(seed)
    levels = Levels.from_rows(LEVEL_ROWS, max_levels=8)
    params = EngineParams.default(q_min_prob=0.5)

    cands = find_candidates(
        bars, levels, params, touch_limit=touch_limit, with_gates=with_gates,
        mode=mode, t0_ms=50_000_000,
    )
    oracle = EngineOracle(LEVEL_ROWS, q_min_prob=0.5)
    want = OS.find_candidates(
        rows, LEVEL_ROWS, oracle, touch_limit=touch_limit,
        with_gates=with_gates, mode=mode, t0_ms=50_000_000,
    )
    got_idx = np.where(np.asarray(cands.is_cand))[0].tolist()
    assert got_idx == [w["i"] for w in want], (seed, mode)
    for w in want:
        i = w["i"]
        side = 1 if w["side"] == "long" else -1
        assert int(np.asarray(cands.side)[i]) == side
        assert float(np.asarray(cands.level_price)[i]) == pytest.approx(w["lvl"], abs=1e-5)
        assert float(np.asarray(cands.stop)[i]) == pytest.approx(w["stop"], abs=1e-5)
        assert float(np.asarray(cands.target)[i]) == pytest.approx(w["target"], abs=1e-5)
        assert int(np.asarray(cands.touch_no)[i]) == w["touch"]


@pytest.mark.parametrize("seed", [0, 5, 6])
def test_replay_outcomes_match_oracle(seed):
    rows, bars = _bars(seed)
    levels = Levels.from_rows(LEVEL_ROWS, max_levels=8)
    params = EngineParams.default(q_min_prob=0.5)
    res = RP.simulate_last_bars(bars, levels, params, touch_limit=2, with_gates=False)

    oracle = EngineOracle(LEVEL_ROWS, q_min_prob=0.5)
    want = OS.find_candidates(rows, LEVEL_ROWS, oracle, touch_limit=2,
                              with_gates=False, mode="replay")
    mask = np.asarray(res.candidates.is_cand)
    idxs = np.where(mask)[0]
    assert len(idxs) == len(want)
    total_r = 0.0
    wins = losses = opens = 0
    for w, i in zip(want, idxs):
        outcome, exit_px, j = OS.replay_walk(rows, w)
        r = OS.replay_r(w, outcome)
        assert OUT_NAME[int(np.asarray(res.outcome)[i])] == outcome, (seed, i)
        assert float(np.asarray(res.r)[i]) == pytest.approx(r, abs=1e-4)
        assert float(np.asarray(res.exit_price)[i]) == pytest.approx(exit_px, abs=1e-4)
        total_r += round(r, 2)
        wins += outcome == "tp"
        losses += outcome == "stop"
        opens += outcome == "open"
    s = res.summary
    assert int(s.wins) == wins and int(s.losses) == losses and int(s.open) == opens
    assert float(s.total_r) == pytest.approx(round(total_r, 2), abs=0.011)


def test_mc_trial_matches_oracle_with_injected_noise():
    """Exact parity: reproduce the JAX noise draws and feed them to the oracle walk."""
    rows, bars = _bars(7)
    levels = Levels.from_rows(LEVEL_ROWS, max_levels=8)
    params = EngineParams.default(q_min_prob=0.5)
    key = jax.random.key(42)
    noise = MC.McNoise.make(entry_slip_std=0.01, level_jitter_std=0.02,
                            stop_slip_std=0.005, target_slip_std=0.003)

    cands = find_candidates(bars, levels, params, touch_limit=1,
                            with_gates=False, mode="mc")
    n = bars.num_bars
    oracle = EngineOracle(LEVEL_ROWS, q_min_prob=0.5)
    want_cands = OS.find_candidates(rows, LEVEL_ROWS, oracle, touch_limit=1,
                                    with_gates=False, mode="mc")

    for trial in [0, 1, 7]:
        r, outcome = MC.trial_outcomes(key, bars, cands, noise, params,
                                       np.uint32(trial))
        # reproduce the exact noise the kernel drew
        def stream(s, std):
            k = prng.key_for(key, s, np.uint32(trial))
            return np.asarray(jax.random.normal(k, (n,), np.float32)) * std
        lvl_d = stream(prng.STREAM_LEVEL_JITTER, 0.02)
        ent_d = stream(prng.STREAM_ENTRY_SLIP, 0.01)
        stp_d = stream(prng.STREAM_STOP_SLIP, 0.005)
        tgt_d = stream(prng.STREAM_TARGET_SLIP, 0.003)
        tie_u = np.asarray(jax.random.uniform(
            prng.key_for(key, prng.STREAM_TIE_COIN, np.uint32(trial)), (n,), np.float32))

        for w in want_cands:
            i = w["i"]
            want_r, want_out = OS.mc_walk(
                rows, w,
                lvl_jitter=float(lvl_d[i]), entry_slip=float(ent_d[i]),
                stop_slip=float(stp_d[i]), target_slip=float(tgt_d[i]),
                tie_u=float(tie_u[i]),
            )
            assert OUT_NAME[int(np.asarray(outcome)[i])] == want_out, (trial, i)
            assert float(np.asarray(r)[i]) == pytest.approx(want_r, rel=1e-4, abs=1e-5)


def test_mc_summary_statistics_sane():
    rows, bars = _bars(8)
    levels = Levels.from_rows(LEVEL_ROWS, max_levels=8)
    params = EngineParams.default(q_min_prob=0.5)
    res = MC.simulate_monte_carlo(
        jax.random.key(0), bars, levels, params,
        touch_limit=1, trials=500, with_gates=False,
    )
    s = res.summary
    assert int(s.trials) == 500
    assert float(s.worst_r) <= float(s.var_05) <= float(s.median_r) + 1e-6
    assert float(s.cvar_05) <= float(s.var_05) + 1e-6
    assert float(s.worst_max_dd) <= float(s.mean_max_dd) + 1e-5
    assert float(s.mean_max_dd) <= 0.0
    totals = np.asarray(res.totals)
    # VaR index formula parity: sorted[max(0, int(0.05*T)-1)]
    st = np.sort(totals)
    assert float(s.var_05) == pytest.approx(st[max(0, int(0.05 * 500) - 1)], abs=1e-6)
    assert float(s.cvar_05) == pytest.approx(st[: max(0, int(0.05 * 500) - 1) + 1].mean(), abs=1e-5)
    assert float(s.mean_wins) + float(s.mean_losses) + float(s.mean_open) == pytest.approx(
        int(res.candidates.count), abs=1e-4
    )


def test_mc_reproducible_and_key_sensitive():
    rows, bars = _bars(9)
    levels = Levels.from_rows(LEVEL_ROWS, max_levels=8)
    params = EngineParams.default(q_min_prob=0.5)
    a = MC.simulate_monte_carlo(jax.random.key(1), bars, levels, params, trials=50,
                                with_gates=False)
    b = MC.simulate_monte_carlo(jax.random.key(1), bars, levels, params, trials=50,
                                with_gates=False)
    c = MC.simulate_monte_carlo(jax.random.key(2), bars, levels, params, trials=50,
                                with_gates=False)
    np.testing.assert_array_equal(np.asarray(a.totals), np.asarray(b.totals))
    assert not np.allclose(np.asarray(a.totals), np.asarray(c.totals))


def test_mc_statistical_agreement_with_serial_oracle():
    """Different RNGs, same distribution: JAX MC mean within noise of a serial
    Python MC using numpy draws."""
    rows, bars = _bars(10)
    levels = Levels.from_rows(LEVEL_ROWS, max_levels=8)
    params = EngineParams.default(q_min_prob=0.5)
    res = MC.simulate_monte_carlo(jax.random.key(3), bars, levels, params,
                                  trials=2000, with_gates=False, touch_limit=1)
    oracle = EngineOracle(LEVEL_ROWS, q_min_prob=0.5)
    cands = OS.find_candidates(rows, LEVEL_ROWS, oracle, touch_limit=1,
                               with_gates=False, mode="mc")
    rng = np.random.default_rng(0)
    totals = []
    for _ in range(2000):
        tot = 0.0
        for w in cands:
            r, _ = OS.mc_walk(
                rows, w,
                lvl_jitter=float(rng.normal(0, 0.02)),
                entry_slip=float(rng.normal(0, 0.01)),
                stop_slip=0.0, target_slip=0.0,
                tie_u=float(rng.uniform()),
            )
            tot += r
        totals.append(tot)
    want_mean = np.mean(totals)
    want_std = np.std(totals)
    got_mean = float(res.summary.mean_r)
    se = want_std / np.sqrt(2000) * 5  # generous 5-sigma band over both samplings
    assert abs(got_mean - want_mean) < max(2 * se, 0.05 * max(1.0, abs(want_mean)))
