"""First-hit stop/target primitives vs the scalar walk oracle."""

import numpy as np
import pytest

from qmmx_monolithic_monte_carlo_tpu.ops import hitscan as H
from qmmx_monolithic_monte_carlo_tpu.types import OUTCOME_OPEN, OUTCOME_STOP, OUTCOME_TP

from .oracle.semantics import walk_outcome

OUT = {"tp": OUTCOME_TP, "stop": OUTCOME_STOP, "open": OUTCOME_OPEN}


def _random_bars(rng, n):
    c = 100 + np.cumsum(rng.normal(0, 0.2, n))
    h = c + np.abs(rng.normal(0, 0.15, n))
    l = c - np.abs(rng.normal(0, 0.15, n))
    return h.astype(np.float32), l.astype(np.float32)


@pytest.mark.parametrize("seed", range(10))
def test_stop_target_outcome_matches_walk(seed):
    rng = np.random.default_rng(seed)
    n = 50
    h, l = _random_bars(rng, n)
    for side in ("long", "short"):
        entry = 100.0
        lvl = entry + rng.normal(0, 0.02)
        if side == "long":
            stop, target = lvl - 0.35, lvl + 0.25
        else:
            stop, target = lvl + 0.35, lvl - 0.25
        tie_u = float(rng.uniform())
        want_r, want_out = walk_outcome(
            list(zip(h.tolist(), l.tolist())),
            {"i": -1, "side": side},
            stop, target, entry, tie_u,
        )
        r, out = H.stop_target_outcome(
            highs=h, lows=l,
            side=np.int32(1 if side == "long" else -1),
            entry=np.float32(entry), stop=np.float32(stop), target=np.float32(target),
            tie_uniform=np.float32(tie_u),
        )
        assert int(out) == OUT[want_out], (seed, side)
        assert float(r) == pytest.approx(want_r, rel=1e-4, abs=1e-5)


def test_batched_outcomes():
    rng = np.random.default_rng(7)
    n, b = 40, 32
    h, l = _random_bars(rng, n)
    hs = np.broadcast_to(h, (b, n))
    ls = np.broadcast_to(l, (b, n))
    sides = rng.choice([1, -1], b).astype(np.int32)
    entries = (100 + rng.normal(0, 0.05, b)).astype(np.float32)
    stops = (entries - sides * 0.35).astype(np.float32)
    targets = (entries + sides * 0.25).astype(np.float32)
    ties = rng.uniform(size=b).astype(np.float32)
    r, out = H.stop_target_outcome(
        highs=hs, lows=ls, side=sides, entry=entries,
        stop=stops, target=targets, tie_uniform=ties,
    )
    assert r.shape == (b,)
    for i in range(b):
        want_r, want_out = walk_outcome(
            list(zip(h.tolist(), l.tolist())),
            {"i": -1, "side": "long" if sides[i] == 1 else "short"},
            float(stops[i]), float(targets[i]), float(entries[i]), float(ties[i]),
        )
        assert int(out[i]) == OUT[want_out]
        assert float(r[i]) == pytest.approx(want_r, rel=1e-4, abs=1e-5)


def test_monotone_first_hit_equals_bruteforce():
    rng = np.random.default_rng(3)
    lows = (100 - np.abs(np.cumsum(rng.normal(0, 0.1, 64)))).astype(np.float32)
    rng.shuffle(lows)
    run_min = np.asarray(H.running_min(lows))
    for thr in [99.0, 99.5, 99.9, 100.1, 90.0]:
        brute = int(H.first_index_leq(lows, np.float32(thr)))
        fast = int(H.first_hit_monotone_leq(run_min, np.float32(thr)))
        assert brute == fast, thr
    highs = (100 + np.abs(np.cumsum(rng.normal(0, 0.1, 64)))).astype(np.float32)
    rng.shuffle(highs)
    run_max = np.asarray(H.running_max(highs))
    for thr in [100.5, 101.0, 102.0, 99.0, 120.0]:
        brute = int(H.first_index_geq(highs, np.float32(thr)))
        fast = int(H.first_hit_monotone_geq(run_max, np.float32(thr)))
        assert brute == fast, thr


def test_valid_mask_excludes_entry_prefix():
    lows = np.array([99.0, 98.0, 97.0, 96.0], np.float32)
    mask = np.array([False, False, True, True])
    assert int(H.first_index_leq(lows, np.float32(98.5), mask)) == 2
