"""Featurizer ops vs the scalar oracle."""

import numpy as np
import pytest

from qmmx_monolithic_monte_carlo_tpu.ops import features as F
from qmmx_monolithic_monte_carlo_tpu.types import Levels

from .oracle import semantics as O

LEVEL_ROWS = [
    {"color": "blue", "type": "solid", "index": 0, "price": 100.0},
    {"color": "blue", "type": "dashed", "index": 0, "price": 100.5},
    {"color": "orange", "type": "solid", "index": 1, "price": 101.2},
    {"color": "teal", "type": "dashed", "index": 2, "price": 99.4},
]


@pytest.fixture(scope="module")
def levels():
    return Levels.from_rows(LEVEL_ROWS, max_levels=8)


def test_nearest_level_matches_python_min(levels):
    rows = sorted(
        LEVEL_ROWS, key=lambda r: (r["color"], r["type"], r["index"])
    )
    for px in [98.0, 99.9, 100.24, 100.26, 100.76, 101.0, 105.0]:
        idx, dist = F.nearest_level(levels, np.float32(px))
        best = min(rows, key=lambda r: abs(r["price"] - px))
        assert float(np.asarray(levels.price)[int(idx)]) == pytest.approx(best["price"])
        assert float(dist) == pytest.approx(abs(best["price"] - px), abs=1e-5)


def test_nearest_level_tie_breaks_to_first(levels):
    # 100.25 is equidistant from 100.0 and 100.5; Python min keeps the first in
    # (color, type, index) order → blue/dashed(100.5) sorts before blue/solid?
    # 'dashed' < 'solid' lexicographically, so 100.5 wins.
    idx, _ = F.nearest_level(levels, np.float32(100.25))
    assert float(np.asarray(levels.price)[int(idx)]) == pytest.approx(100.5)


def test_confluence_count(levels):
    assert int(F.confluence_count(levels, 100.0, 0.15)) == 1
    assert int(F.confluence_count(levels, 100.0, 0.6)) == 3  # 100.0, 100.5, 99.4 (<= is inclusive)
    assert bool(F.has_confluence_near(levels, 100.25, 0.3)) is True
    assert bool(F.has_confluence_near(levels, 99.4, 0.15)) is False


def test_policy_features_matches_oracle():
    cases = [
        (0.03, 2e5, "from_above", True, 30),
        (1.7, -5e6, "from_below", False, 500),
        (0.0, 0.0, "from_above", False, 0),
    ]
    for prox, vt, ap, cf, mins in cases:
        want = O.policy_features(prox, vt, ap, cf, mins)
        got = F.policy_features(
            proximity_abs=prox,
            volume_trend=vt,
            approach=0 if ap == "from_above" else 1,
            confluence=cf,
            minutes_since_open=mins,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want, np.float32), atol=1e-6)


def _padded(vals, n=32):
    arr = np.zeros((n,), np.float32)
    valid = np.zeros((n,), bool)
    arr[: len(vals)] = vals
    valid[: len(vals)] = True
    return arr, valid


@pytest.mark.parametrize(
    "vols",
    [
        [5.0, 4.0, 3.0, 2.0, 1.0, 0.5],
        [1.0, 2.0],
        [1.0, 2.0, 3.0],
        [0.0, 0.0, 0.0, 0.0],
        [10.0, 0.0, 5.0, 20.0, 1.0, 2.0, 3.0, 9.0],
        [3.0, 3.0, 3.0, 3.0, 3.0],
    ],
)
def test_volume_slope_matches_oracle(vols):
    arr, valid = _padded(vols)
    got = float(F.volume_slope(arr, valid, window=6))
    want = O.volume_slope(vols, window=6)
    assert got == pytest.approx(want, abs=1e-5)


@pytest.mark.parametrize("seed", range(6))
def test_volume_trend_toward_level_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(2, 12))
    prices = (100 + rng.normal(0, 0.5, n)).tolist()
    vols = rng.uniform(0, 10, n).tolist()
    level = 100.0
    want = O.volume_trend_toward_level(prices, vols, level)
    parr, valid = _padded(prices)
    varr, _ = _padded(vols)
    got, defined = F.volume_trend_toward_level(parr, varr, valid, level)
    if want is None:
        assert not bool(defined)
    else:
        assert bool(defined)
        assert float(got) == pytest.approx(want, abs=1e-4)


@pytest.mark.parametrize("seed", range(6))
def test_infer_approach_matches_oracle(seed):
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(1, 6))
    prices = (100 + rng.normal(0, 0.3, n)).tolist()
    level = 100.0
    want = O.infer_approach(prices, level)
    parr, valid = _padded(prices)
    got = int(F.infer_approach(parr, valid, level))
    if want is None:
        assert got == -1
    else:
        assert got == (0 if want == "from_above" else 1)
