"""Confidence formula + soft veto vs the scalar oracle, over a parameter sweep."""

import itertools

import numpy as np
import pytest

from qmmx_monolithic_monte_carlo_tpu.ops import confidence as C
from qmmx_monolithic_monte_carlo_tpu.reasons import Reason
from qmmx_monolithic_monte_carlo_tpu.types import (
    DIR_DOWN,
    DIR_UNKNOWN,
    DIR_UP,
    KIND_DASHED,
    KIND_SOLID,
    SIDE_LONG,
    SIDE_SHORT,
)

from .oracle import semantics as O


def test_compute_confidence_sweep():
    prox = 0.05
    for dist, solid, direction, tc in itertools.product(
        [0.0, 0.01, 0.03, 0.05, 0.2],
        [True, False],
        ["up", "down", None],
        [0, 1, 2, 3, 7],
    ):
        want = O.compute_confidence(100.0, solid, 100.0 + dist, direction, tc, prox)
        got = C.compute_confidence(
            level_price=100.0,
            level_kind=KIND_SOLID if solid else KIND_DASHED,
            price=100.0 + dist,
            direction={"up": DIR_UP, "down": DIR_DOWN, None: DIR_UNKNOWN}[direction],
            touch_count=tc,
            contact_prox=prox,
        )
        # f32 device arithmetic vs f64 oracle: representation of the inputs alone
        # contributes ~1e-7 relative error, amplified by the 1/prox=20 factor.
        assert float(got) == pytest.approx(want, abs=1e-4), (dist, solid, direction, tc)


def test_soft_veto_sweep():
    for side, slope, approach, confl, pa in itertools.product(
        ["long", "short"],
        [-0.5, -0.26, -0.2, -0.04, 0.0, 0.04, 0.2, 0.26, 0.5],
        ["from_above", "from_below"],
        [True, False],
        [0.0, 0.05, 0.06, 0.07, 0.2],
    ):
        want_ok, want_code = O.soft_veto(side, slope, approach, confl, pa, 0.05)
        ok, reason = C.soft_veto(
            side=SIDE_LONG if side == "long" else SIDE_SHORT,
            volume_slope=slope,
            approach_from_below=(approach == "from_below"),
            confluence=confl,
            proximity_abs=pa,
            contact_prox=0.05,
            veto_vol_strong=0.25,
            veto_prox=0.06,
        )
        assert bool(ok) == want_ok, (side, slope, approach, confl, pa)
        if not want_ok:
            assert int(reason) == getattr(Reason, want_code)


def test_soft_veto_batched():
    slopes = np.linspace(-0.5, 0.5, 16).astype(np.float32)
    ok, reason = C.soft_veto(
        side=np.full((16,), SIDE_LONG),
        volume_slope=slopes,
        approach_from_below=np.ones((16,), bool),
        confluence=np.zeros((16,), bool),
        proximity_abs=np.full((16,), 0.01, np.float32),
        contact_prox=0.05,
        veto_vol_strong=0.25,
        veto_prox=0.06,
    )
    assert ok.shape == (16,)
    for i, s in enumerate(slopes):
        want_ok, _ = O.soft_veto("long", float(s), "from_below", False, 0.01, 0.05)
        assert bool(ok[i]) == want_ok
