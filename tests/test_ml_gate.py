"""ML / blended gate paths of evaluate_entry with a real linear model."""

import numpy as np
import pytest

from qmmx_monolithic_monte_carlo_tpu.config import EngineParams
from qmmx_monolithic_monte_carlo_tpu.engine.gates import TickInput, evaluate_entry
from qmmx_monolithic_monte_carlo_tpu.engine.state import EngineCarry, MlModel
from qmmx_monolithic_monte_carlo_tpu.reasons import Reason
from qmmx_monolithic_monte_carlo_tpu.types import Levels

LEVELS = Levels.from_rows(
    [{"color": "blue", "type": "solid", "index": 0, "price": 100.0}], max_levels=4
)


def _ready_carry():
    c = EngineCarry.init(LEVELS.max_levels)
    return c.replace(
        last_ts_valid=np.bool_(True),
        last_ts_ms=np.int32(1_000_000),
        last_price=np.float32(99.98),
        last_price_valid=np.bool_(True),
    )


def _tick(price=100.01, prev=99.98):
    return TickInput.make(price, prev, 1_000_500)


def _sigmoid(z):
    return 1.0 / (1.0 + np.exp(-z))


def _expected_ml_features(params):
    # [lvl_type=1 (solid), |level-stop|=stop_padding, touch_count=1, dir_up=1]
    return np.array([1.0, float(np.asarray(params.stop_padding)), 1.0, 1.0])


def test_ml_gate_blocks_and_passes():
    params = EngineParams.default(q_min_prob=0.5)
    x = _expected_ml_features(params)

    # model engineered to produce proba ~0.3 → AND-mode block with ML_CONF_LOW
    coef = np.array([0.0, 0.0, 0.0, 0.0])
    low = MlModel.from_weights(coef, np.log(0.3 / 0.7), n_features=4)
    d, _ = evaluate_entry(_ready_carry(), LEVELS, params, _tick(), low)
    assert int(d.reason) == Reason.ML_CONF_LOW
    assert float(d.ml_prob) == pytest.approx(0.3, abs=1e-5)

    high = MlModel.from_weights(coef, np.log(0.8 / 0.2), n_features=4)
    d, _ = evaluate_entry(_ready_carry(), LEVELS, params, _tick(), high)
    assert bool(d.ok)
    assert float(d.ml_prob) == pytest.approx(0.8, abs=1e-5)


def test_ml_gate_uses_exact_reference_features():
    params = EngineParams.default(q_min_prob=0.5)
    x = _expected_ml_features(params)
    coef = np.array([0.3, -0.5, 0.2, 0.1])
    b = 0.05
    want = _sigmoid(x @ coef + b)
    m = MlModel.from_weights(coef, b, n_features=4)
    d, _ = evaluate_entry(_ready_carry(), LEVELS, params, _tick(), m)
    assert float(d.ml_prob) == pytest.approx(want, abs=1e-5)


def test_skewed_3_feature_model_disables_gate():
    """Quirk Q5: a 3-feature model through the 4-feature server never blocks and
    reports no probability (mlp falls back to conf)."""
    params = EngineParams.default(q_min_prob=0.5)
    # a model that WOULD block if usable
    m = MlModel.from_weights(np.array([0.0, 0.0, 0.0]), -5.0, n_features=3)
    d, _ = evaluate_entry(_ready_carry(), LEVELS, params, _tick(), m)
    assert bool(d.ok)
    assert not bool(d.ml_prob_valid)
    assert float(d.ml_prob) == pytest.approx(float(d.conf), abs=1e-6)


def test_blend_mode_math():
    params = EngineParams.default(q_min_prob=0.9, use_blend=True,
                                  w_rules=0.7, w_ml=0.3)
    coef = np.zeros(4)
    m = MlModel.from_weights(coef, np.log(0.95 / 0.05), n_features=4)
    d, _ = evaluate_entry(_ready_carry(), LEVELS, params, _tick(), m)
    conf = float(d.conf)
    want_blend = 0.7 * conf + 0.3 * 0.95
    assert float(d.blended) == pytest.approx(want_blend, abs=1e-5)
    if want_blend < 0.9:
        assert int(d.reason) == Reason.COMBINED_LOW
    else:
        assert bool(d.ok)


def test_blend_weights_normalized():
    # weights 7/3 normalize to 0.7/0.3 like the reference (:1716-1719)
    params = EngineParams.default(q_min_prob=0.5, use_blend=True,
                                  w_rules=7.0, w_ml=3.0)
    m = MlModel.from_weights(np.zeros(4), np.log(0.6 / 0.4), n_features=4)
    d, _ = evaluate_entry(_ready_carry(), LEVELS, params, _tick(), m)
    want = 0.7 * float(d.conf) + 0.3 * 0.6
    assert float(d.blended) == pytest.approx(want, abs=1e-5)


def test_disable_ml_gate_bypasses_model():
    params = EngineParams.default(q_min_prob=0.5, disable_ml_gate=True)
    blocker = MlModel.from_weights(np.zeros(4), -10.0, n_features=4)
    d, _ = evaluate_entry(_ready_carry(), LEVELS, params, _tick(), blocker)
    assert bool(d.ok)
    assert float(d.ml_prob) == pytest.approx(float(d.conf), abs=1e-6)
