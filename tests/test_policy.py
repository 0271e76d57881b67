"""OnlinePolicy JAX model vs the scalar oracle (exact SGD/perceptron parity)."""

import numpy as np
import pytest

from qmmx_monolithic_monte_carlo_tpu.models import online_policy as OP

from .oracle.semantics import OnlinePolicyOracle, policy_features


def _random_events(rng, n):
    evs = []
    for _ in range(n):
        x = policy_features(
            float(rng.uniform(0, 2)), float(rng.normal(0, 5e5)),
            rng.choice(["from_above", "from_below"]), bool(rng.integers(2)),
            int(rng.integers(0, 400)),
        )
        phase = int(rng.integers(2))
        action = int(rng.integers(3 if phase == 0 else 2))
        label = int(rng.integers(2))
        evs.append((x, phase, action, label))
    return evs


@pytest.mark.parametrize("use_perceptron", [False, True])
def test_sequential_updates_match_oracle(use_perceptron):
    rng = np.random.default_rng(0)
    evs = _random_events(rng, 200)
    oracle = OnlinePolicyOracle(use_perceptron=use_perceptron)
    params = OP.PolicyParams.init(use_perceptron=use_perceptron)

    xs = np.array([e[0] for e in evs], np.float32)
    phases = np.array([e[1] for e in evs], np.int32)
    actions = np.array([e[2] for e in evs], np.int32)
    labels = np.array([e[3] for e in evs], np.int32)
    valid = np.ones((len(evs),), bool)

    for x, phase, action, label in evs:
        if phase == 0:
            oracle.update(oracle.w_entry, OnlinePolicyOracle.ENTRY[action], x, label)
        else:
            oracle.update(oracle.w_exit, OnlinePolicyOracle.EXIT[action], x, label)

    out = OP.train_events(params, xs, phases, actions, labels, valid)
    w_entry_oracle = np.array([oracle.w_entry[a] for a in OnlinePolicyOracle.ENTRY])
    w_exit_oracle = np.array([oracle.w_exit[a] for a in OnlinePolicyOracle.EXIT])
    np.testing.assert_allclose(np.asarray(out.w_entry), w_entry_oracle, atol=2e-6)
    np.testing.assert_allclose(np.asarray(out.w_exit), w_exit_oracle, atol=2e-6)


def test_scores_match_oracle_after_training():
    rng = np.random.default_rng(1)
    evs = _random_events(rng, 100)
    oracle = OnlinePolicyOracle()
    params = OP.PolicyParams.init()
    xs = np.array([e[0] for e in evs], np.float32)
    for x, phase, action, label in evs:
        if phase == 0:
            oracle.update(oracle.w_entry, OnlinePolicyOracle.ENTRY[action], x, label)
        else:
            oracle.update(oracle.w_exit, OnlinePolicyOracle.EXIT[action], x, label)
    out = OP.train_events(
        params, xs,
        np.array([e[1] for e in evs], np.int32),
        np.array([e[2] for e in evs], np.int32),
        np.array([e[3] for e in evs], np.int32),
        np.ones((len(evs),), bool),
    )
    x = np.asarray(policy_features(0.1, 0.0, "from_below", True, 100), np.float32)
    got = np.asarray(OP.score_entry(out, x))
    want = oracle.score(oracle.w_entry, x.tolist())
    for i, a in enumerate(OnlinePolicyOracle.ENTRY):
        assert got[i] == pytest.approx(want[a], abs=1e-6)


def test_valid_mask_skips_padding():
    params = OP.PolicyParams.init()
    xs = np.ones((4, 7), np.float32)
    out = OP.train_events(
        params, xs, np.zeros(4, np.int32), np.zeros(4, np.int32),
        np.ones(4, np.int32), np.array([True, True, False, False]),
    )
    out2 = OP.train_events(
        params, xs[:2], np.zeros(2, np.int32), np.zeros(2, np.int32),
        np.ones(2, np.int32), np.array([True, True]),
    )
    np.testing.assert_allclose(np.asarray(out.w_entry), np.asarray(out2.w_entry))


def test_sigmoid_clamp():
    params = OP.PolicyParams.init()
    params = params.replace(w_entry=params.w_entry.at[0].set(np.full(7, 100.0, np.float32)))
    x = np.ones((7,), np.float32)
    s = np.asarray(OP.score_entry(params, x))
    assert s[0] == 1.0  # clamped exactly (|z|>50)
