"""Resumable MC: fault injection → resume → bitwise-identical result."""

import jax
import numpy as np
import pytest

from qmmx_monolithic_monte_carlo_tpu.config import EngineParams
from qmmx_monolithic_monte_carlo_tpu.sim import pathsim, resumable
from qmmx_monolithic_monte_carlo_tpu.types import Levels

LEVELS = Levels.from_rows(
    [{"color": "blue", "type": "solid", "index": 0, "price": 100.0}], max_levels=4
)
PARAMS = EngineParams.default()
KW = dict(num_paths=1 << 13, num_bars=16, sigma=0.3, block_paths=1 << 10,
          blocks_per_chunk=2)


def test_crash_resume_bitwise_identical(tmp_path):
    key = jax.random.key(0)
    clean = resumable.run_resumable(
        key, LEVELS, PARAMS, ckpt_dir=str(tmp_path / "clean"), **KW)
    with pytest.raises(RuntimeError, match="injected failure"):
        resumable.run_resumable(
            key, LEVELS, PARAMS, ckpt_dir=str(tmp_path / "crashy"),
            fail_after_chunks=2, **KW)
    # resume from the watermark
    resumed = resumable.run_resumable(
        key, LEVELS, PARAMS, ckpt_dir=str(tmp_path / "crashy"), **KW)
    for k in ("n", "n_tp", "n_stop", "n_open", "sum_r", "sum_r2"):
        np.testing.assert_array_equal(
            np.asarray(getattr(clean, k)), np.asarray(getattr(resumed, k)), err_msg=k
        )
    np.testing.assert_array_equal(np.asarray(clean.hist), np.asarray(resumed.hist))


def test_resume_is_noop_when_complete(tmp_path):
    key = jax.random.key(1)
    a = resumable.run_resumable(key, LEVELS, PARAMS,
                                ckpt_dir=str(tmp_path / "c"), **KW)
    b = resumable.run_resumable(key, LEVELS, PARAMS,
                                ckpt_dir=str(tmp_path / "c"), **KW)
    np.testing.assert_array_equal(np.asarray(a.sum_r), np.asarray(b.sum_r))


def test_matches_plain_mc_paths(tmp_path):
    key = jax.random.key(2)
    a = resumable.run_resumable(key, LEVELS, PARAMS,
                                ckpt_dir=str(tmp_path / "c"), **KW)
    b = pathsim.mc_paths(key, LEVELS, PARAMS, num_paths=KW["num_paths"],
                         num_bars=KW["num_bars"], sigma=KW["sigma"],
                         block_paths=KW["block_paths"])
    np.testing.assert_allclose(float(a.sum_r), float(b.sum_r), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(a.hist), np.asarray(b.hist))


def test_ragged_tail(tmp_path):
    key = jax.random.key(3)
    st = resumable.run_resumable(
        key, LEVELS, PARAMS, ckpt_dir=str(tmp_path / "r"),
        num_paths=5 << 10, num_bars=16, sigma=0.3, block_paths=1 << 10,
        blocks_per_chunk=2,
    )
    assert float(st.n) == 5 << 10


def test_gated_resume_bitwise_identical(tmp_path):
    """The gated lifecycle checkpoints/resumes with the same watermark
    semantics: crash mid-run, resume, get the uninterrupted result bitwise."""
    from qmmx_monolithic_monte_carlo_tpu.sim.gatedpath import GateConfig

    gate = GateConfig.default(touch_limit=100, touch_gap_bars=1)
    kw = dict(num_paths=1 << 12, num_bars=16, sigma=0.3,
              block_paths=1 << 10, blocks_per_chunk=2, gate=gate)
    key = jax.random.key(3)

    straight = resumable.run_resumable(
        key, LEVELS, PARAMS, ckpt_dir=str(tmp_path / "a"), **kw)
    with pytest.raises(RuntimeError):
        resumable.run_resumable(
            key, LEVELS, PARAMS, ckpt_dir=str(tmp_path / "b"),
            fail_after_chunks=1, **kw)
    resumed = resumable.run_resumable(
        key, LEVELS, PARAMS, ckpt_dir=str(tmp_path / "b"), **kw)

    for f in ("n", "n_entered", "n_tp", "n_stop", "sum_r", "sum_trades",
              "sum_dd", "max_dd", "min_r", "max_r"):
        assert float(getattr(resumed, f)) == float(getattr(straight, f)), f
    np.testing.assert_array_equal(np.asarray(resumed.hist),
                                  np.asarray(straight.hist))
    assert float(straight.sum_trades) > float(straight.n_entered)


@pytest.mark.slow
def test_engine_resume_bitwise_identical(tmp_path):
    """The FULL 12-gate engine lifecycle checkpoints/resumes with the same
    watermark semantics, persisting the skip table and escalation count:
    crash mid-run, resume, get the uninterrupted result bitwise — and match
    a plain mc_paths_engine run of the same budget."""
    from qmmx_monolithic_monte_carlo_tpu.sim import enginepath as EP

    kw = dict(num_paths=1 << 12, num_bars=16, sigma=0.3,
              block_paths=1 << 10, blocks_per_chunk=2, engine=True)
    key = jax.random.key(5)

    straight, sk_s, esc_s = resumable.run_resumable(
        key, LEVELS, PARAMS, ckpt_dir=str(tmp_path / "a"), **kw)
    with pytest.raises(RuntimeError):
        resumable.run_resumable(
            key, LEVELS, PARAMS, ckpt_dir=str(tmp_path / "b"),
            fail_after_chunks=1, **kw)
    resumed, sk_r, esc_r = resumable.run_resumable(
        key, LEVELS, PARAMS, ckpt_dir=str(tmp_path / "b"), **kw)

    for f in ("n", "n_entered", "n_tp", "n_stop", "sum_r", "sum_trades",
              "sum_dd", "max_dd", "min_r", "max_r"):
        assert float(getattr(resumed, f)) == float(getattr(straight, f)), f
    np.testing.assert_array_equal(np.asarray(resumed.hist),
                                  np.asarray(straight.hist))
    np.testing.assert_array_equal(np.asarray(sk_r), np.asarray(sk_s))
    assert float(esc_r) == float(esc_s)

    plain, sk_p, esc_p = EP.mc_paths_engine(
        key, LEVELS, PARAMS, num_paths=kw["num_paths"],
        num_bars=kw["num_bars"], sigma=kw["sigma"],
        block_paths=kw["block_paths"])
    assert float(straight.n_entered) == float(plain.n_entered)
    assert float(esc_s) == float(esc_p)
    np.testing.assert_array_equal(np.asarray(sk_s), np.asarray(sk_p))
    np.testing.assert_array_equal(np.asarray(straight.hist),
                                  np.asarray(plain.hist))

    # engine vs gated vs first-contact checkpoints refuse to cross-resume
    with pytest.raises(ValueError):
        resumable.run_resumable(
            key, LEVELS, PARAMS, ckpt_dir=str(tmp_path / "a"),
            num_paths=kw["num_paths"], num_bars=kw["num_bars"],
            sigma=kw["sigma"], block_paths=kw["block_paths"],
            blocks_per_chunk=2)


@pytest.mark.slow
def test_bootstrap_resume_bitwise_and_history_fingerprint(tmp_path):
    """Recorded-bar (bootstrap) runs checkpoint/resume bitwise, and the
    history is part of the run fingerprint: resuming against different
    recorded bars is refused (a fresh run starts instead of silently
    merging incompatible stats)."""
    from tests.test_engine_bootstrap import _history

    hist = _history(3, 200)
    kw = dict(num_paths=1 << 12, num_bars=16, sigma=0.3,
              block_paths=1 << 10, blocks_per_chunk=2, engine=True,
              sampler="bootstrap", hist_bars=hist)
    key = jax.random.key(7)

    straight, sk_s, esc_s = resumable.run_resumable(
        key, LEVELS, PARAMS, ckpt_dir=str(tmp_path / "a"), **kw)
    with pytest.raises(RuntimeError):
        resumable.run_resumable(
            key, LEVELS, PARAMS, ckpt_dir=str(tmp_path / "b"),
            fail_after_chunks=1, **kw)
    resumed, sk_r, esc_r = resumable.run_resumable(
        key, LEVELS, PARAMS, ckpt_dir=str(tmp_path / "b"), **kw)
    for f in ("n", "n_entered", "n_tp", "n_stop", "sum_r", "sum_trades"):
        assert float(getattr(resumed, f)) == float(getattr(straight, f)), f
    np.testing.assert_array_equal(np.asarray(resumed.hist),
                                  np.asarray(straight.hist))
    np.testing.assert_array_equal(np.asarray(sk_r), np.asarray(sk_s))
    assert float(esc_r) == float(esc_s)

    # different recorded history → different fingerprint → fresh run, not a
    # resume of b's watermark
    kw2 = dict(kw, hist_bars=_history(11, 200))
    from qmmx_monolithic_monte_carlo_tpu.sim.resumable import _fingerprint

    fp1 = _fingerprint(key, num_paths=kw["num_paths"], num_bars=16, s0=100.0,
                       sigma=0.3, dt=1.0 / (390.0 * 252.0),
                       block_paths=kw["block_paths"], gate=None, engine=True,
                       sampler="bootstrap", hist_bars=hist)
    fp2 = _fingerprint(key, num_paths=kw["num_paths"], num_bars=16, s0=100.0,
                       sigma=0.3, dt=1.0 / (390.0 * 252.0),
                       block_paths=kw["block_paths"], gate=None, engine=True,
                       sampler="bootstrap", hist_bars=kw2["hist_bars"])
    assert fp1 != fp2
    # and the gbm fingerprint is untouched by the new fields (back-compat)
    fp_gbm = _fingerprint(key, num_paths=kw["num_paths"], num_bars=16,
                          s0=100.0, sigma=0.3, dt=1.0 / (390.0 * 252.0),
                          block_paths=kw["block_paths"], gate=None,
                          engine=True)
    assert "sampler" not in fp_gbm  # it's a hash — just check determinism
    assert fp_gbm == _fingerprint(key, num_paths=kw["num_paths"], num_bars=16,
                                  s0=100.0, sigma=0.3,
                                  dt=1.0 / (390.0 * 252.0),
                                  block_paths=kw["block_paths"], gate=None,
                                  engine=True, sampler="gbm")
