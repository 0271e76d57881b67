"""Checkpointing: npz roundtrips, orbax roundtrips, and ingest of the REAL
reference joblib policy artifact."""

import os

import numpy as np
import pytest

from qmmx_monolithic_monte_carlo_tpu.engine.state import MlModel
from qmmx_monolithic_monte_carlo_tpu.io import checkpoint as ckpt
from qmmx_monolithic_monte_carlo_tpu.models import online_policy as OP

REF_POLICY = "/root/reference/models/online_policy.joblib"


def test_policy_npz_roundtrip(tmp_path):
    p = OP.PolicyParams.init()
    p = p.replace(w_entry=p.w_entry.at[0, 1].set(0.5))
    path = str(tmp_path / "pol.npz")
    ckpt.save_policy_npz(path, p)
    q = ckpt.load_policy_npz(path)
    np.testing.assert_array_equal(np.asarray(p.w_entry), np.asarray(q.w_entry))
    assert float(q.lr) == pytest.approx(0.03)


def test_lr_model_npz_roundtrip(tmp_path):
    path = str(tmp_path / "lr.npz")
    ckpt.save_lr_model_npz(path, [0.1, -0.2, 0.3, 0.4], 0.05, n_features=4)
    m = ckpt.load_lr_model_npz(path)
    assert isinstance(m, MlModel)
    assert bool(m.present)
    np.testing.assert_allclose(np.asarray(m.coef), [0.1, -0.2, 0.3, 0.4],
                               rtol=1e-6)


@pytest.mark.skipif(not os.path.exists(REF_POLICY),
                    reason="reference snapshot not mounted")
def test_ingest_reference_joblib_policy():
    """Hot-start from the reference's own persisted weights (dim=7)."""
    p = ckpt.load_reference_online_policy(REF_POLICY)
    assert p is not None
    assert p.w_entry.shape == (3, 7)
    assert p.w_exit.shape == (2, 7)
    # the snapshot's go_long head has learned non-zero weights
    assert float(np.abs(np.asarray(p.w_entry)[0]).sum()) > 0.1
    # and it scores without error
    from qmmx_monolithic_monte_carlo_tpu.ops.features import policy_features

    x = policy_features(proximity_abs=0.02, volume_trend=0.0, approach=1,
                        confluence=False, minutes_since_open=60)
    s = np.asarray(OP.score_entry(p, x))
    assert s.shape == (3,) and np.all((s >= 0) & (s <= 1))


def test_orbax_roundtrip(tmp_path):
    p = OP.PolicyParams.init()
    p = p.replace(w_exit=p.w_exit.at[1, 2].set(-0.7))
    ok = ckpt.save_orbax(str(tmp_path / "ck"), p, step=3)
    if not ok:
        pytest.skip("orbax unavailable")
    q, step = ckpt.load_orbax(str(tmp_path / "ck"), OP.PolicyParams.init())
    assert step == 3
    np.testing.assert_array_equal(np.asarray(p.w_exit), np.asarray(q.w_exit))
