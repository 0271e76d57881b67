"""Model checkpointing: policy weights + LR gate model persistence.

The reference joblib-dumps the OnlinePolicy object on engine stop and after each
incremental pass (qmmx_monolithic.py:2113-2125, :3801) and the sklearn LR to
``models/qmmx_lr.joblib`` (:3849-3853).  The rebuild persists the same state in
two interchangeable formats:

* ``.npz`` — dependency-free arrays (w_entry, w_exit, lr, l2, coef, intercept);
* orbax (optional) — directory checkpoints for fleet-scale runs, with the same
  watermark-resume pattern as the SQLite training watermark.

``load_reference_online_policy`` can also ingest the reference's own
``online_policy.joblib`` artifact (a pickled OnlinePolicy instance) to hot-start
from an existing deployment.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from ..engine.state import MlModel
from ..models import online_policy as OP


def save_policy_npz(path: str, policy: OP.PolicyParams) -> None:
    np.savez(
        path,
        w_entry=np.asarray(policy.w_entry),
        w_exit=np.asarray(policy.w_exit),
        lr=np.asarray(policy.lr),
        l2=np.asarray(policy.l2),
        use_perceptron=np.asarray(policy.use_perceptron),
    )


def load_policy_npz(path: str) -> OP.PolicyParams:
    z = np.load(path)
    return OP.PolicyParams(
        w_entry=jnp.asarray(z["w_entry"], jnp.float32),
        w_exit=jnp.asarray(z["w_exit"], jnp.float32),
        lr=jnp.asarray(z["lr"], jnp.float32),
        l2=jnp.asarray(z["l2"], jnp.float32),
        use_perceptron=jnp.asarray(bool(z["use_perceptron"])),
    )


def save_lr_model_npz(path: str, coef, intercept, n_features: int = 4) -> None:
    np.savez(path, coef=np.asarray(coef), intercept=np.asarray(intercept),
             n_features=np.asarray(n_features))


def load_lr_model_npz(path: str) -> MlModel:
    z = np.load(path)
    return MlModel.from_weights(z["coef"], z["intercept"],
                                n_features=int(z["n_features"]))


def load_reference_online_policy(path: str) -> OP.PolicyParams | None:
    """Ingest the reference's joblib'd OnlinePolicy weights.

    The artifact in the reference snapshot (models/online_policy.joblib) is a
    plain dict {"w_entry": {action: [7 floats]}, "w_exit": {...}, "dim": 7,
    "cfg": {lr, l2, use_perceptron}} (saved by ``_save_policy``,
    qmmx_monolithic.py:2113-2125); older variants pickle the OnlinePolicy
    instance itself — both forms are handled."""
    try:
        import joblib

        obj = joblib.load(path)
        if isinstance(obj, dict):
            w_entry_d, w_exit_d = obj["w_entry"], obj["w_exit"]
            cfg = obj.get("cfg", {}) or {}
        else:
            w_entry_d, w_exit_d = obj.w_entry, obj.w_exit
            cfg = {
                "lr": getattr(obj, "lr", 0.03),
                "l2": getattr(obj, "l2", 1e-6),
                "use_perceptron": getattr(obj, "use_perceptron", False),
            }
        w_entry = np.array([w_entry_d[a] for a in OP.ENTRY_ACTIONS], np.float32)
        w_exit = np.array([w_exit_d[a] for a in OP.EXIT_ACTIONS], np.float32)
        return OP.PolicyParams(
            w_entry=jnp.asarray(w_entry),
            w_exit=jnp.asarray(w_exit),
            lr=jnp.float32(cfg.get("lr", 0.03)),
            l2=jnp.float32(cfg.get("l2", 1e-6)),
            use_perceptron=jnp.asarray(bool(cfg.get("use_perceptron", False))),
        )
    except Exception:
        return None


# ---- orbax directory checkpoints (optional dependency) ----

def save_orbax(ckpt_dir: str, policy: OP.PolicyParams, step: int = 0) -> bool:
    try:
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}"))
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, policy)
        with open(os.path.join(ckpt_dir, "latest.json"), "w") as f:
            json.dump({"step": step}, f)
        return True
    except Exception:
        return False


def load_orbax(ckpt_dir: str, template: OP.PolicyParams) -> tuple[OP.PolicyParams | None, int]:
    try:
        import orbax.checkpoint as ocp

        with open(os.path.join(ckpt_dir, "latest.json")) as f:
            step = int(json.load(f)["step"])
        path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}"))
        with ocp.StandardCheckpointer() as ckptr:
            return ckptr.restore(path, template), step
    except Exception:
        return None, -1
