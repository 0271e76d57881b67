"""Driver-contract tests for ``__graft_entry__`` in its SHIPPED form.

Round 1 shipped a ``dryrun_multichip`` that worked under the test conftest
(which pre-sets the virtual-CPU env) but failed when the driver invoked it
with the axon/TPU backend eligible and no XLA_FLAGS (MULTICHIP_r01.json
``ok=false``).  These tests spawn clean subprocesses so the exact code path
the driver hits is what runs — no conftest environment leaks in.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env(**extra):
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env.update(extra)
    return env


def test_dryrun_multichip_from_clean_env():
    """No XLA_FLAGS, no JAX_PLATFORMS: dryrun_multichip must still build an
    8-device mesh (via its subprocess fallback) and run the sharded step."""
    r = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=_clean_env(), capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, f"stderr:\n{r.stderr[-4000:]}"
    assert "dryrun_multichip OK" in r.stdout
    assert "'paths': 4" in r.stdout and "'symbols': 2" in r.stdout


def test_dryrun_multichip_after_backend_init():
    """Even after jax.devices() has initialized a 1-device CPU backend in the
    calling process (the round-1 failure mode, with TPU standing in for CPU
    here), the dryrun must recover via the subprocess path."""
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); jax.devices(); "
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO, env=_clean_env(), capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, f"stderr:\n{r.stderr[-4000:]}"
    assert "dryrun_multichip OK" in r.stdout


def test_dryrun_multichip_inproc_when_env_ready():
    """With the virtual-CPU env pre-set (the conftest/driver-happy case) the
    run stays in-process — no nested subprocess env mangling."""
    code = (
        "import __graft_entry__ as g; "
        "assert g._cpu_mesh_ready(8); g.dryrun_multichip(8)"
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=_clean_env(
            XLA_FLAGS="--xla_force_host_platform_device_count=8",
            JAX_PLATFORMS="cpu",
        ),
        capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, f"stderr:\n{r.stderr[-4000:]}"
    assert "dryrun_multichip OK" in r.stdout
