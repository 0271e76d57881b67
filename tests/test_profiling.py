"""Profiling utilities: trace files land on disk, timing harness behaves."""

import glob
import os

import jax
import jax.numpy as jnp

from qmmx_monolithic_monte_carlo_tpu.utils import profiling as P


def test_trace_writes_files(tmp_path):
    logdir = str(tmp_path / "trace")
    with P.trace(logdir):
        with P.annotate("test_span"):
            x = jnp.ones((256, 256))
            jax.block_until_ready(x @ x)
    files = glob.glob(os.path.join(logdir, "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in files)


def test_time_fn_excludes_compile():
    @jax.jit
    def f(x):
        return (x * 2.0).sum()

    t = P.time_fn(f, jnp.ones((512, 512)), reps=3)
    assert t.reps == 3
    assert t.mean_s > 0
    # compile pass includes tracing+lowering; steady-state must not be slower
    assert t.mean_s <= t.compile_s * 5
    assert t.per_sec(512 * 512) > 0
