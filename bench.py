#!/usr/bin/env python3
"""Headline benchmark: Monte Carlo 40-bar stop/target replay throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the rebuild's north star (BASELINE.json) — 1e9 simulated 40-bar paths
per minute on a v5e-8, i.e. 1e9/60/8 ≈ 2.0833e6 paths/s/chip.  The reference
itself publishes no numbers (its MC is a serial Python loop); vs_baseline > 1
means faster than the north-star per-chip rate.
"""

import json
import sys
import time

import jax

BASELINE_PATHS_PER_SEC_PER_CHIP = 1e9 / 60.0 / 8.0

NUM_BARS = 40
SIGMA = 0.3
DT = 1.0 / (390.0 * 252.0)


def main():
    from qmmx_monolithic_monte_carlo_tpu.config import EngineParams
    from qmmx_monolithic_monte_carlo_tpu.sim import pathsim
    from qmmx_monolithic_monte_carlo_tpu.types import Levels

    levels = Levels.from_rows(
        [
            {"color": "blue", "type": "solid", "index": 0, "price": 100.0},
            {"color": "orange", "type": "dashed", "index": 0, "price": 100.4},
        ],
        max_levels=8,
    )
    params = EngineParams.default()
    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"

    if on_tpu:
        # fused Pallas kernel: generate+replay+reduce entirely in VMEM
        from qmmx_monolithic_monte_carlo_tpu.ops.pallas_mc import mc_paths_pallas

        num_paths = 1 << 28

        def run(seed):
            return mc_paths_pallas(
                seed, levels, params,
                num_paths=num_paths, num_bars=NUM_BARS, s0=100.0,
                sigma=SIGMA, dt=DT,
            )

        keys = list(range(1, 4))
    else:
        num_paths = 1 << 18
        block = 1 << 14

        def run(seed):
            return pathsim.mc_paths(
                jax.random.key(seed), levels, params,
                num_paths=num_paths, num_bars=NUM_BARS, s0=100.0,
                sigma=SIGMA, dt=DT, block_paths=block,
            )

        keys = list(range(1, 4))

    # warm-up/compile (full materialization so dispatch pipelining can't skew)
    stats = run(0)
    float(stats.sum_r)

    reps = len(keys)
    t0 = time.perf_counter()
    for k in keys:
        stats = run(k)
        float(stats.sum_r)
    dt_s = (time.perf_counter() - t0) / reps

    paths_per_sec = num_paths / dt_s
    print(
        json.dumps(
            {
                "metric": "mc_paths_per_sec_per_chip_40bar",
                "value": round(paths_per_sec, 1),
                "unit": "paths/s",
                "vs_baseline": round(paths_per_sec / BASELINE_PATHS_PER_SEC_PER_CHIP, 3),
            }
        )
    )
    # context lines on stderr (driver reads stdout's single JSON line)
    print(
        f"# device={dev.device_kind} paths={num_paths} "
        f"backend={'pallas' if on_tpu else 'xla'} "
        f"time/rep={dt_s:.3f}s hit_rate={float(stats.hit_rate):.3f}",
        file=sys.stderr,
    )


def _tunnel_alive(deadline_s: float = 300.0) -> bool:
    """Probe TPU backend init in a SUBPROCESS with a hard deadline.

    When the axon tunnel is down, ``jax.devices()`` blocks forever inside
    backend init while holding the backend-registry lock — no in-process
    fallback (thread watchdog, platform flip) can recover after that, so
    the probe must happen in a disposable process BEFORE this one touches
    jax.devices()."""
    import os
    import subprocess

    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=deadline_s, env=env,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


if __name__ == "__main__":
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    elif not _tunnel_alive():
        # wedged tunnel: fall back to the XLA pipeline on CPU so the driver
        # still records a real (if slow) number instead of hanging forever
        print("# TPU tunnel unresponsive — falling back to CPU XLA",
              file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
    # the axon remote-compile tunnel occasionally throws a transient
    # FAILED_PRECONDITION; retry in-process before giving up
    for attempt in range(3):
        try:
            main()
            break
        except Exception as e:  # noqa: BLE001
            if attempt == 2:
                raise
            print(f"# bench attempt {attempt + 1} failed ({e}); retrying",
                  file=sys.stderr)
            time.sleep(10)
