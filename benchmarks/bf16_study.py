#!/usr/bin/env python3
"""bf16 path-generation study (ROADMAP item: measure, then accept/reject).

Hypothesis to test: generating GBM increments in bfloat16 (normals, drift+sig
scaling, the cumsum matmul in bf16 inputs with f32 accumulation) raises VPU
throughput enough to matter, without distorting the boundary contract.

Why prices themselves can NEVER be bf16 here: bf16 has 8 mantissa bits, so at
price ~100 one ulp is 0.5 — 10× the 0.05 CONTACT_PROX the contact detector
resolves.  Only the *increments* (~3e-4) can plausibly be bf16, with log-price
accumulation and all boundary comparisons kept in f32.

Run on the real chip: `python benchmarks/bf16_study.py`.  The same PRNG seed
produces the same raw bits in both variants, so aggregate deltas measure the
precision effect, not noise.  Results recorded in PARITY.md (decision) and
benchmarks/RESULTS.md (numbers).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qmmx_monolithic_monte_carlo_tpu.config import EngineParams
from qmmx_monolithic_monte_carlo_tpu.ops import pallas_mc as K
from qmmx_monolithic_monte_carlo_tpu.types import Levels

NUM_PATHS = 1 << 26
NUM_BARS = 40
SIGMA = 0.3
DT = 1.0 / (390.0 * 252.0)
_TWO_PI = 6.283185307179586


def _gbm_block_bf16(draw, *, w, b, drift, sig_dt, log_s0):
    """bf16-generation variant of pallas_mc._gbm_block: Box-Muller and the
    increment scale in bf16, cumsum matmul bf16×bf16 → f32 accumulation,
    exp/bridge/comparisons in f32."""
    u1 = draw(0)
    u2 = draw(1)
    z = (jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)).astype(jnp.bfloat16)
    incr16 = (jnp.bfloat16(drift) + jnp.bfloat16(sig_dt) * z)
    row = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
    tril = (col <= row).astype(jnp.bfloat16)
    log_rel = jnp.dot(tril, incr16, preferred_element_type=jnp.float32)
    incr = incr16.astype(jnp.float32)
    log_close = jnp.float32(log_s0) + log_rel
    log_open = log_close - incr
    close = jnp.exp(log_close)
    opens = jnp.exp(log_open)

    u3 = draw(2)
    u4 = draw(3)
    sig2dt = jnp.float32(sig_dt) * jnp.float32(sig_dt)
    d2 = (log_close - log_open) ** 2
    high = jnp.exp(0.5 * (log_open + log_close + jnp.sqrt(d2 - 2.0 * sig2dt * jnp.log(u3))))
    low = jnp.exp(0.5 * (log_open + log_close - jnp.sqrt(d2 - 2.0 * sig2dt * jnp.log(u4))))
    return K._Bars(opens=opens, close=close, high=high, low=low)


def _mc_kernel_bf16(seed_ref, knobs_ref, lp_ref, lv_ref, acc_ref, *,
                    num_bars, s0, drift, sig_dt, max_levels):
    w, b = num_bars, K.LANES
    pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))

    def draw(k):
        return K._uniform((w, b) if k < 4 else (1, b))

    bars = _gbm_block_bf16(draw, w=w, b=b, drift=drift, sig_dt=sig_dt,
                           log_s0=float(np.log(s0)))
    ct = K._first_contact(bars, lambda i: (lp_ref[i, 0], lv_ref[i, 0]),
                          max_levels, knobs_ref[0, 0], w=w, b=b)
    rep = K._replay_config(ct, bars, knobs_ref[0, 1], knobs_ref[0, 2],
                           draw(4), w=w)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        K._init_acc(acc_ref)

    K._accumulate(acc_ref, (), rep, ct, b=b)


@functools.partial(jax.jit, static_argnames=("num_paths",))
def mc_paths_bf16(seed, levels, params, *, num_paths):
    n_blocks = num_paths // K.LANES
    drift = (0.0 - 0.5 * SIGMA * SIGMA) * DT
    sig_dt = SIGMA * float(np.sqrt(DT))
    kernel = functools.partial(
        _mc_kernel_bf16, num_bars=NUM_BARS, s0=100.0, drift=drift,
        sig_dt=sig_dt, max_levels=levels.max_levels)
    knobs = jnp.stack([
        jnp.asarray(params.contact_prox, jnp.float32),
        jnp.asarray(params.stop_padding, jnp.float32),
        jnp.asarray(params.tp_padding, jnp.float32),
        jnp.float32(0.0)]).reshape(1, 4)
    lp, lv = K._level_rows(levels.price, levels.valid, levels.max_levels)
    acc = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((levels.max_levels, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((levels.max_levels, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(jnp.asarray(seed, jnp.int32).reshape(1, 1), knobs, lp, lv)
    return K._unpack_acc(acc)


def main():
    levels = Levels.from_rows([
        {"color": "blue", "type": "solid", "index": 0, "price": 100.0},
        {"color": "orange", "type": "dashed", "index": 0, "price": 100.4},
    ], max_levels=8)
    params = EngineParams.default()

    def timed(fn, label):
        s = fn(0)
        float(s.sum_r)
        t0 = time.perf_counter()
        reps = 3
        for k in range(1, reps + 1):
            s = fn(k)
            float(s.sum_r)
        dt_s = (time.perf_counter() - t0) / reps
        return s, NUM_PATHS / dt_s

    f32_run = lambda k: K.mc_paths_pallas(
        k, levels, params, num_paths=NUM_PATHS, num_bars=NUM_BARS,
        sigma=SIGMA, dt=DT)
    bf16_run = lambda k: mc_paths_bf16(k, levels, params, num_paths=NUM_PATHS)

    s32, rate32 = timed(f32_run, "f32")
    s16, rate16 = timed(bf16_run, "bf16")

    def row(s):
        ne = float(s.n_entered)
        return {
            "entered_frac": ne / float(s.n),
            "hit_rate": float(s.hit_rate),
            "mean_r": float(s.mean_r),
            "n_tp": float(s.n_tp), "n_stop": float(s.n_stop),
        }

    r32, r16 = row(s32), row(s16)
    print(json.dumps({
        "paths": NUM_PATHS,
        "f32_paths_per_s": round(rate32, 0),
        "bf16_paths_per_s": round(rate16, 0),
        "speedup": round(rate16 / rate32, 4),
        "f32": r32, "bf16": r16,
        "entered_frac_delta": r16["entered_frac"] - r32["entered_frac"],
        "hit_rate_delta": r16["hit_rate"] - r32["hit_rate"],
        "mean_r_delta": r16["mean_r"] - r32["mean_r"],
    }, indent=2))


if __name__ == "__main__":
    main()
