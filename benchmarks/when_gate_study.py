"""Can a per-bar scalar gate skip rare per-path work on Mosaic?

ROADMAP round-5 candidate 1: the engine kernel's escalation trend walk
costs ~18% of the full kernel even when ZERO escalations fire, because the
branchless form computes it every bar for every path.  The reference only
evaluates escalation when a position is open NEAR its target (:1950-2012
via :2988) — rare.  A scalar `lax.cond` per bar ("any path in this tile
near a target?") could skip the walk on most bars — results identical,
timing data-dependent.

This toy measures the three primitives that decide viability, paired
in-process (the only trustworthy comparison on the shared chip):

  nogate   — loop body: cheap base work + an EXPENSIVE block every bar
  gated_f  — expensive block behind `lax.cond(pred)` with pred ~always
             FALSE (the best case: how much does a skipped cond save?)
  gated_t  — same with pred ~always TRUE (the worst case: cond overhead
             on top of the work)
  predcost — no expensive block at all, but still compute the any-path
             reduction + cond on a trivial body (the gate's own price)

The expensive block is ~48 tile ops (mimicking the escalation walk's
CLOSE_RING × ~10 ops at 5 slots); the base work is a Box-Muller bar
generation so the loop resembles the engine's.

Run: python benchmarks/when_gate_study.py [--paths 24] [--bars 40]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 8
_TWO_PI = 6.283185307179586


def _uniform(shape):
    bits = pltpu.prng_random_bits(shape)
    return (bits >> 8).astype(jnp.float32) * jnp.float32(2.0 ** -24) + \
        jnp.float32(2.0 ** -25)


def _expensive(c, v, acc):
    """~48 tile ops shaped like the escalation trend walk (slot compares,
    masked accumulations, a divide)."""
    darr = [jnp.abs(c - jnp.float32(100.0 + 0.1 * j)) for j in range(5)]
    sel = []
    for j in range(5):
        keep = darr[j] <= darr[min(j + 1, 4)]
        sel.append(keep)
    first = jnp.zeros_like(c)
    last = jnp.zeros_like(c)
    older = jnp.zeros_like(c)
    for j in range(4, -1, -1):
        w = sel[j].astype(jnp.float32)
        first = first + v * ((older < 2.0).astype(jnp.float32) * w)
        last = last + v * ((older >= 3.0).astype(jnp.float32) * w)
        older = older + w
    trend = (last - first) / jnp.maximum(older, 1.0)
    return acc + trend * jnp.float32(1e-10)


def _kernel(seed_ref, o_ref, *, num_bars, lanes, mode, thresh):
    s, b = SUB, lanes
    pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    sig = jnp.float32(0.3 * np.sqrt(1e-5))

    def body(t, st):
        log_s, acc = st
        u1, u2 = _uniform((s, b)), _uniform((s, b))
        z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)
        log_s = log_s + sig * z
        c = jnp.exp(log_s)
        v = jnp.exp(jnp.float32(0.35) * z)
        if mode == "nogate":
            acc = _expensive(c, v, acc)
        elif mode in ("gated_f", "gated_t"):
            # "any path near a target this bar" — one cross-tile reduce
            pred = jnp.max(c) > jnp.float32(thresh)
            acc = jax.lax.cond(pred, lambda a: _expensive(c, v, a),
                               lambda a: a, acc)
        elif mode == "predcost":
            pred = jnp.max(c) > jnp.float32(thresh)
            acc = jax.lax.cond(pred, lambda a: a + jnp.float32(1e-30),
                               lambda a: a, acc)
        acc = acc + (c - v * 1e-12)
        return log_s, acc

    zero = jnp.zeros((s, b), jnp.float32)
    st = (zero + jnp.float32(np.log(100.0)), zero)
    st = jax.lax.fori_loop(0, num_bars, body, st)
    o_ref[...] = st[1]


def _run(mode, *, n_blocks, num_bars, lanes, thresh, reps):
    kernel = functools.partial(_kernel, num_bars=num_bars, lanes=lanes,
                               mode=mode, thresh=thresh)

    @jax.jit
    def go(seed):
        return pl.pallas_call(
            kernel, grid=(n_blocks,),
            in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((SUB, lanes), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((SUB, lanes), jnp.float32),
        )(jnp.asarray(seed, jnp.int32).reshape(1, 1))

    return go


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", type=int, default=24)
    ap.add_argument("--bars", type=int, default=40)
    ap.add_argument("--lanes", type=int, default=256)
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()
    N = 1 << args.paths
    n_blocks = N // (SUB * args.lanes)
    # GBM around 100 with tiny sigma: max(c) > 101 ~never, > 99 ~always
    variants = {
        "nogate": _run("nogate", n_blocks=n_blocks, num_bars=args.bars,
                       lanes=args.lanes, thresh=101.0, reps=args.rounds),
        "gated_f": _run("gated_f", n_blocks=n_blocks, num_bars=args.bars,
                        lanes=args.lanes, thresh=101.0, reps=args.rounds),
        "gated_t": _run("gated_t", n_blocks=n_blocks, num_bars=args.bars,
                        lanes=args.lanes, thresh=99.0, reps=args.rounds),
        "predcost": _run("predcost", n_blocks=n_blocks, num_bars=args.bars,
                         lanes=args.lanes, thresh=101.0, reps=args.rounds),
    }
    print(f"# when-gate study: 2^{args.paths} x {args.bars} bars, "
          f"lanes={args.lanes} (device={jax.devices()[0].device_kind})",
          file=sys.stderr)
    for fn in variants.values():
        float(jnp.sum(fn(0)))
    times = {k: [] for k in variants}
    for r in range(args.rounds):
        for k, fn in variants.items():
            t0 = time.perf_counter()
            float(jnp.sum(fn(r + 1)))
            times[k].append(time.perf_counter() - t0)
    base = float(np.median(times["nogate"]))
    for k, v in times.items():
        med = float(np.median(v))
        print(f"{k:8s}: {N / med / 1e6:7.1f}M paths/s ({med * 1e3:5.0f} ms, "
              f"{med / base:4.2f}x nogate)")


if __name__ == "__main__":
    main()
