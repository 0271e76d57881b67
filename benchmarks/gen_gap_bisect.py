"""Bisect the engine kernel's generation gap (ROADMAP item 0, RESULTS §4g).

The real kernel's gen-only mode runs ~2.9x slower than an op-identical toy
WHEN MEASURED PAIRED IN ONE PROCESS (the shared axon chip drifts ~1.9x
across processes, so the earlier cross-process "3.8x" overstated it; all
numbers here are interleaved A/B reps from a single process).

Variants add ONE structural feature of the real kernel to the toy at a
time:

  base      — pregen_study streaming toy + full VolumeModel (the op mix)
  tie       — + the tie uniform consumed (the toy's was dead -> DCE'd)
  carry67   — + 67 untouched (8, lanes) carried state tiles (the real
              gen-mode carry at L=2: counters, touch memory, taps, box)
  rings     — carry67 + two untouched (160, lanes) ring arrays (the
              volume/close rings are ONE array on the sublane axis each)
  inputs9   — + the real kernel's input-block layout (5 SMEM rows + 3
              (2,128) VMEM level tiles, all constant index maps)
  gen       — the real kernel, gen_only=True (the thing being explained)

Run: python benchmarks/gen_gap_bisect.py [--paths 24] [--rounds 4]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUB = 8
_TWO_PI = 6.283185307179586


def _uniform(shape):
    bits = pltpu.prng_random_bits(shape)
    return (bits >> 8).astype(jnp.float32) * jnp.float32(2.0 ** -24) + \
        jnp.float32(2.0 ** -25)


def _toy_kernel(seed_ref, *refs, num_bars, lanes, sig, drift, log_s0,
                vm_sigma, live_tie, n_carry, n_rings, n_extra_in):
    """The pregen_study streaming toy with full VolumeModel, plus optional
    structural features of the real engine kernel (see module docstring)."""
    s, b = SUB, lanes
    o_ref = refs[n_extra_in]         # output follows ALL extra inputs
    pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    sig2dt = jnp.float32(sig * sig)
    mean_abs = jnp.float32(np.sqrt(2.0 / np.pi))
    sd_abs = jnp.float32(np.sqrt(1.0 - 2.0 / np.pi))
    vm_base, vm_uamp = jnp.float32(1e6), jnp.float32(1.2)

    def body(t2, st):
        log_s, prev_c, acc = st[0], st[1], st[2]
        rest = st[3:]
        u1, u2 = _uniform((s, b)), _uniform((s, b))
        rad = jnp.sqrt(-2.0 * jnp.log(u1))
        ang = _TWO_PI * u2
        z_pair = (rad * jnp.cos(ang), rad * jnp.sin(ang))
        uv1, uv2 = _uniform((s, b)), _uniform((s, b))
        vrad = jnp.sqrt(-2.0 * jnp.log(uv1))
        vang = _TWO_PI * uv2
        zv_pair = (vrad * jnp.cos(vang), vrad * jnp.sin(vang))
        for half in range(2):
            t_i = 2 * t2 + half
            u3, u4 = _uniform((s, b)), _uniform((s, b))
            tie = _uniform((s, b))
            z, zv = z_pair[half], zv_pair[half]
            incr = jnp.float32(drift) + jnp.float32(sig) * z
            log_open = log_s
            log_close = log_s + incr
            c = jnp.exp(log_close)
            d2 = incr * incr
            h = jnp.exp(0.5 * (log_open + log_close
                               + jnp.sqrt(d2 - 2.0 * sig2dt * jnp.log(u3))))
            low = jnp.exp(0.5 * (log_open + log_close
                                 - jnp.sqrt(d2 - 2.0 * sig2dt * jnp.log(u4))))
            t_f = t_i.astype(jnp.float32)
            m_min = jnp.mod(jnp.float32(570.0) + t_f, jnp.float32(390.0))
            x_u = 2.0 * m_min / jnp.float32(389.0) - 1.0
            ushape = 1.0 + vm_uamp * (x_u * x_u - jnp.float32(1.0 / 3.0))
            vnoise = jnp.exp(jnp.float32(vm_sigma) * zv
                             - 0.5 * jnp.float32(vm_sigma) ** 2)
            v = vm_base * ushape * vnoise
            v = v * (1.0 + jnp.float32(0.5) * ((jnp.abs(z) - mean_abs)
                                               / sd_abs))
            v = jnp.maximum(v, jnp.float32(0.05) * vm_base)
            acc = acc + (c - h) + (low - c) * 0.5 + v * 1e-12
            if live_tie:
                acc = acc + tie * 1e-20
            log_s = log_close
            prev_c = c
        return (log_s, prev_c, acc) + rest

    zero = jnp.zeros((s, b), jnp.float32)
    log_s = zero + jnp.float32(log_s0)
    st = (log_s, jnp.exp(log_s), zero)
    st = st + tuple(zero + jnp.float32(j) for j in range(n_carry))
    if n_rings:
        st = st + (jnp.full((160, b), 1e30, jnp.float32),
                   jnp.zeros((160, b), jnp.float32))[:n_rings]
    st = jax.lax.fori_loop(0, num_bars // 2, body, st)
    # live-keeper: slice-add row 0 of every 128-lane half of every leaf
    # (vreg-granularity DCE — see RESULTS.md §4g)
    acc = st[2]
    keep = jnp.zeros((1, 128), jnp.float32)
    for j in range(3, len(st)):
        leaf = st[j]
        for off in range(0, leaf.shape[1], 128):
            keep = keep + leaf[0:1, off:off + 128]
    o_ref[...] = acc
    o_ref[0:1, 0:128] += keep


def _make_toy(*, n_blocks, lanes, num_bars, live_tie=False, n_carry=0,
              n_rings=0, inputs9=False):
    kw = dict(num_bars=num_bars, lanes=lanes, sig=0.3 * np.sqrt(1e-5),
              drift=-0.5 * 0.09 * 1e-5, log_s0=float(np.log(100.0)),
              vm_sigma=0.35, live_tie=live_tie, n_carry=n_carry,
              n_rings=n_rings, n_extra_in=8 if inputs9 else 0)
    kernel = functools.partial(_toy_kernel, **kw)
    smem = [pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)]
    vmem_in = []
    extra_args = []
    if inputs9:
        # mirror the real kernel's operand layout: 6 SMEM rows + 3 VMEM
        # (L, 128) level tiles, all with constant index maps
        smem += [pl.BlockSpec((1, 21), lambda i: (0, 0),
                              memory_space=pltpu.SMEM),
                 pl.BlockSpec((1, 8), lambda i: (0, 0),
                              memory_space=pltpu.SMEM),
                 pl.BlockSpec((3, 8), lambda i: (0, 0),
                              memory_space=pltpu.SMEM),
                 pl.BlockSpec((1, 8), lambda i: (0, 0),
                              memory_space=pltpu.SMEM),
                 pl.BlockSpec((1, 8), lambda i: (0, 0),
                              memory_space=pltpu.SMEM)]
        vmem_in = [pl.BlockSpec((2, 128), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)] * 3
        extra_args = [jnp.zeros((1, 21), jnp.float32),
                      jnp.zeros((1, 8), jnp.float32),
                      jnp.zeros((3, 8), jnp.float32),
                      jnp.zeros((1, 8), jnp.float32),
                      jnp.zeros((1, 8), jnp.float32),
                      jnp.zeros((2, 128), jnp.float32),
                      jnp.zeros((2, 128), jnp.float32),
                      jnp.zeros((2, 128), jnp.float32)]

    @jax.jit
    def go(seed):
        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=smem + vmem_in,
            out_specs=pl.BlockSpec((SUB, lanes), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((SUB, lanes), jnp.float32),
        )(jnp.asarray(seed, jnp.int32).reshape(1, 1), *extra_args)

    return go


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", type=int, default=24)
    ap.add_argument("--bars", type=int, default=40)
    ap.add_argument("--lanes", type=int, default=256)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--variants", nargs="+", default=None)
    args = ap.parse_args()
    N = 1 << args.paths
    n_blocks = N // (SUB * args.lanes)

    from qmmx_monolithic_monte_carlo_tpu.config import EngineParams
    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_engine import \
        mc_paths_pallas_engine
    from qmmx_monolithic_monte_carlo_tpu.types import Levels

    levels = Levels.from_rows(
        [{"color": "blue", "type": "solid", "index": 0, "price": 99.88},
         {"color": "teal", "type": "solid", "index": 0, "price": 100.0}],
        max_levels=2)
    params = EngineParams.default()

    def gen_run(seed):
        s, _, _ = mc_paths_pallas_engine(
            seed, levels, params, num_paths=N, num_bars=args.bars,
            sigma=0.3, dt=1.0 / (390.0 * 252.0), lanes=args.lanes,
            gen_only=True)
        return s.sum_r

    mk = functools.partial(_make_toy, n_blocks=n_blocks, lanes=args.lanes,
                           num_bars=args.bars)
    variants = {
        "base": mk(),
        "tie": mk(live_tie=True),
        "carry67": mk(live_tie=True, n_carry=67),
        "rings": mk(live_tie=True, n_carry=67, n_rings=2),
        "inputs9": mk(live_tie=True, n_carry=67, n_rings=2, inputs9=True),
        "gen": lambda seed: gen_run(seed),
    }
    if args.variants:
        variants = {k: variants[k] for k in args.variants}

    print(f"# gen-gap bisect: 2^{args.paths} x {args.bars} bars, "
          f"lanes={args.lanes} (device={jax.devices()[0].device_kind})",
          file=sys.stderr)
    for name, fn in variants.items():     # compile pass
        float(jnp.sum(fn(0)))
    times = {k: [] for k in variants}
    for r in range(args.rounds):          # interleaved timing
        for name, fn in variants.items():
            t0 = time.perf_counter()
            float(jnp.sum(fn(r + 1)))
            times[name].append(time.perf_counter() - t0)
    base = np.median(times[next(iter(variants))])
    for name in variants:
        med = float(np.median(times[name]))
        print(f"{name:9s}: {N / med / 1e6:7.1f}M paths/s "
              f"({med * 1e3:5.0f} ms, {med / base:4.2f}x base)")


if __name__ == "__main__":
    main()
