"""Pregen study: can the engine loop's bar GENERATION go throughput-bound?

The round-4 roofline (`engine_kernel_bench.py --stage-split`) put the full
engine kernel at 53% generation / 47% state machine, and diagnosed the
generation stage as LATENCY-bound: each bar's Box-Muller/bridge/volume
transcendentals are only (8, lanes) = 2048 elements wide and sit on the
serial log-price chain, while the stateless first-contact kernel evaluates
the same op mix at 13.4G bar-steps/s on (40, 8192) blocks.

Observation: with ``prev_c`` carried (it already is), EVERY transcendental
in the generation stage is chain-independent —

    incr    = drift + sig*z                      (z from Box-Muller)
    c       = prev_c * exp(incr)
    h       = prev_c * exp(0.5*incr + off_h),  off_h = sqrt(...ln u3)
    low     = prev_c * exp(0.5*incr - off_l)
    vnoise  = exp(vm_sigma*zv - 0.5*vm_sigma^2)

so a wide PROLOGUE can draw all uniforms (same PRNG order), evaluate all
exp/log/sqrt/cos/sin over (W/2 * 8, lanes) channel slabs in one pipelined
pass each, and leave the streaming loop three multiplies per bar.

This study measures three toy kernels producing identical bar streams
(consumed by a trivial accumulator so generation stays live):

  A. streaming   — today's engine layout: draw + transcendentals in-loop,
                   exp(log_s + incr) chained (the gen_only baseline).
  B. pregen      — uniform draws in-loop order into channel scratch,
                   ONE vectorized transcendental pass per channel, then a
                   multiply-only chain loop.
  C. pregen+skip — B but also the tie/noise uniforms drawn wide (upper
                   bound when every draw joins the prologue).

Run:  python benchmarks/pregen_study.py [--paths 24] [--bars 40]
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


def _consume(c, h, low, v, acc):
    # cheap consumer keeping every channel live (mimics "bars feed gates")
    return acc + (c - h) + (low - c) * 0.5 + v * 1e-12


def _streaming_kernel(seed_ref, o_ref, *, num_bars, lanes, sig, drift,
                      log_s0, vm_sigma, full_vm: bool = False):
    """``full_vm`` adds the real engine loop's complete VolumeModel mirror
    (U-shape minute curve + |z| coupling + floor) so the op mix matches
    `_one_bar`'s generation stage exactly."""
    s, b = SUB, lanes
    pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    sig2dt = jnp.float32(sig * sig)
    mean_abs = jnp.float32(np.sqrt(2.0 / np.pi))
    sd_abs = jnp.float32(np.sqrt(1.0 - 2.0 / np.pi))

    def body(t2, st):
        log_s, prev_c, acc = st
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
            _tie = _uniform((s, b))
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
            vnoise = jnp.exp(jnp.float32(vm_sigma) * zv
                             - 0.5 * jnp.float32(vm_sigma) ** 2)
            if full_vm:
                t_f = t_i.astype(jnp.float32)
                m_min = jnp.mod(jnp.float32(570.0) + t_f, jnp.float32(390.0))
                x_u = 2.0 * m_min / jnp.float32(389.0) - 1.0
                ushape = 1.0 + jnp.float32(1.2) * (x_u * x_u
                                                   - jnp.float32(1.0 / 3.0))
                v = jnp.float32(1e6) * ushape * vnoise
                v = v * (1.0 + jnp.float32(0.5) * ((jnp.abs(z) - mean_abs)
                                                   / sd_abs))
                v = jnp.maximum(v, jnp.float32(0.05 * 1e6))
            else:
                v = vnoise
            acc = _consume(c, h, low, v, acc)
            log_s = log_close
            prev_c = c
        return log_s, prev_c, acc

    zero = jnp.zeros((s, b), jnp.float32)
    log_s = zero + jnp.float32(log_s0)
    st = (log_s, jnp.exp(log_s), zero)
    st = jax.lax.fori_loop(0, num_bars // 2, body, st)
    o_ref[...] = st[2]


def _carry_kernel(seed_ref, o_ref, *, num_bars, lanes, sig, drift,
                  log_s0, vm_sigma, n_dummy, touch_every: int = 0):
    """Streaming toy + ``n_dummy`` extra carried (8, lanes) state tiles.
    ``touch_every``: every k-th dummy tile gets a cheap data-dependent
    update per bar (like real counters); 0 = carried untouched.  Measures
    what the engine's ~145-tile carry costs, independent of its ops."""
    s, b = SUB, lanes
    pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    sig2dt = jnp.float32(sig * sig)

    def body(t2, st):
        log_s, prev_c, acc = st[0], st[1], st[2]
        dummy = list(st[3:])
        u1, u2 = _uniform((s, b)), _uniform((s, b))
        rad = jnp.sqrt(-2.0 * jnp.log(u1))
        ang = _TWO_PI * u2
        z_pair = (rad * jnp.cos(ang), rad * jnp.sin(ang))
        uv1, uv2 = _uniform((s, b)), _uniform((s, b))
        vrad = jnp.sqrt(-2.0 * jnp.log(uv1))
        vang = _TWO_PI * uv2
        zv_pair = (vrad * jnp.cos(vang), vrad * jnp.sin(vang))
        for half in range(2):
            u3, u4 = _uniform((s, b)), _uniform((s, b))
            _tie = _uniform((s, b))
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
            v = jnp.exp(jnp.float32(vm_sigma) * zv
                        - 0.5 * jnp.float32(vm_sigma) ** 2)
            acc = _consume(c, h, low, v, acc)
            if touch_every:
                for j in range(0, len(dummy), touch_every):
                    dummy[j] = dummy[j] + jnp.where(c > h, 1.0, 0.0)
            log_s = log_close
            prev_c = c
        return (log_s, prev_c, acc) + tuple(dummy)

    zero = jnp.zeros((s, b), jnp.float32)
    log_s = zero + jnp.float32(log_s0)
    st = (log_s, jnp.exp(log_s), zero) + tuple(
        zero + jnp.float32(j) for j in range(n_dummy))
    st = jax.lax.fori_loop(0, num_bars // 2, body, st)
    out = st[2]
    for j in range(3, len(st)):     # keep every dummy live
        out = out + st[j] * jnp.float32(1e-20)
    o_ref[...] = out


def _pregen_kernel(seed_ref, o_ref, ec_scr, eh_scr, el_scr, ev_scr, u_scr,
                   *, num_bars, lanes, sig, drift, log_s0, vm_sigma,
                   wide_rest):
    """Draw uniforms in the SAME order, stage them into channel scratch,
    one vectorized transcendental pass per channel, multiply-only loop."""
    s, b = SUB, lanes
    w2 = num_bars // 2
    pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    sig2dt = jnp.float32(sig * sig)

    # ---- phase 1: stage raw uniforms (same call order as streaming) ----
    def stage(t2, _):
        for k in range(2):          # price pair
            u_scr[pl.ds((0 * 2 + k) * w2 * s + t2 * s, s)] = _uniform((s, b))
        for k in range(2):          # volume pair
            u_scr[pl.ds((1 * 2 + k) * w2 * s + t2 * s, s)] = _uniform((s, b))
        for half in range(2):       # u3, u4, tie per half
            u_scr[pl.ds((4 + half) * w2 * s + t2 * s, s)] = _uniform((s, b))
            u_scr[pl.ds((6 + half) * w2 * s + t2 * s, s)] = _uniform((s, b))
            u_scr[pl.ds((8 + half) * w2 * s + t2 * s, s)] = _uniform((s, b))
        return 0

    jax.lax.fori_loop(0, w2, stage, 0)

    # ---- phase 2: wide transcendental passes over (w2*s, b) slabs ----
    rows = w2 * s
    u1 = u_scr[pl.ds(0 * rows, rows)]
    u2 = u_scr[pl.ds(1 * rows, rows)]
    rad = jnp.sqrt(-2.0 * jnp.log(u1))
    ang = _TWO_PI * u2
    z0 = rad * jnp.cos(ang)
    z1 = rad * jnp.sin(ang)
    uv1 = u_scr[pl.ds(2 * rows, rows)]
    uv2 = u_scr[pl.ds(3 * rows, rows)]
    vrad = jnp.sqrt(-2.0 * jnp.log(uv1))
    vang = _TWO_PI * uv2
    zv0 = vrad * jnp.cos(vang)
    zv1 = vrad * jnp.sin(vang)
    for half, (z, zv) in enumerate(((z0, zv0), (z1, zv1))):
        incr = jnp.float32(drift) + jnp.float32(sig) * z
        u3 = u_scr[pl.ds((4 + half) * rows, rows)]
        u4 = u_scr[pl.ds((6 + half) * rows, rows)]
        off_h = jnp.sqrt(incr * incr - 2.0 * sig2dt * jnp.log(u3))
        off_l = jnp.sqrt(incr * incr - 2.0 * sig2dt * jnp.log(u4))
        ec_scr[pl.ds(half * rows, rows)] = jnp.exp(incr)
        eh_scr[pl.ds(half * rows, rows)] = jnp.exp(0.5 * incr + 0.5 * off_h)
        el_scr[pl.ds(half * rows, rows)] = jnp.exp(0.5 * incr - 0.5 * off_l)
        ev_scr[pl.ds(half * rows, rows)] = jnp.exp(
            jnp.float32(vm_sigma) * zv - 0.5 * jnp.float32(vm_sigma) ** 2)
    if wide_rest:
        # pretend the tie uniforms also get a wide pass (they are already
        # uniforms — nothing to do; this arm just measures scratch traffic)
        pass

    # ---- phase 3: multiply-only chain loop ----
    def body(t2, st):
        prev_c, acc = st
        for half in range(2):
            e_c = ec_scr[pl.ds(half * rows + t2 * s, s)]
            e_h = eh_scr[pl.ds(half * rows + t2 * s, s)]
            e_l = el_scr[pl.ds(half * rows + t2 * s, s)]
            e_v = ev_scr[pl.ds(half * rows + t2 * s, s)]
            c = prev_c * e_c
            h = prev_c * e_h
            low = prev_c * e_l
            acc = _consume(c, h, low, e_v, acc)
            prev_c = c
        return prev_c, acc

    zero = jnp.zeros((s, b), jnp.float32)
    prev_c = jnp.exp(zero + jnp.float32(log_s0))
    st = (prev_c, zero)
    st = jax.lax.fori_loop(0, w2, body, st)
    o_ref[...] = st[1]


def _run(kind, *, n_blocks, num_bars, lanes, reps):
    kw = dict(num_bars=num_bars, lanes=lanes, sig=0.3 * np.sqrt(1e-5),
              drift=-0.5 * 0.09 * 1e-5, log_s0=float(np.log(100.0)),
              vm_sigma=0.35)
    w2 = num_bars // 2
    if kind == "streaming":
        kernel = functools.partial(_streaming_kernel, **kw)
        scratch = []
    elif kind == "streaming_vm":
        kernel = functools.partial(_streaming_kernel, **kw, full_vm=True)
        scratch = []
    elif kind.startswith("carry"):
        # carry<N>[t<k>]: N dummy carried tiles, touch every k-th
        spec = kind[5:]
        if "t" in spec:
            nd, te = spec.split("t")
        else:
            nd, te = spec, "0"
        kernel = functools.partial(_carry_kernel, **kw, n_dummy=int(nd),
                                   touch_every=int(te))
        scratch = []
    else:
        kernel = functools.partial(_pregen_kernel, **kw,
                                   wide_rest=(kind == "pregen_wide"))
        scratch = [
            pltpu.VMEM((2 * w2 * SUB, lanes), jnp.float32),   # e_c
            pltpu.VMEM((2 * w2 * SUB, lanes), jnp.float32),   # e_h
            pltpu.VMEM((2 * w2 * SUB, lanes), jnp.float32),   # e_l
            pltpu.VMEM((2 * w2 * SUB, lanes), jnp.float32),   # e_v
            pltpu.VMEM((10 * w2 * SUB, lanes), jnp.float32),  # raw uniforms
        ]

    @jax.jit
    def go(seed):
        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((SUB, lanes), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((SUB, lanes), jnp.float32),
            scratch_shapes=scratch,
        )(jnp.asarray(seed, jnp.int32).reshape(1, 1))

    float(jnp.sum(go(0)))  # compile
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(go(r + 1)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", type=int, default=24, help="log2 total paths")
    ap.add_argument("--bars", type=int, default=40)
    ap.add_argument("--lanes", type=int, nargs="+", default=[256, 1024])
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--kinds", nargs="+", default=None,
                    help="streaming | pregen | carry<N> | carry<N>t<k>")
    args = ap.parse_args()
    total = 1 << args.paths
    print(f"# pregen study: 2^{args.paths} paths x {args.bars} bars "
          f"(device={jax.devices()[0].device_kind})", file=sys.stderr)
    kinds = args.kinds or ["streaming", "pregen"]
    for lanes in args.lanes:
        n_blocks = total // (SUB * lanes)
        for kind in kinds:
            dt = _run(kind, n_blocks=n_blocks, num_bars=args.bars,
                      lanes=lanes, reps=args.reps)
            rate = total / dt / 1e6
            print(f"lanes={lanes:5d} {kind:12s}: {rate:8.1f}M paths/s "
                  f"({dt * 1e3:.0f} ms)")


if __name__ == "__main__":
    main()
