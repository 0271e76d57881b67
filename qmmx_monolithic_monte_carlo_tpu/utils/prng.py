"""Threefry key-splitting conventions.

The reference uses one mutable ``random.Random(seed)`` consumed sequentially across
trials and candidates (qmmx_monolithic.py:3489-3498) — inherently serial.  The
rebuild assigns every (trial, candidate) its own counter-derived key via
``jax.random.fold_in``, so draws are order-independent, bitwise reproducible for a
given seed, and embarrassingly parallel across vmapped/sharded axes
(SURVEY.md §7 hard-parts: "thread per-step keys through the scan carry").

Stream tags keep logically distinct consumers (level jitter vs entry slip vs tie
coin) on disjoint subkeys even when shapes coincide.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Stream tags (arbitrary but fixed small ints).
STREAM_LEVEL_JITTER = 0
STREAM_ENTRY_SLIP = 1
STREAM_STOP_SLIP = 2
STREAM_TARGET_SLIP = 3
STREAM_TIE_COIN = 4
STREAM_PATH = 5
STREAM_BOOTSTRAP = 6
STREAM_BRIDGE_HI = 7
STREAM_BRIDGE_LO = 8
STREAM_VOLUME = 9
STREAM_MARKET = 10   # shared market factor of the correlated universe model


def key_for(base_key: jax.Array, *indices) -> jax.Array:
    """Derive a subkey by folding in a sequence of integer indices."""
    k = base_key
    for ix in indices:
        k = jax.random.fold_in(k, jnp.asarray(ix, jnp.uint32))
    return k


def trial_candidate_key(base_key: jax.Array, trial, candidate, stream) -> jax.Array:
    return key_for(base_key, stream, trial, candidate)
