"""Handcrafted rule confidence + soft volume veto, as pure batched ops.

* ``compute_confidence`` — reference MonolithicEngine.compute_confidence
  (qmmx_monolithic.py:1415-1427).
* ``soft_veto`` — reference ``_soft_veto`` (:1773-1794).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..reasons import Reason
from ..types import DIR_UNKNOWN, KIND_SOLID, SIDE_LONG


def compute_confidence(
    *,
    level_price,
    level_kind,          # KIND_SOLID / KIND_DASHED
    price,
    direction,           # DIR_UP / DIR_DOWN / DIR_UNKNOWN
    touch_count,
    contact_prox,
) -> jnp.ndarray:
    """conf = clamp01( max(0, 1 - dist/max(1e-4, PROX))
                       + (0.08 solid | 0.02 dashed)
                       + (0.10 if touches<=1 | -0.08 if ==2 | -0.16 if >=3)
                       + 0.03 if direction known )   (:1415-1427)
    """
    dist = jnp.abs(jnp.asarray(price, jnp.float32) - jnp.asarray(level_price, jnp.float32))
    prox = jnp.maximum(jnp.float32(1e-4), jnp.asarray(contact_prox, jnp.float32))
    base = jnp.maximum(0.0, 1.0 - dist / prox)
    base = base + jnp.where(jnp.asarray(level_kind) == KIND_SOLID, 0.08, 0.02)
    tc = jnp.asarray(touch_count)
    touch_adj = jnp.where(tc <= 1, 0.10, jnp.where(tc == 2, -0.08, -0.16))
    base = base + touch_adj
    base = base + jnp.where(jnp.asarray(direction) != DIR_UNKNOWN, 0.03, 0.0)
    return jnp.clip(base, 0.0, 1.0)


def soft_veto(
    *,
    side,                 # SIDE_LONG / SIDE_SHORT
    volume_slope,
    approach_from_below,  # bool (direction == up)
    confluence,           # bool
    proximity_abs,
    contact_prox,
    veto_vol_strong,
    veto_prox,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Reference ``_soft_veto`` (:1773-1794).

    Returns (allowed: bool, reason: int32) where reason is CONTRA_VOL_LONG /
    CONTRA_VOL_SHORT when vetoed, OK otherwise.  Weak evidence
    (|slope| < 0.05 and no confluence) never vetoes.  ``near`` uses
    max(VETO_PROX, slight_pierce_window) with slight_pierce_window =
    CONTACT_PROX * 0.12 (:1691).
    """
    slope = jnp.asarray(volume_slope, jnp.float32)
    weak = jnp.logical_and(jnp.abs(slope) < 0.05, jnp.logical_not(jnp.asarray(confluence)))
    strong = jnp.asarray(veto_vol_strong, jnp.float32)
    slight_pierce = jnp.asarray(contact_prox, jnp.float32) * 0.12
    near = jnp.asarray(proximity_abs, jnp.float32) <= jnp.maximum(
        jnp.asarray(veto_prox, jnp.float32), slight_pierce
    )
    is_long = jnp.asarray(side) == SIDE_LONG
    from_below = jnp.asarray(approach_from_below)

    # from_below (up toward resistance): long vetoed on strongly *falling* volume,
    # short vetoed on strongly *rising* volume.  from_above: mirrored.
    contra_long = jnp.where(from_below, slope < -strong, slope > strong)
    contra_short = jnp.where(from_below, slope > strong, slope < -strong)

    veto_long = jnp.logical_and(jnp.logical_and(near, is_long), contra_long)
    veto_short = jnp.logical_and(jnp.logical_and(near, jnp.logical_not(is_long)), contra_short)
    vetoed = jnp.logical_and(jnp.logical_not(weak), jnp.logical_or(veto_long, veto_short))
    reason = jnp.where(
        vetoed,
        jnp.where(veto_long, Reason.CONTRA_VOL_LONG, Reason.CONTRA_VOL_SHORT),
        Reason.OK,
    ).astype(jnp.int32)
    return jnp.logical_not(vetoed), reason
