"""Global reductions: reproducible g_sum (fv_grid_utils_nlm.F90:2873-2924).

The reference's `g_sum` is an area-weighted global sum with an optional
bitwise-reproducible path (FMS `mpp_global_sum(..., BITWISE_EFP_SUM)`:
extended-fixed-point accumulation whose result is independent of the MPI
layout).  The TPU-native equivalent: a compensated (Neumaier) summation in
a FIXED traversal order via `lax.scan` over vector chunks — the result is
independent of how XLA partitions the arrays, because the compensated
accumulation recovers the rounding error of every partial sum (exact to
the last ulp of the true sum for these magnitudes).  The fast path is a
plain jnp.sum (deterministic per compilation, like the reference's
non-reproducible quick sum)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

#: below which no energy correction applies (fv_mapz_nlm.F90:39)
CONSV_MIN = 0.001


def _neumaier_sum(x):
    """Compensated fixed-order sum of a 1-D array."""
    pad = (-x.size) % 128
    xp = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)]).reshape(-1, 128)

    def chunk(carry, row):
        s, c = carry
        # sequential compensated accumulation over the 128 lanes
        def lane(sc, v):
            s, c = sc
            t = s + v
            # Neumaier branch: pick the larger-magnitude operand's error
            err = jnp.where(jnp.abs(s) >= jnp.abs(v),
                            (s - t) + v, (v - t) + s)
            return (t, c + err), None

        (s, c), _ = lax.scan(lane, (s, c), row)
        return (s, c), None

    (s, c), _ = lax.scan(chunk, (jnp.zeros((), x.dtype),
                                 jnp.zeros((), x.dtype)), xp)
    return s + c


def g_sum(p, area, mode: int = 0, reproduce: bool = True):
    """Area-weighted global sum of a compute-domain field.

    p, area: same-shape arrays (e.g. (6, ny, nx)).  mode==1 divides by the
    global area (g_sum, fv_grid_utils_nlm.F90:2917-2921).  reproduce=True
    uses the layout-independent compensated sum."""
    x = (p * area).reshape(-1)
    if reproduce:
        s = _neumaier_sum(x)
        ga = _neumaier_sum(area.reshape(-1)) if mode == 1 else 1.0
    else:
        s = jnp.sum(x)
        ga = jnp.sum(area) if mode == 1 else 1.0
    return s / ga if mode == 1 else s
