"""D-grid -> A-grid lat-lon wind diagnostics (fv_grid_utils_nlm.F90:2313-2500).

c2l_ord4: 4-pt Lagrange interpolation of the D winds to cell centers with
flux-weighted 2-pt averaging in the 2-cell edge bands, then rotation to
east/north components via the a11..a22 matrix.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import NG
from .sw_core import F2P, SL
from ..parallel import halo

A1 = 0.5625
A2 = -0.0625
C1 = 1.125
C2 = -0.125


def c2l_ord4(u, v, grid, topo, npx, do_halo=True):
    """Returns (ua, va) on the compute domain (zeros in halo)."""
    n = npx - 1
    npy = npx
    p = F2P
    dx = grid["dx"]
    dy = grid["dy"]

    if do_halo:
        u, v = halo.fill_halo_dgrid(u, v, topo)

    utmp = jnp.zeros(u.shape[:-2] + (u.shape[-1], u.shape[-1]), u.dtype)
    vtmp = jnp.zeros_like(utmp)
    # interior cells 2..n-1 (Fortran 2..npx-2)
    ci = SL(2, npx - 2)
    utmp = utmp.at[..., ci, ci].set(
        C2 * (u[..., p(1):p(npy - 3) + 1, ci] + u[..., p(4):p(npy) + 1, ci])
        + C1 * (u[..., p(2):p(npy - 2) + 1, ci] + u[..., p(3):p(npy - 1) + 1, ci])
    )
    vtmp = vtmp.at[..., ci, ci].set(
        C2 * (v[..., ci, p(1):p(npx - 3) + 1] + v[..., ci, p(4):p(npx) + 1])
        + C1 * (v[..., ci, p(2):p(npx - 2) + 1] + v[..., ci, p(3):p(npx - 1) + 1])
    )

    cs = SL(1, n)
    # south row j=1
    wv0 = v[..., p(1), p(1):p(n) + 1] * dy[..., p(1), p(1):p(n) + 1]
    wv1 = v[..., p(1), p(2):p(npx) + 1] * dy[..., p(1), p(2):p(npx) + 1]
    vtmp = vtmp.at[..., p(1), cs].set(
        2.0 * (wv0 + wv1)
        / (dy[..., p(1), p(1):p(n) + 1] + dy[..., p(1), p(2):p(npx) + 1])
    )
    utmp = utmp.at[..., p(1), cs].set(
        2.0
        * (
            u[..., p(1), cs] * dx[..., p(1), cs]
            + u[..., p(2), cs] * dx[..., p(2), cs]
        )
        / (dx[..., p(1), cs] + dx[..., p(2), cs])
    )
    # north row j=npy-1
    jn = p(npy - 1)
    wv0 = v[..., jn, p(1):p(n) + 1] * dy[..., jn, p(1):p(n) + 1]
    wv1 = v[..., jn, p(2):p(npx) + 1] * dy[..., jn, p(2):p(npx) + 1]
    vtmp = vtmp.at[..., jn, cs].set(
        2.0 * (wv0 + wv1)
        / (dy[..., jn, p(1):p(n) + 1] + dy[..., jn, p(2):p(npx) + 1])
    )
    utmp = utmp.at[..., jn, cs].set(
        2.0
        * (
            u[..., p(npy - 1), cs] * dx[..., p(npy - 1), cs]
            + u[..., p(npy), cs] * dx[..., p(npy), cs]
        )
        / (dx[..., p(npy - 1), cs] + dx[..., p(npy), cs])
    )
    # west col i=1
    iw = p(1)
    wu0 = u[..., p(1):p(n) + 1, iw] * dx[..., p(1):p(n) + 1, iw]
    wu1 = u[..., p(2):p(npy) + 1, iw] * dx[..., p(2):p(npy) + 1, iw]
    utmp = utmp.at[..., cs, iw].set(
        2.0 * (wu0 + wu1)
        / (dx[..., p(1):p(n) + 1, iw] + dx[..., p(2):p(npy) + 1, iw])
    )
    vtmp = vtmp.at[..., cs, iw].set(
        2.0
        * (
            v[..., cs, p(1)] * dy[..., cs, p(1)]
            + v[..., cs, p(2)] * dy[..., cs, p(2)]
        )
        / (dy[..., cs, p(1)] + dy[..., cs, p(2)])
    )
    # east col i=npx-1
    ie = p(npx - 1)
    wu0 = u[..., p(1):p(n) + 1, ie] * dx[..., p(1):p(n) + 1, ie]
    wu1 = u[..., p(2):p(npy) + 1, ie] * dx[..., p(2):p(npy) + 1, ie]
    utmp = utmp.at[..., cs, ie].set(
        2.0 * (wu0 + wu1)
        / (dx[..., p(1):p(n) + 1, ie] + dx[..., p(2):p(npy) + 1, ie])
    )
    vtmp = vtmp.at[..., cs, ie].set(
        2.0
        * (
            v[..., cs, p(npx - 1)] * dy[..., cs, p(npx - 1)]
            + v[..., cs, p(npx)] * dy[..., cs, p(npx)]
        )
        / (dy[..., cs, p(npx - 1)] + dy[..., cs, p(npx)])
    )

    ua = grid["a11"] * utmp + grid["a12"] * vtmp
    va = grid["a21"] * utmp + grid["a22"] * vtmp
    z = jnp.zeros_like(ua)
    mask = jnp.zeros(ua.shape[-2:], bool).at[cs, cs].set(True)
    return jnp.where(mask, ua, z), jnp.where(mask, va, z)
