"""Large-time-step tracer transport (fv_tracer2d_nlm.F90:275-516).

Uses the dyn_core-accumulated courant numbers (cx, cy) and mass fluxes
(mfx, mfy).  The reference computes a data-dependent sub-cycling count
`nsplt` from the global CFL when q_split == 0; a jit-compatible (and
linearization-consistent) model requires a STATIC split, so q_split >= 1 is
required here — the same choice the reference's TLM/ADM effectively make by
fixing nsplt along the trajectory.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import NG
from ..core.freeze import fbool
from ..core import freeze
from ..ops.sw_core import F2P, SL
from ..ops.transport import fv_tp_2d
from ..parallel import halo


def tracer_2d(q, dp1, mfx, mfy, cx, cy, grid, topo, cfg, npx, hord_tr,
              nord_tr=0, trdm=0.0):
    """Advect tracers q (list of (npz,6,jc,jc) arrays) over one mdt.

    dp1: delp BEFORE dyn_core; mfx/mfy/cx/cy: accumulated fluxes/courant.
    Returns the updated tracer list.
    """
    n = npx - 1
    npy = npx
    p = F2P
    nsplt = max(1, cfg.q_split)
    sin_sg = grid["sin_sg"]
    dxa, dya = grid["dxa"], grid["dya"]
    dx, dy = grid["dx"], grid["dy"]
    area, rarea = grid["area"], grid["rarea"]

    # area fluxes from the accumulated courant numbers (:355-375)
    selx = fbool(cx > 0.0)
    xfx = cx * dy[..., :, SL(1, npx)] * jnp.where(
        selx,
        dxa[..., :, p(0):p(n) + 1] * sin_sg[2][..., :, p(0):p(n) + 1],
        dxa[..., :, p(1):p(npx) + 1] * sin_sg[0][..., :, p(1):p(npx) + 1],
    )
    sely = fbool(cy > 0.0)
    yfx = cy * dx[..., SL(1, npy), :] * jnp.where(
        sely,
        dya[..., p(0):p(n) + 1, :] * sin_sg[3][..., p(0):p(n) + 1, :],
        dya[..., p(1):p(npy) + 1, :] * sin_sg[1][..., p(1):p(npy) + 1, :],
    )

    frac = 1.0 / nsplt
    if nsplt != 1:
        cx, xfx, mfx = cx * frac, xfx * frac, mfx * frac
        cy, yfx, mfy = cy * frac, yfx * frac, mfy * frac

    cs = SL(1, n)
    # All tracers share the transport operator, so stack them on a leading
    # axis and trace fv_tp_2d ONCE (vmap) instead of once per tracer — a
    # ~len(q)x reduction in graph size (and the reference's OpenMP-over-
    # tracers parallelism becomes one batched XLA op).
    import jax

    qs = jnp.stack(q, axis=0)
    for it in range(nsplt):
        dp2 = dp1.at[..., cs, cs].add(
            ((mfx[..., :, :-1] - mfx[..., :, 1:])
             + (mfy[..., :-1, :] - mfy[..., 1:, :])) * rarea[..., cs, cs]
        )
        ra_x = area[..., :, cs] + (xfx[..., :, :-1] - xfx[..., :, 1:])
        ra_y = area[..., cs, :] + (yfx[..., :-1, :] - yfx[..., 1:, :])
        qs = halo.fill_halo_center(qs, topo)
        if it == 0 and trdm > 1.0e-4:
            tp = lambda qq: fv_tp_2d(
                qq, cx, cy, hord_tr, xfx, yfx, grid, topo, ra_x, ra_y,
                mfx=mfx, mfy=mfy, mass=dp1, nord=nord_tr, damp_c=trdm,
            )
        else:
            tp = lambda qq: fv_tp_2d(
                qq, cx, cy, hord_tr, xfx, yfx, grid, topo, ra_x, ra_y,
                mfx=mfx, mfy=mfy,
            )
        if freeze.active():
            # under the frozen-branch tape the per-tracer limiter masks must
            # be recorded in deterministic trace order, so loop instead of
            # vmap (the batched masks cannot cross the vmap boundary)
            fxl, fyl = zip(*[tp(qs[i]) for i in range(qs.shape[0])])
            fx = jnp.stack(fxl, axis=0)
            fy = jnp.stack(fyl, axis=0)
        else:
            fx, fy = jax.vmap(tp)(qs)
        qs = qs.at[..., cs, cs].set(
            (
                qs[..., cs, cs] * dp1[..., cs, cs]
                + ((fx[..., :, :-1] - fx[..., :, 1:])
                   + (fy[..., :-1, :] - fy[..., 1:, :])) * rarea[..., cs, cs]
            )
            / dp2[..., cs, cs]
        )
        dp1 = dp2
    return [qs[i] for i in range(qs.shape[0])]
