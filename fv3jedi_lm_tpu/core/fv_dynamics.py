"""fv_dynamics: the k_split / remap level driver (fv_dynamics_nlm.F90:70-760).

Hydrostatic path.  One call advances the FV3 state one model time step bdt:

  T -> theta_v  ->  [ dyn_core -> tracer_2d -> Lagrangian_to_Eulerian ] x k_split
  -> T, plus A-grid lat-lon wind diagnostics (cubed_to_latlon).

State layout: dict of (npz, 6, jy, jx) padded arrays (staggered dims per
field), tracers as a list.  All control flow is static (jit-compatible).
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import NG
from ..constants import CP as CP_AIR, KAPPA, ZVIR
from ..ops import fv_mapz
from ..ops.c2l import c2l_ord4
from ..ops.sw_core import F2P, SL
from ..parallel import halo
from .dyn_core import dyn_core, del2_cubed
from .tracer2d import tracer_2d


def lagrangian_to_eulerian(state, vert, q, grid, topo, cfg, ak, bk,
                           akap, ptop, last_step, consv_te=0.0):
    """Vertical remap back to the Eulerian hybrid coordinate
    (fv_mapz_nlm.F90:60-960, remap_option=0 'remap T in logP', hydrostatic).

    vert: dict(pk, pe, peln, pkz) from the final geopk of dyn_core, full
    padded domain.  Returns (state, q, new vert).
    """
    pe, peln, pk, pkz = vert["pe"], vert["peln"], vert["pk"], vert["pkz"]
    pt, delp = state["pt"], state["delp"]
    u, v = state["u"], state["v"]
    npz = delp.shape[0]
    kord_tm = abs(cfg.kord_tm)
    kord_tr = cfg.kord_tr
    kord_mt = cfg.kord_mt

    # theta_v -> virtual temperature (fv_mapz_nlm.F90:206-214)
    pt = pt * pkz

    ps = pe[-1]
    akx = ak.reshape((npz + 1,) + (1,) * (pe.ndim - 1))
    bkx = bk.reshape((npz + 1,) + (1,) * (pe.ndim - 1))
    pe2 = akx + bkx * ps[None]
    pn2 = jnp.log(pe2)
    pk2 = jnp.exp(akap * pn2)
    delp_new = pe2[1:] - pe2[:-1]

    # remap virtual T in log(p) (map_scalar, iv=1)
    pt = fv_mapz.map1_ppm(peln, pt, None, pn2, 1, kord_tm,
                          q_min=fv_mapz.T_MIN)

    # tracers in p (map1_q2 / mapn_tracer, iv=0) — one batched trace for all
    import jax
    qs = jax.vmap(
        lambda qq: fv_mapz.map1_ppm(pe, qq, None, pe2, 0, kord_tr)
    )(jnp.stack(q, axis=0))
    q = [qs[i] for i in range(qs.shape[0])]

    # u on B rows: pe averaged between adjacent cell rows (:547-570)
    jc = delp.shape[-1]
    pe_u = 0.5 * (pe[..., 0:jc - 1, :] + pe[..., 1:jc, :])
    ps_u = pe_u[-1]
    pe3_u = akx + 0.5 * bkx * (ps[None][..., 0:jc - 1, :] + ps[None][..., 1:jc, :])
    u_mid = fv_mapz.map1_ppm(pe_u, u[..., 1:jc, :], None, pe3_u, -1, kord_mt)
    u = u.at[..., 1:jc, :].set(u_mid)

    pe_v = 0.5 * (pe[..., :, 0:jc - 1] + pe[..., :, 1:jc])
    pe3_v = akx + 0.5 * bkx * (ps[None][..., :, 0:jc - 1] + ps[None][..., :, 1:jc])
    v_mid = fv_mapz.map1_ppm(pe_v, v[..., :, 1:jc], None, pe3_v, -1, kord_mt)
    v = v.at[..., :, 1:jc].set(v_mid)

    pkz_new = (pk2[1:] - pk2[:-1]) / (akap * (pn2[1:] - pn2[:-1]))

    if last_step:
        # virtual T -> T (consv_te=0 => dtmp=0), fv_mapz_nlm.F90:857-892
        sphum = q[0]
        pt = pt / (1.0 + ZVIR * sphum)
    else:
        # back to theta_v
        pt = pt / pkz_new

    state = dict(state, pt=pt, delp=delp_new, u=u, v=v, ps=ps)
    vert = dict(pe=pe2, peln=pn2, pk=pk2, pkz=pkz_new)
    return state, q, vert


def fv_dynamics(state, q, grid, topo, cfg, bdt, ak, bk, ptop):
    """One nonlinear model step of bdt seconds (hydrostatic).

    state: u, v, w, pt (TEMPERATURE in/out), delp, phis (+ scratch C winds).
    q: list of tracers, q[0] = specific humidity.
    Returns (state, q) with pt back in temperature and ua/va diagnostics.
    """
    npx = cfg.npx
    n = npx - 1
    akap = KAPPA
    npz = state["delp"].shape[0]
    dtype = state["u"].dtype
    jc = n + 2 * NG
    jb = jc + 1
    lead = (npz, state["delp"].shape[1])

    delp = halo.fill_halo_center(state["delp"], topo)
    pt_in = halo.fill_halo_center(state["pt"], topo)
    sphum = halo.fill_halo_center(q[0], topo)
    q = [sphum] + [halo.fill_halo_center(qq, topo) for qq in q[1:]]

    # entry pressures (= traj_to_fv3's compute_fv3_pressures on this delp)
    from .fv_pressure import compute_fv3_pressures
    pe, peln, pk, pkz = compute_fv3_pressures(delp, akap, ptop)

    # T -> theta_v (fv_dynamics_nlm.F90:397-430)
    pt = pt_in * (1.0 + ZVIR * sphum) / pkz

    state = dict(
        state, delp=delp, pt=pt,
        uc=jnp.zeros(lead + (jc, jb), dtype),
        vc=jnp.zeros(lead + (jb, jc), dtype),
        divgd=jnp.zeros(lead + (jb, jb), dtype),
    )

    mdt = bdt / cfg.k_split

    def remap_step(state, q, last_step):
        """One k_split sub-step: acoustic core + tracer advection + remap."""
        state = dict(
            state,
            # empty flux capacitors (dyn_core_nlm.F90:260-266)
            mfx=jnp.zeros(lead + (n, n + 1), dtype),
            mfy=jnp.zeros(lead + (n + 1, n), dtype),
            cx=jnp.zeros(lead + (jc, n + 1), dtype),
            cy=jnp.zeros(lead + (n + 1, jc), dtype),
            delp=halo.fill_halo_center(state["delp"], topo),
            pt=halo.fill_halo_center(state["pt"], topo),
        )
        dp1 = state["delp"]
        state, vert = dyn_core(
            state, q, grid, topo, cfg, mdt, akap, ptop, False
        )

        if len(q) > 0 and not cfg.inline_q:
            q = tracer_2d(
                q, dp1, state["mfx"], state["mfy"], state["cx"], state["cy"],
                grid, topo, cfg, npx, cfg.hord_tr,
                nord_tr=cfg.nord_tr, trdm=cfg.trdm2,
            )

        if npz > 4:
            state, q, vert = lagrangian_to_eulerian(
                state, vert, q, grid, topo, cfg, ak, bk, akap, ptop, last_step
            )
        return state, q

    # checkpoint at the k_split (remap) boundary: the reference's
    # cp_mod_ini/mid trajectory bracketing (fv3jedi_lm_dynamics_mod.F90:498-610)
    import jax
    mid = jax.checkpoint(
        lambda s, qq: remap_step(s, qq, False), prevent_cse=False
    )
    for n_map in range(cfg.k_split - 1):
        state, q = mid(state, q)
    state, q = remap_step(state, q, True)

    # A-grid lat-lon diagnostics (fv_dynamics_nlm.F90:738-742)
    ua, va = c2l_ord4(state["u"], state["v"], grid, topo, npx, do_halo=True)
    state = dict(state, ua=ua, va=va)
    return state, q
