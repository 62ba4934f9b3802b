"""Acoustic (Lagrangian-dynamics) core: the n_split loop.

Re-derivation of model/dyn_core_nlm.F90 in whole-array JAX form, hydrostatic
path (the LM's production configuration; NH via Riem solvers is layered on
separately).  Vertical axis is LEADING: 3-D fields (npz, 6, jy, jx),
interface fields (npz+1, 6, jy, jx); all horizontal ops broadcast over k.

Time-split structure (dyn_core_nlm.F90:288-1000 per `it`):
  halo(u,v) -> c_sw -> geopk(C) -> p_grad_c -> halo(uc,vc) -> d_sw
  -> halo(delp,pt) -> geopk(D) -> one_grad_p -> [edge fix at it==n_split]
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import NG
from ..constants import CP as CP_AIR
from ..core.freeze import fabs, fbool, fmax, fmin, fscan, fsign_mul
from ..ops.a2b_edge import a2b_ord2, a2b_ord4
from ..ops.d_sw import d_sw
from ..ops.sw_core import F2P, SL, c_sw
from ..parallel import halo


def geopk(ptop, delp, pt, hs, akap):
    """Hydrostatic pressures + geopotential (dyn_core_nlm.F90:1954-2087).

    pt is virtual potential temperature.  Computed on the full padded
    domain (valid wherever delp is valid).  Returns (pe, peln, pk, gz, pkz).
    """
    delp_s = fmax(delp, 1.0e-30)
    pe = jnp.concatenate(
        [jnp.full((1,) + delp.shape[1:], ptop, delp.dtype),
         ptop + jnp.cumsum(delp_s, axis=0)],
        axis=0,
    )
    peln = jnp.log(pe)
    pk = jnp.exp(akap * peln)
    dgz = CP_AIR * pt * (pk[1:] - pk[:-1])
    rev = jnp.cumsum(dgz[::-1], axis=0)[::-1]
    gz = jnp.concatenate([hs[None] + rev, hs[None]], axis=0)
    dpeln = peln[1:] - peln[:-1]
    ok = fbool(dpeln > 0.0)
    pkz = (pk[1:] - pk[:-1]) / (akap * jnp.where(ok, dpeln, 1.0))
    pkz = jnp.where(ok, pkz, 1.0)
    return pe, peln, pk, gz, pkz


def p_grad_c(dt2, pkc, gz, uc, vc, grid, npx, delpc=None):
    """C-grid pressure-gradient update (dyn_core_nlm.F90:1369-1428).

    Hydrostatic: pkc is pe**cappa, wk its layer difference.  Nonhydrostatic
    (delpc given): pkc is the FULL pressure from Riem_Solver_C and
    wk = delpc (:1394-1404); the gradient formula is shared."""
    p = F2P
    n = npx - 1
    npy = npx
    rdxc = grid["rdxc"]
    rdyc = grid["rdyc"]
    wk = delpc if delpc is not None else pkc[1:] - pkc[:-1]

    bs = SL(1, npx)
    cs = SL(1, n)
    cm = slice(p(0), p(n) + 1)   # cells i-1 window for B cols 1..npx
    c0 = slice(p(1), p(npx) + 1)  # cells i window

    # uc(i,j) += dt2*rdxc/(wk(i-1,j)+wk(i,j)) *
    #   ( (gz(i-1,j,k+1)-gz(i,j,k))*(pkc(i,j,k+1)-pkc(i-1,j,k))
    #   + (gz(i-1,j,k)-gz(i,j,k+1))*(pkc(i-1,j,k+1)-pkc(i,j,k)) )
    uc = uc.at[..., cs, bs].add(
        dt2
        * rdxc[..., cs, bs]
        / (wk[..., cs, cm] + wk[..., cs, c0])
        * (
            (gz[1:][..., cs, cm] - gz[:-1][..., cs, c0])
            * (pkc[1:][..., cs, c0] - pkc[:-1][..., cs, cm])
            + (gz[:-1][..., cs, cm] - gz[1:][..., cs, c0])
            * (pkc[1:][..., cs, cm] - pkc[:-1][..., cs, c0])
        )
    )
    rm = slice(p(0), p(n) + 1)
    r0 = slice(p(1), p(npy) + 1)
    vc = vc.at[..., bs, cs].add(
        dt2
        * rdyc[..., bs, cs]
        / (wk[..., rm, cs] + wk[..., r0, cs])
        * (
            (gz[1:][..., rm, cs] - gz[:-1][..., r0, cs])
            * (pkc[1:][..., r0, cs] - pkc[:-1][..., rm, cs])
            + (gz[:-1][..., rm, cs] - gz[1:][..., r0, cs])
            * (pkc[1:][..., rm, cs] - pkc[:-1][..., r0, cs])
        )
    )
    return uc, vc


def one_grad_p(u, v, pk, gz, divg2, dt, grid, npx, ptop, akap, d_ext):
    """D-grid pressure gradient, hydrostatic (dyn_core_nlm.F90:1645-1778)."""
    p = F2P
    n = npx - 1
    npy = npx
    rdx = grid["rdx"]
    rdy = grid["rdy"]
    npz = pk.shape[0] - 1
    jb = u.shape[-2]
    ptk = ptop ** akap

    # B-grid interface fields
    top = jnp.full(pk.shape[1:-2] + (jb, jb), ptk, pk.dtype)[None]
    pk_b = jnp.concatenate([top, a2b_ord4(pk[1:], grid)], axis=0)
    gz_b = a2b_ord4(gz, grid)

    bs = SL(1, npx)
    cs = SL(1, n)
    if d_ext > 0.0:
        wk2 = divg2[..., bs, p(1):p(n) + 1] - divg2[..., bs, p(2):p(npx) + 1]
        wk1 = divg2[..., p(1):p(n) + 1, bs] - divg2[..., p(2):p(npy) + 1, bs]
    else:
        wk2 = 0.0
        wk1 = 0.0

    wk = pk_b[1:] - pk_b[:-1]
    b0 = slice(p(1), p(n) + 1)    # B cols i for u's cells 1..n
    b1 = slice(p(2), p(npx) + 1)  # B cols i+1
    u_new = u.at[..., bs, cs].set(
        rdx[..., bs, cs]
        * (
            wk2
            + u[..., bs, cs]
            + dt
            / (wk[..., bs, b0] + wk[..., bs, b1])
            * (
                (gz_b[1:][..., bs, b0] - gz_b[:-1][..., bs, b1])
                * (pk_b[1:][..., bs, b1] - pk_b[:-1][..., bs, b0])
                + (gz_b[:-1][..., bs, b0] - gz_b[1:][..., bs, b1])
                * (pk_b[1:][..., bs, b0] - pk_b[:-1][..., bs, b1])
            )
        )
    )
    r0 = slice(p(1), p(n) + 1)
    r1 = slice(p(2), p(npy) + 1)
    v_new = v.at[..., cs, bs].set(
        rdy[..., cs, bs]
        * (
            wk1
            + v[..., cs, bs]
            + dt
            / (wk[..., r0, bs] + wk[..., r1, bs])
            * (
                (gz_b[1:][..., r0, bs] - gz_b[:-1][..., r1, bs])
                * (pk_b[1:][..., r1, bs] - pk_b[:-1][..., r0, bs])
                + (gz_b[:-1][..., r0, bs] - gz_b[1:][..., r1, bs])
                * (pk_b[1:][..., r0, bs] - pk_b[:-1][..., r1, bs])
            )
        )
    )
    return u_new, v_new


def grad1_p_update(u, v, pk, gz, divg2, du, dv, dt, grid, npx, ptop, akap,
                   beta_d):
    """Hydrostatic beta>0 off-centered pressure gradient
    (grad1_p_update, dyn_core_nlm.F90:1781-1872): apply beta_d of the
    PREVIOUS substep's gradient (du/dv, zero-initialized each dyn_core
    call; beta_d==0 on the first substep, :367-374) plus (1-beta_d) of the
    current gradient; returns the updated winds AND the stored current
    gradients for the next substep."""
    p = F2P
    n = npx - 1
    npy = npx
    rdx = grid["rdx"]
    rdy = grid["rdy"]
    jb = u.shape[-2]
    ptk = ptop ** akap
    alpha = 1.0 - beta_d

    top = jnp.full(pk.shape[1:-2] + (jb, jb), ptk, pk.dtype)[None]
    pk_b = jnp.concatenate([top, a2b_ord4(pk[1:], grid)], axis=0)
    gz_b = a2b_ord4(gz, grid)
    wk = pk_b[1:] - pk_b[:-1]

    bs = SL(1, npx)
    cs = SL(1, n)
    b0 = slice(p(1), p(n) + 1)
    b1 = slice(p(2), p(npx) + 1)
    du_new = (dt / (wk[..., bs, b0] + wk[..., bs, b1]) * (
        (gz_b[1:][..., bs, b0] - gz_b[:-1][..., bs, b1])
        * (pk_b[1:][..., bs, b1] - pk_b[:-1][..., bs, b0])
        + (gz_b[:-1][..., bs, b0] - gz_b[1:][..., bs, b1])
        * (pk_b[1:][..., bs, b0] - pk_b[:-1][..., bs, b1])))
    wk2 = divg2[..., bs, p(1):p(n) + 1] - divg2[..., bs, p(2):p(npx) + 1]
    u_new = u.at[..., bs, cs].set(
        (u[..., bs, cs] + beta_d * du + wk2 + alpha * du_new)
        * rdx[..., bs, cs])

    r0 = slice(p(1), p(n) + 1)
    r1 = slice(p(2), p(npy) + 1)
    dv_new = (dt / (wk[..., r0, bs] + wk[..., r1, bs]) * (
        (gz_b[1:][..., r0, bs] - gz_b[:-1][..., r1, bs])
        * (pk_b[1:][..., r1, bs] - pk_b[:-1][..., r0, bs])
        + (gz_b[:-1][..., r0, bs] - gz_b[1:][..., r1, bs])
        * (pk_b[1:][..., r0, bs] - pk_b[:-1][..., r1, bs])))
    wk1 = divg2[..., p(1):p(n) + 1, bs] - divg2[..., p(2):p(npy) + 1, bs]
    v_new = v.at[..., cs, bs].set(
        (v[..., cs, bs] + beta_d * dv + wk1 + alpha * dv_new)
        * rdy[..., cs, bs])
    return u_new, v_new, du_new, dv_new


def split_p_grad(u, v, pp, gz, delp, pk3, du, dv, dt, grid, npx, ptop, akap,
                 beta_d):
    """Nonhydrostatic beta>0 off-centered pressure gradient
    (split_p_grad, dyn_core_nlm.F90:1531-1641, use_logp=.false.): the
    HYDROSTATIC component is off-centered with the previous substep's
    stored gradient (du/dv), the nonhydrostatic perturbation-pressure
    component is applied fully each substep."""
    p = F2P
    n = npx - 1
    npy = npx
    rdx = grid["rdx"]
    rdy = grid["rdy"]
    jb = u.shape[-2]
    ptk = ptop ** akap
    alpha = 1.0 - beta_d

    top_pk = jnp.full(pk3.shape[1:-2] + (jb, jb), ptk, pk3.dtype)[None]
    pk_b = jnp.concatenate([top_pk, a2b_ord4(pk3[1:], grid)], axis=0)
    pp_b = jnp.concatenate([jnp.zeros_like(top_pk),
                            a2b_ord4(pp[1:], grid)], axis=0)
    gz_b = a2b_ord4(gz, grid)
    dp_b = a2b_ord4(delp, grid)
    wk = pk_b[1:] - pk_b[:-1]

    bs = SL(1, npx)
    cs = SL(1, n)
    b0 = slice(p(1), p(n) + 1)
    b1 = slice(p(2), p(npx) + 1)

    def grad(f_b, den, r0, c0, r1, c1):
        return dt / (den[..., r0, c0] + den[..., r1, c1]) * (
            (gz_b[1:][..., r0, c0] - gz_b[:-1][..., r1, c1])
            * (f_b[1:][..., r1, c1] - f_b[:-1][..., r0, c0])
            + (gz_b[:-1][..., r0, c0] - gz_b[1:][..., r1, c1])
            * (f_b[1:][..., r0, c0] - f_b[:-1][..., r1, c1])
        )

    du_new = grad(pk_b, wk, bs, b0, bs, b1)
    dun = grad(pp_b, dp_b, bs, b0, bs, b1)
    u_new = u.at[..., bs, cs].set(
        (u[..., bs, cs] + beta_d * du + alpha * du_new + dun)
        * rdx[..., bs, cs])

    r0 = slice(p(1), p(n) + 1)
    r1 = slice(p(2), p(npy) + 1)
    dv_new = grad(pk_b, wk, r0, bs, r1, bs)
    dvn = grad(pp_b, dp_b, r0, bs, r1, bs)
    v_new = v.at[..., cs, bs].set(
        (v[..., cs, bs] + beta_d * dv + alpha * dv_new + dvn)
        * rdy[..., cs, bs])
    return u_new, v_new, du_new, dv_new


def nh_p_grad(u, v, pp, gz, delp, pk3, dt, grid, npx, ptop, akap):
    """Nonhydrostatic D-grid pressure gradient (dyn_core_nlm.F90:1431-1528,
    use_logp=.false.): the hydrostatic gradient on pk3 = p**kappa layers
    plus the nonhydrostatic perturbation-pressure (pp) gradient on delp
    layers, both via 4th-order B-grid corner interpolation."""
    p = F2P
    n = npx - 1
    npy = npx
    rdx = grid["rdx"]
    rdy = grid["rdy"]
    jb = u.shape[-2]
    ptk = ptop ** akap

    top_pk = jnp.full(pk3.shape[1:-2] + (jb, jb), ptk, pk3.dtype)[None]
    pk_b = jnp.concatenate([top_pk, a2b_ord4(pk3[1:], grid)], axis=0)
    pp_b = jnp.concatenate([jnp.zeros_like(top_pk),
                            a2b_ord4(pp[1:], grid)], axis=0)
    gz_b = a2b_ord4(gz, grid)
    dp_b = a2b_ord4(delp, grid)

    wk = pk_b[1:] - pk_b[:-1]
    bs = SL(1, npx)
    cs = SL(1, n)
    b0 = slice(p(1), p(n) + 1)
    b1 = slice(p(2), p(npx) + 1)

    def grad(f_b, den, r0, c0, r1, c1):
        return dt / (den[..., r0, c0] + den[..., r1, c1]) * (
            (gz_b[1:][..., r0, c0] - gz_b[:-1][..., r1, c1])
            * (f_b[1:][..., r1, c1] - f_b[:-1][..., r0, c0])
            + (gz_b[:-1][..., r0, c0] - gz_b[1:][..., r1, c1])
            * (f_b[1:][..., r0, c0] - f_b[:-1][..., r1, c1])
        )

    du1 = grad(pk_b, wk, bs, b0, bs, b1)
    dun = grad(pp_b, dp_b, bs, b0, bs, b1)
    u_new = u.at[..., bs, cs].set(
        (u[..., bs, cs] + du1 + dun) * rdx[..., bs, cs])

    r0 = slice(p(1), p(n) + 1)
    r1 = slice(p(2), p(npy) + 1)
    dv1 = grad(pk_b, wk, r0, bs, r1, bs)
    dvn = grad(pp_b, dp_b, r0, bs, r1, bs)
    v_new = v.at[..., cs, bs].set(
        (v[..., cs, bs] + dv1 + dvn) * rdy[..., cs, bs])
    return u_new, v_new


def del2_cubed(q, cd, grid, topo, nmax, npx):
    """Del-2 filter, e.g. for omega/heat source (dyn_core_nlm.F90:2090-2199)."""
    p = F2P
    n = npx - 1
    npy = npx
    jc = q.shape[-1]
    del6_u = grid["del6_u"]
    del6_v = grid["del6_v"]
    rarea = grid["rarea"]
    ntimes = min(3, nmax)

    q = halo.fill_halo_center(q, topo)
    for _ in range(ntimes):
        # 3-point corner average
        c3 = 1.0 / 3.0
        for (ci, cj), (ai, aj), (bi, bj) in (
            ((1, 1), (0, 1), (1, 0)),
            ((n, 1), (npx, 1), (n, 0)),
            ((n, n), (npx, n), (n, npy)),
            ((1, n), (0, n), (1, npy)),
        ):
            m = (q[..., p(cj), p(ci)] + q[..., p(aj), p(ai)] + q[..., p(bj), p(bi)]) * c3
            q = q.at[..., p(cj), p(ci)].set(m)
            q = q.at[..., p(aj), p(ai)].set(m)
            q = q.at[..., p(bj), p(bi)].set(m)

        qx = halo.copy_corners(q, topo, 1)
        fx = del6_v[..., :, 1:jc] * (qx[..., :, 0:jc - 1] - qx[..., :, 1:jc])
        qy = halo.copy_corners(q, topo, 2)
        fy = del6_u[..., 1:jc, :] * (qy[..., 0:jc - 1, :] - qy[..., 1:jc, :])
        q = q.at[..., 1:jc - 1, 1:jc - 1].add(
            cd
            * rarea[..., 1:jc - 1, 1:jc - 1]
            * (
                fx[..., 1:jc - 1, 0:jc - 2] - fx[..., 1:jc - 1, 1:jc - 1]
                + fy[..., 0:jc - 2, 1:jc - 1] - fy[..., 1:jc - 1, 1:jc - 1]
            )
        )
    return q


def pem_interfaces(delp, ptop):
    """Interface pressures from the padded delp (the pem capture at the
    start of the last acoustic substep, dyn_core_nlm.F90:378-392)."""
    return jnp.concatenate(
        [jnp.full((1,) + delp.shape[1:], ptop, delp.dtype),
         ptop + jnp.cumsum(delp, axis=0)],
        axis=0,
    )


def adv_pe(ua, va, pem, om, grid, npx):
    """Omega advective term V . grad(pe) by Green's theorem
    (dyn_core_nlm.F90:1263-1364, use_old_omega path).

    ua/va: A-grid contravariant winds left by the last substep's c_sw
    (d2a2c_vect; d_sw does not modify them).  pem: interface pressures
    captured at the start of that substep.  om: (pe - pem)*rdt on the
    padded domain.  Interface winds are mid-level averages (bottom layer
    uses its own level); grad(pe) comes from B-grid corner pressures
    (a2b_ord2) integrated around each cell with the en1/en2 edge normals.
    Returns om with the advective term added on the compute lanes.
    """
    p = F2P
    n = npx - 1
    cs = SL(1, n)
    bs = SL(1, npx)
    b0 = slice(p(1), p(n) + 1)
    b1 = slice(p(2), p(npx) + 1)

    up = jnp.concatenate([0.5 * (ua[:-1] + ua[1:]), ua[-1:]], axis=0)
    vp = jnp.concatenate([0.5 * (va[:-1] + va[1:]), va[-1:]], axis=0)
    v3 = (up[None][..., cs, cs] * grid["ec1"][:, None][..., cs, cs]
          + vp[None][..., cs, cs] * grid["ec2"][:, None][..., cs, cs])

    pb = a2b_ord2(pem[1:], grid)
    pdx = ((pb[..., bs, b0] + pb[..., bs, b1])
           * grid["dx"][..., bs, cs] * grid["en1"][:, None][..., bs, cs])
    pdy = ((pb[..., b0, bs] + pb[..., b1, bs])
           * grid["dy"][..., cs, bs] * grid["en2"][:, None][..., cs, bs])
    grad = ((pdx[..., 1:, :] - pdx[..., :-1, :])
            + (pdy[..., :, 1:] - pdy[..., :, :-1]))
    return om.at[..., cs, cs].add(
        0.5 * grid["rarea"][..., cs, cs] * jnp.sum(v3 * grad, axis=0))


def _kcoef(cfg, npz, dtype):
    """Per-level damping coefficients/masks from the sponge bands
    (dyn_core_nlm.F90:536-630), in single-trace masked form for d_sw."""
    import numpy as np

    bands = _sponge_bands(cfg, npz)
    d2 = np.zeros(npz)
    dv = np.zeros(npz)
    dw = np.zeros(npz)
    dtm = np.zeros(npz)
    dcon = np.zeros(npz)
    nord_k = np.zeros(npz, int)
    nordv_k = np.zeros(npz, int)
    nordt_k = np.zeros(npz, int)
    nordw_k = np.zeros(npz, int)
    for (k0, k1, pars) in bands:
        d2[k0:k1] = pars["d2_divg"]
        dv[k0:k1] = pars["damp_v"]
        dw[k0:k1] = pars["damp_w"]
        dtm[k0:k1] = pars["damp_t"]
        dcon[k0:k1] = pars["d_con"]
        nord_k[k0:k1] = pars["nord"]
        nordv_k[k0:k1] = pars["nord_v"]
        nordt_k[k0:k1] = pars["nord_t"]
        nordw_k[k0:k1] = pars["nord_w"]

    def a(x):
        return jnp.asarray(x, dtype).reshape(npz, 1, 1, 1)

    def m(x):
        # STATIC numpy masks: consumers split the level batch statically at
        # the sponge band edge instead of double-evaluating + masking
        return np.asarray(x).reshape(npz, 1, 1, 1)

    nv = min(2, cfg.nord)
    return dict(
        nord=cfg.nord, nord_v=nv, nord_t=nv, nord_w=nv,
        dddmp=cfg.dddmp, d4_bg=cfg.d4_bg, d_con=cfg.d_con, ke_bg=cfg.ke_bg,
        do_vort_damp=cfg.do_vort_damp,
        d2_divg=a(d2), damp_v=a(dv), damp_w=a(dw), damp_t=a(dtm), dcon=a(dcon),
        nord0=m(nord_k == 0), nordv0=m(nordv_k == 0),
        nordt0=m(nordt_k == 0), nordw0=m(nordw_k == 0),
    )


def _kcoef_pert(cfg, npz, dtype):
    """Per-level PERTURBATION damping coefficients (dyn_core_tlm.F90:835-920).

    Mirrors the reference's per-k pert-damping cascade: nord_pert del-nord
    damping with d2_divg_pert = min(0.20, d2_bg_pert) outside the pert
    sponge; inside (k <= n_sponge_pert) nord drops to 0 with the
    d2_bg_k1/k2/ks_pert cascade, nord_w drops to 0 with damp_w = d2, and
    vorticity damping becomes del-2 with damp_v = 0.5*d2.  nord_t/damp_t
    keep their non-sponge values (set before the override in the
    reference)."""
    import numpy as np

    nsp = cfg.n_sponge_pert
    nv = min(2, cfg.nord_pert)
    base_damp = cfg.vtdm4_pert if cfg.do_vort_damp_pert else 0.0
    d2 = np.empty(npz)
    dv = np.empty(npz)
    dw = np.empty(npz)
    dtm = np.full(npz, base_damp)
    nord_k = np.empty(npz, int)
    nordv_k = np.empty(npz, int)
    nordw_k = np.empty(npz, int)
    nordt_k = np.full(npz, nv, int)
    for k0 in range(npz):
        k = k0 + 1  # Fortran level
        nord_k[k0] = cfg.nord_pert
        nordv_k[k0] = nv
        nordw_k[k0] = nv
        d2k = min(0.20, cfg.d2_bg_pert)
        dv[k0] = base_damp
        dw[k0] = base_damp
        if k <= nsp:
            nord_k[k0] = 0
            dref = (cfg.d2_bg_k1_pert if k == 1
                    else cfg.d2_bg_k2_pert if k == 2
                    else cfg.d2_bg_ks_pert)
            if cfg.d2_bg_pert > 0.01:
                d2k = max(cfg.d2_bg_pert, dref)
            elif dref > 0.01:
                d2k = dref
            else:
                d2k = 0.01
            nordw_k[k0] = 0
            dw[k0] = d2k
            if cfg.do_vort_damp_pert:
                nordv_k[k0] = 0
                dv[k0] = 0.5 * d2k
        d2[k0] = d2k

    # traj d_con per-level values ride along (no pert d_con in the reference)
    dcon = _kcoef(cfg, npz, dtype)["dcon"]

    def a(x):
        return jnp.asarray(x, dtype).reshape(npz, 1, 1, 1)

    def m(x):
        # STATIC numpy masks (see _kcoef)
        return np.asarray(x).reshape(npz, 1, 1, 1)

    return dict(
        nord=cfg.nord_pert, nord_v=nv, nord_t=nv, nord_w=nv,
        dddmp=cfg.dddmp_pert, d4_bg=cfg.d4_bg_pert, d_con=cfg.d_con,
        ke_bg=cfg.ke_bg, do_vort_damp=cfg.do_vort_damp_pert,
        d2_divg=a(d2), damp_v=a(dv), damp_w=a(dw), damp_t=a(dtm),
        dcon=dcon,
        nord0=m(nord_k == 0), nordv0=m(nordv_k == 0),
        nordt0=m(nordt_k == 0), nordw0=m(nordw_k == 0),
    )


def _sponge_hords(cfg, npz, mains, ks_val):
    """Per-variable advection options with the pert-sponge-layer override
    (dyn_core_tlm.F90:861-875): k <= n_sponge_pert-1 uses `ks_val`.

    The override band is a STATIC prefix of the level axis, so it is carried
    as `(main, ks_val, ksp)` with ksp the number of sponge levels: the
    advection operators split the level batch at ksp and run each scheme
    once on its own band — no double evaluation (the per-k re-dispatch of
    the reference costs nothing extra there; a masked single-trace blend
    would evaluate BOTH schemes on every level)."""
    ksp = min(max(cfg.n_sponge_pert - 1, 0), npz)

    def h(main):
        if ksp > 0 and main != ks_val:
            return (main, ks_val, ksp)
        return main
    return dict(hord_mt=h(mains[0]), hord_vt=h(mains[1]),
                hord_tm=h(mains[2]), hord_dp=h(mains[3]))


def _pert_hords(cfg, npz):
    """PERT advection options with the sponge override (hord_*_ks_pert)."""
    return _sponge_hords(
        cfg, npz, (cfg.hord_mt_pert, cfg.hord_vt_pert, cfg.hord_tm_pert,
                   cfg.hord_dp_pert), cfg.hord_ks_pert)


def _traj_sponge_hords(cfg, npz):
    """TRAJECTORY advection options inside the TLM/ADM linearization: in
    the pert sponge levels the trajectory ALSO drops to hord_*_ks_traj
    (dyn_core_tlm.F90:862-868, hord_ks_traj default true with values 1,
    fv_arrays_tlmadm.F90:61-66).  This is why the differentiated NLM
    differs slightly from the production NLM — the reference's linmodtest
    switch exists for exactly that (fv3jedi_lm_dynamics_mod.F90:297-330)."""
    return _sponge_hords(
        cfg, npz, (cfg.hord_mt, cfg.hord_vt, cfg.hord_tm, cfg.hord_dp),
        cfg.hord_ks_traj)


def acoustic_carry(state, cfg, npz, dtype):
    """Initial acoustic-loop carry from the interface state (zeros the
    per-mdt accumulators: heat source, and the vert block filled by the
    final substep's geopk)."""
    n = cfg.npx - 1
    jc = n + 2 * NG
    lead = state["u"].shape[:-2]
    out = dict(
        u=state["u"], v=state["v"], w=state["w"],
        delp=state["delp"], pt=state["pt"],
        uc=state["uc"], vc=state["vc"], divgd=state["divgd"],
        mfx=state["mfx"], mfy=state["mfy"], cx=state["cx"], cy=state["cy"],
        heat_source=jnp.zeros(lead + (n, n), dtype),
        pe=jnp.zeros((npz + 1,) + lead[1:] + (jc, jc), dtype),
        peln=jnp.zeros((npz + 1,) + lead[1:] + (jc, jc), dtype),
        pk=jnp.zeros((npz + 1,) + lead[1:] + (jc, jc), dtype),
        pkz=jnp.zeros(lead + (jc, jc), dtype),
    )
    if cfg.beta > 0.0:
        # previous-substep p-gradient store + substep counter for the
        # beta off-centering (du/dv, dyn_core_nlm.F90:254-258); zeroed at
        # every dyn_core entry — with beta_d=0 on substep 1 this exactly
        # reproduces the reference's it==1 reset (:367-374)
        out["du"] = jnp.zeros(lead + (cfg.npx, n), dtype)
        out["dv"] = jnp.zeros(lead + (n, cfg.npx), dtype)
        out["itc"] = jnp.zeros((), dtype)
    if not cfg.hydrostatic:
        # interface heights from delz, zh(km+1)=zs (dyn_core_nlm.F90:323-352,
        # it==1 branch); zh persists across substeps (update_dz_d output)
        from ..constants import GRAV
        zs = state["phis"] / GRAV
        zh = jnp.concatenate(
            [zs[None] - jnp.cumsum(state["delz"][::-1], axis=0)[::-1],
             zs[None]], axis=0)
        out["zh"] = zh
        out["delz"] = state["delz"]
        out["ws"] = jnp.zeros(lead[1:] + (jc, jc), dtype)
    return out


def mix_dp(delp, pt, w, dp_ref, hydrostatic):
    """Thin-layer delp mixing (mix_dp, dyn_core_nlm.F90:1875-1952).

    Runs after d_sw inside every acoustic substep when `fill_dp` is on
    (dyn_core_nlm.F90:697): any layer thinner than 1% of its reference
    thickness dpmin(k) = 0.01*(ak(k+1)-ak(k)+(bk(k+1)-bk(k))*1e5) borrows
    mass dp from the layer BELOW, mixing pt (and w when nonhydrostatic)
    conservatively; the bottom layer borrows from the (already-updated)
    layer above.  The downward pass is sequential in k (layer k's
    borrowing thins layer k+1 before it is examined) — expressed as a
    frozen-branch fscan so the TLM/ADM replay identical mixing decisions
    (the reference's MIX_DP_TLM / PUSHCONTROL, dyn_core_tlm.F90:4385).

    Whole padded arrays are processed (CG=.false. compute-domain semantics:
    halo lanes are refreshed immediately after in stage_c)."""
    import numpy as np

    npz = delp.shape[0]
    if npz < 2:
        return delp, pt, w
    dpmin = jnp.asarray(0.01 * np.asarray(dp_ref), delp.dtype)
    nh = (w is not None) and (not hydrostatic)
    wz = w if nh else jnp.zeros_like(pt)

    def body(carry, x):
        delp_cur = carry  # effective delp at layer k (post upstream borrow)
        dpm, delp_next, pt_k, pt_next, w_k, w_next = x
        need = fbool(delp_cur < dpm)
        dp = jnp.where(need, dpm - delp_cur, 0.0)
        pt_new = jnp.where(need, (pt_k * delp_cur + pt_next * dp) / dpm,
                           pt_k)
        w_new = jnp.where(need, (w_k * delp_cur + w_next * dp) / dpm, w_k)
        delp_new = jnp.where(need, dpm, delp_cur)
        return delp_next - dp, (delp_new, pt_new, w_new)

    xs = (dpmin[:-1], delp[1:], pt[:-1], pt[1:], wz[:-1], wz[1:])
    last, (delp_o, pt_o, w_o) = fscan(body, delp[0], xs)

    # bottom layer: borrow from the layer above (its already-mixed values)
    dpm_b = dpmin[-1]
    need_b = fbool(last < dpm_b)
    dp_b = jnp.where(need_b, dpm_b - last, 0.0)
    pt_b = jnp.where(need_b, (pt[-1] * last + pt_o[-1] * dp_b) / dpm_b,
                     pt[-1])
    w_b = jnp.where(need_b, (wz[-1] * last + w_o[-1] * dp_b) / dpm_b,
                    wz[-1])
    delp_b = jnp.where(need_b, dpm_b, last)
    delp_o = delp_o.at[-1].add(-dp_b)
    delp_out = jnp.concatenate([delp_o, delp_b[None]], axis=0)
    pt_out = jnp.concatenate([pt_o, pt_b[None]], axis=0)
    if not nh:
        return delp_out, pt_out, w
    return delp_out, pt_out, jnp.concatenate([w_o, w_b[None]], axis=0)


def _rayleigh_fast_factor(cfg, npz, dtype, dt, ptop, pm):
    """Per-level inline Rayleigh drag factor rf(k) = 1/(1+dt/tau0*sin^2)
    (Rayleigh_fast, dyn_core_nlm.F90:2219-2287); 1 below rf_cutoff."""
    import numpy as np

    rff = np.ones(npz)
    for k in range(npz):
        if pm[k] < cfg.rf_cutoff:
            r = (dt / (cfg.tau * 86400.0)
                 * np.sin(0.5 * np.pi * np.log(cfg.rf_cutoff / pm[k])
                          / np.log(cfg.rf_cutoff / ptop)) ** 2)
            rff[k] = 1.0 / (1.0 + r)
        else:
            break
    return jnp.asarray(rff, dtype).reshape(npz, 1, 1, 1)


def make_acoustic_substep(grid, topo, cfg, dt_remap, akap, ptop, npz, dtype,
                          mode="traj", pm=None, dp_ref=None):
    """Build the pure one-acoustic-sub-step function substep(carry, consts).

    consts = {"phis": padded surface geopotential}.  One sub-step =
    halo(u,v) -> c_sw -> geopk(C) -> p_grad_c -> halo(uc,vc) -> d_sw ->
    halo(delp,pt) -> geopk(D) -> one_grad_p (dyn_core_nlm.F90:288-1000).

    mode="traj": the nonlinear model's substep.
    mode="mixed": the TLM/ADM linearization target — d_sw runs BOTH the
    trajectory scheme and the perturbation scheme (hord_*_pert, pert
    damping, pert sponge override) and combines them with
    freeze.mix_primal: primal follows the traj scheme, derivatives the
    pert scheme.  This reproduces the reference's split linearization
    (dyn_core_tlm.F90:835-960, sw_core_tlm.F90:1664-1687).
    """
    from .freeze import mix_primal

    npx = cfg.npx
    n = npx - 1
    dt = dt_remap / cfg.n_split
    dt2 = 0.5 * dt
    jc = n + 2 * NG
    jb = jc + 1
    kcoef = _kcoef(cfg, npz, dtype)
    mix_hord = mode == "mixed" and cfg.split_hord
    mix_damp = mode == "mixed" and cfg.split_damp
    # Pallas SIM1 on the trajectory path only (no jvp/vjp through
    # pallas_call; the mixed/differentiated stages keep the jnp oracle)
    import os as _os

    import jax as _jax
    use_pallas_sim1 = (mode == "traj" and not cfg.hydrostatic
                       and _os.environ.get("FV3LM_PALLAS", "1") != "0"
                       and _jax.devices()[0].platform == "tpu")
    # trajectory-side advection inside the linearization: pert-sponge
    # levels drop to hord_*_ks_traj when split (dyn_core_tlm.F90:862-868)
    hords_t = (_traj_sponge_hords(cfg, npz) if mix_hord else dict(
        hord_mt=cfg.hord_mt, hord_vt=cfg.hord_vt,
        hord_tm=cfg.hord_tm, hord_dp=cfg.hord_dp))
    if mix_hord or mix_damp:
        hords_p = (_pert_hords(cfg, npz) if mix_hord else dict(
            hord_mt=cfg.hord_mt, hord_vt=cfg.hord_vt,
            hord_tm=cfg.hord_tm, hord_dp=cfg.hord_dp))
        kcoef_p = _kcoef_pert(cfg, npz, dtype) if mix_damp else kcoef
    else:
        hords_p = kcoef_p = None

    def stage_a(c, consts):
        """halo(u,v) -> c_sw -> geopk(C) -> p_grad_c -> halo(uc,vc)."""
        from ..timing import scope

        phis = consts["phis"]
        u, v, w = c["u"], c["v"], c["w"]
        delp, pt = c["delp"], c["pt"]
        uc, vc = c["uc"], c["vc"]

        with scope("halo_uv"):
            u, v = halo.fill_halo_dgrid(u, v, topo)
        if not cfg.hydrostatic:
            w = halo.fill_halo_center(w, topo)

        with scope("c_sw"):
            delpc, ptc, wc, uc, vc, divgd, ua, va, ut_c, vt_c = c_sw(
                delp, pt, u, v, w, uc, vc, grid, topo, dt2, cfg.nord,
                cfg.hydrostatic, npx,
            )
        if cfg.nord > 0:
            divgd = halo.fill_halo_corner(divgd, topo)

        if cfg.hydrostatic:
            with scope("geopk_c"):
                _, _, pkc_c, gz_c, _ = geopk(ptop, delpc, ptc, phis, akap)
            with scope("p_grad_c"):
                uc, vc = p_grad_c(dt2, pkc_c, gz_c, uc, vc, grid, npx)
        else:
            # NH C-stage (dyn_core_nlm.F90:437-504): advect the interface
            # heights with the c_sw transport winds, semi-implicit vertical
            # solve for the full C-grid pressure, then the NH p_grad_c
            from .nh_core import riem_solver_c, update_dz_c

            from ..constants import GRAV
            zs = phis / GRAV
            with scope("update_dz_c"):
                gz_m, ws3 = update_dz_c(dt2, dp_ref, zs, ut_c, vt_c,
                                        c["zh"], grid, topo, npx)
            with scope("riem_c"):
                pkc_c, gz_c, _ = riem_solver_c(dt2, akap, ptop, phis, wc,
                                               ptc, delpc, gz_m, ws3,
                                               cfg.p_fac,
                                               use_pallas=use_pallas_sim1)
            with scope("p_grad_c"):
                uc, vc = p_grad_c(dt2, pkc_c, gz_c, uc, vc, grid, npx,
                                  delpc=delpc)
        uc, vc = halo.fill_halo_cgrid(uc, vc, topo)

        ab = dict(u=u, v=v, w=w, delp=delp, pt=pt, uc=uc, vc=vc,
                  divgd=divgd, ua=ua, va=va,
                  mfx=c["mfx"], mfy=c["mfy"], cx=c["cx"], cy=c["cy"],
                  heat_source=c["heat_source"])
        if cfg.beta > 0.0:
            # off-centered p-gradient state (previous substep's gradient +
            # substep counter; dyn_core_nlm.F90:254-258, 367-374)
            ab["du"], ab["dv"], ab["itc"] = c["du"], c["dv"], c["itc"]
        if not cfg.hydrostatic:
            ab["zh"] = c["zh"]
            ab["delz"] = c["delz"]
            ab["ws"] = c["ws"]
        if cfg.d_ext > 0.0:
            ab["wk_dext"] = a2b_ord2(delp, grid)  # per-level B-grid delp
        return ab

    def stage_b(ab, consts):
        """d_sw (traj scheme [+ pert scheme mixed])."""
        from ..timing import scope

        dsw_args = (ab["delp"], ab["pt"], ab["u"], ab["v"], ab["w"],
                    ab["uc"], ab["vc"], ab["ua"], ab["va"], ab["divgd"],
                    ab["mfx"], ab["mfy"], ab["cx"], ab["cy"],
                    grid, topo, dt, npx)
        with scope("d_sw"):
            r = d_sw(
                *dsw_args,
                hords_t["hord_mt"], hords_t["hord_vt"],
                hords_t["hord_tm"], hords_t["hord_dp"],
                kcoef, cfg.hydrostatic,
            )
        if hords_p is not None:
            with scope("d_sw_pert"):
                r_p = d_sw(
                    *dsw_args,
                    hords_p["hord_mt"], hords_p["hord_vt"],
                    hords_p["hord_tm"], hords_p["hord_dp"],
                    kcoef_p, cfg.hydrostatic,
                )
            r = mix_primal(r, r_p)
        if cfg.fill_dp:
            # thin-layer delp mixing between d_sw and the delp/pt halo
            # refresh (dyn_core_nlm.F90:697)
            w_in = r["w"] if not cfg.hydrostatic else None
            dmix, tmix, wmix = mix_dp(r["delp"], r["pt"], w_in, dp_ref,
                                      cfg.hydrostatic)
            r = dict(r, delp=dmix, pt=tmix,
                     **({"w": wmix} if w_in is not None else {}))
        bc = dict(
            delp=r["delp"], pt=r["pt"], u=r["u"], v=r["v"],
            w=(r["w"] if not cfg.hydrostatic else ab["w"]),
            divgd=r["divg_d"], divd_b=r["divd_b"],
            mfx=r["xflux"], mfy=r["yflux"], cx=r["cx"], cy=r["cy"],
            heat_source=ab["heat_source"] + r["heat_source"],
            uc=ab["uc"], vc=ab["vc"],
        )
        if cfg.beta > 0.0:
            bc["du"], bc["dv"], bc["itc"] = ab["du"], ab["dv"], ab["itc"]
        if not cfg.hydrostatic:
            bc["zh"] = ab["zh"]
            bc["delz"] = ab["delz"]
            bc["ws"] = ab["ws"]
            # per-substep courant numbers / area fluxes for update_dz_d
            bc["crx"], bc["cry"] = r["crx"], r["cry"]
            bc["xfx"], bc["yfx"] = r["xfx"], r["yfx"]
        if cfg.d_ext > 0.0:
            bc["wk_dext"] = ab["wk_dext"]
        return bc

    def stage_c(bc, consts):
        """halo(delp,pt) -> geopk(D) -> one_grad_p [-> Rayleigh_fast]."""
        from ..timing import scope

        phis = consts["phis"]
        u, v, w = bc["u"], bc["v"], bc["w"]
        lead = u.shape[:-2]

        delp = halo.fill_halo_center(bc["delp"], topo)
        pt = halo.fill_halo_center(bc["pt"], topo)

        # external-mode damping vector (dyn_core_nlm.F90:707-728)
        if cfg.d_ext > 0.0:
            d2_ext = cfg.d_ext * grid["da_min_c"]
            divg2 = _d_ext_divg2(bc["wk_dext"], bc["divd_b"], d2_ext, grid,
                                 npx)
        else:
            divg2 = jnp.zeros(lead[1:] + (jb, jb), dtype)

        if cfg.beta > 0.0:
            # first substep of each dyn_core call applies no off-centering
            # (beta_d=0, dyn_core_nlm.F90:367-374)
            beta_d = jnp.where(bc["itc"] == 0.0, 0.0,
                               jnp.asarray(cfg.beta, dtype))

        if cfg.hydrostatic:
            with scope("geopk_d"):
                pe, peln, pkc, gz, pkz = geopk(ptop, delp, pt, phis, akap)

            if cfg.beta > 0.0:
                with scope("grad1_p_update"):
                    u, v, du_n, dv_n = grad1_p_update(
                        u, v, pkc, gz, divg2, bc["du"], bc["dv"], dt, grid,
                        npx, ptop, akap, beta_d)
                extra = dict(du=du_n, dv=dv_n, itc=bc["itc"] + 1.0)
            else:
                with scope("one_grad_p"):
                    u, v = one_grad_p(
                        u, v, pkc, gz, divg2, dt, grid, npx, ptop, akap,
                        cfg.d_ext
                    )
                extra = {}
        else:
            # NH D-stage (dyn_core_nlm.F90:762-880): advect zh with the
            # d_sw fluxes, semi-implicit solve for w/delz and the NH
            # perturbation pressure, then the split NH pressure gradient.
            # pkz here is the instantaneous NH equation of state (the
            # reference keeps the stale remap pkz for the heat source;
            # d_con's dtmp uses this fresher value).
            from .nh_core import riem_solver3, update_dz_d

            from ..constants import GRAV, RGAS
            zs_m = phis / GRAV
            with scope("update_dz_d"):
                zh_m, ws = update_dz_d(dt, dp_ref, zs_m, bc["zh"],
                                       bc["crx"], bc["cry"], bc["xfx"],
                                       bc["yfx"], cfg.hord_tm, grid, topo,
                                       npx)
            with scope("riem_3"):
                sol = riem_solver3(dt, akap, ptop, zs_m, ws, None, pt,
                                   delp, zh_m, w, cfg.p_fac, fp_out=False,
                                   use_pallas=use_pallas_sim1)
            w = sol["w"]
            delz = sol["delz"]
            zh2 = halo.fill_halo_center(sol["zh"], topo)
            pp = halo.fill_halo_center(sol["ppe"], topo)
            gz = zh2 * GRAV
            pe, peln, pkc = sol["pe"], sol["peln"], sol["pk3"]
            k1k = akap / (1.0 - akap)
            rrg = -RGAS / GRAV
            pkz = jnp.exp(k1k * jnp.log(jnp.maximum(
                rrg * delp / jnp.minimum(delz, -1e-2)
                * jnp.maximum(pt, 1e-10), 1e-30)))
            if cfg.beta > 0.0:
                with scope("split_p_grad"):
                    u, v, du_n, dv_n = split_p_grad(
                        u, v, pp, gz, delp, pkc, bc["du"], bc["dv"], dt,
                        grid, npx, ptop, akap, beta_d)
                extra = dict(zh=zh2, delz=delz, ws=ws,
                             du=du_n, dv=dv_n, itc=bc["itc"] + 1.0)
            else:
                with scope("nh_p_grad"):
                    u, v = nh_p_grad(u, v, pp, gz, delp, pkc, dt, grid, npx,
                                     ptop, akap)
                extra = dict(zh=zh2, delz=delz, ws=ws)

        if cfg.rayleigh_fast and cfg.tau > 0.0 and pm is not None:
            rff = _rayleigh_fast_factor(cfg, npz, dtype, abs(dt), ptop, pm)
            u = u * rff
            v = v * rff
            if not cfg.hydrostatic:
                w = w * rff

        return dict(
            u=u, v=v, w=w, delp=delp, pt=pt, uc=bc["uc"], vc=bc["vc"],
            divgd=bc["divgd"],
            mfx=bc["mfx"], mfy=bc["mfy"], cx=bc["cx"], cy=bc["cy"],
            heat_source=bc["heat_source"],
            pe=pe, peln=peln, pk=pkc, pkz=pkz, **extra,
        )

    def substep(c, consts):
        return stage_c(stage_b(stage_a(c, consts), consts), consts)

    # the split adjoint chains per-stage vjps so only one stage's
    # residuals are ever live (core/staged.py _ad_split)
    substep.stages = (stage_a, stage_b, stage_c)
    return substep


def acoustic_finish(state, carry, grid, topo, cfg, dt_remap, npz):
    """Post-acoustic-loop work (dyn_core_nlm.F90:935-1100): D-edge single
    ownership fix + damping heat source into pt.  Returns (state, vert)."""
    npx = cfg.npx
    n = npx - 1
    u, v, w = carry["u"], carry["v"], carry["w"]
    delp, pt = carry["delp"], carry["pt"]
    heat_source = carry["heat_source"]
    pkz = carry["pkz"]

    # prevent edge-rounding divergence between faces (last sub-step only)
    u, v = halo.fix_shared_edges_dgrid(u, v, topo)

    # damping heat source -> pt (dyn_core_nlm.F90:1051-1100), hydrostatic
    if cfg.d_con > 1.0e-5 and _n_con(cfg, npz) != 0:
        nf_ke = min(3, cfg.nord + 1)
        hs_full = jnp.zeros_like(delp).at[..., SL(1, n), SL(1, n)].set(heat_source)
        hs_full = del2_cubed(hs_full, 0.20 * grid["da_min"], grid, topo, nf_ke, npx)
        n_con = _n_con(cfg, npz)
        cs = SL(1, n)
        dtmp = hs_full[..., cs, cs] / (CP_AIR * delp[..., cs, cs])
        delt = abs(dt_remap) * cfg.delt_max
        kidx = jnp.arange(npz)[:, None, None, None]
        upd = jnp.where(
            kidx < 3,
            dtmp,
            fsign_mul(dtmp, fmin(delt, fabs(dtmp))),
        ) / pkz[..., cs, cs]
        upd = jnp.where(kidx < n_con, upd, 0.0)
        pt = pt.at[..., cs, cs].add(upd)

    state = dict(
        state, u=u, v=v, w=w, delp=delp, pt=pt,
        uc=carry["uc"], vc=carry["vc"], divgd=carry["divgd"],
        mfx=carry["mfx"], mfy=carry["mfy"], cx=carry["cx"], cy=carry["cy"],
    )
    if "delz" in carry:
        state["delz"] = carry["delz"]
        state["ws"] = carry["ws"]
    vert = dict(pk=carry["pk"], pe=carry["pe"], peln=carry["peln"],
                pkz=carry["pkz"])
    return state, vert


def dyn_core(state, q, grid, topo, cfg, dt_remap, akap, ptop, first_call,
             pm=None, compute_omega=False, dp_ref=None):
    """One mdt step = n_split acoustic sub-steps (hydrostatic).

    state: dict with u, v, w, pt (theta_v), delp, phis, uc, vc, divgd and
    accumulators mfx, mfy, cx, cy.  Returns updated state plus pk/pe/peln/pkz
    from the final geopk for the vertical remap.

    The TLM/ADM do not differentiate through this function: the facade's
    staged driver (core/staged.py) drives the exposed acoustic_carry /
    make_acoustic_substep / acoustic_finish pieces at stored checkpoints.
    """
    import jax

    dtype = state["u"].dtype
    npz = state["delp"].shape[0]
    phis = state["phis"]

    substep = make_acoustic_substep(grid, topo, cfg, dt_remap, akap, ptop,
                                    npz, dtype, pm=pm, dp_ref=dp_ref)
    carry = acoustic_carry(state, cfg, npz, dtype)
    consts = dict(phis=phis)

    omga = None
    if compute_omega and cfg.hydrostatic:
        # use_old_omega diagnostic path (dyn_core_nlm.F90:378-392, 969-982):
        # capture pem at the start of the LAST acoustic substep, then
        # omga = (pe - pem)*rdt plus the adv_pe advective term with that
        # substep's c_sw A-grid winds (intent-inout survivors of d_sw)
        if cfg.n_split > 1:
            carry, _ = jax.lax.scan(
                lambda c, _: (substep(c, consts), None),
                carry, None, length=cfg.n_split - 1,
            )
        pem = pem_interfaces(carry["delp"], ptop)
        sa, sb, sc = substep.stages
        ab = sa(carry, consts)
        carry = sc(sb(ab, consts), consts)
        rdt = cfg.n_split / dt_remap
        omga = (carry["pe"][1:] - pem[1:]) * rdt
        omga = adv_pe(ab["ua"], ab["va"], pem, omga, grid, cfg.npx)
    else:
        carry, _ = jax.lax.scan(
            lambda c, _: (substep(c, consts), None),
            carry, None, length=cfg.n_split,
        )

    state, vert = acoustic_finish(state, carry, grid, topo, cfg, dt_remap,
                                  npz)
    if omga is not None:
        vert["omga"] = omga
    return state, vert


def _n_con(cfg, npz):
    """Heat-source application depth (dyn_core_nlm.F90:270-283)."""
    if cfg.convert_ke or cfg.vtdm4 > 1.0e-4:
        return npz
    if cfg.d2_bg_k1 < 1.0e-3:
        return 0
    return 1 if cfg.d2_bg_k2 < 1.0e-3 else 2


def _d_ext_divg2(delp_b, divd_b, d2_ext, grid, npx):
    """divg2 = d_ext*da_min_c * sum_k(delp_b*div_b)/sum_k(delp_b) at B points
    (dyn_core_nlm.F90:707-728); inputs are per-level B-grid arrays (zero
    outside B 1..npx, so the quotient is masked there)."""
    wk = jnp.sum(delp_b, axis=0)
    dv = jnp.sum(delp_b * divd_b, axis=0)
    wkpos = fbool(wk > 0.0)
    return jnp.where(wkpos, d2_ext * dv / jnp.where(wkpos, wk, 1.0), 0.0)


def _sponge_bands(cfg, npz):
    """Static per-k damping-coefficient bands (dyn_core_nlm.F90:536-630).

    Returns a list of (k0, k1, params) with contiguous level ranges sharing
    one static coefficient set, so d_sw is traced once per band.
    """
    base = dict(
        hord_mt=cfg.hord_mt, hord_vt=cfg.hord_vt, hord_tm=cfg.hord_tm,
        hord_dp=cfg.hord_dp,
        nord=cfg.nord, nord_v=min(2, cfg.nord), nord_t=min(2, cfg.nord),
        nord_w=min(2, cfg.nord),
        d2_divg=min(0.20, cfg.d2_bg),
        damp_v=(cfg.vtdm4 if cfg.do_vort_damp else 0.0),
        damp_w=(cfg.vtdm4 if cfg.do_vort_damp else 0.0),
        damp_t=(cfg.vtdm4 if cfg.do_vort_damp else 0.0),
        d_con=cfg.d_con,
    )
    if npz == 1 or cfg.n_sponge < 0:
        b = dict(base, d2_divg=cfg.d2_bg)
        return [(0, npz, b)]

    bands = []
    k_sponge2 = max(2, cfg.n_sponge - 1)
    k_sponge3 = max(3, cfg.n_sponge)
    specials = {}
    # k==1 (Fortran) -> index 0
    d2 = max(0.01, cfg.d2_bg, cfg.d2_bg_k1)
    p1 = dict(base, nord=0, d2_divg=d2, nord_w=0, damp_w=d2, d_con=0.0)
    if cfg.do_vort_damp:
        p1["nord_v"] = 0
        p1["damp_v"] = 0.5 * d2
        p1["damp_t"] = 0.5 * d2  # damp_t follows damp_vt(k) in reference
    specials[0] = p1
    if cfg.d2_bg_k2 > 0.01:
        d2 = max(cfg.d2_bg, cfg.d2_bg_k2)
        p2 = dict(base, nord=0, d2_divg=d2, nord_w=0, damp_w=d2, d_con=0.0)
        if cfg.do_vort_damp:
            p2["nord_v"] = 0
            p2["damp_v"] = 0.5 * d2
            p2["damp_t"] = 0.5 * d2
        specials[k_sponge2 - 1] = p2
    if cfg.d2_bg_k2 > 0.05:
        d2 = max(cfg.d2_bg, 0.2 * cfg.d2_bg_k2)
        p3 = dict(base, nord=0, d2_divg=d2, nord_w=0, damp_w=d2, d_con=0.0)
        specials[k_sponge3 - 1] = p3

    k = 0
    while k < npz:
        if k in specials:
            bands.append((k, k + 1, specials[k]))
            k += 1
        else:
            k1 = k + 1
            while k1 < npz and k1 not in specials:
                k1 += 1
            bands.append((k, k1, base))
            k = k1
    return bands
