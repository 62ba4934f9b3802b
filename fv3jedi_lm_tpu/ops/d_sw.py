"""D-grid Lin-Rood forward step (d_sw) and B-point wind advection (xtp_u/ytp_v).

Re-derivation of model/sw_core_nlm.F90: `d_sw` (:492-1544), `xtp_u` (:1970),
`ytp_v` (:2312) in whole-array JAX form for the cubed sphere (grid_type<3,
non-nested; every face whole so all four corners/edges are present).

Shapes (n cells/side, jc = n+2ng, jb = jc+1; leading dims broadcast):
  u, vt, divg_u : (..., 6, jb, jc)   rows = B lines, cols = cells
  v, ut, divg_v : (..., 6, jc, jb)
  uc            : (..., 6, jc, jb)   C-grid u (cols = B)
  vc            : (..., 6, jb, jc)
  delp/pt/w/wk  : (..., 6, jc, jc)
  B-point arrays: (..., 6, jb, jb)
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import NG
from ..core.freeze import fabs, fbool, fmax, fmin, fsign_mul, fwhere
from ..parallel import halo
from . import ppm
from .a2b_edge import a2b_ord4
from .sw_core import F2P, SL, del6_vt_flux
from .transport import fv_tp_2d

R3 = 1.0 / 3.0
NEAR_ZERO = 1.0e-9  # sw_core_nlm.F90:37


def _del6_vt_flux_masked(nord_n, damps, mask0, q, grid, topo):
    """del6_vt_flux at per-level order: order-0 on mask0 levels, nord_n
    elsewhere (the sponge-band override of dyn_core_nlm.F90:536-630).
    The level batch is split STATICALLY at the sponge band edge so each
    order is evaluated only on its own levels (mask0 is a static numpy
    array; isolated special levels inside the band still blend).
    damps = (damp4 order-0, damp4 order-n), each (npz,1,1,1)."""
    from .transport import mask_band

    if nord_n == 0:
        return del6_vt_flux(0, damps[0], q, grid, topo)
    k0, mixed = mask_band(mask0)
    if k0 == 0:
        return del6_vt_flux(nord_n, damps[1], q, grid, topo)
    outA = del6_vt_flux(0, damps[0][:k0], q[:k0], grid, topo)
    if mixed:
        outAn = del6_vt_flux(nord_n, damps[1][:k0], q[:k0], grid, topo)
        outA = tuple(jnp.where(mask0[:k0], a, b)
                     for a, b in zip(outA, outAn))
    if k0 == q.shape[0]:
        return outA
    outB = del6_vt_flux(nord_n, damps[1][k0:], q[k0:], grid, topo)
    return tuple(jnp.concatenate([a, b], axis=0)
                 for a, b in zip(outA, outB))
P1 = 7.0 / 12.0
P2 = -1.0 / 12.0
C1 = -2.0 / 14.0
C2 = 11.0 / 14.0
C3 = 5.0 / 14.0
S11 = 11.0 / 14.0
S14 = 4.0 / 7.0
S15 = 3.0 / 14.0


def _edge_2sided(q, dxm, e, A=None):
    """0.5*[ ((2*d0+dm)*q0 - d0*qm)/(dm+d0) + ((2*d1+d2)*q1 - d1*q2)/(d1+d2) ]

    at edge-index e between cells e-1 | e along the working axis A.ax.
    """
    if A is None:
        A = ppm._AXX
    qm, q0, q1, q2 = (A.get(q, e - 2), A.get(q, e - 1), A.get(q, e),
                      A.get(q, e + 1))
    dm, d0, d1, d2 = (
        A.get(dxm, e - 2),
        A.get(dxm, e - 1),
        A.get(dxm, e),
        A.get(dxm, e + 1),
    )
    return 0.5 * (
        ((2.0 * d0 + dm) * q0 - d0 * qm) / (dm + d0)
        + ((2.0 * d1 + d2) * q1 - d1 * q2) / (d1 + d2)
    )


def _xtp_flux(q, cb, iord, dxm, rdxm, npx, edge_rows, A=None):
    """Advective flux of a D-grid wind component along its own line.

    Works along axis `A.ax` (-1 for xtp_u rows, -2 for ytp_v columns —
    transpose-free; on TPU a minor-dim swapaxes is a real relayout copy).
    q: cells, width jc along A.ax; cb: courant at B indices 1..npx;
    dxm/rdxm metric aligned with q; edge_rows: bool (broadcast along the
    OTHER axis) marking the lines at j==1 / j==npy where perpendicular-
    edge zeroing applies.  Returns flux of width n+1 along A.ax.
    (sw_core_nlm.F90 xtp_u:1970 / ytp_v:2312)
    """
    if A is None:
        A = ppm._AXX
    ic = A.size(q)
    n = ic - 2 * NG
    p = F2P
    b0s = p(1)  # python index of B point 1
    qL = A.rng(q, b0s - 1, b0s + n)      # u(i-1,j) for B i=1..npx
    qR = A.rng(q, b0s, b0s + n + 1)
    rdxL = A.rng(rdxm, b0s - 1, b0s + n)
    rdxR = A.rng(rdxm, b0s, b0s + n + 1)

    if iord == 1:
        return fwhere(cb > 0.0, qL, qR)

    er = edge_rows

    if iord < 8:
        z2 = A.zeros_like_w(q, 2)
        al = A.cat([
            z2,
            P1 * (A.rng(q, 1, ic - 2) + A.rng(q, 2, ic - 1))
            + P2 * (A.rng(q, 0, ic - 3) + A.rng(q, 3, ic)),
            z2,
        ])
        bl = A.rng(al, 0, ic) - q
        br = A.rng(al, 1, ic + 1) - q
        # west edge fixes (cells 0,1,2 -> padded p(0)..p(2)); all edge
        # lines batched into one concat per array (ppm.set_cols)
        i1 = p(1)
        xt = C3 * A.get(q, i1) + C2 * A.get(q, i1 + 1) + C1 * A.get(q, i1 + 2)
        br_i1_a = xt - A.get(q, i1)
        bl_i1p1 = xt - A.get(q, i1 + 1)
        br_i1p1 = A.get(al, i1 + 3) - A.get(q, i1 + 1)
        bl0 = (C1 * A.get(q, i1 - 3) + C2 * A.get(q, i1 - 2)
               + C3 * A.get(q, i1 - 1) - A.get(q, i1 - 1))
        xte = _edge_2sided(q, dxm, i1, A)
        br0 = xte - A.get(q, i1 - 1)
        bl1 = xte - A.get(q, i1)
        z = jnp.zeros_like(bl0)
        bl_i1m1 = jnp.where(er, z, bl0)
        br_i1m1 = jnp.where(er, z, br0)
        bl_i1 = jnp.where(er, z, bl1)
        br_i1 = jnp.where(er, z, br_i1_a)
        # east edge (cells npx-2, npx-1, npx)
        iN = p(npx - 2)
        bl_iN = A.get(al, iN) - A.get(q, iN)
        xt = C1 * A.get(q, iN - 1) + C2 * A.get(q, iN) + C3 * A.get(q, iN + 1)
        br_iN = xt - A.get(q, iN)
        bl_iNp1_a = xt - A.get(q, iN + 1)
        xte = _edge_2sided(q, dxm, p(npx), A)
        brN1 = xte - A.get(q, iN + 1)
        blN2 = xte - A.get(q, iN + 2)
        brN2 = (C3 * A.get(q, iN + 2) + C2 * A.get(q, iN + 3)
                + C1 * A.get(q, iN + 4) - A.get(q, iN + 2))
        bl_iNp1 = jnp.where(er, z, bl_iNp1_a)
        br_iNp1 = jnp.where(er, z, brN1)
        bl_iNp2 = jnp.where(er, z, blN2)
        br_iNp2 = jnp.where(er, z, brN2)
        bl = ppm.set_cols(bl, [(i1 - 1, bl_i1m1), (i1, bl_i1),
                               (i1 + 1, bl_i1p1), (iN, bl_iN),
                               (iN + 1, bl_iNp1), (iN + 2, bl_iNp2)], A)
        br = ppm.set_cols(br, [(i1 - 1, br_i1m1), (i1, br_i1),
                               (i1 + 1, br_i1p1), (iN, br_iN),
                               (iN + 1, br_iNp1), (iN + 2, br_iNp2)], A)

        b0 = bl + br
        blL = A.rng(bl, b0s - 1, b0s + n)
        brL = A.rng(br, b0s - 1, b0s + n)
        b0L = A.rng(b0, b0s - 1, b0s + n)
        blR = A.rng(bl, b0s, b0s + n + 1)
        brR = A.rng(br, b0s, b0s + n + 1)
        b0R = A.rng(b0, b0s, b0s + n + 1)
        cflp = cb * rdxL
        cfln = cb * rdxR
        if iord == 2:
            return fwhere(
                cb > 0.0,
                qL + (1.0 - cflp) * (brL - cflp * b0L),
                qR + (1.0 + cfln) * (blR + cfln * b0R),
            )
        x0 = jnp.abs(b0)
        x1 = jnp.abs(bl - br)
        if iord in (3, 4):
            smt5 = fbool(x0 < x1)
            smt6 = fbool(3.0 * x0 < x1)
            s5L = A.rng(smt5, b0s - 1, b0s + n)
            s6L = A.rng(smt6, b0s - 1, b0s + n)
            s5R = A.rng(smt5, b0s, b0s + n + 1)
            s6R = A.rng(smt6, b0s, b0s + n + 1)
            if iord == 3:
                fx0p = jnp.where(
                    s6L | s5R,
                    brL - cflp * b0L,
                    jnp.where(
                        s5L,
                        fsign_mul(brL, fmin(fabs(blL), fabs(brL))),
                        0.0,
                    ),
                )
                fx0n = jnp.where(
                    s6R | s5L,
                    blR + cfln * b0R,
                    jnp.where(
                        s5R,
                        fsign_mul(blR, fmin(fabs(blR), fabs(brR))),
                        0.0,
                    ),
                )
                return fwhere(
                    cb > 0.0,
                    qL + (1.0 - cflp) * fx0p,
                    qR + (1.0 + cfln) * fx0n,
                )
            fx0p = jnp.where(s6L | s5R, (1.0 - cflp) * (brL - cflp * b0L), 0.0)
            fx0n = jnp.where(s6R | s5L, (1.0 + cfln) * (blR + cfln * b0R), 0.0)
            return fwhere(cb > 0.0, qL + fx0p, qR + fx0n)
        # iord 5, 6, 7
        if iord == 5:
            smt5 = fbool(bl * br < 0.0)
        else:
            smt5 = fbool(jnp.abs(3.0 * b0) < x1)
        s5L = A.rng(smt5, b0s - 1, b0s + n)
        s5R = A.rng(smt5, b0s, b0s + n + 1)
        cbpos = fbool(cb > 0.0)
        fx0 = jnp.where(
            cbpos,
            (1.0 - cflp) * (brL - cflp * b0L),
            (1.0 + cfln) * (blR + cfln * b0R),
        )
        base = jnp.where(cbpos, qL, qR)
        return base + jnp.where(s5L | s5R, fx0, 0.0)

    # ---- iord >= 8 (monotone family, sw_core_nlm.F90:2168-2306) ----
    qm1 = A.rng(q, 0, ic - 2)
    qp1 = A.rng(q, 2, ic)
    q0 = A.rng(q, 1, ic - 1)
    xt = 0.25 * (qp1 - qm1)
    dm_i = fsign_mul(xt, fmin(
        fabs(xt),
        fmin(
            fmax(fmax(qm1, q0), qp1) - q0,
            q0 - fmin(fmin(qm1, q0), qp1),
        ),
    ))
    z1 = A.zeros_like_w(q, 1)
    dm = A.cat([z1, dm_i, z1])
    dq = A.cat([A.rng(q, 1, ic) - A.rng(q, 0, ic - 1), z1])

    al = A.cat([
        z1,
        0.5 * (A.rng(q, 0, ic - 1) + A.rng(q, 1, ic))
        + R3 * (A.rng(dm, 0, ic - 1) - A.rng(dm, 1, ic)),
        z1,
    ])
    bl = A.rng(al, 0, ic) - q
    br = A.rng(al, 1, ic + 1) - q
    if iord == 8:
        xt2 = 2.0 * dm
        bl = -fsign_mul(xt2, fmin(fabs(xt2), fabs(bl)))
        br = fsign_mul(xt2, fmin(fabs(xt2), fabs(br)))
    elif iord in (9, 10):
        dqm1 = jnp.roll(dq, 1, axis=A.ax)
        dqm2 = jnp.roll(dq, 2, axis=A.ax)
        dqp1 = jnp.roll(dq, -1, axis=A.ax)
        pmp_1 = -2.0 * dq
        lac_1 = pmp_1 + 1.5 * dqp1
        bl_l = fmin(
            fmax(0.0, fmax(pmp_1, lac_1)),
            fmax(bl, fmin(0.0, fmin(pmp_1, lac_1))),
        )
        pmp_2 = 2.0 * dqm1
        lac_2 = pmp_2 - 1.5 * dqm2
        br_l = fmin(
            fmax(0.0, fmax(pmp_2, lac_2)),
            fmax(br, fmin(0.0, fmin(pmp_2, lac_2))),
        )
        if iord == 9:
            bl, br = bl_l, br_l
        else:
            dmm1 = jnp.roll(dm, 1, axis=A.ax)
            dmp1 = jnp.roll(dm, -1, axis=A.ax)
            flat = (jnp.abs(dm) < NEAR_ZERO) & (
                jnp.abs(dmm1) + jnp.abs(dmp1) < NEAR_ZERO
            )
            noisy = jnp.abs(3.0 * (bl + br)) > jnp.abs(bl - br)
            bl = fwhere(flat, 0.0, fwhere(noisy, bl_l, bl))
            br = fwhere(flat, 0.0, fwhere(noisy, br_l, br))
    # iord == 11: unlimited bl/br as computed

    # west edge (sw_core_nlm.F90:2237-2261); edge lines batched into one
    # concat per array
    i1 = p(1)
    br_i1p1_a = A.get(al, i1 + 3) - A.get(q, i1 + 1)
    xt = (S15 * A.get(q, i1) + S11 * A.get(q, i1 + 1)
          - S14 * A.get(dm, i1 + 1))
    bl_i1p1_a = xt - A.get(q, i1 + 1)
    br_i1_a = xt - A.get(q, i1)
    bl0 = S14 * A.get(dm, i1 - 2) - S11 * A.get(dq, i1 - 2)
    xte = _edge_2sided(q, dxm, i1, A)
    z = jnp.zeros_like(bl0)
    bl_i1m1 = jnp.where(er, z, bl0)
    br_i1m1 = jnp.where(er, z, xte - A.get(q, i1 - 1))
    bl_i1 = jnp.where(er, z, xte - A.get(q, i1))
    br_i1 = jnp.where(er, z, br_i1_a)
    b2l, b2r = ppm.pert_ppm(
        A.rng(q, i1 + 1, i1 + 2), A.exp(bl_i1p1_a), A.exp(br_i1p1_a), 1
    )
    bl_i1p1 = A.get(b2l, 0)
    br_i1p1 = A.get(b2r, 0)

    # east edge (:2264-2290)
    iN = p(npx - 2)
    bl_iN_a = A.get(al, iN) - A.get(q, iN)
    xt = (S15 * A.get(q, iN + 1) + S11 * A.get(q, iN)
          + S14 * A.get(dm, iN))
    br_iN_a = xt - A.get(q, iN)
    bl_iNp1_a = xt - A.get(q, iN + 1)
    brN2 = S11 * A.get(dq, iN + 2) - S14 * A.get(dm, iN + 3)
    xte = _edge_2sided(q, dxm, p(npx), A)
    bl_iNp1 = jnp.where(er, z, bl_iNp1_a)
    br_iNp1 = jnp.where(er, z, xte - A.get(q, iN + 1))
    bl_iNp2 = jnp.where(er, z, xte - A.get(q, iN + 2))
    br_iNp2 = jnp.where(er, z, brN2)
    b2l, b2r = ppm.pert_ppm(
        A.rng(q, iN, iN + 1), A.exp(bl_iN_a), A.exp(br_iN_a), 1
    )
    bl_iN = A.get(b2l, 0)
    br_iN = A.get(b2r, 0)

    bl = ppm.set_cols(bl, [(i1 - 1, bl_i1m1), (i1, bl_i1), (i1 + 1, bl_i1p1),
                           (iN, bl_iN), (iN + 1, bl_iNp1), (iN + 2, bl_iNp2)],
                      A)
    br = ppm.set_cols(br, [(i1 - 1, br_i1m1), (i1, br_i1), (i1 + 1, br_i1p1),
                           (iN, br_iN), (iN + 1, br_iNp1), (iN + 2, br_iNp2)],
                      A)

    b0 = bl + br
    blL = A.rng(bl, b0s - 1, b0s + n)
    brL = A.rng(br, b0s - 1, b0s + n)
    b0L = A.rng(b0, b0s - 1, b0s + n)
    blR = A.rng(bl, b0s, b0s + n + 1)
    brR = A.rng(br, b0s, b0s + n + 1)
    b0R = A.rng(b0, b0s, b0s + n + 1)
    cflp = cb * rdxL
    cfln = cb * rdxR
    return fwhere(
        cb > 0.0,
        qL + (1.0 - cflp) * (brL - cflp * b0L),
        qR + (1.0 + cfln) * (blR + cfln * b0R),
    )


def xtp_u(cb, u, dx, rdx, iord, npx):
    """Flux of u along x at B points (sw_core_nlm.F90:1970).

    cb: (..., jb, jb) courant (only B 1..npx read); u: (..., jb, jc).
    Returns (..., npx, npx) flux at B points (j, i) in [1, npx]^2.
    `iord` may be a per-level blend (main, sponge, ksp) — see ppm.xppm.
    """
    if isinstance(iord, tuple):
        main, sponge, ksp = iord
        return jnp.concatenate(
            [xtp_u(cb[:ksp], u[:ksp], dx, rdx, sponge, npx),
             xtp_u(cb[ksp:], u[ksp:], dx, rdx, main, npx)], axis=0)
    bs = SL(1, npx)
    rows = jnp.zeros((npx,), bool).at[0].set(True).at[npx - 1].set(True)
    return _xtp_flux(
        u[..., bs, :], cb[..., bs, bs], iord,
        dx[..., bs, :], rdx[..., bs, :], npx, rows,
    )


def ytp_v(cb, v, dy, rdy, jord, npx):
    """Flux of v along y at B points (sw_core_nlm.F90:2312): the same
    operator along axis -2, transpose-free."""
    if isinstance(jord, tuple):
        main, sponge, ksp = jord
        return jnp.concatenate(
            [ytp_v(cb[:ksp], v[:ksp], dy, rdy, sponge, npx),
             ytp_v(cb[ksp:], v[ksp:], dy, rdy, main, npx)], axis=0)
    bs = SL(1, npx)
    cols = jnp.zeros((npx,), bool).at[0].set(True).at[npx - 1].set(True)
    return _xtp_flux(
        v[..., :, bs], cb[..., bs, bs], jord,
        dy[..., :, bs], rdy[..., :, bs], npx, cols,
        A=ppm._AXY,
    )


def d_sw(
    delp, pt, u, v, w, uc, vc, ua, va, divg_d,
    xflux, yflux, cx, cy,
    grid, topo, dt, npx,
    hord_mt, hord_vt, hord_tm, hord_dp,
    kcoef,
    hydrostatic,
):
    """One D-grid forward (large-dt) step for the whole npz level batch.

    All prognostic fields are whole-array padded (leading dims broadcast the
    (npz,) level axis).  Returns a dict with updated fields, accumulated flux
    capacitors, advective courant/area fluxes for tracer transport, the saved
    B-grid divergence, and the heat source.  (sw_core_nlm.F90:492-1544.)

    `kcoef` carries the per-level sponge-band damping configuration of
    dyn_core_nlm.F90:536-630 in single-trace (masked) form instead of the
    reference's per-k re-dispatch:
      static ints/floats: nord, nord_v, nord_t, nord_w (the non-sponge
        orders), dddmp, d4_bg, d_con, ke_bg; static bool do_vort_damp;
      (npz,1,1,1) arrays: d2_divg, damp_v, damp_w, damp_t, dcon (per-level
        d_con value); (npz,1,1,1) bool masks: nord0, nordv0, nordt0, nordw0
        (True on levels where that damping drops to del-2/order-0).
    """
    nord = kcoef["nord"]
    nord_v = kcoef["nord_v"]
    nord_t = kcoef["nord_t"]
    nord_w = kcoef["nord_w"]
    dddmp = kcoef["dddmp"]
    d4_bg = kcoef["d4_bg"]
    d_con = kcoef["d_con"]
    kgb = kcoef["ke_bg"]
    do_vort_damp = kcoef["do_vort_damp"]
    d2_divg_k = kcoef["d2_divg"]
    damp_v_k = kcoef["damp_v"]
    damp_w_k = kcoef["damp_w"]
    damp_t_k = kcoef["damp_t"]
    dcon_k = kcoef["dcon"]
    nord0_k = kcoef["nord0"]
    nordv0_k = kcoef["nordv0"]
    nordt0_k = kcoef["nordt0"]
    nordw0_k = kcoef["nordw0"]
    n = npx - 1
    npy = npx
    jc = n + 2 * NG
    jb = jc + 1
    p = F2P
    dtype = u.dtype

    sin_sg = grid["sin_sg"]
    cosa_u = grid["cosa_u"]
    cosa_v = grid["cosa_v"]
    cosa_s = grid["cosa_s"]
    rsin2 = grid["rsin2"]
    rsin_u = grid["rsin_u"]
    rsin_v = grid["rsin_v"]
    cosa = grid["cosa"]
    rsina = grid["rsina"]
    sina_u = grid["sina_u"]
    sina_v = grid["sina_v"]
    f0 = grid["f0"]
    rarea = grid["rarea"]
    rarea_c = grid["rarea_c"]
    area = grid["area"]
    dx = grid["dx"]
    dy = grid["dy"]
    dxc = grid["dxc"]
    dyc = grid["dyc"]
    rdx = grid["rdx"]
    rdy = grid["rdy"]
    rdxa = grid["rdxa"]
    rdya = grid["rdya"]
    divg_u = grid["divg_u"]
    divg_v = grid["divg_v"]
    da_min_c = grid["da_min_c"]
    da_min = grid["da_min"]

    # ---------------------------------------------------------------
    # contravariant C-grid winds ut/vt (sw_core_nlm.F90:650-840)
    # ---------------------------------------------------------------
    ut = jnp.zeros_like(uc)
    # interior formula on all rows except j in {0, 1, npy-1, npy}
    ut_i = jnp.zeros_like(uc)
    # cols e in [1, jc-1]: vc(i-1,j), vc(i,j), vc(i-1,j+1), vc(i,j+1)
    ut_i = ut_i.at[..., 0:jc, 1:jc].set(
        (
            uc[..., 0:jc, 1:jc]
            - 0.25
            * cosa_u[..., 0:jc, 1:jc]
            * (
                vc[..., 0:jc, 0:jc - 1] + vc[..., 0:jc, 1:jc]
                + vc[..., 1:jc + 1, 0:jc - 1] + vc[..., 1:jc + 1, 1:jc]
            )
        )
        * rsin_u[..., 0:jc, 1:jc]
    )
    row_idx = jnp.arange(jc) - NG + 1  # Fortran cell row index
    skip_u = (row_idx == 0) | (row_idx == 1) | (row_idx == npy - 1) | (row_idx == npy)
    ut = jnp.where(skip_u[:, None], ut, ut_i)

    vt = jnp.zeros_like(vc)
    vt_i = jnp.zeros_like(vc)
    vt_i = vt_i.at[..., 1:jc, 0:jc].set(
        (
            vc[..., 1:jc, 0:jc]
            - 0.25
            * cosa_v[..., 1:jc, 0:jc]
            * (
                uc[..., 0:jc - 1, 0:jc] + uc[..., 0:jc - 1, 1:jc + 1]
                + uc[..., 1:jc, 0:jc] + uc[..., 1:jc, 1:jc + 1]
            )
        )
        * rsin_v[..., 1:jc, 0:jc]
    )
    brow_idx = jnp.arange(jb) - NG + 1  # Fortran B row index
    skip_v = (brow_idx == 1) | (brow_idx == npy)
    vt = jnp.where(skip_v[:, None], vt, vt_i)

    # west edge col (i=1): ut = uc / sin_sg (:687-694)
    e1 = p(1)
    eN = p(npx)
    sel = fbool(uc[..., :, e1] * dt > 0.0)
    ut = ut.at[..., :, e1].set(
        uc[..., :, e1]
        / jnp.where(sel, sin_sg[2][..., :, e1 - 1], sin_sg[0][..., :, e1])
    )
    sel = fbool(uc[..., :, eN] * dt > 0.0)
    ut = ut.at[..., :, eN].set(
        uc[..., :, eN]
        / jnp.where(sel, sin_sg[2][..., :, eN - 1], sin_sg[0][..., :, eN])
    )
    # south/north edge rows (j=1 / j=npy) for vt (:718-743)
    sel = fbool(vc[..., e1, :] * dt > 0.0)
    vt = vt.at[..., e1, :].set(
        vc[..., e1, :]
        / jnp.where(sel, sin_sg[3][..., e1 - 1, :], sin_sg[1][..., e1, :])
    )
    sel = fbool(vc[..., eN, :] * dt > 0.0)
    vt = vt.at[..., eN, :].set(
        vc[..., eN, :]
        / jnp.where(sel, sin_sg[3][..., eN - 1, :], sin_sg[1][..., eN, :])
    )

    # secondary edge fixes (no rsin factor), sw_core_nlm.F90:696-749
    # west/east: vt columns i0 in {0, 1, npx-1, npx} for B rows 3..npy-2,
    #   vt(i0,j) = vc(i0,j) - 0.25*cosa_v(i0,j)*(ut(i0,j-1)+ut(i0+1,j-1)
    #                                           +ut(i0,j)+ut(i0+1,j))
    rs2 = SL(3, npy - 2)          # vt B rows 3..npy-2
    utm = SL(2, npy - 3)          # ut cell rows j-1
    ut0 = SL(3, npy - 2)          # ut cell rows j
    for i0 in (0, 1, npx - 1, npx):
        c0 = p(i0)
        vt = vt.at[..., rs2, c0].set(
            vc[..., rs2, c0]
            - 0.25
            * cosa_v[..., rs2, c0]
            * (
                ut[..., utm, c0] + ut[..., utm, c0 + 1]
                + ut[..., ut0, c0] + ut[..., ut0, c0 + 1]
            )
        )
    # south/north: ut rows j0 in {0, 1, npy-1, npy} for B cols 3..npx-2,
    #   ut(i,j0) = uc(i,j0) - 0.25*cosa_u(i,j0)*(vt(i-1,j0)+vt(i,j0)
    #                                           +vt(i-1,j0+1)+vt(i,j0+1))
    cs2 = SL(3, npx - 2)
    vtm = SL(2, npx - 3)
    vt0 = SL(3, npx - 2)
    for j0 in (0, 1, npy - 1, npy):
        r0 = p(j0)
        ut = ut.at[..., r0, cs2].set(
            uc[..., r0, cs2]
            - 0.25
            * cosa_u[..., r0, cs2]
            * (
                vt[..., r0, vtm] + vt[..., r0, vt0]
                + vt[..., r0 + 1, vtm] + vt[..., r0 + 1, vt0]
            )
        )

    # corner 2x2 solves (:752-836) — scalar updates, exact reference algebra
    def at_u(i, j):
        return (Ellipsis, p(j), p(i))

    def at_v(i, j):
        return (Ellipsis, p(j), p(i))

    def cu(i, j):
        return cosa_u[..., p(j), p(i)]

    def cv(i, j):
        return cosa_v[..., p(j), p(i)]

    # sw corner
    damp = 1.0 / (1.0 - 0.0625 * cu(2, 0) * cv(1, 0))
    ut = ut.at[at_u(2, 0)].set(
        (
            uc[at_u(2, 0)]
            - 0.25
            * cu(2, 0)
            * (
                vt[at_v(1, 1)] + vt[at_v(2, 1)] + vt[at_v(2, 0)]
                + vc[at_v(1, 0)]
                - 0.25 * cv(1, 0) * (ut[at_u(1, 0)] + ut[at_u(1, -1)] + ut[at_u(2, -1)])
            )
        )
        * damp
    )
    damp = 1.0 / (1.0 - 0.0625 * cu(0, 1) * cv(0, 2))
    vt = vt.at[at_v(0, 2)].set(
        (
            vc[at_v(0, 2)]
            - 0.25
            * cv(0, 2)
            * (
                ut[at_u(1, 1)] + ut[at_u(1, 2)] + ut[at_u(0, 2)]
                + uc[at_u(0, 1)]
                - 0.25 * cu(0, 1) * (vt[at_v(0, 1)] + vt[at_v(-1, 1)] + vt[at_v(-1, 2)])
            )
        )
        * damp
    )
    damp = 1.0 / (1.0 - 0.0625 * cu(2, 1) * cv(1, 2))
    ut = ut.at[at_u(2, 1)].set(
        (
            uc[at_u(2, 1)]
            - 0.25
            * cu(2, 1)
            * (
                vt[at_v(1, 1)] + vt[at_v(2, 1)] + vt[at_v(2, 2)]
                + vc[at_v(1, 2)]
                - 0.25 * cv(1, 2) * (ut[at_u(1, 1)] + ut[at_u(1, 2)] + ut[at_u(2, 2)])
            )
        )
        * damp
    )
    vt = vt.at[at_v(1, 2)].set(
        (
            vc[at_v(1, 2)]
            - 0.25
            * cv(1, 2)
            * (
                ut[at_u(1, 1)] + ut[at_u(1, 2)] + ut[at_u(2, 2)]
                + uc[at_u(2, 1)]
                - 0.25 * cu(2, 1) * (vt[at_v(1, 1)] + vt[at_v(2, 1)] + vt[at_v(2, 2)])
            )
        )
        * damp
    )
    # se corner
    damp = 1.0 / (1.0 - 0.0625 * cu(npx - 1, 0) * cv(npx - 1, 0))
    ut = ut.at[at_u(npx - 1, 0)].set(
        (
            uc[at_u(npx - 1, 0)]
            - 0.25
            * cu(npx - 1, 0)
            * (
                vt[at_v(npx - 1, 1)] + vt[at_v(npx - 2, 1)] + vt[at_v(npx - 2, 0)]
                + vc[at_v(npx - 1, 0)]
                - 0.25
                * cv(npx - 1, 0)
                * (ut[at_u(npx, 0)] + ut[at_u(npx, -1)] + ut[at_u(npx - 1, -1)])
            )
        )
        * damp
    )
    damp = 1.0 / (1.0 - 0.0625 * cu(npx + 1, 1) * cv(npx, 2))
    vt = vt.at[at_v(npx, 2)].set(
        (
            vc[at_v(npx, 2)]
            - 0.25
            * cv(npx, 2)
            * (
                ut[at_u(npx, 1)] + ut[at_u(npx, 2)] + ut[at_u(npx + 1, 2)]
                + uc[at_u(npx + 1, 1)]
                - 0.25
                * cu(npx + 1, 1)
                * (vt[at_v(npx, 1)] + vt[at_v(npx + 1, 1)] + vt[at_v(npx + 1, 2)])
            )
        )
        * damp
    )
    damp = 1.0 / (1.0 - 0.0625 * cu(npx - 1, 1) * cv(npx - 1, 2))
    ut = ut.at[at_u(npx - 1, 1)].set(
        (
            uc[at_u(npx - 1, 1)]
            - 0.25
            * cu(npx - 1, 1)
            * (
                vt[at_v(npx - 1, 1)] + vt[at_v(npx - 2, 1)] + vt[at_v(npx - 2, 2)]
                + vc[at_v(npx - 1, 2)]
                - 0.25
                * cv(npx - 1, 2)
                * (ut[at_u(npx, 1)] + ut[at_u(npx, 2)] + ut[at_u(npx - 1, 2)])
            )
        )
        * damp
    )
    vt = vt.at[at_v(npx - 1, 2)].set(
        (
            vc[at_v(npx - 1, 2)]
            - 0.25
            * cv(npx - 1, 2)
            * (
                ut[at_u(npx, 1)] + ut[at_u(npx, 2)] + ut[at_u(npx - 1, 2)]
                + uc[at_u(npx - 1, 1)]
                - 0.25
                * cu(npx - 1, 1)
                * (vt[at_v(npx - 1, 1)] + vt[at_v(npx - 2, 1)] + vt[at_v(npx - 2, 2)])
            )
        )
        * damp
    )
    # ne corner
    damp = 1.0 / (1.0 - 0.0625 * cu(npx - 1, npy) * cv(npx - 1, npy + 1))
    ut = ut.at[at_u(npx - 1, npy)].set(
        (
            uc[at_u(npx - 1, npy)]
            - 0.25
            * cu(npx - 1, npy)
            * (
                vt[at_v(npx - 1, npy)] + vt[at_v(npx - 2, npy)] + vt[at_v(npx - 2, npy + 1)]
                + vc[at_v(npx - 1, npy + 1)]
                - 0.25
                * cv(npx - 1, npy + 1)
                * (ut[at_u(npx, npy)] + ut[at_u(npx, npy + 1)] + ut[at_u(npx - 1, npy + 1)])
            )
        )
        * damp
    )
    damp = 1.0 / (1.0 - 0.0625 * cu(npx + 1, npy - 1) * cv(npx, npy - 1))
    vt = vt.at[at_v(npx, npy - 1)].set(
        (
            vc[at_v(npx, npy - 1)]
            - 0.25
            * cv(npx, npy - 1)
            * (
                ut[at_u(npx, npy - 1)] + ut[at_u(npx, npy - 2)] + ut[at_u(npx + 1, npy - 2)]
                + uc[at_u(npx + 1, npy - 1)]
                - 0.25
                * cu(npx + 1, npy - 1)
                * (vt[at_v(npx, npy)] + vt[at_v(npx + 1, npy)] + vt[at_v(npx + 1, npy - 1)])
            )
        )
        * damp
    )
    damp = 1.0 / (1.0 - 0.0625 * cu(npx - 1, npy - 1) * cv(npx - 1, npy - 1))
    ut = ut.at[at_u(npx - 1, npy - 1)].set(
        (
            uc[at_u(npx - 1, npy - 1)]
            - 0.25
            * cu(npx - 1, npy - 1)
            * (
                vt[at_v(npx - 1, npy)] + vt[at_v(npx - 2, npy)] + vt[at_v(npx - 2, npy - 1)]
                + vc[at_v(npx - 1, npy - 1)]
                - 0.25
                * cv(npx - 1, npy - 1)
                * (ut[at_u(npx, npy - 1)] + ut[at_u(npx, npy - 2)] + ut[at_u(npx - 1, npy - 2)])
            )
        )
        * damp
    )
    vt = vt.at[at_v(npx - 1, npy - 1)].set(
        (
            vc[at_v(npx - 1, npy - 1)]
            - 0.25
            * cv(npx - 1, npy - 1)
            * (
                ut[at_u(npx, npy - 1)] + ut[at_u(npx, npy - 2)] + ut[at_u(npx - 1, npy - 2)]
                + uc[at_u(npx - 1, npy - 1)]
                - 0.25
                * cu(npx - 1, npy - 1)
                * (vt[at_v(npx - 1, npy)] + vt[at_v(npx - 2, npy)] + vt[at_v(npx - 2, npy - 1)])
            )
        )
        * damp
    )
    # nw corner
    damp = 1.0 / (1.0 - 0.0625 * cu(2, npy) * cv(1, npy + 1))
    ut = ut.at[at_u(2, npy)].set(
        (
            uc[at_u(2, npy)]
            - 0.25
            * cu(2, npy)
            * (
                vt[at_v(1, npy)] + vt[at_v(2, npy)] + vt[at_v(2, npy + 1)]
                + vc[at_v(1, npy + 1)]
                - 0.25
                * cv(1, npy + 1)
                * (ut[at_u(1, npy)] + ut[at_u(1, npy + 1)] + ut[at_u(2, npy + 1)])
            )
        )
        * damp
    )
    damp = 1.0 / (1.0 - 0.0625 * cu(0, npy - 1) * cv(0, npy - 1))
    vt = vt.at[at_v(0, npy - 1)].set(
        (
            vc[at_v(0, npy - 1)]
            - 0.25
            * cv(0, npy - 1)
            * (
                ut[at_u(1, npy - 1)] + ut[at_u(1, npy - 2)] + ut[at_u(0, npy - 2)]
                + uc[at_u(0, npy - 1)]
                - 0.25
                * cu(0, npy - 1)
                * (vt[at_v(0, npy)] + vt[at_v(-1, npy)] + vt[at_v(-1, npy - 1)])
            )
        )
        * damp
    )
    damp = 1.0 / (1.0 - 0.0625 * cu(2, npy - 1) * cv(1, npy - 1))
    ut = ut.at[at_u(2, npy - 1)].set(
        (
            uc[at_u(2, npy - 1)]
            - 0.25
            * cu(2, npy - 1)
            * (
                vt[at_v(1, npy)] + vt[at_v(2, npy)] + vt[at_v(2, npy - 1)]
                + vc[at_v(1, npy - 1)]
                - 0.25
                * cv(1, npy - 1)
                * (ut[at_u(1, npy - 1)] + ut[at_u(1, npy - 2)] + ut[at_u(2, npy - 2)])
            )
        )
        * damp
    )
    vt = vt.at[at_v(1, npy - 1)].set(
        (
            vc[at_v(1, npy - 1)]
            - 0.25
            * cv(1, npy - 1)
            * (
                ut[at_u(1, npy - 1)] + ut[at_u(1, npy - 2)] + ut[at_u(2, npy - 2)]
                + uc[at_u(2, npy - 1)]
                - 0.25
                * cu(2, npy - 1)
                * (vt[at_v(1, npy)] + vt[at_v(2, npy)] + vt[at_v(2, npy - 1)])
            )
        )
        * damp
    )

    # ---------------------------------------------------------------
    # advective courant numbers and area fluxes (:851-900)
    # ---------------------------------------------------------------
    es = SL(1, npx)  # B cols 1..npx
    xfx0 = dt * ut[..., :, es]                       # (..., jc, n+1)
    selx = fbool(xfx0 > 0.0)
    crx = jnp.where(
        selx,
        xfx0 * rdxa[..., :, p(0):p(n) + 1],
        xfx0 * rdxa[..., :, p(1):p(npx) + 1],
    )
    xfx = dy[..., :, es] * xfx0 * jnp.where(
        selx, sin_sg[2][..., :, p(0):p(n) + 1], sin_sg[0][..., :, p(1):p(npx) + 1]
    )
    yfx0 = dt * vt[..., es, :]                       # (..., n+1, jc)
    sely = fbool(yfx0 > 0.0)
    cry = jnp.where(
        sely,
        yfx0 * rdya[..., p(0):p(n) + 1, :],
        yfx0 * rdya[..., p(1):p(npy) + 1, :],
    )
    yfx = dx[..., es, :] * yfx0 * jnp.where(
        sely, sin_sg[3][..., p(0):p(n) + 1, :], sin_sg[1][..., p(1):p(npy) + 1, :]
    )

    cs = SL(1, n)  # compute cells
    ra_x = area[..., :, cs] + (xfx[..., :, :-1] - xfx[..., :, 1:])  # (..., jc, n)
    ra_y = area[..., cs, :] + (yfx[..., :-1, :] - yfx[..., 1:, :])  # (..., n, jc)

    # ---------------------------------------------------------------
    # delp / w / pt transport (:904-1032)
    # ---------------------------------------------------------------
    if do_vort_damp:
        da_min = grid["da_min"]
        damp_vk = (damp_v_k * da_min, (damp_v_k * da_min) ** (nord_v + 1),
                   nord_v, nordv0_k)
        damp_tk = (damp_t_k * da_min, (damp_t_k * da_min) ** (nord_t + 1),
                   nord_t, nordt0_k)
    else:
        damp_vk = damp_tk = None

    fx, fy = fv_tp_2d(
        delp, crx, cry, hord_dp, xfx, yfx, grid, topo, ra_x, ra_y,
        damp_k=damp_vk,
    )

    cx = cx + crx
    cy = cy + cry
    xflux = xflux + fx
    yflux = yflux + fy

    heat_source = jnp.zeros(delp.shape[:-2] + (n, n), dtype)
    dw = jnp.zeros(delp.shape[:-2] + (n, n), dtype)
    w_new = w
    if not hydrostatic:
        if kcoef.get("use_damp_w", True):
            dd8 = kgb * abs(dt)
            _, fx2w, fy2w = _del6_vt_flux_masked(
                nord_w, (damp_w_k * da_min_c, (damp_w_k * da_min_c) ** (nord_w + 1)),
                nordw0_k, w, grid, topo,
            )
            # dw = (fx2(i)-fx2(i+1) + fy2(j)-fy2(j+1)) * rarea on compute cells
            fxw_c = fx2w[..., cs, p(1):p(npx) + 1]
            fyw_c = fy2w[..., p(1):p(npy) + 1, cs]
            dw = (
                (fxw_c[..., :, :-1] - fxw_c[..., :, 1:])
                + (fyw_c[..., :-1, :] - fyw_c[..., 1:, :])
            ) * rarea[..., cs, cs]
            heat_source = dd8 - dw * (w[..., cs, cs] + 0.5 * dw)
        gxw, gyw = fv_tp_2d(
            w, crx, cry, hord_vt, xfx, yfx, grid, topo, ra_x, ra_y, mfx=fx, mfy=fy
        )
        w_new = w.at[..., cs, cs].set(
            delp[..., cs, cs] * w[..., cs, cs]
            + ((gxw[..., :, :-1] - gxw[..., :, 1:]) + (gyw[..., :-1, :] - gyw[..., 1:, :]))
            * rarea[..., cs, cs]
        )

    gx, gy = fv_tp_2d(
        pt, crx, cry, hord_tm, xfx, yfx, grid, topo, ra_x, ra_y,
        mfx=fx, mfy=fy, mass=delp, damp_k=damp_tk,
    )

    delp_new = delp.at[..., cs, cs].add(
        ((fx[..., :, :-1] - fx[..., :, 1:]) + (fy[..., :-1, :] - fy[..., 1:, :]))
        * rarea[..., cs, cs]
    )
    pt_new = pt.at[..., cs, cs].set(
        (
            pt[..., cs, cs] * delp[..., cs, cs]
            + ((gx[..., :, :-1] - gx[..., :, 1:]) + (gy[..., :-1, :] - gy[..., 1:, :]))
            * rarea[..., cs, cs]
        )
        / delp_new[..., cs, cs]
    )

    # ---------------------------------------------------------------
    # kinetic-energy fluxes on the B grid (:1045-1200)
    # ---------------------------------------------------------------
    dt5 = 0.5 * dt
    dt4 = 0.25 * dt
    bsl = SL(1, npx)
    vb = jnp.zeros(u.shape[:-2] + (jb, jb), dtype)
    # interior (B rows 2..npy-1, cols 2..npx-1)
    ri = SL(2, npy - 1)
    vb = vb.at[..., ri, ri].set(
        dt5
        * (
            (vc[..., ri, p(1):p(npx - 2) + 1] + vc[..., ri, p(2):p(npx - 1) + 1])
            - (uc[..., p(1):p(npy - 2) + 1, ri] + uc[..., p(2):p(npy - 1) + 1, ri])
            * cosa[..., ri, ri]
        )
        * rsina[..., ri, ri]
    )
    # i=1 / i=npx extrapolation columns for rows 2..npy-1
    vb = vb.at[..., ri, p(1)].set(
        dt4
        * (
            -vt[..., ri, p(-1)]
            + 3.0 * (vt[..., ri, p(0)] + vt[..., ri, p(1)])
            - vt[..., ri, p(2)]
        )
    )
    vb = vb.at[..., ri, p(npx)].set(
        dt4
        * (
            -vt[..., ri, p(npx - 2)]
            + 3.0 * (vt[..., ri, p(npx - 1)] + vt[..., ri, p(npx)])
            - vt[..., ri, p(npx + 1)]
        )
    )
    # j=1 and j=npy rows
    vb = vb.at[..., p(1), bsl].set(
        dt5 * (vt[..., p(1), p(0):p(n) + 1] + vt[..., p(1), p(1):p(npx) + 1])
    )
    vb = vb.at[..., p(npy), bsl].set(
        dt5 * (vt[..., p(npy), p(0):p(n) + 1] + vt[..., p(npy), p(1):p(npx) + 1])
    )

    ub_f = ytp_v(vb, v, dy, rdy, hord_mt, npx)   # flux of v (..., npx, npx)
    ke_b = vb[..., bsl, bsl] * ub_f

    ub = jnp.zeros(u.shape[:-2] + (jb, jb), dtype)
    rall = SL(1, npy)
    ub = ub.at[..., rall, ri].set(
        dt5
        * (
            (uc[..., p(0):p(npy - 1) + 1, ri] + uc[..., p(1):p(npy) + 1, ri])
            - (vc[..., rall, p(1):p(npx - 2) + 1] + vc[..., rall, p(2):p(npx - 1) + 1])
            * cosa[..., rall, ri]
        )
        * rsina[..., rall, ri]
    )
    # j==1 / j==npy rows use ut extrapolation (cols 2..npx-1)
    ub = ub.at[..., p(1), ri].set(
        dt4
        * (
            -ut[..., p(-1), ri]
            + 3.0 * (ut[..., p(0), ri] + ut[..., p(1), ri])
            - ut[..., p(2), ri]
        )
    )
    ub = ub.at[..., p(npy), ri].set(
        dt4
        * (
            -ut[..., p(npy - 2), ri]
            + 3.0 * (ut[..., p(npy - 1), ri] + ut[..., p(npy), ri])
            - ut[..., p(npy + 1), ri]
        )
    )
    # i=1 / i=npx columns (all rows 1..npy)
    ub = ub.at[..., rall, p(1)].set(
        dt5 * (ut[..., p(0):p(n) + 1, p(1)] + ut[..., p(1):p(npy) + 1, p(1)])
    )
    ub = ub.at[..., rall, p(npx)].set(
        dt5 * (ut[..., p(0):p(n) + 1, p(npx)] + ut[..., p(1):p(npy) + 1, p(npx)])
    )

    vb_f = xtp_u(ub, u, dx, rdx, hord_mt, npx)
    ke_b = 0.5 * (ke_b + ub[..., bsl, bsl] * vb_f)

    # corner KE fixes (:1184-1215)
    dt6 = dt / 6.0
    ke_b = ke_b.at[..., 0, 0].set(
        dt6
        * (
            (ut[at_u(1, 1)] + ut[at_u(1, 0)]) * u[..., p(1), p(1)]
            + (vt[at_v(1, 1)] + vt[at_v(0, 1)]) * v[..., p(1), p(1)]
            + (ut[at_u(1, 1)] + vt[at_v(1, 1)]) * u[..., p(1), p(0)]
        )
    )
    ke_b = ke_b.at[..., 0, npx - 1].set(
        dt6
        * (
            (ut[at_u(npx, 1)] + ut[at_u(npx, 0)]) * u[..., p(1), p(npx - 1)]
            + (vt[at_v(npx, 1)] + vt[at_v(npx - 1, 1)]) * v[..., p(1), p(npx)]
            + (ut[at_u(npx, 1)] - vt[at_v(npx - 1, 1)]) * u[..., p(1), p(npx)]
        )
    )
    ke_b = ke_b.at[..., npy - 1, npx - 1].set(
        dt6
        * (
            (ut[at_u(npx, npy)] + ut[at_u(npx, npy - 1)]) * u[..., p(npy), p(npx - 1)]
            + (vt[at_v(npx, npy)] + vt[at_v(npx - 1, npy)]) * v[..., p(npy - 1), p(npx)]
            + (ut[at_u(npx, npy - 1)] + vt[at_v(npx - 1, npy)]) * u[..., p(npy), p(npx)]
        )
    )
    ke_b = ke_b.at[..., npy - 1, 0].set(
        dt6
        * (
            (ut[at_u(1, npy)] + ut[at_u(1, npy - 1)]) * u[..., p(npy), p(1)]
            + (vt[at_v(1, npy)] + vt[at_v(0, npy)]) * v[..., p(npy - 1), p(1)]
            + (ut[at_u(1, npy - 1)] - vt[at_v(1, npy)]) * u[..., p(npy), p(0)]
        )
    )
    ke = jnp.zeros(u.shape[:-2] + (jb, jb), dtype).at[..., bsl, bsl].set(ke_b)

    # ---------------------------------------------------------------
    # circulation components & relative vorticity (:1217-1235)
    # ---------------------------------------------------------------
    vt_c = u * dx      # (..., jb, jc)
    ut_c = v * dy      # (..., jc, jb)
    wk = rarea * (
        (vt_c[..., 0:jc, :] - vt_c[..., 1:jc + 1, :])
        + (ut_c[..., :, 1:jc + 1] - ut_c[..., :, 0:jc])
    )

    if not hydrostatic:
        w_new = w_new.at[..., cs, cs].set(
            w_new[..., cs, cs] / delp_new[..., cs, cs]
        )
        if kcoef.get("use_damp_w", True):
            w_new = w_new.at[..., cs, cs].add(dw)

    # ---------------------------------------------------------------
    # divergence damping (:1297-1432)
    # ---------------------------------------------------------------
    bs = SL(1, npx)

    def _div_damp_d2(uS, vS, vaS, uaS, ucS, vcS, d2kS):
        """del-2 path: B-grid divergence from covariant winds; returns
        (vort_b0 at B 1..npx, delpc on the full B array)."""
        ptc_s = jnp.zeros(uS.shape[:-2] + (jb, jc), dtype)
        # rows j=1..npy, cols i=0..n+1
        csx = SL(0, n + 1)
        ptc_i = (
            uS[..., bs, csx]
            - 0.5
            * (vaS[..., p(0):p(npy - 1) + 1, csx] + vaS[..., p(1):p(npy) + 1, csx])
            * cosa_v[..., bs, csx]
        ) * dyc[..., bs, csx] * sina_v[..., bs, csx]
        ptc_s = ptc_s.at[..., bs, csx].set(ptc_i)
        for jrow in (p(1), p(npy)):
            selj = fbool(vcS[..., jrow, csx] > 0.0)
            ptc_s = ptc_s.at[..., jrow, csx].set(
                uS[..., jrow, csx]
                * dyc[..., jrow, csx]
                * jnp.where(
                    selj,
                    sin_sg[3][..., jrow - 1, csx],
                    sin_sg[1][..., jrow, csx],
                )
            )
        vort_s = jnp.zeros(uS.shape[:-2] + (jc, jb), dtype)
        csy = SL(0, n + 1)
        is2 = SL(2, npx - 1)
        vort_i = (
            vS[..., csy, is2]
            - 0.5
            * (uaS[..., csy, p(1):p(npx - 2) + 1] + uaS[..., csy, p(2):p(npx - 1) + 1])
            * cosa_u[..., csy, is2]
        ) * dxc[..., csy, is2] * sina_u[..., csy, is2]
        vort_s = vort_s.at[..., csy, is2].set(vort_i)
        for icol in (p(1), p(npx)):
            seli = fbool(ucS[..., csy, icol] > 0.0)
            vort_s = vort_s.at[..., csy, icol].set(
                vS[..., csy, icol]
                * dxc[..., csy, icol]
                * jnp.where(
                    seli,
                    sin_sg[2][..., csy, icol - 1],
                    sin_sg[0][..., csy, icol],
                )
            )
        delpc_b = (
            vort_s[..., p(0):p(npy - 1) + 1, bs] - vort_s[..., p(1):p(npy) + 1, bs]
            + ptc_s[..., bs, p(0):p(npx - 1) + 1] - ptc_s[..., bs, p(1):p(npx) + 1]
        )
        # 3-term corner formulas (reference subtracts the invalid 4th term,
        # sw_core_nlm.F90:1333-1337; direct set avoids reading it at all)
        delpc_b = delpc_b.at[..., 0, 0].set(
            -vort_s[..., p(1), p(1)]
            + ptc_s[..., p(1), p(0)] - ptc_s[..., p(1), p(1)]
        )
        delpc_b = delpc_b.at[..., 0, npx - 1].set(
            -vort_s[..., p(1), p(npx)]
            + ptc_s[..., p(1), p(npx - 1)] - ptc_s[..., p(1), p(npx)]
        )
        delpc_b = delpc_b.at[..., npy - 1, npx - 1].set(
            vort_s[..., p(npy - 1), p(npx)]
            + ptc_s[..., p(npy), p(npx - 1)] - ptc_s[..., p(npy), p(npx)]
        )
        delpc_b = delpc_b.at[..., npy - 1, 0].set(
            vort_s[..., p(npy - 1), p(1)]
            + ptc_s[..., p(npy), p(0)] - ptc_s[..., p(npy), p(1)]
        )
        delpc_b = rarea_c[..., bs, bs] * delpc_b
        dampc = da_min_c * fmax(
            d2kS, fmin(0.20, dddmp * fabs(delpc_b * dt))
        )
        vort_b0 = dampc * delpc_b
        delpc_full = jnp.zeros(uS.shape[:-2] + (jb, jb), dtype).at[
            ..., bs, bs
        ].set(delpc_b)
        return vort_b0, delpc_full

    def _div_damp_dn(divg_dS, wkS, d2kS):
        """del-(2nord+2) path on divg_d; returns (vort_bn at B 1..npx, dd)."""
        dd = divg_dS
        n2 = nord + 1
        for nloop in range(1, nord + 1):
            nt = nord - nloop
            fill_c = nt != 0
            if fill_c:
                dd = halo.fill_corners_scalar(dd, topo, "bgrid", 1)
            vcd = jnp.zeros(dd.shape[:-2] + (jb, jc), dtype)
            vcd = vcd.at[..., :, 0:jc].set(
                (dd[..., :, 1:jc + 1] - dd[..., :, 0:jc]) * divg_u
            )
            if fill_c:
                dd = halo.fill_corners_scalar(dd, topo, "bgrid", 2)
            ucd = jnp.zeros(dd.shape[:-2] + (jc, jb), dtype)
            ucd = ucd.at[..., 0:jc, :].set(
                (dd[..., 1:jc + 1, :] - dd[..., 0:jc, :]) * divg_v
            )
            if fill_c:
                vcd, ucd = halo.fill_corners_vector(vcd, ucd, topo, "dgrid")
            dd_new = jnp.zeros_like(dd)
            dd_new = dd_new.at[..., 1:jc, 1:jc].set(
                (ucd[..., 0:jc - 1, 1:jc] - ucd[..., 1:jc, 1:jc])
                + (vcd[..., 1:jc, 0:jc - 1] - vcd[..., 1:jc, 1:jc])
            )
            # 3-term corner formulas (sw_core_nlm.F90:1388-1392 subtracts the
            # invalid term; direct set never reads it — robust to halo garbage)
            dd_new = dd_new.at[..., p(1), p(1)].set(
                -ucd[..., p(1), p(1)]
                + vcd[..., p(1), p(0)] - vcd[..., p(1), p(1)]
            )
            dd_new = dd_new.at[..., p(1), p(npx)].set(
                -ucd[..., p(1), p(npx)]
                + vcd[..., p(1), p(npx - 1)] - vcd[..., p(1), p(npx)]
            )
            dd_new = dd_new.at[..., p(npy), p(npx)].set(
                ucd[..., p(npy - 1), p(npx)]
                + vcd[..., p(npy), p(npx - 1)] - vcd[..., p(npy), p(npx)]
            )
            dd_new = dd_new.at[..., p(npy), p(1)].set(
                ucd[..., p(npy - 1), p(1)]
                + vcd[..., p(npy), p(0)] - vcd[..., p(npy), p(1)]
            )
            dd = dd_new * rarea_c
        if dddmp < 1.0e-5:
            vort_sm = jnp.zeros(dd.shape[:-2] + (npx, npx), dtype)
        else:
            wkb = a2b_ord4(wkS, grid)
            # safe sqrt: d(sqrt)/ds -> inf at s=0 poisons jvp/vjp tangents on
            # resting trajectories; take subgradient 0 there (value unchanged)
            sm2 = divg_dS[..., bs, bs] ** 2 + wkb[..., bs, bs] ** 2
            smpos = fbool(sm2 > 0.0)
            vort_sm = abs(dt) * jnp.where(
                smpos, jnp.sqrt(jnp.where(smpos, sm2, 1.0)), 0.0
            )
        dd8 = (da_min_c * d4_bg) ** n2
        damp2 = da_min_c * fmax(
            d2kS, fmin(0.20, dddmp * vort_sm)
        )
        vort_bn = damp2 * divg_dS[..., bs, bs] + dd8 * dd[..., bs, bs]
        return vort_bn, dd

    from .transport import mask_band
    k0, mixed = mask_band(nord0_k) if nord > 0 else (u.shape[0], False)
    can_split = (nord > 0 and u.ndim >= 4
                 and u.shape[0] == nord0_k.shape[0] and 0 < k0)
    if nord == 0:
        # pure del-2 everywhere
        vort_b, delpc_full = _div_damp_d2(u, v, va, ua, uc, vc, d2_divg_k)
        divd_saved = delpc_full
        divg_d_new = divg_d
    elif k0 == 0:
        # no sponge levels: pure del-n, the del-2 stencils never run
        vort_b, dd = _div_damp_dn(divg_d, wk, d2_divg_k)
        divd_saved = divg_d
        divg_d_new = dd
    elif can_split:
        # static band split: del-2 on the sponge band [0,k0) (+ del-n blend
        # only if the band has isolated non-sponge levels), del-n below
        vort_bA, delpcA = _div_damp_d2(
            u[:k0], v[:k0], va[:k0], ua[:k0], uc[:k0], vc[:k0],
            d2_divg_k[:k0])
        dsavA, dnewA = delpcA, divg_d[:k0]
        if mixed:
            vort_bAn, ddA = _div_damp_dn(divg_d[:k0], wk[:k0], d2_divg_k[:k0])
            mA = nord0_k[:k0]
            vort_bA = jnp.where(mA, vort_bA, vort_bAn)
            dsavA = jnp.where(mA, delpcA, divg_d[:k0])
            dnewA = jnp.where(mA, divg_d[:k0], ddA)
        if k0 < u.shape[0]:
            vort_bB, ddB = _div_damp_dn(divg_d[k0:], wk[k0:], d2_divg_k[k0:])
            vort_b = jnp.concatenate([vort_bA, vort_bB], axis=0)
            divd_saved = jnp.concatenate([dsavA, divg_d[k0:]], axis=0)
            divg_d_new = jnp.concatenate([dnewA, ddB], axis=0)
        else:
            vort_b, divd_saved, divg_d_new = vort_bA, dsavA, dnewA
    else:
        # fallback: masked single-trace blend (both paths, per-level select)
        vort_b0, delpc_full = _div_damp_d2(u, v, va, ua, uc, vc, d2_divg_k)
        vort_bn, dd = _div_damp_dn(divg_d, wk, d2_divg_k)
        vort_b = jnp.where(nord0_k, vort_b0, vort_bn)
        divd_saved = jnp.where(nord0_k, delpc_full, divg_d)
        divg_d_new = jnp.where(nord0_k, divg_d, dd)
    ke = ke.at[..., bs, bs].add(vort_b)

    # d_con damping-heat vectors (:1436-1448)
    if d_con > 1.0e-5:
        vort_full = jnp.zeros(u.shape[:-2] + (jb, jb), dtype).at[..., bs, bs].set(
            vort_b
        )
        # ub(i,j) = vort(i,j)-vort(i+1,j) on (is:ie, js:je+1)
        ub_h = vort_full[..., bs, p(1):p(n) + 1] - vort_full[..., bs, p(2):p(npx) + 1]
        vb_h = vort_full[..., p(1):p(n) + 1, bs] - vort_full[..., p(2):p(npy) + 1, bs]

    # ---------------------------------------------------------------
    # absolute-vorticity transport & wind update (:1450-1486)
    # ---------------------------------------------------------------
    vort_a = wk + f0

    fxv, fyv = fv_tp_2d(
        vort_a, crx, cry, hord_vt, xfx, yfx, grid, topo, ra_x, ra_y
    )
    # u(i,j) = vt_c + (ke(i,j)-ke(i+1,j)) + fy  on (is:ie, js:je+1)
    u_new = u.at[..., bs, cs].set(
        vt_c[..., bs, cs]
        + (ke[..., bs, p(1):p(n) + 1] - ke[..., bs, p(2):p(npx) + 1])
        + fyv
    )
    v_new = v.at[..., cs, bs].set(
        ut_c[..., cs, bs]
        + (ke[..., p(1):p(n) + 1, bs] - ke[..., p(2):p(npy) + 1, bs])
        - fxv
    )

    # vorticity damping (:1490-1494)
    if do_vort_damp:
        _, fx2d, fy2d = _del6_vt_flux_masked(
            nord_v,
            (damp_v_k * da_min_c, (damp_v_k * da_min_c) ** (nord_v + 1)),
            nordv0_k, wk, grid, topo,
        )
    else:
        fx2d = jnp.zeros(u.shape[:-2] + (jc, jb), dtype)
        fy2d = jnp.zeros(u.shape[:-2] + (jb, jc), dtype)

    if d_con > 1.0e-5:
        # heating due to divergence damping (:1496-1530)
        ub_h2 = (ub_h + fy2d[..., bs, cs]) * rdx[..., bs, cs]
        fy_h = u_new[..., bs, cs] * rdx[..., bs, cs]
        gy_h = fy_h * ub_h2
        vb_h2 = (vb_h - fx2d[..., cs, bs]) * rdy[..., cs, bs]
        fx_h = v_new[..., cs, bs] * rdy[..., cs, bs]
        gx_h = fx_h * vb_h2
        dampc2 = 0.25 * dcon_k
        u2 = fy_h[..., 0:n, :] + fy_h[..., 1:n + 1, :]
        du2 = ub_h2[..., 0:n, :] + ub_h2[..., 1:n + 1, :]
        v2 = fx_h[..., :, 0:n] + fx_h[..., :, 1:n + 1]
        dv2 = vb_h2[..., :, 0:n] + vb_h2[..., :, 1:n + 1]
        heat_source = delp_new[..., cs, cs] * (
            heat_source
            - dampc2
            * rsin2[..., cs, cs]
            * (
                (
                    ub_h2[..., 0:n, :] ** 2
                    + ub_h2[..., 1:n + 1, :] ** 2
                    + vb_h2[..., :, 0:n] ** 2
                    + vb_h2[..., :, 1:n + 1] ** 2
                )
                + 2.0 * (gy_h[..., 0:n, :] + gy_h[..., 1:n + 1, :] + gx_h[..., :, 0:n] + gx_h[..., :, 1:n + 1])
                - cosa_s[..., cs, cs] * (u2 * dv2 + v2 * du2 + du2 * dv2)
            )
        )

    # add diffusive fluxes to momentum (:1533-1543)
    if do_vort_damp:
        u_new = u_new.at[..., bs, cs].add(fy2d[..., bs, cs])
        v_new = v_new.at[..., cs, bs].add(-fx2d[..., cs, bs])

    return dict(
        delp=delp_new, pt=pt_new, u=u_new, v=v_new, w=w_new,
        divg_d=divg_d_new, divd_b=divd_saved,
        cx=cx, cy=cy, xflux=xflux, yflux=yflux,
        crx=crx, cry=cry, xfx=xfx, yfx=yfx,
        heat_source=heat_source,
    )
