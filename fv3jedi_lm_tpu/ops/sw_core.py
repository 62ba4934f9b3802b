"""Lin-Rood C/D-grid shallow-water operators.

Re-derivation of model/sw_core_nlm.F90 in whole-array JAX form:
  d2a2c_vect  (:2746)  D -> A -> C wind interpolation with cube-edge fixes
  c_sw        (:77)    C-grid half step
  d_sw        (:492)   D-grid full step
  divergence_corner (:1661), del6_vt_flux (:1547)
  xtp_u (:1970), ytp_v (:2312)  B-grid advection of wind components

Indexing: Fortran index f (1-based, compute domain 1..n) maps to padded
python index f-1+NG for every stagger.  All faces are whole (is=1, ie=n),
so the reference's face-edge branches become static row/column updates.
Leading dims (npz, 6) are broadcast.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import NG
from ..core.freeze import fbool, fwhere

R3 = 1.0 / 3.0
NEAR_ZERO = 1.0e-9         # KE limiter threshold (sw_core_nlm.F90:37)
A1 = 0.5625
A2 = -0.0625
C1 = -2.0 / 14.0
C2 = 11.0 / 14.0
C3 = 5.0 / 14.0
S11 = 11.0 / 14.0
S14 = 4.0 / 7.0
S15 = 3.0 / 14.0
P1 = 7.0 / 12.0
P2 = -1.0 / 12.0


def F2P(i: int) -> int:
    return i - 1 + NG


def SL(lo: int, hi: int) -> slice:
    """Fortran inclusive index range -> python slice (any stagger)."""
    return slice(F2P(lo), F2P(hi) + 1)


# ----------------------------------------------------------------------
# d2a2c_vect
# ----------------------------------------------------------------------

def _edge_interpolate4(ua4, dxa4):
    """sw_core_nlm.F90 edge_interpolate4: ua4/dxa4 stacked (..., 4)."""
    t1 = dxa4[..., 0] + dxa4[..., 1]
    t2 = dxa4[..., 2] + dxa4[..., 3]
    return 0.5 * (
        ((t1 + dxa4[..., 1]) * ua4[..., 1] - dxa4[..., 1] * ua4[..., 0]) / t1
        + ((t2 + dxa4[..., 2]) * ua4[..., 2] - dxa4[..., 2] * ua4[..., 3]) / t2
    )


def d2a2c_vect(u, v, grid, npx):
    """Returns (ua, va, uc, vc, ut, vt).  dord4 assumed True (c_sw call)."""
    n = npx - 1
    npy = npx
    jc = n + 2 * NG
    dtype = u.dtype
    sin_sg = grid["sin_sg"]
    cosa_u = grid["cosa_u"]
    cosa_v = grid["cosa_v"]
    cosa_s = grid["cosa_s"]
    rsin_u = grid["rsin_u"]
    rsin_v = grid["rsin_v"]
    rsin2 = grid["rsin2"]
    dxa = grid["dxa"]
    dya = grid["dya"]

    npt = 4

    # ---- A-grid midpoint winds (utmp/vtmp) ----
    # 4th order in the interior, 2nd order within npt cells of a face edge
    # (sw_core_nlm.F90:2846-2898)
    utmp4 = jnp.zeros(u.shape[:-2] + (jc, jc), dtype)
    # utmp(i,j) = a2*(u(i,j-1)+u(i,j+2)) + a1*(u(i,j)+u(i,j+1)); cell row jj
    # uses u-lines jj-1 .. jj+2
    utmp4 = utmp4.at[..., 1:jc - 1, :].set(
        A2 * (u[..., 0:jc - 2, :] + u[..., 3:jc + 1, :])
        + A1 * (u[..., 1:jc - 1, :] + u[..., 2:jc, :])
    )
    utmp2 = 0.5 * (u[..., 0:jc, :] + u[..., 1:jc + 1, :])
    vtmp4 = jnp.zeros(v.shape[:-2] + (jc, jc), dtype)
    vtmp4 = vtmp4.at[..., :, 1:jc - 1].set(
        A2 * (v[..., :, 0:jc - 2] + v[..., :, 3:jc + 1])
        + A1 * (v[..., :, 1:jc - 1] + v[..., :, 2:jc])
    )
    vtmp2 = 0.5 * (v[..., :, 0:jc] + v[..., :, 1:jc + 1])

    idx = jnp.arange(jc) - NG + 1  # Fortran cell index along an axis
    in4 = (idx >= npt) & (idx <= npx - npt)   # 4th-order band
    mask4 = in4[:, None] & in4[None, :]        # [j, i]
    utmp = jnp.where(mask4, utmp4, utmp2)
    vtmp = jnp.where(mask4, vtmp4, vtmp2)

    # ---- contravariant cell-center winds ----
    ua = (utmp - vtmp * cosa_s) * rsin2
    va = (vtmp - utmp * cosa_s) * rsin2

    # ---- utmp corner fixes, X-dir (sw_core_nlm.F90:2906-2926) ----
    # every corner-copy block below is batched into one gather + one
    # scatter (sources never alias targets, so order is immaterial)
    p = F2P
    je = n

    def corner_put(dst, src, upd):
        import numpy as np

        tj = np.array([p(t[0]) for t, _, _ in upd])
        ti = np.array([p(t[1]) for t, _, _ in upd])
        sj = np.array([p(s[0]) for _, s, _ in upd])
        si = np.array([p(s[1]) for _, s, _ in upd])
        sg = jnp.asarray(np.array([s for _, _, s in upd], np.float64),
                         dst.dtype)
        return dst.at[..., tj, ti].set(sg * src[..., sj, si])

    utmp = corner_put(utmp, vtmp, [
        ((0, i), (1 - i, 0), -1.0) for i in (-2, -1, 0)] + [
        ((npy, i), (je + i, 0), 1.0) for i in (-2, -1, 0)] + [
        ((0, npx + i), (i + 1, npx), 1.0) for i in (0, 1, 2)] + [
        ((npy, npx + i), (je - i, npx), -1.0) for i in (0, 1, 2)])

    # ---- uc interior 4th order (sw_core_nlm.F90:2936-2944) ----
    jb = jc + 1
    uc = jnp.zeros(u.shape[:-2] + (jc, jb), dtype)
    # uc(i,j) = a2*(utmp(i-2,j)+utmp(i+1,j)) + a1*(utmp(i-1,j)+utmp(i,j))
    uc = uc.at[..., :, 2:jc - 1].set(
        A2 * (utmp[..., :, 0:jc - 3] + utmp[..., :, 3:jc])
        + A1 * (utmp[..., :, 1:jc - 2] + utmp[..., :, 2:jc - 1])
    )
    # (ut is derived from the FINAL uc after the edge-column assembly below)

    # ---- ua corner fixes, X-dir (sw_core_nlm.F90:2946-2962) ----
    ua = corner_put(ua, va, [
        ((0, -1), (2, 0), -1.0), ((0, 0), (1, 0), -1.0),
        ((0, npx), (1, npx), 1.0), ((0, npx + 1), (2, npx), 1.0),
        ((npy, npx), (npy - 1, npx), -1.0),
        ((npy, npx + 1), (npy - 2, npx), -1.0),
        ((npy, -1), (npy - 2, 0), 1.0), ((npy, 0), (npy - 1, 0), 1.0)])

    # ---- west/east edge columns of uc/ut (sw_core_nlm.F90:2964-3000) ----
    # all six uc edge columns assembled in ONE concat; ut recomputed from
    # the final uc (identical off-edge: uc unchanged there) + 2-column fix
    from .ppm import set_cols as _set_cols

    def x_edge_cols(edge_i):
        ei = p(edge_i)
        if edge_i == 1:
            ucm1 = (C1 * utmp[..., :, p(-2)] + C2 * utmp[..., :, p(-1)]
                    + C3 * utmp[..., :, p(0)])
            ucp1 = (C1 * utmp[..., :, p(3)] + C2 * utmp[..., :, p(2)]
                    + C3 * utmp[..., :, p(1)])
            ua4 = jnp.stack([ua[..., :, p(-1)], ua[..., :, p(0)],
                             ua[..., :, p(1)], ua[..., :, p(2)]], -1)
            dx4 = jnp.stack([dxa[..., :, p(-1)], dxa[..., :, p(0)],
                             dxa[..., :, p(1)], dxa[..., :, p(2)]], -1)
            sg3 = sin_sg[2][..., :, p(0)]
            sg1 = sin_sg[0][..., :, p(1)]
        else:
            ucm1 = (C1 * utmp[..., :, p(npx - 3)] + C2 * utmp[..., :, p(npx - 2)]
                    + C3 * utmp[..., :, p(npx - 1)])
            ucp1 = (C3 * utmp[..., :, p(npx)] + C2 * utmp[..., :, p(npx + 1)]
                    + C1 * utmp[..., :, p(npx + 2)])
            ua4 = jnp.stack([ua[..., :, p(npx - 2)], ua[..., :, p(npx - 1)],
                             ua[..., :, p(npx)], ua[..., :, p(npx + 1)]], -1)
            dx4 = jnp.stack([dxa[..., :, p(npx - 2)], dxa[..., :, p(npx - 1)],
                             dxa[..., :, p(npx)], dxa[..., :, p(npx + 1)]], -1)
            sg3 = sin_sg[2][..., :, p(npx - 1)]
            sg1 = sin_sg[0][..., :, p(npx)]
        ute = _edge_interpolate4(ua4, dx4)
        uce = fwhere(ute > 0.0, ute * sg3, ute * sg1)
        return ei, ucm1, uce, ucp1, ute

    eiw, ucw_m1, ucw, ucw_p1, utew = x_edge_cols(1)
    eie, uce_m1, uce, uce_p1, utee = x_edge_cols(npx)
    uc = _set_cols(uc, [(eiw - 1, ucw_m1), (eiw, ucw), (eiw + 1, ucw_p1),
                        (eie - 1, uce_m1), (eie, uce), (eie + 1, uce_p1)])
    ut = (uc - v * cosa_u) * rsin_u
    ut = _set_cols(ut, [(eiw, utew), (eie, utee)])

    # ---- vtmp corner fixes, Y-dir (sw_core_nlm.F90:3004-3024) ----
    ie = n
    vtmp = corner_put(vtmp, utmp, [
        ((j, 0), (0, 1 - j), -1.0) for j in (-2, -1, 0)] + [
        ((j, npx), (0, ie + j), 1.0) for j in (-2, -1, 0)] + [
        ((npy + j, 0), (npy, j + 1), 1.0) for j in (0, 1, 2)] + [
        ((npy + j, npx), (npy, ie - j), -1.0) for j in (0, 1, 2)])
    va = corner_put(va, ua, [
        ((-1, 0), (0, 2), -1.0), ((0, 0), (0, 1), -1.0),
        ((0, npx), (0, npx - 1), 1.0), ((-1, npx), (0, npx - 2), 1.0),
        ((npy, npx), (npy, npx - 1), -1.0),
        ((npy + 1, npx), (npy, npx - 2), -1.0),
        ((npy, 0), (npy, 1), 1.0), ((npy + 1, 0), (npy, 2), 1.0)])

    # ---- vc: interior + edge rows (sw_core_nlm.F90:3026-3058), same
    # batched assembly along axis -2 ----
    from .ppm import _AXY

    vc = jnp.zeros(v.shape[:-2] + (jb, jc), dtype)
    vc = vc.at[..., 2:jc - 1, :].set(
        A2 * (vtmp[..., 0:jc - 3, :] + vtmp[..., 3:jc, :])
        + A1 * (vtmp[..., 1:jc - 2, :] + vtmp[..., 2:jc - 1, :])
    )

    def y_edge_rows(edge_j):
        ej = p(edge_j)
        if edge_j == 1:
            vcm1 = (C1 * vtmp[..., p(-2), :] + C2 * vtmp[..., p(-1), :]
                    + C3 * vtmp[..., p(0), :])
            vcp1 = (C1 * vtmp[..., p(3), :] + C2 * vtmp[..., p(2), :]
                    + C3 * vtmp[..., p(1), :])
            va4 = jnp.stack([va[..., p(-1), :], va[..., p(0), :],
                             va[..., p(1), :], va[..., p(2), :]], -1)
            dy4 = jnp.stack([dya[..., p(-1), :], dya[..., p(0), :],
                             dya[..., p(1), :], dya[..., p(2), :]], -1)
            sg4 = sin_sg[3][..., p(0), :]
            sg2 = sin_sg[1][..., p(1), :]
        else:
            vcm1 = (C1 * vtmp[..., p(npy - 3), :] + C2 * vtmp[..., p(npy - 2), :]
                    + C3 * vtmp[..., p(npy - 1), :])
            vcp1 = (C3 * vtmp[..., p(npy), :] + C2 * vtmp[..., p(npy + 1), :]
                    + C1 * vtmp[..., p(npy + 2), :])
            va4 = jnp.stack([va[..., p(npy - 2), :], va[..., p(npy - 1), :],
                             va[..., p(npy), :], va[..., p(npy + 1), :]], -1)
            dy4 = jnp.stack([dya[..., p(npy - 2), :], dya[..., p(npy - 1), :],
                             dya[..., p(npy), :], dya[..., p(npy + 1), :]], -1)
            sg4 = sin_sg[3][..., p(npy - 1), :]
            sg2 = sin_sg[1][..., p(npy), :]
        vte = _edge_interpolate4(va4, dy4)
        vce = fwhere(vte > 0.0, vte * sg4, vte * sg2)
        return ej, vcm1, vce, vcp1, vte

    ejs, vcs_m1, vcs, vcs_p1, vtes = y_edge_rows(1)
    ejn, vcn_m1, vcn, vcn_p1, vten = y_edge_rows(npy)
    vc = _set_cols(vc, [(ejs - 1, vcs_m1), (ejs, vcs), (ejs + 1, vcs_p1),
                        (ejn - 1, vcn_m1), (ejn, vcn), (ejn + 1, vcn_p1)],
                   _AXY)
    vt = (vc - u * cosa_v) * rsin_v
    vt = _set_cols(vt, [(ejs, vtes), (ejn, vten)], _AXY)

    return ua, va, uc, vc, ut, vt


# ----------------------------------------------------------------------
# scalar corner fills used inside c_sw / d_sw (sw_core_nlm.F90:3186-3297)
# ----------------------------------------------------------------------

_F4C_CACHE: dict = {}


def _f4c_idx(dir_, npx):
    """Static target/source index vectors for fill_4corners."""
    import numpy as np

    key = (dir_, npx)
    hit = _F4C_CACHE.get(key)
    if hit is not None:
        return hit
    p = F2P
    npy = npx
    if dir_ == 1:
        upd = [
            ((-1, 0), (0, 2)), ((0, 0), (0, 1)),
            ((npx + 1, 0), (npx, 2)), ((npx, 0), (npx, 1)),
            ((0, npy), (0, npy - 1)), ((-1, npy), (0, npy - 2)),
            ((npx, npy), (npx, npy - 1)), ((npx + 1, npy), (npx, npy - 2)),
        ]
    else:
        upd = [
            ((0, 0), (1, 0)), ((0, -1), (2, 0)),
            ((npx, 0), (npx - 1, 0)), ((npx, -1), (npx - 2, 0)),
            ((0, npy), (1, npy)), ((0, npy + 1), (2, npy)),
            ((npx, npy), (npx - 1, npy)), ((npx, npy + 1), (npx - 2, npy)),
        ]
    tj = np.array([p(t[1]) for t, _ in upd])
    ti = np.array([p(t[0]) for t, _ in upd])
    sj = np.array([p(s[1]) for _, s in upd])
    si = np.array([p(s[0]) for _, s in upd])
    hit = (tj, ti, sj, si)
    _F4C_CACHE[key] = hit
    return hit


def fill_4corners(q, dir_, npx):
    """fill_4corners for a center scalar (2-deep), sw_core_nlm.F90:3232+.

    All 8 corner copies batched into one gather + one scatter (no source
    aliases any target, so this equals the reference's sequential order)."""
    tj, ti, sj, si = _f4c_idx(dir_, npx)
    return q.at[..., tj, ti].set(q[..., sj, si])


def fill2_4corners(q1, q2, dir_, npx):
    return fill_4corners(q1, dir_, npx), fill_4corners(q2, dir_, npx)


# ----------------------------------------------------------------------
# divergence_corner (sw_core_nlm.F90:1661-1768)
# ----------------------------------------------------------------------

def divergence_corner(u, v, ua, va, grid, npx):
    """B-grid divergence of the D-grid wind; returns divg_d (..., jb, jb)."""
    n = npx - 1
    npy = npx
    jc = n + 2 * NG
    jb = jc + 1
    dtype = u.dtype
    p = F2P
    sin_sg = grid["sin_sg"]
    cos_sg = grid["cos_sg"]
    dxc = grid["dxc"]
    dyc = grid["dyc"]
    rarea_c = grid["rarea_c"]

    # uf at v-positions (rows = B lines), cols center: (..., jb, jc)
    # uf(i,j) = (u - 0.25*(va(i,j-1)+va(i,j))*(cos_sg(i,j-1,4)+cos_sg(i,j,2)))
    #           * dyc * 0.5*(sin_sg(i,j-1,4)+sin_sg(i,j,2))
    uf = jnp.zeros(u.shape, dtype)
    uf_i = (
        u[..., 1:jb - 1, :]
        - 0.25
        * (va[..., 0:jc - 1, :] + va[..., 1:jc, :])
        * (cos_sg[3][..., 0:jc - 1, :] + cos_sg[1][..., 1:jc, :])
    ) * dyc[..., 1:jb - 1, :] * 0.5 * (
        sin_sg[3][..., 0:jc - 1, :] + sin_sg[1][..., 1:jc, :]
    )
    uf = uf.at[..., 1:jb - 1, :].set(uf_i)
    # edge rows j==1, npy: uf = u*dyc*0.5*(sin_sg(i,j-1,4)+sin_sg(i,j,2))
    for jf in (1, npy):
        jj = p(jf)
        uf = uf.at[..., jj, :].set(
            u[..., jj, :]
            * dyc[..., jj, :]
            * 0.5
            * (sin_sg[3][..., jj - 1, :] + sin_sg[1][..., jj, :])
        )

    vf = jnp.zeros(v.shape, dtype)
    vf_i = (
        v[..., :, 1:jb - 1]
        - 0.25
        * (ua[..., :, 0:jc - 1] + ua[..., :, 1:jc])
        * (cos_sg[2][..., :, 0:jc - 1] + cos_sg[0][..., :, 1:jc])
    ) * dxc[..., :, 1:jb - 1] * 0.5 * (
        sin_sg[2][..., :, 0:jc - 1] + sin_sg[0][..., :, 1:jc]
    )
    vf = vf.at[..., :, 1:jb - 1].set(vf_i)
    for if_ in (1, npx):
        ii = p(if_)
        vf = vf.at[..., :, ii].set(
            v[..., :, ii]
            * dxc[..., :, ii]
            * 0.5
            * (sin_sg[2][..., :, ii - 1] + sin_sg[0][..., :, ii])
        )

    # divg_d(i,j) = (vf(i,j-1)-vf(i,j)) + (uf(i-1,j)-uf(i,j)) at B point (i,j).
    # vf rows are cell rows (j-1, j -> padded jjb-1, jjb), cols are B lines;
    # uf rows are B lines, cols are cell cols (i-1, i -> iib-1, iib).
    divg = jnp.zeros(u.shape[:-2] + (jb, jb), dtype)
    divg = divg.at[..., 1:jc, 1:jc].set(
        (vf[..., 0:jc - 1, 1:jc] - vf[..., 1:jc, 1:jc])
        + (uf[..., 1:jc, 0:jc - 1] - uf[..., 1:jc, 1:jc])
    )

    # Corner B points have 3-edge topology: the reference computes the
    # 4-term divergence then subtracts the invalid term ("Remove the extra
    # term at the corners", sw_core_nlm.F90:1755-1759).  We instead SET the
    # 3 valid terms directly — numerically identical in exact arithmetic and
    # immune to garbage halo values (vf rows are cell rows, cols B lines;
    # uf rows are B lines, cols cells).
    divg = divg.at[..., p(1), p(1)].set(        # sw: -vf(1,1)+uf(0,1)-uf(1,1)
        -vf[..., p(1), p(1)] + uf[..., p(1), p(0)] - uf[..., p(1), p(1)]
    )
    divg = divg.at[..., p(1), p(npx)].set(      # se
        -vf[..., p(1), p(npx)] + uf[..., p(1), p(npx - 1)] - uf[..., p(1), p(npx)]
    )
    divg = divg.at[..., p(npy), p(npx)].set(    # ne: +vf(npx,npy-1)
        vf[..., p(npy - 1), p(npx)]
        + uf[..., p(npy), p(npx - 1)] - uf[..., p(npy), p(npx)]
    )
    divg = divg.at[..., p(npy), p(1)].set(      # nw
        vf[..., p(npy - 1), p(1)] + uf[..., p(npy), p(0)] - uf[..., p(npy), p(1)]
    )

    return rarea_c * divg


# ----------------------------------------------------------------------
# del6_vt_flux (sw_core_nlm.F90:1547-1658): del-n damping fluxes of a
# ghosted A-grid field (relative vorticity / w).
# ----------------------------------------------------------------------

def del6_vt_flux(nord, damp, q, grid, topo):
    """Returns (d2, fx2, fy2): damped field + diffusive fluxes (full width)."""
    from ..parallel import halo

    del6_u = grid["del6_u"]
    del6_v = grid["del6_v"]
    rarea = grid["rarea"]
    jc = q.shape[-1]

    d2 = damp * q
    if nord > 0:
        d2 = halo.copy_corners(d2, topo, 1)
    fx2 = jnp.zeros(q.shape[:-1] + (jc + 1,), q.dtype)
    fx2 = fx2.at[..., 1:jc].set(
        del6_v[..., 1:jc] * (d2[..., 0:jc - 1] - d2[..., 1:jc])
    )
    if nord > 0:
        d2 = halo.copy_corners(d2, topo, 2)
    fy2 = jnp.zeros(q.shape[:-2] + (jc + 1,) + q.shape[-1:], q.dtype)
    fy2 = fy2.at[..., 1:jc, :].set(
        del6_u[..., 1:jc, :] * (d2[..., 0:jc - 1, :] - d2[..., 1:jc, :])
    )

    for _ in range(nord):
        d2 = (
            fx2[..., :, 0:jc] - fx2[..., :, 1:jc + 1]
            + fy2[..., 0:jc, :] - fy2[..., 1:jc + 1, :]
        ) * rarea
        d2 = halo.copy_corners(d2, topo, 1)
        fx2 = fx2.at[..., 1:jc].set(
            del6_v[..., 1:jc] * (d2[..., 1:jc] - d2[..., 0:jc - 1])
        )
        d2 = halo.copy_corners(d2, topo, 2)
        fy2 = fy2.at[..., 1:jc, :].set(
            del6_u[..., 1:jc, :] * (d2[..., 1:jc, :] - d2[..., 0:jc - 1, :])
        )
    return d2, fx2, fy2


# ----------------------------------------------------------------------
# c_sw: C-grid Lin-Rood half step (sw_core_nlm.F90:77-489)
# ----------------------------------------------------------------------

def c_sw(delp, pt, u, v, w, uc, vc, grid, topo, dt2, nord, hydrostatic, npx):
    """C-grid half-step.

    Inputs are halo-filled padded fields; uc/vc are the current C-grid winds
    (INOUT in the reference; we return the updated pair).  Returns
    (delpc, ptc, wc, uc_new, vc_new, divg_d, ua, va).
    """
    n = npx - 1
    npy = npx
    jc = n + 2 * NG
    jb = jc + 1
    p = F2P
    dtype = u.dtype

    dy = grid["dy"]        # v-pos (..., jc, jb)
    dx = grid["dx"]        # u-pos (..., jb, jc)
    dxc = grid["dxc"]      # uc-pos (..., jc, jb)
    dyc = grid["dyc"]      # vc-pos (..., jb, jc)
    sin_sg = grid["sin_sg"]
    cos_sg = grid["cos_sg"]
    cosa_u = grid["cosa_u"]
    cosa_v = grid["cosa_v"]
    sina_u = grid["sina_u"]
    sina_v = grid["sina_v"]
    rarea = grid["rarea"]
    rarea_c = grid["rarea_c"]
    rdxc = grid["rdxc"]
    rdyc = grid["rdyc"]
    fC = grid["fC"]

    ua, va, uc0, vc0, ut, vt = d2a2c_vect(u, v, grid, npx)
    uc = uc0
    vc = vc0

    if nord > 0:
        divg_d = divergence_corner(u, v, ua, va, grid, npx)
    else:
        divg_d = jnp.zeros(u.shape[:-2] + (jb, jb), dtype)

    # ---- courant-like transport winds (sw_core_nlm.F90:160-180) ----
    # ut(i,j) = dt2*ut*dy*sin_sg(i-1 or i, j, 3 or 1), edge-aligned cols
    ut_s = jnp.zeros_like(ut)
    sel = fbool(ut[..., :, 1:jc] > 0.0)
    ut_s = ut_s.at[..., :, 1:jc].set(
        dt2 * ut[..., :, 1:jc] * dy[..., :, 1:jc]
        * jnp.where(sel, sin_sg[2][..., :, 0:jc - 1], sin_sg[0][..., :, 1:jc])
    )
    vt_s = jnp.zeros_like(vt)
    selv = fbool(vt[..., 1:jc, :] > 0.0)
    vt_s = vt_s.at[..., 1:jc, :].set(
        dt2 * vt[..., 1:jc, :] * dx[..., 1:jc, :]
        * jnp.where(selv, sin_sg[3][..., 0:jc - 1, :], sin_sg[1][..., 1:jc, :])
    )
    ut = ut_s
    vt = vt_s

    # ---- transport delp / pt / w (sw_core_nlm.F90:182-284) ----
    delp_x, pt_x = fill2_4corners(delp, pt, 1, npx)
    w_x = fill_4corners(w, 1, npx) if not hydrostatic else w
    selx = fbool(ut[..., :, 1:jc] > 0.0)
    fx1 = jnp.zeros_like(ut)
    fx1 = fx1.at[..., :, 1:jc].set(
        ut[..., :, 1:jc]
        * jnp.where(selx, delp_x[..., :, 0:jc - 1], delp_x[..., :, 1:jc])
    )
    fx = jnp.zeros_like(ut)
    fx = fx.at[..., :, 1:jc].set(
        fx1[..., :, 1:jc]
        * jnp.where(selx, pt_x[..., :, 0:jc - 1], pt_x[..., :, 1:jc])
    )
    if not hydrostatic:
        fx2 = jnp.zeros_like(ut)
        fx2 = fx2.at[..., :, 1:jc].set(
            fx1[..., :, 1:jc]
            * jnp.where(selx, w_x[..., :, 0:jc - 1], w_x[..., :, 1:jc])
        )

    delp_y, pt_y = fill2_4corners(delp, pt, 2, npx)
    w_y = fill_4corners(w, 2, npx) if not hydrostatic else w
    sely = fbool(vt[..., 1:jc, :] > 0.0)
    fy1 = jnp.zeros_like(vt)
    fy1 = fy1.at[..., 1:jc, :].set(
        vt[..., 1:jc, :]
        * jnp.where(sely, delp_y[..., 0:jc - 1, :], delp_y[..., 1:jc, :])
    )
    fy = jnp.zeros_like(vt)
    fy = fy.at[..., 1:jc, :].set(
        fy1[..., 1:jc, :]
        * jnp.where(sely, pt_y[..., 0:jc - 1, :], pt_y[..., 1:jc, :])
    )
    if not hydrostatic:
        fy2 = jnp.zeros_like(vt)
        fy2 = fy2.at[..., 1:jc, :].set(
            fy1[..., 1:jc, :]
            * jnp.where(sely, w_y[..., 0:jc - 1, :], w_y[..., 1:jc, :])
        )

    # cell updates over [is-1, ie+1]^2 = cells 0..n+1
    cs = slice(p(0), p(n + 1) + 1)
    div1 = (
        fx1[..., cs, p(0):p(n + 2) + 1][..., :, :-1]
        - fx1[..., cs, p(0):p(n + 2) + 1][..., :, 1:]
        + fy1[..., p(0):p(n + 2) + 1, cs][..., :-1, :]
        - fy1[..., p(0):p(n + 2) + 1, cs][..., 1:, :]
    ) * rarea[..., cs, cs]
    divt = (
        fx[..., cs, p(0):p(n + 2) + 1][..., :, :-1]
        - fx[..., cs, p(0):p(n + 2) + 1][..., :, 1:]
        + fy[..., p(0):p(n + 2) + 1, cs][..., :-1, :]
        - fy[..., p(0):p(n + 2) + 1, cs][..., 1:, :]
    ) * rarea[..., cs, cs]
    delpc = jnp.zeros_like(delp)
    delpc_i = delp[..., cs, cs] + div1
    delpc = delpc.at[..., cs, cs].set(delpc_i)
    ptc = jnp.zeros_like(pt)
    ptc = ptc.at[..., cs, cs].set(
        (pt[..., cs, cs] * delp[..., cs, cs] + divt) / delpc_i
    )
    wc = jnp.zeros_like(w)
    if not hydrostatic:
        divw = (
            fx2[..., cs, p(0):p(n + 2) + 1][..., :, :-1]
            - fx2[..., cs, p(0):p(n + 2) + 1][..., :, 1:]
            + fy2[..., p(0):p(n + 2) + 1, cs][..., :-1, :]
            - fy2[..., p(0):p(n + 2) + 1, cs][..., 1:, :]
        ) * rarea[..., cs, cs]
        wc = wc.at[..., cs, cs].set(
            (w[..., cs, cs] * delp[..., cs, cs] + divw) / delpc_i
        )

    # ---- kinetic energy (sw_core_nlm.F90:286-365), cells 0..n+1 ----
    # x part: upwind uc with edge covariant correction
    ke_pos = uc[..., cs, p(0):p(n + 1) + 1]          # uc(i,j), cells 0..n+1
    ke_neg = uc[..., cs, p(1):p(n + 2) + 1]          # uc(i+1,j)
    # overrides (column positions within the cell window 0..n+1)
    v_1 = v[..., cs, p(1)]
    v_n = v[..., cs, p(npx)]
    uc_1 = uc[..., cs, p(1)]
    uc_n = uc[..., cs, p(npx)]
    ke_pos = ke_pos.at[..., :, 1].set(
        uc_1 * sin_sg[0][..., cs, p(1)] + v_1 * cos_sg[0][..., cs, p(1)]
    )
    ke_pos = ke_pos.at[..., :, npx].set(
        uc_n * sin_sg[0][..., cs, p(npx)] + v_n * cos_sg[0][..., cs, p(npx)]
    )
    ke_neg = ke_neg.at[..., :, 0].set(
        uc_1 * sin_sg[2][..., cs, p(0)] + v_1 * cos_sg[2][..., cs, p(0)]
    )
    ke_neg = ke_neg.at[..., :, npx - 1].set(
        uc_n * sin_sg[2][..., cs, p(npx - 1)] + v_n * cos_sg[2][..., cs, p(npx - 1)]
    )
    ke_x = fwhere(ua[..., cs, cs] > 0.0, ke_pos, ke_neg)

    vo_pos = vc[..., p(0):p(n + 1) + 1, cs]
    vo_neg = vc[..., p(1):p(n + 2) + 1, cs]
    u_1 = u[..., p(1), cs]
    u_n = u[..., p(npy), cs]
    vc_1 = vc[..., p(1), cs]
    vc_n = vc[..., p(npy), cs]
    vo_pos = vo_pos.at[..., 1, :].set(
        vc_1 * sin_sg[1][..., p(1), cs] + u_1 * cos_sg[1][..., p(1), cs]
    )
    vo_pos = vo_pos.at[..., npy, :].set(
        vc_n * sin_sg[1][..., p(npy), cs] + u_n * cos_sg[1][..., p(npy), cs]
    )
    vo_neg = vo_neg.at[..., 0, :].set(
        vc_1 * sin_sg[3][..., p(0), cs] + u_1 * cos_sg[3][..., p(0), cs]
    )
    vo_neg = vo_neg.at[..., npy - 1, :].set(
        vc_n * sin_sg[3][..., p(npy - 1), cs] + u_n * cos_sg[3][..., p(npy - 1), cs]
    )
    ke_y = fwhere(va[..., cs, cs] > 0.0, vo_pos, vo_neg)

    dt4 = 0.5 * dt2
    ke = jnp.zeros_like(delp)
    ke = ke.at[..., cs, cs].set(
        dt4 * (ua[..., cs, cs] * ke_x + va[..., cs, cs] * ke_y)
    )

    # ---- circulation -> absolute vorticity on B grid (:367-400) ----
    fxc = uc * dxc                                     # (..., jc, jb)
    fyc = vc * dyc                                     # (..., jb, jc)
    bs = slice(p(1), p(npx) + 1)                       # B points 1..npx
    # vort(i,j) = fx(i,j-1)-fx(i,j) + fy(i,j)-fy(i-1,j); fx rows are cell rows
    vort_c = (
        fxc[..., p(0):p(npy - 1) + 1, bs] - fxc[..., p(1):p(npy) + 1, bs]
        + fyc[..., bs, p(1):p(npx) + 1] - fyc[..., bs, p(0):p(npx - 1) + 1]
    )
    # 3-term corner circulation (reference add-cancels the invalid term,
    # sw_core_nlm.F90:388-392; direct set is exact and garbage-immune)
    vort_c = vort_c.at[..., 0, 0].set(
        fxc[..., p(0), p(1)] - fxc[..., p(1), p(1)] + fyc[..., p(1), p(1)]
    )
    vort_c = vort_c.at[..., 0, npx - 1].set(
        fxc[..., p(0), p(npx)] - fxc[..., p(1), p(npx)]
        - fyc[..., p(1), p(npx - 1)]
    )
    vort_c = vort_c.at[..., npy - 1, npx - 1].set(
        fxc[..., p(npy - 1), p(npx)] - fxc[..., p(npy), p(npx)]
        - fyc[..., p(npy), p(npx - 1)]
    )
    vort_c = vort_c.at[..., npy - 1, 0].set(
        fxc[..., p(npy - 1), p(1)] - fxc[..., p(npy), p(1)]
        + fyc[..., p(npy), p(1)]
    )
    vort_b = fC[..., bs, bs] + rarea_c[..., bs, bs] * vort_c   # (..., npy, npx)

    # ---- vorticity transport & wind update (:402-489) ----
    # fy1 at uc positions, rows cells 1..n, cols B 1..npx
    rs = slice(p(1), p(n) + 1)
    fy1 = dt2 * (
        v[..., rs, bs] - uc[..., rs, bs] * cosa_u[..., rs, bs]
    ) / sina_u[..., rs, bs]
    fy1 = fy1.at[..., :, 0].set(dt2 * v[..., rs, p(1)])
    fy1 = fy1.at[..., :, npx - 1].set(dt2 * v[..., rs, p(npx)])
    # upwind vort_b along y: for cell row j, rows j / j+1 of B
    fyv = fwhere(fy1 > 0.0, vort_b[..., 0:n, :], vort_b[..., 1:n + 1, :])

    # fx1 at vc positions, rows B 1..npy, cols cells 1..n
    fx1v = dt2 * (
        u[..., bs, rs] - vc[..., bs, rs] * cosa_v[..., bs, rs]
    ) / sina_v[..., bs, rs]
    fx1v = fx1v.at[..., 0, :].set(dt2 * u[..., p(1), rs])
    fx1v = fx1v.at[..., npy - 1, :].set(dt2 * u[..., p(npy), rs])
    fxv = fwhere(fx1v > 0.0, vort_b[..., :, 0:n], vort_b[..., :, 1:n + 1])

    uc_new = uc.at[..., rs, bs].add(
        fy1 * fyv
        + rdxc[..., rs, bs]
        * (ke[..., rs, p(0):p(n) + 1] - ke[..., rs, p(1):p(npx) + 1])
    )
    vc_new = vc.at[..., bs, rs].add(
        -fx1v * fxv
        + rdyc[..., bs, rs]
        * (ke[..., p(0):p(n) + 1, rs] - ke[..., p(1):p(npy) + 1, rs])
    )

    # ut/vt: the dt2-scaled C-grid transport winds (area-flux form); the
    # NH update_dz_c consumes them (nh_utils_nlm.F90:43-181)
    return delpc, ptc, wc, uc_new, vc_new, divg_d, ua, va, ut, vt
