"""Vertical remapping (Lagrangian -> Eulerian), fv_mapz_nlm.F90 re-derived.

TPU-native formulation: instead of the reference's per-column sequential
layer-search loops (map1_ppm/map_scalar, fv_mapz_nlm.F90:1237-1422), the
remap is expressed through the *cumulative mass function*

    M(p) = integral of the piecewise-parabolic reconstruction from ptop to p

which is exact for PPM (each whole layer contributes mean*dp) and reduces the
remap to two vectorized evaluations per target interface:

    q2(k) = (M(pe2(k+1)) - M(pe2(k))) / (pe2(k+1) - pe2(k))

Layer location uses a vmapped binary search over the (monotone) source
interfaces; the result is algebraically identical to the reference loops.

The vertical-edge reconstruction (cs_profile, fv_mapz_nlm.F90:2113-2464) is a
per-column tridiagonal solve done with `lax.scan` over k, then the kord-
specific limiters as vectorized selects.  |kord| > 16 is the perfectly-linear
scheme used by the perturbation remap (kord 17, fv_arrays_tlmadm.F90).

Vertical axis is LEADING everywhere in this module.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..core.freeze import fbool, fclip, fint, fmax, fmin, fwhere

R3 = 1.0 / 3.0
R12 = 1.0 / 12.0
T_MIN = 184.0  # map_scalar t_min (fv_mapz_nlm.F90:33 area; GEOS uses 184K floor)


# ----------------------------------------------------------------------
# cs_profile: edge-value tridiagonal + limiters
# ----------------------------------------------------------------------

def _edge_tridiag(a1, delp):
    """Edge values by the cubic-spline-like tridiagonal (cs_profile else
    branch, fv_mapz_nlm.F90:2158-2186).  a1, delp: (km, ...)."""
    km = a1.shape[0]
    grat1 = delp[1] / delp[0]
    bet1 = grat1 * (grat1 + 0.5)
    q1 = ((grat1 + grat1) * (grat1 + 1.0) * a1[0] + a1[1]) / bet1
    gam1 = (1.0 + grat1 * (grat1 + 1.5)) / bet1

    def fwd(carry, x):
        q_prev, gam_prev = carry
        a_km1, a_k, d4 = x
        bet = 2.0 + d4 + d4 - gam_prev
        q_k = (3.0 * (a_km1 + d4 * a_k) - q_prev) / bet
        gam_k = d4 / bet
        return (q_k, gam_k), (q_k, gam_k)

    d4s = delp[:-1] / delp[1:]                     # (km-1, ...) d4 at k=2..km
    (_, _), (qs_, gams_) = lax.scan(fwd, (q1, gam1), (a1[:-1], a1[1:], d4s))
    q = jnp.concatenate([q1[None], qs_], axis=0)       # q(1..km)
    gam = jnp.concatenate([gam1[None], gams_], axis=0)  # gam(1..km)

    d4 = d4s[-1]
    a_bot = 1.0 + d4 * (d4 + 1.5)
    q_kp1 = (
        2.0 * d4 * (d4 + 1.0) * a1[-1] + a1[-2] - a_bot * q[-1]
    ) / (d4 * (d4 + 0.5) - a_bot * gam[-1])

    def bwd(q_next, x):
        q_k, gam_k = x
        q_new = q_k - gam_k * q_next
        return q_new, q_new

    _, q_rev = lax.scan(bwd, q_kp1, (q[::-1], gam[::-1]))
    q_edges = jnp.concatenate([q_rev[::-1], q_kp1[None]], axis=0)  # (km+1, ...)
    return q_edges, gam


def _edge_tridiag_w(a1, delp, qs):
    """iv == -2 variant with bottom BC qs (fv_mapz_nlm.F90:2135-2156)."""
    km = a1.shape[0]
    q1 = 1.5 * a1[0]
    gam2 = jnp.full_like(a1[0], 0.5)

    def fwd(carry, x):
        q_prev, gam_k = carry
        a_km1, a_k, grat = x
        bet = 2.0 + grat + grat - gam_k
        q_k = (3.0 * (a_km1 + a_k) - q_prev) / bet
        gam_next = grat / bet
        return (q_k, gam_next), (q_k, gam_next)

    grats = delp[:-2] / delp[1:-1]   # k=2..km-1
    (_, gam_km), (qs_, gams_) = lax.scan(fwd, (q1, gam2), (a1[:-2], a1[1:-1], grats))
    grat = delp[-2] / delp[-1]
    q_km = (3.0 * (a1[-2] + a1[-1]) - grat * qs - qs_[-1]) / (
        2.0 + grat + grat - gam_km
    )
    q = jnp.concatenate([q1[None], qs_, q_km[None]], axis=0)   # q(1..km)
    gam = jnp.concatenate([gam2[None], gams_], axis=0)         # gam(2..km)

    # backward: k = km-1 .. 1 with q(k) -= gam(k+1)*q(k+1); q(km) is final
    def bwd(q_next, x):
        q_k, gam_kp1 = x
        q_new = q_k - gam_kp1 * q_next
        return q_new, q_new

    _, q_rev = lax.scan(bwd, q[-1], (q[:-1][::-1], gam[::-1]))
    return jnp.concatenate([q_rev[::-1], q[-1][None], qs[None]], axis=0), None


def _cs_limiters(a1, a2, a3, a4, extm, iv):
    """cs_limiters (fv_mapz_nlm.F90:2467-2542), vectorized."""
    if iv == 0:
        nonpos = fbool(a1 <= 0.0)
        da1 = a3 - a2
        cond = jnp.abs(da1) < -a4
        f_min = a1 + 0.25 * da1**2 / fwhere(a4 == 0, 1.0, a4) + a4 * R12
        neg_min = fbool(cond & (f_min < 0.0))
        c_mid = fbool((a1 < a3) & (a1 < a2))
        c_right = fbool(a3 > a2)
        a4_mid = jnp.zeros_like(a4)
        a4_r = 3.0 * (a2 - a1)
        a3_r = a2 - a4_r
        a4_l = 3.0 * (a3 - a1)
        a2_l = a3 - a4_l
        a2n = jnp.where(c_mid, a1, jnp.where(c_right, a2, a2_l))
        a3n = jnp.where(c_mid, a1, jnp.where(c_right, a3_r, a3))
        a4n = jnp.where(c_mid, a4_mid, jnp.where(c_right, a4_r, a4_l))
        a2f = jnp.where(neg_min, a2n, a2)
        a3f = jnp.where(neg_min, a3n, a3)
        a4f = jnp.where(neg_min, a4n, a4)
        return (
            jnp.where(nonpos, a1, a2f),
            jnp.where(nonpos, a1, a3f),
            jnp.where(nonpos, 0.0, a4f),
        )
    if iv == 1:
        mono = fbool((a1 - a2) * (a1 - a3) >= 0.0)
    else:  # iv == 2: standard PPM constraint keyed on extm
        mono = extm
    da1 = a3 - a2
    da2 = da1**2
    a6da = a4 * da1
    a4_r = 3.0 * (a2 - a1)
    a3_r = a2 - a4_r
    a4_l = 3.0 * (a3 - a1)
    a2_l = a3 - a4_l
    under = fbool(a6da < -da2)
    over = fbool(a6da > da2)
    a2n = jnp.where(under, a2, jnp.where(over, a2_l, a2))
    a3n = jnp.where(under, a3_r, a3)
    a4n = jnp.where(under, a4_r, jnp.where(over, a4_l, a4))
    return (
        jnp.where(mono, a1, a2n),
        jnp.where(mono, a1, a3n),
        jnp.where(mono, 0.0, a4n),
    )


def cs_profile(qs, a1, delp, iv, kord):
    """Vertical PPM edge reconstruction (fv_mapz_nlm.F90:2113-2464).

    a1/delp: (km, ...) cell means / thicknesses; qs: (...) bottom BC (only
    used for iv==-2).  Returns (a2, a3, a4) each (km, ...).
    """
    km = a1.shape[0]
    if iv == -2:
        q, _ = _edge_tridiag_w(a1, delp, qs)
    else:
        q, _ = _edge_tridiag(a1, delp)

    if abs(kord) > 16:
        a2 = q[:-1]
        a3 = q[1:]
        a4 = 3.0 * (2.0 * a1 - (a2 + a3))
        return a2, a3, a4

    # ---- large-scale constraints (:2205-2248) ----
    gam = jnp.concatenate(
        [jnp.zeros_like(a1[0])[None], a1[1:] - a1[:-1]], axis=0
    )  # gam(k) = a1(k)-a1(k-1), k=2..km stored at index k-1
    q = q.at[1].set(
        fclip(q[1], fmin(a1[0], a1[1]), fmax(a1[0], a1[1]))
    )
    # interior k=3..km-1 (idx 2..km-2): keyed on gam(k-1)*gam(k+1)
    if km > 3:
        qi = q[2:km - 1]                    # q(k) for k=3..km-1
        a_km1 = a1[1:km - 2]
        a_k = a1[2:km - 1]
        g_lo = gam[2:km - 1]                # gam(k) = a1(k)-a1(k-1)
        g_m1 = gam[1:km - 2]                # gam(k-1)
        g_p1 = gam[3:km]                    # gam(k+1)
        smooth = fbool(g_m1 * g_p1 > 0.0)
        q_cl = fclip(qi, fmin(a_km1, a_k), fmax(a_km1, a_k))
        has_max = fbool(g_m1 > 0.0)
        q_max = fmax(qi, fmin(a_km1, a_k))
        q_min = fmin(qi, fmax(a_km1, a_k))
        if iv == 0:
            q_min = fmax(0.0, q_min)
        q_new = jnp.where(smooth, q_cl, jnp.where(has_max, q_max, q_min))
        q = q.at[2:km - 1].set(q_new)
    q = q.at[km - 1].set(
        fclip(q[km - 1], fmin(a1[km - 2], a1[km - 1]),
              fmax(a1[km - 2], a1[km - 1]))
    )

    a2 = q[:-1]
    a3 = q[1:]

    # extremum detection (:2250-2261)
    extm_mid = gam[1:-1] * gam[2:] < 0.0 if km > 2 else None
    extm_top = (a2[0] - a1[0]) * (a3[0] - a1[0]) > 0.0
    extm_bot = (a2[-1] - a1[-1]) * (a3[-1] - a1[-1]) > 0.0
    extm = fbool(jnp.concatenate(
        [extm_top[None], extm_mid, extm_bot[None]], axis=0
    ))

    # ---- subgrid constraints (:2266-2464) ----
    # top boundary treatment
    if iv == 0:
        a2 = a2.at[0].set(fmax(0.0, a2[0]))
    elif iv == -1:
        a2 = a2.at[0].set(fwhere(a2[0] * a1[0] <= 0.0, 0.0, a2[0]))
    elif iv == 2:
        a2 = a2.at[0].set(a1[0])
        a3 = a3.at[0].set(a1[0])

    a4 = 3.0 * (2.0 * a1 - (a2 + a3))
    if iv != 2:
        l2, l3, l4 = _cs_limiters(a1[0], a2[0], a3[0], a4[0], extm[0], 1)
        a2 = a2.at[0].set(l2)
        a3 = a3.at[0].set(l3)
        a4 = a4.at[0].set(l4)
    l2, l3, l4 = _cs_limiters(a1[1], a2[1], a3[1], a4[1], extm[1], 2)
    a2 = a2.at[1].set(l2)
    a3 = a3.at[1].set(l3)
    a4 = a4.at[1].set(l4)

    # interior k=3..km-2 (idx 2..km-3): Huynh constraints per kord
    if km > 4:
        sl = slice(2, km - 2)
        a1i, a2i, a3i = a1[sl], a2[sl], a3[sl]
        exi = extm[sl]
        ex_m1 = extm[1:km - 3]
        ex_p1 = extm[3:km - 1]
        g_k = gam[sl]             # gam(k)
        g_m1 = gam[1:km - 3]      # gam(k-1)
        g_p1 = gam[3:km - 1]      # gam(k+1)
        g_p2 = gam[4:km]          # gam(k+2)
        pmp_1 = a1i - 2.0 * g_p1
        lac_1 = pmp_1 + 1.5 * g_p2
        a2h = fclip(
            a2i,
            fmin(fmin(a1i, pmp_1), lac_1),
            fmax(fmax(a1i, pmp_1), lac_1),
        )
        pmp_2 = a1i + 2.0 * g_k
        lac_2 = pmp_2 - 1.5 * g_m1
        a3h = fclip(
            a3i,
            fmin(fmin(a1i, pmp_2), lac_2),
            fmax(fmax(a1i, pmp_2), lac_2),
        )
        ak = abs(kord)
        if ak < 9:
            a2n, a3n = a2h, a3h
            a4n = 3.0 * (2.0 * a1i - (a2n + a3n))
        elif ak == 9:
            wave = exi & (ex_m1 | ex_p1)
            a4_0 = 6.0 * a1i - 3.0 * (a2i + a3i)
            nonmono = fbool(jnp.abs(a4_0) > jnp.abs(a2i - a3i))
            a2n = jnp.where(wave, a1i, jnp.where(nonmono, a2h, a2i))
            a3n = jnp.where(wave, a1i, jnp.where(nonmono, a3h, a3i))
            a4n = jnp.where(
                wave, 0.0, 6.0 * a1i - 3.0 * (a2n + a3n)
            )
        elif ak == 10:
            wave = exi & (ex_m1 | ex_p1)
            true_ext = exi & ~(ex_m1 | ex_p1)
            a4_0 = 6.0 * a1i - 3.0 * (a2i + a3i)
            nonmono = fbool((~exi) & (jnp.abs(a4_0) > jnp.abs(a2i - a3i)))
            a2n = jnp.where(wave, a1i, jnp.where(nonmono, a2h, a2i))
            a3n = jnp.where(wave, a1i, jnp.where(nonmono, a3h, a3i))
            a4n = jnp.where(wave, 0.0, 6.0 * a1i - 3.0 * (a2n + a3n))
        else:  # treat remaining kords with the <9 constraint family
            a2n, a3n = a2h, a3h
            a4n = 3.0 * (2.0 * a1i - (a2n + a3n))
        if iv == 0:
            a2n, a3n, a4n = _cs_limiters(a1i, a2n, a3n, a4n, exi, 0)
        a2 = a2.at[sl].set(a2n)
        a3 = a3.at[sl].set(a3n)
        a4 = a4.at[sl].set(a4n)

    # bottom two layers (:2437-2463)
    if iv == 0:
        a3 = a3.at[km - 1].set(fmax(0.0, a3[km - 1]))
    elif iv == -1:
        a3 = a3.at[km - 1].set(
            fwhere(a3[km - 1] * a1[km - 1] <= 0.0, 0.0, a3[km - 1])
        )
    for k, lim in ((km - 2, 2), (km - 1, 1)):
        a4 = a4.at[k].set(3.0 * (2.0 * a1[k] - (a2[k] + a3[k])))
        l2, l3, l4 = _cs_limiters(a1[k], a2[k], a3[k], a4[k], extm[k], lim)
        a2 = a2.at[k].set(l2)
        a3 = a3.at[k].set(l3)
        a4 = a4.at[k].set(l4)

    return a2, a3, a4


# ----------------------------------------------------------------------
# remap evaluation via the cumulative-integral form
# ----------------------------------------------------------------------

def _locate(pe1_int, p):
    """Index l (0-based) of the source layer containing pressure p.

    pe1_int: (km-1, ncol) interior source interfaces; p: (kn+1, ncol).
    """
    km1, ncol = pe1_int.shape

    def per_col(edges, targets):
        return jnp.searchsorted(edges, targets, side="right")

    idx = jax.vmap(per_col, in_axes=(1, 1), out_axes=1)(pe1_int, p)
    return idx  # in [0, km-1]


def remap_column(pe1, pe2, a1, a2, a3, a4):
    """Integrate the PPM reconstruction of (a1,a2,a3,a4) on source interfaces
    pe1 onto target cells bounded by pe2.  All (k, ncol) with k leading."""
    km = a1.shape[0]
    dp1 = pe1[1:] - pe1[:-1]
    # cumulative integral at source interfaces
    cums = jnp.concatenate(
        [jnp.zeros_like(a1[:1]), jnp.cumsum(a1 * dp1, axis=0)], axis=0
    )

    idx = fint(_locate(pe1[1:-1], pe2), maxval=km)       # (kn+1, ncol)
    pe1_l = jnp.take_along_axis(pe1, idx, axis=0)
    dp_l = jnp.take_along_axis(dp1, idx, axis=0)
    c_l = jnp.take_along_axis(cums, idx, axis=0)
    a2_l = jnp.take_along_axis(a2, idx, axis=0)
    a3_l = jnp.take_along_axis(a3, idx, axis=0)
    a4_l = jnp.take_along_axis(a4, idx, axis=0)
    xi = fclip((pe2 - pe1_l) / dp_l, 0.0, 1.0)
    # f(s) = aL + s*(aR-aL+a6) - a6 s^2 ;  F(xi) = int_0^xi f ds
    b = a3_l - a2_l + a4_l
    f_int = a2_l * xi + 0.5 * b * xi**2 - a4_l * R3 * xi**3
    m = c_l + dp_l * f_int                                # (kn+1, ncol)
    dq = m[1:] - m[:-1]
    dp2 = pe2[1:] - pe2[:-1]
    return dq / dp2


def map1_ppm(pe1, q1, qs, pe2, iv, kord, q_min=None):
    """Remap q1 from coordinate pe1 to pe2 (map1_ppm / map_scalar).

    pe1/pe2: (km+1, ...); q1: (km, ...); qs: (...) bottom BC (iv==-2).
    q_min: optional floor applied to the result (map_scalar's t_min role is
    applied inside scalar_profile in the reference; the floor here preserves
    the guarantee for the remapped means).
    """
    shp = q1.shape
    km = shp[0]
    q1f = q1.reshape(km, -1)
    pe1f = pe1.reshape(km + 1, -1)
    pe2f = pe2.reshape(km + 1, -1)
    qsf = qs.reshape(-1) if qs is not None else jnp.zeros_like(q1f[0])

    a2, a3, a4 = cs_profile(qsf, q1f, pe1f[1:] - pe1f[:-1], iv, kord)
    out = remap_column(pe1f, pe2f, q1f, a2, a3, a4)
    if q_min is not None:
        out = fmax(out, q_min)
    return out.reshape(shp)


def map1_q2(pe1, q1, pe2, kord, q_min=0.0):
    """Single-tracer remap variant (map1_q2, fv_mapz_nlm.F90:1541-1633):
    iv=0 positive-definite scalar remap with a floor — the per-tracer path
    the reference takes for nq <= 5 (Lagrangian_to_Eulerian:407)."""
    return map1_ppm(pe1, q1, None, pe2, 0, kord, q_min=q_min)


def fillz(q, dp):
    """Vertical borrowing fix for negative tracers (fillz,
    fv_fill_nlm.F90:32-135, non-DEV_GFS_PHYS branch).

    q/dp: (km, ncol).  Top layer pushes its deficit down; interior layers
    borrow from above then below (sequential in k — expressed as a
    frozen-branch fscan); the bottom layer borrows from above; columns
    that needed any interior/bottom fix get the final non-local
    renormalization over k=2..km."""
    km = q.shape[0]
    if km < 3:
        return fmax(q, 0.0)

    # top layer (:68-74)
    neg0 = fbool(q[0] < 0.0)
    q1n = jnp.where(neg0, q[1] + q[0] * dp[0] / dp[1], q[1])
    q0n = jnp.where(neg0, 0.0, q[0])
    q = jnp.concatenate([q0n[None], q1n[None], q[2:]], axis=0)

    # interior k=2..km-1 Fortran (:76-96), sequential downward window
    def body(c, x):
        qm1, q0, zfix = c
        q1o, dpm1, dp0, dpp1 = x
        neg = fbool(q0 < 0.0)
        up = fbool(qm1 > 0.0)
        dq = fmin(qm1 * dpm1, -q0 * dp0)
        do_up = neg & up
        qm1 = jnp.where(do_up, qm1 - dq / dpm1, qm1)
        q0 = jnp.where(do_up, q0 + dq / dp0, q0)
        still = fbool(q0 < 0.0)
        dn = fbool(q1o > 0.0)
        dq2 = fmin(q1o * dpp1, -q0 * dp0)
        do_dn = neg & still & dn
        q1o = jnp.where(do_dn, q1o - dq2 / dpp1, q1o)
        q0 = jnp.where(do_dn, q0 + dq2 / dp0, q0)
        return (q0, q1o, zfix | neg), qm1

    from ..core.freeze import fscan

    xs = (q[2:], dp[0:km - 2], dp[1:km - 1], dp[2:])
    (q_km2, q_km1, zfix), fixed = fscan(
        body, (q[0], q[1], jnp.zeros_like(q[0], dtype=bool)), xs)

    # bottom layer (:98-110)
    negb = fbool(q_km1 < 0.0) & fbool(q_km2 > 0.0)
    dup = fmin(q_km2 * dp[km - 2], -q_km1 * dp[km - 1])
    q_km2 = jnp.where(negb, q_km2 - dup / dp[km - 2], q_km2)
    q_km1 = jnp.where(negb, q_km1 + dup / dp[km - 1], q_km1)
    zfix = zfix | negb
    q = jnp.concatenate([fixed, q_km2[None], q_km1[None]], axis=0)

    # final non-local renormalization over k=2..km (:111-133)
    dm = q[1:] * dp[1:]
    sum0 = jnp.sum(dm, axis=0)
    sum1 = jnp.sum(fmax(dm, 0.0), axis=0)
    do_fix = zfix & fbool(sum0 > 0.0)
    fac = sum0 / jnp.where(do_fix, jnp.where(sum1 == 0.0, 1.0, sum1), 1.0)
    q_fixed = fmax(0.0, fac[None] * dm / dp[1:])
    q_lower = jnp.where(do_fix[None], q_fixed, q[1:])
    return jnp.concatenate([q[:1], q_lower], axis=0)


def mapn_tracer(pe1, q_stack, pe2, kord, q_min=0.0, fill=False):
    """Multi-tracer remap (mapn_tracer, fv_mapz_nlm.F90:1425-1539): the
    coordinate-change geometry (layer-location indices, interpolation
    weights) is computed ONCE and shared by all tracers, exactly as the
    reference's joint column loop shares k0/l/pl/pr across iq — only the
    per-tracer PPM profile fits differ.  q_stack: (nq, km, ...); kord may
    be one int or a per-tracer sequence.  `fill` enables the fillz
    consistency pass over the full tracer set (the LM hardwires
    fill=.false., fv3jedi_lm_dynamics_mod.F90:148)."""
    nq, km = q_stack.shape[0], q_stack.shape[1]
    shp = q_stack.shape[1:]
    q1f = q_stack.reshape(nq, km, -1)
    pe1f = pe1.reshape(km + 1, -1)
    pe2f = pe2.reshape(km + 1, -1)
    dp1 = pe1f[1:] - pe1f[:-1]
    kords = [kord] * nq if isinstance(kord, int) else list(kord)

    # shared geometry (one _locate for all tracers)
    idx = fint(_locate(pe1f[1:-1], pe2f), maxval=km)
    pe1_l = jnp.take_along_axis(pe1f, idx, axis=0)
    dp_l = jnp.take_along_axis(dp1, idx, axis=0)
    xi = fclip((pe2f - pe1_l) / dp_l, 0.0, 1.0)
    dp2 = pe2f[1:] - pe2f[:-1]

    outs = []
    for iq in range(nq):
        a1 = q1f[iq]
        a2, a3, a4 = cs_profile(jnp.zeros_like(a1[0]), a1, dp1, 0, kords[iq])
        cums = jnp.concatenate(
            [jnp.zeros_like(a1[:1]), jnp.cumsum(a1 * dp1, axis=0)], axis=0)
        a2_l = jnp.take_along_axis(a2, idx, axis=0)
        a3_l = jnp.take_along_axis(a3, idx, axis=0)
        a4_l = jnp.take_along_axis(a4, idx, axis=0)
        c_l = jnp.take_along_axis(cums, idx, axis=0)
        b = a3_l - a2_l + a4_l
        f_int = a2_l * xi + 0.5 * b * xi ** 2 - a4_l * R3 * xi ** 3
        m = c_l + dp_l * f_int
        outs.append((m[1:] - m[:-1]) / dp2)
    out = jnp.stack(outs, axis=0)
    if fill:
        import jax

        out = jax.vmap(fillz, in_axes=(0, None))(out, dp2)
    return fmax(out, q_min).reshape((nq,) + shp)
