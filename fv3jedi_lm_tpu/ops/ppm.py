"""PPM flux operators (xppm / yppm) for FV transport.

Vectorized re-derivation of the reference tp_core operators
(model/tp_core_nlm.F90:291-951): piecewise-parabolic reconstruction with the
scheme family selected by `iord`:

  1  first-order upwind
  2  unlimited ("perfectly linear") PPM — the TLM/ADM default pert scheme
  3,4,5,6,7  selectively-limited fast schemes
  8  Lin PPM with fast monotone constraint
  9,13  positive-definite constraints
  10 Lin's modification of the Huynh constraint
  11 van-Leer-type via PPM
  12 same family (treated as 10's relaxative variant, tp_core_nlm.F90:505)

All branchy limiters become `jnp.where` selects; the face-edge one-sided
reconstructions (grid_type<3 cubed-sphere edges) are static column updates
at the fixed edge positions (every face has is=1, ie=npx-1 in this layout).

Array convention: operations on the LAST axis; q is a padded center array
(..., IC) with IC = n + 2*ng; edge-indexed arrays have width IC + 1 with
edge e between cells e-1, e; face edges at e = ng and e = ng + n.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import NG
from ..core.freeze import fabs, fbool, fmax, fmin, fsign_mul, fwhere

# reconstruction coefficients (tp_core_nlm.F90:40-70)
P1 = 7.0 / 12.0
P2 = -1.0 / 12.0
C1 = -2.0 / 14.0
C2 = 11.0 / 14.0
C3 = 5.0 / 14.0
S11 = 11.0 / 14.0
S14 = 4.0 / 7.0
S15 = 3.0 / 14.0
R3 = 1.0 / 3.0
NEAR_ZERO = 1.0e-25
PPM_FAC = 1.5
PPM_LIMITER = 2.0


def set_cols(a, updates):
    """Replace single columns of `a` (last axis) in ONE concatenate.

    updates: list of (static col index, value of shape a.shape[:-1]) in
    ascending column order.  One concat kernel replaces N dynamic-update-
    slice kernels — the dominant op-count term of the round-3 TPU profile
    (NOTES_BUILD.md: 7.6k dynamic-update-slices per step)."""
    parts = []
    prev = 0
    for col, val in updates:
        if col > prev:
            parts.append(a[..., prev:col])
        parts.append(val[..., None])
        prev = col + 1
    if prev < a.shape[-1]:
        parts.append(a[..., prev:])
    return jnp.concatenate(parts, axis=-1)


def _al_interior(q):
    """Unlimited interface values: width IC+1, valid e in [2, IC-2]."""
    ic = q.shape[-1]
    val = P1 * (q[..., 1:ic - 2] + q[..., 2:ic - 1]) + P2 * (
        q[..., 0:ic - 3] + q[..., 3:ic]
    )
    z = jnp.zeros(q.shape[:-1] + (2,), q.dtype)
    return jnp.concatenate([z, val, z], axis=-1)


def _edge_interp(q, dxa, i0):
    """Two-sided edge interface value at edge python-index e=i0+? ...

    Implements (tp_core_nlm.F90:346-349): for a face edge between cells
    (e-1) and (e):  0.5*( ((2*d0+dm)*q0 - d0*qm)/(dm+d0)
                        + ((2*d1+d2)*q1 - d1*q2)/(d1+d2) )
    where cells qm,q0 | q1,q2 flank the edge; i0 is the padded index of q1.
    """
    qm, q0, q1, q2 = (q[..., i0 - 2], q[..., i0 - 1], q[..., i0], q[..., i0 + 1])
    dm, d0, d1, d2 = (
        dxa[..., i0 - 2],
        dxa[..., i0 - 1],
        dxa[..., i0],
        dxa[..., i0 + 1],
    )
    return 0.5 * (
        ((2.0 * d0 + dm) * q0 - d0 * qm) / (dm + d0)
        + ((2.0 * d1 + d2) * q1 - d1 * q2) / (d1 + d2)
    )


def pert_ppm(a0, al, ar, iv):
    """PPM constraint in perturbation form (tp_core_nlm.F90:953-1011)."""
    r12 = 1.0 / 12.0
    if iv == 0:
        a4 = -3.0 * (ar + al)
        da1 = ar - al
        f_min = a0 + 0.25 / fwhere(a4 == 0, 1.0, a4) * da1**2 + a4 * r12
        need_fix = (jnp.abs(da1) < -a4) & (f_min < 0.0)
        both_pos = (ar > 0.0) & (al > 0.0)
        da1_pos = da1 > 0.0
        ar_f = fwhere(both_pos, 0.0, fwhere(da1_pos, -2.0 * al, ar))
        al_f = fwhere(both_pos, 0.0, fwhere(da1_pos, al, -2.0 * ar))
        ar_n = fwhere(need_fix, ar_f, ar)
        al_n = fwhere(need_fix, al_f, al)
        pos = a0 > 0.0
        return fwhere(pos, al_n, 0.0), fwhere(pos, ar_n, 0.0)
    else:
        opp = al * ar < 0.0
        da1 = al - ar
        da2 = da1**2
        a6da = 3.0 * (al + ar) * da1
        ar_n = fwhere(a6da < -da2, -2.0 * al, ar)
        al_n = fwhere(a6da > da2, -2.0 * ar, al)
        return fwhere(opp, al_n, 0.0), fwhere(opp, ar_n, 0.0)


def _bl_br_low(q, dxa, iord):
    """bl/br for iord<8 with cubed-sphere edge fixes; valid cells [2, IC-3]."""
    ic = q.shape[-1]
    n = ic - 2 * NG
    al = _al_interior(q)

    if iord == 7:
        half = 0.5 * (q[..., 0:ic - 1] + q[..., 1:ic])
        alv = al[..., 1:ic]
        al = al.at[..., 1:ic].set(fwhere(alv < 0.0, half, alv))

    # face-edge interface overrides (tp_core_nlm.F90:341-369), all six
    # columns replaced in one concat (see set_cols)
    e_w = NG          # west face edge index
    e_e = NG + n      # east face edge
    edge_vals = [
        (e_w - 1, C1 * q[..., e_w - 3] + C2 * q[..., e_w - 2]
         + C3 * q[..., e_w - 1]),
        (e_w, _edge_interp(q, dxa, e_w)),
        (e_w + 1, C3 * q[..., e_w] + C2 * q[..., e_w + 1]
         + C1 * q[..., e_w + 2]),
        (e_e - 1, C1 * q[..., e_e - 3] + C2 * q[..., e_e - 2]
         + C3 * q[..., e_e - 1]),
        (e_e, _edge_interp(q, dxa, e_e)),
        (e_e + 1, C3 * q[..., e_e] + C2 * q[..., e_e + 1]
         + C1 * q[..., e_e + 2]),
    ]
    if iord == 7:
        edge_vals = [(e, fmax(0.0, v)) for e, v in edge_vals]
    al = set_cols(al, edge_vals)

    bl = al[..., :-1] - q          # al(i) - q(i), cell-aligned (width IC)
    br = al[..., 1:] - q           # al(i+1) - q(i)
    return bl, br


def _bl_br_high(q, dxa, iord):
    """bl/br for iord>=8 (monotone family) with edge fixes; cell-aligned."""
    ic = q.shape[-1]
    n = ic - 2 * NG

    qm1 = q[..., 0:ic - 2]
    qp1 = q[..., 2:ic]
    q0 = q[..., 1:ic - 1]
    xt = 0.25 * (qp1 - qm1)
    dm_i = fsign_mul(xt, fmin(
        fabs(xt),
        fmin(
            fmax(fmax(qm1, q0), qp1) - q0,
            q0 - fmin(fmin(qm1, q0), qp1),
        ),
    ))
    z1 = jnp.zeros(q.shape[:-1] + (1,), q.dtype)
    dm = jnp.concatenate([z1, dm_i, z1], axis=-1)

    al = jnp.concatenate([
        z1,
        0.5 * (q[..., 0:ic - 1] + q[..., 1:ic])
        + R3 * (dm[..., 0:ic - 1] - dm[..., 1:ic]),
        z1,
    ], axis=-1)

    bl = al[..., :-1] - q
    br = al[..., 1:] - q

    if iord in (8, 11):
        fac = 2.0 if iord == 8 else PPM_FAC
        xt2 = fac * dm
        bl = -fsign_mul(xt2, fmin(fabs(xt2), fabs(bl)))
        br = fsign_mul(xt2, fmin(fabs(xt2), fabs(br)))
    elif iord in (9, 10, 12, 13):
        dq = jnp.zeros_like(q).at[..., 0:ic - 1].set(
            2.0 * (q[..., 1:ic] - q[..., 0:ic - 1])
        )
        dqm1 = jnp.roll(dq, 1, axis=-1)
        dqm2 = jnp.roll(dq, 2, axis=-1)
        dqp1 = jnp.roll(dq, -1, axis=-1)
        dmm1 = jnp.roll(dm, 1, axis=-1)
        dmp1 = jnp.roll(dm, -1, axis=-1)
        flat = jnp.abs(dmm1) + jnp.abs(dm) + jnp.abs(dmp1) < NEAR_ZERO
        noisy = jnp.abs(3.0 * (bl + br)) > jnp.abs(bl - br)
        pmp_2 = dqm1
        lac_2 = pmp_2 - 0.75 * dqm2
        br_l = fmin(
            fmax(0.0, fmax(pmp_2, lac_2)),
            fmax(br, fmin(0.0, fmin(pmp_2, lac_2))),
        )
        pmp_1 = -dq
        lac_1 = pmp_1 + 0.75 * dqp1
        bl_l = fmin(
            fmax(0.0, fmax(pmp_1, lac_1)),
            fmax(bl, fmin(0.0, fmin(pmp_1, lac_1))),
        )
        bl = fwhere(flat, 0.0, fwhere(noisy, bl_l, bl))
        br = fwhere(flat, 0.0, fwhere(noisy, br_l, br))
    if iord in (9, 13):  # additional positive-definite constraint
        bl, br = pert_ppm(q, bl, br, 0)

    # ---- cubed-sphere edge fixes (tp_core_nlm.F90:531-569) ----
    e_w, e_e = NG, NG + n
    # cells (Fortran) 0,1,2 -> padded e_w-1, e_w, e_w+1
    i0 = e_w - 1
    bl0 = S14 * dm[..., i0 - 1] + S11 * (q[..., i0 - 1] - q[..., i0])
    xt = _edge_interp(q, dxa, e_w)
    xt = fmax(
        xt,
        fmin(
            fmin(q[..., i0 - 1], q[..., i0]),
            fmin(q[..., i0 + 1], q[..., i0 + 2]),
        ),
    )
    xt = fmin(
        xt,
        fmax(
            fmax(q[..., i0 - 1], q[..., i0]),
            fmax(q[..., i0 + 1], q[..., i0 + 2]),
        ),
    )
    br0 = xt - q[..., i0]
    bl1 = xt - q[..., i0 + 1]
    xt1 = S15 * q[..., i0 + 1] + S11 * q[..., i0 + 2] - S14 * dm[..., i0 + 2]
    br1 = xt1 - q[..., i0 + 1]
    bl2 = xt1 - q[..., i0 + 2]
    al3 = 0.5 * (q[..., i0 + 2] + q[..., i0 + 3]) + R3 * (
        dm[..., i0 + 2] - dm[..., i0 + 3]
    )
    br2 = al3 - q[..., i0 + 2]
    # pert_ppm on the 3 edge cells (iv=1)
    b_l = jnp.stack([bl0, bl1, bl2], axis=-1)
    b_r = jnp.stack([br0, br1, br2], axis=-1)
    a_0 = q[..., i0:i0 + 3]
    b_l_w, b_r_w = pert_ppm(a_0, b_l, b_r, 1)

    # east edge: cells npx-2, npx-1, npx -> padded e_e-2+1=e_e-1? cells
    # (Fortran npx-2 -> e_e - 2, npx-1 -> e_e - 1, npx -> e_e)
    iN = e_e - 2
    blN0 = (
        0.5 * (q[..., iN - 1] + q[..., iN])
        + R3 * (dm[..., iN - 1] - dm[..., iN])
        - q[..., iN]
    )
    xtN = S15 * q[..., iN + 1] + S11 * q[..., iN] + S14 * dm[..., iN]
    brN0 = xtN - q[..., iN]
    blN1 = xtN - q[..., iN + 1]
    xtE = _edge_interp(q, dxa, e_e)
    xtE = fmax(
        xtE,
        fmin(
            fmin(q[..., iN], q[..., iN + 1]),
            fmin(q[..., iN + 2], q[..., iN + 3]),
        ),
    )
    xtE = fmin(
        xtE,
        fmax(
            fmax(q[..., iN], q[..., iN + 1]),
            fmax(q[..., iN + 2], q[..., iN + 3]),
        ),
    )
    brN1 = xtE - q[..., iN + 1]
    blN2 = xtE - q[..., iN + 2]
    brN2 = S11 * (q[..., iN + 3] - q[..., iN + 2]) - S14 * dm[..., iN + 3]
    b_l = jnp.stack([blN0, blN1, blN2], axis=-1)
    b_r = jnp.stack([brN0, brN1, brN2], axis=-1)
    a_0 = q[..., iN:iN + 3]
    b_l_e, b_r_e = pert_ppm(a_0, b_l, b_r, 1)

    # both 3-cell edge windows replaced in one concat per array
    def put(base, west, east):
        return jnp.concatenate([
            base[..., :i0], west, base[..., i0 + 3:iN], east,
            base[..., iN + 3:],
        ], axis=-1)

    return put(bl, b_l_w, b_l_e), put(br, b_r_w, b_r_e)


def _flux_from_blbr(q, c, bl, br, e0, e1):
    """Upwind PPM flux at edges e in [e0, e1): flux width e1-e0.

    c is edge-aligned with width e1-e0 already (courant at those edges).
    """
    qL = q[..., e0 - 1:e1 - 1]   # cell left of edge
    qR = q[..., e0:e1]
    blL = bl[..., e0 - 1:e1 - 1]
    brL = br[..., e0 - 1:e1 - 1]
    blR = bl[..., e0:e1]
    brR = br[..., e0:e1]
    b0L = blL + brL
    b0R = blR + brR
    fpos = qL + (1.0 - c) * (brL - c * b0L)
    fneg = qR + (1.0 + c) * (blR + c * b0R)
    return fwhere(c > 0.0, fpos, fneg)


def xppm(q, c, iord, dxa, e0=None, e1=None):
    """PPM flux in x.  q: (..., IC) padded; c: courant at edges [e0, e1).

    Default edge range is the compute range [NG, NG+n+1] (Fortran is..ie+1).
    Returns flux with width e1-e0.

    `iord` may be a per-level blend `(iord_main, iord_sponge, mask_k)` with
    mask_k an (npz,1,1,1) bool selecting the sponge scheme — the TLM's
    perturbation sponge-layer override (dyn_core_tlm.F90:861-875) in
    single-trace masked form.
    """
    if isinstance(iord, tuple):
        main, sponge, mask = iord
        fa = xppm(q, c, main, dxa, e0, e1)
        fb = xppm(q, c, sponge, dxa, e0, e1)
        return jnp.where(mask, fb, fa)
    ic = q.shape[-1]
    n = ic - 2 * NG
    if e0 is None:
        e0, e1 = NG, NG + n + 1
    assert c.shape[-1] == e1 - e0

    if iord == 1:
        qL = q[..., e0 - 1:e1 - 1]
        qR = q[..., e0:e1]
        return fwhere(c > 0.0, qL, qR)

    if iord < 8:
        bl, br = _bl_br_low(q, dxa, iord)
        if iord in (2, 7):
            return _flux_from_blbr(q, c, bl, br, e0, e1)
        b0 = bl + br
        x0 = jnp.abs(b0)
        x1 = jnp.abs(bl - br)
        if iord in (3, 4):
            smt5 = x0 < x1
            smt6 = 3.0 * x0 < x1
        elif iord == 5:
            smt5 = bl * br < 0.0
        else:  # 6
            smt5 = 3.0 * x0 < x1
        smt5 = fbool(smt5)
        if iord in (3, 4):
            smt6 = fbool(smt6)
        qL = q[..., e0 - 1:e1 - 1]
        qR = q[..., e0:e1]
        blL = bl[..., e0 - 1:e1 - 1]
        brL = br[..., e0 - 1:e1 - 1]
        blR = bl[..., e0:e1]
        brR = br[..., e0:e1]
        b0L = b0[..., e0 - 1:e1 - 1]
        b0R = b0[..., e0:e1]
        if iord == 3:
            smt5L = smt5[..., e0 - 1:e1 - 1]
            smt6L = smt6[..., e0 - 1:e1 - 1]
            smt5R = smt5[..., e0:e1]
            smt6R = smt6[..., e0:e1]
            fx1p = jnp.where(
                smt6L | smt5R,
                brL - c * b0L,
                jnp.where(
                    smt5L, fsign_mul(brL, fmin(fabs(blL), fabs(brL))), 0.0
                ),
            )
            fx1n = jnp.where(
                smt6R | smt5L,
                blR + c * b0R,
                jnp.where(
                    smt5R, fsign_mul(blR, fmin(fabs(blR), fabs(brR))), 0.0
                ),
            )
            return fwhere(
                c > 0.0,
                qL + (1.0 - c) * fx1p,
                qR + (1.0 + c) * fx1n,
            )
        if iord == 4:
            smt5L = smt5[..., e0 - 1:e1 - 1]
            smt6L = smt6[..., e0 - 1:e1 - 1]
            smt5R = smt5[..., e0:e1]
            smt6R = smt6[..., e0:e1]
            fx1p = jnp.where(smt6L | smt5R, (1.0 - c) * (brL - c * b0L), 0.0)
            fx1n = jnp.where(smt6R | smt5L, (1.0 + c) * (blR + c * b0R), 0.0)
            return fwhere(c > 0.0, qL + fx1p, qR + fx1n)
        # iord 5, 6
        smt5L = smt5[..., e0 - 1:e1 - 1]
        smt5R = smt5[..., e0:e1]
        cpos = fbool(c > 0.0)
        fx1 = jnp.where(
            cpos, (1.0 - c) * (brL - c * b0L), (1.0 + c) * (blR + c * b0R)
        )
        base = jnp.where(cpos, qL, qR)
        return base + jnp.where(smt5L | smt5R, fx1, 0.0)

    bl, br = _bl_br_high(q, dxa, iord)
    return _flux_from_blbr(q, c, bl, br, e0, e1)


def yppm(q, c, jord, dya, e0=None, e1=None):
    """PPM flux in y: same operator along axis -2."""
    out = xppm(
        q.swapaxes(-1, -2), c.swapaxes(-1, -2), jord, dya.swapaxes(-1, -2), e0, e1
    )
    return out.swapaxes(-1, -2)
