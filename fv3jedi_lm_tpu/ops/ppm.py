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

Array convention: the operator works along a chosen axis (`ax` = -1 for
xppm, -2 for yppm) with NO data transposes — on TPU a swapaxes of the two
minor dims is a real relayout copy, and yppm runs on every advected
variable every acoustic substep.  q is a padded center array of width
IC = n + 2*ng along `ax`; edge-indexed arrays have width IC + 1 with edge e
between cells e-1, e; face edges at e = ng and e = ng + n.
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


class _Ax:
    """Slicing helpers along the working axis (-1 or -2)."""

    def __init__(self, ax: int):
        self.ax = ax

    def get(self, x, i):
        return x[..., i] if self.ax == -1 else x[..., i, :]

    def rng(self, x, a, b):
        return x[..., a:b] if self.ax == -1 else x[..., a:b, :]

    def stk(self, vs):
        return jnp.stack(vs, axis=self.ax if self.ax == -1 else -2)

    def cat(self, ps):
        return jnp.concatenate(ps, axis=self.ax)

    def size(self, x):
        return x.shape[self.ax]

    def zeros_like_w(self, x, w):
        if self.ax == -1:
            return jnp.zeros(x.shape[:-1] + (w,), x.dtype)
        return jnp.zeros(x.shape[:-2] + (w, x.shape[-1]), x.dtype)

    def exp(self, v):
        """Add back the working axis to a single-line value."""
        return v[..., None] if self.ax == -1 else v[..., None, :]


_AXX = _Ax(-1)
_AXY = _Ax(-2)


def set_cols(a, updates, A: _Ax = _AXX):
    """Replace single lines of `a` along the working axis in ONE concat.

    updates: list of (static index, value of the line's shape) ascending.
    One concat kernel replaces N dynamic-update-slice kernels — the
    dominant op-count term of the round-3 TPU profile (NOTES_BUILD.md)."""
    parts = []
    prev = 0
    for col, val in updates:
        if col > prev:
            parts.append(A.rng(a, prev, col))
        parts.append(A.exp(val))
        prev = col + 1
    if prev < A.size(a):
        parts.append(A.rng(a, prev, A.size(a)))
    return A.cat(parts)


def _al_interior(q, A: _Ax):
    """Unlimited interface values: width IC+1, valid e in [2, IC-2]."""
    ic = A.size(q)
    val = P1 * (A.rng(q, 1, ic - 2) + A.rng(q, 2, ic - 1)) + P2 * (
        A.rng(q, 0, ic - 3) + A.rng(q, 3, ic)
    )
    z = A.zeros_like_w(q, 2)
    return A.cat([z, val, z])


def _edge_interp(q, dxa, i0, A: _Ax):
    """Two-sided edge interface value at edge python-index e=i0+? ...

    Implements (tp_core_nlm.F90:346-349): for a face edge between cells
    (e-1) and (e):  0.5*( ((2*d0+dm)*q0 - d0*qm)/(dm+d0)
                        + ((2*d1+d2)*q1 - d1*q2)/(d1+d2) )
    where cells qm,q0 | q1,q2 flank the edge; i0 is the padded index of q1.
    """
    qm, q0, q1, q2 = (A.get(q, i0 - 2), A.get(q, i0 - 1), A.get(q, i0),
                      A.get(q, i0 + 1))
    dm, d0, d1, d2 = (
        A.get(dxa, i0 - 2),
        A.get(dxa, i0 - 1),
        A.get(dxa, i0),
        A.get(dxa, i0 + 1),
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


def _bl_br_low(q, dxa, iord, A: _Ax):
    """bl/br for iord<8 with cubed-sphere edge fixes; valid cells [2, IC-3]."""
    ic = A.size(q)
    n = ic - 2 * NG
    al = _al_interior(q, A)

    if iord == 7:
        half = 0.5 * (A.rng(q, 0, ic - 1) + A.rng(q, 1, ic))
        alv = A.rng(al, 1, ic)
        al = A.cat([A.rng(al, 0, 1), fwhere(alv < 0.0, half, alv),
                    A.rng(al, ic, ic + 1)])

    # face-edge interface overrides (tp_core_nlm.F90:341-369), all six
    # lines replaced in one concat (see set_cols)
    e_w = NG          # west face edge index
    e_e = NG + n      # east face edge
    edge_vals = [
        (e_w - 1, C1 * A.get(q, e_w - 3) + C2 * A.get(q, e_w - 2)
         + C3 * A.get(q, e_w - 1)),
        (e_w, _edge_interp(q, dxa, e_w, A)),
        (e_w + 1, C3 * A.get(q, e_w) + C2 * A.get(q, e_w + 1)
         + C1 * A.get(q, e_w + 2)),
        (e_e - 1, C1 * A.get(q, e_e - 3) + C2 * A.get(q, e_e - 2)
         + C3 * A.get(q, e_e - 1)),
        (e_e, _edge_interp(q, dxa, e_e, A)),
        (e_e + 1, C3 * A.get(q, e_e) + C2 * A.get(q, e_e + 1)
         + C1 * A.get(q, e_e + 2)),
    ]
    if iord == 7:
        edge_vals = [(e, fmax(0.0, v)) for e, v in edge_vals]
    al = set_cols(al, edge_vals, A)

    bl = A.rng(al, 0, ic) - q      # al(i) - q(i), cell-aligned (width IC)
    br = A.rng(al, 1, ic + 1) - q  # al(i+1) - q(i)
    return bl, br


def _bl_br_high(q, dxa, iord, A: _Ax):
    """bl/br for iord>=8 (monotone family) with edge fixes; cell-aligned."""
    ic = A.size(q)
    n = ic - 2 * NG

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

    al = A.cat([
        z1,
        0.5 * (A.rng(q, 0, ic - 1) + A.rng(q, 1, ic))
        + R3 * (A.rng(dm, 0, ic - 1) - A.rng(dm, 1, ic)),
        z1,
    ])

    bl = A.rng(al, 0, ic) - q
    br = A.rng(al, 1, ic + 1) - q

    if iord in (8, 11):
        fac = 2.0 if iord == 8 else PPM_FAC
        xt2 = fac * dm
        bl = -fsign_mul(xt2, fmin(fabs(xt2), fabs(bl)))
        br = fsign_mul(xt2, fmin(fabs(xt2), fabs(br)))
    elif iord in (9, 10, 12, 13):
        dq = A.cat([2.0 * (A.rng(q, 1, ic) - A.rng(q, 0, ic - 1)), z1])
        dqm1 = jnp.roll(dq, 1, axis=A.ax)
        dqm2 = jnp.roll(dq, 2, axis=A.ax)
        dqp1 = jnp.roll(dq, -1, axis=A.ax)
        dmm1 = jnp.roll(dm, 1, axis=A.ax)
        dmp1 = jnp.roll(dm, -1, axis=A.ax)
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
    bl0 = S14 * A.get(dm, i0 - 1) + S11 * (A.get(q, i0 - 1) - A.get(q, i0))
    xt = _edge_interp(q, dxa, e_w, A)
    xt = fmax(
        xt,
        fmin(
            fmin(A.get(q, i0 - 1), A.get(q, i0)),
            fmin(A.get(q, i0 + 1), A.get(q, i0 + 2)),
        ),
    )
    xt = fmin(
        xt,
        fmax(
            fmax(A.get(q, i0 - 1), A.get(q, i0)),
            fmax(A.get(q, i0 + 1), A.get(q, i0 + 2)),
        ),
    )
    br0 = xt - A.get(q, i0)
    bl1 = xt - A.get(q, i0 + 1)
    xt1 = (S15 * A.get(q, i0 + 1) + S11 * A.get(q, i0 + 2)
           - S14 * A.get(dm, i0 + 2))
    br1 = xt1 - A.get(q, i0 + 1)
    bl2 = xt1 - A.get(q, i0 + 2)
    al3 = 0.5 * (A.get(q, i0 + 2) + A.get(q, i0 + 3)) + R3 * (
        A.get(dm, i0 + 2) - A.get(dm, i0 + 3)
    )
    br2 = al3 - A.get(q, i0 + 2)
    # pert_ppm on the 3 edge cells (iv=1)
    b_l = A.stk([bl0, bl1, bl2])
    b_r = A.stk([br0, br1, br2])
    a_0 = A.rng(q, i0, i0 + 3)
    b_l_w, b_r_w = pert_ppm(a_0, b_l, b_r, 1)

    # east edge: cells npx-2, npx-1, npx -> padded e_e-2, e_e-1, e_e
    iN = e_e - 2
    blN0 = (
        0.5 * (A.get(q, iN - 1) + A.get(q, iN))
        + R3 * (A.get(dm, iN - 1) - A.get(dm, iN))
        - A.get(q, iN)
    )
    xtN = (S15 * A.get(q, iN + 1) + S11 * A.get(q, iN)
           + S14 * A.get(dm, iN))
    brN0 = xtN - A.get(q, iN)
    blN1 = xtN - A.get(q, iN + 1)
    xtE = _edge_interp(q, dxa, e_e, A)
    xtE = fmax(
        xtE,
        fmin(
            fmin(A.get(q, iN), A.get(q, iN + 1)),
            fmin(A.get(q, iN + 2), A.get(q, iN + 3)),
        ),
    )
    xtE = fmin(
        xtE,
        fmax(
            fmax(A.get(q, iN), A.get(q, iN + 1)),
            fmax(A.get(q, iN + 2), A.get(q, iN + 3)),
        ),
    )
    brN1 = xtE - A.get(q, iN + 1)
    blN2 = xtE - A.get(q, iN + 2)
    brN2 = S11 * (A.get(q, iN + 3) - A.get(q, iN + 2)) - S14 * A.get(dm, iN + 3)
    b_l = A.stk([blN0, blN1, blN2])
    b_r = A.stk([brN0, brN1, brN2])
    a_0 = A.rng(q, iN, iN + 3)
    b_l_e, b_r_e = pert_ppm(a_0, b_l, b_r, 1)

    # both 3-cell edge windows replaced in one concat per array
    def put(base, west, east):
        return A.cat([
            A.rng(base, 0, i0), west, A.rng(base, i0 + 3, iN), east,
            A.rng(base, iN + 3, ic),
        ])

    return put(bl, b_l_w, b_l_e), put(br, b_r_w, b_r_e)


def _flux_from_blbr(q, c, bl, br, e0, e1, A: _Ax):
    """Upwind PPM flux at edges e in [e0, e1): flux width e1-e0.

    c is edge-aligned with width e1-e0 already (courant at those edges).
    """
    qL = A.rng(q, e0 - 1, e1 - 1)   # cell left of edge
    qR = A.rng(q, e0, e1)
    blL = A.rng(bl, e0 - 1, e1 - 1)
    brL = A.rng(br, e0 - 1, e1 - 1)
    blR = A.rng(bl, e0, e1)
    brR = A.rng(br, e0, e1)
    b0L = blL + brL
    b0R = blR + brR
    fpos = qL + (1.0 - c) * (brL - c * b0L)
    fneg = qR + (1.0 + c) * (blR + c * b0R)
    return fwhere(c > 0.0, fpos, fneg)


def xppm(q, c, iord, dxa, e0=None, e1=None, ax: int = -1):
    """PPM flux along axis `ax`.  q: padded width IC along ax; c: courant
    at edges [e0, e1) along ax.

    Default edge range is the compute range [NG, NG+n+1] (Fortran is..ie+1).
    Returns flux with width e1-e0 along ax.

    `iord` may be a per-level blend `(iord_main, iord_sponge, ksp)` with
    ksp a STATIC int: levels [0, ksp) use the sponge scheme — the TLM's
    perturbation sponge-layer override (dyn_core_tlm.F90:861-875).  The
    level batch is split statically so each scheme is evaluated exactly
    once on its own band (no masked double evaluation).
    """
    if isinstance(iord, tuple):
        main, sponge, ksp = iord
        qs, qm = q[:ksp], q[ksp:]
        cs_, cm = c[:ksp], c[ksp:]
        fb = xppm(qs, cs_, sponge, dxa, e0, e1, ax)
        fa = xppm(qm, cm, main, dxa, e0, e1, ax)
        return jnp.concatenate([fb, fa], axis=0)
    A = _AXX if ax == -1 else _AXY
    ic = A.size(q)
    n = ic - 2 * NG
    if e0 is None:
        e0, e1 = NG, NG + n + 1
    assert A.size(c) == e1 - e0

    if iord == 1:
        qL = A.rng(q, e0 - 1, e1 - 1)
        qR = A.rng(q, e0, e1)
        return fwhere(c > 0.0, qL, qR)

    if iord < 8:
        bl, br = _bl_br_low(q, dxa, iord, A)
        if iord in (2, 7):
            return _flux_from_blbr(q, c, bl, br, e0, e1, A)
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
        qL = A.rng(q, e0 - 1, e1 - 1)
        qR = A.rng(q, e0, e1)
        blL = A.rng(bl, e0 - 1, e1 - 1)
        brL = A.rng(br, e0 - 1, e1 - 1)
        blR = A.rng(bl, e0, e1)
        brR = A.rng(br, e0, e1)
        b0L = A.rng(b0, e0 - 1, e1 - 1)
        b0R = A.rng(b0, e0, e1)
        if iord == 3:
            smt5L = A.rng(smt5, e0 - 1, e1 - 1)
            smt6L = A.rng(smt6, e0 - 1, e1 - 1)
            smt5R = A.rng(smt5, e0, e1)
            smt6R = A.rng(smt6, e0, e1)
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
            smt5L = A.rng(smt5, e0 - 1, e1 - 1)
            smt6L = A.rng(smt6, e0 - 1, e1 - 1)
            smt5R = A.rng(smt5, e0, e1)
            smt6R = A.rng(smt6, e0, e1)
            fx1p = jnp.where(smt6L | smt5R, (1.0 - c) * (brL - c * b0L), 0.0)
            fx1n = jnp.where(smt6R | smt5L, (1.0 + c) * (blR + c * b0R), 0.0)
            return fwhere(c > 0.0, qL + fx1p, qR + fx1n)
        # iord 5, 6
        smt5L = A.rng(smt5, e0 - 1, e1 - 1)
        smt5R = A.rng(smt5, e0, e1)
        cpos = fbool(c > 0.0)
        fx1 = jnp.where(
            cpos, (1.0 - c) * (brL - c * b0L), (1.0 + c) * (blR + c * b0R)
        )
        base = jnp.where(cpos, qL, qR)
        return base + jnp.where(smt5L | smt5R, fx1, 0.0)

    bl, br = _bl_br_high(q, dxa, iord, A)
    return _flux_from_blbr(q, c, bl, br, e0, e1, A)


def yppm(q, c, jord, dya, e0=None, e1=None):
    """PPM flux in y: the same operator along axis -2, transpose-free."""
    return xppm(q, c, jord, dya, e0, e1, ax=-2)
