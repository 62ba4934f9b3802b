"""A-grid (cell mean) to B-grid (corner) interpolation, orders 2 and 4.

Re-derivation of model/a2b_edge_nlm.F90 (a2b_ord2:  simple average with
edge-factor interpolation along face edges and 3-cell corner averages;
a2b_ord4: quasi-4th-order with one-sided cubic edge treatment and 3-way
great-circle corner extrapolation).

qin: (..., 6, jc, jc) padded, halo-filled.  Returns a B-grid array
(..., 6, jb, jb); values valid on the compute corners [ng : ng+n+1]^2.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import NG

B1 = 7.0 / 12.0
B2 = -1.0 / 12.0
A1 = 0.5625
A2 = -0.0625
C1 = 2.0 / 3.0
C2 = -1.0 / 6.0
R3 = 1.0 / 3.0


def _corner_values(qin, grid):
    """3-way extrapolated corner values; returns list of 4 (per sw,se,ne,nw)."""
    n = qin.shape[-1] - 2 * NG
    npx = n + 1
    p = lambda i: i - 1 + NG  # Fortran center/corner index -> padded
    cec = grid["corner_ext_coef"]  # (6, 4, 3)

    def ext(ci, k, c1, c2):
        q1 = qin[..., p(c1[1]), p(c1[0])]
        q2 = qin[..., p(c2[1]), p(c2[0])]
        return q1 + cec[:, ci, k] * (q1 - q2)

    sw = R3 * (
        ext(0, 0, (1, 1), (2, 2)) + ext(0, 1, (0, 1), (-1, 2)) + ext(0, 2, (1, 0), (2, -1))
    )
    se = R3 * (
        ext(1, 0, (npx - 1, 1), (npx - 2, 2))
        + ext(1, 1, (npx - 1, 0), (npx - 2, -1))
        + ext(1, 2, (npx, 1), (npx + 1, 2))
    )
    ne = R3 * (
        ext(2, 0, (npx - 1, npx - 1), (npx - 2, npx - 2))
        + ext(2, 1, (npx, npx - 1), (npx + 1, npx - 2))
        + ext(2, 2, (npx - 1, npx), (npx - 2, npx + 1))
    )
    nw = R3 * (
        ext(3, 0, (1, npx - 1), (2, npx - 2))
        + ext(3, 1, (0, npx - 1), (-1, npx - 2))
        + ext(3, 2, (1, npx), (2, npx + 1))
    )
    return sw, se, ne, nw


def a2b_ord4(qin, grid):
    ic = qin.shape[-1]
    n = ic - 2 * NG
    npx = n + 1
    jb = ic + 1
    dxa = grid["dxa"]
    dya = grid["dya"]
    ew = NG          # west edge B index
    ee = NG + n

    dtype = qin.dtype
    qout = jnp.zeros(qin.shape[:-2] + (jb, jb), dtype)

    # ---- corner values ----
    sw, se, ne, nw = _corner_values(qin, grid)
    qout = qout.at[..., ew, ew].set(sw)
    qout = qout.at[..., ew, ee].set(se)
    qout = qout.at[..., ee, ee].set(ne)
    qout = qout.at[..., ee, ew].set(nw)

    # ---- qx: interface values in x (width jb), interior PPM form ----
    qx = jnp.zeros(qin.shape[:-1] + (jb,), dtype)
    qx = qx.at[..., 2:ic - 1].set(
        B2 * (qin[..., 0:ic - 3] + qin[..., 3:ic])
        + B1 * (qin[..., 1:ic - 2] + qin[..., 2:ic - 1])
    )
    # west edge one-sided (a2b_edge_nlm.F90:160-170)
    g_in = dxa[..., ew + 1] / dxa[..., ew]
    g_ou = dxa[..., ew - 2] / dxa[..., ew - 1]
    qx = qx.at[..., ew].set(
        0.5
        * (
            ((2.0 + g_in) * qin[..., ew] - qin[..., ew + 1]) / (1.0 + g_in)
            + ((2.0 + g_ou) * qin[..., ew - 1] - qin[..., ew - 2]) / (1.0 + g_ou)
        )
    )
    qx = qx.at[..., ew + 1].set(
        (
            3.0 * (g_in * qin[..., ew] + qin[..., ew + 1])
            - (g_in * qx[..., ew] + qx[..., ew + 2])
        )
        / (2.0 + 2.0 * g_in)
    )
    g_in = dxa[..., ee - 2] / dxa[..., ee - 1]
    g_ou = dxa[..., ee + 1] / dxa[..., ee]
    qx = qx.at[..., ee].set(
        0.5
        * (
            ((2.0 + g_in) * qin[..., ee - 1] - qin[..., ee - 2]) / (1.0 + g_in)
            + ((2.0 + g_ou) * qin[..., ee] - qin[..., ee + 1]) / (1.0 + g_ou)
        )
    )
    qx = qx.at[..., ee - 1].set(
        (
            3.0 * (qin[..., ee - 2] + g_in * qin[..., ee - 1])
            - (g_in * qx[..., ee] + qx[..., ee - 2])
        )
        / (2.0 + 2.0 * g_in)
    )

    # ---- qy: interface values in y ----
    qt = qin.swapaxes(-1, -2)
    dyt = dya.swapaxes(-1, -2)
    qy = jnp.zeros(qt.shape[:-1] + (jb,), dtype)
    qy = qy.at[..., 2:ic - 1].set(
        B2 * (qt[..., 0:ic - 3] + qt[..., 3:ic])
        + B1 * (qt[..., 1:ic - 2] + qt[..., 2:ic - 1])
    )
    g_in = dyt[..., ew + 1] / dyt[..., ew]
    g_ou = dyt[..., ew - 2] / dyt[..., ew - 1]
    qy = qy.at[..., ew].set(
        0.5
        * (
            ((2.0 + g_in) * qt[..., ew] - qt[..., ew + 1]) / (1.0 + g_in)
            + ((2.0 + g_ou) * qt[..., ew - 1] - qt[..., ew - 2]) / (1.0 + g_ou)
        )
    )
    qy = qy.at[..., ew + 1].set(
        (3.0 * (g_in * qt[..., ew] + qt[..., ew + 1]) - (g_in * qy[..., ew] + qy[..., ew + 2]))
        / (2.0 + 2.0 * g_in)
    )
    g_in = dyt[..., ee - 2] / dyt[..., ee - 1]
    g_ou = dyt[..., ee + 1] / dyt[..., ee]
    qy = qy.at[..., ee].set(
        0.5
        * (
            ((2.0 + g_in) * qt[..., ee - 1] - qt[..., ee - 2]) / (1.0 + g_in)
            + ((2.0 + g_ou) * qt[..., ee] - qt[..., ee + 1]) / (1.0 + g_ou)
        )
    )
    qy = qy.at[..., ee - 1].set(
        (3.0 * (qt[..., ee - 2] + g_in * qt[..., ee - 1]) - (g_in * qy[..., ee] + qy[..., ee - 2]))
        / (2.0 + 2.0 * g_in)
    )
    qy = qy.swapaxes(-1, -2)  # now (..., jb(y), jc(x))

    # ---- edge-line qout values via edge factors ----
    # west edge: q2(j) = (qin(0,j)*dxa(1,j)+qin(1,j)*dxa(0,j))/(dxa(0,j)+dxa(1,j))
    q2w = (qin[..., :, ew - 1] * dxa[..., :, ew] + qin[..., :, ew] * dxa[..., :, ew - 1]) / (
        dxa[..., :, ew - 1] + dxa[..., :, ew]
    )
    ewf = grid["edge_w"]  # (6, jb) aligned to B rows
    # qout(1, j) = edge_w(j)*q2(j-1) + (1-edge_w(j))*q2(j), j=2..npy-1
    valw = ewf[:, NG + 1:NG + n] * q2w[..., NG:NG + n - 1] + (
        1.0 - ewf[:, NG + 1:NG + n]
    ) * q2w[..., NG + 1:NG + n]
    qout = qout.at[..., NG + 1:NG + n, ew].set(valw)
    q2e = (
        qin[..., :, ee - 1] * dxa[..., :, ee] + qin[..., :, ee] * dxa[..., :, ee - 1]
    ) / (dxa[..., :, ee - 1] + dxa[..., :, ee])
    eef = grid["edge_e"]
    vale = eef[:, NG + 1:NG + n] * q2e[..., NG:NG + n - 1] + (
        1.0 - eef[:, NG + 1:NG + n]
    ) * q2e[..., NG + 1:NG + n]
    qout = qout.at[..., NG + 1:NG + n, ee].set(vale)
    q1s = (
        qin[..., ew - 1, :] * dya[..., ew, :] + qin[..., ew, :] * dya[..., ew - 1, :]
    ) / (dya[..., ew - 1, :] + dya[..., ew, :])
    esf = grid["edge_s"]
    vals = esf[:, NG + 1:NG + n] * q1s[..., NG:NG + n - 1] + (
        1.0 - esf[:, NG + 1:NG + n]
    ) * q1s[..., NG + 1:NG + n]
    qout = qout.at[..., ew, NG + 1:NG + n].set(vals)
    q1n = (
        qin[..., ee - 1, :] * dya[..., ee, :] + qin[..., ee, :] * dya[..., ee - 1, :]
    ) / (dya[..., ee - 1, :] + dya[..., ee, :])
    enf = grid["edge_n"]
    valn = enf[:, NG + 1:NG + n] * q1n[..., NG:NG + n - 1] + (
        1.0 - enf[:, NG + 1:NG + n]
    ) * q1n[..., NG + 1:NG + n]
    qout = qout.at[..., ee, NG + 1:NG + n].set(valn)

    # ---- qxx: interpolate qx rows to B rows ----
    # qxx(i,j) = a2*(qx(i,j-2)+qx(i,j+1)) + a1*(qx(i,j-1)+qx(i,j)), B rows j
    qxx = jnp.zeros(qin.shape[:-2] + (jb, jb), dtype)
    qxx = qxx.at[..., 2:ic - 1, :].set(
        A2 * (qx[..., 0:ic - 3, :] + qx[..., 3:ic, :])
        + A1 * (qx[..., 1:ic - 2, :] + qx[..., 2:ic - 1, :])
    )
    # j=2 row (B index ew+1):  c1*(qx(i,1)+qx(i,2)) + c2*(qout(i,1)+qxx(i,3))
    qxx = qxx.at[..., ew + 1, :].set(
        C1 * (qx[..., ew, :] + qx[..., ew + 1, :])
        + C2 * (qout[..., ew, :] + qxx[..., ew + 2, :])
    )
    qxx = qxx.at[..., ee - 1, :].set(
        C1 * (qx[..., ee - 2, :] + qx[..., ee - 1, :])
        + C2 * (qout[..., ee, :] + qxx[..., ee - 2, :])
    )

    qyy = jnp.zeros(qin.shape[:-2] + (jb, jb), dtype)
    qyy = qyy.at[..., :, 2:ic - 1].set(
        A2 * (qy[..., :, 0:ic - 3] + qy[..., :, 3:ic])
        + A1 * (qy[..., :, 1:ic - 2] + qy[..., :, 2:ic - 1])
    )
    qyy = qyy.at[..., :, ew + 1].set(
        C1 * (qy[..., :, ew] + qy[..., :, ew + 1])
        + C2 * (qout[..., :, ew] + qyy[..., :, ew + 2])
    )
    qyy = qyy.at[..., :, ee - 1].set(
        C1 * (qy[..., :, ee - 2] + qy[..., :, ee - 1])
        + C2 * (qout[..., :, ee] + qyy[..., :, ee - 2])
    )

    inner = 0.5 * (
        qxx[..., NG + 1:NG + n, NG + 1:NG + n] + qyy[..., NG + 1:NG + n, NG + 1:NG + n]
    )
    qout = qout.at[..., NG + 1:NG + n, NG + 1:NG + n].set(inner)
    return qout


def a2b_ord2(qin, grid):
    ic = qin.shape[-1]
    n = ic - 2 * NG
    jb = ic + 1
    ew = NG
    ee = NG + n
    dtype = qin.dtype
    qout = jnp.zeros(qin.shape[:-2] + (jb, jb), dtype)
    # interior simple average at B points j,i in [ew+1, ee-1]
    avg = 0.25 * (
        qin[..., 0:ic - 1, 0:ic - 1]
        + qin[..., 0:ic - 1, 1:ic]
        + qin[..., 1:ic, 0:ic - 1]
        + qin[..., 1:ic, 1:ic]
    )
    qout = qout.at[..., 1:ic, 1:ic].set(avg)

    # corner 3-cell means
    p = lambda i: i - 1 + NG
    npx = n + 1
    qout = qout.at[..., ew, ew].set(
        R3 * (qin[..., p(1), p(1)] + qin[..., p(0), p(1)] + qin[..., p(1), p(0)])
    )
    qout = qout.at[..., ew, ee].set(
        R3 * (qin[..., p(1), p(npx - 1)] + qin[..., p(0), p(npx - 1)] + qin[..., p(1), p(npx)])
    )
    qout = qout.at[..., ee, ee].set(
        R3
        * (
            qin[..., p(npx - 1), p(npx - 1)]
            + qin[..., p(npx - 1), p(npx)]
            + qin[..., p(npx), p(npx - 1)]
        )
    )
    qout = qout.at[..., ee, ew].set(
        R3 * (qin[..., p(npx - 1), p(1)] + qin[..., p(npx - 1), p(0)] + qin[..., p(npx), p(1)])
    )

    # edges with edge factors
    q2w = 0.5 * (qin[..., :, ew - 1] + qin[..., :, ew])
    ewf = grid["edge_w"]
    qout = qout.at[..., NG + 1:NG + n, ew].set(
        ewf[:, NG + 1:NG + n] * q2w[..., NG:NG + n - 1]
        + (1.0 - ewf[:, NG + 1:NG + n]) * q2w[..., NG + 1:NG + n]
    )
    q2e = 0.5 * (qin[..., :, ee - 1] + qin[..., :, ee])
    eef = grid["edge_e"]
    qout = qout.at[..., NG + 1:NG + n, ee].set(
        eef[:, NG + 1:NG + n] * q2e[..., NG:NG + n - 1]
        + (1.0 - eef[:, NG + 1:NG + n]) * q2e[..., NG + 1:NG + n]
    )
    q1s = 0.5 * (qin[..., ew - 1, :] + qin[..., ew, :])
    esf = grid["edge_s"]
    qout = qout.at[..., ew, NG + 1:NG + n].set(
        esf[:, NG + 1:NG + n] * q1s[..., NG:NG + n - 1]
        + (1.0 - esf[:, NG + 1:NG + n]) * q1s[..., NG + 1:NG + n]
    )
    q1n = 0.5 * (qin[..., ee - 1, :] + qin[..., ee, :])
    enf = grid["edge_n"]
    qout = qout.at[..., ee, NG + 1:NG + n].set(
        enf[:, NG + 1:NG + n] * q1n[..., NG:NG + n - 1]
        + (1.0 - enf[:, NG + 1:NG + n]) * q1n[..., NG + 1:NG + n]
    )
    return qout
