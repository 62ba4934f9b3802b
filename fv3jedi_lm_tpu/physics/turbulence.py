"""Turbulence (boundary-layer diffusion) NLM/TLM/ADM.

Re-derivation of src/physics/turbulence/fv3jedi_lm_turbulence_mod.F90:

* `set_ltraj` (:376-540): once per trajectory step, run BL_DRIVER on the
  trajectory to build the implicit-diffusion tridiagonals, then LU-factor
  them (`vtrilupert`, :583-600).  These frozen coefficients ARE the
  linearization — the reference's frozen-K phase-1/phase-2 design.
* `step_nl` / `step_tl` (:151-282): identical frozen-coefficient solves
  (the reference NL step literally applies the TL solver to the trajectory
  fields): theta-transform, LU solve per field (winds/T/qv with the zero-
  surface-gradient BC, tracers with the surface fix), inverse transform.
* `step_ad` (:286-350): the transposed solve (`vtrisolvepert` phase 2) —
  obtained here as the exact jax transpose of the (linear) phase-1 apply,
  which reproduces the reference's hand-written U'L' sweeps to roundoff.

Layout: vertical axis leading, fields (npz, 6, ny, nx).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import KAPPA, P00
from .bldriver import bl_driver, default_turb_params


def compute_pressures(delp, ptop):
    """compute_pressures (fv3jedi_lm_utils_mod.F90:323-391): edge pressure,
    mid-point pressure and layer-mean p^kappa from delp."""
    pe = jnp.concatenate(
        [jnp.full_like(delp[:1], ptop),
         ptop + jnp.cumsum(delp, axis=0)], axis=0)
    pm = 0.5 * (pe[1:] + pe[:-1])
    lpe = jnp.log(pe)
    pek = pe ** KAPPA
    pk = (pek[1:] - pek[:-1]) / (KAPPA * (lpe[1:] - lpe[:-1]))
    return pe, pm, pk


def ice_fraction(temp):
    """IceFraction (fv3jedi_lm_utils_mod.F90:267-319)."""
    t_ice_all, t_ice_max = 233.16, 273.16
    f = jnp.clip(1.0 - (temp - t_ice_all) / (t_ice_max - t_ice_all), 0.0, 1.0)
    return f ** 4


def vtrilu(a, b, c):
    """vtrilupert (fv3jedi_lm_turbulence_mod.F90:583-600): in-place LU of
    the tridiagonal (a sub, b main, c super); b returns the INVERSE main
    diagonal of U and a the L multipliers."""
    b0 = 1.0 / b[0]

    def body(b_prev, x):
        a_l, b_l, c_lm1 = x
        a_new = a_l * b_prev
        b_new = 1.0 / (b_l - c_lm1 * a_new)
        return b_new, (a_new, b_new)

    _, (a_rest, b_rest) = lax.scan(body, b0, (a[1:], b[1:], c[:-1]))
    a_new = jnp.concatenate([a[:1], a_rest], axis=0)
    b_new = jnp.concatenate([b0[None], b_rest], axis=0)
    return a_new, b_new, c


def vtrisolve(a, b, c, y, ygswitch):
    """vtrisolvepert phase 1 (fv3jedi_lm_turbulence_mod.F90:605-640): solve
    the LU-factored system.  ygswitch=1 for winds/T/qv (zero surface
    gradient), 0 for tracers (surface fix, :654-657).  Linear in y — the
    adjoint phase 2 is its exact transpose (jax.vjp)."""
    lm = y.shape[0]
    # down sweep: y(l) -= a(l) * y(l-1)
    def down(y_prev, x):
        a_l, y_l = x
        y_new = y_l - a_l * y_prev
        return y_new, y_new

    _, y_rest = lax.scan(down, y[0], (a[1:], y[1:]))
    y2 = jnp.concatenate([y[:1], y_rest], axis=0)

    if ygswitch == 1:
        yb = y2[-1] * b[-1]
    else:
        yb = y2[-1] * b[-2] / (b[-2] - a[-1] * (1.0 + c[-2] * b[-2]))

    # up sweep: y(l) = b(l) * (y(l) - c(l) * y(l+1))
    def up(y_next, x):
        b_l, c_l, y_l = x
        y_new = b_l * (y_l - c_l * y_next)
        return y_new, y_new

    _, y_up = lax.scan(up, yb, (b[:-1][::-1], c[:-1][::-1], y2[:-1][::-1]))
    return jnp.concatenate([y_up[::-1], yb[None]], axis=0)


class Turbulence:
    """Frozen-K boundary-layer diffusion operator for one LinearModel."""

    def __init__(self, cfg, ak, bk):
        import numpy as np
        pref = np.asarray(ak) + np.asarray(bk) * P00
        self.params = default_turb_params(pref)
        self.cfg = cfg
        self.ptop = float(ak[0])

    def set_ltraj(self, traj, dt, do_phy_mst=0):
        """Local trajectory (fv3jedi_lm_turbulence_mod.F90:376-540): the
        LU-factored diffusion tridiagonals + layer-mean p^kappa."""
        delp = traj["delp"]
        _, _, pk = compute_pressures(delp, self.ptop)
        t = traj["t"]
        th = P00 ** KAPPA * t / pk

        if do_phy_mst == 0:
            qit, qlt = traj["qi"], traj["ql"]
        else:
            fqi = ice_fraction(t)
            qtot = traj["qls"] + traj["qcn"]
            qit = qtot * fqi
            qlt = qtot * (1.0 - fqi)

        # physics sees cell-centered winds: the (n, n) D-wind block the
        # reference carries in traj%u/v (fv3jedi_lm_utils_mod.F90:169-176)
        n = delp.shape[-1]
        u_c = traj["u"][..., :n, :]
        v_c = traj["v"][..., :, :n]

        pe = jnp.concatenate(
            [jnp.full_like(delp[:1], self.ptop),
             self.ptop + jnp.cumsum(delp, axis=0)], axis=0)
        coeffs, zpbl = bl_driver(
            u_c, v_c, th, traj["qv"], pe, qit, qlt,
            traj["frland"], traj["frocean"], traj["varflt"],
            traj["zpbl"], traj["cm"], traj["ct"], traj["cq"],
            traj["ustar"], traj["bstar"], self.params, dt,
            # LW heating-rate trajectory for the radlw_dep=1 cloud-top
            # branch (the reference keeps RADLW local and unused,
            # bldriver.F90:66-67)
            tdtlw=traj.get("tdtlw"),
        )
        akv, bkv, ckv = vtrilu(coeffs["akv"], coeffs["bkv"], coeffs["ckv"])
        aks, bks, cks = vtrilu(coeffs["aks"], coeffs["bks"], coeffs["cks"])
        akq, bkq, ckq = vtrilu(coeffs["akq"], coeffs["bkq"], coeffs["ckq"])
        return dict(akv=akv, bkv=bkv, ckv=ckv, aks=aks, bks=bks, cks=cks,
                    akq=akq, bkq=bkq, ckq=ckq, pk=pk, zpbl=zpbl)

    def apply(self, ltraj, fields):
        """One frozen-coefficient diffusion step on a pert or traj field
        dict (u, v, t, qv, qi, ql, o3 on the (n,n) physics block).  Linear
        in `fields` — used for step_nl, step_tl, and (transposed) step_ad
        (fv3jedi_lm_turbulence_mod.F90:151-282)."""
        pk = ltraj["pk"]
        out = dict(fields)
        # t2pt
        pt = P00 ** KAPPA * fields["t"] / pk
        out["u"] = vtrisolve(ltraj["akv"], ltraj["bkv"], ltraj["ckv"],
                             fields["u"], 1)
        out["v"] = vtrisolve(ltraj["akv"], ltraj["bkv"], ltraj["ckv"],
                             fields["v"], 1)
        pt = vtrisolve(ltraj["aks"], ltraj["bks"], ltraj["cks"], pt, 1)
        out["qv"] = vtrisolve(ltraj["akq"], ltraj["bkq"], ltraj["ckq"],
                              fields["qv"], 1)
        out["qi"] = vtrisolve(ltraj["akq"], ltraj["bkq"], ltraj["ckq"],
                              fields["qi"], 0)
        out["ql"] = vtrisolve(ltraj["akq"], ltraj["bkq"], ltraj["ckq"],
                              fields["ql"], 0)
        out["o3"] = vtrisolve(ltraj["akq"], ltraj["bkq"], ltraj["ckq"],
                              fields["o3"], 0)
        # pt2t
        out["t"] = pk * pt / P00 ** KAPPA
        return out

    def apply_transpose(self, ltraj, fields):
        """Exact transpose of `apply` — the reference's vtrisolvepert
        phase 2 (fv3jedi_lm_turbulence_mod.F90:286-350, :642-674)."""
        _, vjp = jax.vjp(lambda f: self.apply(ltraj, f), fields)
        return vjp(dict(fields))[0]
