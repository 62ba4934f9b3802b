"""Moist physics driver: RAS convection + PDF cloud scheme.

TPU-native re-design of the reference moist driver
(src/physics/moist/fv3jedi_lm_moist_mod.F90: create:87, set_ltraj:649-975,
step_nl:282, step_tl:394, step_ad:507).  The reference linearizes GEOS moist
physics per column inside (i,j) loops; here every column of the cube runs
at once as (npz, B) arrays, and the TLM/ADM are jvp/vjp of the whole-array
scheme at the cached trajectory with the branch tape frozen (core/freeze) —
replacing the hand-curated Tapenade pairs convection_tl/ad.F90 and
cloud_tl/ad.F90.

The combined step reproduces the reference's composition exactly:

* convection (rase_d) runs GATED by the DOCONVEC filters and advances the
  (theta, qv, u, v) perturbations (step_tl:455-477);
* the cloud scheme linearizes at the UNGATED RASE0 trajectory stored by
  set_ltraj (ptt_c/qvt_c/cnv_*_c, :731-775) while receiving the gated
  convection tangents (step_tl:483-500) — expressed with
  freeze.mix_primal;
* the NONLINEAR writeback takes t/qv/u/v from convection and qi/ql/cfcn
  from the cloud scheme (step_nl:383-390: traj%t uses ltraj%PTT, i.e. the
  cloud temperature update is discarded from the trajectory while the
  cloud's qi/ql/cfcn updates are kept);
* qi/ql perturbations split into (large-scale, convective) x (ice,
  liquid) parts by the trajectory fractions before the cloud scheme and
  recombine after (step_tl:434-440, 510-515); cfcn is a pert field (and
  5th advected tracer, fv3jedi_lm_dynamics_mod.F90:159-167).

The trajectory setup (set_ltraj) computes, per column:
* CNV_PLE/PK/PTT from delp + T (compute_pressures + p00^kappa*T/pk);
* SEEDRAS from the lowest-level temperature fractional part (:757);
* WGT0/WGT1 strapping weights from KCBL (:760-770);
* CO_AUTO from the land fraction (:772-777);
* an RASE0 trajectory pass (the cloud adjoint's convection inputs, :779-796);
* DOCONVEC: convection deep enough, heating profile not a single spike
  (:798-846), then the two-column Jacobian filter — jvp of RASE0 seeded at
  the cloud base in (theta, qv), thresholded (:879-975);
* the qi/ql -> (large-scale, convective) x (ice, liquid) splitting
  fractions from IceFraction (:848-877).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import MAPL_KAPPA, MAPL_P00, MAPL_TICE
from ..core import freeze
from .convection import default_rasparams, rase

PMIN_DET = 3000.0
AUTOC_CN_OCN = 2.5e-3
AUTOC_CN_LAND = AUTOC_CN_OCN

#: Jacobian-filter thresholds (fv3jedi_lm_moist_mod.F90:955-960)
JFILT = (1.0e-4, 0.25, 1.0e-7, 2.5e-4)


def ice_fraction(temp):
    """IceFraction (cloud.F90 get_ice_fraction with the LM's defaults:
    T_ICE_ALL = TICE - 40, T_ICE_MAX = TICE, ICEFRPWR = 4)."""
    t_ice_all = MAPL_TICE - 40.0
    t_ice_max = MAPL_TICE
    f = jnp.clip((t_ice_max - temp) / (t_ice_max - t_ice_all), 0.0, 1.0)
    return f ** 4


class Moist:
    """Facade for the moist physics linearization (one per LinearModel)."""

    def __init__(self, dyn, ak, bk, dt, do_phy_mst=1):
        from .cloud import cloud_params

        self.dyn = dyn
        self.dt = float(dt)
        self.do_phy_mst = int(do_phy_mst)
        self.rasparams = default_rasparams(dyn.npx)
        self.cloudparams = cloud_params(dyn.nx)
        ak = np.asarray(ak, np.float64)
        bk = np.asarray(bk, np.float64)
        pref = ak + bk * MAPL_P00
        self.icmin = max(1, int(np.sum(pref < PMIN_DET)))
        self.sige = pref / pref[-1]
        self._ptop = float(ak[0])
        self._jit = {}

    # -- trajectory --------------------------------------------------------

    def set_ltraj(self, prog, sfc):
        """Build the concrete per-step linearization data + branch tape.

        prog: post-dynamics compute-domain dict (u, v, t, delp, qv, ...);
        sfc: 2-D surface/trajectory fields (ts, frland, kcbl, khl, khu) and
        optional 3-D qls/qcn/cfcn cloud trajectory fields.
        """
        if "ltraj" not in self._jit:
            self._jit["ltraj"] = jax.jit(self._ltraj_fn)
        return self._jit["ltraj"](prog, sfc)

    def _cols(self, x):
        """(npz, 6, ny, nx) -> (npz, B); (6, ny, nx) -> (B,)."""
        if x.ndim == 4:
            return x.reshape(x.shape[0], -1)
        return x.reshape(-1)

    def _uncols(self, x, like):
        return x.reshape(like.shape)

    def _ltraj_fn(self, prog, sfc):
        npz = self.dyn.npz
        dt = self.dt
        t = self._cols(prog["t"])
        delp = self._cols(prog["delp"])
        qv = self._cols(prog["qv"])
        n = self.dyn.nx
        u = self._cols(prog["u"][..., :n, :])
        v = self._cols(prog["v"][..., :, :n])

        zero_top = jnp.zeros_like(delp[:1])
        ple = (jnp.concatenate([zero_top, jnp.cumsum(delp, axis=0)], axis=0)
               + jnp.asarray(self._ptop, t.dtype))
        # GEOS form (set_ltraj:716-719): pk on half levels via PLO
        cnv_ple = 0.01 * ple
        plo = 0.5 * (cnv_ple[:-1] + cnv_ple[1:])
        pk_geos = (plo / 1000.0) ** MAPL_KAPPA
        ptt = MAPL_P00 ** MAPL_KAPPA * t / self._pk_fv(ple)
        temp = ptt * pk_geos

        ts = self._cols(sfc["ts"])
        frland = self._cols(sfc["frland"])
        kcbl = jnp.round(self._cols(sfc["kcbl"])).astype(jnp.int32)
        kcbl = jnp.clip(kcbl, 0, npz)
        khu = jnp.round(self._cols(sfc["khu"])).astype(jnp.int32)
        khl = jnp.round(self._cols(sfc["khl"])).astype(jnp.int32)

        seedras = (1.0e6 * (100.0 * temp[-1]
                            - jnp.floor(100.0 * temp[-1]))).astype(jnp.int32)
        lv1 = jnp.arange(1, npz + 1)[:, None]
        wgt0 = (lv1 >= kcbl[None, :]).astype(t.dtype)
        wgt1 = wgt0
        co_auto = jnp.where(frland < 0.1, AUTOC_CN_OCN, AUTOC_CN_LAND)

        # RASE0 trajectory pass (:779-796)
        ptt_c, qvt_c, _, _, clw_c, flxd_c, prc3_c, updf_c = rase(
            dt, self.icmin, self.sige, kcbl, wgt0, wgt1, frland, ts,
            ptt, qv, jnp.zeros_like(u), jnp.zeros_like(v), co_auto,
            cnv_ple, self.rasparams, seedras, with_winds=False)

        # DOCONVEC heating-rate filter (:798-846)
        heat = (ptt_c - ptt) / dt
        aheat = jnp.abs(heat)
        hmax = jnp.max(aheat, axis=0)
        sig = aheat > 0.01 * hmax[None, :]
        lv = jnp.arange(npz)[:, None]
        ctop = jnp.min(jnp.where(sig, lv, npz - 1), axis=0) + 1  # Fortran lvl
        k_i = jnp.clip(kcbl - 1, 0, npz - 1)
        depth_ok = (kcbl - ctop) >= (1 if self.do_phy_mst == 1 else 10)
        band = (lv + 1 >= ctop[None, :]) & (lv + 1 <= kcbl[None, :] - 1)
        nb = jnp.maximum(kcbl - ctop, 1)
        sum_heat = (jnp.sum(jnp.where(band, aheat, 0.0), axis=0)
                    - jnp.max(jnp.where(band, aheat, 0.0), axis=0)) / nb
        below = lv + 1 <= kcbl[None, :] - 1
        hmax_b = jnp.max(jnp.where(below, aheat, 0.0), axis=0)
        spike_ok = sum_heat / jnp.where(hmax_b > 0.0, hmax_b, 1.0) > 0.125
        doconvec = (ctop != npz) & depth_ok & spike_ok & (kcbl > 0)

        # two-column Jacobian filter (:879-975): jvp of the wind-free RASE
        # seeded in theta at KCBL and qv at KCBL+1
        zu = jnp.zeros_like(u)

        def rase0_tq(th, q):
            out = rase(dt, self.icmin, self.sige, kcbl, wgt0, wgt1, frland,
                       ts, th, q, zu, zu, co_auto, cnv_ple, self.rasparams,
                       seedras, with_winds=False)
            return out[0], out[1]

        onehot_t = (lv == k_i[None, :]).astype(t.dtype)
        kq = jnp.where(kcbl == npz, k_i, jnp.clip(kcbl, 0, npz - 1))
        onehot_q = (lv == kq[None, :]).astype(t.dtype)
        zq = jnp.zeros_like(qv)
        _, (dth1, dqv1) = jax.jvp(rase0_tq, (ptt, qv), (onehot_t, zq))
        _, (dth2, dqv2) = jax.jvp(rase0_tq, (ptt, qv), (zq, onehot_q))
        h1 = jnp.max(jnp.abs(dth1 - onehot_t), axis=0) / dt
        m1 = jnp.max(jnp.abs(dqv1), axis=0) / dt
        h2 = jnp.max(jnp.abs(dth2), axis=0) / dt
        m2 = jnp.max(jnp.abs(dqv2 - onehot_q), axis=0) / dt
        jac_ok = ((h1 <= JFILT[0]) & (h2 <= JFILT[1])
                  & (m1 <= JFILT[2]) & (m2 <= JFILT[3]))
        doconvec = doconvec & jac_ok

        # cloud-splitting fractions (:848-877)
        zero3 = jnp.zeros_like(t)
        qls = self._cols(sfc["qls"]) if "qls" in sfc else zero3
        qcn = self._cols(sfc["qcn"]) if "qcn" in sfc else zero3
        fqi = ice_fraction(temp)
        qilst = qls * fqi
        qllst = qls * (1.0 - fqi)
        qicnt = qcn * fqi
        qlcnt = qcn * (1.0 - fqi)

        def frac(a, b):
            s = a + b
            pos = s > 0.0
            return (jnp.where(pos, a / jnp.where(pos, s, 1.0), 0.0),
                    jnp.where(pos, b / jnp.where(pos, s, 1.0), 0.0))

        ilsf, icnf = frac(qilst, qicnt)
        llsf, lcnf = frac(qllst, qlcnt)

        cfcnt = (self._cols(prog["cfcn"]) if "cfcn" in prog else zero3)

        ltraj = dict(ptt=ptt, qvt=qv, ut=u, vt=v, pk_fv=self._pk_fv(ple),
                     cnv_ple=cnv_ple, ple=ple, ts=ts, frland=frland,
                     kcbl=kcbl, khu=khu, khl=khl,
                     wgt0=wgt0, wgt1=wgt1, co_auto=co_auto, seedras=seedras,
                     doconvec=doconvec, ilsf=ilsf, icnf=icnf, llsf=llsf,
                     lcnf=lcnf,
                     # the cloud scheme's linearization point: the UNGATED
                     # RASE0 trajectory (set_ltraj:731-775) + cloud fields
                     ptt_c=ptt_c, qvt_c=qvt_c, clw_c=clw_c, flxd_c=flxd_c,
                     prc3_c=prc3_c, updf_c=updf_c,
                     qilst=qilst, qllst=qllst, qicnt=qicnt, qlcnt=qlcnt,
                     cfcnt=cfcnt)

        # branch tape of the full moist step at this trajectory
        with freeze.recording() as tape:
            self._moist_step(ltraj, self._x0(ltraj))
        return ltraj, list(tape)

    def _x0(self, ltraj):
        """The linearization point of the moist step in scheme variables."""
        return dict(ptt=ltraj["ptt"], qvt=ltraj["qvt"], ut=ltraj["ut"],
                    vt=ltraj["vt"], qils=ltraj["qilst"], qlls=ltraj["qllst"],
                    qicn=ltraj["qicnt"], qlcn=ltraj["qlcnt"],
                    cfcn=ltraj["cfcnt"])

    def _pk_fv(self, ple):
        """FV pk = d(p^kappa)/dlogp layer mean used for T<->theta."""
        pek = ple ** MAPL_KAPPA
        peln = jnp.log(ple)
        return (pek[1:] - pek[:-1]) / (MAPL_KAPPA * (peln[1:] - peln[:-1]))

    # -- the differentiated moist step (convection + cloud) -----------------

    def _moist_step(self, ltraj, x):
        """One moist physics application on column scheme variables
        x = {ptt, qvt, ut, vt, qils, qlls, qicn, qlcn, cfcn}.

        Convection: columns where DOCONVEC is false pass through unchanged
        (fv3jedi_lm_moist_mod.F90:455-477: rase_d called only where
        doconvec==1).  Cloud: linearized at the stored UNGATED RASE0
        trajectory (ptt_c/qvt_c/cnv_*_c) while the tangents ride in from
        the gated convection — the reference's step_tl composition
        (:483-500), expressed with freeze.mix_primal.  Outputs ptt/qvt
        take their PRIMAL from convection and their tangent from the cloud
        scheme (the step_nl writeback discards the cloud's trajectory
        temperature/humidity update, :383-390)."""
        from .cloud import cloud_driver

        mix = freeze.mix_primal
        kcbl_eff = jnp.where(ltraj["doconvec"], ltraj["kcbl"], 0)
        tho, qho, uho, vho, clw, flxd, prc3, updf = rase(
            self.dt, self.icmin, self.sige, kcbl_eff, ltraj["wgt0"],
            ltraj["wgt1"], ltraj["frland"], ltraj["ts"],
            x["ptt"], x["qvt"], x["ut"], x["vt"], ltraj["co_auto"],
            ltraj["cnv_ple"], self.rasparams, ltraj["seedras"])

        th2, q2, qils2, qlls2, qicn2, qlcn2, _, cfcn2 = cloud_driver(
            self.dt,
            mix(ltraj["ptt_c"], tho), mix(ltraj["qvt_c"], qho),
            ltraj["ple"],
            mix(ltraj["clw_c"], clw), mix(ltraj["flxd_c"], flxd),
            mix(ltraj["prc3_c"], prc3), mix(ltraj["updf_c"], updf),
            x["qils"], x["qlls"], x["qicn"], x["qlcn"],
            jnp.zeros_like(x["qils"]), x["cfcn"],
            ltraj["frland"], ltraj["khu"], ltraj["khl"],
            self.cloudparams, None, self.do_phy_mst)

        return dict(ptt=mix(tho, th2), qvt=mix(qho, q2), ut=uho, vt=vho,
                    qi=qils2 + qicn2, ql=qlls2 + qlcn2, cfcn=cfcn2)

    # -- public NL / TL / AD ------------------------------------------------

    def _marshal_in(self, ltraj, pert):
        """Compute-domain pert dict -> column scheme pert (step_tl:428-440):
        theta scaling, qi/ql split by the trajectory fractions, cfls = 0."""
        n = self.dyn.nx
        p00k = MAPL_P00 ** MAPL_KAPPA
        qi = self._cols(pert["qi"])
        ql = self._cols(pert["ql"])
        return dict(
            ptt=self._cols(pert["t"]) * p00k / ltraj["pk_fv"],
            qvt=self._cols(pert["qv"]),
            ut=self._cols(pert["u"][..., :n, :]),
            vt=self._cols(pert["v"][..., :, :n]),
            qils=qi * ltraj["ilsf"], qicn=qi * ltraj["icnf"],
            qlls=ql * ltraj["llsf"], qlcn=ql * ltraj["lcnf"],
            cfcn=self._cols(pert["cfcn"]))

    def _marshal_out(self, ltraj, pert, y):
        """Column scheme pert -> compute-domain pert dict (step_tl:510-520);
        fields the scheme does not touch pass through."""
        n = self.dyn.nx
        p00k = MAPL_P00 ** MAPL_KAPPA
        out = dict(pert)
        out["t"] = self._uncols(y["ptt"] * ltraj["pk_fv"] / p00k, pert["t"])
        out["qv"] = self._uncols(y["qvt"], pert["qv"])
        out["u"] = pert["u"].at[..., :n, :].set(
            self._uncols(y["ut"], pert["u"][..., :n, :]))
        out["v"] = pert["v"].at[..., :, :n].set(
            self._uncols(y["vt"], pert["v"][..., :, :n]))
        out["qi"] = self._uncols(y["qi"], pert["qi"])
        out["ql"] = self._uncols(y["ql"], pert["ql"])
        out["cfcn"] = self._uncols(y["cfcn"], pert["cfcn"])
        return out

    def apply_nl(self, ltraj, tape, prog):
        """Nonlinear moist step on the trajectory prog dict (step_nl
        writeback, fv3jedi_lm_moist_mod.F90:383-390)."""
        with freeze.replaying(tape):
            y = self._moist_step(ltraj, self._x0(ltraj))
        out = dict(prog)
        n = self.dyn.nx
        p00k = MAPL_P00 ** MAPL_KAPPA
        out["t"] = self._uncols(y["ptt"] * ltraj["pk_fv"] / p00k, prog["t"])
        out["qv"] = self._uncols(y["qvt"], prog["qv"])
        out["u"] = prog["u"].at[..., :n, :].set(
            self._uncols(y["ut"], prog["u"][..., :n, :]))
        out["v"] = prog["v"].at[..., :, :n].set(
            self._uncols(y["vt"], prog["v"][..., :, :n]))
        out["qi"] = self._uncols(y["qi"], prog["qi"])
        out["ql"] = self._uncols(y["ql"], prog["ql"])
        if "cfcn" in prog:
            out["cfcn"] = self._uncols(y["cfcn"], prog["cfcn"])
        return out

    def _tl_fn(self, ltraj, tape, pert):
        """The tangent-linear moist operator, linear in `pert`."""
        dx = self._marshal_in(ltraj, pert)
        with freeze.replaying(tape):
            _, dy = jax.jvp(lambda x: self._moist_step(ltraj, x),
                            (self._x0(ltraj),), (dx,))
        return self._marshal_out(ltraj, pert, dy)

    def apply_tl(self, ltraj, tape, pert):
        return self._tl_fn(ltraj, tape, pert)

    def apply_ad(self, ltraj, tape, pert_ad):
        """Exact transpose of apply_tl: vjp of the linear TL operator
        (marshalling transposes included automatically) — the reference
        needs the hand-curated cloud_ad.F90/convection_ad.F90 sweeps and
        mirrored adjoint marshalling (step_ad:507-620) for this."""
        zeros = jax.tree.map(jnp.zeros_like, pert_ad)
        _, pull = jax.vjp(lambda p: self._tl_fn(ltraj, tape, p), zeros)
        return pull(pert_ad)[0]
