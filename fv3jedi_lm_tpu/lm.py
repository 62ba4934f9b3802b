"""L0 facade: the linear-model API.

TPU-native re-design of the reference facade `fv3jedi_lm_type`
(src/fv3jedi_lm_mod.F90:20-257, methods create:44 / step_nl:148 /
step_tl:161 / step_ad:176) and the dynamics driver's state marshalling
(src/dynamics/fv3jedi_lm_dynamics_mod.F90: traj_to_fv3:717, pert_to_fv3:848,
fv3_to_pert:893).

Design (SURVEY.md section 7.1):
* trajectory and perturbation are plain dict pytrees of compute-domain
  arrays — u (npz,6,ny+1,nx), v (npz,6,ny,nx+1), t/delp/qv/ql/qi/o3
  (npz,6,ny,nx), plus 2-D phis (6,ny,nx) on the trajectory;
* `step_nl` advances the trajectory with the nonlinear model;
* `step_tl` is `jax.jvp` of the (pure) nonlinear step — the exact discrete
  tangent linear.  This corresponds to the reference configured with
  `split_hord/split_kord/split_damp = .false.` (model_tlmadm/
  fv_control_tlmadm.F90:220-252: trajectory adopts the pert coefficients,
  so TLM == derivative of the one shared nonlinear operator);
* `step_ad` is `jax.vjp` of the same step: the adjoint is the transpose of
  the TL operator by construction, so the dot-product identity
  <M dx, dy> == <dx, M^T dy> holds to machine precision — the reference
  needs 35 k lines of hand-curated Tapenade adjoint sweeps
  (model_tlmadm/*_adm.F90) for the same contract.

The adjoint costs ~= one forward recompute + one reverse sweep, same cost
model as the reference (fv3jedi_lm_dynamics_mod.F90:507-633); trajectory
residuals are checkpointed by XLA per `jax.checkpoint` policies placed at
the k_split/n_split loop boundaries inside fv_dynamics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import NG
from .config import LMConfig
from .grid.device import to_device
from .grid.eta import default_ak_bk
from .grid.metrics import build_grid
from .core.fv_dynamics import fv_dynamics
from .parallel import halo

TRACERS = ("qv", "ql", "qi", "o3")  # ncnst=4 (fv3jedi_lm_dynamics_mod.F90:159-167)
PROG_3D = ("u", "v", "t", "delp") + TRACERS
#: with moist physics the convective cloud fraction cfcn becomes a pert
#: field AND the 5th advected tracer (ncnst=5,
#: fv3jedi_lm_dynamics_mod.F90:159-167); see LinearModel.tracers
#: 2-D surface trajectory fields consumed by the physics
#: (fv3jedi_lm_traj, src/utils/fv3jedi_lm_utils_mod.F90:43-54)
SURFACE_2D = ("frland", "frocean", "varflt", "zpbl", "cm", "ct", "cq",
              "ustar", "bstar", "ts", "kcbl", "khl", "khu")
#: 3-D cloud trajectory fields consumed by the moist physics
#: (traj%qls/qcn/cfcn, fv3jedi_lm_moist_mod.F90:721-726)
MOIST_3D = ("qls", "qcn", "cfcn")
#: fields the turbulence diffusion acts on (fv3jedi_lm_turbulence_mod.F90:192-198)
PHYS_FIELDS = ("u", "v", "t", "qv", "qi", "ql", "o3")


class LinearModel:
    """Facade object: `create` once per (resolution, config), then step.

    Mirrors the reference 10-method API (fv3jedi_lm_mod.F90:27-37); the
    init_*/final_* pairs collapse away because steps are pure functions —
    there is no mutable module state to set up or tear down.
    """

    def __init__(self, cfg: LMConfig, ak=None, bk=None, big=None):
        # apply the split_* coupling: unless split, the trajectory adopts
        # the perturbation coefficients (fv_control_tlmadm.F90:220-252)
        cfg = cfg.replace(dyn=cfg.dyn.resolve())
        self.cfg = cfg
        dyn = cfg.dyn
        # ncnst = 4, or 5 with moist physics: cfcn rides as the 5th
        # advected tracer (fv3jedi_lm_dynamics_mod.F90:159-167)
        self.tracers = TRACERS + ("cfcn",) if cfg.do_phy_mst else TRACERS
        self.prog_3d = ("u", "v", "t", "delp") + self.tracers
        if not cfg.dyn.hydrostatic:
            # NH prognostics/pert fields (fv3jedi_lm_dynamics_mod.F90:
            # 772-775, 834-836: traj%w/delz and pert wp/delzp)
            self.prog_3d = self.prog_3d + ("w", "delz")
        self.dtype = jnp.dtype(dyn.dtype)
        if big is None:
            # halo-sentinel magnitude for undefined metric lanes (reference
            # big_number, fv_grid_utils_nlm.F90:49).  No differentiated path
            # reads sentinel lanes (tests/test_sentinel.py proves value
            # invariance), but intermediate products of the *discarded*
            # lanes must stay finite in the working dtype — f32 overflows
            # at (1e30)^2 — so the default scales with the dtype.
            big = 1.0e30 if self.dtype == jnp.float64 else 1.0e8
        gm = build_grid(dyn.npx, big=big)
        self.topo = gm.topo
        self.grid = to_device(gm, dtype=self.dtype)
        if ak is None:
            ak, bk = default_ak_bk(dyn.npz, ptop=dyn.ptop)
        self.ak = jnp.asarray(ak, dtype=self.dtype)
        self.bk = jnp.asarray(bk, dtype=self.dtype)
        self.ptop = float(ak[0])
        self._jit_nl = None
        self._stepper = None
        # per-trajectory checkpoint/tape cache (reference saveltraj,
        # fv3jedi_lm_utils_mod.F90:30): with saveltraj the whole window's
        # per-step linearization data stays resident across inner-loop
        # iterations (the tapenade_iter cp cache analogue, SURVEY 5.4);
        # without it only the most recent step's data is kept.
        from collections import OrderedDict
        self._traj_cache = OrderedDict()
        self._traj_cache_max = (cfg.nt + 1) if cfg.saveltraj else 1
        if cfg.do_phy_trb:
            from .physics.turbulence import Turbulence
            self._turb = Turbulence(dyn, self.ak, self.bk)
        else:
            self._turb = None
        if cfg.do_phy_mst:
            from .physics.moist import Moist
            self._moist = Moist(dyn, self.ak, self.bk, cfg.dt,
                                cfg.do_phy_mst)
        else:
            self._moist = None
        self._jit_turb_ltraj = None
        self._jit_phys_tl = None
        self._jit_phys_ad = None
        self._jit_moist = {}

    # -- construction helpers ------------------------------------------------

    @classmethod
    def create(cls, cfg: LMConfig, ak=None, bk=None, big=None) -> "LinearModel":
        """Reference `create(dt,npx,npy,npz,ptop,ak,bk)` (fv3jedi_lm_mod.F90:44)."""
        return cls(cfg, ak, bk, big=big)

    def zero_pert(self) -> dict:
        """Allocate-and-zero a perturbation (allocate_pert,
        src/utils/fv3jedi_lm_utils_mod.F90:75)."""
        n = self.cfg.dyn.nx
        npz = self.cfg.dyn.npz
        z3 = lambda jy, jx: jnp.zeros((npz, 6, jy, jx), self.dtype)
        p = {f: z3(n, n) for f in ("t", "delp") + self.tracers}
        p["u"] = z3(n + 1, n)
        p["v"] = z3(n, n + 1)
        if not self.cfg.dyn.hydrostatic:
            p["w"] = z3(n, n)
            p["delz"] = z3(n, n)
        return p

    def rest_traj(self, t0: float = 280.0, ps0: float = 1.0e5) -> dict:
        """Resting isothermal trajectory (for tests/benchmarks)."""
        tr = self.zero_pert()
        n = self.cfg.dyn.nx
        ak = np.asarray(self.ak)
        bk = np.asarray(self.bk)
        pe = ak[:, None, None, None] + bk[:, None, None, None] * ps0
        tr["delp"] = jnp.asarray(
            (pe[1:] - pe[:-1]) * np.ones((1, 6, n, n)), self.dtype
        )
        tr["t"] = jnp.full_like(tr["t"], t0)
        tr["phis"] = jnp.zeros((6, n, n), self.dtype)
        if not self.cfg.dyn.hydrostatic:
            # layer depths in DISCRETE balance with the SIM1 equation of
            # state: rho*R*T == pm (the layer-mean hydrostatic pressure),
            # so the NH solver starts with zero pressure perturbation and
            # the entry/exit EOS conversions round-trip exactly
            from .constants import GRAV, RGAS
            peln = np.log(np.maximum(pe, 1e-30))
            dlnp = peln[1:] - peln[:-1]
            dm = pe[1:] - pe[:-1]
            pm = dm / dlnp
            tr["delz"] = jnp.asarray(
                -(dm / GRAV) * RGAS * t0 / pm
                * np.ones((1, 6, n, n)), self.dtype)
        for f in SURFACE_2D:
            tr[f] = jnp.zeros((6, n, n), self.dtype)
        return tr

    # -- marshalling (traj_to_fv3 / fv3_to_traj analogues) --------------------

    def _pad(self, prog: dict) -> dict:
        """Compute-domain dict -> padded (halo ng) internal state.

        Halos enter zeroed and are filled inside fv_dynamics — same contract
        as traj_to_fv3 (fv3jedi_lm_dynamics_mod.F90:717-809: zero the data
        domain, copy compute domain, let mpp updates fill halos).  The shared
        D-grid face-edge values are made single-owner consistent exactly as
        the reference's mpp_get_boundary completion (:782-795).
        """
        dyn = self.cfg.dyn
        n = dyn.nx
        npz = dyn.npz
        jc = n + 2 * NG
        jb = jc + 1
        cs = slice(NG, NG + n)
        bs = slice(NG, NG + n + 1)

        def pad3(x, jy, jx, sy, sx):
            out = jnp.zeros((npz, 6, jy, jx), self.dtype)
            return out.at[:, :, sy, sx].set(x.astype(self.dtype))

        st = {}
        st["u"] = pad3(prog["u"], jb, jc, bs, cs)
        st["v"] = pad3(prog["v"], jc, jb, cs, bs)
        st["u"], st["v"] = halo.fix_shared_edges_dgrid(st["u"], st["v"], self.topo)
        st["pt"] = pad3(prog["t"], jc, jc, cs, cs)
        st["delp"] = pad3(prog["delp"], jc, jc, cs, cs)
        if "w" in prog:
            st["w"] = pad3(prog["w"], jc, jc, cs, cs)
            st["delz"] = pad3(prog["delz"], jc, jc, cs, cs)
        else:
            st["w"] = jnp.zeros((npz, 6, jc, jc), self.dtype)
        q = [pad3(prog[name], jc, jc, cs, cs) for name in self.tracers]
        return st, q

    def _unpad(self, st: dict, q: list) -> dict:
        n = self.cfg.dyn.nx
        cs = slice(NG, NG + n)
        bs = slice(NG, NG + n + 1)
        out = {
            "u": st["u"][:, :, bs, cs],
            "v": st["v"][:, :, cs, bs],
            "t": st["pt"][:, :, cs, cs],
            "delp": st["delp"][:, :, cs, cs],
        }
        for name, qq in zip(self.tracers, q):
            out[name] = qq[:, :, cs, cs]
        if "delz" in st:
            out["w"] = st["w"][:, :, cs, cs]
            out["delz"] = st["delz"][:, :, cs, cs]
        if "omga" in st:
            # vertical pressure velocity diagnostic for the physics
            # interface (fv_dynamics_nlm.F90:125, cfg.compute_omega)
            out["omga"] = st["omga"][:, :, cs, cs]
        return out

    def _pad_phis(self, phis):
        dyn = self.cfg.dyn
        jc = dyn.nx + 2 * NG
        phis_p = jnp.zeros((6, jc, jc), self.dtype)
        phis_p = phis_p.at[:, NG:NG + dyn.nx, NG:NG + dyn.nx].set(
            phis.astype(self.dtype)
        )
        return halo.fill_halo_center(phis_p, self.topo)

    # -- the pure one-step function -------------------------------------------

    def _step_fn(self, prog: dict, phis: jnp.ndarray) -> dict:
        """One model step dt on compute-domain prognostic fields (pure).

        The single-executable path (NLM + the multi-device dryrun).  The
        production TLM/ADM run the same stage functions through the staged
        driver (core/staged.py) instead, so that both linearize at identical
        stored trajectory checkpoints with identical frozen branch tapes."""
        dyn = self.cfg.dyn
        st, q = self._pad(prog)
        st["phis"] = self._pad_phis(phis)
        st, q = fv_dynamics(
            st, q, self.grid, self.topo, dyn, self.cfg.dt,
            self.ak, self.bk, self.ptop,
        )
        return self._unpad(st, q)

    def _staged(self):
        if self._stepper is None:
            from .core.staged import StagedStepper
            self._stepper = StagedStepper(self)
        return self._stepper

    def _traj_token(self, traj):
        """Cache key for a trajectory: the identities of its constituent
        arrays — the prognostic fields AND every surface/cloud trajectory
        field the physics linearizes at (kcbl/ts/frland/..., qls/qcn).
        The cache entry PINS those arrays (holds strong references), so a
        key can never be reused by a different trajectory while its entry
        is alive — unlike keying on `id(traj)`, where a freed-then-
        reallocated dict could silently hit a stale entry."""
        fields = self.prog_3d + ("phis",) + tuple(
            f for f in SURFACE_2D + MOIST_3D if f in traj)
        return (tuple(id(traj[k]) for k in fields),
                tuple(traj[k] for k in fields))

    def _ckpts(self, traj):
        """Per-trajectory stage-input checkpoints + frozen branch tapes,
        cached by trajectory-array identity — the reference's `saveltraj`
        local-trajectory cache analogue (fv3jedi_lm_utils_mod.F90:30,
        turbulence/...:180-187); the tapes are its PUSHCONTROL record
        (utils/tapenade/adBuffer.f:114-343)."""
        key, pins = self._traj_token(traj)
        hit = self._traj_cache.get(key)
        if hit is not None:
            self._traj_cache.move_to_end(key)
            return hit[1]
        from . import timing

        stepper = self._staged()
        prog = {k: traj[k] for k in self.prog_3d}
        with timing.timing("ckpts.forward"):
            out, cks = stepper.forward(prog, traj["phis"])
        with timing.timing("ckpts.record"):
            tapes = stepper.record(cks)
        if self._moist is not None:
            mpack = self._moist.set_ltraj(out, self._moist_sfc(traj))
            out = self._jit_m("nl", self._moist.apply_nl)(*mpack, out)
        else:
            mpack = None
        ltraj = self._turb_ltraj(out, traj) if self._turb is not None else None
        self._traj_cache[key] = (pins, (cks, tapes, mpack, ltraj))
        while len(self._traj_cache) > self._traj_cache_max:
            self._traj_cache.popitem(last=False)
        return cks, tapes, mpack, ltraj

    # -- physics (moist) -------------------------------------------------------

    def _jit_m(self, name, fn):
        if name not in self._jit_moist:
            self._jit_moist[name] = jax.jit(fn)
        return self._jit_moist[name]

    def _moist_sfc(self, traj):
        """Surface + cloud trajectory fields the moist driver reads
        (fv3jedi_lm_moist_mod.F90 set_ltraj:721-737)."""
        n = self.cfg.dyn.nx
        sfc = {f: traj.get(f, jnp.zeros((6, n, n), self.dtype))
               for f in ("ts", "frland", "kcbl", "khu", "khl")}
        for f in MOIST_3D:
            if f in traj:
                sfc[f] = traj[f]
        return sfc

    # -- physics (turbulence) --------------------------------------------------

    def _turb_ltraj(self, post_dyn_prog: dict, traj: dict):
        """Frozen-K turbulence coefficients linearized at the post-dynamics
        state (the reference physics step runs after the dynamics has
        updated traj, fv3jedi_lm_mod.F90:148-157)."""
        if self._jit_turb_ltraj is None:
            def f(prog, sfc):
                tr = dict(prog, **sfc)
                return self._turb.set_ltraj(tr, self.cfg.dt,
                                            do_phy_mst=self.cfg.do_phy_mst)
            self._jit_turb_ltraj = jax.jit(f)
        n = self.cfg.dyn.nx
        npz = self.cfg.dyn.npz
        sfc = {f: traj.get(f, jnp.zeros((6, n, n), self.dtype))
               for f in SURFACE_2D}
        for f in ("qls", "qcn"):   # 3-D cloud condensate (bldriver QLTOT)
            sfc[f] = traj.get(f, jnp.zeros((npz, 6, n, n), self.dtype))
        return self._jit_turb_ltraj(post_dyn_prog, sfc)

    def _phys_apply(self, ltraj, prog):
        """Apply the (linear) frozen-K turbulence diffusion to a prog dict,
        then restore shared D-edge single ownership (the reference refreshes
        those at the next dynamics entry via mpp_get_boundary)."""
        n = self.cfg.dyn.nx
        fs = {k: prog[k] for k in ("t", "qv", "qi", "ql", "o3")}
        fs["u"] = prog["u"][..., :n, :]
        fs["v"] = prog["v"][..., :, :n]
        out = self._turb.apply(ltraj, fs)
        u = prog["u"].at[..., :n, :].set(out["u"])
        v = prog["v"].at[..., :, :n].set(out["v"])
        st, _ = self._pad(dict(prog, u=u, v=v))
        cs = slice(NG, NG + n)
        bs = slice(NG, NG + n + 1)
        return dict(prog, u=st["u"][:, :, bs, cs], v=st["v"][:, :, cs, bs],
                    t=out["t"], qv=out["qv"], qi=out["qi"], ql=out["ql"],
                    o3=out["o3"])

    # -- public stepping API ---------------------------------------------------

    def step_nl(self, traj: dict) -> dict:
        """Nonlinear trajectory step (fv3jedi_lm_mod.F90:148-157)."""
        if self._jit_nl is None:
            self._jit_nl = jax.jit(self._step_fn)
        phis = traj["phis"]
        prog = {k: traj[k] for k in self.prog_3d}
        out = self._jit_nl(prog, phis)
        if self._moist is not None:
            mpack = self._moist.set_ltraj(out, self._moist_sfc(traj))
            out = self._jit_m("nl", self._moist.apply_nl)(*mpack, out)
        if self._turb is not None:
            ltraj = self._turb_ltraj(out, traj)
            if self._jit_phys_tl is None:
                self._jit_phys_tl = jax.jit(self._phys_apply)
            out = self._jit_phys_tl(ltraj, out)
        out["phis"] = phis
        for f in SURFACE_2D + MOIST_3D:
            # pass static surface/cloud trajectory fields through — but a
            # field the step itself produced (cfcn when it is the 5th
            # tracer) keeps its stepped value
            if f in traj and f not in out:
                out[f] = traj[f]
        from . import debug
        if debug.enabled():
            # reference prt_maxmin/range_check debug surface
            # (fv_diagnostics_nlm.F90:79-81), FV3LM_DEBUG=1|raise
            debug.check_state({k: out[k] for k in self.prog_3d},
                              label="step_nl.")
        return out

    def step_tl(self, traj: dict, pert: dict) -> dict:
        """Tangent-linear step: pert' = M(traj) @ pert (fv3jedi_lm_mod.F90:161).

        Per-stage jvp of the discrete nonlinear step, linearized at the
        STORED trajectory checkpoints (core/staged.py).  The adjoint
        linearizes the same stages at the same stored values, which is what
        keeps <M dx, dy> == <dx, M^T dy> at machine precision.  The
        trajectory output is discarded, as in the reference
        (fv3jedi_lm_dynamics_mod.F90:448).
        """
        from . import timing

        prog = {k: traj[k] for k in self.prog_3d}
        p = {k: pert[k].astype(self.dtype) for k in self.prog_3d}
        cks, tapes, mpack, ltraj = self._ckpts(traj)
        with timing.timing("step_tl.dyn", lambda: p):
            p = self._staged().tl(prog, traj["phis"], p, cks, tapes)
        if self._moist is not None:
            with timing.timing("step_tl.moist", lambda: p):
                p = self._jit_m("tl", self._moist.apply_tl)(*mpack, p)
        if self._turb is not None:
            if self._jit_phys_tl is None:
                self._jit_phys_tl = jax.jit(self._phys_apply)
            with timing.timing("step_tl.turb", lambda: p):
                p = self._jit_phys_tl(ltraj, p)
        return p

    def step_ad(self, traj: dict, pert_ad: dict) -> dict:
        """Adjoint step: pert_bar = M(traj)^T @ pert_ad (fv3jedi_lm_mod.F90:176).

        Per-stage vjp at the stored trajectory checkpoints — the reference's
        fwd-recompute/PUSH + bwd-sweep/POP design (fv3jedi_lm_dynamics_mod.
        F90:507-633), where the reference needs 135k lines of hand-curated
        Tapenade adjoint sweeps (model_tlmadm/*_adm.F90) + the adStack
        runtime for the same contract."""
        from . import timing

        prog = {k: traj[k] for k in self.prog_3d}
        pb = {k: pert_ad[k].astype(self.dtype) for k in self.prog_3d}
        cks, tapes, mpack, ltraj = self._ckpts(traj)
        if self._turb is not None:
            if self._jit_phys_ad is None:
                self._jit_phys_ad = jax.jit(
                    lambda lt, f: self._turb_apply_transpose(lt, f))
            with timing.timing("step_ad.turb", lambda: pb):
                pb = self._jit_phys_ad(ltraj, pb)
        if self._moist is not None:
            with timing.timing("step_ad.moist", lambda: pb):
                pb = self._jit_m("ad", self._moist.apply_ad)(*mpack, pb)
        with timing.timing("step_ad.dyn"):
            out = self._staged().ad(prog, traj["phis"], pb, cks, tapes)
        return out

    def _turb_apply_transpose(self, ltraj, pb):
        """Exact transpose of _phys_apply (the reference's vtrisolvepert
        phase-2 sweeps, fv3jedi_lm_turbulence_mod.F90:286-350)."""
        _, vjp = jax.vjp(lambda f: self._phys_apply(ltraj, f), pb)
        return vjp(dict(pb))[0]

    # -- window (4D-Var inner-loop) driver -------------------------------------
    #
    # The reference leaves the nt-step window loop to FV3-JEDI (SURVEY 3.5):
    # per outer iteration the host propagates and stores the trajectory, then
    # for each inner iteration runs the TLM forward over the window and the
    # ADM backward (src/fv3jedi_lm_mod.F90:105-219, conf%nt/n in
    # src/utils/fv3jedi_lm_utils_mod.F90:16-18).  Here the window driver is
    # part of the framework: `run_nl` stores the per-step trajectory,
    # `run_tl`/`run_ad` sweep it.  With cfg.saveltraj the per-step
    # linearization data (checkpoints + branch tapes) stays cached across
    # calls — the tapenade_iter iterative-checkpointing cache analogue
    # (utils/tapenade/tapenade_iter.F90:118-199).

    def run_nl(self, traj0: dict) -> list:
        """Propagate the window: returns [x_0, x_1, ..., x_nt] (nt+1 states).

        trajs[n] is the linearization state for window step n."""
        trajs = [traj0]
        tr = traj0
        for _ in range(self.cfg.nt):
            tr = self.step_nl(tr)
            trajs.append(tr)
        return trajs

    def run_tl(self, trajs: list, pert: dict) -> dict:
        """M_window = M(x_{nt-1}) @ ... @ M(x_0) applied to pert."""
        p = pert
        for n in range(self.cfg.nt):
            p = self.step_tl(trajs[n], p)
        return p

    def run_ad(self, trajs: list, pert_ad: dict) -> dict:
        """Exact transpose of run_tl: reversed per-step adjoint sweep."""
        pb = pert_ad
        for n in reversed(range(self.cfg.nt)):
            pb = self.step_ad(trajs[n], pb)
        return pb
