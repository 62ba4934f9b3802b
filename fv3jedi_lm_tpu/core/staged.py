"""Checkpointed split-linearization TLM/ADM driver.

The reference's TLM/ADM architecture (fv3jedi_lm_dynamics_mod.F90:347-633):

* the adjoint runs a forward sweep that recomputes the trajectory and
  PUSHes per-substep state + control-flow bits to the Tapenade stack, then
  a reverse sweep that POPs them;
* when the split_* options are on (the production default), the tangent is
  NOT the derivative of the trajectory scheme: each advection/remap/damping
  operator runs its linear perturbation variant (hord_*_pert=2,
  kord_*_pert=17, pert damping) for the tangent while the trajectory keeps
  its own scheme (dyn_core_tlm.F90:835-960, fv_mapz_tlm.F90:571-830).

TPU-native equivalents here:

* `forward` — one jitted program: the nonlinear step, additionally
  returning every stage input (the per-k_split interface states and the
  per-acoustic-substep carries, stacked along a scan axis) — the "push".
* `record` — a HOST loop of small per-substep programs: each runs the
  MIXED (traj-primal / pert-tangent) stages at one stored checkpoint under
  `freeze.recording`, returning that substep's branch decisions (upwind
  masks, limiter switches, remap indices) as arrays — the reference's
  PUSHCONTROL bits, stored as data.
* `tl` / `ad` — jvp / vjp of the mixed stages applied AT the stored
  checkpoints, with all branch decisions replayed from the tape.  Because
  TL and AD consume bitwise-identical linearization points AND branch
  decisions, `<M dx, dy> == <dx, M^T dy>` holds to the rounding of the
  applications (~1e-13), immune to XLA compiling the two programs
  differently.

Each sweep exists in TWO executable forms, selected by the environment
variables FV3LM_TL / FV3LM_AD ("fused" | "split"):

* "fused" (default): ONE jitted program per sweep (`lax.scan` over the
  stacked substep checkpoints/tapes).  Minimum dispatch count — on a
  remote-TPU tunnel each program dispatch costs a round trip, and the
  split adjoint's ~34 dispatches/step were measured 30x slower than the
  fused path under tunnel degradation.
* "split": a HOST loop of per-stage programs — the reference's POP-per-
  iteration discipline (fv3jedi_lm_dynamics_mod.F90:588-633).  Caps live
  memory at one stage's working set; the robust fallback when the fused
  program's XLA temp buffers push past HBM.

`record` always runs as a host loop of per-substep programs (its fused
form carried 4.9 GB XLA temps + 1.6 GB generated code at c96L72 —
measured via scripts/mem_report.py — which crashed the remote-TPU
worker); the per-substep tapes are then stacked into scan-ready form by
one trivial concat program.

Memory model = the reference's Tapenade-stack model: O(n_split * k_split)
read-set carries + bit-packed tapes per trajectory step, plus one
substep's ("fused") or one stage's ("split") jvp/vjp residuals.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import KAPPA
from . import freeze
from .dyn_core import acoustic_carry, make_acoustic_substep
from .fv_dynamics import (post_acoustic_stage, pre_acoustic_stage,
                          prep_stage)


class StagedStepper:
    """Builds and caches the forward/record/tl/ad executables for one LM."""

    def __init__(self, lm):
        self.lm = lm
        dyn = lm.cfg.dyn
        self.k_split = dyn.k_split
        self.n_split = dyn.n_split
        self.npz = dyn.npz
        grid, topo = lm.grid, lm.topo
        mdt = lm.cfg.dt / dyn.k_split
        ptop = lm.ptop
        ak, bk = lm.ak, lm.bk
        dtype = lm.dtype
        npz = dyn.npz

        # ---- pure stage functions ----
        def prep(prog, phis):
            st, q = lm._pad(prog)
            st["phis"] = lm._pad_phis(phis)
            return prep_stage(st, q, grid, topo, dyn, ptop)

        def pre(st):
            st2, dp1 = pre_acoustic_stage(st, grid, topo, dyn)
            carry = acoustic_carry(st2, dyn, npz, dtype)
            return st2, dp1, carry

        import numpy as np
        pe_ref = np.asarray(ak, np.float64) + np.asarray(bk, np.float64) * 1e5
        pm = ((pe_ref[1:] - pe_ref[:-1])
              / np.log(np.maximum(pe_ref[1:], 1e-10)
                       / np.maximum(pe_ref[:-1], 1e-10)))
        dp_ref = pe_ref[1:] - pe_ref[:-1]
        self._sub_traj = make_acoustic_substep(
            grid, topo, dyn, mdt, KAPPA, ptop, npz, dtype, mode="traj",
            pm=pm, dp_ref=dp_ref)
        self._sub_mix = make_acoustic_substep(
            grid, topo, dyn, mdt, KAPPA, ptop, npz, dtype, mode="mixed",
            pm=pm, dp_ref=dp_ref)

        def post(st2, carry, q, dp1, last, mode):
            return post_acoustic_stage(st2, carry, q, dp1, grid, topo, dyn,
                                       ak, bk, ptop, mdt, last, mode=mode)

        def unpad(st, q):
            return lm._unpad(st, q)

        def unpad_T(pb):
            """Exact transpose of lm._unpad: scatter the compute-domain
            cotangent into zero-padded internal state (keys _unpad never
            reads get zero cotangent)."""
            from .. import NG
            n = dyn.nx
            jc = n + 2 * NG
            jb = jc + 1
            cs = slice(NG, NG + n)
            bs = slice(NG, NG + n + 1)
            z3 = lambda jy, jx: jnp.zeros((npz, 6, jy, jx), dtype)
            st = dict(
                u=z3(jb, jc).at[:, :, bs, cs].set(pb["u"]),
                v=z3(jc, jb).at[:, :, cs, bs].set(pb["v"]),
                pt=z3(jc, jc).at[:, :, cs, cs].set(pb["t"]),
                delp=z3(jc, jc).at[:, :, cs, cs].set(pb["delp"]),
                w=z3(jc, jc), uc=z3(jc, jb), vc=z3(jb, jc),
                divgd=z3(jb, jb),
                mfx=z3(n, n + 1), mfy=z3(n + 1, n),
                cx=z3(jc, n + 1), cy=z3(n + 1, jc),
                ps=jnp.zeros((6, jc, jc), dtype),
                phis=jnp.zeros((6, jc, jc), dtype),
            )
            if not dyn.hydrostatic:
                # NH prognostic cotangents (w/delz from the pert state;
                # ws is internal, zero cotangent)
                st["w"] = z3(jc, jc).at[:, :, cs, cs].set(pb["w"])
                st["delz"] = z3(jc, jc).at[:, :, cs, cs].set(pb["delz"])
                st["ws"] = jnp.zeros((6, jc, jc), dtype)
            from ..ops.reductions import CONSV_MIN
            if dyn.consv_te > CONSV_MIN and dyn.hydrostatic:
                st["te0_2d"] = jnp.zeros((6, n, n), dtype)
            q = [z3(jc, jc).at[:, :, cs, cs].set(pb[name])
                 for name in self.lm.tracers]
            return st, q

        self._stages = dict(prep=prep, pre=pre, post=post, unpad=unpad,
                            unpad_T=unpad_T)
        self._exe = {}
        # sweep executable form: "fused" = one program (min dispatches,
        # best on a remote-TPU tunnel), "split" = host loop of per-stage
        # programs (min live memory).  See module docstring.
        self.tl_mode = os.environ.get("FV3LM_TL", "fused")
        self.ad_mode = os.environ.get("FV3LM_AD", "fused")

        # Checkpoint-stack pruning: fields of the acoustic carry the substep
        # OVERWRITES before ever reading them carry no linearization
        # information, so the stacked per-substep checkpoints ("push", the
        # Tapenade-stack analogue) store only the read set.  pe/peln/pk/pkz
        # are recomputed by geopk from delp/pt each substep; uc/vc/divgd are
        # rebuilt by c_sw/d2a2c_vect from u/v (sw_core_nlm.F90:77-160); w is
        # inert on the hydrostatic path.  The flux/courant ACCUMULATORS
        # (mfx/mfy/cx/cy/heat_source) are read but enter PURELY LINEARLY
        # (acc + increment, never compared or multiplied by state), so the
        # Jacobian at any value — including zero — is exact; pruning them
        # too cuts another ~0.5 GB at c96L72.  du/dv (beta>0) are genuinely
        # read-nonlinear (off-centered gradient) and stay.
        self._prune = ("pe", "peln", "pk", "pkz", "uc", "vc", "divgd",
                       "mfx", "mfy", "cx", "cy", "heat_source")
        if dyn.hydrostatic:
            self._prune = self._prune + ("w",)

    def _prune_carry(self, c):
        return {k: v for k, v in c.items() if k not in self._prune}

    def _expand_carry(self, c):
        """Rebuild the full carry pytree from a pruned checkpoint; the
        pruned fields are either write-before-read in the substep or pure
        linear accumulators, so zeros are a valid (and exact)
        linearization point for them."""
        from .. import NG
        dyn = self.lm.cfg.dyn
        n = dyn.nx
        jc = n + 2 * NG
        jb = jc + 1
        npz = self.npz
        dtype = self.lm.dtype
        z = lambda *s: jnp.zeros(s, dtype)
        full = dict(c)
        shapes = dict(
            pe=(npz + 1, 6, jc, jc), peln=(npz + 1, 6, jc, jc),
            pk=(npz + 1, 6, jc, jc), pkz=(npz, 6, jc, jc),
            uc=(npz, 6, jc, jb), vc=(npz, 6, jb, jc),
            divgd=(npz, 6, jb, jb), w=(npz, 6, jc, jc),
            mfx=(npz, 6, n, n + 1), mfy=(npz, 6, n + 1, n),
            cx=(npz, 6, jc, n + 1), cy=(npz, 6, n + 1, jc),
            heat_source=(npz, 6, n, n),
        )
        for k in self._prune:
            full[k] = z(*shapes[k])
        return full

    def _get(self, name, fn):
        if name not in self._exe:
            self._exe[name] = jax.jit(fn)
        return self._exe[name]

    # -- forward: NL step + checkpoints ("push") -----------------------------

    def _forward_fn(self, prog, phis):
        s = self._stages
        st, q = s["prep"](prog, phis)
        pre_in, carries, carry_fin = [], [], []
        for k in range(self.k_split):
            pre_in.append((st, q))
            st2, dp1, carry = s["pre"](st)

            def body(c, _):
                return (self._sub_traj(c, dict(phis=st2["phis"])),
                        self._prune_carry(c))

            carry, cstack = lax.scan(body, carry, None, length=self.n_split)
            carries.append(cstack)
            carry_fin.append(carry)
            st, q = s["post"](st2, carry, q, dp1, k == self.k_split - 1,
                              "traj")
        out = s["unpad"](st, q)
        return out, dict(pre_in=pre_in, carries=carries, carry_fin=carry_fin)

    def forward(self, prog, phis):
        return self._get("fwd", self._forward_fn)(prog, phis)

    # -- shared per-stage programs --------------------------------------------

    def _pre_fwd(self, st):
        """Recompute (st2, dp1) from a k_split checkpoint (small program)."""
        def pre_fwd_fn(st):
            st2, dp1, _ = self._stages["pre"](st)
            return st2, dp1
        return self._get("prefwd", pre_fwd_fn)(st)

    # -- record: branch-decision tapes ("push control") ----------------------

    def _rec_sub_fn(self, carries, j, phis_p):
        """Record one substep's per-stage tapes at checkpoint j."""
        sa, sb, sc = self._sub_mix.stages
        c_j = jax.tree.map(lambda x: x[j], carries)
        consts = dict(phis=phis_p)
        cfull = self._expand_carry(c_j)
        with freeze.recording() as ta:
            ab = sa(cfull, consts)
        with freeze.recording() as tb:
            bc = sb(ab, consts)
        with freeze.recording() as tc:
            sc(bc, consts)
        return (list(ta), list(tb), list(tc))

    def record(self, cks):
        """Branch tapes, recorded by a HOST loop of small per-substep
        programs (the fused record program carried 4.9 GB temps at c96L72),
        then stacked along the substep axis into the scan-ready layout the
        fused TL/AD consume."""
        s = self._stages
        sub_tapes, post_tapes = [], []
        for k in range(self.k_split):
            st, q = cks["pre_in"][k]
            st2, dp1 = self._pre_fwd(st)
            phis_p = st2["phis"]
            tapes_k = []
            for j in range(self.n_split):
                tapes_k.append(self._get("rec_sub", self._rec_sub_fn)(
                    cks["carries"][k], jnp.asarray(j, jnp.int32), phis_p))
            sub_tapes.append(self._get(
                "rec_stack",
                lambda *ts: jax.tree.map(lambda *xs: jnp.stack(xs), *ts),
            )(*tapes_k))
            last = k == self.k_split - 1

            def rec_post_fn(st2, carry_fin, q, dp1):
                with freeze.recording() as tape:
                    s["post"](st2, carry_fin, q, dp1, last, "mixed")
                return list(tape)

            post_tapes.append(self._get(("rec_post", last), rec_post_fn)(
                st2, cks["carry_fin"][k], q, dp1))
        return dict(sub=sub_tapes, post=post_tapes)

    def _sub_mix_rep(self, c, consts, tape3):
        """The mixed substep replayed from per-stage tapes (a, b, c)."""
        sa, sb, sc = self._sub_mix.stages
        ta, tb, tc_ = tape3
        with freeze.replaying(ta):
            ab = sa(c, consts)
        with freeze.replaying(tb):
            bc = sb(ab, consts)
        with freeze.replaying(tc_):
            return sc(bc, consts)

    def _slice_tape3(self, tapes_k, j):
        """Per-substep (ta, tb, tc) from the stacked tape layout."""
        return tuple([jax.tree.map(lambda x: x[j], t) for t in ts]
                     for ts in tapes_k)

    # -- tangent linear -------------------------------------------------------

    def tl(self, prog, phis, p, cks, tapes):
        if self.tl_mode == "split":
            return self._tl_split(prog, phis, p, cks, tapes)
        return self._get("tl", self._tl_fn)(prog, phis, cks, tapes, p)

    def _tl_fn(self, prog, phis, cks, tapes, p):
        """Fused single-program TL: lax.scan over the stacked checkpoints
        and tapes (one device dispatch for the whole sweep)."""
        s = self._stages
        zph = jnp.zeros_like(phis)
        t_st, t_q = jax.jvp(s["prep"], (prog, phis), (p, zph))[1]
        for k in range(self.k_split):
            st, q = cks["pre_in"][k]
            st2, dp1, _ = s["pre"](st)
            t_st2, t_dp1, t_carry = jax.jvp(s["pre"], (st,), (t_st,))[1]

            def body(tc, x):
                c_j, tape_j = x
                tc = jax.jvp(lambda c, cn: self._sub_mix_rep(c, cn, tape_j),
                             (self._expand_carry(c_j),
                              dict(phis=st2["phis"])),
                             (tc, dict(phis=t_st2["phis"])))[1]
                return tc, None

            t_carry, _ = lax.scan(body, t_carry,
                                  (cks["carries"][k], tapes["sub"][k]))
            last = k == self.k_split - 1
            with freeze.replaying(tapes["post"][k]):
                t_st, t_q = jax.jvp(
                    lambda a, b, c, d: s["post"](a, b, c, d, last, "mixed"),
                    (st2, cks["carry_fin"][k], q, dp1),
                    (t_st2, t_carry, t_q, t_dp1))[1]
        return s["unpad"](t_st, t_q)

    def _tl_split(self, prog, phis, p, cks, tapes):
        """Split TL: host loop of per-substep jvp programs (min memory)."""
        s = self._stages

        def tl_prep_fn(prog, phis, p):
            zph = jnp.zeros_like(phis)
            return jax.jvp(s["prep"], (prog, phis), (p, zph))[1]

        def tl_pre_fn(st, t_st):
            (st2, dp1, _), (t_st2, t_dp1, t_carry) = jax.jvp(
                s["pre"], (st,), (t_st,))
            return st2, dp1, t_st2, t_dp1, t_carry

        def tl_sub_fn(carries, tapes_k, j, phis_p, t_carry, t_ph):
            c_j = jax.tree.map(lambda x: x[j], carries)
            tape_j = self._slice_tape3(tapes_k, j)
            return jax.jvp(
                lambda c, cn: self._sub_mix_rep(c, cn, tape_j),
                (self._expand_carry(c_j), dict(phis=phis_p)),
                (t_carry, dict(phis=t_ph)))[1]

        t_st, t_q = self._get("tl_prep", tl_prep_fn)(prog, phis, p)
        for k in range(self.k_split):
            st, q = cks["pre_in"][k]
            st2, dp1, t_st2, t_dp1, t_carry = self._get(
                "tl_pre", tl_pre_fn)(st, t_st)
            phis_p = st2["phis"]
            t_ph = t_st2["phis"]
            for j in range(self.n_split):
                t_carry = self._get("tl_sub", tl_sub_fn)(
                    cks["carries"][k], tapes["sub"][k],
                    jnp.asarray(j, jnp.int32), phis_p, t_carry, t_ph)
            last = k == self.k_split - 1

            def tl_post_fn(st2, carry_fin, q, dp1, tape,
                           t_st2, t_carry, t_q, t_dp1):
                with freeze.replaying(tape):
                    return jax.jvp(
                        lambda a, b, c, d: s["post"](a, b, c, d, last,
                                                     "mixed"),
                        (st2, carry_fin, q, dp1),
                        (t_st2, t_carry, t_q, t_dp1))[1]

            t_st, t_q = self._get(("tl_post", last), tl_post_fn)(
                st2, cks["carry_fin"][k], q, dp1, tapes["post"][k],
                t_st2, t_carry, t_q, t_dp1)
        return self._get("tl_unpad", lambda a, b: s["unpad"](a, b))(t_st, t_q)

    # -- adjoint --------------------------------------------------------------

    def ad(self, prog, phis, pb, cks, tapes):
        if self.ad_mode == "split":
            return self._ad_split(prog, phis, pb, cks, tapes)
        if self.ad_mode == "substep":
            return self._ad_substep(prog, phis, pb, cks, tapes)
        return self._get("ad", self._ad_fn)(prog, phis, cks, tapes, pb)

    def _ad_fn(self, prog, phis, cks, tapes, pb):
        """Fused single-program adjoint (reverse lax.scan).  jax.checkpoint
        on the vjp'd stages keeps the reverse sweep at the Tapenade cost
        model (fwd recompute + bwd sweep, fv3jedi_lm_dynamics_mod.F90:
        507-633) instead of storing every substep's intermediates."""
        s = self._stages
        ct_st, ct_q = s["unpad_T"](pb)
        for k in reversed(range(self.k_split)):
            st, q = cks["pre_in"][k]
            st2, dp1, _ = s["pre"](st)
            last = k == self.k_split - 1
            with freeze.replaying(tapes["post"][k]):
                _, vjp_post = jax.vjp(
                    jax.checkpoint(
                        lambda a, b, c, d: s["post"](a, b, c, d, last,
                                                     "mixed")),
                    st2, cks["carry_fin"][k], q, dp1)
            ct_st2, ct_carry, ct_q, ct_dp1 = vjp_post((ct_st, ct_q))

            def body(cc, x):
                c_j, tape_j = x
                ct_c, ct_ph = cc
                _, vjp_sub = jax.vjp(
                    jax.checkpoint(
                        lambda c, cn: self._sub_mix_rep(c, cn, tape_j)),
                    self._expand_carry(c_j), dict(phis=st2["phis"]))
                d_c, d_cn = vjp_sub(ct_c)
                return (d_c, ct_ph + d_cn["phis"]), None

            (ct_carry, ct_ph), _ = lax.scan(
                body, (ct_carry, jnp.zeros_like(st2["phis"])),
                (cks["carries"][k], tapes["sub"][k]), reverse=True)
            ct_st2 = dict(ct_st2, phis=ct_st2["phis"] + ct_ph)
            ct_st = jax.vjp(s["pre"], st)[1]((ct_st2, ct_dp1, ct_carry))[0]
        ct_prog = jax.vjp(s["prep"], prog, phis)[1]((ct_st, ct_q))[0]
        return ct_prog

    def _ad_substep(self, prog, phis, pb, cks, tapes):
        """Middle-ground adjoint: ONE fused vjp program per acoustic
        substep (6 + 4 dispatches/step instead of the split form's ~34 —
        each dispatch costs a tunnel round trip), with jax.checkpoint on
        each of the substep's three stages so live vjp residuals stay at
        one stage's worth.  Avoids the whole-sweep reverse lax.scan that
        faults the TPU worker at npx>=97."""
        s = self._stages

        def sub_vjp_fn(carries, tapes_k, j, phis_p, ct_c):
            c_j = jax.tree.map(lambda x: x[j], carries)
            tape_j = self._slice_tape3(tapes_k, j)
            sa, sb, sc = self._sub_mix.stages
            ta, tb, tc_ = tape_j

            def rep(c, cn):
                with freeze.replaying(ta):
                    ab = jax.checkpoint(sa)(c, cn)
                with freeze.replaying(tb):
                    bc = jax.checkpoint(sb)(ab, cn)
                with freeze.replaying(tc_):
                    return jax.checkpoint(sc)(bc, cn)

            _, vjp = jax.vjp(rep, self._expand_carry(c_j),
                             dict(phis=phis_p))
            d_c, d_cn = vjp(ct_c)
            return d_c, d_cn["phis"]

        def mk_post_vjp(last):
            def post_vjp_fn(st2, carry_fin, q, dp1, tape, ct):
                with freeze.replaying(tape):
                    _, vjp_post = jax.vjp(
                        jax.checkpoint(
                            lambda a, b, c, d: s["post"](a, b, c, d, last,
                                                         "mixed")),
                        st2, carry_fin, q, dp1)
                return vjp_post(ct)
            return post_vjp_fn

        def pre_vjp_fn(st, ct):
            return jax.vjp(lambda x: s["pre"](x), st)[1](ct)[0]

        def prep_vjp_fn(prog, phis, ct):
            return jax.vjp(s["prep"], prog, phis)[1](ct)[0]

        ct_st, ct_q = self._get("adT", lambda pb: s["unpad_T"](pb))(pb)
        for k in reversed(range(self.k_split)):
            st, q = cks["pre_in"][k]
            last = k == self.k_split - 1
            st2, dp1 = self._pre_fwd(st)
            ct_st2, ct_carry, ct_q, ct_dp1 = self._get(
                ("adpost", last), mk_post_vjp(last))(
                st2, cks["carry_fin"][k], q, dp1,
                tapes["post"][k], (ct_st, ct_q))
            phis_p = st2["phis"]
            del st2, dp1
            ct_ph = None
            for j in reversed(range(self.n_split)):
                ct_carry, d_ph = self._get("ad_sub", sub_vjp_fn)(
                    cks["carries"][k], tapes["sub"][k],
                    jnp.asarray(j, jnp.int32), phis_p, ct_carry)
                ct_ph = d_ph if ct_ph is None else ct_ph + d_ph
            ct_st2 = dict(ct_st2, phis=ct_st2["phis"] + ct_ph)
            ct_st = self._get("adpre", pre_vjp_fn)(
                st, (ct_st2, ct_dp1, ct_carry))
        return self._get("adprep", prep_vjp_fn)(prog, phis, (ct_st, ct_q))

    def _ad_split(self, prog, phis, pb, cks, tapes):
        """The reverse sweep as a host-side loop (the reference's POP-per-
        iteration discipline, fv3jedi_lm_dynamics_mod.F90:588-633): one
        jitted vjp program per stage kind, reused across iterations."""
        s = self._stages

        ct_st, ct_q = self._get("adT", lambda pb: s["unpad_T"](pb))(pb)

        def mk_post_vjp(last):
            def post_vjp_fn(st2, carry_fin, q, dp1, tape, ct):
                with freeze.replaying(tape):
                    _, vjp_post = jax.vjp(
                        jax.checkpoint(
                            lambda a, b, c, d: s["post"](a, b, c, d, last,
                                                         "mixed")),
                        st2, carry_fin, q, dp1)
                return vjp_post(ct)
            return post_vjp_fn

        # The substep adjoint is chained over the substep's three STAGES
        # (dyn_core make_acoustic_substep .stages), each its own
        # executable: this caps live vjp residuals at one stage's worth —
        # the Tapenade recompute discipline at stage granularity.
        sa, sb, sc = self._sub_mix.stages

        def a_fwd_fn(carries, tapes_k, j, phis_p):
            c_j = jax.tree.map(lambda x: x[j], carries)
            t3 = self._slice_tape3(tapes_k, j)
            with freeze.replaying(t3[0]):
                return sa(self._expand_carry(c_j), dict(phis=phis_p)), t3

        def b_fwd_fn(ab, tb, phis_p):
            with freeze.replaying(tb):
                return sb(ab, dict(phis=phis_p))

        def c_vjp_fn(bc, tc_, phis_p, ct):
            with freeze.replaying(tc_):
                _, vjp = jax.vjp(sc, bc, dict(phis=phis_p))
            d_bc, d_cn = vjp(ct)
            return d_bc, d_cn["phis"]

        def b_vjp_fn(ab, tb, phis_p, ct):
            with freeze.replaying(tb):
                _, vjp = jax.vjp(sb, ab, dict(phis=phis_p))
            d_ab, d_cn = vjp(ct)
            return d_ab, d_cn["phis"]

        def a_vjp_fn(carries, tapes_k, j, phis_p, ct):
            c_j = jax.tree.map(lambda x: x[j], carries)
            t3 = self._slice_tape3(tapes_k, j)
            cfull = self._expand_carry(c_j)
            with freeze.replaying(t3[0]):
                _, vjp = jax.vjp(sa, cfull, dict(phis=phis_p))
            d_c, d_cn = vjp(ct)
            return d_c, d_cn["phis"]

        def sub_vjp(carries, tapes_k, j, phis_p, ct_c):
            ab, t3 = self._get("ad_afwd", a_fwd_fn)(carries, tapes_k, j,
                                                    phis_p)
            bc = self._get("ad_bfwd", b_fwd_fn)(ab, t3[1], phis_p)
            ct_bc, ph_c = self._get("ad_cvjp", c_vjp_fn)(bc, t3[2], phis_p,
                                                         ct_c)
            del bc
            ct_ab, ph_b = self._get("ad_bvjp", b_vjp_fn)(ab, t3[1], phis_p,
                                                         ct_bc)
            del ab, ct_bc
            d_c, ph_a = self._get("ad_avjp", a_vjp_fn)(carries, tapes_k, j,
                                                       phis_p, ct_ab)
            return d_c, ph_a + ph_b + ph_c

        def pre_vjp_fn(st, ct):
            return jax.vjp(lambda x: self._stages["pre"](x), st)[1](ct)[0]

        def prep_vjp_fn(prog, phis, ct):
            return jax.vjp(s["prep"], prog, phis)[1](ct)[0]

        for k in reversed(range(self.k_split)):
            st, q = cks["pre_in"][k]
            last = k == self.k_split - 1
            st2, dp1 = self._pre_fwd(st)
            ct_st2, ct_carry, ct_q, ct_dp1 = self._get(
                ("adpost", last), mk_post_vjp(last))(
                st2, cks["carry_fin"][k], q, dp1,
                tapes["post"][k], (ct_st, ct_q))
            phis_p = st2["phis"]
            del st2, dp1        # free the recomputed full state's buffers
            ct_ph = None
            for j in reversed(range(self.n_split)):
                # host-level orchestration — each of the five per-stage
                # executables inside runs as its OWN program
                ct_carry, d_ph = sub_vjp(
                    cks["carries"][k], tapes["sub"][k],
                    jnp.asarray(j, jnp.int32), phis_p, ct_carry)
                ct_ph = d_ph if ct_ph is None else ct_ph + d_ph
            ct_st2 = dict(ct_st2, phis=ct_st2["phis"] + ct_ph)
            ct_st = self._get("adpre", pre_vjp_fn)(
                st, (ct_st2, ct_dp1, ct_carry))
        return self._get("adprep", prep_vjp_fn)(prog, phis, (ct_st, ct_q))
