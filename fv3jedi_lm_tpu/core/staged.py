"""Staged TLM/ADM driver: the reference's fwd-sweep / bwd-sweep architecture.

The reference adjoint runs a forward recompute that PUSHes per-substep
trajectory state, then a reverse sweep that POPs it (fv3jedi_lm_dynamics_mod.
F90:507-633, utils/tapenade/adStack.c).  Here the model step is decomposed
into STAGES (prep -> [pre-acoustic -> n_split x substep -> post-acoustic] x
k_split -> unpad), each compiled ONCE as its own XLA executable:

* `forward` runs the nonlinear step and returns the stage inputs — the
  trajectory checkpoints (the "push");
* `tl` propagates a tangent through per-stage `jax.jvp` AT THE STORED
  INPUTS;
* `ad` pulls a cotangent back through per-stage `jax.vjp` AT THE SAME
  STORED INPUTS.

Because TL and AD linearize every stage at bitwise-identical concrete
values, the dot-product identity <M dx, dy> == <dx, M^T dy> holds to the
rounding of the dot products themselves.  This is the property the
reference gets from Tapenade's PUSH/POP discipline; `jax.checkpoint`-style
rematerialization loses it (the remat recompute may round an ulp apart from
the primal, flipping monotone-limiter branches — measured at 1e-4).

Peak memory: the stored carries (one interface state per acoustic substep)
plus one stage's vjp residuals — the reference's Tapenade-stack cost model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import KAPPA
from .dyn_core import acoustic_carry, make_acoustic_substep
from .fv_dynamics import (post_acoustic_stage, pre_acoustic_stage,
                          prep_stage)


def _tree_add(a, b):
    return jax.tree.map(jnp.add, a, b)


class StagedStepper:
    """Builds and caches the per-stage executables for one LinearModel."""

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

        substep = make_acoustic_substep(grid, topo, dyn, mdt, KAPPA, ptop,
                                        npz, dtype)

        def sub(carry, phis_p):
            return substep(carry, dict(phis=phis_p))

        def post(st2, carry, q, dp1, last):
            return post_acoustic_stage(st2, carry, q, dp1, grid, topo, dyn,
                                       ak, bk, ptop, mdt, last)

        def unpad(st, q):
            return lm._unpad(st, q)

        def unpad_T(pb):
            """Exact transpose of lm._unpad: scatter the compute-domain
            cotangent into zero-padded internal state (keys _unpad never
            reads get zero cotangent)."""
            from .. import NG
            from ..lm import TRACERS
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
            q = [z3(jc, jc).at[:, :, cs, cs].set(pb[name])
                 for name in TRACERS]
            return st, q

        self._stages = dict(prep=prep, pre=pre, sub=sub, unpad=unpad,
                            unpad_T=unpad_T,
                            post_mid=lambda *a: post(*a, False),
                            post_last=lambda *a: post(*a, True))

        # ---- executables (compiled lazily on first use) ----
        self._exe = {}

    def _get(self, name, builder):
        if name not in self._exe:
            self._exe[name] = jax.jit(builder())
        return self._exe[name]

    # -- primal / checkpoints ------------------------------------------------

    def _fwd_builder(self):
        s = self._stages
        k_split, n_split = self.k_split, self.n_split

        def fwd(prog, phis):
            st, q = s["prep"](prog, phis)
            pre_in, carries, carry_fin = [], [], []
            for k in range(k_split):
                pre_in.append((st, q))
                st2, dp1, carry = s["pre"](st)
                cj = []
                for _ in range(n_split):
                    cj.append(carry)
                    carry = s["sub"](carry, st2["phis"])
                carries.append(cj)
                carry_fin.append(carry)
                post = s["post_last"] if k == k_split - 1 else s["post_mid"]
                st, q = post(st2, carry, q, dp1)
            out = s["unpad"](st, q)
            return out, dict(pre_in=pre_in, carries=carries,
                             carry_fin=carry_fin)

        return lambda: fwd

    def forward(self, prog, phis):
        """NL step + trajectory checkpoints (every stage input)."""
        return self._get("fwd", self._fwd_builder())(prog, phis)

    # -- tangent-linear -------------------------------------------------------

    def tl(self, prog, phis, p, cks=None):
        s = self._stages
        if cks is None:
            _, cks = self.forward(prog, phis)

        prep_jvp = self._get("prep_jvp", lambda: (
            lambda pr, ph, tp: jax.jvp(
                s["prep"], (pr, ph), (tp, jnp.zeros_like(ph)))[1]))
        pre_exe = self._get("pre", lambda: s["pre"])
        pre_jvp = self._get("pre_jvp", lambda: (
            lambda st, t: jax.jvp(s["pre"], (st,), (t,))[1]))
        sub_jvp = self._get("sub_jvp", lambda: (
            lambda c, ph, tc, tph: jax.jvp(
                s["sub"], (c, ph), (tc, tph))[1]))

        def mk_post_jvp(last):
            post = s["post_last"] if last else s["post_mid"]
            return lambda st2, cf, q, dp1, t: jax.jvp(
                post, (st2, cf, q, dp1), t)[1]

        post_jvp = {
            True: self._get("post_jvp_T", lambda: mk_post_jvp(True)),
            False: self._get("post_jvp_F", lambda: mk_post_jvp(False)),
        }
        unpad_jvp = self._get("unpad_jvp", lambda: s["unpad"])  # linear slicing

        t_st, t_q = prep_jvp(prog, phis, p)
        for k in range(self.k_split):
            st_k, q_k = cks["pre_in"][k]
            st2, dp1, _ = pre_exe(st_k)           # pure data movement
            t_st2, t_dp1, t_carry = pre_jvp(st_k, t_st)
            for j in range(self.n_split):
                t_carry = sub_jvp(cks["carries"][k][j], st2["phis"],
                                  t_carry, t_st2["phis"])
            last = k == self.k_split - 1
            t_st, t_q = post_jvp[last](st2, cks["carry_fin"][k], q_k, dp1,
                                       (t_st2, t_carry, t_q, t_dp1))
        return unpad_jvp(t_st, t_q)

    # -- adjoint --------------------------------------------------------------

    def ad(self, prog, phis, pb, cks=None):
        s = self._stages
        if cks is None:
            _, cks = self.forward(prog, phis)

        pre_exe = self._get("pre", lambda: s["pre"])
        unpad_T = self._get("unpad_T", lambda: s["unpad_T"])
        sub_vjp = self._get("sub_vjp", lambda: (
            lambda c, ph, ct: jax.vjp(s["sub"], c, ph)[1](ct)))
        pre_vjp = self._get("pre_vjp", lambda: (
            lambda st, ct: jax.vjp(s["pre"], st)[1](ct)[0]))

        def mk_post_vjp(last):
            post = s["post_last"] if last else s["post_mid"]
            return lambda st2, cf, q, dp1, ct: jax.vjp(
                post, st2, cf, q, dp1)[1](ct)

        post_vjp = {
            True: self._get("post_vjp_T", lambda: mk_post_vjp(True)),
            False: self._get("post_vjp_F", lambda: mk_post_vjp(False)),
        }
        prep_vjp = self._get("prep_vjp", lambda: (
            lambda pr, ph, ct: jax.vjp(s["prep"], pr, ph)[1](ct)[0]))

        # seed: transpose of the final unpad (slice -> scatter into zeros)
        ct_st, ct_q = unpad_T(pb)

        for k in reversed(range(self.k_split)):
            st_k, q_k = cks["pre_in"][k]
            st2, dp1, _ = pre_exe(st_k)
            last = k == self.k_split - 1
            ct_st2, ct_carry, ct_q, ct_dp1 = post_vjp[last](
                st2, cks["carry_fin"][k], q_k, dp1, (ct_st, ct_q))
            for j in reversed(range(self.n_split)):
                ct_carry, ct_phis = sub_vjp(cks["carries"][k][j],
                                            st2["phis"], ct_carry)
                ct_st2 = dict(ct_st2, phis=ct_st2["phis"] + ct_phis)
            ct_st = pre_vjp(st_k, (ct_st2, ct_dp1, ct_carry))
        return prep_vjp(prog, phis, (ct_st, ct_q))
