"""Per-step HBM / tape byte report for the staged TLM+ADM.

The reference's adStack keeps byte-traffic counters (adStack.c:28-31) and
tapenade_iter prints a checkpoint memory report (tapenade_iter.F90:520-850);
this is the TPU analogue: exact byte sizes of the checkpoint stacks and
frozen branch tapes (via jax.eval_shape — no device needed), plus, when
--compile is given, XLA's own memory analysis (argument/output/temp/code
bytes) of every staged executable, compiled AOT without running.

Usage:  python scripts/mem_report.py [npx npz] [--nh] [--compile]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def tree_bytes(tree):
    import jax

    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree)
               if hasattr(x, "dtype"))


def fmt(n):
    for unit in ("B", "KB", "MB", "GB"):
        if abs(n) < 1024.0 or unit == "GB":
            return f"{n:8.2f} {unit}"
        n /= 1024.0


def main(npx=97, npz=72, nh=False, do_compile=False):
    import jax
    import jax.numpy as jnp

    from fv3jedi_lm_tpu.config import DynConfig, LMConfig
    from fv3jedi_lm_tpu.lm import LinearModel

    cfg = LMConfig(
        dyn=DynConfig(npx=npx, npy=npx, npz=npz, n_split=6, k_split=1,
                      d2_bg_k1=0.2, d2_bg_k2=0.1, n_sponge=6,
                      hydrostatic=not nh, dtype="float32"),
        dt=900.0,
    )
    lm = LinearModel.create(cfg)
    st = lm._staged()
    s = st._stages
    n = cfg.dyn.nx

    prog_s = {k: jax.ShapeDtypeStruct(v.shape, v.dtype)
              for k, v in lm.rest_traj().items() if k in lm.prog_3d}
    phis_s = jax.ShapeDtypeStruct((6, n, n), lm.dtype)

    out_s, cks_s = jax.eval_shape(st._forward_fn, prog_s, phis_s)
    k = 0
    carries_k = cks_s["carries"][k]
    stq = cks_s["pre_in"][k]

    def pre_fwd(stt):
        st2, dp1, _ = s["pre"](stt)
        return st2, dp1

    st2_s, dp1_s = jax.eval_shape(pre_fwd, stq[0])
    phis_p_s = st2_s["phis"]
    jj = jax.ShapeDtypeStruct((), jnp.int32)
    tape3_s = jax.eval_shape(st._rec_sub_fn, carries_k, jj, phis_p_s)

    def rec_post(st2, carry_fin, q, dp1):
        from fv3jedi_lm_tpu.core import freeze
        with freeze.recording() as tape:
            s["post"](st2, carry_fin, q, dp1, True, "mixed")
        return list(tape)

    post_tape_s = jax.eval_shape(rec_post, st2_s, cks_s["carry_fin"][k],
                                 stq[1], dp1_s)

    state_b = tree_bytes(prog_s)
    cks_b = tree_bytes(cks_s)
    tape_b = (tree_bytes(tape3_s) * st.n_split
              + tree_bytes(post_tape_s)) * st.k_split
    print(f"c{n}L{npz} {'NH' if nh else 'hydro'} f32, "
          f"n_split={cfg.dyn.n_split} k_split={cfg.dyn.k_split}")
    print(f"  prognostic state        {fmt(state_b)}")
    print(f"  checkpoint stacks (cks) {fmt(cks_b)}   "
          f"({cks_b / max(state_b, 1):.1f}x state)")
    print(f"  branch tapes            {fmt(tape_b)}"
          f"   (sub {fmt(tree_bytes(tape3_s))}/substep,"
          f" post {fmt(tree_bytes(post_tape_s))})")
    print(f"  resident AD inputs      {fmt(cks_b + tape_b + 2 * state_b)}")

    if not do_compile:
        return
    plat = jax.devices()[0].platform
    print(f"\nAOT memory analysis per executable ({plat}):")

    def report(name, fn, *args):
        try:
            c = jax.jit(fn).lower(*args).compile()
            m = c.memory_analysis()
            print(f"  {name:12s} args {fmt(m.argument_size_in_bytes)} "
                  f"out {fmt(m.output_size_in_bytes)} "
                  f"temp {fmt(m.temp_size_in_bytes)} "
                  f"code {fmt(m.generated_code_size_in_bytes)}")
            return m
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"  {name:12s} FAILED: {type(e).__name__}: {e}")
            return None

    from fv3jedi_lm_tpu.core import freeze

    report("forward", st._forward_fn, prog_s, phis_s)
    report("rec_sub", st._rec_sub_fn, carries_k, jj, phis_p_s)

    sa, sb, sc = st._sub_mix.stages
    tapes_k_s = jax.eval_shape(
        lambda *ts: jax.tree.map(lambda *xs: jnp.stack(xs), *ts),
        *([tape3_s] * st.n_split))
    ta_s, tb_s, tc_s = tape3_s

    def a_fwd(carries, tapes_k, j, phis_p):
        c_j = jax.tree.map(lambda x: x[j], carries)
        t3 = st._slice_tape3(tapes_k, j)
        with freeze.replaying(t3[0]):
            return sa(st._expand_carry(c_j), dict(phis=phis_p)), t3

    ab_s, _ = jax.eval_shape(a_fwd, carries_k, tapes_k_s, jj, phis_p_s)
    report("ad:a_fwd", a_fwd, carries_k, tapes_k_s, jj, phis_p_s)

    def b_fwd(ab, tb, phis_p):
        with freeze.replaying(tb):
            return sb(ab, dict(phis=phis_p))

    bc_s = jax.eval_shape(b_fwd, ab_s, tb_s, phis_p_s)
    report("ad:b_fwd", b_fwd, ab_s, tb_s, phis_p_s)

    def c_vjp(bc, tc_, phis_p, ct):
        with freeze.replaying(tc_):
            _, vjp = jax.vjp(sc, bc, dict(phis=phis_p))
        d_bc, d_cn = vjp(ct)
        return d_bc, d_cn["phis"]

    cd_s = jax.eval_shape(lambda bc, tc_, ph: sc(bc, dict(phis=ph)),
                          bc_s, tc_s, phis_p_s)
    report("ad:c_vjp", c_vjp, bc_s, tc_s, phis_p_s, cd_s)

    def b_vjp(ab, tb, phis_p, ct):
        with freeze.replaying(tb):
            _, vjp = jax.vjp(sb, ab, dict(phis=phis_p))
        d_ab, d_cn = vjp(ct)
        return d_ab, d_cn["phis"]

    report("ad:b_vjp", b_vjp, ab_s, tb_s, phis_p_s, bc_s)

    def a_vjp(carries, tapes_k, j, phis_p, ct):
        c_j = jax.tree.map(lambda x: x[j], carries)
        t3 = st._slice_tape3(tapes_k, j)
        cfull = st._expand_carry(c_j)
        with freeze.replaying(t3[0]):
            _, vjp = jax.vjp(sa, cfull, dict(phis=phis_p))
        d_c, d_cn = vjp(ct)
        return d_c, d_cn["phis"]

    report("ad:a_vjp", a_vjp, carries_k, tapes_k_s, jj, phis_p_s, ab_s)

    def full_carry(stt):
        st2, dp1, carry = s["pre"](stt)
        return carry

    carry_s = jax.eval_shape(full_carry, stq[0])

    def tl_sub(carries, tapes_k, j, phis_p, t_carry, t_ph):
        c_j = jax.tree.map(lambda x: x[j], carries)
        tape_j = st._slice_tape3(tapes_k, j)
        return jax.jvp(
            lambda c, cn: st._sub_mix_rep(c, cn, tape_j),
            (st._expand_carry(c_j), dict(phis=phis_p)),
            (t_carry, dict(phis=t_ph)))[1]

    report("tl_sub", tl_sub, carries_k, tapes_k_s, jj, phis_p_s, carry_s,
           phis_p_s)
    report("tl_fused", st._tl_fn, prog_s, phis_s,
           dict(pre_in=cks_s["pre_in"], carries=cks_s["carries"],
                carry_fin=cks_s["carry_fin"]),
           dict(sub=[tapes_k_s], post=[post_tape_s]), prog_s)
    report("ad_fused", st._ad_fn, prog_s, phis_s,
           dict(pre_in=cks_s["pre_in"], carries=cks_s["carries"],
                carry_fin=cks_s["carry_fin"]),
           dict(sub=[tapes_k_s], post=[post_tape_s]), prog_s)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    npx = int(args[0]) if args else 97
    npz = int(args[1]) if len(args) > 1 else 72
    main(npx, npz, nh="--nh" in sys.argv, do_compile="--compile" in sys.argv)
