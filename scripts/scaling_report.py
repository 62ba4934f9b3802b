"""Multi-device scaling + collective-traffic report (CPU mesh).

Measures the production TL+AD unit at npx on 1 device vs an 8-device
('face','y','x') mesh of virtual CPU devices, and accounts the collective
communication the sharded programs contain (op counts + payload bytes
parsed from the optimized HLO) — the BASELINE.md scaling-efficiency gate
can only be *measured* on a real pod; this gives the shape of the
communication and a CPU-mesh sanity number.

NOTE: virtual CPU devices share physical cores (nproc may be < 8), so the
wall-clock "efficiency" here is bounded by core oversubscription, not by
the communication pattern; the collective-bytes table is the transferable
result.

Usage: python scripts/scaling_report.py [npx npz]
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def collective_bytes(compiled_text):
    """Parse op-count/bytes of collectives from optimized HLO text."""
    pat = re.compile(
        r"(\w[\w.-]*) = (\S+) (all-gather|all-reduce|collective-permute|"
        r"reduce-scatter|all-to-all)\(")
    shapes = re.compile(r"(bf16|f16|f32|f64|s32|u32|u8|pred)\[([\d,]*)\]")
    sizes = dict(bf16=2, f16=2, f32=4, f64=8, s32=4, u32=4, u8=1, pred=1)
    out = {}
    for m in pat.finditer(compiled_text):
        kind = m.group(3)
        sh = shapes.search(m.group(2))
        nbytes = 0
        if sh:
            dims = [int(d) for d in sh.group(2).split(",") if d]
            n = 1
            for d in dims:
                n *= d
            nbytes = n * sizes[sh.group(1)]
        cnt, tot = out.get(kind, (0, 0))
        out[kind] = (cnt + 1, tot + nbytes)
    return out


def main(npx=25, npz=8):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__ as ge

    n = npx - 1
    gp = n * n * 6 * npz

    def measure(lm, traj, pert, iters=3):
        tl = lm.step_tl(traj, pert)
        ad = lm.step_ad(traj, tl)
        jax.block_until_ready((tl, ad))
        t0 = time.perf_counter()
        for _ in range(iters):
            tl = lm.step_tl(traj, pert)
            ad = lm.step_ad(traj, tl)
        jax.block_until_ready((tl, ad))
        return gp / ((time.perf_counter() - t0) / iters)

    # single device
    lm1 = ge._make_model(npx=npx, npz=npz, dtype="float32", n_split=2,
                         dt=300.0)
    traj, pert = ge._rand_traj_pert(lm1)
    r1 = measure(lm1, traj, pert)
    print(f"1 device : {r1:12.0f} gridpoints/s")

    # 8-device mesh
    mesh, y, x = ge._mesh_for(8)
    lm8 = ge._make_model(npx=npx, npz=npz, dtype="float32", n_split=2,
                         dt=300.0)
    traj_s, pert_s = ge._put_all(lm8, mesh, traj, pert)
    with mesh:
        r8 = measure(lm8, traj_s, pert_s)
    ncores = os.cpu_count()
    print(f"8 devices: {r8:12.0f} gridpoints/s  "
          f"(speedup {r8 / r1:.2f}x on {ncores} physical cores — "
          f"virtual devices oversubscribe cores; see collectives below)")

    # collective accounting on the forward program (representative)
    st = lm8._staged()
    prog = {k: traj_s[k] for k in lm8.prog_3d}
    with mesh:
        txt = (jax.jit(st._forward_fn)
               .lower(prog, traj_s["phis"]).compile().as_text())
    print("collectives in the sharded forward program:")
    for kind, (cnt, tot) in sorted(collective_bytes(txt).items()):
        print(f"  {kind:20s} x{cnt:4d}  {tot / 1e6:10.2f} MB payload")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    main(int(args[0]) if args else 25, int(args[1]) if len(args) > 1 else 8)
