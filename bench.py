"""Headline benchmark: TLM+ADM grid-points per second per chip.

Runs one full tangent-linear step plus one adjoint step (the 4D-Var
inner-loop unit, reference fv3jedi_lm_mod.F90 step_tl:161 / step_ad:176) at
c96L72 in float32 on whatever single accelerator JAX exposes, and reports
grid-points processed per second:

    gridpoints = nx * ny * 6 faces * npz levels
    value      = gridpoints / (t_tl + t_ad)

The reference publishes no numbers (BASELINE.md) so vs_baseline is null.
Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

# keep CPU fallback usable; on TPU this is a no-op
os.environ.setdefault("XLA_FLAGS", "")


def main():
    # target c96L72 on an accelerator; the staged TL/AD stores per-substep
    # checkpoints + branch tapes (~32 GB at c96L72 f32 — see NOTES_BUILD.md),
    # so fall back to smaller grids if the chip runs out of HBM.  Each case
    # runs in a FRESH subprocess: after a RESOURCE_EXHAUSTED the in-process
    # TPU client is unusable (even tiny follow-up programs fail), so
    # in-process retries always fail.
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    probe = subprocess.run(
        [sys.executable, "-c",
         "import jax; print(jax.devices()[0].platform)"],
        capture_output=True, text=True, cwd=here)
    plat = (probe.stdout.strip().splitlines() or ["cpu"])[-1]
    ladder = ([(97, 72), (49, 72), (49, 48), (25, 32)]
              if plat != "cpu" else [(25, 16)])
    for i, (npx, npz) in enumerate(ladder):
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--case", str(npx), str(npz)],
                capture_output=True, text=True, cwd=here,
                timeout=(3000 if i == 0 else 1800))
        except subprocess.TimeoutExpired:
            print(f"# bench case c{npx - 1}L{npz} timed out",
                  file=sys.stderr)
            continue
        line = next((ln for ln in r.stdout.splitlines()
                     if ln.startswith("{")), None)
        if r.returncode == 0 and line:
            print(line)
            return
        print(f"# bench case c{npx - 1}L{npz} failed (rc={r.returncode})",
              file=sys.stderr)
    sys.exit(1)


def run_case_main(npx, npz):
    import jax
    import numpy as np

    # persistent compilation cache — the big TLM+ADM graphs are expensive;
    # repeat bench runs (driver + tuning) should not pay compile again
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    plat = jax.devices()[0].platform
    if plat == "cpu":
        npx, npz = 25, 16
    value, n = _run_case(jax, np, npx, npz)
    print(json.dumps({
        "metric": f"c{n}L{npz} TLM+ADM grid-points/s per chip ({plat})",
        "value": round(value, 1),
        "unit": "gridpoints/s",
        "vs_baseline": None,
    }))


def _run_case(jax, np, npx, npz):
    from fv3jedi_lm_tpu.config import DynConfig, LMConfig
    from fv3jedi_lm_tpu.lm import LinearModel

    cfg = LMConfig(
        dyn=DynConfig(npx=npx, npy=npx, npz=npz, n_split=6, k_split=1,
                      d2_bg_k1=0.2, d2_bg_k2=0.1, n_sponge=6,
                      dtype="float32"),
        dt=900.0,
    )
    lm = LinearModel.create(cfg)
    traj = lm.rest_traj()
    rng = np.random.default_rng(0)
    traj["t"] = traj["t"] + 2.0 * rng.standard_normal(traj["t"].shape).astype(
        np.float32
    )
    pert = {k: (1e-3 * rng.standard_normal(v.shape)).astype(np.float32)
            for k, v in lm.zero_pert().items()}

    # compile + warm up
    tl = lm.step_tl(traj, pert)
    ad = lm.step_ad(traj, tl)
    jax.block_until_ready((tl, ad))

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        tl = lm.step_tl(traj, pert)
        ad = lm.step_ad(traj, tl)
    jax.block_until_ready((tl, ad))
    dt_s = (time.perf_counter() - t0) / iters

    n = npx - 1
    return n * n * 6 * npz / dt_s, n


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if len(sys.argv) >= 4 and sys.argv[1] == "--case":
        run_case_main(int(sys.argv[2]), int(sys.argv[3]))
    else:
        main()
