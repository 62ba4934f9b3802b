"""Micro-benchmark: Pallas SIM1 kernel vs the lax.scan jnp formulation on
the real device, at c96L72-like shapes (km=72, 6*96*96 columns).

Usage: python scripts/bench_pallas_sim1.py [km ncol]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(km=72, ncol=6 * 96 * 96):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fv3jedi_lm_tpu.constants import KAPPA, RGAS
    from fv3jedi_lm_tpu.core.nh_core import sim1_solver
    from fv3jedi_lm_tpu.ops.pallas_sim1 import sim1_solver_pallas

    rng = np.random.default_rng(0)
    pe_ref = np.linspace(100.0, 1.0e5, km + 1)
    dm2 = np.repeat((pe_ref[1:] - pe_ref[:-1])[:, None], ncol, 1).astype(
        np.float32)
    dm2 *= 1.0 + 0.05 * rng.random((km, ncol), dtype=np.float32)
    pt2 = (250.0 + 30.0 * rng.random((km, ncol))).astype(np.float32)
    pm2 = np.repeat((0.5 * (pe_ref[1:] + pe_ref[:-1]))[:, None], ncol,
                    1).astype(np.float32)
    pem = np.repeat(pe_ref[:, None], ncol, 1).astype(np.float32)
    dz2 = (-(dm2 / 9.80665) * RGAS * pt2 / pm2).astype(np.float32)
    w2 = (0.5 * rng.standard_normal((km, ncol))).astype(np.float32)
    ws = (0.1 * rng.standard_normal(ncol)).astype(np.float32)
    args = tuple(map(jnp.asarray, (dm2, pt2, pm2, pem, w2, dz2, ws)))
    dt = 30.0

    f_jnp = jax.jit(lambda *a: sim1_solver(dt, *a, KAPPA, 0.05))
    f_pl = jax.jit(lambda *a: sim1_solver_pallas(dt, *a, KAPPA, 0.05))

    def timeit(f, iters=20):
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters, out

    t_j, o_j = timeit(f_jnp)
    t_p, o_p = timeit(f_pl)
    err = max(float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-6))
              for a, b in zip(o_j, o_p))
    plat = jax.devices()[0].platform
    print(f"[{plat}] SIM1 km={km} ncol={ncol}: "
          f"jnp {t_j * 1e3:8.2f} ms  pallas {t_p * 1e3:8.2f} ms  "
          f"speedup {t_j / t_p:5.2f}x  rel err {err:.2e}")


if __name__ == "__main__":
    a = [x for x in sys.argv[1:] if not x.startswith("-")]
    main(int(a[0]) if a else 72, int(a[1]) if len(a) > 1 else 6 * 96 * 96)
