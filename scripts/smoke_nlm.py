"""Smoke test: resting isothermal atmosphere must stay (nearly) at rest."""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from functools import partial
from fv3jedi_lm_tpu import NG
from fv3jedi_lm_tpu.grid.metrics import build_grid
from fv3jedi_lm_tpu.grid.device import to_device
from fv3jedi_lm_tpu.grid.eta import default_ak_bk
from fv3jedi_lm_tpu.config import DynConfig
from fv3jedi_lm_tpu.core.fv_dynamics import fv_dynamics

npx, npz = 13, 10
cfg = DynConfig(npx=npx, npy=npx, npz=npz, n_split=4, k_split=1,
                d2_bg_k1=0.2, d2_bg_k2=0.1, n_sponge=3)
gm = build_grid(npx)
grid = to_device(gm)
topo = gm.topo
ak, bk = default_ak_bk(npz, ptop=100.0)
n = npx - 1
jc = n + 2 * NG
jb = jc + 1
ps0 = 1.0e5
delp = np.zeros((npz, 6, jc, jc))
pe = ak[:, None, None, None] + bk[:, None, None, None] * ps0
for k in range(npz):
    delp[k] = pe[k + 1] - pe[k]
T0 = 280.0
state = dict(
    u=jnp.zeros((npz, 6, jb, jc)), v=jnp.zeros((npz, 6, jc, jb)),
    w=jnp.zeros((npz, 6, jc, jc)),
    pt=jnp.full((npz, 6, jc, jc), T0), delp=jnp.asarray(delp),
    phis=jnp.zeros((6, jc, jc)),
)
q = [jnp.zeros((npz, 6, jc, jc)) for _ in range(4)]

step = jax.jit(partial(fv_dynamics, grid=grid, topo=topo, cfg=cfg, bdt=600.0,
                       ak=jnp.asarray(ak), bk=jnp.asarray(bk), ptop=ak[0]))
st, q2 = step(state, q)
cs = slice(NG, NG + n)
print("max|u| after 1 step (rest state):",
      float(jnp.abs(st["u"][:, :, NG:NG + n + 1, cs]).max()))
print("max|T-T0|:", float(jnp.abs(st["pt"][:, :, cs, cs] - T0).max()))
print("max|dps/ps|:",
      float(jnp.abs(st["delp"].sum(0)[:, cs, cs] + ak[0] - ps0).max() / ps0))
for i in range(3):
    st, q2 = step(st, q2)
print("after 4 steps: max|u|",
      float(jnp.abs(st["u"][:, :, NG:NG + n + 1, cs]).max()),
      "max|T-T0|", float(jnp.abs(st["pt"][:, :, cs, cs] - T0).max()))
