"""Localize the rest-state blow-up: run dyn_core pieces from rest, print max|.|.

Not a test; a debugging tool. Run: python scripts/diag_rest.py
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from fv3jedi_lm_tpu import NG
from fv3jedi_lm_tpu.config import DynConfig, LMConfig
from fv3jedi_lm_tpu.lm import LinearModel, PROG_3D
from fv3jedi_lm_tpu.core.dyn_core import geopk, p_grad_c, one_grad_p, _sponge_bands
from fv3jedi_lm_tpu.ops.sw_core import c_sw, F2P, SL
from fv3jedi_lm_tpu.ops.d_sw import d_sw
from fv3jedi_lm_tpu.parallel import halo
from fv3jedi_lm_tpu.constants import KAPPA

cfg = LMConfig(
    dyn=DynConfig(npx=13, npy=13, npz=8, n_split=2, k_split=1,
                  d2_bg_k1=0.2, d2_bg_k2=0.1, n_sponge=2, dtype="float64"),
    dt=450.0,
)
lm = LinearModel.create(cfg)
dyn = cfg.dyn
traj = lm.rest_traj()
prog = {k: traj[k] for k in PROG_3D}

st, q = lm._pad(prog)
jc = dyn.nx + 2 * NG
phis_p = jnp.zeros((6, jc, jc), jnp.float64)
phis_p = halo.fill_halo_center(phis_p, lm.topo)
st["phis"] = phis_p

grid = lm.grid
topo = lm.topo
npx = dyn.npx
n = npx - 1
npz = dyn.npz
jb = jc + 1
akap = KAPPA
ptop = lm.ptop
dt_remap = cfg.dt / dyn.k_split
dt = dt_remap / dyn.n_split
dt2 = 0.5 * dt

def mx(name, x):
    x = np.asarray(x)
    fin = np.isfinite(x)
    m = np.abs(np.where(fin, x, 0.0)).max()
    nans = (~fin).sum()
    print(f"{name:24s} max|.|={m:.3e}  nonfinite={nans}")
    return m

# exact fv_dynamics entry transform
from fv3jedi_lm_tpu.core.fv_pressure import compute_fv3_pressures
from fv3jedi_lm_tpu.constants import ZVIR

delp = halo.fill_halo_center(st["delp"], topo)
pt_in = halo.fill_halo_center(st["pt"], topo)
sphum = halo.fill_halo_center(q[0], topo)
pe0, peln0, pk0, pkz0 = compute_fv3_pressures(delp, akap, ptop)
pt = pt_in * (1.0 + ZVIR * sphum) / pkz0
pt = halo.fill_halo_center(pt, topo)
delp = halo.fill_halo_center(delp, topo)
u, v, w = st["u"], st["v"], st["w"]

mx("delp uniform dev", delp - delp[..., NG:NG+1, NG:NG+1])
mx("pt uniform dev", pt - pt[..., NG:NG+1, NG:NG+1])

uc = jnp.zeros((npz, 6, jc, jb), jnp.float64)
vc = jnp.zeros((npz, 6, jb, jc), jnp.float64)
divgd = jnp.zeros((npz, 6, jb, jb), jnp.float64)
mfx = jnp.zeros((npz, 6, n, n + 1), jnp.float64)
mfy = jnp.zeros((npz, 6, n + 1, n), jnp.float64)
cx = jnp.zeros((npz, 6, jc, n + 1), jnp.float64)
cy = jnp.zeros((npz, 6, n + 1, jc), jnp.float64)

u, v = halo.fill_halo_dgrid(u, v, topo)
mx("u after halo", u)
mx("v after halo", v)

delpc, ptc, wc, uc, vc, divgd, ua, va = c_sw(
    delp, pt, u, v, w, uc, vc, grid, topo, dt2, dyn.nord, dyn.hydrostatic, npx)
mx("c_sw uc", uc)
mx("c_sw vc", vc)
mx("c_sw divgd", divgd)
mx("c_sw delpc dev", delpc - delpc[..., NG:NG+1, NG:NG+1])
mx("c_sw ptc dev", ptc - ptc[..., NG:NG+1, NG:NG+1])

divgd = halo.fill_halo_corner(divgd, topo)
mx("divgd after halo", divgd)

_, _, pkc_c, gz_c, _ = geopk(ptop, delpc, ptc, st["phis"], akap)
uc, vc = p_grad_c(dt2, pkc_c, gz_c, uc, vc, grid, npx)
mx("uc after p_grad_c", uc)
mx("vc after p_grad_c", vc)
uc, vc = halo.fill_halo_cgrid(uc, vc, topo)
mx("uc after cgrid halo", uc)
mx("vc after cgrid halo", vc)

bands = _sponge_bands(dyn, npz)
print("bands:", [(b[0], b[1], b[2]["nord"], b[2]["nord_v"], b[2]["d2_divg"]) for b in bands])
for (k0, k1, pars) in bands:
    sl = slice(k0, k1)
    r = d_sw(
        delp[sl], pt[sl], u[sl], v[sl], w[sl],
        uc[sl], vc[sl], ua[sl], va[sl], divgd[sl],
        mfx[sl], mfy[sl], cx[sl], cy[sl],
        grid, topo, dt, npx,
        pars["hord_mt"], pars["hord_vt"], pars["hord_tm"], pars["hord_dp"],
        pars["nord"], pars["nord_v"], pars["nord_t"], pars["nord_w"],
        dyn.dddmp, pars["d2_divg"], dyn.d4_bg,
        pars["damp_v"], pars["damp_w"], pars["damp_t"], pars["d_con"],
        dyn.ke_bg, dyn.hydrostatic,
    )
    print(f"--- band k={k0}:{k1} nord={pars['nord']}")
    mx("  d_sw u", r["u"])
    mx("  d_sw v", r["v"])
    mx("  d_sw delp dev", r["delp"] - r["delp"][..., NG:NG+1, NG:NG+1])
    mx("  d_sw pt dev", r["pt"] - r["pt"][..., NG:NG+1, NG:NG+1])
    mx("  d_sw divd_b", r["divd_b"])
    if np.abs(np.asarray(r["u"])).max() > 1e-10:
        uu = np.asarray(r["u"])
        idx = np.unravel_index(np.abs(uu).argmax(), uu.shape)
        print("  argmax u:", idx, uu[idx])

# also test one_grad_p at rest
pe, peln, pkc, gz, pkz = geopk(ptop, delp, pt, st["phis"], akap)
divg2 = jnp.zeros((npz, 6, jb, jb), jnp.float64)
u2, v2 = one_grad_p(u, v, pkc, gz, divg2, dt, grid, npx, ptop, akap, dyn.d_ext)
mx("one_grad_p u", u2)
mx("one_grad_p v", v2)
