"""Smoke: forward/record/tl/ad + dot product on a tiny config."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from fv3jedi_lm_tpu.config import DynConfig, LMConfig
from fv3jedi_lm_tpu.lm import LinearModel, PROG_3D

cfg = LMConfig(
    dyn=DynConfig(npx=13, npy=13, npz=10, n_split=2, k_split=1,
                  d2_bg_k1=0.2, d2_bg_k2=0.1, n_sponge=3,
                  n_sponge_pert=4),
    dt=450.0,
)
lm = LinearModel.create(cfg)
tr = lm.rest_traj()
n = lm.cfg.dyn.nx; npz = lm.cfg.dyn.npz
jj, ii = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
faces = np.arange(6)[:, None, None]
ks = np.arange(npz)[:, None, None, None]
bump = (3.0*np.sin(2.0*np.pi*(jj+0.5)/n+0.7*faces)
        * np.cos(2.0*np.pi*(ii+0.5)/n+0.3*faces)*np.cos(0.5*np.pi*ks/npz))
tr["t"] = tr["t"] + jnp.asarray(bump)
tr["qv"] = tr["qv"] + 1e-3*jnp.asarray(
    1.0+np.sin(2.0*np.pi*(ii+jj)/n+faces))*jnp.ones((npz,1,1,1))
for _ in range(3):
    tr = lm.step_nl(tr)
print("nl ok, max u:", float(jnp.abs(tr["u"]).max()))

scale = dict(u=1.0, v=1.0, t=1.0, delp=10.0, qv=1e-4, ql=1e-6, qi=1e-6, o3=1e-7)
def rp(seed):
    rng = np.random.default_rng(seed)
    return {k: jnp.asarray(rng.standard_normal(v.shape))*scale[k]
            for k, v in lm.zero_pert().items()}
dx, dy = rp(1), rp(2)
mdx = lm.step_tl(tr, dx)
print("tl ok, max:", {k: f"{float(jnp.abs(v).max()):.2e}" for k, v in mdx.items()})
mtdy = lm.step_ad(tr, dy)
print("ad ok, finite:", all(bool(jnp.isfinite(v).all()) for v in mtdy.values()))
dot = lambda a, b: sum(jnp.vdot(a[k], b[k]) for k in PROG_3D)
lhs, rhs = float(dot(mdx, dy)), float(dot(dx, mtdy))
print(f"dot: lhs={lhs:.12e} rhs={rhs:.12e} rel={abs(lhs-rhs)/abs(lhs):.3e}")
