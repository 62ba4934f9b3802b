import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from fv3jedi_lm_tpu.config import DynConfig, LMConfig
from fv3jedi_lm_tpu.lm import LinearModel

cfg = LMConfig(
    dyn=DynConfig(npx=13, npy=13, npz=10, n_split=2, k_split=1,
                  d2_bg_k1=0.2, d2_bg_k2=0.1, n_sponge=3),
    dt=450.0,
)
lm = LinearModel.create(cfg)
tr = lm.rest_traj()
out = lm.step_nl(tr)
u = np.asarray(out["u"])
v = np.asarray(out["v"])
print("u max", np.abs(u).max(), "v max", np.abs(v).max())
idx = np.unravel_index(np.abs(u).argmax(), u.shape)
print("u argmax (k,face,j,i):", idx, "val", u[idx])
idx = np.unravel_index(np.abs(v).argmax(), v.shape)
print("v argmax (k,face,j,i):", idx, "val", v[idx])
# count of large values per face
for f in range(6):
    big = np.abs(u[:, f]) > 1.0
    print("face", f, "n big u:", big.sum(), "locations:", np.argwhere(big)[:5])
print("t max dev", np.abs(np.asarray(out["t"]) - 280).max())
print("delp dev", np.abs(np.asarray(out["delp"]) - np.asarray(tr["delp"])).max())
