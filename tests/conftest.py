import os

# Force CPU for tests. NOTE: in this environment jax is pre-imported at
# interpreter startup with a remote-TPU ("axon") platform; env vars alone are
# too late, so also set the jax config before any backend initializes.
# 8 virtual CPU devices let multi-device sharding tests run without a pod.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the dynamical-core graphs are large and
# compile-bound on CPU; cache executables across pytest runs.  The cache
# is purged when the machine changes — cross-machine XLA:CPU AOT entries
# crash (SIGILL-class) on load/execute (fv3jedi_lm_tpu/cachedir.py).
import sys  # noqa: E402

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))
from fv3jedi_lm_tpu.cachedir import ensure_compatible  # noqa: E402

_cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir",
                  ensure_compatible(os.path.abspath(_cache)))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
