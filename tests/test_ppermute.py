"""shard_map + lax.ppermute neighbor halo exchange (parallel/ppermute.py)
vs the gather-based fill_halo_center — bitwise equality on a 6-device
face-sharded mesh (the reference's minimal '1 rank per tile x 6' MPI
configuration, SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fv3jedi_lm_tpu.grid.topology import CubeTopology
from fv3jedi_lm_tpu.parallel import halo
from fv3jedi_lm_tpu.parallel.ppermute import fill_halo_center_ppermute


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 6:
        pytest.skip("needs 6 devices")
    return Mesh(np.asarray(devs[:6]), ("face",))


@pytest.mark.parametrize("npx", [13, 25])
def test_center_exchange_matches_gather(mesh, npx):
    topo = CubeTopology(npx)
    n = npx - 1
    jc = n + 2 * topo.ng
    rng = np.random.default_rng(npx)
    q = jnp.asarray(rng.standard_normal((4, 6, jc, jc)))

    want = halo.fill_halo_center(q, topo)

    qs = jax.device_put(q, NamedSharding(mesh, P(None, "face", None, None)))
    got = fill_halo_center_ppermute(qs, topo, mesh)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_center_exchange_2d(mesh):
    topo = CubeTopology(13)
    jc = 12 + 2 * topo.ng
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((6, jc, jc)))
    want = halo.fill_halo_center(q, topo)
    qs = jax.device_put(q, NamedSharding(mesh, P("face", None, None)))
    got = fill_halo_center_ppermute(qs, topo, mesh)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_exchange_uses_collective_permute(mesh):
    """The lowered HLO must contain collective-permute (ICI neighbor
    sends), not all-gather."""
    topo = CubeTopology(13)
    jc = 12 + 2 * topo.ng
    q = jnp.zeros((6, jc, jc))
    qs = jax.device_put(q, NamedSharding(mesh, P("face", None, None)))
    txt = (jax.jit(lambda x: fill_halo_center_ppermute(x, topo, mesh))
           .lower(qs).compile().as_text())
    assert "collective-permute" in txt
