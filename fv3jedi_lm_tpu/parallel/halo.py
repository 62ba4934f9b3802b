"""Halo exchange as pure XLA gathers over precomputed cube-topology maps.

TPU-native replacement for FMS ``mpp_update_domains`` / ``mpp_get_boundary``
(reference tools/fv_mp_nlm_mod.F90, model_tlmadm/fv_mp_tlm.F90, fv_mp_adm.F90).

Because every exchange is a *pure function* of its input array, the tangent
linear of an exchange is the same exchange and the adjoint (the reference's
``mpp_update_domains_ad`` reverse scatter-add) falls out of `jax.linear_
transpose` / `jax.vjp` automatically — no hand-written adjoint communication.

Field layout: 3-D fields (npz, 6, jdim, idim); 2-D fields (6, jdim, idim).
The gathers are over the flattened (6*jdim*idim) trailing axes, so under
`jit` + sharding they lower to XLA collectives on the face/x/y mesh axes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _gather_global(q: jnp.ndarray, idx: np.ndarray) -> jnp.ndarray:
    """Gather over flattened (6, jdim, idim) trailing dims; leading dims kept.

    The output takes the *index map's* shape (which may differ from q's when
    gathering the other component of a staggered vector pair).
    """
    lead = q.shape[:-3]
    flat = q.reshape(lead + (-1,))
    out = jnp.take(flat, jnp.asarray(idx.ravel()), axis=-1)
    return out.reshape(lead + idx.shape)


def _gather_local(q: jnp.ndarray, idx: np.ndarray) -> jnp.ndarray:
    """Gather over flattened (jdim, idim) trailing dims (per-face local map)."""
    lead = q.shape[:-2]
    flat = q.reshape(lead + (-1,))
    out = jnp.take(flat, jnp.asarray(idx.ravel()), axis=-1)
    return out.reshape(lead + idx.shape)


# ----------------------------------------------------------------------
# Cross-face halo updates
# ----------------------------------------------------------------------

def fill_halo_center(q, topo):
    """Scalar halo update, cell centers (mpp_update_domains, CENTER)."""
    return _gather_global(q, topo.halo_map_center())


def fill_halo_corner(q, topo):
    """Scalar halo update at B-grid corners (position=CORNER)."""
    return _gather_global(q, topo.halo_map_corner())


def _apply_vector_map(u, v, mu, mv):
    dtype = u.dtype
    a = _gather_global(u, mu["idx_same"])
    b = _gather_global(v, mu["idx_other"])
    u_new = jnp.where(jnp.asarray(mu["from_other"]), b, a) * jnp.asarray(
        mu["sign"], dtype=dtype
    )
    c = _gather_global(v, mv["idx_same"])
    d = _gather_global(u, mv["idx_other"])
    v_new = jnp.where(jnp.asarray(mv["from_other"]), d, c) * jnp.asarray(
        mv["sign"], dtype=dtype
    )
    return u_new, v_new


def fill_halo_dgrid(u, v, topo):
    """D-grid wind pair halo update (gridtype=DGRID_NE)."""
    m = topo.halo_map_dgrid()
    return _apply_vector_map(u, v, m["x"], m["y"])


def fill_halo_cgrid(uc, vc, topo):
    """C-grid wind pair halo update (gridtype=CGRID_NE)."""
    m = topo.halo_map_cgrid()
    return _apply_vector_map(uc, vc, m["x"], m["y"])


def fill_halo_cgrid_scalar_pair(x, y, topo):
    """C-grid pair update without vector sign semantics (SCALAR_PAIR).

    Positions/component-swap as CGRID_NE but all signs forced +1
    (used for metric pairs like (dxc,dyc), (divg_v,divg_u)).
    """
    m = topo.halo_map_cgrid()
    mx = dict(m["x"], sign=np.abs(m["x"]["sign"]))
    my = dict(m["y"], sign=np.abs(m["y"]["sign"]))
    return _apply_vector_map(x, y, mx, my)


def fill_halo_dgrid_scalar_pair(x, y, topo):
    m = topo.halo_map_dgrid()
    mx = dict(m["x"], sign=np.abs(m["x"]["sign"]))
    my = dict(m["y"], sign=np.abs(m["y"]["sign"]))
    return _apply_vector_map(x, y, mx, my)


def fix_shared_edges_dgrid(u, v, topo):
    """Enforce single ownership of shared face-edge wind values.

    Reproduces mpp_get_boundary(u, v, DGRID_NE) + overwrite of the north u
    row / east v column (dyn_core_nlm.F90:935-949, fv3jedi_lm_dynamics_mod.
    F90:782-795): each face adopts the neighbor's value on those lines.
    """
    m = topo.edge_fix_maps_dgrid()
    return _apply_vector_map(u, v, m["u"], m["v"])


# ----------------------------------------------------------------------
# Local corner-region fills
# ----------------------------------------------------------------------

def copy_corners(q, topo, dir_: int):
    """tp_core copy_corners: rotate edge halo data into corner regions."""
    return _gather_local(q, topo.copy_corners_map(dir_))


def fill_corners_scalar(q, topo, grid: str, dir_: int):
    """fill_corners for a scalar field; grid in {'agrid','bgrid'}."""
    if grid == "bgrid":
        return _gather_local(q, topo.fill_corners_bgrid_map(dir_))
    return _gather_local(q, topo.fill_corners_agrid_scalar_map(dir_))


def _apply_local_pair(x, y, mx, my):
    dtype = x.dtype
    a = _gather_local(x, mx["idx_same"])
    b = _gather_local(y, mx["idx_other"])
    xn = jnp.where(jnp.asarray(mx["from_other"]), b, a) * jnp.asarray(
        mx["sign"], dtype=dtype
    )
    c = _gather_local(y, my["idx_same"])
    d = _gather_local(x, my["idx_other"])
    yn = jnp.where(jnp.asarray(my["from_other"]), d, c) * jnp.asarray(
        my["sign"], dtype=dtype
    )
    return xn, yn


def fill_corners_vector(x, y, topo, grid: str, vector: bool = True):
    """fill_corners for a staggered pair; grid in {'dgrid','cgrid','agrid'}."""
    if grid == "dgrid":
        mx, my = topo.fill_corners_dgrid_maps(vector)
    elif grid == "cgrid":
        mx, my = topo.fill_corners_cgrid_maps(vector)
    else:
        mx, my = topo.fill_corners_agrid_maps(vector)
    return _apply_local_pair(x, y, mx, my)
