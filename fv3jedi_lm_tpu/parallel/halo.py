"""Halo exchange as static-rectangle gathers over precomputed topology maps.

TPU-native replacement for FMS ``mpp_update_domains`` / ``mpp_get_boundary``
(reference tools/fv_mp_nlm_mod.F90, model_tlmadm/fv_mp_tlm.F90, fv_mp_adm.F90).

Because every exchange is a *pure function* of its input array, the tangent
linear of an exchange is the same exchange and the adjoint (the reference's
``mpp_update_domains_ad`` reverse scatter-add) falls out of `jax.linear_
transpose` / `jax.vjp` automatically — no hand-written adjoint communication.

Performance design: each topology map is static numpy, and almost all of it
is the identity (the compute domain is untouched; only halo strips, corner
wedges, or single owned edge lines change).  At trace time the map is
decomposed ONCE into a minimal set of axis-aligned rectangles covering the
non-identity region; the exchange is then `out = q` plus one small gather +
static-slice update per rectangle.  For a c96 field this turns a 70k-index
whole-array gather into ~4 strip gathers of O(npx*ng) indices each — the XLA
lowering is a handful of dynamic-update-slices over data that stays in
registers/VMEM, instead of a full-array random-access gather through HBM.

Field layout: 3-D fields (npz, 6, jdim, idim); 2-D fields (6, jdim, idim).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

#: decomposition cache, keyed by id() of the (topology-cached, immortal)
#: numpy map object
_DEC_CACHE: dict = {}


def _runs(ix: np.ndarray):
    """Contiguous runs [(start, stop), ...] of a sorted index vector."""
    if ix.size == 0:
        return []
    brk = np.flatnonzero(np.diff(ix) > 1)
    starts = np.concatenate(([0], brk + 1))
    stops = np.concatenate((brk + 1, [ix.size]))
    return [(int(ix[a]), int(ix[b - 1]) + 1) for a, b in zip(starts, stops)]


def _rects(mask: np.ndarray):
    """Cover the True region of a 2-D mask with axis-aligned rectangles."""
    out = []
    for r0, r1 in _runs(np.flatnonzero(mask.any(axis=1))):
        for c0, c1 in _runs(np.flatnonzero(mask[r0:r1].any(axis=0))):
            out.append((r0, r1, c0, c1))
    return out


def _dec_scalar(idx: np.ndarray):
    """Decompose a same-shape scalar map into non-identity rectangles."""
    key = id(idx)
    hit = _DEC_CACHE.get(key)
    if hit is not None:
        return hit
    ident = np.arange(idx.size, dtype=np.int64).reshape(idx.shape)
    diff = idx.astype(np.int64) != ident
    mask2d = diff.reshape((-1,) + idx.shape[-2:]).any(axis=0)
    dec = [(r0, r1, c0, c1, np.ascontiguousarray(idx[..., r0:r1, c0:c1]))
           for (r0, r1, c0, c1) in _rects(mask2d)]
    _DEC_CACHE[key] = dec
    return dec


def _apply_scalar(q: jnp.ndarray, idx: np.ndarray, nflat: int) -> jnp.ndarray:
    """out = q with rectangles replaced by gathered values.

    nflat = number of trailing axes of q flattened for the gather
    (3 for global maps over (6, J, I), 2 for per-face local maps).
    """
    dec = _dec_scalar(idx)
    if not dec:
        return q
    lead = q.shape[:-nflat]
    flat = q.reshape(lead + (-1,))
    out = q
    for (r0, r1, c0, c1, sub) in dec:
        vals = jnp.take(flat, jnp.asarray(sub.ravel()), axis=-1)
        out = out.at[..., r0:r1, c0:c1].set(vals.reshape(lead + sub.shape))
    return out


def _dec_vector(m: dict):
    """Decompose one component of a vector map: non-identity OR cross-
    component OR sign-flipped positions."""
    key = (id(m["idx_same"]), id(m["sign"]))
    hit = _DEC_CACHE.get(key)
    if hit is not None:
        return hit
    idx = m["idx_same"]
    ident = np.arange(idx.size, dtype=np.int64).reshape(idx.shape)
    diff = ((idx.astype(np.int64) != ident) | np.asarray(m["from_other"])
            | (np.asarray(m["sign"]) != 1))
    mask2d = diff.reshape((-1,) + idx.shape[-2:]).any(axis=0)
    dec = []
    for (r0, r1, c0, c1) in _rects(mask2d):
        s = (Ellipsis, slice(r0, r1), slice(c0, c1))
        dec.append((r0, r1, c0, c1,
                    np.ascontiguousarray(idx[s]),
                    np.ascontiguousarray(m["idx_other"][s]),
                    np.ascontiguousarray(np.asarray(m["from_other"])[s]),
                    np.ascontiguousarray(np.asarray(m["sign"])[s])))
    _DEC_CACHE[key] = dec
    return dec


def _apply_vec_one(x, y, m, nflat):
    """New x-component: gather-from-self / gather-from-other / sign, applied
    only on the map's non-identity rectangles."""
    dec = _dec_vector(m)
    if not dec:
        return x
    lead = x.shape[:-nflat]
    xf = x.reshape(lead + (-1,))
    yf = y.reshape(y.shape[:-nflat] + (-1,))
    out = x
    for (r0, r1, c0, c1, i_s, i_o, fo, sg) in dec:
        a = jnp.take(xf, jnp.asarray(i_s.ravel()), axis=-1).reshape(lead + i_s.shape)
        b = jnp.take(yf, jnp.asarray(i_o.ravel()), axis=-1).reshape(lead + i_o.shape)
        vals = jnp.where(jnp.asarray(fo), b, a) * jnp.asarray(sg, dtype=x.dtype)
        out = out.at[..., r0:r1, c0:c1].set(vals)
    return out


def _apply_vector_map(u, v, mu, mv, nflat=3):
    u_new = _apply_vec_one(u, v, mu, nflat)
    v_new = _apply_vec_one(v, u, mv, nflat)
    return u_new, v_new


# ----------------------------------------------------------------------
# Cross-face halo updates
# ----------------------------------------------------------------------

def fill_halo_center(q, topo):
    """Scalar halo update, cell centers (mpp_update_domains, CENTER)."""
    return _apply_scalar(q, topo.halo_map_center(), 3)


def fill_halo_corner(q, topo):
    """Scalar halo update at B-grid corners (position=CORNER)."""
    return _apply_scalar(q, topo.halo_map_corner(), 3)


def fill_halo_dgrid(u, v, topo):
    """D-grid wind pair halo update (gridtype=DGRID_NE)."""
    m = topo.halo_map_dgrid()
    return _apply_vector_map(u, v, m["x"], m["y"])


def fill_halo_cgrid(uc, vc, topo):
    """C-grid wind pair halo update (gridtype=CGRID_NE)."""
    m = topo.halo_map_cgrid()
    return _apply_vector_map(uc, vc, m["x"], m["y"])


def _abs_sign_maps(m):
    """SCALAR_PAIR variant of a vector map (all signs +1), cached."""
    key = ("abs", id(m["x"]["idx_same"]), id(m["y"]["idx_same"]))
    hit = _DEC_CACHE.get(key)
    if hit is None:
        mx = dict(m["x"], sign=np.abs(np.asarray(m["x"]["sign"])))
        my = dict(m["y"], sign=np.abs(np.asarray(m["y"]["sign"])))
        hit = (mx, my)
        _DEC_CACHE[key] = hit
    return hit


def fill_halo_cgrid_scalar_pair(x, y, topo):
    """C-grid pair update without vector sign semantics (SCALAR_PAIR).

    Positions/component-swap as CGRID_NE but all signs forced +1
    (used for metric pairs like (dxc,dyc), (divg_v,divg_u)).
    """
    mx, my = _abs_sign_maps(topo.halo_map_cgrid())
    return _apply_vector_map(x, y, mx, my)


def fill_halo_dgrid_scalar_pair(x, y, topo):
    mx, my = _abs_sign_maps(topo.halo_map_dgrid())
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
# Local corner-region fills (per-face maps over the trailing (J, I) dims)
# ----------------------------------------------------------------------

def copy_corners(q, topo, dir_: int):
    """tp_core copy_corners: rotate edge halo data into corner regions."""
    return _apply_scalar(q, topo.copy_corners_map(dir_), 2)


def fill_corners_scalar(q, topo, grid: str, dir_: int):
    """fill_corners for a scalar field; grid in {'agrid','bgrid'}."""
    if grid == "bgrid":
        return _apply_scalar(q, topo.fill_corners_bgrid_map(dir_), 2)
    return _apply_scalar(q, topo.fill_corners_agrid_scalar_map(dir_), 2)


def fill_corners_vector(x, y, topo, grid: str, vector: bool = True):
    """fill_corners for a staggered pair; grid in {'dgrid','cgrid','agrid'}."""
    if grid == "dgrid":
        mx, my = topo.fill_corners_dgrid_maps(vector)
    elif grid == "cgrid":
        mx, my = topo.fill_corners_cgrid_maps(vector)
    else:
        mx, my = topo.fill_corners_agrid_maps(vector)
    return _apply_vector_map(x, y, mx, my, nflat=2)
