"""Pressure-variable transforms (model_tlmadm/fv_pressure.F90:22-69).

Pure function of delp; the TLM (:71) and adjoint (:136) of the reference are
obtained here by `jax.jvp` / `jax.linear_transpose` — the hand-written
derivative code in the reference is exactly the jvp of this primal.
Vertical axis leading: delp (npz, ...); interface outputs (npz+1, ...).
"""

from __future__ import annotations

import jax.numpy as jnp


def compute_fv3_pressures(delp, kappa, ptop):
    """Returns (pe, peln, pk, pkz)."""
    pe = jnp.concatenate(
        [jnp.full((1,) + delp.shape[1:], ptop, delp.dtype),
         ptop + jnp.cumsum(delp, axis=0)],
        axis=0,
    )
    peln = jnp.log(pe)
    pk = jnp.exp(kappa * peln)
    pkz = (pk[1:] - pk[:-1]) / (kappa * (peln[1:] - peln[:-1]))
    return pe, peln, pk, pkz
