"""fv3jedi_lm_tpu: a TPU-native tangent-linear / adjoint FV3 dynamical core.

A from-scratch JAX/XLA re-design of the capabilities of
l90lpa/fv3-jedi-linearmodel (NASA GMAO's FV3 TLM/ADM used by FV3-JEDI 4D-Var):

* nonlinear hydrostatic cubed-sphere finite-volume core (trajectory
  propagation)
* tangent-linear model with the pert-split linearization numerics
  (hord_*_pert / kord_*_pert / split damping)
* adjoint as the exact transpose of the TL operator (frozen branch tapes)
* GEOS physics linearizations: Louis/Lock boundary layer (frozen-K
  tridiagonal solves) and RAS convection with DOCONVEC/Jacobian filters
  (the cloud scheme is not yet implemented — see README.md)

Layout conventions (all pure-functional, jit-friendly):
* 3-D fields are arrays of shape ``(npz, 6, jdim, idim)`` — level, face, y, x
* 2-D fields are ``(6, jdim, idim)``
* every face carries an ``ng=3`` halo on each side, filled by index-map halo
  exchange over the cube topology (reference: FMS mpp_domains mosaic updates,
  src/dynamics/atmos_cubed_sphere/tools/fv_mp_nlm_mod.F90)
"""

__version__ = "0.1.0"

NG = 3  # halo width, reference: fv_mp_nlm_mod.F90 `ng` (single value used by the LM)
