"""Simplified GEOS physics linearizations (reference src/physics/).

Turbulence: Louis/Lock PBL K-theory with frozen-coefficient implicit
diffusion (turbulence/fv3jedi_lm_turbulence_mod.F90, bldriver.F90).
"""

from .turbulence import Turbulence  # noqa: F401
