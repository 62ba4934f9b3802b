"""Hybrid sigma-pressure vertical coordinate (ak/bk).

In the reference, the LM *receives* ak/bk from the host (FV3-JEDI) through
`create(dt, npx, npy, npz, ptop, ak, bk)` (src/fv3jedi_lm_mod.F90:44) and
only falls back to `set_eta` tables during fv_init (tools/fv_eta_nlm.F90:33).
We provide a generic smooth hybrid builder for standalone runs/tests; users
can pass exact GEOS/GFS tables through the same API as the reference.
"""

from __future__ import annotations

import numpy as np


def default_ak_bk(npz: int, ptop: float = 1.0, p_ref: float = 1.0e5,
                  ks_frac: float = 0.3):
    """Smooth hybrid coordinate: pure-pressure top, terrain-following bottom.

    pe(k) = ak(k) + bk(k) * ps.  ak/bk shape (npz+1,).  The top `ks_frac`
    of levels are pure pressure (bk=0), as in the reference's set_eta tables.
    """
    kp = np.arange(npz + 1) / npz
    # reference pressure profile: exponential-ish in sigma
    pe_ref = ptop * (p_ref / ptop) ** kp
    ks = int(npz * ks_frac)
    p_ks = pe_ref[ks]
    bk = np.zeros(npz + 1)
    # smooth ramp of bk below level ks (Simmons-Burridge style)
    s = (pe_ref - p_ks) / (p_ref - p_ks)
    bk[ks:] = s[ks:] ** 1.6
    bk[-1] = 1.0
    ak = pe_ref - bk * p_ref
    ak[-1] = 0.0
    ak[0] = ptop
    return ak, bk
