"""Debug observability surface.

The reference ships root-PE debug prints and range guards —
`prt_maxmin` / `range_check` (tools/fv_diagnostics_nlm.F90:79-81, used as
optional sanity checks through dyn_core) — plus byte-traffic counters on
the AD stack (adStack.c:28-31 `mmctraffic`) and a checkpoint memory report
(tapenade_iter.F90:520-850).  TPU-native equivalents:

* `prt_maxmin(name, arr)` — host-side min/max/|max| print;
* `range_check(name, arr, lo, hi)` — warn (or raise with
  FV3LM_DEBUG=raise) when values leave [lo, hi] or go non-finite, so an
  unstable configuration surfaces as a named report instead of NaNs three
  subsystems later;
* `check_state(prog)` — the reference's standard checks on a prognostic
  dict (pt range, delp positivity, wind magnitude);
* `tape_report(stepper)` — exact resident bytes of the checkpoint stacks
  and frozen branch tapes for one cached trajectory (the tapenade_iter
  memory report / adStack traffic analogue).  scripts/mem_report.py gives
  the full per-executable XLA analysis.

Everything is gated on FV3LM_DEBUG (unset -> zero overhead: the functions
return immediately without touching device data).
"""

from __future__ import annotations

import os


def _mode() -> str:
    return os.environ.get("FV3LM_DEBUG", "")


def enabled() -> bool:
    return _mode() not in ("", "0")


#: reference-like plausibility ranges (fv_diagnostics range_check call
#: sites use similar bounds for pt/delp/winds)
RANGES = {
    "t": (150.0, 350.0),
    "pt": (150.0, 350.0),
    "delp": (0.01, 2.0e5),
    "u": (-280.0, 280.0),
    "v": (-280.0, 280.0),
    "w": (-90.0, 90.0),
}


def prt_maxmin(name, arr):
    """Host-side named min/max print (prt_maxmin analogue)."""
    if not enabled():
        return
    import numpy as np

    a = np.asarray(arr)
    print(f"# fv3lm {name:12s} min {a.min():+.6e} max {a.max():+.6e} "
          f"|max| {np.abs(a).max():.6e}")


def range_check(name, arr, lo, hi):
    """Warn (or raise with FV3LM_DEBUG=raise) on out-of-range/non-finite
    values; returns True if the field is clean."""
    if not enabled():
        return True
    import numpy as np

    a = np.asarray(arr)
    bad = ~np.isfinite(a)
    nbad = int(bad.sum())
    nlo = int((a < lo).sum() - (bad & (a < lo)).sum()) if nbad else int(
        (a < lo).sum())
    nhi = int((a > hi).sum())
    if nbad or nlo or nhi:
        msg = (f"# fv3lm RANGE {name}: {nbad} non-finite, {nlo} < {lo}, "
               f"{nhi} > {hi} (min {np.nanmin(a):+.4e}, "
               f"max {np.nanmax(a):+.4e})")
        if _mode() == "raise":
            raise FloatingPointError(msg)
        print(msg)
        return False
    return True


def check_state(prog, label=""):
    """range_check over a prognostic dict with the standard bounds."""
    if not enabled():
        return True
    ok = True
    for k, v in prog.items():
        lo, hi = RANGES.get(k, (-1.0e30, 1.0e30))
        ok = range_check(f"{label}{k}", v, lo, hi) and ok
    return ok


def tree_bytes(tree):
    import jax

    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree)
               if hasattr(x, "dtype"))


def tape_report(lm) -> str:
    """One-line byte report of the cached linearization data (checkpoint
    stacks + branch tapes) — the tapenade_iter.F90:520-850 memory-report
    analogue.  Call after step_tl/step_ad has populated the cache."""
    lines = []
    for _, (pins, entry) in lm._traj_cache.items():
        cks, tapes = entry[0], entry[1]
        lines.append(
            f"ckpts {tree_bytes(cks) / 1e6:9.1f} MB  "
            f"tapes {tree_bytes(tapes) / 1e6:9.1f} MB")
    n = len(lines)
    body = "; ".join(lines) if lines else "no cached trajectories"
    return f"# fv3lm tape report ({n} cached traj): {body}"
