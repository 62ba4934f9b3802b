"""Named timers + profile scopes (reference fv_timing, tools/
fv_timing_nlm.F90:20-61 `timing_on`/`timing_off`/`timing_prt`).

Two cooperating layers, TPU-native:

* `scope(name)` — `jax.named_scope` + profiler TraceAnnotation: inside
  jitted code this does not time anything at run time (everything is one
  XLA program) but it labels the emitted HLO, so `jax.profiler` traces
  attribute device time to model blocks (c_sw, d_sw, remap, ...) the way
  the reference's MPI_Wtime blocks attribute host time.
* `timing_on(name)` / `timing_off(name)` / `timing(name)` — host-side
  wall-clock accumulators for the un-jitted driver level (step_tl/step_ad
  calls, compile vs execute).  `timing_prt()` prints the reference-style
  table.  Enabled by FV3LM_TIMERS=1 or `enable()`; zero overhead when off
  (no device syncs are inserted).
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager

import jax

_ENABLED = os.environ.get("FV3LM_TIMERS", "") not in ("", "0")
_ACC: dict = {}     # name -> [total_seconds, count]
_T0: dict = {}


def enable(on: bool = True) -> None:
    global _ENABLED
    _ENABLED = on


def enabled() -> bool:
    return _ENABLED


@contextmanager
def scope(name: str):
    """Label traced code for profiler attribution (always on — free)."""
    with jax.named_scope(name), jax.profiler.TraceAnnotation(name):
        yield


def timing_on(name: str) -> None:
    if _ENABLED:
        _T0[name] = time.perf_counter()


def timing_off(name: str, sync=None) -> None:
    """End a named block; pass `sync` (arrays) to include device time."""
    if not _ENABLED:
        return
    if sync is not None:
        jax.block_until_ready(sync)
    dt = time.perf_counter() - _T0.pop(name, time.perf_counter())
    tot = _ACC.setdefault(name, [0.0, 0])
    tot[0] += dt
    tot[1] += 1


@contextmanager
def timing(name: str, sync_fn=None):
    """Host-side timed block: `with timing("step_tl"): ...`."""
    timing_on(name)
    try:
        yield
    finally:
        timing_off(name, sync=None if sync_fn is None else sync_fn())


def timing_reset() -> None:
    _ACC.clear()
    _T0.clear()


def timings() -> dict:
    """name -> (total_seconds, count)."""
    return {k: tuple(v) for k, v in _ACC.items()}


def timing_prt() -> str:
    """Reference `timing_prt` table (fv_timing_nlm.F90: per-block totals)."""
    lines = [f"{'block':<28}{'calls':>8}{'total s':>12}{'mean ms':>12}"]
    for name, (tot, cnt) in sorted(_ACC.items()):
        lines.append(f"{name:<28}{cnt:>8}{tot:>12.4f}"
                     f"{1e3 * tot / max(cnt, 1):>12.3f}")
    out = "\n".join(lines)
    print(out, flush=True)
    return out
