"""Frozen-branch tape: trajectory-time control flow recorded as data.

The reference's adjoint discipline is Tapenade's PUSHCONTROL/POPCONTROL
(utils/tapenade/adBuffer.f:114-343): every branch taken during the forward
sweep is recorded, and the backward sweep replays exactly those decisions.
That is what makes the TLM and ADM *exact transposes* of one linear
operator: both linearize the model at the SAME branch decisions.

Two separately jit-compiled programs (a jvp program and a vjp program) do
not have that property: XLA may round a branch predicate differently in the
two programs, and a near-threshold limiter/upwind switch then flips between
TL and AD, breaking the dot-product identity at the flipped lane's
magnitude (measured at ~1e-4 on c12 test trajectories).

This module is the TPU-native PUSHCONTROL: ops route every trajectory-
dependent discrete decision (where-predicates, max/min/abs/sign selections,
searchsorted indices) through the helpers below.  In ``recording()`` mode
the decisions are computed and appended to a tape (a flat list of bool/int
arrays, returned as part of a jitted program's outputs); in ``replaying()``
mode they are consumed from the tape — so the TL program and the AD program
receive bitwise-identical decisions as *data*.  Outside any context the
helpers are the plain jnp ops (the nonlinear model path is unchanged).

Correctness note: predicates have zero derivative almost everywhere, so
freezing them changes neither jvp nor vjp semantics — it only pins the
piecewise-linearization branch, exactly as Tapenade does.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
import jax.numpy as jnp
from jax import lax

_state = None  # None | ["rec", list] | ["rep", list, cursor_list]


def _pack(pred):
    """Bit-pack a boolean decision array for the tape (8x smaller).

    The tapes dominate the adjoint's memory footprint (the reference's
    PUSHCONTROL bits are 1-2 *bits* per decision, adBuffer.f:114-343; a
    bool array is 8 bits per decision) — packing restores the reference's
    packing ratio.  Integer decisions (fint) are stored raw."""
    if getattr(pred, "dtype", None) == jnp.bool_.dtype and pred.ndim > 0:
        return jnp.packbits(pred.reshape(-1))
    return pred


def _unpack(entry, pred):
    """Undo `_pack` using the freshly traced predicate for shape/dtype."""
    if (getattr(entry, "dtype", None) == jnp.uint8
            and getattr(pred, "dtype", None) == jnp.bool_.dtype):
        return jnp.unpackbits(entry, count=pred.size).reshape(
            pred.shape).astype(bool)
    return entry


@contextmanager
def recording():
    """Record every frozen decision; yields the tape (list of arrays)."""
    global _state
    prev = _state
    tape: list = []
    _state = ["rec", tape]
    try:
        yield tape
    finally:
        _state = prev


@contextmanager
def replaying(tape):
    """Replay decisions from `tape` (sequence in recording order)."""
    global _state
    prev = _state
    _state = ["rep", list(tape), [0]]
    try:
        yield
        used = _state[2][0]
        if used != len(_state[1]):
            raise RuntimeError(
                f"frozen-branch tape length mismatch: consumed {used} of "
                f"{len(_state[1])} entries — record/replay control flow differs"
            )
    finally:
        _state = prev


def active() -> bool:
    return _state is not None


def fbool(pred):
    """Freeze a boolean decision array."""
    if _state is None:
        return pred
    if _state[0] == "rec":
        _state[1].append(_pack(pred))
        return pred
    tape, cur = _state[1], _state[2]
    entry = tape[cur[0]]
    cur[0] += 1
    return _unpack(entry, pred)


def fint(idx, maxval=None):
    """Freeze an integer decision array (e.g. searchsorted output).

    `maxval` (STATIC upper bound on the values, e.g. npz for a remap level
    index) selects compact tape storage — uint8/uint16 instead of int32.
    The raw int32 remap indices were the dominant post-stage tape entries
    at c96L72 (16 MB each, ~490 MB per step) before compaction."""
    if _state is None:
        return idx
    if _state[0] == "rec":
        ent = idx
        if (maxval is not None and getattr(idx, "dtype", None) is not None
                and jnp.issubdtype(idx.dtype, jnp.integer)):
            if maxval <= 255:
                ent = idx.astype(jnp.uint8)
            elif maxval <= 65535:
                ent = idx.astype(jnp.uint16)
        _state[1].append(ent)
        return idx
    tape, cur = _state[1], _state[2]
    entry = tape[cur[0]]
    cur[0] += 1
    if getattr(entry, "dtype", None) != getattr(idx, "dtype", None):
        entry = entry.astype(idx.dtype)
    return entry


def fwhere(pred, a, b):
    return jnp.where(fbool(pred), a, b)


def fmax(a, b):
    return fwhere(jnp.greater_equal(a, b), a, b)


def fmin(a, b):
    return fwhere(jnp.less_equal(a, b), a, b)


def fclip(x, lo, hi):
    return fmin(fmax(x, lo), hi)


def fabs(x):
    return fwhere(x >= 0, x, -x)


def fsign_mul(x, y):
    """Frozen sign(x)*y for the reference's SIGN(y, x) idiom.

    Every call site has y = min(|x|, ...) >= 0 with y == 0 whenever x == 0,
    so the jnp.sign(0) == 0 corner coincides and only the sign branch needs
    freezing."""
    return fwhere(x >= 0, y, -y)


def fscan(body, carry, xs, length=None, reverse=False):
    """`lax.scan` whose body may use freeze ops.

    Recording: the per-iteration tape entries are collected as stacked scan
    outputs and appended to the outer tape as ONE entry (a list of stacked
    arrays).  Replaying: that stacked entry is consumed and fed back to the
    body iterations as scan inputs — the same PUSHCONTROL-inside-a-loop
    discipline Tapenade applies to DO loops (adBuffer.f:114-343)."""
    global _state
    st = _state
    if st is None:
        return lax.scan(body, carry, xs, length=length, reverse=reverse)
    if st[0] == "rec":
        def body_rec(c, x):
            global _state
            prev = _state
            tape: list = []
            _state = ["rec", tape]
            try:
                c, y = body(c, x)
            finally:
                _state = prev
            return c, (y, list(tape))

        _state = None
        try:
            carry, (ys, tapes) = lax.scan(body_rec, carry, xs, length=length,
                                          reverse=reverse)
        finally:
            _state = st
        st[1].append(tapes)
        return carry, ys

    tapes = st[1][st[2][0]]
    st[2][0] += 1

    def body_rep(c, xt):
        global _state
        x, tape = xt
        prev = _state
        _state = ["rep", list(tape), [0]]
        try:
            return body(c, x)
        finally:
            _state = prev

    _state = None
    try:
        return lax.scan(body_rep, carry, (xs, tapes), reverse=reverse)
    finally:
        _state = st


def mix_primal(traj_val, pert_val):
    """Primal from `traj_val`, tangent/cotangent through `pert_val` only.

    The reference's split-linearization idiom: the Tapenade TLM runs the
    PERT-scheme operator for the tangent on a throwaway primal copy, then a
    plain traj-scheme call overwrites the primal (e.g. sw_core_tlm.F90:
    1664-1687, fv_mapz_tlm.F90:780-800).  Under jvp this pytree-level
    stop-gradient mix reproduces exactly that: primal = traj-scheme value,
    derivative = pert-scheme derivative at the same inputs.
    """
    return jax.tree.map(
        lambda a, b: lax.stop_gradient(a) + (b - lax.stop_gradient(b)),
        traj_val, pert_val,
    )
