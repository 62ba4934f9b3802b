"""Debug observability surface (fv3jedi_lm_tpu.debug): prt_maxmin /
range_check / tape_report analogues of fv_diagnostics_nlm.F90:79-81 and
tapenade_iter.F90:520-850."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from fv3jedi_lm_tpu import debug


@pytest.fixture
def dbg_on(monkeypatch):
    monkeypatch.setenv("FV3LM_DEBUG", "1")


def test_disabled_is_noop(monkeypatch, capsys):
    monkeypatch.delenv("FV3LM_DEBUG", raising=False)
    assert not debug.enabled()
    assert debug.range_check("t", jnp.full((3,), 1e9), 150.0, 350.0) is True
    assert capsys.readouterr().out == ""


def test_range_check_reports(dbg_on, capsys):
    bad = jnp.asarray([200.0, 400.0, np.nan])
    ok = debug.range_check("t", bad, 150.0, 350.0)
    out = capsys.readouterr().out
    assert not ok
    assert "RANGE t" in out and "non-finite" in out


def test_range_check_raise(monkeypatch):
    monkeypatch.setenv("FV3LM_DEBUG", "raise")
    with pytest.raises(FloatingPointError):
        debug.range_check("delp", jnp.asarray([-1.0]), 0.01, 2e5)


def test_check_state_clean(dbg_on, capsys):
    prog = dict(t=jnp.full((4,), 280.0), delp=jnp.full((4,), 1e3),
                u=jnp.zeros((4,)))
    assert debug.check_state(prog)
    assert capsys.readouterr().out == ""


def test_prt_maxmin(dbg_on, capsys):
    debug.prt_maxmin("u", jnp.asarray([-3.0, 7.0]))
    out = capsys.readouterr().out
    assert "u" in out and "+7.0" in out


def test_tape_report_on_lm():
    from fv3jedi_lm_tpu.config import DynConfig, LMConfig
    from fv3jedi_lm_tpu.lm import LinearModel

    cfg = LMConfig(dyn=DynConfig(npx=9, npy=9, npz=4, n_split=1, k_split=1,
                                 d2_bg_k1=0.2, d2_bg_k2=0.1, n_sponge=2),
                   dt=300.0)
    lm = LinearModel.create(cfg)
    tr = lm.rest_traj()
    p = lm.zero_pert()
    lm.step_tl(tr, p)
    rep = debug.tape_report(lm)
    assert "1 cached traj" in rep and "ckpts" in rep and "tapes" in rep
