"""Mixed-precision (prec='mixed') validation: the f32 coefficient+
transfer leg must reproduce the f64 pipeline within far better than the
1e-2 regression tolerances (the TPU fast path — v5e has no native f64)."""

import numpy as np

from grtrans_tpu.config import GrtransConfig
from grtrans_tpu.orchestrator import grtrans_run
import pytest

pytestmark = pytest.mark.slow  # full-res e2e: fast tier = -m 'not slow'


def _cfg(prec, **kw):
    base = dict(fname="SARIAF", ename="POLSYNCHTH", nvals=4,
                spin=0.9, standard=1, nn=(12, 12, 64), mbh=4e6,
                mumin=0.5, mumax=0.5, nmu=1, nfreq=2, fmin=1e11,
                fmax=3e11, iname="formal",
                gridvals=(-12.0, 12.0, -12.0, 12.0),
                fargs=dict(n0=4e7, t0=1.6e11, beta=10.0))
    base.update(kw)
    return GrtransConfig(prec=prec, **base)


def test_mixed_matches_f64_sariaf():
    iv64, _, _ = grtrans_run(_cfg("f64"))
    iv32, _, _ = grtrans_run(_cfg("mixed"))
    assert np.isfinite(iv32).all()
    ref = np.abs(iv64[:, :, 0]).max()
    err = np.abs(iv32.astype(np.float64) - iv64).max() / ref
    assert err < 2e-3, err


def test_mixed_matches_f64_powerlaw_pl():
    kw = dict(fname="POWERLAW", ename="POLSYNCHPL", gmin=100.0, gmax=1e5,
              fargs=dict(n0=3e7, t0=6e10, beta=10.0, nnth0=8e4))
    iv64, _, _ = grtrans_run(_cfg("f64", **kw))
    iv32, _, _ = grtrans_run(_cfg("mixed", **kw))
    assert np.isfinite(iv32).all()
    ref = np.abs(iv64[:, :, 0]).max()
    err = np.abs(iv32.astype(np.float64) - iv64).max() / ref
    assert err < 2e-3, err
