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


def test_mixed_trace_matches_f64():
    """prec='mixed' geodesics (f32 point-local math, f64 Weierstrass +
    accumulations): coordinates, wavevector, and affine parameter must
    track the f64 trace at the f32-roundoff level (r, k ~ 1e-7 rel;
    theta ~ 1e-5), orders of magnitude inside the 1e-2 regression
    bars.  phi is checked at its 99.9th percentile: isolated pixels
    whose rays graze the pole within f32 resolution legitimately lose
    phi accuracy (geokerr._phase_integrands_polar docstring)."""
    from grtrans_tpu.geodesics import camera as cam_mod, geokerr
    a, mu0 = 0.998, 0.906
    cam = cam_mod.make_camera(a, mu0, -40.0, 20.0, -20.0, 40.0, 20, 20)
    args = (cam.alpha, cam.beta, cam.l, cam.q2, cam.sm, cam.u0, 128)
    g64 = geokerr.trace(a, mu0, *args, uout=0.01)
    g32 = geokerr.trace(a, mu0, *args, uout=0.01, prec="mixed")
    assert g32.lam.dtype == np.float64      # solver's f64 phase path
    v = np.asarray(g64.valid & g32.valid)
    x64, x32 = np.asarray(g64.x), np.asarray(g32.x)
    assert np.abs((x32[..., 1] - x64[..., 1])
                  / x64[..., 1])[v].max() < 1e-6
    assert np.abs(x32[..., 2] - x64[..., 2])[v].max() < 1e-5
    dphi = np.abs(x32[..., 3] - x64[..., 3])[v]
    assert np.percentile(dphi, 99.9) < 5e-3   # measured r5: 2.8e-3
    # k: f32 algebra with f64-evaluated potentials and a factored
    # Delta — bulk at f32 roundoff; the only large deviations are the
    # 1/Delta-divergent k_t/k_phi on horizon-adjacent samples, where
    # f32's resolution of r itself bounds the accuracy (those samples
    # are infinitely redshifted -> zero emission; whole-image effect
    # pinned at ~1e-4 by the render-level tests and the bench
    # cross-check)
    # Bars are the MEASURED distribution on this config (r5: p99.9
    # 6.4e-7, max 8.2e-3) with a ~3-8x margin — prescriptive enough to
    # catch a 1%-level regression in any single transported quantity
    # (round-4 verdict: max 0.05 was descriptive, not prescriptive)
    kmag = np.linalg.norm(np.asarray(g64.k), axis=-1, keepdims=True)
    kd = np.abs(np.asarray(g32.k) - np.asarray(g64.k)) / kmag
    assert np.percentile(kd[v], 99.9) < 5e-6
    assert kd[v].max() < 0.025
    assert np.abs(np.asarray(g32.lam - g64.lam))[v].max() \
        < 1e-5 * np.abs(np.asarray(g64.lam)).max()
    assert (np.asarray(g32.tpm) == np.asarray(g64.tpm))[v].all()
    assert (np.asarray(g32.tpr) == np.asarray(g64.tpr))[v].all()


def test_mixed_matches_f64_powerlaw_pl():
    kw = dict(fname="POWERLAW", ename="POLSYNCHPL", gmin=100.0, gmax=1e5,
              fargs=dict(n0=3e7, t0=6e10, beta=10.0, nnth0=8e4))
    iv64, _, _ = grtrans_run(_cfg("f64", **kw))
    iv32, _, _ = grtrans_run(_cfg("mixed", **kw))
    assert np.isfinite(iv32).all()
    ref = np.abs(iv64[:, :, 0]).max()
    err = np.abs(iv32.astype(np.float64) - iv64).max() / ref
    assert err < 2e-3, err
