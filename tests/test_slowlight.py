"""Slow-light (nload>1) time-dependent rendering.

Reference semantics: per-ray t0 pre-pass restoring the camera->trace
-start delay (geodesics.f90:113-128, pgrtrans.f90:177-191) + fluid
sampling at each sample's own retarded time via a two-slice blend of the
dump ring buffer (fluid_model_harm.f90:136-197).  These tests drive a
synthetic HARM3D dump SEQUENCE through the full orchestrator in both
fast-light and slow-light modes."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from grtrans_tpu.config import GrtransConfig
from grtrans_tpu.orchestrator import grtrans_run
from grtrans_tpu.fluid.base import load_fluid_model
from grtrans_tpu.fluid.grmhd3d import FIELDS
from grtrans_tpu.geometry import kerr

from tests.test_grmhd3d import harm3d_files, synthetic_flow  # noqa: F401

pytestmark = pytest.mark.slow  # full-res e2e: fast tier = -m 'not slow'

A = 0.9375


def _cfg(nload):
    return GrtransConfig(fname="HARM3D", ename="POLSYNCHTH", nvals=4,
                         spin=A, standard=1, nn=(8, 8, 48), uout=0.04,
                         mbh=4.3e6, mumin=0.5, mumax=0.5, nmu=1, nfreq=1,
                         fmin=2.3e11, fmax=2.3e11, iname="formal",
                         mdotmin=3e15, mdotmax=3e15, nmdot=1,
                         gridvals=(-12.0, 12.0, -12.0, 12.0),
                         gmin=10.0, muval=0.25, nload=nload)


def _scaled(base, fac):
    """Scale the snapshot so the image brightens MONOTONICALLY with fac:
    rho, p by fac and B by sqrt(fac) keeps T_e, plasma beta and the
    monika_e temperature ratio invariant while n and B grow (scaling
    rho+p alone RAISES beta, cools the electrons, and can dim the
    image)."""
    arrs = dict(base)
    arrs["rho"] = base["rho"] * fac
    arrs["p"] = base["p"] * fac
    for k in ("b0", "br", "bth", "bph"):
        arrs[k] = base[k] * np.sqrt(fac)
    return arrs


def _series_model(dfile, hfile, facs, tstep):
    """Base dump + scaled copies as later time slices (slice 0 = the
    unscaled dump)."""
    m = load_fluid_model("HARM3D", dfile=dfile, hfile=hfile)
    base = {k: m.f[k][0] for k in FIELDS}
    for fac in facs:
        m.append_slice(_scaled(base, fac))
    m.tstep = tstep
    return m


def test_identical_slices_match_fast_light(harm3d_files):
    """With every slice identical, slow light must equal fast light to
    roundoff: the retarded-time machinery reduces to the identity."""
    dfile, hfile, _ = harm3d_files
    m_fast = load_fluid_model("HARM3D", dfile=dfile, hfile=hfile)
    iv_fast, _, _ = grtrans_run(_cfg(1), model=m_fast)

    m_slow = _series_model(dfile, hfile, facs=[1.0, 1.0], tstep=50.0)
    assert m_slow.nt_slices == 3
    iv_slow, _, _ = grtrans_run(_cfg(3), model=m_slow)
    np.testing.assert_allclose(iv_slow, iv_fast, rtol=1e-10, atol=0)


def test_slow_light_lags_growing_source(harm3d_files):
    """Emission growing linearly with simulation time: slow light samples
    the PAST along each ray, so at the epoch of the newest slice its
    image must be strictly dimmer than the fast-light render of that
    slice — and brighter than the fast-light render of the oldest slice
    (the blob's history is bracketed by its endpoints)."""
    dfile, hfile, _ = harm3d_files
    # slices at t = -200, -100, 0 M: the ~30-50M light-travel depth of
    # the emission region is a large fraction of the 100M cadence, so
    # the retarded-time dimming is a percent-level effect
    m_slow = _series_model(dfile, hfile, facs=[1.5, 2.0], tstep=100.0)
    cfg = dataclasses.replace(_cfg(3), nt=1, dt=0.0)
    # slice 0 sits at sim time -200 so the newest slice is the epoch
    # of observation (time=0)
    m_slow.toffset = -200.0
    iv_slow, _, _ = grtrans_run(cfg, model=m_slow)

    m_new = load_fluid_model("HARM3D", dfile=dfile, hfile=hfile)
    base = {k: m_new.f[k][0] for k in FIELDS}
    m_new.f = {k: v[None] for k, v in _scaled(base, 2.0).items()}
    iv_new, _, _ = grtrans_run(_cfg(1), model=m_new)
    m_old = load_fluid_model("HARM3D", dfile=dfile, hfile=hfile)
    iv_old, _, _ = grtrans_run(_cfg(1), model=m_old)

    F_slow = iv_slow[0, :, 0].sum()
    F_new = iv_new[0, :, 0].sum()
    F_old = iv_old[0, :, 0].sum()
    assert np.isfinite(iv_slow).all()
    assert F_old < F_slow < F_new, (F_old, F_slow, F_new)
    # the lag must be a real effect, not roundoff
    assert (F_new - F_slow) / F_new > 1e-4


def test_camera_delay_prepass(harm3d_files):
    """The t0 pre-pass: rays with larger impact parameter reach the
    trace-start sphere later; delays are finite, non-negative after
    normalization, and grow with |alpha| (reference pgrtrans.f90:184-190
    normalization)."""
    from grtrans_tpu.geodesics import camera as cam_mod, geokerr
    mu0 = 0.5
    cam = cam_mod.make_camera(A, mu0, -12.0, 12.0, 0.0, 0.0, 16, 1)
    d = np.asarray(geokerr.camera_delay(A, mu0, cam.alpha, cam.beta,
                                        cam.l, cam.q2, cam.sm, cam.u0,
                                        0.04))
    assert np.isfinite(d).all() and (d > 0).all()
    rel = d - d.min()
    # delay ~ sqrt(D^2 + b^2) - (D - R): grows with |b| = |alpha| here
    order = np.argsort(np.abs(np.asarray(cam.alpha)))
    assert rel[order][-1] > rel[order][0]
    assert rel[order][-1] > 1.0  # several M across a 12M-wide camera
