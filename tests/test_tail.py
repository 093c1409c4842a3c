"""stype='tail' gamma_min source-parameter model (reference
fluid.f90:1641-1678 assign_source_params + calcgmin.f90)."""

import numpy as np
import jax.numpy as jnp

from grtrans_tpu import constants as pc
from grtrans_tpu.fluid.base import (EmisInputs, SourceParams, TAIL, CONST,
                                    calc_gmin, apply_source_params)
from grtrans_tpu.config import GrtransConfig
from grtrans_tpu.orchestrator import grtrans_run


def test_apply_source_params_formulas():
    """TAIL replaces ncgsnth per sample with the calc_gmin tail of the
    thermal population, including the gmax/2 clamp + density correction."""
    sp = SourceParams(mbh=4e6, mu=0.25, p2=3.5, jetalpha=0.02, gmax=1e3,
                      stype=TAIL)
    tcgs = jnp.asarray([1e10, 1e11, 1e13])   # last one drives gmin > gmax
    ncgs = jnp.asarray([1e7, 1e7, 1e7])
    ei = EmisInputs(ncgs=ncgs, tcgs=tcgs, bcgs=jnp.ones(3),
                    ncgsnth=jnp.zeros(3))
    ei2, gmin = apply_source_params(ei, sp)

    thetae = sp.mu * pc.k * np.asarray(tcgs) / (pc.m * pc.c2)
    graw, nfrac = calc_gmin(3.5, jnp.asarray(thetae), 0.02)
    graw, nfrac = np.asarray(graw), np.asarray(nfrac)
    over = graw > sp.gmax
    gexp = np.where(over, sp.gmax / 2.0, graw)
    factor = np.where(over, (sp.gmax / 2.0 / graw) ** (sp.p2 - 2.0), 1.0)
    nexp = factor * np.where(nfrac > 0, nfrac * np.asarray(ncgs)
                             * gexp ** (1.0 - sp.p2), 0.0)
    np.testing.assert_allclose(np.asarray(gmin), gexp, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ei2.ncgsnth), nexp, rtol=1e-12)
    assert over[-1], "test should exercise the gmax clamp branch"
    # CONST passes through untouched
    sp_c = SourceParams(mbh=4e6, stype=CONST, gmin=77.0)
    ei3, g3 = apply_source_params(ei, sp_c)
    assert g3 == 77.0
    assert ei3.ncgsnth is ei.ncgsnth


def test_tail_changes_sariaf_render():
    """A SARIAF power-law render with stype='tail' must differ from
    stype='const' (round-1 regression: TAIL parsed but dead)."""
    base = dict(fname="SARIAF", ename="POLSYNCHPL", nvals=4,
                spin=0.9, standard=1, nn=(8, 8, 48), mbh=4e6,
                mumin=0.5, mumax=0.5, nmu=1, nfreq=1,
                fmin=2.3e11, fmax=2.3e11, iname="formal",
                gridvals=(-12.0, 12.0, -12.0, 12.0),
                gmin=100.0, gmax=1e5, p1=3.5, p2=3.5,
                fargs=dict(n0=4e7, t0=1.6e11, beta=10.0))
    iv_c, _, _ = grtrans_run(GrtransConfig(stype="const", **base))
    iv_t, _, _ = grtrans_run(GrtransConfig(stype="tail", **base))
    assert np.isfinite(iv_c).all() and np.isfinite(iv_t).all()
    assert iv_c[0, :, 0].max() > 0 and iv_t[0, :, 0].max() > 0
    rel = (np.abs(iv_t[0, :, 0] - iv_c[0, :, 0]).sum()
           / np.abs(iv_c[0, :, 0]).sum())
    assert rel > 1e-3, f"TAIL render identical to CONST (rel={rel})"
