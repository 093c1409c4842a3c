"""End-to-end differentiability: jax.grad vs finite differences.

The framework's north-star new capability (BASELINE.json; the reference
Fortran has no autodiff) is d(image)/d(parameters) through the FULL
pipeline — semi-analytic geodesics, fluid sampling, tetrad projection,
coefficients, and the Stokes scan.  These tests pin it: a NaN anywhere
in the backward pass (the round-1 passivity_clamp failure mode) or a
wrong VJP shows up as a mismatch against central differences.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from grtrans_tpu.geodesics import camera as cam_mod
from grtrans_tpu.geodesics import geokerr
from grtrans_tpu import driver
from grtrans_tpu.fluid.base import load_fluid_model, SourceParams
from grtrans_tpu.fluid import analytic  # noqa: F401


A, MU0 = 0.9, 0.5
NPTS = 48
MBH = 4e6
SP = SourceParams(mbh=MBH)
CAM = cam_mod.make_camera(A, MU0, -10.0, 10.0, -10.0, 10.0, 6, 6)


def _flux_of_params(n0, t0, iname="formal"):
    model = load_fluid_model("SARIAF", n0=n0, t0=t0, beta=10.0)
    geo = geokerr.trace(A, MU0, CAM.alpha, CAM.beta, CAM.l, CAM.q2,
                        CAM.sm, CAM.u0, NPTS)
    fv = model.vals(geo.x, geo.k, A)
    ei = model.convert(fv, SP)
    iv = driver.render_rays(geo, fv, ei, "POLSYNCHTH", [2.3e11], MU0,
                            CAM.alpha, CAM.beta, A, MBH, SP,
                            iname=iname, nvals=4)
    return jnp.sum(iv[0][:, 0])


@pytest.mark.parametrize("iname", ["formal", "delo"])
def test_flagship_param_grads_match_fd(iname):
    """dF/dn0 and dF/dt0 through the flagship SARIAF render agree with
    central finite differences for BOTH polarized solvers."""
    n0, t0 = 4e7, 1.6e11

    def loss(p):
        return _flux_of_params(p["n0"], p["t0"], iname)

    g = jax.grad(loss)({"n0": jnp.asarray(n0), "t0": jnp.asarray(t0)})
    assert np.isfinite(float(g["n0"])) and np.isfinite(float(g["t0"]))

    for key, base, rel in (("n0", n0, 1e-4), ("t0", t0, 1e-4)):
        h = base * rel
        args_p = {"n0": n0, "t0": t0}
        args_m = {"n0": n0, "t0": t0}
        args_p[key] = base + h
        args_m[key] = base - h
        fd = (float(_flux_of_params(args_p["n0"], args_p["t0"], iname))
              - float(_flux_of_params(args_m["n0"], args_m["t0"], iname))
              ) / (2 * h)
        ad = float(g[key])
        # the render is piecewise (thin/thick branches, degenerate-cell
        # masks); the FD secant can straddle a branch switch, so allow
        # ~1% — far below a sign/scale error, far above the NaN regime
        assert abs(ad - fd) <= 1e-2 * max(abs(fd), abs(ad)), \
            f"{iname} d/d{key}: autodiff {ad:.6e} vs FD {fd:.6e}"


def test_spin_gradient_through_geodesics():
    """d(flux)/d(spin) through geokerr.trace (the BASELINE.json
    north-star: the reference cannot do this at all).  The camera
    constants of motion are recomputed from spin inside the loss so the
    gradient flows through q2 as well as the Kerr geometry."""
    alpha, beta = CAM.alpha, CAM.beta

    def flux_of_spin(a):
        l = -alpha * jnp.sqrt(1.0 - MU0 * MU0)
        q2 = beta ** 2 - (a * a - alpha ** 2) * MU0 * MU0
        sm = jnp.where(beta >= 0.0, 1.0, -1.0)
        model = load_fluid_model("SARIAF", n0=4e7, t0=1.6e11, beta=10.0)
        geo = geokerr.trace(a, MU0, alpha, beta, l, q2, sm, CAM.u0, NPTS)
        fv = model.vals(geo.x, geo.k, a)
        ei = model.convert(fv, SP)
        iv = driver.render_rays(geo, fv, ei, "POLSYNCHTH", [2.3e11], MU0,
                                alpha, beta, a, MBH, SP,
                                iname="formal", nvals=4)
        return jnp.sum(iv[0][:, 0])

    def image_of_spin(a):
        # per-pixel image (same pipeline as flux_of_spin)
        l = -alpha * jnp.sqrt(1.0 - MU0 * MU0)
        q2 = beta ** 2 - (a * a - alpha ** 2) * MU0 * MU0
        sm = jnp.where(beta >= 0.0, 1.0, -1.0)
        model = load_fluid_model("SARIAF", n0=4e7, t0=1.6e11, beta=10.0)
        geo = geokerr.trace(a, MU0, alpha, beta, l, q2, sm, CAM.u0, NPTS)
        fv = model.vals(geo.x, geo.k, a)
        ei = model.convert(fv, SP)
        iv = driver.render_rays(geo, fv, ei, "POLSYNCHTH", [2.3e11], MU0,
                                alpha, beta, a, MBH, SP,
                                iname="formal", nvals=4)
        return iv[0][:, 0]

    a0 = 0.9
    ad_tot = float(jax.grad(flux_of_spin)(jnp.asarray(a0)))
    assert np.isfinite(ad_tot)
    # per-pixel comparison: I(a) is piecewise-smooth in spin — isolated
    # near-shadow pixels cross discrete branches (plunging <-> turning,
    # validity-mask flips) where a secant straddles a genuine jump and
    # no derivative comparison is meaningful.  AD must match FD on the
    # overwhelming majority of pixels.
    h = 2e-4
    ad = np.asarray(jax.jacfwd(image_of_spin)(jnp.asarray(a0)))
    fd = (np.asarray(image_of_spin(jnp.asarray(a0 + h)))
          - np.asarray(image_of_spin(jnp.asarray(a0 - h)))) / (2 * h)
    assert np.isfinite(ad).all()
    scale = np.maximum(np.abs(ad), np.abs(fd)) + 1e-3 * np.abs(fd).max()
    relerr = np.abs(ad - fd) / scale
    frac_ok = float((relerr < 5e-2).mean())
    assert frac_ok >= 0.9, \
        f"only {frac_ok:.0%} of pixels have d(I)/d(spin) matching FD; " \
        f"worst {np.sort(relerr)[-3:]}"


def test_grad_finite_with_masked_cells():
    """Gradients stay finite when many samples are masked/zeroed (the
    round-1 NaN regression: sqrt/div chains at aI=0, a_pol=0 cells)."""
    # tiny t0 -> most cells emit ~nothing -> many zeroed coefficients
    g = jax.grad(lambda t0: _flux_of_params(4e3, t0))(jnp.asarray(2e10))
    assert np.isfinite(float(g))
