"""Emitter -> observer solver: find the camera impact parameters
(alpha, beta) whose geodesic passes through a given emission point.

Parity: reference emitter_observer.py — scipy.optimize.minimize over
(alpha, beta) of the Cartesian separation between the geodesic point at
radius 1/ustar and the target point (used for timing/astrometry of
hotspots).  The reference drives the f2py geokerr camera per function
evaluation; here the objective is a jitted, DIFFERENTIABLE trace, so
the minimizer gets exact gradients (new capability — the reference is
derivative-free).
"""

import numpy as np
import jax
import jax.numpy as jnp

from grtrans_tpu.geodesics import camera as cam_mod, geokerr


def cartesian(u, mu, phi):
    s = jnp.sqrt(jnp.maximum(1.0 - mu ** 2, 0.0))
    return (1.0 / u * s * jnp.cos(phi), 1.0 / u * s * jnp.sin(phi),
            1.0 / u * mu)


def _point_at_u(a, mu0, alpha, beta, ustar, npts=128, u0=1e-6):
    """Trace one ray and interpolate (mu, phi) at u = ustar."""
    ab = jnp.reshape(alpha, (1,))
    bb = jnp.reshape(beta, (1,))
    # constants of motion (geokerr_wrapper.f:198-201,279-285), kept
    # differentiable in (alpha, beta)
    l = -ab * jnp.sqrt(max(1.0 - mu0 * mu0, 0.0))
    q2 = bb ** 2 - (a * a - ab ** 2) * mu0 * mu0
    sm = jnp.where((bb >= 0.0) & (mu0 < 1.0), 1.0, -1.0)
    geo = geokerr.trace(a, mu0, ab, bb, l, q2, sm, u0, npts,
                        uout=ustar * 0.5)
    r = geo.x[0, :, 1]
    u = 1.0 / jnp.maximum(r, 1e-12)
    mu = jnp.cos(geo.x[0, :, 2])
    phi = geo.x[0, :, 3]
    # first crossing of u = ustar along the trace (u increases inward)
    w = jnp.clip((ustar - u[:-1]) / (u[1:] - u[:-1] + 1e-37), 0.0, 1.0)
    cross = (u[:-1] <= ustar) & (u[1:] >= ustar)
    idx = jnp.argmax(cross)
    wi = w[idx]
    mu_c = mu[idx] * (1 - wi) + mu[idx + 1] * wi
    ph_c = phi[idx] * (1 - wi) + phi[idx + 1] * wi
    return mu_c, ph_c, jnp.any(cross)


def run(ustar, mustar, phistar, abguess, a=0.99,
        mu0=float(np.cos(45.0 / 180.0 * np.pi)), npts=128):
    """Find (alpha, beta) hitting (1/ustar, mustar, phistar).

    Mirrors reference emitter_observer.run(:29-37); returns a
    scipy OptimizeResult whose .x is (alpha, beta)."""
    from scipy.optimize import minimize
    target = jnp.asarray(cartesian(jnp.asarray(ustar),
                                   jnp.asarray(mustar),
                                   jnp.asarray(phistar)))

    @jax.jit
    def sep(ab):
        mu_c, ph_c, ok = _point_at_u(a, mu0, ab[0], ab[1], ustar, npts)
        # reference flips phi sign (calc_orbit: -phi[0,-1])
        x, y, z = cartesian(jnp.asarray(ustar), mu_c, -ph_c)
        d = ((x - target[0]) ** 2 + (y - target[1]) ** 2
             + (z - target[2]) ** 2)
        return jnp.where(ok, d, 1e6 + ab[0] ** 2 + ab[1] ** 2)

    grad = jax.jit(jax.grad(sep))
    res = minimize(lambda ab: float(sep(jnp.asarray(ab))),
                   np.asarray(abguess, float),
                   jac=lambda ab: np.asarray(grad(jnp.asarray(ab)),
                                             float),
                   method="BFGS", options=dict(gtol=1e-12))
    return res
