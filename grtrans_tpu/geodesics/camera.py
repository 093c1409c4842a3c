"""Camera pixel grids and photon constants of motion.

Parity: reference geokerr_wrapper.f INITIALIZE_CAMERA_GEOKERR (:138-354):
rectangular (nrotype=2) and circular log-spaced (nrotype=1) grids, impact
parameters -> (l, q^2), initial signs (su, sm), observer radius
u0 = min(1e-4, 1/(fac*abmax)).
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

INPUT_LIMIT = 1e-10  # tiny-value clamp, geokerr_wrapper.f:204-211
FAC = 100.0


class Camera(NamedTuple):
    alpha: jnp.ndarray   # (npix,) image-plane x (perp to spin projection)
    beta: jnp.ndarray    # (npix,) image-plane y
    l: jnp.ndarray       # (npix,) angular momentum
    q2: jnp.ndarray      # (npix,) Carter constant
    sm: jnp.ndarray      # (npix,) initial polar direction sign
    su: jnp.ndarray      # (npix,) initial radial direction sign (+1 = in)
    u0: float            # observer inverse radius
    mu0: float           # cos(inclination)
    a: float             # spin


def pixel_grid(a1, a2, b1, b2, nro, nphi, nrotype=2, rcut=1.0):
    """Pixel impact parameters.

    nrotype=2 (rectangular): alpha_i = a1 + (a2-a1)(i+1/2)/nro, beta_j
    likewise over nphi; ordering beta-fastest (geokerr_wrapper.f:179-195).
    nrotype=1 (circular): log-spaced radii ro_i = a1 (rcut/a1)^((i+1)/nro),
    uniform azimuth phi_j = 2 pi (j+1/2)/nphi (geokerr_wrapper.f:138-149).
    """
    if nrotype == 1:
        i = np.arange(1, nro + 1)
        ro = a1 * (rcut / a1) ** (i / nro)
        if nphi != 1:
            ph = 2.0 * np.pi * (np.arange(nphi) + 0.5) / nphi
        else:
            ph = np.array([0.0])
        alpha = (ro[:, None] * np.cos(ph)[None, :]).ravel()
        beta = (ro[:, None] * np.sin(ph)[None, :]).ravel()
        abmax = rcut ** 2
    else:
        i = np.arange(nro)
        j = np.arange(nphi)
        alpha = (a1 + (a2 - a1) * (i + 0.5) / nro)
        beta = (b1 + (b2 - b1) * (j + 0.5) / nphi)
        alpha = np.repeat(alpha, nphi)
        beta = np.tile(beta, nro)
        abmax = max(a1 * a1, a2 * a2) ** 2 + max(b1 * b1, b2 * b2) ** 2
    return jnp.asarray(alpha), jnp.asarray(beta), float(abmax)


def make_camera(a, mu0, a1, a2, b1, b2, nro, nphi, nrotype=2, rcut=1.0):
    """Build the full camera: pixels + constants of motion + signs.

    geokerr_wrapper.f:160-163 (u0), :198-201,275-277 (l, q2),
    :213-220,279-285 (su, sm)."""
    alpha, beta, abmax = pixel_grid(a1, a2, b1, b2, nro, nphi, nrotype, rcut)
    u0 = min(1e-4, 1.0 / (FAC * abmax))
    l = -alpha * np.sqrt(max(1.0 - mu0 * mu0, 0.0))
    q2 = beta ** 2 - (a * a - alpha ** 2) * mu0 * mu0
    q2 = jnp.where(jnp.abs(q2) < INPUT_LIMIT ** 2, 0.0, q2)
    l = jnp.where(jnp.abs(l) < INPUT_LIMIT, 0.0, l)
    sm = jnp.where((beta >= 0.0) & (mu0 < 1.0), 1.0, -1.0)
    su = jnp.ones_like(l)
    return Camera(alpha=alpha, beta=beta, l=l, q2=q2, sm=sm, su=su,
                  u0=float(u0), mu0=float(mu0), a=float(a))
