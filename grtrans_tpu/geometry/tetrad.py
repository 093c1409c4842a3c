"""Polarization transport and the comoving orthonormal frame.

Walker-Penrose parallel transport of the polarization basis and the
Kulkarni+2011 comoving tetrad projection producing the emission-frame
rotation angles (s2xi, c2xi), B-field pitch angle, redshift g and disk
emission cosine.

Parity: reference kerr.f90 transport_perpk (:502-548) and
comoving_ortho(_core) (:550-730).
"""

import jax.numpy as jnp

from grtrans_tpu.geometry import kerr
from grtrans_tpu.geometry.kerr import safe_sqrt
from grtrans_tpu.geometry import fourvector as fv


def transport_perpk(kvec, r, th, a, g_cov, kap1, kap2):
    """Solve for the parallel-transported basis vector f=(0,f1,f2,f3)
    perpendicular to k with Walker-Penrose constants (kap1, kap2).

    kerr.f90:502-548."""
    g03 = g_cov[..., 3]
    g11 = g_cov[..., 4]
    g22 = g_cov[..., 7]
    g33 = g_cov[..., 9]
    cth = jnp.cos(th)
    sth = jnp.sin(th)
    k0, k1, k2, k3 = (kvec[..., i] for i in range(4))
    gam1 = a * cth * k0 - a * a * cth * sth * sth * k3
    gam2 = r * (r * r + a * a) * sth * k3 - a * r * sth * k0
    gam3 = a * a * cth * sth * sth * k1 - r * (r * r + a * a) * sth * k2
    del1 = r * k0 - r * a * sth * sth * k3
    del2 = -a * cth * sth * (r * r + a * a) * k3 + a * a * sth * cth * k0
    del3 = r * a * sth * sth * k1 + a * cth * sth * (r * r + a * a) * k2
    denom = ((gam2 * del1 - gam1 * del2) * (g33 * k3 + g03 * k0)
             + (gam3 * del2 - gam2 * del3) * g11 * k1
             - (gam3 * del1 - gam1 * del3) * g22 * k2)
    f1 = ((gam2 * kap1 - del2 * kap2) * (g33 * k3 + g03 * k0)
          - g22 * k2 * (gam3 * kap1 - del3 * kap2))
    f2 = ((del1 * kap2 - gam1 * kap1) * (g33 * k3 + g03 * k0)
          + g11 * k1 * (gam3 * kap1 - del3 * kap2))
    f3 = (g22 * k2 * (gam1 * kap1 - del1 * kap2)
          - g11 * k1 * (gam2 * kap1 - del2 * kap2))
    safe = jnp.where(jnp.abs(denom) > 0.0, denom, 1.0)
    nz = jnp.abs(denom) > 0.0
    return (jnp.where(nz, f1 / safe, f1), jnp.where(nz, f2 / safe, f2),
            jnp.where(nz, f3 / safe, f3))


def comoving_ortho(r, th, a, alpha, beta, mus, u, b, k):
    """Project (u, b, k) into the comoving orthonormal tetrad and compute:

      s2xi, c2xi : sin/cos of twice the angle between the parallel
                   -transported polarization basis and the B-field
                   projection perp to k (rotates Q,U into the frame where
                   the synchrotron coefficients are diagonal)
      ang        : pitch angle between k and B in the fluid frame
      g          : redshift  1/khat^t
      cosne      : disk emission cosine

    kerr.f90:550-730 (comoving_ortho_core)."""
    g_cov = kerr.metric_cov(r, th, a)
    gtt = g_cov[..., 0]
    gtp = g_cov[..., 3]
    grr = g_cov[..., 4]
    gmm = g_cov[..., 7]
    gpp = g_cov[..., 9]
    ut, ur, um, up = (u[..., i] for i in range(4))
    utc = gtt * ut + gtp * up
    upc = gpp * up + gtp * ut
    urc = grr * ur
    umc = gmm * um

    # Walker-Penrose constants at the observer (kerr.f90:635-636)
    kap1 = alpha + a * jnp.sqrt(1.0 - mus * mus)
    kap2 = -beta
    al1, al2, al3 = transport_perpk(k, r, th, a, g_cov, kap1, kap2)
    # degenerate pole-on case: basis along e_phi (kerr.f90:639-641)
    degen = (kap1 == 0.0) & (kap2 == 0.0)
    al1 = jnp.where(degen, 0.0, al1)
    al2 = jnp.where(degen, 0.0, al2)
    al3 = jnp.where(degen, 1.0 / jnp.sqrt(gpp), al3)
    z = jnp.zeros_like(al1)
    aa = jnp.stack([z, al1, al2, al3], axis=-1)

    # Kulkarni+2011 comoving tetrad (kerr.f90:644-667).  The norms can
    # go negative for unphysical four-velocities (fluid models produce
    # those e.g. inside the ergosphere); clamp the sqrts (NaN primals
    # poison autodiff even under output masks) and report validity.
    d = r * r + a * a - 2.0 * r
    nr2 = -grr * (utc * ut + upc * up) * (1.0 + umc * um)
    nm2 = gmm * (1.0 + umc * um)
    np2 = -(utc * ut + upc * up) * d * jnp.sin(th) ** 2
    frame_ok = (nr2 > 0.0) & (nm2 > 0.0) & (np2 > 0.0)
    snr = jnp.where(frame_ok, safe_sqrt(nr2), 1.0)
    snm = jnp.where(frame_ok, safe_sqrt(nm2), 1.0)
    snp = jnp.where(frame_ok, safe_sqrt(np2), 1.0)
    ekt = -u
    ekr = jnp.stack([urc * ut / snr, -(utc * ut + upc * up) / snr,
                     z, urc * up / snr], axis=-1)
    ekm = jnp.stack([umc * ut / snm, umc * ur / snm,
                     (1.0 + umc * um) / snm, umc * up / snm], axis=-1)
    ekp = jnp.stack([upc / snp, z, z, -utc / snp], axis=-1)

    def proj(v):
        return jnp.stack([fv.dot(g_cov, e, v) for e in (ekt, ekr, ekm, ekp)],
                         axis=-1)

    bhat = proj(b)
    khat = proj(k)
    ahat = proj(aa)

    knorm = khat[..., 1] ** 2 + khat[..., 2] ** 2 + khat[..., 3] ** 2
    frame_ok = frame_ok & (knorm > 0.0) & (jnp.abs(khat[..., 0]) > 0.0)
    kt_safe = jnp.where(jnp.abs(khat[..., 0]) > 0.0, khat[..., 0], 1.0)
    # spatial part of transported basis, projected perp to k via the
    # null condition (kerr.f90:674-676)
    aahat = jnp.stack(
        [ahat[..., i] - khat[..., i] * ahat[..., 0] / kt_safe
         for i in (1, 2, 3)], axis=-1)
    sk = jnp.where(knorm > 0.0, safe_sqrt(knorm), 1.0)
    bbhat = jnp.stack(
        [-(aahat[..., 1] * khat[..., 3] - aahat[..., 2] * khat[..., 2]) / sk,
         -(aahat[..., 2] * khat[..., 1] - aahat[..., 0] * khat[..., 3]) / sk,
         -(aahat[..., 0] * khat[..., 2] - aahat[..., 1] * khat[..., 1]) / sk],
        axis=-1)

    bdotb = fv.dot(g_cov, b, b)
    bdotk = (bhat[..., 1] * khat[..., 1] + bhat[..., 2] * khat[..., 2]
             + bhat[..., 3] * khat[..., 3])
    bsp = bhat[..., 1:4]
    aadotbp = jnp.sum(bsp * aahat, axis=-1)
    bpdotbb = jnp.sum(bsp * bbhat, axis=-1)
    nrm = aadotbp ** 2 + bpdotbb ** 2
    ok = bdotb > 0.0
    safenrm = jnp.where(nrm > 0.0, nrm, 1.0)
    s2xi = jnp.where(ok, -2.0 * aadotbp * bpdotbb / safenrm, 0.0)
    c2xi = jnp.where(ok, (bpdotbb ** 2 - aadotbp ** 2) / safenrm, 1.0)
    angnorm = jnp.where(ok, bdotk / sk / safe_sqrt(jnp.where(ok, bdotb, 1.0)),
                        0.5)
    # clamp just inside +-1: roundoff can push |cos| over 1, and arccos'
    # gradient diverges at the endpoints (1e-8 keeps d(acos)/dx <= ~7e3,
    # finite for autodiff).  The reference's comoving_ortho_core clips at
    # +-0.99 (kerr.f90:618,719) which silently floors the pitch angle at
    # ~8 deg for near-field-aligned rays; we keep the true angle.
    ang = jnp.arccos(jnp.clip(angnorm, -1.0 + 1e-8, 1.0 - 1e-8))
    g = 1.0 / kt_safe
    cosne = g * safe_sqrt(
        beta * beta + mus * mus * (alpha * alpha - a * a)) / r
    return s2xi, c2xi, ang, g, cosne, frame_ok
