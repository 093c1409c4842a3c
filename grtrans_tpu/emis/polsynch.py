"""Polarized synchrotron emission / absorption / Faraday coefficients.

All kernels return the 11-coefficient layout used throughout the
framework (matching reference polsynchemis.f90):

    [j_I, j_Q, j_U, j_V, a_I, a_Q, a_U, a_V, rho_Q, rho_U, rho_V]

Parity targets (reference polsynchemis.f90): polsynchth (:700-863,
Huang+2009 emission fits, Kirchhoff absorption, Shcherbakov 2008 Faraday
fits with the Jones&Hardee low-frequency modification and low-thetae
limits), synchemis (:865-904, angle-averaged Mahadevan+1996),
sympolemisth (:915-1012, Pandya+2016 fits), bnu (:1014-1032).

Everything is elementwise jnp on broadcast arrays — these kernels fuse
into the surrounding radiative-transfer program under jit.
"""

import jax.numpy as jnp

from grtrans_tpu import constants as pc
from grtrans_tpu.ops import bessel

NE = 11
THETAE_MIN = 1e-10
NUC_MIN = 1.0


def bnu(T, nu):
    """Planck function with Rayleigh-Jeans low-frequency branch.
    polsynchemis.f90:1014-1032."""
    x = pc.h * nu / (pc.k * T)
    rj = 2.0 * nu * nu * pc.k * T / pc.c2
    planck = 2.0 * pc.h * nu ** 3 / pc.c2 / jnp.expm1(jnp.maximum(x, 1e-6))
    out = jnp.where(x < 1e-6, rj, planck)
    return jnp.maximum(out, 2.2e-16)


def _iix(x):
    """Mahadevan+1996 thermal I(x) fit (polsynchemis.f90:854-861)."""
    x3 = x ** (1.0 / 3.0)
    return 2.5651 * (1.0 + 1.92 / x3 + 0.9977 / x3 ** 2) * jnp.exp(-1.8899 * x3)


def _iqx(x):
    """Huang+2009 I_Q(x) fit (polsynchemis.f90:831-840)."""
    x3 = x ** (1.0 / 3.0)
    return 2.5651 * (1.0 + 0.93193 / x3 + 0.499873 / x3 ** 2) \
        * jnp.exp(-1.8899 * x3)


def _ivx(x):
    """Huang+2009 I_V(x) fit (polsynchemis.f90:842-852)."""
    x3 = x ** (1.0 / 3.0)
    return (1.81384 / x + 3.42319 / x3 ** 2 + 0.0292545 / jnp.sqrt(x)
            + 2.03773 / x3) * jnp.exp(-1.8899 * x3)


def _jffunc(x):
    """Shcherbakov 2008 F(X) with Jones & Hardee low-frequency term
    (polsynchemis.f90:802-812)."""
    extra = (0.011 * jnp.exp(-x / 47.2)
             - 2.0 ** (-1.0 / 3.0) / 3.0 ** (23.0 / 6.0) * jnp.pi * 1e4
             * (x + 1e-16) ** (-8.0 / 3.0)) \
        * (0.5 + 0.5 * jnp.tanh((jnp.log(x + 1e-37) - jnp.log(120.0)) / 0.1))
    return (2.011 * jnp.exp(-x ** 1.035 / 4.7)
            - jnp.cos(x / 2.0) * jnp.exp(-x ** 1.2 / 2.73)
            - 0.011 * jnp.exp(-x / 47.2) + extra)


def _shgmfunc(x):
    """Modified Shcherbakov G(X) fit (polsynchemis.f90:814-821)."""
    return 0.43793091 * jnp.log(1.0 + 0.00185777 * x ** 1.50316886)


def polsynchth(nu, n, b, T, theta):
    """Thermal polarized synchrotron coefficients (Huang+2009 +
    Shcherbakov 2008).  polsynchemis.f90:700-863.

    nu [Hz], n [cm^-3], b [G], T [K], theta = B-k pitch angle [rad].
    Returns (..., 11)."""
    thetae = pc.k * T / (pc.m * pc.c2) + THETAE_MIN
    sth = jnp.sin(theta)
    nuc = 3.0 * pc.e * b * sth / (4.0 * jnp.pi * pc.m * pc.c) \
        * thetae ** 2 + NUC_MIN
    xm = nu / nuc
    pref = pc.e ** 2 / pc.c / jnp.sqrt(3.0) / 2.0 * n / thetae ** 2 * nu
    ji = pref * _iix(xm)
    jq = pref * _iqx(xm)
    jv = (4.0 * pc.e ** 2 / pc.c / 3.0 / jnp.sqrt(3.0) / jnp.tan(theta)
          * n / 2.0 / thetae ** 3 * nu * _ivx(xm))
    ju = jnp.zeros_like(ji)
    bb_ = bnu(T, nu)
    ai, aq, au, av = ji / bb_, jq / bb_, ju / bb_, jv / bb_

    # Faraday rotation/conversion (Shcherbakov 2008 fits)
    wp2 = 4.0 * jnp.pi * n * pc.e ** 2 / pc.m
    omega0 = pc.e * b / (pc.m * pc.c)
    xarg = thetae * jnp.sqrt(jnp.sqrt(2.0) * sth
                             * (1e3 * omega0 / (2.0 * jnp.pi * nu)))
    # clamp 1/thetae: for cold points K_n underflows and the ratios
    # become 0/0 = NaN; the thetae<=1e-2 branch replaces them anyway,
    # but NaN primals poison autodiff
    it = jnp.minimum(1.0 / thetae, 150.0)
    krat = bessel.besselk1(it) / bessel.besselk2(it)
    k0rat = bessel.besselk0(it) / bessel.besselk2(it)
    gstep = 0.5 + 0.5 * jnp.tanh((thetae - 1.0) / 0.05)
    rel = thetae > 1e-2
    # form the dimensionless ratios FIRST: (2 pi nu)^4 ~ 1e48 overflows
    # f32 (the mixed-precision path), while omega0/(2 pi nu) ~ 1e-5 and
    # wp2/(2 pi nu)^2 are comfortably in range
    otn = omega0 / (2.0 * jnp.pi * nu)
    wptn = wp2 / (2.0 * jnp.pi * nu) ** 2
    eps11m22 = _jffunc(xarg) * wptn * otn ** 2 \
        * jnp.where(rel, krat + 6.0 * thetae, 1.0 + 6.0 * thetae) * sth ** 2
    eps12 = wptn * otn * jnp.cos(theta) \
        * jnp.where(rel,
                    k0rat - gstep * _shgmfunc(xarg) / bessel.besselk2(it),
                    1.0)
    rhov = 2.0 * jnp.pi * nu / pc.c * eps12
    rhoq = 2.0 * jnp.pi * nu / 2.0 / pc.c * eps11m22
    rhou = jnp.zeros_like(rhoq)
    return jnp.stack(jnp.broadcast_arrays(
        ji, jq, ju, jv, ai, aq, au, av, rhoq, rhou, rhov), axis=-1)


def synchemis(nu, n, b, T):
    """Angle-averaged thermal synchrotron (Mahadevan+1996), unpolarized.
    polsynchemis.f90:865-904."""
    thetae = pc.k * T / (pc.m * pc.c2) + THETAE_MIN
    nucrit = 3.0 * pc.e * b / (4.0 * jnp.pi * pc.m * pc.c) * thetae ** 2 \
        + NUC_MIN
    xm = nu / nucrit
    x6 = xm ** (1.0 / 6.0)
    ipx = 4.0505 / x6 * (1.0 + 0.40 / x6 ** 1.5 + 0.5316 / x6 ** 3) \
        * jnp.exp(-1.8899 * x6 ** 2)
    jn = 4.43e-30 / 2.0 * nu * n * ipx / thetae ** 2
    an = jnp.where(jnp.abs(jn) > 0.0, jn / bnu(T, nu), 0.0)
    z = jnp.zeros_like(jn)
    return jnp.stack(jnp.broadcast_arrays(
        jn, z, z, z, an, z, z, z, z, z, z), axis=-1)


def synchemisnoabs(nu, n, b, T):
    """synchemis with absorption zeroed (polsynchemis.f90:906-913)."""
    e = synchemis(nu, n, b, T)
    return e.at[..., 4:].set(0.0)


def sympolemisth(nu, n, b, T, theta):
    """Pandya+2016 'symphony'-fit thermal polarized synchrotron.
    polsynchemis.f90:915-1012."""
    thetae = pc.k * T / (pc.m * pc.c2) + THETAE_MIN
    sth = jnp.sin(theta)
    nuc = pc.e * b / (pc.m * pc.c * 2.0 * jnp.pi) + NUC_MIN
    x = nu / (2.0 / 9.0 * nuc * thetae ** 2 * sth)
    sx = jnp.sqrt(x)
    x16 = x ** (1.0 / 6.0)
    te2425 = thetae ** (24.0 / 25.0)
    jis = jnp.sqrt(2.0) * jnp.pi / 27.0 * sth \
        * (sx + 2.0 ** (11.0 / 12.0) * x16) ** 2
    jqs = -jnp.sqrt(2.0) * jnp.pi / 27.0 * sth \
        * (sx + (7.0 * te2425 + 35.0) / (10.0 * te2425 + 75.0)
           * 2.0 ** (11.0 / 12.0) * x16) ** 2
    jvs = -(37.0 - 87.0 * jnp.sin(theta - 28.0 / 25.0)) / 100.0 \
        / (thetae + 1.0) \
        * (1.0 + (thetae ** 0.6 / 25.0 + 0.7) * x ** (9.0 / 25.0)) ** (5.0 / 3.0)
    fac = n * pc.e ** 2 / pc.c * nuc * jnp.exp(-(x ** (1.0 / 3.0)))
    ji = fac * jis
    jq = -fac * jqs
    jv = -fac * jvs
    bb_ = bnu(T, nu)
    ai, aq, av = ji / bb_, jq / bb_, jv / bb_
    # Faraday coefficients identical to polsynchth
    wp2 = 4.0 * jnp.pi * n * pc.e ** 2 / pc.m
    omega0 = pc.e * b / (pc.m * pc.c)
    xarg = thetae * jnp.sqrt(jnp.sqrt(2.0) * sth
                             * (1e3 * omega0 / (2.0 * jnp.pi * nu)))
    it = jnp.minimum(1.0 / thetae, 150.0)
    gstep = 0.5 + 0.5 * jnp.tanh((thetae - 1.0) / 0.05)
    rel = thetae > 1e-2
    eps11m22 = _jffunc(xarg) * wp2 * omega0 ** 2 / (2.0 * jnp.pi * nu) ** 4 \
        * jnp.where(rel, bessel.besselk1(it) / bessel.besselk2(it)
                    + 6.0 * thetae, 1.0 + 6.0 * thetae) * sth ** 2
    eps12 = wp2 * omega0 / (2.0 * jnp.pi * nu) ** 3 * jnp.cos(theta) \
        * jnp.where(rel, (bessel.besselk0(it) - gstep * _shgmfunc(xarg))
                    / bessel.besselk2(it), 1.0)
    rhov = 2.0 * jnp.pi * nu / pc.c * eps12
    rhoq = 2.0 * jnp.pi * nu / 2.0 / pc.c * eps11m22
    z = jnp.zeros_like(ji)
    return jnp.stack(jnp.broadcast_arrays(
        ji, jq, z, jv, ai, aq, z, av, rhoq, z, rhov), axis=-1)
