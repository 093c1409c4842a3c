"""Binned nonthermal electron synchrotron emissivity (SYNCHBIN).

Parity: reference polsynchemis.f90 synchbinemis (:1036-1160) — per-cell
electron populations tabulated in Lorentz-factor bins (KORAL's `relel`
nonthermal bins), summed with the Westfold F(x) and K_{5/3}(x) fitting
functions.  The reference loops pixels and sums bins serially; here the
bin axis broadcasts and the sum is one reduction, so the MXU/VPU sees a
single batched contraction over (npix, npts, nbin).
"""

import jax.numpy as jnp

from grtrans_tpu import constants as pc


def _fx(x):
    """Westfold F(x) fit (synchbinemis::fx, polsynchemis.f90:1106-1131)."""
    x = jnp.maximum(x, 1e-37)
    s = jnp.sqrt(x)
    cb = x ** (1.0 / 3.0)
    d1 = jnp.exp(-0.97947838884478688 * x - 0.83333239129525072 * s
                 + 0.15541796026816246 * cb)
    d2 = -jnp.expm1(-0.0469247165562628882 * x - 0.7005501805646288 * s
                    + 0.0103876297841949544 * cb)
    v = 2.149528241534479 * cb * d1 \
        + 1.2533141373155 * s * jnp.exp(-x) * d2
    return jnp.where(x >= 1000.0, 0.0, v)


def _k53x(x):
    """K_{5/3}(x) fit (synchbinemis::k53x, polsynchemis.f90:1133-1158)."""
    x = jnp.maximum(x, 1e-37)
    s = jnp.sqrt(x)
    cb = x ** (1.0 / 3.0)
    d1 = jnp.exp(-1.0194198041210243 * x + 0.28011396300530672 * s
                 - 0.0771058491739234908 * cb)
    d2 = -jnp.expm1(-15.761577796582387 * x)
    v = 1.433018827689652 * x ** (-5.0 / 3.0) * d1 \
        + 1.2533141373155 * jnp.exp(-x) / s * d2
    v = jnp.where(x <= 1e-6, 6.7e16, v)
    return jnp.where(x >= 1000.0, 0.0, v)


def synchbinemis(nu, nbins, b, theta, gammas, dgammas):
    """Binned synchrotron j_I/a_I (polsynchemis.f90:1036-1103).

    nu, b, theta: (...,); nbins: (..., nbin) electrons/cm^3 per bin;
    gammas/dgammas: (nbin,) bin centers/widths.
    Returns (..., 11) with only the I column/absorption populated."""
    sth = jnp.abs(jnp.sin(theta))
    babs = jnp.abs(b)
    prefj = jnp.sqrt(3.0) * pc.e ** 3 * babs * sth \
        / (4.0 * jnp.pi ** 2 * pc.m * pc.c2)
    prefa = jnp.where(babs > 0.0,
                      4.0 * jnp.pi * pc.e
                      / (3.0 * jnp.sqrt(3.0)
                         * jnp.maximum(babs * sth, 1e-37)), 0.0)
    nup = 3.0 * pc.e * babs * sth / (4.0 * jnp.pi * pc.m * pc.c)
    xm = nu[..., None] / jnp.maximum(nup[..., None] * gammas ** 2, 1e-37)
    jnu = prefj * jnp.sum(_fx(xm) * nbins * dgammas, axis=-1)
    anu = prefa * jnp.sum(_k53x(xm) * nbins * dgammas / gammas ** 5,
                          axis=-1)
    z = jnp.zeros_like(jnu)
    out = [jnu] + [z] * 3 + [anu] + [z] * 6
    return jnp.stack(out, axis=-1)
