"""Blackbody-type emissivities (thin-disk surface emission).

Parity: reference emis.f90 bbemis/fbbemis/fbbpolemis (:153-187) and
rhoemis (:144-151)."""

import jax.numpy as jnp

from grtrans_tpu.emis.polsynch import bnu, NE
from grtrans_tpu.emis.chandra import interp_chandra


def bbemis(nu, T):
    """Pure Planck surface brightness (emis.f90:162-168)."""
    out = jnp.zeros(jnp.broadcast_shapes(jnp.shape(nu), jnp.shape(T)) + (NE,))
    return out.at[..., 0].set(bnu(T, nu))


def fbbemis(nu, T, f):
    """Color-corrected blackbody: f^-4 B_nu(f T) (emis.f90:153-160)."""
    out = jnp.zeros(jnp.broadcast_shapes(jnp.shape(nu), jnp.shape(T)) + (NE,))
    return out.at[..., 0].set(f ** (-4.0) * bnu(T * f, nu))


def fbbpolemis(nu, T, f, cosne):
    """Color-corrected BB with Chandrasekhar electron-scattering limb
    darkening + polarization (emis.f90:170-185; note the reference
    hard-codes f=1.8 inside)."""
    f = 1.8
    I0 = f ** (-4.0) * bnu(T * f, nu)
    chi, chd = interp_chandra(cosne)
    shape = jnp.broadcast_shapes(jnp.shape(I0), jnp.shape(chi))
    out = jnp.zeros(shape + (NE,))
    out = out.at[..., 0].set(I0 * chi)
    out = out.at[..., 1].set(I0 * chi * chd)
    return out


def rhoemis(rho, rshift):
    """Emissivity proportional to density (test/'RHO' type, emis.f90:144)."""
    out = jnp.zeros(jnp.shape(rho) + (NE,))
    return out.at[..., 0].set(rho * rshift)
