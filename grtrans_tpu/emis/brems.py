"""Thermal bremsstrahlung (free-free) emissivities.

Parity: reference emis.f90 brememisHEROIC (:188-243) and brememisGRay
(:244-293)."""

import jax.numpy as jnp

from grtrans_tpu import constants as pc
from grtrans_tpu.emis.polsynch import bnu, NE


def brememis_heroic(nu, ne, T):
    """HEROIC-style e-i + e-e free-free absorption -> Kirchhoff emission.
    emis.f90:188-243."""
    eps = 1e-32
    temp = T
    rho = ne * 1.67219e-24
    sqrtt = jnp.sqrt(temp)
    thetae = pc.k * temp / (pc.m * pc.c2)
    sqth = jnp.sqrt(thetae)
    tempfactor = 1.0 / (sqrtt + (1e5 / temp) ** 10) + eps
    arg = pc.h * nu / (pc.k * temp)
    fei = jnp.where(thetae < 1.0,
                    1.016 * sqth * (1.0 + 1.781 * thetae ** 1.34),
                    1.432 * thetae * (jnp.log(1.123 * thetae + 0.48) + 1.5))
    fee = jnp.where(thetae < 1.0,
                    thetae * sqth * (1.0 + 1.1 * thetae
                                     + thetae * thetae * (1.0 - 1.25 * sqth)),
                    1.328 * thetae * (jnp.log(1.123 * thetae) + 1.28))
    one_m_e = jnp.where(arg < 1e-8, arg, -jnp.expm1(-jnp.minimum(arg, 100.0)))
    anu = (1.10e61 / sqrtt) * rho * rho * fei * one_m_e * tempfactor / nu ** 3 \
        + (1.14e51 / sqrtt / temp) * rho * rho * fee * one_m_e \
        * tempfactor / nu ** 2
    anu = jnp.where(arg > 100.0, 0.0, anu)
    jnu = anu * bnu(temp, nu)
    out = jnp.zeros(jnp.shape(jnu) + (NE,))
    return out.at[..., 0].set(jnu).at[..., 4].set(anu)


def brememis_gray(nu, ne, T):
    """GRay-formula free-free with piecewise Gaunt factor.
    emis.f90:244-293."""
    eps = 1e-32
    temin = 100.0
    Ry = 2.178741e-11
    x = pc.k * (T + temin) / Ry
    y = pc.h * nu / (pc.k * (T + temin))
    sx = jnp.sqrt(x)
    sy = jnp.sqrt(y)
    con1 = jnp.sqrt(3.0 / jnp.pi)
    con2 = jnp.log(4.0 / 1.7810724179)
    con4 = jnp.log(4.0 / (1.78109724179 ** 2.5))
    g_xy1 = jnp.where(y > 1.0, con1 / sy, con1 * (con2 - jnp.log(y + eps)))
    gaunt = jnp.where(
        x > 1.0, g_xy1,
        jnp.where(x * y > 1.0, con2 / (sx * sy),
                  jnp.where(y > sx, 1.0,
                            con1 * (con4 + jnp.log(sx / (y + eps))))))
    gaunt = jnp.maximum(gaunt, eps)
    jnu = 6.38e-38 * ne * ne * gaunt \
        / (jnp.sqrt(T + temin) * jnp.exp(jnp.minimum(y, 500.0)) + eps) \
        / (4.0 * jnp.pi)
    anu = jnp.where(jnp.abs(jnu) > 0.0, jnu / bnu(T, nu), 0.0)
    out = jnp.zeros(jnp.shape(jnu) + (NE,))
    return out.at[..., 0].set(jnu).at[..., 4].set(anu)
