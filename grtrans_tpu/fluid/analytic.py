"""Analytic fluid models: THINDISK, POWERLAW, SARIAF, TOY.

Parity targets: fluid_model_thindisk.f90, fluid_model_powerlaw.f90,
fluid_model_sariaf.f90, fluid_model_toy.f90 + the corresponding
get_*_fluidvars / convert_fluidvars_* in fluid.f90.
"""

from dataclasses import dataclass

import jax.numpy as jnp

from grtrans_tpu import constants as pc
from grtrans_tpu.geometry import kerr
from grtrans_tpu.fluid import base
from grtrans_tpu.fluid.base import FluidVars, EmisInputs


def _u_from_3vel(g, vr, vth, omega):
    u0 = kerr.calc_u0(g, vr, vth, omega)
    return jnp.stack([u0, vr * u0, vth * u0, omega * u0], axis=-1)


@base.register("THINDISK")
@dataclass
class ThinDisk:
    """Novikov-Thorne thin disk: T(r) from the Page-Thorne flux via
    krolikc; Keplerian rotation outside the ISCO
    (fluid_model_thindisk.f90:51-86, fluid.f90:586-620)."""
    a: float = 0.998
    mbh: float = 10.0
    mdot: float = 0.1      # in Eddington units (Mdot * Mdot_edd, see ref)
    rin: float = 0.0
    rout: float = 1e5
    npow: int = 3

    def vals(self, x, k, a):
        r = x[..., 1]
        th = x[..., 2]
        rms = kerr.calc_rms(a)
        rin = jnp.maximum(rms, self.rin)
        b = 1.0 - 3.0 / r + 2.0 * a / r ** 1.5
        kc = kerr.krolikc(r, a)
        d = r * r - 2.0 * r + a * a
        lc = (rms * rms - 2.0 * a * jnp.sqrt(rms) + a * a) \
            / (rms ** 1.5 - 2.0 * jnp.sqrt(rms) + a)
        hc = (2.0 * r - a * lc) / d
        ar = (r * r + a * a) ** 2 - a * a * d * jnp.sin(th) ** 2
        om = 2.0 * a * r / ar
        lbh = pc.lbh(self.mbh)
        mdotedd = pc.ledd(self.mbh) / pc.c2
        T0 = (3.0 / 8.0 / jnp.pi * pc.G * self.mbh * pc.msun * self.mdot
              * mdotedd / lbh ** 3 / pc.sigb) ** 0.25
        omega = jnp.where(r > rms,
                          jnp.maximum(1.0 / (r ** 1.5 + a), om),
                          jnp.maximum((lc + a * hc)
                                      / (r * r + 2.0 * r * (1.0 + hc)), om))
        T = jnp.where((r > rin) & (r < self.rout),
                      T0 * jnp.maximum(kc / b / r ** 3, 0.0) ** 0.25,
                      T0 / 1e5)
        g = kerr.metric_cov(r, th, a)
        z = jnp.zeros_like(r)
        u = _u_from_3vel(g, z, z, omega)
        # polarization normal: disk-frame basis vector at psi=pi/2
        # (fluid.f90:612-613)
        bvec = kerr.calc_polvec(r, jnp.cos(th), k, a, jnp.pi / 2.0)
        return FluidVars(rho=T, p=z, bmag=z, u=u, b=bvec, rho2=z)

    def convert(self, fv, sp):
        """tcgs = T, ncgs = 1 (fluid.f90:1190-1196)."""
        one = jnp.ones_like(fv.rho)
        return EmisInputs(ncgs=one, tcgs=fv.rho, bcgs=one,
                          ncgsnth=jnp.zeros_like(fv.rho))


@base.register("POWERLAW")
@dataclass
class PowerLaw:
    """Pure power-law n, T, B with r/theta windows and toroidal field
    (fluid_model_powerlaw.f90, fluid.f90:1472-1557, :1597-1611)."""
    pnth: float = 0.0
    n0: float = 3e7
    t0: float = 6e10
    nnth0: float = 8e4
    beta: float = 10.0
    pn: float = 0.0
    pt: float = 0.0
    rin: float = 0.0
    rout: float = 1e8
    thin: float = -10.0
    thout: float = 10.0
    phiin: float = 0.0
    phiout: float = 1e4

    def vals(self, x, k, a):
        r = x[..., 1]
        th = x[..., 2]
        mu = jnp.cos(th)
        rs = r / 2.0
        neth = self.n0 * rs ** (-self.pn)
        nenth = self.nnth0 * rs ** (-self.pnth)
        te = self.t0 * rs ** (-self.pt)
        omega = self.phiin / r
        win = (r <= self.rout) & (r >= self.rin) & (mu >= self.thin) \
            & (mu <= self.thout)
        neth = jnp.where(win, neth, 0.0)
        nenth = jnp.where(win, nenth, 0.0)
        bmag = jnp.sqrt(8.0 * jnp.pi * neth * pc.mp * pc.c2
                        / 10.0 / 12.0 / self.beta)
        g = kerr.metric_cov(r, th, a)
        z = jnp.zeros_like(r)
        u = _u_from_3vel(g, z, z, omega)
        bvec = base.toroidal_b(g, u, bmag)
        return FluidVars(rho=neth, p=te, bmag=bmag, u=u, b=bvec, rho2=nenth)

    def convert(self, fv, sp):
        trat = base.monika_e(fv.rho, fv.rho, fv.bmag, 1.0 / sp.mu - 1.0,
                             sp.gmin * (1.0 / sp.mu - 1.0))
        return EmisInputs(ncgs=fv.rho, tcgs=fv.p / (1.0 + trat),
                          bcgs=fv.bmag, ncgsnth=fv.rho2)


@base.register("SARIAF")
@dataclass
class Sariaf:
    """Semi-analytic RIAF (Broderick+2009 / Broderick & Loeb 2006):
    power-law n, T with Gaussian vertical profile, equipartition-scaled B,
    Keplerian rotation outside ISCO, plunging inside
    (fluid_model_sariaf.f90:70-134, fluid.f90:1329-1421, :1560-1585)."""
    n0: float = 4e7
    t0: float = 1.6e11
    nnth0: float = 8e4
    pnth: float = 2.9
    beta: float = 10.0
    bl06: int = 0

    def vals(self, x, k, a):
        r = x[..., 1]
        th = x[..., 2]
        mu = jnp.cos(th)
        z = r * mu
        a2 = jnp.sqrt(jnp.maximum(r * r - z * z, 1e-37))
        rs = r / 2.0
        gauss = jnp.exp(-0.5 * (z / a2) ** 2)
        if self.bl06 != 1:
            neth = self.n0 * rs ** (-1.1) * gauss
            nenth = self.nnth0 * rs ** (-self.pnth) * gauss
            te = self.t0 * rs ** (-0.84)
        else:
            neth = self.n0 * a2 ** (-1.1) * gauss
            nenth = self.nnth0 * a2 ** (-self.pnth) * gauss
            te = self.t0 * r ** (-0.84)
        bmag = jnp.sqrt(8.0 * jnp.pi * neth * pc.mp * pc.c2
                        / rs / 12.0 / self.beta)
        omega = 1.0 / (r ** 1.5 + a)
        g = kerr.metric_cov(r, th, a)
        zz = jnp.zeros_like(r)
        u_out = _u_from_3vel(g, zz, zz, omega)
        u_in = kerr.rms_vel(a, th, r)
        rms = kerr.calc_rms(a)
        u = jnp.where((r < rms)[..., None], u_in, u_out)
        bvec = base.toroidal_b(g, u, bmag)
        return FluidVars(rho=neth, p=te, bmag=bmag, u=u, b=bvec, rho2=nenth)

    def convert(self, fv, sp):
        return EmisInputs(ncgs=fv.rho, tcgs=fv.p, bcgs=fv.bmag,
                          ncgsnth=fv.rho2)


@base.register("TOY")
@dataclass
class Toy:
    """Falling/rotating toy cloud (code-comparison paper eqs 1-2;
    fluid_model_toy.f90:37-55, fluid.f90:1423-1470)."""
    n0: float = 1.0
    h: float = 0.0
    l0: float = 1.0

    def vals(self, x, k, a):
        r = x[..., 1]
        th = x[..., 2]
        mu = jnp.cos(th)
        q = 0.5
        rcyl = r * jnp.sqrt(jnp.maximum(1.0 - mu * mu, 0.0))
        l = self.l0 / (1.0 + rcyl) * rcyl ** (1.0 + q)
        zc = self.h * mu
        dist = (r / 10.0) ** 2 + zc ** 2
        n = jnp.where(dist < 20.0, self.n0 * jnp.exp(-dist / 2.0), 0.0)
        gcon = kerr.metric_con(r, th, a)
        g = kerr.metric_cov(r, th, a)
        ubar = jnp.sqrt(-1.0 / (gcon[..., 0] + l * l * gcon[..., 9]
                                - 2.0 * l * gcon[..., 3]))
        ut = gcon[..., 3] * l * ubar + gcon[..., 0] * (-ubar)
        uph = gcon[..., 3] * (-ubar) + gcon[..., 9] * l * ubar
        z = jnp.zeros_like(r)
        u = jnp.stack([ut, z, z, uph], axis=-1)
        bmag = jnp.ones_like(r)
        bvec = base.toroidal_b(g, u, bmag)
        return FluidVars(rho=n, p=z, bmag=bmag, u=u, b=bvec, rho2=z)

    def convert(self, fv, sp):
        return EmisInputs(ncgs=fv.rho, tcgs=jnp.zeros_like(fv.rho),
                          bcgs=fv.bmag, ncgsnth=jnp.zeros_like(fv.rho))
