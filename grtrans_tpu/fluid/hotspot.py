"""Time-dependent orbiting hotspot models: HOTSPOT (Broderick & Loeb
2006 covariant Gaussian spot) and SCHNITTMAN (Schnittman & Bertschinger
2004 cartesian Gaussian spot).

Parity: reference fluid_model_hotspot.f90 (:62-170 hotspot_vals incl.
toroidal/poloidal/vertical field options and plunging-interior fallback),
fluid_model_hotspot_schnittman.f90 (:58-93), the driver-side coordinate
shifts (fluid.f90:1261-1275: phi -> -pi/2 - phi, t -> -t), and
convert_fluidvars_hotspot/schnittman (fluid.f90:1174-1186).
"""

from dataclasses import dataclass

import jax.numpy as jnp

from grtrans_tpu.geometry import kerr, fourvector as fvec
from grtrans_tpu.fluid import base
from grtrans_tpu.fluid.base import FluidVars, EmisInputs


def _keplerian_interior_u(r, th, a, omega, g):
    """Keplerian/plunging-capped four-velocity used by both spots
    (fluid_model_hotspot.f90:121-135)."""
    rms = kerr.calc_rms(a)
    d = r * r - 2.0 * r + a * a
    lc = (rms * rms - 2.0 * a * jnp.sqrt(rms) + a * a) \
        / (rms ** 1.5 - 2.0 * jnp.sqrt(rms) + a)
    hc = (2.0 * r - a * lc) / d
    ar = (r * r + a * a) ** 2 - a * a * d * jnp.sin(th) ** 2
    om = 2.0 * a * r / ar
    omt = jnp.where(r > rms,
                    jnp.maximum(1.0 / (r ** 1.5 + a), om),
                    jnp.maximum((lc + a * hc)
                                / (r * r + 2.0 * r * (1.0 + hc)), om))
    den_spot = g[..., 0] + 2.0 * g[..., 3] * omega + g[..., 9] * omega ** 2
    ok = den_spot < 0.0
    ut_spot = jnp.where(ok, jnp.sqrt(-1.0 / jnp.where(ok, den_spot, -1.0)),
                        1.0)
    ut_kep = kerr.calc_u0(g, jnp.zeros_like(r), jnp.zeros_like(r), omt)
    ut = jnp.where(ok, ut_spot, ut_kep)
    uph = jnp.where(ok, omega * ut_spot, omt * ut_kep)
    z = jnp.zeros_like(r)
    return jnp.stack([ut, z, z, uph], axis=-1)


def _toroidal_spot_b(g, u, bmag):
    """BL06 toroidal field (fluid_model_hotspot.f90:141-149)."""
    gtt, gtp, gpp = g[..., 0], g[..., 3], g[..., 9]
    ut, uph = u[..., 0], u[..., 3]
    gfac = 1.0 / jnp.sqrt(jnp.maximum(
        (gpp * gtt - gtp * gtp)
        * (gpp * uph * uph + ut * (2.0 * gtp * uph + gtt * ut)), 1e-37))
    b0 = bmag * gfac * jnp.abs(gpp * uph + gtp * ut)
    b3 = -bmag * jnp.sign(gpp * uph + gtp * ut) * (ut * gtt + gtp * uph) \
        * gfac
    z = jnp.zeros_like(b0)
    return jnp.stack([b0, z, z, b3], axis=-1)


@base.register("HOTSPOT")
@dataclass
class HotSpot:
    rspot: float = 1.5
    r0spot: float = 6.0
    n0spot: float = 1e4
    bl06: int = 1        # field: |1| toroidal, 0 poloidal, |2| vertical
    tspot: float = 0.0   # advanced between frames (advance_timestep)

    timedep = True

    def advance(self, dt):
        self.tspot = self.tspot - dt
        return self

    def vals(self, x, k, a, time=0.0):
        # driver-side shifts (fluid.f90:1268-1269); `time` is the frame
        # time (traced), advancing tspot like advance_hotspot_timestep
        tspot = self.tspot - time
        # driver-side shifts (fluid.f90:1268-1269)
        t = -x[..., 0]
        r = x[..., 1]
        th = x[..., 2]
        phi = -jnp.arccos(0.0) - x[..., 3]
        g = kerr.metric_cov(r, th, a)
        omega = 1.0 / (self.r0spot ** 1.5 + a)
        # rotate to spot frame at phi=0 (fluid_model_hotspot.f90:95-98)
        dphi = phi - (tspot + t) * omega
        dphi = jnp.arctan2(jnp.sin(dphi), jnp.cos(dphi))
        # covariant distance to the spot center (BL06): spatial separation
        # + time dilation term measured with the spot four-velocity
        xs_r, xs_th = self.r0spot, jnp.arccos(0.0)
        gs = kerr.metric_cov(jnp.asarray(xs_r), xs_th, a)
        den_s = gs[..., 0] + 2.0 * gs[..., 3] * omega + gs[..., 9] * omega ** 2
        us_t = jnp.sqrt(-1.0 / den_s)
        uspot = jnp.stack([us_t, 0.0 * us_t, 0.0 * us_t, omega * us_t],
                          axis=-1)
        z = jnp.zeros_like(r)
        dx = jnp.stack([z, xs_r - r, xs_th - th, 0.0 - dphi], axis=-1)
        dnorm = fvec.dot(gs, dx, dx) + fvec.dot(gs, dx, uspot) ** 2
        # double-where on the far cut: invalid trace samples sit at
        # r ~ 1e6, so dnorm ~ 1e13 underflows exp to EXACTLY 0 and
        # sqrt'(0) = inf — the plain where masks the forward but its
        # VJP multiplies 0-cotangent x inf-partial = NaN, poisoning
        # every parameter gradient (r5: HOTSPOT inverse rendering froze
        # with all-NaN grads).  Sanitized arg keeps both exp and sqrt
        # on smooth inputs in the discarded branch.
        arg = dnorm / 2.0 / self.rspot ** 2
        far = arg >= 8.0
        arg_s = jnp.where(far, 0.0, arg)
        n = jnp.where(far, 0.0, self.n0spot * jnp.exp(-arg_s))
        u = _keplerian_interior_u(r, th, a, omega, g)
        n_b = jnp.where(far, self.n0spot, n)   # positive sqrt input
        bmag = jnp.sqrt(0.1 * 8.0 * jnp.pi * n_b * 100.0 * 1.67e-24 / 2.0
                        * 9e20 / r)
        bmag = jnp.where(far, 1.0, bmag)
        if abs(self.bl06) == 1:
            b = _toroidal_spot_b(g, u, bmag)
        elif self.bl06 == 0:
            b = jnp.stack([z, z, bmag / jnp.sqrt(g[..., 7]), z], axis=-1)
        elif abs(self.bl06) == 2:
            b = jnp.stack([z,
                           -bmag / jnp.sqrt(g[..., 4]) * jnp.cos(th),
                           bmag / jnp.sqrt(g[..., 7]) * jnp.sin(th),
                           z], axis=-1)
        else:
            b = kerr.calc_polvec(r, jnp.cos(th), k, a, jnp.pi / 2.0)
        bm = kerr.safe_sqrt(fvec.dot(g, b, b))
        return FluidVars(rho=n, p=z, bmag=bm, u=u, b=b, rho2=n)

    def convert(self, fv, sp):
        """ncgs = n, bcgs = bmag, ncgsnth = n (fluid.f90:1174-1180)."""
        return EmisInputs(ncgs=fv.rho, tcgs=jnp.zeros_like(fv.rho),
                          bcgs=fv.bmag, ncgsnth=fv.rho)


@base.register("SCHNITTMAN")
@dataclass
class SchnittmanHotspot:
    rspot: float = 1.5
    r0spot: float = 6.0
    n0spot: float = 1e4
    tspot: float = 0.0

    timedep = True

    def advance(self, dt):
        self.tspot = self.tspot + dt
        return self

    def vals(self, x, k, a, time=0.0):
        tspot = self.tspot + time
        t = -x[..., 0]
        r = x[..., 1]
        th = x[..., 2]
        phi = -jnp.arccos(0.0) - x[..., 3]
        omega = 1.0 / (self.r0spot ** 1.5 + a)
        xs = r * jnp.sin(th) * jnp.cos(phi)
        ys = r * jnp.sin(th) * jnp.sin(phi)
        zs = r * jnp.cos(th)
        phispot = omega * (t + tspot)
        d2 = (xs - self.r0spot * jnp.cos(phispot)) ** 2 \
            + (ys - self.r0spot * jnp.sin(phispot)) ** 2 + zs ** 2
        n = jnp.where(d2 < 16.0 * self.rspot ** 2,
                      jnp.exp(-d2 / 2.0 / self.rspot ** 2), 0.0)
        g = kerr.metric_cov(r, th, a)
        u = _keplerian_interior_u(r, th, a, omega, g)
        b = _toroidal_spot_b(g, u, jnp.ones_like(r))
        bm = kerr.safe_sqrt(fvec.dot(g, b, b))
        z = jnp.zeros_like(r)
        return FluidVars(rho=n, p=z, bmag=bm, u=u, b=b, rho2=n)

    def convert(self, fv, sp):
        """ncgs = n, bcgs = 1 (fluid.f90:1182-1186)."""
        return EmisInputs(ncgs=fv.rho, tcgs=jnp.zeros_like(fv.rho),
                          bcgs=jnp.ones_like(fv.rho), ncgsnth=fv.rho)
