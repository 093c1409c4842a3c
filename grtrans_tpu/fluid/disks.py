"""PHATDISK and NUMDISK: inhomogeneous / numerical thin-disk surfaces.

Parity:
 * PHATDISK (fluid_model_phatdisk.f90): Dexter & Agol 2011 disk with
   log-normal temperature fluctuations — a tabulated F_nu(r, nu) built
   at load time from the thin-disk T(r) convolved with the log-normal
   weight (:85-125), sampled along rays with the INTERP emissivity.
 * NUMDISK (fluid_model_numdisk.f90): T_eff(r, phi) image from a
   Fortran-unformatted binary file (:190-212 reader; bilinear log-r x
   phi sampling :45-140; tscl/rscl scalings).
Both use the thin-disk Keplerian flow and the disk-surface polarization
basis (fluid.f90:622-652).
"""

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax.numpy as jnp

from grtrans_tpu import constants as pc
from grtrans_tpu.geometry import kerr
from grtrans_tpu.ops.interp import get_weight, tsum
from grtrans_tpu.fluid import base
from grtrans_tpu.fluid.base import FluidVars, EmisInputs
from grtrans_tpu.fluid.analytic import ThinDisk, _u_from_3vel


@base.register("PHATDISK")
@dataclass
class PhatDisk:
    a: float = 0.998
    mbh: float = 10.0
    mdot: float = 0.1
    rin: float = 0.0
    rout: float = 1e4
    nw: int = 500
    wmin: float = 1e-4
    wmax: float = 1e4
    nfreq_tab: int = 100
    fmin: float = 1e17 / 3.0
    fmax: float = 3e19 * 3.0
    nr: int = 500
    sigt: float = 0.4
    fcol: float = 1.7

    def __post_init__(self):
        # frequency/weight/radius grids (read_phatdisk_inputs :36-49)
        if self.nfreq_tab == 1:
            freq = np.array([self.fmin])
        else:
            freq = self.fmin * np.exp(
                np.arange(self.nfreq_tab) * np.log(self.fmax / self.fmin)
                / (self.nfreq_tab - 1))
        w = self.wmin * np.exp(np.arange(self.nw)
                               * np.log(self.wmax / self.wmin)
                               / max(self.nw - 1, 1))
        rh = 1.0 + np.sqrt(1.0 - self.a ** 2)
        r_tab = rh * np.exp(np.arange(1, self.nr + 1) / (self.nr - 1.0)
                            * np.log(self.rout / rh))
        td = ThinDisk(a=self.a, mbh=self.mbh, mdot=self.mdot)
        x4 = np.zeros((self.nr, 4))
        x4[:, 1] = r_tab
        x4[:, 2] = np.pi / 2
        kdum = np.zeros((self.nr, 4))
        kdum[:, 0] = 1.0
        fv = td.vals(jnp.asarray(x4), jnp.asarray(kdum), self.a)
        T = np.asarray(fv.rho)
        om = np.asarray(fv.u[:, 3] / fv.u[:, 0])
        # log-normal flux table (init_phatdisk :100-122)
        l10 = np.log(10.0) * self.sigt
        x = np.log(w)
        fw = np.exp(-(x + l10 ** 2) ** 2 / l10 ** 2) / l10 / np.sqrt(np.pi)
        fnu = np.empty((self.nr, self.nfreq_tab))
        for k_i, nu in enumerate(freq):
            z = pc.h * nu / pc.k / T / self.fcol
            zi = z[:, None] / w[None, :]
            den = np.where(zi > 1e-4, np.expm1(np.minimum(zi, 700.0)), zi)
            igrand = np.where(fw[None, :] > 0, fw[None, :] / den, 0.0)
            integ = np.trapezoid(igrand, x, axis=1)
            fnu[:, k_i] = self.fcol ** (-4.0) * 2.0 * np.pi * z ** 3 \
                * (pc.k * self.fcol * T) ** 3 / pc.h / pc.h / pc.c2 * integ
        self.freq_tab = jnp.asarray(freq)
        self.r_tab = jnp.asarray(r_tab)
        self.om_tab = jnp.asarray(om)
        self.fnu_tab = jnp.asarray(fnu)

    def vals(self, x, k, a):
        r = x[..., 1]
        th = x[..., 2]
        ix, wgt = get_weight(self.r_tab, r)
        om = self.om_tab[ix] * (1 - wgt) + self.om_tab[ix + 1] * wgt
        fnu = (self.fnu_tab[ix] * (1 - wgt)[..., None]
               + self.fnu_tab[ix + 1] * wgt[..., None])
        g = kerr.metric_cov(r, th, a)
        z = jnp.zeros_like(r)
        u = _u_from_3vel(g, z, z, om)
        bvec = kerr.calc_polvec(r, jnp.cos(th), k, a, jnp.pi / 2.0)
        return FluidVars(rho=z, p=z, bmag=z, u=u, b=bvec, rho2=z, fnu=fnu)

    def convert(self, fv, sp):
        return EmisInputs(ncgs=jnp.ones_like(fv.rho), tcgs=fv.rho,
                          bcgs=jnp.ones_like(fv.rho),
                          ncgsnth=jnp.zeros_like(fv.rho),
                          fnu=fv.fnu, freq_tab=self.freq_tab)


@base.register("NUMDISK")
@dataclass
class NumDisk:
    dfile: str = "phatdiskm8st25.bin"
    tscl: float = 1.0
    rscl: float = 1.0
    table: Optional[dict] = None

    def __post_init__(self):
        if self.table is None:
            from grtrans_tpu.fluid.ffjet import _read_fortran_records
            recs = _read_fortran_records(self.dfile)
            nr = int(np.frombuffer(recs[0], np.int32)[0])
            nphi = int(np.frombuffer(recs[1], np.int32)[0])
            arr = np.frombuffer(recs[2], np.float32)
            n = nr * nphi
            rc, phc, T = arr[:n], arr[n:2 * n], arr[2 * n:3 * n]
            self.table = dict(nr=nr, nphi=nphi,
                              r=rc.astype(np.float64) * self.rscl,
                              phi=phc.astype(np.float64),
                              T=T.astype(np.float64) * self.tscl)
        t = self.table
        self.nr_, self.nphi_ = t["nr"], t["nphi"]
        # r fastest-changing (fluid_model_numdisk.f90:71-77)
        self.uniqr = jnp.asarray(t["r"][:self.nr_])
        self.uniqp = jnp.asarray(t["phi"][::self.nr_][:self.nphi_])
        self.T2d = jnp.asarray(t["T"].reshape(self.nphi_, self.nr_))

    def vals(self, x, k, a):
        r = x[..., 1]
        th = x[..., 2]
        phi = jnp.mod(x[..., 3] + 12.0 * jnp.pi, 2.0 * jnp.pi)
        lnr = jnp.log(r)
        u1 = jnp.log(self.uniqr)
        nx1, nx2 = self.nr_, self.nphi_
        lx1 = jnp.clip(((lnr - u1[0]) / (u1[-1] - u1[0])
                        * (nx1 - 1)).astype(jnp.int32), 0, nx1 - 2)
        dph = self.uniqp[1] - self.uniqp[0]
        lx2 = jnp.clip(((phi - self.uniqp[0]) / dph).astype(jnp.int32), 0, nx2 - 2)
        rd = jnp.clip((r - self.uniqr[lx1])
                      / (self.uniqr[lx1 + 1] - self.uniqr[lx1]), 0.0, 1.0)
        pd = jnp.clip((phi - self.uniqp[lx2]) / dph, 0.0, 1.0)
        T = (self.T2d[lx2, lx1] * (1 - rd) * (1 - pd)
             + self.T2d[lx2, lx1 + 1] * rd * (1 - pd)
             + self.T2d[lx2 + 1, lx1] * (1 - rd) * pd
             + self.T2d[lx2 + 1, lx1 + 1] * rd * pd)
        inside = (r >= self.uniqr[0]) & (r <= self.uniqr[-1])
        T = jnp.where(inside, T, 0.0)
        om = 1.0 / (r ** 1.5 + a)
        g = kerr.metric_cov(r, th, a)
        z = jnp.zeros_like(r)
        u = _u_from_3vel(g, z, z, om)
        bvec = kerr.calc_polvec(r, jnp.cos(th), k, a, 0.0)
        return FluidVars(rho=T, p=z, bmag=z, u=u, b=bvec, rho2=z)

    def convert(self, fv, sp):
        """tcgs = T, ncgs = 1 (convert_fluidvars_numdisk)."""
        return EmisInputs(ncgs=jnp.ones_like(fv.rho), tcgs=fv.rho,
                          bcgs=jnp.ones_like(fv.rho),
                          ncgsnth=jnp.zeros_like(fv.rho))
