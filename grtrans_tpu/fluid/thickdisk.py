"""THICKDISK: McKinney 'thickdisk' fieldline-file GRMHD model
(Jon McKinney's jetcoords6 / defcoord=1401 simulations).

Parity: reference fluid_model_thickdisk.f90 + fluid.f90
convert_fluidvars_thickdisk (:925-940).

 * Fieldline dumps are binary: one ASCII header line (30 numbers:
   tcur, nx1, nx2, nx3, startx1-3, dx1-3, _, gam, asim, r0, rin, rout,
   h, dt, defcoord, mbh, qbh, ..., dlen last;
   read_thickdisk_data_header :579-627) followed by float32 data of
   dlen values per zone, x1 fastest (read_thickdisk_fieldline_file
   :815-975): 1-based cols rho@1, internal energy@2, u^t@5,
   transport velocity v^i = u^i/u^t @6-8, B^i(MKS)@9-11.
 * Coordinates: r = exp(x1 + (x1-xbr)^10 for x1 > xbr) with
   xbr = ln 500 (rout > 1e3) or ln 1e5 (calcrmks :79-93, xbr rule
   :840-844); theta(x2, r) is the hard-coded jetcoords6 blend
   calcthmks6 (:143-175); phi = 2 pi x3 (umks2uks :130).
 * MKS -> KS four-vector transform uses numerical central-difference
   dtheta/dr and dtheta/dx2 and exact dr/dx1 (umks2uks :110-141), then
   KS -> BL; b^t is recovered from b.u in KS (:930-940).
 * 'jonfix' floor repair (:950-967): where b^2/rho exceeds a radius-
   interpolated threshold, rho = p = 1e-18.
 * Sampling (thickdisk_vals :344-569): trilinear with theta fraction
   measured in physical theta at the sample's own radius, periodic
   phi, nearest-neighbor in r inside the innermost zone.
 * Unit conversion: scale_sim_units with mdot_code = 0.0013,
   Moscibrodzka R(beta) with rlow = 1/mu - 1, rhigh = gmin (1/mu - 1),
   T_e = T/(1+trat), plus nonthermale_b2 (no sigma cut in the
   reference's thickdisk path).
"""

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax.numpy as jnp

from grtrans_tpu.geometry import kerr, fourvector as fv
from grtrans_tpu.geometry.kerr import safe_sqrt
from grtrans_tpu.fluid import base
from grtrans_tpu.fluid.base import FluidVars, EmisInputs


def calcrmks(x1, xbr, npow2=10.0):
    """x1 -> r (calcrmks :79-93; no R0 offset, npow2 = 10)."""
    xi = jnp.where(x1 > xbr,
                   x1 + jnp.maximum(x1 - xbr, 0.0) ** npow2, x1)
    return jnp.exp(xi)


def x1_of_r(r, xbr, lo=-2.0, hi=12.0, iters=60):
    lo = jnp.full(jnp.shape(r), lo)
    hi = jnp.full(jnp.shape(r), hi)
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        big = calcrmks(mid, xbr) > r
        hi = jnp.where(big, mid, hi)
        lo = jnp.where(big, lo, mid)
    return 0.5 * (lo + hi)


def calcthmks6(x2, r):
    """jetcoords6 theta(x2 in [0,1], r) (calcthmks6 :143-175;
    hard-coded parameters from Jon's defcoord=1401)."""
    pi = jnp.pi
    r1jet, r0jet, rsjet, qjet = 2.8, 15.0, 40.0, 1.3
    rs, r0 = 40.0, 20.0
    r0jet3, rsjet3, h0 = 20.0, 0.0, 0.3
    njet = 1.0
    ntheta, htheta = 5.0, 0.15
    rsjet2, r0jet2 = 5.0, 2.0
    myh1 = h0 + ((r - rsjet3) / r0jet3) ** njet
    th2 = 0.5 * pi * (1.0 + jnp.arctan(myh1 * (x2 - 0.5))
                      / jnp.arctan(myh1 * 0.5))
    myh2 = 2.0 - qjet * (r / r1jet) ** (
        -njet * (0.5 + 1.0 / pi * jnp.arctan(r / r0jet - rsjet / r0jet)))
    th0 = pi * x2 + 0.5 * (1.0 - myh2) * jnp.sin(2.0 * pi * x2)
    switch0 = 0.5 + 1.0 / pi * jnp.arctan((r - rs) / r0)
    switch2 = 0.5 - 1.0 / pi * jnp.arctan((r - rs) / r0)
    theta1 = th0 * switch2 + th2 * switch0
    theta2 = pi * 0.5 * (htheta * (2 * x2 - 1)
                         + (1 - htheta) * (2 * x2 - 1) ** ntheta + 1.0)
    arctan2 = 0.5 + 1.0 / pi * jnp.arctan((r - rsjet2) / r0jet2)
    return theta2 + arctan2 * (theta1 - theta2)


def x2_of_th(th, r, thfunc=calcthmks6, iters=60):
    """Invert theta(x2, r) by bisection on x2 in [0, 1]
    (transformbl2mks :329-342 via zbrent)."""
    lo = jnp.zeros(jnp.shape(th))
    hi = jnp.ones(jnp.shape(th))
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        big = thfunc(mid, r) > th
        hi = jnp.where(big, mid, hi)
        lo = jnp.where(big, lo, mid)
    return 0.5 * (lo + hi)


def umks2ubl(um, x1, x2, xbr, asim, thfunc=calcthmks6):
    """MKS -> KS (numerical theta derivatives, umks2uks :110-141)
    -> BL; phi scales by 2 pi."""
    r = calcrmks(x1, xbr)
    dx1 = 1e-4 * jnp.maximum(jnp.abs(x1), 1e-2)
    dx2 = 1e-6 * jnp.maximum(jnp.abs(x2), 1e-2)
    dr = 1e-4 * r
    drdx1 = (calcrmks(x1 + 0.5 * dx1, xbr)
             - calcrmks(x1 - 0.5 * dx1, xbr)) / dx1
    dthdr = (thfunc(x2, r + 0.5 * dr) - thfunc(x2, r - 0.5 * dr)) / dr
    dthdx2 = (thfunc(x2 + 0.5 * dx2, r)
              - thfunc(x2 - 0.5 * dx2, r)) / dx2
    ur = drdx1 * um[..., 1]
    uks = jnp.stack([um[..., 0], ur,
                     um[..., 2] * dthdx2 + ur * dthdr,
                     um[..., 3] * 2.0 * jnp.pi], axis=-1)
    return kerr.uks2ubl(uks, r, asim)


def read_thickdisk_fieldline(dfile, hfile=None):
    """Binary fieldline dump -> dict (read_thickdisk_fieldline_file
    :815-975 binary branch)."""
    with open(dfile, "rb") as f:
        raw = f.read()
    nl = raw.index(b"\n")
    hdr_line = open(hfile).readline() if hfile else raw[:nl].decode()
    hv = [float(v) for v in hdr_line.split()]
    h = dict(tcur=hv[0], nx1=int(hv[1]), nx2=int(hv[2]), nx3=int(hv[3]),
             startx1=hv[4], startx2=hv[5], startx3=hv[6], dx1=hv[7],
             dx2=hv[8], dx3=hv[9], gam=hv[11], asim=hv[12], r0=hv[13],
             rin=hv[14], rout=hv[15], h=hv[16], dt=hv[17],
             defcoord=hv[18], dlen=int(hv[-1]))
    n = h["nx1"] * h["nx2"] * h["nx3"]
    dlen = h["dlen"]
    data = np.frombuffer(raw[nl + 1:nl + 1 + 4 * dlen * n],
                         np.float32).reshape(n, dlen).astype(np.float64)
    # 1-based rhopos=1, ppos=2, vpos=5, bpos=9 -> 0-based below
    u0 = data[:, 4]
    u_mks = np.stack([u0, data[:, 5] * u0, data[:, 6] * u0,
                      data[:, 7] * u0], axis=-1)
    b_mks = np.stack([np.zeros(n), data[:, 8], data[:, 9],
                      data[:, 10]], axis=-1)
    return dict(h=h, rho=data[:, 0], uint=data[:, 1], u=u_mks, b=b_mks)


@base.register("THICKDISK")
@dataclass
class ThickDisk:
    dfile: str = ""
    hfile: Optional[str] = None
    nt: int = 1
    jonfix: int = 1
    dump: Optional[dict] = None
    mdot_code: float = 0.0013

    thfunc = staticmethod(calcthmks6)

    def __post_init__(self):
        d = self.dump if self.dump is not None else \
            read_thickdisk_fieldline(self.dfile, self.hfile)
        h = d["h"]
        self.hdr = h
        self.asim = float(h["asim"])
        self.gam = float(h["gam"])
        self.nx1 = nx1 = int(h["nx1"])
        self.nx2 = nx2 = int(h["nx2"])
        self.nx3 = nx3 = int(h["nx3"])
        self.xbr = float(np.log(500.0) if h["rout"] > 1e3
                         else np.log(1e5))
        # cell-centered uniform MKS grids (x1 fastest in the flat
        # arrays, thickdisk_vals :384-390)
        self.uniqx1 = jnp.asarray(h["startx1"]
                                  + h["dx1"] * (0.5 + np.arange(nx1)))
        self.uniqx2 = jnp.asarray(h["startx2"]
                                  + h["dx2"] * (0.5 + np.arange(nx2)))
        self.uniqx3 = jnp.asarray(h["startx3"]
                                  + h["dx3"] * (0.5 + np.arange(nx3)))
        self.uniqr = calcrmks(self.uniqx1, self.xbr)
        X2, X1 = np.meshgrid(np.asarray(self.uniqx2),
                             np.asarray(self.uniqx1), indexing="ij")
        x1f = jnp.asarray(np.tile(X1.ravel(), nx3))
        x2f = jnp.asarray(np.tile(X2.ravel(), nx3))
        r_flat = calcrmks(x1f, self.xbr)
        th_flat = self.thfunc(x2f, r_flat)
        rho = jnp.asarray(d["rho"])
        p = jnp.asarray(d["uint"]) * (self.gam - 1.0)
        u_bl = umks2ubl(jnp.asarray(d["u"]), x1f, x2f, self.xbr,
                        self.asim, self.thfunc)
        # b^t from b.u in BL, then the standard recovery (reference
        # does this in KS, :930-940; the contraction is frame-invariant)
        g_cov = kerr.metric_cov(r_flat, th_flat, self.asim)
        b3 = jnp.asarray(d["b"])
        bks_sp = umks2ubl(b3, x1f, x2f, self.xbr, self.asim, self.thfunc)
        b0 = fv.dot(g_cov, bks_sp, u_bl)
        b_bl = jnp.stack(
            [b0,
             (bks_sp[..., 1] + b0 * u_bl[..., 1]) / u_bl[..., 0],
             (bks_sp[..., 2] + b0 * u_bl[..., 2]) / u_bl[..., 0],
             (bks_sp[..., 3] + b0 * u_bl[..., 3]) / u_bl[..., 0]],
            axis=-1)
        if self.jonfix == 1:
            bsq = fv.dot(g_cov, b_bl, b_bl)
            rinterp = jnp.clip((r_flat - 9.0) / (0.0 - 9.0), 0.0, 1.0)
            cond = rinterp * 30.0 + (1 - rinterp) * 10.0
            bad = (bsq / jnp.maximum(rho, 1e-37) > 30.0) \
                | (bsq / jnp.maximum(rho, 1e-37) >= cond)
            rho = jnp.where(bad, 1e-18, rho)
            p = jnp.where(bad, 1e-18, p)
        vr = u_bl[..., 1] / u_bl[..., 0]
        vth = u_bl[..., 2] / u_bl[..., 0]
        om = u_bl[..., 3] / u_bl[..., 0]
        vrl, vtl, vpl = kerr.lnrf_frame(vr, vth, om, r_flat, self.asim,
                                        th_flat)
        shape = (nx3, nx2, nx1)      # x1 fastest
        self.f = {k: v.reshape(shape) for k, v in dict(
            rho=rho, p=p, u0=u_bl[..., 0], vrl=vrl, vtl=vtl, vpl=vpl,
            b0=b_bl[..., 0], br=b_bl[..., 1], bth=b_bl[..., 2],
            bph=b_bl[..., 3]).items()}
        self._build_pair_stack()

    def _build_pair_stack(self):
        """phi-PAIR-packed field stack over the (nx3, nx2, nx1) grids:
        one trilinear sample = 4 corner gathers of 2*nf contiguous
        floats (phi wrap baked in).  Shared with MB09 (same layout)."""
        self.TFIELDS = ("rho", "p", "u0", "vrl", "vtl", "vpl",
                        "b0", "br", "bth", "bph")
        st = jnp.stack([jnp.asarray(self.f[k]) for k in self.TFIELDS],
                       axis=-1)
        stp = jnp.concatenate([st, jnp.roll(st, -1, axis=0)], axis=-1)
        self.fpair = stp.reshape(-1, 2 * len(self.TFIELDS))

    def vals(self, x, k, a):
        nx1, nx2, nx3 = self.nx1, self.nx2, self.nx3
        r = x[..., 1]
        th = x[..., 2]
        zphi = jnp.mod(kerr.bl2ks_phi(r, x[..., 3], a), 2.0 * jnp.pi)
        zphi = jnp.where(zphi < 0.0, zphi + 2.0 * jnp.pi, zphi)
        x1 = x1_of_r(r, self.xbr)
        x2 = x2_of_th(th, r, self.thfunc)
        u1a, u1b = self.uniqx1[0], self.uniqx1[-1]
        u2a, u2b = self.uniqx2[0], self.uniqx2[-1]
        u3a = self.uniqx3[0]
        lx1 = jnp.clip(jnp.floor((x1 - u1a) / (u1b - u1a) * (nx1 - 1))
                       .astype(jnp.int32), 0, nx1 - 2)
        lx2 = jnp.clip(jnp.floor((x2 - u2a) / (u2b - u2a) * (nx2 - 1))
                       .astype(jnp.int32), 0, nx2 - 2)
        dph = 2.0 * jnp.pi * (self.uniqx3[1] - self.uniqx3[0]) \
            if nx3 > 1 else jnp.asarray(2.0 * jnp.pi)
        ph0 = 2.0 * jnp.pi * u3a
        lx3raw = jnp.floor((zphi - ph0) / dph).astype(jnp.int32)
        lx3 = jnp.mod(lx3raw, nx3)
        ux3 = jnp.mod(lx3raw + 1, nx3)
        pd = jnp.clip((zphi - (ph0 + lx3raw * dph)) / dph, 0.0, 1.0)

        rd = (r - self.uniqr[lx1]) / (self.uniqr[lx1 + 1]
                                      - self.uniqr[lx1])
        thl = self.thfunc(self.uniqx2[lx2], r)
        thu = self.thfunc(self.uniqx2[lx2 + 1], r)
        td = jnp.clip(jnp.abs((th - thl) / (thu - thl)), 0.0, 1.0)
        rh = kerr.horizon(a)
        rd = jnp.where(self.uniqr[lx1] <= rh, 1.0,
                       jnp.clip(rd, 0.0, 1.0))
        outside = x1 <= u1a

        w00 = (1 - rd) * (1 - td)
        w01 = (1 - rd) * td
        w10 = rd * (1 - td)
        w11 = rd * td

        # all 10 fields: 4 corner gathers of phi-pair-packed vectors
        nf = len(self.TFIELDS)
        base = (lx3 * nx2 + lx2) * nx1 + lx1
        base1 = (lx3 * nx2 + lx2 + 1) * nx1 + lx1
        out = None
        for wgt, idx in ((w00, base), (w01, base1),
                         (w10, base + 1), (w11, base1 + 1)):
            q = self.fpair[idx]
            v = (q[..., :nf] * (1 - pd)[..., None]
                 + q[..., nf:] * pd[..., None]) * wgt[..., None]
            out = v if out is None else out + v
        col = {n: out[..., i] for i, n in enumerate(self.TFIELDS)}

        rho = jnp.where(outside, 0.0, col["rho"])
        p = jnp.where(outside, 1e-18, col["p"])
        u0 = jnp.where(outside, 1.0, col["u0"])
        vrl = jnp.where(outside, 0.0, col["vrl"])
        vtl = jnp.where(outside, 0.0, col["vtl"])
        vpl = jnp.where(outside, 0.0, col["vpl"])
        b = jnp.stack([col["b0"], col["br"], col["bth"], col["bph"]],
                      axis=-1)
        b = jnp.where(outside[..., None],
                      jnp.array([0.0, 0.0, 0.0, 1.0]), b)
        g_cov = kerr.metric_cov(r, th, a)
        bmag = safe_sqrt(fv.dot(g_cov, b, b))
        vr, vth, om = kerr.lnrf_frame_inv(vrl, vtl, vpl, r, a, th)
        u = jnp.stack([u0, u0 * vr, u0 * vth, u0 * om], axis=-1)
        return FluidVars(rho=rho, p=p, bmag=bmag, u=u, b=b, rho2=rho)

    def convert(self, fv_, sp):
        """convert_fluidvars_thickdisk (fluid.f90:925-940)."""
        ncgs, bcgs, tempcgs, rhocgs = base.scale_sim_units(
            sp.mbh, sp.mdot, self.mdot_code, fv_.rho, fv_.p, fv_.bmag)
        trat = base.monika_e(fv_.rho, fv_.p, fv_.bmag,
                             1.0 / sp.mu - 1.0,
                             sp.gmin * (1.0 / sp.mu - 1.0))
        tempcgs = tempcgs / (1.0 + trat)
        ncgsnth = base.nonthermale_b2(
            sp.jetalpha, max(sp.gmin, 1.0), sp.p1,
            fv_.bmag ** 2 / jnp.maximum(fv_.rho, 1e-37), bcgs)
        return EmisInputs(ncgs=ncgs, tcgs=tempcgs, bcgs=bcgs,
                          ncgsnth=ncgsnth)
