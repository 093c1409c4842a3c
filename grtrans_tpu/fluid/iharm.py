"""Illinois iharm/ebhlight 3-D GRMHD snapshot model.

Parity: reference fluid_model_iharm.f90 — raw float32 stream dumps of
13+eHEAT values per zone (read_iharm_data_file :508-592: cols 1-3 =
x1,x2,x3, 4 = rho, 5 = internal energy u, 6-9 = u^mu MKS, 10-13 = b^mu
MKS, 14 = electron entropy kel), ASCII header (read_iharm_data_header
:427-469: tcur nx1 nx2 nx3 a hslope gam mks_smooth poly_xt poly_alpha
startx1 metric eHEAT eRAD n_prim Rin Rout), MKS-h theta map calcthmksh
(:82-87) or "funky" MMKS map calcthmmks (:108-119), MKS/MMKS -> KS ->
BL transforms (:560-650 + ummks2uks), trilinear sampling shared with
HARM3D, and the Illinois electron-temperature conversion
(fluid.f90:995-1026: T_e = 2 m_p u / (3 k rho (2 + R)) with
Moscibrodzka R(beta), or Ressler entropy electrons for gmin = -1).
"""

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax.numpy as jnp

from grtrans_tpu import constants as pc
from grtrans_tpu.geometry import kerr
from grtrans_tpu.fluid import base, grmhd3d
from grtrans_tpu.fluid.base import EmisInputs, FluidVars


def calcth_mksh(x2, h):
    """theta(x2) for standard MKS (calcthmksh, :82-87)."""
    return np.pi * x2 + (1.0 - h) / 2.0 * np.sin(2.0 * np.pi * x2)


def calcth_mmks(x2, x1, h, mks_smooth, poly_xt, poly_alpha, startx1):
    """theta(x1,x2) for FMKS/MMKS (calcthmmks, :108-119)."""
    xp = jnp if isinstance(x2, jnp.ndarray) else np
    A, B, C = mks_smooth, poly_xt, poly_alpha
    D = np.pi / (2.0 + 2.0 / (B ** C * (1.0 + C)))
    thetag = xp.pi * x2 + (1.0 - h) / 2.0 * xp.sin(2.0 * xp.pi * x2)
    s = 2.0 * x2 - 1.0
    thetaj = D * s * (1.0 + (s / B) ** C / (1.0 + C)) + xp.pi / 2.0
    return thetag + xp.exp(-A * (x1 - startx1)) * (thetaj - thetag)


def _mmks_derivs(x2, x1, h, A, B, C, startx1):
    """(dtheta/dx1, dtheta/dx2) of the MMKS map, analytic."""
    D = np.pi / (2.0 + 2.0 / (B ** C * (1.0 + C)))
    s = 2.0 * x2 - 1.0
    thetag = np.pi * x2 + (1.0 - h) / 2.0 * np.sin(2.0 * np.pi * x2)
    thetaj = D * s * (1.0 + (s / B) ** C / (1.0 + C)) + np.pi / 2.0
    dthg = np.pi * (1.0 + (1.0 - h) * np.cos(2.0 * np.pi * x2))
    dthj = 2.0 * D * (1.0 + (s / B) ** C)
    e = np.exp(-A * (x1 - startx1))
    dth_dx1 = -A * e * (thetaj - thetag)
    dth_dx2 = dthg + e * (dthj - dthg)
    return dth_dx1, dth_dx2


@base.register("IHARM")
@dataclass
class Iharm(grmhd3d.Grmhd3D):
    dfile: str = "iharm_dump"
    hfile: Optional[str] = None
    nt: int = 1
    dump: Optional[dict] = None     # pre-loaded dump (tests)

    def __post_init__(self):
        d = self.dump if self.dump is not None else self._read()
        self.asim = float(d["a"])
        self.h = float(d["hslope"])
        self.gam = float(d["gam"])
        self.is_mmks = int(d.get("metric", 0)) == 1
        self.interp_td_in_x2 = True
        self.mks_smooth = float(d.get("mks_smooth", 0.5))
        self.poly_xt = float(d.get("poly_xt", 0.82))
        self.poly_alpha = float(d.get("poly_alpha", 14.0))
        self.startx1 = float(d.get("startx1", d["x1"].min()))
        nx1, nx2, nx3 = d["nx1"], d["nx2"], d["nx3"]
        x1 = np.asarray(d["x1"]); x2 = np.asarray(d["x2"])
        x3 = np.asarray(d["x3"])
        self.uniqx1 = jnp.asarray(x1.reshape(nx1, nx2, nx3)[:, 0, 0])
        self.uniqx2 = jnp.asarray(x2.reshape(nx1, nx2, nx3)[0, :, 0])
        self.uniqx3 = jnp.asarray(x3.reshape(nx1, nx2, nx3)[0, 0, :])
        self.uniqr = jnp.exp(self.uniqx1)
        # theta at the MIDPLANE x1 column for the lookup grid; exact
        # MMKS inversion happens per-point in x123_of_blks
        r = np.exp(x1)
        if self.is_mmks:
            th = calcth_mmks(x2, x1, self.h, self.mks_smooth,
                             self.poly_xt, self.poly_alpha, self.startx1)
            self.uniqth = jnp.asarray(
                np.asarray(th).reshape(nx1, nx2, nx3)[-1, :, 0])
        else:
            th = calcth_mksh(x2, self.h)
            self.uniqth = jnp.asarray(
                np.asarray(th).reshape(nx1, nx2, nx3)[0, :, 0])
        self.uniqph = self.uniqx3
        u_bl, b_bl = self._to_bl(jnp.asarray(d["u"]), jnp.asarray(d["b"]),
                                 jnp.asarray(r), jnp.asarray(x1),
                                 jnp.asarray(x2))
        arrs = grmhd3d.to_lnrf_storage(u_bl, b_bl, jnp.asarray(r),
                                       jnp.asarray(th), self.asim)
        shape = (nx1, nx2, nx3)
        arrs = {k: (v.reshape(shape) if v is not None else None)
                for k, v in arrs.items()}
        arrs["rho"] = jnp.asarray(d["rho"]).reshape(shape)
        arrs["p"] = jnp.maximum(jnp.asarray(d["p"]).reshape(shape), 1e-18)
        self._store(arrs)
        if d.get("kela") is not None:
            self.extra3 = {"kela": jnp.asarray(d["kela"]).reshape(shape)}

    def _read(self):
        hv = np.array(open(self.hfile or self.dfile + ".head")
                      .read().split(), dtype=float)
        hd = dict(tcur=hv[0], nx1=int(hv[1]), nx2=int(hv[2]),
                  nx3=int(hv[3]), a=hv[4], hslope=hv[5], gam=hv[6],
                  mks_smooth=hv[7], poly_xt=hv[8], poly_alpha=hv[9],
                  startx1=hv[10], metric=int(hv[11]),
                  eheat=int(hv[12]) if len(hv) > 12 else 0)
        dlen = 13 + hd["eheat"]
        n = hd["nx1"] * hd["nx2"] * hd["nx3"]
        data = np.fromfile(self.dfile, np.float32,
                           count=dlen * n).reshape(n, dlen)
        data = data.astype(np.float64)
        hd.update(x1=data[:, 0], x2=data[:, 1], x3=data[:, 2],
                  rho=data[:, 3], p=data[:, 4],
                  u=data[:, 5:9], b=data[:, 9:13],
                  kela=data[:, 13] if hd["eheat"] else None)
        return hd

    def _to_bl(self, um, bm, r, x1, x2):
        """MKS/MMKS four-vectors -> KS -> BL (:560-650, ummks2uks)."""
        if self.is_mmks:
            d1, d2 = _mmks_derivs(np.asarray(x2), np.asarray(x1), self.h,
                                  self.mks_smooth, self.poly_xt,
                                  self.poly_alpha, self.startx1)
            d1 = jnp.asarray(d1); d2 = jnp.asarray(d2)
        else:
            d1 = 0.0
            d2 = jnp.asarray(np.pi * (1.0 + (1.0 - self.h)
                                      * np.cos(2.0 * np.pi
                                               * np.asarray(x2))))

        def go(v):
            uks = jnp.stack([v[..., 0], r * v[..., 1],
                             v[..., 1] * d1 + v[..., 2] * d2,
                             v[..., 3]], axis=-1)
            return kerr.uks2ubl(uks, r, self.asim)
        return go(um), go(bm)

    def x123_of_blks(self, r, th, ph):
        x1 = jnp.log(r)
        if self.is_mmks:
            # Newton inversion of theta(x1, x2) in x2 (findx2mmks)
            x2 = th / jnp.pi
            for _ in range(30):
                f = calcth_mmks(x2, x1, self.h, self.mks_smooth,
                                self.poly_xt, self.poly_alpha,
                                self.startx1) - th
                _, df = _mmks_derivs(x2, x1, self.h, self.mks_smooth,
                                     self.poly_xt, self.poly_alpha,
                                     self.startx1)
                x2 = jnp.clip(x2 - f / jnp.maximum(df, 1e-10), 0.0, 1.0)
        else:
            from grtrans_tpu.fluid.harm import x2_of_theta
            x2 = x2_of_theta(th, self.h)
        return x1, x2, ph

    def convert(self, fv_, sp):
        """Illinois conversion (convert_fluidvars_iharm,
        fluid.f90:995-1026).  f.p stores internal energy u."""
        mdot_code = pc.G * sp.mbh * pc.msun / pc.c ** 3
        ncgs, bcgs, tempcgs, rhocgs = base.scale_sim_units(
            sp.mbh, sp.mdot, mdot_code, fv_.rho, fv_.p, fv_.bmag)
        if sp.gmin >= 1.0:
            trat = base.monika_e(fv_.rho, fv_.p * (self.gam - 1.0),
                                 fv_.bmag, 1.0 / sp.mu - 1.0,
                                 sp.gmin * (1.0 / sp.mu - 1.0))
            tempcgs = 2.0 * tempcgs / 3.0 / (2.0 + trat)
        elif sp.gmin == -1.0 and fv_.kela is not None:
            tempcgs = base.ressler_e(fv_.rho, fv_.kela)
        ncgsnth = base.nonthermale_b2(
            sp.jetalpha, sp.gmin, sp.p1,
            fv_.bmag ** 2 / jnp.maximum(fv_.rho, 1e-37), bcgs)
        rhocgs, ncgs, tempcgs = base.sigma_cut(bcgs, rhocgs, tempcgs,
                                               ncgs, sp.sigcut)
        return EmisInputs(ncgs=ncgs, tcgs=tempcgs, bcgs=bcgs,
                          ncgsnth=ncgsnth)
