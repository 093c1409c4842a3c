"""MB09: McKinney & Blandford 2009 fieldline-format GRMHD model.

Parity: reference fluid_model_mb09.f90 + fluid.f90
convert_fluidvars_mb09 (:942-957).

 * Grid file: Fortran sequential-unformatted records
   [nx1, nx2, nx3 (int32)], [x1_arr], [x2_arr], [x3_arr] (float64,
   x1 fastest; read_mb09_grid_file :754-767).
 * Data files `<dfile>NNNN.bin`: records [nx (int32) = 9 n],
   [data (float32)] of 9 consecutive n-blocks: rho, p, coordinate
   velocities v^r, v^th, v^ph (dx^i/dt), and BL four-field
   b^t, b^r, b^th, b^ph (read_mb09_data :769-799 — the h5->binary
   preprocessing already transformed everything to BL).  u^t is
   recovered from metric normalization
   u^t = 1/sqrt(-(g_tt + 2 g_tp v^ph + g_rr v_r^2 + g_thth v_th^2 +
   g_pp v_ph^2)) (:795-798).
 * Coordinates: r = exp(x1 + (x1-xbr)^10 for x1 > xbr) with xbr = 25
   hard-coded (initialize_mb09_model :718); theta(x2, r) is the
   McKinney-Gammie defcoord=9 map calcthmks (:133-153); phi = 2 pi x3.
 * Sampling: same trilinear pattern as THICKDISK (mb09_vals :424-...):
   theta fraction in physical theta at the sample radius, periodic
   phi, nearest-neighbor inside the innermost zone.
 * Unit conversion: scale_sim_units with mdot_code = 0.0013,
   Moscibrodzka R(beta) electron temperature, ncgsnth = ncgs.
"""

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax.numpy as jnp

from grtrans_tpu.geometry import kerr, fourvector as fv
from grtrans_tpu.fluid import base
from grtrans_tpu.fluid.base import EmisInputs
from grtrans_tpu.fluid.thickdisk import ThickDisk, calcrmks

XBR_MB09 = 25.0


def calcthmks9(x2, r):
    """McKinney-Gammie defcoord=9 theta map (calcthmks :133-153)."""
    pi = jnp.pi
    rj, nj, r0j, rsj, q = 2.8, 0.3, 20.0, 80.0, 1.3
    g = -nj * (0.5 + 1.0 / pi * jnp.arctan((r - rsj) / r0j))
    h = 2.0 - q * (r / rj) ** g
    lower = pi * x2 + 0.5 * (1.0 - h) * jnp.sin(2.0 * pi * x2)
    upper = pi * x2 - 0.5 * (1.0 - h) * jnp.sin(2.0 * pi * (1.0 - x2))
    return jnp.where(x2 < 0.5, lower, upper)


def _read_record(buf, off, dtype, count):
    """One Fortran sequential record: 4-byte length framing."""
    n1 = int(np.frombuffer(buf, np.int32, 1, off)[0])
    data = np.frombuffer(buf, dtype, count, off + 4)
    n2 = int(np.frombuffer(buf, np.int32, 1,
                           off + 4 + data.nbytes)[0])
    assert n1 == n2 == data.nbytes, (n1, n2, data.nbytes)
    return data, off + 8 + data.nbytes


def read_mb09_grid(gfile):
    with open(gfile, "rb") as f:
        buf = f.read()
    dims, off = _read_record(buf, 0, np.int32, 3)
    nx1, nx2, nx3 = (int(v) for v in dims)
    n = nx1 * nx2 * nx3
    x1, off = _read_record(buf, off, np.float64, n)
    x2, off = _read_record(buf, off, np.float64, n)
    x3, off = _read_record(buf, off, np.float64, n)
    return dict(nx1=nx1, nx2=nx2, nx3=nx3, x1=x1, x2=x2, x3=x3)


def read_mb09_data(dfile, n):
    with open(dfile, "rb") as f:
        buf = f.read()
    nx, off = _read_record(buf, 0, np.int32, 1)
    assert int(nx[0]) == 9 * n, (nx, n)
    data, off = _read_record(buf, off, np.float32, 9 * n)
    d = data.astype(np.float64).reshape(9, n)
    return dict(rho=d[0], p=d[1], vr=d[2], vth=d[3], vph=d[4],
                b=np.stack([d[5], d[6], d[7], d[8]], axis=-1))


@base.register("MB09")
@dataclass
class MB09(ThickDisk):
    """Inherits the trilinear sampler + jetcoords machinery from
    ThickDisk, overriding the theta map, file format, and units."""
    gfile: str = ""
    asim_in: float = 0.9

    thfunc = staticmethod(calcthmks9)

    def __post_init__(self):
        if self.dump is not None:
            g, d = self.dump["grid"], self.dump["data"]
        else:
            g = read_mb09_grid(self.gfile)
            d = read_mb09_data(self.dfile,
                               g["nx1"] * g["nx2"] * g["nx3"])
        self.asim = float(self.dump.get("a", self.asim_in)
                          if self.dump is not None else self.asim_in)
        self.xbr = XBR_MB09
        self.nx1 = nx1 = int(g["nx1"])
        self.nx2 = nx2 = int(g["nx2"])
        self.nx3 = nx3 = int(g["nx3"])
        x1f = jnp.asarray(g["x1"])
        x2f = jnp.asarray(g["x2"])
        # x1 fastest (read_mb09_grid_file layout)
        self.uniqx1 = x1f[:nx1]
        self.uniqx2 = x2f[:nx1 * (nx2 - 1) + 1:nx1]
        self.uniqx3 = jnp.asarray(g["x3"])[::nx1 * nx2]
        self.uniqr = calcrmks(self.uniqx1, self.xbr)
        r_flat = calcrmks(x1f, self.xbr)
        th_flat = calcthmks9(x2f, r_flat)
        g_cov = kerr.metric_cov(r_flat, th_flat, self.asim)
        vr = jnp.asarray(d["vr"])
        vth = jnp.asarray(d["vth"])
        vph = jnp.asarray(d["vph"])
        # u^t from normalization (read_mb09_data :795-798)
        ui2 = (g_cov[..., 0] + 2.0 * g_cov[..., 3] * vph
               + g_cov[..., 4] * vr ** 2 + g_cov[..., 7] * vth ** 2
               + g_cov[..., 9] * vph ** 2)
        u0 = 1.0 / jnp.sqrt(jnp.maximum(-ui2, 1e-37))
        vrl, vtl, vpl = kerr.lnrf_frame(vr, vth, vph, r_flat, self.asim,
                                        th_flat)
        b_bl = jnp.asarray(d["b"])
        shape = (nx3, nx2, nx1)
        self.f = {k: v.reshape(shape) for k, v in dict(
            rho=jnp.asarray(d["rho"]), p=jnp.asarray(d["p"]), u0=u0,
            vrl=vrl, vtl=vtl, vpl=vpl, b0=b_bl[..., 0],
            br=b_bl[..., 1], bth=b_bl[..., 2],
            bph=b_bl[..., 3]).items()}
        self._build_pair_stack()

    def convert(self, fv_, sp):
        """convert_fluidvars_mb09 (fluid.f90:942-957)."""
        ncgs, bcgs, tempcgs, rhocgs = base.scale_sim_units(
            sp.mbh, sp.mdot, 0.0013, fv_.rho, fv_.p, fv_.bmag)
        trat = base.monika_e(fv_.rho, fv_.p, fv_.bmag,
                             1.0 / sp.mu - 1.0,
                             sp.gmin * (1.0 / sp.mu - 1.0))
        tempcgs = tempcgs / (1.0 + trat)
        return EmisInputs(ncgs=ncgs, tcgs=tempcgs, bcgs=bcgs,
                          ncgsnth=ncgs)
