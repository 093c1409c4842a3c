"""HARM3D (Chris White format) 3-D GRMHD snapshot model.

Parity: reference fluid_model_harm3d.f90 — binary stream dumps with an
ASCII header line followed by float32 data of 35 values per zone
(read_harm3d_data :516-585: grid cols 4-9 = x1,x2,x3,r,th,ph, rho col
10, p col 11, u^mu MKS cols 19-22, b^mu MKS cols 27-30), separate
15-number formatted header file (read_harm3d_data_header :337-368),
theta = pi*x2 coordinates (:612), MKS -> KS -> BL transforms at load
time, trilinear sampling (harm3d_vals :107-330 — see grmhd3d.py), and
HARM-style unit conversion (fluid.f90 convert_fluidvars_harm3d).
"""

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax.numpy as jnp

from grtrans_tpu.geometry import kerr
from grtrans_tpu.fluid import base, grmhd3d
from grtrans_tpu.fluid.base import EmisInputs
from grtrans_tpu.fluid.harm import umks2uks_bl


def read_harm3d_dump(dfile, nx1, nx2, nx3, dlen=35):
    """Parse one Chris White binary dump (read_harm3d_data :536-566)."""
    with open(dfile, "rb") as f:
        raw = f.read()
    nl = raw.index(b"\n") + 1
    n = nx1 * nx2 * nx3
    data = np.frombuffer(raw[nl:nl + 4 * dlen * n],
                         np.float32).reshape(n, dlen).astype(np.float64)
    return dict(x1=data[:, 3], x2=data[:, 4], x3=data[:, 5],
                r=data[:, 6], th=data[:, 7], ph=data[:, 8],
                rho=data[:, 9], p=data[:, 10],
                u=data[:, 18:22], b=data[:, 26:30])


def read_harm3d_header(hfile, nhead=15):
    """15-number formatted header (read_harm3d_data_header :337-368)."""
    vals = np.array(open(hfile).read().split(), dtype=float)[:nhead]
    out = dict(tcur=vals[0], nx1=int(vals[1]), nx2=int(vals[2]),
               nx3=int(vals[3]), startx1=vals[4], startx2=vals[5],
               startx3=vals[6], dx1=vals[7], dx2=vals[8], dx3=vals[9])
    if nhead == 15:
        out["a"], out["gam"] = vals[10], vals[11]
    else:
        out["a"], out["gam"] = vals[12], vals[13]
    out["h"] = vals[nhead - 2]
    return out


@base.register("HARM3D")
@dataclass
class Harm3D(grmhd3d.Grmhd3D):
    dfile: str = "dump040.bin"
    hfile: Optional[str] = None
    nt: int = 1
    dump: Optional[dict] = None     # pre-loaded dump (tests)
    mdot_code: float = 0.003
    h: float = 1.0                  # theta = pi*x2 (Chris White)

    def __post_init__(self):
        if self.dump is not None:
            d = self.dump
        else:
            hd = read_harm3d_header(self.hfile or self.dfile + ".head")
            d = read_harm3d_dump(self.dfile, hd["nx1"], hd["nx2"],
                                 hd["nx3"])
            d.update(nx1=hd["nx1"], nx2=hd["nx2"], nx3=hd["nx3"],
                     a=hd["a"], gam=hd["gam"], h=hd.get("h", 1.0),
                     tcur=hd["tcur"])
        self.h = float(d.get("h", 1.0))
        self.asim = float(d["a"])
        nx1, nx2, nx3 = d["nx1"], d["nx2"], d["nx3"]
        # phi fastest-changing (harm3d_vals:135-139)
        self.uniqx1 = jnp.asarray(
            d["x1"].reshape(nx1, nx2, nx3)[:, 0, 0])
        self.uniqx2 = jnp.asarray(
            d["x2"].reshape(nx1, nx2, nx3)[0, :, 0])
        self.uniqx3 = jnp.asarray(
            d["x3"].reshape(nx1, nx2, nx3)[0, 0, :])
        self.uniqr = jnp.exp(self.uniqx1)
        self.uniqth = jnp.asarray(np.pi * np.asarray(self.uniqx2)) \
            if self.h == 1.0 else jnp.asarray(
                np.pi * np.asarray(self.uniqx2)
                + 0.5 * (1.0 - self.h)
                * np.sin(2.0 * np.pi * np.asarray(self.uniqx2)))
        self.uniqph = self.uniqx3
        r_flat = jnp.asarray(d["r"])
        th_flat = jnp.asarray(d["th"])
        x2_flat = jnp.asarray(d["x2"])
        u_bl = umks2uks_bl(jnp.asarray(d["u"]), r_flat, x2_flat, self.h,
                           self.asim)
        b_bl = umks2uks_bl(jnp.asarray(d["b"]), r_flat, x2_flat, self.h,
                           self.asim)
        arrs = grmhd3d.to_lnrf_storage(u_bl, b_bl, r_flat, th_flat,
                                       self.asim)
        shape = (nx1, nx2, nx3)
        arrs = {k: (v.reshape(shape) if v is not None else None)
                for k, v in arrs.items()}
        arrs["rho"] = jnp.asarray(d["rho"]).reshape(shape)
        arrs["p"] = jnp.maximum(jnp.asarray(d["p"]).reshape(shape), 1e-18)
        self._store(arrs)

    def convert(self, fv_, sp):
        """Same chain as HARM 2-D (fluid.f90 convert_fluidvars_harm3d)."""
        ncgs, bcgs, tempcgs, rhocgs = base.scale_sim_units(
            sp.mbh, sp.mdot, self.mdot_code, fv_.rho, fv_.p, fv_.bmag)
        trat = base.monika_e(fv_.rho, fv_.p, fv_.bmag, sp.mu,
                             sp.mu / sp.gmin)
        tempcgs = tempcgs * trat
        rhocgs, ncgs, tempcgs = base.sigma_cut(bcgs, rhocgs, tempcgs, ncgs,
                                               sp.sigcut)
        return EmisInputs(ncgs=ncgs, tcgs=tempcgs, bcgs=bcgs, ncgsnth=ncgs)
