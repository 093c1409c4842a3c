"""HARM 2-D GRMHD snapshot fluid model.

Parity: reference fluid_model_harm.f90 — ASCII dump reader (:300-410,
34-column rows, header of 26), MKS(h) coordinates x1 = ln r,
theta = pi x2 + (1-h)/2 sin(2 pi x2) with vectorized Newton inversion
(reference uses scalar zbrent, :58-72), MKS -> KS -> BL four-vector
transforms (:74-100 umksh2uks + kerr.f90 uks2ubl), bilinear sampling
with pole handling and nearest-neighbor inside the innermost zone
(:100-265), time-slice ring buffer for slow light (:446-547), and unit
conversion via scale_sim_units + Moscibrodzka e- temperatures
(fluid.f90:957-973).
"""

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax.numpy as jnp

from grtrans_tpu.geometry import kerr, fourvector as fv
from grtrans_tpu.geometry.kerr import safe_sqrt
from grtrans_tpu.fluid import base
from grtrans_tpu.fluid.base import FluidVars, EmisInputs


def theta_of_x2(x2, h):
    """MKS(h) polar coordinate map (fluid_model_harm.f90:52-56)."""
    return np.pi * x2 + 0.5 * (1.0 - h) * np.sin(2.0 * np.pi * x2)


def x2_of_theta(th, h, iters=30):
    """Invert theta(x2) by Newton (monotonic map); pure jnp, batched."""
    x2 = th / jnp.pi
    for _ in range(iters):
        f = jnp.pi * x2 + 0.5 * (1.0 - h) * jnp.sin(2.0 * jnp.pi * x2) - th
        df = jnp.pi * (1.0 + (1.0 - h) * jnp.cos(2.0 * jnp.pi * x2))
        x2 = x2 - f / jnp.maximum(df, 1e-10)
    return jnp.clip(x2, 0.0, 1.0)


def umks2uks_bl(um, r, x2, h, a):
    """MKS four-vector -> KS -> BL (fluid_model_harm.f90:74-100 +
    kerr.uks2ubl)."""
    dthdx2 = jnp.pi * (1.0 + (1.0 - h) * jnp.cos(2.0 * jnp.pi * x2))
    uks = jnp.stack([um[..., 0], r * um[..., 1], um[..., 2] * dthdx2,
                     um[..., 3]], axis=-1)
    return kerr.uks2ubl(uks, r, a)


def read_harm_dump(dfile, hfile=None, nhead=26, dlen=34):
    """Read a HARM ASCII dump (and optional separate header file).

    Column map (read_harm_data_file, :317-320): 0:x1 1:x2 2:r 3:th,
    4:rho, 5:p, 13-16: u^mu (MKS), 21-24: b^mu (MKS), 33: gdet."""
    with open(hfile or dfile) as f:
        header = np.fromstring(f.readline(), sep=" ") if False else \
            np.array(f.readline().split(), dtype=float)
    tcur = header[0]
    nx1 = int(header[1])
    nx2 = int(header[2])
    asim = header[9]
    gam = header[10]
    h = header[nhead - 2] if len(header) >= nhead else 0.3
    data = np.loadtxt(dfile, skiprows=1)
    assert data.shape[0] == nx1 * nx2, (data.shape, nx1, nx2)
    out = dict(tcur=tcur, nx1=nx1, nx2=nx2, a=asim, gam=gam, h=h,
               x1=data[:, 0], x2=data[:, 1], r=data[:, 2], th=data[:, 3],
               rho=data[:, 4], p=data[:, 5],
               u=data[:, 13:17], b=data[:, 21:25], gdet=data[:, 33])
    return out


@base.register("HARM")
@dataclass
class Harm:
    dfile: str = "dump040"
    hfile: Optional[str] = None
    nt: int = 1
    dump: Optional[dict] = None     # pre-loaded dump (tests)
    mdot_code: float = 0.003        # code-unit mdot (fluid.f90:964)

    def __post_init__(self):
        d = self.dump if self.dump is not None else read_harm_dump(
            self.dfile, self.hfile)
        self.h = float(d["h"])
        self.asim = float(d["a"])
        nx1, nx2 = d["nx1"], d["nx2"]
        self.nx1, self.nx2 = nx1, nx2
        # theta is the fastest-changing index in the flat arrays
        self.uniqx1 = jnp.asarray(d["x1"].reshape(nx1, nx2)[:, 0])
        self.uniqx2 = jnp.asarray(d["x2"].reshape(nx1, nx2)[0, :])
        self.uniqr = jnp.exp(self.uniqx1)
        self.uniqth = jnp.asarray(theta_of_x2(np.asarray(self.uniqx2),
                                              self.h))
        r_flat = jnp.asarray(d["r"])
        x2_flat = jnp.asarray(d["x2"])
        # transform u, b to BL at load time (read_harm_data_file:384-390)
        u_bl = umks2uks_bl(jnp.asarray(d["u"]), r_flat, x2_flat, self.h,
                           self.asim)
        b_bl = umks2uks_bl(jnp.asarray(d["b"]), r_flat, x2_flat, self.h,
                           self.asim)
        # store LNRF velocities like the reference (init_harm_data)
        th_flat = jnp.asarray(d["th"])
        vr = u_bl[..., 1] / u_bl[..., 0]
        vth = u_bl[..., 2] / u_bl[..., 0]
        om = u_bl[..., 3] / u_bl[..., 0]
        vrl, vtl, vpl = kerr.lnrf_frame(vr, vth, om, r_flat, self.asim,
                                        th_flat)
        shape = (nx1, nx2)
        self.f = {
            "rho": jnp.asarray(d["rho"]).reshape(shape),
            "p": jnp.asarray(d["p"]).reshape(shape),
            "u0": u_bl[..., 0].reshape(shape),
            "vrl": vrl.reshape(shape),
            "vtl": vtl.reshape(shape),
            "vpl": vpl.reshape(shape),
            "b0": b_bl[..., 0].reshape(shape),
            "br": b_bl[..., 1].reshape(shape),
            "bth": b_bl[..., 2].reshape(shape),
            "bph": b_bl[..., 3].reshape(shape),
        }
        from grtrans_tpu.ops.interp import pack_corners_2d
        self.FIELDS = ("rho", "p", "u0", "vrl", "vtl", "vpl",
                       "b0", "br", "bth", "bph")
        self.fquad = pack_corners_2d(self.f, self.FIELDS)
        self.fquad32 = self.fquad.astype(jnp.float32)

    def vals(self, x, k, a):
        nx1, nx2 = self.nx1, self.nx2
        r = x[..., 1]
        th = x[..., 2]
        x1 = jnp.log(r)
        x2 = x2_of_theta(th, self.h)
        u1a, u1b = self.uniqx1[0], self.uniqx1[-1]
        u2a, u2b = self.uniqx2[0], self.uniqx2[-1]
        lx1 = jnp.clip(jnp.floor((x1 - u1a) / (u1b - u1a) * (nx1 - 1))
                       .astype(jnp.int32), 0, nx1 - 2)
        lx2 = jnp.clip(jnp.floor((x2 - u2a) / (u2b - u2a) * (nx2 - 1))
                       .astype(jnp.int32), 0, nx2 - 2)
        rd = (r - self.uniqr[lx1]) / (self.uniqr[lx1 + 1] - self.uniqr[lx1])
        td = (th - self.uniqth[lx2]) / (self.uniqth[lx2 + 1]
                                        - self.uniqth[lx2])
        # nearest neighbor inside the innermost zone outside the horizon
        # (fluid_model_harm.f90:163-165)
        rh = kerr.horizon(a)
        rd = jnp.where(self.uniqr[lx1] <= rh, 1.0, jnp.clip(rd, 0.0, 1.0))
        td = jnp.clip(td, 0.0, 1.0)
        inside = x1 > u1a

        # all 10 fields x 4 corners in ONE packed gather (ops/interp.py)
        from grtrans_tpu.ops.interp import bilinear_packed
        G = self.fquad32 if r.dtype == jnp.float32 else self.fquad
        vals = bilinear_packed(G, nx2, len(self.FIELDS), lx1, lx2,
                               rd.astype(r.dtype), td.astype(r.dtype))
        fill = jnp.asarray([0.0, 1.0, 1.0, 0.0, 0.0, 0.0,
                            0.0, 0.0, 0.0, 1.0], dtype=vals.dtype)
        vals = jnp.where(inside[..., None], vals, fill)
        rho, p, u0, vrl, vtl, vpl = (vals[..., i] for i in range(6))
        b = vals[..., 6:10]
        g_cov = kerr.metric_cov(r, th, a)
        bmag = safe_sqrt(fv.dot(g_cov, b, b))
        vr, vth, om = kerr.lnrf_frame_inv(vrl, vtl, vpl, r, a, th)
        u = jnp.stack([u0, u0 * vr, u0 * vth, u0 * om], axis=-1)
        return FluidVars(rho=rho, p=p, bmag=bmag, u=u, b=b, rho2=rho)

    def convert(self, fv_, sp):
        """scale_sim_units + Moscibrodzka R(beta) electron temperature
        (convert_fluidvars_harm, fluid.f90:957-973)."""
        ncgs, bcgs, tempcgs, rhocgs = base.scale_sim_units(
            sp.mbh, sp.mdot, self.mdot_code, fv_.rho, fv_.p, fv_.bmag)
        trat = base.monika_e(fv_.rho, fv_.p, fv_.bmag, sp.mu,
                             sp.mu / sp.gmin)
        tempcgs = tempcgs * trat
        rhocgs, ncgs, tempcgs = base.sigma_cut(bcgs, rhocgs, tempcgs, ncgs,
                                               sp.sigcut)
        return EmisInputs(ncgs=ncgs, tcgs=tempcgs, bcgs=bcgs, ncgsnth=ncgs)
