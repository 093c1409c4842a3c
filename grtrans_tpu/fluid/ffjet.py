"""FFJET: Broderick & Loeb (2009) force-free M87 jet from a binary
fluid-solution file.

Parity: reference fluid_model_ffjet.f90 (Fortran-unformatted file layout
:187-210; bilinear log-r x theta interpolation with equatorial symmetry
:41-178) and convert_fluidvars_ffjet (fluid.f90:1164-1172:
ncgsnth = rho * ntscl, bcgs = bmag * nrscl).
"""

from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from grtrans_tpu.geometry import kerr, fourvector as fv
from grtrans_tpu.fluid import base
from grtrans_tpu.fluid.base import FluidVars, EmisInputs

DEFAULT_FILE = "/root/reference/m87bl09rfp10xi5a998fluidvars.bin"


def _read_fortran_records(path):
    """Read all sequential Fortran unformatted records (4-byte markers)."""
    recs = []
    with open(path, "rb") as f:
        data = f.read()
    off = 0
    while off < len(data):
        n = np.frombuffer(data, np.int32, 1, off)[0]
        recs.append(data[off + 4: off + 4 + n])
        off += 8 + n
    return recs


def load_ffjet_file(path=DEFAULT_FILE):
    recs = _read_fortran_records(path)
    hdr = recs[0]
    aa = np.frombuffer(hdr, np.float32, 1, 0)[0]
    # header 'nx' is the TOTAL grid size nx^2 (see init_ffjet_data call,
    # fluid_model_ffjet.f90:203); the grid is sqrt(n) x sqrt(n)
    n = int(np.frombuffer(hdr, np.int32, 1, 4)[0])
    nx = int(round(np.sqrt(n)))
    r2 = np.frombuffer(recs[1], np.float32)
    rc, thc, rho = r2[:n], r2[n:2 * n], r2[2 * n:3 * n]
    r3 = np.frombuffer(recs[2], np.float32)
    # record: b(n) scratch, then b0, br, bth, bph
    b0 = r3[n:2 * n]
    br = r3[2 * n:3 * n]
    bth = r3[3 * n:4 * n]
    bph = r3[4 * n:5 * n]
    r4 = np.frombuffer(recs[3], np.float32)
    u0, vr, vth, vph = (r4[i * n:(i + 1) * n] for i in range(4))
    grids = {
        "a": float(aa), "nx": int(nx),
        "uniqr": rc[:nx].astype(np.float64),
        "uniqth": thc[::nx][:nx].astype(np.float64),
    }
    fields = {k: v.reshape(nx, nx).astype(np.float64)  # (th, r): r fastest
              for k, v in dict(rho=rho, b0=b0, br=br, bth=bth, bph=bph,
                               u0=u0, vr=vr, vth=vth, vph=vph).items()}
    return grids, fields


@base.register("FFJET")
@dataclass
class FFJet:
    dfile: str = DEFAULT_FILE
    ntscl: float = 2.0    # nonthermal density scale (sp nfac)
    nrscl: float = 70.0   # field scale (sp bfac)
    # ablation flag (docs/FFJET_GOLDEN_ANALYSIS.md): replicate the
    # reference's EXACT sampling conventions (ffjet_vals,
    # fluid_model_ffjet.f90:83-135) instead of the default arithmetic
    # ones: cell indices int()+1 with lx2 clipped to [1, nx-1] and lx1
    # unclipped (here clipped to addressable memory), fractional
    # weights from the dump's own f32 grid values (not the uniform-grid
    # reconstruction), both UNclipped, and the reference's outside-grid
    # fills (p = 1, vtl = 1, all b components = 1; :122-135)
    ref_conventions: bool = False

    FIELDS = ("rho", "vr", "vth", "vph", "u0", "b0", "br", "bth", "bph")

    def __post_init__(self):
        grids, fields = load_ffjet_file(self.dfile)
        self.grid_a = grids["a"]
        self.nx = grids["nx"]
        self.uniqr = jnp.asarray(grids["uniqr"])
        self.uniqth = jnp.asarray(grids["uniqth"])
        self.uniqx1 = jnp.log(self.uniqr)
        # raw f32 dump grids for the ref_conventions ablation path
        self.uniqr_raw = jnp.asarray(grids["uniqr"].astype(np.float32))
        self.uniqth_raw = jnp.asarray(grids["uniqth"].astype(np.float32))
        # ALL fields stacked minor-most, flattened over (th, r): the
        # bilinear sample is then 4 gathers of contiguous 9-vectors
        # instead of 36 scalar gathers — measured 10x faster on TPU
        # (70 ms vs 734 ms for 1M samples) and ~16x faster to compile
        A = np.stack([np.asarray(fields[k]) for k in self.FIELDS],
                     axis=-1)                        # (nx, nx, 9)
        # corner-packed quad table: entry (i2, i1) holds the 2x2 cell's
        # four corners contiguously (4 x 9 floats = one 144-byte gather
        # per SAMPLE instead of four separate corner gathers — TPU
        # gathers are descriptor-latency-bound, same bytes either way).
        # Edge rows are duplicated; indices are clipped to nx-2 so the
        # pad is never addressed.
        A1 = np.concatenate([A[1:], A[-1:]], axis=0)         # i2+1
        B0 = np.concatenate([A[:, 1:], A[:, -1:]], axis=1)   # i1+1
        B1 = np.concatenate([A1[:, 1:], A1[:, -1:]], axis=1)
        quad = np.stack([A, B0, A1, B1], axis=2)     # (nx, nx, 4, 9)
        self.fquad = jnp.asarray(
            quad.reshape(self.nx * self.nx, 4 * len(self.FIELDS)))
        self.fquad32 = self.fquad.astype(jnp.float32)

    def vals(self, x, k, a):
        nx = self.nx
        r = x[..., 1]
        th = x[..., 2]
        zm = jnp.cos(th)
        x2 = jnp.arccos(jnp.abs(zm))     # equatorial symmetry
        x1 = jnp.log(r)
        dt = r.dtype       # grid scalars follow the query dtype (mixed)
        u1a, u1b = self.uniqx1[0].astype(dt), self.uniqx1[-1].astype(dt)
        u2a, u2b = self.uniqth[0].astype(dt), self.uniqth[-1].astype(dt)
        if self.ref_conventions:
            # reference index semantics (fluid_model_ffjet.f90:83-98):
            # int() truncation (+1 in 1-based Fortran), lx2 clipped to
            # [1, nx-1], lx1 left unclipped by the reference (Fortran
            # reads whatever memory follows; here clipped to the
            # addressable table), weights from the dump's own f32 grid
            # values, UNclipped (extrapolation beyond edge cells)
            u1a32 = self.uniqr_raw[0]
            u1b32 = self.uniqr_raw[-1]
            u2a32 = self.uniqth_raw[0]
            u2b32 = self.uniqth_raw[-1]
            lx1 = ((x1 - jnp.log(u1a32)) / (jnp.log(u1b32)
                                            - jnp.log(u1a32))
                   * (nx - 1)).astype(jnp.int32)
            lx1 = jnp.clip(lx1, 0, nx - 2)
            lx2 = ((x2 - u2a32) / (u2b32 - u2a32)
                   * (nx - 1)).astype(jnp.int32)
            lx2 = jnp.clip(lx2, 0, nx - 2)
            rg0 = self.uniqr_raw[lx1].astype(dt)
            rg1 = self.uniqr_raw[lx1 + 1].astype(dt)
            tg0 = self.uniqth_raw[lx2].astype(dt)
            tg1 = self.uniqth_raw[lx2 + 1].astype(dt)
            rd = (r - rg0) / (rg1 - rg0)
            td = (x2 - tg0) / (tg1 - tg0)
            inside = x1 > jnp.log(u1a32)
        else:
            lx1 = jnp.clip(((x1 - u1a) / (u1b - u1a)
                            * (nx - 1)).astype(jnp.int32), 0, nx - 2)
            lx2 = jnp.clip(((x2 - u2a) / (u2b - u2a)
                            * (nx - 1)).astype(jnp.int32), 0, nx - 2)
            # the file grids are exactly log-r / theta uniform (to the
            # f32 roundoff of the dump), so the cell edges are computed
            # arithmetically instead of via four more 1M-point gathers
            d1 = (u1b - u1a) / (nx - 1)
            d2 = (u2b - u2a) / (nx - 1)
            r0 = jnp.exp(u1a + lx1 * d1)
            rd = (r - r0) / (r0 * jnp.expm1(d1))
            td = (x2 - (u2a + lx2 * d2)) / d2
            inside = x1 > u1a

        # ONE corner-packed gather of all 9 fields x 4 corners
        # (see __post_init__), then the bilinear combine on registers
        i00 = lx2 * nx + lx1
        G = self.fquad32 if r.dtype == jnp.float32 else self.fquad
        q = G[i00].reshape(r.shape + (4, 9))
        w = jnp.stack([(1 - rd) * (1 - td), rd * (1 - td),
                       (1 - rd) * td, rd * td], axis=-1)
        vals = jnp.sum(q * w[..., None], axis=-2)
        if self.ref_conventions:
            # FIELDS order (rho, vr, vth, vph, u0, b0, br, bth, bph);
            # reference fills: rho=0, vrl=0, vtl=1 (!), vpl=0, u0=1,
            # b=(1,1,1,1) (fluid_model_ffjet.f90:122-135)
            fill = jnp.asarray([0.0, 0.0, 1.0, 0.0, 1.0,
                                1.0, 1.0, 1.0, 1.0], dtype=vals.dtype)
        else:
            fill = jnp.asarray([0.0, 0.0, 0.0, 0.0, 1.0,
                                1.0, 1.0, 1.0, 1.0], dtype=vals.dtype)
        vals = jnp.where(inside[..., None], vals, fill)
        (rho, vrl, vtl, vpl, u0, b0, br, bth, bph) = (
            vals[..., i] for i in range(9))

        b = jnp.stack([b0, br, bth, bph], axis=-1)
        g_cov = kerr.metric_cov(r, th, a)
        from grtrans_tpu.geometry.kerr import safe_sqrt
        bmag2 = fv.dot(g_cov, b, b)
        bmag = safe_sqrt(bmag2)
        vr_, vth_, om_ = kerr.lnrf_frame_inv(vrl, vtl, vpl, r, a, th)
        u = jnp.stack([u0, u0 * vr_, u0 * vth_, u0 * om_], axis=-1)
        z = jnp.zeros_like(rho)
        return FluidVars(rho=rho, p=z, bmag=bmag, u=u, b=b, rho2=rho)

    def convert(self, fv_, sp):
        return EmisInputs(ncgs=jnp.zeros_like(fv_.rho),
                          tcgs=jnp.zeros_like(fv_.rho),
                          bcgs=fv_.bmag * self.nrscl,
                          ncgsnth=fv_.rho * self.ntscl)
