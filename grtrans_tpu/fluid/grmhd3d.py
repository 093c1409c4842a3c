"""Shared machinery for 3-D GRMHD snapshot fluid models (HARM3D, IHARM,
HARMPI, KORAL3D, THICKDISK, MB09).

Parity: the interpolation/storage pattern every reference 3-D model
repeats (fluid_model_harm3d.f90 harm3d_vals :107-330 and its clones):

 * grid-aligned storage of (rho, p, u0, LNRF velocities, b^mu) on an
   (nt, nx1, nx2, nx3) lattice, velocities stored as LNRF components so
   interpolation stays subluminal;
 * BL -> KS azimuth (zphi = bl2ks(r, phi)) and mod-2pi wrap before
   lookup (:156-161);
 * trilinear interpolation with fractional distances measured in the
   PHYSICAL coordinates (r, theta, phi) while indices live on the
   (possibly stretched) simulation grid (:169-207);
 * periodic phi wrap (:195-203), pole-theta spacing fallback (:189-193);
 * nearest-neighbor + 1e-6 p/n/b damping inside the innermost zone
   outside the horizon (:209-218);
 * optional linear blend between two time slices for slow light
   (:229-254; the reference computes ttd then zeroes it, rttd=0. :271 —
   we keep the same default and expose it for slow-light runs);
 * four-vector reconstruction via LNRF -> BL (:297-305) and
   bmag = sqrt(max(b.b, 0)) (:293-295).

The whole lookup is one gather + weighted sum over 8 (or 16) corners —
a single fused XLA kernel over (npix, npts) instead of the reference's
reshape/merge chains.
"""

from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp

from grtrans_tpu.geometry import kerr, fourvector as fv
from grtrans_tpu.geometry.kerr import safe_sqrt
from grtrans_tpu.fluid.base import FluidVars

FIELDS = ("rho", "p", "u0", "vrl", "vtl", "vpl", "b0", "br", "bth", "bph")


def to_lnrf_storage(u_bl, b_bl, r, th, a):
    """Convert BL four-vectors to the stored (u0, vrl, vtl, vpl, b^mu)
    layout (init_harm3d_data pattern)."""
    vr = u_bl[..., 1] / u_bl[..., 0]
    vth = u_bl[..., 2] / u_bl[..., 0]
    om = u_bl[..., 3] / u_bl[..., 0]
    vrl, vtl, vpl = kerr.lnrf_frame(vr, vth, om, r, a, th)
    return {
        "rho": None, "p": None,
        "u0": u_bl[..., 0], "vrl": vrl, "vtl": vtl, "vpl": vpl,
        "b0": b_bl[..., 0], "br": b_bl[..., 1], "bth": b_bl[..., 2],
        "bph": b_bl[..., 3],
    }


class Grmhd3D:
    """Mixin implementing vals() for (nt, nx1, nx2, nx3) gridded data.

    Subclasses must set:
      asim, h            — simulation spin / theta-map parameter
      uniqx1/x2/x3       — 1-D simulation coordinate arrays (jnp)
      uniqr/th/ph        — corresponding physical coordinates (jnp)
      f                  — dict of FIELDS -> (nt, nx1, nx2, nx3) arrays
    and may override x123_of_blks() for their coordinate maps."""

    nt_slices: int = 1
    tstep: float = 1.0
    toffset: float = 0.0   # simulation time of slice 0
    # theta-fraction space: physical theta (harm3d_vals:189-207) or
    # simulation x2 (needed when theta(x2) also depends on x1 — MMKS)
    interp_td_in_x2: bool = False

    def x123_of_blks(self, r, th, ph):
        """Default MKS(h)-style map: x1 = ln r, x2 = x2(theta), x3 = phi
        (transformbl2mksh, fluid_model_harm3d.f90:68-80)."""
        from grtrans_tpu.fluid.harm import x2_of_theta
        return jnp.log(r), x2_of_theta(th, self.h), ph

    def _store(self, arrs: Dict[str, jnp.ndarray]):
        """Stack per-field (nx1,nx2,nx3) arrays into the slot buffer."""
        self.f = {k: jnp.asarray(arrs[k])[None] for k in FIELDS}
        self._fstack_key = None
        self._epoch = getattr(self, "_epoch", 0) + 1

    def append_slice(self, arrs: Dict[str, jnp.ndarray]):
        """Push a new time slice into the ring buffer (advance_harm3d_
        timestep / load_harm3d_data pattern, :612-680)."""
        for k in FIELDS:
            self.f[k] = jnp.concatenate(
                [self.f[k], jnp.asarray(arrs[k])[None]], axis=0)
        self.nt_slices = int(self.f["rho"].shape[0])
        self._fstack_key = None
        self._epoch = getattr(self, "_epoch", 0) + 1

    def _stacked_fields(self, dtype):
        """All FIELDS + extra3 grids stacked minor-most and flattened to
        (nt, nx1*nx2*nx3, nf): one trilinear sample of every field is 8
        (16 with the time blend) gathers of contiguous nf-vectors
        instead of 8-16 PER FIELD — TPU gathers are latency-bound
        (measured 10x on the 2-D samplers).  Cached; invalidated by
        _store/append_slice."""
        extra = getattr(self, "extra3", {})
        names = list(FIELDS) + sorted(extra.keys())
        nt = self.nt_slices
        key = (nt, tuple(names), str(dtype))
        if getattr(self, "_fstack_key", None) == key:
            return self._fstack, names
        import jax
        # the stack is built lazily on first sample — often INSIDE a jit
        # trace, where ops on concrete arrays still produce tracers;
        # caching a tracer leaks it into later traces
        # (UnexpectedTracerError on any retrace).  Force eager
        # evaluation: the inputs are concrete snapshot buffers.
        with jax.ensure_compile_time_eval():
            return self._build_fstack(key, names, nt, dtype)

    def _build_fstack(self, key, names, nt, dtype):
        extra = getattr(self, "extra3", {})
        arrs = []
        for n in names:
            g = self.f[n] if n in self.f else extra[n]
            g = g if g.ndim == 4 else g[None]
            if g.shape[0] != nt:          # static extra field on a
                g = jnp.broadcast_to(g, (nt,) + g.shape[1:])  # time series
            arrs.append(g)
        st = jnp.stack(arrs, axis=-1)                 # (nt,n1,n2,n3,nf)
        # phi-PAIR packing: each entry also carries its phi+1 neighbor
        # (periodic wrap) contiguously, so the trilinear sample needs 4
        # gathers of 2*nf contiguous floats instead of 8 of nf — TPU
        # gathers are descriptor-latency-bound.  2x memory on the stack.
        stp = jnp.concatenate([st, jnp.roll(st, -1, axis=3)], axis=-1)
        stp = stp.reshape(nt, -1, 2 * len(names)).astype(dtype)
        self._fstack = stp
        self._fstack_key = key
        return stp, names

    def _query(self, x, a, time=0.0):
        """Per-sample interpolation geometry: grid indices, corner
        weights, time blend, innermost-zone damping — everything except
        the field-stack gather (which is the only part that touches the
        sharded snapshot in the spatially-sharded path)."""
        nx1 = int(self.uniqx1.shape[0])
        nx2 = int(self.uniqx2.shape[0])
        nx3 = int(self.uniqx3.shape[0])
        r = x[..., 1]
        th = x[..., 2]
        # BL -> KS azimuth, wrapped to [0, 2pi) (harm3d_vals:156-161)
        zphi = jnp.mod(kerr.bl2ks_phi(r, x[..., 3], a), 2.0 * jnp.pi)
        zphi = jnp.where(zphi < 0.0, zphi + 2.0 * jnp.pi, zphi)
        x1, x2, x3 = self.x123_of_blks(r, th, zphi)

        u1a, u1b = self.uniqx1[0], self.uniqx1[-1]
        u2a, u2b = self.uniqx2[0], self.uniqx2[-1]
        u3a, u3b = self.uniqx3[0], self.uniqx3[-1]
        lx1 = jnp.clip(jnp.floor((x1 - u1a) / (u1b - u1a) * (nx1 - 1))
                       .astype(jnp.int32), 0, nx1 - 2)
        lx2 = jnp.clip(jnp.floor((x2 - u2a) / (u2b - u2a) * (nx2 - 1))
                       .astype(jnp.int32), 0, nx2 - 2)
        # phi periodic: lower index may wrap below 0 or above nx3-1
        dph = (u3b - u3a) / jnp.maximum(nx3 - 1, 1)
        lx3raw = jnp.floor((x3 - u3a) / dph).astype(jnp.int32)
        lx3 = jnp.mod(lx3raw, nx3)
        minph = u3a + lx3raw * dph          # unwrapped cell-left phi

        # fractional distances in physical coordinates (:189-207)
        rd = (r - self.uniqr[lx1]) / (self.uniqr[lx1 + 1] - self.uniqr[lx1])
        if self.interp_td_in_x2:
            td = (x2 - self.uniqx2[lx2]) / (self.uniqx2[lx2 + 1]
                                            - self.uniqx2[lx2])
        else:
            dth = self.uniqth[lx2 + 1] - self.uniqth[lx2]
            td = jnp.abs(th - self.uniqth[lx2]) / dth
        pd = (x3 - minph) / dph

        # innermost-zone handling (:209-218)
        rh = kerr.horizon(a)
        inner = self.uniqr[lx1] <= jnp.maximum(self.uniqr[0], rh)
        rd = jnp.where(inner, 1.0, jnp.clip(rd, 0.0, 1.0))
        damp = jnp.where(inner, 1e-6, 1.0)
        td = jnp.clip(td, 0.0, 1.0)
        pd = jnp.clip(pd, 0.0, 1.0)
        outside = x1 <= u1a

        # time-slice blend (slow light, reference harm_vals:136-197 +
        # :229-254).  Slices are ordered FORWARD in simulation time:
        # slice k holds the dump at t_sim = toffset + k*tstep.  The
        # sample's KS time (<= 0: the trace lies in the observer's past,
        # zeroed at the ray's own first point like the reference's
        # zr(1)/zt(1)) plus the camera epoch `time` selects the
        # bracketing pair; fast-light runs pass time=0 with one slice
        # and the blend is the identity.
        if self.nt_slices > 1:
            tks = (kerr.bl2ks_time(r, x[..., 0], a)
                   - kerr.bl2ks_time(r[..., :1], 0.0 * r[..., :1], a))
            s = (time - self.toffset + tks) / self.tstep
            tind = jnp.clip(jnp.floor(s).astype(jnp.int32),
                            0, self.nt_slices - 2)
            ttd = jnp.clip(s - tind, 0.0, 1.0)
        else:
            tind = jnp.zeros(r.shape, int)
            ttd = jnp.zeros_like(r)

        dt_ = r.dtype
        ws = tuple(w.astype(dt_) for w in
                   ((1 - rd) * (1 - td), (1 - rd) * td,
                    rd * (1 - td), rd * td))
        return dict(r=r, th=th, lx1=lx1, lx2=lx2, lx3=lx3, ws=ws,
                    pdc=pd.astype(dt_), tind=tind,
                    ttd=ttd.astype(dt_), damp=damp.astype(dt_),
                    outside=outside)

    def _gather_cols(self, Gf, NS, nx2_eff, nx3, q, nf, lx2=None,
                     wmask=None):
        """Phi-pair-packed trilinear gather of all fields: 4 corner
        gathers of contiguous 2*nf-vectors (8 with the time blend).
        Gf: (nt*NS, 2*nf) flattened stack with NS = nx1*nx2_eff*nx3;
        lx2 overrides q['lx2'] (slab-local index in the sharded path);
        wmask zeroes non-owned queries' weights (double-where: their
        clamped indices gather arbitrary rows)."""
        lx2 = q["lx2"] if lx2 is None else lx2
        lx1, lx3, pdc = q["lx1"], q["lx3"], q["pdc"]
        ws = q["ws"]
        if wmask is not None:
            ws = tuple(jnp.where(wmask, w, 0.0) for w in ws)
        base_lo = (lx1 * nx2_eff + lx2) * nx3
        base_hi = (lx1 * nx2_eff + lx2 + 1) * nx3
        base1_lo = ((lx1 + 1) * nx2_eff + lx2) * nx3
        base1_hi = ((lx1 + 1) * nx2_eff + lx2 + 1) * nx3
        idxs = (base_lo + lx3, base_hi + lx3, base1_lo + lx3,
                base1_hi + lx3)

        def at(t):
            off = t * NS
            out = None
            for w, i in zip(ws, idxs):
                qv = Gf[off + i]
                v = (qv[..., :nf] * (1 - pdc)[..., None]
                     + qv[..., nf:] * pdc[..., None]) * w[..., None]
                out = v if out is None else out + v
            return out

        if self.nt_slices > 1:
            ttd = q["ttd"]
            vals = at(q["tind"]) * (1 - ttd)[..., None] \
                + at(q["tind"] + 1) * ttd[..., None]
        else:
            vals = at(jnp.zeros(lx1.shape, jnp.int32))
        return vals

    def stacked_names(self):
        """Field-column order of the packed stack (gather layout)."""
        return list(FIELDS) + sorted(getattr(self, "extra3", {}).keys())

    def stacked_grid(self, dtype):
        """The phi-pair-packed field stack in GRID shape
        (nt, nx1, nx2, nx3, 2*nf) — the array to theta-shard over a
        device mesh via parallel.sharding.snapshot_shard_spec(axis=2)
        for dumps too large to replicate per chip."""
        G, names = self._stacked_fields(dtype)
        nx1 = int(self.uniqx1.shape[0])
        nx2 = int(self.uniqx2.shape[0])
        nx3 = int(self.uniqx3.shape[0])
        return G.reshape(self.nt_slices, nx1, nx2, nx3, G.shape[-1]), names

    def vals(self, x, k, a, time=0.0):
        nx2 = int(self.uniqx2.shape[0])
        nx3 = int(self.uniqx3.shape[0])
        q = self._query(x, a, time=time)
        G, names = self._stacked_fields(q["r"].dtype)
        NS = G.shape[1]
        nf = len(names)
        Gf = G.reshape(-1, G.shape[-1])          # (nt*NS, 2*nf)
        vals = self._gather_cols(Gf, NS, nx2, nx3, q, nf)
        return self._assemble(vals, names, q, x, a)

    def _assemble(self, vals, names, q, x, a):
        """Columns + query geometry -> FluidVars (LNRF -> BL
        reconstruction, innermost-zone damping, outside-grid defaults)."""
        r, th = q["r"], q["th"]
        damp, outside = q["damp"], q["outside"]
        col = {n: vals[..., i] for i, n in enumerate(names)}
        rho = col["rho"] * damp
        p = col["p"] * damp
        u0 = jnp.where(outside, 1.0, col["u0"])
        vrl = jnp.where(outside, 0.0, col["vrl"])
        vtl = jnp.where(outside, 0.0, col["vtl"])
        vpl = jnp.where(outside, 0.0, col["vpl"])
        b = jnp.stack([col["b0"], col["br"], col["bth"], col["bph"]],
                      axis=-1)
        b = jnp.where(outside[..., None], jnp.array([0.0, 0.0, 0.0, 1.0]),
                      b)
        g_cov = kerr.metric_cov(r, th, a)
        bmag = safe_sqrt(fv.dot(g_cov, b, b)) * damp
        vr, vth, om = kerr.lnrf_frame_inv(vrl, vtl, vpl, r, a, th)
        u = jnp.stack([u0, u0 * vr, u0 * vth, u0 * om], axis=-1)
        rho = jnp.where(outside, 0.0, rho)
        p = jnp.where(outside, 1e-18, p)
        kela = None
        extra = {}
        for name in getattr(self, "extra3", {}):
            val = jnp.where(outside, 0.0, col[name])
            if name == "kela":
                kela = val
            else:
                extra[name] = val
        self._last_extra = extra     # bins etc. for subclasses
        return FluidVars(rho=rho, p=p, bmag=bmag, u=u, b=b, rho2=rho,
                         kela=kela)


def sample_sharded(model, x, a, grid_block, axis_name="pix", time=0.0):
    """Spatially-sharded snapshot sampling — call INSIDE shard_map.

    TPU-native answer to the reference's shared-memory snapshot
    (README:233-235 "all fluid model data ... shared between threads"):
    when a dump exceeds one chip's HBM, the packed field stack
    (model.stacked_grid) shards over the mesh along THETA (axis 2,
    parallel.sharding.snapshot_shard_spec) while pixels shard as usual.
    Each device then:

      1. receives its one-row theta halo from the next shard
         (halo_exchange_theta ppermute) so every trilinear (lx2, lx2+1)
         pair is complete on exactly ONE device;
      2. all_gathers the (small) query coordinates so it can serve
         every ray's samples that land in its slab;
      3. gathers/weights ONLY the queries it owns (owner-computes:
         slab_start <= lx2 < slab_start + B; weights zeroed elsewhere),
      4. psums the disjoint contributions — numerically exact (each
         query is summed on one device, zeros elsewhere), so the
         sharded render equals the replicated render bit-for-bit up to
         psum ordering of exact zeros (tests/test_sharding.py);
      5. assembles FluidVars for its OWN pixel block only.

    Communication: one row of halo + all_gather(query coords) +
    psum(field columns) — all O(npix*npts), independent of dump size.

    Args: x — device-local pixel block of sample coordinates
    (npix_local, npts, 4); grid_block — device-local theta-slab
    (nt, nx1, B, nx3, 2*nf) of model.stacked_grid (nx2 must divide the
    mesh size; pad theta if not).  Returns FluidVars for the local
    pixel block."""
    import jax
    from grtrans_tpu.parallel.sharding import halo_exchange_theta

    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    B = grid_block.shape[2]
    nx1 = grid_block.shape[1]
    nx3 = grid_block.shape[3]
    start = idx * B

    _, hi = halo_exchange_theta(grid_block, axis_name, axis=2)
    ext = jnp.concatenate([grid_block, hi[:, :, None]], axis=2)

    names = model.stacked_names()
    nf = len(names)
    NS = nx1 * (B + 1) * nx3
    Gf = ext.reshape(-1, ext.shape[-1])

    xg = jax.lax.all_gather(x, axis_name, axis=0, tiled=True)
    q = model._query(xg, a, time=time)
    own = (q["lx2"] >= start) & (q["lx2"] < start + B)
    llx2 = jnp.clip(q["lx2"] - start, 0, B - 1)
    vals = model._gather_cols(Gf, NS, B + 1, nx3, q, nf,
                              lx2=llx2, wmask=own)
    vals = jax.lax.psum(vals, axis_name)

    npix_local = x.shape[0]
    vals_loc = jax.lax.dynamic_slice_in_dim(vals, idx * npix_local,
                                            npix_local, axis=0)
    q_loc = model._query(x, a, time=time)
    return model._assemble(vals_loc, names, q_loc, x, a)
