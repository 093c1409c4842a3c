"""The per-ray rendering pipeline, batched over all pixels.

Parity: reference grtrans_driver.f90 grtrans_driver (:57-465) — but where
the reference runs one ray at a time inside an OpenMP loop
(pgrtrans.f90:198-209), here every stage is a pure batched array op over
(npix, npts): trace -> fluid sampling -> comoving tetrad -> coefficients
-> rotate/invariant scalings -> Stokes integration.  The whole pipeline
jits into a single XLA program; pixels shard over TPU meshes via the
parallel module.
"""

from functools import partial
from typing import Optional

import os
import jax
import jax.numpy as jnp

from grtrans_tpu import constants as pc
from grtrans_tpu.geodesics import camera as cam_mod
from grtrans_tpu.geodesics import geokerr
from grtrans_tpu.geometry import tetrad, kerr
from grtrans_tpu.emis import polsynch, bb, brems, framework
from grtrans_tpu.emis import polsynchpl as pl_mod
from grtrans_tpu.integrate import solvers
from grtrans_tpu.fluid.base import EmisInputs, SourceParams


def calc_emissivity(ename, nu, ei: EmisInputs, ang, cosne, sp: SourceParams,
                    gmin=None):
    """Dispatch by emissivity name (reference emis.f90:461-571).

    gmin overrides sp.gmin (per-sample array from the stype='tail'
    model).  Returns the (npix, npts, 11) coefficient block."""
    ename = ename.upper()
    if gmin is None:
        gmin = sp.gmin
    if ename == "POLSYNCHTH":
        return polsynch.polsynchth(nu, ei.ncgs, ei.bcgs, ei.tcgs, ang)
    if ename == "SYMPOLTH":
        return polsynch.sympolemisth(nu, ei.ncgs, ei.bcgs, ei.tcgs, ang)
    if ename in ("SYNCHTHAV", "SYNCHTH"):
        return polsynch.synchemis(nu, ei.ncgs, ei.bcgs, ei.tcgs)
    if ename == "SYNCHTHAVNOABS":
        return polsynch.synchemisnoabs(nu, ei.ncgs, ei.bcgs, ei.tcgs)
    if ename == "POLSYNCHPL":
        return pl_mod.polsynchpl(nu, ei.ncgsnth, ei.bcgs, ang, sp.p1,
                                 gmin, sp.gmax)
    if ename == "SYNCHPL":
        return pl_mod.synchpl(nu, ei.ncgsnth, ei.bcgs, ang, sp.p1,
                              gmin, sp.gmax)
    if ename == "HYBRIDTHPL":
        return (polsynch.polsynchth(nu, ei.ncgs, ei.bcgs, ei.tcgs, ang)
                + pl_mod.polsynchpl(nu, ei.ncgsnth, ei.bcgs, ang, sp.p1,
                                    gmin, sp.gmax))
    if ename == "BB":
        return bb.bbemis(nu, ei.tcgs)
    if ename == "FBB":
        return bb.fbbemis(nu, ei.tcgs, 1.8)
    if ename == "BBPOL":
        return bb.fbbpolemis(nu, ei.tcgs, 1.8, cosne)
    if ename == "MAXJUTT":
        from grtrans_tpu.emis import mixtures
        return mixtures.maxjutt(nu, ei.ncgs, ei.bcgs, ei.tcgs, ang,
                                sp.otherargs or (3.5, 1, 1, 1, 1, 1, 1))
    if ename == "MAXCOMP":
        from grtrans_tpu.emis import mixtures
        return mixtures.maxcomp(nu, ei.ncgs, ei.bcgs, ei.tcgs, ang,
                                sp.otherargs
                                or (3.5, 1, 1, 1, 1, 1, 1, 1))
    if ename in ("SYNCHBIN", "POLSYNCHBIN"):
        from grtrans_tpu.emis import binned
        return binned.synchbinemis(nu, ei.nbins, ei.bcgs, ang,
                                   ei.gammas, ei.dgammas)
    if ename in ("BREMS", "BREMSHEROIC"):
        return brems.brememis_heroic(nu, ei.ncgs, ei.tcgs)
    if ename == "BREMSGRAY":
        return brems.brememis_gray(nu, ei.ncgs, ei.tcgs)
    if ename == "RHO":
        return bb.rhoemis(ei.ncgs, jnp.ones_like(ei.ncgs))
    if ename == "INTERP":
        # log-log interpolation of a tabulated F_nu (interpemis,
        # emis.f90:80-143; the PHATDISK path)
        from grtrans_tpu.ops.interp import get_weight
        lf = jnp.log(ei.freq_tab)
        ix, w = get_weight(lf, jnp.log(nu))
        f0 = jnp.take_along_axis(ei.fnu, ix[..., None], axis=-1)[..., 0]
        f1 = jnp.take_along_axis(ei.fnu, (ix + 1)[..., None],
                                 axis=-1)[..., 0]
        val = jnp.exp(jnp.log(jnp.maximum(f0, 1e-37)) * (1 - w)
                      + jnp.log(jnp.maximum(f1, 1e-37)) * w)
        inside = (nu >= ei.freq_tab[0]) & (nu <= ei.freq_tab[-1])
        j1 = jnp.where(inside & (f0 > 0) & (f1 > 0), val, 0.0)
        out = jnp.zeros(j1.shape + (11,))
        return out.at[..., 0].set(j1)
    raise ValueError(f"unknown emissivity {ename!r}")


def _extra_channels(geo, fv, ei, j, K, prof, ok):
    """The 19 extra diagnostic images (reference grtrans_driver.f90:230-292
    + README:84-114): optical depths tau_I,Q,U,V and Faraday depths
    rho_Q,rho_V at the photosphere, emissivity-weighted <r>, <theta>,
    <phi>, <n>, <T_e>, <B>, <beta_plasma>, midplane-side fraction, and
    linear-polarization-weighted <r>, <theta>, <tau_FR>, <tau_FC>,
    <side>.  Arrays (npix, 19)."""
    lam = geo.lam
    dlam = lam[..., 1:] - lam[..., :-1]

    def cum(q):
        qm = 0.5 * (q[..., 1:] + q[..., :-1])
        z = jnp.zeros_like(lam[..., :1])
        return jnp.concatenate([z, jnp.cumsum(qm * dlam, axis=-1)], axis=-1)

    # optical depths along the ray for [aI aQ aU aV rhoQ rhoV]
    taus = [cum(jnp.abs(K[..., i])) for i in (0, 1, 2, 3, 4, 6)]
    tau_i = taus[0]
    # photosphere: sample closest to tau_I = 1 (or ray end if thin)
    dist = jnp.abs(tau_i - 1.0)
    taudex = jnp.argmin(dist, axis=-1).astype(jnp.int32)
    thin = tau_i[..., -1] < 1.0
    taudex = jnp.where(thin, lam.shape[-1] - 1, taudex)

    def at_dex(q):
        return jnp.take_along_axis(q, taudex[..., None], axis=-1)[..., 0]

    out = [at_dex(t) for t in taus]
    # emissivity-weighted averages
    w = j[..., 0] * jnp.exp(-jnp.minimum(tau_i, 300.0))
    w = jnp.where(ok, w, 0.0)
    wsum = cum(w)
    beta_pl = fv.p * 2.0 / jnp.maximum(fv.bmag, 1e-37) ** 2
    quants = [geo.x[..., 1], geo.x[..., 2], geo.x[..., 3], ei.ncgs,
              ei.tcgs, ei.bcgs, beta_pl,
              jnp.sign(jnp.cos(geo.x[..., 2]))]
    safe = jnp.maximum(at_dex(wsum), 1e-37)
    for q in quants:
        out.append(at_dex(cum(w * q)) / safe)
    # linear-polarization-weighted quantities from the Stokes profile
    lp = jnp.sqrt(prof[..., 0] ** 2 + prof[..., 1] ** 2)
    dlp = jnp.abs(lp[..., :-1] - lp[..., 1:])   # per-cell LP growth
    dsum = jnp.maximum(jnp.sum(dlp, axis=-1), 1e-37)
    mid = lambda q: 0.5 * (q[..., 1:] + q[..., :-1])
    for q in [geo.x[..., 1], geo.x[..., 2], taus[4], taus[5],
              jnp.sign(jnp.cos(geo.x[..., 2]))]:
        out.append(jnp.sum(dlp * mid(q), axis=-1) / dsum)
    return jnp.stack(out, axis=-1)


def render_rays(geo, fv, ei, ename, freqs, mu0, alpha, beta, a, mbh,
                sp: SourceParams, iname="lsoda", nvals=4,
                standard=1, extra=0, debug=False, prec="f64"):
    """Render observed Stokes for one camera and a list of frequencies.

    geo: GeodesicBundle; fv: FluidVars; ei: EmisInputs (cgs);
    freqs: (nfreq,) observed frequencies [Hz].
    Returns ivals (nfreq, npix, nvals); with debug=True returns
    (ivals, dbg) where dbg holds every intermediate array of the
    pipeline (the reference's debug=1 geodebug dump,
    grtrans_driver.f90:91-110,341-427 / read_geodebug_file.py) —
    geodesic coordinates, fluid state, tetrad angles, per-frequency
    coefficients and Stokes profiles — so any pixel can be re-integrated
    in isolation (reference ray_integrate.py)."""
    r = geo.x[..., 1]
    th = geo.x[..., 2]
    # sanitize the fluid four-vectors BEFORE the tetrad projection: a NaN
    # primal anywhere in the graph poisons parameter VJPs even when the
    # corresponding output is masked (0 * NaN = NaN in the backward pass)
    okf = (jnp.all(jnp.isfinite(fv.u), axis=-1)
           & jnp.all(jnp.isfinite(fv.b), axis=-1))
    u_safe = jnp.where(okf[..., None], fv.u,
                       jnp.array([1.0, 0.0, 0.0, 0.0]))
    b_safe = jnp.where(okf[..., None], fv.b,
                       jnp.array([0.0, 0.0, 0.0, 1.0]))
    # mixed precision: the tetrad projection is local algebra (no long
    # phase accumulation), so under prec='mixed' it runs in f32 too —
    # ~1e-6 angle error against 1e-2 regression bars; validated by
    # tests/test_precision.py (whole-image bar 2e-3)
    _mx = (prec == "mixed") and not (standard == 2
                                     or geo.x.shape[-2] == 1)
    if _mx:
        _f = jnp.float32
        s2xi, c2xi, ang, g, cosne, frame_ok = tetrad.comoving_ortho(
            r.astype(_f), th.astype(_f), a,
            alpha.astype(_f)[:, None], beta.astype(_f)[:, None], mu0,
            u_safe.astype(_f), b_safe.astype(_f), geo.k.astype(_f))
    else:
        s2xi, c2xi, ang, g, cosne, frame_ok = tetrad.comoving_ortho(
            r, th, a, alpha[:, None], beta[:, None], mu0, u_safe, b_safe,
            geo.k)
    # explicit finite-ness masking: fluid models legitimately produce NaN
    # four-velocities where their flow is unphysical (e.g. static gas
    # inside the ergosphere) and the reference relies on NaN propagation
    # + hand checks (grtrans_driver.f90:160-170); NaN semantics of min/max
    # differ across backends, so the mask must be explicit.
    ok = (geo.valid & okf & frame_ok
          & jnp.isfinite(g) & jnp.isfinite(s2xi) & jnp.isfinite(c2xi)
          & jnp.isfinite(ang))
    s2xi = jnp.where(ok, s2xi, 0.0)
    c2xi = jnp.where(ok, c2xi, 1.0)
    ang = jnp.where(ok, ang, jnp.pi / 2.0)
    cosne = jnp.where(ok & jnp.isfinite(cosne), cosne, 0.5)
    g = jnp.where(ok, g, 1.0)
    g = jnp.clip(g, 1e-8, 1e8)
    lbh = pc.lbh(mbh)
    thin_pol = (standard == 2) and ename.upper() == "BBPOL" and nvals == 4
    if thin_pol:
        # Chandrasekhar scattering polarization rotated to the observer
        # basis (grtrans_driver.f90:483-505 transpol)
        from grtrans_tpu.emis.chandra import interp_chandra
        q2b = (beta ** 2 + (alpha ** 2 - a * a) * mu0 ** 2)[:, None]
        c2psi, s2psi, cosne2 = kerr.calc_polar_psi(
            r, jnp.cos(th), q2b, a, alpha[:, None], beta[:, None], g, mu0,
            geo.k)
        chI, chd = interp_chandra(cosne2)

    # stype='tail': per-sample gamma_min + nonthermal density from the
    # thermal population (reference fluid.f90:1641-1678)
    from grtrans_tpu.fluid.base import apply_source_params
    ei, gmin_eff = apply_source_params(ei, sp)

    # mixed precision (prec='mixed'): the COEFFICIENT KERNELS and the
    # WHOLE Stokes solve run in f32 — they dominate the TPU cycle count
    # (transcendental- and 4x4-algebra-heavy; v5e has no native f64, so
    # every f64 op is emulated) and every cgs quantity fits f32 range
    # after the ratio-first restructuring; measured coefficient error
    # vs f64 is <1e-3 against 1e-2 regression tolerances
    # (tests/test_precision.py).  Geodesics and the tetrad stay f64,
    # the affine parameter stays f64 into the solver, and the Faraday
    # rotation phase (the one quantity that genuinely needs f64: it
    # reaches 1e5-1e6 radians on rotation-thick rays, beyond f32's
    # absolute phase resolution) is formed in f64 and range-reduced
    # mod 2pi before the f32 trig inside _calc_O.
    mixedp = (prec == "mixed") and not (standard == 2
                                        or geo.x.shape[-2] == 1)
    if mixedp:
        f32 = jnp.float32

        def _c(x):
            return None if x is None else jnp.asarray(x).astype(f32)

        ei = type(ei)(*[_c(v) for v in ei])
        if hasattr(gmin_eff, "astype"):
            gmin_eff = gmin_eff.astype(f32)
        ang = _c(ang)
        cosne = _c(cosne)
        s2xi = _c(s2xi)
        c2xi = _c(c2xi)
    g_tr = g.astype(jnp.float32) if mixedp else g
    lam_tr = geo.lam

    dbg = {}
    if debug:
        dbg.update(x=geo.x, kvec=geo.k, lam=geo.lam, mino=geo.mino,
                   tpm=geo.tpm, tpr=geo.tpr, valid=geo.valid,
                   u=fv.u, b=fv.b, rho=fv.rho, p=fv.p, bmag=fv.bmag,
                   ncgs=ei.ncgs, tcgs=ei.tcgs, bcgs=ei.bcgs,
                   ncgsnth=ei.ncgsnth, s2xi=s2xi, c2xi=c2xi, ang=ang,
                   g=g, cosne=cosne, ok=ok)

    # profiling cut points (scripts/render_attrib.py): return right
    # after a stage so the fused program up to there can be timed;
    # OFF in production (env unset) — costs nothing when disabled
    _upto = os.environ.get("GRTRANS_RENDER_UPTO")
    if _upto == "tetrad":
        return (s2xi + c2xi + ang + g + cosne)[None, ..., None]

    out = []
    for fghz in freqs:
        nu = fghz / g_tr
        if mixedp:
            nu = nu.astype(jnp.float32)
        e = calc_emissivity(ename, nu, ei, ang, cosne, sp, gmin=gmin_eff)
        if _upto == "coeffs":
            return e[None]
        if sp.coefindx is not None:
            # zero de-selected absorption/rotation coefficients
            # (emis.f90:557-558 usecoefs; epcoefindx in pgrtrans.f90:19)
            cmask = jnp.concatenate([
                jnp.ones(4, dtype=e.dtype),
                jnp.asarray(sp.coefindx, dtype=e.dtype)])
            e = e * cmask
        e = jnp.where(ok[..., None], e, 0.0)
        e = jnp.where(jnp.isfinite(e), e, 0.0)
        j, K = framework.split_e(e)
        if standard == 2 or geo.x.shape[-2] == 1:
            # thin-disk single-point branch (grtrans_driver.f90:295-312)
            if thin_pol:
                j1 = j[..., 0] * chI
                j = j.at[..., 0].set(j1)
                j = j.at[..., 1].set(j1 * c2psi * chd)
                j = j.at[..., 2].set(j1 * s2psi * chd)
                j = j.at[..., 3].set(0.0)
            j = framework.invariant_intensity(j, g, 3)
            j = jnp.where(ok[..., None], j, 0.0)
            j = jnp.where(jnp.isfinite(j), j, 0.0)
            Iobs = j[..., -1, :]
        else:
            if nvals == 4:
                j, K = framework.rotate_emis(j, K, s2xi, c2xi)
            j, K = framework.invariant_emis(j, K, g_tr)
            # cgs per unit geometric path (grtrans_driver.f90:217,228)
            j = j * lbh
            K = K * lbh
            if _upto == "presolve":
                return jnp.concatenate([j, K], -1)[None]
            if extra or debug:
                prof = solvers.integrate(lam_tr, j, K, method=iname,
                                         mask=ok)
                Iobs = prof[..., 0, :]
            else:
                # observer row only: the fast formal path skips the
                # whole per-sample profile materialization
                Iobs = solvers.observed_stokes(lam_tr, j, K,
                                               method=iname, mask=ok)
        res = Iobs[..., :nvals]
        if extra and not (standard == 2 or geo.x.shape[-2] == 1):
            ex = _extra_channels(geo, fv, ei, j, K, prof, ok)
            res = jnp.concatenate([res, ex], axis=-1)
        if debug:
            kf = len(out)
            dbg[f"nu_{kf}"] = nu
            dbg[f"j_{kf}"] = j
            dbg[f"K_{kf}"] = K
            if not (standard == 2 or geo.x.shape[-2] == 1):
                dbg[f"prof_{kf}"] = prof
        out.append(res)
    ivals = jnp.stack(out, axis=0)
    if mixedp:
        ivals = ivals.astype(jnp.float64)      # API dtype stability
    if debug:
        return ivals, dbg
    return ivals
