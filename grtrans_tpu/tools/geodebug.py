"""Single-ray debug dumps: the reference's debug=1 observability channel.

The reference runs a single pixel (i1=i2) with debug=1 and writes all 57
intermediate arrays to geodebug.out (grtrans_driver.f90:91-110,341-427;
schema read_geodebug_file.py), which ray_integrate.py re-integrates in
isolation — the driver's intermediate state is itself a test artifact.
Here the same capability is one function: `dump_ray` renders the
requested pixel(s) with the driver's debug channel on and saves every
intermediate (geodesic coordinates/wavevector/affine parameter, fluid
state, comoving-tetrad angles, per-frequency coefficient arrays and
Stokes profiles) to an .npz; `reintegrate` reproduces the pixel's
intensity from the dumped coefficients alone."""

import numpy as np

from grtrans_tpu.config import GrtransConfig
from grtrans_tpu.geodesics import camera as cam_mod
from grtrans_tpu.geodesics import geokerr
from grtrans_tpu import driver
from grtrans_tpu.fluid.base import load_fluid_model, SourceParams, CONST, TAIL
from grtrans_tpu.integrate import solvers


def dump_ray(cfg: GrtransConfig, i, path=None, model=None, mu_index=0,
             mdot_index=0):
    """Render pixel i (1-based, reference i1/i2 convention) of the first
    camera with the debug channel on.

    Returns the dump dict (numpy arrays, pixel axis length 1); if path
    is given also writes it as an .npz (plus the scalar run config)."""
    a = cfg.spin
    mu0 = float(cfg.mus()[mu_index])
    mdot = float(cfg.mdots()[mdot_index])
    a1, a2, b1, b2 = cfg.gridvals
    nro, nphi, nup = cfg.nn
    cam = cam_mod.make_camera(a, mu0, a1, a2, b1, b2, nro, nphi,
                              cfg.nrotype, cfg.rcut)
    lo = i - 1
    cam = cam._replace(alpha=cam.alpha[lo:i], beta=cam.beta[lo:i],
                       l=cam.l[lo:i], q2=cam.q2[lo:i], sm=cam.sm[lo:i])
    if model is None:
        model = load_fluid_model(cfg.fname, **cfg.fargs)
    sp = SourceParams(nfac=mdot, mbh=cfg.mbh, mdot=mdot, mu=cfg.muval,
                      gmin=cfg.gmin, gmax=cfg.gmax, p1=cfg.p1, p2=cfg.p2,
                      jetalpha=cfg.jetalpha,
                      stype=CONST if cfg.stype == "const" else TAIL,
                      sigcut=cfg.sigcut, otherargs=cfg.epotherargs,
                      coefindx=cfg.epcoefindx)
    uout = cfg.uout if cfg.uout > cam.u0 * 1.0001 else None
    if cfg.standard == 2:
        geo = geokerr.trace_polar(a, mu0, cam.alpha, cam.beta, cam.l,
                                  cam.q2, cam.sm, cam.u0, npts=1,
                                  phi0=cfg.phi0)
    else:
        geo = geokerr.trace(a, mu0, cam.alpha, cam.beta, cam.l, cam.q2,
                            cam.sm, cam.u0, nup, uout=uout, phi0=cfg.phi0)
    fv = model.vals(geo.x, geo.k, a)
    ei = model.convert(fv, sp)
    ivals, dbg = driver.render_rays(
        geo, fv, ei, cfg.ename, [float(f) for f in cfg.freqs()], mu0,
        cam.alpha, cam.beta, a, cfg.mbh, sp, iname=cfg.iname,
        nvals=cfg.nvals, standard=cfg.standard, extra=cfg.extra,
        debug=True)
    dump = {k: np.asarray(v) for k, v in dbg.items() if v is not None}
    dump["ivals"] = np.asarray(ivals)
    dump["alpha"] = np.asarray(cam.alpha)
    dump["beta"] = np.asarray(cam.beta)
    dump["pixel"] = np.asarray([i])
    dump["iname"] = np.asarray(cfg.iname)
    dump["nfreq"] = np.asarray(len(cfg.freqs()))
    if path is not None:
        np.savez(path, **dump)
    return dump


def load(path):
    """Load a geodebug dump as a dict of arrays."""
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


def reintegrate(dump, freq_index=0, method=None):
    """Re-run the Stokes integration from the dumped coefficient arrays
    alone (reference ray_integrate.py) — reproduces the dumped pixel."""
    lam = np.asarray(dump["lam"])
    j = np.asarray(dump[f"j_{freq_index}"])
    K = np.asarray(dump[f"K_{freq_index}"])
    ok = np.asarray(dump["ok"])
    method = method or str(dump.get("iname", "formal"))
    prof = solvers.integrate(lam, j, K, method=method, mask=ok)
    return np.asarray(prof[..., 0, :])
