"""Per-stage TPU timing of the flagship FFJET render.

Two views, both written to artifacts/PROFILE_r05.json:

  * `stages_ms` / `stages_ms_mixed` — STANDALONE stage timings (each
    stage jitted alone; includes HBM materialization of its inputs and
    outputs, so the numbers over-state fused cost but expose per-stage
    scaling).
  * `fused_ms` — CUMULATIVE-VARIANT timings of the real fused program:
    trace-only, trace+fluid, +tetrad, +coefficients, full.  Differences
    between consecutive variants attribute wall-clock WITHIN the fused
    frame — the honest budget the bench number is made of.

Run alone on the chip (one process owns the TPU):
    python scripts/tpu_profile.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _sync(out):
    """Force completion by FETCHING a scalar from every output array:
    on the tunneled backend block_until_ready alone has been observed
    to return before the computation is really done (timings 1000x too
    small); a device->host transfer cannot lie."""
    import jax
    import numpy as _np

    def one(x):
        if hasattr(x, "ndim") and getattr(x, "ndim", 0) > 0:
            return _np.asarray(x[(0,) * x.ndim])
        if hasattr(x, "block_until_ready"):
            return _np.asarray(x)
        return x
    return jax.tree_util.tree_map(one, out)


def timeit(fn, *args, nrep=3):
    _sync(fn(*args))
    t0 = time.time()
    for _ in range(nrep):
        _sync(fn(*args))
    return (time.time() - t0) / nrep


def flops_of(jitted, *args):
    try:
        c = jitted.lower(*args).compile()
        an = c.cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return float(an.get("flops", 0.0))
    except Exception:
        return None


def main():
    import jax
    import jax.numpy as jnp
    from grtrans_tpu.geodesics import camera as cam_mod, geokerr
    from grtrans_tpu.geometry import tetrad
    from grtrans_tpu import driver
    from grtrans_tpu.integrate import solvers
    from grtrans_tpu.fluid.base import load_fluid_model, SourceParams
    from grtrans_tpu.fluid import ffjet  # noqa: F401

    nro = int(os.environ.get("NPIX_SIDE", "50"))
    npts = int(os.environ.get("NPTS", "400"))
    a, mu0 = 0.998, 0.906
    model = load_fluid_model("FFJET", ntscl=2.0, nrscl=70.0)
    sp = SourceParams(mbh=3.4e9, p1=3.5, gmin=100.0, gmax=1e5)
    cam = cam_mod.make_camera(a, mu0, -40.0, 20.0, -20.0, 40.0, nro, nro)
    npix = nro * nro
    print(f"platform={jax.devices()[0].platform} npix={npix} npts={npts}")
    result = {"npix": npix, "npts": npts,
              "device": str(jax.devices()[0]),
              "stages_ms": {}, "stages_ms_mixed": {}, "fused_ms": {}}
    cargs = (cam.alpha, cam.beta, cam.l, cam.q2, cam.sm)

    # ---------------- standalone stages (legacy view) ----------------
    for prec in ("f64", "mixed"):
        key = "stages_ms" if prec == "f64" else "stages_ms_mixed"
        trace = jax.jit(lambda al, be, l, q2, sm, _p=prec: geokerr.trace(
            a, mu0, al, be, l, q2, sm, cam.u0, npts, uout=0.01, prec=_p,
            coarse=(4 if _p == "mixed" and npts >= 256 else 1)))
        t = timeit(trace, *cargs)
        result[key]["geodesics"] = round(t * 1e3, 1)
        print(f"geodesics({prec}): {t*1e3:9.1f} ms")
        geo = trace(*cargs)

        f32 = jnp.float32
        cast = (lambda x: x.astype(f32)) if prec == "mixed" else (lambda x: x)
        fluid = jax.jit(lambda x, k: model.vals(x, k, a))
        xq, kq = cast(geo.x), cast(geo.k)
        t = timeit(fluid, xq, kq)
        result[key]["fluid"] = round(t * 1e3, 1)
        print(f"fluid({prec}):  {t*1e3:9.1f} ms")
        fv = fluid(xq, kq)
        ei = model.convert(fv, sp)

        tet = jax.jit(lambda r, th, u, b, k: tetrad.comoving_ortho(
            r, th, a, cast(cam.alpha)[:, None], cast(cam.beta)[:, None],
            mu0, u, b, k))
        targs = (cast(geo.x[..., 1]), cast(geo.x[..., 2]), fv.u, fv.b,
                 cast(geo.k))
        t = timeit(tet, *targs)
        result[key]["tetrad"] = round(t * 1e3, 1)
        print(f"tetrad({prec}): {t*1e3:9.1f} ms")

        from grtrans_tpu.emis import polsynchpl as pl_mod
        coef = jax.jit(lambda nu, n, b, ang: pl_mod.polsynchpl(
            nu, n, b, ang, 3.5, 100.0, 1e5))
        ang = jnp.full(geo.x.shape[:2], 1.0, dtype=xq.dtype)
        nu = jnp.full(geo.x.shape[:2], 3.45e11, dtype=xq.dtype)
        t = timeit(coef, nu, ei.ncgsnth, ei.bcgs, ang)
        result[key]["coeffs"] = round(t * 1e3, 1)
        print(f"coeffs({prec}): {t*1e3:9.1f} ms")
        e = coef(nu, ei.ncgsnth, ei.bcgs, ang)

        j = e[..., :4]
        K = e[..., 4:]
        solve = jax.jit(lambda lam, j, K: solvers.formal_solve(lam, j, K))
        t = timeit(solve, geo.lam, j, K)
        result[key]["solver"] = round(t * 1e3, 1)
        print(f"solver({prec}): {t*1e3:9.1f} ms")

    # -------- cumulative variants of the REAL fused program ----------
    def pipeline(al, be, l, q2, sm, upto, prec):
        geo = geokerr.trace(a, mu0, al, be, l, q2, sm, cam.u0, npts,
                            uout=0.01,
                            prec="mixed" if prec == "mixed" else "f64",
                            coarse=(4 if prec == "mixed"
                                    and npts >= 256 else 1))
        if upto == "trace":
            return geo.x.sum() + geo.k.sum() + geo.lam.sum()
        if prec == "mixed":
            xs, ks = geo.x.astype(jnp.float32), geo.k.astype(jnp.float32)
        else:
            xs, ks = geo.x, geo.k
        fv = model.vals(xs, ks, a)
        if upto == "fluid":
            return (fv.rho.sum() + fv.bmag.sum() + fv.u.sum()
                    + fv.b.sum() + geo.lam.sum())
        ei = model.convert(fv, sp)
        return driver.render_rays(geo, fv, ei, "POLSYNCHPL",
                                  [3.45e11], mu0, al, be, a, 3.4e9,
                                  sp, iname="formal", nvals=4,
                                  prec=prec).sum()

    for prec in ("mixed", "f64"):
        for upto in ("trace", "fluid", "full"):
            fn = jax.jit(lambda al, be, l, q2, sm, _u=upto, _p=prec:
                         pipeline(al, be, l, q2, sm, _u, _p))
            t = timeit(fn, *cargs)
            result["fused_ms"][f"{prec}_{upto}"] = round(t * 1e3, 1)
            print(f"fused {prec} upto={upto}: {t*1e3:9.1f} ms")
            if upto == "full":
                fl = flops_of(fn, *cargs)
                if fl:
                    result["flops_per_frame_" + prec] = fl
                    result["flops_per_pixel" if prec == "mixed" else
                           "flops_per_pixel_f64"] = fl / npix

    # v5e peak: 197 TFLOP/s bf16 (conventional MFU denominator); the
    # workload is VPU/elementwise-bound, so MFU vs MXU peak is the
    # honest headline of how far from "speed of light" this render is
    result["peak_flops"] = 197e12
    if "flops_per_frame_mixed" in result:
        dt = result["fused_ms"]["mixed_full"] / 1e3
        result["mfu_mixed_vs_bf16_peak"] = (
            result["flops_per_frame_mixed"] / dt / result["peak_flops"])
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "PROFILE_r05.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
