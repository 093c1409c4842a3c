"""Per-stage TPU timing of the flagship FFJET render: geodesics vs
fluid vs tetrad vs coefficients vs Stokes solver, in BOTH the f64 and
the mixed-precision (f32 + f64-reduced phases) paths, plus XLA
cost-analysis FLOP counts.  Writes artifacts/PROFILE_r03.json.

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
              "stages_ms": {}, "stages_ms_mixed": {}}

    trace = jax.jit(lambda al, be, l, q2, sm: geokerr.trace(
        a, mu0, al, be, l, q2, sm, cam.u0, npts, uout=0.01))
    t = timeit(trace, cam.alpha, cam.beta, cam.l, cam.q2, cam.sm)
    result["stages_ms"]["geodesics"] = round(t * 1e3, 1)
    print(f"geodesics: {t*1e3:9.1f} ms")
    geo = trace(cam.alpha, cam.beta, cam.l, cam.q2, cam.sm)

    f32 = jnp.float32
    for prec in ("f64", "mixed"):
        key = "stages_ms" if prec == "f64" else "stages_ms_mixed"
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
        lam = geo.lam
        solve = jax.jit(lambda lam, j, K: solvers.formal_solve(lam, j, K))
        t = timeit(solve, lam, j, K)
        result[key]["solver"] = round(t * 1e3, 1)
        print(f"solver({prec}): {t*1e3:9.1f} ms")

    # full jitted pipeline (trace + fluid + tetrad + coeffs + solve),
    # both precisions, + XLA cost-analysis flops
    for prec in ("f64", "mixed"):
        key = "stages_ms" if prec == "f64" else "stages_ms_mixed"

        def full_fn(al, be, l, q2, sm, _prec=prec):
            geo = geokerr.trace(a, mu0, al, be, l, q2, sm, cam.u0, npts,
                                uout=0.01)
            if _prec == "mixed":
                xs, ks = geo.x.astype(f32), geo.k.astype(f32)
            else:
                xs, ks = geo.x, geo.k
            fv = model.vals(xs, ks, a)
            ei = model.convert(fv, sp)
            return driver.render_rays(geo, fv, ei, "POLSYNCHPL",
                                      [3.45e11], mu0, al, be, a, 3.4e9,
                                      sp, iname="formal", nvals=4,
                                      prec=_prec)
        full = jax.jit(full_fn)
        cargs = (cam.alpha, cam.beta, cam.l, cam.q2, cam.sm)
        t = timeit(full, *cargs)
        result[key]["full"] = round(t * 1e3, 1)
        fl = flops_of(full, *cargs)
        if fl:
            result["flops_per_frame_" + prec] = fl
            result["flops_per_pixel" if prec == "mixed" else
                   "flops_per_pixel_f64"] = fl / npix
        print(f"full({prec}):   {t*1e3:9.1f} ms"
              + (f"  flops/frame {fl:.3g}" if fl else ""))

    # v5e peak: 197 TFLOP/s bf16 (conventional MFU denominator); the
    # workload is VPU/elementwise-bound, so MFU vs MXU peak is the
    # honest headline of how far from "speed of light" this render is
    result["peak_flops"] = 197e12
    if "flops_per_frame_mixed" in result:
        dt = result["stages_ms_mixed"]["full"] / 1e3
        result["mfu_mixed_vs_bf16_peak"] = (
            result["flops_per_frame_mixed"] / dt / result["peak_flops"])
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "PROFILE_r03.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
