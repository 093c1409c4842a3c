"""Per-stage TPU timing of the flagship FFJET render: geodesics vs
fluid+coefficients vs Stokes solver.  Run on the chip to see where the
cycles go (jax profiler traces are unavailable through the remote
tunnel, so this times jitted sub-stages with real shapes)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, nrep=3):
    out = fn(*args)
    out = [x.block_until_ready() if hasattr(x, "block_until_ready")
           else x for x in (out if isinstance(out, tuple) else (out,))]
    t0 = time.time()
    for _ in range(nrep):
        out = fn(*args)
        out = [x.block_until_ready() if hasattr(x, "block_until_ready")
               else x for x in (out if isinstance(out, tuple) else (out,))]
    return (time.time() - t0) / nrep


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
    print(f"platform={jax.devices()[0].platform} npix={nro*nro} npts={npts}")

    trace = jax.jit(lambda al, be, l, q2, sm: geokerr.trace(
        a, mu0, al, be, l, q2, sm, cam.u0, npts, uout=0.01))
    t = timeit(trace, cam.alpha, cam.beta, cam.l, cam.q2, cam.sm)
    print(f"geodesics: {t*1e3:9.1f} ms")
    geo = trace(cam.alpha, cam.beta, cam.l, cam.q2, cam.sm)

    fluid = jax.jit(lambda x, k: model.vals(x, k, a))
    t = timeit(fluid, geo.x, geo.k)
    print(f"fluid:     {t*1e3:9.1f} ms")
    fv = fluid(geo.x, geo.k)
    ei = model.convert(fv, sp)

    tet = jax.jit(lambda r, th, u, b, k: tetrad.comoving_ortho(
        r, th, a, cam.alpha[:, None], cam.beta[:, None], mu0, u, b, k))
    t = timeit(tet, geo.x[..., 1], geo.x[..., 2], fv.u, fv.b, geo.k)
    print(f"tetrad:    {t*1e3:9.1f} ms")

    from grtrans_tpu.emis import polsynchpl as pl_mod
    coef = jax.jit(lambda nu, n, b, ang: pl_mod.polsynchpl(
        nu, n, b, ang, 3.5, 100.0, 1e5))
    ang = jnp.full(geo.x.shape[:2], 1.0)
    nu = jnp.full(geo.x.shape[:2], 3.45e11)
    t = timeit(coef, nu, ei.ncgsnth, ei.bcgs, ang)
    print(f"coeffs:    {t*1e3:9.1f} ms")
    e = coef(nu, ei.ncgsnth, ei.bcgs, ang)

    j = e[..., :4]
    K = jnp.concatenate([e[..., 4:8], e[..., 8:11]], axis=-1)
    lam = geo.lam
    solve = jax.jit(lambda lam, j, K: solvers.formal_solve(lam, j, K))
    t = timeit(solve, lam, j, K)
    print(f"solver:    {t*1e3:9.1f} ms")

    full = jax.jit(lambda al, be, l, q2, sm: driver.render_rays(
        trace(al, be, l, q2, sm), fv, ei, "POLSYNCHPL", [3.45e11], mu0,
        al, be, a, 3.4e9, sp, iname="formal", nvals=4))
    t = timeit(full, cam.alpha, cam.beta, cam.l, cam.q2, cam.sm)
    print(f"full:      {t*1e3:9.1f} ms")


if __name__ == "__main__":
    main()
