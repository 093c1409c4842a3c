"""Inside-trace attribution on the TPU at flagship size (100^2 x 400,
mixed): which parts of the geodesic stage cost what.

Variants (each timed as a standalone jit of trace(), sync by fetching a
scalar):
  full           — production path (coarse=4, windowed radial quadrature)
  no_window      — _PHASE_WINDOW=False (full dual-space radial quadrature)
  coarse1        — coarse=1 (Weierstrass at every fine node)
  nq4            — NQ_SEG=4 (accuracy-rejected in r4; cost share only)
  nophase        — phase quadrature replaced by zeros (floor: setup +
                   Weierstrass + wavevector)

Writes artifacts/TRACE_ATTRIB.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from grtrans_tpu.geodesics import camera as cam_mod, geokerr

    a, mu0 = 0.998, 0.906
    cam = cam_mod.make_camera(a, mu0, -40.0, 20.0, -20.0, 40.0, 100, 100)
    npts = 400
    args = (cam.alpha, cam.beta, cam.l, cam.q2, cam.sm, cam.u0, npts)

    def timeit(fn, nrep=5):
        out = fn()
        np.asarray(out.x[:1, :1, :1])
        t0 = time.time()
        for _ in range(nrep):
            out = fn()
            np.asarray(out.x[:1, :1, :1])
        return (time.time() - t0) / nrep * 1e3

    rec = {"device": str(jax.devices()[0]), "npix": 10000, "npts": npts}

    rec["full_ms"] = round(timeit(lambda: geokerr.trace(
        a, mu0, *args, uout=0.01, prec="mixed", coarse=4)), 1)

    geokerr._PHASE_WINDOW = False
    rec["no_window_ms"] = round(timeit(lambda: geokerr.trace(
        a, mu0, *args, uout=0.01, prec="mixed", coarse=4,
        node_interp=True)), 1)
    geokerr._PHASE_WINDOW = True

    rec["coarse1_ms"] = round(timeit(lambda: geokerr.trace(
        a, mu0, *args, uout=0.01, prec="mixed", coarse=1)), 1)

    old_nq = geokerr.NQ_SEG
    geokerr.NQ_SEG = 4
    rec["nq4_ms"] = round(timeit(lambda: geokerr.trace(
        a, mu0, *args, uout=0.01, prec="mixed", coarse=4)), 1)
    geokerr.NQ_SEG = old_nq

    # floor: stub the cumulative phases (keeps setup, Weierstrass fill,
    # signs, wavevector)
    orig = geokerr._cumulative_phases

    def stub(st, aa, l, lam_grid, **kw):
        z = jnp.zeros(lam_grid.shape[:1] + (lam_grid.shape[-1],),
                      jnp.float64)
        return z, z, z

    geokerr._cumulative_phases = stub
    try:
        rec["nophase_ms"] = round(timeit(lambda: jax.jit(
            geokerr.trace.__wrapped__,
            static_argnames=("npts", "node_interp", "prec", "coarse"))(
            a, mu0, *args, uout=0.01, prec="mixed", coarse=4)), 1)
    finally:
        geokerr._cumulative_phases = orig

    # f64 full for reference
    rec["full_f64_ms"] = round(timeit(lambda: geokerr.trace(
        a, mu0, *args, uout=0.01, prec="f64", coarse=1)), 1)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "TRACE_ATTRIB.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
