"""Forward+backward flagship benchmark (BASELINE.json north-star:
"forward+backward at speed-of-light per chip").

Times jax.value_and_grad of a scalar image loss THROUGH the full
flagship render — FFJET 100x100x400 polarized power-law synchrotron —
w.r.t. (spin, mu0): gradients flow through the photon constants of
motion, the semi-analytic geodesics, the fluid sampling, the comoving
tetrad, the coefficients, and the Stokes march.

Reverse-mode at this size cannot hold every stage's (npix, npts)
residuals in 16 GB HBM (measured 47.6 GB requested), so the production
recipe is what this bench measures: per-stage jax.checkpoint
(InverseProblem.render) + gradient accumulation over camera chunks
(rays are independent — parameter grads add).  Reports ms/frame for
forward-only (full camera) and fwd+bwd (sum over chunks) in mixed and
f64, plus the number of chunks that fit.

Run alone on the chip:  python scripts/fwdbwd_bench.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "FWDBWD_BENCH.json")


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from grtrans_tpu.tools.invert import InverseProblem

    ffjet_file = "/root/reference/m87bl09rfp10xi5a998fluidvars.bin"
    assert os.path.exists(ffjet_file)
    npix = 10000
    rec = {"device": str(jax.devices()[0]), "npix": npix, "npts": 400,
           "config": "FFJET POLSYNCHPL 100x100x400, grad wrt (spin, mu0)",
           "recipe": "per-stage jax.checkpoint + pixel-chunk grad accum"}

    def save():
        with open(OUT, "w") as f:
            json.dump(rec, f, indent=1)

    for prec, nchunk in (("mixed", 4), ("f64", 10)):
        prob = InverseProblem(fname="FFJET", ename="POLSYNCHPL",
                              iname="formal", freq=3.45e11, mbh=3.4e9,
                              nn=(100, 100, 400),
                              gridvals=(-40.0, 20.0, -20.0, 40.0),
                              prec=prec,
                              fixed=dict(ntscl=2.0, nrscl=70.0))
        p0 = dict(spin=jnp.asarray(0.9), mu0=jnp.asarray(0.9))

        # forward-only, full camera
        fwd = jax.jit(lambda q: jnp.mean(jnp.abs(prob.render(q))))
        t0 = time.time()
        out = fwd(p0)
        np.asarray(out)
        rec[f"{prec}_fwd_compile_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        for _ in range(5):
            np.asarray(fwd(p0))
        rec[f"{prec}_fwd_ms"] = round((time.time() - t0) / 5 * 1e3, 1)
        save()

        # fwd+bwd over camera chunks (grad accumulation)
        csz = npix // nchunk

        def chunk_loss(q, lo):
            img = prob.render(q, pix=(lo, lo + csz))
            return jnp.sum(jnp.abs(img)) / (npix * 4)

        vgs = [jax.jit(lambda q, _lo=lo: jax.value_and_grad(
            chunk_loss)(q, _lo)) for lo in range(0, npix, csz)]
        t0 = time.time()
        outs = [vg(p0) for vg in vgs]
        np.asarray(outs[-1][0])
        rec[f"{prec}_fwdbwd_compile_s"] = round(time.time() - t0, 1)
        grad = {k: sum(float(o[1][k]) for o in outs) for k in p0}
        rec[f"{prec}_grad"] = grad
        rec[f"{prec}_grad_finite"] = bool(np.isfinite(
            np.asarray(list(grad.values()))).all())
        t0 = time.time()
        nrep = 3
        for _ in range(nrep):
            outs = [vg(p0) for vg in vgs]
            for o in outs:
                np.asarray(o[0])
        rec[f"{prec}_fwdbwd_ms"] = round((time.time() - t0) / nrep * 1e3, 1)
        rec[f"{prec}_chunks"] = nchunk
        save()
        print(json.dumps({k: v for k, v in rec.items()
                          if k.startswith(prec)}, indent=1), flush=True)

    save()
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
