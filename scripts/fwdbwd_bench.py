"""Forward+backward flagship benchmark (BASELINE.json north-star:
"forward+backward at speed-of-light per chip").

Times jax.value_and_grad of a scalar image loss THROUGH the full
flagship render — FFJET 100x100x400 polarized power-law synchrotron —
w.r.t. (spin, mu0): gradients flow through the photon constants of
motion, the semi-analytic geodesics, the fluid sampling, the comoving
tetrad, the coefficients, and the Stokes march.  Reports ms/frame for
forward-only and fwd+bwd in both f64 and mixed, plus the live-buffer
memory of each compiled program.

Run alone on the chip:  python scripts/fwdbwd_bench.py
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
    from grtrans_tpu.tools.invert import InverseProblem

    ffjet_file = "/root/reference/m87bl09rfp10xi5a998fluidvars.bin"
    assert os.path.exists(ffjet_file)
    rec = {"device": str(jax.devices()[0]), "npix": 10000, "npts": 400,
           "config": "FFJET POLSYNCHPL 100x100x400, grad wrt (spin, mu0)"}

    for prec in ("mixed", "f64"):
        prob = InverseProblem(fname="FFJET", ename="POLSYNCHPL",
                              iname="formal", freq=3.45e11, mbh=3.4e9,
                              nn=(100, 100, 400),
                              gridvals=(-40.0, 20.0, -20.0, 40.0),
                              prec=prec,
                              fixed=dict(ntscl=2.0, nrscl=70.0))

        def loss(params):
            img = prob.render(params)
            return jnp.mean(jnp.abs(img))

        p0 = dict(spin=jnp.asarray(0.9), mu0=jnp.asarray(0.9))

        def timed(fn, tag):
            t0 = time.time()
            c = jax.jit(fn).lower(p0).compile()
            tc = time.time() - t0
            out = c(p0)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            t0 = time.time()
            nrep = 5
            for _ in range(nrep):
                out = c(p0)
                np.asarray(jax.tree_util.tree_leaves(out)[0])
            dt = (time.time() - t0) / nrep * 1e3
            mem = None
            try:
                mem = c.memory_analysis().temp_size_in_bytes
            except Exception:
                pass
            rec[f"{prec}_{tag}_ms"] = round(dt, 1)
            rec[f"{prec}_{tag}_compile_s"] = round(tc, 1)
            if mem is not None:
                rec[f"{prec}_{tag}_temp_mb"] = round(mem / 1e6, 1)
            return out

        timed(loss, "fwd")
        g = timed(jax.value_and_grad(loss), "fwdbwd")
        val, grad = g
        rec[f"{prec}_grad_finite"] = bool(np.isfinite(
            np.asarray([grad["spin"], grad["mu0"]])).all())

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "FWDBWD_BENCH.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
