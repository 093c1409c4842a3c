"""Non-toy inverse rendering (BASELINE.json configs[4]: "hotspot +
HARM" EHT-like fitting) at a 32x32 camera — the round-4 verdict's
scaled-up version of tests/test_inverse.py's 6x6 SARIAF fit.

Two problems, both through the FULL differentiable renderer:

  * HOTSPOT: recover (spin, r0spot, n0spot) — the spot's orbital
    radius and density plus the hole's spin — from a polarized 32x32
    image.  The spot is a localized Gaussian, so the loss basin is
    narrow; the fit starts at EHT-prior-like offsets (spin 0.7 vs 0.9,
    r0spot 7 vs 6, n0spot 2e7 vs 4e7), the regime a production
    pipeline's local stage works in (wrapped by a coarse global
    search, exactly like reference pgriter's secant loop is wrapped by
    humans).
  * HARM (synthetic MKS dump, tests/test_harm.py fixture): recover
    (spin, mu0) — geometry through the GRMHD sampler — with the dump
    held fixed as data.

Writes artifacts/INVERSE_SCALED.json.  Run on CPU:
    JAX_PLATFORMS=cpu python scripts/inverse_scaled.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from grtrans_tpu.tools.invert import InverseProblem, fit_image

    rec = {}

    # ---------------- HOTSPOT ----------------
    prob = InverseProblem(fname="HOTSPOT", ename="POLSYNCHPL",
                          iname="formal", nn=(32, 32, 48),
                          gridvals=(-12.0, 12.0, -12.0, 12.0),
                          fixed=dict(mu0=0.5, rspot=1.5))
    truth = dict(spin=0.9, r0spot=6.0, n0spot=4e7)
    target = prob.render({k: jnp.asarray(v) for k, v in truth.items()})
    start = dict(spin=0.7, r0spot=7.0, n0spot=2e7)
    t0 = time.time()
    best, losses = fit_image(prob, target, start, steps=60, lr=0.1)
    rec["hotspot"] = {
        "camera": "32x32x48", "truth": truth, "start": start,
        "best": best, "loss0": losses[0], "loss_min": min(losses),
        "steps": 60, "fit_s": round(time.time() - t0, 1),
        "spin_err": abs(best["spin"] - truth["spin"]),
        "r0spot_rel_err": abs(best["r0spot"] / truth["r0spot"] - 1.0),
        "n0spot_rel_err": abs(best["n0spot"] / truth["n0spot"] - 1.0)}
    print(json.dumps(rec["hotspot"], indent=1), flush=True)

    # ---------------- HARM (synthetic dump) ----------------
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    from test_harm import _synthetic_dump, A as HARM_A
    dump = _synthetic_dump()
    prob2 = InverseProblem(fname="HARM", ename="POLSYNCHTH",
                           iname="formal", freq=2.3e11, mbh=4e6,
                           nn=(32, 32, 48),
                           gridvals=(-15.0, 15.0, -15.0, 15.0),
                           fixed=dict(dump=dump))
    truth2 = dict(spin=float(HARM_A), mu0=0.7)
    target2 = prob2.render({k: jnp.asarray(v) for k, v in truth2.items()})
    start2 = dict(spin=0.7, mu0=0.55)
    t0 = time.time()
    best2, losses2 = fit_image(prob2, target2, start2, steps=60, lr=0.1)
    rec["harm"] = {
        "camera": "32x32x48", "truth": truth2, "start": start2,
        "best": best2, "loss0": losses2[0], "loss_min": min(losses2),
        "steps": 60, "fit_s": round(time.time() - t0, 1),
        "spin_err": abs(best2["spin"] - truth2["spin"]),
        "mu0_err": abs(best2["mu0"] - truth2["mu0"])}
    print(json.dumps(rec["harm"], indent=1), flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "INVERSE_SCALED.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
