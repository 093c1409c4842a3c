"""FFJET golden ablation #4: the reference's exact FLUID-SAMPLING
conventions (docs/FFJET_GOLDEN_ANALYSIS.md "what remains").

Renders the golden config with FFJet(ref_conventions=True) — cell
indices from int() truncation, fractional weights from the dump's own
f32 grid values (unclipped, extrapolating), and the reference's
outside-grid fills (fluid_model_ffjet.f90:83-135) — and measures the
image delta against the default sampler and the golden pickle.
Writes artifacts/FFJET_SAMPLING_ABLATION.json.

Run on CPU:  JAX_PLATFORMS=cpu python scripts/ffjet_sampling_ablation.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import pickle
    from grtrans_tpu.config import GrtransConfig
    from grtrans_tpu.orchestrator import grtrans_run
    from grtrans_tpu.fluid.base import load_fluid_model

    base = dict(fname="FFJET", ename="POLSYNCHPL", nvals=4,
                spin=0.998, standard=1, nn=(100, 100, 400),
                uout=0.01, mbh=3.4e9, mumin=0.906, mumax=0.906,
                nfreq=1, fmin=3.45e11, fmax=3.45e11,
                gridvals=(-40.0, 20.0, -20.0, 40.0),
                fargs=dict(ntscl=2.0, nrscl=70.0))
    with open("/root/reference/test_grtrans_ffjet.p", "rb") as f:
        gold = pickle.load(f, encoding="latin1")

    def render(model):
        iv, _, _ = grtrans_run(GrtransConfig(iname="lsoda", **base),
                               model=model)
        return iv.transpose(1, 2, 0)

    def resid(ours):
        tot = float(np.sum(np.abs(ours - gold)) / np.sum(np.abs(gold)))
        ionly = float(np.sum(np.abs(ours[:, 0, 0] - gold[:, 0, 0]))
                      / np.sum(np.abs(gold[:, 0, 0])))
        return tot, ionly

    ours = render(load_fluid_model("FFJET", ntscl=2.0, nrscl=70.0))
    tot0, i0 = resid(ours)
    print(f"default sampler       : total {tot0:.5f}  I {i0:.5f}")

    mref = load_fluid_model("FFJET", ntscl=2.0, nrscl=70.0,
                            ref_conventions=True)
    ours_ref = render(mref)
    tot1, i1 = resid(ours_ref)
    print(f"reference conventions : total {tot1:.5f}  I {i1:.5f}")
    swap = float(np.sum(np.abs(ours_ref - ours)) / np.sum(np.abs(ours)))
    print(f"convention-swap effect: {swap:.6f} rel L1 on the image")

    art = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                       "FFJET_SAMPLING_ABLATION.json")
    with open(art, "w") as f:
        json.dump({"default_sampler": {"total": tot0, "I": i0},
                   "reference_sampling_conventions":
                       {"total": tot1, "I": i1},
                   "convention_swap_rel_l1": swap,
                   "config": "FFJET golden 100x100x400 lsoda"}, f,
                  indent=1)
    print("wrote", art)


if __name__ == "__main__":
    main()
