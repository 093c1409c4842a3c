"""FFJET golden ablation (round 5): the golden pickle's own production
conditions — single-precision fluid arithmetic.

The reference's ENTIRE fluid stage runs in default `real` (f32): the
module arrays are f32 (fluid_model_ffjet.f90:12-22), and ffjet_vals
computes x1/x2, cos(theta), the cell weights rd/td, the bilinear
interpolation, the Kerr metric for bmag, and the LNRF frame transform
all in f32 (:43-178 — even the COORDINATES are truncated to f32).  Our
default golden render keeps the fluid stage in f64.

Variant B reproduces the reference's precision: FFJet.vals receives
f32-cast coordinates/wavevectors and its outputs are upcast to f64
afterward (exactly what the production prec='mixed' path does for this
stage).  Variant C adds every other reference-fidelity flag we have:
the reference's own cutoff tables + lookup semantics
(ffjet_golden_ablation.make_reference_g) and the reference's sampling
conventions (FFJet(ref_conventions=True)) — the closest this framework
can get to the golden's production conditions without executing
Fortran.

Writes artifacts/FFJET_F32_ABLATION.json.

Run on CPU:  JAX_PLATFORMS=cpu python scripts/ffjet_f32_ablation.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from ffjet_golden_ablation import parse_reference_tables, make_reference_g


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import pickle
    from grtrans_tpu.config import GrtransConfig
    from grtrans_tpu.orchestrator import grtrans_run
    from grtrans_tpu import orchestrator
    from grtrans_tpu.emis import polsynchpl as plmod
    from grtrans_tpu.fluid import ffjet as ffmod

    base = dict(fname="FFJET", ename="POLSYNCHPL", nvals=4,
                spin=0.998, standard=1, nn=(100, 100, 400),
                uout=0.01, mbh=3.4e9, mumin=0.906, mumax=0.906,
                nfreq=1, fmin=3.45e11, fmax=3.45e11,
                gridvals=(-40.0, 20.0, -20.0, 40.0))
    fargs = dict(ntscl=2.0, nrscl=70.0)
    with open("/root/reference/test_grtrans_ffjet.p", "rb") as f:
        gold = pickle.load(f, encoding="latin1")

    def render(**fa):
        iv, _, _ = grtrans_run(GrtransConfig(iname="lsoda",
                                             fargs={**fargs, **fa}, **base))
        return iv.transpose(1, 2, 0)

    def resid(ours):
        tot = float(np.sum(np.abs(ours - gold)) / np.sum(np.abs(gold)))
        ionly = float(np.sum(np.abs(ours[:, 0, 0] - gold[:, 0, 0]))
                      / np.sum(np.abs(gold[:, 0, 0])))
        return {"total": tot, "I": ionly}

    out = {}
    ours = render()
    out["A_default_f64"] = resid(ours)
    print("A default f64      :", out["A_default_f64"])

    # --- B: fluid stage in f32 (reference storage + arithmetic) ---
    orig_vals = ffmod.FFJet.vals

    def vals_f32(self, x, k, a):
        fvars = orig_vals(self, x.astype(jnp.float32),
                          None if k is None else k.astype(jnp.float32), a)
        return jax.tree_util.tree_map(
            lambda v: v.astype(jnp.float64), fvars)

    ffmod.FFJet.vals = vals_f32
    orchestrator._RENDER_CACHE.clear()
    try:
        ours_b = render()
    finally:
        ffmod.FFJet.vals = orig_vals
        orchestrator._RENDER_CACHE.clear()
    out["B_f32_fluid_stage"] = resid(ours_b)
    out["B_image_shift_rel_l1"] = float(
        np.sum(np.abs(ours_b - ours)) / np.sum(np.abs(ours)))
    print("B f32 fluid stage  :", out["B_f32_fluid_stage"],
          "shift", out["B_image_shift_rel_l1"])

    # --- C: B + reference tables/lookup + reference sampling conventions ---
    tabs = parse_reference_tables()
    g_ref = make_reference_g(tabs)

    def g_all_ref(x, p):
        return jnp.stack([g_ref(n, x, p) for n in plmod._G_ORDER], axis=-1)

    orig_g, orig_gall = plmod._g, plmod._g_all
    ffmod.FFJet.vals = vals_f32
    plmod._g, plmod._g_all = g_ref, g_all_ref
    orchestrator._RENDER_CACHE.clear()
    try:
        ours_c = render(ref_conventions=True)
    finally:
        ffmod.FFJet.vals = orig_vals
        plmod._g, plmod._g_all = orig_g, orig_gall
        orchestrator._RENDER_CACHE.clear()
    out["C_f32_plus_ref_tables_plus_ref_conventions"] = resid(ours_c)
    print("C full ref fidelity:",
          out["C_f32_plus_ref_tables_plus_ref_conventions"])

    out["config"] = "FFJET golden 100x100x400 lsoda"
    art = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                       "FFJET_F32_ABLATION.json")
    with open(art, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", art)


if __name__ == "__main__":
    main()
