"""Characterize the STRUCTURE of the FFJET golden residual: per-Stokes
split, spatial concentration, best-fit global scale, flux ratios.

If the 1.2e-2 is a smooth multiplicative offset, the cause is a
normalization-level constant; if it is concentrated in a few pixels,
it is a boundary/sampling effect; if it is Q/U-dominated, it is in the
polarization transfer.  Writes artifacts/FFJET_RESIDUAL_STRUCTURE.json.

Run on CPU:  JAX_PLATFORMS=cpu python scripts/ffjet_residual_structure.py
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

    base = dict(fname="FFJET", ename="POLSYNCHPL", nvals=4,
                spin=0.998, standard=1, nn=(100, 100, 400),
                uout=0.01, mbh=3.4e9, mumin=0.906, mumax=0.906,
                nfreq=1, fmin=3.45e11, fmax=3.45e11,
                gridvals=(-40.0, 20.0, -20.0, 40.0),
                fargs=dict(ntscl=2.0, nrscl=70.0))
    with open("/root/reference/test_grtrans_ffjet.p", "rb") as f:
        gold = pickle.load(f, encoding="latin1")   # (npix, nvals, 1)

    iv, _, _ = grtrans_run(GrtransConfig(iname="lsoda", **base))
    ours = iv.transpose(1, 2, 0)

    g = gold[:, :, 0]
    o = ours[:, :, 0]
    rec = {}
    names = "IQUV"
    for i in range(4):
        denom = np.sum(np.abs(g[:, i]))
        rec[f"relL1_{names[i]}"] = float(
            np.sum(np.abs(o[:, i] - g[:, i])) / denom) if denom else None
        rec[f"flux_ratio_{names[i]}"] = (
            float(np.sum(o[:, i]) / np.sum(g[:, i]))
            if np.sum(np.abs(g[:, i])) else None)

    # best-fit single scale on I: min_c ||c*g - o||_1 proxy via L2
    c = float(np.dot(o[:, 0], g[:, 0]) / np.dot(g[:, 0], g[:, 0]))
    rec["I_lsq_scale"] = c
    rec["relL1_I_after_scale"] = float(
        np.sum(np.abs(o[:, 0] - c * g[:, 0])) / np.sum(np.abs(g[:, 0])))

    # spatial concentration of the I residual
    res = np.abs(o[:, 0] - g[:, 0])
    order = np.argsort(res)[::-1]
    tot = res.sum()
    for frac in (0.01, 0.05, 0.20):
        k = max(1, int(frac * res.size))
        rec[f"I_resid_frac_in_top_{int(frac*100)}pct_pixels"] = float(
            res[order[:k]].sum() / tot)
    # where do the top residual pixels sit in brightness order?
    bright_rank = np.empty(res.size, np.int64)
    bright_rank[np.argsort(g[:, 0])[::-1]] = np.arange(res.size)
    rec["top20_resid_pixels_brightness_rank"] = \
        bright_rank[order[:20]].tolist()

    # LP fraction comparison (the observable the reference quotes)
    lp_o = np.hypot(o[:, 1].sum(), o[:, 2].sum()) / o[:, 0].sum()
    lp_g = np.hypot(g[:, 1].sum(), g[:, 2].sum()) / g[:, 0].sum()
    rec["lp_frac_ours"] = float(lp_o)
    rec["lp_frac_golden"] = float(lp_g)

    art = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                       "FFJET_RESIDUAL_STRUCTURE.json")
    with open(art, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
