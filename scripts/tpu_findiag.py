"""TPU finiteness diagnostic: small FFJET render in prec='mixed' vs
'f64'.  TPU 'f64' is emulated with f32 EXPONENT RANGE, so raw-cgs
coefficient intermediates (nu^k, j ~ 1e-46) can overflow/underflow to
inf/nan on chip while being exact on CPU; the mixed path computes
coefficients ratio-first in genuine f32 and must stay finite."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    from grtrans_tpu.config import GrtransConfig
    from grtrans_tpu.orchestrator import grtrans_run
    from grtrans_tpu.fluid.base import load_fluid_model

    print("devices:", jax.devices(), flush=True)
    model = load_fluid_model("FFJET", ntscl=2.0, nrscl=70.0)
    for prec in ["mixed", "f64"]:
        cfg = GrtransConfig(fname="FFJET", ename="POLSYNCHPL", nvals=4,
                            spin=0.998, standard=1, nn=(30, 30, 128),
                            uout=0.01, mbh=3.4e9, mumin=0.906, mumax=0.906,
                            nfreq=1, fmin=3.45e11, fmax=3.45e11,
                            gridvals=(-40.0, 20.0, -20.0, 40.0),
                            iname="formal", prec=prec,
                            fargs=dict(ntscl=2.0, nrscl=70.0))
        t0 = time.time()
        ivals, ab, freqs = grtrans_run(cfg, model=model)
        dt = time.time() - t0
        iv = np.asarray(ivals)
        nnan = np.size(iv) - np.isfinite(iv).sum()
        print(f"prec={prec}: compile+run {dt:.1f}s  finite="
              f"{np.isfinite(iv).all()} n_nonfinite={nnan} "
              f"Imax={np.nanmax(iv[..., 0]):.3e}", flush=True)
        t0 = time.time()
        ivals, _, _ = grtrans_run(cfg, model=model)
        np.asarray(ivals)
        print(f"  cached: {time.time() - t0:.3f}s", flush=True)


if __name__ == "__main__":
    main()
