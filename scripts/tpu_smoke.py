"""TPU smoke + timing: small render end-to-end on the real chip.

Run standalone (nohup); writes progress to stdout. The persistent XLA
cache makes subsequent runs fast."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    t00 = time.time()
    from grtrans_tpu.config import GrtransConfig
    from grtrans_tpu.orchestrator import grtrans_run
    from grtrans_tpu.fluid.base import load_fluid_model
    import jax
    print("devices:", jax.devices(), flush=True)

    cfg = GrtransConfig(fname="SARIAF", ename="POLSYNCHTH", nvals=4,
                        spin=0.9, standard=1, nn=(16, 16, 128), mbh=4e6,
                        mumin=0.5, mumax=0.5, nfreq=1, fmin=2.3e11,
                        fmax=2.3e11, iname="formal",
                        gridvals=(-15.0, 15.0, -15.0, 15.0),
                        fargs=dict(n0=4e7, t0=1.6e11, beta=10.0))
    model = load_fluid_model(cfg.fname, **cfg.fargs)
    t0 = time.time()
    ivals, ab, freqs = grtrans_run(cfg, model=model)
    print(f"small compile+run: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    ivals, ab, freqs = grtrans_run(cfg, model=model)
    print(f"small cached run: {time.time()-t0:.3f}s "
          f"finite={np.isfinite(ivals).all()} Imax={ivals[...,0].max():.3e}",
          flush=True)

    # medium scale for throughput
    cfg2 = GrtransConfig(fname="SARIAF", ename="POLSYNCHTH", nvals=4,
                         spin=0.9, standard=1, nn=(64, 64, 256), mbh=4e6,
                         mumin=0.5, mumax=0.5, nfreq=1, fmin=2.3e11,
                         fmax=2.3e11, iname="formal",
                         gridvals=(-15.0, 15.0, -15.0, 15.0),
                         fargs=dict(n0=4e7, t0=1.6e11, beta=10.0))
    t0 = time.time()
    ivals, _, _ = grtrans_run(cfg2, model=model)
    print(f"64x64x256 compile+run: {time.time()-t0:.1f}s", flush=True)
    for _ in range(3):
        t0 = time.time()
        ivals, _, _ = grtrans_run(cfg2, model=model)
        dt = time.time() - t0
        print(f"64x64x256 cached: {dt:.3f}s = {64*64/dt:.0f} px/s "
              f"finite={np.isfinite(ivals).all()}", flush=True)
    print(f"total {time.time()-t00:.1f}s", flush=True)


if __name__ == "__main__":
    main()
