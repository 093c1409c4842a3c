import sys; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import os
os.environ["JAX_PLATFORMS"]="cpu"
import jax
jax.config.update("jax_platforms","cpu"); jax.config.update("jax_enable_x64",True)
import numpy as np
from grtrans_tpu.config import GrtransConfig
from grtrans_tpu.orchestrator import grtrans_run
import json
out = {}
imgs = {}
for npts in (400, 800, 1600):
    base = dict(fname="FFJET", ename="POLSYNCHPL", nvals=4,
                spin=0.998, standard=1, nn=(100, 100, npts),
                uout=0.01, mbh=3.4e9, mumin=0.906, mumax=0.906,
                nfreq=1, fmin=3.45e11, fmax=3.45e11,
                gridvals=(-40.0, 20.0, -20.0, 40.0))
    iv,_,_ = grtrans_run(GrtransConfig(iname="lsoda", **base))
    imgs[npts] = iv
    print("npts", npts, "done", flush=True)
for n in (400, 800):
    d = np.sum(np.abs(imgs[n]-imgs[1600]))/np.sum(np.abs(imgs[1600]))
    out[f"npts{n}_vs_1600"] = float(d)
    print(f"npts{n} vs 1600: rel L1 {d:.5f}")
json.dump(out, open("/root/repo/artifacts/FFJET_NPTS_CONVERGENCE.json","w"), indent=1)
