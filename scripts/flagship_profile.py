"""Flagship frame-pipeline attribution: where do 180 ms/frame go when
the device compute (PROFILE_r04 fused mixed_full) is 67 ms?

Measures, for the FFJET flagship bench config (100x100x400 mixed):

  A. raw pipelined executes — the cached _render_camera dispatched
     nrep times with ALL arguments device-resident, ONE 1-element fetch
     at the end: the per-frame floor of device compute + tunnel execute
     overhead, no data transfers.
  B. A + full f64 image fetch per frame (after all dispatches): adds
     the download cost.
  C. A but with host-numpy camera arrays per call: adds the upload cost.
  D. grtrans_run(device_output=True) pipeline (bench.py's loop): adds
     the orchestrator's per-call host work.

Writes artifacts/FLAGSHIP_PIPE_PROFILE.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from grtrans_tpu.config import GrtransConfig
    from grtrans_tpu import orchestrator
    from grtrans_tpu.orchestrator import grtrans_run
    from grtrans_tpu.fluid.base import load_fluid_model

    ffjet_file = "/root/reference/m87bl09rfp10xi5a998fluidvars.bin"
    assert os.path.exists(ffjet_file)
    cfg = GrtransConfig(fname="FFJET", ename="POLSYNCHPL", nvals=4,
                        spin=0.998, standard=1, nn=(100, 100, 400),
                        uout=0.01, mbh=3.4e9, mumin=0.906, mumax=0.906,
                        nfreq=1, fmin=3.45e11, fmax=3.45e11,
                        gridvals=(-40.0, 20.0, -20.0, 40.0),
                        iname="formal", prec="mixed",
                        fargs=dict(ntscl=2.0, nrscl=70.0))
    model = load_fluid_model("FFJET", **cfg.fargs)

    t0 = time.time()
    grtrans_run(cfg, model=model)
    tc = time.time() - t0

    key = orchestrator._render_fn_key(cfg, model)
    ent = orchestrator._render_cache_get(key, model)
    render = ent[1]

    from grtrans_tpu.geodesics import camera as cam_mod
    cam = cam_mod.make_camera(cfg.spin, 0.906, *cfg.gridvals, 100, 100,
                              cfg.nrotype, cfg.rcut)
    dev_args = tuple(jax.device_put(jnp.asarray(v))
                     for v in (cam.alpha, cam.beta, cam.l, cam.q2,
                               cam.sm))
    host_args = tuple(np.asarray(v) for v in dev_args)
    t0sh = jax.device_put(jnp.zeros_like(dev_args[2]))
    mdot = cfg.mdotmin

    nrep = 10
    rec = {"device": str(jax.devices()[0]), "compile_s": round(tc, 1),
           "nrep": nrep}

    def run(args, fetch_full):
        # warm (settle any per-shape residual work)
        iv = render(*args, 0.906, cam.u0, 0.0, t0sh, mdot)
        np.asarray(iv)
        t0 = time.time()
        outs = [render(*args, 0.906, cam.u0, 0.0, t0sh, mdot)
                for _ in range(nrep)]
        if fetch_full:
            for iv in outs:
                np.asarray(iv)
        else:
            np.asarray(outs[-1][:1, :1, :1])
        return (time.time() - t0) / nrep

    rec["A_device_args_1elem_fetch_ms"] = round(
        run(dev_args, False) * 1e3, 1)
    rec["B_device_args_full_fetch_ms"] = round(
        run(dev_args, True) * 1e3, 1)
    rec["C_host_args_full_fetch_ms"] = round(
        run(host_args, True) * 1e3, 1)
    iv = render(*dev_args, 0.906, cam.u0, 0.0, t0sh, mdot)
    rec["image_bytes"] = int(np.asarray(iv).nbytes)
    rec["image_dtype"] = str(np.asarray(iv).dtype)

    t0 = time.time()
    outs = [grtrans_run(cfg, model=model, device_output=True)[0]
            for _ in range(nrep)]
    for o in outs:
        for x in o:
            np.asarray(x)
    rec["D_grtrans_run_pipeline_ms"] = round(
        (time.time() - t0) / nrep * 1e3, 1)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts",
        "FLAGSHIP_PIPE_PROFILE.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
