"""Attribute the at-scale (1024^2) chunked-render throughput gap.

Round-4 verdict: the 1024^2 x 400 HARM render ran 5.9M ray-points/s vs
22.3M on the 100^2 flagship bench — 3.8x worse per ray, unattributed.
This script measures, on the real chip, for the HARM_AT_SCALE config:

  per-chunk dispatch time   (host time for the jit call to return)
  per-chunk device compute  (time to a 1-element fetch, which forces
                             execution but transfers nothing; on this
                             tunneled backend block_until_ready lies —
                             only fetches synchronize, see
                             scripts/tpu_profile.py)
  per-chunk full fetch      (np.asarray of the IQUV block)
  sync-loop rate            (dispatch->fetch->dispatch, the round-4
                             orchestrator behavior)
  pipelined rate            (dispatch all chunks, fetch after — the
                             round-5 orchestrator behavior)

plus a chunk-size sweep of the pipelined rate.  Writes
artifacts/AT_SCALE_PROFILE.json — the committed stage attribution the
verdict asked for.

Usage: python scripts/at_scale_profile.py [--nchunks 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from harm_at_scale import synthetic_harm_dump  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nchunks", type=int, default=8,
                    help="chunks per measurement (full image = 32-64)")
    ap.add_argument("--npts", type=int, default=400)
    ap.add_argument("--sweep", default="8192,16384,32768")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from grtrans_tpu.config import GrtransConfig
    from grtrans_tpu.geodesics import camera as cam_mod
    from grtrans_tpu import orchestrator
    from grtrans_tpu.fluid.base import load_fluid_model

    dump = synthetic_harm_dump()
    model = load_fluid_model("HARM", dump=dump)
    nx = 1024

    def make_cfg(chunk):
        return GrtransConfig(fname="HARM", ename="POLSYNCHTH", nvals=4,
                             spin=0.9375, standard=1,
                             nn=(nx, nx, args.npts), uout=0.04,
                             mbh=4.3e6, mumin=0.5, mumax=0.5, nmu=1,
                             nfreq=1, fmin=2.3e11, fmax=2.3e11,
                             iname="formal", mdotmin=3e15, mdotmax=3e15,
                             nmdot=1, gridvals=(-15.0, 15.0, -15.0, 15.0),
                             gmin=10.0, muval=0.25, prec="mixed")

    rec = {"device": str(jax.devices()[0]), "npts": args.npts,
           "nx": nx, "chunks_measured": args.nchunks}

    # --- per-chunk attribution at chunk=32768 (the r4 run size) ---
    chunk = 32768
    cfg = make_cfg(chunk)
    cam = cam_mod.make_camera(cfg.spin, 0.5, *cfg.gridvals, nx, nx,
                              cfg.nrotype, cfg.rcut)

    # rebuild the orchestrator's render closure exactly (one jitted
    # program: trace+fluid+tetrad+coeffs+solver), via grtrans_run's own
    # machinery on an i1/i2 block so shapes match the chunked path
    import dataclasses
    from grtrans_tpu.orchestrator import grtrans_run
    warm = dataclasses.replace(cfg, i1=1, i2=chunk)
    t0 = time.time()
    grtrans_run(warm, model=model)
    rec["compile_s"] = round(time.time() - t0, 1)

    # drive the SAME cached jitted closure the chunked path uses
    key = orchestrator._render_fn_key(warm, model)
    ent = orchestrator._render_cache_get(key, model)
    assert ent is not None
    render = ent[1]          # _render_camera

    mu0 = 0.5
    t0sh = jnp.zeros((chunk,), dtype=jnp.float64)
    disp, comp, fetch = [], [], []
    for i in range(args.nchunks):
        lo = i * chunk
        hi = lo + chunk
        al, be = cam.alpha[lo:hi], cam.beta[lo:hi]
        l, q2, sm = cam.l[lo:hi], cam.q2[lo:hi], cam.sm[lo:hi]
        t0 = time.time()
        iv = render(al, be, l, q2, sm, mu0, cam.u0, 0.0, t0sh, 3e15)
        t1 = time.time()
        np.asarray(iv[:1, :1, :1] if iv.ndim == 3 else iv[:1, :1])
        t2 = time.time()
        np.asarray(iv)
        t3 = time.time()
        disp.append(t1 - t0)
        comp.append(t2 - t1)
        fetch.append(t3 - t2)
    # first iteration may hide residual warmup; report medians
    med = lambda x: float(np.median(x))
    rec["per_chunk_ms"] = {
        "chunk": chunk,
        "dispatch": round(med(disp) * 1e3, 1),
        "device_compute_to_1elem_fetch": round(med(comp) * 1e3, 1),
        "full_fetch": round(med(fetch) * 1e3, 1),
        "sync_total": round((med(disp) + med(comp) + med(fetch)) * 1e3, 1),
        "fetch_bytes": int(np.asarray(iv).nbytes),
    }
    rec["device_ray_points_per_s"] = round(
        chunk * args.npts / med(comp), 0)

    # --- sync loop vs pipelined over the same nchunks ---
    n = args.nchunks
    blocks = [(i * chunk, (i + 1) * chunk) for i in range(n)]

    t0 = time.time()
    for lo, hi in blocks:
        iv = render(cam.alpha[lo:hi], cam.beta[lo:hi], cam.l[lo:hi],
                    cam.q2[lo:hi], cam.sm[lo:hi], mu0, cam.u0, 0.0,
                    t0sh, 3e15)
        np.asarray(iv)
    dt_sync = time.time() - t0

    t0 = time.time()
    outs = [render(cam.alpha[lo:hi], cam.beta[lo:hi], cam.l[lo:hi],
                   cam.q2[lo:hi], cam.sm[lo:hi], mu0, cam.u0, 0.0,
                   t0sh, 3e15) for lo, hi in blocks]
    for iv in outs:
        np.asarray(iv)
    dt_pipe = time.time() - t0

    rp = n * chunk * args.npts
    rec["sync_loop"] = {"wall_s": round(dt_sync, 2),
                        "ray_points_per_s": round(rp / dt_sync, 0)}
    rec["pipelined"] = {"wall_s": round(dt_pipe, 2),
                        "ray_points_per_s": round(rp / dt_pipe, 0)}

    # --- chunk-size sweep (pipelined), each size needs its own compile ---
    sweep = {}
    for csz in [int(s) for s in args.sweep.split(",") if s]:
        if csz == chunk:
            r = render
            ck = csz
        else:
            w = dataclasses.replace(cfg, i1=1, i2=csz)
            t0 = time.time()
            grtrans_run(w, model=model)
            tci = time.time() - t0
            k2 = orchestrator._render_fn_key(w, model)
            r = orchestrator._render_cache_get(k2, model)[1]
            ck = csz
        nb = max(1, (n * chunk) // ck)
        bl = [(i * ck, (i + 1) * ck) for i in range(nb)]
        tz = jnp.zeros((ck,), dtype=jnp.float64)
        # warm one call (first call of a size pays residual setup)
        np.asarray(r(cam.alpha[:ck], cam.beta[:ck], cam.l[:ck],
                     cam.q2[:ck], cam.sm[:ck], mu0, cam.u0, 0.0, tz,
                     3e15))
        t0 = time.time()
        outs = [r(cam.alpha[lo:hi], cam.beta[lo:hi], cam.l[lo:hi],
                  cam.q2[lo:hi], cam.sm[lo:hi], mu0, cam.u0, 0.0, tz,
                  3e15) for lo, hi in bl]
        for iv in outs:
            np.asarray(iv)
        dt = time.time() - t0
        sweep[str(csz)] = {
            "ray_points_per_s": round(nb * ck * args.npts / dt, 0)}
    rec["chunk_sweep_pipelined"] = sweep

    # --- scale invariance: the SAME HARM config at the flagship camera
    # size (100^2, unchunked, pipelined frames like bench.py) — if the
    # per-ray rate matches the 1024^2 chunked rate, the "at-scale gap"
    # is not a property of scale at all but of the config's intrinsic
    # per-ray cost (HARM sampler + thermal POLSYNCHTH vs the flagship's
    # FFJET + table POLSYNCHPL) ---
    from grtrans_tpu.config import GrtransConfig  # noqa: F811
    cfg100 = dataclasses.replace(make_cfg(None), nn=(100, 100, args.npts))
    t0 = time.time()
    grtrans_run(cfg100, model=model)
    tc100 = time.time() - t0
    nrep = 4
    t0 = time.time()
    outs2 = [grtrans_run(cfg100, model=model, device_output=True)[0]
             for _ in range(nrep)]
    for o in outs2:
        for x in o:
            np.asarray(x)
    dt100 = (time.time() - t0) / nrep
    rec["harm_100sq_pipelined"] = {
        "compile_s": round(tc100, 1),
        "ms_per_frame": round(dt100 * 1e3, 1),
        "ray_points_per_s": round(100 * 100 * args.npts / dt100, 0)}

    # --- trace-only rate at the chunk size: how much of the per-ray
    # cost is the geodesic stage (shared with the flagship) vs the
    # HARM fluid+emissivity stages ---
    trace_jit = ent[2]
    g = trace_jit(cam.alpha[:chunk], cam.beta[:chunk], cam.l[:chunk],
                  cam.q2[:chunk], cam.sm[:chunk], mu0, cam.u0)
    np.asarray(g.x[:1, :1])            # compile + settle
    t0 = time.time()
    g = trace_jit(cam.alpha[chunk:2 * chunk], cam.beta[chunk:2 * chunk],
                  cam.l[chunk:2 * chunk], cam.q2[chunk:2 * chunk],
                  cam.sm[chunk:2 * chunk], mu0, cam.u0)
    np.asarray(g.x[:1, :1])
    dt_tr = time.time() - t0
    rec["trace_only_chunk"] = {
        "wall_s": round(dt_tr, 2),
        "ray_points_per_s": round(chunk * args.npts / dt_tr, 0)}

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "AT_SCALE_PROFILE.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
