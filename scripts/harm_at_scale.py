"""HARM-at-scale parity/perf artifact: a 1024^2 IQUV GRMHD image on one
chip (the BASELINE.json north-star problem; the reference's dump040 test
snapshot is not shipped, so the dump is synthetic — same Keplerian+
plunging MKS flow the HARM unit tests validate u.u=-1 / u.b=0 on).

Writes artifacts/HARM_AT_SCALE.json with wall-clock, throughput, an
image hash and summary stats — the standing perf regression record.

Usage: python scripts/harm_at_scale.py [--nx 1024] [--chunk 65536]
"""

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synthetic_harm_dump(nx1=192, nx2=128, a=0.9375, h=0.3):
    import jax.numpy as jnp
    from grtrans_tpu.geometry import kerr
    from grtrans_tpu.fluid import harm as harm_mod
    from grtrans_tpu.fluid.base import toroidal_b

    rh = float(kerr.horizon(a))
    x1 = np.linspace(np.log(rh * 0.98), np.log(50.0), nx1)
    x2 = np.linspace(0.01, 0.99, nx2)
    X1, X2 = np.meshgrid(x1, x2, indexing="ij")
    R = np.exp(X1)
    TH = harm_mod.theta_of_x2(X2, h)
    r = jnp.asarray(R.ravel())
    th = jnp.asarray(TH.ravel())
    g = kerr.metric_cov(r, th, a)
    om = 1.0 / (r ** 1.5 + a)
    z = jnp.zeros_like(r)
    u0 = kerr.calc_u0(g, z, z, om)
    u_bl = jnp.stack([u0, z, z, om * u0], axis=-1)
    rms = float(kerr.calc_rms(a))
    u_in = kerr.rms_vel(a, th, r)
    u_bl = jnp.where(((r < rms) | ~jnp.isfinite(u0))[..., None], u_in, u_bl)
    b_bl = toroidal_b(g, u_bl, jnp.asarray(1.0 / np.asarray(r)))
    d = r * r - 2 * r + a * a

    def bl2ks_vec(v):
        return jnp.stack([v[..., 0] + 2 * r / d * v[..., 1], v[..., 1],
                          v[..., 2], v[..., 3] + a / d * v[..., 1]],
                         axis=-1)

    dthdx2 = np.pi * (1 + (1 - h) * np.cos(2 * np.pi * X2.ravel()))

    def ks2mks(v):
        return jnp.stack([v[..., 0], v[..., 1] / r,
                          v[..., 2] / jnp.asarray(dthdx2), v[..., 3]],
                         axis=-1)

    u_mks = np.asarray(ks2mks(bl2ks_vec(u_bl)))
    b_mks = np.asarray(ks2mks(bl2ks_vec(b_bl)))
    # disk + funnel structure so the image has nontrivial polarization
    rho = np.asarray(jnp.exp(-((r - 6.0) / 6.0) ** 2)
                     * jnp.exp(-(jnp.cos(th) / 0.4) ** 2) + 1e-4)
    return dict(tcur=0.0, nx1=nx1, nx2=nx2, a=a, gam=13.0 / 9.0, h=h,
                x1=X1.ravel(), x2=X2.ravel(), r=R.ravel(), th=TH.ravel(),
                rho=rho, p=rho * 0.1, u=u_mks, b=b_mks,
                gdet=np.ones(nx1 * nx2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=1024)
    ap.add_argument("--npts", type=int, default=400)
    ap.add_argument("--chunk", type=int, default=65536)
    ap.add_argument("--iname", default="formal")
    ap.add_argument("--prec", default="mixed",
                    help="'mixed' (validated f32 fast path) or 'f64'")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from grtrans_tpu.config import GrtransConfig
    from grtrans_tpu.orchestrator import grtrans_run
    from grtrans_tpu.fluid.base import load_fluid_model
    import jax

    dump = synthetic_harm_dump()
    model = load_fluid_model("HARM", dump=dump)
    cfg = GrtransConfig(fname="HARM", ename="POLSYNCHTH", nvals=4,
                        spin=0.9375, standard=1,
                        nn=(args.nx, args.nx, args.npts), uout=0.04,
                        mbh=4.3e6, mumin=0.5, mumax=0.5, nmu=1, nfreq=1,
                        fmin=2.3e11, fmax=2.3e11, iname=args.iname,
                        mdotmin=3e15, mdotmax=3e15, nmdot=1,
                        gridvals=(-15.0, 15.0, -15.0, 15.0),
                        gmin=10.0, muval=0.25, prec=args.prec)

    # warmup on one chunk-size worth of pixels (compile)
    import dataclasses
    warm = dataclasses.replace(cfg, i1=1, i2=min(args.chunk,
                                                 args.nx * args.nx))
    grtrans_run(warm, model=model)

    t0 = time.time()
    ivals, ab, freqs = grtrans_run(cfg, model=model, chunk=args.chunk)
    dt = time.time() - t0
    npix = args.nx * args.nx
    I = ivals[0, :, 0]
    img64 = np.ascontiguousarray(ivals.astype(np.float64))
    rec = {
        "problem": f"HARM {args.nx}x{args.nx}x{args.npts} IQUV "
                   f"({args.iname}), synthetic dump 192x128",
        "caveat": "dump is a SYNTHETIC 192x128 Keplerian+plunging flow "
                  "(reference dump040 absent from the mount): the run "
                  "exercises camera scale, not realistic snapshot "
                  "sizes/occupancy — see docs/SHARDING.md for the "
                  "capacity math at production dump sizes",
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "x64": bool(jax.config.jax_enable_x64),
        "prec": args.prec,
        "wall_s": round(dt, 3),
        "Mrays_per_s": round(npix / dt / 1e6, 5),
        "ray_points_per_s": round(npix * args.npts / dt, 1),
        "flux_I": float(I.sum()),
        "lp_frac": float(np.hypot(ivals[0, :, 1].sum(),
                                  ivals[0, :, 2].sum()) / I.sum()),
        "finite": bool(np.isfinite(ivals).all()),
        "nonzero_pix": int((I > 0).sum()),
        "sha256_f32img": hashlib.sha256(
            np.round(img64, 12).astype(np.float32).tobytes()).hexdigest(),
    }
    out = args.out or os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "HARM_AT_SCALE.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
