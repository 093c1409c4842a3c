"""A/B: Pallas VMEM-resident-table gather vs the XLA packed gather on
the FFJET flagship sampling load (round-3 verdict task: 'commit the
A/B as an artifact even if Pallas loses — that's a decision record').

Uses the real FFJET quad table and a realistic query distribution
(indices from an actual traced camera).  Writes
artifacts/PALLAS_AB.json with both timings and the verdict.

Run alone on the chip:  python scripts/pallas_gather_ab.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _sync(x):
    return np.asarray(x[(0,) * x.ndim])


def timeit(fn, *args, nrep=5):
    _sync(fn(*args))
    t0 = time.time()
    for _ in range(nrep):
        _sync(fn(*args))
    return (time.time() - t0) / nrep


def main():
    import jax
    import jax.numpy as jnp
    from grtrans_tpu.fluid.base import load_fluid_model
    from grtrans_tpu.geodesics import camera as cam_mod, geokerr
    from grtrans_tpu.ops import pallas_gather as pg

    model = load_fluid_model("FFJET", ntscl=2.0, nrscl=70.0)
    a, mu0 = 0.998, 0.906
    nro, npts = 100, 400
    cam = cam_mod.make_camera(a, mu0, -40.0, 20.0, -20.0, 40.0, nro, nro)
    geo = geokerr.trace(a, mu0, cam.alpha, cam.beta, cam.l, cam.q2,
                        cam.sm, cam.u0, npts, uout=0.01, prec="mixed",
                        coarse=4)
    # realistic indices/weights from the production sampler's own math
    nx = model.nx
    x = geo.x.astype(jnp.float32)
    r = x[..., 1]
    th = x[..., 2]
    x2 = jnp.arccos(jnp.abs(jnp.cos(th)))
    x1 = jnp.log(r)
    u1a, u1b = model.uniqx1[0].astype(jnp.float32), \
        model.uniqx1[-1].astype(jnp.float32)
    u2a, u2b = model.uniqth[0].astype(jnp.float32), \
        model.uniqth[-1].astype(jnp.float32)
    lx1 = jnp.clip(((x1 - u1a) / (u1b - u1a) * (nx - 1))
                   .astype(jnp.int32), 0, nx - 2)
    lx2 = jnp.clip(((x2 - u2a) / (u2b - u2a) * (nx - 1))
                   .astype(jnp.int32), 0, nx - 2)
    idx = (lx2 * nx + lx1).reshape(-1)
    nq = idx.shape[0]
    rng = np.random.default_rng(0)
    wnp = rng.random((nq, 4)).astype(np.float32)
    wnp /= wnp.sum(-1, keepdims=True)
    w = jnp.asarray(wnp)
    table = model.fquad32

    pad = (-nq) % pg.BQ
    idx_p = jnp.pad(idx, (0, pad))
    w_p = jnp.pad(w, ((0, pad), (0, 0)))

    xla = jax.jit(lambda t, i, w_: pg.xla_quad_gather(t, i, w_))
    t_xla = timeit(xla, table, idx_p, w_p)

    pall = jax.jit(lambda t, i, w_: pg.quad_combine(
        pg.vmem_row_gather(t, i), w_))
    try:
        t_pl = timeit(pall, table, idx_p, w_p)
        out_pl = np.asarray(pall(table, idx_p, w_p))
        out_x = np.asarray(xla(table, idx_p, w_p))
        maxdiff = float(np.abs(out_pl - out_x).max())
        err = None
    except Exception as e:          # kernel unsupported on this backend
        t_pl, maxdiff, err = None, None, f"{type(e).__name__}: {e}"[:400]

    rec = {
        "problem": f"FFJET quad gather, {nq} queries, table "
                   f"{tuple(np.shape(table))} f32 (VMEM-resident)",
        "device": str(jax.devices()[0]),
        "xla_gather_ms": round(t_xla * 1e3, 2),
        "pallas_vmem_ms": (round(t_pl * 1e3, 2)
                           if t_pl is not None else None),
        "max_abs_diff": maxdiff,
        "pallas_error": err,
        "verdict": ("pallas" if t_pl is not None and t_pl < t_xla
                    else "xla"),
        "notes": [
            "Pallas itself works on this backend (elementwise smoke "
            "kernel compiles and runs).",
            "The scalar-indexed gather kernel family crashes the "
            "REMOTE Mosaic compiler (HTTP 500) in most variants — "
            "bisected on-chip: SMEM f32 scalar reads crash; scalar "
            "extraction from loaded vectors crashes; a gather-only "
            "variant with a 9-lane output compiled and ran, the "
            "36-lane production shape does not.",
            "Decision context: within the FUSED pipeline the whole "
            "fluid-sampling stage adds only ~2 ms at 2500 px "
            "(PROFILE_r04 fused_ms: trace 41.1 -> +fluid 43.4) — XLA "
            "overlaps the HBM gather descriptors with surrounding "
            "compute, so even an ideal VMEM-resident kernel bounds "
            "the win at <~8 ms of a 217 ms frame.  Verdict: keep the "
            "XLA packed gathers.",
        ],
    }
    out = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                       "PALLAS_AB.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
