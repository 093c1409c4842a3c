"""FFJET golden ablation: is the ~1.2e-2 residual vs the reference's
golden pickle explained by the reference's own power-law cutoff tables
and its `find_inds_gxp` lookup?

Method: parse the reference Fortran's hard-coded tables
(/root/reference/polsynchemis.f90, initialize_polsynchpl :107-525) AT
RUNTIME (no reference data is vendored into this repo), replicate its
exact lookup semantics —

  * `ix = int((log x - xv(1)) / (xv(nx) - xv(1)) * nx)` with the
    `*nx` (instead of `*(nx-1)`) bin-index bias, clamped to
    [1, nx-1] 1-based (polsynchemis.f90:63-75),
  * nearest-of-three p-slice snap (p<=3.2 -> p=3 slice, p<5 -> p=3.5,
    else p=7; :74),
  * log-log linear interpolation WITHOUT clamping x to the table range
    (x outside [1e-6, 1e3] extrapolates the edge slope; :77-92),

— monkeypatch them into grtrans_tpu.emis.polsynchpl._g, render the
FFJET golden config, and compare both variants against the golden
pickle.  Writes artifacts/FFJET_ABLATION.json.

Run on CPU:  JAX_PLATFORMS=cpu python scripts/ffjet_golden_ablation.py
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

REF = "/root/reference/polsynchemis.f90"
TABLE_NAMES = ["gxvals", "gyvals", "xvals", "yavals", "ypvals", "yvvals",
               "yapvals", "yavvals"]


def parse_reference_tables(path=REF):
    """Extract the hard-coded cutoff tables from the reference source.

    Each appears exactly once as `NAME=log((/ ...numbers... /))` with
    Fortran continuation (&) lines.  Returns dict of LOG-space numpy
    arrays (as stored by the reference: interp happens in log space)."""
    with open(path) as f:
        src = f.read()
    out = {}
    for name in TABLE_NAMES:
        m = re.search(rf"\b{name}\s*=\s*log\(\(/", src)
        if not m:
            raise RuntimeError(f"table {name} not found in {path}")
        start = m.end()
        end = src.index("/))", start)
        blob = src[start:end]
        blob = re.sub(r"[&\n\r]", " ", blob)
        vals = [float(tok.replace("d", "e").replace("D", "e"))
                for tok in blob.split(",") if tok.strip()]
        out[name] = np.log(np.array(vals))
    return out


def make_reference_g(tabs):
    """Build a drop-in replacement for polsynchpl._g that reproduces the
    reference's find_inds_gxp + interp_gxp exactly (in float64 numpy
    semantics, vectorized with jax.numpy)."""
    import jax.numpy as jnp

    # gxnum uses (gxvals, gyvals); all others use (xvals, y*)
    mapping = {"gx": ("gxvals", "gyvals"), "ga": ("xvals", "yavals"),
               "gp": ("xvals", "ypvals"), "gv": ("xvals", "yvvals"),
               "gap": ("xvals", "yapvals"), "gav": ("xvals", "yavvals")}

    jt = {k: (jnp.asarray(tabs[xn]), jnp.asarray(tabs[yn]))
          for k, (xn, yn) in mapping.items()}

    def g_ref(name, x, p):
        xv, yv = jt[name]
        nx = xv.shape[0]
        xx = jnp.log(x)
        # find_inds_gxp: note *nx (not nx-1) and the 1-based [1, nx-1]
        # clamp; Fortran int() truncates toward zero
        ixf = jnp.trunc((xx - xv[0]) / (xv[-1] - xv[0]) * nx)
        ixf = jnp.clip(ixf, 1, nx - 1).astype(jnp.int32)
        ix = ixf - 1                                   # 0-based
        p_arr = jnp.asarray(p)
        iy = jnp.where(p_arr > 3.2, 1, 0)
        iy = jnp.where(p_arr < 5.0, iy, 2)
        iy = jnp.broadcast_to(iy, jnp.shape(xx)).astype(jnp.int32)
        idx = iy * nx + ix
        yix = yv[idx]
        yix1 = yv[idx + 1]
        xix = xv[ix]
        xix1 = xv[ix + 1]
        slope = (yix1 - yix) / (xix1 - xix)
        return jnp.exp(yix + slope * (xx - xix))

    return g_ref


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import pickle
    from grtrans_tpu.config import GrtransConfig
    from grtrans_tpu.orchestrator import grtrans_run
    from grtrans_tpu.emis import polsynchpl as plmod

    tabs = parse_reference_tables()
    print({k: v.shape for k, v in tabs.items()})

    base = dict(fname="FFJET", ename="POLSYNCHPL", nvals=4,
                spin=0.998, standard=1, nn=(100, 100, 400),
                uout=0.01, mbh=3.4e9, mumin=0.906, mumax=0.906,
                nfreq=1, fmin=3.45e11, fmax=3.45e11,
                gridvals=(-40.0, 20.0, -20.0, 40.0),
                fargs=dict(ntscl=2.0, nrscl=70.0))
    with open("/root/reference/test_grtrans_ffjet.p", "rb") as f:
        gold = pickle.load(f, encoding="latin1")

    def render():
        iv, _, _ = grtrans_run(GrtransConfig(iname="lsoda", **base))
        return iv.transpose(1, 2, 0)

    def resid(ours):
        tot = float(np.sum(np.abs(ours - gold)) / np.sum(np.abs(gold)))
        ionly = float(np.sum(np.abs(ours[:, 0, 0] - gold[:, 0, 0]))
                      / np.sum(np.abs(gold[:, 0, 0])))
        return tot, ionly

    ours = render()
    tot0, i0 = resid(ours)
    print(f"own scipy tables  : total {tot0:.5f}  I {i0:.5f}")

    # ablate: reference tables + reference lookup.  polsynchpl's static-p
    # fast path goes through _g_all (stacked lookup), so patch BOTH.
    g_ref = make_reference_g(tabs)

    def g_all_ref(x, p):
        import jax.numpy as jnp
        return jnp.stack([g_ref(n, x, p) for n in plmod._G_ORDER],
                         axis=-1)

    orig_g, orig_gall = plmod._g, plmod._g_all
    plmod._g = g_ref
    plmod._g_all = g_all_ref
    # the render cache must not reuse the compiled closure built with
    # the original tables
    from grtrans_tpu import orchestrator
    orchestrator._RENDER_CACHE.clear()
    try:
        ours_ref = render()
    finally:
        plmod._g, plmod._g_all = orig_g, orig_gall
        orchestrator._RENDER_CACHE.clear()
    tot1, i1 = resid(ours_ref)
    print(f"reference tables  : total {tot1:.5f}  I {i1:.5f}")

    xmeth = float(np.sum(np.abs(ours_ref - ours)) / np.sum(np.abs(ours)))
    print(f"table-swap effect : {xmeth:.5f} rel L1 on the image")

    # second ablation: the reference's FIRST-ORDER integrator
    # discretization (radtrans_integrate.f90:862-874: observer-side
    # coefficients, emission attenuated through the whole cell) instead
    # of this framework's 2nd-order midpoint cells — WITH the reference
    # tables still patched in, i.e. full reference fidelity
    from grtrans_tpu.integrate import solvers as sol
    orig_integrate = sol.integrate

    def integrate_ref(lam, j, K, method="formal", mask=None,
                      max_tau=sol.MAX_TAU, thin=sol.THIN, I0=None):
        return sol.formal_solve(lam, j, K, mask, max_tau, I0,
                                ref_firstorder=True)

    plmod._g = g_ref
    plmod._g_all = g_all_ref
    sol.integrate = integrate_ref
    orchestrator._RENDER_CACHE.clear()
    try:
        ours_ref1 = render()
    finally:
        plmod._g, plmod._g_all = orig_g, orig_gall
        sol.integrate = orig_integrate
        orchestrator._RENDER_CACHE.clear()
    tot2, i2 = resid(ours_ref1)
    print(f"ref tables + 1st-order integrator: total {tot2:.5f}  I {i2:.5f}")

    os.makedirs(os.path.join(os.path.dirname(__file__), "..", "artifacts"),
                exist_ok=True)
    art = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                       "FFJET_ABLATION.json")
    with open(art, "w") as f:
        json.dump({"own_tables": {"total": tot0, "I": i0},
                   "reference_tables_and_lookup": {"total": tot1, "I": i1},
                   "table_swap_rel_l1": xmeth,
                   "ref_tables_plus_firstorder_integrator":
                       {"total": tot2, "I": i2},
                   "config": "FFJET golden 100x100x400 lsoda"}, f, indent=1)
    print("wrote", art)


if __name__ == "__main__":
    main()
