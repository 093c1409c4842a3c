"""Independent geodesic + polarization-transport cross-check on the
brightest FFJET golden pixels (docs/FFJET_GOLDEN_ANALYSIS.md, ablation
#5 — the last unablated candidate chain: geokerr.trace +
tetrad.comoving_ortho, reference kerr.f90:550-730).

Method (ZERO shared code with the production chain):
  * Kerr metric + inverse written out independently in NumPy from the
    Boyer-Lindquist line element.
  * Null geodesic integrated by scipy.solve_ivp in Hamiltonian form,
    y = (t, r, th, phi, k_r, k_th) with k_t = -1, k_phi = l conserved;
    dk/dlam from NUMERICALLY differentiated inverse-metric components
    (no hand-derived Christoffels anywhere).
  * Polarization basis f parallel-transported by the same ODE with
    Gamma from numerically differentiated metric.
  * Comoving-frame angles built by Gram-Schmidt projection (u, k, b)
    and a Levi-Civita-oriented sine — not the Kulkarni tetrad formulas.

Compared per sample, for the N brightest golden-image pixels:
  r, theta, phi, t  — geodesic path vs geokerr.trace
  g = -1/(k.u)      — redshift vs comoving_ortho
  pitch angle       — k-B angle in the fluid frame
  (s2xi, c2xi)      — polarization-basis rotation angles

Writes artifacts/FFJET_GEO_CROSSCHECK.json.

Run:  JAX_PLATFORMS=cpu python scripts/ffjet_geodesic_crosscheck.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
from scipy.integrate import solve_ivp

NPIX_CHECK = 20
NPTS = 400


# ----------------------------------------------------------------------
# independent Kerr machinery (plain NumPy, from the BL line element)
# ----------------------------------------------------------------------

def metric_cov_np(r, th, a):
    """Covariant BL metric as a 4x4 matrix (independent transcription
    of the line element, not of geometry/kerr.py)."""
    sig = r * r + a * a * np.cos(th) ** 2
    dlt = r * r - 2.0 * r + a * a
    s2 = np.sin(th) ** 2
    g = np.zeros((4, 4))
    g[0, 0] = -(1.0 - 2.0 * r / sig)
    g[0, 3] = g[3, 0] = -2.0 * a * r * s2 / sig
    g[1, 1] = sig / dlt
    g[2, 2] = sig
    g[3, 3] = (r * r + a * a + 2.0 * a * a * r * s2 / sig) * s2
    return g


def metric_con_np(r, th, a):
    return np.linalg.inv(metric_cov_np(r, th, a))


def geo_rhs(lam, y, a, l):
    """dy/dlam for y = (t, r, th, phi, k_r, k_th); k_t=-1, k_phi=l."""
    t, r, th, phi, kr, kth = y
    kcov = np.array([-1.0, kr, kth, l])
    gi = metric_con_np(r, th, a)
    kcon = gi @ kcov
    # dk_mu/dlam = -1/2 d_mu(g^{ab}) k_a k_b, numeric central difference
    hr = 1e-7 * max(abs(r), 1.0)
    hth = 1e-7
    dgr = (metric_con_np(r + hr, th, a)
           - metric_con_np(r - hr, th, a)) / (2 * hr)
    dgt = (metric_con_np(r, th + hth, a)
           - metric_con_np(r, th - hth, a)) / (2 * hth)
    dkr = -0.5 * kcov @ dgr @ kcov
    dkth = -0.5 * kcov @ dgt @ kcov
    return [kcon[0], kcon[1], kcon[2], kcon[3], dkr, dkth]


def christoffel_np(r, th, a):
    """Gamma^mu_{nu rho} from numerically differentiated g_cov."""
    hr = 1e-7 * max(abs(r), 1.0)
    hth = 1e-7
    dg = np.zeros((4, 4, 4))          # dg[s] = d_s g_{..}
    dg[1] = (metric_cov_np(r + hr, th, a)
             - metric_cov_np(r - hr, th, a)) / (2 * hr)
    dg[2] = (metric_cov_np(r, th + hth, a)
             - metric_cov_np(r, th - hth, a)) / (2 * hth)
    gi = metric_con_np(r, th, a)
    # Gamma^m_{nr} = 1/2 g^{ms} (d_n g_{sr} + d_r g_{sn} - d_s g_{nr});
    # with dg[s, a, b] = d_s g_{ab} (g symmetric in (a, b)):
    #   d_n g_{sr} -> dg[n, s, r]                   (dg itself)
    #   d_r g_{sn} -> dg[r, s, n] = dg.T(2, 0, 1)
    #   d_s g_{nr} -> dg[s, n, r] = dg.T(1, 0, 2)
    return 0.5 * np.einsum("ms,nsr->mnr",
                           gi, dg + dg.transpose(2, 1, 0)
                           - dg.transpose(1, 0, 2))


def geo_transport_rhs(lam, y, a, l):
    """Joint geodesic + basis-transport state (..., f^mu appended).

    NEGATED flow: the production trace parameterizes the ray from the
    OBSERVER toward the source, i.e. BACKWARD along the future-directed
    photon, with lam increasing along the trace — so
    dx/dlam_trace = -k^mu and all RHS terms flip sign (the geodesic and
    transport equations are reversible)."""
    base = geo_rhs(lam, y[:6], a, l)
    t, r, th, phi, kr, kth = y[:6]
    f = y[6:10]
    gi = metric_con_np(r, th, a)
    kcon = gi @ np.array([-1.0, kr, kth, l])
    gam = christoffel_np(r, th, a)
    dfdl = -np.einsum("mnr,n,r->m", gam, kcon, f)
    return [-v for v in (base + list(dfdl))]


def frame_angles_np(g, u, k, b, f):
    """Comoving-frame redshift, pitch angle and polarization rotation
    via Gram-Schmidt (independent of the Kulkarni tetrad formulas).

    All inputs contravariant; g the covariant metric matrix."""
    def dot(x, y):
        return x @ g @ y

    ku = dot(k, u)
    gred = -1.0 / ku
    # photon direction in the u-frame
    n = k + ku * u                  # note: k + (k.u) u, u.u = -1
    n = n / np.sqrt(dot(n, n))
    # project b and f perp to u then perp to n
    def perp(v):
        v = v + dot(v, u) * u
        v = v - dot(v, n) * n
        return v

    bp = perp(b)
    fp = perp(f)
    bnorm = np.sqrt(max(dot(bp, bp), 0.0))
    fnorm = np.sqrt(max(dot(fp, fp), 0.0))
    if bnorm == 0.0 or fnorm == 0.0:
        return gred, np.nan, np.nan, np.nan
    bp = bp / bnorm
    fp = fp / fnorm
    # pitch angle between k and b in the fluid frame
    bfull = b + dot(b, u) * u
    cosang = dot(n, bfull) / np.sqrt(dot(bfull, bfull))
    # oriented angle from bp to fp about n: sin from the 4-volume form
    detg = np.linalg.det(g)
    eps = np.sqrt(-detg)
    sin_x = eps * np.einsum("a,b,c,d,abcd->", u, n, bp, fp,
                            _levi_civita())
    cos_x = dot(bp, fp)
    return gred, np.arccos(np.clip(cosang, -1, 1)), \
        2 * sin_x * cos_x, cos_x * cos_x - sin_x * sin_x


_LC = None


def _levi_civita():
    global _LC
    if _LC is None:
        e = np.zeros((4, 4, 4, 4))
        from itertools import permutations
        for p in permutations(range(4)):
            sgn = 1
            pl = list(p)
            for i in range(4):
                for j in range(i + 1, 4):
                    if pl[i] > pl[j]:
                        sgn = -sgn
            e[p] = sgn
        _LC = e
    return _LC


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import pickle
    import jax.numpy as jnp
    from grtrans_tpu.geodesics import camera as cam_mod, geokerr
    from grtrans_tpu.geometry import tetrad
    from grtrans_tpu.fluid.base import load_fluid_model

    a, mu0 = 0.998, 0.906
    cam = cam_mod.make_camera(a, mu0, -40.0, 20.0, -20.0, 40.0, 100, 100)

    with open("/root/reference/test_grtrans_ffjet.p", "rb") as f:
        gold = pickle.load(f, encoding="latin1")
    bright = np.argsort(np.abs(gold[:, 0, 0]))[::-1][:NPIX_CHECK]
    print("checking pixels:", bright[:10], "...")

    # production chain on the selected pixels
    sel = lambda x: jnp.asarray(np.asarray(x)[bright])
    alpha, beta = sel(cam.alpha), sel(cam.beta)
    l, q2, sm = sel(cam.l), sel(cam.q2), sel(cam.sm)
    geo = geokerr.trace(a, mu0, alpha, beta, l, q2, sm, cam.u0, NPTS,
                        uout=0.01)
    model = load_fluid_model("FFJET", ntscl=2.0, nrscl=70.0)
    fvars = model.vals(geo.x, geo.k, a)

    # comoving_ortho on the production bundle
    okf = (jnp.all(jnp.isfinite(fvars.u), -1)
           & jnp.all(jnp.isfinite(fvars.b), -1))
    u_safe = jnp.where(okf[..., None], fvars.u,
                       jnp.array([1.0, 0.0, 0.0, 0.0]))
    b_safe = jnp.where(okf[..., None], fvars.b,
                       jnp.array([0.0, 0.0, 0.0, 1.0]))
    s2xi, c2xi, ang, gred, cosne, frame_ok = tetrad.comoving_ortho(
        geo.x[..., 1], geo.x[..., 2], a, alpha[:, None], beta[:, None],
        mu0, u_safe, b_safe, geo.k)

    # independent constants of motion (Bardeen): cross-check camera
    l_ind = -np.asarray(alpha) * np.sqrt(1 - mu0 ** 2)
    q2_ind = (np.asarray(beta) ** 2
              + (np.asarray(alpha) ** 2 - a * a) * mu0 ** 2)
    const_err = max(np.abs(l_ind - np.asarray(l)).max(),
                    np.abs(q2_ind - np.asarray(q2)).max())
    print(f"camera constants cross-check: max |delta| = {const_err:.2e}")

    res = {"camera_constants_max_err": float(const_err), "pixels": []}
    x_np = np.asarray(geo.x)
    k_np = np.asarray(geo.k)
    lam_np = np.asarray(geo.lam)
    valid_np = np.asarray(geo.valid)
    u_np = np.asarray(u_safe)
    b_np = np.asarray(b_safe)

    for ip in range(NPIX_CHECK):
        li = float(l[ip])
        v = valid_np[ip]
        nv = int(v.sum())
        if nv < 10:
            continue
        # initial conditions from the first trace sample; verify the IC
        # algebra independently (null + conserved components)
        x0 = x_np[ip, 0]
        k0 = k_np[ip, 0]
        g0 = metric_cov_np(x0[1], x0[2], a)
        kcov0 = g0 @ k0
        ic_null = abs(k0 @ g0 @ k0)
        ic_kt = abs(kcov0[0] + 1.0)
        ic_kp = abs(kcov0[3] - li)
        # transported-basis IC from the production transport at sample 0
        from grtrans_tpu.geometry import kerr as kerr_mod
        gc0 = kerr_mod.metric_cov(jnp.asarray(x0[1]), jnp.asarray(x0[2]),
                                  a)
        kap1 = float(alpha[ip]) + a * np.sqrt(1 - mu0 ** 2)
        kap2 = -float(beta[ip])
        f1, f2, f3 = tetrad.transport_perpk(
            jnp.asarray(k0), jnp.asarray(x0[1]), jnp.asarray(x0[2]), a,
            gc0, kap1, kap2)
        f0vec = np.array([0.0, float(f1), float(f2), float(f3)])

        y0 = [x0[0], x0[1], x0[2], x0[3], kcov0[1], kcov0[2]] \
            + list(f0vec)
        lam_end = lam_np[ip, v][-1]
        sol = solve_ivp(geo_transport_rhs, (0.0, lam_end), y0,
                        t_eval=lam_np[ip, v], args=(a, li),
                        rtol=1e-10, atol=1e-12, method="DOP853",
                        dense_output=False)
        if not sol.success or sol.y.shape[1] != nv:
            res["pixels"].append({"pix": int(bright[ip]),
                                  "status": "ode_failed"})
            continue
        yv = sol.y
        dr = np.abs(yv[1] - x_np[ip, v, 1]) / x_np[ip, v, 1]
        dth = np.abs(yv[2] - x_np[ip, v, 2])
        dph = np.abs(yv[3] - x_np[ip, v, 3])
        dt_ = np.abs(yv[0] - x_np[ip, v, 0])

        # angle chain at every 10th sample (ODE x, ODE k, ODE f; fluid
        # four-vectors from the production sampler at the ODE position).
        # The production (s2xi, c2xi) measure 2x the angle of b_perp
        # against (khat x f) — a 90-degree-rotated reference axis vs the
        # direct f-against-b angle here, i.e. (s2, c2) -> (-s2, -c2);
        # the Levi-Civita orientation adds a possible global s2 sign.
        # Both are CONVENTIONS, constant per pixel: fit the best of the
        # four sign combos per pixel and report its residual.
        dg_list, dang_list = [], []
        s2_pairs = []                  # (s2_mine, c2_mine, s2_p, c2_p)
        idxs = np.arange(0, nv, 10)
        xq = np.zeros((len(idxs), 4))
        xq[:, 0] = yv[0, idxs]
        xq[:, 1] = yv[1, idxs]
        xq[:, 2] = yv[2, idxs]
        xq[:, 3] = yv[3, idxs]
        fq = model.vals(jnp.asarray(xq)[None], None, a)
        uq = np.asarray(fq.u)[0]
        bq = np.asarray(fq.b)[0]
        vi = np.where(v)[0]
        for jn, j in enumerate(idxs):
            r_, th_ = yv[1, j], yv[2, j]
            gj = metric_cov_np(r_, th_, a)
            gi = np.linalg.inv(gj)
            kconj = gi @ np.array([-1.0, yv[4, j], yv[5, j], li])
            fj = yv[6:10, j]
            uj, bj = uq[jn], bq[jn]
            if not (np.isfinite(uj).all() and np.isfinite(bj).all()):
                continue
            gr, an, s2, c2 = frame_angles_np(gj, uj, kconj, bj, fj)
            jj = vi[j]
            if not frame_ok[ip, jj]:
                continue
            dg_list.append(abs(gr - float(gred[ip, jj]))
                           / max(abs(gr), 1e-10))
            if np.isfinite(an):
                dang_list.append(abs(an - float(ang[ip, jj])))
            if np.isfinite(s2):
                s2_pairs.append((s2, c2, float(s2xi[ip, jj]),
                                 float(c2xi[ip, jj])))
        d_xi = None
        combo = "xi_prod = pi/2 - xi_mine"
        if s2_pairs:
            arr = np.array(s2_pairs)
            # fixed convention map, verified sample-by-sample: the
            # production angles measure xi against khat x f with the
            # opposite orientation, i.e. xi_prod = pi/2 - xi_mine ->
            # (s2, c2)_prod = (+s2, -c2)_mine
            d = np.abs(arr[:, 0] - arr[:, 2]) \
                + np.abs(-arr[:, 1] - arr[:, 3])
            d_xi = float(d.max())
        res["pixels"].append({
            "pix": int(bright[ip]),
            "ic_null": float(ic_null), "ic_kt": float(ic_kt),
            "ic_kphi": float(ic_kp),
            "max_rel_dr": float(dr.max()),
            "max_dth": float(dth.max()),
            "max_dphi": float(dph.max()),
            "max_dt": float(dt_.max()),
            "max_rel_dg": float(max(dg_list)) if dg_list else None,
            "max_dpitch": float(max(dang_list)) if dang_list else None,
            "max_d_s2xi_c2xi": d_xi,
            "xi_convention": combo,
        })
        p = res["pixels"][-1]
        print(f"pix {p['pix']}: dr {p['max_rel_dr']:.2e} "
              f"dth {p['max_dth']:.2e} dphi {p['max_dphi']:.2e} "
              f"dg {p['max_rel_dg']:.2e} dpitch {p['max_dpitch']:.2e} "
              f"dxi2 {p['max_d_s2xi_c2xi']:.2e}")

    done = [p for p in res["pixels"] if "max_rel_dr" in p]
    if done:
        res["summary"] = {
            "n_pixels": len(done),
            "worst_rel_dr": max(p["max_rel_dr"] for p in done),
            "worst_dth": max(p["max_dth"] for p in done),
            "worst_dphi": max(p["max_dphi"] for p in done),
            "worst_rel_dg": max(p["max_rel_dg"] for p in done
                                if p["max_rel_dg"] is not None),
            "worst_dpitch": max(p["max_dpitch"] for p in done
                                if p["max_dpitch"] is not None),
            "worst_d_s2xi_c2xi": max(p["max_d_s2xi_c2xi"] for p in done
                                     if p["max_d_s2xi_c2xi"] is not None),
        }
        print("summary:", res["summary"])
    out = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                       "FFJET_GEO_CROSSCHECK.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
