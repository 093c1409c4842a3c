"""Geodesic engine validation against an INDEPENDENT Hamiltonian ODE
integration (geodesic equations with finite-difference metric derivatives
— shares no formulas with the Weierstrass solver)."""

import numpy as np
import numpy.linalg as la
import scipy.integrate as si
import jax.numpy as jnp
import pytest

from grtrans_tpu.geodesics import camera, geokerr
from grtrans_tpu.geometry import kerr, fourvector as fv


def _gcon(r, th, a):
    cth, sth = np.cos(th), np.sin(th)
    d = r * r - 2 * r + a * a
    rho2 = r * r + a * a * cth * cth
    g = np.zeros((4, 4))
    g[0, 0] = -((r * r + a * a) ** 2 - a * a * d * sth * sth) / rho2 / d
    g[0, 3] = g[3, 0] = -2 * a * r / rho2 / d
    g[1, 1] = d / rho2
    g[2, 2] = 1 / rho2
    g[3, 3] = (d - a * a * sth * sth) / (d * rho2 * sth * sth)
    return g


def _ode_trace_mino(x0, k0, a, minos):
    """Integrate the geodesic Hamiltonian flow reparameterized to Mino
    time (RHS scaled by rho^2) backwards along the traced direction."""
    kcov = la.inv(_gcon(x0[1], x0[2], a)) @ k0
    p0 = -kcov  # backward (traced) direction

    def rhs(s, y):
        x = y[:4]
        p = y[4:]
        rho2 = x[1] ** 2 + a * a * np.cos(x[2]) ** 2
        g = _gcon(x[1], x[2], a)
        dx = g @ p
        dp = np.zeros(4)
        for i in (1, 2):
            h = 1e-7 * max(1.0, abs(x[i]))  # relative step: r spans 1e4
            xp = x.copy(); xp[i] += h
            xm = x.copy(); xm[i] -= h
            dg = (_gcon(xp[1], xp[2], a) - _gcon(xm[1], xm[2], a)) / (2 * h)
            dp[i] = -0.5 * p @ dg @ p
        return rho2 * np.concatenate([dx, dp])

    y0 = np.concatenate([x0, p0])
    sol = si.solve_ivp(rhs, (0, minos[-1]), y0, t_eval=minos,
                       rtol=1e-10, atol=1e-10, method="DOP853")
    assert sol.status == 0, sol.message
    return sol.y[:4].T


@pytest.mark.parametrize("a,mu0", [(0.9, 0.5), (0.0, 0.8), (0.998, 0.25)])
def test_trace_vs_ode(a, mu0):
    # representative pixels: direct, turning, small impact parameter
    alpha = jnp.array([-6.0, 2.0, -1.5, 4.5])
    beta = jnp.array([3.0, -4.0, 0.3, 1.0])
    cam_l = -alpha * np.sqrt(1 - mu0 ** 2)
    cam_q2 = beta ** 2 - (a * a - alpha ** 2) * mu0 ** 2
    sm = jnp.where(beta >= 0, 1.0, -1.0)
    npts = 60
    b = geokerr.trace(a, mu0, alpha, beta, cam_l, cam_q2, sm, 1e-4, npts)
    x = np.asarray(b.x)
    k = np.asarray(b.k)
    mino = np.asarray(b.mino)
    rh = float(kerr.horizon(a))

    for i in range(len(alpha)):
        # compare on samples safely outside the horizon
        sel = np.nonzero(x[i, :, 1] > 1.1 * rh)[0]
        n = sel[-1] + 1
        minos = mino[i, :n] - mino[i, 0]
        ref = _ode_trace_mino(x[i, 0], k[i, 0], a, minos)
        # near the black hole (the emission region) we demand ppm-level
        # agreement; the far end of returning rays (r ~ 1/u0) tolerates
        # more because wp() is evaluated near a full period there.
        np.testing.assert_allclose(x[i, :n, 1], ref[:, 1], rtol=1e-4)
        close = ref[:, 1] < 100.0
        np.testing.assert_allclose(x[i, :n, 1][close], ref[close, 1],
                                   rtol=5e-6, atol=2e-6)
        np.testing.assert_allclose(x[i, :n, 2], ref[:, 2], rtol=0, atol=1e-5)
        np.testing.assert_allclose(x[i, :n, 0], ref[:, 0], rtol=5e-5,
                                   atol=5e-5)
        np.testing.assert_allclose(x[i, :n, 3], ref[:, 3], rtol=5e-5,
                                   atol=5e-5)


def test_null_and_conserved_along_trace():
    a, mu0 = 0.9, 0.5
    cam = camera.make_camera(a, mu0, -15.0, 15.0, -15.0, 15.0, 8, 8)
    b = geokerr.trace(a, mu0, cam.alpha, cam.beta, cam.l, cam.q2, cam.sm,
                      cam.u0, 40)
    g = kerr.metric_cov(b.x[..., 1], b.x[..., 2], a)
    kk = np.asarray(fv.dot(g, b.k, b.k))
    kl = np.asarray(fv.lower(g, b.k))
    v = np.asarray(b.valid)
    # normalize the null residual by k^t^2 (k components diverge ~1/Delta
    # at the horizon-adjacent final sample)
    kt2 = np.asarray(b.k[..., 0]) ** 2
    assert (np.abs(kk[v]) / np.maximum(kt2[v], 1.0)).max() < 1e-7
    np.testing.assert_allclose(kl[..., 0][v], -1.0, atol=1e-7)
    lexp = np.broadcast_to(np.asarray(cam.l)[:, None], kl[..., 3].shape)
    np.testing.assert_allclose(kl[..., 3][v], lexp[v], atol=1e-7)


def test_k_matches_position_derivative():
    # dx/dlam(affine) along the trace should equal -k
    a, mu0 = 0.7, 0.6
    alpha = jnp.array([-5.0])
    beta = jnp.array([2.5])
    l = -alpha * np.sqrt(1 - mu0 ** 2)
    q2 = beta ** 2 - (a * a - alpha ** 2) * mu0 ** 2
    b = geokerr.trace(a, mu0, alpha, beta, l, q2, jnp.array([1.0]), 1e-4, 400)
    x = np.asarray(b.x)[0]
    lam = np.asarray(b.lam)[0]
    k = np.asarray(b.k)[0]
    mid_k = 0.5 * (k[1:] + k[:-1])
    dx = np.diff(x, axis=0) / np.diff(lam)[:, None]
    err = np.abs(dx + mid_k) / (np.abs(mid_k) + 1e-3)
    assert np.median(err) < 1e-3


def test_polar_trace_thindisk():
    a, mu0 = 0.9, np.cos(np.radians(60.0))
    cam = camera.make_camera(a, mu0, -12.0, 12.0, -12.0, 12.0, 12, 12)
    b = geokerr.trace_polar(a, mu0, cam.alpha, cam.beta, cam.l, cam.q2,
                            cam.sm, cam.u0, npts=1)
    x = np.asarray(b.x)
    valid = np.asarray(b.valid)[:, -1]
    assert valid.sum() > 0.8 * len(valid)
    th = x[valid, -1, 2]
    np.testing.assert_allclose(th, np.pi / 2, atol=1e-10)
    r = x[valid, -1, 1]
    assert (r > kerr.horizon(a)).all()
    g = kerr.metric_cov(b.x[..., 1], b.x[..., 2], a)
    kk = np.asarray(fv.dot(g, b.k, b.k))
    assert np.abs(kk[valid, -1]).max() < 1e-6


def test_polar_crossing_vs_dense_trace():
    a, mu0 = 0.5, np.cos(np.radians(45.0))
    alpha = jnp.array([-4.0, 6.0])
    beta = jnp.array([1.5, -2.0])
    l = -alpha * np.sqrt(1 - mu0 ** 2)
    q2 = beta ** 2 - (a * a - alpha ** 2) * mu0 ** 2
    sm = jnp.where(beta >= 0, 1.0, -1.0)
    bp = geokerr.trace_polar(a, mu0, alpha, beta, l, q2, sm, 1e-4, npts=1)
    bt = geokerr.trace(a, mu0, alpha, beta, l, q2, sm, 1e-4, 4000)
    xp = np.asarray(bp.x)
    xt = np.asarray(bt.x)
    for i in range(2):
        if not bool(bp.valid[i, -1]):
            continue
        # first equatorial crossing = first sign change of cos(theta)
        c = np.cos(xt[i, :, 2])
        j = np.where(np.diff(np.sign(c)))[0][0]
        assert abs(xt[i, j, 1] - xp[i, -1, 1]) < 0.05 * xp[i, -1, 1]
        dphi = (xt[i, j, 3] - xp[i, -1, 3] + np.pi) % (2 * np.pi) - np.pi
        assert abs(dphi) < 0.05


def test_hermite_node_interp_vs_dense():
    """Direct accuracy pin of the Hermite node-interpolation shortcut
    (geokerr.trace(node_interp=True), the 4.4x phase-integral speedup):
    t and phi along the trace agree with the dense quadrature path
    (node_interp=False) to well below the trace's own tolerance."""
    import jax.numpy as jnp
    from grtrans_tpu.geodesics import camera as cam_mod
    a, mu0 = 0.9, 0.5
    cam = cam_mod.make_camera(a, mu0, -12.0, 12.0, -12.0, 12.0, 6, 6)
    kw = dict(npts=64, uout=0.01)
    g1 = geokerr.trace(a, mu0, cam.alpha, cam.beta, cam.l, cam.q2,
                       cam.sm, cam.u0, **kw)
    g0 = geokerr.trace(a, mu0, cam.alpha, cam.beta, cam.l, cam.q2,
                       cam.sm, cam.u0, node_interp=False, **kw)
    ok = np.asarray(g0.valid & g1.valid)
    for c, tol in ((0, 2e-4), (3, 2e-4)):          # t, phi [radians/M]
        d = np.abs(np.asarray(g1.x[..., c] - g0.x[..., c]))[ok]
        assert d.max() < tol, (c, d.max())
    # sample positions themselves are identical by construction
    np.testing.assert_allclose(np.asarray(g1.x[..., 1]),
                               np.asarray(g0.x[..., 1]), rtol=0, atol=0)


def test_phase_window_matches_full_dual_eval():
    """The static-window lam-space radial quadrature (round-5: the
    lam-space GL is only evaluated on the segments that can ever be
    near_turn — grid midpoint, trailing edge) must reproduce the full
    dual evaluation EXACTLY, f64 and mixed, turning and plunging rays."""
    from grtrans_tpu.geodesics import camera as cam_mod
    for (a, mu0, uout, npts, prec, coarse) in [
            (0.998, 0.906, 0.01, 400, "f64", 1),
            (0.9, 0.5, None, 64, "f64", 1),
            (0.998, 0.906, 0.01, 400, "mixed", 4),
            (0.9375, 0.5, 0.04, 47, "f64", 1)]:
        cam = cam_mod.make_camera(a, mu0, -15.0, 15.0, -15.0, 15.0, 8, 8)
        kw = dict(prec=prec, coarse=coarse)
        if uout is not None:
            kw["uout"] = uout
        geokerr._PHASE_WINDOW = True
        g1 = geokerr.trace(a, mu0, cam.alpha, cam.beta, cam.l, cam.q2,
                           cam.sm, cam.u0, npts, **kw)
        geokerr._PHASE_WINDOW = False
        try:
            g0 = geokerr.trace(a, mu0, cam.alpha, cam.beta, cam.l,
                               cam.q2, cam.sm, cam.u0, npts, **kw)
        finally:
            geokerr._PHASE_WINDOW = True
        for f in ("x", "k", "lam"):
            np.testing.assert_array_equal(
                np.asarray(getattr(g1, f)), np.asarray(getattr(g0, f)),
                err_msg=f"{f} a={a} prec={prec}")
