"""Unit tests for the core numerical ops (Carlson, roots, Weierstrass,
Bessel, interpolation) against scipy / closed forms."""

import numpy as np
import scipy.special as sp
import scipy.integrate as si
import jax.numpy as jnp

from grtrans_tpu.ops import elliptic, polyroots, weierstrass, bessel, interp
from grtrans_tpu.ops import quadrature


rng = np.random.default_rng(0)


class TestCarlson:
    def test_rf_vs_scipy_ellipk(self):
        m = np.linspace(-5.0, 0.95, 40)
        ours = np.asarray(elliptic.ellk(m))
        ref = sp.ellipkm1(1.0 - m)
        np.testing.assert_allclose(ours, ref, rtol=1e-12)

    def test_ellf_vs_scipy(self):
        phi = np.linspace(-1.5, 1.5, 21)
        for m in [-2.0, 0.0, 0.3, 0.9]:
            ours = np.asarray(elliptic.ellf(phi, m))
            ref = sp.ellipkinc(phi, m)
            np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-14)

    def test_elle_vs_scipy(self):
        phi = np.linspace(0.0, 1.5, 11)
        for m in [0.0, 0.5, 0.99]:
            np.testing.assert_allclose(np.asarray(elliptic.elle(phi, m)),
                                       sp.ellipeinc(phi, m), rtol=1e-12,
                                       atol=1e-14)

    def test_carlson_vs_scipy(self):
        x = np.abs(rng.normal(size=64)) + 1e-3
        y = np.abs(rng.normal(size=64)) + 1e-3
        z = np.abs(rng.normal(size=64)) + 1e-3
        p = np.abs(rng.normal(size=64)) + 1e-3
        np.testing.assert_allclose(np.asarray(elliptic.rf(x, y, z)),
                                   sp.elliprf(x, y, z), rtol=1e-11)
        np.testing.assert_allclose(np.asarray(elliptic.rd(x, y, z)),
                                   sp.elliprd(x, y, z), rtol=1e-11)
        np.testing.assert_allclose(np.asarray(elliptic.rj(x, y, z, p)),
                                   sp.elliprj(x, y, z, p), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(elliptic.rc(x, y)),
                                   sp.elliprc(x, y), rtol=1e-11)
        # negative-y principal value
        np.testing.assert_allclose(np.asarray(elliptic.rc(x, -y)),
                                   sp.elliprc(x, -y), rtol=1e-11)


class TestPolyroots:
    def test_random_quartics(self):
        cs = rng.normal(size=(50, 5))
        cs[:, 4] = np.where(np.abs(cs[:, 4]) > 0.1, cs[:, 4], 1.0)
        zr, zi = polyroots.quartic_roots(cs[:, 0], cs[:, 1], cs[:, 2],
                                         cs[:, 3], cs[:, 4])
        ours = np.asarray(zr) + 1j * np.asarray(zi)
        for i in range(50):
            ref = np.roots(cs[i, ::-1])
            # nearest-match comparison (root ordering is not canonical)
            d = np.abs(ours[i][:, None] - ref[None, :])
            assert d.min(axis=1).max() < 1e-7
            assert d.min(axis=0).max() < 1e-7

    def test_degenerate_cubic(self):
        # leading coeff zero: three finite roots + one huge
        zr, zi = polyroots.quartic_roots(-6.0, 11.0, -6.0, 1.0, 0.0)
        zr, zi = np.asarray(zr), np.asarray(zi)
        finite = np.sort(zr[np.abs(zr) < 1e6])
        np.testing.assert_allclose(finite, [1.0, 2.0, 3.0], rtol=1e-7)

    def test_batched(self):
        c0 = np.array([1.0, 2.0])
        zr, zi = polyroots.quartic_roots(c0, 0.0, -5.0, 0.0, 1.0)
        assert zr.shape == (2, 4)


class TestWeierstrass:
    def _p_ref(self, z, g2, g3):
        # reference wp via the 3-real-root Jacobi relation or the ODE
        e = np.sort(np.roots([4.0, 0.0, -g2, -g3]).real)[::-1]
        e1, e2, e3 = e
        m = (e2 - e3) / (e1 - e3)
        sn, _, _, _ = sp.ellipj(z * np.sqrt(e1 - e3), m)
        return e3 + (e1 - e3) / sn ** 2

    def test_wp_three_real_roots(self):
        g2, g3 = 4.0, 0.5  # disc > 0
        z = np.linspace(0.05, 1.8, 30)
        p, dp = weierstrass.wp(z, g2, g3)
        np.testing.assert_allclose(np.asarray(p), self._p_ref(z, g2, g3),
                                   rtol=5e-9)
        # ODE check: wp'^2 = 4wp^3 - g2 wp - g3
        lhs = np.asarray(dp) ** 2
        rhs = 4 * np.asarray(p) ** 3 - g2 * np.asarray(p) - g3
        np.testing.assert_allclose(lhs, rhs, rtol=1e-7, atol=1e-9)

    def test_wp_complex_roots(self):
        g2, g3 = -3.0, 11.0  # disc < 0
        z = np.linspace(0.05, 1.0, 20)
        p, dp = weierstrass.wp(z, g2, g3)
        lhs = np.asarray(dp) ** 2
        rhs = 4 * np.asarray(p) ** 3 - g2 * np.asarray(p) - g3
        np.testing.assert_allclose(lhs, rhs, rtol=1e-9)

    def test_invert_quartic_vs_ode(self):
        # dx/dlam = s sqrt(f(x)) with a quartic that has a turning point;
        # compare against scipy ODE integration through the turn.
        A, B, C, D, E = -1.0, 0.1, 5.0, -0.2, 3.0
        x0 = 0.3
        s = 1.0

        def rhs(t, y):
            f = (((A * y[0] + B) * y[0] + C) * y[0] + D) * y[0] + E
            return [np.sqrt(max(f, 0.0))]

        # integrate up to near the turning point, with event-free smallness
        lam = np.linspace(0.0, 0.6, 25)
        sol = si.solve_ivp(rhs, (0, lam[-1]), [x0], t_eval=lam,
                           rtol=1e-12, atol=1e-12)
        ours = np.asarray(weierstrass.invert_quartic(A, B, C, D, E, x0, s, lam))
        np.testing.assert_allclose(ours, sol.y[0], rtol=1e-8, atol=1e-9)

    def test_invert_through_turning_point(self):
        # f(x) = (1-x^2)(x^2+1): turning at x=1; solution is smooth there.
        A, B, C, D, E = -1.0, 0.0, 0.0, 0.0, 1.0
        # exact solution of dx/dlam = sqrt(1-x^4) from 0: x = sl(lam)
        # (lemniscatic sine); check symmetry x(lam_turn+d)=x(lam_turn-d)
        lam_turn = float(sp.ellipkinc(np.pi / 2, 0.5) / np.sqrt(2.0))
        d = np.linspace(0.0, 0.3, 10)
        xa = np.asarray(weierstrass.invert_quartic(A, B, C, D, E, 0.0, 1.0,
                                                   lam_turn - d))
        xb = np.asarray(weierstrass.invert_quartic(A, B, C, D, E, 0.0, 1.0,
                                                   lam_turn + d))
        np.testing.assert_allclose(xa, xb, rtol=1e-9, atol=1e-10)
        assert abs(float(xa[0]) - 1.0) < 1e-9

    def test_invert_deriv(self):
        A, B, C, D, E = -0.5, 0.0, 2.0, 0.3, 1.0
        lam = np.linspace(0.0, 0.5, 11)
        x, dx = weierstrass.invert_quartic_with_deriv(A, B, C, D, E, 0.1, 1.0,
                                                      lam)
        f = (((A * x + B) * x + C) * x + D) * x + E
        np.testing.assert_allclose(np.abs(np.asarray(dx)),
                                   np.sqrt(np.maximum(np.asarray(f), 0.0)),
                                   rtol=1e-7, atol=1e-9)


class TestBessel:
    def test_k0k1(self):
        x = np.logspace(-2, 1.5, 40)
        np.testing.assert_allclose(np.asarray(bessel.besselk0(x)),
                                   sp.kv(0, x), rtol=2e-7)
        np.testing.assert_allclose(np.asarray(bessel.besselk1(x)),
                                   sp.kv(1, x), rtol=2e-7)

    def test_k2(self):
        x = np.logspace(-1, 1.5, 30)
        np.testing.assert_allclose(np.asarray(bessel.besselk2(x)),
                                   sp.kv(2, x), rtol=2e-6)

    def test_i0i1(self):
        x = np.linspace(0.01, 10, 30)
        np.testing.assert_allclose(np.asarray(bessel.besseli0(x)),
                                   sp.iv(0, x), rtol=2e-7)
        np.testing.assert_allclose(np.asarray(bessel.besseli1(x)),
                                   sp.iv(1, x), rtol=2e-7)


class TestInterp:
    def test_get_weight(self):
        xarr = jnp.array([0.0, 1.0, 2.0, 4.0])
        ix, w = interp.get_weight(xarr, jnp.array([0.5, 3.0, -1.0, 5.0]))
        np.testing.assert_array_equal(np.asarray(ix), [0, 2, 0, 2])
        np.testing.assert_allclose(np.asarray(w), [0.5, 0.5, -1.0, 1.5])

    def test_trilinear_exact_for_linear(self):
        # trilinear interp is exact for a linear function
        nx, ny, nz = 4, 5, 6
        X, Y, Z = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                              indexing="ij")
        f = jnp.asarray(2.0 * X - 3.0 * Y + 0.5 * Z + 1.0)
        pts = rng.uniform(0, 1, size=(10, 3)) * [nx - 1, ny - 1, nz - 1]
        ix, iy, iz = (np.clip(pts[:, i].astype(int), 0, d - 2)
                      for i, d in enumerate((nx, ny, nz)))
        ix = np.clip(pts[:, 0].astype(int), 0, nx - 2)
        iy = np.clip(pts[:, 1].astype(int), 0, ny - 2)
        iz = np.clip(pts[:, 2].astype(int), 0, nz - 2)
        wx, wy, wz = pts[:, 0] - ix, pts[:, 1] - iy, pts[:, 2] - iz
        out = np.asarray(interp.trilinear(f, ix, iy, iz, wx, wy, wz))
        ref = 2.0 * pts[:, 0] - 3.0 * pts[:, 1] + 0.5 * pts[:, 2] + 1.0
        np.testing.assert_allclose(out, ref, rtol=1e-12)

    def test_tsum(self):
        x = jnp.linspace(0, 1, 101)
        y = x * x
        out = np.asarray(interp.tsum(x, y))
        assert abs(out[-1] - 1.0 / 3.0) < 1e-4


class TestQuadrature:
    def test_integrate(self):
        val = float(quadrature.integrate(jnp.sin, 0.0, np.pi, n=32))
        assert abs(val - 2.0) < 1e-13

    def test_cumulative(self):
        pts = jnp.linspace(0.0, 2.0, 17)
        F = np.asarray(quadrature.cumulative_segments(jnp.exp, pts, n=8))
        np.testing.assert_allclose(F, np.exp(np.asarray(pts)) - 1.0,
                                   rtol=1e-12)


class TestPolint:
    """SLATEC POLINT/POLYVL parity (reference interpolate.f90:25-29 +
    vendored polint.f/polyvl.f)."""

    def test_interpolates_exactly_through_nodes(self):
        from grtrans_tpu.ops.interp import polint, polyvl
        rng = np.random.default_rng(0)
        x = jnp.asarray(np.sort(rng.uniform(-2, 2, (5, 6)), axis=-1))
        y = jnp.asarray(rng.uniform(-1, 1, (5, 6)))
        c = polint(x, y)
        for i in range(6):
            v = polyvl(x[..., i], x, c)
            np.testing.assert_allclose(np.asarray(v), np.asarray(y[..., i]),
                                       rtol=1e-9, atol=1e-9)

    def test_matches_numpy_polyfit_polynomial(self):
        from grtrans_tpu.ops.interp import polint, polyvl
        xs = np.array([0.0, 0.7, 1.1, 2.3, 3.1])
        ys = 2.0 - xs + 0.5 * xs ** 2 + 0.1 * xs ** 3 - 0.02 * xs ** 4
        c = polint(jnp.asarray(xs)[None], jnp.asarray(ys)[None])
        t = np.linspace(-0.5, 3.5, 11)
        got = np.array([float(np.asarray(polyvl(jnp.asarray([tt]),
                                                jnp.asarray(xs)[None],
                                                c))[0]) for tt in t])
        expect = 2.0 - t + 0.5 * t ** 2 + 0.1 * t ** 3 - 0.02 * t ** 4
        np.testing.assert_allclose(got, expect, rtol=1e-9, atol=1e-9)

    def test_derivative(self):
        from grtrans_tpu.ops.interp import polint, polyvl
        xs = np.array([0.0, 0.5, 1.0, 1.5])
        ys = 1.0 + 3.0 * xs - xs ** 2          # quadratic: exact
        c = polint(jnp.asarray(xs)[None], jnp.asarray(ys)[None])
        v, (d1,) = polyvl(jnp.asarray([0.8]), jnp.asarray(xs)[None], c,
                          nder=1)
        np.testing.assert_allclose(np.asarray(v)[0],
                                   1.0 + 3 * 0.8 - 0.8 ** 2, rtol=1e-10)
        np.testing.assert_allclose(np.asarray(d1)[0], 3.0 - 2 * 0.8,
                                   rtol=1e-9)
