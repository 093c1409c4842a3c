"""Geometry-layer invariant tests (the TPU analogue of reference
test_kerr.f90: k.k=0, basis perp k, Walker-Penrose constant recovery,
four-velocity normalization)."""

import numpy as np
import jax.numpy as jnp

from grtrans_tpu.geometry import kerr, fourvector as fv, tetrad

rng = np.random.default_rng(1)


def _sample_ray_points(a=0.9, mu0=0.5, alpha=-4.0, beta=2.0, n=16):
    """Consistent (q2, l) + points (r, mu) where both potentials >= 0."""
    l = -alpha * np.sqrt(1.0 - mu0 ** 2)
    q2 = beta ** 2 - (a * a - alpha ** 2) * mu0 ** 2
    # mu range
    c2 = a * a - l * l - q2
    mp_ = (c2 + np.sqrt(c2 * c2 + 4 * a * a * q2)) / (2 * a * a)
    mumax = np.sqrt(max(mp_, 0.0)) * 0.98
    mus = np.linspace(-mumax, mumax, n)
    rs = np.linspace(4.0, 40.0, n)
    # verify U(u) >= 0 at these radii
    u = 1.0 / rs
    U = 1.0 + c2 * u * u + 2.0 * ((a - l) ** 2 + q2) * u ** 3 \
        - a * a * q2 * u ** 4
    assert (U > 0).all()
    return q2, l, rs, mus


class TestMetrics:
    def test_cov_con_inverse(self):
        r = np.linspace(1.7, 50, 20)
        th = np.linspace(0.2, np.pi - 0.2, 20)
        for a in [0.0, 0.5, 0.998]:
            gc = np.asarray(fv.unpack(kerr.metric_cov(r, th, a)))
            gi = np.asarray(fv.unpack(kerr.metric_con(r, th, a)))
            prod = np.einsum("...ij,...jk->...ik", gc, gi)
            np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4),
                                                             prod.shape),
                                       atol=1e-11)

    def test_schwarzschild_limit(self):
        g = np.asarray(kerr.metric_cov(np.array([10.0]),
                                       np.array([np.pi / 2]), 0.0))[0]
        np.testing.assert_allclose(g[0], -(1 - 2 / 10.0), rtol=1e-14)
        np.testing.assert_allclose(g[4], 1 / (1 - 2 / 10.0), rtol=1e-14)
        np.testing.assert_allclose(g[7], 100.0, rtol=1e-14)
        np.testing.assert_allclose(g[9], 100.0, rtol=1e-14)

    def test_ks_metric_det(self):
        # det g = -rho^4 sin^2 th in both BL and KS coordinates
        r = np.array([3.0, 8.0])
        th = np.array([1.0, 2.0])
        a = 0.7
        rho2 = r ** 2 + a ** 2 * np.cos(th) ** 2
        for fn in (kerr.metric_cov, kerr.ks_metric_cov):
            g = np.asarray(fv.unpack(fn(r, th, a)))
            det = np.linalg.det(g)
            np.testing.assert_allclose(det, -rho2 ** 2 * np.sin(th) ** 2,
                                       rtol=1e-10)


class TestIsco:
    def test_known_values(self):
        assert abs(float(kerr.calc_rms(1e-8)) - 6.0) < 1e-5
        assert abs(float(kerr.calc_rms(0.998)) - 1.23687) < 1e-3
        ems, lms, rms = kerr.calc_rms_constants(1e-8)
        np.testing.assert_allclose(float(ems), np.sqrt(8.0 / 9.0), rtol=1e-6)

    def test_krolikc_zero_at_isco(self):
        for a in [0.1, 0.5, 0.9]:
            rms = float(kerr.calc_rms(a))
            kc = float(kerr.krolikc(np.array([rms * (1 + 1e-9)]), a)[0])
            assert abs(kc) < 1e-6


class TestLnrf:
    def test_roundtrip(self):
        r = np.linspace(2.5, 30, 10)
        th = np.linspace(0.3, 2.8, 10)
        a = 0.9
        vr = rng.uniform(-0.1, 0.1, 10)
        vt = rng.uniform(-0.01, 0.01, 10)
        om = rng.uniform(0.0, 0.02, 10)
        vrl, vtl, vpl = kerr.lnrf_frame(vr, vt, om, r, a, th)
        vr2, vt2, om2 = kerr.lnrf_frame_inv(vrl, vtl, vpl, r, a, th)
        np.testing.assert_allclose(np.asarray(vr2), vr, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(vt2), vt, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(om2), om, rtol=1e-12,
                                   atol=1e-14)


class TestNullp:
    def test_null_condition(self):
        a = 0.9
        q2, l, rs, mus = _sample_ray_points(a=a)
        k = kerr.calc_nullp(q2, l, a, rs, mus, 1.0, -1.0)
        g = kerr.metric_cov(rs, np.arccos(mus), a)
        kk = np.asarray(fv.dot(g, k, k))
        np.testing.assert_allclose(kk, 0.0, atol=1e-10)

    def test_conserved_quantities(self):
        # k_t = -1 (E=1), k_phi = l
        a = 0.7
        q2, l, rs, mus = _sample_ray_points(a=a, alpha=3.0, beta=-1.5)
        k = kerr.calc_nullp(q2, l, a, rs, mus, -1.0, 1.0)
        g = kerr.metric_cov(rs, np.arccos(mus), a)
        kl = np.asarray(fv.lower(g, k))
        np.testing.assert_allclose(kl[..., 0], -1.0, rtol=1e-10)
        np.testing.assert_allclose(kl[..., 3], l, rtol=1e-10)

    def test_exact_pole_finite(self):
        # round-4 advisor: mu clipped to exactly +-1 (pole-grazing
        # samples, esp. the f32 mixed path) must yield a FINITE
        # wavevector — sqrtM/safe_sqrt(1-mu^2) was 0/0 = NaN
        a = 0.9
        for dt in (jnp.float64, jnp.float32):
            mu = jnp.array([1.0, -1.0, 0.999999], dtype=dt)
            k = kerr.calc_nullp(jnp.asarray(3.0, dtype=dt),
                                jnp.asarray(0.0, dtype=dt), a,
                                jnp.array([6.0, 6.0, 6.0], dtype=dt),
                                mu, 1.0, 1.0)
            assert bool(jnp.isfinite(k).all()), dt


class TestFourVelocities:
    def test_plunging_normalization(self):
        a = 0.9
        rms = float(kerr.calc_rms(a))
        r = np.linspace(kerr.horizon(a) * 1.05, rms, 20)
        u = kerr.calc_plunging_vel(a, jnp.asarray(r))
        g = kerr.metric_cov(r, np.full(20, np.pi / 2), a)
        uu = np.asarray(fv.dot(g, u, u))
        np.testing.assert_allclose(uu, -1.0, rtol=1e-8)

    def test_rms_vel_normalization(self):
        a = 0.5
        rms = float(kerr.calc_rms(a))
        r = np.linspace(kerr.horizon(a) * 1.1, rms * 0.99, 15)
        th = np.linspace(1.0, 2.0, 15)
        u = kerr.rms_vel(a, jnp.asarray(th), jnp.asarray(r))
        g = kerr.metric_cov(r, th, a)
        uu = np.asarray(fv.dot(g, u, u))
        np.testing.assert_allclose(uu, -1.0, rtol=1e-8)


class TestTransport:
    def test_perpk_and_wp_recovery(self):
        # reference test_kerr.f90:66-94 analogue
        a = 0.9
        mu0 = 0.5
        alpha, beta = -4.0, 2.0
        q2, l, rs, mus = _sample_ray_points(a, mu0, alpha, beta)
        th = np.arccos(mus)
        k = kerr.calc_nullp(q2, l, a, rs, mus, 1.0, -1.0)
        g = kerr.metric_cov(rs, th, a)
        kap1 = alpha + a * np.sqrt(1 - mu0 ** 2)
        kap2 = -beta
        f1, f2, f3 = tetrad.transport_perpk(k, rs, th, a, g, kap1, kap2)
        f = jnp.stack([jnp.zeros_like(f1), f1, f2, f3], axis=-1)
        # f perp k everywhere along the ray
        fk = np.asarray(fv.dot(g, f, k))
        np.testing.assert_allclose(fk, 0.0, atol=1e-8)
        # recovered WP constant matches (kap1, kap2) at every point
        re, im = kerr.calc_kappapw(a, rs, mus, k, f)
        np.testing.assert_allclose(np.asarray(re), kap1, rtol=1e-8)
        np.testing.assert_allclose(np.asarray(im), -kap2, rtol=1e-8)


class TestComovingOrtho:
    def _setup(self):
        a = 0.9
        mu0 = 0.5
        alpha, beta = -4.0, 2.0
        q2, l, rs, mus = _sample_ray_points(a, mu0, alpha, beta)
        th = np.arccos(mus)
        k = kerr.calc_nullp(q2, l, a, rs, mus, 1.0, -1.0)
        g = kerr.metric_cov(rs, th, a)
        # Keplerian circular four-velocity
        om = 1.0 / (rs ** 1.5 + a)
        z = np.zeros_like(rs)
        u0 = kerr.calc_u0(g, z, z, om)
        u = jnp.stack([u0, u0 * 0, u0 * 0, u0 * om], axis=-1)
        # random spacelike b orthogonal to u: project random vector
        braw = jnp.asarray(rng.normal(size=(len(rs), 4)))
        bu = fv.dot(g, braw, u)
        b = braw + bu[..., None] * u  # b.u = 0 after (since u.u=-1)
        return a, mu0, alpha, beta, rs, th, u, b, k, g

    def test_angles_and_redshift(self):
        a, mu0, alpha, beta, rs, th, u, b, k, g = self._setup()
        s2, c2, ang, rshift, cosne, fok = tetrad.comoving_ortho(
            rs, th, a, alpha, beta, mu0, u, b, k)
        assert np.asarray(fok).all()
        np.testing.assert_allclose(np.asarray(s2) ** 2 + np.asarray(c2) ** 2,
                                   1.0, rtol=1e-9)
        assert (np.asarray(rshift) > 0).all()
        assert (np.asarray(ang) >= 0).all() and (np.asarray(ang) <= np.pi).all()
        # redshift equals 1/(-k.u) for E=1 photons: khat^t = -k.u
        ku = np.asarray(fv.dot(g, k, u))
        np.testing.assert_allclose(np.asarray(rshift), 1.0 / (-ku),
                                   rtol=1e-10)

    def test_b_orthogonality_preserved(self):
        a, mu0, alpha, beta, rs, th, u, b, k, g = self._setup()
        bu = np.asarray(fv.dot(g, b, u))
        np.testing.assert_allclose(bu, 0.0, atol=1e-10)
