"""HARM model tests with a synthetic MKS dump (the reference's test
snapshot dump040 is not shipped): reference test_harm.f90 analogues —
four-velocity normalization u.u = -1 and field orthogonality u.b = 0 on
a grid — plus reader/transform round-trip and an end-to-end render."""

import numpy as np
import jax.numpy as jnp
import pytest

from grtrans_tpu.fluid import harm as harm_mod
from grtrans_tpu.fluid.base import load_fluid_model, SourceParams
from grtrans_tpu.geometry import kerr, fourvector as fv


A = 0.9375
H = 0.3
NX1, NX2 = 64, 64


def _synthetic_dump():
    """Analytic Keplerian-ish flow + toroidal field written in MKS
    variables (inverse of the model's load-time transform chain)."""
    rh = float(kerr.horizon(A))
    x1 = np.linspace(np.log(rh * 0.98), np.log(50.0), NX1)
    x2 = np.linspace(0.01, 0.99, NX2)
    X1, X2 = np.meshgrid(x1, x2, indexing="ij")
    R = np.exp(X1)
    TH = harm_mod.theta_of_x2(X2, H)
    r = jnp.asarray(R.ravel())
    th = jnp.asarray(TH.ravel())
    g = kerr.metric_cov(r, th, A)
    # Keplerian outside ISCO, plunging inside
    om = 1.0 / (r ** 1.5 + A)
    z = jnp.zeros_like(r)
    u0 = kerr.calc_u0(g, z, z, om)
    u_bl = jnp.stack([u0, z, z, om * u0], axis=-1)
    rms = float(kerr.calc_rms(A))
    u_in = kerr.rms_vel(A, th, r)
    u_bl = jnp.where(((r < rms) | ~jnp.isfinite(u0))[..., None], u_in, u_bl)
    from grtrans_tpu.fluid.base import toroidal_b
    bmag = 1.0 / r
    b_bl = toroidal_b(g, u_bl, jnp.asarray(bmag))
    # BL -> KS
    d = r * r - 2 * r + A * A

    def bl2ks_vec(v):
        vt = v[..., 0] + 2 * r / d * v[..., 1]
        vp = v[..., 3] + A / d * v[..., 1]
        return jnp.stack([vt, v[..., 1], v[..., 2], vp], axis=-1)

    # KS -> MKS
    dthdx2 = np.pi * (1 + (1 - H) * np.cos(2 * np.pi * X2.ravel()))

    def ks2mks(v):
        return jnp.stack([v[..., 0], v[..., 1] / r,
                          v[..., 2] / jnp.asarray(dthdx2), v[..., 3]],
                         axis=-1)

    u_mks = np.asarray(ks2mks(bl2ks_vec(u_bl)))
    b_mks = np.asarray(ks2mks(bl2ks_vec(b_bl)))
    rho = np.asarray(jnp.exp(-((r - 6.0) / 6.0) ** 2) + 1e-4)
    p = rho * 0.1
    return dict(tcur=0.0, nx1=NX1, nx2=NX2, a=A, gam=13.0 / 9.0, h=H,
                x1=X1.ravel(), x2=X2.ravel(), r=R.ravel(), th=TH.ravel(),
                rho=rho, p=p, u=u_mks, b=b_mks,
                gdet=np.ones(NX1 * NX2))


@pytest.fixture(scope="module")
def model():
    return load_fluid_model("HARM", dump=_synthetic_dump())


def test_fluid_invariants(model):
    # sample on a grid well inside the domain (reference test_harm.f90:
    # min(n), max|u.u+1|, max|u.b| checks)
    r = np.linspace(2.2, 40.0, 24)
    th = np.linspace(0.4, np.pi - 0.4, 23)
    R, TH = np.meshgrid(r, th, indexing="ij")
    x = jnp.zeros(R.shape + (4,))
    x = x.at[..., 1].set(jnp.asarray(R)).at[..., 2].set(jnp.asarray(TH))
    fvars = model.vals(x, None, A)
    g = kerr.metric_cov(x[..., 1], x[..., 2], A)
    uu = np.asarray(fv.dot(g, fvars.u, fvars.u))
    ub = np.asarray(fv.dot(g, fvars.u, fvars.b))
    assert np.abs(uu + 1).max() < 2e-2     # bilinear interp error
    assert np.abs(ub).max() < 2e-2 * np.abs(np.asarray(fvars.bmag)).max()
    assert (np.asarray(fvars.rho) > 0).all()


def test_grid_point_roundtrip(model):
    # at exact grid nodes the transforms + interpolation are near-exact
    d = _synthetic_dump()
    idx = [(10, 20), (30, 33), (50, 11)]
    for i, j in idx:
        flat = i * NX2 + j
        x = jnp.zeros((1, 1, 4))
        x = x.at[..., 1].set(d["r"][flat]).at[..., 2].set(d["th"][flat])
        out = model.vals(x, None, A)
        assert abs(float(out.rho[0, 0]) - d["rho"][flat]) < 1e-6
        # u0 matches the BL-converted value
        g = kerr.metric_cov(x[..., 1], x[..., 2], A)
        uu = float(fv.dot(g, out.u, out.u)[0, 0])
        assert abs(uu + 1) < 1e-6


def test_ascii_reader_roundtrip(tmp_path, model):
    d = _synthetic_dump()
    # write the reference 34-column ASCII format
    n = NX1 * NX2
    data = np.zeros((n, 34))
    data[:, 0] = d["x1"]; data[:, 1] = d["x2"]
    data[:, 2] = d["r"]; data[:, 3] = d["th"]
    data[:, 4] = d["rho"]; data[:, 5] = d["p"]
    data[:, 13:17] = d["u"]; data[:, 21:25] = d["b"]
    data[:, 33] = d["gdet"]
    header = np.zeros(26)
    header[0] = 0.0; header[1] = NX1; header[2] = NX2
    header[9] = A; header[10] = 13.0 / 9.0; header[24] = H
    p = tmp_path / "dump_test"
    with open(p, "w") as f:
        f.write(" ".join(f"{v:.10g}" for v in header) + "\n")
        np.savetxt(f, data, fmt="%.10g")
    m2 = load_fluid_model("HARM", dfile=str(p))
    assert m2.nx1 == NX1 and abs(m2.asim - A) < 1e-12
    np.testing.assert_allclose(np.asarray(m2.f["rho"]),
                               np.asarray(model.f["rho"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m2.f["u0"]),
                               np.asarray(model.f["u0"]), rtol=1e-5)


def test_harm_render(model):
    from grtrans_tpu.geodesics import camera as cam_mod, geokerr
    from grtrans_tpu import driver
    mu0 = 0.5
    cam = cam_mod.make_camera(A, mu0, -12.0, 12.0, -12.0, 12.0, 12, 12)
    # sample from r=25 inward (uout, as the reference test problems do)
    geo = geokerr.trace(A, mu0, cam.alpha, cam.beta, cam.l, cam.q2, cam.sm,
                        cam.u0, 96, uout=0.04)
    fvars = model.vals(geo.x, geo.k, A)
    sp = SourceParams(mbh=4.3e6, mdot=3e15, mu=0.25, gmin=10.0)
    ei = model.convert(fvars, sp)
    iv = driver.render_rays(geo, fvars, ei, "POLSYNCHTH", [2.3e11], mu0,
                            cam.alpha, cam.beta, A, 4.3e6, sp,
                            iname="formal", nvals=4)
    I = np.asarray(iv[0][:, 0])
    assert np.isfinite(I).all()
    assert I.max() > 0
    # polarization bounded
    P = np.sqrt(np.asarray(iv[0][:, 1]) ** 2 + np.asarray(iv[0][:, 2]) ** 2)
    nz = I > 1e-8 * I.max()
    assert (P[nz] <= I[nz] * 1.0001).all()
