"""3-D GRMHD model tests (HARM3D, IHARM) with synthetic dumps written in
each reader's native binary format: reference test_harm.f90-style
invariant checks (u.u = -1, u.b = 0 after the MKS -> KS -> BL chain and
trilinear resampling) plus end-to-end renders."""

import numpy as np
import jax.numpy as jnp
import pytest

from grtrans_tpu.fluid.base import load_fluid_model, SourceParams, toroidal_b
from grtrans_tpu.geometry import kerr, fourvector as fv

A = 0.9375
NX1, NX2, NX3 = 32, 24, 16


def synthetic_flow(theta_of_x2, dth_dx2, x1, x2, x3):
    """Keplerian+plunging flow with toroidal field on a 3-D MKS-like
    grid; returns MKS-component u, b plus (r, th) and scalars."""
    X1, X2, X3 = np.meshgrid(x1, x2, x3, indexing="ij")
    R, TH, PH = np.exp(X1), theta_of_x2(X2), X3
    r = jnp.asarray(R.ravel())
    th = jnp.asarray(TH.ravel())
    g = kerr.metric_cov(r, th, A)
    om = 1.0 / (r ** 1.5 + A)
    z = jnp.zeros_like(r)
    u0 = kerr.calc_u0(g, z, z, om)
    u_bl = jnp.stack([u0, z, z, om * u0], axis=-1)
    rms = float(kerr.calc_rms(A))
    u_in = kerr.rms_vel(A, th, r)
    u_bl = jnp.where(((r < rms) | ~jnp.isfinite(u0))[..., None], u_in, u_bl)
    b_bl = toroidal_b(g, u_bl, jnp.asarray(1.0 / np.asarray(r)))
    d = r * r - 2 * r + A * A

    def bl2ks(v):
        return jnp.stack([v[..., 0] + 2 * r / d * v[..., 1], v[..., 1],
                          v[..., 2], v[..., 3] + A / d * v[..., 1]],
                         axis=-1)

    dth = jnp.asarray(dth_dx2(X2.ravel(), X1.ravel()))

    def ks2mks(v):
        return jnp.stack([v[..., 0], v[..., 1] / r, v[..., 2] / dth,
                          v[..., 3]], axis=-1)

    u_mks = np.asarray(ks2mks(bl2ks(u_bl)))
    b_mks = np.asarray(ks2mks(bl2ks(b_bl)))
    rho = np.asarray(jnp.exp(-((r - 6.0) / 6.0) ** 2)
                     * (1 + 0.3 * np.cos(2 * PH.ravel())) + 1e-4)
    return dict(X1=X1, X2=X2, X3=X3, R=R, TH=TH, PH=PH,
                u=u_mks, b=b_mks, rho=rho, p=rho * 0.1)


def check_invariants(model, rmax=40.0):
    rs = np.linspace(2.2, rmax, 12)
    ths = np.linspace(0.4, np.pi - 0.4, 11)
    phs = np.linspace(0.0, 2 * np.pi, 7)
    RS, THS, PHS = np.meshgrid(rs, ths, phs, indexing="ij")
    x = jnp.zeros(RS.shape + (4,))
    x = (x.at[..., 1].set(jnp.asarray(RS))
         .at[..., 2].set(jnp.asarray(THS))
         .at[..., 3].set(jnp.asarray(PHS)))
    fvars = model.vals(x, None, A)
    g = kerr.metric_cov(x[..., 1], x[..., 2], A)
    uu = np.asarray(fv.dot(g, fvars.u, fvars.u))
    ub = np.asarray(fv.dot(g, fvars.u, fvars.b))
    # grid nodes are exact to ~1e-7; the bound is trilinear interpolation
    # error of the steep plunging-region velocity on the coarse 32x24x16
    # synthetic grid (largest for MMKS, which concentrates theta cells at
    # the midplane and leaves the near-pole plunging zone coarse)
    assert np.abs(uu + 1).max() < 4e-2
    bm = np.abs(np.asarray(fvars.bmag))
    assert (np.abs(ub) / (bm + 1e-6 * bm.max())).max() < 0.12
    assert (np.asarray(fvars.rho) >= 0).all()
    return fvars


def render_check(model, ename="POLSYNCHTH", sp=None):
    from grtrans_tpu.geodesics import camera as cam_mod, geokerr
    from grtrans_tpu import driver
    mu0 = 0.5
    cam = cam_mod.make_camera(A, mu0, -12.0, 12.0, -12.0, 12.0, 8, 8)
    geo = geokerr.trace(A, mu0, cam.alpha, cam.beta, cam.l, cam.q2,
                        cam.sm, cam.u0, 64, uout=0.04)
    fvars = model.vals(geo.x, geo.k, A)
    sp = sp or SourceParams(mbh=4.3e6, mdot=3e15, mu=0.25, gmin=10.0)
    ei = model.convert(fvars, sp)
    iv = driver.render_rays(geo, fvars, ei, ename, [2.3e11], mu0,
                            cam.alpha, cam.beta, A, 4.3e6, sp,
                            iname="formal", nvals=4)
    I = np.asarray(iv[0][:, 0])
    assert np.isfinite(I).all()
    assert I.max() > 0
    return I


@pytest.fixture(scope="module")
def harm3d_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("h3")
    x1 = np.linspace(np.log(float(kerr.horizon(A)) * 0.98), np.log(50.0),
                     NX1)
    x2 = np.linspace(0.01, 0.99, NX2)
    x3 = np.linspace(0.0, 2 * np.pi * (1 - 1.0 / NX3), NX3)
    d = synthetic_flow(lambda X2: np.pi * X2,
                       lambda x2f, x1f: np.pi * np.ones_like(x2f),
                       x1, x2, x3)
    n = NX1 * NX2 * NX3
    data = np.zeros((n, 35), np.float32)
    data[:, 3] = d["X1"].ravel(); data[:, 4] = d["X2"].ravel()
    data[:, 5] = d["X3"].ravel(); data[:, 6] = d["R"].ravel()
    data[:, 7] = d["TH"].ravel(); data[:, 8] = d["PH"].ravel()
    data[:, 9] = d["rho"]; data[:, 10] = d["p"]
    data[:, 18:22] = d["u"]; data[:, 26:30] = d["b"]
    dfile = tmp / "dump.bin"
    with open(dfile, "wb") as f:
        f.write(b"synthetic harm3d\n")
        f.write(data.tobytes())
    hd = [0.0, NX1, NX2, NX3, x1[0], x2[0], x3[0],
          x1[1] - x1[0], x2[1] - x2[0], x3[1] - x3[0],
          A, 13.0 / 9.0, 0.0, 1.0, 0.0]
    (tmp / "dump.head").write_text(" ".join(map(str, hd)))
    return str(dfile), str(tmp / "dump.head"), d


def test_harm3d_invariants_and_render(harm3d_files):
    dfile, hfile, d = harm3d_files
    m = load_fluid_model("HARM3D", dfile=dfile, hfile=hfile)
    assert abs(m.asim - A) < 1e-12 and m.h == 1.0
    check_invariants(m)
    render_check(m)


def test_harm3d_phi_structure(harm3d_files):
    """The phi-dependent density modulation must survive sampling."""
    dfile, hfile, d = harm3d_files
    m = load_fluid_model("HARM3D", dfile=dfile, hfile=hfile)
    phs = np.linspace(0.0, 2 * np.pi * (1 - 1.0 / 32), 32)
    x = jnp.zeros((len(phs), 4))
    x = x.at[:, 1].set(6.0).at[:, 2].set(np.pi / 2)
    # sample at KS phi = grid phi (invert the BL->KS shift)
    ks_shift = float(kerr.bl2ks_phi(jnp.asarray(6.0), 0.0, A))
    x = x.at[:, 3].set(jnp.asarray(phs) - ks_shift)
    rho = np.asarray(m.vals(x, None, A).rho)
    # should trace 1 + 0.3 cos(2 phi)
    expect = np.exp(-0.0) * (1 + 0.3 * np.cos(2 * phs))
    corr = np.corrcoef(rho, expect)[0, 1]
    assert corr > 0.99


@pytest.fixture(scope="module", params=[0, 1], ids=["mks", "mmks"])
def iharm_files(request, tmp_path_factory):
    from grtrans_tpu.fluid.iharm import calcth_mmks
    metric = request.param
    tmp = tmp_path_factory.mktemp(f"ih{metric}")
    h = 0.3
    mks_smooth, poly_xt, poly_alpha = 0.5, 0.82, 14.0
    x1 = np.linspace(np.log(float(kerr.horizon(A)) * 0.98), np.log(50.0),
                     NX1)
    x2 = np.linspace(0.01, 0.99, NX2)
    x3 = np.linspace(0.0, 2 * np.pi * (1 - 1.0 / NX3), NX3)
    startx1 = x1[0]

    if metric == 1:
        def th_of(X2, X1=None):
            # need X1; meshgrid order is (x1, x2, x3)
            return None
        X1g, X2g, _ = np.meshgrid(x1, x2, x3, indexing="ij")

        def theta_map(X2):
            return np.asarray(calcth_mmks(X2, X1g, h, mks_smooth,
                                          poly_xt, poly_alpha, startx1))

        from grtrans_tpu.fluid.iharm import _mmks_derivs

        def dth(x2f, x1f):
            _, d2 = _mmks_derivs(x2f, x1f, h, mks_smooth, poly_xt,
                                 poly_alpha, startx1)
            return d2
    else:
        def theta_map(X2):
            return np.pi * X2 + (1 - h) / 2 * np.sin(2 * np.pi * X2)

        def dth(x2f, x1f):
            return np.pi * (1 + (1 - h) * np.cos(2 * np.pi * x2f))

    d = synthetic_flow(theta_map, dth, x1, x2, x3)
    n = NX1 * NX2 * NX3
    kela = (d["rho"] * 0.01) ** (1.0 / 3.0)
    data = np.zeros((n, 14), np.float32)
    data[:, 0] = d["X1"].ravel(); data[:, 1] = d["X2"].ravel()
    data[:, 2] = d["X3"].ravel()
    data[:, 3] = d["rho"]; data[:, 4] = d["p"]
    data[:, 5:9] = d["u"]; data[:, 9:13] = d["b"]; data[:, 13] = kela
    dfile = tmp / "iharm_dump"
    data.tofile(dfile)
    hd = [0.0, NX1, NX2, NX3, A, h, 13.0 / 9.0, mks_smooth, poly_xt,
          poly_alpha, startx1, metric, 1, 0, 14, 1.2, 50.0]
    (tmp / "iharm_dump.head").write_text(" ".join(map(str, hd)))
    return str(dfile), str(tmp / "iharm_dump.head")


def test_iharm_invariants_and_render(iharm_files):
    dfile, hfile = iharm_files
    m = load_fluid_model("IHARM", dfile=dfile, hfile=hfile)
    fvars = check_invariants(m)
    assert fvars.kela is not None
    render_check(m)


def test_iharm_ressler_electrons(iharm_files):
    """gmin = -1 selects entropy-based electron temperature
    (convert_fluidvars_iharm, fluid.f90:1015-1019)."""
    dfile, hfile = iharm_files
    m = load_fluid_model("IHARM", dfile=dfile, hfile=hfile)
    x = jnp.zeros((3, 4))
    x = x.at[:, 1].set(jnp.asarray([5.0, 8.0, 12.0]))
    x = x.at[:, 2].set(np.pi / 2)
    fvars = m.vals(x, None, A)
    sp = SourceParams(mbh=4.3e6, mdot=3e15, mu=0.25, gmin=-1.0)
    ei = m.convert(fvars, sp)
    from grtrans_tpu.fluid import base as fbase
    expect = np.asarray(fbase.ressler_e(fvars.rho, fvars.kela))
    np.testing.assert_allclose(np.asarray(ei.tcgs), expect, rtol=1e-10)
