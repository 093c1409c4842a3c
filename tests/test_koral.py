"""KORAL rad-GRMHD model tests: synthetic dumps in the native formatted
ASCII layout, MKS3 coordinate round trips, fluid invariants after
resampling (test_harm.f90 pattern), region-variant masks, nonthermal
bins, and the charles_e electron-temperature path."""

import numpy as np
import jax.numpy as jnp
import pytest

from grtrans_tpu.fluid.base import load_fluid_model, SourceParams, toroidal_b
from grtrans_tpu.fluid import koral
from grtrans_tpu.geometry import kerr, fourvector as fv

A = 0.9375
R0 = 0.0
H, AA, BB, PP = 0.6, 0.005, 0.01, 1.5
NX1, NX2, NX3 = 72, 36, 12
NRELBIN = 3


def test_mks3_roundtrip():
    r = jnp.asarray(np.geomspace(2.0, 80.0, 17))
    th = jnp.asarray(np.linspace(0.1, np.pi - 0.1, 17))
    x2 = koral.x2_mks3(th, r, H, AA, BB, PP)
    back = koral.theta_mks3(x2, r, H, AA, BB, PP)
    np.testing.assert_allclose(np.asarray(back), np.asarray(th),
                               rtol=1e-10, atol=1e-10)


def _bl_flow(r, th, ph=None):
    """Keplerian/plunging BL four-velocity + toroidal field (exact)."""
    g = kerr.metric_cov(r, th, A)
    om = 1.0 / (r ** 1.5 + A)
    z = jnp.zeros_like(r)
    u0 = kerr.calc_u0(g, z, z, om)
    u_bl = jnp.stack([u0, z, z, om * u0], axis=-1)
    rms = float(kerr.calc_rms(A))
    u_in = kerr.rms_vel(A, th, r)
    u_bl = jnp.where(((r < rms) | ~jnp.isfinite(u0))[..., None], u_in,
                     u_bl)
    b_bl = toroidal_b(g, u_bl, jnp.asarray(1.0 / np.asarray(r)))
    mod = 1.0 if ph is None else (1 + 0.3 * np.cos(2 * np.asarray(ph)))
    rho = np.asarray(jnp.exp(-((r - 6.0) / 6.0) ** 2)) * mod + 1e-4
    te = 1e10 * np.asarray(r) ** -1.0
    be = np.where(np.cos(np.asarray(th)) ** 2 > 0.5, 0.2, 0.001)
    return np.asarray(u_bl), np.asarray(b_bl), rho, te, be


def _koral2d_dump():
    x1 = np.linspace(np.log(float(kerr.horizon(A)) * 0.98 - R0),
                     np.log(90.0 - R0), NX1)
    x2 = np.linspace(0.02, 0.98, NX2)
    X1, X2 = np.meshgrid(x1, x2, indexing="ij")
    R = R0 + np.exp(X1)
    TH = np.asarray(koral.theta_mks3(jnp.asarray(X2), jnp.asarray(R),
                                     H, AA, BB, PP))
    r = jnp.asarray(R.ravel())
    th = jnp.asarray(TH.ravel())
    u, b, rho, te, be = _bl_flow(r, th)
    nnth = np.stack([rho * 10.0 ** -(i + 2) for i in range(NRELBIN)],
                    axis=-1)
    return dict(tcur=0.0, nx1=NX1, nx2=NX2, nx3=1, a=A, r0=R0, h=H,
                aa=AA, bb=BB, pp=PP, x1=X1.ravel(), x2=X2.ravel(),
                r=R.ravel(), th=TH.ravel(), rho=rho, u=u, b=b, te=te,
                be=be, nnth=nnth)


def _koral3d_dump():
    x1 = np.linspace(np.log(float(kerr.horizon(A)) * 0.98 - R0),
                     np.log(90.0 - R0), NX1)
    x2 = np.linspace(0.02, 0.98, NX2)
    x3 = np.linspace(-np.pi, np.pi * (1 - 2.0 / NX3), NX3)
    # x2 fastest, then x1, then x3
    X3, X1, X2 = np.meshgrid(x3, x1, x2, indexing="ij")
    R = R0 + np.exp(X1)
    TH = np.asarray(koral.theta_mks3(jnp.asarray(X2), jnp.asarray(R),
                                     H, AA, BB, PP))
    r = jnp.asarray(R.ravel())
    th = jnp.asarray(TH.ravel())
    u, b, rho, te, be = _bl_flow(r, th, X3.ravel())
    return dict(tcur=0.0, nx1=NX1, nx2=NX2, nx3=NX3, a=A, r0=R0, h=H,
                aa=AA, bb=BB, pp=PP, x1=X1.ravel(), x2=X2.ravel(),
                x3=X3.ravel(), r=R.ravel(), th=TH.ravel(),
                ph=X3.ravel(), rho=rho, u=u, b=b, te=te, be=be)


def _check_invariants(model, tol_uu=4e-2, tol_ub=0.12):
    rs = np.linspace(2.2, 40.0, 12)
    ths = np.linspace(0.6, np.pi - 0.6, 11)
    phs = np.linspace(-2.8, 2.8, 5)
    RS, THS, PHS = np.meshgrid(rs, ths, phs, indexing="ij")
    x = jnp.zeros(RS.shape + (4,))
    x = (x.at[..., 1].set(jnp.asarray(RS))
         .at[..., 2].set(jnp.asarray(THS))
         .at[..., 3].set(jnp.asarray(PHS)))
    fvars = model.vals(x, None, A)
    g = kerr.metric_cov(x[..., 1], x[..., 2], A)
    uu = np.asarray(fv.dot(g, fvars.u, fvars.u))
    ub = np.asarray(fv.dot(g, fvars.u, fvars.b))
    # MKS3 grids do not reach the poles; invariants hold only where the
    # point is inside the trusted region (untrusted points are masked
    # to vacuum defaults, exactly like the reference's merge() calls)
    trusted = np.asarray(fvars.rho) > 0
    assert trusted.mean() > 0.7
    assert np.abs(uu + 1)[trusted].max() < tol_uu
    bm = np.abs(np.asarray(fvars.bmag))
    assert (np.abs(ub) / (bm + 1e-6 * bm.max()))[trusted].max() < tol_ub
    assert (np.asarray(fvars.rho) >= 0).all()
    return fvars


def test_koral2d_invariants_and_bins():
    m = load_fluid_model("KORAL", dump=_koral2d_dump(), scalefac=2.0,
                         nrelbin=NRELBIN, relgammamin=10.0,
                         relgammamax=1e4)
    fvars = _check_invariants(m)
    assert fvars.nbins is not None and fvars.nbins.shape[-1] == NRELBIN
    # scalefac doubles rho and the bins, b scales with sqrt(scalefac)
    x = jnp.zeros((1, 4)).at[0, 1].set(6.0).at[0, 2].set(np.pi / 2)
    m1 = load_fluid_model("KORAL", dump=_koral2d_dump(), scalefac=1.0,
                          nrelbin=NRELBIN, relgammamin=10.0,
                          relgammamax=1e4)
    r2, r1 = m.vals(x, None, A).rho, m1.vals(x, None, A).rho
    np.testing.assert_allclose(np.asarray(r2), 2 * np.asarray(r1),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(m.vals(x, None, A).bmag),
                               np.sqrt(2) * np.asarray(
                                   m1.vals(x, None, A).bmag), rtol=1e-8)


def test_koral2d_ascii_reader(tmp_path):
    d = _koral2d_dump()
    n = NX1 * NX2
    data = np.zeros((n, 42 + NRELBIN))
    data[:, 3] = d["x1"]; data[:, 4] = d["x2"]
    data[:, 5] = d["r"]; data[:, 6] = d["th"]
    data[:, 9] = d["rho"]; data[:, 11:15] = d["u"]
    data[:, 24:28] = d["b"]; data[:, 32] = d["te"]
    data[:, 42:42 + NRELBIN] = d["nnth"]
    f = tmp_path / "kdump000"
    with open(f, "w") as fh:
        fh.write(" ".join(map(str, [0.0, NX1, NX2, A, 4.3e6, R0, H, AA,
                                    BB, PP])) + "\n")
        fh.write(f"{NRELBIN} 10.0 1e4\n")
        np.savetxt(fh, data)
    m = load_fluid_model("KORAL", dfile=str(f), nrelbin=NRELBIN,
                         relgammamin=10.0, relgammamax=1e4)
    assert m.asim == A and m.nx1 == NX1 and m.nx2 == NX2
    _check_invariants(m)


def test_koral2d_electron_temperature():
    m = load_fluid_model("KORAL", dump=_koral2d_dump())
    x = jnp.zeros((3, 4))
    x = x.at[:, 1].set(jnp.asarray([5.0, 8.0, 12.0])).at[:, 2].set(
        np.pi / 2)
    fvars = m.vals(x, None, A)
    # gmin < 1: Te straight from the dump
    ei = m.convert(fvars, SourceParams(gmin=-1.0, sigcut=1e10))
    np.testing.assert_allclose(np.asarray(ei.tcgs), np.asarray(fvars.p),
                               rtol=1e-12)
    # gmin >= 1: charles_e prescription
    from grtrans_tpu.fluid import base as fbase
    ei2 = m.convert(fvars, SourceParams(gmin=20.0, sigcut=1e10))
    expect = np.asarray(fbase.charles_e(
        fvars.rho, fvars.p + fvars.be, 2 * fvars.p + fvars.be,
        fvars.bmag, 1.0, 20.0))
    np.testing.assert_allclose(np.asarray(ei2.tcgs), expect, rtol=1e-10)


@pytest.fixture(scope="module")
def koral3d_dump():
    return _koral3d_dump()


def test_koral3d_invariants_and_phi(koral3d_dump):
    m = load_fluid_model("KORAL3D", dump=koral3d_dump)
    _check_invariants(m)
    # phi modulation survives (KORAL grids use raw BL azimuth, no
    # bl2ks shift unlike HARM3D)
    phs = np.linspace(-np.pi + 0.1, np.pi - 0.1, 24)
    x = jnp.zeros((len(phs), 4))
    x = x.at[:, 1].set(6.0).at[:, 2].set(np.pi / 2).at[:, 3].set(
        jnp.asarray(phs))
    rho = np.asarray(m.vals(x, None, A).rho)
    expect = 1 + 0.3 * np.cos(2 * phs)
    assert np.corrcoef(rho, expect)[0, 1] > 0.99


def test_koral3d_region_variants(koral3d_dump):
    """DISK zeroes the Be >= 0.05 jet; TOPJET/BOTJET keep only their
    hemisphere and zero the bound disk."""
    sp = SourceParams(gmin=-1.0, sigcut=1e10)
    xj = jnp.zeros((1, 4)).at[0, 1].set(8.0).at[0, 2].set(0.62)  # jet
    xd = jnp.zeros((1, 4)).at[0, 1].set(8.0).at[0, 2].set(np.pi / 2)
    xb = jnp.zeros((1, 4)).at[0, 1].set(8.0).at[0, 2].set(np.pi - 0.62)

    full = load_fluid_model("KORAL3D", dump=koral3d_dump)
    disk = load_fluid_model("KORAL3D_DISK", dump=koral3d_dump)
    top = load_fluid_model("KORAL3D_TOPJET", dump=koral3d_dump)
    bot = load_fluid_model("KORAL3D_BOTJET", dump=koral3d_dump)

    def n_at(model, x):
        return float(model.convert(model.vals(x, None, A), sp).ncgs[0])

    assert n_at(full, xd) > 0
    assert n_at(disk, xd) > 0
    assert n_at(disk, xj) == 0.0          # Be cut kills the jet
    assert n_at(top, xd) == 0.0           # disk zeroed in jet variants
    assert n_at(top, xj) > 0.0
    assert n_at(top, xb) == 0.0           # theta mask: wrong hemisphere
    assert n_at(bot, xb) > 0.0
    assert n_at(bot, xj) == 0.0


def test_koral3d_render(koral3d_dump):
    from grtrans_tpu.geodesics import camera as cam_mod, geokerr
    from grtrans_tpu import driver
    m = load_fluid_model("KORAL3D", dump=koral3d_dump)
    mu0 = 0.5
    cam = cam_mod.make_camera(A, mu0, -12.0, 12.0, -12.0, 12.0, 8, 8)
    geo = geokerr.trace(A, mu0, cam.alpha, cam.beta, cam.l, cam.q2,
                        cam.sm, cam.u0, 64, uout=0.04)
    fvars = m.vals(geo.x, geo.k, A)
    sp = SourceParams(mbh=4.3e6, gmin=-1.0, nfac=1e8)
    ei = m.convert(fvars, sp)
    iv = driver.render_rays(geo, fvars, ei, "POLSYNCHTH", [2.3e11], mu0,
                            cam.alpha, cam.beta, A, 4.3e6, sp,
                            iname="formal", nvals=4)
    I = np.asarray(iv[0][:, 0])
    assert np.isfinite(I).all() and I.max() > 0
