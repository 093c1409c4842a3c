"""THICKDISK / MB09 (McKinney fieldline formats) tests: coordinate
round trips, native binary readers, invariants after the MKS chain and
trilinear resampling, jonfix floors, and renders."""

import numpy as np
import jax.numpy as jnp
import pytest

from grtrans_tpu.fluid.base import load_fluid_model, SourceParams
from grtrans_tpu.fluid import thickdisk as td_mod
from grtrans_tpu.fluid import mb09 as mb_mod
from grtrans_tpu.geometry import kerr, fourvector as fv

A = 0.9
NX1, NX2, NX3 = 48, 64, 12
XBR = float(np.log(1e5))      # rout < 1e3 in the synthetic header


def test_calcrmks_roundtrip():
    x1 = jnp.asarray(np.linspace(np.log(1.4), np.log(900.0), 40))
    r = td_mod.calcrmks(x1, XBR)
    back = td_mod.x1_of_r(r, XBR)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x1),
                               atol=1e-12)


@pytest.mark.parametrize("thfunc", [td_mod.calcthmks6, mb_mod.calcthmks9],
                         ids=["jetcoords6", "defcoord9"])
def test_theta_roundtrip(thfunc):
    r = jnp.asarray(np.geomspace(2.0, 100.0, 8))[:, None]
    x2 = jnp.asarray(np.linspace(0.03, 0.97, 17))[None, :]
    th = thfunc(x2 + 0 * r, r + 0 * x2)
    thn = np.asarray(th)
    assert (np.diff(thn, axis=1) > 0).all()
    np.testing.assert_allclose(thn + thn[:, ::-1], np.pi, atol=1e-5)
    back = td_mod.x2_of_th(th, r + 0 * x2, thfunc)
    np.testing.assert_allclose(np.asarray(back),
                               np.asarray(x2 + 0 * r), atol=1e-9)


def _exact_flow(r, th):
    g = kerr.metric_cov(r, th, A)
    om = 1.0 / (r ** 1.5 + A)
    z = jnp.zeros_like(r)
    u0 = kerr.calc_u0(g, z, z, om)
    u_bl = jnp.stack([u0, z, z, om * u0], axis=-1)
    rms = float(kerr.calc_rms(A))
    u_in = kerr.rms_vel(A, th, r)
    u_bl = jnp.where(((r < rms) | ~jnp.isfinite(u0))[..., None], u_in,
                     u_bl)
    rho = np.asarray(jnp.exp(-((r - 6.0) / 6.0) ** 2)) + 1e-4
    return u_bl, rho


def _thickdisk_file(tmp):
    """Synthetic fieldline dump: exact flow -> BL -> KS -> MKS using the
    same numerical-derivative convention as the loader."""
    startx1 = np.log(1.35)
    dx1 = (np.log(60.0) - startx1) / NX1
    dx2, dx3 = 1.0 / NX2, 1.0 / NX3
    x1 = startx1 + dx1 * (0.5 + np.arange(NX1))
    x2 = dx2 * (0.5 + np.arange(NX2))
    x3 = dx3 * (0.5 + np.arange(NX3))
    X3, X2, X1 = np.meshgrid(x3, x2, x1, indexing="ij")  # x1 fastest
    x1f = jnp.asarray(X1.ravel())
    x2f = jnp.asarray(X2.ravel())
    r = td_mod.calcrmks(x1f, XBR)
    th = td_mod.calcthmks6(x2f, r)
    u_bl, rho = _exact_flow(r, th)
    d = r * r - 2 * r + A * A

    def bl2ks(v):
        return jnp.stack([v[..., 0] + 2 * r / d * v[..., 1], v[..., 1],
                          v[..., 2], v[..., 3] + A / d * v[..., 1]],
                         axis=-1)

    dx1n = 1e-4 * jnp.maximum(jnp.abs(x1f), 1e-2)
    dx2n = 1e-6 * jnp.maximum(jnp.abs(x2f), 1e-2)
    drn = 1e-4 * r
    drdx1 = (td_mod.calcrmks(x1f + 0.5 * dx1n, XBR)
             - td_mod.calcrmks(x1f - 0.5 * dx1n, XBR)) / dx1n
    dthdr = (td_mod.calcthmks6(x2f, r + 0.5 * drn)
             - td_mod.calcthmks6(x2f, r - 0.5 * drn)) / drn
    dthdx2 = (td_mod.calcthmks6(x2f + 0.5 * dx2n, r)
              - td_mod.calcthmks6(x2f - 0.5 * dx2n, r)) / dx2n

    def ks2mks(v):
        u1 = v[..., 1] / drdx1
        return jnp.stack([v[..., 0], u1,
                          (v[..., 2] - u1 * drdx1 * dthdr) / dthdx2,
                          v[..., 3] / (2 * jnp.pi)], axis=-1)

    u_mks = np.asarray(ks2mks(bl2ks(u_bl)))
    bmks = np.zeros((r.shape[0], 3))
    bmks[:, 0] = 0.05 / np.asarray(r) ** 2
    bmks[:, 2] = 0.1 / np.asarray(r)
    n = NX1 * NX2 * NX3
    dlen = 11
    data = np.zeros((n, dlen), np.float32)
    data[:, 0] = rho
    data[:, 1] = rho * 0.1          # internal energy
    data[:, 4] = u_mks[:, 0]
    data[:, 5] = u_mks[:, 1] / u_mks[:, 0]
    data[:, 6] = u_mks[:, 2] / u_mks[:, 0]
    data[:, 7] = u_mks[:, 3] / u_mks[:, 0]
    data[:, 8:11] = bmks
    hdr = [0.0, NX1, NX2, NX3, startx1, 0.0, 0.0, dx1, dx2, dx3,
           0.0, 13.0 / 9.0, A, 0.0, 1.35, 60.0, 0.3, 1.0, 1401, 1.0,
           0.0, 0, 0, 0, 0, 0, 0, 0, 0, dlen]
    f = tmp / "fieldline0100.bin"
    with open(f, "wb") as fh:
        fh.write(" ".join(map(str, hdr)).encode() + b"\n")
        fh.write(data.tobytes())
    return str(f)


def _check(model, tol_uu=5e-2, tol_ub=0.12, rho_positive=True):
    # start outside the ISCO (rms ~ 2.32 at a = 0.9): the steep
    # plunging-region u0 dominates trilinear error on coarse test grids
    rs = np.linspace(2.8, 40.0, 12)
    ths = np.linspace(0.45, np.pi - 0.45, 11)
    phs = np.linspace(0.0, 2 * np.pi, 5)
    RS, THS, PHS = np.meshgrid(rs, ths, phs, indexing="ij")
    x = jnp.zeros(RS.shape + (4,))
    x = (x.at[..., 1].set(jnp.asarray(RS))
         .at[..., 2].set(jnp.asarray(THS))
         .at[..., 3].set(jnp.asarray(PHS)))
    fvars = model.vals(x, None, A)
    g = kerr.metric_cov(x[..., 1], x[..., 2], A)
    uu = np.asarray(fv.dot(g, fvars.u, fvars.u))
    ub = np.asarray(fv.dot(g, fvars.u, fvars.b))
    err = np.abs(uu + 1)
    loc = np.unravel_index(err.argmax(), err.shape)
    assert err.max() < tol_uu, (err.max(), RS[loc], THS[loc], PHS[loc])
    bm = np.abs(np.asarray(fvars.bmag))
    assert (np.abs(ub) / (bm + 1e-12)).max() < tol_ub
    if rho_positive:
        assert (np.asarray(fvars.rho) > 0).all()
    return fvars


def test_thickdisk_invariants_and_convert(tmp_path):
    m = load_fluid_model("THICKDISK", dfile=_thickdisk_file(tmp_path),
                         jonfix=0)
    assert abs(m.asim - A) < 1e-12 and abs(m.xbr - XBR) < 1e-12
    fvars = _check(m)
    sp = SourceParams(mbh=4.3e6, mdot=3e15, mu=0.25, gmin=10.0)
    ei = m.convert(fvars, sp)
    assert np.isfinite(np.asarray(ei.tcgs)).all()
    assert np.isfinite(np.asarray(ei.ncgsnth)).all()


def test_thickdisk_jonfix_floors(tmp_path):
    """jonfix floors rho/p in high-magnetization zones
    (read_thickdisk_fieldline_file :950-967)."""
    f = _thickdisk_file(tmp_path)
    m0 = load_fluid_model("THICKDISK", dfile=f, jonfix=0)
    m1 = load_fluid_model("THICKDISK", dfile=f, jonfix=1)
    r0 = np.asarray(m0.f["rho"])
    r1 = np.asarray(m1.f["rho"])
    floored = r1 == 1e-18
    assert floored.any()                  # funnel zones get floored
    np.testing.assert_allclose(r1[~floored], r0[~floored], rtol=0)


def test_thickdisk_render(tmp_path):
    from grtrans_tpu.geodesics import camera as cam_mod, geokerr
    from grtrans_tpu import driver
    m = load_fluid_model("THICKDISK", dfile=_thickdisk_file(tmp_path))
    mu0 = 0.5
    cam = cam_mod.make_camera(A, mu0, -12.0, 12.0, -12.0, 12.0, 8, 8)
    geo = geokerr.trace(A, mu0, cam.alpha, cam.beta, cam.l, cam.q2,
                        cam.sm, cam.u0, 48, uout=0.04)
    fvars = m.vals(geo.x, geo.k, A)
    sp = SourceParams(mbh=4.3e6, mdot=3e15, mu=0.25, gmin=10.0)
    ei = m.convert(fvars, sp)
    iv = driver.render_rays(geo, fvars, ei, "POLSYNCHTH", [2.3e11], mu0,
                            cam.alpha, cam.beta, A, 4.3e6, sp,
                            iname="formal", nvals=4)
    I = np.asarray(iv[0][:, 0])
    assert np.isfinite(I).all() and I.max() > 0


# ---------------------------------------------------------------------
# MB09
# ---------------------------------------------------------------------

def _mb09_files(tmp):
    startx1 = np.log(1.45)
    x1 = np.linspace(startx1, np.log(60.0), NX1)
    x2 = np.linspace(0.02, 0.98, NX2)
    x3 = np.linspace(0.0, 1.0 - 1.0 / NX3, NX3)
    X3, X2, X1 = np.meshgrid(x3, x2, x1, indexing="ij")  # x1 fastest
    x1f = jnp.asarray(X1.ravel())
    x2f = jnp.asarray(X2.ravel())
    r = mb_mod.calcrmks(x1f, mb_mod.XBR_MB09)
    th = mb_mod.calcthmks9(x2f, r)
    u_bl, rho = _exact_flow(r, th)
    from grtrans_tpu.fluid.base import toroidal_b
    g = kerr.metric_cov(r, th, A)
    b_bl = np.asarray(toroidal_b(g, u_bl,
                                 jnp.asarray(1.0 / np.asarray(r))))
    vr = np.asarray(u_bl[..., 1] / u_bl[..., 0])
    vth = np.asarray(u_bl[..., 2] / u_bl[..., 0])
    vph = np.asarray(u_bl[..., 3] / u_bl[..., 0])
    n = NX1 * NX2 * NX3

    def rec(f, arr):
        b = arr.tobytes()
        f.write(np.int32(len(b)).tobytes())
        f.write(b)
        f.write(np.int32(len(b)).tobytes())

    gfile = tmp / "mb09_grid.bin"
    with open(gfile, "wb") as f:
        rec(f, np.array([NX1, NX2, NX3], np.int32))
        rec(f, X1.ravel().astype(np.float64))
        rec(f, X2.ravel().astype(np.float64))
        rec(f, X3.ravel().astype(np.float64))
    dfile = tmp / "mb09_0100.bin"
    data = np.concatenate([rho, rho * 0.1, vr, vth, vph,
                           b_bl[:, 0], b_bl[:, 1], b_bl[:, 2],
                           b_bl[:, 3]]).astype(np.float32)
    with open(dfile, "wb") as f:
        rec(f, np.array([9 * n], np.int32))
        rec(f, data)
    return str(gfile), str(dfile)


def test_mb09_invariants_and_convert(tmp_path):
    gfile, dfile = _mb09_files(tmp_path)
    m = load_fluid_model("MB09", gfile=gfile, dfile=dfile, asim_in=A)
    fvars = _check(m)
    sp = SourceParams(mbh=4.3e6, mdot=3e15, mu=0.25, gmin=10.0)
    ei = m.convert(fvars, sp)
    assert np.isfinite(np.asarray(ei.tcgs)).all()
    # mb09: nonthermal density = thermal density
    np.testing.assert_allclose(np.asarray(ei.ncgsnth),
                               np.asarray(ei.ncgs), rtol=0)


def test_mb09_render(tmp_path):
    from grtrans_tpu.geodesics import camera as cam_mod, geokerr
    from grtrans_tpu import driver
    gfile, dfile = _mb09_files(tmp_path)
    m = load_fluid_model("MB09", gfile=gfile, dfile=dfile, asim_in=A)
    mu0 = 0.5
    cam = cam_mod.make_camera(A, mu0, -12.0, 12.0, -12.0, 12.0, 8, 8)
    geo = geokerr.trace(A, mu0, cam.alpha, cam.beta, cam.l, cam.q2,
                        cam.sm, cam.u0, 48, uout=0.04)
    fvars = m.vals(geo.x, geo.k, A)
    sp = SourceParams(mbh=4.3e6, mdot=3e15, mu=0.25, gmin=10.0)
    ei = m.convert(fvars, sp)
    iv = driver.render_rays(geo, fvars, ei, "POLSYNCHTH", [2.3e11], mu0,
                            cam.alpha, cam.beta, A, 4.3e6, sp,
                            iname="formal", nvals=4)
    I = np.asarray(iv[0][:, 0])
    assert np.isfinite(I).all() and I.max() > 0
