"""HARMPI model tests: jetcoords (BL=3) coordinate round trips against
the smooth-transition machinery, native binary dump reading, fluid
invariants under the reference's nearest-neighbor lookup, and the
electron-temperature selection branches."""

import numpy as np
import jax.numpy as jnp
import pytest

from grtrans_tpu.fluid.base import load_fluid_model, SourceParams, toroidal_b
from grtrans_tpu.fluid import harmpi
from grtrans_tpu.fluid.harmpi import BL3Params
from grtrans_tpu.geometry import kerr, fourvector as fv

A = 0.9375
NX1, NX2, NX3 = 48, 32, 12


def _p3():
    rin = 0.87 * (1 + np.sqrt(1 - A * A))
    return BL3Params(R0=0.0, rbr=100.0, npow2=4.0, cpow2=1.0,
                     startx1=np.log(rin), r0grid=rin, r0jet=2 * rin,
                     r0disk=2 * rin, rdiskend=5 * rin, rjetend=1e3)


def test_calcrmks_roundtrip():
    p = _p3()
    # spans the power-law break at rbr = 100
    x1 = jnp.asarray(np.linspace(np.log(1.4), 5.2, 33))
    r = harmpi.calcrmks(x1, p)
    back = harmpi.x1_of_r(r, p)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x1),
                               atol=1e-12)
    # analytic dr/dx1 matches autodiff of calcrmks
    import jax
    dr = jax.vmap(jax.grad(lambda v: harmpi.calcrmks(v, p)))(x1)
    np.testing.assert_allclose(np.asarray(harmpi.drdx1_mks(x1, p)),
                               np.asarray(dr), rtol=1e-12)


def test_bl3_theta_roundtrip_and_shape():
    p = _p3()
    r = jnp.asarray(np.geomspace(2.0, 80.0, 9))[:, None]
    x2 = jnp.asarray(np.linspace(-0.98, 0.98, 21))[None, :]
    th = harmpi.calcthmksbl3(x2 + 0 * r, r + 0 * x2, p)
    thn = np.asarray(th)
    # monotonic in x2, spans (0, pi) symmetrically
    assert (np.diff(thn, axis=1) > 0).all()
    np.testing.assert_allclose(thn + thn[:, ::-1], np.pi, atol=1e-12)
    back = harmpi.x2_of_th_bl3(th, r + 0 * x2, p)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x2 + 0 * r),
                               atol=1e-9)


def test_cylindrified_theta_sane():
    p = _p3()
    r = jnp.full((15,), 1.6)
    x2 = jnp.asarray(np.linspace(-0.99, 0.99, 15))
    th = np.asarray(harmpi.calcth_cylindrified(x2, r, p))
    assert np.isfinite(th).all()
    assert (np.diff(th) > 0).all()
    # far from the axis transition radius the cylindrification is a
    # small correction
    r2 = jnp.full((15,), 60.0)
    th2 = np.asarray(harmpi.calcth_cylindrified(x2, r2, p))
    th0 = np.asarray(harmpi.calcthmksbl3(x2, r2, p))
    assert np.abs(th2 - th0).max() < 0.05


def test_mksh_theta_roundtrip():
    hs = 0.3
    th = jnp.asarray(np.linspace(0.05, np.pi - 0.05, 31))
    x2 = harmpi.x2_of_th_mksh(th, hs)
    back = harmpi.theta_mksh(x2, hs)
    np.testing.assert_allclose(np.asarray(back), np.asarray(th),
                               atol=1e-10)


def _base37():
    rin = 0.87 * (1 + np.sqrt(1 - A * A))
    startx1 = np.log(rin)
    return [0.0, NX1, NX2, NX3, NX1, NX2, NX3, 0, 0, 0,
            startx1, -1.0, 0.0, (np.log(50.0) - startx1) / NX1,
            2.0 / NX2, 2 * np.pi / NX3, 1e4, 0, A, 13.0 / 9.0, 0.5,
            1, 1, 1, 1, 1, 0, 0, 0, 0, 0.01, 0, 0, rin, 50.0, 0.3, 0.0]


def _public_header(bl):
    """46-field public harmpi header (read_harmpi_data_header :955-977);
    no electron-entropy fields."""
    vals = _base37() + [8, 0, 1.0, 1.0, 100.0, 4.0, 1.0, float(bl), 0.0]
    return " ".join(map(str, vals))


def _private_header(bl):
    """61-field private header: eHEAT=1 so kel4a-d are present; DOKTOT
    chosen so the test layout's u/b/kel columns don't overlap."""
    rin = 0.87 * (1 + np.sqrt(1 - A * A))
    cyl = [0.0, 1.0, 1.0, 100.0, 4.0, 1.0, 5.0, -1 + 1.0 / 256,
           0.25, 0.40, 2 * rin, 5 * rin, 2 * rin, 1e3, 0.75, 0.0, rin]
    vals = _base37() + [3, 3, 1, 0, 0] + [0] + cyl + [float(bl)]
    return " ".join(map(str, vals))


def test_public_header_parses():
    h = harmpi.parse_harmpi_header(_public_header(3))
    assert h["nhead"] == 46 and int(h["BL"]) == 3
    assert h["dlen"] == 42 and h["eHEAT"] == -1
    assert h["rbr"] == 100.0 and h["npow2"] == 4.0


def _make_dump(bl):
    """Synthetic harmpi full dump on the BL=1 or BL=3 grid."""
    hdr = harmpi.parse_harmpi_header(_private_header(bl))
    p3 = harmpi.bl3_params_from_header(dict(hdr))
    rin = 0.87 * (1 + np.sqrt(1 - A * A))
    x1 = np.linspace(np.log(rin), np.log(50.0), NX1)
    x2 = np.linspace(-1 + 1.0 / NX2, 1 - 1.0 / NX2, NX2)
    x3 = np.linspace(0.0, 2 * np.pi * (1 - 1.0 / NX3), NX3)
    X1, X2, X3 = np.meshgrid(x1, x2, x3, indexing="ij")
    R = np.asarray(harmpi.calcrmks(jnp.asarray(X1), p3))
    if bl == 3:
        TH = np.asarray(harmpi.calcthmksbl3(jnp.asarray(X2),
                                            jnp.asarray(R), p3))
    else:
        TH = np.asarray(harmpi.theta_mksh(jnp.asarray(X2), 0.3))
    TH = np.clip(TH, 1e-4, np.pi - 1e-4)
    r = jnp.asarray(R.ravel())
    th = jnp.asarray(TH.ravel())
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
    # BL -> KS -> MKS
    d = r * r - 2 * r + A * A

    def bl2ks(v):
        return jnp.stack([v[..., 0] + 2 * r / d * v[..., 1], v[..., 1],
                          v[..., 2], v[..., 3] + A / d * v[..., 1]],
                         axis=-1)

    x1f = jnp.asarray(X1.ravel())
    x2f = jnp.asarray(X2.ravel())
    drdx1 = harmpi.drdx1_mks(x1f, p3)
    if bl == 3:
        dx2 = 1e-6
        dthdx2 = (harmpi.calcthmksbl3(x2f + 0.5 * dx2, r, p3)
                  - harmpi.calcthmksbl3(x2f - 0.5 * dx2, r, p3)) / dx2
        dx1 = 1e-4
        dthdx1 = (harmpi.calcthmksbl3(
            x2f, harmpi.calcrmks(x1f + 0.5 * dx1, p3), p3)
            - harmpi.calcthmksbl3(
                x2f, harmpi.calcrmks(x1f - 0.5 * dx1, p3), p3)) / dx1
    else:
        dthdx2 = jnp.pi / 2 * (1 + (1 - 0.3) * jnp.cos(jnp.pi * (1 + x2f)))
        dthdx1 = jnp.zeros_like(x2f)

    def ks2mks(v):
        u1 = v[..., 1] / drdx1
        return jnp.stack([v[..., 0], u1,
                          (v[..., 2] - dthdx1 * u1) / dthdx2,
                          v[..., 3]], axis=-1)

    u_mks = np.asarray(ks2mks(bl2ks(u_bl)))
    b_mks = np.asarray(ks2mks(bl2ks(b_bl)))
    rho = np.asarray(jnp.exp(-((r - 6.0) / 6.0) ** 2)) \
        * (1 + 0.3 * np.cos(2 * np.asarray(X3.ravel()))) + 1e-4
    uint = rho * 0.1
    n = NX1 * NX2 * NX3
    data = np.zeros((n, 42), np.float32)
    data[:, 3] = X1.ravel(); data[:, 4] = X2.ravel()
    data[:, 5] = X3.ravel(); data[:, 6] = R.ravel()
    data[:, 7] = TH.ravel(); data[:, 8] = X3.ravel()
    data[:, 9] = rho; data[:, 10] = uint
    data[:, 17] = (rho * 0.01) ** (1.0 / 3.0)      # kel4a..d
    data[:, 18] = data[:, 17] * 1.1
    data[:, 19] = data[:, 17] * 1.2
    data[:, 20] = data[:, 17] * 1.3
    vpos = 18 + int(hdr["DOKTOT"])                 # 21 here: no overlap
    data[:, vpos:vpos + 4] = u_mks
    data[:, vpos + 8:vpos + 12] = b_mks
    return data, bl


@pytest.fixture(scope="module", params=[1, 3], ids=["bl1", "bl3"])
def harmpi_file(request, tmp_path_factory):
    bl = request.param
    data, _ = _make_dump(bl)
    tmp = tmp_path_factory.mktemp(f"hp{bl}")
    dfile = tmp / "dump010"
    with open(dfile, "wb") as f:
        f.write(_private_header(bl).encode() + b"\n")
        f.write(data.tobytes())
    return str(dfile)


def test_harmpi_invariants(harmpi_file):
    m = load_fluid_model("HARMPI", dfile=harmpi_file)
    assert abs(m.asim - A) < 1e-12
    # sample just inside grid nodes so the reference's upper-corner
    # nearest-neighbor lookup lands exactly on a node
    i1 = np.arange(6, NX1 - 2, 4)
    r_nodes = np.asarray(m.uniqr)[i1] * 0.999
    x2_nodes = np.asarray(m.uniqx2)[np.arange(4, NX2 - 2, 3)]
    if m.BL == 3:
        ths = [np.asarray(harmpi.calcthmksbl3(
            jnp.asarray(x2_nodes), jnp.full(len(x2_nodes), rr), m.p3))
            for rr in r_nodes]
    else:
        ths = [np.asarray(harmpi.theta_mksh(jnp.asarray(x2_nodes), 0.3))
               for rr in r_nodes]
    RS = np.repeat(r_nodes, len(x2_nodes))
    THS = np.concatenate(ths) - 1e-5
    x = jnp.zeros((len(RS), 4))
    x = x.at[:, 1].set(jnp.asarray(RS)).at[:, 2].set(jnp.asarray(THS))
    fvars = m.vals(x, None, A)
    g = kerr.metric_cov(x[..., 1], x[..., 2], A)
    uu = np.asarray(fv.dot(g, fvars.u, fvars.u))
    ub = np.asarray(fv.dot(g, fvars.u, fvars.b))
    # nearest-neighbor: node values are exact up to the evaluation
    # point being half a cell away from the node (metric mismatch)
    assert np.abs(uu + 1).max() < 0.06
    bm = np.abs(np.asarray(fvars.bmag))
    assert (np.abs(ub) / (bm + 1e-12)).max() < 0.06
    assert (np.asarray(fvars.rho) > 0).all()


def test_harmpi_electron_branches(harmpi_file):
    m = load_fluid_model("HARMPI", dfile=harmpi_file)
    x = jnp.zeros((3, 4))
    x = x.at[:, 1].set(jnp.asarray([5.0, 8.0, 12.0])).at[:, 2].set(
        np.pi / 2)
    fvars = m.vals(x, None, A)
    from grtrans_tpu.fluid import base as fbase
    # gmin >= 1: Moscibrodzka with (1/mu - 1) scalings
    sp = SourceParams(mbh=4.3e6, mdot=3e15, mu=0.25, gmin=20.0)
    ei = m.convert(fvars, sp)
    assert np.isfinite(np.asarray(ei.tcgs)).all()
    # werner branch (0 <= gmin < 1)
    sp2 = SourceParams(mbh=4.3e6, mdot=3e15, mu=0.5, gmin=0.0)
    ei2 = m.convert(fvars, sp2)
    base_t = fbase.scale_sim_units(sp2.mbh, sp2.mdot,
                                   m.mdot_code or 4.3e6 * 4.927e-6,
                                   fvars.rho, fvars.p, fvars.bmag)[2]
    assert not np.allclose(np.asarray(ei2.tcgs), np.asarray(ei.tcgs))
    # ressler branches hit each entropy field
    t_abcd = []
    for gv in (-1.0, -2.0, -3.0, -4.0):
        sp3 = SourceParams(mbh=4.3e6, mdot=3e15, gmin=gv)
        t_abcd.append(np.asarray(m.convert(fvars, sp3).tcgs))
    assert not np.allclose(t_abcd[0], t_abcd[1])
    expect = np.asarray(fbase.ressler_e(fvars.rho, m._kel["kela"]))
    np.testing.assert_allclose(t_abcd[0], expect, rtol=1e-10)


def test_harmpi_render(harmpi_file):
    from grtrans_tpu.geodesics import camera as cam_mod, geokerr
    from grtrans_tpu import driver
    m = load_fluid_model("HARMPI", dfile=harmpi_file)
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
