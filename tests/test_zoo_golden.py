"""Frozen self-goldens for the GRMHD model zoo (round-3 verdict missing
item #5): one small fixed render per sampler (HARM, HARM3D, IHARM,
HARMPI, KORAL, KORAL3D, THICKDISK, MB09) on the deterministic synthetic
dumps the unit tests already validate invariants on, pinned against a
committed IQUV image at rtol 1e-10 (same code, same CPU backend) — a
refactor that changes any model's output fails loudly.  This is the
golden tier of the reference's run_grtrans_test_problems_public.py:16-205
applied to the models whose reference pickles/dumps are absent from the
mount (.MISSING_LARGE_BLOBS).

Regenerate after an INTENDED behavior change:
    GRTRANS_REGEN_GOLDEN=1 python -m pytest tests/test_zoo_golden.py -q
then commit tests/data/zoo_golden.json with a justification.
"""

import json
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from grtrans_tpu.fluid.base import load_fluid_model, SourceParams

pytestmark = pytest.mark.slow

GOLDEN_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "data", "zoo_golden.json")
REGEN = bool(os.environ.get("GRTRANS_REGEN_GOLDEN"))


def _render(model, a, npts=64):
    """Fixed flagship-mini config: 8x8 camera, 64 samples, thermal
    polarized synchrotron, formal solver, f64."""
    from grtrans_tpu.geodesics import camera as cam_mod, geokerr
    from grtrans_tpu import driver
    mu0 = 0.5
    cam = cam_mod.make_camera(a, mu0, -12.0, 12.0, -12.0, 12.0, 8, 8)
    geo = geokerr.trace(a, mu0, cam.alpha, cam.beta, cam.l, cam.q2,
                       cam.sm, cam.u0, npts, uout=0.04)
    fvars = model.vals(geo.x, geo.k, a)
    sp = SourceParams(mbh=4.3e6, mdot=3e15, mu=0.25, gmin=10.0)
    ei = model.convert(fvars, sp)
    iv = driver.render_rays(geo, fvars, ei, "POLSYNCHTH", [2.3e11], mu0,
                            cam.alpha, cam.beta, a, 4.3e6, sp,
                            iname="formal", nvals=4)
    return np.asarray(iv[0])                       # (64, 4) IQUV


def _build_harm():
    from test_harm import _synthetic_dump, A
    return load_fluid_model("HARM", dump=_synthetic_dump()), A


def _build_harm3d(tmp):
    from test_grmhd3d import synthetic_flow, A, NX1, NX2, NX3
    from grtrans_tpu.geometry import kerr
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
    return load_fluid_model("HARM3D", dfile=str(dfile),
                            hfile=str(tmp / "dump.head")), A


def _build_iharm(tmp):
    from test_grmhd3d import synthetic_flow, A, NX1, NX2, NX3
    from grtrans_tpu.geometry import kerr
    h = 0.3
    mks_smooth, poly_xt, poly_alpha = 0.5, 0.82, 14.0
    x1 = np.linspace(np.log(float(kerr.horizon(A)) * 0.98), np.log(50.0),
                     NX1)
    x2 = np.linspace(0.01, 0.99, NX2)
    x3 = np.linspace(0.0, 2 * np.pi * (1 - 1.0 / NX3), NX3)
    d = synthetic_flow(
        lambda X2: np.pi * X2 + (1 - h) / 2 * np.sin(2 * np.pi * X2),
        lambda x2f, x1f: np.pi * (1 + (1 - h) * np.cos(2 * np.pi * x2f)),
        x1, x2, x3)
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
          poly_alpha, x1[0], 0, 1, 0, 14, 1.2, 50.0]
    (tmp / "iharm_dump.head").write_text(" ".join(map(str, hd)))
    return load_fluid_model("IHARM", dfile=str(dfile),
                            hfile=str(tmp / "iharm_dump.head")), A


def _build_harmpi(tmp):
    from test_harmpi import _make_dump, _private_header, A
    data, bl = _make_dump(3)
    dfile = tmp / "dump010"
    with open(dfile, "wb") as f:
        f.write(_private_header(3).encode() + b"\n")
        f.write(data.tobytes())
    return load_fluid_model("HARMPI", dfile=str(dfile)), A


def _build_koral():
    from test_koral import _koral2d_dump, A, NRELBIN
    return load_fluid_model("KORAL", dump=_koral2d_dump(),
                            nrelbin=NRELBIN), A


def _build_koral3d():
    from test_koral import _koral3d_dump, A
    return load_fluid_model("KORAL3D", dump=_koral3d_dump()), A


def _build_thickdisk(tmp):
    from test_mckinney import _thickdisk_file, A
    return load_fluid_model("THICKDISK", dfile=_thickdisk_file(tmp)), A


def _build_mb09(tmp):
    from test_mckinney import _mb09_files, A
    gfile, dfile = _mb09_files(tmp)
    return load_fluid_model("MB09", gfile=gfile, dfile=dfile,
                            asim_in=A), A


BUILDERS = {
    "HARM": lambda tmp: _build_harm(),
    "HARM3D": _build_harm3d,
    "IHARM": _build_iharm,
    "HARMPI": _build_harmpi,
    "KORAL": lambda tmp: _build_koral(),
    "KORAL3D": lambda tmp: _build_koral3d(),
    "THICKDISK": _build_thickdisk,
    "MB09": _build_mb09,
}


def _load_golden():
    if not os.path.exists(GOLDEN_PATH):
        return {}
    with open(GOLDEN_PATH) as f:
        return json.load(f)


@pytest.mark.parametrize("name", sorted(BUILDERS))
def test_zoo_golden(name, tmp_path):
    model, a = BUILDERS[name](tmp_path)
    img = _render(model, a)
    assert np.isfinite(img).all()
    assert img[:, 0].max() > 0
    golden = _load_golden()
    if REGEN or name not in golden:
        if not REGEN:
            pytest.fail(f"no golden committed for {name}; run with "
                        "GRTRANS_REGEN_GOLDEN=1 to create it")
        golden[name] = {"shape": list(img.shape),
                        "image": img.tolist()}
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(golden, f)
        return
    ref = np.asarray(golden[name]["image"])
    scale = np.abs(ref).max()
    np.testing.assert_allclose(img, ref, rtol=1e-10, atol=1e-10 * scale,
                               err_msg=f"{name} sampler output drifted "
                               "from committed self-golden")
