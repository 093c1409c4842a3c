"""API + IO round-trip tests (grtrans_batch parity layer)."""

import numpy as np

from grtrans_tpu.api import Grtrans
from grtrans_tpu.io.binio import write_camera_bin, read_camera_bin
from grtrans_tpu.io.fitsio import write_fits, read_fits


def test_api_thindisk_spectrum(tmp_path):
    x = Grtrans()
    x.run(fname="THINDISK", ename="BB", nvals=1, spin=0.5, standard=2,
          nn=(16, 16, 1), mbh=10.0, mumin=0.5, mumax=0.5, nfreq=3,
          fmin=1e17, fmax=1e18, gridvals=(-20.0, 20.0, -20.0, 20.0),
          fargs=dict(mbh=10.0, mdot=0.1))
    assert x.ivals.shape == (256, 1, 3)
    assert x.spec.shape == (1, 3)
    assert (x.spec >= 0).all() and x.spec.max() > 0
    # centroid of a symmetric disk image is near the origin
    x.calc_centroid_size()
    # beaming shifts an inclined disk's centroid by a few M
    assert abs(x.xcen[0]) < 8.0
    # io round trips
    p = tmp_path / "out.bin"
    x.write_output(str(p), fmt="bin")
    ab, cams, keys = read_camera_bin(str(p))
    np.testing.assert_allclose(ab, x.ab, rtol=1e-6)
    np.testing.assert_allclose(cams[0], x.ivals[:, :, 0], rtol=1e-6)
    p2 = tmp_path / "out.fits"
    x.write_output(str(p2), fmt="fits")
    ab2, cams2, keys2 = read_fits(str(p2))
    np.testing.assert_allclose(ab2, x.ab, rtol=1e-6)
    nv = x.ivals.shape[1]
    np.testing.assert_allclose(cams2[0].reshape(nv, -1).T,
                               x.ivals[:, :, 0], rtol=1e-6)


def test_unit_conversions():
    x = Grtrans()
    x.run(fname="THINDISK", ename="BB", nvals=1, spin=0.0, standard=2,
          nn=(8, 8, 1), mbh=10.0, mumin=0.7, mumax=0.7, nfreq=1,
          fmin=1e17, fmax=1e17, gridvals=(-15.0, 15.0, -15.0, 15.0),
          fargs=dict(mbh=10.0, mdot=0.1))
    s0 = x.spec.copy()
    x.convert_to_Jy(2.47e22)  # ~8 kpc
    assert x.spec.shape == s0.shape
    assert (x.spec >= 0).all()


def test_mdot_scan_single_compile():
    """nmdot>1 scans trace/compile the render body exactly ONCE: mdot is
    a traced argument of one jitted program (the reference scans mdot
    inside its hot loop, grtrans_driver.f90:134-157; round 2 recompiled
    per value via a static key)."""
    import numpy as np
    from grtrans_tpu.config import GrtransConfig
    from grtrans_tpu import orchestrator
    from grtrans_tpu.orchestrator import grtrans_run

    cfg = GrtransConfig(fname="SARIAF", ename="POLSYNCHTH", nvals=4,
                        spin=0.9, standard=1, nn=(4, 4, 16), mbh=4e6,
                        mumin=0.5, mumax=0.5, nfreq=1, fmin=2.3e11,
                        fmax=2.3e11, iname="formal",
                        gridvals=(-10.0, 10.0, -10.0, 10.0),
                        nmdot=5, mdotmin=1e15, mdotmax=1e16)
    before = orchestrator.TRACE_COUNT
    iv, ab, freqs = grtrans_run(cfg)
    traces = orchestrator.TRACE_COUNT - before
    assert iv.shape[0] == 5
    assert traces == 1, traces
    # (SARIAF's convert ignores sp.mdot — reference parity,
    # fluid.f90:1560-1585 has the n0=mdot scaling commented out — so no
    # flux-variation assert here; the scan axis itself is what's under
    # test.)
    assert np.isfinite(iv).all()
