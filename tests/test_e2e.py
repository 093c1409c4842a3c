"""End-to-end render smoke + physics sanity tests."""

import numpy as np

from grtrans_tpu.config import GrtransConfig
from grtrans_tpu.orchestrator import grtrans_run
from grtrans_tpu import constants as pc
import pytest

pytestmark = pytest.mark.slow  # full-res e2e: fast tier = -m 'not slow'


class TestThinDisk:
    def test_bb_image_and_spectrum(self):
        # reference thindisk problem shrunk (32x32, 4 freqs):
        # BBPOL, spin=0.9, edge-on-ish disk
        cfg = GrtransConfig(fname="THINDISK", ename="BBPOL", nvals=4,
                            spin=0.9, standard=2, nn=(32, 32, 1),
                            uout=0.01, mbh=10.0, mumin=0.26, mumax=0.26,
                            nfreq=4, fmin=2.41e16, fmax=6.31e18,
                            gridvals=(-21.0, 21.0, -21.0, 21.0),
                            fargs=dict(mbh=10.0, mdot=0.1))
        ivals, ab, freqs = grtrans_run(cfg)
        assert ivals.shape == (4, 32 * 32, 4)
        assert np.isfinite(ivals).all()
        I = ivals[:, :, 0]
        assert (I >= 0).all()
        assert I.max() > 0
        # spectrum rises then falls across the X-ray band (thermal peak)
        spec = I.sum(axis=1)
        assert spec[0] > 0
        # polarization fraction is bounded by the Chandrasekhar maximum
        Q = ivals[:, :, 1]
        U = ivals[:, :, 2]
        lp = np.sqrt(Q ** 2 + U ** 2)
        nz = I > I.max() * 1e-6
        assert (lp[nz] <= 0.1180 * I[nz] * 1.001).all()

    def test_disk_image_geometry(self):
        # face-on disk: bright ring inside ~ISCO-ish radii, zero far out
        cfg = GrtransConfig(fname="THINDISK", ename="BB", nvals=1,
                            spin=0.0, standard=2, nn=(40, 40, 1),
                            mbh=10.0, mumin=0.999, mumax=0.999,
                            nfreq=1, fmin=1e17, fmax=1e17,
                            gridvals=(-25.0, 25.0, -25.0, 25.0),
                            fargs=dict(mbh=10.0, mdot=0.1))
        ivals, ab, freqs = grtrans_run(cfg)
        I = ivals[0, :, 0].reshape(40, 40)
        alpha = ab[0].reshape(40, 40)
        beta = ab[1].reshape(40, 40)
        rho = np.sqrt(alpha ** 2 + beta ** 2)
        # emission peaks at small radii but outside the horizon shadow
        peak_r = rho.ravel()[np.argmax(I.ravel())]
        # NT temperature maximum sits near 2x ISCO; shadow inside
        assert 6.0 < peak_r < 16.0
        assert I[rho < 4].max() < 1e-6 * I.max()
        assert I[rho > 24].max() < 0.6 * I.max()


class TestPowerlawSynch:
    def test_polsynchth_image(self):
        cfg = GrtransConfig(fname="POWERLAW", ename="POLSYNCHTH", nvals=4,
                            spin=0.9, standard=1, nn=(16, 16, 128),
                            mbh=4e6, mumin=0.5, mumax=0.5,
                            nfreq=2, fmin=1e11, fmax=3e11,
                            gridvals=(-15.0, 15.0, -15.0, 15.0),
                            iname="formal",
                            fargs=dict(n0=3e7, t0=6e10, beta=10.0))
        ivals, ab, freqs = grtrans_run(cfg)
        assert ivals.shape == (2, 256, 4)
        assert np.isfinite(ivals).all()
        I = ivals[:, :, 0]
        assert (I >= -1e-20).all() and I.max() > 0
        # polarized components bounded by I
        P = np.sqrt(ivals[:, :, 1] ** 2 + ivals[:, :, 2] ** 2
                    + ivals[:, :, 3] ** 2)
        nz = I > 1e-6 * I.max()
        assert (P[nz] <= 1.0001 * I[nz]).all()

    def test_methods_consistent(self):
        base = dict(fname="POWERLAW", ename="POLSYNCHTH", nvals=4,
                    spin=0.5, standard=1, nn=(8, 8, 256), mbh=4e6,
                    mumin=0.5, mumax=0.5, nfreq=1, fmin=2e11, fmax=2e11,
                    gridvals=(-10.0, 10.0, -10.0, 10.0),
                    fargs=dict(n0=3e7, t0=6e10, beta=10.0))
        specs = {}
        for iname in ("formal", "delo", "lsoda", "lsodasph"):
            cfg = GrtransConfig(iname=iname, **base)
            ivals, _, _ = grtrans_run(cfg)
            specs[iname] = ivals[0, :, 0].sum()
        ref = specs["formal"]
        # cross-integrator consistency (reference accepts <=5%,
        # run_grtrans_test_problems_public.py:88-107)
        assert abs(specs["delo"] - ref) < 0.05 * ref
        assert abs(specs["lsoda"] - ref) < 0.02 * ref
        assert abs(specs["lsodasph"] - ref) < 0.05 * ref


class TestLsodasphRealistic:
    """Regression gate for the round-2 showstopper: iname='lsodasph'
    NaN'd on cgs-scaled SARIAF coefficients (K dlam ~ 1e3 per cell blew
    up the explicit RK4; radtrans_integrate.f90:468-613 reaches the
    same regime through LSODA's implicit stepping).  The redesigned
    exponential-splitting integrator (solvers._sph_substep) must return
    a finite image agreeing with 'formal' — measured 0.22% when the fix
    landed; the bar is 1%."""

    def test_lsodasph_realistic(self):
        base = dict(fname="SARIAF", ename="POLSYNCHTH", nvals=4,
                    spin=0.9, standard=1, nn=(10, 10, 48), mbh=4e6,
                    mumin=0.5, mumax=0.5, nfreq=1, fmin=2.3e11,
                    fmax=2.3e11, gridvals=(-12.0, 12.0, -12.0, 12.0),
                    fargs=dict(n0=4e7, t0=1.6e11, beta=10.0))
        images = {}
        for iname in ("formal", "lsodasph"):
            cfg = GrtransConfig(iname=iname, **base)
            ivals, _, _ = grtrans_run(cfg)
            images[iname] = ivals
        got = images["lsodasph"]
        ref = images["formal"]
        assert np.isfinite(got).all()
        assert got[..., 0].max() > 0
        rel = np.sum(np.abs(got[..., 0] - ref[..., 0])) \
            / np.sum(np.abs(ref[..., 0]))
        assert rel < 0.01, rel


class TestHotspot:
    def test_orbiting_spot_lightcurve(self):
        # time-dependent rendering: orbiting spot modulates the flux
        # (reference HOTSPOT + advance_hotspot_timestep path)
        cfg = GrtransConfig(fname="HOTSPOT", ename="POLSYNCHPL", nvals=4,
                            spin=0.9, standard=1, nn=(24, 24, 64), mbh=4e6,
                            mumin=0.5, mumax=0.5, nfreq=1, fmin=2.3e11,
                            fmax=2.3e11, iname="formal", nt=6, dt=16.0,
                            gridvals=(-12.0, 12.0, -12.0, 12.0),
                            fargs=dict(rspot=1.5, r0spot=6.0, n0spot=4e7))
        ivals, ab, freqs = grtrans_run(cfg)
        assert np.isfinite(ivals).all()
        lc = ivals[:, :, 0].sum(axis=1)
        assert lc.max() > 0
        # orbital modulation
        assert lc.std() / lc.mean() > 0.1

    def test_schnittman_spot(self):
        cfg = GrtransConfig(fname="SCHNITTMAN", ename="POLSYNCHPL", nvals=4,
                            spin=0.5, standard=1, nn=(16, 16, 48), mbh=4e6,
                            mumin=0.5, mumax=0.5, nfreq=1, fmin=2.3e11,
                            fmax=2.3e11, iname="formal", nt=3, dt=30.0,
                            gridvals=(-12.0, 12.0, -12.0, 12.0),
                            fargs=dict(rspot=1.5, r0spot=6.0, n0spot=4e7))
        ivals, ab, freqs = grtrans_run(cfg)
        assert np.isfinite(ivals).all()
        assert ivals[..., 0].max() > 0


class TestDiskVariants:
    def test_phatdisk_interp(self):
        # inhomogeneous disk with tabulated F_nu + INTERP emissivity
        cfg = GrtransConfig(fname="PHATDISK", ename="INTERP", nvals=1,
                            spin=0.9, standard=2, nn=(16, 16, 1), mbh=10.0,
                            mumin=0.5, mumax=0.5, nfreq=3, fmin=1e17,
                            fmax=1e18, gridvals=(-20.0, 20.0, -20.0, 20.0),
                            fargs=dict(a=0.9, mbh=10.0, mdot=0.1, nw=80,
                                       nr=150, nfreq_tab=30, fmin=3e16,
                                       fmax=3e18))
        ivals, ab, freqs = grtrans_run(cfg)
        assert np.isfinite(ivals).all()
        assert ivals[..., 0].max() > 0

    def test_numdisk_from_file(self):
        import os
        f = "/root/reference/phatdiskm8st25.bin"
        if not os.path.exists(f):
            import pytest
            pytest.skip("sample numdisk file unavailable")
        cfg = GrtransConfig(fname="NUMDISK", ename="BB", nvals=1, spin=0.9,
                            standard=2, nn=(12, 12, 1), mbh=10.0,
                            mumin=0.5, mumax=0.5, nfreq=2, fmin=1e17,
                            fmax=1e18, gridvals=(-20.0, 20.0, -20.0, 20.0),
                            fargs=dict(dfile=f, tscl=1e7))
        ivals, ab, freqs = grtrans_run(cfg)
        assert np.isfinite(ivals).all()
        assert ivals[..., 0].max() > 0
