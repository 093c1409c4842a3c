"""Geodesic reuse + file cache (reference load_geodesic,
geodesics.f90:155-187): the staged trace-once/render-many path must
reproduce the fused render exactly, and a bundle restored from disk
must too (with a content-key mismatch falling back to a fresh trace)."""

import numpy as np

from grtrans_tpu.config import GrtransConfig
from grtrans_tpu.orchestrator import grtrans_run
from grtrans_tpu.geodesics import cache as geo_cache


def _cfg(**kw):
    base = dict(fname="SARIAF", ename="POLSYNCHTH", nvals=4, spin=0.9,
                standard=1, nn=(8, 8, 48), mbh=4e6, mumin=0.5, mumax=0.5,
                nmu=1, nfreq=1, fmin=2.3e11, fmax=2.3e11, iname="formal",
                gridvals=(-12.0, 12.0, -12.0, 12.0),
                fargs=dict(n0=4e7, t0=1.6e11, beta=10.0))
    base.update(kw)
    return GrtransConfig(**base)


def test_reuse_geo_matches_fused():
    cfg = _cfg(nmdot=2, mdotmin=1.0, mdotmax=2.0)
    iv_fused, ab, _ = grtrans_run(cfg)
    iv_reuse, ab2, _ = grtrans_run(cfg, reuse_geo=True)
    # the staged and fused programs fuse/reassociate differently; only
    # roundoff-level differences are acceptable
    atol = 1e-10 * np.abs(iv_fused).max()
    np.testing.assert_allclose(iv_reuse, iv_fused, rtol=1e-5, atol=atol)
    np.testing.assert_allclose(ab2, ab)


def test_gdfile_roundtrip(tmp_path):
    cfg = _cfg()
    path = str(tmp_path / "geo.npz")
    iv1, _, _ = grtrans_run(cfg, gdfile=path)     # traces + writes
    import os
    assert os.path.exists(path)
    iv2, _, _ = grtrans_run(cfg, gdfile=path)     # restores from disk
    np.testing.assert_allclose(iv2, iv1, rtol=1e-12, atol=0)
    # key mismatch (different camera) -> fresh trace, not stale reuse
    cfg2 = _cfg(gridvals=(-10.0, 10.0, -10.0, 10.0))
    iv3, _, _ = grtrans_run(cfg2, gdfile=path)
    assert not np.allclose(iv3, iv1)


def test_bundle_key_discriminates():
    k1 = geo_cache.bundle_key(0.9, 0.5, 48, 0.01, -0.5, 1,
                              (-12.0, 12.0, -12.0, 12.0), 8, 8)
    k2 = geo_cache.bundle_key(0.9, 0.5, 48, 0.01, -0.5, 1,
                              (-12.0, 12.0, -12.0, 12.0), 8, 9)
    assert k1 != k2
