"""Full-scale golden regression tests against the reference Fortran's
shipped output pickles (run_grtrans_test_problems_public.py problems).

These run the reference test problems at full resolution (a few minutes
on CPU); they are skipped when the reference mount or its golden pickles
are unavailable, or when GRTRANS_SKIP_GOLDEN is set."""

import os
import pickle

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-res e2e: fast tier = -m 'not slow'

REF = "/root/reference"

skip_golden = pytest.mark.skipif(
    os.environ.get("GRTRANS_SKIP_GOLDEN") == "1"
    or not os.path.isdir(REF), reason="golden data unavailable")


def _load(name):
    with open(os.path.join(REF, name), "rb") as f:
        return pickle.load(f, encoding="latin1")


@skip_golden
def test_ffjet_golden_image():
    """Polarized FFJET image vs test_grtrans_ffjet.p.

    The ~1.36e-2 residual is a measured cross-implementation systematic
    in the upstream geometry/tetrad/sampling chain: the reference's
    cutoff tables + lookup (swap effect 1.5e-3), integrator order,
    and sampling resolution (our npts=400 is converged to 4.8e-4) are
    each ablated and EXCLUDED — see docs/FFJET_GOLDEN_ANALYSIS.md and
    artifacts/FFJET_ABLATION.json / FFJET_NPTS_CONVERGENCE.json.
    The genuinely method-sensitive part (integrator choice) is pinned
    separately at 0.5% below."""
    from grtrans_tpu.config import GrtransConfig
    from grtrans_tpu.orchestrator import grtrans_run
    base = dict(fname="FFJET", ename="POLSYNCHPL", nvals=4,
                spin=0.998, standard=1, nn=(100, 100, 400),
                uout=0.01, mbh=3.4e9, mumin=0.906, mumax=0.906,
                nfreq=1, fmin=3.45e11, fmax=3.45e11,
                gridvals=(-40.0, 20.0, -20.0, 40.0),
                fargs=dict(ntscl=2.0, nrscl=70.0))
    ivals, ab, freqs = grtrans_run(GrtransConfig(iname="lsoda", **base))
    gold = _load("test_grtrans_ffjet.p")          # (npix, nvals, 1)
    ours = ivals.transpose(1, 2, 0)
    terr = np.sum(np.abs(ours - gold)) / np.sum(np.abs(gold))
    assert terr < 1.6e-2, terr
    terr_i = np.sum(np.abs(ours[:, 0, 0] - gold[:, 0, 0])) \
        / np.sum(np.abs(gold[:, 0, 0]))
    assert terr_i < 1.35e-2, terr_i
    # cross-method consistency: the integrator contributes <=0.5% (the
    # reference's own bar for this comparison is 5%)
    iv2, _, _ = grtrans_run(GrtransConfig(iname="delo", **base))
    ours2 = iv2.transpose(1, 2, 0)
    xmeth = np.sum(np.abs(ours2 - ours)) / np.sum(np.abs(ours))
    assert xmeth < 5e-3, xmeth


@skip_golden
def test_sphacc_golden_intensity():
    """SPHACC 1-D intensity profile vs golden (reference tol 1e-1)."""
    from grtrans_tpu.config import GrtransConfig
    from grtrans_tpu.orchestrator import grtrans_run
    cfg = GrtransConfig(fname="SPHACC", ename="SYNCHTHAV", nvals=1,
                        spin=0.0, standard=1, nn=(10000, 1, 100),
                        uout=0.0025, mbh=1.0, nfreq=25, fmin=1e8,
                        fmax=1e15, mumin=0.1, mumax=0.1, nmu=1,
                        gridvals=(0.0, 400.0, 0.0, 0.0))
    ivals, ab, freqs = grtrans_run(cfg)
    gold = _load("test_grtrans_sphacc_intensity.p")
    terr = np.sum(np.abs(ivals[14, :, 0] - gold)) / np.sum(np.abs(gold))
    assert terr < 1e-1, terr
    # spectrum: annulus-weighted integration (calc_spec 1-D branch)
    gold_s = np.asarray(_load("test_grtrans_sphacc_spectrum.p"))[:, 0]
    alpha = ab[0]
    da = alpha[1] - alpha[0]
    spec = np.einsum("fp,p->f", ivals[:, :, 0], alpha) * da * 2.0 * np.pi
    terr_s = np.sum(np.abs(spec - gold_s)) / np.sum(np.abs(gold_s))
    assert terr_s < 1e-1, terr_s
