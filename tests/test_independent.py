"""Independent second-implementation cross-check of the Stokes solvers.

Role parity with the reference's analytic_pol_rad_trans.py (343 LoC of
from-scratch NumPy validating its Fortran integrators): every routine
here is pure NumPy/SciPy — scipy.linalg.expm for the per-cell matricant,
numpy.linalg.solve for source functions, a plain Python loop for the
composition, scipy LSODA for continuous integration — sharing ZERO code
with grtrans_tpu.integrate.solvers (no _calc_O, no _inv4, no
associative scan).  A common-mode bug in the JAX solver stack is
detectable here by construction.

This suite exists because round 2's solvers passed every closed-form
test while composing cells in the wrong order: constant-coefficient
profiles commute, so only an independent integrator on NON-commuting
profiles (absorption and emission peaking at different depths) could
catch it.  These tests pin exactly that class.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.linalg import expm
from scipy.integrate import solve_ivp

from grtrans_tpu.integrate import solvers


# ----- independent reference implementations (pure NumPy/SciPy) -----

def mueller(Kv):
    """Opacity matrix from K = [aI aQ aU aV rhoQ rhoU rhoV]."""
    aI, aQ, aU, aV, rQ, rU, rV = Kv
    return np.array([[aI, aQ, aU, aV],
                     [aQ, aI, rV, -rU],
                     [aU, -rV, aI, rQ],
                     [aV, rU, -rQ, aI]])


def ref_matricant(lam, j, K, max_tau=10.0):
    """Sequential exact-per-cell integration: O = expm(-K_mid dl),
    p = (I - O) K_mid^{-1} j_mid, marched far -> observer with a Python
    loop.  Matches formal_solve's discretization conventions (midpoint
    coefficients, MAX_TAU truncation at the cell near edge) so the two
    should agree to the thin-cell Taylor tolerance (~1e-5)."""
    npts = len(lam)
    dl = np.diff(lam)
    am = 0.5 * (np.abs(K[1:, 0]) + np.abs(K[:-1, 0]))
    tau = np.cumsum(am * dl)
    tau_near = np.concatenate([[0.0], tau[:-1]])
    I = np.zeros(4)
    for c in range(npts - 2, -1, -1):          # far cell first
        if tau_near[c] > max_tau:
            continue
        Km = 0.5 * (K[c] + K[c + 1])
        jm = 0.5 * (j[c] + j[c + 1])
        M = mueller(Km)
        O = expm(-M * dl[c])
        p = (np.eye(4) - O) @ np.linalg.solve(M, jm)
        I = O @ I + p
    return I


def ref_lsoda(lam, j, K, rtol=1e-10):
    """Continuous integration of dI/ds = j - K I with LINEARLY
    interpolated coefficients via scipy LSODA (the reference's own
    integrator choice, radtrans_integrate.f90:468-613).  Discretization
    conventions differ from the cell methods (linear vs midpoint), so
    comparisons use coarse-mesh-independent smooth profiles."""
    def rhs(s, I):
        ell = lam[-1] - s
        jv = np.array([np.interp(ell, lam, j[:, c]) for c in range(4)])
        Kv = np.array([np.interp(ell, lam, K[:, c]) for c in range(7)])
        return jv - mueller(Kv) @ I
    L = lam[-1] - lam[0]
    sol = solve_ivp(rhs, (0.0, L), np.zeros(4), method="LSODA",
                    rtol=rtol, atol=1e-14)
    return sol.y[:, -1]


def run_jax(method, lam, j, K):
    prof = solvers.integrate(jnp.asarray(lam)[None], jnp.asarray(j)[None],
                             jnp.asarray(K)[None], method=method)
    return np.asarray(prof[0, 0])


# ----- non-commuting profiles: the class that catches order bugs -----

def _noncommuting_profiles():
    """Profiles whose cells do NOT commute: emission, absorption and
    Faraday rotation peak at different depths along the ray."""
    rng = np.random.default_rng(7)
    npts = 200
    lam = np.linspace(0.0, 1.0, npts)
    x = lam
    cases = []
    # emission deep, absorption near the observer (the SARIAF geometry
    # that exposed the round-2 scan-order bug)
    j = np.zeros((npts, 4))
    K = np.zeros((npts, 7))
    j[:, 0] = 5.0 * np.exp(-((x - 0.8) / 0.1) ** 2)
    j[:, 1] = 1.5 * np.exp(-((x - 0.8) / 0.1) ** 2)
    K[:, 0] = 4.0 * np.exp(-((x - 0.25) / 0.15) ** 2) + 0.05
    K[:, 1] = 1.0 * np.exp(-((x - 0.25) / 0.15) ** 2)
    K[:, 4] = 8.0 * np.exp(-((x - 0.5) / 0.2) ** 2)
    K[:, 6] = 5.0 * np.sin(3 * x) ** 2
    cases.append(("em-deep-abs-near", lam, j, K))
    # random smooth positive profiles (5 draws)
    for i in range(5):
        j = np.zeros((npts, 4))
        K = np.zeros((npts, 7))

        def smooth(scale):
            c = rng.uniform(0.1, 0.9, 3)
            w = rng.uniform(0.08, 0.3, 3)
            a = rng.uniform(0, scale, 3)
            return sum(ai * np.exp(-((x - ci) / wi) ** 2)
                       for ai, ci, wi in zip(a, c, w))
        j[:, 0] = smooth(3.0) + 0.01
        j[:, 1] = smooth(1.0)
        j[:, 3] = smooth(0.5)
        K[:, 0] = smooth(5.0) + 0.02
        K[:, 1] = np.minimum(smooth(2.0), 0.9 * K[:, 0])
        K[:, 4] = smooth(10.0)
        K[:, 6] = smooth(6.0)
        cases.append((f"random-{i}", lam, j, K))
    return cases


@pytest.mark.parametrize("name,lam,j,K",
                         _noncommuting_profiles(),
                         ids=lambda v: v if isinstance(v, str) else "")
def test_formal_vs_independent_matricant(name, lam, j, K):
    got = run_jax("formal", lam, j, K)
    ref = ref_matricant(lam, j, K)
    scale = np.abs(ref[0])
    assert np.all(np.abs(got - ref) < 1e-4 * scale), (name, got, ref)


def test_formal_vs_scipy_lsoda_smooth():
    """Mesh-converged comparison against continuous LSODA: on a smooth
    profile at npts=800 the cell discretization error is < 1e-4."""
    name, lam, j, K = _noncommuting_profiles()[0]
    npts = 800
    lam2 = np.linspace(0.0, 1.0, npts)
    j2 = np.stack([np.interp(lam2, lam, j[:, c]) for c in range(4)], -1)
    K2 = np.stack([np.interp(lam2, lam, K[:, c]) for c in range(7)], -1)
    got = run_jax("formal", lam2, j2, K2)
    ref = ref_lsoda(lam2, j2, K2)
    scale = np.abs(ref[0])
    assert np.all(np.abs(got - ref) < 5e-4 * scale), (got, ref)


def test_delo_vs_independent_matricant():
    """DELO agrees with the independent matricant to its short-
    characteristics accuracy on a resolved non-commuting profile."""
    name, lam, j, K = _noncommuting_profiles()[0]
    got = run_jax("delo", lam, j, K)
    ref = ref_matricant(lam, j, K)
    scale = np.abs(ref[0])
    assert np.all(np.abs(got - ref) < 2e-2 * scale), (got, ref)


def test_sphstokes_vs_independent_matricant():
    name, lam, j, K = _noncommuting_profiles()[0]
    got = run_jax("lsodasph", lam, j, K)
    ref = ref_matricant(lam, j, K)
    scale = np.abs(ref[0])
    # splitting + secular averaging: I tight, polarization looser
    assert abs(got[0] - ref[0]) < 5e-3 * scale
    assert np.all(np.abs(got[1:] - ref[1:]) < 5e-2 * scale), (got, ref)


def test_mixed_precision_vs_independent():
    """The f32 solver path (mixed precision) against the f64 NumPy
    reference: phases are f64-reduced so the error stays ~1e-5."""
    name, lam, j, K = _noncommuting_profiles()[1]
    got = run_jax("formal", lam, np.float32(j), np.float32(K))
    ref = ref_matricant(lam, j, K)
    scale = np.abs(ref[0])
    assert np.all(np.abs(got - ref) < 5e-3 * scale), (got, ref)
