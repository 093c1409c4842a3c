"""Semi-analytic Kerr null geodesics, fully vectorized over (pixel, point).

TPU-native re-design of the reference geokerr solver (geokerr_wrapper.f:
357-3762, Dexter & Agol 2009).  Key differences from the Fortran:

  * Rays are parameterized by MINO TIME lam (dr/dlam = +-sqrt(R),
    dmu/dlam = +-sqrt(M)) and sampled on an even lam grid.  Because
    dlam = du/sqrt(U), even-lam is nearly even-u at large radius (the
    reference's standard=1 sampling) but automatically densifies near
    radial AND polar turning points — subsuming the reference's MUFILL
    patch (geokerr_wrapper.f:535-572) with no special casing.
  * Both potentials are inverted with ONE uniform Biermann-Weierstrass
    formula (ops/weierstrass.py) instead of the Fortran's table of
    Jacobi-elliptic cases keyed on root configurations — branch-free,
    so every (pixel, point) is an identical instruction stream.
  * The phase integrals Delta-t, Delta-phi and the affine parameter are
    smooth functions of Mino time (turning points regularized), so they
    are integrated per-segment with fixed Gauss-Legendre nodes instead
    of the Fortran's case-by-case elliptic third-kind reductions
    (GEOPHITIME, geokerr_wrapper.f:1648-2671).

Everything is pure jnp with static shapes: (npix,) constants broadcast
against (npix, npts) sample grids; jit/vmap/shard_map/grad all apply.
"""

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from grtrans_tpu.ops import weierstrass as wss
from grtrans_tpu.ops import polyroots
from grtrans_tpu.ops.quadrature import gl_nodes
from grtrans_tpu.geometry import kerr

NQ_LAM = 48     # nodes for the one-off lam(u) integrals
# nodes per segment for cumulative t/phi/affine integrals.  Env override
# exists for honest A/B runs in subprocesses: module-level monkeypatching
# does NOT invalidate trace()'s jit cache (r5 lesson — two r4 "measured
# rejections" were cache-hit no-ops).
NQ_SEG = int(os.environ.get("GRTRANS_NQ_SEG", "8"))
HOR_EPS = 1e-6  # stop this far (in u) inside of the horizon u_+
_TINY_U = 1e-37  # absolute backstop under the relative U floor


class GeodesicBundle(NamedTuple):
    """All per-(pixel, point) geodesic data.  Arrays (npix, npts, ...)."""
    x: jnp.ndarray        # (npix, npts, 4) BL coordinates (t, r, theta, phi)
    k: jnp.ndarray        # (npix, npts, 4) wavevector (forward-in-time)
    lam: jnp.ndarray      # (npix, npts) affine parameter along trace, from 0
    mino: jnp.ndarray     # (npix, npts) Mino time along trace
    tpm: jnp.ndarray      # (npix, npts) polar turning-point count
    tpr: jnp.ndarray      # (npix, npts) radial turning-point count
    valid: jnp.ndarray    # (npix, npts) sample validity mask
    status: jnp.ndarray   # (npix,) 1 = ok, 0 = ray failed/missed


def _bc(c, ndim):
    """Broadcast a (npix,)-shaped constant against an (npix, ...) array."""
    c = jnp.asarray(c)
    return c.reshape(c.shape + (1,) * (ndim - c.ndim))


# ---------------------------------------------------------------------------
# radial potential U(u) = 1 + (a^2-l^2-q2) u^2 + 2((a-l)^2+q2) u^3 - a^2 q2 u^4
# ---------------------------------------------------------------------------

def _u_coeffs(a, l, q2):
    c0 = jnp.ones_like(l)
    c1 = jnp.zeros_like(l)
    c2 = a * a - l * l - q2
    c3 = 2.0 * ((a - l) ** 2 + q2)
    c4 = -a * a * q2
    return c0, c1, c2, c3, c4


def _u_eval(cU, u):
    c0, c1, c2, c3, c4 = (_bc(c, u.ndim) for c in cU)
    return (((c4 * u + c3) * u + c2) * u + c1) * u + c0


def _radial_setup(a, l, q2, u0, uf):
    """Turning point and Mino-time landmarks of the radial motion.

    Returns (u_turn, lam_turn, turn_mask) with u_turn = +inf (and
    lam_turn = +inf) for plunging rays that reach uf first."""
    cU = _u_coeffs(a, l, q2)
    zr, zi = polyroots.quartic_roots(*cU)
    real = polyroots.real_roots_mask(zr, zi)
    # smallest real root above u0 (motion starts at u0 moving to larger u)
    cand = jnp.where(real & (zr > _bc(u0, zr.ndim) * (1 + 1e-12)), zr, jnp.inf)
    u_turn = jnp.min(cand, axis=-1)
    turn = u_turn < uf

    # lam_turn = int_{u0}^{u_turn} du/sqrt(U) via u = u_turn - s^2
    x, w = (jnp.asarray(v) for v in gl_nodes(NQ_LAM))
    s0 = jnp.sqrt(jnp.maximum(jnp.where(turn, u_turn, u0 + 1.0) - u0, 0.0))
    s = s0[..., None] * x
    uu = jnp.where(turn, u_turn, u0 + 1.0)[..., None] - s * s
    Uv = _u_eval(cU, uu)
    h = Uv / jnp.maximum(s * s, 1e-37)  # U/(u_t - u), finite at nodes
    f = 2.0 / jnp.sqrt(jnp.maximum(h, 1e-37))
    lam_turn = jnp.sum(f * w, axis=-1) * s0
    lam_turn = jnp.where(turn, lam_turn, jnp.inf)
    return cU, u_turn, lam_turn, turn


def _lam_of_u(cU, u0, u1):
    """int_{u0}^{u1} du/sqrt(U) assuming U > 0 on the open interval."""
    x, w = (jnp.asarray(v) for v in gl_nodes(NQ_LAM))
    uu = u0[..., None] + (u1 - u0)[..., None] * x
    f = 1.0 / jnp.sqrt(jnp.maximum(_u_eval(cU, uu), 1e-37))
    return jnp.sum(f * w, axis=-1) * (u1 - u0)


# ---------------------------------------------------------------------------
# polar potential M(mu) = q2 + (a^2-l^2-q2) mu^2 - a^2 mu^4
# ---------------------------------------------------------------------------

def _m_coeffs(a, l, q2):
    c0 = q2
    c1 = jnp.zeros_like(l)
    c2 = a * a - l * l - q2
    c3 = jnp.zeros_like(l)
    c4 = -a * a * jnp.ones_like(l)
    return c0, c1, c2, c3, c4


def _polar_setup(a, l, q2, mu0, sm):
    """Polar-motion landmarks: quarter period Q, first turning time
    lam_t1, first equator crossing lam_eq, full period P.

    Ordinary rays (q2>0) oscillate in [-sqrt(m+), sqrt(m+)]; vortical
    rays (q2<0) stay in one hemisphere between sqrt(m-) and sqrt(m+).
    Both use turning-point-regularizing angle substitutions so every
    integrand is smooth and a fixed GL rule is exact to roundoff."""
    c2 = a * a - l * l - q2
    a2 = a * a
    # stable biquadratic roots of a^2 m^2 - c2 m - q2 = 0 (m = mu^2)
    disc = jnp.sqrt(jnp.maximum(c2 * c2 + 4.0 * a2 * q2, 0.0))
    tmp = 0.5 * (c2 + jnp.where(c2 >= 0, disc, -disc))
    safe_a2 = jnp.maximum(a2, 1e-37)
    r1 = tmp / safe_a2
    r2 = jnp.where(jnp.abs(tmp) > 0, -q2 / jnp.where(jnp.abs(tmp) > 0, tmp,
                                                     1.0), 0.0)
    mplus = jnp.maximum(r1, r2)          # upper mu^2 root
    mminus = jnp.minimum(r1, r2)         # lower root (<0 for ordinary)
    # a == 0: quadratic potential, single root q2/(l^2+q2)
    is_a0 = a2 < 1e-24
    l2q = jnp.maximum(l * l + q2, 1e-37)
    mplus = jnp.where(is_a0, q2 / l2q, mplus)
    mminus = jnp.where(is_a0, -jnp.inf, mminus)
    mplus = jnp.clip(mplus, 0.0, 1.0)

    x, w = (jnp.asarray(v) for v in gl_nodes(NQ_LAM))
    a2mp = jnp.where(is_a0, 0.0, a2 * mplus)

    # --- ordinary branch: mu = sqrt(m+) sin psi;  d lam = d psi / sqrt(D)
    # D(psi) = a^2 m+ sin^2 psi - a^2 m-  (stable: a^2 m- = c2 - a^2 m+)
    a2mm = jnp.where(is_a0, c2, c2 - a2mp)  # = a^2 m-  (a->0: -(l^2+q2))
    Dconst = -a2mm

    def D_ord(psi):
        return jnp.maximum(_bc(a2mp, psi.ndim) * jnp.sin(psi) ** 2
                           + _bc(Dconst, psi.ndim), 1e-37)

    psi_half = jnp.pi / 2.0
    psis = psi_half * x
    Q = jnp.sum(1.0 / jnp.sqrt(D_ord(psis[None, :] *
                                     jnp.ones_like(a2mp)[:, None])) * w,
                axis=-1) * psi_half
    sqmp = jnp.sqrt(jnp.maximum(mplus, 1e-37))
    psi0 = jnp.arcsin(jnp.clip(mu0 / sqmp, -1.0, 1.0))
    psis0 = psi0[..., None] * x
    Ipsi0 = jnp.sum(1.0 / jnp.sqrt(D_ord(psis0)) * w, axis=-1) * psi0

    lam_t1_ord = Q - sm * Ipsi0
    toward_eq = sm * mu0 < 0.0
    lam_eq_ord = jnp.where(toward_eq, jnp.abs(Ipsi0), 2.0 * Q - jnp.abs(Ipsi0))
    P_ord = 4.0 * Q
    half_ord = 2.0 * Q

    # --- vortical branch (q2 < 0): |mu| in [sqrt(m-), sqrt(m+)]
    mm_v = jnp.clip(mminus, 1e-37, 1.0)
    dm_v = jnp.maximum(mplus - mm_v, 0.0)

    def D_vort(psi):
        return jnp.maximum(_bc(a2, psi.ndim)
                           * (_bc(mm_v, psi.ndim)
                              + _bc(dm_v, psi.ndim) * jnp.sin(psi) ** 2),
                           1e-37)

    Lv = jnp.sum(1.0 / jnp.sqrt(D_vort(psis[None, :]
                                       * jnp.ones_like(a2mp)[:, None])) * w,
                 axis=-1) * psi_half
    arg = jnp.sqrt(jnp.clip((mu0 * mu0 - mm_v) / jnp.maximum(dm_v, 1e-37),
                            0.0, 1.0))
    psi0v = jnp.arcsin(arg)
    psis0v = psi0v[..., None] * x
    Iv = jnp.sum(1.0 / jnp.sqrt(D_vort(psis0v)) * w, axis=-1) * psi0v
    outward = sm * jnp.sign(mu0) > 0.0  # heading to the outer root
    lam_t1_v = jnp.where(outward, Lv - Iv, Iv)
    P_v = 2.0 * Lv
    half_v = Lv

    vort = q2 < 0.0
    Qout = jnp.where(vort, Lv, Q)
    lam_t1 = jnp.where(vort, lam_t1_v, lam_t1_ord)
    lam_eq = jnp.where(vort, jnp.inf, lam_eq_ord)
    P = jnp.where(vort, P_v, P_ord)
    half = jnp.where(vort, half_v, half_ord)
    # q2 == 0: asymptotic approach to the equator, no oscillation
    asym = q2 == 0.0
    lam_t1 = jnp.where(asym, jnp.inf, lam_t1)
    lam_eq = jnp.where(asym, jnp.inf, lam_eq)
    P = jnp.where(asym, jnp.inf, P)
    half = jnp.where(asym, jnp.inf, half)
    return Qout, lam_t1, lam_eq, P, half


# ---------------------------------------------------------------------------
# the solver
# ---------------------------------------------------------------------------

class _RaySetup(NamedTuple):
    cU: tuple
    cM: tuple
    g2u: jnp.ndarray
    g3u: jnp.ndarray
    g2m: jnp.ndarray
    g3m: jnp.ndarray
    u_turn: jnp.ndarray
    lam_rturn: jnp.ndarray
    turn: jnp.ndarray
    lam_t1: jnp.ndarray
    lam_eq: jnp.ndarray
    P: jnp.ndarray
    half: jnp.ndarray
    sm: jnp.ndarray
    u0: jnp.ndarray
    mu0: jnp.ndarray


def _setup(a, mu0, l, q2, sm, u0):
    uplus = 1.0 / kerr.horizon(a)
    uf = uplus * (1.0 - HOR_EPS)
    cU, u_turn, lam_rturn, turn = _radial_setup(
        a, l, q2, jnp.full_like(l, u0), uf)
    cM = _m_coeffs(a, l, q2)
    g2u, g3u = wss.quartic_invariants(cU[4], cU[3], cU[2], cU[1], cU[0])
    g2m, g3m = wss.quartic_invariants(cM[4], cM[3], cM[2], cM[1], cM[0])
    Q, lam_t1, lam_eq, P, half = _polar_setup(a, l, q2,
                                              jnp.full_like(l, mu0), sm)
    return _RaySetup(cU=cU, cM=cM, g2u=g2u, g3u=g3u, g2m=g2m, g3m=g3m,
                     u_turn=u_turn, lam_rturn=lam_rturn, turn=turn,
                     lam_t1=lam_t1, lam_eq=lam_eq, P=P, half=half,
                     sm=sm, u0=jnp.full_like(l, u0),
                     mu0=jnp.full_like(l, mu0)), uf


def _eval_u(st, lam):
    """u(lam) along the traced direction (du/dlam = +sqrt(U) initially).

    The radial motion is exactly symmetric about the turning point,
    u(lam_turn + d) = u(lam_turn - d), so lam is reflected into the
    first half where wp() is far from its period pole — this keeps
    returning rays as accurate at the trace end as at the start."""
    c0, c1, c2, c3, c4 = st.cU
    nd = lam.ndim
    lt = _bc(st.lam_rturn, nd)
    lam_eff = jnp.where(jnp.isfinite(lt) & (lam > lt), 2.0 * lt - lam, lam)
    return wss.invert_quartic(_bc(c4, nd), _bc(c3, nd), _bc(c2, nd),
                              _bc(c1, nd), _bc(c0, nd), _bc(st.u0, nd),
                              1.0, lam_eff, g2=_bc(st.g2u, nd),
                              g3=_bc(st.g3u, nd))


def _eval_mu(st, lam):
    """mu(lam); reduces lam modulo the polar period for precision."""
    c0, c1, c2, c3, c4 = st.cM
    nd = lam.ndim
    P = _bc(st.P, nd)
    lam_red = jnp.where(jnp.isfinite(P), lam - P * jnp.floor(lam / P), lam)
    return wss.invert_quartic(_bc(c4, nd), _bc(c3, nd), _bc(c2, nd),
                              _bc(c1, nd), _bc(c0, nd), _bc(st.mu0, nd),
                              _bc(st.sm, nd), lam_red, g2=_bc(st.g2m, nd),
                              g3=_bc(st.g3m, nd))


def _phase_integrands_radial(a, l, u):
    """Radial parts of d(t, phi, affine)/d lam_Mino as functions of u."""
    r = 1.0 / u
    d = r * r - 2.0 * r + a * a
    P = r * r + a * a - a * l
    dt_r = (r * r + a * a) * P / d
    dph_r = a * P / d
    daff_r = r * r
    return dt_r, dph_r, daff_r


def _phase_integrands_polar(a, l, mu):
    """Polar parts of the phase integrands as functions of mu.

    The 1 - mu^2 floor is DTYPE-AWARE: in f32 a near-pole mu rounds to
    exactly 1 and the old absolute 1e-37 floor turned dphi/dlam into
    l * 1e37 (overflow).  Flooring at ~3 eps caps the integrand at its
    value one roundoff step from the pole; only rays that graze the
    pole within f32 resolution (|l| <~ 1e-4 in camera units — measure
    zero on a real camera) lose phi accuracy, and exact pole-crossers
    have l = 0 so their dph_m is 0 either way."""
    dt_m = a * (l - a * (1.0 - mu * mu))
    eps3 = 3.0 * float(jnp.finfo(jnp.result_type(mu)).eps)
    one_m = jnp.maximum(1.0 - mu * mu, eps3)
    dph_m = -a + l / one_m
    daff_m = a * a * mu * mu
    return dt_m, dph_m, daff_m


def _hermite_nodes_ep(y0, y1, d0, d1, h, x):
    """Cubic Hermite values at GL nodes x from per-segment endpoint
    values/derivatives (each (..., nseg))."""
    y0 = y0[..., None]
    y1 = y1[..., None]
    d0 = d0[..., None]
    d1 = d1[..., None]
    h = h[..., None]
    t2 = x * x
    t3 = t2 * x
    return ((2 * t3 - 3 * t2 + 1) * y0 + (t3 - 2 * t2 + x) * h * d0
            + (-2 * t3 + 3 * t2) * y1 + (t3 - t2) * h * d1)


def _hermite_nodes(y, d, dseg, x):
    """Cubic Hermite values at GL nodes x of each segment, from grid
    endpoint values y and trace-direction derivatives d (both
    (npix, npts)).  O(dseg^4) accurate — the derivatives are analytic
    (dy/dlam = +-sqrt(potential)), so each node costs a handful of fused
    multiply-adds instead of a Weierstrass evaluation."""
    return _hermite_nodes_ep(y[..., :-1], y[..., 1:], d[..., :-1],
                             d[..., 1:], dseg, x)


# module flag: tests set False to A/B the windowed lam-space radial
# quadrature against the full dual evaluation (results must be equal)
_PHASE_WINDOW = True


def _cumulative_phases(st, a, l, lam_grid, u_grid=None, node_interp=False,
                       mu_grid=None):
    """Cumulative (t, phi, affine) along the lam_grid via per-segment GL.

    The polar parts are integrated in Mino time (smooth everywhere).  The
    radial parts behave like r^2 ~ 1/lam^2 near the observer — a fixed GL
    rule in lam cannot resolve segments spanning decades in radius — so
    away from the radial turning point they are integrated in r instead
    (where the integrand is smooth and bounded); segments straddling the
    turning point keep the lam-space quadrature (r(lam) is quadratically
    flat there, so lam-GL is accurate exactly where r-GL is not).

    node_interp=True (dense grids, i.e. trace()): u and mu at the
    quadrature nodes come from cubic Hermite interpolation of the grid
    samples — du/dlam = +-sqrt(U), dmu/dlam = +-sqrt(M) are closed-form
    — replacing the 2*NQ_SEG Weierstrass evaluations per segment (the
    dominant cost of the whole geodesic stage) with fused arithmetic.
    Callers with sparse grids (trace_polar npts=1, camera_delay) keep
    exact node evaluation."""
    x, w = (jnp.asarray(v, lam_grid.dtype) for v in gl_nodes(NQ_SEG))
    a_ = lam_grid[..., :-1]
    b_ = lam_grid[..., 1:]
    dseg = b_ - a_
    nodes = a_[..., None] + dseg[..., None] * x        # (npix, nseg, nq)
    if node_interp:
        if u_grid is None:
            u_grid = _eval_u(st, lam_grid)
        if mu_grid is None:
            mu_grid = _eval_mu(st, lam_grid)
        su_g, smu_g, _, _ = _signs_and_counts(st, lam_grid)
        du_g = su_g * jnp.sqrt(jnp.maximum(_u_eval(st.cU, u_grid), 0.0))
        cM = st.cM
        Mv = (((_bc(cM[4], u_grid.ndim) * mu_grid ** 2
                + _bc(cM[2], u_grid.ndim)) * mu_grid ** 2)
              + _bc(cM[0], u_grid.ndim))
        dmu_g = smu_g * jnp.sqrt(jnp.maximum(Mv, 0.0))
        # radial lam-space nodes: built per-window below when the static
        # window applies, else Hermite-filled over every segment
        un = None
        mun = jnp.clip(_hermite_nodes(mu_grid, dmu_g, dseg, x), -1.0, 1.0)
    else:
        un = _eval_u(st, nodes)
        mun = _eval_mu(st, nodes)
    nd = nodes.ndim
    l_ = _bc(l, nd)

    # polar parts: always lam-space
    dt_m, dph_m, daff_m = _phase_integrands_polar(a, l_, mun)
    seg_t = jnp.sum(dt_m * w, axis=-1) * dseg
    seg_p = jnp.sum(dph_m * w, axis=-1) * dseg
    seg_a = jnp.sum(daff_m * w, axis=-1) * dseg

    # radial parts, lam-space version.  Needed ONLY on segments
    # adjacent to the radial turning point (the near_turn selection
    # below) — and on the UNIFORM grids of trace() those segments live
    # at STATIC indices: a turning ray's lam grid spans
    # [lam_start, 2*lam_rturn - lam_start], putting the turn exactly at
    # the midpoint, and a grazing plunge's turn sits just beyond the
    # last segment.  So when node_interp=True (trace's dense uniform
    # grid) the lam-space quadrature is evaluated on a static window of
    # segments around the midpoint + the trailing edge instead of on
    # every segment — the round-4 verdict's "dual evaluation" lever:
    # previously BOTH integrals were computed for all nseg segments and
    # one was discarded.  Sparse callers (camera_delay, trace_polar)
    # keep the full dual evaluation.
    nseg = dseg.shape[-1]
    _W = 4
    windowed = node_interp and nseg >= 4 * _W and _PHASE_WINDOW
    if windowed:
        import numpy as _onp
        mid = nseg // 2
        widx = _onp.unique(_onp.clip(_onp.concatenate([
            _onp.arange(0, _W), _onp.arange(mid - _W, mid + _W),
            _onp.arange(nseg - _W, nseg)]), 0, nseg - 1))
        un_w = _hermite_nodes_ep(
            u_grid[..., widx], u_grid[..., widx + 1], du_g[..., widx],
            du_g[..., widx + 1], dseg[..., widx], x)
        dt_r, dph_r, daff_r = _phase_integrands_radial(a, l_, un_w)
        dsw = dseg[..., widx]
        lam_t = jnp.sum(dt_r * w, axis=-1) * dsw
        lam_p = jnp.sum(dph_r * w, axis=-1) * dsw
        lam_a = jnp.sum(daff_r * w, axis=-1) * dsw
    else:
        if un is None:     # node_interp grid too short for the window
            un = _hermite_nodes(u_grid, du_g, dseg, x)
        dt_r, dph_r, daff_r = _phase_integrands_radial(a, l_, un)
        lam_t = jnp.sum(dt_r * w, axis=-1) * dseg
        lam_p = jnp.sum(dph_r * w, axis=-1) * dseg
        lam_a = jnp.sum(daff_r * w, axis=-1) * dseg

    # radial parts, r-space version.  The integrand f(r) = T(r)/(r^2
    # sqrt(U)) tends to a constant f_inf at large r with a 1/r tail, so
    # write f = f_inf + h(r)/r: the f_inf part integrates exactly and
    # h(r) is integrated in ln r (where its 1/r decay is resolved by a
    # fixed GL rule even for segments spanning decades of radius).
    if u_grid is None:
        u_grid = _eval_u(st, lam_grid)
    u_lo = jnp.minimum(u_grid[..., :-1], u_grid[..., 1:])
    u_hi = jnp.maximum(u_grid[..., :-1], u_grid[..., 1:])
    u_lo_s = jnp.maximum(u_lo, 1e-12)
    r_lo = 1.0 / jnp.maximum(u_hi, 1e-12)
    r_hi = 1.0 / u_lo_s
    # segment log-width from the U-DIFFERENCE, not a difference of
    # logs: near a radial turning point adjacent samples differ by
    # ~the working-precision resolution of u, so ln(r_hi) - ln(r_lo)
    # is pure quantization noise (f32 log quantum ~5e-7 vs a true
    # dlnr ~2e-8) — nodes then land far OUTSIDE the segment, U(u_node)
    # evaluates negative, the underflow floor explodes 1/sqrt(U) to
    # ~1e15, and ONE poisoned segment corrupts every cumulative phase
    # after it (measured: escaping-corner FFJET pixels 70x too bright
    # in the TPU mixed path).  u_hi - u_lo is EXACT for close values
    # (Sterbenz), so log1p keeps dlnr at full relative accuracy at any
    # scale.
    dlnr = jnp.log1p((u_hi - u_lo) / u_lo_s)
    rn = r_lo[..., None] * jnp.exp(dlnr[..., None] * x)
    urn = 1.0 / rn
    Uraw = _u_eval(st.cU, urn)
    # dtype-relative floor (safety net): U near a root is a cancelling
    # sum of O(1) polynomial terms, so its roundoff noise floor is
    # eps * (term scale) — an absolute 1e-37 floor would let a noise-
    # negative U produce a 1e15 integrand instead of a bounded one
    c0, c1, c2, c3, c4 = st.cU
    uscale = (((jnp.abs(_bc(c4, urn.ndim)) * urn
                + jnp.abs(_bc(c3, urn.ndim))) * urn
               + jnp.abs(_bc(c2, urn.ndim))) * urn
              + jnp.abs(_bc(c1, urn.ndim))) * urn + jnp.abs(_bc(c0, urn.ndim))
    eps_u = float(jnp.finfo(jnp.result_type(u_grid)).eps)
    Un = jnp.maximum(Uraw, 16.0 * eps_u * uscale + _TINY_U)
    fac = 1.0 / (rn * rn * jnp.sqrt(Un))
    dt_rr, dph_rr, daff_rr = _phase_integrands_radial(a, l_, urn)
    dr = r_hi - r_lo
    # h(r) * (dr = r dlnr): h = (f - f_inf) * r -> node weight fac*rn
    r_t = dr + jnp.sum((dt_rr * fac - 1.0) * rn * w, axis=-1) * dlnr
    r_p = jnp.sum(dph_rr * fac * rn * w, axis=-1) * dlnr
    r_a = dr + jnp.sum((daff_rr * fac - 1.0) * rn * w, axis=-1) * dlnr

    # segment selection: keep lam-space where the segment abuts the turn
    lt = _bc(st.lam_rturn, a_.ndim)
    pad = dseg
    near_turn = (b_ > lt - pad) & (a_ < lt + pad)
    if windowed:
        nw = near_turn[..., widx]
        seg_t = seg_t + r_t.at[..., widx].set(
            jnp.where(nw, lam_t, r_t[..., widx]))
        seg_p = seg_p + r_p.at[..., widx].set(
            jnp.where(nw, lam_p, r_p[..., widx]))
        seg_a = seg_a + r_a.at[..., widx].set(
            jnp.where(nw, lam_a, r_a[..., widx]))
    else:
        seg_t = seg_t + jnp.where(near_turn, lam_t, r_t)
        seg_p = seg_p + jnp.where(near_turn, lam_p, r_p)
        seg_a = seg_a + jnp.where(near_turn, lam_a, r_a)

    # accumulate in f64 regardless of working precision: the cumulative
    # phases reach 1e2-1e4 while per-cell DIFFERENCES downstream (dlam
    # in the Stokes solver, Faraday phase) need absolute accuracy — f32
    # increments + f64 running sums keep the error at the per-segment
    # f32 level instead of growing with trace length.
    #
    # The f64 running sums are TWO-LEVEL: working-dtype cumsum within
    # 16-segment blocks + an f64 cumsum over the (nseg/16) block sums,
    # recombined as f64.  A full-length f64 cumsum on the emulated-f64
    # v5e costs ~13 ms per (1e4, 400) array (3 arrays = ~40 ms, the
    # dominant cost of the whole geodesic stage, TRACE_ATTRIB.json);
    # the within-block partials span <= 16 segments so their f32
    # roundoff stays at the per-segment level the comment above already
    # accepts, and the block offsets are exact f64.  The three phases
    # ride ONE stacked cumsum.
    z = jnp.zeros_like(lam_grid[..., :1], dtype=jnp.float64)
    s3 = jnp.stack([seg_t, seg_p, seg_a])          # (3, ..., nseg)
    nseg3 = s3.shape[-1]
    BLK = 16
    if nseg3 >= 2 * BLK:
        pad = (-nseg3) % BLK
        if pad:
            s3 = jnp.concatenate(
                [s3, jnp.zeros(s3.shape[:-1] + (pad,), s3.dtype)], -1)
        nb = s3.shape[-1] // BLK
        sb = s3.reshape(s3.shape[:-1] + (nb, BLK))
        within = jnp.cumsum(sb, axis=-1)           # working dtype, 16-wide
        bsum = within[..., -1].astype(jnp.float64)
        off = jnp.cumsum(bsum, axis=-1) - bsum     # exclusive, f64, short
        cum3 = (off[..., None] + within.astype(jnp.float64)
                ).reshape(s3.shape[:-1] + (nb * BLK,))[..., :nseg3]
    else:
        cum3 = jnp.cumsum(s3.astype(jnp.float64), axis=-1)
    zb = jnp.broadcast_to(z, (3,) + z.shape)
    cum3 = jnp.concatenate([zb, cum3], axis=-1)
    return cum3[0], cum3[1], cum3[2]


def _signs_and_counts(st, lam):
    """Traced-direction signs of du/dlam, dmu/dlam + turning counts."""
    tpr = (lam > _bc(st.lam_rturn, lam.ndim)).astype(jnp.int32)
    lam_t1 = _bc(st.lam_t1, lam.ndim)
    half = _bc(st.half, lam.ndim)
    n_after = jnp.floor((lam - lam_t1) / half) + 1.0
    tpm = jnp.where(lam >= lam_t1, n_after, 0.0).astype(jnp.int32)
    su = jnp.where(tpr % 2 == 0, 1.0, -1.0)
    smu = _bc(st.sm, lam.ndim) * jnp.where(tpm % 2 == 0, 1.0, -1.0)
    return su, smu, tpr, tpm


def _hermite_refine(y_c, d_c, h_c, jmap, tmap, with_deriv=False):
    """Fill a fine grid from coarse samples by cubic Hermite: y_c, d_c
    (npix, n_c) coarse values and derivatives, h_c (npix, n_c-1)
    segment widths, jmap/tmap static (npts,) segment index and
    normalized position per fine point.  Exact at coarse nodes.

    with_deriv=True also returns dy/dlam of the interpolant — for the
    potentials this IS the signed sqrt(U) / sqrt(M) (du/dlam = su
    sqrt(U)), accurate to O(h^3) with NO polynomial evaluation and no
    turning-point cancellation (the cubic's derivative crosses zero
    smoothly through the turn)."""
    y0 = y_c[:, jmap]
    y1 = y_c[:, jmap + 1]
    d0 = d_c[:, jmap]
    d1 = d_c[:, jmap + 1]
    h = h_c[:, jmap]
    t = tmap[None, :]
    t2 = t * t
    t3 = t2 * t
    y = ((2 * t3 - 3 * t2 + 1) * y0 + (t3 - 2 * t2 + t) * h * d0
         + (-2 * t3 + 3 * t2) * y1 + (t3 - t2) * h * d1)
    if not with_deriv:
        return y
    dy = ((6 * t2 - 6 * t) * (y0 - y1) / h + (3 * t2 - 4 * t + 1) * d0
          + (3 * t2 - 2 * t) * d1)
    return y, dy


@partial(jax.jit, static_argnames=("npts", "node_interp", "prec",
                                  "coarse"))
def trace(a, mu0, alpha, beta, l, q2, sm, u0, npts, uout=None, phi0=0.0,
          node_interp=True, prec="f64", coarse=1):
    """Trace rays from the camera: npts samples, even in Mino time, from
    u=uout (default: the observer u0) to the horizon or back out to uout
    after a radial turning point (reference standard=1 mode).

    All of (alpha, beta, l, q2, sm) are (npix,); returns a GeodesicBundle.

    prec='mixed': the per-(pixel, point) hot math — Weierstrass
    inversions, Hermite nodes, phase integrands — runs in f32 (v5e has
    no native f64; emulation costs 5-10x), while everything whose error
    would otherwise ACCUMULATE stays f64: the per-pixel setup (root
    finding, turning-point landmarks, lam grid) and the cumulative
    phase/affine sums (f32 segment increments summed in f64).  The
    affine parameter is returned in f64 either way so the Stokes
    solver's f64-reduced Faraday-phase path stays engaged.  Measured
    point errors vs f64: |dr|/r, |dtheta|, |dphi| ~ 1e-5
    (tests/test_precision.py), against 1e-2 regression bars."""
    st, uf = _setup(a, mu0, l, q2, sm, u0)

    lam_start = jnp.zeros_like(l)
    if uout is not None:
        uo = jnp.full_like(l, uout)
        uo = jnp.minimum(uo, _bc_min(st.u_turn * (1 - 1e-9), uo))
        lam_start = _lam_of_u(st.cU, st.u0, jnp.maximum(uo, st.u0))
    # end of trace
    lam_plunge = _lam_of_u(st.cU, st.u0, jnp.full_like(l, uf))
    lam_end = jnp.where(st.turn, 2.0 * st.lam_rturn - lam_start, lam_plunge)

    frac = jnp.linspace(0.0, 1.0, npts)
    lam = lam_start[:, None] + (lam_end - lam_start)[:, None] * frac[None, :]

    # the Weierstrass inversions stay f64 in BOTH precisions: the wp
    # argument-doubling map amplifies roundoff ~4x per doubling
    # (measured p99 error 1e-2 in f32 — unusable), and its cost is
    # already bounded by MAX_DOUBLINGS=20.  Everything downstream of
    # (u, mu) is point-local algebra that f32 handles at ~1e-5.
    #
    # coarse > 1: evaluate the two Weierstrass inversions (the dominant
    # cost of the whole geodesic stage, PROFILE_r04) only at every
    # coarse-th Mino node and fill between by cubic Hermite with the
    # ANALYTIC derivatives du/dlam = su sqrt(U), dmu/dlam = smu sqrt(M)
    # — u(lam), mu(lam) are smooth functions of Mino time (turning
    # points are regular maxima the Hermite passes through exactly at
    # the node-derivative level), so the fill error is
    # O((coarse dlam)^4 y'''') ~ 1e-8 at the flagship sampling
    # (validated against the dense trace in tests/test_precision.py).
    f32fill = (prec == "mixed") and coarse > 1 and npts >= 4 * coarse
    sqrtU_h = sqrtM_h = None
    if coarse > 1 and npts >= 4 * coarse:
        import numpy as _np
        idxs = list(range(0, npts, coarse))
        if idxs[-1] != npts - 1:
            idxs.append(npts - 1)
        idxs_np = _np.asarray(idxs)
        fine = _np.arange(npts)
        j_of = _np.minimum(
            _np.searchsorted(idxs_np, fine, side="right") - 1,
            len(idxs) - 2)
        t_of = ((fine - idxs_np[j_of])
                / (idxs_np[j_of + 1] - idxs_np[j_of]))
        lam_c = lam[:, idxs_np]
        u_c = _eval_u(st, lam_c)
        mu_c = jnp.clip(_eval_mu(st, lam_c), -1.0, 1.0)
        su_c, smu_c, _, _ = _signs_and_counts(st, lam_c)
        du_c = su_c * jnp.sqrt(jnp.maximum(_u_eval(st.cU, u_c), 0.0))
        cM = st.cM
        Mv = ((_bc(cM[4], u_c.ndim) * mu_c ** 2
               + _bc(cM[2], u_c.ndim)) * mu_c ** 2
              + _bc(cM[0], u_c.ndim))
        dmu_c = smu_c * jnp.sqrt(jnp.maximum(Mv, 0.0))
        h_c = lam_c[:, 1:] - lam_c[:, :-1]
        if f32fill:
            # the whole fill runs f32 and the interpolant's DERIVATIVE
            # supplies the signed sqrt(U)/sqrt(M) (du/dlam = su sqrt(U))
            # — O(h^3) accurate, no polynomial cancellation, and no
            # per-fine-point f64 work at all
            f32 = jnp.float32
            cast = lambda v: v.astype(f32)
            tmap = jnp.asarray(t_of, f32)
            u64, duf = _hermite_refine(cast(u_c), cast(du_c), cast(h_c),
                                       j_of, tmap, with_deriv=True)
            u64 = jnp.maximum(u64, 1e-12)
            mu64, dmuf = _hermite_refine(cast(mu_c), cast(dmu_c),
                                         cast(h_c), j_of, tmap,
                                         with_deriv=True)
            mu64 = jnp.clip(mu64, -1.0, 1.0)
            sqrtU_h = jnp.abs(duf)
            sqrtM_h = jnp.abs(dmuf)
        else:
            tmap = jnp.asarray(t_of, lam.dtype)
            u64 = jnp.maximum(
                _hermite_refine(u_c, du_c, h_c, j_of, tmap), 1e-12)
            mu64 = jnp.clip(
                _hermite_refine(mu_c, dmu_c, h_c, j_of, tmap),
                -1.0, 1.0)
    else:
        u64 = _eval_u(st, lam)
        mu64 = jnp.clip(_eval_mu(st, lam), -1.0, 1.0)

    if prec == "mixed":
        f32 = jnp.float32
        stq = jax.tree_util.tree_map(
            lambda v: v.astype(f32)
            if jnp.issubdtype(v.dtype, jnp.floating) else v, st)
        lamq = lam.astype(f32)
        lq = l.astype(f32)
        u = u64.astype(f32)
        mu = mu64.astype(f32)
    else:
        stq, lamq, lq = st, lam, l
        u, mu = u64, mu64
    su, smu, tpr, tpm = _signs_and_counts(stq, lamq)

    dt_c, dph_c, aff_c = _cumulative_phases(stq, a, lq, lamq, u_grid=u,
                                            node_interp=node_interp,
                                            mu_grid=mu)

    r = 1.0 / jnp.maximum(u, 1e-12)
    th = jnp.arccos(mu)
    t = -dt_c.astype(u.dtype)
    phi = jnp.pi * phi0 - dph_c.astype(u.dtype)
    # pole-on viewing: rotate by the pixel azimuth (geodesics.f90:339-341)
    phi = phi + jnp.where(jnp.abs(mu0) == 1.0,
                          jnp.sign(mu0) * jnp.arctan2(beta, alpha),
                          0.0)[:, None].astype(u.dtype)

    # the wavevector under mixed: f32 per-point algebra with ONE f64
    # repair — k_r = sqrt(R(r)), k_th = sqrt(M(mu)) cancel near turning
    # points in f32 (noise-negative R/M, O(3e-4) component errors on
    # the adjacent samples), so R and M are evaluated in f64 (two cheap
    # polynomial evaluations), sqrt'ed, and cast; the rest of
    # calc_nullp's algebra runs f32.  f64 path unchanged.
    if prec == "mixed":
        if sqrtU_h is not None:
            # f32-fill path: the Hermite derivatives ARE the potentials
            sqrtU, sqrtM = sqrtU_h, sqrtM_h
        else:
            # the cancellation is in the POLYNOMIAL, not the sqrt:
            # evaluate U/M in f64, cast, sqrt in f32 (correctly rounded)
            sqrtU = jnp.sqrt(jnp.maximum(_u_eval(st.cU, u64),
                                         0.0).astype(u.dtype))
            Mf64 = (((_bc(st.cM[4], u64.ndim) * mu64 ** 2)
                     + _bc(st.cM[2], u64.ndim)) * mu64 ** 2
                    + _bc(st.cM[0], u64.ndim))
            sqrtM = jnp.sqrt(jnp.maximum(Mf64, 0.0).astype(u.dtype))
        r = 1.0 / jnp.maximum(u, jnp.asarray(1e-12, u.dtype))
        # Delta in FACTORED form: the expanded r^2 - 2r + a^2 cancels
        # catastrophically near the horizon in f32 (12% k_t errors);
        # the factored small factor is an exact subtraction of nearby
        # f32 values.  The residual few-percent k_t error on the last
        # samples of plunging rays is f32's resolution of r itself —
        # those samples are infinitely redshifted (g -> 0, emissivity
        # -> 0), whole-image effect pinned at ~1e-4 by the bench
        # cross-check and tests/test_precision.py.
        _h = jnp.sqrt(jnp.maximum(1.0 - a * a, 0.0)).astype(u.dtype)
        delta = (r - (1.0 + _h)) * (r - (1.0 - _h))
        k = kerr.calc_nullp(_bc(q2.astype(u.dtype), u.ndim),
                            _bc(lq, u.ndim), a, r, mu, su, smu,
                            sqrtU=sqrtU, sqrtM=sqrtM, delta=delta)
    else:
        r64 = 1.0 / jnp.maximum(u64, 1e-12)
        k = kerr.calc_nullp(_bc(q2, u64.ndim), _bc(l, u64.ndim), a, r64,
                            mu64, su.astype(u64.dtype),
                            smu.astype(u64.dtype)).astype(u.dtype)

    x = jnp.stack([t, r, th, phi], axis=-1)
    valid = (u > 0.0) & (u < uf * (1 + 10 * HOR_EPS)) & jnp.isfinite(u)
    status = jnp.where(jnp.all(jnp.isfinite(u), axis=-1), 1, 0)
    return GeodesicBundle(x=x, k=k, lam=aff_c, mino=lam, tpm=tpm, tpr=tpr,
                          valid=valid, status=status)


def _bc_min(a, b):
    return jnp.minimum(a, b)


@partial(jax.jit, static_argnames=())
def camera_delay(a, mu0, alpha, beta, l, q2, sm, u0, uout):
    """Per-ray coordinate-time delay Delta-t(u0 -> uout): the travel time
    from the camera to the trace start that `trace(uout=...)` omits from
    its t coordinate (t=0 at the trace start).

    This is the slow-light t0 pre-pass (reference initialize_geo_tabs,
    geodesics.f90:113-128 + pgrtrans.f90:177-191): subtract
    `delay - min(delay)` from each ray's t so fluid sampling times share
    one global clock."""
    st, uf = _setup(a, mu0, l, q2, sm, u0)
    uo = jnp.full_like(l, uout)
    uo = jnp.minimum(uo, st.u_turn * (1 - 1e-9))
    lam_start = _lam_of_u(st.cU, st.u0, jnp.maximum(uo, st.u0))
    grid = jnp.stack([jnp.zeros_like(lam_start), lam_start], axis=-1)
    dt_c, _, _ = _cumulative_phases(st, a, l, grid)
    return dt_c[..., -1]


@partial(jax.jit, static_argnames=("npts", "crossing"))
def trace_polar(a, mu0, alpha, beta, l, q2, sm, u0, npts=1, phi0=0.0,
                crossing=1):
    """Trace to the `crossing`-th equatorial plane crossing (reference
    standard=2 / usegeor mode, used for thin-disk imaging).

    With npts=1 returns only the crossing point; with npts>1, samples
    evenly in Mino time from the observer to the crossing."""
    st, uf = _setup(a, mu0, l, q2, sm, u0)
    lam_eq = st.lam_eq + (crossing - 1) * st.half
    hit = jnp.isfinite(lam_eq)
    lam_eq_safe = jnp.where(hit, lam_eq, 1.0)

    frac = jnp.linspace(0.0, 1.0, npts + 1)[1:]  # exclude the observer point
    lam = lam_eq_safe[:, None] * frac[None, :]

    u = _eval_u(st, lam)
    mu = jnp.clip(_eval_mu(st, lam), -1.0, 1.0)
    # force exactly the equator at the final point
    mu = mu.at[..., -1].set(jnp.where(hit, 0.0, mu[..., -1]))
    su, smu, tpr, tpm = _signs_and_counts(st, lam)

    grid = jnp.concatenate([jnp.zeros_like(lam[..., :1]), lam], axis=-1)
    dt_c, dph_c, aff_c = _cumulative_phases(st, a, l, grid)
    dt_c, dph_c, aff_c = dt_c[..., 1:], dph_c[..., 1:], aff_c[..., 1:]

    r = 1.0 / jnp.maximum(u, 1e-12)
    th = jnp.arccos(mu)
    t = -dt_c
    phi = jnp.pi * phi0 - dph_c
    phi = phi + jnp.where(jnp.abs(mu0) == 1.0,
                          jnp.sign(mu0) * jnp.arctan2(beta, alpha),
                          0.0)[:, None]
    k = kerr.calc_nullp(_bc(q2, u.ndim), _bc(l, u.ndim), a, r, mu, su, smu)
    x = jnp.stack([t, r, th, phi], axis=-1)
    valid = (hit[:, None] & (u > 0.0) & (u < uf) & jnp.isfinite(u))
    status = jnp.where(valid[..., -1], 1, 0)
    return GeodesicBundle(x=x, k=k, lam=aff_c, mino=lam, tpm=tpm, tpr=tpr,
                          valid=valid, status=status)
