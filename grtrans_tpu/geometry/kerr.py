"""Kerr spacetime: metrics, frames, ISCO, null wavevectors, coordinate
transforms.  All functions are elementwise/broadcasting pure array maps.

Parity targets (reference kerr.f90): blmetric_cov/con (:292-400), ksmetric
(:315), bl2ks (:147-179), uks2ubl (:131-144), lnrf_frame(+inv) (:402-500),
calc_rms (:101), krolikc (:109), calcg (:181), calc_nullp (:255),
calc_u0 (:1120), calc_rms_constants (:1129), calc_plunging_vel (:1140),
rms_vel (:1168), calc_polvec (:998), calc_kappapw (:1047),
calc_polar_psi (:954).
"""

import jax.numpy as jnp

from grtrans_tpu.geometry import fourvector as fv



def safe_sqrt(x):
    """sqrt clamped at zero with a well-defined (zero) gradient there.

    jnp.sqrt(jnp.maximum(x, 0)) produces NaN cotangents where x <= 0
    (0 * inf); the double-where makes the branch inert to autodiff."""
    pos = x > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def horizon(a):
    """Outer horizon radius r_+ = 1 + sqrt(1-a^2)."""
    return 1.0 + jnp.sqrt(1.0 - a * a)


def delta(r, a):
    return r * r - 2.0 * r + a * a


def _delta(r, a):
    """Delta = r^2 - 2r + a^2 in FACTORED form (r - r+)(r - r-): the
    expanded quadratic cancels catastrophically near the horizon in f32
    (the subtraction of nearby f32 values in the factored form is exact
    — Sterbenz), and is equally accurate in f64."""
    h = jnp.sqrt(jnp.maximum(1.0 - jnp.asarray(a, jnp.float64) ** 2, 0.0))
    rdt = jnp.result_type(r)
    rp = jnp.asarray(1.0 + h, rdt)
    rm = jnp.asarray(1.0 - h, rdt)
    return (r - rp) * (r - rm)


def metric_cov(r, th, a):
    """Covariant BL metric, packed (...,10).  kerr.f90:381-400.

    Dtype-FOLLOWING (r5): runs in result_type(r, th) — the old forced
    f64 cast silently ran the whole tetrad + analytic-fluid stages in
    emulated f64 under prec='mixed' (~45 ms/frame of the flagship
    budget); mixed callers now get f32 metrics with the near-horizon
    Delta cancellation handled by the factored form."""
    r, th = jnp.broadcast_arrays(jnp.asarray(r), jnp.asarray(th))
    cth = jnp.cos(th)
    sth = jnp.sin(th)
    d = _delta(r, a)
    rho2 = r * r + a * a * cth * cth
    sigma = (r * r + a * a) ** 2 - a * a * d * sth * sth
    z = jnp.zeros_like(r)
    g = [-(d - a * a * sth * sth) / rho2,            # tt
         z, z,
         -2.0 * a * r * sth * sth / rho2,            # tph
         rho2 / d,                                    # rr
         z, z,
         rho2,                                        # thth
         z,
         sigma / rho2 * sth * sth]                    # phph
    return jnp.stack(jnp.broadcast_arrays(*g), axis=-1)


def metric_con(r, th, a):
    """Contravariant BL metric, packed (...,10).  kerr.f90:337-358.
    Dtype-following like metric_cov."""
    r, th = jnp.broadcast_arrays(jnp.asarray(r), jnp.asarray(th))
    cth = jnp.cos(th)
    sth = jnp.sin(th)
    d = _delta(r, a)
    rho2 = r * r + a * a * cth * cth
    z = jnp.zeros_like(r)
    g = [-((r * r + a * a) ** 2 - a * a * d * sth * sth) / rho2 / d,  # tt
         z, z,
         -2.0 * a * r / rho2 / d,                     # tph
         d / rho2,                                     # rr
         z, z,
         1.0 / rho2,                                   # thth
         z,
         (d - a * a * sth * sth) / (d * rho2 * sth * sth)]  # phph
    return jnp.stack(jnp.broadcast_arrays(*g), axis=-1)


def ks_metric_cov(r, th, a):
    """Covariant Kerr-Schild spherical metric, packed.  kerr.f90:315-335."""
    r, th = jnp.broadcast_arrays(jnp.asarray(r, jnp.float64),
                                 jnp.asarray(th, jnp.float64))
    cth = jnp.cos(th)
    sth = jnp.sin(th)
    rho2 = r * r + a * a * cth * cth
    psi4 = 2.0 * r / rho2
    z = jnp.zeros_like(r)
    g = [-(1.0 - psi4),                 # tt
         psi4,                          # tr
         z,
         -a * sth * sth * psi4,         # tph
         1.0 + psi4,                    # rr
         z,
         -a * sth * sth * (1.0 + psi4),  # rph
         rho2,                          # thth
         z,
         sth * sth * (rho2 + a * a * (1.0 + psi4) * sth * sth)]  # phph
    return jnp.stack(jnp.broadcast_arrays(*g), axis=-1)


def bl2ks_time(r, t, a):
    """BL -> KS time shift.  kerr.f90:147-154."""
    sq = jnp.sqrt(1.0 - a * a)
    return (t + jnp.log(r * r - 2.0 * r + a * a)
            + 1.0 / (2.0 * sq) * jnp.log((r - 1.0 - sq) / (r - 1.0 + sq)))


def bl2ks_phi(r, ph, a):
    """BL -> KS azimuth shift.  kerr.f90:156-162."""
    sq = jnp.sqrt(1.0 - a * a)
    return ph + a / (2.0 * sq) * jnp.log((r - 1.0 - sq) / (r - 1.0 + sq))


def uks2ubl(uks, r, a):
    """KS spherical 4-velocity -> BL (Font+1999).  kerr.f90:131-144."""
    d = r * r - 2.0 * r + a * a
    ut = uks[..., 0] - 2.0 * r / d * uks[..., 1]
    uph = uks[..., 3] - a / d * uks[..., 1]
    return jnp.stack([ut, uks[..., 1], uks[..., 2], uph], axis=-1)


def calc_rms(a):
    """ISCO radius (prograde for a>0).  kerr.f90:101-107."""
    a = jnp.asarray(a, jnp.float64)
    z1 = 1.0 + (1.0 - a * a) ** (1.0 / 3.0) * ((1.0 + a) ** (1.0 / 3.0)
                                               + (1.0 - a) ** (1.0 / 3.0))
    z2 = jnp.sqrt(3.0 * a * a + z1 * z1)
    return 3.0 + z2 - jnp.sign(a) * jnp.sqrt((3.0 - z1) * (3.0 + z1 + 2.0 * z2))


def calc_rms_constants(a):
    """(E_ms, L_ms, r_ms) of the marginally stable orbit.  kerr.f90:1129-1138."""
    rms = calc_rms(a)
    v = 1.0 / jnp.sqrt(rms)
    den = jnp.sqrt(1.0 - 3.0 * v * v + 2.0 * a * v ** 3)
    ems = (1.0 - 2.0 * v * v + a * v ** 3) / den
    lms = rms * v * (1.0 - 2.0 * a * v ** 3 + a * a * v ** 4) / den
    return ems, lms, rms


def krolikc(r, a):
    """Page-Thorne/Krolik flux correction factor for the thin disk.
    kerr.f90:109-129."""
    pi = jnp.pi
    rms = calc_rms(a)
    y = jnp.sqrt(r)
    yms = jnp.sqrt(rms)
    y1 = 2.0 * jnp.cos((jnp.arccos(a) - pi) / 3.0)
    y2 = 2.0 * jnp.cos((jnp.arccos(a) + pi) / 3.0)
    y3 = -2.0 * jnp.cos(jnp.arccos(a) / 3.0)
    arg1 = 3.0 * a / (2.0 * y)
    arg2 = 3.0 * (y1 - a) ** 2 / (y * y1 * (y1 - y2) * (y1 - y3))
    arg3 = 3.0 * (y2 - a) ** 2 / (y * y2 * (y2 - y1) * (y2 - y3))
    arg4 = 3.0 * (y3 - a) ** 2 / (y * y3 * (y3 - y1) * (y3 - y2))
    return (1.0 - yms / y - arg1 * jnp.log(y / yms)
            - arg2 * jnp.log((y - y1) / (yms - y1))
            - arg3 * jnp.log((y - y2) / (yms - y2))
            - arg4 * jnp.log((y - y3) / (yms - y3)))


def _lnrf_factors(r, mu, a):
    d = r * r - 2.0 * r + a * a
    ar = (r * r + a * a) ** 2 - a * a * d * (1.0 - mu * mu)
    rho = r * r + a * a * mu * mu
    enu = jnp.sqrt(d * rho / ar)
    emu1 = jnp.sqrt(rho / d)
    emu2 = jnp.sqrt(rho)
    epsi = jnp.sqrt(1.0 - mu * mu) * jnp.sqrt(ar / rho)
    om = 2.0 * a * r / ar
    return d, ar, rho, enu, emu1, emu2, epsi, om


def lnrf_frame(vr, vt, omega, r, a, th):
    """Coordinate 3-velocity (vr, vth, Omega=dphi/dt) -> LNRF physical
    velocity (vrl, vtl, vpl).  kerr.f90:402-425."""
    mu = jnp.cos(th)
    d, ar, rho, enu, emu1, emu2, epsi, om = _lnrf_factors(r, mu, a)
    vrl = emu1 / enu * vr
    vtl = emu2 / enu * vt
    vpl = epsi / enu * (omega - om)
    ok = d > 0.0
    z = jnp.zeros_like(vrl)
    return (jnp.where(ok, vrl, z), jnp.where(ok, vtl, z),
            jnp.where(ok, vpl, z))


def lnrf_frame_inv(vrl, vtl, vpl, r, a, th):
    """Inverse of lnrf_frame.  kerr.f90:451-474."""
    mu = jnp.cos(th)
    d, ar, rho, enu, emu1, emu2, epsi, om = _lnrf_factors(r, mu, a)
    vr = enu / emu1 * vrl
    vt = enu / emu2 * vtl
    omega = enu / epsi * vpl + om
    ok = d > 0.0
    z = jnp.zeros_like(vr)
    return (jnp.where(ok, vr, z), jnp.where(ok, vt, z),
            jnp.where(ok, omega, z))


def calcg(u, mu, q2, l, a, tpm, tpr, su, sm, vrl, vtl, vpl):
    """Redshift g for a photon with constants (q2, l) hitting gas with LNRF
    velocity (vrl, vtl, vpl).  kerr.f90:181-218."""
    r = 1.0 / u
    d, ar, rho, enu, emu1, emu2, epsi, om = _lnrf_factors(r, mu, a)
    sr = (-1.0) ** tpr * su
    st = -(-1.0) ** tpm * sm
    omega = jnp.where(epsi != 0.0, enu / epsi * vpl + om, 0.0)
    gam = 1.0 / jnp.sqrt(1.0 - (vrl ** 2 + vtl ** 2 + vpl ** 2))
    rr = (-a * a * q2 * u ** 4 + 2.0 * u ** 3 * (q2 + (a - l) ** 2)
          + u * u * (a * a - q2 - l * l) + 1.0)
    tt = (q2 + mu * mu * (a * a - l * l - q2) - a * a * mu ** 4) / (1.0 - mu * mu)
    tt = safe_sqrt(tt)
    rr = safe_sqrt(rr) * r * r
    return enu / gam / (1.0 - l * omega - emu1 * enu * vrl / rho * sr * rr
                        - emu2 * enu * vtl / rho * st * tt)


def calc_nullp(q2, l, a, r, mu, su, smu, sqrtU=None, sqrtM=None,
               delta=None):
    """Photon wavevector k^mu (contravariant BL, forward-in-time affine
    parameterization) from constants of motion.  kerr.f90:255-290 (the
    rcomp/thcomp branch used by geodesics.f90:362).

    su = sign of du/dlam along the traced (observer->in) direction at this
    point (i.e. +1 before a radial turning point, -1 after); smu likewise
    the traced sign of dmu/dlam.

    sqrtU/sqrtM/delta: optional precomputed sqrt of the radial/polar
    potentials and the horizon function Delta = r^2 - 2r + a^2 (the
    three expressions that cancel catastrophically near turning points
    / the horizon — the mixed-precision path evaluates them in f64 and
    passes them in so the rest of the algebra can run f32)."""
    u = 1.0 / r
    rho2 = r * r + a * a * mu * mu
    d = (r * r - 2.0 * r + a * a) if delta is None else delta
    if sqrtM is None:
        Mf = q2 + (a * a - q2 - l * l) * mu * mu - a * a * mu ** 4
        sqrtM = safe_sqrt(Mf)
    # 1 - mu^2 floored at ~3 eps of mu's dtype (same rationale as
    # geokerr._phase_integrands_polar): the trace clips mu to exactly
    # +-1 at pole-grazing samples, and sqrtM/safe_sqrt(0) = 0/0 = NaN
    # would poison the whole downstream pipeline for those rays (the
    # f32 mixed path clips more readily).  At an exact pole M -> 0 at
    # the same rate as 1-mu^2, so the floored ratio stays finite; exact
    # pole-crossers have l = 0, making the kph l/(1-mu^2) term 0 too.
    eps3 = 3.0 * float(jnp.finfo(jnp.result_type(mu)).eps)
    one_m = jnp.maximum(1.0 - mu * mu, eps3)
    kmu = smu * sqrtM / jnp.sqrt(one_m) / rho2
    if sqrtU is None:
        Uf = (1.0 + (a * a - q2 - l * l) * u * u
              + 2.0 * ((a - l) ** 2 + q2) * u ** 3 - a * a * q2 * u ** 4)
        sqrtU = safe_sqrt(Uf)
    kr = su * r * r * sqrtU / rho2
    kt = (-a * (a * (1.0 - mu * mu) - l)
          + (r * r + a * a) / d * (r * r + a * a - a * l)) / rho2
    kph = (-a + l / one_m + a / d * (r * r + a * a - a * l)) / rho2
    return jnp.stack(jnp.broadcast_arrays(kt, kr, kmu, kph), axis=-1)


def calc_u0(g_cov, vr, vth, vph):
    """u^t from BL coordinate 3-velocity.  kerr.f90:1120-1127.

    Returns 1.0 (finite) where the 3-velocity is spacelike/unphysical —
    callers mask those points; a NaN here would poison autodiff."""
    den = (g_cov[..., 0] + g_cov[..., 4] * vr ** 2
           + g_cov[..., 7] * vth ** 2 + g_cov[..., 9] * vph ** 2
           + 2.0 * g_cov[..., 3] * vph)
    ok = den < 0.0
    return jnp.where(ok, jnp.sqrt(-1.0 / jnp.where(ok, den, -1.0)), 1.0)


def calc_plunging_vel(a, r):
    """Equatorial plunging four-velocity inside the ISCO (Hughes 2000/01).
    kerr.f90:1140-1166."""
    ems, lms, rms = calc_rms_constants(a)
    th = jnp.full_like(r, jnp.pi / 2.0)
    gcon = metric_con(r, th, a)
    pt = -gcon[..., 0] * ems + gcon[..., 3] * lms
    den = -gcon[..., 4] * (1.0 + gcon[..., 0] * ems * ems
                           - 2.0 * gcon[..., 3] * ems * lms
                           + gcon[..., 9] * lms * lms)
    pr = -safe_sqrt(den)
    pph = -gcon[..., 3] * ems + gcon[..., 9] * lms
    z = jnp.zeros_like(pt)
    return jnp.stack([pt, pr, z, pph], axis=-1)


def rms_vel(a, th, r):
    """Plunging-region four-velocity off the equatorial plane: plunging
    LNRF velocity evaluated in the equatorial plane, re-expressed at
    polar angle th.  kerr.f90:1168-1190."""
    fueq = calc_plunging_vel(a, r)
    theq = jnp.full_like(r, jnp.pi / 2.0)
    vrl, vtl, vpl = lnrf_frame(fueq[..., 1] / fueq[..., 0],
                               fueq[..., 2] / fueq[..., 0],
                               fueq[..., 3] / fueq[..., 0], r, a, theq)
    vr, vt, om = lnrf_frame_inv(vrl, vtl, vpl, r, a, th)
    g = metric_cov(r, th, a)
    u0 = calc_u0(g, vr, vt, om)
    return jnp.stack([u0, u0 * vr, u0 * vt, u0 * om], axis=-1)


def calc_polvec(r, mu, p, a, psi):
    """Thin-disk polarization basis vector (f^0=0 convention, Agol 1997)
    rotated by angle psi in the disk frame.  kerr.f90:998-1045."""
    d = r ** 2 - 2.0 * r + a ** 2
    ar = (r * r + a * a) ** 2 - a * a * d * (1.0 - mu * mu)
    om = 2.0 * a * r / ar
    rho = r ** 2 + a ** 2 * mu ** 2
    ptt = r * jnp.sqrt(d / ar) * p[..., 0]
    prt = r / jnp.sqrt(d) * p[..., 1]
    ptht = r * p[..., 2]
    ppht = jnp.sqrt(ar) / r * (p[..., 3] - om * p[..., 0])
    vel = 1.0 / (r ** 1.5 + a)
    epsi = jnp.sqrt(1.0 - mu * mu) * jnp.sqrt(ar / rho)
    enu = jnp.sqrt(d * rho / ar)
    vel = epsi / enu * (vel - om)
    frl = jnp.sqrt(d) / r * (vel * (ptt - prt ** 2 / ptt) - ppht)
    fthl = -vel * prt * ptht / ptt / r
    fphl = r * prt / jnp.sqrt(ar) * (1.0 - vel * ppht / ptt)
    frp = jnp.sqrt(d) * ptht * prt / r * (-1.0 + vel * ppht / ptt)
    fthp = 1.0 / r * (prt ** 2 + (1.0 + vel ** 2) * ppht ** 2
                      - 2.0 * vel * ppht * ptt + vel * ptht ** 2 * ppht / ptt)
    fphp = r * ptht / jnp.sqrt(ar) * (-(1.0 + vel ** 2) * ppht + vel * ptt
                                      + vel * ppht ** 2 / ptt)
    fr = jnp.cos(psi) * frl + jnp.sin(psi) * frp
    fth = jnp.cos(psi) * fthl + jnp.sin(psi) * fthp
    fph = jnp.cos(psi) * fphl + jnp.sin(psi) * fphp
    z = jnp.zeros_like(fr)
    f = jnp.stack([z, fr, fth, fph], axis=-1)
    g = metric_cov(r, jnp.arccos(mu), a)
    norm = fv.dot(g, f, f)
    return f / jnp.sqrt(norm)[..., None]


def calc_kappapw(a, r, mu, p, f):
    """Complex Walker-Penrose constant (re, im) of vector f perp to p.
    kerr.f90:1047-1064."""
    alpha = (p[..., 0] * f[..., 1] - p[..., 1] * f[..., 0]) \
        + a * (1.0 - mu ** 2) * (p[..., 1] * f[..., 3] - p[..., 3] * f[..., 1])
    beta = (r ** 2 + a ** 2) * jnp.sqrt(1.0 - mu ** 2) \
        * (p[..., 3] * f[..., 2] - p[..., 2] * f[..., 3]) \
        - a * jnp.sqrt(1.0 - mu ** 2) * (p[..., 0] * f[..., 2]
                                         - p[..., 2] * f[..., 0])
    # kappa = (alpha - i beta)(r - i a mu)
    re = alpha * r - beta * a * mu
    im = -(alpha * a * mu + beta * r)
    return re, im


def calc_polar_psi(r, muf, q2, a, alpha, beta, rshift, mus, p):
    """Thin-disk polarization angle doubling (c2psi, s2psi) and emission
    cosine for electron-scattering polarization.  kerr.f90:954-996."""
    f = calc_polvec(r, muf, p, a, 0.0)
    kre, kim = calc_kappapw(a, r, muf, p, f)
    kappa2 = kre
    kappa1 = -kim
    gammac = -alpha - a * (1.0 - mus ** 2)
    den = beta * kappa2 - gammac * kappa1
    num = -beta * kappa1 - gammac * kappa2
    polarpsi = jnp.arctan2(den, num)
    s2psi = jnp.sin(2.0 * polarpsi)
    c2psi = jnp.cos(2.0 * polarpsi)
    cosne = rshift * safe_sqrt(q2) / r
    return c2psi, s2psi, cosne
