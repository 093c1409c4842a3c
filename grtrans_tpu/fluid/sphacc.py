"""SPHACC: general-relativistic (Michel 1972) spherical Bondi accretion.

Parity: reference fluid_model_sphacc.f90 — which interpolates HARD-CODED
461/498-point solution tables (:13-449).  Here the transonic flow is
solved from first principles at load time (Shapiro & Teukolsky ch. 14
recipe: sonic-point conditions + relativistic Bernoulli + continuity,
scipy root finding on a log-r grid) with the same parameters
(Gamma = 5/3, T_inf = 0.917e-9 m_p c^2 ~ 1e4 K) and the same closed-form
density / equipartition-field normalizations (:450-466):

    n(u) = ninf * alpha/(4 us) * (2 Gamma Tinf)^(-3/2) * (2u)^(3/2)
    B(u) = sqrt(8 pi n m_p/2 c^2 u)

The four-velocity and b-field assembly matches get_sphacc_fluidvars
(fluid.f90:1215-1247): radial infall in Schwarzschild, b constructed
from u.b = 0, |b| = B with b_theta = b_phi = 0.
"""

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from grtrans_tpu import constants as pc
from grtrans_tpu.ops.interp import get_weight
from grtrans_tpu.fluid import base
from grtrans_tpu.fluid.base import FluidVars, EmisInputs

GAMMA = 5.0 / 3.0
TINF = 0.917e-9          # theta_inf = k T_inf / (m_p c^2)
NINF = 1.0
ALPHA = 0.25
US = 0.94


def _theta_of_a2(A):
    """temperature theta from sound speed squared a^2 (Gamma-law gas)."""
    return A * (GAMMA - 1.0) / (GAMMA * (GAMMA - 1.0 - A))


def _a2_of_theta(th):
    return GAMMA * th / (1.0 + GAMMA * th / (GAMMA - 1.0))


def _synge_funcs():
    """Analytic Synge-gas thermodynamics for a single-temperature e-p
    plasma: enthalpy per baryon h(T), its derivative, the adiabat slope
    dlnT/dln n and the relativistic sound speed a^2(T) = (dP/de)_s.
    Closed-form Bessel identities (no tables, no cancellation noise)."""
    from scipy.special import kv

    def R_and_dR(x):
        """K3/K2(x) and d/dx; large-x asymptotics beyond overflow."""
        x = np.asarray(x, float)
        big = x > 300.0
        xs = np.where(big, 1.0, x)
        K1 = kv(1, xs); K2 = kv(2, xs); K3 = kv(3, xs); K4 = kv(4, xs)
        R = K3 / np.maximum(K2, 1e-300)   # HOST numpy: true f64 range
        dR = (-(K2 + K4) / 2.0 * K2 + K3 * (K1 + K3) / 2.0) \
            / np.maximum(K2 * K2, 1e-300)
        # asymptotic: R ~ 1 + 5/(2x) + 15/(8x^2) - 15/(8x^3)...
        Ra = 1.0 + 2.5 / x + 15.0 / (8.0 * x * x)
        dRa = -2.5 / (x * x) - 15.0 / (4.0 * x ** 3)
        return np.where(big, Ra, R), np.where(big, dRa, dR)

    def props(T):
        xp = pc.mp * pc.c2 / (pc.k * T)
        xe = pc.m * pc.c2 / (pc.k * T)
        Rp, dRp = R_and_dR(xp)
        Re, dRe = R_and_dR(xe)
        h = pc.mp * pc.c2 * Rp + pc.m * pc.c2 * Re
        # dh/dT = sum m c^2 dR/dx * (-x/T)
        dh = pc.mp * pc.c2 * dRp * (-xp / T) + pc.m * pc.c2 * dRe * (-xe / T)
        beta = (dh - 2.0 * pc.k) / (2.0 * pc.k * T)   # dln n/dT
        a2 = (2.0 * pc.k + 2.0 * pc.k * T * beta) \
            / (dh - 2.0 * pc.k + (h - 2.0 * pc.k * T) * beta)
        return h, dh, beta, a2

    return props


def solve_bondi(nr=600, r_min=1.9, r_max=1e5, t_inf_K=1e4):
    """Transonic GR Bondi flow (Michel 1972) for a single-temperature e-p
    Synge gas, by integrating the GR wind equation

        du/dr = [2 a^2/r - (1/r^2)/W] / [u/W - a^2/u],  W = 1-2/r+u^2

    outward and inward from the critical point (non-relativistic for a
    Gamma=5/3-at-infinity gas; launched along the L'Hopital slope).
    Closes with dlnT = (dlnT/dln n) dln n through the analytic Synge
    adiabat.  Returns (r, u_r, T[K]) sorted in r."""
    from scipy.integrate import solve_ivp

    props = _synge_funcs()

    # non-relativistic critical point: 6.75 us^4 = 3 a_inf^2, then make
    # (us, rs) exactly consistent with the analytic a^2(Ts)
    mbar = pc.mp + pc.m
    a_inf2 = GAMMA * 2.0 * pc.k * t_inf_K / (mbar * pc.c2)
    us2_est = np.sqrt(3.0 * a_inf2 / 6.75)
    Ts = us2_est / (1.0 - 3.0 * us2_est) * mbar * pc.c2 / (GAMMA * 2.0 * pc.k)
    _, _, _, a_s2 = props(Ts)
    a_s2 = float(a_s2)
    us2 = a_s2 / (1.0 + 3.0 * a_s2)
    us_ = np.sqrt(us2)
    rs = 1.0 / (2.0 * us2)

    def rhs(lnr, y):
        lnu, lnT = y
        r = np.exp(lnr)
        u = np.exp(lnu)
        T = np.exp(lnT)
        _, _, beta, a2 = props(T)
        W = 1.0 - 2.0 / r + u * u
        num = 2.0 * a2 / r - (1.0 / (r * r)) / W
        den = u / W - a2 / u
        dlnu_dlnr = (num / den) * r / u
        alpha = 2.0 * pc.k / (2.0 * pc.k + 2.0 * pc.k * T * beta) \
            if False else None
        # dlnT/dln n along the adiabat = 1/(T beta)
        dlnT_dlnn = 1.0 / (T * beta)
        dlnT_dlnr = dlnT_dlnn * (-dlnu_dlnr - 2.0)
        return [dlnu_dlnr, dlnT_dlnr]

    # L'Hopital slope at the critical point
    def N_of(r, u, T):
        a2 = props(T)[3]
        W = 1.0 - 2.0 / r + u * u
        return 2.0 * a2 / r - (1.0 / (r * r)) / W

    def D_of(r, u, T):
        a2 = props(T)[3]
        W = 1.0 - 2.0 / r + u * u
        return u / W - a2 / u

    def fd(f, x, h):
        return (f(x + h) - f(x - h)) / (2 * h)

    beta_s = float(props(Ts)[2])
    alpha_s = 1.0 / (Ts * beta_s)       # dlnT/dln n at the sonic point
    Nr = fd(lambda r: N_of(r, us_, Ts), rs, rs * 1e-6)
    Nu = fd(lambda u: N_of(rs, u, Ts), us_, us_ * 1e-6)
    NT = fd(lambda T: N_of(rs, us_, T), Ts, Ts * 1e-6)
    Dr = fd(lambda r: D_of(r, us_, Ts), rs, rs * 1e-6)
    Du = fd(lambda u: D_of(rs, u, Ts), us_, us_ * 1e-6)
    DT = fd(lambda T: D_of(rs, us_, T), Ts, Ts * 1e-6)
    c1 = -alpha_s * Ts / us_
    c0 = -alpha_s * Ts * 2.0 / rs
    A = Du + DT * c1
    B = Dr + DT * c0 - Nu - NT * c1
    Cq = -(Nr + NT * c0)
    disc = np.sqrt(max(B * B - 4 * A * Cq, 0.0))
    roots = sorted([(-B - disc) / (2 * A), (-B + disc) / (2 * A)])
    ups = roots[0]          # accretion branch: du/dr < 0
    Tps = c1 * ups + c0

    eps = 1e-4 * rs
    rr_in = np.logspace(np.log10(rs - eps), np.log10(r_min), nr)
    rr_out = np.logspace(np.log10(rs + eps), np.log10(r_max), nr)
    legs = []
    for rr_leg, dr0 in (("in", -eps), ("out", +eps)):
        pass
    out = {}
    for tag, rr_leg, dr0 in (("in", rr_in, -eps), ("out", rr_out, +eps)):
        y0 = [np.log(us_ + ups * dr0), np.log(Ts + Tps * dr0)]
        sol = solve_ivp(rhs, (np.log(rr_leg[0]), np.log(rr_leg[-1])), y0,
                        t_eval=np.log(rr_leg), rtol=1e-11, atol=1e-13,
                        method="LSODA")
        ny = sol.y.shape[1]
        out[tag] = (rr_leg[:ny], np.exp(sol.y[0]), np.exp(sol.y[1]))

    rr = np.concatenate([out["in"][0][::-1], out["out"][0]])
    uu = np.concatenate([out["in"][1][::-1], out["out"][1]])
    TT = np.concatenate([out["in"][2][::-1], out["out"][2]])
    return rr, uu, TT


@base.register("SPHACC")
@dataclass
class SphAcc:
    nr: int = 600
    tin: float = 1.0e11   # inner-temperature anchor [K] at r=2
                          # (reference parameter, fluid_model_sphacc.f90:461)

    def __post_init__(self):
        rr, uu, TT = solve_bondi(self.nr)
        # the reference normalizes its temperature table to Tin at the
        # Schwarzschild radius; rescale the self-consistent solution to
        # the same anchor (the shape, v(r), n(r) are unchanged)
        T2 = float(np.interp(2.0, rr, TT))
        TT = TT * (self.tin / T2)
        self.r_tab = jnp.asarray(rr)
        self.v_tab = jnp.asarray(uu)
        self.T_tab = jnp.asarray(TT)

    def vals(self, x, k, a):
        r = x[..., 1]
        u = 1.0 / r
        ix, w = get_weight(self.r_tab, r)
        ur = self.v_tab[ix] * (1 - w) + self.v_tab[ix + 1] * w
        T = self.T_tab[ix] * (1 - w) + self.T_tab[ix + 1] * w
        # closed-form density/field (fluid_model_sphacc.f90:462-465)
        n = NINF * ALPHA / 4.0 / US * (2.0 * GAMMA * TINF) ** (-1.5) \
            * (2.0 * u) ** 1.5
        B = jnp.sqrt(8.0 * jnp.pi * n * pc.mp / 2.0 * pc.c2 * u)
        g00 = -(1.0 - 2.0 * u)
        grr = -1.0 / g00
        ut = jnp.sqrt(jnp.maximum((-grr * ur * ur - 1.0) / g00, 1e-30))
        z = jnp.zeros_like(r)
        uvec = jnp.stack([ut, -ur, z, z], axis=-1)
        # b from u.b = 0, b.b = B^2, b^th = b^ph = 0 (fluid.f90:1233-1236)
        bt2 = ur ** 2 * grr * B ** 2 \
            / (ur ** 2 * g00 * grr + ut ** 2 * g00 * g00)
        bt = jnp.sqrt(jnp.maximum(bt2, 0.0))
        br = -jnp.sqrt(jnp.maximum(B ** 2 / grr - bt2 * g00 / grr, 0.0))
        bvec = jnp.stack([bt, br, z, z], axis=-1)
        return FluidVars(rho=n, p=T, bmag=B, u=uvec, b=bvec, rho2=z)

    def convert(self, fv, sp):
        """ncgs = n, bcgs = B, tcgs = T (fluid.f90:1249-1259)."""
        return EmisInputs(ncgs=fv.rho, tcgs=fv.p, bcgs=fv.bmag,
                          ncgsnth=jnp.zeros_like(fv.rho))
