"""Fluid-model framework: registry, shared converters, source parameters.

Parity: reference fluid.f90 — the `fluid` struct (:49-57), `source_params`
(:69-75), the five dispatch points every model plugs into
(load/initialize/get_fluid_vars/convert_fluid_vars/unload, :163-584), and
the shared unit conversions and electron-temperature prescriptions
(:765-923).

TPU design: a model is (load_fn -> state pytree, vals_fn(state, x, k, a)
-> FluidVars of device arrays, convert_fn(state, fv, sp) -> EmisInputs).
All vals/convert functions are pure jnp and broadcast over (npix, npts).
"""

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax.numpy as jnp

from grtrans_tpu import constants as pc

CONST, TAIL = 0, 1


class FluidVars(NamedTuple):
    """Fluid state sampled along rays; arrays (npix, npts[, 4])."""
    rho: jnp.ndarray           # density-like primary variable (model units)
    p: jnp.ndarray             # pressure / temperature-like variable
    bmag: jnp.ndarray          # field strength (model units)
    u: jnp.ndarray             # four-velocity (BL, contravariant)
    b: jnp.ndarray             # magnetic four-vector (BL)
    rho2: jnp.ndarray          # secondary density (nonthermal e-)
    kela: Optional[jnp.ndarray] = None  # electron entropy (GRMHD models)
    fnu: Optional[jnp.ndarray] = None   # tabulated F_nu (PHATDISK)
    nbins: Optional[jnp.ndarray] = None  # nonthermal e- bins (KORAL)
    be: Optional[jnp.ndarray] = None    # Bernoulli / T_ion (KORAL)


class EmisInputs(NamedTuple):
    """cgs-unit inputs to the emissivity kernels."""
    ncgs: jnp.ndarray
    tcgs: jnp.ndarray
    bcgs: jnp.ndarray
    ncgsnth: jnp.ndarray
    fnu: Optional[jnp.ndarray] = None       # (npix, npts, nfreq_tab)
    freq_tab: Optional[jnp.ndarray] = None  # (nfreq_tab,)
    # binned nonthermal e- populations (KORAL relel bins; SYNCHBIN)
    nbins: Optional[jnp.ndarray] = None     # (npix, npts, nbin) [cm^-3]
    gammas: Optional[jnp.ndarray] = None    # (nbin,) bin centers
    dgammas: Optional[jnp.ndarray] = None   # (nbin,) bin widths


@dataclass
class SourceParams:
    """Reference source_params (fluid.f90:69-75)."""
    nfac: float = 1.0          # mdot scale factor of the scan
    mbh: float = 10.0          # BH mass [Msun]
    mdot: float = 1e15         # accretion rate for sim-unit scaling [g/s]
    mu: float = 0.25           # T_e/T_p-like ratio parameter (muval)
    gmin: float = 100.0        # nonthermal gamma_min (or CONST value)
    gmax: float = 1e5
    p1: float = 3.5            # nonthermal index
    p2: float = 3.5
    jetalpha: float = 0.02
    stype: int = CONST         # CONST or TAIL gamma_min model
    sigcut: float = 1e10
    # emis_params extras (emis.f90:31-40): mixture args for MAXJUTT /
    # MAXCOMP and the 7-element coefficient-selection mask
    otherargs: Optional[tuple] = None
    coefindx: Optional[tuple] = None


def scale_sim_units(mbh, mdotcgs, mdot_code, rho, p, bmag):
    """GRMHD code units -> cgs (fluid.f90:765-790)."""
    lcgs = pc.G * mbh * pc.msun / pc.c ** 2
    tcgs = lcgs / pc.c
    rhocgs = mdotcgs / mdot_code / lcgs ** 3 * tcgs * rho
    ncgs = rhocgs / pc.mp
    safe = jnp.where(rho > 0, rho, 1.0)
    pcgs = p * rhocgs / safe * pc.c ** 2
    tempcgs = pcgs / jnp.maximum(ncgs, 1e-37) / pc.k
    bcgs = bmag * jnp.sqrt(rhocgs / safe) * pc.c * jnp.sqrt(4.0 * jnp.pi)
    return ncgs, bcgs, tempcgs, rhocgs


def sigma_cut(bcgs, rhocgs, tempcgs, ncgs, sigcut):
    """Zero out high-magnetization zones (fluid.f90:792-810)."""
    sigma = bcgs * bcgs / jnp.maximum(rhocgs * 8.988e20 * 4.0 * jnp.pi,
                                      1e-37)
    hot = sigma >= sigcut
    return (jnp.where(hot, 0.0, rhocgs), jnp.where(hot, 0.0, ncgs),
            jnp.where(hot, 1e9, tempcgs))


def monika_e(rho, p, b, rlow, rhigh):
    """Moscibrodzka+2016 R(beta) temperature-ratio prescription
    (fluid.f90:874-892).  beta = p / (b^2/2) with code-unit inputs."""
    beta = p / jnp.maximum(b * b, 1e-37) / 0.5
    b2 = beta * beta
    trat = jnp.where(b > 0.0, rhigh * b2 / (1.0 + b2) + rlow / (1.0 + b2),
                     rhigh)
    return trat


def charles_e(rho, p, u, b, rlow, rhigh):
    """EHT-notes electron temperature (fluid.f90:814-843); p here is
    T_p + T_e type variable and u = T_p + 2 T_e (KORAL convention)."""
    beta = 2.0 * rho * pc.k * p / pc.mp / jnp.maximum(b * b, 1e-37)
    b2 = beta * beta
    trat = jnp.where(b > 0.0, rhigh * b2 / (1.0 + b2) + rlow / (1.0 + b2),
                     rhigh)
    return u / (2.0 + trat)


def ressler_e(rho, kel):
    """Electron-entropy temperature (fluid.f90:894-904)."""
    gamma = 4.0 / 3.0
    thetae = pc.mp / pc.m * kel * rho ** (gamma - 1.0)
    return thetae * pc.m * pc.c2 / pc.k


def werner_e(rho, bmag):
    """Werner+2018 dissipation fraction (fluid.f90:906-911)."""
    sig = bmag ** 2 / jnp.maximum(rho, 1e-37) / 5.0
    return 0.25 + 0.25 * jnp.sqrt(sig / (2.0 + sig))


def nonthermale_b2(alpha, gmin, p1, bmagrho, bcgs):
    """Jet nonthermal e- density where sigma > 1 (fluid.f90:914-923)."""
    n = alpha * bcgs ** 2 / (8.0 * jnp.pi) / gmin \
        * (p1 - 2.0) / (p1 - 1.0) / 8.2e-7
    return jnp.where(bmagrho > 1.0, n, 0.0)


def calc_gmin(p, thetae, eta):
    """Nonthermal gamma_min + number-fraction fitting formulas for the
    stype='tail' source-parameter model (reference calcgmin.f90
    calc_gmin_subroutine).  Returns (gmin, nfrac)."""
    acenter = 0.5668090982352612
    anormal = 0.52624783
    azero = 3.0 / jnp.sqrt(2.0)
    astwo = jnp.log(jnp.sqrt(2.0))
    if p == 3.5:
        lin_cons, lin_coeff, lin_power = 16.0797900684, -13.5593749125,             0.276589155355
        inv_cons, inv_coeff, inv_power = 0.722506578136, 151.597731214,             6.53997654139
        inv_sin_coeff = inv_sin_freq = inv_sin_delay = 0.0
        lin_sin_coeff = lin_sin_freq = lin_sin_delay = 0.121815691108
    else:
        lin_cons, lin_coeff, lin_power = 21.38307186, -16.7811712, 0.15128533
        inv_cons, inv_coeff, inv_power = 0.74798712, 0.62609462, 0.81567379
        inv_sin_coeff, inv_sin_freq, inv_sin_delay = 0.00638946501,             -16.8034428, 3.72208398
        lin_sin_coeff = lin_sin_freq = lin_sin_delay = 0.0
    lin_const = lin_cons + lin_coeff * eta ** lin_power         + lin_sin_coeff * jnp.sin(eta * lin_sin_freq + lin_sin_delay)
    inv_const = inv_cons + inv_coeff * eta ** inv_power         + inv_sin_coeff * jnp.sin(eta * inv_sin_freq + inv_sin_delay)
    raw = thetae * lin_const + inv_const
    gmin = jnp.maximum(raw, 1.0)
    atheta = thetae * azero * jnp.exp(
        astwo * jnp.tanh(anormal * jnp.log(thetae / acenter)))
    nfrac = eta * atheta * (p - 2.0) / (p - 1.0) * gmin ** (p - 2.0)
    return gmin, nfrac


def apply_source_params(ei: "EmisInputs", sp: "SourceParams"):
    """Apply the stype gamma_min model to the converted emissivity inputs
    (reference assign_source_params, fluid.f90:1641-1678): for
    stype='tail' the nonthermal population is a per-sample tail of the
    thermal one — calc_gmin's fitting formulas give gamma_min(theta_e)
    and the number fraction, which REPLACE the model's ncgsnth.

    Returns (ei, gmin) where gmin is the (broadcastable) per-sample
    cutoff to feed the power-law kernels.  CONST passes through."""
    if sp.stype != TAIL:
        return ei, sp.gmin
    # the reference feeds mu*k*tcgs/m/c^2 (tcgs is pre-mu-correction)
    thetae = sp.mu * pc.k * ei.tcgs / (pc.m * pc.c2)
    gmin, nfrac = calc_gmin(sp.p2, thetae, sp.jetalpha)
    over = gmin > sp.gmax
    gmin_used = jnp.where(over, sp.gmax / 2.0, gmin)
    # gmin clamped from above: fold the lost tail into the density
    # (the 1-p normalization is already applied; p-2 remains)
    factor = jnp.where(over,
                       (sp.gmax / 2.0 / jnp.where(over, gmin, 1.0))
                       ** (sp.p2 - 2.0), 1.0)
    ncgsnth = factor * jnp.where(
        nfrac > 0.0, nfrac * ei.ncgs * gmin_used ** (1.0 - sp.p2), 0.0)
    return ei._replace(ncgsnth=ncgsnth), gmin_used


def toroidal_b(g_cov, u, bmag):
    """Purely toroidal magnetic four-vector with |b| = bmag, b.u = 0
    (construction used by SARIAF/POWERLAW/TOY, fluid.f90:1404-1416)."""
    gtt = g_cov[..., 0]
    gtp = g_cov[..., 3]
    gpp = g_cov[..., 9]
    aleph = -(gtp * u[..., 0] + gpp * u[..., 3]) \
        / (gtt * u[..., 0] + gtp * u[..., 3])
    bb = gtt * aleph * aleph + gpp + 2.0 * gtp * aleph
    pos = bb > 0.0
    bphi = jnp.where(pos, bmag / jnp.sqrt(jnp.where(pos, bb, 1.0)), 0.0)
    z = jnp.zeros_like(bphi)
    return jnp.stack([aleph * bphi, z, z, bphi], axis=-1)


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

_REGISTRY: Dict[str, Any] = {}


def register(name):
    def deco(cls):
        _REGISTRY[name.upper()] = cls
        return cls
    return deco


def load_fluid_model(name, **kwargs):
    """Instantiate + load a fluid model by fname (fluid.f90:163-243)."""
    cls = _REGISTRY.get(name.upper())
    if cls is None:
        _import_all_models()
        cls = _REGISTRY.get(name.upper())
    if cls is None:
        raise ValueError(f"unknown fluid model {name!r}; have "
                         f"{sorted(_REGISTRY)}")
    return cls(**kwargs)


def _import_all_models():
    """Import every model module so @register side effects populate the
    registry (the reference's compile-time model enum, fluid.f90:39-43)."""
    import importlib
    for mod in ("analytic", "ffjet", "sphacc", "harm", "harm3d", "harmpi",
                "iharm", "koral", "thickdisk", "mb09", "hotspot", "disks"):
        try:
            importlib.import_module(f"grtrans_tpu.fluid.{mod}")
        except ImportError:
            pass


def get_fluid_vars(model, x, k, a):
    return model.vals(x, k, a)


def convert_fluid_vars(model, fv, sp):
    return model.convert(fv, sp)
