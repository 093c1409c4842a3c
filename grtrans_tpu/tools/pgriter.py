"""Parameter iterator: fit mdot (or any scalar scan parameter) to a
target flux.

Parity: reference pgriter.py (Alwin Mao's secant iterator) + the
pgrface.py/ppslave.py CLI slaves — secant iteration on log(flux) vs
log(param) until the rendered flux matches a target.  The reference
launches whole grtrans processes per step; here each step is one jitted
render, and because flux is nearly a power law in the density scale the
secant in log-log converges in a handful of steps.
"""

import numpy as np


def flux_at(cfg, param_value, freq_index=0, param="mdot", model=None):
    """Render cfg with the scan parameter set and return the spectrum
    flux [Jy-like units of calc_spec] at freq_index."""
    from grtrans_tpu.api import Grtrans
    import dataclasses
    cfg2 = dataclasses.replace(cfg)
    cfg2.fargs = dict(cfg.fargs)
    if param == "mdot":
        cfg2.mdotmin = cfg2.mdotmax = float(param_value)
        cfg2.nmdot = 1
    else:
        cfg2.fargs[param] = float(param_value)
    x = Grtrans()
    x.cfg = cfg2
    x.run()
    return float(np.abs(x.spec[0, freq_index])), x


def fit_flux(cfg, target, guess, param="mdot", freq_index=0, tol=1e-3,
             maxiter=12, factor=2.0):
    """Secant iteration in log-log space (pgriter.py pattern).

    Returns (fitted_param, flux, history list of (param, flux))."""
    history = []
    p0 = float(guess)
    f0, _ = flux_at(cfg, p0, freq_index, param)
    history.append((p0, f0))
    if f0 <= 0:
        raise ValueError("zero flux at initial guess; cannot iterate")
    p1 = p0 * (factor if f0 < target else 1.0 / factor)
    for _ in range(maxiter):
        f1, _ = flux_at(cfg, p1, freq_index, param)
        history.append((p1, f1))
        if abs(np.log(f1 / target)) < tol:
            return p1, f1, history
        # secant step on log f(log p)
        d = np.log(f1 / f0) / np.log(p1 / p0)
        if d == 0 or not np.isfinite(d):
            d = 1.0
        p0, f0 = p1, f1
        p1 = np.exp(np.log(p1) + (np.log(target) - np.log(f1)) / d)
    return p1, f1, history
