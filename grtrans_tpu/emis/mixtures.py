"""Multi-Maxwellian mixture emissivities: MAXJUTT and MAXCOMP.

Parity: reference calc_maxjutt.f90 (calc_maxjutt_subroutine :8-67) and
calc_maxcomp.f90 (calc_maxcomp_subroutine :8-70).  Both approximate a
nonthermal (kappa-like) electron distribution as a weighted sum of
Maxwell-Juttner components on a geometric temperature ladder

    T_i = T_min * delta**i,   T_min = T / sum_i w_i delta**i

so that the total electron energy matches the fluid temperature (the
reference's a=3 relativistic-gas derivation).  Coefficients are the
w_i-weighted sum of polsynchth over the ladder.  MAXCOMP additionally
replaces the EMISSION (j_I..j_V) block with that of one selected
component while keeping the summed absorption — isolating the photons
emitted by one Maxwellian against the full opacity.
"""

import jax.numpy as jnp

from grtrans_tpu.emis import polsynch


def _ladder(tcgs, otherargs):
    delta = float(otherargs[0])
    w = jnp.asarray(otherargs[1:], dtype=jnp.float64)
    w = w / jnp.sum(w)
    deltas = delta ** jnp.arange(w.shape[0], dtype=jnp.float64)
    tmin = tcgs / jnp.sum(w * deltas)
    return w, deltas, tmin


def maxjutt(nu, ncgs, bcgs, tcgs, ang, otherargs=(3.5, 1, 1, 1, 1, 1, 1)):
    """Weighted Maxwell-Juttner sum (calc_maxjutt.f90:8-67).

    otherargs = (delta, w_0, w_1, ..., w_{m-1})."""
    w, deltas, tmin = _ladder(tcgs, otherargs)
    total = 0.0
    for i in range(w.shape[0]):
        total = total + polsynch.polsynchth(
            nu, w[i] * ncgs, bcgs, tmin * deltas[i], ang)
    return total


def maxcomp(nu, ncgs, bcgs, tcgs, ang,
            otherargs=(3.5, 1, 1, 1, 1, 1, 1, 1)):
    """Maxwellian-decomposition emissivity (calc_maxcomp.f90:8-70).

    otherargs = (delta, selection, w_0, ..., w_{m-1}); selection in
    1..m picks the component whose EMISSION replaces the total's
    (1-based like the reference); selection <= 0 leaves the sum."""
    delta = float(otherargs[0])
    isel = int(otherargs[1])
    w, deltas, tmin = _ladder(tcgs, (delta,) + tuple(otherargs[2:]))
    total = 0.0
    for i in range(w.shape[0]):
        total = total + polsynch.polsynchth(
            nu, w[i] * ncgs, bcgs, tmin * deltas[i], ang)
    if 0 < isel <= int(w.shape[0]):
        sel = polsynch.polsynchth(nu, w[isel - 1] * ncgs, bcgs,
                                  tmin * deltas[isel - 1], ang)
        total = jnp.concatenate([sel[..., :4], total[..., 4:]], axis=-1)
    return total
