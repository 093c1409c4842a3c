"""Emissivity post-processing: frame rotation, Lorentz invariance,
optical depth, and the 11->(j4, K7) split.

Parity: reference emis.f90 rotate_emis (:797-829), invariant_emis
(:831-838), invariant_intensity (:840-847), calc_opt_depth (:786-795)."""

import jax.numpy as jnp

from grtrans_tpu.ops.interp import tsum


def split_e(e):
    """(..., 11) coefficient block -> (j (...,4), K (...,7))."""
    return e[..., 0:4], e[..., 4:11]


def rotate_emis(j, K, s2xi, c2xi):
    """Rotate (Q, U) emission/absorption/Faraday components by the
    polarization-basis angle 2xi (Shcherbakov & Huang 2011).
    emis.f90:797-829.  K layout [aI aQ aU aV rhoQ rhoU rhoV]."""
    jq, ju = j[..., 1], j[..., 2]
    aq, au = K[..., 1], K[..., 2]
    rq, ru = K[..., 4], K[..., 5]
    j = j.at[..., 1].set(c2xi * jq - s2xi * ju)
    j = j.at[..., 2].set(s2xi * jq + c2xi * ju)
    K = K.at[..., 1].set(c2xi * aq - s2xi * au)
    K = K.at[..., 2].set(s2xi * aq + c2xi * au)
    K = K.at[..., 4].set(c2xi * rq - s2xi * ru)
    K = K.at[..., 5].set(s2xi * rq + c2xi * ru)
    return j, K


def invariant_emis(j, K, g):
    """Lorentz-invariant scalings j -> j g^2, K -> K/g (emis.f90:831-838)."""
    return j * (g * g)[..., None], K / g[..., None]


def invariant_intensity(j, g, npow):
    """I_nu/nu^npow scaling for thin-disk surface emission
    (emis.f90:840-847)."""
    return j * (g ** npow)[..., None]


def calc_opt_depth(lam, K, indx=0):
    """Cumulative optical depth along the ray for coefficient column indx
    (emis.f90:786-795)."""
    return tsum(lam, jnp.abs(K[..., indx]))
