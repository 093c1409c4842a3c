"""Gauss-Legendre quadrature helpers (static nodes, batched evaluation).

Replaces the reference's GAULEG (geokerr_wrapper.f:3492) and the various
special-purpose integral reductions: smooth Mino-time integrands are
integrated per segment at fixed GL nodes — a pure map over
(ray, segment, node) that XLA fuses and tiles freely.
"""

from functools import lru_cache

import numpy as np
import jax.numpy as jnp


@lru_cache(maxsize=None)
def gl_nodes(n):
    """(nodes, weights) for n-point Gauss-Legendre on [0, 1], as numpy."""
    x, w = np.polynomial.legendre.leggauss(n)
    return ((x + 1.0) / 2.0, w / 2.0)


def integrate(f, a, b, n=32):
    """integral_a^b f(t) dt with n-point GL. a, b broadcast; f vectorized."""
    x, w = gl_nodes(n)
    x = jnp.asarray(x)
    w = jnp.asarray(w)
    a = jnp.asarray(a, jnp.float64)
    b = jnp.asarray(b, jnp.float64)
    t = a[..., None] + (b - a)[..., None] * x
    return jnp.sum(f(t) * w, axis=-1) * (b - a)


def cumulative_segments(f, pts, n=8):
    """Cumulative integral of f along the sorted grid pts[..., npts]:
    returns F[..., i] = integral_{pts[...,0]}^{pts[...,i]} f, with F[...,0]=0.

    Each segment uses n-point GL on the exact integrand (not the trapezoid
    of samples), so accuracy is O(h^(2n)) per segment."""
    x, w = gl_nodes(n)
    x = jnp.asarray(x)
    w = jnp.asarray(w)
    a = pts[..., :-1]
    b = pts[..., 1:]
    t = a[..., None] + (b - a)[..., None] * x      # (..., npts-1, n)
    seg = jnp.sum(f(t) * w, axis=-1) * (b - a)
    zero = jnp.zeros_like(pts[..., :1])
    return jnp.concatenate([zero, jnp.cumsum(seg, axis=-1)], axis=-1)
