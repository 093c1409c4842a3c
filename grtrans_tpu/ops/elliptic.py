"""Carlson symmetric elliptic integrals, batched and jit/vmap/grad-safe.

TPU-native replacement for the reference's scalar Fortran routines
(geokerr_wrapper.f:3444 RF, :3608 RC, :3648 RD, :3697 RJ).  Instead of
data-dependent convergence loops, we run a fixed number of duplication
steps (each shrinks the error scale by 4x; N_ITER=26 with the 5th-order
Taylor tail reaches float64 roundoff for all physical arguments), which
makes every call a static-shape XLA program.

Also provides Legendre forms F(phi|m), E(phi|m), K(m) via the Carlson
forms, valid for any real m with 1 - m sin^2(phi) > 0.
"""

import jax
import jax.numpy as jnp

N_ITER = 26


@jax.jit
def rf(x, y, z):
    """Carlson R_F(x,y,z), elementwise over broadcast arguments.

    Valid for non-negative x,y,z with at most one zero."""
    x, y, z = jnp.broadcast_arrays(*[jnp.asarray(a, jnp.float64) for a in (x, y, z)])

    def body(_, carry):
        x, y, z, scale = carry
        sx, sy, sz = jnp.sqrt(x), jnp.sqrt(y), jnp.sqrt(z)
        lam = sx * sy + sy * sz + sz * sx
        return (0.25 * (x + lam), 0.25 * (y + lam), 0.25 * (z + lam), scale)

    x, y, z, _ = jax.lax.fori_loop(0, N_ITER, body, (x, y, z, 0.0))
    av = (x + y + z) / 3.0
    dx = (av - x) / av
    dy = (av - y) / av
    dz = (av - z) / av
    e2 = dx * dy + dy * dz + dz * dx
    e3 = dx * dy * dz
    s = 1.0 - e2 / 10.0 + e3 / 14.0 + e2 * e2 / 24.0 - 3.0 * e2 * e3 / 44.0
    return s / jnp.sqrt(av)


@jax.jit
def rc(x, y):
    """Carlson R_C(x,y) = R_F(x,y,y); x>=0, y!=0 (y<0 handled by principal value)."""
    x = jnp.asarray(x, jnp.float64)
    y = jnp.asarray(y, jnp.float64)
    # principal value for y<0: R_C(x,y) = sqrt(x/(x-y)) R_C(x-y,-y)
    neg = y < 0.0
    xs = jnp.where(neg, x - y, x)
    ys = jnp.where(neg, -y, y)
    w = jnp.where(neg, jnp.sqrt(x / jnp.where(neg, x - y, 1.0)), 1.0)

    def body(_, carry):
        x, y = carry
        lam = 2.0 * jnp.sqrt(x) * jnp.sqrt(y) + y
        return (0.25 * (x + lam), 0.25 * (y + lam))

    xs, ys = jax.lax.fori_loop(0, N_ITER, body, (xs, ys))
    av = (xs + ys + ys) / 3.0
    s = (ys - av) / av  # = -dx/ (since dx+2dy=0)
    p = s * s * (0.3 + s * (1.0 / 7.0 + s * (0.375 + s * 9.0 / 22.0)))
    return w * (1.0 + p) / jnp.sqrt(av)


@jax.jit
def rd(x, y, z):
    """Carlson R_D(x,y,z) = R_J(x,y,z,z); x,y>=0 (at most one 0), z>0."""
    x, y, z = jnp.broadcast_arrays(*[jnp.asarray(a, jnp.float64) for a in (x, y, z)])
    acc = jnp.zeros_like(x)
    fac = jnp.ones_like(x)

    def body(_, carry):
        x, y, z, acc, fac = carry
        sx, sy, sz = jnp.sqrt(x), jnp.sqrt(y), jnp.sqrt(z)
        lam = sx * sy + sy * sz + sz * sx
        acc = acc + fac / (sz * (z + lam))
        fac = 0.25 * fac
        return (0.25 * (x + lam), 0.25 * (y + lam), 0.25 * (z + lam), acc, fac)

    x, y, z, acc, fac = jax.lax.fori_loop(0, N_ITER, body, (x, y, z, acc, fac))
    av = (x + y + 3.0 * z) / 5.0
    dx = (av - x) / av
    dy = (av - y) / av
    dz = (av - z) / av
    ea = dx * dy
    eb = dz * dz
    ec = ea - eb
    ed = ea - 6.0 * eb
    ee = ed + ec + ec
    s = ed * (-3.0 / 14.0 + 9.0 / 88.0 * ed - 4.5 / 26.0 * dz * ee) \
        + dz * (1.0 / 6.0 * ee + dz * (-9.0 / 22.0 * ec + dz * 3.0 / 26.0 * ea))
    return 3.0 * acc + fac * (1.0 + s) / (av * jnp.sqrt(av))


@jax.jit
def rj(x, y, z, p):
    """Carlson R_J(x,y,z,p); x,y,z>=0 (at most one 0), p>0.

    (p<0 principal value not needed by the geodesic kernels; the phase
    integrals are evaluated by Gauss-Legendre quadrature instead.)"""
    x, y, z, p = jnp.broadcast_arrays(*[jnp.asarray(a, jnp.float64)
                                        for a in (x, y, z, p)])
    acc = jnp.zeros_like(x)
    fac = jnp.ones_like(x)

    def body(_, carry):
        x, y, z, p, acc, fac = carry
        sx, sy, sz = jnp.sqrt(x), jnp.sqrt(y), jnp.sqrt(z)
        lam = sx * sy + sy * sz + sz * sx
        alpha = (p * (sx + sy + sz) + sx * sy * sz) ** 2
        beta = p * (p + lam) ** 2
        acc = acc + fac * rc(alpha, beta)
        fac = 0.25 * fac
        return (0.25 * (x + lam), 0.25 * (y + lam), 0.25 * (z + lam),
                0.25 * (p + lam), acc, fac)

    x, y, z, p, acc, fac = jax.lax.fori_loop(0, N_ITER, body,
                                             (x, y, z, p, acc, fac))
    av = (x + y + z + 2.0 * p) / 5.0
    dx = (av - x) / av
    dy = (av - y) / av
    dz = (av - z) / av
    dp = (av - p) / av
    ea = dx * (dy + dz) + dy * dz
    eb = dx * dy * dz
    ec = dp * dp
    ed = ea - 3.0 * ec
    ee = eb + 2.0 * dp * (ea - ec)
    s = ed * (-3.0 / 14.0 + 9.0 / 88.0 * ed - 4.5 / 26.0 * ee) \
        + eb * (1.0 / 6.0 + dp * (-3.0 / 11.0 + dp * 3.0 / 26.0)) \
        + dp * ea * (1.0 / 3.0 - dp * 3.0 / 22.0) - dp * ec / 3.0
    return 3.0 * acc + fac * (1.0 + s) / (av * jnp.sqrt(av))


@jax.jit
def ellf(phi, m):
    """Legendre incomplete elliptic integral of the first kind F(phi|m).

    Uses F = sin(phi) R_F(cos^2 phi, 1 - m sin^2 phi, 1); valid for
    |phi| <= pi/2 and any m with 1 - m sin^2 phi > 0 (including m<0)."""
    s = jnp.sin(phi)
    c = jnp.cos(phi)
    return s * rf(c * c, 1.0 - m * s * s, 1.0)


@jax.jit
def ellk(m):
    """Complete elliptic integral K(m) (parameter m = k^2, may be negative)."""
    return rf(0.0, 1.0 - m, 1.0)


@jax.jit
def elle(phi, m):
    """Legendre incomplete elliptic integral of the second kind E(phi|m)."""
    s = jnp.sin(phi)
    c = jnp.cos(phi)
    q = 1.0 - m * s * s
    return s * rf(c * c, q, 1.0) - (m / 3.0) * s ** 3 * rd(c * c, q, 1.0)
