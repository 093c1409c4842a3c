"""Batched polynomial root finding for quartics (and degenerate lower
degrees) via Durand-Kerner.

The reference finds quartic roots with Laguerre's method + deflation
(geokerr_wrapper.f:3348 ZROOTS, :3533 LAGUER) — a sequential scalar
algorithm.  On TPU we instead run the Durand-Kerner (Weierstrass) fixed
-point iteration on all roots simultaneously: branch-free, batched over
rays, fixed iteration count.  Degenerate leading coefficients (the Kerr
radial/polar quartics lose degree when a=0 or q^2=0) are handled by
computing cubic/quadratic solutions in parallel and selecting with
jnp.where; missing roots are reported at +-BIG.

TPU hardware has no complex dtype, so complex arithmetic is carried
explicitly as (re, im) float64 pairs.
"""

import jax
import jax.numpy as jnp

# DK iteration bound: measured on full-camera Kerr radial quartics
# (a = 0.998/0.5/0.0 grids), the iteration is machine-exact by n = 20
# (3e-15 vs the 64-iteration reference; 1.8e-2 at n = 12), and a Newton
# polish follows — 24 keeps a margin at 2.7x less work in one of the
# per-pixel setup hot loops (PROFILE_r04: setup is ~half the fused
# mixed geodesic stage)
N_ITER = 24
BIG = 1e30


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _cdiv(ar, ai, br, bi):
    d = br * br + bi * bi
    d = jnp.where(d == 0.0, 1e-37, d)
    return (ar * br + ai * bi) / d, (ai * br - ar * bi) / d


def _dk(coeffs, nroots):
    """Durand-Kerner on the monic polynomial z^n + sum coeffs[k] z^k,
    coeffs = [a0..a_{n-1}] broadcast arrays.  Returns (re, im) (..., n)."""
    n = nroots
    r = 1.0
    for c in coeffs:
        r = jnp.maximum(r, jnp.abs(c))
    r = 1.0 + r
    base_re = [0.4, -0.65, -0.908, -0.0959]
    base_im = [0.9, 0.72, -0.297, -0.936]
    zr = r[..., None] * jnp.array(base_re[:n])
    zi = r[..., None] * jnp.array(base_im[:n])
    cs = [c[..., None] for c in coeffs]

    def poly(zr, zi):
        pr = jnp.ones_like(zr)
        pi = jnp.zeros_like(zr)
        for c in reversed(cs):
            pr, pi = _cmul(pr, pi, zr, zi)
            pr = pr + c
        return pr, pi

    def body(_, carry):
        zr, zi = carry
        dr = zr[..., :, None] - zr[..., None, :]
        di = zi[..., :, None] - zi[..., None, :]
        dr = dr + jnp.eye(n)
        prodr = jnp.ones_like(zr)
        prodi = jnp.zeros_like(zr)
        for j in range(n):
            prodr, prodi = _cmul(prodr, prodi, dr[..., j], di[..., j])
        pr, pi = poly(zr, zi)
        sr, si = _cdiv(pr, pi, prodr, prodi)
        return (zr - sr, zi - si)

    zr, zi = jax.lax.fori_loop(0, N_ITER, body, (zr, zi))

    # one Newton polish
    def dpoly(zr, zi):
        pr = jnp.full_like(zr, float(n))
        pi = jnp.zeros_like(zr)
        for k in range(n - 1, 0, -1):
            pr, pi = _cmul(pr, pi, zr, zi)
            pr = pr + k * cs[k]
        return pr, pi

    pr, pi = poly(zr, zi)
    dpr, dpi = dpoly(zr, zi)
    sr, si = _cdiv(pr, pi, dpr, dpi)
    return zr - sr, zi - si


@jax.jit
def quartic_roots(c0, c1, c2, c3, c4):
    """All roots of c4 x^4 + c3 x^3 + c2 x^2 + c1 x + c0, degree-robust.

    Args broadcast elementwise; returns (re, im) arrays with trailing
    axis 4, sorted by real part.  When the polynomial degenerates to
    degree d < 4, the 4-d missing roots are returned as BIG (1e30)."""
    c0, c1, c2, c3, c4 = jnp.broadcast_arrays(
        *[jnp.asarray(c, jnp.float64) for c in (c0, c1, c2, c3, c4)])
    S = jnp.abs(c0)
    for c in (c1, c2, c3, c4):
        S = jnp.maximum(S, jnp.abs(c))
    S = jnp.maximum(S, 1e-37)
    tol = 1e-13
    is4 = jnp.abs(c4) > tol * S
    is3 = jnp.abs(c3) > tol * S
    is2 = jnp.abs(c2) > tol * S

    safe4 = jnp.where(is4, c4, 1.0)
    safe3 = jnp.where(is3, c3, 1.0)
    safe2 = jnp.where(is2, c2, 1.0)
    safe1 = jnp.where(jnp.abs(c1) > 0, c1, 1.0)

    q4r, q4i = _dk([c0 / safe4, c1 / safe4, c2 / safe4, c3 / safe4], 4)

    c3r, c3i = _dk([c0 / safe3, c1 / safe3, c2 / safe3], 3)
    bigcol = jnp.full(c0.shape + (1,), BIG)
    zcol = jnp.zeros(c0.shape + (1,))
    q3r = jnp.concatenate([c3r, bigcol], axis=-1)
    q3i = jnp.concatenate([c3i, zcol], axis=-1)

    # quadratic closed form
    b0, b1 = c0 / safe2, c1 / safe2
    disc = b1 * b1 - 4.0 * b0
    sq = jnp.sqrt(jnp.abs(disc))
    rr1 = jnp.where(disc >= 0, 0.5 * (-b1 - sq), -0.5 * b1)
    rr2 = jnp.where(disc >= 0, 0.5 * (-b1 + sq), -0.5 * b1)
    ri1 = jnp.where(disc >= 0, 0.0, -0.5 * sq)
    ri2 = jnp.where(disc >= 0, 0.0, 0.5 * sq)
    q2r = jnp.stack([rr1, rr2, jnp.full_like(b0, BIG),
                     jnp.full_like(b0, BIG)], axis=-1)
    q2i = jnp.stack([ri1, ri2, jnp.zeros_like(b0), jnp.zeros_like(b0)],
                    axis=-1)

    # linear
    lroot = -c0 / safe1
    q1r = jnp.stack([lroot] + [jnp.full_like(b0, BIG)] * 3, axis=-1)
    q1i = jnp.zeros_like(q1r)

    zr = jnp.where(is4[..., None], q4r,
                   jnp.where(is3[..., None], q3r,
                             jnp.where(is2[..., None], q2r, q1r)))
    zi = jnp.where(is4[..., None], q4i,
                   jnp.where(is3[..., None], q3i,
                             jnp.where(is2[..., None], q2i, q1i)))

    order = jnp.argsort(zr, axis=-1)
    zr = jnp.take_along_axis(zr, order, axis=-1)
    zi = jnp.take_along_axis(zi, order, axis=-1)
    return zr, zi


def real_roots_mask(roots_re, roots_im, rel_tol=1e-8):
    """Mask of which roots are (numerically) real and finite."""
    scale = jnp.maximum(jnp.abs(roots_re), 1.0)
    return (jnp.abs(roots_im) <= rel_tol * scale) & (jnp.abs(roots_re) < BIG / 10)
