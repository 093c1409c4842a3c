"""Weierstrass elliptic functions and the Biermann-Weierstrass quartic
inversion — the TPU-native core of the semi-analytic geodesic engine.

The reference inverts the radial/polar Kerr potentials point-by-point with
a table of Jacobi-elliptic cases keyed on the quartic's root structure
(geokerr_wrapper.f:836-1187, cases of Dexter & Agol 2009 Table 1).  Here we
use the classical Biermann-Weierstrass theorem instead: for ANY quartic
f(x) with real coefficients and any starting point x0 with f(x0) >= 0,

    x(lam) with  integral_{x0}^{x} dt/sqrt(f(t)) = lam

is a single rational expression in (wp(lam), wp'(lam)) with invariants
g2, g3 computed directly from f's coefficients — one uniform, branch-free
formula for every root configuration (4 real, 2+2 complex, all complex,
degenerate cubics/quadratics), which is exactly what a vectorized TPU
kernel wants.  wp is evaluated by Laurent series + argument-doubling with
a static iteration count.
"""

import jax
import jax.numpy as jnp

# number of Laurent coefficients c_k (k = 2..K_SERIES+1)
K_SERIES = 16
# argument-doubling bound: n = ceil(log2(|z| * invariant_scale / 0.25));
# geodesic use keeps |z| within a few real periods, i.e. |z|*t <~ 1e2 ->
# n <= 9; 20 leaves a 2^11 margin while costing 2.4x less than the old
# 48-iteration loop (the doubling loop is the hot inner loop of every
# geodesic point on TPU)
MAX_DOUBLINGS = 20


def quartic_invariants(A, B, C, D, E):
    """Weierstrass invariants (g2, g3) of f(x)=A x^4 + B x^3 + C x^2 + D x + E.

    Uses the binomial normalization a0=A, a1=B/4, a2=C/6, a3=D/4, a4=E."""
    a0, a1, a2, a3, a4 = A, B / 4.0, C / 6.0, D / 4.0, E
    g2 = a0 * a4 - 4.0 * a1 * a3 + 3.0 * a2 * a2
    g3 = (a0 * a2 * a4 + 2.0 * a1 * a2 * a3 - a2 ** 3
          - a0 * a3 * a3 - a1 * a1 * a4)
    return g2, g3


def _series_coeffs(g2, g3):
    """Laurent coefficients c_k of wp(z) = z^-2 + sum_k c_k z^(2k-2)."""
    cs = [None, None, g2 / 20.0, g3 / 28.0]
    for k in range(4, K_SERIES + 2):
        acc = 0.0
        for mm in range(2, k - 1):
            acc = acc + cs[mm] * cs[k - mm]
        cs.append(3.0 / ((2 * k + 1) * (k - 3)) * acc)
    return cs[2:]


@jax.jit
def wp(z, g2, g3):
    """Weierstrass (wp(z), wp'(z)) for real z > 0 and real invariants.

    Algorithm: per-element pick n with |z/2^n| small relative to the
    invariant scale, evaluate the Laurent series there, then apply the
    (wp, wp') duplication map n times (masked static loop).  Accurate to
    ~1e-13 relative for z within a few real periods of the origin.

    Dtype-polymorphic: runs in the common dtype of (z, g2, g3) — f64
    callers are unchanged; the mixed-precision geodesic path feeds f32
    throughout (v5e emulates every f64 op as double-float, ~5-10x the
    f32 cost, and this function dominates the geodesic stage)."""
    dt = jnp.result_type(jnp.asarray(z), jnp.asarray(g2), jnp.asarray(g3))
    z = jnp.asarray(z, dt)
    g2 = jnp.asarray(g2, dt)
    g3 = jnp.asarray(g3, dt)
    # Do NOT jnp.broadcast_arrays the invariants up to z's shape: the
    # explicit degenerate-dim broadcast HLOs that produces ((npix,1) ->
    # (npix,npts)) send XLA's algebraic simplifier into a circular
    # simplification loop (50-run bailout; catastrophic TPU compile
    # times), and materializing them instead multiplies the 16 Laurent
    # coefficient arrays by npts in memory (HBM OOM at render sizes).
    # Plain arithmetic broadcasting keeps every invariant-derived array
    # at the SMALL shape and compiles cleanly.
    if z.ndim < jnp.ndim(g2) or z.ndim < jnp.ndim(g3):
        z = jnp.broadcast_to(
            z, jnp.broadcast_shapes(z.shape, jnp.shape(g2),
                                    jnp.shape(g3)))

    # invariant scale: series converges for |z| << min lattice distance
    # ~ |g2|^(-1/4), |g3|^(-1/6)
    t = jnp.maximum(jnp.abs(g2) ** 0.25, jnp.abs(g3) ** (1.0 / 6.0))
    target = 0.25 / jnp.maximum(t, 1e-37)
    n = jnp.ceil(jnp.log2(jnp.maximum(jnp.abs(z) / target, 1.0)))
    n = jnp.clip(n, 0, MAX_DOUBLINGS).astype(jnp.int32)
    zs = z / (2.0 ** n.astype(dt))

    cs = _series_coeffs(g2, g3)
    z2 = zs * zs
    # wp  = 1/z^2 + sum c_k z^(2k-2);  wp' = -2/z^3 + sum (2k-2) c_k z^(2k-3)
    p_ser = jnp.zeros_like(zs)
    dp_ser = jnp.zeros_like(zs)
    for i in range(len(cs) - 1, -1, -1):
        k = i + 2
        p_ser = p_ser * z2 + cs[i]
        dp_ser = dp_ser * z2 + (2 * k - 2) * cs[i]
    p = 1.0 / z2 + z2 * p_ser
    dp = -2.0 / (z2 * zs) + zs * dp_ser

    def body(i, carry):
        p, dp = carry
        ddp = 6.0 * p * p - 0.5 * g2          # wp''
        dddp = 12.0 * p * dp                  # wp'''
        safe = jnp.where(jnp.abs(dp) > 1e-37, dp, 1e-37)
        h = ddp / (2.0 * safe)
        hp = (dp * dddp - ddp * ddp) / (2.0 * safe * safe)
        p2 = h * h - 2.0 * p
        dp2 = h * hp - dp
        doit = i < n
        return (jnp.where(doit, p2, p), jnp.where(doit, dp2, dp))

    p, dp = jax.lax.fori_loop(0, MAX_DOUBLINGS, body, (p, dp))
    return p, dp


def quartic_coeff_derivs(A, B, C, D, E, x0):
    """f(x0), f'(x0), f''(x0), f'''(x0), f'''' for the BW formula."""
    f0 = (((A * x0 + B) * x0 + C) * x0 + D) * x0 + E
    f1 = ((4.0 * A * x0 + 3.0 * B) * x0 + 2.0 * C) * x0 + D
    f2 = (12.0 * A * x0 + 6.0 * B) * x0 + 2.0 * C
    f3 = 24.0 * A * x0 + 6.0 * B
    f4 = 24.0 * A
    return f0, f1, f2, f3, f4


def invert_quartic(A, B, C, D, E, x0, s, lam, g2=None, g3=None):
    """Biermann-Weierstrass inversion: x(lam) of dx/dlam = +-sqrt(f(x)),
    starting at x(0)=x0 with dx/dlam(0) = s*sqrt(f(x0)) (s = +-1).

    Turning points (simple roots of f) are traversed automatically: the
    formula IS the analytic solution of the ODE continued through them.
    lam=0 returns exactly x0.  Valid until x(lam) runs into a pole of the
    solution (i.e. |x|->inf for A<0 cases) or lam approaches a full real
    period; callers arrange lam ranges accordingly."""
    if g2 is None:
        g2, g3 = quartic_invariants(A, B, C, D, E)
    f0, f1, f2, f3, f4 = quartic_coeff_derivs(A, B, C, D, E, x0)
    # double-where: lam=0 sits on wp's pole (p, dp -> inf, num/den =
    # inf/inf = NaN) — a NaN in the DISCARDED branch still poisons the
    # backward pass (the divide VJP computes 0 * num/den^2 = 0 * NaN),
    # so wp must never see lam=0.  1e-8 is deep inside the series region
    # for any invariant scale reached here.
    zero = lam == 0.0
    lam_s = jnp.where(zero, 1e-8, lam)
    p, dp = wp(lam_s, g2, g3)
    sq = jnp.sqrt(jnp.maximum(f0, 0.0))
    pm = p - f2 / 24.0
    num = -s * sq * dp + 0.5 * f1 * pm + f0 * f3 / 24.0
    den = 2.0 * pm * pm - f0 * f4 / 48.0
    x = x0 + num / den
    return jnp.where(zero, jnp.broadcast_to(x0, x.shape), x)


def invert_quartic_with_deriv(A, B, C, D, E, x0, s, lam, g2=None, g3=None):
    """Same as invert_quartic but also returns dx/dlam(lam) (signed).

    dx/dlam = +-sqrt(f(x)); the sign comes from differentiating the BW
    rational expression via the chain rule with wp'' = 6wp^2 - g2/2."""
    if g2 is None:
        g2, g3 = quartic_invariants(A, B, C, D, E)
    f0, f1, f2, f3, f4 = quartic_coeff_derivs(A, B, C, D, E, x0)
    # double-where at lam=0: see invert_quartic
    zero = lam == 0.0
    lam_s = jnp.where(zero, 1e-8, lam)
    p, dp = wp(lam_s, g2, g3)
    ddp = 6.0 * p * p - 0.5 * g2
    sq = jnp.sqrt(jnp.maximum(f0, 0.0))
    pm = p - f2 / 24.0
    num = -s * sq * dp + 0.5 * f1 * pm + f0 * f3 / 24.0
    den = 2.0 * pm * pm - f0 * f4 / 48.0
    x = x0 + num / den
    dnum = -s * sq * ddp + 0.5 * f1 * dp
    dden = 4.0 * pm * dp
    dx = (dnum * den - num * dden) / (den * den)
    x = jnp.where(zero, jnp.broadcast_to(x0, x.shape), x)
    dx = jnp.where(zero, jnp.broadcast_to(s * sq, dx.shape), dx)
    return x, dx
