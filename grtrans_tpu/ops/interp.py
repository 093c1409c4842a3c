"""Table search and multilinear interpolation.

TPU-native equivalent of reference interpolate.f90 (get_weight/interp
bi/tri/quad-linear, :15-232) and the F77 hunt/locate bisection searches:
sorted-table lookup is jnp.searchsorted (vectorized), and the multilinear
kernels are gathers + fused multiply-adds, batched over an arbitrary
number of query points.
"""

import jax.numpy as jnp


def get_weight(xarr, x):
    """Fractional index of x in sorted 1-D table xarr.

    Returns (ix, w) with xarr[ix] <= x <= xarr[ix+1] (clamped) and
    w in [0,1] the linear weight of the ix+1 point.
    Parity: reference interpolate.f90:67-106."""
    n = xarr.shape[0]
    # int32 indices: under x64 mode searchsorted yields int64, whose TPU
    # gather lowering is emulated — 100x compile times and slower runs
    ix = jnp.clip(jnp.searchsorted(xarr, x, side="right").astype(jnp.int32)
                  - 1, 0, n - 2)
    x0 = xarr[ix]
    x1 = xarr[ix + 1]
    w = (x - x0) / jnp.where(x1 == x0, 1.0, x1 - x0)
    return ix, w


def interp_1d(yarr, xarr, x):
    """Linear interpolation of yarr(xarr) at points x (no extrapolation clamp)."""
    ix, w = get_weight(xarr, x)
    return yarr[ix] * (1.0 - w) + yarr[ix + 1] * w


def bilinear(f, ix, iy, wx, wy):
    """Bilinear interpolation on gridded f[..., nx, ny] at integer cells
    (ix, iy) with fractional weights (wx, wy).
    Parity: reference interpolate.f90:108-140 (interp2)."""
    f00 = f[..., ix, iy]
    f10 = f[..., ix + 1, iy]
    f01 = f[..., ix, iy + 1]
    f11 = f[..., ix + 1, iy + 1]
    return (f00 * (1 - wx) * (1 - wy) + f10 * wx * (1 - wy)
            + f01 * (1 - wx) * wy + f11 * wx * wy)


def trilinear(f, ix, iy, iz, wx, wy, wz):
    """Trilinear interpolation on f[..., nx, ny, nz].
    Parity: reference interpolate.f90 (interp3)."""
    c00 = f[..., ix, iy, iz] * (1 - wx) + f[..., ix + 1, iy, iz] * wx
    c10 = f[..., ix, iy + 1, iz] * (1 - wx) + f[..., ix + 1, iy + 1, iz] * wx
    c01 = f[..., ix, iy, iz + 1] * (1 - wx) + f[..., ix + 1, iy, iz + 1] * wx
    c11 = f[..., ix, iy + 1, iz + 1] * (1 - wx) + f[..., ix + 1, iy + 1, iz + 1] * wx
    c0 = c00 * (1 - wy) + c10 * wy
    c1 = c01 * (1 - wy) + c11 * wy
    return c0 * (1 - wz) + c1 * wz


def quadlinear(f, idx, w):
    """4-D multilinear interpolation on f[..., n0, n1, n2, n3]; idx/w are
    length-4 sequences of integer cells and weights.
    Parity: reference interpolate.f90 (interp4, used for time-interpolated
    GRMHD snapshots)."""
    i0, i1, i2, i3 = idx
    w0, w1, w2, w3 = w
    out = 0.0
    for d0 in (0, 1):
        for d1 in (0, 1):
            for d2 in (0, 1):
                for d3 in (0, 1):
                    ww = ((w0 if d0 else 1 - w0) * (w1 if d1 else 1 - w1)
                          * (w2 if d2 else 1 - w2) * (w3 if d3 else 1 - w3))
                    out = out + f[..., i0 + d0, i1 + d1, i2 + d2, i3 + d3] * ww
    return out


def tsum(x, y):
    """Cumulative trapezoidal integral of y(x), first element 0.
    Parity: reference math.f90:30-44."""
    dx = x[..., 1:] - x[..., :-1]
    seg = 0.5 * (y[..., 1:] + y[..., :-1]) * dx
    z = jnp.zeros_like(y[..., :1])
    return jnp.concatenate([z, jnp.cumsum(seg, axis=-1)], axis=-1)


def stack_grid_fields(fields, order):
    """Stack named 2-D grids minor-most and flatten the grid axes:
    (n1, n2) x len(order) -> (n1*n2, nf).  One bilinear sample of ALL
    fields is then 4 gathers of contiguous nf-vectors instead of 4*nf
    scalar gathers — TPU gathers are latency-bound, and the minor-most
    contiguous field axis vectorizes the copy (measured 10x on the
    FFJET sampler, grtrans_tpu/fluid/ffjet.py)."""
    g0 = jnp.asarray(fields[order[0]])
    n1, n2 = g0.shape
    return jnp.stack([jnp.asarray(fields[k]) for k in order],
                     axis=-1).reshape(n1 * n2, len(order))


def bilinear_stacked(G, n2, i1, i2, w1, w2):
    """Bilinear sample of a stack_grid_fields table G ((n1*n2, nf),
    grid flattened with axis-1 (n2) minor): cells (i1, i2) int32,
    weights (w1, w2) in [0, 1].  Returns (..., nf)."""
    i00 = i1 * n2 + i2
    return (G[i00] * ((1 - w1) * (1 - w2))[..., None]
            + G[i00 + n2] * (w1 * (1 - w2))[..., None]
            + G[i00 + 1] * ((1 - w1) * w2)[..., None]
            + G[i00 + n2 + 1] * (w1 * w2)[..., None])


def pack_corners_2d(fields, order):
    """Corner-packed quad table: entry (i1, i2) holds the 2x2 cell's
    four corner values of ALL fields contiguously, flattened to
    (n1*n2, 4*nf).  One bilinear sample = ONE gather of 4*nf contiguous
    floats (TPU gathers are descriptor-latency-bound: same bytes as the
    4 separate corner gathers, 4x fewer descriptors).  Edge rows are
    duplicated; cell indices are clipped to n-2 so the pad is never
    addressed.  Corner order: (0,0), (1,0), (0,1), (1,1) in (i1, i2)
    offsets."""
    import numpy as _np
    A = _np.stack([_np.asarray(fields[k]) for k in order], axis=-1)
    A1 = _np.concatenate([A[1:], A[-1:]], axis=0)          # i1+1
    B0 = _np.concatenate([A[:, 1:], A[:, -1:]], axis=1)    # i2+1
    B1 = _np.concatenate([A1[:, 1:], A1[:, -1:]], axis=1)
    quad = _np.stack([A, A1, B0, B1], axis=2)              # (n1,n2,4,nf)
    n1, n2 = A.shape[:2]
    return jnp.asarray(quad.reshape(n1 * n2, 4 * len(order)))


def bilinear_packed(Q, n2, nf, i1, i2, w1, w2):
    """Bilinear sample from a pack_corners_2d table Q ((n1*n2, 4*nf)):
    returns (..., nf).  w1/w2 are the fractional weights along axis
    1/axis 2."""
    q = Q[i1 * n2 + i2].reshape(i1.shape + (4, nf))
    w = jnp.stack([(1 - w1) * (1 - w2), w1 * (1 - w2),
                   (1 - w1) * w2, w1 * w2], axis=-1)
    return jnp.sum(q * w[..., None], axis=-2)


def polint(x, y):
    """Newton divided-difference coefficients of the interpolating
    polynomial through (x_i, y_i) — vectorized over leading batch axes
    (x, y: (..., n), n static).  Parity: the reference's vendored SLATEC
    POLINT (polint.f:44-57, used via interpolate.f90:25-29); the
    divided-difference loop is unrolled at trace time (n is small).
    Returns c (..., n) with
    p(t) = c0 + (t-x0)(c1 + (t-x1)(c2 + ...))."""
    n = x.shape[-1]
    cs = [y[..., 0]]
    # c_k: k-th divided difference built by the same recurrence as the
    # reference (sequential in i, so coefficients match SLATEC exactly)
    for k in range(1, n):
        ck = y[..., k]
        for i in range(k):
            ck = (cs[i] - ck) / (x[..., i] - x[..., k])
        cs.append(ck)
    return jnp.stack(cs, axis=-1)


def polyvl(xx, x, c, nder=0):
    """Evaluate the POLINT polynomial (and its first `nder`
    derivatives) at xx.  Parity: SLATEC POLYVL (polyvl.f).
    xx: (...,) query; x, c: (..., n).  Returns yfit or
    (yfit, [dp/dt, d2p/dt2, ...])."""
    import jax as _jax

    def horner(t):
        n = x.shape[-1]
        p = c[..., n - 1]
        for k in range(n - 2, -1, -1):
            p = c[..., k] + (t - x[..., k]) * p
        return p

    p = horner(xx)
    if nder == 0:
        return p
    # derivatives by forward-mode AD of the Newton form — exact, and
    # free of the reference's 2n-scratch recurrences (polyvl.f)
    derivs = []
    f = horner
    for _ in range(nder):
        def df(t, fp=f):
            _, d = _jax.jvp(fp, (t,), (jnp.ones_like(t),))
            return d
        derivs.append(df(xx))
        f = df
    return p, derivs
