"""Four-vector algebra on packed symmetric metrics.

The reference wraps each vector in a derived type carrying its own packed
10-component metric (class_four_vector.f90:5-60, overloaded `*` = metric
dot product).  TPU-natively a four-vector is just an array with trailing
axis 4 and the metric a broadcastable (..., 10) array; the dot product is
a fused elementwise contraction.

Packing order (i<=j row-major): [tt, tr, tth, tph, rr, rth, rph, thth,
thph, phph] — identical to the reference's 10-component layout
(kerr.f90:292-400 uses indices 1,4,5,8,10 for tt,tph,rr,thth,phph).
"""

import jax.numpy as jnp

# index pairs for the packed symmetric 4x4
_PAIRS = [(0, 0), (0, 1), (0, 2), (0, 3),
          (1, 1), (1, 2), (1, 3),
          (2, 2), (2, 3),
          (3, 3)]
_IDX = {p: i for i, p in enumerate(_PAIRS)}


def unpack(g):
    """(..., 10) packed -> (..., 4, 4) full symmetric matrix."""
    rows = []
    for i in range(4):
        row = [g[..., _IDX[(min(i, j), max(i, j))]] for j in range(4)]
        rows.append(jnp.stack(row, axis=-1))
    return jnp.stack(rows, axis=-2)


def dot(g, u, v):
    """Metric dot product g_{mu nu} u^mu v^nu with packed metric g."""
    out = 0.0
    for (i, j), idx in _IDX.items():
        if i == j:
            out = out + g[..., idx] * u[..., i] * v[..., i]
        else:
            out = out + g[..., idx] * (u[..., i] * v[..., j]
                                       + u[..., j] * v[..., i])
    return out


def lower(g, u):
    """u_mu = g_{mu nu} u^nu with packed metric (class_four_vector.f90 lower)."""
    comps = []
    for i in range(4):
        acc = 0.0
        for j in range(4):
            acc = acc + g[..., _IDX[(min(i, j), max(i, j))]] * u[..., j]
        comps.append(acc)
    return jnp.stack(comps, axis=-1)
