"""Pallas TPU kernel: packed-row table gather with the table RESIDENT
IN VMEM.

The FFJET/GRMHD samplers are descriptor-latency-bound XLA gathers from
HBM (round-3 profile); this kernel pins the packed quad table
(~2.4 MB for FFJET's 128^2 x 36 floats) in VMEM and streams query
blocks through it, so each lookup pays VMEM latency instead of an HBM
gather descriptor.  The kernel is a PURE gather (out[n] =
table[idx[n]]): the 4-corner weighted combine is identical elementwise
XLA on both sides of the A/B, so the measurement isolates the gather
primitive itself.

Measured A/B against the XLA gather on the flagship sampler
(scripts/pallas_gather_ab.py -> artifacts/PALLAS_AB.json) — kept
in-tree as the decision record either way; the sampler uses whichever
path the measurement favors (see ffjet.py).

Mosaic notes for this backend (bisected on-chip): dynamic VMEM row
slices from an int32 SMEM index are fine; SMEM f32 scalar reads and
scalar extraction from loaded vectors both crash the remote Mosaic
compiler — hence the gather-only kernel shape.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 512          # queries per grid step


def _kernel(idx_ref, tab_ref, out_ref):
    def body(i, _):
        j = idx_ref[i, 0]
        out_ref[pl.ds(i, 1), :] = tab_ref[pl.ds(j, 1), :]
        return 0

    jax.lax.fori_loop(0, out_ref.shape[0], body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def vmem_row_gather(table, idx, interpret=False):
    """table (NS, F) f32; idx (N,) int32 -> out (N, F) = table[idx].
    N must be a BQ multiple (pad at the call site)."""
    n = idx.shape[0]
    assert n % BQ == 0, "pad queries to a BQ multiple"
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n, table.shape[1]), table.dtype),
        grid=(n // BQ,),
        in_specs=[
            pl.BlockSpec((BQ, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # whole table
        ],
        out_specs=pl.BlockSpec((BQ, table.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(idx[:, None], table)


def quad_combine(rows, w, nf=9):
    """rows (N, 4*nf), w (N, 4) -> sum_c w[:, c] * rows[:, c*nf:(c+1)*nf]
    (the shared elementwise epilogue of both A/B arms)."""
    q = rows.reshape(rows.shape[0], 4, nf)
    return jnp.sum(q * w[..., None], axis=-2)


def xla_quad_gather(table, idx, w, nf=9):
    """The production XLA path (ffjet.py vals): one packed-row gather
    per query + register combine."""
    return quad_combine(table[idx], w, nf)
