"""Multi-chip scaling: pixel-axis sharding over a device mesh.

The reference's only parallelism is a shared-memory OpenMP loop over
pixels (pgrtrans.f90:198-209).  TPU-natively, rays are independent, so
the camera's pixel axis shards across the mesh with NO communication in
the forward pass; reductions (spectra, image moments, parameter
gradients) are psum collectives over the 'pix' axis.  Fluid snapshots
are replicated (they are closed-over constants of the jitted render, so
XLA replicates them per device automatically).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pixel_mesh(n_devices=None, devices=None):
    """1-D device mesh over the pixel axis."""
    if devices is None:
        devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("pix",))


def shard_pixels(mesh, *arrays):
    """Place arrays with their leading (pixel) axis sharded over the mesh."""
    sh = NamedSharding(mesh, P("pix"))
    return tuple(jax.device_put(a, sh) for a in arrays)


def render_sharded(render_fn, mesh, cam_arrays, *args, **kwargs):
    """Run a pixel-batched render with the pixel axis sharded.

    render_fn(alpha, beta, l, q2, sm, *args, **kwargs) must be pixel
    -elementwise over its leading axis; XLA compiles one SPMD program
    with no cross-device communication."""
    sharded = shard_pixels(mesh, *cam_arrays)
    fn = jax.jit(partial(render_fn, **kwargs))
    return fn(*sharded, *args)
