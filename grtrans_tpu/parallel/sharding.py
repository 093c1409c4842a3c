"""Multi-chip scaling: pixel-axis sharding over a device mesh.

The reference's only parallelism is a shared-memory OpenMP loop over
pixels (pgrtrans.f90:198-209).  TPU-natively, rays are independent, so
the camera's pixel axis shards across the mesh with NO communication in
the forward pass; reductions (spectra, image moments, parameter
gradients) are psum collectives over the 'pix' axis.  Fluid snapshots
are replicated (they are closed-over constants of the jitted render, so
XLA replicates them per device automatically).

Multi-host: `init_distributed()` + `multihost_mesh()` build the same
pixel mesh over EVERY process's devices (one jax.distributed world);
the pixel axis then spans hosts, collectives ride ICI within a slice
and DCN across slices, and each host feeds/reads only its
addressable shard (`host_pixel_slice`).  Snapshots too large for one
chip's HBM shard spatially: `snapshot_shard_spec` documents/creates
the (theta-axis) sharding; trilinear sampling then needs a one-cell
halo, which `halo_exchange_theta` provides with a ppermute.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator=None, num_processes=None, process_id=None):
    """Initialize the multi-host JAX runtime (idempotent; no-op for a
    single process).  On TPU pods the three arguments are discovered
    from the environment; pass them explicitly for CPU/GPU clusters.
    Call BEFORE any other JAX API, one call per host process."""
    if jax.process_count() > 1:
        return                      # already initialized
    try:
        if coordinator is not None or num_processes is not None:
            jax.distributed.initialize(coordinator_address=coordinator,
                                       num_processes=num_processes,
                                       process_id=process_id)
        else:
            jax.distributed.initialize()
    except (ValueError, RuntimeError):
        # single-process run (no coordinator available): valid — the
        # mesh then spans only local devices
        pass


def pixel_mesh(n_devices=None, devices=None):
    """1-D device mesh over the pixel axis (local devices)."""
    if devices is None:
        devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("pix",))


def multihost_mesh():
    """1-D pixel mesh over ALL processes' devices (call after
    init_distributed).  jax.devices() in a distributed runtime already
    enumerates the global device list in process order, so each host's
    addressable shard is a contiguous pixel block."""
    return Mesh(np.asarray(jax.devices()), axis_names=("pix",))


def host_pixel_slice(npix, process_id=None, process_count=None):
    """The [lo, hi) pixel range addressable by this host under a
    multihost_mesh sharding of `npix` pixels.  Pure index math — unit
    testable without a multi-host runtime."""
    pid = jax.process_index() if process_id is None else process_id
    pcount = jax.process_count() if process_count is None else process_count
    per = -(-npix // pcount)                      # ceil
    lo = min(pid * per, npix)
    return lo, min(lo + per, npix)


def snapshot_shard_spec(mesh, ndim, axis=2):
    """NamedSharding for a GRMHD snapshot too large for one chip's HBM:
    shard the THETA axis (axis 2 of (..., r, theta, phi) grids) over
    the pixel mesh — rays cluster in theta by camera row, so most
    trilinear lookups are shard-local and the halo is one cell deep.
    The field axes stay replicated."""
    spec = [None] * ndim
    spec[axis] = "pix"
    return NamedSharding(mesh, P(*spec))


def halo_exchange_theta(grid, axis_name="pix", axis=0):
    """One-cell halo exchange along the sharded theta axis (`axis` of
    the PER-DEVICE block): returns (lo_ghost, hi_ghost) rows received
    from the neighboring shards via ppermute.  For use inside
    shard_map-ped samplers when snapshots are spatially sharded
    (grmhd3d.sample_sharded).  Edge shards receive their own boundary
    row (clamped halo)."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [((i + 1) % n, i) for i in range(n)]
    first = jax.lax.index_in_dim(grid, 0, axis, keepdims=False)
    last = jax.lax.index_in_dim(grid, grid.shape[axis] - 1, axis,
                                keepdims=False)
    from_prev = jax.lax.ppermute(last, axis_name, fwd)    # prev's last
    from_next = jax.lax.ppermute(first, axis_name, bwd)   # next's first
    lo = jnp.where(idx == 0, first, from_prev)
    hi = jnp.where(idx == n - 1, last, from_next)
    return lo, hi


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
