"""Whole-run orchestration: cameras over (mu, time, mdot, freq).

Parity: reference pgrtrans.f90 grtrans_main (:12-245): log-spaced
frequency/mdot grids, linear mu grid, NCAMS = nmu*nt*nmdot*nfreq
cameras, fluid model loaded once, and the pixel loop — which here is the
batched/sharded render pipeline instead of OpenMP.

Output layout matches the reference module arrays (pgrtrans.f90:221-242):
ivals (nvals+nextra, npix, ncams) with camera index fastest over freq,
then mdot, then time, then mu; ab (2, npix).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from grtrans_tpu.config import GrtransConfig
from grtrans_tpu.geodesics import camera as cam_mod
from grtrans_tpu.geodesics import geokerr
from grtrans_tpu import driver
from grtrans_tpu.fluid.base import load_fluid_model, SourceParams, CONST, TAIL
from grtrans_tpu.fluid import analytic, ffjet, sphacc, harm, hotspot, disks  # noqa: F401


def _source_params(cfg, mdot):
    return SourceParams(nfac=mdot, mbh=cfg.mbh, mdot=mdot, mu=cfg.muval,
                        gmin=cfg.gmin, gmax=cfg.gmax, p1=cfg.p1, p2=cfg.p2,
                        jetalpha=cfg.jetalpha,
                        stype=CONST if cfg.stype == "const" else TAIL,
                        sigcut=cfg.sigcut,
                        otherargs=cfg.epotherargs, coefindx=cfg.epcoefindx)


# compiled-render cache: jax.jit caches on the FUNCTION OBJECT, and
# grtrans_run used to rebuild its jitted closure per call — every call
# re-traced the whole pipeline (tens of seconds of host work for at-scale
# graphs) even though the XLA executable was already cached.  Key on the
# full config repr + id(model) + the model's mutable time-series
# attributes (_epoch covers in-place GRMHD buffer swaps).  The entry
# holds only a WEAK reference to the model: a hit requires the weakref
# to resolve to the very same live object, so id() reuse after gc can
# never serve a stale closure, and the cache does not pin snapshot HBM.
# Eviction is LRU (hits move the entry to the back; evict the front).
import collections
import weakref

_RENDER_CACHE = collections.OrderedDict()
_RENDER_CACHE_MAX = 8


def _render_cache_get(key, model):
    ent = _RENDER_CACHE.get(key)
    if ent is None:
        return None
    if ent[0]() is not model:           # dead or id-reused model
        del _RENDER_CACHE[key]
        return None
    _RENDER_CACHE.move_to_end(key)
    return ent


def _render_cache_put(key, model, fns):
    while len(_RENDER_CACHE) >= _RENDER_CACHE_MAX:
        _RENDER_CACHE.popitem(last=False)           # LRU eviction
    try:
        wref = weakref.ref(model)
    except TypeError:                   # non-weakref-able model object
        wref = (lambda m=model: m)
    _RENDER_CACHE[key] = (wref,) + tuple(fns)


from functools import lru_cache as _lru


@_lru(maxsize=16)
def _cached_camera(a, mu0, a1, a2, b1, b2, nro, nphi, nrotype, rcut):
    """Host-side camera construction is ~ms at 1e4+ pixels and is
    identical across every (time, mdot, repeat) render of a config —
    cache it (all-scalar key)."""
    return cam_mod.make_camera(a, mu0, a1, a2, b1, b2, nro, nphi,
                               nrotype, rcut)
# incremented at TRACE time of the render body (a Python side effect
# runs only while jax traces, not per execution): tests assert an
# nmdot/time scan compiles exactly once
TRACE_COUNT = 0


def _render_fn_key(cfg, model):
    fargs = tuple(sorted(cfg.fargs.items(), key=lambda kv: kv[0]))
    import dataclasses
    cfgkey = tuple((f.name, repr(getattr(cfg, f.name)))
                   for f in dataclasses.fields(cfg) if f.name != "fargs")
    # _epoch bumps whenever a GRMHD model's field buffers mutate
    # (_store/append_slice), so in-place data swaps can't serve a stale
    # compiled closure; the explicit time-series attributes cover the
    # analytic models
    return (cfgkey, repr(fargs), id(model),
            getattr(model, "nt_slices", 1),
            int(getattr(model, "_epoch", 0)),
            float(getattr(model, "tstep", 0.0)),
            float(getattr(model, "toffset", 0.0)))


def grtrans_run(cfg: GrtransConfig, model=None, verbose=False, chunk=None,
                reuse_geo=False, gdfile=None, device_output=False,
                mesh=None):
    """Run the full render.  Returns (ivals, ab, freqs) numpy arrays with
    ivals shape (ncams, npix, nvals).

    mesh: a jax.sharding.Mesh — the production multi-chip path: the
    camera's pixel arrays (and any reused geodesic bundle) are placed
    with their pixel axis sharded over the mesh's first axis, and XLA
    compiles the whole render as one SPMD program with no forward
    communication (rays are independent; see parallel/sharding.py).
    The image comes back with the same pixel sharding; cross-pixel
    reductions downstream (spectra, gradients) become psums.  Use a
    pixel count divisible by the mesh size.  Incompatible with chunk
    (chunk bounds one chip's memory; a mesh shards instead).

    device_output=True returns ivals as a LIST of per-camera device
    arrays without forcing a host transfer: dispatch is asynchronous,
    so callers can queue several renders and sync once — on tunneled
    backends every synchronous fetch costs a fixed ~36 ms round trip
    (measured, bench.py) that pipelined dispatch amortizes away.

    chunk: render the camera in pixel blocks of this size through ONE
    jitted program (the last block is padded to the same shape) — bounds
    device memory for cameras too large to trace in one shot (e.g.
    1024^2 x 400 samples), at zero recompile cost.

    reuse_geo: trace each mu-camera's geodesics ONCE (a separate jitted
    stage) and feed the bundle to every (time, mdot) render of that
    camera — the reference re-traces per run; for parameter scans
    (pgriter mdot fitting, SEDs over mdot) this skips the whole
    semi-analytic solve after the first frame.  gdfile: persist/restore
    that bundle to disk (the reference's precomputed-geodesic file,
    geodesics.f90:155-187), validated by a content key."""
    a = cfg.spin
    a1, a2, b1, b2 = cfg.gridvals
    nro, nphi, nup = cfg.nn
    freqs = cfg.freqs()
    mdots = cfg.mdots()
    mus = cfg.mus()

    if model is None:
        model = load_fluid_model(cfg.fname, **cfg.fargs)

    freq_list = [float(f) for f in freqs]

    # ONE jitted program per camera: trace + fluid + tetrad + coefficients
    # + IQUV integration all fuse (critical on TPU, where each eager op
    # would otherwise round-trip through the remote compiler)
    import jax
    from functools import partial

    # all mu-cameras share the pixel grid, hence the same observer u0;
    # decide the static sampling-start (uout) question on the host
    _probe = _cached_camera(a, float(mus[0]), a1, a2, b1, b2, nro,
                            nphi, cfg.nrotype, cfg.rcut)
    _use_uout = cfg.uout > _probe.u0 * 1.0001

    _ck = _render_fn_key(cfg, model)
    _cached = _render_cache_get(_ck, model)

    timedep = getattr(model, "timedep", False)
    # slow light (reference nload>1, pgrtrans.f90:177-191): the fluid is a
    # time SERIES and each sample is taken at its own retarded time.  The
    # per-ray camera->trace-start delay (dropped by trace's local t=0
    # convention) is restored via the t0 pre-pass before sampling.
    slow_light = cfg.nload > 1 and getattr(model, "nt_slices", 1) > 1

    def _trace_stage(alpha, beta, l, q2, sm, mu0_v, u0_v):
        if cfg.standard == 2:
            return geokerr.trace_polar(a, mu0_v, alpha, beta, l, q2, sm,
                                       u0_v, npts=1, phi0=cfg.phi0)
        uout = cfg.uout if _use_uout else None
        # prec='mixed' extends to the geodesic stage: f32 point-local
        # math, f64 landmarks + accumulations, and 4x-coarse Weierstrass
        # evaluation with Hermite fill (geokerr.trace docstring)
        mixed = cfg.prec == "mixed"
        # Hermite fill error scales as (coarse/npts)^4 of the trace:
        # only coarsen dense traces (npts >= 256 keeps the whole-image
        # mixed-vs-f64 error at ~1e-4; a 64-point SARIAF render at
        # coarse=4 measured 4.4e-3 against the 2e-3 bar)
        return geokerr.trace(a, mu0_v, alpha, beta, l, q2, sm, u0_v,
                             nup, uout=uout, phi0=cfg.phi0,
                             prec=("mixed" if mixed else "f64"),
                             coarse=(4 if mixed and nup >= 256 else 1))

    def _render_from_geo(geo, alpha, beta, mu0_v, tcur, t0sh, mdot):
        # mdot is a TRACED scalar: an nmdot>1 SED scan (or a pgriter fit)
        # re-uses ONE compiled program for every value (the reference
        # scans mdot inside the hot loop, grtrans_driver.f90:134-157)
        global TRACE_COUNT
        TRACE_COUNT += 1
        sp = _source_params(cfg, mdot)
        if slow_light:
            geo = geo._replace(x=geo.x.at[..., 0].add(-t0sh[:, None]))
        # mixed precision: fluid sampling (table gathers + local frame
        # algebra) runs in f32; the geodesic bundle itself stays f64
        if cfg.prec == "mixed":
            xs = geo.x.astype(jnp.float32)
            ks = geo.k.astype(jnp.float32)
        else:
            xs, ks = geo.x, geo.k
        if timedep or slow_light:
            fv = model.vals(xs, ks, a, time=tcur)
        else:
            fv = model.vals(xs, ks, a)
        ei = model.convert(fv, sp)
        return driver.render_rays(geo, fv, ei, cfg.ename, freq_list,
                                  mu0_v, alpha, beta, a, cfg.mbh, sp,
                                  iname=cfg.iname, nvals=cfg.nvals,
                                  standard=cfg.standard, extra=cfg.extra,
                                  prec=cfg.prec)

    @jax.jit
    def _render_camera(alpha, beta, l, q2, sm, mu0_v, u0_v, tcur, t0sh,
                       mdot):
        geo = _trace_stage(alpha, beta, l, q2, sm, mu0_v, u0_v)
        return _render_from_geo(geo, alpha, beta, mu0_v, tcur, t0sh, mdot)

    _trace_jit = jax.jit(_trace_stage)
    _render_geo_jit = jax.jit(_render_from_geo)

    if _cached is not None:
        _render_camera, _trace_jit, _render_geo_jit = _cached[1:4]
    else:
        _render_cache_put(_ck, model,
                          (_render_camera, _trace_jit, _render_geo_jit))

    if mesh is not None:
        if chunk is not None:
            raise ValueError("mesh= and chunk= are mutually exclusive: "
                             "a mesh shards the pixel axis; chunking "
                             "bounds one chip's memory")
        from jax.sharding import NamedSharding, PartitionSpec as _P
        _pix_sh = NamedSharding(mesh, _P(mesh.axis_names[0]))

        def _put(x):
            return jax.device_put(jnp.asarray(x), _pix_sh)
    else:
        def _put(x):
            return x

    ivals_all = []
    ab = None
    t0 = time.time()
    for mu0 in mus:
        cam = _cached_camera(a, float(mu0), a1, a2, b1, b2, nro, nphi,
                             cfg.nrotype, cfg.rcut)
        # i1/i2 pixel subrange (1-based inclusive, read_inputs.f90:22-23:
        # debugging / by-hand range restarts)
        if cfg.i1 > 0 or cfg.i2 > 0:
            lo = max(cfg.i1 - 1, 0) if cfg.i1 > 0 else 0
            hi = cfg.i2 if cfg.i2 > 0 else cam.alpha.shape[0]
            cam = cam._replace(alpha=cam.alpha[lo:hi],
                               beta=cam.beta[lo:hi], l=cam.l[lo:hi],
                               q2=cam.q2[lo:hi], sm=cam.sm[lo:hi])
        if mesh is not None:
            cam = cam._replace(alpha=_put(cam.alpha), beta=_put(cam.beta),
                               l=_put(cam.l), q2=_put(cam.q2),
                               sm=_put(cam.sm))
        if ab is None:
            ab = np.stack([np.asarray(cam.alpha), np.asarray(cam.beta)],
                          axis=0)
        # camera ordering: freq fastest, then mdot, then time, then mu
        # (pgrtrans.f90:198-211 loop nesting)
        # slow-light t0 pre-pass: relative camera->trace-start delay
        # (reference normalization: pgrtrans.f90:184-190).  Without
        # uout the trace starts at the camera and t is already global.
        if slow_light and _use_uout:
            t0sh = geokerr.camera_delay(a, float(mu0), cam.alpha,
                                        cam.beta, cam.l, cam.q2, cam.sm,
                                        cam.u0, cfg.uout)
            t0sh = t0sh - jnp.min(t0sh)
        else:
            t0sh = jnp.zeros_like(cam.l)
        t0sh = _put(t0sh)
        npix = cam.alpha.shape[0]
        chunked = chunk is not None and chunk < npix

        def _blk(x, lo2, hi2, csz):
            """Pixel block [lo2:hi2) padded (by edge replication) to csz."""
            b = x[lo2:hi2]
            pad = csz - (hi2 - lo2)
            if pad:
                b = jnp.concatenate(
                    [b, jnp.broadcast_to(b[-1:], (pad,) + b.shape[1:])])
            return b

        geo = None
        if reuse_geo or gdfile is not None:
            if gdfile is not None:
                from grtrans_tpu.geodesics import cache as geo_cache
                key = geo_cache.bundle_key(
                    a, float(mu0), nup, cfg.uout if _use_uout else None,
                    cfg.phi0, cfg.standard, cfg.gridvals, nro, nphi,
                    cfg.nrotype, cfg.rcut, i1=cfg.i1, i2=cfg.i2)
                path = (gdfile if len(mus) == 1
                        else f"{gdfile}.mu{float(mu0):.6f}")
                geo = geo_cache.load_bundle(path, key=key)
                if geo is not None and geo.x.shape[0] != npix:
                    geo = None          # stale bundle from another camera
            if geo is None:
                if chunked:
                    # chunk the trace too: device memory stays bounded by
                    # the chunk size, bundle assembled on the host.
                    # PIPELINED with a depth-2 window: chunk i+1 is
                    # dispatched before chunk i is fetched, so the
                    # device computes while the host pulls the previous
                    # bundle over the tunnel (a synchronous
                    # dispatch->fetch->dispatch loop leaves the device
                    # idle for the whole fetch; bundles are the LARGE
                    # fetch — x,k,lam,tpm,tpr at npts points/pixel).
                    # Window depth 2 bounds device memory at two chunk
                    # bundles + working set.
                    parts = []
                    inflight = []

                    def _drain_trace():
                        g, n = inflight.pop(0)
                        parts.append(jax.tree_util.tree_map(
                            lambda x: np.asarray(x)[:n], g))

                    for lo2 in range(0, npix, chunk):
                        hi2 = min(lo2 + chunk, npix)
                        g = _trace_jit(_blk(cam.alpha, lo2, hi2, chunk),
                                       _blk(cam.beta, lo2, hi2, chunk),
                                       _blk(cam.l, lo2, hi2, chunk),
                                       _blk(cam.q2, lo2, hi2, chunk),
                                       _blk(cam.sm, lo2, hi2, chunk),
                                       float(mu0), cam.u0)
                        inflight.append((g, hi2 - lo2))
                        if len(inflight) > 1:
                            _drain_trace()
                    while inflight:
                        _drain_trace()
                    geo = jax.tree_util.tree_map(
                        lambda *xs: np.concatenate(xs, axis=0), *parts)
                else:
                    geo = jax.tree_util.tree_map(
                        np.asarray,
                        _trace_jit(cam.alpha, cam.beta, cam.l, cam.q2,
                                   cam.sm, float(mu0), cam.u0))
                if gdfile is not None:
                    geo_cache.save_bundle(path, geo, key=key)
            if mesh is not None:
                # bundle leaves are all (npix, ...) — shard pixel axis
                geo = jax.tree_util.tree_map(_put, geo)
        for it in range(cfg.nt):
            tcur = it * cfg.dt
            for im in range(len(mdots)):
                md = float(mdots[im])
                if geo is not None and not chunked:
                    iv = _render_geo_jit(geo, cam.alpha, cam.beta,
                                         float(mu0), tcur, t0sh, md)
                    ivals_all.append(iv if device_output
                                     else np.asarray(iv))
                elif not chunked:
                    iv = _render_camera(cam.alpha, cam.beta, cam.l,
                                        cam.q2, cam.sm, float(mu0),
                                        cam.u0, tcur, t0sh, md)
                    ivals_all.append(iv if device_output
                                     else np.asarray(iv))
                else:
                    # PIPELINED chunked render: dispatch EVERY chunk
                    # first (jax dispatch is asynchronous), fetch after.
                    # The per-chunk IQUV output is small (npix_chunk x
                    # nvals), so keeping all chunk outputs on device
                    # until the final assembly costs one image worth of
                    # HBM while removing the per-chunk idle bubble —
                    # the synchronous loop paid dispatch-RT + fetch +
                    # host assembly with the device stalled (measured
                    # 3.8x per-ray at 1024^2, artifacts/
                    # AT_SCALE_PROFILE.json attributes it).
                    parts = []
                    for lo2 in range(0, npix, chunk):
                        hi2 = min(lo2 + chunk, npix)
                        if geo is not None:
                            # feed the saved bundle's pixel block — no
                            # re-trace per (time, mdot)
                            gblk = jax.tree_util.tree_map(
                                lambda x: _blk(x, lo2, hi2, chunk), geo)
                            iv = _render_geo_jit(
                                gblk, _blk(cam.alpha, lo2, hi2, chunk),
                                _blk(cam.beta, lo2, hi2, chunk),
                                float(mu0), tcur,
                                _blk(t0sh, lo2, hi2, chunk), md)
                        else:
                            iv = _render_camera(
                                _blk(cam.alpha, lo2, hi2, chunk),
                                _blk(cam.beta, lo2, hi2, chunk),
                                _blk(cam.l, lo2, hi2, chunk),
                                _blk(cam.q2, lo2, hi2, chunk),
                                _blk(cam.sm, lo2, hi2, chunk),
                                float(mu0), cam.u0, tcur,
                                _blk(t0sh, lo2, hi2, chunk), md)
                        parts.append((iv, hi2 - lo2))
                    if device_output:
                        # stay on device (documented contract): one
                        # device-side concat, still not fetched
                        ivals_all.append(jnp.concatenate(
                            [iv[:, :n] for iv, n in parts], axis=1))
                    else:
                        ivals_all.append(np.concatenate(
                            [np.asarray(iv)[:, :n] for iv, n in parts],
                            axis=1))
    if verbose:
        print(f"grtrans_run: {time.time() - t0:.2f} s")
    if device_output:
        # list of per-(camera) device arrays, NOT fetched: callers sync
        return ivals_all, ab, np.asarray(freqs)
    ivals = np.concatenate(ivals_all, axis=0)  # (ncams, npix, nvals)
    return ivals, ab, np.asarray(freqs)
