"""Inverse rendering: fit physical parameters to a target IQUV image by
gradient descent THROUGH the full renderer.

This is the framework's flagship new capability over the reference
Fortran (BASELINE.json configs[4]): the whole pipeline — semi-analytic
Kerr geodesics, fluid sampling, comoving tetrad, synchrotron
coefficients, polarized Stokes transfer — is differentiable, so black
hole spin, observer inclination and plasma parameters can be recovered
from an observed polarized image with jax.grad + any first-order
optimizer.  The reference (grtrans) can only forward-model; fitting
requires externally-driven finite differences over full renders
(pgriter.f90 does 1-D secant iteration on mdot only).

Design: the loss closes over a STATIC camera pixel grid (alpha, beta);
the constants of motion (l, q2) are recomputed INSIDE the loss from the
traced spin/inclination so gradients flow through the photon initial
conditions as well as the Kerr geometry (geodesics/geokerr.py) and the
emission physics.  Optimization state is optax Adam; parameters are
fitted in transformed coordinates (log for positive scale parameters,
atanh for bounded spin/cos-inclination) so the optimizer is
unconstrained.
"""

from dataclasses import dataclass, field
from typing import Callable, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from grtrans_tpu.geodesics import camera as cam_mod
from grtrans_tpu.geodesics import geokerr
from grtrans_tpu import driver
from grtrans_tpu.fluid.base import load_fluid_model, SourceParams


@dataclass
class InverseProblem:
    """A differentiable forward model + target image.

    fname/ename/iname/freq/mbh/nn/gridvals: render configuration (the
    camera grid is built once from gridvals at spin=amax for pixel
    layout; alpha/beta are spin-independent impact parameters).
    fit: subset of {"spin", "mu0", and any float model kwargs}.
    fixed: values for everything not fitted."""
    fname: str = "SARIAF"
    ename: str = "POLSYNCHTH"
    iname: str = "formal"
    freq: float = 2.3e11
    mbh: float = 4e6
    nn: tuple = (8, 8, 32)
    gridvals: tuple = (-12.0, 12.0, -12.0, 12.0)
    nvals: int = 4
    prec: str = "f64"
    fixed: Dict[str, float] = field(default_factory=dict)

    def __post_init__(self):
        nro, nphi, self.npts = self.nn
        a1, a2, b1, b2 = self.gridvals
        # pixel grid only — l/q2 are recomputed from (spin, mu0) in the
        # loss (camera.make_camera's l/q2 would freeze the gradient)
        cam = cam_mod.make_camera(0.5, 0.5, a1, a2, b1, b2, nro, nphi)
        self.alpha = cam.alpha
        self.beta = cam.beta
        self.u0 = cam.u0
        self.sm = cam.sm
        self._static_model = None  # cache for geometry-only fits

    def render(self, params: Dict[str, jnp.ndarray], pix=None):
        """Differentiable forward model: params -> (npix, nvals) image.

        pix: optional (lo, hi) static pixel slice — gradient
        accumulation over camera chunks (rays are independent, so
        parameter gradients simply add across chunks; this is how a
        flagship-sized fwd+bwd fits HBM, scripts/fwdbwd_bench.py).

        Stages are wrapped in jax.checkpoint: reverse-mode otherwise
        stores every (npix, npts) intermediate of all stages at once
        (measured 47 GB at 100x100x400 — OOM on one chip); with
        per-stage remat the backward holds one stage's residuals at a
        time and recomputes the forward, a ~1.3x FLOP cost on a
        pipeline this gather/elementwise-bound."""
        p = dict(self.fixed)
        p.update(params)
        a = jnp.clip(jnp.asarray(p.pop("spin")), -0.998, 0.998)
        mu0 = jnp.clip(jnp.asarray(p.pop("mu0")), 0.01, 0.99)
        if set(params) <= {"spin", "mu0"}:
            # geometry-only fit: the fluid model does not depend on any
            # traced parameter, so build it ONCE eagerly and reuse.
            # This is required for GRMHD snapshot models, whose
            # load-time transforms (file parsing, numpy coordinate
            # tables) are not traceable, and it keeps the dump arrays
            # as closure constants instead of re-staging the load chain
            # into every jit trace.
            if self._static_model is None:
                # ensure_compile_time_eval: the first render call is
                # usually already under a jit trace; the load must run
                # eagerly regardless.
                with jax.ensure_compile_time_eval():
                    self._static_model = load_fluid_model(self.fname,
                                                          **p)
            model = self._static_model
        else:
            model = load_fluid_model(self.fname, **p)
        alpha, beta, sm = self.alpha, self.beta, self.sm
        if pix is not None:
            lo, hi = pix
            alpha, beta, sm = alpha[lo:hi], beta[lo:hi], sm[lo:hi]
        l = -alpha * jnp.sqrt(1.0 - mu0 * mu0)
        q2 = beta ** 2 + (alpha ** 2 - a * a) * mu0 * mu0
        ck = jax.checkpoint
        geo = ck(lambda aa, m0, ll, qq: geokerr.trace(
            aa, m0, alpha, beta, ll, qq, sm, self.u0, self.npts,
            prec=self.prec,
            coarse=4 if self.prec == "mixed" else 1))(a, mu0, l, q2)
        fv = ck(lambda x, k, aa: model.vals(x, k, aa))(geo.x, geo.k, a)
        sp = SourceParams(mbh=self.mbh)
        ei = model.convert(fv, sp)
        iv = ck(lambda geo_, fv_, ei_, m0, aa: driver.render_rays(
            geo_, fv_, ei_, self.ename, [self.freq], m0, alpha, beta,
            aa, self.mbh, sp, iname=self.iname, nvals=self.nvals,
            prec=self.prec))(geo, fv, ei, mu0, a)
        return iv[0]


# parameter transforms: optimizer works unconstrained
_POS = ("n0", "t0", "nfac", "n0spot", "r0spot")  # positive scales -> log


def _to_opt(params):
    out = {}
    for k, v in params.items():
        v = jnp.asarray(v, dtype=jnp.float64)
        if k == "spin":
            out[k] = jnp.arctanh(v / 0.999)
        elif k == "mu0":
            out[k] = jnp.arctanh(2.0 * v - 1.0)
        elif k in _POS:
            out[k] = jnp.log(v)
        else:
            out[k] = v
    return out


def _from_opt(z):
    out = {}
    for k, v in z.items():
        if k == "spin":
            out[k] = 0.999 * jnp.tanh(v)
        elif k == "mu0":
            out[k] = 0.5 * (jnp.tanh(v) + 1.0)
        elif k in _POS:
            out[k] = jnp.exp(v)
        else:
            out[k] = v
    return out


def fit_image(problem: InverseProblem, target, init: Dict[str, float],
              steps: int = 100, lr: float = 0.1, lr_end: float = None,
              callback: Optional[Callable] = None):
    """Gradient-descent fit of `init`'s parameters to `target` (an
    (npix, nvals) IQUV image rendered by the same forward model).

    Returns (best_params, losses): best_params maps each fitted name to
    a float; losses is the per-step loss history.  Loss: relative L2 on
    Stokes I plus the polarized channels weighted by the I scale (QUV
    are signed and can vanish — normalizing each by its own scale would
    blow up noise)."""
    import optax

    target = jnp.asarray(target)
    iscale = jnp.maximum(jnp.max(jnp.abs(target[..., 0])), 1e-37)

    def loss_fn(z):
        img = problem.render(_from_opt(z))
        r = (img - target) / iscale
        return jnp.mean(r * r)

    vg = jax.jit(jax.value_and_grad(loss_fn))
    # optionally cosine-decayed Adam (constant rate by default: the
    # spin landscape is rough enough that aggressive early rates can
    # overshoot into the arctanh boundary)
    sched = lr if lr_end is None else \
        optax.cosine_decay_schedule(lr, steps, alpha=lr_end / lr)
    opt = optax.adam(sched)
    z = _to_opt(init)
    state = opt.init(z)
    best = (np.inf, z)
    losses = []
    for i in range(steps):
        val, g = vg(z)
        val = float(val)
        losses.append(val)
        if val < best[0]:
            best = (val, z)
        if callback is not None:
            callback(i, val, _from_opt(z))
        # a step that lands on a pathological render (spin at the
        # arctanh boundary) must not poison the whole fit
        g = jax.tree_util.tree_map(
            lambda u: jnp.nan_to_num(u, nan=0.0, posinf=0.0,
                                     neginf=0.0), g)
        updates, state = opt.update(g, state)
        z = optax.apply_updates(z, updates)
        # keep the atanh-transformed (bounded) parameters off the
        # boundary; log-space scale parameters are unbounded
        z = {k: (jnp.clip(v, -6.0, 6.0) if k in ("spin", "mu0") else v)
             for k, v in z.items()}
    out = {k: float(v) for k, v in _from_opt(best[1]).items()}
    return out, losses
