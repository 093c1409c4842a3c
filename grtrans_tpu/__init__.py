"""grtrans_tpu — TPU-native polarized general-relativistic radiative transfer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
jadexter/grtrans (Dexter 2016): semi-analytic Kerr null geodesics,
polarized synchrotron/bremsstrahlung/blackbody emissivities, Stokes IQUV
radiative transfer, and a zoo of analytic + GRMHD fluid models — all as
pure, differentiable, batched array programs that shard over TPU meshes.

Design (vs the reference's Fortran/OpenMP):
  * every per-ray quantity carries a leading pixel batch axis; the OpenMP
    pixel loop (reference pgrtrans.f90:198-209) becomes sharded vmap
  * geodesics are closed-form in Mino time (Weierstrass/Carlson), evaluated
    independently per (pixel, point) — no sequential integration
  * the transfer equation is integrated with an associative-scan matricant
    (reference radtrans_integrate.f90 iflag=1/2 methods) or fused Pallas
    kernels
  * float64 is enabled globally (the reference is real(kind=8) throughout);
    downstream stages may downcast explicitly.
"""

import os as _os

import jax as _jax

# float64 by default (the reference is real(8) throughout); set
# GRTRANS_X64=0 to run the whole pipeline in float32 (TPU fast path)
if _os.environ.get("GRTRANS_X64", "1") != "0":
    _jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: TPU compiles in this environment go
# through a remote AOT helper and are expensive (minutes); cache them.
_cache_dir = _os.environ.get("GRTRANS_TPU_CACHE",
                             _os.path.expanduser("~/.cache/grtrans_tpu_xla"))
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:  # pragma: no cover - cache is best-effort
    pass

__version__ = "0.1.0"

from grtrans_tpu import constants  # noqa: E402,F401
