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

import jax as _jax

_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from grtrans_tpu import constants  # noqa: E402,F401
