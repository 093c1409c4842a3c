"""Geodesic bundle save/load (the reference's precomputed-geodesic file
path, geodesics.f90:155-187 load_geodesic / README "geodesics can be
precomputed and read from file").

TPU-native form: the whole camera's GeodesicBundle is a pytree of
arrays; persist it as one .npz keyed by the camera/trace parameters so
a cache hit is guaranteed to be geometrically identical.  Reusing a
bundle skips the semi-analytic trace entirely — useful for mdot/freq
parameter scans and time series over a static camera (the reference
re-traces every OpenMP pixel each run; here one file restores the full
bundle in one read)."""

import hashlib
import json
import os

import numpy as np

from grtrans_tpu.geodesics.geokerr import GeodesicBundle


def bundle_key(a, mu0, npts, uout, phi0, standard, gridvals, nro, nphi,
               nrotype=0, rcut=1.0, i1=0, i2=0):
    """Deterministic content key for a traced camera bundle.  i1/i2 is
    the pixel subrange (read_inputs.f90:22-23): two equal-length but
    different subranges must NOT key-match each other."""
    blob = json.dumps([float(a), float(mu0), int(npts),
                       None if uout is None else float(uout), float(phi0),
                       int(standard), [float(g) for g in gridvals],
                       int(nro), int(nphi), int(nrotype), float(rcut),
                       int(i1), int(i2)])
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def save_bundle(path, geo: GeodesicBundle, key=None):
    """Write a GeodesicBundle (plus its content key) to `path` (.npz).

    Atomic: writes to a temp file in the same directory and os.replace()s
    it into place, so an interrupted or concurrent run can never leave a
    truncated file that a later load would crash on."""
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arrays = {f: np.asarray(getattr(geo, f)) for f in geo._fields}
    if key is not None:
        arrays["_key"] = np.frombuffer(bytes.fromhex(key), dtype=np.uint8)
    # np.savez appends .npz to names lacking it — keep the suffix so the
    # temp name is exactly what gets written
    tmp = path + f".tmp{os.getpid()}.npz"
    try:
        np.savez_compressed(tmp, **arrays)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def load_bundle(path, key=None):
    """Read a GeodesicBundle from `path`; returns None when the file is
    absent, corrupt, or was written for different camera/trace
    parameters (callers fall back to a fresh trace)."""
    if not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            if key is not None:
                stored = z["_key"].tobytes().hex() if "_key" in z else None
                if stored != key:
                    return None
            return GeodesicBundle(**{f: z[f] for f in GeodesicBundle._fields})
    except Exception:
        return None
