from grtrans_tpu.geodesics import camera, geokerr
from grtrans_tpu.geodesics.geokerr import trace, trace_polar, GeodesicBundle
