from grtrans_tpu.io import binio, fitsio
