from grtrans_tpu.geometry import kerr, fourvector, tetrad
