from grtrans_tpu.emis import polsynch, bb, framework
