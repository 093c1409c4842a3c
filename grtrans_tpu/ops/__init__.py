from grtrans_tpu.ops import elliptic, polyroots, weierstrass, interp, bessel
