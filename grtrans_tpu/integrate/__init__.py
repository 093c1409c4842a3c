from grtrans_tpu.integrate.solvers import (
    integrate, formal_solve, delo_solve, quadrature_solve, opacity_matrix)
