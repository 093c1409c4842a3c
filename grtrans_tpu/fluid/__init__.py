from grtrans_tpu.fluid import base
from grtrans_tpu.fluid.base import (FluidVars, SourceParams, load_fluid_model,
                                    get_fluid_vars, convert_fluid_vars)
