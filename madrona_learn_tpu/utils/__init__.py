from .math import symlog, symexp, convert_float_leaves, TypedShape
from .profile import profile
from .aot import aot_compile, cfg_jax_mem
