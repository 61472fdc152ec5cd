from param_tpu.utils.sizes import (  # noqa: F401
    parse_size,
    format_size,
    size_sweep,
    fix_begin_size,
)
from param_tpu.utils.bw import alg_bw, bus_bw, bus_bw_factor  # noqa: F401
from param_tpu.utils.dtypes import DTYPE_MAP, dtype_from_name, dtype_size  # noqa: F401
from param_tpu.utils.timer import ParamTimer, param_profile  # noqa: F401
