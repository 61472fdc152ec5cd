from param_tpu.comms.timing import TimingMode, measure_dispatch, measure_graph  # noqa: F401
from param_tpu.comms.harness import CommsBench, CommsParams  # noqa: F401
