from param_tpu.trace.comms_trace import CommsOp, parse_trace, to_comm_name  # noqa: F401
from param_tpu.trace.replay import CommsReplay, ReplayParams  # noqa: F401
