from param_tpu.backend.base import (  # noqa: F401
    Backend,
    CollectiveArgs,
    CommGroup,
    SUPPORTED_COLLECTIVES,
    SUPPORTED_P2P_OPS,
    PT2PT_PATTERNS,
    register_backend,
    get_backend_cls,
    list_backends,
)
from param_tpu.backend.tpu_backend import TpuBackend  # noqa: F401
from param_tpu.backend.mock_backend import MockBackend  # noqa: F401
from param_tpu.backend.torchcomms import (  # noqa: F401
    ReduceOp,
    TorchComm,
    TorchcommsBackend,
    new_comm,
)
