from param_tpu.ops.matmul import (  # noqa: F401
    gemm_flops,
    matmul,
    matmul_pallas,
    matmul_weight_resident,
)
from param_tpu.ops.embedding import (  # noqa: F401
    embedding_bag,
    embedding_bag_pallas,
    embedding_bytes,
)
