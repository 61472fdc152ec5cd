from param_tpu.ops.matmul import matmul, matmul_pallas, gemm_flops  # noqa: F401
from param_tpu.ops.embedding import (  # noqa: F401
    embedding_bag,
    embedding_bag_pallas,
    embedding_bytes,
)
