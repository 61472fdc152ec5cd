"""Dtype name map for benchmark CLIs.

TPU-native counterpart of the reference's 17-entry dtype map
(``comms_utils.py:965-982``); torch dtypes are replaced by jnp dtypes, with
fp8 mapped to the TPU-supported e4m3/e5m2 variants.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

DTYPE_MAP = {
    "float32": jnp.float32,
    "float": jnp.float32,
    "float16": jnp.float16,
    "half": jnp.float16,
    "bfloat16": jnp.bfloat16,
    "float64": jnp.float64,
    "double": jnp.float64,
    "int8": jnp.int8,
    "uint8": jnp.uint8,
    "int16": jnp.int16,
    "int32": jnp.int32,
    "int": jnp.int32,
    "int64": jnp.int64,
    "long": jnp.int64,
    "bool": jnp.bool_,
    "byte": jnp.uint8,
    "char": jnp.int8,
    "float8_e4m3": jnp.float8_e4m3fn,
    "float8_e5m2": jnp.float8_e5m2,
}

# Dtypes a reduction collective (all_reduce/reduce/reduce_scatter) supports.
REDUCE_DTYPES = {
    "float32",
    "float",
    "float16",
    "half",
    "bfloat16",
    "float64",
    "double",
    "int8",
    "int16",
    "int32",
    "int",
    "int64",
    "long",
}


def dtype_from_name(name: str):
    try:
        return DTYPE_MAP[name]
    except KeyError:
        raise ValueError(
            f"unsupported dtype {name!r}; supported: {sorted(DTYPE_MAP)}"
        ) from None


def dtype_size(dtype) -> int:
    """Element size in bytes."""
    return np.dtype(dtype).itemsize
