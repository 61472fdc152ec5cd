"""Data generators: arg specs → concrete values.

Counterpart of the reference's ``lib/data.py`` + ``lib/pytorch/data_impl.py``
(``materialize_arg`` :33-128, ``PyTorch:DefaultDataGenerator`` :131).
Supported spec types: tensor, float/double, int/long, bool, str, none,
genericlist, tuple, device.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Dict, Tuple, Type

import jax
import jax.numpy as jnp
import numpy as np

from param_tpu.utils.dtypes import dtype_from_name


def materialize_arg(spec: Dict[str, Any], rng: np.random.Generator):
    """(reference: data_impl.materialize_arg:33-128)"""
    t = spec["type"]
    if t == "tensor":
        dtype = dtype_from_name(spec.get("dtype", "float32"))
        shape = tuple(spec.get("shape", []))
        if np.issubdtype(np.dtype(dtype), np.integer):
            lo, hi = spec.get("low", 0), spec.get("high", 64)
            arr = rng.integers(lo, hi, size=shape)
        elif np.dtype(dtype) == np.bool_:
            arr = rng.integers(0, 2, size=shape).astype(bool)
        else:
            arr = rng.random(size=shape)
        return jnp.asarray(arr).astype(dtype)
    if t in ("float", "double"):
        return float(spec.get("value", 0.0))
    if t in ("int", "long"):
        return int(spec.get("value", 0))
    if t == "bool":
        return bool(spec.get("value", False))
    if t == "str":
        return str(spec.get("value", ""))
    if t == "none":
        return None
    if t == "device":
        return spec.get("value", "tpu")
    if t == "genericlist":
        return [materialize_arg(s, rng) for s in spec.get("value", [])]
    if t == "tuple":
        return tuple(materialize_arg(s, rng) for s in spec.get("value", []))
    raise ValueError(f"unsupported arg type {t!r}")


class DataGenerator(ABC):
    """(reference: lib/data.py DataGenerator)"""

    @abstractmethod
    def get_data(self, config: Dict[str, Any], seed: int = 0) -> Tuple[list, dict]:
        ...


class DefaultDataGenerator(DataGenerator):
    """(reference: PyTorch:DefaultDataGenerator, data_impl.py:131)"""

    def get_data(self, config: Dict[str, Any], seed: int = 0):
        rng = np.random.default_rng(seed)
        args = [materialize_arg(a, rng) for a in config.get("args", [])]
        kwargs = {
            k: materialize_arg(v, rng) for k, v in config.get("kwargs", {}).items()
        }
        return args, kwargs


_GENERATORS: Dict[str, Type[DataGenerator]] = {}


def register_data_generator(name: str, cls: Type[DataGenerator]) -> None:
    """(reference: lib/data.py:27)"""
    _GENERATORS[name] = cls


def get_data_generator(name: str) -> Type[DataGenerator]:
    return _GENERATORS[name]


register_data_generator("DefaultDataGenerator", DefaultDataGenerator)
# accept the reference's generator name so reference configs load unchanged
register_data_generator("PyTorch:DefaultDataGenerator", DefaultDataGenerator)
register_data_generator("JAX:DefaultDataGenerator", DefaultDataGenerator)
