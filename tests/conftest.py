"""Test config: simulate an 8-device mesh on CPU.

The reference can only mock multi-rank behavior (MockBackendFunction,
train/comms/pt/tests/mocks/backend_mock.py); we run collective logic on a
REAL 8-device mesh via XLA's host-platform device partitioning
(SURVEY.md §4 'implication for the TPU build').
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def backend():
    from param_tpu.backend import TpuBackend

    b = TpuBackend()
    b.initialize()
    assert b.get_world_size() == 8
    return b
