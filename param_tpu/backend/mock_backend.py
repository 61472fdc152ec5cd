"""Mock backend for harness-logic unit tests.

Counterpart of the reference's ``tests/mocks/backend_mock.py:4-133``
(``MockBackendFunction``): a no-op collective table with a configurable
world size, so benchmark control flow can be tested without devices.  Note
that unlike the reference, most of our multi-device logic is *really* tested
on a simulated 8-device CPU mesh (tests/conftest.py); the mock remains for
pure control-flow tests.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from param_tpu.backend.base import (
    Backend,
    CollectiveArgs,
    CommGroup,
    SUPPORTED_COLLECTIVES,
    register_backend,
)


class MockBackend(Backend):
    def __init__(self, world_size: int = 1, rank: int = 0):
        super().__init__()
        self.world_size = world_size
        self.rank = rank
        self._default_group = CommGroup(
            devices=list(range(world_size)), mesh=None, axis="rank", pg_id=0, name="mock"
        )
        self._groups = [self._default_group]
        self.calls: List[tuple] = []  # (collective_name, args) log for asserts
        for name in SUPPORTED_COLLECTIVES + ["noop"]:
            self.collective_fn[name] = self._make_mock(name)
        self.compute_fn = {
            "gemm": lambda a, b: a @ b,
            "add": lambda a, b: a + b,
            "sub": lambda a, b: a - b,
            "copy": lambda a: a.copy(),
        }

    def _make_mock(self, name):
        def mock_collective(args: CollectiveArgs):
            self.calls.append((name, args))
            return args.in_tensor

        return mock_collective

    def initialize(self) -> None:
        pass

    def get_local_rank(self) -> int:
        return self.rank

    def get_global_rank(self) -> int:
        return self.rank

    def get_world_size(self) -> int:
        return self.world_size

    def get_device(self):
        return "mock"

    def get_default_group(self) -> CommGroup:
        return self._default_group

    def get_groups(self) -> List[CommGroup]:
        return list(self._groups)

    def new_group(self, ranks: Sequence[int], pg_id: int = 0) -> CommGroup:
        g = CommGroup(
            devices=list(ranks), mesh=None, axis="rank", pg_id=pg_id, name=f"mock{pg_id}"
        )
        self._groups.append(g)
        return g

    def alloc_random(self, local_shape, dtype, group=None, seed=0):
        return np.ones(local_shape, dtype=np.dtype(dtype))

    def alloc_ones(self, local_shape, dtype, group=None, scale=1.0):
        return np.full(local_shape, scale, dtype=np.dtype(dtype))

    def alloc_empty(self, local_shape, dtype, group=None):
        return np.zeros(local_shape, dtype=np.dtype(dtype))

    def local_shards(self, tensor, group=None):
        return [np.asarray(tensor)]

    def complete_ops(self) -> None:
        self._pending.clear()
        self._pending_by_id.clear()

    def barrier(self, group: Optional[CommGroup] = None) -> None:
        pass


register_backend("mock", MockBackend)
