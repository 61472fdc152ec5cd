"""Analytic matmul perf model + autotuner (ops/matmul_tune.py).

Reference parity: triton_matmul.py autotune + matmul_perf_model.py
estimate_matmul_time pruning.
"""

import numpy as np
import pytest

from param_tpu.ops.matmul_tune import (
    BlockCandidate,
    candidate_blocks,
    estimate_matmul_time_us,
    tune_matmul,
    vmem_bytes,
)
from param_tpu.utils.chip import CHIPS

V5E = CHIPS["v5e"]


class TestModel:
    def test_compute_bound_large(self):
        """4096³ bf16 is compute-bound: estimate near 2MNK/peak."""
        est = estimate_matmul_time_us(4096, 4096, 4096, 1024, 1024, 1024,
                                      dtsize=2, chip=V5E)
        ideal = 2 * 4096**3 / (V5E.bf16_tflops * 1e12) * 1e6
        assert ideal <= est <= 2.5 * ideal

    def test_memory_bound_skinny(self):
        """128×4096×4096: HBM traffic dominates; estimate >= load time."""
        est = estimate_matmul_time_us(128, 4096, 4096, 128, 512, 512,
                                      dtsize=2, chip=V5E)
        loads = (128 * 4096) * (4096 // 512) + (4096 * 4096) * 1
        load_us = loads * 2 / (V5E.hbm_gbs * 1e9) * 1e6
        assert est >= load_us

    def test_small_blocks_penalized(self):
        fast = estimate_matmul_time_us(4096, 4096, 4096, 1024, 1024, 512,
                                       dtsize=2, chip=V5E)
        slow = estimate_matmul_time_us(4096, 4096, 4096, 256, 256, 512,
                                       dtsize=2, chip=V5E)
        assert slow > fast  # narrow tiles under-fill the MXU + reload more


class TestCandidates:
    def test_respects_vmem_budget(self):
        cands = candidate_blocks(4096, 4096, 4096, dtsize=2, chip=V5E,
                                 vmem_limit_mb=16, top=50)
        assert cands
        for c in cands:
            assert vmem_bytes(c.bm, c.bn, c.bk, 2) <= 16 * 2**20

    def test_divisibility(self):
        cands = candidate_blocks(2048, 1024, 4096, dtsize=2, chip=V5E)
        for c in cands:
            assert 2048 % c.bm == 0 and 1024 % c.bn == 0 and 4096 % c.bk == 0

    def test_ranked_by_estimate(self):
        cands = candidate_blocks(4096, 4096, 4096, dtsize=2, chip=V5E, top=10)
        ests = [c.est_us for c in cands]
        assert ests == sorted(ests)

    @pytest.mark.parametrize("shape", [
        (256, 256, 256),      # grid too small for the >=8-steps filter
        (1024, 128, 1024),    # dim below the old minimum extent
        (1920, 1920, 1920),   # indivisible by 256-multiples (128 works)
        (100, 100, 100),      # smaller than any standard extent
    ])
    def test_never_empty_for_valid_shapes(self, shape):
        """Shapes matmul_pallas handles must always yield candidates (code
        review r2: the tuner previously raised 'no feasible blocks')."""
        m, n, k = shape
        cands = candidate_blocks(m, n, k, dtsize=2, chip=V5E)
        assert cands
        for c in cands:
            assert m % c.bm == 0 and n % c.bn == 0 and k % c.bk == 0

    def test_bigger_vmem_admits_bigger_blocks(self):
        small = candidate_blocks(4096, 4096, 4096, 2, V5E,
                                 vmem_limit_mb=16, top=50)
        big = candidate_blocks(4096, 4096, 4096, 2, V5E,
                               vmem_limit_mb=100, top=50)
        max_small = max(c.bm * c.bn * c.bk for c in small)
        max_big = max(c.bm * c.bn * c.bk for c in big)
        assert max_big > max_small


class TestTune:
    def test_tune_tiny_on_mesh(self):
        """End-to-end tune on small shapes (interpret-mode pallas on CPU):
        returns a feasible winner with per-candidate medians."""
        import jax.numpy as jnp

        a = jnp.asarray(np.random.default_rng(0).random((512, 512),
                                                        dtype=np.float32))
        b = jnp.asarray(np.random.default_rng(1).random((512, 512),
                                                        dtype=np.float32))
        best, medians = tune_matmul(
            a, b, candidates=[(256, 256, 256), (512, 512, 512)],
            reps=1, n_hi=2, max_n=2)
        assert best in medians and len(medians) == 2
        assert all(v > 0 for v in medians.values())

    def test_no_feasible_blocks_raises(self):
        import jax.numpy as jnp

        a = jnp.ones((100, 100))  # indivisible by any MXU extent
        b = jnp.ones((100, 100))
        with pytest.raises(ValueError):
            tune_matmul(a, b)
