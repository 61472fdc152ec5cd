"""Native data-gen library tests (built on demand; numpy fallback also
covered)."""

import numpy as np
import pytest

from param_tpu.utils import native


@pytest.fixture(scope="module", autouse=True)
def built():
    # attempt the build once; tests cover whichever path is available
    native.get_lib()


class TestUniform:
    def test_bounds_and_shape(self):
        out = native.uniform_indices(0, 500, (100, 4))
        assert out.shape == (100, 4)
        assert out.dtype == np.int32
        assert out.min() >= 0 and out.max() < 500

    def test_deterministic(self):
        a = native.uniform_indices(42, 1000, (1000,))
        b = native.uniform_indices(42, 1000, (1000,))
        np.testing.assert_array_equal(a, b)

    def test_different_seeds_differ(self):
        a = native.uniform_indices(1, 1000, (1000,))
        b = native.uniform_indices(2, 1000, (1000,))
        assert not np.array_equal(a, b)


class TestZipf:
    def test_skew(self):
        z = native.ZipfSampler(1.2, 10_000)
        s = z.sample(0, (50_000,))
        assert s.min() >= 0 and s.max() < 10_000
        _, counts = np.unique(s, return_counts=True)
        # head-heavy: the hottest row gets far more than uniform share
        assert counts.max() > 50_000 / 10_000 * 50


class TestRaggedOffsets:
    def test_monotone_bounded(self):
        offs = native.ragged_offsets(0, 64, 8)
        assert len(offs) == 65
        lengths = np.diff(offs)
        assert (lengths >= 1).all() and (lengths <= 8).all()


class TestNormal:
    def test_moments(self):
        n = native.normal(0, (100_000,))
        assert abs(float(n.mean())) < 0.02
        assert abs(float(n.std()) - 1.0) < 0.02


class TestPadRagged:
    def _reference_pad(self, indices, offsets, max_nnz, pad):
        """The original python-loop formulation, kept as the oracle."""
        full = np.append(offsets, len(indices))
        lengths = np.diff(full)
        out = np.full((len(lengths), max_nnz), pad, dtype=np.int32)
        for b, l in enumerate(lengths):
            l = min(int(l), max_nnz)
            out[b, :l] = indices[full[b]: full[b] + l]
        return out

    @pytest.mark.parametrize("use_native", [True, False])
    def test_matches_loop_oracle(self, use_native, monkeypatch):
        if use_native and not native.native_available():
            pytest.skip("native lib not built")
        if not use_native:
            monkeypatch.setattr(native, "get_lib",
                                lambda auto_build=True: None)
        rng = np.random.default_rng(0)
        offsets = native.ragged_offsets(1, 64, 7)
        indices = rng.integers(0, 1000, int(offsets[-1])).astype(np.int32)
        got = native.pad_ragged(indices, offsets, 7, 1000)
        want = self._reference_pad(indices, offsets[:-1], 7, 1000)
        np.testing.assert_array_equal(got, want)

    def test_truncates_long_bags(self):
        indices = np.arange(10, dtype=np.int32)
        offsets = np.array([0, 10], dtype=np.int64)
        got = native.pad_ragged(indices, offsets, 4, 99)
        np.testing.assert_array_equal(got, [[0, 1, 2, 3]])

    def test_empty_batch(self):
        got = native.pad_ragged(np.empty(0, np.int32),
                                np.zeros(1, np.int64), 4, 9)
        assert got.shape == (0, 4)

    def test_pad_ragged_indices_wrapper(self):
        from param_tpu.ops.embedding import pad_ragged_indices

        indices = np.array([5, 6, 7, 8, 9], dtype=np.int32)
        offsets = np.array([0, 2, 2], dtype=np.int64)  # bags: [5,6], [], [7,8,9]
        dense, mx = pad_ragged_indices(indices, offsets, num_rows=10)
        assert mx == 3
        np.testing.assert_array_equal(
            dense, [[5, 6, 10], [10, 10, 10], [7, 8, 9]])


class TestFallback:
    def test_numpy_fallback_paths(self, monkeypatch):
        monkeypatch.setattr(native, "get_lib", lambda auto_build=True: None)
        out = native.uniform_indices(0, 100, (50,))
        assert out.max() < 100
        offs = native.ragged_offsets(0, 10, 4)
        assert len(offs) == 11
        z = native.ZipfSampler(1.2, 100)
        assert z.sample(0, (50,)).max() < 100
        assert native.normal(0, (10,)).shape == (10,)


class TestDlrmIntegration:
    def test_gen_indices_uses_native(self):
        from param_tpu.models.dlrm_data import gen_indices

        rng = np.random.default_rng(0)
        idx = gen_indices(rng, 32, 4, 8, 1000, "zipf")
        assert idx.shape == (32, 4, 8)
        assert idx.max() < 1000
