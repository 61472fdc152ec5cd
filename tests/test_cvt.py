"""CvT conv-layer bench tests: torch parity + bench plumbing.

Reference: train/compute/pt/pytorch_cvt_convs.py (layer classes :52-139,
configs :240-381).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from param_tpu.ops.cvt_convs import (
    CVT_CONFIGS,
    CvtLayerCfg,
    avg_pool,
    bench_cvt,
    conv_projection,
    init_conv_projection,
    init_patch_embed,
    patch_embed,
    reference_flops,
    report,
)

torch = pytest.importorskip("torch")


class TestTorchParity:
    """Outputs match the reference layer implementations (torch CPU)."""

    def test_conv_proj_dw_bn(self):
        rng = np.random.default_rng(0)
        B, C, H, W = 2, 8, 10, 10
        x = rng.standard_normal((B, C, H, W)).astype(np.float32)
        params = init_conv_projection(jax.random.PRNGKey(0), C, 3)
        got = conv_projection(
            params, jnp.asarray(x.transpose(0, 2, 3, 1)),
            kernel_size=3, padding=1, stride=2, method="dw_bn")

        conv = torch.nn.Conv2d(C, C, 3, padding=1, stride=2, bias=False,
                               groups=C)
        # our w: (kh, kw, 1, C) -> torch (C, 1, kh, kw)
        w = np.asarray(params["w"]).transpose(3, 2, 0, 1)
        conv.weight.data = torch.from_numpy(w.copy())
        bn = torch.nn.BatchNorm2d(C)
        bn.train()
        y = bn(conv(torch.from_numpy(x)))
        want = y.permute(0, 2, 3, 1).reshape(B, -1, C).detach().numpy()
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=2e-4, atol=2e-5)

    def test_conv_proj_avg(self):
        rng = np.random.default_rng(1)
        B, C, H, W = 2, 4, 9, 9
        x = rng.standard_normal((B, C, H, W)).astype(np.float32)
        got = conv_projection(
            {}, jnp.asarray(x.transpose(0, 2, 3, 1)),
            kernel_size=3, padding=1, stride=2, method="avg")
        pool = torch.nn.AvgPool2d(3, padding=1, stride=2, ceil_mode=True)
        y = pool(torch.from_numpy(x))
        want = y.permute(0, 2, 3, 1).reshape(B, -1, C).numpy()
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-5, atol=1e-6)

    def test_patch_embed(self):
        rng = np.random.default_rng(2)
        B, C, H, W = 2, 3, 16, 16
        E = 8
        x = rng.standard_normal((B, C, H, W)).astype(np.float32)
        params = init_patch_embed(jax.random.PRNGKey(1), C, E, 7)
        got = patch_embed(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                          stride=4, padding=2)

        conv = torch.nn.Conv2d(C, E, 7, stride=4, padding=2)
        conv.weight.data = torch.from_numpy(
            np.asarray(params["w"]).transpose(3, 2, 0, 1).copy())
        conv.bias.data = torch.from_numpy(np.asarray(params["b"]).copy())
        ln = torch.nn.LayerNorm(E)
        y = conv(torch.from_numpy(x))
        b, c, h, w = y.shape
        t = ln(y.permute(0, 2, 3, 1).reshape(b, h * w, c))
        want = t.reshape(b, h, w, c).detach().numpy()
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=2e-4, atol=2e-5)


class TestBench:
    def test_configs_match_reference_count(self):
        # 8 conv_proj + 3 patch_embed entries (pytorch_cvt_convs.py:246-381)
        assert len(CVT_CONFIGS) == 11
        assert sum(c.layer_type == "conv_proj" for c in CVT_CONFIGS) == 8
        assert sum(c.layer_type == "patch_embed" for c in CVT_CONFIGS) == 3

    def test_reference_flop_model(self):
        ref, honest = reference_flops(CVT_CONFIGS[0])
        assert ref > 0 and honest > 0

    @pytest.mark.parametrize("forward_only", [True, False])
    def test_bench_tiny(self, forward_only, capsys):
        tiny = [
            CvtLayerCfg("tiny.conv_proj", "conv_proj", (2, 8, 12, 12),
                        dict(dim_in=8, dim_out=8, kernel_size=3, padding=1,
                             stride=2, method="dw_bn")),
            CvtLayerCfg("tiny.patch_embed", "patch_embed", (2, 3, 16, 16),
                        dict(patch_size=3, in_chans=3, embed_dim=8,
                             stride=2, padding=1)),
        ]
        results = bench_cvt(tiny, forward_only=forward_only, n_hi=3, max_n=6)
        assert len(results) == 2
        for r in results:
            assert r["elap_s"] > 0
            assert r["tflops"] > 0
        report(results)
        out = capsys.readouterr().out
        assert "CVT-RES" in out and "tiny.conv_proj" in out

    def test_avg_pool_shapes_ceil_mode(self):
        x = jnp.ones((1, 9, 9, 2))
        y = avg_pool(x, 3, 2, 1)
        # torch AvgPool2d(3, stride=2, padding=1, ceil_mode=True) on 9x9 -> 5x5
        assert y.shape == (1, 5, 5, 2)


class TestCli:
    def test_main_tiny_filter(self, capsys):
        from param_tpu.cli.cvt import main

        rc = main(["--layer", "stage0.block0.conv_proj_q",
                   "--forward-only", "--steps", "2", "--max-chain", "4"])
        assert rc == 0
        assert "CVT-RES" in capsys.readouterr().out

    def test_main_bad_filter(self):
        from param_tpu.cli.cvt import main

        assert main(["--layer", "nope"]) == 1
