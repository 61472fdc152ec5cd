"""CvT convolution benchmarks: token-embedding and projection layers.

TPU-native counterpart of ``train/compute/pt/pytorch_cvt_convs.py``:

- :func:`conv_projection` — CvT's convolutional projection
  (pytorch_cvt_convs.py:52-96): depthwise 3x3 conv + batchnorm +
  ``b c h w -> b (hw) c`` rearrange (method ``dw_bn``), or average-pool +
  rearrange (method ``avg``).
- :func:`patch_embed` — convolutional token embedding
  (pytorch_cvt_convs.py:108-139): full conv + LayerNorm over channels.
- :data:`CVT_CONFIGS` — the 11 paper-exact layer configs the reference
  mains over (pytorch_cvt_convs.py:240-381), input sizes from CvT trained
  at 32x3x224x224.
- :func:`bench_cvt` — fwd or fwd+bwd timing via measure_chain (the
  reference uses CUDA events / wall time, :23-48) with the reference's
  FLOP model (:175-210) plus an honest full-conv FLOP count.

Layout: NHWC throughout (TPU-idiomatic — the MXU consumes channels-last);
configs are stated NCHW like the reference and transposed at the edge.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from param_tpu.comms.timing import measure_chain


# --------------------------------------------------------------- layers
def depthwise_conv(x, w, stride: int, padding: int):
    """NHWC depthwise conv, one filter per channel
    (reference nn.Conv2d(groups=dim_in), pytorch_cvt_convs.py:60-70).

    ``w``: (kh, kw, 1, C) — HWIO with feature_group_count=C."""
    return lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


def conv2d(x, w, stride: int, padding: int):
    """NHWC full conv; ``w``: (kh, kw, Cin, Cout)."""
    return lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def batch_norm(x, gamma, beta, eps: float = 1e-5):
    """Training-mode batchnorm over (N, H, W) per channel
    (reference nn.BatchNorm2d in train mode)."""
    mean = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
    var = jnp.var(x, axis=(0, 1, 2), keepdims=True)
    return (x - mean) * lax.rsqrt(var + eps) * gamma + beta


def layer_norm(x, gamma, beta, eps: float = 1e-5):
    """LayerNorm over the channel axis (reference norm_layer=nn.LayerNorm
    applied to ``b (hw) c``)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * lax.rsqrt(var + eps) * gamma + beta


def avg_pool(x, kernel_size: int, stride: int, padding: int):
    """ceil_mode AvgPool2d (reference method='avg',
    pytorch_cvt_convs.py:71-88), torch default count_include_pad=True:
    the zero padding counts in the divisor; only the ceil-mode extension
    region is excluded."""
    n, h, w, c = x.shape

    def extra(size):
        # ceil-mode output size -> extra high-side extension beyond padding
        out = -(-(size + 2 * padding - kernel_size) // stride) + 1
        return max(0, (out - 1) * stride + kernel_size - size - 2 * padding)

    ext_h, ext_w = extra(h), extra(w)
    # explicit zero padding (counted), ceil extension via reduce_window pads
    # (not counted)
    xs = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    window = (1, kernel_size, kernel_size, 1)
    strides = (1, stride, stride, 1)
    pads = ((0, 0), (0, ext_h), (0, ext_w), (0, 0))
    summed = lax.reduce_window(xs, 0.0, lax.add, window, strides, pads)
    counts = lax.reduce_window(jnp.ones_like(xs), 0.0, lax.add,
                               window, strides, pads)
    return summed / counts


def init_conv_projection(key, dim_in: int, kernel_size: int,
                         method: str = "dw_bn"):
    if method == "avg":
        return {}
    k1 = jax.random.normal(key, (kernel_size, kernel_size, 1, dim_in),
                           jnp.float32) * 0.1
    return {
        "w": k1,
        "gamma": jnp.ones((dim_in,)),
        "beta": jnp.zeros((dim_in,)),
    }


def conv_projection(params, x, *, kernel_size: int, padding: int,
                    stride: int, method: str = "dw_bn"):
    """CvT conv projection: NHWC in → (B, H'·W', C) tokens out."""
    if method == "dw_bn":
        y = depthwise_conv(x, params["w"], stride, padding)
        y = batch_norm(y, params["gamma"], params["beta"])
    elif method == "avg":
        y = avg_pool(x, kernel_size, stride, padding)
    else:
        raise ValueError(f"unknown method {method!r}")
    b, h, w, c = y.shape
    return y.reshape(b, h * w, c)  # b c h w -> b (hw) c in NHWC


def init_patch_embed(key, in_chans: int, embed_dim: int, patch_size: int):
    w = jax.random.normal(
        key, (patch_size, patch_size, in_chans, embed_dim), jnp.float32
    ) * (1.0 / np.sqrt(in_chans * patch_size * patch_size))
    return {
        "w": w,
        "b": jnp.zeros((embed_dim,)),
        "gamma": jnp.ones((embed_dim,)),
        "beta": jnp.zeros((embed_dim,)),
    }


def patch_embed(params, x, *, stride: int, padding: int,
                norm: bool = True):
    """Convolutional token embedding: conv + channel LayerNorm, returned
    in image layout like the reference (rearranged back)."""
    y = conv2d(x, params["w"], stride, padding) + params["b"]
    if norm:
        b, h, w, c = y.shape
        t = layer_norm(y.reshape(b, h * w, c), params["gamma"],
                       params["beta"])
        y = t.reshape(b, h, w, c)
    return y


# --------------------------------------------------------------- configs
@dataclass
class CvtLayerCfg:
    """One reference benchmark entry (pytorch_cvt_convs.py:247-381).
    ``input_shape`` is NCHW like the reference prints it."""

    name: str
    layer_type: str  # conv_proj | patch_embed
    input_shape: Tuple[int, int, int, int]
    kwargs: Dict


CVT_CONFIGS: List[CvtLayerCfg] = [
    CvtLayerCfg("cvt.stage0.block0.conv_proj_q", "conv_proj",
                (32, 64, 56, 56),
                dict(dim_in=64, dim_out=64, kernel_size=3, padding=1,
                     stride=1, method="dw_bn")),
    CvtLayerCfg("cvt.stage0.block0.conv_proj_k", "conv_proj",
                (32, 64, 56, 56),
                dict(dim_in=64, dim_out=64, kernel_size=3, padding=1,
                     stride=2, method="dw_bn")),
    CvtLayerCfg("cvt.stage1.block0.conv_proj_q", "conv_proj",
                (32, 192, 28, 28),
                dict(dim_in=192, dim_out=192, kernel_size=3, padding=1,
                     stride=1, method="dw_bn")),
    CvtLayerCfg("cvt.stage1.block0.conv_proj_k", "conv_proj",
                (32, 192, 28, 28),
                dict(dim_in=192, dim_out=192, kernel_size=3, padding=1,
                     stride=2, method="dw_bn")),
    CvtLayerCfg("cvt.stage1.block1.conv_proj_q", "conv_proj",
                (32, 192, 28, 28),
                dict(dim_in=192, dim_out=192, kernel_size=3, padding=1,
                     stride=1, method="dw_bn")),
    CvtLayerCfg("cvt.stage1.block1.conv_proj_k", "conv_proj",
                (32, 192, 28, 28),
                dict(dim_in=192, dim_out=192, kernel_size=3, padding=1,
                     stride=2, method="dw_bn")),
    CvtLayerCfg("cvt.stage2.blocks0.conv_proj_q", "conv_proj",
                (32, 384, 14, 14),
                dict(dim_in=384, dim_out=384, kernel_size=3, padding=1,
                     stride=1, method="dw_bn")),
    CvtLayerCfg("cvt.stage2.blocks0.conv_proj_k", "conv_proj",
                (32, 384, 14, 14),
                dict(dim_in=384, dim_out=384, kernel_size=3, padding=1,
                     stride=2, method="dw_bn")),
    CvtLayerCfg("cvt.stage0.patch_embed", "patch_embed",
                (32, 3, 224, 224),
                dict(patch_size=7, in_chans=3, embed_dim=64, stride=4,
                     padding=2)),
    CvtLayerCfg("cvt.stage1.patch_embed", "patch_embed",
                (32, 64, 56, 56),
                dict(patch_size=3, in_chans=64, embed_dim=192, stride=2,
                     padding=1)),
    CvtLayerCfg("cvt.stage2.patch_embed", "patch_embed",
                (32, 192, 28, 28),
                dict(patch_size=3, in_chans=192, embed_dim=384, stride=2,
                     padding=1)),
]


def reference_flops(cfg: CvtLayerCfg) -> Tuple[float, float]:
    """(reference FLOP model, honest conv FLOPs).

    The reference model (pytorch_cvt_convs.py:175-210) counts
    (n+1)·instances·batch with instances computed from input_shape[1:3]
    (note: it indexes channels as 'rows' for conv_proj — reproduced
    verbatim for comparability).  The honest count is
    2·out_positions·k²·cin_per_group·cout·batch."""
    n_, c, h, w = cfg.input_shape
    kw = cfg.kwargs
    if cfg.layer_type == "conv_proj":
        k, cin, cout = kw["kernel_size"], kw["dim_in"], kw["dim_out"]
        groups = cin
    else:
        k, cin, cout = kw["patch_size"], kw["in_chans"], kw["embed_dim"]
        groups = 1
    stride, padding = kw["stride"], kw["padding"]
    # reference formula, verbatim semantics (input_shape[1], [2])
    inst = (((cfg.input_shape[1] - k + 2 * padding) / stride) + 1) * (
        ((cfg.input_shape[2] - k + 2 * padding) / stride) + 1)
    ref = (cin * k * k + 1) * inst * n_
    # honest: output spatial positions from H, W
    oh = (h - k + 2 * padding) // stride + 1
    ow = (w - k + 2 * padding) // stride + 1
    honest = 2.0 * n_ * oh * ow * k * k * (cin // groups) * cout
    return ref, honest


# --------------------------------------------------------------- bench
def _make_layer(cfg: CvtLayerCfg, key):
    kw = cfg.kwargs
    if cfg.layer_type == "conv_proj":
        params = init_conv_projection(
            key, kw["dim_in"], kw["kernel_size"], kw.get("method", "dw_bn"))
        fn = functools.partial(
            conv_projection, kernel_size=kw["kernel_size"],
            padding=kw["padding"], stride=kw["stride"],
            method=kw.get("method", "dw_bn"))
    else:
        params = init_patch_embed(
            key, kw["in_chans"], kw["embed_dim"], kw["patch_size"])
        fn = functools.partial(
            patch_embed, stride=kw["stride"], padding=kw["padding"])
    return params, fn


def bench_cvt(
    configs: Optional[List[CvtLayerCfg]] = None,
    forward_only: bool = False,
    dtype=jnp.float32,
    n_hi: int = 8,
    max_n: int = 64,
) -> List[Dict]:
    """Time each CvT layer with measure_chain; fwd+bwd by default like the
    reference (run(), pytorch_cvt_convs.py:160-172: forward + .backward
    with a fixed grad_output)."""
    results = []
    for ci, cfg in enumerate(configs or CVT_CONFIGS):
        n_, c, h, w = cfg.input_shape
        key = jax.random.PRNGKey(ci)
        params, fn = _make_layer(cfg, key)
        params = jax.tree.map(lambda p: p.astype(dtype), params)
        rng = np.random.default_rng(ci)
        x = jnp.asarray(rng.random((n_, h, w, c), dtype=np.float32)
                        ).astype(dtype)
        out = fn(params, x)
        g = jnp.asarray(rng.random(out.shape, dtype=np.float32)).astype(dtype)

        if forward_only:
            def chain(nn_, params=params, fn=fn, x=x):
                def step(s, i):
                    y = fn(params, x + i.astype(x.dtype) * 1e-6)
                    return s + jnp.sum(y.astype(jnp.float32)), None
                s, _ = lax.scan(step, jnp.float32(0), jnp.arange(nn_))
                return s
        else:
            def loss(params, x, g, fn=fn):
                return jnp.sum(fn(params, x).astype(jnp.float32)
                               * g.astype(jnp.float32))

            grad = jax.grad(loss, argnums=(0, 1))

            def chain(nn_, params=params, x=x, g=g, grad=grad):
                def step(s, i):
                    gp, gx = grad(params, x + i.astype(x.dtype) * 1e-6, g)
                    tot = jnp.sum(gx.astype(jnp.float32))
                    for leaf in jax.tree.leaves(gp):
                        tot = tot + jnp.sum(leaf.astype(jnp.float32))
                    return s + tot, None
                s, _ = lax.scan(step, jnp.float32(0), jnp.arange(nn_))
                return s

        jchain = jax.jit(chain, static_argnums=0)
        per = measure_chain(jchain, n_lo=1, n_hi=n_hi, max_n=max_n)
        ref_flops, honest_flops = reference_flops(cfg)
        if not forward_only:
            honest_flops *= 3  # bwd ≈ 2x fwd conv FLOPs
        results.append({
            "name": cfg.name,
            "layer_type": cfg.layer_type,
            "input_shape": list(cfg.input_shape),
            "elap_s": per,
            "ref_flops": ref_flops,
            "tflops": honest_flops / per / 1e12,
            "ref_tfs": ref_flops / per / 1e12,
        })
    return results


def report(results: List[Dict]) -> None:
    print(f"CVT-RES {'layer':<36}{'input(NCHW)':>20}{'elap(us)':>12}"
          f"{'TF/s':>9}{'ref-TF/s':>10}")
    for r in results:
        shape = "x".join(str(s) for s in r["input_shape"])
        print(f"CVT-RES {r['name']:<36}{shape:>20}{r['elap_s']*1e6:>12.1f}"
              f"{r['tflops']:>9.2f}{r['ref_tfs']:>10.2f}")
