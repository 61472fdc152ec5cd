"""ATen-op-level COMPUTE replay of PyTorch execution traces on TPU.

The reference rebuilds a TorchScript callable per trace node and replays the
full compute graph of production PyTorch ETs
(``et_replay/tools/et_replay.py:829`` ``build_func``, ``:891``
``get_tensor_from_storage``, ``:468-560`` ``extract_subgraph``;
``et_replay_utils.py:129`` ``build_torchscript_func``).  This module answers
the same question TPU-natively: *what does this PyTorch model's op stream
cost on our silicon* — by mapping each ``aten::*`` op to a JAX callable.

Node selection follows the reference exactly: the TOP-MOST nodes carrying a
non-empty ``op_schema`` (reference ``NodeType.OPERATOR`` detection,
``execution_trace.py:278-291``), in node-id (execution) order, windowed to
the first ``ProfilerStep`` interval when the trace spans several steps
(``et_replay.py:535-542``).  Input tensors not produced by an earlier op are
materialized from their trace metadata the way the reference's storage map
does (rand for floats, ones for ints — safe indices; ``et_replay.py:891``).

TPU-native design (not a port):

- **discrete mode** — each op is one ``jax.jit`` program (compiled once per
  distinct (op, signature), reused across the stream and across iterations;
  the reference's per-node TorchScript func analogue), timed per call.
  Decision-grade on local backends (CPU mesh); on a remote-attached TPU
  per-op host timing measures the tunnel, so use chain mode there.
- **chain mode** — the ENTIRE supported op stream is traced into ONE fused
  XLA program and timed with scalar-fetch delta-N chains
  (:func:`param_tpu.comms.timing.measure_chain`) — the trustworthy timing
  path on axon-attached TPUs, and the genuinely TPU-shaped way to run a
  recorded op stream (XLA fuses the elementwise chains into the matmuls the
  reference launches as separate CUDA kernels).

Unsupported ops degrade to the skip path with the reason recorded; the skip
config auto-update mirrors ``trace/et_replay.py`` (reference: skip-node
replay config, ``et_replay.py:355-390,458``).
"""

from __future__ import annotations

import functools
import logging
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

from param_tpu.trace.pytorch_et import PtNode, PyTorchETrace, _torch_dtype
from param_tpu.utils.sizes import percentile

log = logging.getLogger(__name__)


class UnsupportedOp(Exception):
    """Raised by an impl when a recorded variant has no TPU mapping."""


# --------------------------------------------------------------------------
# dtype / argument plumbing
# --------------------------------------------------------------------------

_NP_DTYPES = {
    "float32": np.float32, "float64": np.float64, "float16": np.float16,
    "bfloat16": "bfloat16", "int32": np.int32, "int64": np.int64,
    "bool": np.bool_, "byte": np.uint8, "char": np.int8,
}


def _np_dtype(type_token: str):
    name = _torch_dtype(type_token)
    dt = _NP_DTYPES.get(name, np.float32)
    if dt == "bfloat16":
        import jax.numpy as jnp

        return jnp.bfloat16
    return dt


def _is_tensor_slot(type_token: str) -> bool:
    t = type_token or ""
    return "Tensor" in t and "GenericList" not in t


def _is_tensor_list_slot(type_token: str) -> bool:
    # index lists can LEAD with None slots: GenericList[None,Tensor(long)]
    t = type_token or ""
    return t.startswith("GenericList[") and "Tensor" in t


def _tensor_key(desc: Any) -> Optional[Tuple[int, int]]:
    """(tensor_id, storage_id) registry key; None for non-tensor descs."""
    if not isinstance(desc, (list, tuple)) or len(desc) < 4:
        return None
    return (int(desc[0]), int(desc[1]))


# --------------------------------------------------------------------------
# the ATen -> JAX registry
# --------------------------------------------------------------------------
# Each impl: (args, meta) -> list of per-output-slot values.  ``args`` holds
# jnp arrays for tensor slots (None for nullptr), lists of arrays for
# GenericList[Tensor] slots, and raw literals otherwise.  Impls must derive
# every shape from args (never from the node) so compiled programs can be
# shared between nodes with equal signatures.

_ATEN: Dict[str, Callable] = {}


def aten(*names):
    def deco(fn):
        for n in names:
            _ATEN[n] = fn
        return fn
    return deco


def _as_pair(v):
    if isinstance(v, (list, tuple)):
        return tuple(v) if len(v) > 1 else (v[0], v[0])
    return (v, v)


def _reduction(args_val):
    # torch reduction enum: 0 none, 1 mean, 2 sum
    return {0: "none", 1: "mean", 2: "sum"}.get(args_val, "mean")


@aten("aten::linear")
def _linear(a, meta):
    import jax.numpy as jnp

    x, w = a[0], a[1]
    out = jnp.einsum("...k,nk->...n", x, w)
    if len(a) > 2 and a[2] is not None:
        out = out + a[2]
    return [out]


@aten("aten::t")
def _t(a, meta):
    import jax.numpy as jnp

    x = a[0]
    return [jnp.swapaxes(x, 0, 1) if x.ndim == 2 else x]


@aten("aten::transpose", "aten::transpose_")
def _transpose(a, meta):
    import jax.numpy as jnp

    return [jnp.swapaxes(a[0], int(a[1]), int(a[2]))]


@aten("aten::permute")
def _permute(a, meta):
    import jax.numpy as jnp

    return [jnp.transpose(a[0], axes=[int(d) for d in a[1]])]


@aten("aten::mm", "aten::bmm", "aten::matmul")
def _mm(a, meta):
    import jax.numpy as jnp

    return [jnp.matmul(a[0], a[1])]


@aten("aten::addmm")
def _addmm(a, meta):
    import jax.numpy as jnp

    bias, m1, m2 = a[0], a[1], a[2]
    beta = a[3] if len(a) > 3 else 1
    alpha = a[4] if len(a) > 4 else 1
    return [beta * bias + alpha * jnp.matmul(m1, m2)]


@aten("aten::baddbmm")
def _baddbmm(a, meta):
    import jax.numpy as jnp

    beta = a[3] if len(a) > 3 else 1
    alpha = a[4] if len(a) > 4 else 1
    return [beta * a[0] + alpha * jnp.matmul(a[1], a[2])]


@aten("aten::relu", "aten::relu_")
def _relu(a, meta):
    import jax.numpy as jnp

    return [jnp.maximum(a[0], 0)]


@aten("aten::clamp_min", "aten::clamp_min_")
def _clamp_min(a, meta):
    import jax.numpy as jnp

    return [jnp.maximum(a[0], a[1])]


@aten("aten::threshold_backward")
def _threshold_backward(a, meta):
    import jax.numpy as jnp

    grad, self_, thr = a[0], a[1], a[2]
    return [jnp.where(self_ > thr, grad, 0)]


@aten("aten::gelu", "aten::gelu_")
def _gelu(a, meta):
    import jax

    approx = "tanh" in str(a[1]) if len(a) > 1 else False
    return [jax.nn.gelu(a[0], approximate=approx)]


@aten("aten::gelu_backward")
def _gelu_backward(a, meta):
    import jax

    grad, x = a[0], a[1]
    approx = "tanh" in str(a[2]) if len(a) > 2 else False
    _, vjp = jax.vjp(lambda v: jax.nn.gelu(v, approximate=approx), x)
    return [vjp(grad)[0]]


@aten("aten::tanh")
def _tanh(a, meta):
    import jax.numpy as jnp

    return [jnp.tanh(a[0])]


@aten("aten::sigmoid")
def _sigmoid(a, meta):
    import jax

    return [jax.nn.sigmoid(a[0])]


@aten("aten::silu", "aten::silu_")
def _silu(a, meta):
    import jax

    return [jax.nn.silu(a[0])]


@aten("aten::sum", "aten::mean")
def _sum_mean(a, meta):
    import jax.numpy as jnp

    fn = jnp.sum if meta["name"] == "aten::sum" else jnp.mean
    x = a[0]
    dims = None
    keepdim = False
    if len(a) > 1 and isinstance(a[1], (list, tuple)) and a[1]:
        dims = tuple(int(d) for d in a[1] if int(d) < x.ndim) or None
        if len(a) > 2 and isinstance(a[2], bool):
            keepdim = a[2]
    return [fn(x, axis=dims, keepdims=keepdim if dims else False)]


@aten("aten::view", "aten::reshape", "aten::_unsafe_view")
def _view(a, meta):
    import jax.numpy as jnp

    return [jnp.reshape(a[0], [int(d) for d in a[1]])]


@aten("aten::flatten")
def _flatten(a, meta):
    import jax.numpy as jnp

    x = a[0]
    start = int(a[1]) if len(a) > 1 else 0
    end = int(a[2]) if len(a) > 2 else -1
    if end < 0:
        end += x.ndim
    shape = list(x.shape[:start]) + [-1] + list(x.shape[end + 1:])
    return [jnp.reshape(x, shape)]


@aten("aten::zero_")
def _zero_(a, meta):
    import jax.numpy as jnp

    return [jnp.zeros_like(a[0])]


@aten("aten::fill_")
def _fill_(a, meta):
    import jax.numpy as jnp

    return [jnp.full_like(a[0], a[1])]


@aten("aten::add", "aten::add_", "aten::sub", "aten::sub_")
def _add_sub(a, meta):
    sign = 1 if meta["name"].startswith("aten::add") else -1
    alpha = a[2] if len(a) > 2 and not isinstance(a[2], (list, tuple)) else 1
    return [a[0] + sign * alpha * a[1]]


@aten("aten::mul", "aten::mul_")
def _mul(a, meta):
    return [a[0] * a[1]]


@aten("aten::div", "aten::div_")
def _div(a, meta):
    return [a[0] / a[1]]


@aten("aten::neg")
def _neg(a, meta):
    return [-a[0]]


@aten("aten::sqrt", "aten::sqrt_")
def _sqrt(a, meta):
    import jax.numpy as jnp

    return [jnp.sqrt(a[0])]


@aten("aten::rsqrt")
def _rsqrt(a, meta):
    import jax.lax as lax

    return [lax.rsqrt(a[0])]


@aten("aten::pow")
def _pow(a, meta):
    return [a[0] ** a[1]]


@aten("aten::addcmul_", "aten::addcmul")
def _addcmul(a, meta):
    val = a[3] if len(a) > 3 else 1
    return [a[0] + val * a[1] * a[2]]


@aten("aten::addcdiv_", "aten::addcdiv")
def _addcdiv(a, meta):
    val = a[3] if len(a) > 3 else 1
    return [a[0] + val * a[1] / a[2]]


@aten("aten::softmax", "aten::_softmax")
def _softmax(a, meta):
    import jax

    return [jax.nn.softmax(a[0], axis=int(a[1]) if len(a) > 1 else -1)]


@aten("aten::log_softmax", "aten::_log_softmax")
def _log_softmax(a, meta):
    import jax

    return [jax.nn.log_softmax(a[0], axis=int(a[1]) if len(a) > 1 else -1)]


@aten("aten::_softmax_backward_data")
def _softmax_bwd(a, meta):
    import jax.numpy as jnp

    grad, out, dim = a[0], a[1], int(a[2])
    return [(grad - jnp.sum(grad * out, axis=dim, keepdims=True)) * out]


@aten("aten::_log_softmax_backward_data")
def _log_softmax_bwd(a, meta):
    import jax.numpy as jnp

    grad, out, dim = a[0], a[1], int(a[2])
    return [grad - jnp.exp(out) * jnp.sum(grad, axis=dim, keepdims=True)]


@aten("aten::cross_entropy_loss")
def _cross_entropy(a, meta):
    import jax
    import jax.numpy as jnp

    logits, target = a[0], a[1]
    reduction = _reduction(a[3] if len(a) > 3 else 1)
    ls = jax.nn.log_softmax(logits, axis=-1)
    if (target.shape == ls.shape
            and jnp.issubdtype(target.dtype, jnp.floating)):
        # torch's probability-target form (soft labels, same shape as
        # input) — the resnet_et fixture records this variant
        nll = -jnp.sum(target * ls, axis=-1)
    else:
        target = jnp.reshape(target, ls.shape[:-1])
        nll = -jnp.take_along_axis(
            ls, target[..., None].astype(jnp.int32), axis=-1
        )[..., 0]
    if reduction == "mean":
        return [jnp.mean(nll)]
    if reduction == "sum":
        return [jnp.sum(nll)]
    return [nll]


@aten("aten::nll_loss_forward")
def _nll_forward(a, meta):
    import jax.numpy as jnp

    logp, target = a[0], a[1]
    reduction = _reduction(a[3] if len(a) > 3 else 1)
    target = jnp.reshape(target, logp.shape[:-1])
    nll = -jnp.take_along_axis(
        logp, target[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    total_w = jnp.asarray(float(np.prod(nll.shape)), logp.dtype)
    if reduction == "mean":
        return [jnp.mean(nll), total_w]
    if reduction == "sum":
        return [jnp.sum(nll), total_w]
    return [nll, total_w]


@aten("aten::nll_loss_backward")
def _nll_backward(a, meta):
    import jax
    import jax.numpy as jnp

    grad_out, logp, target = a[0], a[1], a[2]
    reduction = _reduction(a[4] if len(a) > 4 else 1)
    n, c = logp.shape[0], logp.shape[-1]
    target = jnp.reshape(target, logp.shape[:-1])
    onehot = jax.nn.one_hot(target.astype(jnp.int32), c, dtype=logp.dtype)
    scale = grad_out / n if reduction == "mean" else grad_out
    return [-onehot * jnp.reshape(scale, (-1,) + (1,) * (logp.ndim - 1))]


@aten("aten::ones_like")
def _ones_like(a, meta):
    import jax.numpy as jnp

    return [jnp.ones_like(a[0])]


@aten("aten::zeros_like", "aten::empty_like")
def _zeros_like(a, meta):
    import jax.numpy as jnp

    return [jnp.zeros_like(a[0])]


@aten("aten::_foreach_add_", "aten::_foreach_add")
def _foreach_add(a, meta):
    ts = a[0]
    other = a[1]
    alpha = a[2] if len(a) > 2 else 1
    if isinstance(other, list):
        return [[t + alpha * o for t, o in zip(ts, other)]]
    return [[t + alpha * other for t in ts]]


@aten("aten::_foreach_mul_", "aten::_foreach_mul")
def _foreach_mul(a, meta):
    ts = a[0]
    other = a[1]
    if isinstance(other, list):
        return [[t * o for t, o in zip(ts, other)]]
    return [[t * other for t in ts]]


@aten("aten::copy_")
def _copy_(a, meta):
    import jax.numpy as jnp

    dst, src = a[0], a[1]
    return [jnp.broadcast_to(src.astype(dst.dtype), dst.shape)]


@aten("aten::detach", "aten::detach_", "aten::clone", "aten::contiguous",
      "aten::alias", "aten::lift_fresh")
def _identity(a, meta):
    return [a[0]]


@aten("aten::to", "aten::_to_copy", "aten::type_as")
def _to(a, meta):
    # device/layout moves are identity on a single-runtime replay; dtype
    # casts are rare in the fixtures and metadata-coded — keep values
    return [a[0]]


@aten("aten::as_strided")
def _as_strided(a, meta):
    import jax.numpy as jnp

    x, size, stride = a[0], a[1], a[2]
    offset = int(a[3]) if len(a) > 3 and a[3] is not None else 0
    size = [int(s) for s in size]
    stride = [int(s) for s in stride]
    if not size:
        return [jnp.reshape(x, ())]
    # static strided index map into the (flattened) base — the replay
    # registry holds views, not storages, so clip into the window we have
    idx = np.full((1,), offset, dtype=np.int64)
    for s, st in zip(size, stride):
        idx = (idx[..., None] + (np.arange(s) * st)).reshape(-1)
    idx = np.clip(idx, 0, max(int(np.prod(x.shape)) - 1, 0)).reshape(size)
    return [jnp.reshape(x, (-1,))[idx]]


@aten("aten::expand")
def _expand(a, meta):
    import jax.numpy as jnp

    x, sizes = a[0], [int(s) for s in a[1]]
    shape = list(x.shape)
    # align trailing dims; -1 keeps the existing size
    full = [1] * (len(sizes) - len(shape)) + shape
    out = [f if s == -1 else s for s, f in zip(sizes, full)]
    return [jnp.broadcast_to(jnp.reshape(x, full), out)]


@aten("aten::cat", "aten::concat")
def _cat(a, meta):
    import jax.numpy as jnp

    dim = int(a[1]) if len(a) > 1 else 0
    return [jnp.concatenate(a[0], axis=dim)]


@aten("aten::stack")
def _stack(a, meta):
    import jax.numpy as jnp

    dim = int(a[1]) if len(a) > 1 else 0
    return [jnp.stack(a[0], axis=dim)]


@aten("aten::flatten_dense_tensors")
def _flatten_dense(a, meta):
    import jax.numpy as jnp

    return [jnp.concatenate([jnp.reshape(t, (-1,)) for t in a[0]])]


@aten("aten::unflatten_dense_tensors")
def _unflatten_dense(a, meta):
    import jax.numpy as jnp

    flat, like = a[0], a[1]
    outs, off = [], 0
    for t in like:
        n = int(np.prod(t.shape)) if t.ndim else 1
        outs.append(jnp.reshape(flat[off:off + n], t.shape))
        off += n
    return [outs]


@aten("aten::embedding")
def _embedding(a, meta):
    return [a[0][a[1].astype("int32")]]


@aten("aten::layer_norm")
def _layer_norm(a, meta):
    import jax.numpy as jnp

    x = a[0]
    nshape = [int(d) for d in a[1]]
    axes = tuple(range(x.ndim - len(nshape), x.ndim))
    eps = a[4] if len(a) > 4 and isinstance(a[4], float) else 1e-5
    mu = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    out = (x - mu) / jnp.sqrt(var + eps)
    if len(a) > 2 and a[2] is not None:
        out = out * a[2]
    if len(a) > 3 and a[3] is not None:
        out = out + a[3]
    return [out]


def _conv_fwd(x, w, stride, padding, dilation, groups):
    import jax.lax as lax

    return lax.conv_general_dilated(
        x, w,
        window_strides=_as_pair(stride),
        padding=[(p, p) for p in _as_pair(padding)],
        rhs_dilation=_as_pair(dilation),
        feature_group_count=int(groups),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


@aten("aten::conv2d", "aten::convolution", "aten::_convolution")
def _conv2d(a, meta):
    import jax.numpy as jnp

    x, w, b = a[0], a[1], a[2]
    stride, padding, dilation = a[3], a[4], a[5]
    if meta["name"] == "aten::conv2d":
        groups = a[6] if len(a) > 6 else 1
    else:  # convolution(..., transposed, output_padding, groups)
        if a[6]:
            raise UnsupportedOp("transposed convolution")
        groups = a[8]
    out = _conv_fwd(x, w, stride, padding, dilation, groups)
    if b is not None:
        out = out + jnp.reshape(b, (1, -1, 1, 1))
    return [out]


@aten("aten::convolution_backward")
def _conv_backward(a, meta):
    import jax
    import jax.numpy as jnp

    grad_out, x, w = a[0], a[1], a[2]
    stride, padding, dilation = a[4], a[5], a[6]
    transposed, groups = a[7], a[9]
    if transposed:
        raise UnsupportedOp("transposed convolution backward")
    _, vjp = jax.vjp(
        lambda xx, ww: _conv_fwd(xx, ww, stride, padding, dilation, groups),
        x, w,
    )
    gi, gw = vjp(grad_out)
    gb = jnp.sum(grad_out, axis=(0, 2, 3))
    return [gi, gw, gb]


def _bn_stats(x, eps):
    import jax.numpy as jnp

    axes = (0,) + tuple(range(2, x.ndim))
    mu = jnp.mean(x, axis=axes)
    var = jnp.var(x, axis=axes)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    xhat = (x - jnp.reshape(mu, shape)) / jnp.sqrt(
        jnp.reshape(var, shape) + eps)
    return xhat, mu, var, axes, shape


@aten("aten::batch_norm", "aten::cudnn_batch_norm", "aten::native_batch_norm")
def _batch_norm(a, meta):
    import jax.numpy as jnp

    x, w, b, rm, rv = a[0], a[1], a[2], a[3], a[4]
    training = bool(a[5]) if len(a) > 5 else True
    eps = a[7] if len(a) > 7 and isinstance(a[7], float) else 1e-5
    shape = (1, -1) + (1,) * (x.ndim - 2)
    if training or rm is None:
        xhat, mu, var, _, _ = _bn_stats(x, eps)
    else:
        mu, var = rm, rv
        xhat = (x - jnp.reshape(mu, shape)) / jnp.sqrt(
            jnp.reshape(var, shape) + eps)
    out = xhat
    if w is not None:
        out = out * jnp.reshape(w, shape)
    if b is not None:
        out = out + jnp.reshape(b, shape)
    if meta["name"] == "aten::batch_norm":
        return [out]
    save_mean = mu
    save_invstd = 1.0 / jnp.sqrt(var + eps)
    if meta["name"] == "aten::cudnn_batch_norm":
        reserve = jnp.zeros((0,), dtype=np.uint8)
        return [out, save_mean, save_invstd, reserve]
    return [out, save_mean, save_invstd]


@aten("aten::cudnn_batch_norm_backward", "aten::native_batch_norm_backward")
def _batch_norm_backward(a, meta):
    import jax.numpy as jnp

    if meta["name"] == "aten::cudnn_batch_norm_backward":
        x, grad_out, w = a[0], a[1], a[2]
        eps = a[7] if len(a) > 7 and isinstance(a[7], float) else 1e-5
    else:  # native: (grad_out, input, weight, rm, rv, save_m, save_i, train, eps, mask)
        grad_out, x, w = a[0], a[1], a[2]
        eps = a[8] if len(a) > 8 and isinstance(a[8], float) else 1e-5
    # recompute batch stats from the input (training-mode backward)
    xhat, mu, var, axes, shape = _bn_stats(x, eps)
    n = float(np.prod([x.shape[i] for i in axes]))
    gw = jnp.sum(grad_out * xhat, axis=axes)
    gb = jnp.sum(grad_out, axis=axes)
    wv = jnp.ones_like(gw) if w is None else w
    invstd = 1.0 / jnp.sqrt(var + eps)
    gi = (jnp.reshape(wv * invstd, shape) / n) * (
        n * grad_out
        - jnp.reshape(gb, shape)
        - xhat * jnp.reshape(gw, shape)
    )
    return [gi, gw, gb]


def _pool_dims(x, kernel, stride, padding):
    k = _as_pair(kernel)
    s = _as_pair(stride) if (isinstance(stride, (list, tuple)) and stride) \
        or isinstance(stride, int) else k
    p = _as_pair(padding)
    return k, s, p


def _max_pool_fwd(x, kernel, stride, padding):
    import jax.lax as lax
    import jax.numpy as jnp

    k, s, p = _pool_dims(x, kernel, stride, padding)
    # jnp.issubdtype (not np.): bfloat16 has numpy kind 'V' and would be
    # mis-routed to the integer branch
    return lax.reduce_window(
        x, -np.inf if jnp.issubdtype(x.dtype, jnp.floating) else np.iinfo(
            x.dtype).min,
        lax.max,
        window_dimensions=(1, 1) + k,
        window_strides=(1, 1) + s,
        padding=((0, 0), (0, 0), (p[0], p[0]), (p[1], p[1])),
    )


@aten("aten::max_pool2d", "aten::max_pool2d_with_indices")
def _max_pool2d(a, meta):
    import jax.numpy as jnp

    out = _max_pool_fwd(a[0], a[1], a[2] if len(a) > 2 else None,
                        a[3] if len(a) > 3 else 0)
    if meta["name"] == "aten::max_pool2d_with_indices":
        # indices are only consumed by the backward, which replays via VJP
        return [out, jnp.zeros(out.shape, dtype=jnp.int64)]
    return [out]


@aten("aten::max_pool2d_with_indices_backward")
def _max_pool2d_backward(a, meta):
    import jax

    grad, x = a[0], a[1]
    kernel, stride, padding = a[2], a[3], a[4]
    _, vjp = jax.vjp(lambda v: _max_pool_fwd(v, kernel, stride, padding), x)
    return [vjp(grad)[0]]


@aten("aten::adaptive_avg_pool2d", "aten::_adaptive_avg_pool2d")
def _adaptive_avg_pool2d(a, meta):
    import jax.numpy as jnp

    x, out_size = a[0], [int(d) for d in a[1]]
    h, w = x.shape[2], x.shape[3]
    oh, ow = out_size
    if (oh, ow) == (1, 1):
        return [jnp.mean(x, axis=(2, 3), keepdims=True)]
    if h % oh == 0 and w % ow == 0:
        r = jnp.reshape(x, x.shape[:2] + (oh, h // oh, ow, w // ow))
        return [jnp.mean(r, axis=(3, 5))]
    raise UnsupportedOp(f"adaptive_avg_pool2d {h, w} -> {oh, ow}")


@aten("aten::_adaptive_avg_pool2d_backward",
      "aten::adaptive_avg_pool2d_backward")
def _adaptive_avg_pool2d_backward(a, meta):
    import jax.numpy as jnp

    grad, x = a[0], a[1]
    h, w = x.shape[2], x.shape[3]
    oh, ow = grad.shape[2], grad.shape[3]
    if h % oh or w % ow:
        raise UnsupportedOp("non-divisible adaptive pool backward")
    g = grad / ((h // oh) * (w // ow))
    g = jnp.broadcast_to(
        g[:, :, :, None, :, None],
        grad.shape[:2] + (oh, h // oh, ow, w // ow),
    )
    return [jnp.reshape(g, x.shape)]


@aten("aten::ones", "aten::zeros", "aten::empty", "aten::empty_strided")
def _factory(a, meta):
    import jax.numpy as jnp

    shape = [int(d) for d in a[0]] if isinstance(a[0], (list, tuple)) else []
    fill = jnp.ones if meta["name"] == "aten::ones" else jnp.zeros
    return [fill(shape, dtype=meta.get("float_dtype", jnp.float32))]


@aten("aten::full")
def _full(a, meta):
    import jax.numpy as jnp

    shape = [int(d) for d in a[0]] if isinstance(a[0], (list, tuple)) else []
    return [jnp.full(shape, a[1], dtype=meta.get("float_dtype", jnp.float32))]


@aten("aten::arange")
def _arange(a, meta):
    import jax.numpy as jnp

    lits = [x for x in a if isinstance(x, (int, float))]
    if len(lits) >= 3:
        return [jnp.arange(lits[0], lits[1], lits[2])]
    if len(lits) == 2:
        return [jnp.arange(lits[0], lits[1])]
    return [jnp.arange(lits[0])]


@aten("aten::item")
def _item(a, meta):
    import jax.numpy as jnp

    return [jnp.reshape(a[0], (-1,))[0]]


@aten("aten::slice")
def _slice(a, meta):
    import jax.lax as lax

    x, dim = a[0], int(a[1])
    start = int(a[2]) if a[2] is not None else 0
    end = int(a[3]) if a[3] is not None else x.shape[dim]
    step = int(a[4]) if len(a) > 4 and a[4] is not None else 1
    end = min(end, x.shape[dim])
    if start < 0:
        start += x.shape[dim]
    if end < 0:
        end += x.shape[dim]
    return [lax.slice_in_dim(x, start, end, stride=step, axis=dim)]


@aten("aten::slice_backward")
def _slice_backward(a, meta):
    import jax.numpy as jnp

    grad, sizes, dim = a[0], [int(d) for d in a[1]], int(a[2])
    start = int(a[3]) if a[3] is not None else 0
    step = int(a[5]) if len(a) > 5 and a[5] is not None else 1
    if step != 1:
        raise UnsupportedOp("strided slice_backward")
    out = jnp.zeros(sizes, dtype=grad.dtype)
    idx = [slice(None)] * len(sizes)
    idx[dim] = slice(start, start + grad.shape[dim])
    return [out.at[tuple(idx)].set(grad)]


@aten("aten::unsqueeze")
def _unsqueeze(a, meta):
    import jax.numpy as jnp

    return [jnp.expand_dims(a[0], int(a[1]))]


@aten("aten::squeeze")
def _squeeze(a, meta):
    import jax.numpy as jnp

    if len(a) > 1 and isinstance(a[1], int):
        x = a[0]
        return [jnp.squeeze(x, a[1]) if x.shape[a[1]] == 1 else x]
    return [jnp.squeeze(a[0])]


@aten("aten::split")
def _split(a, meta):
    import jax.numpy as jnp

    x = a[0]
    dim = int(a[2]) if len(a) > 2 else 0
    if isinstance(a[1], (list, tuple)):
        splits = np.cumsum([int(s) for s in a[1]])[:-1].tolist()
    else:
        step = int(a[1])
        splits = list(range(step, x.shape[dim], step))
    return [jnp.split(x, splits, axis=dim)]


@aten("aten::chunk")
def _chunk(a, meta):
    # chunk(Tensor self, int chunks, int dim=0) -> Tensor[]
    # torch rounds section size UP, so the last chunk may be short
    import jax.numpy as jnp

    x = a[0]
    chunks = int(a[1])
    dim = int(a[2]) if len(a) > 2 else 0
    step = -(-x.shape[dim] // chunks)
    splits = list(range(step, x.shape[dim], step))
    return [jnp.split(x, splits, axis=dim)]


@aten("aten::where")
def _where(a, meta):
    import jax.numpy as jnp

    return [jnp.where(a[0], a[1], a[2])]


@aten("aten::dropout", "aten::dropout_")
def _dropout(a, meta):
    # values-identity (eval semantics); torch's train-mode mask generation
    # is a fused RNG the recorded stream doesn't expose as a separate op
    return [a[0]]


@aten("aten::native_dropout")
def _native_dropout(a, meta):
    import jax.numpy as jnp

    return [a[0], jnp.ones(a[0].shape, dtype=jnp.bool_)]


@aten("aten::native_dropout_backward")
def _native_dropout_backward(a, meta):
    grad, mask, scale = a[0], a[1], a[2]
    return [grad * mask.astype(grad.dtype) * scale]


@aten("aten::tanh_backward")
def _tanh_backward(a, meta):
    grad, out = a[0], a[1]
    return [grad * (1 - out * out)]


@aten("aten::native_layer_norm")
def _native_layer_norm(a, meta):
    import jax.numpy as jnp

    x = a[0]
    nshape = [int(d) for d in a[1]]
    axes = tuple(range(x.ndim - len(nshape), x.ndim))
    eps = a[4] if len(a) > 4 and isinstance(a[4], float) else 1e-5
    mu = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    rstd = 1.0 / jnp.sqrt(var + eps)
    out = (x - mu) * rstd
    if len(a) > 2 and a[2] is not None:
        out = out * a[2]
    if len(a) > 3 and a[3] is not None:
        out = out + a[3]
    return [out, mu, rstd]


@aten("aten::native_layer_norm_backward")
def _native_layer_norm_backward(a, meta):
    import jax
    import jax.numpy as jnp

    # (grad_out, input, normalized_shape, mean, rstd, weight, bias, mask)
    grad_out, x = a[0], a[1]
    nshape = [int(d) for d in a[2]]
    w = a[5] if len(a) > 5 else None
    axes = tuple(range(x.ndim - len(nshape), x.ndim))
    eps = 1e-5

    def fwd(xx, ww):
        mu = jnp.mean(xx, axis=axes, keepdims=True)
        var = jnp.var(xx, axis=axes, keepdims=True)
        out = (xx - mu) / jnp.sqrt(var + eps)
        return out * ww

    wv = jnp.ones(nshape, dtype=x.dtype) if w is None else w
    _, vjp = jax.vjp(fwd, x, wv)
    gi, gw = vjp(grad_out)
    bdims = tuple(range(x.ndim - len(nshape)))
    gb = jnp.sum(grad_out, axis=bdims)
    return [gi, gw, gb]


@aten("aten::embedding_backward", "aten::embedding_dense_backward")
def _embedding_backward(a, meta):
    import jax.numpy as jnp

    grad, idx, num_weights = a[0], a[1], int(a[2])
    flat_idx = jnp.reshape(idx, (-1,)).astype(jnp.int32)
    flat_grad = jnp.reshape(grad, (-1, grad.shape[-1]))
    out = jnp.zeros((num_weights, grad.shape[-1]), dtype=grad.dtype)
    return [out.at[flat_idx].add(flat_grad)]


@aten("aten::_foreach_sqrt")
def _foreach_sqrt(a, meta):
    import jax.numpy as jnp

    return [[jnp.sqrt(t) for t in a[0]]]


@aten("aten::_foreach_div_", "aten::_foreach_div")
def _foreach_div(a, meta):
    other = a[1]
    if isinstance(other, list):
        return [[t / o for t, o in zip(a[0], other)]]
    return [[t / other for t in a[0]]]


@aten("aten::_foreach_lerp_", "aten::_foreach_lerp")
def _foreach_lerp(a, meta):
    w = a[2]
    if isinstance(w, list):
        return [[t + ww * (e - t) for t, e, ww in zip(a[0], a[1], w)]]
    return [[t + w * (e - t) for t, e in zip(a[0], a[1])]]


def _per_tensor_scalars(val, n):
    """foreach value= arg: one scalar, or a per-tensor list (Adam's
    step-size variant)."""
    if isinstance(val, list):
        return val
    return [val] * n


@aten("aten::_foreach_addcmul_", "aten::_foreach_addcmul")
def _foreach_addcmul(a, meta):
    vals = _per_tensor_scalars(a[3] if len(a) > 3 else 1, len(a[0]))
    return [[t + v * x * y
             for t, x, y, v in zip(a[0], a[1], a[2], vals)]]


@aten("aten::_foreach_addcdiv_", "aten::_foreach_addcdiv")
def _foreach_addcdiv(a, meta):
    vals = _per_tensor_scalars(a[3] if len(a) > 3 else 1, len(a[0]))
    return [[t + v * x / y
             for t, x, y, v in zip(a[0], a[1], a[2], vals)]]


@aten("aten::narrow")
def _narrow(a, meta):
    import jax.lax as lax

    x, dim, start, length = a[0], int(a[1]), int(a[2]), int(a[3])
    if start < 0:
        start += x.shape[dim]
    return [lax.slice_in_dim(x, start, start + length, axis=dim)]


@aten("aten::select")
def _select(a, meta):
    import jax.numpy as jnp

    x, dim, index = a[0], int(a[1]), int(a[2])
    return [jnp.take(x, index, axis=dim)]


@aten("aten::record_stream", "fbgemm::bounds_check_indices")
def _noop(a, meta):
    return []  # stream bookkeeping / in-place checks: no outputs


@aten("aten::pin_memory", "aten::resolve_conj", "aten::resolve_neg")
def _identity_move(a, meta):
    return [a[0]]


@aten("aten::numpy_T")
def _numpy_t(a, meta):
    import jax.numpy as jnp

    return [jnp.transpose(a[0])]


@aten("aten::new_zeros", "aten::new_empty")
def _new_zeros(a, meta):
    import jax.numpy as jnp

    shape = [int(d) for d in a[1]] if isinstance(a[1], (list, tuple)) else []
    return [jnp.zeros(shape, dtype=a[0].dtype)]


@aten("aten::split_with_sizes")
def _split_with_sizes(a, meta):
    import jax.numpy as jnp

    x, sizes = a[0], [int(s) for s in a[1]]
    dim = int(a[2]) if len(a) > 2 else 0
    return [jnp.split(x, np.cumsum(sizes)[:-1].tolist(), axis=dim)]


@aten("aten::cumsum")
def _cumsum(a, meta):
    import jax.numpy as jnp

    return [jnp.cumsum(a[0], axis=int(a[1]) if len(a) > 1 else 0)]


def _adv_index(lst):
    """torch advanced-index tuple: None slots are full slices (torch
    semantics for leading Nones in aten::index / index_put_)."""
    if not isinstance(lst, list):
        lst = [lst]
    out = tuple(
        slice(None) if (e is None or isinstance(e, str))
        else e.astype("int32")
        for e in lst
    )
    return out if any(not isinstance(e, slice) for e in out) else None


@aten("aten::index")
def _index(a, meta):
    idx = _adv_index(a[1])
    return [a[0] if idx is None else a[0][idx]]


@aten("aten::_index_put_impl_", "aten::index_put_")
def _index_put(a, meta):
    idx = _adv_index(a[1])
    if idx is None:
        return [a[0]]
    accumulate = bool(a[3]) if len(a) > 3 and isinstance(a[3], bool) else False
    upd = a[0].at[idx]
    return [upd.add(a[2]) if accumulate else upd.set(a[2])]


@aten("aten::binary_cross_entropy_with_logits")
def _bce_logits(a, meta):
    import jax
    import jax.numpy as jnp

    logits, target = a[0], a[1]
    reduction = _reduction(a[4] if len(a) > 4 else 1)
    per = (jnp.maximum(logits, 0) - logits * target
           + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    del jax
    if reduction == "mean":
        return [jnp.mean(per)]
    if reduction == "sum":
        return [jnp.sum(per)]
    return [per]


@aten("aten::binary_cross_entropy_with_logits_backward")
def _bce_logits_bwd(a, meta):
    import jax

    grad, logits, target = a[0], a[1], a[2]
    n = float(np.prod(logits.shape))
    return [grad * (jax.nn.sigmoid(logits) - target) / n]


# ---- fbgemm sparse plumbing (the DLRM production-trace op family) ------
# The trace records tensor SHAPES but not contents, and these ops' output
# layout depends on contents (CSR offsets, table dim maps).  The impls
# synthesize a uniform bag structure with the SAME row count and HBM
# traffic as the recorded op — the perf question ET replay answers — and
# take the output shape from the trace (meta["out_shapes"]).  Reference:
# the TorchScript replay has the same fidelity limit (materialized
# storage is random there too, et_replay.py:891-941).


@aten("fbgemm::asynchronous_complete_cumsum")
def _fbgemm_cumsum(a, meta):
    import jax.numpy as jnp

    t = a[0]
    return [jnp.concatenate([jnp.zeros((1,), t.dtype), jnp.cumsum(t)])]


@aten("fbgemm::permute_2D_sparse_data")
def _fbgemm_permute_2d(a, meta):
    import jax.numpy as jnp

    perm, lengths, values = a[0], a[1], a[2]
    p = jnp.clip(perm.astype(jnp.int32), 0, lengths.shape[0] - 1)
    return [jnp.take(lengths, p, axis=0), values, None]


def _fbgemm_lookup(dev_weights, indices, out_shape):
    """Uniform-layout embedding-bag lookup over the flat fbgemm weight
    blob: gathers exactly len(indices) rows of D floats and segment-sums
    them into (B, total_D) — the recorded op's row count and traffic."""
    import jax.numpy as jnp

    b, total_d = int(out_shape[0]), int(out_shape[1])
    n_idx = indices.shape[0]
    rows = max(1, dev_weights.shape[0] // max(total_d, 1))
    table = dev_weights[: rows * total_d].reshape(rows, total_d)
    idx = (indices.astype(jnp.int32) % rows)
    gathered = jnp.take(table, idx, axis=0)  # (n_idx, total_D)
    bag = (jnp.arange(n_idx, dtype=jnp.int32) * b) // max(n_idx, 1)
    out = jnp.zeros((b, total_d), table.dtype).at[bag].add(gathered)
    return out


@aten("fbgemm::dense_embedding_codegen_lookup_function")
def _fbgemm_dense_lookup(a, meta):
    return [_fbgemm_lookup(a[0], a[7], meta["out_shapes"][0])]


@aten("fbgemm::split_embedding_codegen_lookup_adagrad_function",
      "fbgemm::split_embedding_codegen_lookup_sgd_function",
      "fbgemm::split_embedding_codegen_lookup_rowwise_adagrad_function")
def _fbgemm_split_lookup(a, meta):
    return [_fbgemm_lookup(a[1], a[11], meta["out_shapes"][0])]


def supported_aten_ops() -> List[str]:
    return sorted(_ATEN)


# --------------------------------------------------------------------------
# the replayer
# --------------------------------------------------------------------------


@dataclass
class OpStat:
    count: int = 0
    lat_us: List[float] = field(default_factory=list)

    def total_us(self) -> float:
        return sum(self.lat_us)


class PyTorchOpReplay:
    """Op-level compute replay of a PyTorch ET on the current JAX backend.

    Reference analogue: ``et_replay/tools/et_replay.py`` ReplayManager in
    ``ReplayMode.COMP`` (``:468`` extract_subgraph, ``:829`` build_func).
    """

    def __init__(
        self,
        data: Dict[str, Any],
        max_ops: Optional[int] = None,
        skip_names: Optional[set] = None,
        skip_config_path: Optional[str] = None,
        mode: str = "comp",
        backend=None,
        target_rank: int = 0,
        auto_shrink: bool = True,
        triton_surrogate: bool = True,
        cast: Optional[str] = None,
        fuse: Optional[str] = None,
        max_tensor_bytes: Optional[int] = None,
    ):
        """``mode="comp"`` replays the ATen stream only (reference
        ReplayMode.COMP); ``mode="full"`` interleaves the
        ``record_param_comms`` nodes through ``backend`` at their recorded
        positions (ReplayMode.FULL, et_replay.py:512-524) — the whole
        production step, compute AND collectives, on the live mesh."""
        assert mode in ("comp", "full"), mode
        if mode == "full" and backend is None:
            raise ValueError("full mode needs a backend")
        # what-if dtype cast: replay the recorded fp32 op stream in bf16,
        # the TPU-native precision (the trace stays the source of truth for
        # shapes/ops; only float tensor materialization changes).  The
        # reference has no analogue — its replay is bound to the recorded
        # torch dtypes.
        import jax.numpy as jnp

        assert cast in (None, "bf16", "bfloat16"), cast
        self._float_dtype = jnp.bfloat16 if cast else jnp.float32
        self.cast = bool(cast)
        self.et = PyTorchETrace(data)
        self.mode = mode
        self.triton_surrogate = triton_surrogate
        self.max_ops = max_ops
        self.skip_names = set(skip_names or ())
        self.skip_config_path = skip_config_path
        # fbgemm weight-blob surrogate shrinking: production DLRM traces
        # record multi-GB flat embedding blobs (the dlrm fixture's adagrad
        # op reads a 2.4 GB dev_weights tensor) whose replay semantics
        # only need SOME rows to gather — _fbgemm_lookup derives its row
        # count from the blob it is given and wraps indices mod rows, so a
        # shrunk surrogate keeps the op executable (same indices count,
        # same output shape) on memory-bounded targets.  None = replay the
        # recorded sizes verbatim.
        self.max_tensor_bytes = max_tensor_bytes
        self._shrunk: Dict[Tuple[int, int], Tuple[Tuple[int, ...],
                                                  Tuple[int, ...]]] = {}
        self.nodes: List[PtNode] = []
        self.registry: Dict[Tuple[int, int], Any] = {}
        self.stats: Dict[str, OpStat] = {}
        self.skipped: Dict[str, str] = {}  # name -> reason
        self._jit_cache: Dict[Any, Any] = {}
        self._select_nodes()
        # what-if kernel fusion: swap detected attention windows for one
        # flash-attention call each (trace/attention_fusion.py) — measures
        # what the recorded model would cost with fused attention on this
        # chip, complementing the --cast precision what-if.
        #
        # "attention" fuses FORWARD windows only — measured on hf_GPT2
        # (S=512): fwd fusion 31.3 -> 29.4 ms/iter, while additionally
        # replacing the backward windows gave the 2.2 ms back (flash
        # bwd's S-recompute exceeds its HBM savings at short S, and the
        # synthesized o/lse residuals add reads; see RESULTS.md).
        # "attention-train" opts into the bwd windows too — the right
        # what-if for long-sequence training traces.
        assert fuse in (None, "attention", "attention-train"), fuse
        self.fused_windows: List[Any] = []
        self._fused_skip: set = set()
        self._fused_emit: Dict[int, Any] = {}
        if fuse in ("attention", "attention-train"):
            from param_tpu.trace.attention_fusion import (
                find_attention_bwd_windows, find_attention_windows)

            self.fused_windows = find_attention_windows(self.nodes)
            # backward windows of a recorded training iteration replay as
            # flash_attention_bwd calls (the o/lse residuals the recorded
            # graph never saved are synthesized as external inputs)
            self.fused_bwd_windows = (
                find_attention_bwd_windows(self.nodes)
                if fuse == "attention-train" else [])
            for w in (*self.fused_windows, *self.fused_bwd_windows):
                if w.skip_ids & self._fused_skip:
                    continue  # overlapping match — keep the earlier window
                self._fused_skip |= w.skip_ids
                self._fused_emit[w.anchor_id] = w
        else:
            self.fused_bwd_windows = []
        self._comms = None
        if mode == "full":
            from param_tpu.trace.replay import CommsReplay, ReplayParams

            self._comms = CommsReplay(backend, ReplayParams(
                trace_type="pytorch_et", target_rank=target_rank,
                auto_shrink=auto_shrink, num_replays=1,
                num_warmup_replays=0))
            self._comms.load(data)
            self._comm_ops = {op.id: op for op in self._comms.ops}

    # ------------------------------------------------------------ selection
    def _select_nodes(self) -> None:
        """Top-most op_schema nodes in id order, windowed to the first
        ProfilerStep interval (reference extract_subgraph semantics)."""
        by_id = self.et.by_id
        children: Dict[int, List[PtNode]] = {}
        roots: List[PtNode] = []
        for n in self.et.nodes:
            if n.parent in by_id and n.parent != n.id:
                children.setdefault(n.parent, []).append(n)
            else:
                roots.append(n)
        picked: List[PtNode] = []
        step_ids: List[int] = []

        def dfs(n: PtNode) -> None:
            if "ProfilerStep" in n.name:
                step_ids.append(n.id)
            if n.is_operator():
                picked.append(n)
                return
            for c in sorted(children.get(n.id, []), key=lambda x: x.id):
                dfs(c)

        for r in sorted(roots, key=lambda x: x.id):
            dfs(r)
        picked.sort(key=lambda x: x.id)
        step_ids.sort()
        if len(step_ids) > 1:
            picked = [n for n in picked
                      if step_ids[0] < n.id < step_ids[1]]
        # comp mode: comm records belong to the comm replayer;
        # full mode keeps them inline at their recorded positions
        if self.mode == "comp":
            picked = [n for n in picked if n.name != "record_param_comms"]
        if self.max_ops:
            picked = picked[: self.max_ops]
        self.nodes = picked

    # -------------------------------------------------------- tensor plumb
    def _materialize(self, desc, type_token: str):
        import jax.numpy as jnp

        key = _tensor_key(desc)
        shape = self._shape_of(desc)
        dt = _np_dtype(type_token)
        rng = np.random.default_rng(0 if key is None else key[0])
        if np.issubdtype(np.dtype(dt) if dt != jnp.bfloat16 else np.float32,
                         np.floating) or dt == jnp.bfloat16:
            if self.cast and dt in (np.float32, np.float64):
                dt = jnp.bfloat16
            arr = rng.random(shape, dtype=np.float32).astype(dt)
        elif dt == np.bool_:
            # all-true masks keep the dataflow live (dropout masks, where
            # conditions) — zeros would zero out whole branches
            arr = np.ones(shape, dtype=np.bool_)
        else:
            # ones are always-safe indices/targets (reference materializes
            # unknown int tensors as ones too, et_replay.py:936-941)
            arr = np.ones(shape, dtype=dt)
        return jnp.asarray(arr)

    def _shape_of(self, desc) -> Tuple[int, ...]:
        # shape comes from the per-slot shapes metadata captured in resolve
        return tuple(self._cur_shape)

    def _resolve_tensor(self, desc, shape, type_token, shrinkable=False):
        key = _tensor_key(desc)
        # a missing optional (nullptr) stays None; a REAL zero-size tensor
        # (empty grads etc.) materializes as an empty array so view/sum/
        # empty_like over it replay instead of skipping
        if key is None or "nullptr" in (type_token or ""):
            return None
        if key in self._shrunk:
            # surrogate tensors keep their shrunk shape on every resolve
            # (the recorded shape would fail the registry shape test and
            # re-materialize a fresh blob per op)
            return self.registry[key]
        self._cur_shape = [int(d) for d in shape]
        # Surrogate shrinking applies only to FLOAT blobs (weight /
        # momentum slabs) on their FIRST materialization: indices and
        # offsets must keep the recorded count (the shrunk lookup wraps
        # them mod rows, so the op's output shape is unchanged), and a
        # key some earlier op already materialized at full size must stay
        # full for those consumers.
        if (shrinkable and self.max_tensor_bytes
                and key not in self.registry
                and "float" in (type_token or "").lower()
                and self._cur_shape
                and int(np.prod(self._cur_shape)) * 4 > self.max_tensor_bytes):
            orig = tuple(self._cur_shape)
            factor = -(-int(np.prod(orig)) * 4 // self.max_tensor_bytes)
            self._cur_shape[0] = max(1, self._cur_shape[0] // factor)
            self._shrunk[key] = (orig, tuple(self._cur_shape))
            val = self._materialize(desc, type_token)
            self.registry[key] = val
            return val
        if key in self.registry:
            val = self.registry[key]
            want = tuple(self._cur_shape)
            if tuple(val.shape) == want:
                return val
            if int(np.prod(val.shape)) == int(np.prod(want)):
                import jax
                import jax.numpy as jnp

                if isinstance(val, jax.ShapeDtypeStruct):
                    # abstract pass (build_chain): reshape without values
                    return jax.ShapeDtypeStruct(want, val.dtype)
                return jnp.reshape(val, want)
        val = self._materialize(desc, type_token)
        self.registry[key] = val
        return val

    def _resolve_args(self, node: PtNode):
        """-> (args, arrays, spec): args with arrays in tensor slots;
        arrays flat-listed for jit; spec distinguishes compile signatures."""
        args: List[Any] = []
        arrays: List[Any] = []
        spec: List[Any] = []
        for i, (v, t) in enumerate(zip(node.inputs, node.input_types)):
            shape = node.input_shapes[i] if i < len(node.input_shapes) else []
            if _is_tensor_slot(t):
                arr = self._resolve_tensor(
                    v, shape, t,
                    shrinkable=node.name.startswith("fbgemm::")
                    and "lookup" in node.name)
                args.append(arr)
                if arr is None:
                    spec.append(("null",))
                else:
                    arrays.append(arr)
                    spec.append(("T", tuple(arr.shape), str(arr.dtype)))
            elif _is_tensor_list_slot(t):
                toks = t[len("GenericList["):-1].split(",")
                lst = []
                sp = []
                for j, d in enumerate(v):
                    tok = toks[min(j, len(toks) - 1)]
                    if d == "<None>" or "nullptr" in tok or tok == "None":
                        lst.append(None)  # torch indices lists hold Nones
                        sp.append(("null",))
                        continue
                    arr = self._resolve_tensor(
                        d, shape[j] if j < len(shape) else [], tok)
                    lst.append(arr)
                    if arr is None:
                        sp.append(("null",))
                    else:
                        arrays.append(arr)
                        sp.append((tuple(arr.shape), str(arr.dtype)))
                args.append(lst)
                spec.append(("L", tuple(sp)))
            else:
                # missing optionals: type "None" / value "<None>" (1.1.0)
                lit = None if (t == "None" or v == "<None>") else v
                args.append(lit)
                spec.append(("lit", repr(lit)))
        return args, arrays, tuple(spec)

    def _register_outputs(self, node: PtNode, outs: List[Any]) -> None:
        for j, (v, t) in enumerate(zip(node.outputs, node.output_types)):
            if j >= len(outs):
                break
            if _is_tensor_slot(t):
                key = _tensor_key(v)
                if key is not None and outs[j] is not None:
                    self.registry[key] = outs[j]
            elif _is_tensor_list_slot(t) and isinstance(outs[j], list):
                for d, val in zip(v, outs[j]):
                    key = _tensor_key(d)
                    if key is not None:
                        self.registry[key] = val

    # ------------------------------------------------------------ execution
    def _compiled(self, node: PtNode, args, arrays, spec):
        """One jit program per distinct (op, signature) — the reference's
        per-node TorchScript func, shared across equal-signature nodes."""
        import jax

        # out_shapes participate in the key: fbgemm output layouts depend
        # on tensor contents the trace doesn't carry, so equal input
        # signatures can still produce different output shapes
        key = (node.name, node.op_schema, spec, repr(node.output_shapes))
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        impl = _ATEN[node.name]
        meta = {"name": node.name, "schema": node.op_schema,
                "out_shapes": node.output_shapes,
                "float_dtype": self._float_dtype}

        def rebuild(arrs):
            out, it = [], iter(arrs)
            for s, a in zip(spec, args):
                if s[0] == "T":
                    out.append(next(it))
                elif s[0] == "L":
                    out.append([None if e == ("null",) else next(it)
                                for e in s[1]])
                else:
                    out.append(a)
            return out

        def run(*arrs):
            return impl(rebuild(list(arrs)), meta)

        fn = jax.jit(run)
        self._jit_cache[key] = fn
        return fn

    def _fused_attention_outs(self, w, abstract: bool = False):
        """Emit one flash-attention call for a matched window (--fuse
        attention): q/k/v resolve from the registry exactly like any node
        input, so they chain off the upstream projection ops.

        Backward windows (AttnBwdWindow) emit flash_attention_bwd instead:
        q/k/v/dO resolve from the trace; the o/lse residuals the recorded
        eager graph never materialized are synthesized as external inputs
        (cost-honest: the fused training path would stream them from HBM
        exactly like this).  The dV and dK^T matmul outputs the window
        replaces are registered directly so downstream reshapes chain."""
        import jax
        import jax.numpy as jnp

        from param_tpu.ops.attention import flash_attention
        from param_tpu.trace.attention_fusion import AttnBwdWindow

        if isinstance(w, AttnBwdWindow):
            return self._fused_attention_bwd_outs(w, abstract)

        q = self._resolve_tensor(w.q[0], w.q[1], w.q[2])
        k = self._resolve_tensor(w.k[0], w.k[1], w.k[2])
        v = self._resolve_tensor(w.v[0], w.v[1], w.v[2])
        fn = functools.partial(
            flash_attention, causal=w.causal, scale=w.scale)
        if abstract or any(isinstance(t, jax.ShapeDtypeStruct)
                           for t in (q, k, v)):
            return [jax.eval_shape(fn, q, k, v)]
        return [fn(q, k, v)]

    def _fused_attention_bwd_outs(self, w, abstract: bool = False):
        import jax
        import jax.numpy as jnp

        from param_tpu.ops.attention import flash_attention_bwd

        b, h, sq, sk, d = w.shape

        def get(slot, want4):
            t = self._resolve_tensor(slot[0], slot[1], slot[2])
            if slot[3]:  # saved tensor is transposed (e.g. cached K^T)
                if isinstance(t, jax.ShapeDtypeStruct):
                    t = jax.ShapeDtypeStruct(
                        t.shape[:-2] + (t.shape[-1], t.shape[-2]), t.dtype)
                else:
                    t = jnp.swapaxes(t, -1, -2)
            if isinstance(t, jax.ShapeDtypeStruct):
                return jax.ShapeDtypeStruct(want4, t.dtype)
            return jnp.reshape(t, want4)

        q = get(w.q, (b, h, sq, d))
        k = get(w.k, (b, h, sk, d))
        v = get(w.v, (b, h, sk, d))
        do = get(w.do, (b, h, sq, d))
        # synthesized residuals: unique high ids keep them out of the
        # trace's key space; they materialize once and ride the chain's
        # external-input list like any other tensor
        base = 1_000_000_000 + 2 * w.index
        o = self._resolve_tensor(
            [base, base, 0, b * h * sq * d, 4, "synthetic"],
            (b, h, sq, d), w.do[2])
        lse = self._resolve_tensor(
            [base + 1, base + 1, 0, b * h * sq * 128, 4, "synthetic"],
            (b * h, sq, 128), "Tensor(float)")
        if not isinstance(lse, jax.ShapeDtypeStruct):
            # replayed values are random, so exp(s - lse) in the kernel
            # would overflow for large recorded activations; a large lse
            # offset underflows P to exact zeros — identical cost (the
            # exp/matmul work is value-independent), finite dataflow
            lse = lse + jnp.asarray(1e6, lse.dtype)

        fn = functools.partial(
            flash_attention_bwd, causal=w.causal, scale=w.scale)
        args = (q, k, v, o, lse, do)
        if abstract or any(isinstance(t, jax.ShapeDtypeStruct)
                           for t in args):
            dq, dk, dv = jax.eval_shape(fn, *args)
            abstract = True
        else:
            dq, dk, dv = fn(*args)

        # register every replaced matmul's recorded output; the anchor's
        # own slot is returned for run_node's _register_outputs
        anchor_val = None
        for node_id, desc, shape, kind in w.outs:
            src = {"dq": dq, "dkT": dk, "dv": dv}[kind]
            if abstract:
                val = jax.ShapeDtypeStruct(tuple(shape), src.dtype)
            else:
                t = jnp.reshape(src, (b * h, -1, d))
                if kind == "dkT":
                    t = jnp.swapaxes(t, -1, -2)
                val = jnp.reshape(t, tuple(shape))
            key = _tensor_key(desc)
            if key is not None:
                self.registry[key] = val
            if node_id == w.anchor_id:
                anchor_val = val
        return [anchor_val]

    def run_node(self, node: PtNode, timed: bool = True,
                 abstract: bool = False) -> Optional[float]:
        """Replay one node; returns latency in us (None if skipped).

        ``abstract=True`` (build_chain's materialization pass) traces the
        node with :func:`jax.eval_shape` instead of executing it: external
        inputs still materialize concretely, but no op runs on the device —
        no per-op remote compiles, no HBM held by intermediates, and the
        skip decisions are platform-independent."""
        import jax

        if node.name in self.skip_names or node.name in self.skipped:
            return None
        if node.id in self._fused_skip:
            w = self._fused_emit.get(node.id)
            if w is None:
                return None  # interior of a fused attention window
            try:
                if abstract:
                    outs = self._fused_attention_outs(w, abstract=True)
                    self._register_outputs(node, list(outs))
                    return 0.0
                outs = self._fused_attention_outs(w)
                jax.block_until_ready(outs)
                if timed:
                    t0 = time.perf_counter()
                    outs = self._fused_attention_outs(w)
                    jax.block_until_ready(outs)
                    dt = (time.perf_counter() - t0) * 1e6
                else:
                    dt = 0.0
                self._register_outputs(node, list(outs))
                from param_tpu.trace.attention_fusion import AttnBwdWindow
                label = ("fused::flash_attention_bwd"
                         if isinstance(w, AttnBwdWindow)
                         else "fused::flash_attention")
                st = self.stats.setdefault(label, OpStat())
                st.count += 1
                if timed:
                    st.lat_us.append(dt)
                return dt
            except Exception as e:
                # degrade without poisoning the name-keyed skip table
                # (the anchor is a plain aten::matmul)
                log.warning("fused attention window at node %d failed: %s",
                            node.id, e)
                return None
        if abstract and node.name == "record_param_comms":
            return None  # not part of the fused compute chain
        if node.name == "record_param_comms":
            return self._run_comm(node, timed)
        if node.kernel_backend == "triton":
            # the reference compiles these from the trace's resources dir
            # (build_triton_func, et_replay_utils.py:215); CUDA source has
            # no TPU mapping.  Pointwise/reduction triton kernels are
            # bandwidth-bound, so a traffic-equivalent surrogate (read all
            # tensor inputs, write the recorded output shapes) preserves
            # the op's HBM cost; disable via triton_surrogate=False for
            # the plain skip path.
            if not self.triton_surrogate:
                self._skip(node, "PT2 triton kernel (CUDA source)")
                return None
            return self._run_triton_surrogate(node, timed, abstract)
        if node.name not in _ATEN:
            self._skip(node, "no JAX mapping")
            return None
        try:
            args, arrays, spec = self._resolve_args(node)
            fn = self._compiled(node, args, arrays, spec)
            if abstract:
                outs = jax.eval_shape(fn, *arrays)
                self._register_outputs(node, list(outs))
                return 0.0
            if timed:
                outs = fn(*arrays)  # warm/compile outside the timed window
                jax.block_until_ready(outs)
                t0 = time.perf_counter()
                outs = fn(*arrays)
                jax.block_until_ready(outs)
                dt = (time.perf_counter() - t0) * 1e6
            else:
                outs = fn(*arrays)
                dt = 0.0
            self._register_outputs(node, list(outs))
            st = self.stats.setdefault(node.name, OpStat())
            st.count += 1
            if timed:
                st.lat_us.append(dt)
            return dt
        except UnsupportedOp as e:
            self._skip(node, str(e))
        except Exception as e:  # degrade, reference skip-config semantics
            self._skip(node, f"{type(e).__name__}: {e}")
        return None

    def _run_triton_surrogate(self, node: PtNode, timed: bool,
                              abstract: bool = False) -> Optional[float]:
        """Traffic-equivalent stand-in for a PT2 triton kernel: read every
        tensor input in full, write the recorded output shapes — the HBM
        cost of a bandwidth-bound pointwise/reduction kernel."""
        import jax
        import jax.numpy as jnp

        try:
            args, arrays, spec = self._resolve_args(node)
            key = ("triton", node.name, spec, repr(node.output_shapes))
            fn = self._jit_cache.get(key)
            if fn is None:
                shapes = [[int(d) for d in s] for s in node.output_shapes]

                def run(*arrs):
                    total = jnp.float32(0)
                    for t in arrs:
                        total = total + jnp.mean(t.astype(jnp.float32))
                    return [jnp.full(s, total, jnp.float32) for s in shapes]

                fn = jax.jit(run)
                self._jit_cache[key] = fn
            flat = [a for a in arrays if a is not None]
            if abstract:
                outs = jax.eval_shape(fn, *flat)
                self._register_outputs(node, list(outs))
                return 0.0
            if timed:
                outs = fn(*flat)
                jax.block_until_ready(outs)
                t0 = time.perf_counter()
                outs = fn(*flat)
                jax.block_until_ready(outs)
                dt = (time.perf_counter() - t0) * 1e6
            else:
                outs = fn(*flat)
                dt = 0.0
            self._register_outputs(node, list(outs))
            st = self.stats.setdefault(f"triton:{node.name}", OpStat())
            st.count += 1
            if timed:
                st.lat_us.append(dt)
            return dt
        except Exception as e:  # noqa: BLE001
            self._skip(node, f"triton surrogate failed: {e}")
            return None

    def _run_comm(self, node: PtNode, timed: bool) -> Optional[float]:
        """Full mode: execute a record_param_comms node through the backend
        at its recorded position (reference ReplayMode.FULL)."""
        from param_tpu.trace.comms_trace import SKIP_OPS

        op = self._comm_ops.get(node.id)
        if op is None:
            return None  # init records are executed up front by load()
        backend = self._comms.backend
        t0 = time.perf_counter()
        if op.comms in SKIP_OPS:
            if op.comms == "wait":
                backend.complete_ops()
            elif op.comms == "barrier":
                backend.barrier()
        else:
            args = self._comms.prep_op(op)
            out = backend.collective_fn[op.comms](args)
            if timed:
                backend.complete_ops()
                import jax

                jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) * 1e6
        st = self.stats.setdefault(f"comm:{op.comms}", OpStat())
        st.count += 1
        if timed:
            st.lat_us.append(dt)
        return dt

    def _skip(self, node: PtNode, reason: str) -> None:
        if node.name not in self.skipped:
            log.warning("skipping %s: %s", node.name, reason)
            self.skipped[node.name] = reason
            if self.skip_config_path:
                import json

                with open(self.skip_config_path, "w") as f:
                    json.dump({"skip nodes": self.skipped}, f, indent=1)

    def replay(self, iters: int = 1, timed: bool = True) -> Dict[str, Any]:
        """Discrete-mode replay: every selected node, per-op latency."""
        t0 = time.perf_counter()
        executed = 0
        for _ in range(max(1, iters)):
            for node in self.nodes:
                if self.run_node(node, timed=timed) is not None:
                    executed += 1
        wall = time.perf_counter() - t0
        return self.report(executed, wall, iters)

    def report(self, executed: int, wall_s: float, iters: int):
        per_op = {
            name: {
                "count": st.count,
                "p50_us": percentile(st.lat_us, 50) if st.lat_us else 0.0,
                "total_us": st.total_us(),
            }
            for name, st in sorted(
                self.stats.items(),
                key=lambda kv: -kv[1].total_us())
        }
        return {
            "num_selected": len(self.nodes),
            "num_executed": executed,
            "num_skipped_names": len(self.skipped),
            "skipped": dict(self.skipped),
            "shrunk_tensors": {
                str(k): {"recorded": list(o), "surrogate": list(s)}
                for k, (o, s) in self._shrunk.items()
            },
            "wall_s": wall_s,
            "iters_per_s": iters / wall_s if wall_s > 0 else 0.0,
            "per_op": per_op,
            "fused_attention_windows": [
                {"anchor": w.anchor_id, "shape": list(w.shape),
                 "causal": w.causal, "ops_replaced": len(w.skip_ids)}
                for w in self.fused_windows
            ],
        }

    # ---------------------------------------------------------- chain mode
    def build_chain(self) -> Callable[[int], Any]:
        """The whole supported op stream as ONE fused XLA program, chained
        n times device-side — time with measure_chain (trustworthy on
        remote-attached TPUs; the reference has no analogue: its replay is
        eager per-op CUDA)."""
        import jax
        import jax.numpy as jnp

        # materialize the external inputs ONCE via an ABSTRACT pass
        # (jax.eval_shape per node): decides which nodes execute without
        # running anything on the device — big traces would otherwise pay
        # one remote compile per distinct op AND hold every intermediate
        # in HBM (GPT2's 8581-op stream OOMed a 16 GB chip that way)
        for node in self.nodes:
            self.run_node(node, timed=False, abstract=True)
        def _chainable(n):
            if n.name in self.skipped:
                return False
            if n.kernel_backend == "triton":  # PT2: surrogate joins chain
                return self.triton_surrogate
            return n.name in _ATEN

        runnable = [n for n in self.nodes if _chainable(n)]
        # chain inputs = the EXTERNAL tensors only (concrete); node outputs
        # from the abstract pass are ShapeDtypeStructs and stay out
        ext_keys = [k for k, v in self.registry.items()
                    if not isinstance(v, jax.ShapeDtypeStruct)]
        ext_vals = [self.registry[k] for k in ext_keys]
        self.registry = dict(zip(ext_keys, ext_vals))
        float_pos = [i for i, v in enumerate(ext_vals)
                     if jnp.issubdtype(v.dtype, jnp.floating)]

        def one_iter(vals):
            saved = dict(self.registry)
            self.registry = dict(zip(ext_keys, vals))
            outs_scalar = jnp.float32(0)
            for node in runnable:
                if node.id in self._fused_skip:
                    w = self._fused_emit.get(node.id)
                    if w is None:
                        continue  # interior of a fused attention window
                    outs = self._fused_attention_outs(w)
                    self._register_outputs(node, list(outs))
                    for o in outs:
                        outs_scalar = outs_scalar + jnp.sum(
                            o.astype(jnp.float32)) * jnp.float32(1e-30)
                    continue
                args, arrays, spec = self._resolve_args(node)
                if node.kernel_backend == "triton":
                    # inline the traffic-equivalent surrogate (PT2 traces)
                    shapes = [[int(d) for d in s]
                              for s in node.output_shapes]
                    total = jnp.float32(0)
                    for t in arrays:
                        if t is not None:
                            total = total + jnp.mean(t.astype(jnp.float32))
                    outs = [jnp.full(s, total, jnp.float32) for s in shapes]
                else:
                    impl = _ATEN[node.name]
                    outs = impl(args, {"name": node.name,
                                       "schema": node.op_schema,
                                       "out_shapes": node.output_shapes,
                                       "float_dtype": self._float_dtype})
                self._register_outputs(node, list(outs))
                for o in outs:
                    for leaf in (o if isinstance(o, list) else [o]):
                        if leaf is not None and jnp.issubdtype(
                                leaf.dtype, jnp.floating):
                            # tiny weight keeps values finite while giving
                            # every op a data edge into the chain carry
                            outs_scalar = outs_scalar + jnp.sum(
                                leaf.astype(jnp.float32)
                            ) * jnp.float32(1e-30)
            self.registry = saved
            return outs_scalar

        # dynamic-length loop: ONE compile serves every chain length the
        # timer asks for (a scan with static length would recompile the
        # whole fused program per length — minutes each for big traces)
        @jax.jit
        def prog(vals, n):
            def body(_, carry):
                vals2 = list(vals)
                if float_pos:
                    i = float_pos[0]
                    vals2[i] = vals2[i] + carry.astype(vals2[i].dtype)
                return one_iter(vals2)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        def chain(n: int):
            return prog(ext_vals, jnp.int32(n))

        return chain

    def measure_chain_iteration(self, n_hi: int = 8,
                                max_n: int = 64) -> float:
        """Seconds per full trace iteration via scalar-fetch delta-N."""
        from param_tpu.comms.timing import measure_chain

        chain = self.build_chain()
        return measure_chain(chain, n_lo=1, n_hi=n_hi, max_n=max_n)

    # ------------------------------------------------------------- codegen
    def codegen(self, trace_name: str = "trace") -> str:
        """Emit a STANDALONE executable JAX script of the op stream —
        inline `_ATEN[...]` calls with materialized externals, the stream
        wrapped in one jittable function and timed (reference: et_replay's
        ``--dump`` writing ``benchmark_<rank>.py``, et_replay.py:392-400).
        Unsupported ops degrade to inline comments, like the replay skip
        path."""
        lines = [
            f'"""Auto-generated from {trace_name} by '
            f"param_tpu pt_et codegen.\"\"\"",
            "import time",
            "",
            "import jax",
            "import jax.numpy as jnp",
            "import numpy as np",
            "",
            "from param_tpu.trace.pytorch_op_replay import _ATEN",
            "",
            "",
            "def _mat(shape, dtype, seed):",
            "    rng = np.random.default_rng(seed)",
            "    if np.issubdtype(np.dtype(dtype), np.floating):",
            "        return jnp.asarray(rng.random(shape, dtype=np.float32)"
            ".astype(dtype))",
            "    if np.dtype(dtype) == np.bool_:",
            "        return jnp.asarray(np.ones(shape, dtype=np.bool_))",
            "    return jnp.asarray(np.ones(shape, dtype=dtype))",
            "",
            "",
        ]
        produced: Dict[Tuple[int, int], str] = {}
        ext_lines: List[str] = []
        body: List[str] = []
        import jax.numpy as jnp

        def var(key):
            return f"t_{key[0]}_{key[1]}"

        def ref_tensor(desc, shape, tok):
            key = _tensor_key(desc)
            if key is None or "nullptr" in (tok or ""):
                return "None"
            name = var(key)
            if key not in produced:
                dt = _np_dtype(tok)
                dt_name = ("bfloat16" if dt == jnp.bfloat16
                           else np.dtype(dt).name)
                shp = [int(d) for d in shape]
                ext_lines.append(
                    f'_EXT["{name}"] = _mat({tuple(shp)}, {dt_name!r}, '
                    f"{key[0]})")
                produced[key] = name
            return produced[key]

        for node in self.nodes:
            if node.name in self.skip_names or node.name not in _ATEN:
                body.append(f"    # skipped: {node.name} "
                            f"({'pre-skip' if node.name in self.skip_names else 'no JAX mapping'})")
                continue
            arg_strs = []
            for i, (v, t) in enumerate(zip(node.inputs, node.input_types)):
                shape = (node.input_shapes[i]
                         if i < len(node.input_shapes) else [])
                if _is_tensor_slot(t):
                    arg_strs.append(ref_tensor(v, shape, t))
                elif _is_tensor_list_slot(t):
                    toks = t[len("GenericList["):-1].split(",")
                    elems = []
                    for j, d in enumerate(v):
                        tok = toks[min(j, len(toks) - 1)]
                        if d == "<None>" or "nullptr" in tok or tok == "None":
                            elems.append("None")
                        else:
                            elems.append(ref_tensor(
                                d, shape[j] if j < len(shape) else [], tok))
                    arg_strs.append("[" + ", ".join(elems) + "]")
                else:
                    lit = None if (t == "None" or v == "<None>") else v
                    arg_strs.append(repr(lit))
            meta = {"name": node.name, "schema": "",
                    "out_shapes": node.output_shapes}
            body.append(f"    _o = _ATEN[{node.name!r}]("
                        f"[{', '.join(arg_strs)}], {meta!r})")
            # bind outputs
            for j, (v, t) in enumerate(zip(node.outputs, node.output_types)):
                if _is_tensor_slot(t):
                    key = _tensor_key(v)
                    if key is not None and "nullptr" not in (t or ""):
                        produced[key] = var(key)
                        body.append(f"    {var(key)} = _o[{j}]")
                elif _is_tensor_list_slot(t):
                    for jj, d in enumerate(v):
                        key = _tensor_key(d)
                        if key is not None:
                            produced[key] = var(key)
                            body.append(f"    {var(key)} = _o[{j}][{jj}]")
        # assemble: externals into a pytree ARG (not closure constants —
        # baked-in arrays would both break in-place var reassignment and
        # blow the remote-compile upload on big traces)
        ext_names = sorted({ln.split('"')[1] for ln in ext_lines})
        out = lines + ["_EXT = {}"] + ext_lines + [
            "", "", "@jax.jit", "def run_stream(ext):",
        ]
        out += [f'    {n} = ext["{n}"]' for n in ext_names]
        out += body or ["    pass"]
        live = [v for v in produced.values()]
        tail = live[-1] if live else "jnp.float32(0)"
        out += [
            f"    return {tail}",
            "",
            "",
            'if __name__ == "__main__":',
            "    jax.block_until_ready(run_stream(_EXT))  # compile",
            "    t0 = time.perf_counter()",
            "    jax.block_until_ready(run_stream(_EXT))",
            "    print(f'one iteration: "
            "{(time.perf_counter() - t0) * 1e3:.3f} ms')",
        ]
        return "\n".join(out) + "\n"
