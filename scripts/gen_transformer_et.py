"""Generate a genuine PyTorch execution trace of a long-sequence
transformer block with torch.profiler.ExecutionTraceObserver.

The reference's bundled hf_GPT2 fixture records S=512, where attention is
~3% of the iteration — too small to exercise the ``--fuse attention``
what-if.  This script produces the long-context fixture the fusion study
needs: a pre-LN transformer block with GPT2-style eager attention
(matmul / div / where / softmax / matmul — the exact unfused window the
trace-side pattern matcher targets), at llama2-ish shapes where the
S^2 score matrix dominates.

    python scripts/gen_transformer_et.py --batch 1 --heads 32 \
        --seq 2048 --head-dim 128 --layers 4 \
        --out tests/fixtures/transformer_long_et.json.gz
"""

import argparse
import gzip
import json
import math
import os
import tempfile

import torch
from torch.profiler import ExecutionTraceObserver


class EagerAttention(torch.nn.Module):
    """GPT2-style eager attention (transformers GPT2Attention._attn):
    explicit matmul/div/where/softmax/matmul so the trace records the
    unfused window."""

    def __init__(self, heads: int, head_dim: int, max_seq: int):
        super().__init__()
        d = heads * head_dim
        self.heads, self.head_dim = heads, head_dim
        self.qkv = torch.nn.Linear(d, 3 * d, bias=True)
        self.proj = torch.nn.Linear(d, d, bias=True)
        self.register_buffer(
            "bias", torch.tril(torch.ones(max_seq, max_seq, dtype=torch.bool))
            .view(1, 1, max_seq, max_seq))

    def forward(self, x):
        b, s, _ = x.shape
        q, k, v = self.qkv(x).chunk(3, dim=-1)

        def split(t):
            return t.view(b, s, self.heads, self.head_dim).permute(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        w = torch.matmul(q, k.transpose(-1, -2))
        w = w / torch.full([], math.sqrt(self.head_dim), dtype=w.dtype)
        mask = self.bias[:, :, :s, :s]
        fill = torch.full([], torch.finfo(w.dtype).min, dtype=w.dtype)
        w = torch.where(mask, w, fill)
        w = torch.nn.functional.softmax(w, dim=-1)
        w = torch.nn.functional.dropout(w, p=0.0, training=False)
        o = torch.matmul(w, v)
        o = o.permute(0, 2, 1, 3).reshape(b, s, -1)
        return self.proj(o)


class Block(torch.nn.Module):
    def __init__(self, heads, head_dim, max_seq):
        super().__init__()
        d = heads * head_dim
        self.ln1 = torch.nn.LayerNorm(d)
        self.att = EagerAttention(heads, head_dim, max_seq)
        self.ln2 = torch.nn.LayerNorm(d)
        self.mlp = torch.nn.Sequential(
            torch.nn.Linear(d, 4 * d), torch.nn.GELU(),
            torch.nn.Linear(4 * d, d))

    def forward(self, x):
        x = x + self.att(self.ln1(x))
        return x + self.mlp(self.ln2(x))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--train", action="store_true",
                    help="record a TRAINING iteration (forward + "
                         "loss.backward()), so the trace carries the "
                         "unfused attention backward windows too")
    ap.add_argument("--out", default="tests/fixtures/transformer_long_et.json.gz")
    ns = ap.parse_args()

    torch.manual_seed(0)
    model = torch.nn.Sequential(*[
        Block(ns.heads, ns.head_dim, ns.seq) for _ in range(ns.layers)
    ])
    if not ns.train:
        model = model.eval()
    x = torch.randn(ns.batch, ns.seq, ns.heads * ns.head_dim)

    def run():
        if ns.train:
            model(x).sum().backward()
            model.zero_grad(set_to_none=True)
        else:
            with torch.no_grad():
                model(x)

    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as f:
        tmp = f.name
    obs = ExecutionTraceObserver()
    obs.register_callback(tmp)
    run()  # warm up outside the observed window
    obs.start()
    run()
    obs.stop()
    obs.unregister_callback()

    with open(tmp) as f:
        data = json.load(f)
    os.unlink(tmp)
    with gzip.open(ns.out, "wt") as f:
        json.dump(data, f)
    print(f"wrote {ns.out}: {len(data.get('nodes', []))} raw nodes, "
          f"schema {data.get('schema')}")


if __name__ == "__main__":
    main()
