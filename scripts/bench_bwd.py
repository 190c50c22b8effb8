#!/usr/bin/env python
"""Measure the attention backward and the train step on the live device.

Compares the fused single-pass backward (the ≤27k-token default,
ops/flash_bwd._bwd_fused_kernel) against the two-kernel split by running
this twice:

    python scripts/bench_bwd.py                      # fused (auto)
    CFA_BWD_FUSED=0 python scripts/bench_bwd.py --tag split

Rows are scan-chained (utils/timing.time_scanned) — the tunnelled
backend's ~1 ms per-dispatch floor shaves plain-chained readings
(docs/MEMO.md #22). The fwd+bwd shape matches bench.py's training row
(B=1 H=16 N=16384 d=128 causal), the train step matches its flagship
config (271M params, T=4096).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from cuda_flashattention_tpu.ops.attention import flash_attention
from cuda_flashattention_tpu.utils.timing import (
    attention_flops,
    device_peaks,
    time_scanned,
)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tag", default="fused-auto")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--train-only", action="store_true")
    ap.add_argument("--train-iters", type=int, default=4)
    ap.add_argument("--seq", type=int, default=16384)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--d", type=int, default=128)
    opts = ap.parse_args()
    tag = opts.tag

    B, H, N, D = 1, opts.heads, opts.seq, opts.d
    keys = iter(jax.random.split(jax.random.PRNGKey(0), 16))

    def mk(shape):
        return jax.random.uniform(next(keys), shape, jnp.bfloat16,
                                  -0.5, 0.5)

    q, k, v, do = (mk((B, H, N, D)) for _ in range(4))

    if opts.train_only:
        _train(opts, tag)
        return

    # argnums MUST be (0,1,2): with dQ alone, XLA dead-codes the split
    # path's dKdV kernel entirely (unused outputs), making "split" read
    # ~30% fast — it's a dQ-only time, not a backward time.
    grad_fn = jax.grad(
        lambda q, k, v, do: jnp.sum(
            flash_attention(q, k, v, causal=True).astype(jnp.float32)
            * do.astype(jnp.float32)), argnums=(0, 1, 2))

    def fb_step(x, k_, v_, do_):
        dq, dk, dv = grad_fn(x, k_, v_, do_)
        return jnp.tanh(dq + dk + dv)

    t_fb = time_scanned(fb_step, q, k, v, do, inner=4, iters=4)
    fl = (attention_flops(B, H, N, N, D, causal=True)
          + attention_flops(B, H, N, N, D, causal=True, backward=True))
    print(f"[{tag}] fwd+bwd causal N={N}: {fl / t_fb / 1e12:.1f} TF/s "
          f"({t_fb * 1e3:.2f} ms)")

    if opts.skip_train:
        return
    _train(opts, tag)


def _train(opts, tag: str) -> None:
    import optax
    from cuda_flashattention_tpu.models.transformer import (
        TransformerConfig, init_params, make_train_step)
    cfg = TransformerConfig(
        vocab_size=32000, d_model=2048, n_layers=4, n_heads=16,
        n_kv_heads=16, d_head=128, d_ff=5632, max_seq=4096,
        dtype=jnp.bfloat16)
    params = init_params(jax.random.PRNGKey(0), cfg)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 4096), 0,
                                cfg.vocab_size)
    opt = optax.sgd(1e-4)
    step = make_train_step(cfg, opt, donate=False)
    opt_state = opt.init(params)
    t_train = time_scanned(
        lambda p, os_, tk: step(p, os_, tk)[0], params, opt_state,
        tokens, inner=4, iters=opts.train_iters)
    train_flops = (6.0 * n_params * tokens.size
                   + 3 * attention_flops(1, cfg.n_heads, 4096, 4096,
                                         cfg.d_head, causal=True)
                   * cfg.n_layers)
    peak = device_peaks()["peak_tflops"]
    print(f"[{tag}] train 271M T=4096: {tokens.size / t_train:.0f} tok/s, "
          f"MFU {train_flops / t_train / 1e12 / peak * 100:.1f}% "
          f"({t_train * 1e3:.1f} ms/step)")


if __name__ == "__main__":
    main()
