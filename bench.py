"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.json): FA2-forward attention TFLOP/s per chip at
the reference config "16 heads, seq=16k, d=128, bf16". vs_baseline is the
fraction of the north-star target (70% of the chip's bf16 speed-of-light):
vs_baseline >= 1.0 means the target is met. Supplementary numbers (causal,
fwd+bwd, quantized decode tokens/s vs context) ride in "extra".

Timing uses chained execution + host readback (see utils/timing.py:
time_chained) because the tunnelled TPU backend acks dispatches early.
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from cuda_flashattention_tpu.ops.attention import flash_attention
from cuda_flashattention_tpu.ops.decode import decode_attention
from cuda_flashattention_tpu.ops.flash_fwd import flash_attention_forward
from cuda_flashattention_tpu.ops.quant import quantize_kv
from cuda_flashattention_tpu.utils.timing import (
    attention_flops,
    device_peaks,
    time_chained,
)

B, H, N, D = 1, 16, 16384, 128
SOL_FRACTION_TARGET = 0.70


def main() -> None:
    keys = iter(jax.random.split(jax.random.PRNGKey(0), 64))

    def mk(shape, dtype=jnp.bfloat16):
        # generate on-device: host-side numpy at these sizes (GBs) is slow
        return jax.random.uniform(next(keys), shape, dtype, -0.5, 0.5)

    q, k, v = mk((B, H, N, D)), mk((B, H, N, D)), mk((B, H, N, D))

    # --- headline: FA2 forward bf16 (output feeds next query) ---
    t_fwd = time_chained(
        lambda x: flash_attention_forward(x, k, v)[0], q, iters=10)
    tflops_fwd = attention_flops(B, H, N, N, D) / t_fwd / 1e12

    t_c = time_chained(
        lambda x: flash_attention_forward(x, k, v, causal=True)[0], q,
        iters=10)
    tflops_causal = attention_flops(B, H, N, N, D, causal=True) / t_c / 1e12

    # --- forward+backward (training shape; dq feeds next q) ---
    do = mk((B, H, N, D))
    grad_fn = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(
            flash_attention(q, k, v, causal=True).astype(jnp.float32)
            * do.astype(jnp.float32)), argnums=0))
    t_fb = time_chained(lambda x: jnp.tanh(grad_fn(x, k, v)), q, iters=5)
    tflops_fb = (attention_flops(B, H, N, N, D, causal=True)
                 + attention_flops(B, H, N, N, D, causal=True,
                                   backward=True)) / t_fb / 1e12

    # --- quantized decode tokens/s vs context (serving shape) ---
    decode = {}
    db, dh, dd = 4, 16, 128
    for ctx in (16384, 131072):
        _k, _v = mk((db, dh, ctx, dd)), mk((db, dh, ctx, dd))
        dq = mk((db, dh, dd))
        lengths = jnp.full((db,), ctx, jnp.int32)
        t_bf16 = time_chained(
            lambda x: decode_attention(x, _k, _v, lengths)[0], dq,
            iters=10)
        decode[f"bf16_ctx{ctx}"] = db / t_bf16
        for qt in ("int8", "fp8"):
            kv = quantize_kv(_k, _v, qt)
            t = time_chained(
                lambda x: decode_attention(
                    x, kv.k_q, kv.v_q, lengths, k_scale=kv.k_scale,
                    v_scale=kv.v_scale)[0], dq, iters=10)
            decode[f"{qt}_ctx{ctx}"] = db / t
            del kv
        del _k, _v

    # --- 1M-token context decode, int8 KV (north-star long-context
    # serving point; B=1 so the 4 GB quantized cache fits HBM) ---
    ctx1m = 1 << 20
    k1 = jax.random.randint(next(keys), (1, dh, ctx1m, dd), -127, 128,
                            jnp.int8)
    v1 = jax.random.randint(next(keys), (1, dh, ctx1m, dd), -127, 128,
                            jnp.int8)
    sc = jnp.full((1, dh, ctx1m), 1.0 / 127, jnp.float32)
    dq1 = mk((1, dh, dd))
    t = time_chained(
        lambda x: decode_attention(
            x, k1, v1, jnp.full((1,), ctx1m, jnp.int32), k_scale=sc,
            v_scale=sc)[0], dq1, iters=5)
    decode[f"int8_ctx{ctx1m}"] = 1.0 / t
    del k1, v1, sc

    # --- flagship model train step (single chip): tokens/s + MFU ---
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
    opt = optax.sgd(1e-4)  # stateless: keeps the bench about compute
    # donate=False: time_chained replays from the saved x0 after warmup,
    # which a donating step would have already consumed
    step = make_train_step(cfg, opt, donate=False)
    opt_state = opt.init(params)

    def train_once(p):
        p2, _, loss = step(p, opt_state, tokens)
        return p2
    t_train = time_chained(train_once, params, iters=3, warmup=1)
    toks_per_s = tokens.size / t_train
    # 6·P matmul flops per token (fwd 2P + bwd 4P) + attention extra
    train_flops = (6.0 * n_params * tokens.size
                   + 3 * attention_flops(1, cfg.n_heads, 4096, 4096,
                                         cfg.d_head, causal=True)
                   * cfg.n_layers)
    del params, opt_state

    peaks = device_peaks()
    target = SOL_FRACTION_TARGET * peaks["peak_tflops"]
    result = {
        "metric": "fa2_fwd_attention_tflops_per_chip",
        "value": round(tflops_fwd, 2),
        "unit": "TFLOP/s",
        "vs_baseline": round(tflops_fwd / target, 4),
        "extra": {
            "config": f"B={B} H={H} N={N} d={D} bf16",
            "device": peaks["device_kind"],
            "peak_tflops": peaks["peak_tflops"],
            "sol_fraction": round(tflops_fwd / peaks["peak_tflops"], 4),
            "target": "vs_baseline is fraction of 0.70*peak (north star)",
            "causal_fwd_tflops": round(tflops_causal, 2),
            "fwd_bwd_tflops": round(tflops_fb, 2),
            "decode_tokens_per_s": {k: round(v, 1)
                                    for k, v in decode.items()},
            "train_step": {
                "config": (f"L={cfg.n_layers} d={cfg.d_model} "
                           f"ff={cfg.d_ff} T=4096 bf16"),
                "params_m": round(n_params / 1e6, 1),
                "tokens_per_s": round(toks_per_s, 1),
                "mfu": round(train_flops / t_train / 1e12
                             / peaks["peak_tflops"], 4),
            },
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
