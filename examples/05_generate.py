"""Ladder stage 05 — end-to-end serving: prefill + quantized-cache decode.

Beyond the reference ladder (which stops at ring attention): a full
autoregressive generation loop on the flagship transformer, with the KV
cache stored in INT8 and dequantised inside the decode kernel. Verifies
the cached bf16 path reproduces the teacher-forced full-forward rollout
token-for-token (greedy), and that the int8 path produces a valid,
mostly-agreeing rollout.
"""

import _common  # noqa: F401

import sys

import jax
import jax.numpy as jnp

from cuda_flashattention_tpu.models.generate import generate
from cuda_flashattention_tpu.models.transformer import (
    TransformerConfig,
    forward,
    init_params,
)


def main() -> int:
    _common.bootstrap()
    cfg = TransformerConfig(
        vocab_size=128, d_model=64, n_layers=2, n_heads=4, n_kv_heads=2,
        d_head=16, d_ff=128, max_seq=64, dtype=jnp.float32)
    params = init_params(jax.random.PRNGKey(0), cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0,
                                cfg.vocab_size)
    n_new = 8

    # teacher-forced reference: full forward on the growing sequence
    ref = prompt
    for _ in range(n_new):
        logits = forward(params, ref, cfg)
        nxt = jnp.argmax(logits[:, -1], -1).astype(ref.dtype)
        ref = jnp.concatenate([ref, nxt[:, None]], axis=1)

    out, _ = generate(params, prompt, cfg, max_new_tokens=n_new)
    exact = bool((out == ref).all())
    print(f"bf16 cached rollout exact-match: {exact}")

    out8, _ = generate(params, prompt, cfg, max_new_tokens=n_new,
                       qtype="int8")
    agree = float((out8[:, 8:] == ref[:, 8:]).mean())
    valid = bool(((out8 >= 0) & (out8 < cfg.vocab_size)).all())
    print(f"int8-cache rollout: valid={valid}, "
          f"token agreement {agree:.0%}")

    return _common.report("05_generate", exact and valid and agree >= 0.5)


if __name__ == "__main__":
    sys.exit(main())
