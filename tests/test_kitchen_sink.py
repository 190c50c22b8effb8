"""Kitchen-sink robustness: every attention feature stacked at once —
GQA + causal + sliding window + segment ids + ragged length + kv_offset +
bf16 — fwd and bwd vs the oracle. Feature interactions are where masking
bugs hide; none of these paths may silently disable another."""

import numpy as np
import jax
import jax.numpy as jnp

from cuda_flashattention_tpu.ops.attention import flash_attention
from cuda_flashattention_tpu.ops.common import BlockSizes
from cuda_flashattention_tpu.ops.flash_fwd import flash_attention_forward
from cuda_flashattention_tpu.ops.naive import (
    naive_attention,
    naive_attention_backward,
)
from cuda_flashattention_tpu.utils.testing import assert_close, seeded_random

B, H, HKV, N, D = 2, 4, 2, 52, 16  # ragged: 52 % 16-block != 0
WINDOW = 14
SEG = jnp.asarray(np.tile(np.repeat([0, 1, 2], [20, 12, 20]), (B, 1)),
                  jnp.int32)


def _inputs():
    q = jnp.asarray(seeded_random((B, H, N, D), seed=131))
    k = jnp.asarray(seeded_random((B, HKV, N, D), seed=132))
    v = jnp.asarray(seeded_random((B, HKV, N, D), seed=133))
    return q, k, v


def _expand(k):
    return jnp.repeat(k, H // HKV, axis=1)


def test_all_features_fwd():
    q, k, v = _inputs()
    bs = BlockSizes(block_q=16, block_k=16)
    o, lse = flash_attention_forward(
        q, k, v, causal=True, window=WINDOW, q_segment_ids=SEG,
        kv_segment_ids=SEG, block_sizes=bs)
    r, rl = naive_attention(q, _expand(k), _expand(v), causal=True,
                            window=WINDOW, q_segment_ids=SEG,
                            kv_segment_ids=SEG)
    assert_close(o, r, 1e-3, name="sink fwd")
    fin = jnp.isfinite(rl)
    assert_close(lse[fin], rl[fin], 1e-3, name="sink lse")


def test_all_features_bwd():
    q, k, v = _inputs()
    do = jnp.asarray(seeded_random((B, H, N, D), seed=134))
    bs = BlockSizes(block_q=16, block_k=16)

    def loss(q, k, v):
        o = flash_attention(q, k, v, causal=True, window=WINDOW,
                            q_segment_ids=SEG, kv_segment_ids=SEG,
                            block_sizes=bs)
        return jnp.sum(o.astype(jnp.float32) * do)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    dq_r, dk_r, dv_r = naive_attention_backward(
        q, _expand(k), _expand(v), do, causal=True, window=WINDOW,
        q_segment_ids=SEG, kv_segment_ids=SEG)
    g = H // HKV
    dk_ref = dk_r.reshape(B, HKV, g, N, D).sum(2)
    dv_ref = dv_r.reshape(B, HKV, g, N, D).sum(2)
    assert_close(dq, dq_r, 2e-3, name="sink dQ")
    assert_close(dk, dk_ref, 2e-3, name="sink dK")
    assert_close(dv, dv_ref, 2e-3, name="sink dV")


def test_all_features_with_kv_offset():
    # sequence-sharded caller shape: q is rows [16, 48) of a global seq
    q, k, v = _inputs()
    qs = q[:, :, 16:48]
    seg_q = SEG[:, 16:48]
    o, _ = flash_attention_forward(
        qs, k, v, causal=True, window=WINDOW, kv_offset=16,
        q_segment_ids=seg_q, kv_segment_ids=SEG,
        block_sizes=BlockSizes(block_q=16, block_k=16))
    r, _ = naive_attention(qs, _expand(k), _expand(v), causal=True,
                           window=WINDOW, kv_offset=16,
                           q_segment_ids=seg_q, kv_segment_ids=SEG)
    assert_close(o, r, 1e-3, name="sink offset fwd")
