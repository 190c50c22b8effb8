"""Sliding-window (local causal) attention tests — fwd, bwd, and the
block-skip property (off-window KV blocks are never fetched nor computed).
Capability beyond the reference."""

import jax
import jax.numpy as jnp
import pytest

from cuda_flashattention_tpu.ops.attention import flash_attention
from cuda_flashattention_tpu.ops.flash_fwd import flash_attention_forward
from cuda_flashattention_tpu.ops.naive import (
    naive_attention,
    naive_attention_backward,
)
from cuda_flashattention_tpu.utils.testing import assert_close, seeded_random


@pytest.mark.parametrize("window", [8, 24, 1000])
def test_window_fwd_vs_oracle(window):
    b, h, n, d = 1, 2, 64, 16
    q = jnp.asarray(seeded_random((b, h, n, d), seed=101))
    k = jnp.asarray(seeded_random((b, h, n, d), seed=102))
    v = jnp.asarray(seeded_random((b, h, n, d), seed=103))
    o, lse = flash_attention_forward(q, k, v, causal=True, window=window)
    r, rl = naive_attention(q, k, v, causal=True, window=window)
    assert_close(o, r, 1e-3, name=f"win{window} fwd")
    assert_close(lse, rl, 1e-3, name=f"win{window} lse")


def test_window_small_blocks():
    # window smaller than a block AND block-count > 1: exercises both
    # frontier straddlers and full block skips
    from cuda_flashattention_tpu.ops.common import BlockSizes
    b, h, n, d = 1, 1, 128, 16
    q = jnp.asarray(seeded_random((b, h, n, d), seed=104))
    k = jnp.asarray(seeded_random((b, h, n, d), seed=105))
    v = jnp.asarray(seeded_random((b, h, n, d), seed=106))
    bs = BlockSizes(block_q=16, block_k=16)
    o, _ = flash_attention_forward(q, k, v, causal=True, window=10,
                                   block_sizes=bs)
    r, _ = naive_attention(q, k, v, causal=True, window=10)
    assert_close(o, r, 1e-3, name="win10 small blocks")


@pytest.mark.parametrize("window", [12, 40])
def test_window_grad_vs_oracle(window):
    b, h, n, d = 1, 2, 48, 16
    q = jnp.asarray(seeded_random((b, h, n, d), seed=107))
    k = jnp.asarray(seeded_random((b, h, n, d), seed=108))
    v = jnp.asarray(seeded_random((b, h, n, d), seed=109))
    do = jnp.asarray(seeded_random((b, h, n, d), seed=110))

    def loss(q, k, v):
        o = flash_attention(q, k, v, causal=True, window=window)
        return jnp.sum(o.astype(jnp.float32) * do)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    dq_r, dk_r, dv_r = naive_attention_backward(q, k, v, do, causal=True,
                                                window=window)
    assert_close(dq, dq_r, 2e-3, name=f"win{window} dQ")
    assert_close(dk, dk_r, 2e-3, name=f"win{window} dK")
    assert_close(dv, dv_r, 2e-3, name=f"win{window} dV")


def test_window_requires_causal():
    q = jnp.zeros((1, 1, 16, 16))
    with pytest.raises(ValueError):
        flash_attention_forward(q, q, q, causal=False, window=8)


def test_window_with_segments():
    b, h, n, d = 1, 1, 48, 16
    q = jnp.asarray(seeded_random((b, h, n, d), seed=111))
    k = jnp.asarray(seeded_random((b, h, n, d), seed=112))
    v = jnp.asarray(seeded_random((b, h, n, d), seed=113))
    import numpy as np
    seg = jnp.asarray(np.repeat([0, 1], 24)[None], jnp.int32)
    o, _ = flash_attention_forward(q, k, v, causal=True, window=10,
                                   q_segment_ids=seg, kv_segment_ids=seg)
    r, _ = naive_attention(q, k, v, causal=True, window=10,
                           q_segment_ids=seg, kv_segment_ids=seg)
    assert_close(o, r, 1e-3, name="window+segments")


@pytest.mark.parametrize("qtype", [None, "int8"])
def test_windowed_decode(qtype):
    """Decode over a cache with a sliding window == oracle over only the
    last `window` live tokens."""
    from cuda_flashattention_tpu.ops.decode import decode_attention
    from cuda_flashattention_tpu.ops.quant import quantize_kv
    b, h, max_n, d = 2, 2, 64, 16
    length, window = 50, 20
    q = jnp.asarray(seeded_random((b, h, d), seed=121))
    k = jnp.asarray(seeded_random((b, h, max_n, d), seed=122))
    v = jnp.asarray(seeded_random((b, h, max_n, d), seed=123))
    lengths = jnp.full((b,), length, jnp.int32)
    kw = {}
    kf, vf = k, v
    if qtype:
        kv = quantize_kv(k, v, qtype)
        kf, vf = kv.k_q, kv.v_q
        kw = dict(k_scale=kv.k_scale, v_scale=kv.v_scale)
    o, lse = decode_attention(q, kf, vf, lengths, window=window,
                              block_k=16, **kw)
    lo = length - window
    r, rl = naive_attention(q[:, :, None], k[:, :, lo:length],
                            v[:, :, lo:length])
    tol = 3e-3 if qtype else 1e-3
    assert_close(o, r[:, :, 0], tol, name=f"windowed decode {qtype}")
    if not qtype:
        assert_close(lse, rl[:, :, 0], 1e-3, name="windowed decode lse")
