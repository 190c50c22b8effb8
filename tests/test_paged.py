"""Paged attention tests: a paged layout with a shuffled page table must
reproduce contiguous decode exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cuda_flashattention_tpu.ops.decode import decode_attention
from cuda_flashattention_tpu.ops.naive import naive_attention
from cuda_flashattention_tpu.ops.paged import paged_decode_attention
from cuda_flashattention_tpu.ops.quant import quantize_kv
from cuda_flashattention_tpu.utils.testing import assert_close, seeded_random

B, H, HKV, D = 2, 4, 2, 16
PAGE = 16
MAX_PAGES = 6


def paginate(k, v, lengths, rng):
    """Scatter contiguous [B,Hkv,N,d] caches into a shuffled page pool."""
    b, hkv, n, d = k.shape
    n_pages_per = -(-n // PAGE)
    total = b * MAX_PAGES + 3  # spare pages stay garbage
    order = rng.permutation(total)
    k_pool = np.asarray(
        rng.uniform(-9, 9, (total, hkv, PAGE, d)), np.float32)
    v_pool = k_pool.copy()[::-1].reshape(total, hkv, PAGE, d).copy()
    table = np.zeros((b, MAX_PAGES), np.int32)
    slot = 0
    for i in range(b):
        for p in range(MAX_PAGES):
            if p < n_pages_per:
                pid = int(order[slot]); slot += 1
                table[i, p] = pid
                lo = p * PAGE
                hi = min(n, lo + PAGE)
                k_pool[pid, :, :hi - lo] = np.asarray(k[i, :, lo:hi])
                v_pool[pid, :, :hi - lo] = np.asarray(v[i, :, lo:hi])
            else:
                table[i, p] = int(order[slot - 1])  # junk entry, ignored
    return (jnp.asarray(k_pool), jnp.asarray(v_pool), jnp.asarray(table))


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    n = PAGE * 4
    q = jnp.asarray(seeded_random((B, H, D), seed=201))
    k = jnp.asarray(seeded_random((B, HKV, n, D), seed=202))
    v = jnp.asarray(seeded_random((B, HKV, n, D), seed=203))
    return rng, q, k, v


def test_paged_matches_contiguous(setup):
    rng, q, k, v = setup
    lengths = jnp.asarray([PAGE * 4, PAGE * 2 + 5], jnp.int32)
    k_pool, v_pool, table = paginate(k, v, lengths, rng)
    o_p, lse_p = paged_decode_attention(q, k_pool, v_pool, table, lengths)
    o_c, lse_c = decode_attention(q, k, v, lengths, block_k=PAGE)
    assert_close(o_p, o_c, 1e-5, name="paged vs contiguous O")
    assert_close(lse_p, lse_c, 1e-5, name="paged vs contiguous LSE")


def test_paged_vs_oracle(setup):
    rng, q, k, v = setup
    lengths = jnp.asarray([37, 61], jnp.int32)
    k_pool, v_pool, table = paginate(k, v, lengths, rng)
    o_p, _ = paged_decode_attention(q, k_pool, v_pool, table, lengths)
    kf = jnp.repeat(k, H // HKV, axis=1)
    vf = jnp.repeat(v, H // HKV, axis=1)
    for i, ln in enumerate([37, 61]):
        r, _ = naive_attention(q[i:i+1, :, None], kf[i:i+1, :, :ln],
                               vf[i:i+1, :, :ln])
        assert_close(o_p[i:i+1], r[:, :, 0], 1e-4, name=f"paged oracle {i}")


@pytest.mark.parametrize("qtype", ["int8", "fp8"])
def test_paged_quantized(setup, qtype):
    rng, q, k, v = setup
    n = k.shape[2]
    lengths = jnp.asarray([n, n - 11], jnp.int32)
    kv = quantize_kv(k, v, qtype)
    # paginate the quantized values and their scales with the same table
    k_pool, v_pool, table = paginate(
        kv.k_q.astype(jnp.float32), kv.v_q.astype(jnp.float32),
        lengths, np.random.default_rng(7))
    k_pool = k_pool.astype(kv.k_q.dtype)
    v_pool = v_pool.astype(kv.v_q.dtype)
    ks_pool, vs_pool, _ = paginate(
        kv.k_scale[..., None], kv.v_scale[..., None], lengths,
        np.random.default_rng(7))
    o_p, _ = paged_decode_attention(
        q, k_pool, v_pool, table, lengths,
        k_scale=ks_pool[..., 0], v_scale=vs_pool[..., 0])
    o_c, _ = decode_attention(q, kv.k_q, kv.v_q, lengths,
                              k_scale=kv.k_scale, v_scale=kv.v_scale)
    tol = 1e-4 if qtype == "int8" else 1e-4
    assert_close(o_p, o_c, tol, name=f"paged {qtype}")
