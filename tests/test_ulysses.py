"""Ulysses (all-to-all) sequence parallelism vs the oracle and vs the
ring — both strategies must agree on the same inputs."""

import jax
import jax.numpy as jnp
import pytest

from cuda_flashattention_tpu.ops.naive import (
    naive_attention,
    naive_attention_backward,
)
from cuda_flashattention_tpu.parallel.mesh import make_mesh, shard_on_axis
from cuda_flashattention_tpu.parallel.ring import ring_attention
from cuda_flashattention_tpu.parallel.ulysses import ulysses_attention
from cuda_flashattention_tpu.utils.testing import assert_close, seeded_random


@pytest.fixture(scope="module")
def setup():
    mesh = make_mesh((4,), ("sp",), jax.devices()[:4])
    b, h, n, d = 1, 4, 64, 16
    q = jnp.asarray(seeded_random((b, h, n, d), seed=151))
    k = jnp.asarray(seeded_random((b, h, n, d), seed=152))
    v = jnp.asarray(seeded_random((b, h, n, d), seed=153))
    qs = shard_on_axis(mesh, q, 2, "sp")
    ks = shard_on_axis(mesh, k, 2, "sp")
    vs = shard_on_axis(mesh, v, 2, "sp")
    return mesh, (q, k, v), (qs, ks, vs)


@pytest.mark.parametrize("causal", [False, True])
def test_ulysses_vs_oracle(setup, causal):
    mesh, (q, k, v), (qs, ks, vs) = setup
    o = ulysses_attention(qs, ks, vs, mesh=mesh, causal=causal)
    o_ref, _ = naive_attention(q, k, v, causal=causal)
    assert_close(o, o_ref, 2e-3, name=f"ulysses causal={causal}")


def test_ulysses_vs_ring(setup):
    mesh, _, (qs, ks, vs) = setup
    o_u = ulysses_attention(qs, ks, vs, mesh=mesh, causal=True)
    o_r = ring_attention(qs, ks, vs, mesh=mesh, causal=True)
    assert_close(o_u, o_r, 1e-4, name="ulysses vs ring")


def test_ulysses_window(setup):
    mesh, (q, k, v), (qs, ks, vs) = setup
    o = ulysses_attention(qs, ks, vs, mesh=mesh, causal=True, window=20)
    o_ref, _ = naive_attention(q, k, v, causal=True, window=20)
    assert_close(o, o_ref, 2e-3, name="ulysses window")


def test_ulysses_grad(setup):
    mesh, (q, k, v), (qs, ks, vs) = setup
    do = jnp.asarray(seeded_random(q.shape, seed=154))

    def loss(q, k, v):
        o = ulysses_attention(q, k, v, mesh=mesh, causal=True)
        return jnp.sum(o.astype(jnp.float32) * do)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(qs, ks, vs)
    dq_r, dk_r, dv_r = naive_attention_backward(q, k, v, do, causal=True)
    assert_close(dq, dq_r, 2e-3, name="ulysses dQ")
    assert_close(dk, dk_r, 2e-3, name="ulysses dK")
    assert_close(dv, dv_r, 2e-3, name="ulysses dV")


def test_ulysses_rejects_indivisible_heads(setup):
    mesh, _, (qs, ks, vs) = setup
    with pytest.raises(ValueError):
        ulysses_attention(qs[:, :3], ks, vs, mesh=mesh)


def test_ulysses_gqa_head_replication(setup):
    """Hkv=2 on 4 shards: KV heads replicate 2× so each shard owns a
    replica; the GQA grouping must survive (VERDICT r1 #10)."""
    mesh, (q, k, v), (qs, ks, vs) = setup
    k2, v2 = k[:, :2], v[:, :2]  # Hkv=2 < 4 shards
    k2s = shard_on_axis(mesh, k2, 2, "sp")
    v2s = shard_on_axis(mesh, v2, 2, "sp")
    o = ulysses_attention(qs, k2s, v2s, mesh=mesh, causal=True)
    o_ref, _ = naive_attention(q, jnp.repeat(k2, 2, 1),
                               jnp.repeat(v2, 2, 1), causal=True)
    assert_close(o, o_ref, 2e-3, name="ulysses gqa replication")

    do = jnp.asarray(seeded_random(q.shape, seed=191))

    def loss(q, k, v):
        o = ulysses_attention(q, k, v, mesh=mesh, causal=True)
        return jnp.sum(o.astype(jnp.float32) * do)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(qs, k2s, v2s)
    dq_r, dk_r, dv_r = naive_attention_backward(
        q, jnp.repeat(k2, 2, 1), jnp.repeat(v2, 2, 1), do, causal=True)
    assert_close(dq, dq_r, 2e-3, name="ulysses gqa-rep dQ")
    # repeated-head grads fold back onto the true KV heads
    assert_close(dk, dk_r.reshape(1, 2, 2, 64, 16).sum(2), 2e-3,
                 name="ulysses gqa-rep dK")
    assert_close(dv, dv_r.reshape(1, 2, 2, 64, 16).sum(2), 2e-3,
                 name="ulysses gqa-rep dV")


def test_ulysses_segment_ids(setup):
    """Packed sequences through the all-to-all: ids gather along the
    axis so every shard masks the full sequence (VERDICT r1 #10)."""
    mesh, (q, k, v), (qs, ks, vs) = setup
    ids = jnp.asarray([[0] * 20 + [1] * 30 + [2] * 14], jnp.int32)
    ids_s = shard_on_axis(mesh, ids, 1, "sp")
    o = ulysses_attention(qs, ks, vs, mesh=mesh, segment_ids=ids_s)
    o_ref, _ = naive_attention(q, k, v, q_segment_ids=ids,
                               kv_segment_ids=ids)
    assert_close(o, o_ref, 2e-3, name="ulysses segments")


@pytest.mark.parametrize("causal", [False, True])
def test_ulysses_ragged_seq(setup, causal):
    """seq % shards != 0: ulysses pads to the all-to-all grid (VERDICT r2
    #9) — causal needs no mask (pad rows trail every real row), non-causal
    threads pad-marking segment ids so real queries never see pad keys."""
    mesh, _, _ = setup
    b, h, n, d = 1, 4, 50, 16  # 50 % 4 != 0
    q = jnp.asarray(seeded_random((b, h, n, d), seed=161))
    k = jnp.asarray(seeded_random((b, h, n, d), seed=162))
    v = jnp.asarray(seeded_random((b, h, n, d), seed=163))
    o = ulysses_attention(q, k, v, mesh=mesh, causal=causal)
    assert o.shape == q.shape
    o_ref, _ = naive_attention(q, k, v, causal=causal)
    assert_close(o, o_ref, 2e-3, name=f"ulysses ragged causal={causal}")


def test_ulysses_ragged_segment_ids(setup):
    """Ragged seq + user segment ids: the pad extends the ids with -1."""
    mesh, _, _ = setup
    b, h, n, d = 1, 4, 50, 16
    q = jnp.asarray(seeded_random((b, h, n, d), seed=164))
    k = jnp.asarray(seeded_random((b, h, n, d), seed=165))
    v = jnp.asarray(seeded_random((b, h, n, d), seed=166))
    ids = jnp.asarray([[0] * 30 + [1] * 20], jnp.int32)
    o = ulysses_attention(q, k, v, mesh=mesh, segment_ids=ids)
    o_ref, _ = naive_attention(q, k, v, q_segment_ids=ids,
                               kv_segment_ids=ids)
    assert_close(o, o_ref, 2e-3, name="ulysses ragged segments")
