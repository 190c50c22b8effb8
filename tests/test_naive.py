"""Oracle self-tests — the framework's "stage 00".

Mirrors the reference's naive-attention self-test with hand-computable
expected values (ref: src/00_naive_attention/main.cpp:40-85, which
hardcodes the expected 2x2 output at :58-61) plus fp64 cross-checks.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cuda_flashattention_tpu.ops.naive import (
    naive_attention,
    naive_attention_backward,
    naive_decode,
)
from cuda_flashattention_tpu.utils.testing import (
    assert_close,
    identity_qk_fixture,
    seeded_random,
)


def softmax_attention_f64(q, k, v, scale, causal=False, kv_offset=0):
    """Independent fp64 reference implementation."""
    q, k, v = (np.asarray(x, np.float64) for x in (q, k, v))
    s = q @ k.T * scale
    if causal:
        nq, nk = s.shape
        mask = np.arange(nk)[None, :] <= np.arange(nq)[:, None] + kv_offset
        s = np.where(mask, s, -np.inf)
    m = s.max(axis=-1, keepdims=True)
    p = np.exp(s - m)
    l = p.sum(axis=-1, keepdims=True)
    return p @ v / l, (m[:, 0] + np.log(l[:, 0]))


def test_hand_checked_2x2():
    # Q=K=I2, V rows distinct, scale=1: S = I, softmax rows are
    # [e/(e+1), 1/(e+1)] permutations — the same construction as the
    # reference's hardcoded case (ref: 00_naive_attention/main.cpp:40-61).
    q = np.eye(2, dtype=np.float32)
    k = np.eye(2, dtype=np.float32)
    v = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32)
    o, lse = naive_attention(q, k, v, scale=1.0)
    e = np.e
    w = e / (e + 1.0)
    expected = np.array([
        [w * 1 + (1 - w) * 3, w * 2 + (1 - w) * 4],
        [(1 - w) * 1 + w * 3, (1 - w) * 2 + w * 4],
    ])
    assert_close(o, expected, 1e-5, "O")
    assert_close(lse, np.log(e + 1.0) * np.ones(2), 1e-5, "LSE")


@pytest.mark.parametrize("n,d,scale", [(4, 4, 1.0), (64, 32, None),
                                       (128, 64, None)])
def test_forward_matches_f64(n, d, scale):
    q = seeded_random((n, d), 1)
    k = seeded_random((n, d), 2)
    v = seeded_random((n, d), 3)
    sc = 1.0 / np.sqrt(d) if scale is None else scale
    o, lse = naive_attention(q, k, v, scale=scale)
    o64, lse64 = softmax_attention_f64(q, k, v, sc)
    assert_close(o, o64, 1e-5, "O")
    assert_close(lse, lse64, 1e-5, "LSE")


def test_identity_fixture():
    q, k, v = identity_qk_fixture(4, 4)
    o, _ = naive_attention(q, k, v, scale=1.0)
    o64, _ = softmax_attention_f64(q, k, v, 1.0)
    assert_close(o, o64, 1e-6, "O")


def test_causal_forward():
    q = seeded_random((16, 8), 4)
    k = seeded_random((16, 8), 5)
    v = seeded_random((16, 8), 6)
    o, lse = naive_attention(q, k, v, causal=True)
    o64, lse64 = softmax_attention_f64(q, k, v, 1 / np.sqrt(8), causal=True)
    assert_close(o, o64, 1e-5, "O")
    assert_close(lse, lse64, 1e-5, "LSE")
    # row 0 attends only to key 0
    assert_close(o[0], v[0], 1e-6, "row0")


def test_backward_matches_autodiff():
    import jax
    q = jnp.asarray(seeded_random((32, 16), 7))
    k = jnp.asarray(seeded_random((32, 16), 8))
    v = jnp.asarray(seeded_random((32, 16), 9))
    do = jnp.asarray(seeded_random((32, 16), 10))

    dq, dk, dv = naive_attention_backward(q, k, v, do)
    dq_a, dk_a, dv_a = jax.grad(
        lambda q, k, v: jnp.vdot(naive_attention(q, k, v)[0], do),
        argnums=(0, 1, 2))(q, k, v)
    assert_close(dq, dq_a, 1e-5, "dQ")
    assert_close(dk, dk_a, 1e-5, "dK")
    assert_close(dv, dv_a, 1e-5, "dV")


def test_backward_causal_matches_autodiff():
    import jax
    q = jnp.asarray(seeded_random((24, 8), 11))
    k = jnp.asarray(seeded_random((24, 8), 12))
    v = jnp.asarray(seeded_random((24, 8), 13))
    do = jnp.asarray(seeded_random((24, 8), 14))
    dq, dk, dv = naive_attention_backward(q, k, v, do, causal=True)
    dq_a, dk_a, dv_a = jax.grad(
        lambda q, k, v: jnp.vdot(naive_attention(q, k, v, causal=True)[0],
                                 do), argnums=(0, 1, 2))(q, k, v)
    assert_close(dq, dq_a, 1e-5, "dQ")
    assert_close(dk, dk_a, 1e-5, "dK")
    assert_close(dv, dv_a, 1e-5, "dV")


def test_decode_matches_forward():
    q = seeded_random((8,), 20)
    k = seeded_random((64, 8), 21)
    v = seeded_random((64, 8), 22)
    o = naive_decode(q, k, v)
    o_full, _ = naive_attention(q[None, :], k, v)
    assert_close(o, o_full[0], 1e-6, "decode")
