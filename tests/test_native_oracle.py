"""Native (C++/OpenMP) oracle tests — the two-oracle cross-check.

The reference's oracle IS native C++ (ref: src/util/naive_attention.h);
here the native oracle and the JAX oracle must agree with each other and
with hardcoded expectations, mirroring the reference's own oracle
self-test with hardcoded 2x2 outputs (ref: 00_naive_attention/main.cpp:
40-85, expected values :58-61).
"""

import numpy as np
import pytest

from cuda_flashattention_tpu.ops.naive import (
    naive_attention,
    naive_attention_backward,
)
from cuda_flashattention_tpu.runtime import native
from cuda_flashattention_tpu.utils.testing import (
    assert_close,
    seeded_random,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="g++/OpenMP unavailable")


def test_hardcoded_2x2():
    # ref: 00_naive_attention/main.cpp:40-61 — tiny case with hand-checked
    # output (scale=1, Q=K=I so softmax weights are e/(e+1) vs 1/(e+1))
    q = np.eye(2, dtype=np.float32)
    k = np.eye(2, dtype=np.float32)
    v = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32)
    o, lse = native.naive_attention_native(q, k, v, scale=1.0)
    e = np.exp(1.0)
    w = e / (e + 1.0)
    expected = np.array([
        [w * 1 + (1 - w) * 3, w * 2 + (1 - w) * 4],
        [(1 - w) * 1 + w * 3, (1 - w) * 2 + w * 4],
    ])
    assert_close(o, expected, 1e-5, name="native 2x2")
    assert_close(lse, np.log(e + 1.0) * np.ones(2), 1e-5, name="native lse")


@pytest.mark.parametrize("causal", [False, True])
def test_fwd_matches_jax_oracle(causal):
    q = seeded_random((2, 3, 64, 32), seed=1)
    k = seeded_random((2, 3, 48, 32), seed=2)
    v = seeded_random((2, 3, 48, 32), seed=3)
    o_n, lse_n = native.naive_attention_native(q, k, v, causal=causal)
    o_j, lse_j = naive_attention(q, k, v, causal=causal)
    assert_close(o_n, o_j, 1e-5, name="fwd O")
    # fully-masked rows give -inf LSE in both; compare finite entries
    fin = np.isfinite(np.asarray(lse_j))
    assert_close(np.asarray(lse_n)[fin], np.asarray(lse_j)[fin], 1e-4,
                 name="fwd LSE")


@pytest.mark.parametrize("causal", [False, True])
def test_bwd_matches_jax_oracle(causal):
    q = seeded_random((1, 2, 48, 16), seed=4)
    k = seeded_random((1, 2, 32, 16), seed=5)
    v = seeded_random((1, 2, 32, 16), seed=6)
    do = seeded_random((1, 2, 48, 16), seed=7)
    dq_n, dk_n, dv_n = native.naive_attention_backward_native(
        q, k, v, do, causal=causal)
    dq_j, dk_j, dv_j = naive_attention_backward(q, k, v, do, causal=causal)
    assert_close(dq_n, dq_j, 1e-5, name="dQ")
    assert_close(dk_n, dk_j, 1e-5, name="dK")
    assert_close(dv_n, dv_j, 1e-5, name="dV")


def test_kv_offset():
    # sequence-sharded causal semantics must match the jax oracle
    q = seeded_random((1, 1, 16, 8), seed=8)
    k = seeded_random((1, 1, 32, 8), seed=9)
    v = seeded_random((1, 1, 32, 8), seed=10)
    o_n, _ = native.naive_attention_native(q, k, v, causal=True,
                                           kv_offset=8)
    o_j, _ = naive_attention(q, k, v, causal=True, kv_offset=8)
    assert_close(o_n, o_j, 1e-5, name="kv_offset O")


def test_ring_scale_5096():
    # the reference's ring-test shape (ref: 04_ring_attention.cu:51) —
    # the native oracle makes this cheap on CPU
    q = seeded_random((1, 1, 5096, 64), seed=11) * 0.1
    k = seeded_random((1, 1, 5096, 64), seed=12) * 0.1
    v = seeded_random((1, 1, 5096, 64), seed=13)
    o_n, _ = native.naive_attention_native(q, k, v, scale=1.0)
    o_j, _ = naive_attention(q, k, v, scale=1.0)
    assert_close(o_n, o_j, 1e-4, name="5096 O")


def test_threads_reported():
    assert native.num_threads() >= 1
