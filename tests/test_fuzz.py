"""Property fuzz: random shapes × random feature combinations vs the
oracle. Catches tiling/masking interactions no hand-written case does.
Seeded (deterministic) — the reference's srand(42) discipline at scale."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cuda_flashattention_tpu.ops.attention import flash_attention
from cuda_flashattention_tpu.ops.common import BlockSizes
from cuda_flashattention_tpu.ops.flash_fwd import flash_attention_forward
from cuda_flashattention_tpu.ops.naive import (
    naive_attention,
    naive_attention_backward,
)
from cuda_flashattention_tpu.utils.testing import assert_close

RNG = np.random.default_rng(20260816)
CASES = []
for i in range(10):
    h_kv = int(RNG.choice([1, 2]))
    group = int(RNG.choice([1, 2, 3]))
    case = dict(
        b=int(RNG.integers(1, 3)),
        h=h_kv * group,
        h_kv=h_kv,
        nq=int(RNG.integers(3, 70)),
        nk=int(RNG.integers(3, 70)),
        d=int(RNG.choice([8, 16, 32])),
        causal=bool(RNG.integers(0, 2)),
        window=int(RNG.choice([0, 0, 5, 17])),
        segments=bool(RNG.integers(0, 2)),
        bq=int(RNG.choice([8, 16, 32])),
        bk=int(RNG.choice([8, 16, 32])),
        seed=i,
    )
    if case["window"] and not case["causal"]:
        case["causal"] = True
    if case["causal"] or case["segments"]:
        case["nk"] = case["nq"]  # aligned indices for causal/segment ids
    CASES.append(case)


def _mk(case):
    r = np.random.default_rng(1000 + case["seed"])
    q = jnp.asarray(r.uniform(-0.5, 0.5,
                              (case["b"], case["h"], case["nq"],
                               case["d"])), jnp.float32)
    k = jnp.asarray(r.uniform(-0.5, 0.5,
                              (case["b"], case["h_kv"], case["nk"],
                               case["d"])), jnp.float32)
    v = jnp.asarray(r.uniform(-0.5, 0.5, k.shape), jnp.float32)
    seg = None
    if case["segments"]:
        n_seg = int(r.integers(1, 4))
        bounds = np.sort(r.integers(0, case["nk"], n_seg - 1)) \
            if n_seg > 1 else np.array([], np.int64)
        ids = np.zeros(case["nk"], np.int32)
        for bnd in bounds:
            ids[bnd:] += 1
        seg = jnp.asarray(np.tile(ids, (case["b"], 1)))
    return q, k, v, seg


@pytest.mark.parametrize("case", CASES,
                         ids=[f"fuzz{c['seed']}" for c in CASES])
def test_fuzz_fwd_bwd(case):
    q, k, v, seg = _mk(case)
    kw = dict(causal=case["causal"], window=case["window"],
              q_segment_ids=seg, kv_segment_ids=seg)
    bs = BlockSizes(block_q=case["bq"], block_k=case["bk"])
    kf = jnp.repeat(k, case["h"] // case["h_kv"], axis=1)
    vf = jnp.repeat(v, case["h"] // case["h_kv"], axis=1)

    o, lse = flash_attention_forward(q, k, v, block_sizes=bs, **kw)
    r, rl = naive_attention(q, kf, vf, **kw)
    assert_close(o, r, 2e-3, name=f"fuzz fwd {case}")

    do = jnp.ones_like(q)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_sizes=bs, **kw) * do)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    dq_r, dk_r, dv_r = naive_attention_backward(q, kf, vf, do, **kw)
    g = case["h"] // case["h_kv"]
    b, hkv, nk, d = k.shape
    assert_close(dq, dq_r, 5e-3, name=f"fuzz dQ {case}")
    assert_close(dk, dk_r.reshape(b, hkv, g, nk, d).sum(2), 5e-3,
                 name=f"fuzz dK {case}")
    assert_close(dv, dv_r.reshape(b, hkv, g, nk, d).sum(2), 5e-3,
                 name=f"fuzz dV {case}")
