"""Ring attention ladder on the virtual 8-device CPU mesh.

Mirrors the reference's distributed test ladder (SURVEY.md §2.5):
  00/01 → mesh + ppermute smoke test   (ref: 00_mpi_vecadd, 01_nccl_verify)
  03    → 1-shard parity vs single-chip (ref: 03_attention_1GPU)
  04    → N-shard ring vs naive oracle  (ref: 04_ring_attention, rtol 5e-3)
plus what the reference lacks: causal ring, ring backward, sharded decode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from cuda_flashattention_tpu.ops.naive import (
    naive_attention,
    naive_attention_backward,
)
from cuda_flashattention_tpu.ops.quant import quantize_kv
from cuda_flashattention_tpu.parallel.mesh import sequence_mesh
from cuda_flashattention_tpu.parallel.ring import (
    combine_partials,
    ring_attention,
    ring_decode,
)
from cuda_flashattention_tpu.utils.testing import (
    assert_close,
    random_qkv,
    seeded_random,
)

N_DEV = len(jax.devices())
needs_multi = pytest.mark.skipif(N_DEV < 8, reason="needs 8 devices")


def test_ppermute_smoke():
    """Ring topology sanity: rank-tagged data arrives from the previous
    rank after one hop (ref: 01_nccl_verify.cu:42-59)."""
    mesh = sequence_mesh()
    n = mesh.shape["sp"]
    perm = [(i, (i + 1) % n) for i in range(n)]

    def f(x):
        return jax.lax.ppermute(x, "sp", perm)

    x = jnp.arange(n, dtype=jnp.float32).reshape(n, 1)
    y = jax.shard_map(f, mesh=mesh, in_specs=P("sp", None),
                      out_specs=P("sp", None))(x)
    expected = np.roll(np.arange(n), 1).reshape(n, 1)
    assert_close(y, expected, 1e-6, "ppermute ring")


def test_combine_partials_exact():
    """Pairwise logsumexp combination must equal attention over the union
    of key sets — the invariant ring attention is built on."""
    q, k, v = random_qkv(1, 1, 16, 64, 8)
    o1, lse1 = naive_attention(q, k[:, :, :32], v[:, :, :32])
    o2, lse2 = naive_attention(q, k[:, :, 32:], v[:, :, 32:])
    o, lse = combine_partials(o1, lse1, o2, lse2)
    o_ref, lse_ref = naive_attention(q, k, v)
    assert_close(o, o_ref, 1e-5, "combined O")
    assert_close(lse, lse_ref, 1e-5, "combined LSE")


def _mesh_n(n):
    from cuda_flashattention_tpu.parallel.mesh import make_mesh
    return make_mesh((n,), ("sp",))


@needs_multi
@pytest.mark.parametrize("n_shards", [1, 2, 8])
def test_ring_forward(n_shards):
    """(ref: 04_ring_attention.cu — shard, ring, gather, compare 5e-3;
    n_shards=1 is the 03_attention_1GPU single-device parity stage)."""
    mesh = _mesh_n(n_shards)
    q, k, v = random_qkv(1, 2, 128, 128, 32)
    o = ring_attention(q, k, v, mesh)
    o_ref, _ = naive_attention(q, k, v)
    assert_close(o, o_ref, 5e-3, f"ring O ({n_shards} shards)")


@needs_multi
@pytest.mark.parametrize("n_shards", [2, 8])
def test_ring_causal(n_shards):
    mesh = _mesh_n(n_shards)
    q, k, v = random_qkv(1, 2, 128, 128, 32)
    o = ring_attention(q, k, v, mesh, causal=True)
    o_ref, _ = naive_attention(q, k, v, causal=True)
    assert_close(o, o_ref, 5e-3, f"causal ring O ({n_shards} shards)")


@needs_multi
@pytest.mark.parametrize("causal", [False, True])
def test_ring_backward(causal):
    """Distributed gradients vs the single-host oracle — capability the
    reference lacks entirely (forward-only ring, SURVEY.md §5)."""
    mesh = _mesh_n(4)
    q, k, v = random_qkv(1, 1, 64, 64, 16)
    do = jnp.asarray(seeded_random(q.shape, 55))

    def loss(q, k, v):
        return jnp.vdot(ring_attention(q, k, v, mesh, causal=causal), do)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    dq_r, dk_r, dv_r = naive_attention_backward(q, k, v, do, causal=causal)
    assert_close(dq, dq_r, 5e-3, "ring dQ")
    assert_close(dk, dk_r, 5e-3, "ring dK")
    assert_close(dv, dv_r, 5e-3, "ring dV")


@needs_multi
@pytest.mark.parametrize("causal", [False, True])
def test_ring_seq_not_divisible(causal):
    """seq % shards != 0: the wrapper pads to the shard grid and masks —
    the very assert-dodge SURVEY §7(e) says not to replicate
    (ref: 04_ring_attention.cu:56-63 raises instead)."""
    mesh = _mesh_n(8)
    q, k, v = random_qkv(1, 1, 100, 100, 16)
    o = ring_attention(q, k, v, mesh, causal=causal)
    assert o.shape == q.shape
    o_ref, _ = naive_attention(q, k, v, causal=causal)
    assert_close(o, o_ref, 5e-3, f"ragged ring O (causal={causal})")

    do = jnp.asarray(seeded_random(q.shape, 77))

    def loss(q, k, v):
        return jnp.vdot(ring_attention(q, k, v, mesh, causal=causal), do)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    dq_r, dk_r, dv_r = naive_attention_backward(q, k, v, do, causal=causal)
    assert_close(dq, dq_r, 5e-3, "ragged ring dQ")
    assert_close(dk, dk_r, 5e-3, "ragged ring dK")
    assert_close(dv, dv_r, 5e-3, "ragged ring dV")


@needs_multi
@pytest.mark.parametrize("global_len", [1, 100, 256])
def test_ring_decode(global_len):
    """Sharded-cache decode: partial-LSE psum combine across shards."""
    mesh = _mesh_n(4)
    _, k, v = random_qkv(1, 2, 0, 256, 32)
    q = jnp.asarray(seeded_random((1, 2, 32), 5))
    o, lse = ring_decode(q, k, v, global_len, mesh)
    o_ref, lse_ref = naive_attention(
        q[:, :, None, :], k[:, :, :global_len], v[:, :, :global_len])
    assert_close(o, o_ref[:, :, 0], 5e-3, "ring decode O")
    assert_close(lse, lse_ref[:, :, 0], 1e-2, "ring decode LSE")


@needs_multi
def test_ring_decode_per_sequence_lengths():
    """Mixed-length serving batch through the sharded decode."""
    mesh = _mesh_n(4)
    b = 3
    _, k, v = random_qkv(b, 2, 0, 256, 32)
    q = jnp.asarray(seeded_random((b, 2, 32), 7))
    lengths = jnp.asarray([1, 100, 256], jnp.int32)
    o, lse = ring_decode(q, k, v, lengths, mesh)
    for i, ln in enumerate([1, 100, 256]):
        o_ref, lse_ref = naive_attention(
            q[i:i + 1, :, None, :], k[i:i + 1, :, :ln], v[i:i + 1, :, :ln])
        assert_close(o[i:i + 1], o_ref[:, :, 0], 5e-3,
                     f"ring decode O (len={ln})")
        assert_close(lse[i:i + 1], lse_ref[:, :, 0], 1e-2,
                     f"ring decode LSE (len={ln})")


@needs_multi
@pytest.mark.parametrize("window", [40, 100, 300])
def test_ring_decode_window(window):
    """Windowed sharded decode: the global window cut falls mid-shard,
    spans shards, or exceeds the context (VERDICT r1 #5)."""
    mesh = _mesh_n(4)
    b = 2
    _, k, v = random_qkv(b, 2, 0, 256, 32)
    q = jnp.asarray(seeded_random((b, 2, 32), 9))
    lengths = jnp.asarray([180, 256], jnp.int32)
    o, lse = ring_decode(q, k, v, lengths, mesh, window=window)
    for i, ln in enumerate([180, 256]):
        lo = max(0, ln - window)
        o_ref, lse_ref = naive_attention(
            q[i:i + 1, :, None, :], k[i:i + 1, :, lo:ln],
            v[i:i + 1, :, lo:ln])
        assert_close(o[i:i + 1], o_ref[:, :, 0], 5e-3,
                     f"windowed ring decode O (len={ln}, w={window})")
        assert_close(lse[i:i + 1], lse_ref[:, :, 0], 1e-2,
                     f"windowed ring decode LSE (len={ln}, w={window})")


@needs_multi
@pytest.mark.parametrize("qtype,tol", [("int8", 5e-3), ("fp8", 2e-2),
                                       ("mixed", 2e-2)])
def test_ring_decode_quantized(qtype, tol):
    """All three cache quantisations through the SHARDED decode path
    ("mixed" = int8 K / fp8 V, the fp8-serving config)."""
    mesh = _mesh_n(4)
    _, k, v = random_qkv(1, 2, 0, 512, 32)
    q = jnp.asarray(seeded_random((1, 2, 32), 6))
    kv = quantize_kv(k, v, qtype)
    o, _ = ring_decode(q, kv.k_q, kv.v_q, 400, mesh,
                       k_scale=kv.k_scale, v_scale=kv.v_scale)
    kd, vd = kv.dequantize()
    o_ref, _ = naive_attention(q[:, :, None, :], kd[:, :, :400],
                               vd[:, :, :400])
    assert_close(o, o_ref[:, :, 0], tol, f"ring decode {qtype} O")


def test_ring_gqa():
    """GQA through the ring: KV heads shard/rotate at their own count;
    the in-ring flash kernels group natively (fwd index maps, bwd group
    axis)."""
    import jax
    import jax.numpy as jnp
    from cuda_flashattention_tpu.ops.naive import (
        naive_attention, naive_attention_backward)
    from cuda_flashattention_tpu.parallel.mesh import make_mesh, shard_on_axis
    from cuda_flashattention_tpu.parallel.ring import ring_attention
    from cuda_flashattention_tpu.utils.testing import (
        assert_close, seeded_random)

    mesh = make_mesh((4,), ("sp",), jax.devices()[:4])
    b, h, h_kv, n, d = 1, 4, 2, 64, 16
    q = jnp.asarray(seeded_random((b, h, n, d), seed=71))
    k = jnp.asarray(seeded_random((b, h_kv, n, d), seed=72))
    v = jnp.asarray(seeded_random((b, h_kv, n, d), seed=73))
    do = jnp.asarray(seeded_random((b, h, n, d), seed=74))
    qs = shard_on_axis(mesh, q, 2, "sp")
    ks = shard_on_axis(mesh, k, 2, "sp")
    vs = shard_on_axis(mesh, v, 2, "sp")

    o = ring_attention(qs, ks, vs, mesh=mesh, causal=True)
    kf = jnp.repeat(k, h // h_kv, axis=1)
    vf = jnp.repeat(v, h // h_kv, axis=1)
    o_ref, _ = naive_attention(q, kf, vf, causal=True)
    assert_close(o, o_ref, 2e-3, name="ring gqa fwd")

    def loss(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh=mesh, causal=True)
                       .astype(jnp.float32) * do)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(qs, ks, vs)
    dq_r, dk_r, dv_r = naive_attention_backward(q, kf, vf, do, causal=True)
    g = h // h_kv
    dk_ref = dk_r.reshape(b, h_kv, g, n, d).sum(2)
    dv_ref = dv_r.reshape(b, h_kv, g, n, d).sum(2)
    assert_close(dq, dq_r, 2e-3, name="ring gqa dQ")
    assert_close(dk, dk_ref, 2e-3, name="ring gqa dK")
    assert_close(dv, dv_ref, 2e-3, name="ring gqa dV")


def test_ring_sliding_window():
    """Windowed ring: the ring terminates after ceil(W/L)+1 hops and the
    result matches the windowed oracle — fwd and bwd."""
    import jax
    import jax.numpy as jnp
    from cuda_flashattention_tpu.ops.naive import (
        naive_attention, naive_attention_backward)
    from cuda_flashattention_tpu.parallel.mesh import make_mesh, shard_on_axis
    from cuda_flashattention_tpu.parallel.ring import ring_attention
    from cuda_flashattention_tpu.utils.testing import (
        assert_close, seeded_random)

    mesh = make_mesh((4,), ("sp",), jax.devices()[:4])
    b, h, n, d = 1, 2, 64, 16  # L = 16 per shard
    q = jnp.asarray(seeded_random((b, h, n, d), seed=141))
    k = jnp.asarray(seeded_random((b, h, n, d), seed=142))
    v = jnp.asarray(seeded_random((b, h, n, d), seed=143))
    do = jnp.asarray(seeded_random((b, h, n, d), seed=144))
    qs = shard_on_axis(mesh, q, 2, "sp")
    ks = shard_on_axis(mesh, k, 2, "sp")
    vs = shard_on_axis(mesh, v, 2, "sp")

    for window in (10, 20, 40):  # spans 1, 2, and 3+ shards
        o = ring_attention(qs, ks, vs, mesh=mesh, causal=True,
                           window=window)
        o_ref, _ = naive_attention(q, k, v, causal=True, window=window)
        assert_close(o, o_ref, 2e-3, name=f"ring win{window} fwd")

        def loss(q, k, v, w=window):
            return jnp.sum(ring_attention(q, k, v, mesh=mesh, causal=True,
                                          window=w).astype(jnp.float32)
                           * do)

        dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(qs, ks, vs)
        dq_r, dk_r, dv_r = naive_attention_backward(q, k, v, do,
                                                    causal=True,
                                                    window=window)
        assert_close(dq, dq_r, 2e-3, name=f"ring win{window} dQ")
        assert_close(dk, dk_r, 2e-3, name=f"ring win{window} dK")
        assert_close(dv, dv_r, 2e-3, name=f"ring win{window} dV")


@needs_multi
def test_ring_decode_ragged_cache():
    """Cache length that does NOT divide the shard axis: ring_decode pads
    to the shard grid (the last SURVEY §7(e) assert-dodge — VERDICT r2
    #7); pad rows sit past `lengths` so the length mask excludes them."""
    mesh = _mesh_n(4)
    n = 250  # 250 % 4 != 0
    _, k, v = random_qkv(1, 2, 0, n, 32)
    q = jnp.asarray(seeded_random((1, 2, 32), 9))
    for glen in (n, 123):
        o, lse = ring_decode(q, k, v, glen, mesh)
        o_ref, lse_ref = naive_attention(
            q[:, :, None, :], k[:, :, :glen], v[:, :, :glen])
        assert_close(o, o_ref[:, :, 0], 5e-3, f"ragged ring decode O@{glen}")
        assert_close(lse, lse_ref[:, :, 0], 1e-2,
                     f"ragged ring decode LSE@{glen}")
    # quantized ragged: scale rows pad too
    kv = quantize_kv(k, v, "int8")
    o, _ = ring_decode(q, kv.k_q, kv.v_q, n, mesh,
                       k_scale=kv.k_scale, v_scale=kv.v_scale)
    o_ref, _ = naive_attention(q[:, :, None, :], k, v)
    assert_close(o, o_ref[:, :, 0], 5e-3, "ragged ring decode int8 O")
