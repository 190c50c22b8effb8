"""Decode attention + KV cache manager tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_flashattention_tpu.ops.decode import decode_attention
from cuda_flashattention_tpu.ops.kv_cache import (
    KVCache,
    append,
    decode_step,
    init_cache,
)
from cuda_flashattention_tpu.ops.naive import naive_attention
from cuda_flashattention_tpu.ops.quant import quantize_kv
from cuda_flashattention_tpu.utils.testing import (
    assert_close,
    random_qkv,
    seeded_random,
)


def _oracle_decode(q, k, v, lengths):
    """fp32 oracle: per-batch masked single-query attention."""
    b, h, d = q.shape
    outs, lses = [], []
    for i in range(b):
        n = int(lengths[i])
        o, lse = naive_attention(q[i][:, None, :], k[i, :, :n], v[i, :, :n])
        outs.append(o[:, 0])
        lses.append(lse[:, 0])
    return jnp.stack(outs), jnp.stack(lses)


def test_decode_full_cache():
    qkv = random_qkv(2, 4, 256, 256, 64)
    k, v = qkv[1], qkv[2]
    q = jnp.asarray(seeded_random((2, 4, 64), 3))
    lengths = np.array([256, 256], np.int32)
    o, lse = decode_attention(q, k, v, lengths)
    o_ref, lse_ref = _oracle_decode(q, k, v, lengths)
    assert_close(o, o_ref, 5e-3, "O")
    assert_close(lse, lse_ref, 1e-2, "LSE")


def test_decode_partial_lengths():
    """Rows past each sequence's length must not contribute — fill the
    dead region with huge values to catch any leak."""
    _, k, v = random_qkv(3, 2, 0, 512, 64)
    k = k.at[:, :, 200:].set(1e4)
    v = v.at[:, :, 200:].set(1e4)
    q = jnp.asarray(seeded_random((3, 2, 64), 4))
    lengths = np.array([1, 130, 200], np.int32)
    o, lse = decode_attention(q, k, v, lengths, block_k=128)
    o_ref, lse_ref = _oracle_decode(q, k, v, lengths)
    assert_close(o, o_ref, 5e-3, "O")
    assert_close(lse, lse_ref, 1e-2, "LSE")


def test_decode_gqa():
    _, k, v = random_qkv(1, 2, 0, 128, 64)
    q = jnp.asarray(seeded_random((1, 8, 64), 5))
    lengths = np.array([128], np.int32)
    o, _ = decode_attention(q, k, v, lengths)
    o_ref, _ = _oracle_decode(q, jnp.repeat(k, 4, 1), jnp.repeat(v, 4, 1),
                              lengths)
    assert_close(o, o_ref, 5e-3, "O (GQA)")


@pytest.mark.parametrize("qtype,tol", [("int8", 2e-3), ("fp8", 2e-2)])
def test_decode_quantized(qtype, tol):
    _, k, v = random_qkv(1, 2, 0, 384, 64)
    q = jnp.asarray(seeded_random((1, 2, 64), 6))
    kv = quantize_kv(k, v, qtype)
    lengths = np.array([300], np.int32)
    o, _ = decode_attention(q, kv.k_q, kv.v_q, lengths,
                            k_scale=kv.k_scale, v_scale=kv.v_scale,
                            block_k=128)
    o_ref, _ = _oracle_decode(q, k, v, lengths)
    assert_close(o, o_ref, tol, f"O ({qtype})")


@pytest.mark.parametrize("qtype", [None, "int8"])
def test_cache_append_then_decode(qtype):
    """Prefill via append, then a decode step — the serving loop shape."""
    b, hkv, h, d, n = 2, 2, 4, 64, 96
    cache = init_cache(b, hkv, 256, d, qtype=qtype, dtype=jnp.float32)
    k = jnp.asarray(seeded_random((b, hkv, n, d), 7))
    v = jnp.asarray(seeded_random((b, hkv, n, d), 8))
    cache = append(cache, k, v)
    assert int(cache.length) == n

    # next token
    k1 = jnp.asarray(seeded_random((b, hkv, 1, d), 9))
    v1 = jnp.asarray(seeded_random((b, hkv, 1, d), 10))
    cache = append(cache, k1, v1)
    q = jnp.asarray(seeded_random((b, h, d), 11))
    o, _ = decode_step(q, cache)

    k_full = jnp.concatenate([k, k1], axis=2)
    v_full = jnp.concatenate([v, v1], axis=2)
    o_ref, _ = _oracle_decode(
        q, jnp.repeat(k_full, 2, 1), jnp.repeat(v_full, 2, 1),
        np.full((b,), n + 1))
    tol = 5e-3 if qtype is None else 5e-3
    assert_close(o, o_ref, tol, f"O cache ({qtype})")


def test_cache_is_pytree():
    cache = init_cache(1, 1, 16, 8, qtype="int8")
    flat, tree = jax.tree_util.tree_flatten(cache)
    cache2 = jax.tree_util.tree_unflatten(tree, flat)
    assert isinstance(cache2, KVCache)
    assert cache2.quantized

    # append must work under jit with donated cache
    step = jax.jit(append, donate_argnums=0)
    k1 = jnp.ones((1, 1, 4, 8), jnp.float32)
    cache3 = step(cache, k1, k1)
    assert int(cache3.length) == 4


def test_cache_append_overflow_raises():
    """Appending past max_len with a concrete length must fail loudly
    (VERDICT r1 #8) instead of silently clobbering the cache tail. Under
    jit the length is traced, so the clamp semantics remain (documented);
    serving loops pre-check capacity host-side (models/generate.py)."""
    cache = init_cache(1, 1, 8, 8, dtype=jnp.float32)
    k1 = jnp.ones((1, 1, 6, 8), jnp.float32)
    cache = append(cache, k1, k1)
    with pytest.raises(ValueError, match="overflow"):
        append(cache, k1, k1)  # 6 + 6 > 8
    # exactly-full is fine
    k2 = jnp.ones((1, 1, 2, 8), jnp.float32)
    cache = append(cache, k2, k2)
    assert int(cache.length) == 8


def test_decode_windows_exceeding_static_cap():
    """Per-seq `windows` above the static `window` must be CAPPED, not
    silently truncate the visited grid (the O(window) grid only covers
    cdiv(window,block_k)+1 blocks — an uncapped larger dynamic window
    would offset past the newest blocks and skip them)."""
    import numpy as np
    rng = np.random.default_rng(11)
    k = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 2, 256, 32)), jnp.float32)
    v = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 2, 256, 32)), jnp.float32)
    q = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 2, 32)), jnp.float32)
    lengths = jnp.asarray([256], jnp.int32)
    # HIGHEST matmul precision: the 1e-5 bars assume fp32 matmuls;
    # on-TPU default precision drifts ~1e-3-class (r5)
    with jax.default_matmul_precision("highest"):
        o, _ = decode_attention(q, k, v, lengths, block_k=64, window=64,
                                windows=jnp.asarray([256], jnp.int32),
                                interpret=True)
        # effective window = min(256, 64) = 64 → last 64 tokens
        o_ref, _ = naive_attention(q[:, :, None, :], k[:, :, 192:],
                                   v[:, :, 192:])
        assert_close(o, o_ref[:, :, 0], 1e-5, "capped dynamic window")
        # windows WITHOUT a static cap keeps the full grid and honours
        # any value (>= length means no window)
        o2, _ = decode_attention(q, k, v, lengths, block_k=64,
                                 windows=jnp.asarray([256], jnp.int32),
                                 interpret=True)
        o_full, _ = naive_attention(q[:, :, None, :], k, v)
        assert_close(o2, o_full[:, :, 0], 1e-5, "uncapped dynamic window")


def test_decode_quantize_q():
    """int8 KV + per-head int8 Q decode (2x-MXU QK, no K cast) matches
    the dequantized oracle; fp8 caches ignore the flag (documented)."""
    import numpy as np
    from cuda_flashattention_tpu.ops.quant import quantize_kv
    rng = np.random.default_rng(13)
    k = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 2, 200, 32)), jnp.float32)
    v = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 2, 200, 32)), jnp.float32)
    q = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 8, 32)), jnp.float32)
    kv = quantize_kv(k, v, "int8")
    kd, vd = kv.dequantize()
    lengths = jnp.asarray([150, 200], jnp.int32)
    o, lse = decode_attention(q, kv.k_q, kv.v_q, lengths,
                              k_scale=kv.k_scale, v_scale=kv.v_scale,
                              quantize_q=True, interpret=True)
    for i, ln in enumerate([150, 200]):
        o_ref, _ = naive_attention(
            q[i:i + 1, :, None, :], jnp.repeat(kd[i:i + 1, :, :ln], 4, 1),
            jnp.repeat(vd[i:i + 1, :, :ln], 4, 1))
        assert_close(o[i:i + 1], o_ref[:, :, 0], 5e-3,
                     f"decode quantize_q len={ln}")


def test_decode_fp8_bf16_q():
    """bf16 q + fp8 cache: the 5-op shift-cast branch (k_fast/v_fast)
    engages — no decode test used bf16 q before, so the branch had zero
    suite coverage (ADVICE r2)."""
    rng = np.random.default_rng(17)
    k = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 2, 200, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 2, 200, 64)), jnp.bfloat16)
    q = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 2, 64)), jnp.bfloat16)
    kv = quantize_kv(k, v, "fp8")
    kd, vd = kv.dequantize()
    lengths = np.array([150, 200], np.int32)
    o, _ = decode_attention(q, kv.k_q, kv.v_q, lengths,
                            k_scale=kv.k_scale, v_scale=kv.v_scale,
                            block_k=128)
    o_ref, _ = _oracle_decode(q.astype(jnp.float32),
                              kd.astype(jnp.float32),
                              vd.astype(jnp.float32), lengths)
    assert_close(o.astype(jnp.float32), o_ref, 1e-2, "O (fp8 bf16-q)")


@pytest.mark.parametrize("qq", [False, True])
@pytest.mark.parametrize("qdt", [jnp.float32, jnp.bfloat16])
def test_decode_mixed_cache(qq, qdt):
    """Mixed int8-K/fp8-V cache (ops/quant.py "mixed"): int8 K rides the
    2x-MXU path under quantize_q with zero K cast, V keeps e4m3
    precision via the shift-cast (bf16 q) or the rebias cast (fp32 q)."""
    rng = np.random.default_rng(19)
    k = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 2, 200, 32)), qdt)
    v = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 2, 200, 32)), qdt)
    q = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 4, 32)), qdt)
    kv = quantize_kv(k, v, "mixed")
    assert kv.qtype == "mixed"
    assert kv.k_q.dtype == jnp.int8 and kv.v_q.dtype == jnp.float8_e4m3fn
    kd, vd = kv.dequantize()
    lengths = np.array([130, 200], np.int32)
    o, _ = decode_attention(q, kv.k_q, kv.v_q, lengths,
                            k_scale=kv.k_scale, v_scale=kv.v_scale,
                            quantize_q=qq, block_k=128)
    o_ref, _ = _oracle_decode(
        q.astype(jnp.float32), jnp.repeat(kd, 2, 1).astype(jnp.float32),
        jnp.repeat(vd, 2, 1).astype(jnp.float32), lengths)
    assert_close(o.astype(jnp.float32), o_ref, 1e-2,
                 f"O (mixed qq={qq})")


def test_cache_append_overflow_checkify():
    """Jitted appends cannot raise (static shapes) and clamp-saturate;
    wrapping in checkify must surface the overflow as a real error
    (VERDICT r2 weak #8)."""
    from jax.experimental import checkify
    cache = init_cache(1, 1, 8, 16, dtype=jnp.float32)
    k1 = jnp.ones((1, 1, 6, 16), jnp.float32)

    @jax.jit
    def two_appends(c, k):
        c = append(c, k, k)
        return append(c, k, k)  # 12 > 8: overflow under jit

    checked = checkify.checkify(two_appends,
                                errors=checkify.user_checks)
    err, _ = checked(cache, k1)
    with pytest.raises(Exception, match="overflow"):
        err.throw()
    # and the non-overflowing path stays clean
    k2 = jnp.ones((1, 1, 3, 16), jnp.float32)
    err, out = checked(cache, k2)
    err.throw()
    assert int(out.length) == 6


def test_default_block_k_resolution():
    """The block_k=None adaptive default (review r3): 32k wide blocks
    ONLY for fp8-ish caches on the bf16 shift-cast path at long
    un-windowed context — fp32-q fp8 would OOM VMEM at 32k, and windowed
    grids would stream ~4x the bytes per step."""
    from cuda_flashattention_tpu.ops.decode import default_decode_block_k

    f8, i8, bf, f32 = (jnp.float8_e4m3fn, jnp.int8, jnp.bfloat16,
                       jnp.float32)
    # the 1M fp8/bf16-q serving point gets the widest block (r4: 65536
    # at >=256k capacity — mixed+qq measured 133.4 -> 137.1 tok/s on
    # v5e); mixed too (V fp8); 131k capacity keeps 32768
    assert default_decode_block_k(f8, f8, bf, False, 0, False, 1 << 20) == 65536
    assert default_decode_block_k(i8, f8, bf, True, 0, False, 1 << 20) == 65536
    assert default_decode_block_k(f8, f8, bf, False, 0, False, 131072) == 32768
    # fp32 q (slow fp32-dequant path): VMEM-unsafe at 32k+ -> 8192
    assert default_decode_block_k(f8, f8, f32, False, 0, False, 1 << 20) == 8192
    # quantize_q forces bf16 compute even for fp32 q
    assert default_decode_block_k(i8, f8, f32, True, 0, False, 1 << 20) == 65536
    # windowed serving (static or per-seq) keeps the narrow block
    assert default_decode_block_k(f8, f8, bf, False, 4096, False, 1 << 20) == 8192
    assert default_decode_block_k(f8, f8, bf, False, 0, True, 1 << 20) == 8192
    # short context / non-fp8 caches: narrow
    assert default_decode_block_k(f8, f8, bf, False, 0, False, 16384) == 8192
    assert default_decode_block_k(i8, i8, bf, True, 0, False, 1 << 20) == 8192
    assert default_decode_block_k(bf, bf, bf, False, 0, False, 1 << 20) == 8192


def test_wide_block_default_end_to_end():
    """bf16-q fp8 decode at max_n >= 65536 resolves block_k=None to
    32768 — run that configuration end-to-end (interpret) so the wide
    block's grid/padding/scale-layout logic is exercised, not just the
    resolver."""
    rng = np.random.default_rng(11)
    b, hkv, h, max_n, d = 1, 1, 4, 65536, 64
    live = 300
    kf = np.zeros((b, hkv, max_n, d), np.float32)
    vf = np.zeros((b, hkv, max_n, d), np.float32)
    kf[:, :, :live] = rng.uniform(-1, 1, (b, hkv, live, d))
    vf[:, :, :live] = rng.uniform(-1, 1, (b, hkv, live, d))
    kv = quantize_kv(jnp.asarray(kf), jnp.asarray(vf), "fp8")
    q = jnp.asarray(rng.uniform(-1, 1, (b, h, d)), jnp.bfloat16)
    lengths = jnp.full((b,), live, jnp.int32)
    o, _ = decode_attention(q, kv.k_q, kv.v_q, lengths,
                            k_scale=kv.k_scale, v_scale=kv.v_scale)
    kd, vd = kv.dequantize()
    o_ref, _ = naive_attention(
        jnp.repeat(q[:, :, None].astype(jnp.float32), 1, 1),
        jnp.repeat(kd[:, :, :live], h // hkv, 1),
        jnp.repeat(vd[:, :, :live], h // hkv, 1))
    assert_close(o, o_ref[:, :, 0], 2e-2, name="wide-block fp8 decode")
