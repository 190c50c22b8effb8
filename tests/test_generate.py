"""End-to-end generation tests: the cached decode path must reproduce the
uncached full-forward path token for token (the strongest equivalence the
serving loop can satisfy), across bf16 and quantized caches."""

import jax
import jax.numpy as jnp
import pytest

from cuda_flashattention_tpu.models.generate import generate
from cuda_flashattention_tpu.models.transformer import (
    TransformerConfig,
    forward,
    init_params,
)

CFG = TransformerConfig(
    vocab_size=97, d_model=64, n_layers=2, n_heads=4, n_kv_heads=2,
    d_head=16, d_ff=128, max_seq=64, dtype=jnp.float32)


@pytest.fixture(scope="module")
def setup():
    params = init_params(jax.random.PRNGKey(0), CFG)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 7), 0,
                                CFG.vocab_size)
    return params, prompt


def greedy_reference(params, prompt, n_new):
    """Teacher-forced reference: rerun the FULL forward on the growing
    sequence each step (O(T^2) but oracle-exact)."""
    toks = prompt
    for _ in range(n_new):
        logits = forward(params, toks, CFG)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(toks.dtype)
        toks = jnp.concatenate([toks, nxt[:, None]], axis=1)
    return toks


def test_greedy_matches_uncached_forward(setup):
    params, prompt = setup
    n_new = 6
    out, _ = generate(params, prompt, CFG, max_new_tokens=n_new)
    ref = greedy_reference(params, prompt, n_new)
    assert out.shape == (2, 7 + n_new)
    assert (out == ref).all(), f"{out} vs {ref}"


@pytest.mark.parametrize("qtype,qq", [("int8", False), ("fp8", False),
                                      ("int8", True), ("mixed", True)])
def test_quantized_cache_generates(setup, qtype, qq):
    # quantisation perturbs logits; require a valid rollout and a high
    # token-level agreement with the exact path rather than equality.
    # qq=True drives the quantize_q plumbing through
    # generate -> decode_one -> decode_step (review r4: the serving
    # stack previously could not reach the 2x int8-MXU decode path)
    params, prompt = setup
    n_new = 6
    out, logits = generate(params, prompt, CFG, max_new_tokens=n_new,
                           qtype=qtype, quantize_q=qq)
    assert out.shape == (2, 7 + n_new)
    assert ((out >= 0) & (out < CFG.vocab_size)).all()
    assert jnp.isfinite(logits).all()
    ref = greedy_reference(params, prompt, n_new)
    agree = (out[:, 7:] == ref[:, 7:]).mean()
    assert agree >= 0.5, f"only {agree:.0%} token agreement under {qtype}"


def test_sampled_generation_reproducible(setup):
    params, prompt = setup
    kw = dict(max_new_tokens=5, temperature=0.8,
              key=jax.random.PRNGKey(42))
    out1, _ = generate(params, prompt, CFG, **kw)
    out2, _ = generate(params, prompt, CFG, **kw)
    assert (out1 == out2).all()


def test_max_len_overallocation(setup):
    # cache larger than needed: clamped decode must ignore dead tail
    params, prompt = setup
    out, _ = generate(params, prompt, CFG, max_new_tokens=4, max_len=64)
    ref = greedy_reference(params, prompt, 4)
    assert (out == ref).all()


def test_chunked_prefill_matches_whole(setup):
    """Chunked prefill must produce the same next-token logits and cache
    contents as one-shot prefill (bf16 cache, exact)."""
    from cuda_flashattention_tpu.models.transformer import (
        init_caches, prefill, prefill_chunked)
    params, prompt = setup  # [2, 7]
    caches0 = init_caches(CFG, 2, 16)
    logits_whole, caches_w = prefill(params, prompt, CFG, caches0)
    caches1 = init_caches(CFG, 2, 16)
    logits_chunk, caches_c = prefill_chunked(params, prompt, CFG, caches1,
                                             chunk=3)
    assert jnp.max(jnp.abs(logits_whole - logits_chunk)) < 1e-4
    for cw, cc in zip(caches_w, caches_c):
        assert int(cw.length) == int(cc.length) == 7
        assert jnp.max(jnp.abs(cw.k[:, :, :7] - cc.k[:, :, :7])) < 1e-5


def test_chunked_prefill_quantized_cache(setup):
    """Chunked prefill through an int8 cache: later chunks read the
    quantized prefix via the fused-dequant kernel; logits must stay close
    to the exact path."""
    from cuda_flashattention_tpu.models.transformer import (
        init_caches, prefill, prefill_chunked)
    params, prompt = setup
    caches0 = init_caches(CFG, 2, 16)
    logits_exact, _ = prefill(params, prompt, CFG, caches0)
    caches1 = init_caches(CFG, 2, 16, qtype="int8")
    logits_q, caches_q = prefill_chunked(params, prompt, CFG, caches1,
                                         chunk=3)
    assert caches_q[0].quantized
    # int8 KV perturbs logits (measured ~0.1 on this tiny model); the
    # greedy decision must survive it
    assert jnp.max(jnp.abs(logits_exact - logits_q)) < 0.3
    assert (jnp.argmax(logits_exact, -1) == jnp.argmax(logits_q, -1)).all()


def test_chunked_prefill_sliding_window(setup):
    """Windowed chunked prefill (VERDICT r1 #6's last stub): the prefix
    partial runs as causal+window with a kv_offset over the sliced cache
    and must match whole-prompt prefill exactly."""
    import dataclasses
    from cuda_flashattention_tpu.models.transformer import (
        init_caches, init_params, prefill, prefill_chunked)
    cfg = dataclasses.replace(CFG, window=4)
    params = init_params(jax.random.PRNGKey(3), cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(4), (2, 11), 0,
                                cfg.vocab_size)
    caches0 = init_caches(cfg, 2, 16)
    logits_whole, _ = prefill(params, prompt, cfg, caches0)
    for chunk in (3, 5):
        caches1 = init_caches(cfg, 2, 16)
        logits_chunk, _ = prefill_chunked(params, prompt, cfg, caches1,
                                          chunk=chunk)
        assert jnp.max(jnp.abs(logits_whole - logits_chunk)) < 1e-4, chunk


def test_sliding_window_model_generates():
    """SWA config: cached generation matches the teacher-forced windowed
    forward exactly (greedy, fp32)."""
    import dataclasses
    from cuda_flashattention_tpu.models.transformer import forward
    cfg = dataclasses.replace(CFG, window=6)
    params = init_params(jax.random.PRNGKey(3), cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(4), (2, 7), 0,
                                cfg.vocab_size)
    n_new = 5
    toks = prompt
    for _ in range(n_new):
        logits = forward(params, toks, cfg)
        nxt = jnp.argmax(logits[:, -1], -1).astype(toks.dtype)
        toks = jnp.concatenate([toks, nxt[:, None]], axis=1)
    out, _ = generate(params, prompt, cfg, max_new_tokens=n_new)
    assert (out == toks).all(), f"{out} vs {toks}"
