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


@pytest.mark.parametrize("qtype", ["int8", "fp8"])
def test_quantized_cache_generates(setup, qtype):
    # quantisation perturbs logits; require a valid rollout and a high
    # token-level agreement with the exact path rather than equality
    params, prompt = setup
    n_new = 6
    out, logits = generate(params, prompt, CFG, max_new_tokens=n_new,
                           qtype=qtype)
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
