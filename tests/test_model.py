"""Flagship transformer tests: training math, decode-vs-forward parity,
and the sequence-parallel path."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cuda_flashattention_tpu.models.transformer import (
    TransformerConfig,
    decode_one,
    forward,
    init_caches,
    init_params,
    loss_fn,
    make_train_step,
    prefill,
)
from cuda_flashattention_tpu.parallel.mesh import make_mesh

CFG = TransformerConfig(
    vocab_size=128, d_model=64, n_layers=2, n_heads=4, n_kv_heads=2,
    d_head=16, d_ff=128, max_seq=64, dtype=jnp.float32)


def _params_and_tokens(b=2, t=32, seed=0):
    key = jax.random.PRNGKey(seed)
    params = init_params(key, CFG)
    tokens = jax.random.randint(jax.random.PRNGKey(seed + 1), (b, t), 0,
                                CFG.vocab_size)
    return params, tokens


def test_forward_shapes_finite():
    params, tokens = _params_and_tokens()
    logits = forward(params, tokens, CFG)
    assert logits.shape == (2, 32, CFG.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_causality():
    """Changing a future token must not change past logits."""
    params, tokens = _params_and_tokens()
    logits1 = forward(params, tokens, CFG)
    tokens2 = tokens.at[:, 20].set((tokens[:, 20] + 1) % CFG.vocab_size)
    logits2 = forward(params, tokens2, CFG)
    np.testing.assert_allclose(np.asarray(logits1[:, :20]),
                               np.asarray(logits2[:, :20]), atol=1e-5)
    assert float(jnp.max(jnp.abs(logits1[:, 20:] - logits2[:, 20:]))) > 1e-4


def test_train_step_reduces_loss():
    params, tokens = _params_and_tokens()
    opt = optax.adam(3e-3)
    step = make_train_step(CFG, opt)
    opt_state = opt.init(params)
    l0 = float(loss_fn(params, tokens, CFG))
    for _ in range(10):
        params, opt_state, loss = step(params, opt_state, tokens)
    l1 = float(loss)
    assert l1 < l0, f"loss did not decrease: {l0} -> {l1}"


@pytest.mark.parametrize("qtype", [None, "int8"])
def test_decode_matches_forward(qtype):
    """Prefill+decode must reproduce the full forward's next-token logits
    (the KV-cache path vs the training path)."""
    params, tokens = _params_and_tokens(b=1, t=16)
    caches = init_caches(CFG, 1, CFG.max_seq, qtype=qtype)
    logits_p, caches = prefill(params, tokens, CFG, caches)
    logits_f = forward(params, tokens, CFG)
    # int8 tolerance: quant noise (~0.4% per layer) compounds through the
    # blocks and the vocab projection; raw logits here are O(30).
    tol = 1e-4 if qtype is None else 0.5
    np.testing.assert_allclose(np.asarray(logits_p),
                               np.asarray(logits_f[:, -1]), atol=tol)

    # decode two more tokens, checking against the growing full forward
    tok = jnp.argmax(logits_p, axis=-1)
    seq = jnp.concatenate([tokens, tok[:, None]], axis=1)
    for pos in range(16, 18):
        logits_d, caches = decode_one(params, tok, pos, CFG, caches)
        logits_full = forward(params, seq, CFG)[:, -1]
        np.testing.assert_allclose(np.asarray(logits_d),
                                   np.asarray(logits_full), atol=tol)
        tok = jnp.argmax(logits_d, axis=-1)
        seq = jnp.concatenate([seq, tok[:, None]], axis=1)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sequence_parallel_forward_matches():
    """Ring-attention model forward == single-device forward."""
    mesh = make_mesh((2, 4), ("dp", "sp"))
    params, tokens = _params_and_tokens(b=2, t=32)
    logits_ring = forward(params, tokens, CFG, mesh=mesh, seq_axis="sp",
                          batch_axis="dp")
    logits_ref = forward(params, tokens, CFG)
    np.testing.assert_allclose(np.asarray(logits_ring),
                               np.asarray(logits_ref), atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sequence_parallel_train_step():
    """Full dp×sp train step: grads flow through the ring backward."""
    mesh = make_mesh((2, 4), ("dp", "sp"))
    params, tokens = _params_and_tokens(b=2, t=32)
    opt = optax.adam(1e-3)
    step = make_train_step(CFG, opt, mesh=mesh, seq_axis="sp",
                           batch_axis="dp")
    opt_state = opt.init(params)
    params, opt_state, loss = step(params, opt_state, tokens)
    assert bool(jnp.isfinite(loss))

    # gradient parity vs single-device
    g_ring = jax.grad(lambda p: loss_fn(p, tokens, CFG, mesh=mesh,
                                        seq_axis="sp", batch_axis="dp"))(
        _params_and_tokens()[0])
    g_ref = jax.grad(lambda p: loss_fn(p, tokens, CFG))(
        _params_and_tokens()[0])
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g_ring, g_ref)
    max_diff = max(jax.tree_util.tree_leaves(diffs))
    assert max_diff < 5e-4, f"grad mismatch: {max_diff}"


def test_tensor_parallel_matches_unsharded():
    """dp×tp×sp train step must compute the same loss as the unsharded
    step — tensor parallelism (head/FFN sharding) is a layout, not a
    math change."""
    import numpy as np
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from cuda_flashattention_tpu.models.transformer import (
        init_params, make_train_step, param_shardings)

    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices.reshape(2, 2, 2), ("dp", "tp", "sp"))
    params = init_params(jax.random.PRNGKey(0), CFG)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0,
                                CFG.vocab_size)

    opt = optax.sgd(1e-2)
    step_plain = make_train_step(CFG, opt)
    p1, _, loss_plain = step_plain(params, opt.init(params), tokens)

    params_tp = jax.device_put(
        init_params(jax.random.PRNGKey(0), CFG),
        param_shardings(init_params(jax.random.PRNGKey(0), CFG), mesh,
                        head_axis="tp"))
    tokens_tp = jax.device_put(tokens, NamedSharding(mesh, P("dp", None)))
    step_tp = make_train_step(CFG, opt, mesh=mesh, seq_axis="sp",
                              batch_axis="dp", head_axis="tp")
    p2, _, loss_tp = step_tp(params_tp, opt.init(params_tp), tokens_tp)
    assert abs(float(loss_plain) - float(loss_tp)) < 1e-4, (
        f"{float(loss_plain)} vs {float(loss_tp)}")
