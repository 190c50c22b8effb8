"""GPipe pipeline-parallelism tests: the pipelined stack must equal the
sequential stack exactly (fwd and grads), alone and composed with dp."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from cuda_flashattention_tpu.parallel.mesh import make_mesh
from cuda_flashattention_tpu.parallel.pipeline import (
    gpipe_spmd,
    stack_stage_params,
    stage_param_sharding,
)
from cuda_flashattention_tpu.utils.testing import assert_close, seeded_random

N_LAYERS, D = 8, 16


def layer_fn(w, x):
    return jnp.tanh(x @ w)


def stage_fn(stage_w, x):
    # stage_w: [layers_per_stage, D, D]
    for i in range(stage_w.shape[0]):
        x = layer_fn(stage_w[i], x)
    return x


def sequential(stacked_w, x):
    for i in range(stacked_w.shape[0]):
        x = layer_fn(stacked_w[i], x)
    return x


@pytest.fixture(scope="module")
def setup():
    ws = [jnp.asarray(seeded_random((D, D), seed=160 + i)) * 0.5
          for i in range(N_LAYERS)]
    stacked = stack_stage_params(ws)
    x = jnp.asarray(seeded_random((8, D), seed=170))
    return stacked, x


@pytest.mark.parametrize("n_micro", [2, 4, 8])
def test_pipeline_matches_sequential(setup, n_micro):
    stacked, x = setup
    mesh = make_mesh((4,), ("pp",), jax.devices()[:4])
    w_sharded = jax.device_put(stacked,
                               stage_param_sharding(stacked, mesh))
    y = gpipe_spmd(stage_fn, w_sharded, x, mesh, n_micro=n_micro)
    y_ref = sequential(stacked, x)
    assert_close(y, y_ref, 1e-5, name=f"gpipe m={n_micro}")


def test_pipeline_grads_match(setup):
    stacked, x = setup
    mesh = make_mesh((4,), ("pp",), jax.devices()[:4])
    w_sharded = jax.device_put(stacked,
                               stage_param_sharding(stacked, mesh))

    def loss_pipe(w, x):
        return jnp.sum(gpipe_spmd(stage_fn, w, x, mesh, n_micro=4) ** 2)

    def loss_seq(w, x):
        return jnp.sum(sequential(w, x) ** 2)

    gw_p, gx_p = jax.grad(loss_pipe, argnums=(0, 1))(w_sharded, x)
    gw_s, gx_s = jax.grad(loss_seq, argnums=(0, 1))(stacked, x)
    assert_close(gw_p, gw_s, 1e-5, name="gpipe dW")
    assert_close(gx_p, gx_s, 1e-5, name="gpipe dX")


def test_pipeline_with_dp(setup):
    stacked, x = setup
    mesh = make_mesh((2, 4), ("dp", "pp"), jax.devices()[:8])
    w_sharded = jax.device_put(stacked,
                               stage_param_sharding(stacked, mesh))
    xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
    y = gpipe_spmd(stage_fn, w_sharded, xs, mesh, n_micro=2,
                   batch_axis="dp")
    y_ref = sequential(stacked, x)
    assert_close(y, y_ref, 1e-5, name="gpipe dp x pp")


def test_transformer_pipeline_forward():
    """Flagship model through the GPipe path == plain forward."""
    from cuda_flashattention_tpu.models.transformer import (
        TransformerConfig, forward, init_params, pipeline_forward)
    cfg = TransformerConfig(vocab_size=61, d_model=32, n_layers=4,
                            n_heads=2, n_kv_heads=2, d_head=16, d_ff=64,
                            max_seq=16, dtype=jnp.float32)
    params = init_params(jax.random.PRNGKey(5), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(6), (4, 16), 0, 61)
    mesh = make_mesh((2,), ("pp",), jax.devices()[:2])
    logits_pp = pipeline_forward(params, tokens, cfg, mesh, n_micro=2)
    logits = forward(params, tokens, cfg)
    assert_close(logits_pp, logits, 1e-4, name="transformer gpipe")
