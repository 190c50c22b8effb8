"""FlashAttention-1 as a Pallas TPU kernel — the educational ladder rung.

TPU-native re-design of the reference's FA1 kernel
(ref: src/01_flash_attention_v1/flash_attention_kernel.cu:6-163 and host
wrapper src/01_flash_attention_v1/main.cu:7-70). FA1 differs from FA2
(ops/flash_fwd.py) in two algorithm-defining ways, both kept here:

  1. **O is re-normalised after every KV tile** using the
     ``l_old/l_new * exp(m_old - m_new)`` form (ref: kernel.cu:147-154),
     instead of FA2's deferred single epilogue divide. This is the exact
     form the reference's memo warns accumulates fp error
     ((x/y)*(y/z) != x/z — ref: memo.md:5) — FA1 exists in the ladder to
     make that trade-off observable against FA2 and the oracle.
  2. **The KV loop is the sequential dimension owned by one program**:
     the CUDA kernel persists l/m/O in HBM between KV tiles
     (ref: kernel.cu:97-98,156-161); on TPU the idiomatic equivalent is a
     `lax.fori_loop` over KV tiles inside one kernel instance with the
     (m, l, O) state carried as loop values in VMEM/registers — HBM
     round-trips for softmax state are a CUDA-grid artifact with no TPU
     analog (and the -inf init gotcha, ref: memo.md:1, disappears: the
     carry is simply initialised in-kernel).

K and V are staged whole into VMEM per (batch, head) — like FA1's "all
tiles in shared memory" design point (ref: kernel.cu:32-41), which is what
caps its problem size. This rung is for ladder-scale shapes (N*d fitting
VMEM); production sizes belong to ops/flash_fwd.py, whose Pallas pipeline
streams KV blocks instead.

Reference quirks deliberately NOT replicated (SURVEY.md "known quirks"):
the Tc-computed-with-Br tile-count mismatch (ref: kernel.cu:52), the
mid-loop `return` before a later `__syncthreads` (ref: kernel.cu:92-94),
and the divisibility assumption — non-divisible shapes are padded and
masked here.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from cuda_flashattention_tpu.ops.common import (
    NEG_INF,
    default_interpret,
    pad_to_block,
    resolve_scale,
    round_up,
)


def _fa1_kernel(
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    *,
    causal: bool,
    nk_valid: int,
    block_q: int,
    block_k: int,
):
    iq = pl.program_id(2)
    q = q_ref[0, 0]  # (Bq, d), prescaled by `scale` host-side
    nk_p = k_ref.shape[2]  # whole K/V resident in VMEM (FA1 design point)
    n_tiles = nk_p // block_k
    bq, d = q.shape

    ragged = nk_valid % block_k != 0

    def body(it, carry):
        m_prev, l_prev, o_prev = carry
        k_t = k_ref[0, 0, pl.ds(it * block_k, block_k), :]
        v_t = v_ref[0, 0, pl.ds(it * block_k, block_k), :]
        # S = Q.K^T on the MXU (ref: kernel.cu:107-119 computes this with
        # a per-thread dot; one (Bq,d)x(d,Bk) matmul here).
        s = jax.lax.dot_general(
            q, k_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Bq, Bk)
        masked = causal or ragged
        if masked:
            col = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                   + it * block_k)
            ok = col < nk_valid
            if causal:
                row = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                       + iq * block_q)
                ok = jnp.logical_and(ok, col <= row)
            s = jnp.where(ok, s, NEG_INF)

        # Online softmax, FA1 form (ref: kernel.cu:121-154): new running
        # max/sum, then O renormalised THIS step by l_prev/l_new * alpha.
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_curr)
        p = jnp.exp(s - m_new)
        if masked:
            # Rows with every key masked so far have m_new == NEG_INF and
            # exp(s - m_new) == 1 at masked entries; force those to 0.
            p = jnp.where(s > NEG_INF * 0.5, p, 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_t.dtype), v_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # The FA1-defining update: O kept normalised every step
        # (ref: kernel.cu:147-154) — numerically inferior to FA2's
        # deferred divide (memo.md:5) but algorithm-faithful.
        l_safe = jnp.maximum(l_new, 1e-30)
        o_new = (l_prev * alpha * o_prev + pv) / l_safe
        return m_new, l_new, o_new

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    o0 = jnp.zeros((bq, d), jnp.float32)
    _, _, o = jax.lax.fori_loop(0, n_tiles, body, (m0, l0, o0))
    o_ref[0, 0] = o.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "causal", "block_q", "block_k", "interpret"),
)
def fa1_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    causal: bool = False,
    block_q: int = 256,
    block_k: int = 256,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """FlashAttention-1 forward. q/k/v [B,H,N,d] -> O [B,H,Nq,d].

    Host counterpart of `flash_attention` (ref: 01/main.cu:7-70): resolves
    tile sizes (the reference derives Br=min(d,Bc), :21 — here both are
    explicit arguments so tests can sweep them like the reference's
    Bc in {1,2,4} sweep, ref: main.cu:342-344), pads, and dispatches.

    Forward only, no LSE output — matching the FA1 rung's surface (the
    reference's FA1 keeps l/m internal and emits only O). Use
    ops.flash_fwd / ops.attention for the production path.
    """
    if q.ndim != 4:
        raise ValueError(f"expected q [B,H,N,d], got {q.shape}")
    b, h, nq, d = q.shape
    _, h_kv, nk, _ = k.shape
    if h_kv != h:
        raise ValueError("fa1 is the educational rung: no GQA "
                         f"(q heads {h} != kv heads {h_kv})")
    scale = resolve_scale(scale, d)
    interpret = default_interpret() if interpret is None else interpret
    block_q = max(8, min(block_q, round_up(nq, 8)))
    block_k = max(8, min(block_k, round_up(nk, 8)))

    q_p = pad_to_block((q * scale).astype(q.dtype), 2, block_q)
    k_p = pad_to_block(k, 2, block_k)
    v_p = pad_to_block(v, 2, block_k)
    nq_p, nk_p = q_p.shape[2], k_p.shape[2]
    grid = (b, h, nq_p // block_q)

    kernel = functools.partial(
        _fa1_kernel,
        causal=causal,
        nk_valid=nk,
        block_q=block_q,
        block_k=block_k,
    )
    o = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bb, hh, iq: (bb, hh, iq, 0)),
            pl.BlockSpec((1, 1, nk_p, d), lambda bb, hh, iq: (bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, nk_p, d), lambda bb, hh, iq: (bb, hh, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda bb, hh, iq: (bb, hh, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, nq_p, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * nq_p * nk_p * d,
            bytes_accessed=(q_p.size + k_p.size + v_p.size) *
            q_p.dtype.itemsize,
            transcendentals=b * h * nq_p * nk_p,
        ),
        interpret=interpret,
    )(q_p, k_p, v_p)
    return o[:, :, :nq]
