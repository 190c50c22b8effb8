"""FlashAttention-2 backward as Pallas TPU kernels.

TPU-native re-design of the reference's FA2 backward CUDA kernel
(ref: src/02_flash_attention_v2_backward/flash_attention_backward_kernel.cu
:47-299). Same math — recompute S from Q/K, P = exp(S − LSE) from the saved
log-sum-exp (no max pass needed, ref: :169-174), D = rowsum(dO ⊙ O)
(ref: :94-120), dS = P ⊙ (dP − D) (ref: :189-193) — but the parallelisation
is restructured for TPU instead of emulating CUDA atomics:

  The reference parallelises over Q blocks and accumulates dK/dV with
  atomicAdd into shared memory, then atomicAdd into HBM (ref: :207-231).
  TPU has no atomics and doesn't need them: we run TWO kernels, each with
  a race-free output ownership
    * dKdV kernel: grid over KV blocks (parallel), sequential inner grid
      axis over Q blocks; each grid cell owns its (Bk, d) dK/dV tile in a
      fp32 VMEM accumulator.  (SURVEY.md §7 hard part (a).)
    * dQ kernel: grid over Q blocks (parallel), sequential axis over KV
      blocks; owns its (Bq, d) dQ tile — this matches the reference's dQ
      handling (registers, plain store, ref: :195-205, 234-245).
  S is recomputed once per kernel (2× total) — the standard TPU/Triton
  trade of FLOPs for bandwidth; FLOPs are cheap on the MXU.

D is computed outside the kernels as one fused XLA elementwise+reduce
(the reference dedicates a kernel prologue to it, ref: :94-120).

When the full-sequence gradient state fits VMEM (the common training
shapes), both kernels are replaced by ONE fused kernel that visits each
visible tile pair once — S and dP are computed once instead of twice,
cutting the backward matmul count from 7 to 5 (see _bwd_fused_kernel).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_flashattention_tpu.ops.common import (
    auto_block_sizes,
    NEG_INF,
    BlockSizes,
    default_interpret,
    pad_to_block,
    resolve_scale,
)


def _mask_scores(s, iq, ik, *, causal, kv_offset, nk_valid, block_q,
                 block_k, window=0, qseg=None, kseg=None):
    """Padding/causal/segment mask from (Bq,1)x(1,Bk) vector operands
    (full-tile int32 iota pairs cost 8 B/elem of VMEM and cap block
    sizes)."""
    need_pad = nk_valid % block_k != 0
    if not (need_pad or causal or qseg is not None):
        return s
    col = (jax.lax.broadcasted_iota(jnp.int32, (1, s.shape[1]), 1)
           + ik * block_k)
    ok = col < nk_valid if need_pad else jnp.ones_like(col, jnp.bool_)
    if causal:
        row = (jax.lax.broadcasted_iota(jnp.int32, (s.shape[0], 1), 0)
               + iq * block_q + kv_offset)
        ok = jnp.logical_and(ok, col <= row)
        if window:
            ok = jnp.logical_and(ok, col > row - window)
    if qseg is not None:
        # qseg (Bq,1) vs kseg (Bk,1)→(1,Bk) (sublane-major carry; see
        # flash_fwd note on TPU block-size legality)
        ok = jnp.logical_and(ok, qseg == jnp.transpose(kseg, (1, 0)))
    return jnp.where(ok, s, NEG_INF)


_LOG2E = 1.4426950408889634


def _p_from_lse(s2: jnp.ndarray, lse_block: jnp.ndarray) -> jnp.ndarray:
    """P = exp(S − LSE) with fully-masked / padded rows forced to 0.

    Both operands are converted to LOG2 units so the exponential is the
    VPU-native exp2 (s2 arrives as S·log2(e); LSE is stored natural).
    LSE is NEG_INF for rows with no visible keys (and the host pads LSE
    with NEG_INF), so guard before exponentiating
    (ref analog: P=exp(S−L), backward_kernel.cu:169-174)."""
    lse_safe = jnp.where(lse_block < NEG_INF * 0.5, jnp.inf,
                         lse_block * _LOG2E)
    return jnp.exp2(s2 - lse_safe)  # lse is (Bq, 1); broadcasts over Bk


def _recompute_p_ds(q, k, v, do, lse, delta, iq, ik, *, scale, causal,
                    kv_offset, nk_valid, block_q, block_k, window,
                    qseg, kseg):
    """The shared S-recompute pipeline of all three backward kernels:
    S = QKᵀ·scale (log2 units) → mask → P = exp(S − LSE) →
    dP = dO·Vᵀ → dS = P ⊙ (dP − D)·scale (ref: backward_kernel.cu:
    153-193). Returns (p, ds), both fp32 — callers cast per matmul."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (scale * _LOG2E)  # (Bq, Bk), log2 units
    s = _mask_scores(s, iq, ik, causal=causal, kv_offset=kv_offset,
                     nk_valid=nk_valid, block_q=block_q,
                     block_k=block_k, window=window, qseg=qseg, kseg=kseg)
    p = _p_from_lse(s, lse)  # (Bq, Bk) fp32
    # dP = dO · Vᵀ (ref: :176-187)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dS = P ⊙ (dP − D) · scale (ref: :189-193)
    return p, p * (dp - delta) * scale


def _bwd_dkdv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    *refs,
    scale: float,
    causal: bool,
    kv_offset: int,
    nk_valid: int,
    block_q: int,
    block_k: int,
    window: int,
    segmented: bool,
):
    if segmented:
        (qseg_ref, kseg_ref, dk_ref, dv_ref, dk_acc, dv_acc) = refs
    else:
        (dk_ref, dv_ref, dk_acc, dv_acc) = refs
        qseg_ref = kseg_ref = None
    # grid: (batch, KV head, kv block, q block, group member) — the last
    # axis sweeps the query heads sharing this KV head (GQA), so dK/dV
    # accumulate across the whole group without materialising repeated
    # KV heads (the repeat the round-1 ops/attention.py fallback paid).
    ikv = pl.program_id(2)
    iq = pl.program_id(3)
    ig = pl.program_id(4)
    nq_blocks = pl.num_programs(3)
    ngroup = pl.num_programs(4)

    @pl.when(jnp.logical_and(iq == 0, ig == 0))
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    # Causal: this Q block sees this KV block iff its last row reaches the
    # block's first column.
    q_last = (iq + 1) * block_q - 1 + kv_offset
    block_visible = jnp.logical_or(not causal, ikv * block_k <= q_last)
    if window:
        q_first = iq * block_q + kv_offset
        block_visible = jnp.logical_and(
            block_visible,
            ikv * block_k + (block_k - 1) >= q_first - window + 1)

    @pl.when(block_visible)
    def _compute():
        q = q_ref[0, 0]        # (Bq, d)
        k = k_ref[0, 0]        # (Bk, d)
        v = v_ref[0, 0]        # (Bk, d)
        do = do_ref[0, 0]      # (Bq, d)
        lse = lse_ref[0, 0]      # (Bq, 1)
        delta = delta_ref[0, 0]  # (Bq, 1)

        p, ds = _recompute_p_ds(
            q, k, v, do, lse, delta, iq, ikv, scale=scale, causal=causal,
            kv_offset=kv_offset, nk_valid=nk_valid, block_q=block_q,
            block_k=block_k, window=window,
            qseg=None if not segmented else qseg_ref[0],
            kseg=None if not segmented else kseg_ref[0])

        # dV += Pᵀ · dO (ref: backward_kernel.cu:207-214, minus the atomics)
        dv_acc[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dK += dSᵀ · Q (ref: :215-221, minus the atomics)
        dk_acc[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(jnp.logical_and(iq == nq_blocks - 1, ig == ngroup - 1))
    def _epilogue():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    *refs,
    scale: float,
    causal: bool,
    kv_offset: int,
    nk_valid: int,
    block_q: int,
    block_k: int,
    window: int,
    segmented: bool,
):
    if segmented:
        (qseg_ref, kseg_ref, dq_ref, dq_acc) = refs
    else:
        (dq_ref, dq_acc) = refs
        qseg_ref = kseg_ref = None
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    nk_blocks = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    q_last = (iq + 1) * block_q - 1 + kv_offset
    block_visible = jnp.logical_or(not causal, ik * block_k <= q_last)
    if window:
        q_first = iq * block_q + kv_offset
        block_visible = jnp.logical_and(
            block_visible,
            ik * block_k + (block_k - 1) >= q_first - window + 1)

    @pl.when(block_visible)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0]      # (Bq, 1)
        delta = delta_ref[0, 0]  # (Bq, 1)

        _, ds = _recompute_p_ds(
            q, k, v, do, lse, delta, iq, ik, scale=scale, causal=causal,
            kv_offset=kv_offset, nk_valid=nk_valid, block_q=block_q,
            block_k=block_k, window=window,
            qseg=None if not segmented else qseg_ref[0],
            kseg=None if not segmented else kseg_ref[0])
        # dQ += dS · K · scale (scale already folded into ds;
        # ref: backward_kernel.cu:195-205)
        dq_acc[...] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ik == nk_blocks - 1)
    def _epilogue():
        dq_ref[0, 0] = dq_acc[...].astype(dq_ref.dtype)


def _bwd_fused_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, od_ref,
    *refs,
    scale: float,
    causal: bool,
    kv_offset: int,
    nk_valid: int,
    block_q: int,
    block_k: int,
    window: int,
    segmented: bool,
    n_group: int,
    n_k_blocks: int,
    n_q_blocks: int,
    fuse_delta: bool = False,
):
    """Fused single-pass backward: dQ, dK AND dV from ONE visit per
    visible (Q, KV) tile pair — S and dP are computed once (5 matmuls
    per pair: S, dP, dV+=PᵀdO, dK+=dSᵀQ, dQ+=dS·K) instead of twice
    across the split kernels (7).  The reference pays the same 5 inside
    one CUDA block because atomics let every product land in shared
    memory (ref: backward_kernel.cu:153-245); here the split design's
    extra S/dP recompute is bought back with full-sequence fp32 VMEM
    accumulators instead — the K-major forward's trick
    (flash_fwd._fwd_kernel_kmajor).

    Grid: one flat axis enumerating (batch, kv head, group, kv block,
    q block) row-major — iq innermost, so K/V stay resident per ik run
    while Q/dO/LSE/D stream (streamed blocks pipeline; it's
    resident-block swaps that stall, MEMO #16), and batch/head
    boundaries pipeline through instead of flushing.
    dK/dV accumulate across (ig, iq) per KV head, dQ across ik per
    query head.  Every output slice is written exactly once, on the grid
    step where its last contribution lands; out-block buffers flushed on
    earlier passes carry garbage that the final pass overwrites (same
    revisit pattern as the K-major forward's O blocks).

    `fuse_delta` (VERDICT r2 #8): od_ref is the forward's O block and
    D = rowsum(dO ⊙ O) is computed in-kernel on the first KV pass
    (ref dedicates a kernel prologue to the same, backward_kernel.cu:
    94-120) — the host's separate XLA reduce over dO/O and its HBM
    round-trip disappear.  Requires window == 0: the first KV pass must
    visit every Q block unclamped (with a window, late Q blocks are
    invisible at ik == 0 and their O/dO fetch is redirected).  Without
    it, od_ref is the precomputed (Bq, 1) D block.
    """
    if segmented:
        (qseg_ref, kseg_ref, *refs) = refs
    else:
        qseg_ref = kseg_ref = None
    if fuse_delta:
        (dq_ref, dk_ref, dv_ref,
         dq_state, dk_state, dv_state, delta_state) = refs
    else:
        (dq_ref, dk_ref, dv_ref, dq_state, dk_state, dv_state) = refs
        delta_state = None
    # ONE flat sequential grid axis (same motivation as the forward's
    # K-major grid: separate batch/head grid dims break the Mosaic
    # pipeline for ~20-29 µs at every boundary — b·h of them per call).
    # Iteration order is identical to the old (b, hkv, ig, ik, iq)
    # row-major nesting, so the accumulate/write logic is unchanged.
    ngroup, nk_blocks, nq_blocks = n_group, n_k_blocks, n_q_blocks
    t = pl.program_id(0)
    iq = t % nq_blocks
    ik = (t // nq_blocks) % nk_blocks
    ig = (t // (nq_blocks * nk_blocks)) % ngroup

    sweep_start = jnp.logical_and(ik == 0, iq == 0)

    @pl.when(sweep_start)
    def _init_dq():  # per query head (= per ig)
        dq_state[...] = jnp.zeros_like(dq_state)

    @pl.when(jnp.logical_and(ig == 0, sweep_start))
    def _init_dkdv():  # per (batch, kv head) cell
        dk_state[...] = jnp.zeros_like(dk_state)
        dv_state[...] = jnp.zeros_like(dv_state)

    if fuse_delta:
        # D for this Q block, once, on the first KV pass (every iq is
        # visited unclamped at ik == 0 when window == 0 — host gate).
        @pl.when(ik == 0)
        def _delta():
            delta_state[pl.dslice(iq * block_q, block_q), :] = jnp.sum(
                do_ref[0, 0].astype(jnp.float32)
                * od_ref[0, 0].astype(jnp.float32), axis=-1, keepdims=True)

    q_last = (iq + 1) * block_q - 1 + kv_offset
    block_visible = jnp.logical_or(not causal, ik * block_k <= q_last)
    if window:
        q_first = iq * block_q + kv_offset
        block_visible = jnp.logical_and(
            block_visible,
            ik * block_k + (block_k - 1) >= q_first - window + 1)

    @pl.when(block_visible)
    def _compute():
        q = q_ref[0, 0]        # (Bq, d)
        k = k_ref[0, 0]        # (Bk, d)
        v = v_ref[0, 0]        # (Bk, d)
        do = do_ref[0, 0]      # (Bq, d)
        lse = lse_ref[0, 0]      # (Bq, 1)
        qrows = pl.dslice(iq * block_q, block_q)
        krows = pl.dslice(ik * block_k, block_k)
        delta = (delta_state[qrows, :] if fuse_delta
                 else od_ref[0, 0])  # (Bq, 1)

        p, ds = _recompute_p_ds(
            q, k, v, do, lse, delta, iq, ik, scale=scale, causal=causal,
            kv_offset=kv_offset, nk_valid=nk_valid, block_q=block_q,
            block_k=block_k, window=window,
            qseg=None if not segmented else qseg_ref[0],
            kseg=None if not segmented else kseg_ref[0])

        # dV += Pᵀ · dO (ref: backward_kernel.cu:207-214)
        dv_state[krows, :] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dK += dSᵀ · Q (ref: :215-221) — ds cast matches the split
        # dKdV kernel (q.dtype); dQ's matches the split dQ kernel
        # (k.dtype). They're the same dtype in practice and Mosaic CSEs
        # the casts, but keeping them per-matmul means fused=True/False
        # stay bit-identical even if q/k dtypes ever diverge.
        dk_state[krows, :] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dQ += dS · K (ref: :195-205)
        dq_state[qrows, :] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # dQ block iq is final after the last KV pass touches it; the write
    # runs regardless of visibility (an all-invisible row's state is the
    # zeros _init_dq left there).
    @pl.when(ik == nk_blocks - 1)
    def _write_dq():
        dq_ref[0, 0] = dq_state[
            pl.dslice(iq * block_q, block_q), :].astype(dq_ref.dtype)

    # dK/dV block ik is final once the last group member's last Q pass
    # has contributed.
    @pl.when(jnp.logical_and(ig == ngroup - 1, iq == nq_blocks - 1))
    def _write_dkdv():
        rows = pl.dslice(ik * block_k, block_k)
        dk_ref[0, 0] = dk_state[rows, :].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_state[rows, :].astype(dv_ref.dtype)


# The fused kernel needs (nq + 2·nk)·d fp32 of gradient state resident
# in VMEM; beyond this budget the host falls back to the two-kernel
# split. Env-overridable for budget experiments; CFA_BWD_FUSED=0/1
# forces the path outright.
_BWD_FUSED_BUDGET = int(os.environ.get(
    "CFA_BWD_FUSED_BUDGET", 40 * 1024 * 1024))


def _parse_fused_mode(raw: str) -> str:
    """Tolerant CFA_BWD_FUSED parse, failing loudly AT IMPORT (not deep
    inside a jit trace) for unrecognised values."""
    v = raw.strip().lower()
    if v in ("", "auto"):
        return "auto"
    if v in ("1", "true", "on", "yes"):
        return "1"
    if v in ("0", "false", "off", "no"):
        return "0"
    raise ValueError(f"CFA_BWD_FUSED must be auto/0/1, got {raw!r}")


_BWD_FUSED_MODE = _parse_fused_mode(os.environ.get("CFA_BWD_FUSED", "auto"))


@functools.partial(
    jax.jit,
    static_argnames=("scale", "causal", "window", "kv_offset",
                     "block_sizes", "interpret", "fused"),
)
def flash_attention_backward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    o: jnp.ndarray,
    lse: jnp.ndarray,
    do: jnp.ndarray,
    scale: Optional[float] = None,
    causal: bool = False,
    window: int = 0,
    kv_offset: int = 0,
    block_sizes: Optional[BlockSizes] = None,
    interpret: Optional[bool] = None,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    fused: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """FA2 backward. q/o/do are [B,H,N,d], k/v are [B,Hkv,N,d] (GQA when
    Hkv < H: the dKdV grid carries a group axis that accumulates every
    query head sharing a KV head — no materialised repeat); lse [B,H,Nq].

    Host-side counterpart of `flash_attention_2_backward`
    (ref: backward_kernel.cu:249-299). Returns (dQ [B,H,N,d],
    dK/dV [B,Hkv,N,d]) in the input dtypes.

    `fused`: None (default) picks the single-pass fused kernel (5
    matmuls per tile pair instead of the split kernels' 7) whenever the
    full-sequence gradient state fits the VMEM budget, overridable via
    CFA_BWD_FUSED / CFA_BWD_FUSED_BUDGET; True/False force the path.
    """
    b, h, nq, d = q.shape
    h_kv, nk = k.shape[1], k.shape[2]
    if h % h_kv != 0:
        raise ValueError(f"q heads {h} not a multiple of kv heads {h_kv}")
    group = h // h_kv
    scale = resolve_scale(scale, d)
    interpret = default_interpret() if interpret is None else interpret

    bs = (block_sizes.clamp(nq, nk) if block_sizes is not None
          else auto_block_sizes(nq, nk, d, causal=causal))
    block_q, block_k = bs.block_q_bwd, bs.block_k_bwd

    lse = lse[..., None]  # [B,H,Nq,1] — trailing unit dim for TPU tiling

    q_p = pad_to_block(q, 2, block_q)
    do_p = pad_to_block(do, 2, block_q)
    # Padded LSE rows get NEG_INF ⇒ P == 0 ⇒ they contribute nothing.
    lse_p = pad_to_block(lse, 2, block_q, value=NEG_INF)
    k_p = pad_to_block(k, 2, block_k)
    v_p = pad_to_block(v, 2, block_k)
    nq_p, nk_p = q_p.shape[2], k_p.shape[2]

    segmented = q_segment_ids is not None
    window = int(window or 0)
    if window and not causal:
        raise ValueError("window requires causal=True")
    common = dict(
        scale=scale, causal=causal, kv_offset=kv_offset,
        nk_valid=nk, block_q=block_q, block_k=block_k,
        window=window, segmented=segmented,
    )
    seg_inputs = []
    if segmented:
        # q ids [B, Nq, 1] (pad -1) / kv ids [B, 1, Nk] (pad -2): distinct
        # pad ids so padded rows/cols never match (same as flash_fwd)
        seg_inputs = [
            pad_to_block(jnp.asarray(q_segment_ids, jnp.int32)[:, :, None],
                         1, block_q, value=-1),
            pad_to_block(jnp.asarray(kv_segment_ids, jnp.int32)[:, :, None],
                         1, block_k, value=-2),
        ]

    # Causal block-index clamping (same trick as flash_fwd): steps whose
    # compute is skipped map to the nearest visible block, so consecutive
    # tail/prefix steps re-use the resident block instead of fetching.
    if causal:
        def q_idx(ikv, iq):
            # first visible Q block for KV block ikv (invisible prefix)
            first = jnp.maximum(0, (ikv * block_k - kv_offset) // block_q)
            iqc = jnp.maximum(iq, first)
            if window:
                # with a window, LATE q blocks are invisible too: last
                # visible q row is (ikv+1)*bk - 1 + window - 1
                last = ((ikv + 1) * block_k - 2 + window
                        - kv_offset) // block_q
                iqc = jnp.minimum(iqc, jnp.maximum(last, first))
            return iqc

        def kv_idx(iq, ik):
            hi = ((iq + 1) * block_q - 1 + kv_offset) // block_k
            ikc = jnp.minimum(ik, hi)
            if window:
                lo = jnp.maximum(
                    0, (iq * block_q + kv_offset - window + 1) // block_k)
                ikc = jnp.maximum(ikc, jnp.minimum(lo, hi))
            return ikc
    else:
        def q_idx(ikv, iq):
            return iq

        def kv_idx(iq, ik):
            return ik

    g = group
    if fused is None:
        if _BWD_FUSED_MODE == "auto":
            fused = (nq_p + 2 * nk_p) * d * 4 <= _BWD_FUSED_BUDGET
        else:
            fused = bool(int(_BWD_FUSED_MODE))
    fuse_delta = bool(fused) and window == 0
    if fuse_delta:
        od_p = pad_to_block(o, 2, block_q)  # O streams in; D in-kernel
    else:
        # D = rowsum(dO ⊙ O): one fused XLA op (ref kernel prologue
        # :94-120).
        delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                        axis=-1, keepdims=True)  # [B,H,Nq,1]
        od_p = pad_to_block(delta, 2, block_q)
    if fused:
        nqb_f, nkb_f = nq_p // block_q, nk_p // block_k

        def _coords(t, nqb=nqb_f, nkb=nkb_f, gg=group, hkv=h_kv):
            # unflatten the single sequential grid axis (row-major over
            # (b, kvh, ig, ik, iq) — see the kernel docstring)
            iq = t % nqb
            ikv = (t // nqb) % nkb
            ig = (t // (nqb * nkb)) % gg
            hh = (t // (nqb * nkb * gg)) % hkv
            bb = t // (nqb * nkb * gg * hkv)
            return bb, hh, ig, ikv, iq

        def fq_map(t):
            bb, hh, ig, ikv, iq = _coords(t)
            return (bb, hh * g + ig, q_idx(ikv, iq), 0)

        def fkv_map(t):
            bb, hh, ig, ikv, iq = _coords(t)
            return (bb, hh, ikv, 0)

        fq_spec = pl.BlockSpec((1, 1, block_q, d), fq_map)
        fkv_spec = pl.BlockSpec((1, 1, block_k, d), fkv_map)
        frow_spec = pl.BlockSpec((1, 1, block_q, 1), fq_map)

        def fqseg_map(t):
            bb, hh, ig, ikv, iq = _coords(t)
            return (bb, q_idx(ikv, iq), 0)

        def fkseg_map(t):
            bb, hh, ig, ikv, iq = _coords(t)
            return (bb, ikv, 0)

        fseg_specs = [
            pl.BlockSpec((1, block_q, 1), fqseg_map),
            pl.BlockSpec((1, block_k, 1), fkseg_map),
        ] if segmented else []

        # fuse_delta only reads the O block on the first KV pass — pin
        # the fetch index to block 0 on later passes so the same-index
        # pipeline elision drops the (otherwise nk_blocks×) re-fetch of
        # the whole O tensor per head.
        def fod_map(t):
            bb, hh, ig, ikv, iq = _coords(t)
            return (bb, hh * g + ig, jnp.where(ikv == 0, iq, 0), 0)

        fod_spec = pl.BlockSpec((1, 1, block_q, d), fod_map)

        def fdq_map(t):
            bb, hh, ig, ikv, iq = _coords(t)
            return (bb, hh * g + ig, iq, 0)

        dq, dk, dv = pl.pallas_call(
            functools.partial(_bwd_fused_kernel, fuse_delta=fuse_delta,
                              n_group=group, n_k_blocks=nkb_f,
                              n_q_blocks=nqb_f, **common),
            grid=(b * h_kv * group * nkb_f * nqb_f,),
            in_specs=[fq_spec, fkv_spec, fkv_spec, fq_spec, frow_spec,
                      fod_spec if fuse_delta else frow_spec, *fseg_specs],
            out_specs=[
                pl.BlockSpec((1, 1, block_q, d), fdq_map),
                pl.BlockSpec((1, 1, block_k, d), fkv_map),
                pl.BlockSpec((1, 1, block_k, d), fkv_map),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, h, nq_p, d), q.dtype),
                jax.ShapeDtypeStruct((b, h_kv, nk_p, d), k.dtype),
                jax.ShapeDtypeStruct((b, h_kv, nk_p, d), v.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((nq_p, d), jnp.float32),
                pltpu.VMEM((nk_p, d), jnp.float32),
                pltpu.VMEM((nk_p, d), jnp.float32),
            ] + ([pltpu.VMEM((nq_p, 1), jnp.float32)] if fuse_delta
                 else []),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                # 5 matmuls per tile pair, each 2·Bq·Bk·d flops
                flops=10 * b * h * nq_p * nk_p * d,
                bytes_accessed=(3 * q_p.size + 2 * k_p.size + 2 * v_p.size)
                * q_p.dtype.itemsize,
                transcendentals=b * h * nq_p * nk_p,
            ),
            interpret=interpret,
        )(q_p, k_p, v_p, do_p, lse_p, od_p, *seg_inputs)
        return dq[:, :, :nq], dk[:, :, :nk], dv[:, :, :nk]
    q_spec = pl.BlockSpec(
        (1, 1, block_q, d),
        lambda bb, hh, i, j, ig: (bb, hh * g + ig, q_idx(i, j), 0))
    kv_spec = pl.BlockSpec((1, 1, block_k, d),
                           lambda bb, hh, i, j, ig: (bb, hh, i, 0))
    row_spec = pl.BlockSpec(
        (1, 1, block_q, 1),
        lambda bb, hh, i, j, ig: (bb, hh * g + ig, q_idx(i, j), 0))

    dkdv_seg_specs = [
        pl.BlockSpec((1, block_q, 1),
                     lambda bb, hh, i, j, ig: (bb, q_idx(i, j), 0)),
        pl.BlockSpec((1, block_k, 1),
                     lambda bb, hh, i, j, ig: (bb, i, 0)),
    ] if segmented else []

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkdv_kernel, **common),
        grid=(b, h_kv, nk_p // block_k, nq_p // block_q, group),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, row_spec, row_spec,
                  *dkdv_seg_specs],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, d),
                         lambda bb, hh, i, j, ig: (bb, hh, i, 0)),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda bb, hh, i, j, ig: (bb, hh, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h_kv, nk_p, d), k.dtype),
            jax.ShapeDtypeStruct((b, h_kv, nk_p, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            # 4 matmuls per tile pair (S, dP, dV, dK), 2*Bq*Bk*d each;
            # Q/dO restream once per KV block, K/V fetch once per group
            # member (review r4: the 5-matmul count here was the FUSED
            # kernel's, copy-pasted)
            flops=8 * b * h * nq_p * nk_p * d,
            bytes_accessed=((q_p.size + do_p.size) * (nk_p // block_k)
                            + (k_p.size + v_p.size) * group)
            * q_p.dtype.itemsize,
            transcendentals=b * h * nq_p * nk_p,
        ),
        interpret=interpret,
    )(q_p, k_p, v_p, do_p, lse_p, od_p, *seg_inputs)

    dq_q_spec = pl.BlockSpec((1, 1, block_q, d),
                             lambda bb, hh, i, j: (bb, hh, i, 0))
    dq_kv_spec = pl.BlockSpec(
        (1, 1, block_k, d),
        lambda bb, hh, i, j: (bb, hh // g, kv_idx(i, j), 0))
    dq_row_spec = pl.BlockSpec((1, 1, block_q, 1),
                               lambda bb, hh, i, j: (bb, hh, i, 0))

    dq_seg_specs = [
        pl.BlockSpec((1, block_q, 1),
                     lambda bb, hh, i, j: (bb, i, 0)),
        pl.BlockSpec((1, block_k, 1),
                     lambda bb, hh, i, j: (bb, kv_idx(i, j), 0)),
    ] if segmented else []

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, **common),
        grid=(b, h, nq_p // block_q, nk_p // block_k),
        in_specs=[dq_q_spec, dq_kv_spec, dq_kv_spec, dq_q_spec,
                  dq_row_spec, dq_row_spec, *dq_seg_specs],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda bb, hh, i, j: (bb, hh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, nq_p, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            # 3 matmuls per tile pair (S, dP, dQ); K/V restream once per
            # Q block while Q/dO stay resident across the KV axis
            flops=6 * b * h * nq_p * nk_p * d,
            bytes_accessed=(2 * q_p.size
                            + (k_p.size + v_p.size) * (nq_p // block_q))
            * q_p.dtype.itemsize,
            transcendentals=b * h * nq_p * nk_p,
        ),
        interpret=interpret,
    )(q_p, k_p, v_p, do_p, lse_p, od_p, *seg_inputs)

    return dq[:, :, :nq], dk[:, :, :nk], dv[:, :, :nk]
