"""FlashAttention-2 forward as a Pallas TPU kernel.

TPU-native re-design of the reference's FA2 forward CUDA kernel
(ref: src/02_flash_attention_v2_forward/flash_attention_kernel.cu:37-343
and the ring-ready variant src/03_flash_attention_v2_ring/common/
flash_attention_kernel.cu:13-172). The algorithm (one online-softmax pass
over KV tiles, Q tile resident, LSE emitted for the backward) is the same;
the mapping is TPU-first instead of a translation:

  CUDA reference                        → this kernel
  -------------------------------------   --------------------------------
  warp-partitioned Q rows, Q in regs     → Q block resident in VMEM across
    (kernel.cu:73-96)                      the KV grid axis (index map drops
                                           the kv index, so Pallas keeps it)
  K/V tiles staged in shared memory      → K/V blocks streamed HBM→VMEM by
    (kernel.cu:52-54)                      the Pallas pipeline (auto double-
                                           buffered across grid steps)
  lane-strided dot + warp shuffles       → one (Bq,d)x(d,Bk) MXU matmul and
    (kernel.cu:149-166)                    VPU row reductions
  m/l in registers per row               → (Bq,128) fp32 VMEM scratch carried
    (kernel.cu:190-223)                    across the sequential kv grid axis
  epilogue O←O_acc/l, L←m+log l          → @pl.when(last kv step) epilogue
    (kernel.cu:280-296)
  <Br,Bc,d,warps> template params        → BlockSizes runtime config
    (kernel.cu:311-315)                    (autotunable, VMEM-budget aware)

Extensions over the reference: batch/head dims, bf16 inputs with fp32
accumulation, causal masking (the reference has none — SURVEY.md §2.3),
padding masks for non-divisible shapes, and GQA head sharing.

Softmax strategies (the `softmax=` knob):

  "bound"            — score-bound softmax: the host precomputes a
      per-row upper bound on the scores, c_i = ||q̂_i||₂ · max_j ||k_j||₂
      (Cauchy–Schwarz; q̂ already carries scale·log2(e), so c is in log2
      units), and the kernel evaluates p = 2^(s − c) DIRECTLY — no
      running max, no rescale of the accumulator, no m scratch, and no
      masked-row guard (masked scores underflow to exactly 0). This
      halves the VPU work per score element, which is what was capping
      the kernel at ~67% of MXU speed-of-light (VERDICT r1 #1). It is
      exact: s ≤ c so 2^(s−c) ≤ 1 never overflows, and weights more than
      ~2^126 below the bound underflow to 0 — mathematically negligible
      UNLESS the bound is loose (anti-aligned huge-norm Q/K): precision
      degrades progressively as the weights sink toward the fp32/bf16
      subnormal range (measured ~2e-2 relative error by slack ≈ 123 log2
      units) and whole rows underflow to l = 0 past slack ≈ 126. A
      lax.cond fallback detects EITHER case — any visible row whose
      measured slack c·ln2 − LSE exceeds _FALLBACK_SLACK_LOG2 (= 96)
      log2 units, which subsumes the l = 0 / LSE = −inf cliff — and
      re-runs the online kernel, so the result stays exact well before
      precision loss becomes visible. (Normalised activations sit at
      slack ≈ 20; the threshold leaves 30 log2 units of margin before
      bf16 subnormals.)
  "online"           — the classic FA2 online-softmax (running max +
      rescale), as the reference implements it. Used automatically for
      segmented (packed) inputs, where per-row visibility is
      data-dependent and the underflow check above cannot be static,
      AND for short unquantized causal forwards (nq ≤ 5120,
      CFA_ONLINE_SHORT_NQ): there the bound path's fixed costs (c-norm
      pass + fallback-cond output copy) outweigh its per-element VPU
      win — measured crossover ≈ 5-6k rows (r5).

  "auto" (default)   — picks between the two as described above.
  "bound_unchecked"  — the bound path without the lax.cond fallback.
      The cond's untaken identity branch copies O, measured ~3 TF/s on
      this chip; waive it when inputs are known non-adversarial
      (normalised activations). quantize_q implies this waiver (the
      online kernel has no int8-Q form).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_flashattention_tpu.ops.common import (
    auto_block_sizes,
    FP8_SHIFT,
    NEG_INF,
    BlockSizes,
    cdiv,
    default_interpret,
    dequant_cast,
    fp8_shift_cast,
    pad_to_block,
    quantize_q_per_head,
    resolve_scale,
    round_up,
)

_LOG2E = 1.4426950408889634  # log2(e): scores are carried in log2 units
_LN2 = 0.6931471805599453


def _loose_bound_flags(l, q_first, causal: bool, window: int,
                       nk_valid: int):
    """(Bq,1) per-row flags for the bound-softmax fallback: 1.0 where a
    row that PROVABLY has visible keys came out with l < 2^-96 — its
    weights all sit ≥ _FALLBACK_SLACK_LOG2 log2 units below the bound
    (loose bound; precision degraded or totally underflowed). The row
    visibility formula mirrors the host's `vis` (flash_attention_forward
    fallback block): global row index ≥ 0, and with a window the row's
    window must intersect [0, nk)."""
    gidx = (jax.lax.broadcasted_iota(jnp.int32, (l.shape[0], 1), 0)
            + q_first)
    if causal:
        vis = gidx >= 0
        if window:
            vis = jnp.logical_and(vis, gidx - window + 1 <= nk_valid - 1)
    else:
        vis = jnp.ones_like(gidx, jnp.bool_)
    bad = jnp.logical_and(vis, l < 2.0 ** (-_FALLBACK_SLACK_LOG2))
    return bad.astype(jnp.float32)


def _fwd_kernel(
    *refs,  # inputs, outputs, scratch — see unpacking below
    causal: bool,
    window: int,  # 0 = unbounded; else causal sliding window size
    kv_offset: int,
    nk_valid: int,
    block_q: int,
    block_k: int,
    nk_blocks: int,
    quantized: bool,
    segmented: bool,
    compact: bool,
    bound: bool,
    fp8_fast: bool,
    qq: bool,
):
    refs = list(refs)
    if compact:
        # Compact (banded) causal grid: axis 2 walks only the VISIBLE
        # (iq, ik) tile pairs, enumerated host-side into two prefetched
        # scalar maps. The dense grid instead ticks through every
        # (iq, ik) pair and skips ~half of them with @pl.when — the
        # skipped steps still cost grid/pipeline overhead, which is what
        # capped causal throughput (VERDICT r1 #3).
        iq_map_ref, ik_map_ref = refs[:2]
        refs = refs[2:]
    q_ref, k_ref, v_ref = refs[:3]
    refs = refs[3:]
    if quantized:
        # K/V arrive quantized (int8 / fp8) with per-token fp32 scales.
        # Scales are lane-major [B,Hkv,1,N] (1,Bk) rows (the host forces
        # Bk % 128 == 0 for quantized inputs, so this layout is always
        # legal — a sublane-major [N,1] layout stores one fp32 per (8,128)
        # tile row, 128x the VMEM/DMA, and measured 5x slower:
        # docs/MEMO.md #12) and dequant FOLDS into the matmuls:
        # S = (Q·K_qᵀ) ⊙ σ_kᵀ, O += (P ⊙ σ_vᵀ)·V_q. int8/fp8 → bf16
        # casts are exact, so no precision is lost beyond the MXU.
        k_scale_ref, v_scale_ref = refs[:2]
        refs = refs[2:]
    else:
        k_scale_ref = v_scale_ref = None
    if segmented:
        # packed sequences: q ids as a (Bq, 1) column, kv ids as a (1, Bk)
        # row — cross-segment pairs are masked (every block takes the
        # masked path; segment boundaries are not known statically)
        qseg_ref, kseg_ref = refs[:2]
        refs = refs[2:]
    else:
        qseg_ref = kseg_ref = None
    if bound:
        # per-row log2 score bound (Bq, 1), computed host-side
        c_ref = refs[0]
        refs = refs[1:]
        (o_ref, lse_ref, bad_ref, l_scratch, acc_scratch) = refs
        m_scratch = None
    else:
        c_ref = None
        bad_ref = None
        (o_ref, lse_ref, m_scratch, l_scratch, acc_scratch) = refs
    if compact:
        t = pl.program_id(2)
        nt = pl.num_programs(2)
        iq = iq_map_ref[t]
        ik = ik_map_ref[t]
        # first/last step of this Q block = where the iq map changes
        is_first = jnp.logical_or(
            t == 0, iq_map_ref[jnp.maximum(t - 1, 0)] != iq)
        is_last = jnp.logical_or(
            t == nt - 1, iq_map_ref[jnp.minimum(t + 1, nt - 1)] != iq)
    else:
        iq = pl.program_id(2)
        ik = pl.program_id(3)
        is_first = ik == 0
        is_last = ik == nk_blocks - 1

    @pl.when(is_first)
    def _init():
        # -inf init done in-kernel; the reference needs a dedicated fill
        # kernel because cudaMemset can't write -inf (ref: memo.md:1).
        if not bound:
            m_scratch[...] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    # Causal block-level skip: a KV block whose first column is beyond the
    # last query row of this Q block contributes nothing; with a sliding
    # window, neither does a block that ends before the FIRST row's
    # window start.
    q_first = iq * block_q + kv_offset
    q_last = q_first + block_q - 1
    block_visible = jnp.logical_or(
        not causal, ik * block_k <= q_last)
    if window:
        block_visible = jnp.logical_and(
            block_visible,
            ik * block_k + (block_k - 1) >= q_first - window + 1)

    @pl.when(block_visible)
    def _compute():
        q = q_ref[0, 0]  # (Bq, d) — PRESCALED by `scale` on the host,
        #                  or per-head int8 when qq (scale in the rows)
        cd = jnp.bfloat16 if qq else q.dtype  # MXU compute dtype for PV
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        if quantized:
            if qq:
                # K stays int8 for the 2x-rate MXU matmul below; only V
                # needs the bf16 cast (P·V runs bf16 — P's dynamic range
                # doesn't survive int8)
                v = (fp8_shift_cast(v) if fp8_fast
                     else dequant_cast(v, cd))
            elif fp8_fast:
                # 5-op shift cast leaves K/V scaled by 2^-120; the host
                # folded 2^120 into the scale rows below
                k = fp8_shift_cast(k)
                v = fp8_shift_cast(v)
            else:
                k = dequant_cast(k, cd)
                v = dequant_cast(v, cd)

        # S = Q·Kᵀ on the MXU with fp32 accumulation
        # (ref: process_kv_block attention_helper.h:62-76). The softmax
        # scale is folded into Q host-side: one (N,d) multiply instead of
        # an (N,N) one here — the VPU, not the MXU, is the scarce resource
        # in this kernel. With qq, both operands are int8 and the MXU
        # runs at DOUBLE rate (v5e: 394 int8 TOPS vs 197 bf16 TFLOPS);
        # σ_q·σ_k·scale·log2e all ride the (1,Bk) row multiply.
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32 if qq else jnp.float32,
        )  # (Bq, Bk)
        if qq:
            s = s.astype(jnp.float32)
        if quantized:
            s = s * k_scale_ref[0, 0]  # (1, Bk) per-token dequant, folded

        def update(s, guarded: bool):
            """One softmax-accumulate step.

            Scores arrive in LOG2 units (log2(e) is folded into the host
            Q prescale along with the softmax scale), so the exponentials
            are exp2 — the VPU's native transcendental (exp costs an
            extra multiply per element to get there)."""
            if bound:
                # Score-bound softmax (see module docstring): exponentiate
                # against the precomputed per-row bound — no max pass, no
                # rescale, no m state. Masked entries (s = NEG_INF)
                # underflow to exactly 0, so no guard select either.
                p = jnp.exp2(s - c_ref[0, 0])            # (Bq, Bk)
                l_scratch[:, :1] += jnp.sum(p, axis=-1, keepdims=True)
                if quantized:
                    p = p * v_scale_ref[0, 0]  # per-token dequant, folded
                acc_scratch[...] += jax.lax.dot_general(
                    p.astype(cd), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return
            # Online softmax update (ref: kernel.cu:190-223).
            m_prev = m_scratch[:, :1]                    # (Bq, 1)
            m_curr = jnp.max(s, axis=-1, keepdims=True)  # (Bq, 1)
            m_next = jnp.maximum(m_prev, m_curr)
            p = jnp.exp2(s - m_next)                     # (Bq, Bk)
            if guarded:
                # Fully-masked rows have m_next == NEG_INF, making
                # exp(s−m) = exp(0) = 1 for their masked entries; force
                # those to 0 so l stays 0 and the epilogue emits O=0 /
                # LSE=−inf. Only masked blocks can contain such rows, so
                # the fast path skips this select.
                p = jnp.where(s > NEG_INF * 0.5, p, 0.0)
            # Single-pass rescale of the running sum and accumulator by
            # exp2(m_prev − m_next) (ref: kernel.cu:237-242; carrying m and
            # l separately avoids the (x/y)(y/z) fp-error trap, memo.md:5).
            alpha = jnp.exp2(m_prev - m_next)            # (Bq, 1)
            l_next = (l_scratch[:, :1] * alpha
                      + jnp.sum(p, axis=-1, keepdims=True))
            m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
            l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)
            # P·V accumulate (ref: kernel.cu:244-260). P is cast to the
            # input dtype so the MXU runs at full rate; acc stays fp32.
            if quantized:
                p = p * v_scale_ref[0, 0]  # per-token dequant, folded
            pv = jax.lax.dot_general(
                p.astype(cd), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_scratch[...] = acc_scratch[...] * alpha + pv

        def masked_update(s):
            # Masks are built from (Bq,1) x (1,Bk) vector iotas — a full
            # (Bq,Bk) int32 iota pair costs 8 bytes/elem of VMEM and is
            # what capped causal block sizes (docs/MEMO.md).
            col = (jax.lax.broadcasted_iota(jnp.int32, (1, s.shape[1]), 1)
                   + ik * block_k)
            # Padding mask for the KV tail (reference asserts divisibility
            # instead, ref: 04_ring_attention.cu:56-63).
            ok = (col < nk_valid if nk_valid % block_k != 0
                  else jnp.ones_like(col, jnp.bool_))
            if causal:
                row = jax.lax.broadcasted_iota(
                    jnp.int32, (s.shape[0], 1), 0) + iq * block_q + kv_offset
                ok = jnp.logical_and(ok, col <= row)
                if window:
                    ok = jnp.logical_and(ok, col > row - window)
            if segmented:
                # q ids (Bq,1) vs kv ids (Bk,1)→(1,Bk): both segment-id
                # arrays are carried sublane-major ([.., N, 1] — the only
                # layout legal at every block size on TPU); the kv vector
                # is transposed here (Bk elements, negligible)
                kseg_row = jnp.transpose(kseg_ref[0], (1, 0))
                ok = jnp.logical_and(ok, qseg_ref[0] == kseg_row)
            s = jnp.where(ok, s, NEG_INF)
            update(s, guarded=True)

        # Per-element masks cost real VPU time; restrict them to the
        # blocks that need them — the causal-diagonal straddlers and the
        # ragged last KV block. Interior blocks take the mask-free path.
        # With segment ids, boundaries aren't static: always masked.
        needs_mask = None
        if segmented:
            needs_mask = jnp.bool_(True)
        elif causal:
            straddle = (ik * block_k + (block_k - 1)
                        > iq * block_q + kv_offset)
            if window:
                # lower-frontier straddler: block begins before the LAST
                # row's window start
                straddle_lo = (ik * block_k
                               < q_last - window + 1)
                straddle = straddle | straddle_lo
            needs_mask = straddle
        if not segmented and nk_valid % block_k != 0:
            tail = ik == nk_blocks - 1
            needs_mask = (tail if needs_mask is None
                          else (needs_mask | jnp.asarray(tail)))

        if needs_mask is None:
            update(s, guarded=False)
        elif segmented:
            masked_update(s)
        else:
            @pl.when(needs_mask)
            def _slow():
                masked_update(s)

            @pl.when(jnp.logical_not(needs_mask))
            def _fast():
                update(s, guarded=False)

    @pl.when(is_last)
    def _epilogue():
        # O ← O_acc / l and L ← m + log l, written once at the end
        # (ref: kernel.cu:280-296). m (or the bound c) is in log2 units;
        # LSE is emitted in natural-log units:
        # ln(Σe^s) = ln2·m₂ + ln(Σ2^(s₂−m₂)).
        # One (Bq,1) reciprocal + a broadcast multiply instead of a
        # (Bq,d) divide — transitions are the causal grid's hot edge.
        l = l_scratch[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scratch[...] * (1.0 / l_safe)).astype(o_ref.dtype)
        m = c_ref[0, 0] if bound else m_scratch[:, :1]
        lse = jnp.where(l == 0.0, NEG_INF,
                        m * _LN2 + jnp.log(l_safe))
        lse_ref[0, 0] = lse  # (Bq, 1)
        if bound:
            # Per-row loose-bound flag for the host's fallback cond:
            # l = Σ 2^(s−c) < 2^−96 means every weight in the row sits
            # ≥ 96 log2 units below the bound (equivalently c·ln2 − LSE
            # > 96·ln2 — same check the host used to run over the full
            # [B,H,N] LSE, now a few epilogue VPU ops; measured ~5 TF/s
            # of causal throughput). Rows that provably see no keys
            # (the host's `vis` formula, replicated on in-kernel iota)
            # are excluded — their l = 0 is legitimate.
            bad_ref[0, 0] = _loose_bound_flags(
                l, iq * block_q + kv_offset, causal, window, nk_valid)


def _fwd_kernel_kmajor(
    iq_map_ref,
    ik_map_ref,
    *refs,
    causal: bool,
    window: int,
    kv_offset: int,
    nk_valid: int,
    block_q: int,
    block_k: int,
    nk_blocks: int,
    n_steps: int,
    quantized: bool,
    fp8_fast: bool,
    has_empty: bool,
    qq: bool,
    unroll: int = 1,
):
    """K-MAJOR causal forward (bound softmax only).

    The Q-major band grid pays ~18 µs at every Q-block transition
    (epilogue + scratch hand-off + pipeline break — measured, see
    docs/IMPLEMENTATION.md), which is what capped causal throughput at
    ~87 TF/s (VERDICT r1 #3). This kernel walks the causal band K-major:
    K/V stay VMEM-resident across an outer group, Q streams, and the
    softmax state (l, acc) for the ENTIRE padded sequence lives in VMEM
    scratch slices — so there are no carried-scratch hand-offs and the
    per-step output flushes pipeline cleanly. Usable whenever the
    full-sequence accumulator fits VMEM (the host gates on that and
    falls back to the band grid otherwise).

    The grid is ONE flat sequential axis over batch × heads × band
    steps (the index maps recover (b, h, step) arithmetically): with
    (b, h) as separate grid dims, every head boundary broke the Mosaic
    pipeline for ~20-29 µs (measured via head-count scaling at N=4096:
    per-head cost 30 → 51 µs as H went 4 → 64 while the per-head
    compute is constant), which at short sequence was ~45% of the whole
    causal forward. One flat axis keeps the pipeline primed across
    heads; per-head softmax state needs no boundary hand-off because
    the first visit to each Q block STORES (overwriting the previous
    head's state) rather than accumulating.
    """
    refs = list(refs)
    c_ref, q_ref, k_ref, v_ref = refs[:4]
    refs = refs[4:]
    if quantized:
        k_scale_ref, v_scale_ref = refs[:2]
        refs = refs[2:]
    else:
        k_scale_ref = v_scale_ref = None
    o_ref, lse_ref, bad_ref, l_all, acc_all = refs[:5]
    # dequantised-KV cache scratch: K/V stay resident across an outer
    # group here, so the int8/fp8 → bf16 cast runs once per K block
    # instead of once per step (it was ~0.8 µs/step of fp8 VPU time)
    kc_ref, vc_ref = (refs[5], refs[6]) if quantized else (None, None)

    t = pl.program_id(0) % n_steps  # step within this (batch, head)
    iq = iq_map_ref[t]
    ik = ik_map_ref[t]
    q_first = iq * block_q + kv_offset
    q_last = q_first + block_q - 1
    if causal:
        hi = jnp.minimum(nk_blocks - 1, q_last // block_k)
        if window:
            lo = jnp.maximum(0, (q_first - window + 1) // block_k)
        else:
            lo = jnp.zeros((), jnp.int32)
    else:
        hi = jnp.full((), nk_blocks - 1, jnp.int32)
        lo = jnp.zeros((), jnp.int32)
    if has_empty:
        empty = hi < lo
        is_first = jnp.logical_or(empty, ik == lo)
        is_last = jnp.logical_or(empty, ik == hi)
        visible = jnp.logical_not(empty)
    else:
        is_first = ik == lo
        is_last = ik == hi
        visible = None
    sl = pl.ds(iq * block_q, block_q)

    if quantized:
        new_k = jnp.logical_or(
            t == 0, ik_map_ref[jnp.maximum(t - 1, 0)] != ik)

        @pl.when(new_k)
        def _cast_kv():
            if qq and fp8_fast:
                # re-grid the fp8 K values onto the int8 lattice so the
                # QK matmul can run at the MXU's 2x int8 rate. Per-token
                # absmax quantisation put each token's max near ±448, so
                # ×(127/448) fills int8; the re-grid rounds to a UNIFORM
                # step of 448/127 code units — coarser than e4m3's
                # relative 2^-3 step for components below ~1/16 of the
                # token absmax, adding at most half a step (~0.4% of
                # absmax, int8-class noise) on those. Gated by the same
                # quantize_q accuracy budget. 448/127 rides the scale
                # rows.
                kc_ref[...] = jnp.clip(jnp.round(
                    fp8_shift_cast(k_ref[0, 0]).astype(jnp.float32)
                    * (FP8_SHIFT * (127.0 / 448.0))),
                    -127, 127).astype(jnp.int8)
                vc_ref[...] = fp8_shift_cast(v_ref[0, 0])
            elif qq:
                vc_ref[...] = dequant_cast(v_ref[0, 0], vc_ref.dtype)
            elif fp8_fast:
                kc_ref[...] = fp8_shift_cast(k_ref[0, 0])
                vc_ref[...] = fp8_shift_cast(v_ref[0, 0])
            else:
                kc_ref[...] = dequant_cast(k_ref[0, 0], kc_ref.dtype)
                vc_ref[...] = dequant_cast(v_ref[0, 0], vc_ref.dtype)

    def _compute():
        q = q_ref[0, 0]
        cd = jnp.bfloat16 if qq else q.dtype
        if quantized:
            # int8 K needs no cast scratch; fp8+qq reads the re-gridded
            # int8 scratch
            if qq:
                k = kc_ref[...] if fp8_fast else k_ref[0, 0]
            else:
                k = kc_ref[...]
            v = vc_ref[...]
        else:
            k = k_ref[0, 0]
            v = v_ref[0, 0]

        # Sub-chunk the KV block into `unroll` independent chains so the
        # Mosaic scheduler can overlap chunk j's VPU elementwise chain
        # (mask/exp2/rowsum) with chunk j+1's MXU matmuls. The monolithic
        # body serialises MXU → VPU → MXU per step, exposing the softmax
        # chain (~5 µs/step at (2048,2048)).
        u = unroll if (unroll > 1 and block_k % unroll == 0) else 1
        bk_c = block_k // u
        ps_parts, pv_parts = [], []
        if causal:
            row = (jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
                   + q_first)
        # Phase 1: issue ALL QK^T matmuls (MXU-only). Phase 2 below runs
        # each chunk's elementwise chain + PV matmul; with in-order issue,
        # chunk j's VPU chain then overlaps chunk j+1's pending matmuls.
        s_parts = []
        for j in range(u):
            kj = (k if u == 1 else
                  jax.lax.slice_in_dim(k, j * bk_c, (j + 1) * bk_c, axis=0))
            s_parts.append(jax.lax.dot_general(
                q, kj, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32 if qq else jnp.float32,
            ))
        for j in range(u):
            s = s_parts[j]
            vj = (v if u == 1 else
                  jax.lax.slice_in_dim(v, j * bk_c, (j + 1) * bk_c, axis=0))
            if qq:
                s = s.astype(jnp.float32)
            if quantized:
                ksc = k_scale_ref[0, 0]
                if u > 1:
                    ksc = jax.lax.slice_in_dim(
                        ksc, j * bk_c, (j + 1) * bk_c, axis=1)
                s = s * ksc

            if causal and not _MASK_OFF:  # _MASK_OFF: perf probe ONLY
                # UNIFORM (branch-free) masking: a dual @pl.when(straddle)
                # branch pair measured 5 µs/step SLOWER than masking every
                # step — the iota/compare/select chain fuses into the
                # elementwise pass while the scf.if boundary materialises S
                # per branch. The select is correct on interior blocks too
                # (all-true), so no straddle short-circuit either.
                col = (jax.lax.broadcasted_iota(
                    jnp.int32, (1, s.shape[1]), 1) + ik * block_k + j * bk_c)
                ok = col <= row
                if window:
                    ok = jnp.logical_and(ok, col > row - window)
                if nk_valid % block_k != 0:
                    ok = jnp.logical_and(ok, col < nk_valid)
                s = jnp.where(ok, s, NEG_INF)
            elif nk_valid % block_k != 0:
                col = (jax.lax.broadcasted_iota(
                    jnp.int32, (1, s.shape[1]), 1) + ik * block_k + j * bk_c)
                s = jnp.where(jnp.logical_or(ik != nk_blocks - 1,
                                             col < nk_valid), s, NEG_INF)

            p = jnp.exp2(s - c_ref[0, 0])
            ps_parts.append(jnp.sum(p, axis=-1, keepdims=True))
            if quantized:
                vsc = v_scale_ref[0, 0]
                if u > 1:
                    vsc = jax.lax.slice_in_dim(
                        vsc, j * bk_c, (j + 1) * bk_c, axis=1)
                p = p * vsc
            pv_parts.append(jax.lax.dot_general(
                p.astype(cd), vj, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        ps = functools.reduce(jnp.add, ps_parts)
        pv = functools.reduce(jnp.add, pv_parts)

        # first visit STORES — no separate zero-init pass
        @pl.when(is_first)
        def _store():
            l_all[sl, :1] = ps
            acc_all[sl, :] = pv

        @pl.when(jnp.logical_not(is_first))
        def _accum():
            l_all[sl, :1] += ps
            acc_all[sl, :] += pv

    if has_empty:
        pl.when(visible)(_compute)

        @pl.when(jnp.logical_and(is_first, jnp.logical_not(visible)))
        def _init_empty():
            # a Q block with nothing visible: one placeholder visit zeroes
            # its state so the epilogue emits O=0 / LSE=-inf
            l_all[sl, :1] = jnp.zeros((block_q, 1), jnp.float32)
            acc_all[sl, :] = jnp.zeros_like(acc_all[sl, :])
    else:
        _compute()

    @pl.when(is_last)
    def _epilogue():
        l = l_all[sl, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_all[sl, :] * (1.0 / l_safe)).astype(o_ref.dtype)
        lse_ref[0, 0] = jnp.where(l == 0.0, NEG_INF,
                                  c_ref[0, 0] * _LN2 + jnp.log(l_safe))
        # loose-bound fallback flags — see _fwd_kernel's epilogue note
        bad_ref[0, 0] = _loose_bound_flags(
            l, q_first, causal, window, nk_valid)


# K-major needs the whole padded sequence's (l, acc) resident in VMEM;
# beyond this budget the host falls back to the Q-major band grid.
# Env-overridable for budget experiments.
# Below this many query rows, "auto" keeps unquantized causal forwards
# on the ONLINE softmax (the compact band grid): measured crossover vs
# the bound/K-major path is ≈5-6k rows (see _resolve_use_bound).
# Env-overridable for experiments.
_ONLINE_SHORT_NQ = int(os.environ.get("CFA_ONLINE_SHORT_NQ", "5120"))


def _resolve_use_bound(softmax: str, *, causal: bool, quantized: bool,
                       segmented: bool, nq: int) -> bool:
    """Route `softmax="auto"` between the bound and online strategies.

    Segmented (packed) inputs always go online: per-row visibility is
    data-dependent, so the bound path's static underflow check can't
    tell "empty segment" from "bound too loose". Short unquantized
    causal forwards ALSO go online: with floor-cancelled timing the
    online band grid measures ~20% faster than kmajor+bound at N≤4096
    (105 vs 85 TF/s — the bound path's c-norm pass and fallback-cond
    output copy are fixed costs the short grid can't amortise) while
    bound wins from ~8k up (118 vs 104 at 8k, 138 vs 122 at 16k;
    crossover ≈ 5-6k, measured r5). Online is exact with no fallback
    machinery, so the switch carries no accuracy caveats. Quantized KV
    always stays on bound (fp8 needs the K-major cast scratch; int8
    measured faster on bound)."""
    if softmax in ("bound", "bound_unchecked"):
        return True
    if softmax != "auto" or segmented:
        return False
    if causal and not quantized and nq <= _ONLINE_SHORT_NQ:
        return False
    return True

_KMAJOR_STATE_BUDGET = int(os.environ.get(
    "CFA_KMAJOR_BUDGET", 24 * 1024 * 1024))

# KV-chunking factor for the K-major kernel body (MXU/VPU overlap — see
# _fwd_kernel_kmajor). Env-overridable for experiments.
_FWD_UNROLL = int(os.environ.get("CFA_FWD_UNROLL", "1"))
# Perf probe ONLY (wrong outputs): drop the causal mask chain from the
# K-major body to measure its cost. Never set outside experiments —
# warn loudly so a leaked env var can't silently corrupt causal outputs.
_MASK_OFF = bool(int(os.environ.get("CFA_MASK_OFF", "0")))
if _MASK_OFF:
    import warnings
    warnings.warn(
        "CFA_MASK_OFF=1: causal masking DISABLED in the K-major kernel — "
        "causal outputs are WRONG. This is a mask-cost perf probe only.",
        stacklevel=2)

# Score-bound softmax fallback trigger (log2 units): re-run the online
# kernel when any visible row's bound slack (c·ln2 − LSE, i.e. how far
# the whole row's weights sit below the bound) exceeds this. fp32/bf16
# weight precision starts degrading as weights approach the 2^-126
# subnormal cliff (ADVICE r2: ~2e-2 relative error by slack ≈ 123);
# 96 leaves a 30-log2-unit guard band while sitting far above the
# slack ≈ 20 of normalised activations, so false triggers don't occur
# in practice.
_FALLBACK_SLACK_LOG2 = 96.0


@functools.partial(
    jax.jit,
    static_argnames=(
        "scale", "causal", "window", "kv_offset", "block_sizes",
        "interpret", "out_dtype", "softmax", "quantize_q",
        "_fallback_in_interpret",
    ),
)
def flash_attention_forward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    causal: bool = False,
    window: int = 0,
    kv_offset: int = 0,
    block_sizes: Optional[BlockSizes] = None,
    interpret: Optional[bool] = None,
    out_dtype=None,
    k_scale: Optional[jnp.ndarray] = None,
    v_scale: Optional[jnp.ndarray] = None,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    softmax: str = "auto",
    quantize_q: bool = False,
    _fallback_in_interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """FA2 forward. q [B,H,Nq,d], k/v [B,Hkv,Nk,d] → (O [B,H,Nq,d], LSE [B,H,Nq]).

    Host-side orchestration counterpart of `flash_attention_2_forward`
    (ref: 02_fwd/flash_attention_kernel.cu:300-343): resolves tile sizes,
    pads non-divisible shapes, builds the grid, and dispatches the kernel.
    Supports GQA: H must be a multiple of Hkv; KV heads are shared via the
    BlockSpec index map (no materialised repeat).

    Quantized KV (the north-star FP8/INT8 KV-cache path, BASELINE.md): pass
    k/v as int8 or float8_e4m3fn plus per-token fp32 scales k_scale/v_scale
    [B,Hkv,Nk]; dequant is folded into the QKᵀ / PV matmuls in-kernel
    (see ops.quant for the quantiser and the public wrapper).

    `quantize_q=True` (quantized KV only): additionally quantize Q
    per-(batch,head) to int8 so QKᵀ runs on the MXU at DOUBLE rate (v5e:
    394 int8 TOPS) — σ_q rides the existing per-token scale-row multiply
    and fp8 K re-grids onto int8 in the K-major cast scratch, so the
    steady-state VPU cost is one s32→f32 cast. Measured 137 → 153 TF/s
    (int8 KV, 16k). Adds per-head-absmax Q rounding error (~0.4% for
    outlier-free Q, inside the int8 1e-3 / fp8 1e-2 accuracy gates) and
    disables the loose-bound online fallback (the online kernel has no
    int8-Q form); P·V stays bf16 — P's dynamic range doesn't survive
    int8. Opt-in for exactness conservatism.
    """
    if q.ndim != 4:
        raise ValueError(f"expected q [B,H,N,d], got {q.shape}")
    b, h, nq, d = q.shape
    _, h_kv, nk, _ = k.shape
    if h % h_kv != 0:
        raise ValueError(f"q heads {h} not a multiple of kv heads {h_kv}")
    group = h // h_kv
    scale = resolve_scale(scale, d)
    interpret = default_interpret() if interpret is None else interpret
    out_dtype = q.dtype if out_dtype is None else out_dtype
    quantized = k_scale is not None
    if quantized and v_scale is None:
        raise ValueError("k_scale given without v_scale")
    segmented = q_segment_ids is not None
    if segmented and kv_segment_ids is None:
        raise ValueError("q_segment_ids given without kv_segment_ids")
    window = int(window or 0)
    if window and not causal:
        raise ValueError("window requires causal=True (causal sliding "
                         "window attention)")
    if softmax not in ("auto", "bound", "bound_unchecked", "online"):
        raise ValueError(f"softmax must be auto|bound|bound_unchecked|"
                         f"online, got {softmax!r}")
    use_bound = _resolve_use_bound(softmax, causal=causal,
                                   quantized=quantized,
                                   segmented=segmented, nq=nq)
    if use_bound and segmented:
        raise ValueError("softmax='bound' is unsupported with segment "
                         "ids; use 'auto' or 'online'")

    bs = (block_sizes.clamp(nq, nk) if block_sizes is not None
          else auto_block_sizes(
              nq, nk, d, causal=causal,
              fp8=quantized and k.dtype == jnp.float8_e4m3fn
              and q.dtype == jnp.bfloat16))
    block_q, block_k = bs.block_q, bs.block_k
    if quantized and block_k % 128 != 0:
        # keep the fast lane-major scale layout: a 128-aligned KV block
        # is always legal (K/V pad to it), while non-aligned blocks fall
        # back to the 5x-slower sublane-major path (docs/MEMO.md #12)
        block_k = min(round_up(block_k, 128), round_up(nk, 128))

    qq = bool(quantize_q)
    if qq and not quantized:
        raise ValueError("quantize_q requires quantized KV "
                         "(k_scale/v_scale)")
    if qq and not use_bound:
        raise ValueError("quantize_q requires the bound softmax "
                         "(softmax='auto'/'bound', no segment ids)")
    if qq and k.dtype == jnp.float8_e4m3fn:
        # fp8+qq needs BOTH the shift-cast compute form (bf16 Q/V compute
        # — otherwise there is no fp8→int8 re-grid and the kernel would
        # feed raw fp8 K into an int8 matmul) AND the K-major kernel
        # (the re-grid lives in its cast scratch). Fall back to plain
        # fp8 dequant when either doesn't hold.
        if q.dtype != jnp.bfloat16:
            qq = False
        else:
            nq_p_est = cdiv(nq, block_q) * block_q
            if nq_p_est * (d + 128) * 4 > _KMAJOR_STATE_BUDGET:
                qq = False
    sq = None
    if qq:
        # per-(batch,head) absmax int8 Q; σ_q·scale·log2(e) fold into the
        # k-scale rows (per-head ⇒ the rows expand to [B,H,1,N] below)
        q8, sq = quantize_q_per_head(q, (2, 3))             # sq [B,H,1,1]
        q_p = pad_to_block(q8, 2, block_q)
    else:
        # softmax scale AND log2(e) folded into Q (see kernel note): one
        # fused (N,d) mul buys exp→exp2 in the kernel's hot loop
        q_p = pad_to_block((q * (scale * _LOG2E)).astype(q.dtype), 2,
                           block_q)
    k_p = pad_to_block(k, 2, block_k)
    v_p = pad_to_block(v, 2, block_k)
    nq_p, nk_p = q_p.shape[2], k_p.shape[2]
    nqb, nkb = nq_p // block_q, nk_p // block_k

    # Causal runs on a COMPACT grid: the host enumerates only the visible
    # (iq, ik) tile pairs of the causal band (plus one masked placeholder
    # step for Q blocks with nothing visible, so their O/LSE still get
    # written) into two scalar-prefetched maps. The dense grid's skipped
    # steps cost real pipeline time — switching to the band grid is what
    # lifted causal throughput past the VERDICT r1 #3 bar. Non-causal
    # keeps the plain dense grid (every pair is live).
    compact = bool(causal)
    if compact:
        iq_list, ik_list = [], []
        for iq in range(nqb):
            q_first = iq * block_q + kv_offset
            q_last = q_first + block_q - 1
            hi = min(nkb - 1, q_last // block_k)
            lo = max(0, (q_first - window + 1) // block_k) if window else 0
            if hi < lo:
                # nothing visible (Q precedes this KV shard, or the
                # window lies wholly outside it): one placeholder step —
                # block_visible is False there, the epilogue emits
                # O=0 / LSE=-inf
                iq_list.append(iq)
                ik_list.append(0)
            else:
                iq_list.extend([iq] * (hi - lo + 1))
                # serpentine: odd Q blocks walk their KV range backwards,
                # so consecutive steps across a Q-block boundary address
                # the SAME KV block and its HBM→VMEM copy is elided
                # (softmax-accumulation order is irrelevant: the bound
                # softmax's partial sums commute, and the online path
                # carries m/l exactly)
                ks = range(lo, hi + 1)
                ik_list.extend(ks if iq % 2 == 0 else reversed(ks))
        iq_map = jnp.asarray(np.asarray(iq_list, np.int32))
        ik_map = jnp.asarray(np.asarray(ik_list, np.int32))
        n_steps = len(iq_list)
        grid = (b, h, n_steps)

        def qmap(bb, hh, t, iq_m, ik_m):
            return (bb, hh, iq_m[t], 0)

        def kvmap(bb, hh, t, iq_m, ik_m, g=group):
            return (bb, hh // g, ik_m[t], 0)

        def scmap(bb, hh, t, iq_m, ik_m, g=group):
            return (bb, hh // g, 0, ik_m[t])

        def scmap_h(bb, hh, t, iq_m, ik_m):
            # per-q-head scale rows (quantize_q: σ_q varies by q head)
            return (bb, hh, 0, ik_m[t])

        def qsegmap(bb, hh, t, iq_m, ik_m):
            return (bb, iq_m[t], 0)

        def ksegmap(bb, hh, t, iq_m, ik_m):
            return (bb, ik_m[t], 0)
        kv_tiles = n_steps  # for the cost estimate
    else:
        grid = (b, h, nqb, nkb)

        def qmap(bb, hh, iq, ik):
            return (bb, hh, iq, 0)

        def kvmap(bb, hh, iq, ik, g=group):
            return (bb, hh // g, ik, 0)

        def scmap(bb, hh, iq, ik, g=group):
            return (bb, hh // g, 0, ik)

        def scmap_h(bb, hh, iq, ik):
            # per-q-head scale rows (quantize_q: σ_q varies by q head)
            return (bb, hh, 0, ik)

        def qsegmap(bb, hh, iq, ik):
            return (bb, iq, 0)

        def ksegmap(bb, hh, iq, ik):
            return (bb, ik, 0)
        kv_tiles = nqb * nkb

    fp8_fast = (quantized and k.dtype == jnp.float8_e4m3fn
                and q.dtype == jnp.bfloat16)

    inputs = [q_p, k_p, v_p]
    scale_specs = []
    if quantized:
        # scales laid out lane-major [B,Hkv,1,N] so each block is a
        # (1, Bk) row — always legal because block_k is forced 128-aligned
        # for quantized inputs above (docs/MEMO.md #12). With quantize_q
        # the K rows expand to [B,H,1,N]: they additionally carry the
        # per-q-head σ_q·scale·log2e (and 448/127 for the fp8→int8
        # re-grid), so the whole dequant stays one row multiply.
        for is_k, sc in ((True, k_scale), (False, v_scale)):
            if sc.shape != (b, h_kv, nk):
                raise ValueError(
                    f"scale shape {sc.shape} != {(b, h_kv, nk)}")
            sc = sc.astype(jnp.float32)
            if is_k and qq:
                if group > 1:
                    sc = jnp.repeat(sc, group, axis=1)       # [B,H,N]
                factor = sq[:, :, :, 0] * (scale * _LOG2E)   # [B,H,1]
                if fp8_fast:
                    factor = factor * (448.0 / 127.0)
                sc = sc * factor
            elif fp8_fast:
                sc = sc * FP8_SHIFT  # undo the shift-cast's 2^-120
            sc = pad_to_block(sc[:, :, None, :], 3, block_k, value=1.0)
            inputs.append(sc)
            scale_specs.append(pl.BlockSpec(
                (1, 1, 1, block_k), scmap_h if (is_k and qq) else scmap))
    if segmented:
        # q ids [B, Nq, 1] (padded with -1) / kv ids [B, 1, Nk] (padded
        # with -2): distinct pad ids so padded q rows match nothing
        qs = pad_to_block(
            jnp.asarray(q_segment_ids, jnp.int32)[:, :, None], 1, block_q,
            value=-1)
        ks = pad_to_block(
            jnp.asarray(kv_segment_ids, jnp.int32)[:, :, None], 1, block_k,
            value=-2)
        inputs.append(qs)
        scale_specs.append(pl.BlockSpec((1, block_q, 1), qsegmap))
        inputs.append(ks)
        scale_specs.append(pl.BlockSpec((1, block_k, 1), ksegmap))

    # K-major eligibility (see _fwd_kernel_kmajor): bound softmax, the
    # full-sequence (l, acc) state fits the VMEM scratch budget, and the
    # walk actually pays — causal (kills the Q-block-transition tax) or
    # fp8 (amortises the shift-cast over resident K blocks; int8's cast
    # is one op and measured FASTER on the plain dense grid)
    use_kmajor = (use_bound and (causal or fp8_fast)
                  and nq_p * (d + 128) * 4 <= _KMAJOR_STATE_BUDGET)
    if use_kmajor:
        km_iq, km_ik = [], []
        lo_of, hi_of = {}, {}
        for iq in range(nqb):
            q_first = iq * block_q + kv_offset
            q_last = q_first + block_q - 1
            hi_of[iq] = (min(nkb - 1, q_last // block_k) if causal
                         else nkb - 1)
            lo_of[iq] = (max(0, (q_first - window + 1) // block_k)
                         if (causal and window) else 0)
        for ik in range(nkb):
            for iq in range(nqb):
                if lo_of[iq] <= ik <= hi_of[iq]:
                    km_iq.append(iq)
                    km_ik.append(ik)
        km_has_empty = False
        for iq in range(nqb):
            if hi_of[iq] < lo_of[iq]:  # placeholder visit (empty block)
                km_iq.append(iq)
                km_ik.append(0)
                km_has_empty = True
        km_iq_map = jnp.asarray(np.asarray(km_iq, np.int32))
        km_ik_map = jnp.asarray(np.asarray(km_ik, np.int32))
        km_steps = len(km_iq)

        # ONE flat sequential grid axis over (batch, head, band step):
        # separate (b, h) grid dims break the Mosaic pipeline at every
        # head boundary (~20-29 µs each — see the kernel docstring);
        # the maps recover the coordinates arithmetically.
        def km_qmap(t, iqm, ikm, ns=km_steps, nh=h):
            bh = t // ns
            return (bh // nh, bh % nh, iqm[t % ns], 0)

        def km_kvmap(t, iqm, ikm, ns=km_steps, nh=h, g=group):
            bh = t // ns
            return (bh // nh, (bh % nh) // g, ikm[t % ns], 0)

        def km_scmap(t, iqm, ikm, ns=km_steps, nh=h, g=group):
            bh = t // ns
            return (bh // nh, (bh % nh) // g, 0, ikm[t % ns])

        def km_scmap_h(t, iqm, ikm, ns=km_steps, nh=h):
            bh = t // ns
            return (bh // nh, bh % nh, 0, ikm[t % ns])

    c_pad = None
    if use_bound:
        # Per-row log2 score bound c = ||q̂||₂ · max ||k||₂ (Cauchy–
        # Schwarz). One fused pass over Q and K host-side — negligible
        # next to the O(N²d) kernel. For quantized KV the row norm is
        # σ_row·||k_q_row||₂ (scales are per-token), so K is never
        # materialised in fp32.
        kf = k.astype(jnp.float32)
        k_norms = jnp.sqrt(jnp.sum(kf * kf, axis=-1))        # [B,Hkv,Nk]
        if quantized:
            k_norms = k_norms * k_scale.astype(jnp.float32)
            if qq and fp8_fast:
                # The in-kernel fp8→int8 re-grid (K-major cast scratch)
                # rounds each K component by up to half an int8 step —
                # 224/127 fp8-code units × the per-token scale — so the
                # effective scores can exceed the bound computed from the
                # exact fp8 values. Inflate each token's norm by the
                # worst-case ‖ΔK‖₂ = √d·(224/127)·σ so the s ≤ c
                # invariant survives the re-grid (ADVICE r2; the bound
                # grows by ~1e-2 log2 units — invisible in the weights).
                k_norms = k_norms + (k_scale.astype(jnp.float32)
                                     * (np.sqrt(d) * 224.0 / 127.0))
        kmax = jnp.max(k_norms, axis=-1)[:, :, None, None]   # [B,Hkv,1,1]
        if group > 1:
            kmax = jnp.repeat(kmax, group, axis=1)
        qf = q_p.astype(jnp.float32)
        qn = jnp.sqrt(jnp.sum(qf * qf, axis=-1, keepdims=True))
        if qq:
            # q_p is raw int8 here: restore real units (σ_q·scale·log2e)
            qn = qn * (sq * (scale * _LOG2E))
        c_pad = qn * kmax                                    # [B,H,Nq_p,1]

    def _call(bound: bool):
        if bound and use_kmajor:
            kernel = functools.partial(
                _fwd_kernel_kmajor,
                causal=causal,
                window=window,
                kv_offset=kv_offset,
                nk_valid=nk,
                block_q=block_q,
                block_k=block_k,
                nk_blocks=nkb,
                n_steps=len(km_iq),
                quantized=quantized,
                fp8_fast=fp8_fast,
                has_empty=km_has_empty,
                qq=qq,
                unroll=_FWD_UNROLL,
            )
            km_in_specs = [
                pl.BlockSpec((1, 1, block_q, 1), km_qmap),   # c
                pl.BlockSpec((1, 1, block_q, d), km_qmap),
                pl.BlockSpec((1, 1, block_k, d), km_kvmap),
                pl.BlockSpec((1, 1, block_k, d), km_kvmap),
            ]
            call_in = [c_pad, q_p, k_p, v_p]
            for i_sc, (sc_in, spec) in enumerate(
                    zip(inputs[3:], scale_specs)):
                call_in.append(sc_in)
                km_in_specs.append(pl.BlockSpec(
                    (1, 1, 1, block_k),
                    km_scmap_h if (qq and i_sc == 0) else km_scmap))
            return pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=2,
                    grid=(b * h * len(km_iq),),
                    in_specs=km_in_specs,
                    out_specs=[
                        pl.BlockSpec((1, 1, block_q, d), km_qmap),
                        pl.BlockSpec((1, 1, block_q, 1), km_qmap),
                        pl.BlockSpec((1, 1, block_q, 1), km_qmap),
                    ],
                    scratch_shapes=(
                        [pltpu.VMEM((nq_p, 128), jnp.float32),  # l
                         pltpu.VMEM((nq_p, d), jnp.float32)]    # acc
                        + ([pltpu.VMEM((block_k, d),
                                       jnp.int8 if qq else q.dtype),
                            # K cast (int8 re-grid target when qq)
                            pltpu.VMEM((block_k, d),
                                       jnp.bfloat16 if qq else q.dtype)]
                           if quantized else [])),
                ),
                out_shape=[
                    jax.ShapeDtypeStruct((b, h, nq_p, d), out_dtype),
                    jax.ShapeDtypeStruct((b, h, nq_p, 1), jnp.float32),
                    jax.ShapeDtypeStruct((b, h, nq_p, 1), jnp.float32),
                ],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",),
                    vmem_limit_bytes=110 * 1024 * 1024,
                ),
                cost_estimate=pl.CostEstimate(
                    flops=4 * b * h * len(km_iq) * block_q * block_k * d,
                    bytes_accessed=(q_p.size * q_p.dtype.itemsize
                                    + k_p.size * k_p.dtype.itemsize
                                    + v_p.size * v_p.dtype.itemsize),
                    transcendentals=b * h * len(km_iq) * block_q * block_k,
                ),
                interpret=interpret,
            )(km_iq_map, km_ik_map, *call_in)

        kernel = functools.partial(
            _fwd_kernel,
            causal=causal,
            window=window,
            kv_offset=kv_offset,
            nk_valid=nk,
            block_q=block_q,
            block_k=block_k,
            nk_blocks=nkb,
            quantized=quantized,
            segmented=segmented,
            compact=compact,
            bound=bound,
            fp8_fast=fp8_fast,
            qq=qq,
        )
        in_specs = [
            pl.BlockSpec((1, 1, block_q, d), qmap),
            pl.BlockSpec((1, 1, block_k, d), kvmap),
            pl.BlockSpec((1, 1, block_k, d), kvmap),
            *scale_specs,
        ]
        call_in = list(inputs)
        if bound:
            call_in.append(c_pad)
            in_specs.append(pl.BlockSpec((1, 1, block_q, 1), qmap))
        out_specs = [
            pl.BlockSpec((1, 1, block_q, d), qmap),
            # LSE as [B,H,Nq,1]: trailing dim 1 == array dim satisfies the
            # TPU (8,128) block-divisibility rule without the 128-wide
            # replication the stock jax kernel pays for its residuals.
            pl.BlockSpec((1, 1, block_q, 1), qmap),
        ]
        if bound:  # per-row loose-bound flags (fallback cond input)
            out_specs.append(pl.BlockSpec((1, 1, block_q, 1), qmap))
        scratch_shapes = [
            pltpu.VMEM((block_q, 128), jnp.float32),  # l
            pltpu.VMEM((block_q, d), jnp.float32),    # O accumulator
        ]
        if not bound:
            scratch_shapes.insert(
                0, pltpu.VMEM((block_q, 128), jnp.float32))  # m
        if compact:
            grid_kw = dict(grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=grid,
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch_shapes,
            ))
            call_in = [iq_map, ik_map, *call_in]
            semantics = ("parallel", "parallel", "arbitrary")
        else:
            grid_kw = dict(grid=grid, in_specs=in_specs,
                           out_specs=out_specs,
                           scratch_shapes=scratch_shapes)
            semantics = ("parallel", "parallel", "parallel", "arbitrary")

        return pl.pallas_call(
            kernel,
            out_shape=[
                jax.ShapeDtypeStruct((b, h, nq_p, d), out_dtype),
                jax.ShapeDtypeStruct((b, h, nq_p, 1), jnp.float32),
            ] + ([jax.ShapeDtypeStruct((b, h, nq_p, 1), jnp.float32)]
                 if bound else []),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=semantics,
                # Mosaic's default scoped-VMEM limit is 16 MiB — well
                # under the chip's physical VMEM — and it, not the
                # hardware, is what rejected larger causal blocks
                # (docs/MEMO.md).
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * h * kv_tiles * block_q * block_k * d,
                bytes_accessed=(q_p.size * q_p.dtype.itemsize
                                + k_p.size * k_p.dtype.itemsize
                                + v_p.size * v_p.dtype.itemsize
                                + b * h * nq_p * d
                                * jnp.dtype(out_dtype).itemsize),
                transcendentals=b * h * kv_tiles * block_q * block_k,
            ),
            interpret=interpret,
            **grid_kw,
        )(*call_in)

    if use_bound:
        o, lse, badv = _call(True)
    else:
        o, lse = _call(False)
    if (use_bound and (not interpret or _fallback_in_interpret) and not qq
            and softmax != "bound_unchecked"):
        # (interpret mode skips the fallback unless a test opts in via
        # _fallback_in_interpret — it exists for robustness on hardware,
        # and tracing a second kernel per call would double the CPU
        # suite's lowering time; quantize_q waives it too, since the
        # online kernel has no int8-Q form — both documented.)
        # Safety net for a loose bound (module docstring): on any row
        # that PROVABLY has visible keys, slack c·ln2 − LSE past
        # _FALLBACK_SLACK_LOG2 means the weights approach the fp32/bf16
        # subnormal range and precision degrades (total underflow l = 0
        # is the limiting case, and is subsumed) — re-run with the
        # online kernel. The flags are computed in the kernel EPILOGUE
        # (l < 2^-96 with the in-kernel visibility formula — identical
        # math, since LSE = c·ln2 + ln l): an extra [B,H,N] host pass
        # over c/LSE here measured ~4 TF/s of causal throughput. The
        # compiled cond branch is dead weight except in the
        # pathological case.
        bad = jnp.any(badv[:, :, :nq] > 0.0)
        o, lse = jax.lax.cond(
            bad, lambda: tuple(_call(False)), lambda: (o, lse))

    return o[:, :, :nq], lse[:, :, :nq, 0]
