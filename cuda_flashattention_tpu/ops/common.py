"""Shared kernel-layer helpers.

TPU-native counterpart of the reference's device helper layer
(ref: src/util/cuda_helper.h, src/util/attention_helper.h). Warp shuffles
and `div_up` become lane/sublane reductions (done by jnp inside Pallas)
and `pl.cdiv`; the −inf-init-needs-a-kernel gotcha (ref: memo.md:1) becomes
a plain scratch-initialisation under `@pl.when(first_step)`.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

# A finite stand-in for -inf inside kernels: exp(x - NEG_INF) == 0 in fp32
# while avoiding inf-inf = nan in the m/l updates (the reference needs a
# dedicated init_array kernel for -inf, ref: cuda_helper.h:60-65, memo.md:1).
NEG_INF = -1e30

# Minimal sublane tile for fp32 scratch (see pallas guide: (8, 128) fp32).
LANES = 128
SUBLANES = 8


def cdiv(a: int, b: int) -> int:
    """Ceiling division (ref: cuda_helper.h:16 `div_up`)."""
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


@functools.cache
def default_interpret() -> bool:
    """Run Pallas kernels in interpreter mode off-TPU (CPU CI), compiled
    on real TPU. The reference's analogous trick is the WARP_SIZE=2 debug
    configuration (ref: 02_fwd/flash_attention_kernel.cu:11)."""
    return jax.default_backend() != "tpu"


@dataclasses.dataclass(frozen=True)
class BlockSizes:
    """Tile-size configuration for the attention kernels.

    The reference fixes these as C++ template parameters <Br, Bc, d_max,
    num_warps> (ref: 02_fwd/kernel.cu:311-315); here they are runtime
    arguments resolved per-shape by `auto_block_sizes` (VMEM-budget
    heuristic, tuned on v5e) or the measuring autotuner
    (utils/autotune.py), and must honour TPU tiling: multiples of 8
    sublanes / 128 lanes, and a VMEM budget instead of SRAM.

    Defaults are the measured best for d=128 bf16 on TPU v5e with the
    kernels' 64 MiB scoped-VMEM limit (fwd block sweep: (512,1024) 102 →
    (1024,2048) 129 → (2048,2048) 130 TFLOP/s, causal 67 → 82 → 88.5):
    large blocks amortise the per-step softmax bookkeeping and K/V
    restream.
    """

    block_q: int = 2048
    block_k: int = 2048
    # backward tiles (kv-parallel kernel loops over q; q-parallel over kv);
    # measured best on v5e d=128 bf16: (1024,2048) — 114.9 TFLOP/s
    # non-causal / 88.5 causal vs 110.4/84.6 at the old (512,1024)
    block_q_bwd: int = 1024
    block_k_bwd: int = 2048

    def with_bwd_like(self, nq: int, nk: int) -> "BlockSizes":
        """Shrink the BWD tiles with the problem the same way the fwd
        heuristic does (small grids amortise badly — see
        auto_block_sizes)."""
        def shrink(b, n):
            while b > 512 and b * 4 > n:
                b //= 2
            return b
        return dataclasses.replace(
            self, block_q_bwd=shrink(self.block_q_bwd, nq),
            block_k_bwd=shrink(self.block_k_bwd, nk))

    def clamp(self, nq: int, nk: int) -> "BlockSizes":
        """Shrink blocks to the problem size (keeps tiny ladder tests legal)."""
        def fit(b: int, n: int) -> int:
            return max(8, min(b, round_up(n, 8)))
        return BlockSizes(
            block_q=fit(self.block_q, nq),
            block_k=fit(self.block_k, nk),
            block_q_bwd=fit(self.block_q_bwd, nq),
            block_k_bwd=fit(self.block_k_bwd, nk),
        )


def auto_block_sizes(nq: int, nk: int, d: int, causal: bool = False,
                     fp8: bool = False,
                     vmem_budget: int = 52 * 2**20) -> BlockSizes:
    """VMEM-budget block-size heuristic (the reference's own future-work
    item "Auto-tune Br, Bc", ref: __info__/IMPLEMENTATION_SUMMARY.md:256).

    The dominant VMEM consumers at block (Bq, Bk): the fp32 S and P tiles
    (Bq·Bk·(4+4)B, plus a bool mask tile in the masked path), the streamed
    K/V blocks (2·2·Bk·d·2B double-buffered), and the fp32 accumulators.
    The budget tracks the kernels' 64 MiB scoped-VMEM limit (minus
    pipeline headroom), calibrated on v5e: (2048,2048) is the measured
    best and compiles; (4096,2048)-causal and (2048,4096)-causal overflow.
    Shrink whichever block is larger first.

    `fp8=True` (non-causal): the K-major fp8 path amortises its shift
    cast per K block, so a wider 4096 KV block halves the per-step
    overheads — measured +3.4 TF/s over (2048,2048) on v5e (it runs
    under the K-major kernel's 110 MiB scoped-VMEM limit, not the 64 MiB
    dense-grid one, hence the exception to the budget rule)."""
    if fp8 and not causal and nq >= 2048 and nk >= 4096:
        return BlockSizes(block_q=2048, block_k=4096)
    # Short sequences need smaller tiles: a (2048,2048) grid at nq=4096
    # has only 2-3 live steps per head and its per-step bookkeeping and
    # pipeline ramp dominate — (1024,1024) fwd + (1024,1024) bwd measured
    # 22% faster fwd+bwd at T=4096 on v5e (the train-step shape; this is
    # where the r1 train MFU's missing percents were hiding). Aim for
    # >=4 blocks per axis, floored at 512.
    def shrink(n):
        b = 512
        while b * 8 <= n and b < 2048:
            b *= 2
        return b
    bq, bk = shrink(nq), shrink(nk)
    if nq >= 16384:
        bq = 2048
    if nk >= 16384:
        bk = 2048
    while True:
        s_bytes = bq * bk * (8 + (2 if causal else 0))
        kv_bytes = 2 * 2 * bk * d * 2
        fixed = bq * d * 6 + 2 * bq * 128 * 4
        if s_bytes + kv_bytes + fixed <= vmem_budget:
            break
        if bk >= bq and bk > 512:
            bk //= 2
        elif bq > 512:
            bq //= 2
        else:
            break
    return BlockSizes(block_q=bq, block_k=bk, block_q_bwd=1024,
                      block_k_bwd=2048).with_bwd_like(nq, nk).clamp(nq, nk)


def pad_to_block(x: jnp.ndarray, axis: int, block: int,
                 value: float = 0.0) -> jnp.ndarray:
    """Zero-pad `axis` up to a multiple of `block`.

    The reference dodges non-divisible shapes by assertion
    (ref: 04_ring_attention.cu:56-63); we pad + mask instead
    (SURVEY.md §7 hard part (e))."""
    n = x.shape[axis]
    target = round_up(n, block)
    if target == n:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - n)
    return jnp.pad(x, pads, constant_values=value)


def fp8_to_bf16(x: jnp.ndarray) -> jnp.ndarray:
    """float8_e4m3fn → bfloat16 via integer bit surgery.

    Chips without native fp8 (v5e) lower `astype` through a slow generic
    conversion; the exact mapping is a 16-bit rebias: e4m3 `s eeee mmm` →
    bf16 `s (e+120)<<7 | m<<4`, with zero/subnormals flushed to 0 (the
    KV quantizer's subnormals are ≤2⁻⁶·scale — below int8's noise floor).
    Measured on v5e decode @131k ctx: 119 → ~int8-class tok/s."""
    # int32 arithmetic with multiplies: Mosaic legalizes i32 vector mul
    # but not i16 shifts (arith.shli on vector<...xi16> fails to legalize)
    u = jax.lax.bitcast_convert_type(x, jnp.uint8).astype(jnp.int32)
    mag = u & 0x7f
    sign = (u & 0x80) * 256
    bits = sign + (mag + (120 << 3)) * 16
    bits = jnp.where(mag < 8, 0, bits)           # flush zero/subnormals
    bits = jnp.where(mag == 0x7f, sign + 0x7fc0, bits)  # preserve NaN
    return jax.lax.bitcast_convert_type(bits.astype(jnp.uint16),
                                        jnp.bfloat16)


# fp8_shift_cast leaves values scaled by 2^-120; callers fold this into
# their per-token dequant scales (one free host-side multiply).
FP8_SHIFT = 2.0 ** 120


def fp8_shift_cast(x: jnp.ndarray) -> jnp.ndarray:
    """float8_e4m3fn → bfloat16 · 2^-120, in 2 integer VPU ops.

    Moving the 7 magnitude bits of `s eeee mmm` into bf16's field
    positions (sign<<8, magnitude<<4) and reading the result at bf16's
    bias gives EXACTLY value·2^(7-127) — for normals ((1+m/8)·2^(e-7) →
    (1+16m/128)·2^(e-127)) AND subnormals (m·2^-9 → 16m·2^-133·…), since
    both interpret the shifted mantissa at their respective minimum
    exponents. The 2^120 correction folds into the per-token dequant
    scale that quantized kernels already multiply by, so this replaces
    the ~12-op rebias surgery of `fp8_to_bf16` at zero extra cost.
    Sign handling rides the SIGN-EXTENDING int8 widen: for a negative
    code, `i·16` sets every bit above the magnitude field, so one AND
    with 0x87F0 keeps exactly bit 15 (sign) + bits 10..4 (magnitude) —
    `(i·16) & 0x87F0` is bit-identical to the previous zero-extended
    `u·16 + (u&0x80)·240` on all 256 codes (verified exhaustively in
    tests/test_quant.py) at half the ALU ops, worth ~2% on 1M-token
    fp8 decode where the per-block cast is the exposed cost.
    Caveat: the NaN code (0x7f/0xff) maps to a finite junk value (±480 ·
    2^-120·2^120); the quantizer never emits NaN (e4m3fn clamps to ±448),
    so kernels take this path while `dequantize()` keeps `fp8_to_bf16`.
    Integer mul instead of a shift: Mosaic won't legalize i16 vector
    shifts (docs/MEMO.md)."""
    i = jax.lax.bitcast_convert_type(x, jnp.int8).astype(jnp.int32)
    bits = (i * 16) & 0x87F0
    return jax.lax.bitcast_convert_type(bits.astype(jnp.uint16),
                                        jnp.bfloat16)


def dequant_cast(x: jnp.ndarray, target_dtype) -> jnp.ndarray:
    """Cast a quantized KV block to the compute dtype, routing fp8
    through the fast bit-twiddle when targeting bf16."""
    if x.dtype == jnp.float8_e4m3fn and target_dtype == jnp.bfloat16:
        return fp8_to_bf16(x)
    return x.astype(target_dtype)


def quantize_q_per_head(q: jnp.ndarray, axes) -> tuple:
    """Per-head absmax int8 quantisation of Q for the 2x int8-MXU QK
    path (quantize_q): absmax over `axes` (the non-head dims), returns
    (q_int8, sigma [broadcastable]). One shared implementation for the
    prefill (flash_fwd), decode, and paged hosts."""
    qf = q.astype(jnp.float32)
    sq = jnp.maximum(jnp.max(jnp.abs(qf), axis=axes, keepdims=True),
                     1e-12) / 127.0
    q8 = jnp.clip(jnp.round(qf / sq), -127, 127).astype(jnp.int8)
    return q8, sq


def resolve_scale(scale: Optional[float], d: int) -> float:
    import math
    return 1.0 / math.sqrt(d) if scale is None else float(scale)
