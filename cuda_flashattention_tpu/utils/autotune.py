"""Measuring block-size autotuner for the attention kernels.

The reference fixes tile sizes as C++ template parameters and lists
"Auto-tune Br, Bc based on problem size" as future work
(ref: src/02_flash_attention_v2_backward/__info__/IMPLEMENTATION_SUMMARY.md:256,
template params at 02_fwd/flash_attention_kernel.cu:311-315). This module
delivers that item TPU-natively:

  * candidates are generated from the VMEM budget model in
    `ops.common.auto_block_sizes` (the static heuristic stays the zero-cost
    default; this tuner is the measured upgrade),
  * each candidate is timed on the live device SCAN-CHAINED inside one
    jit at two scan lengths (utils.timing.time_scanned — safe against
    async dispatch AND the tunnelled backend's variable per-dispatch
    floor, which otherwise makes every sub-ms decode candidate read
    alike and the winner noise), and
  * results are cached per (device_kind, shape, dtype, causal, mode), both
    in-process and in an on-disk JSON so repeat runs pay nothing. The
    cache key carries a version ("v3") bumped whenever the timing
    methodology changes, so winners measured under a biased harness
    can't outlive the fix.

Usage:
    bs = autotune_block_sizes(nq=16384, nk=16384, d=128)
    o, lse = flash_attention_forward(q, k, v, block_sizes=bs)

or from the shell:
    python -m cuda_flashattention_tpu.utils.autotune --seq 16384 --d 128
"""

from __future__ import annotations

import itertools
import json
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from cuda_flashattention_tpu.ops.common import (
    BlockSizes,
    auto_block_sizes,
    round_up,
)
from cuda_flashattention_tpu.utils.log import get_logger
from cuda_flashattention_tpu.utils.timing import time_scanned

from cuda_flashattention_tpu import config as _config

_CACHE_PATH = _config.AUTOTUNE_CACHE()
_MEM_CACHE: dict = {}


def _disk_cache_load() -> dict:
    try:
        with open(_CACHE_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _disk_cache_store(cache: dict) -> None:
    try:
        os.makedirs(os.path.dirname(_CACHE_PATH), exist_ok=True)
        with open(_CACHE_PATH, "w") as f:
            json.dump(cache, f, indent=1, sort_keys=True)
    except OSError:
        pass  # caching is best-effort


def candidate_blocks(
    nq: int, nk: int, d: int, causal: bool = False,
    vmem_budget: int = 52 * 2**20,
) -> List[Tuple[int, int]]:
    """Enumerate (block_q, block_k) pairs that respect the VMEM model
    (same cost terms and budget as ops.common.auto_block_sizes — the
    bool-mask term for causal, the kernels' 64 MiB scoped limit minus
    pipeline headroom) and TPU tiling. The grid ADAPTS to the problem:
    powers of two from 256 up to the sequence itself (capped at 8k),
    so small problems don't waste compiles on oversized tiles and large
    ones aren't clipped at the old 2048/4096 ceiling (VERDICT r1 #8).
    Includes the measured-best (2048, 2048) point on v5e d=128."""
    def _pows(n, cap):
        top = min(cap, max(256, round_up(n, 8)))
        out, p = [], 256
        while p <= top:
            out.append(p)
            p *= 2
        return out
    qs = _pows(nq, 8192)
    ks = _pows(nk, 8192)
    out = []
    for bq, bk in itertools.product(qs, ks):
        if bq > round_up(nq, 8) or bk > round_up(nk, 8):
            continue
        s_bytes = bq * bk * (8 + (2 if causal else 0))
        kv_bytes = 2 * 2 * bk * d * 2
        fixed = bq * d * 6 + 2 * bq * 128 * 4
        if s_bytes + kv_bytes + fixed <= vmem_budget:
            out.append((bq, bk))
    return out or [(min(512, round_up(nq, 8)), min(512, round_up(nk, 8)))]


def _bench_fwd(bs: BlockSizes, q, k, v, causal: bool, iters: int,
               window: int = 0) -> float:
    from cuda_flashattention_tpu.ops.flash_fwd import flash_attention_forward

    def step(x, k, v):
        return flash_attention_forward(x, k, v, causal=causal,
                                       window=window, block_sizes=bs)[0]
    return time_scanned(step, q, k, v, inner=4, iters=iters, warmup=1)


def _bench_bwd(bs: BlockSizes, q, k, v, causal: bool, iters: int,
               window: int = 0) -> float:
    from cuda_flashattention_tpu.ops.flash_bwd import (
        flash_attention_backward)
    from cuda_flashattention_tpu.ops.flash_fwd import flash_attention_forward
    o, lse = flash_attention_forward(q, k, v, causal=causal, window=window)

    def step(x, q, k, v, o, lse):
        dq, _, _ = flash_attention_backward(q, k, v, o, lse, x,
                                            causal=causal, window=window,
                                            block_sizes=bs)
        return dq
    return time_scanned(step, o, q, k, v, o, lse, inner=4, iters=iters,
                        warmup=1)


def autotune_block_sizes(
    nq: int,
    nk: int,
    d: int,
    batch: int = 1,
    heads: int = 1,
    dtype=jnp.bfloat16,
    causal: bool = False,
    window: int = 0,
    mode: str = "fwd",
    iters: int = 5,
    candidates: Optional[List[Tuple[int, int]]] = None,
    verbose: bool = False,
) -> BlockSizes:
    """Measure candidate tile sizes on the live device; return the best.

    `mode` is "fwd" or "bwd" (tunes block_q/block_k or the *_bwd pair);
    `window` tunes window-specific tiles (the straddler-mask fraction
    shifts the optimum — docs/IMPLEMENTATION.md "Known gaps", r1) and
    implies `causal` (windows are causal by definition here).
    Results are cached on disk keyed by device kind + problem shape.
    """
    if window:
        causal = True
    dev = jax.devices()[0]
    key = json.dumps(["v3", dev.device_kind, jax.default_backend(), batch, heads,
                      nq, nk, d, str(jnp.dtype(dtype)), causal, window,
                      mode])
    if key in _MEM_CACHE:
        return _MEM_CACHE[key]
    disk = _disk_cache_load()
    if key in disk:
        bs = BlockSizes(**disk[key])
        _MEM_CACHE[key] = bs
        return bs

    cands = candidates or candidate_blocks(nq, nk, d, causal=causal)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.uniform(keys[0], (batch, heads, nq, d), dtype, -0.5, 0.5)
    k = jax.random.uniform(keys[1], (batch, heads, nk, d), dtype, -0.5, 0.5)
    v = jax.random.uniform(keys[2], (batch, heads, nk, d), dtype, -0.5, 0.5)

    best_bs, best_t = None, float("inf")
    failures = []
    base = BlockSizes()
    for bq, bk in cands:
        # A candidate the compiler rejects (e.g. the fused backward's
        # full-seq VMEM states + an aggressive tile pair overflowing the
        # scoped limit) is just a non-winner, not a tune abort — the
        # candidate filter's VMEM model tracks the DENSE kernels' terms
        # and deliberately over-admits for the others.
        try:
            if mode == "bwd":
                bs = BlockSizes(block_q=base.block_q, block_k=base.block_k,
                                block_q_bwd=bq, block_k_bwd=bk).clamp(nq, nk)
                t = _bench_bwd(bs, q, k, v, causal, iters, window=window)
            else:
                bs = BlockSizes(block_q=bq, block_k=bk,
                                block_q_bwd=base.block_q_bwd,
                                block_k_bwd=base.block_k_bwd).clamp(nq, nk)
                t = _bench_fwd(bs, q, k, v, causal, iters, window=window)
        except Exception as e:  # noqa: BLE001 — compile errors vary by path
            failures.append(f"({bq},{bk}): {type(e).__name__}: "
                            f"{str(e)[:120]}")
            if verbose:
                print(f"  ({bq:5d},{bk:5d}) -> failed: {failures[-1]}")
            continue
        if verbose:
            print(f"  ({bq:5d},{bk:5d}) -> {t*1e3:8.3f} ms")
        if t < best_t:
            best_bs, best_t = bs, t

    if failures:
        # Never silent (a broken _bench_* or a dead device would otherwise
        # masquerade as a successful tune), and never written to DISK: a
        # transient failure (device OOM from a concurrent job) striking
        # mid-sweep must not permanently cache a partially-measured winner.
        # Deterministic rejects re-tune once per process — acceptable for
        # an explicit user-invoked tune.
        get_logger(__name__).warning(
            "autotune %s %dx%d d=%d: %d/%d candidates failed "
            "(best-of-survivors kept in-process only, disk cache skipped): "
            "%s", mode, nq, nk, d, len(failures), len(cands),
            "; ".join(failures[:3]))
    if best_bs is None:
        # Every candidate failed: fall back to the static heuristic.
        best_bs = auto_block_sizes(nq, nk, d, causal=causal)
    elif not failures:
        disk[key] = {
            "block_q": best_bs.block_q, "block_k": best_bs.block_k,
            "block_q_bwd": best_bs.block_q_bwd,
            "block_k_bwd": best_bs.block_k_bwd,
        }
        _disk_cache_store(disk)
    _MEM_CACHE[key] = best_bs
    return best_bs


def autotune_decode_block_k(
    ctx: int,
    heads: int = 16,
    kv_heads: Optional[int] = None,
    d: int = 128,
    batch: int = 4,
    qtype: Optional[str] = None,
    window: int = 0,
    iters: int = 10,
    verbose: bool = False,
) -> int:
    """Measure decode block_k candidates on the live device (the serving
    knob VERDICT r1 #8 flagged as untuned). Candidates are powers of two
    2048..min(ctx_padded, 32768) (128-aligned for quantized caches);
    cached like the prefill tuner. Returns the best block_k."""
    from cuda_flashattention_tpu.ops.decode import (
        decode_attention, default_decode_block_k)
    from cuda_flashattention_tpu.ops.quant import quantize_kv

    kv_heads = kv_heads or heads
    dev = jax.devices()[0]
    key = json.dumps(["v3", dev.device_kind, jax.default_backend(), "decode",
                      batch, heads, kv_heads, ctx, d, qtype or "bf16",
                      window])
    if key in _MEM_CACHE:
        return _MEM_CACHE[key]
    disk = _disk_cache_load()
    if key in disk:
        _MEM_CACHE[key] = disk[key]
        return disk[key]

    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    k = jax.random.uniform(keys[0], (batch, kv_heads, ctx, d),
                           jnp.bfloat16, -0.5, 0.5)
    v = jax.random.uniform(keys[1], (batch, kv_heads, ctx, d),
                           jnp.bfloat16, -0.5, 0.5)
    q = jax.random.uniform(keys[2], (batch, heads, d), jnp.bfloat16,
                           -0.5, 0.5)
    lengths = jnp.full((batch,), ctx, jnp.int32)
    # Scales ride time_scanned's *args, NOT a closure: per-token scale
    # arrays are fp32·batch·heads·ctx (~256 MB at 1M ctx) and a captured
    # array re-materialises as a jaxpr constant in every candidate's
    # fresh jit (the time_scanned contract).
    scale_args = ()
    if qtype:
        kvq = quantize_kv(k, v, qtype)
        k, v = kvq.k_q, kvq.v_q
        scale_args = (kvq.k_scale, kvq.v_scale)

    # 65536 is the known-best point for fp8-ish caches at >=256k ctx (the
    # decode_attention adaptive default; mixed+qq measured 133.4 -> 137.1
    # tok/s at 1M) — the candidate set must reach it or tuning would
    # override the default DOWNWARD. (128k blocks fail VMEM compile; the
    # per-candidate try/except would skip them anyway, but don't waste
    # the compile.)
    top = min(round_up(ctx, 128), 65536)
    cands = [bk for bk in (2048, 4096, 8192, 16384, 32768, 65536)
             if bk <= top] or [top]
    best_bk, best_t = None, float("inf")
    failures = []
    for bk in cands:
        def step(x, k, v, *scales, bk=bk):
            kw = (dict(k_scale=scales[0], v_scale=scales[1]) if scales
                  else {})
            return decode_attention(x, k, v, lengths, block_k=bk,
                                    window=window, **kw)[0]
        try:
            t = time_scanned(step, q, k, v, *scale_args, inner=16,
                             iters=iters, warmup=1)
        except Exception as e:  # noqa: BLE001 — same policy as the
            failures.append(  # block-sizes tuner: a reject is a non-winner
                f"block_k {bk}: {type(e).__name__}: {str(e)[:120]}")
            if verbose:
                print(f"  block_k {bk:6d} -> failed: {failures[-1]}")
            continue
        if verbose:
            print(f"  block_k {bk:6d} -> {t*1e3:8.3f} ms")
        if t < best_t:
            best_bk, best_t = bk, t

    if failures:
        get_logger(__name__).warning(
            "autotune decode ctx=%d: %d/%d candidates failed (disk cache "
            "skipped): %s", ctx, len(failures), len(cands),
            "; ".join(failures[:3]))
    if best_bk is None:
        best_bk = default_decode_block_k(k.dtype, v.dtype, q.dtype, False,
                                         window, False, ctx)
    elif not failures:
        disk[key] = best_bk
        _disk_cache_store(disk)
    _MEM_CACHE[key] = best_bk
    return best_bk


def autotune_page_size(
    ctx: int,
    heads: int = 16,
    d: int = 128,
    batch: int = 4,
    qtype: Optional[str] = None,
    iters: int = 10,
    verbose: bool = False,
) -> int:
    """Measure paged-decode page sizes (a CACHE-LAYOUT decision: pick it
    BEFORE allocating pools). Candidates 128..1024; cached. Returns the
    best page_size."""
    from cuda_flashattention_tpu.ops.paged import paged_decode_attention
    from cuda_flashattention_tpu.ops.quant import quantize_tensor

    dev = jax.devices()[0]
    key = json.dumps(["v3", dev.device_kind, jax.default_backend(), "page",
                      batch, heads, ctx, d, qtype or "bf16"])
    if key in _MEM_CACHE:
        return _MEM_CACHE[key]
    disk = _disk_cache_load()
    if key in disk:
        _MEM_CACHE[key] = disk[key]
        return disk[key]

    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.uniform(keys[2], (batch, heads, d), jnp.bfloat16,
                           -0.5, 0.5)
    cands = [ps for ps in (128, 256, 512, 1024) if ps <= ctx] or [
        max(8, round_up(ctx, 8))]
    best_ps, best_t = None, float("inf")
    failures = []
    for ps in cands:
        pages_per_seq = -(-ctx // ps)
        n_pool = batch * pages_per_seq
        kp = jax.random.uniform(keys[0], (n_pool, heads, ps, d),
                                jnp.bfloat16, -0.5, 0.5)
        vp = jax.random.uniform(keys[1], (n_pool, heads, ps, d),
                                jnp.bfloat16, -0.5, 0.5)
        # per-token scales ride *args, not a closure (same contract note
        # as the decode tuner above)
        scale_args = ()
        if qtype:
            from cuda_flashattention_tpu.ops.quant import _pair_qtypes
            kt, vt = _pair_qtypes(qtype)  # "mixed": int8 K / fp8 V
            kp, ks = quantize_tensor(kp, kt)
            vp, vs = quantize_tensor(vp, vt)
            scale_args = (ks, vs)
        table = jnp.arange(n_pool, dtype=jnp.int32).reshape(
            batch, pages_per_seq)
        lengths = jnp.full((batch,), ctx, jnp.int32)

        def step(x, kp, vp, *scales, table=table):
            kw = (dict(k_scale=scales[0], v_scale=scales[1]) if scales
                  else {})
            return paged_decode_attention(x, kp, vp, table, lengths,
                                          **kw)[0]
        try:
            t = time_scanned(step, q, kp, vp, *scale_args, inner=16,
                             iters=iters, warmup=1)
        except Exception as e:  # noqa: BLE001
            failures.append(
                f"page_size {ps}: {type(e).__name__}: {str(e)[:120]}")
            if verbose:
                print(f"  page_size {ps:5d} -> failed: {failures[-1]}")
            continue
        if verbose:
            print(f"  page_size {ps:5d} -> {t*1e3:8.3f} ms")
        if t < best_t:
            best_ps, best_t = ps, t

    if failures:
        get_logger(__name__).warning(
            "autotune page ctx=%d: %d/%d candidates failed (disk cache "
            "skipped): %s", ctx, len(failures), len(cands),
            "; ".join(failures[:3]))
    if best_ps is None:
        best_ps = min(256, cands[-1])  # static serving default
    elif not failures:
        disk[key] = best_ps
        _disk_cache_store(disk)
    _MEM_CACHE[key] = best_ps
    return best_ps


def main() -> None:
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seq", type=int, default=16384)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--window", type=int, default=0)
    ap.add_argument("--mode", choices=["fwd", "bwd", "decode", "page"],
                    default="fwd")
    ap.add_argument("--iters", type=int, default=5)
    opts = ap.parse_args()
    if opts.mode == "decode":
        bk = autotune_decode_block_k(ctx=opts.seq, heads=opts.heads,
                                     d=opts.d, batch=opts.batch,
                                     window=opts.window, verbose=True)
        print(f"best decode block_k: {bk}")
    elif opts.mode == "page":
        ps = autotune_page_size(ctx=opts.seq, heads=opts.heads, d=opts.d,
                                batch=opts.batch, verbose=True)
        print(f"best page_size: {ps}")
    else:
        bs = autotune_block_sizes(
            nq=opts.seq, nk=opts.seq, d=opts.d, batch=opts.batch,
            heads=opts.heads, causal=opts.causal, window=opts.window,
            mode=opts.mode, iters=opts.iters, verbose=True)
        print(f"best: {bs}")


if __name__ == "__main__":
    main()
