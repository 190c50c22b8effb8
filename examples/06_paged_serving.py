"""Ladder stage 06 — paged-cache serving lifecycle.

Beyond the reference ladder: the vLLM-style serving pattern end to end —
page-aligned chunked prefill into a shared page pool, block-table decode
steps, sequence retirement with page reuse — verified against contiguous
attention at every stage.
"""

import _common  # noqa: F401

import sys

import jax
import jax.numpy as jnp
import numpy as np

from cuda_flashattention_tpu.ops.decode import decode_attention
from cuda_flashattention_tpu.ops.paged import (
    PageAllocator,
    init_paged_cache,
    paged_append,
    paged_bulk_append,
    paged_decode_step,
)


def main() -> int:
    _common.bootstrap()
    b, hkv, h, page, maxp, d = 2, 2, 4, 16, 6, 32
    rng = np.random.default_rng(11)
    cache = init_paged_cache(n_pages=16, batch=b, max_pages=maxp,
                             heads_kv=hkv, page_size=page, d=d,
                             dtype=jnp.float32)
    alloc = PageAllocator(16)
    ok = True

    # --- prefill: one page-aligned chunk of 32 tokens per sequence ---
    k_prompt = jnp.asarray(rng.uniform(-1, 1, (b, hkv, 32, d)), jnp.float32)
    v_prompt = jnp.asarray(rng.uniform(-1, 1, (b, hkv, 32, d)), jnp.float32)
    for i in range(b):
        cache = alloc.reserve_for(cache, i, 32)
    cache = paged_bulk_append(cache, k_prompt, v_prompt)

    # --- decode 10 steps, checking vs a contiguous shadow each step ---
    shadow_k = np.zeros((b, hkv, 96, d), np.float32)
    shadow_v = np.zeros_like(shadow_k)
    shadow_k[:, :, :32] = np.asarray(k_prompt)
    shadow_v[:, :, :32] = np.asarray(v_prompt)
    for t in range(10):
        k_new = jnp.asarray(rng.uniform(-1, 1, (b, hkv, d)), jnp.float32)
        v_new = jnp.asarray(rng.uniform(-1, 1, (b, hkv, d)), jnp.float32)
        for i in range(b):
            cache = alloc.reserve_for(cache, i, 1)
        cache = paged_append(cache, k_new, v_new)
        shadow_k[:, :, 32 + t] = np.asarray(k_new)
        shadow_v[:, :, 32 + t] = np.asarray(v_new)

        q = jnp.asarray(rng.uniform(-1, 1, (b, h, d)), jnp.float32)
        o, _ = paged_decode_step(q, cache)
        lengths = jnp.full((b,), 33 + t, jnp.int32)
        o_ref, _ = decode_attention(q, jnp.asarray(shadow_k),
                                    jnp.asarray(shadow_v), lengths,
                                    block_k=page)
        d_max = float(jnp.max(jnp.abs(o - o_ref)))
        ok &= d_max < 1e-5
    print(f"10 paged decode steps vs contiguous shadow: max diff {d_max:.2e}")

    # --- retire sequence 0, reuse its pages ---
    free_before = len(alloc.free)
    cache = alloc.release_sequence(cache, 0)
    freed = len(alloc.free) - free_before
    print(f"sequence retired: {freed} pages reclaimed")
    ok &= freed == 3  # ceil(42/16)
    cache = alloc.reserve_for(cache, 0, 16)
    ok &= len(alloc.free) == free_before + 2

    return _common.report("06_paged_serving", ok)


if __name__ == "__main__":
    sys.exit(main())
