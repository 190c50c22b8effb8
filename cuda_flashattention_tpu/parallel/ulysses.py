"""Ulysses-style sequence parallelism: all-to-all over heads.

The second standard long-context strategy (DeepSpeed-Ulysses,
arXiv 2309.14509) — SURVEY.md §2.4 notes the reference has "no Ulysses
(no all-to-all on heads)"; this module adds it as an alternative to the
ring (parallel/ring.py):

  ring:    KV shards rotate; O(n_shards) steps of compute+permute;
           comm volume ~ 2·N·d per device per layer, overlappable.
  ulysses: ONE all-to-all re-shards activations from sequence-sharded
           [B, H, N/s, d] to head-sharded [B, H/s, N, d], each device
           runs plain local attention over the FULL sequence for its
           head subset, and one all-to-all converts back. Comm volume
           ~ 2·(N/s)·H·d per device, in two dense collectives that ride
           ICI at full bandwidth. Requires H % n_shards == 0 (heads must
           shard); the ring has no such constraint — pick per topology.

Differentiable for free: `jax.lax.all_to_all` is linear, so autodiff
reverses it — no custom VJP needed (the local attention inside already
carries one). Composes with every kernel feature (window, segments would
need gathering ids — full causal/window supported here).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from cuda_flashattention_tpu.ops.attention import flash_attention
from cuda_flashattention_tpu.ops.common import BlockSizes, resolve_scale


def ulysses_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "sp",
    scale: Optional[float] = None,
    causal: bool = False,
    window: int = 0,
    block_sizes: Optional[BlockSizes] = None,
    interpret: Optional[bool] = None,
    batch_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Sequence-parallel attention via head all-to-all: q/k/v [B,H,N,d]
    sharded on N over `axis_name` → O with the same sharding.

    Head counts (H and Hkv) must divide the axis; GQA is supported as
    long as Hkv % n_shards == 0. Differentiable end to end.
    """
    n_shards = mesh.shape[axis_name]
    b, h, n, d = q.shape
    h_kv = k.shape[1]
    if n % n_shards or h % n_shards or h_kv % n_shards:
        raise ValueError(
            f"ulysses needs seq {n}, q heads {h} and kv heads {h_kv} all "
            f"divisible by the '{axis_name}' axis ({n_shards}); use the "
            f"ring for indivisible head counts")
    scale = resolve_scale(scale, d)

    def local(q, k, v):
        # [B, H/s? no: H, N/s, d] per shard → all_to_all splits heads and
        # concatenates sequence: [B, H/s, N, d]
        qh = jax.lax.all_to_all(q, axis_name, split_axis=1, concat_axis=2,
                                tiled=True)
        kh = jax.lax.all_to_all(k, axis_name, split_axis=1, concat_axis=2,
                                tiled=True)
        vh = jax.lax.all_to_all(v, axis_name, split_axis=1, concat_axis=2,
                                tiled=True)
        o = flash_attention(qh, kh, vh, scale=scale, causal=causal,
                            window=window, block_sizes=block_sizes,
                            interpret=interpret)
        # back to sequence-sharded: split sequence, gather heads
        return jax.lax.all_to_all(o, axis_name, split_axis=2,
                                  concat_axis=1, tiled=True)

    spec = P(batch_axis, None, axis_name, None)
    f = jax.shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                      out_specs=spec, check_vma=False)
    return f(q, k, v)
