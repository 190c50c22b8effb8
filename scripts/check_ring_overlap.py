#!/usr/bin/env python
"""Prove (or refute) ring comm/compute overlap from scheduled TPU HLO.

The reference overlaps its ring's NCCL exchange with the attention kernel
via dual CUDA streams and eyeballs the wall clock
(ref: src/03_flash_attention_v2_ring/02_overlap.cu:61-101,
ring_attention_kernel.cu:192-220). XLA has no streams to inspect — but the
scheduled HLO *is* the execution order: an async collective-permute
overlaps compute iff its `-start` and `-done` straddle a kernel
custom-call in the ENTRY schedule.

This tool AOT-compiles `ring_attention` for a (virtual) v5e:2x2 topology —
no TPU hardware needed — and asserts, per ring transfer, whether a Pallas
kernel (or the lax.switch conditional wrapping one) executes between its
start and done.

Finding this encodes (round 2): WITHOUT the optimization_barrier in
parallel/ring.py the scheduler drains the whole permute chain back-to-back
before any compute (0/6 transfers overlapped); WITH it every mid-ring
transfer is in flight during its step's kernel (4/6 — the final stage's
pair has no compute left to hide under by construction).

Usage:  python scripts/check_ring_overlap.py [n_devices] [--causal]
Exit 0 iff every hidable transfer overlaps compute.
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def entry_schedule(txt: str):
    m = re.search(r"ENTRY[^\n]*\n(.*)\n\}", txt, re.S)
    seq = []
    for ln in m.group(1).splitlines():
        ln = ln.strip()
        name = ln.split(" = ")[0] if " = " in ln else ""
        if re.match(r"%collective-permute-start(\.\d+)? =", ln):
            seq.append(("start", name))
        elif re.match(r"%collective-permute-done(\.\d+)? =", ln):
            seq.append(("done", name))
        elif "tpu_custom_call" in ln or "conditional(" in ln:
            seq.append(("compute", name))
    return seq


def analyze(seq):
    pos = {n: i for i, (kind, n) in enumerate(seq)}
    pairs, overlapped = 0, 0
    for kind, n in seq:
        if kind != "start":
            continue
        done = n.replace("start", "done")
        if done not in pos:
            continue
        pairs += 1
        if any(k == "compute" for k, _ in seq[pos[n] + 1:pos[done]]):
            overlapped += 1
    return pairs, overlapped


def main() -> int:
    n_dev = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 4
    causal = "--causal" in sys.argv

    from jax.experimental import topologies
    from jax.sharding import Mesh
    from cuda_flashattention_tpu.parallel.ring import ring_attention

    topo = topologies.get_topology_desc("v5e:2x2", "tpu")
    mesh = Mesh(np.array(topo.devices)[:n_dev].reshape(n_dev), ("sp",))

    def f(q, k, v):
        return ring_attention(q, k, v, mesh=mesh, causal=causal,
                              interpret=False)

    shape = jax.ShapeDtypeStruct((1, 4, 2048 * n_dev, 128), jnp.bfloat16)
    print(f"AOT-compiling ring_attention for v5e x{n_dev} "
          f"(causal={causal})...", flush=True)
    txt = jax.jit(f).lower(shape, shape, shape).compile().as_text()
    seq = entry_schedule(txt)
    print("ENTRY schedule:",
          " ".join({"start": "S", "done": "D", "compute": "K"}[k]
                   for k, _ in seq))
    pairs, overlapped = analyze(seq)
    # the final ring stage has no subsequent compute to hide under: its
    # K and V transfers are exempt from the assertion
    hidable = max(0, pairs - 2)
    print(f"permute pairs: {pairs}; overlapped with compute: {overlapped}; "
          f"hidable: {hidable}")
    # pairs == 0 means the start/done matching itself broke (HLO naming
    # drift) — fail loudly rather than pass vacuously
    ok = pairs > 0 and overlapped >= hidable
    print("OVERLAP " + ("OK" if ok else "MISSING"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
