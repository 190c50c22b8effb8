"""Timing / throughput instrumentation.

TPU-native counterpart of the reference's cudaEvent + chrono timers and
GPU-utilization poller (ref: 00_mpi_vecadd.cu:89-98, 02_overlap.cu:61,
94-101, scripts/monitor_gpu.py:1-37): `block_until_ready`-bracketed wall
timing with warmup (compile) exclusion, TFLOP/s helpers, and device
memory stats.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# Peak dense bf16 matmul throughput per chip, TFLOP/s (public specs).
PEAK_TFLOPS = {
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,   # v5e
    "TPU v5": 459.0,        # v5p
    "TPU v6 lite": 918.0,   # v6e (Trillium)
    "TPU v6e": 918.0,
}
# Peak HBM bandwidth per chip, GB/s.
PEAK_HBM_GBPS = {
    "TPU v4": 1228.0,
    "TPU v5 lite": 819.0,
    "TPU v5": 2765.0,
    "TPU v6 lite": 1640.0,
    "TPU v6e": 1640.0,
}


def device_peaks(device=None) -> Dict[str, float]:
    dev = device or jax.devices()[0]
    kind = getattr(dev, "device_kind", "")
    return {
        "device_kind": kind,
        "peak_tflops": PEAK_TFLOPS.get(kind, float("nan")),
        "peak_hbm_gbps": PEAK_HBM_GBPS.get(kind, float("nan")),
    }


def time_fn(fn: Callable, *args, iters: int = 20, warmup: int = 3,
            **kwargs) -> float:
    """Median wall seconds per call, excluding compile (warmup) time.

    NOTE: on remote-relayed backends (axon tunnel) `block_until_ready`
    can return before execution completes; prefer `time_chained` with a
    host readback for kernel benchmarking."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def time_chained(step_fn: Callable, x0, iters: int = 20,
                 warmup: int = 2) -> float:
    """Seconds per call for `x -> step_fn(x)`, measured by CHAINING calls
    (each feeds the next, so the device cannot overlap or elide them) and
    forcing completion with a scalar host readback.

    This is the reliable pattern here: the axon-tunnelled TPU backend
    acks dispatches before execution finishes, so per-call
    `block_until_ready` timing reads absurdly high; chaining + readback
    measures true device throughput (fixed relay latency ~tens of ms is
    amortised across iters)."""
    reduce_fn = jax.jit(lambda t: jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(jnp.abs(x).astype(jnp.float32)),
        t, jnp.float32(0)))
    x = x0
    for _ in range(warmup):
        x = step_fn(x)
    float(reduce_fn(x))  # warm the reducer + sync
    x = x0
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step_fn(x)
    float(reduce_fn(x))
    return (time.perf_counter() - t0) / iters


def attention_flops(b: int, h: int, nq: int, nk: int, d: int,
                    causal: bool = False, backward: bool = False) -> float:
    """Matmul FLOPs of one attention call: 2 matmuls fwd (QKᵀ, PV),
    5 bwd (recompute S, dP, dV, dK, dQ), 2·n·d MACs each."""
    pairs = b * h * nq * nk * (0.5 if causal else 1.0)
    n_matmuls = 5 if backward else 2
    return 2.0 * pairs * d * n_matmuls


def memory_stats(device=None) -> Dict[str, int]:
    dev = device or jax.devices()[0]
    stats = dev.memory_stats() or {}
    return {k: v for k, v in stats.items()
            if "bytes" in k or "limit" in k}


def time_scanned(fn, x0, *args, inner: int = 16, iters: int = 6,
                 warmup: int = 1) -> float:
    """Per-step seconds for a decode-style step chained INSIDE one jit
    (lax.scan over `inner` steps), measured at TWO scan lengths so the
    per-dispatch floor cancels.

    The tunnelled backend has a per-DISPATCH floor that `time_chained`
    cannot amortise for sub-millisecond steps (a 0.15 ms quantized
    decode step reads as ~1.3 ms — it made int8 GQA decode look 40%
    SLOWER than bf16 when it is 40% faster). Scanning steps inside one
    dispatched computation is also the realistic serving measurement:
    production decode loops jit the whole generation scan exactly like
    models/generate.py does.

    The floor is NOT a constant of the backend — measured ~1 ms on the
    round-4 bench day and ~7 ms a day later — so any single scan length
    still over-reads by floor/inner (a no-op step at inner=8 read
    ~1 ms/step on the 7 ms day). Timing scans of `inner` and `3·inner`
    steps and taking the slope (T₃ − T₁) / (2·inner) cancels the
    dispatch-fixed cost exactly, whatever it is that day; if noise
    swamps the difference (slope ≤ 0) the longer scan's mean is the
    conservative fallback.

    `fn(x, *args) -> pytree-like-x` must return a value matching x's
    structure/shapes (the scan carry — e.g. decode feeds o back as q, a
    train step feeds params); pass caches/constants via *args (NOT
    closure captures — captured arrays re-materialise as multi-GB
    jaxpr constants)."""
    def scanned(n):
        @jax.jit
        def f(x, *a):
            def body(c, _):
                y = fn(c, *a)
                y = jax.tree_util.tree_map(
                    lambda yi, ci: yi.astype(ci.dtype), y, c)
                return y, None
            y, _ = jax.lax.scan(body, x, None, length=n)
            return y
        return f

    f1, f3 = scanned(inner), scanned(3 * inner)

    def one_pair(w):
        t1 = time_chained(lambda x: f1(x, *args), x0, iters=iters,
                          warmup=w)
        t3 = time_chained(lambda x: f3(x, *args), x0, iters=iters,
                          warmup=w)
        return (t3 - t1) / (2 * inner), t3

    # Two independent pairs, min slope: a tunnel stall mid-measurement
    # (observed: one 0.3 ms row reading 300+ s) only ever inflates a
    # leg, so the smaller positive slope is the honest one. Runtime is
    # cheap next to the (shared) compiles.
    s_a, t3_a = one_pair(warmup)
    s_b, t3_b = one_pair(0)
    slopes = [s for s in (s_a, s_b) if s > 0.0]
    if not slopes:
        return min(t3_a, t3_b) / (3 * inner)
    return min(slopes)
