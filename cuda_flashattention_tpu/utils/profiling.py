"""Profiling: jax.profiler traces + annotated regions + kernel reports.

TPU-native counterpart of the reference's profiling hooks — cudaEvent
timings, Nsight `-g -G` debug builds, and NCCL_DEBUG env plumbing
(ref: 00_mpi_vecadd.cu:89-98, README.md:12, scripts/modal_mpi.py:15).
On TPU the equivalents are XLA profiler traces (viewable in
TensorBoard/Perfetto/xprof), named trace annotations, and derived
TFLOP/s / bandwidth reports from the timing harness.

    from cuda_flashattention_tpu.utils.profiling import trace, annotate

    with trace("/tmp/cfa_trace"):          # capture a device trace
        with annotate("attention_fwd"):    # named region inside it
            o = flash_attention(q, k, v)
            jax.block_until_ready(o)
"""

from __future__ import annotations

import contextlib
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a jax.profiler device trace into `log_dir`."""
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler timelines (and is free when
    no trace is active)."""
    return jax.profiler.TraceAnnotation(name)


def kernel_report(
    name: str,
    seconds: float,
    flops: float = 0.0,
    bytes_moved: float = 0.0,
    device=None,
) -> Dict[str, float]:
    """Derive TFLOP/s, GB/s, and fraction-of-peak for a measured kernel;
    print a one-line summary (the reference prints raw elapsed ms,
    ref: 00_mpi_vecadd.cu:116-117 — we add the roofline context)."""
    from cuda_flashattention_tpu.utils.timing import device_peaks
    peaks = device_peaks(device)
    tflops = flops / seconds / 1e12 if flops else 0.0
    gbps = bytes_moved / seconds / 1e9 if bytes_moved else 0.0
    out = {
        "name": name,
        "ms": seconds * 1e3,
        "tflops": tflops,
        "gbps": gbps,
        "frac_peak_flops": (tflops / peaks["peak_tflops"]
                            if peaks["peak_tflops"] else float("nan")),
        "frac_peak_bw": (gbps / peaks["peak_hbm_gbps"]
                         if peaks["peak_hbm_gbps"] else float("nan")),
    }
    print(f"[kernel_report] {name}: {out['ms']:.3f} ms"
          + (f", {tflops:.1f} TFLOP/s"
             f" ({100*out['frac_peak_flops']:.1f}% peak)" if flops else "")
          + (f", {gbps:.1f} GB/s"
             f" ({100*out['frac_peak_bw']:.1f}% peak)" if bytes_moved
             else ""))
    return out


def save_device_memory_profile(path: str, device=None) -> None:
    """Dump the current device memory profile (pprof format)."""
    jax.profiler.save_device_memory_profile(path)
