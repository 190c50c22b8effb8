#!/usr/bin/env python
"""TPU memory/utilization poller.

TPU-native counterpart of the reference's GPU monitor
(ref: scripts/monitor_gpu.py:1-37 polls `nvidia-smi --query-gpu=...` every
5 s on a daemon thread during Modal jobs). There is no nvidia-smi on TPU;
the per-device PJRT `memory_stats()` counters provide the same signal
(bytes in use / peak / limit). Use standalone:

    python scripts/monitor_tpu.py [interval_s]

or in-process around a workload:

    from scripts.monitor_tpu import start_monitor
    stop = start_monitor(interval_s=5.0)
    ...  # run job
    stop()
"""

from __future__ import annotations

import sys
import threading
import time


GREEN, YELLOW, RED, RESET = "\033[92m", "\033[93m", "\033[91m", "\033[0m"


def _fmt_bytes(n: float) -> str:
    for unit in ("B", "KiB", "MiB", "GiB"):
        if abs(n) < 1024:
            return f"{n:7.1f}{unit}"
        n /= 1024
    return f"{n:7.1f}TiB"


def poll_once(verbose: bool = True) -> list:
    import jax
    rows = []
    for dev in jax.local_devices():
        stats = dev.memory_stats() or {}
        used = stats.get("bytes_in_use", 0)
        limit = stats.get("bytes_limit", 0) or stats.get(
            "bytes_reservable_limit", 0)
        peak = stats.get("peak_bytes_in_use", 0)
        pct = 100.0 * used / limit if limit else 0.0
        color = GREEN if pct < 60 else (YELLOW if pct < 85 else RED)
        rows.append((dev.id, used, peak, limit, pct))
        if verbose:
            stamp = time.strftime("%H:%M:%S")
            print(f"[{stamp}] dev{dev.id} ({dev.device_kind}): "
                  f"{color}{_fmt_bytes(used)} used{RESET} / "
                  f"{_fmt_bytes(limit)} limit "
                  f"(peak {_fmt_bytes(peak)}, {pct:.1f}%)")
    return rows


def start_monitor(interval_s: float = 5.0):
    """Run the poller on a daemon thread (the reference hooks its monitor
    the same way, ref: modal_mpi.py:64-68). Returns a stop() callable."""
    stop_evt = threading.Event()

    def loop():
        while not stop_evt.is_set():
            try:
                poll_once()
            except Exception as e:  # monitoring must never kill the job
                print(f"[monitor_tpu] {e}", file=sys.stderr)
            stop_evt.wait(interval_s)

    t = threading.Thread(target=loop, daemon=True)
    t.start()
    return stop_evt.set


if __name__ == "__main__":
    interval = float(sys.argv[1]) if len(sys.argv) > 1 else 5.0
    while True:
        poll_once()
        time.sleep(interval)
