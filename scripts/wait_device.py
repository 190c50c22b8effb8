#!/usr/bin/env python
"""Block until the accelerator actually answers, then exit 0.

Preemptible / tunnelled TPU attachments can be unreachable for minutes
to hours while the PJRT plugin still registers and the process hangs at
the first dispatch (docs/MEMO.md #23) — `jax.devices()` succeeding is
NOT liveness. This gate runs a tiny matmul round-trip in a fresh
subprocess per attempt (a hung dispatch cannot be cancelled in-process;
the subprocess is killed on timeout and retried), so launchers can do:

    python scripts/wait_device.py --max-wait 7200 && bash scripts/run_tpu.sh

TPU-native counterpart of the reference's "wait for the Modal GPU
container" gap — its launchers assume the device exists the moment the
job starts (ref: scripts/modal_mpi.py:50-68); a tunnelled TPU offers no
such guarantee.

Exit codes: 0 = device answered; 1 = still dead after --max-wait.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time

_PROBE = """
import jax, jax.numpy as jnp
x = jnp.ones((128, 128), dtype=jnp.bfloat16)
print(jax.devices()[0].platform, float((x @ x).sum()))
"""


def wait_device(max_wait_s: float = 7200.0, probe_timeout_s: float = 120.0,
                interval_s: float = 480.0, verbose: bool = True) -> bool:
    """Probe until the device answers or `max_wait_s` elapses."""
    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            out = subprocess.run(
                [sys.executable, "-c", _PROBE], capture_output=True,
                text=True, timeout=probe_timeout_s)
            if out.returncode == 0:
                if verbose:
                    # stderr: callers like bench.py reserve stdout for
                    # their ONE machine-parsed JSON line
                    print(f"device up (attempt {attempt}): "
                          f"{out.stdout.strip()}", file=sys.stderr)
                return True
            reason = (out.stderr or out.stdout).strip().splitlines()
            reason = reason[-1][:120] if reason else f"rc={out.returncode}"
        except subprocess.TimeoutExpired:
            reason = f"probe hung >{probe_timeout_s:.0f}s (tunnel down?)"
        remaining = deadline - time.monotonic()
        if verbose:
            print(f"attempt {attempt}: {reason} "
                  f"({remaining/60:.0f} min left)", file=sys.stderr,
                  flush=True)
        if remaining <= interval_s:
            return False
        time.sleep(interval_s)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--max-wait", type=float, default=7200.0,
                    help="give up after this many seconds (default 2 h)")
    ap.add_argument("--probe-timeout", type=float, default=120.0,
                    help="per-attempt dispatch timeout (default 120 s)")
    ap.add_argument("--interval", type=float, default=480.0,
                    help="sleep between attempts (default 8 min)")
    opts = ap.parse_args()
    return 0 if wait_device(opts.max_wait, opts.probe_timeout,
                            opts.interval) else 1


if __name__ == "__main__":
    sys.exit(main())
