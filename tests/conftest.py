"""Test configuration: CPU-only CI with a virtual 8-device mesh.

The reference tests on real multi-GPU via Modal cloud (ref:
scripts/modal_mpi.py:29-59); we test the multi-chip paths on a virtual
8-device CPU mesh (`--xla_force_host_platform_device_count=8`) with Pallas
kernels in interpreter mode, exactly as SURVEY.md §4's TPU translation
prescribes. Set CFA_TEST_TPU=1 to run the suite on real TPU devices
instead.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

if os.environ.get("CFA_TEST_TPU", "0") != "1":
    # Must be a config update (not an env var): the environment's
    # sitecustomize registers the TPU PJRT plugin at interpreter startup,
    # which locks in JAX_PLATFORMS before test code runs.
    jax.config.update("jax_platforms", "cpu")
