#!/usr/bin/env bash
# On-TPU driver: runs the test suite against the real chip (compiled
# Pallas kernels instead of interpreter mode), then the benchmark.
# Counterpart of the reference's cloud runners (ref: scripts/modal_nvcc.py,
# scripts/modal_mpi.py) minus the cloud: a TPU VM runs this directly.
set -euo pipefail
cd "$(dirname "$0")/.."
CFA_TEST_TPU=1 python -m pytest tests/ -q "$@"
python bench.py
