#!/usr/bin/env bash
# Regression driver over the example ladder — counterpart of the
# reference's scripts/test_examples.sh (:36-46), which runs every stage
# and greps its output for the pass string. Two reference quirks fixed:
# the stale `cd ../examples` path (:5) and grepping "Test Pass" which the
# inverted vecadd branch (00_mpi_vecadd.cu:131-137) could satisfy wrongly.
set -uo pipefail
cd "$(dirname "$0")/.."

fail=0
for s in examples/0*.py; do
  echo "--- $s"
  out="$(python "$s" 2>&1)" || true
  if grep -q "Test PASSED!" <<<"$out"; then
    echo "PASS: $s"
  else
    echo "FAIL: $s"
    echo "$out" | tail -20
    fail=1
  fi
done
exit $fail
