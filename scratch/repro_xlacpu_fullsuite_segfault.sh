#!/bin/sh
# Minimal repro: running the WHOLE test suite in ONE process segfaults
# XLA:CPU while compiling pianist.fft inside tests/test_parallel.py.
#
# Facts (r4 bisect, still true at r5):
# - deterministic: always the same test (test_parallel's first fft case),
#   a hard SIGSEGV inside native XLA:CPU compilation, not a Python error;
# - every module passes ALONE, and the pair
#     pytest tests/test_msm.py tests/test_parallel.py
#   passes too - i.e. some EARLIER module's native compile corrupts
#   jaxlib/XLA:CPU process state, and only the accumulated full-suite
#   sequence triggers it;
# - mitigation in-tree: tests/conftest.py documents the split and CI runs
#     pytest tests/ --ignore=tests/test_parallel.py && pytest tests/test_parallel.py
#   (.github/workflows/ci.yml). Remove the split when this script exits 0.
#
# Expected on a fixed jaxlib: full suite passes in one process, exit 0.
# Observed (r4, r5 jax 0.9.0): SIGSEGV (rc 139) at test_parallel.
cd "$(dirname "$0")/.." || exit 2
exec python -m pytest tests/ -q
