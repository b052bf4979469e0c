#!/bin/sh
# CI lane: one command that fails when the build, the test suite, or the
# sanitizer lane fails — the counterpart of the reference gating every
# push on an ASan ctest build
# (/root/reference/.github/workflows/small_test_on_push.yml:27-34,
#  CMakeLists.txt:102-105,557).
#
# Usage:
#   ./ci.sh          fast lane: native build + fast pytest subset + ASan
#   ./ci.sh --full   full lane: native build + FULL pytest suite + ASan
#
# The fast subset covers every layer end to end (parser, prep, blocks,
# breaks, POA engines incl. the windowed Pallas kernel in interpret mode,
# lacing, MAF, consensus graph, CLI) in ~3 minutes; the full suite is the
# driver/judge gate (~10 minutes).  Everything runs on the CPU backend:
# CI must not require (or contend for) the single-client TPU tunnel.
set -e
REPO=$(cd "$(dirname "$0")" && pwd)

echo "== [1/3] native build =="
make -C "$REPO/native" all

echo "== [2/3] pytest =="
if [ "$1" = "--full" ]; then
    (cd "$REPO" && env JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m pytest tests/ -q -x)
else
    (cd "$REPO" && env JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m pytest -q -x \
            tests/test_e2e.py tests/test_cli.py tests/test_native.py \
            tests/test_poa_native.py tests/test_graph.py \
            tests/test_pipeline.py tests/test_blocks_native.py \
            tests/test_merge.py tests/test_consensus_graph.py \
            tests/test_maf_oracle.py tests/test_golden_drb1.py \
            tests/test_seqindex.py tests/test_tempfiles.py \
            tests/test_pool_leak.py)
fi

echo "== [3/3] sanitizers (ASan+UBSan) =="
"$REPO/tools/run_asan.sh"

echo "CI: OK"
