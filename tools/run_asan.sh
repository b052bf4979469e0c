#!/bin/sh
# AddressSanitizer pass over the native C++ libraries (cpoa, graphcore,
# sgd) — the counterpart of the reference running its ctest suite under
# ASan (reference: CMakeLists.txt:102-105,557).
#
# Builds sanitized .so's into native/asan/ and re-runs the test subsets
# that exercise native code with those preloaded.  Leak checking is off:
# CPython itself holds allocations for the life of the process, which
# floods the report with interpreter noise; ASan's heap-corruption /
# overflow / use-after-free checks are what we want on the raw-pointer
# C++.
set -e
REPO=$(cd "$(dirname "$0")/.." && pwd)
make -C "$REPO/native" asan
ASAN_RT=$(g++ -print-file-name=libasan.so)
UBSAN_RT=$(g++ -print-file-name=libubsan.so)
# libstdc++ must ride in the preload too: without it the asan
# __cxa_throw interceptor is left null (libstdc++ only dlopens later,
# under a python extension) and the first C++ throw hard-aborts
STDCXX=$(g++ -print-file-name=libstdc++.so.6)
cd "$REPO"
env LD_PRELOAD="$ASAN_RT $UBSAN_RT $STDCXX" \
    ASAN_OPTIONS=detect_leaks=0:abort_on_error=1 \
    SMOOTHXG_NATIVE_DIR="$REPO/native/asan" \
    JAX_PLATFORMS=cpu \
    python -m pytest tests/test_native.py tests/test_poa_native.py \
        tests/test_engine_fuzz.py tests/test_e2e.py -q -x "$@"
echo "ASan pass: OK"
