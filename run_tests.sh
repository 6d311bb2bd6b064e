#!/bin/bash

# movi_tpu test runner — the analogue of the reference's run_tests.sh
# (builds the native kernels, then runs the pytest suites with a summary).
#
# Usage: ./run_tests.sh [-jN] [-k EXPR]

set -e

JOBS=$(nproc 2>/dev/null || echo 2)
PYTEST_ARGS=()

while [[ $# -gt 0 ]]; do
    case $1 in
        -j|--jobs) JOBS="$2"; shift 2 ;;
        -j*) JOBS="${1#-j}"; shift ;;
        -k) PYTEST_ARGS+=("-k" "$2"); shift 2 ;;
        -h|--help)
            echo "Usage: $0 [-jN] [-k EXPR]"
            exit 0 ;;
        *) echo "Unknown option: $1"; exit 1 ;;
    esac
done

GREEN='\033[0;32m'; RED='\033[0;31m'; BLUE='\033[0;34m'; NC='\033[0m'
status() { echo -e "${BLUE}[INFO]${NC} $1"; }

cd "$(dirname "$0")"

status "Building native kernels (-j$JOBS)..."
make -C native -j"$JOBS"

status "Running test suites (CPU 8-device mesh via tests/conftest.py)..."
if python -m pytest tests/ -q "${PYTEST_ARGS[@]}"; then
    echo -e "${GREEN}[SUCCESS]${NC} All tests passed."
else
    echo -e "${RED}[ERROR]${NC} Test failures — see output above."
    exit 1
fi
