#!/usr/bin/env bash
# Reliable full-suite runner (VERDICT r2 #4).
#
# Why not plain `pytest tests/`: XLA's CPU compiler can segfault after
# several hundred compiles in ONE process (observed twice in round 2,
# different tests each time; every file passes alone). Two sequential
# pytest processes keep each run under the observed threshold — measured
# green 227 + 303 at round-2 close. This script encodes that split, plus
# one automatic recovery pass if a half dies on a signal (segfault), so
# a naive CI run cannot silently ship on partial results.
#
# Usage: bash scripts/run_tests.sh [extra pytest args...]
#   e.g. bash scripts/run_tests.sh -m smoke
# Exit code 0 iff every selected test passed.
set -u
cd "$(dirname "$0")/.."

LOCK=/tmp/video3d_tpu_pytest.lock
exec 9>"$LOCK"
if ! flock -n 9; then
    echo "run_tests.sh: another suite run holds $LOCK (two concurrent" >&2
    echo "pytest processes on the 1-core host starve each other); waiting." >&2
    flock 9
fi

first=()
second=()
for f in tests/test_*.py; do
    base=$(basename "$f")
    if [[ "$base" < "test_m" ]]; then first+=("$f"); else second+=("$f"); fi
done

overall=0
run_half() {
    local name=$1; shift
    local files=("$@")
    echo "=== run_tests.sh: $name (${#files[@]} files) ==="
    python -m pytest "${files[@]}" -q "${EXTRA[@]}"
    local rc=$?
    if [ $rc -ge 128 ]; then
        # killed by a signal (the XLA CPU-compiler segfault flake): rerun
        # this half once as two quarters, each in a fresh process
        echo "=== $name crashed (rc=$rc) — retrying as two quarters ===" >&2
        local mid=$(( ${#files[@]} / 2 ))
        python -m pytest "${files[@]:0:$mid}" -q "${EXTRA[@]}"
        local r1=$?
        python -m pytest "${files[@]:$mid}" -q "${EXTRA[@]}"
        local r2=$?
        rc=0
        [ $r1 -ne 0 ] && [ $r1 -ne 5 ] && rc=$r1
        [ $r2 -ne 0 ] && [ $r2 -ne 5 ] && rc=$r2
    fi
    # exit 5 = "no tests collected" — fine under -m/-k filters
    if [ $rc -ne 0 ] && [ $rc -ne 5 ]; then
        overall=1
        echo "=== $name FAILED (rc=$rc) ===" >&2
    fi
}

EXTRA=("$@")
run_half "first half (< test_m)" "${first[@]}"
run_half "second half (>= test_m)" "${second[@]}"

if [ $overall -eq 0 ]; then
    echo "=== run_tests.sh: ALL GREEN ==="
else
    echo "=== run_tests.sh: FAILURES ===" >&2
fi
exit $overall
