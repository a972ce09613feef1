#!/bin/sh
# Prints the ScalaTest RUNTIME tally of a full `sbt -batch test` run
# as one line: "<suites> suites, <tests> tests (failed <n>) (exit <rc>)".
# README gate sections must quote THIS output — never a typed
# number (the r16 and r17 verdicts both caught hand-typed counts
# drifting from the real tally).
#
# Usage: tools/test_tally.sh [logfile]
#   With a logfile argument, parses an existing `sbt -batch test`
#   log instead of running the suite again.
#
# No `set -e`: the tally must still print when sbt exits nonzero —
# that is exactly the case it exists to report (r18 ADVICE).
RC=0
if [ -n "$1" ]; then
  LOG="$1"
else
  LOG=$(mktemp)
  sbt -batch test >"$LOG" 2>&1 || RC=$?
fi
TESTS=$(grep -o 'Total number of tests run: [0-9]*' "$LOG" | tail -1 | grep -o '[0-9]*')
SUITES=$(grep -o 'Suites: completed [0-9]*' "$LOG" | tail -1 | grep -o '[0-9]*')
FAILED=$(grep -o 'failed [0-9]*' "$LOG" | tail -1 | grep -o '[0-9]*')
echo "$SUITES suites, $TESTS tests (failed ${FAILED:-?}) (exit ${RC})"
