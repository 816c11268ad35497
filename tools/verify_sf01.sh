#!/bin/sh
# Once-per-round full correctness gate at sf0.1 — ten times the driver
# gate's data, so partition-count- and scale-dependent bugs (AQE plan
# changes, broadcast-threshold flips, skew paths) cannot hide at sf0.01.
# Writes the same per-query OK/FAIL report as the driver's check and
# saves it as CORRECTNESS_SF01_r<N>.txt for the round.
#
# Usage: tools/verify_sf01.sh <round-number>
set -e
ROUND="${1:?usage: tools/verify_sf01.sh <round-number>}"
OUT=/tmp/verify_sf01
sbt -batch "runMain graft.Verify /root/testdata/sf0.1 $OUT" 1>&2
# 120s per-oracle budget: a few brute-force / recursive-CTE oracle
# RESTATEMENTS are quadratic in DuckDB at sf0.1 (the Spark operators under
# test are not); those report SKIP and stay covered by the sf0.01 gate.
python3 tools/check.py /root/testdata/sf0.1 "$OUT" --budget 120 \
  | tee "CORRECTNESS_SF01_r${ROUND}.txt"
