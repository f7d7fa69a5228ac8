#!/bin/bash
# Scrape the structured "copypaste:" result lines and timing lines from a
# training log (reference dev/parse_results.sh).
LOG="$1"
[ -z "$LOG" ] && { echo "usage: parse_results.sh <log file>"; exit 1; }

grep -o 'copypaste:.*' "$LOG"
grep -o 'Total inference time.*' "$LOG" | tail -n1
grep -o 'Total inference pure compute time.*' "$LOG" | tail -n1
grep -o 'Total training time.*' "$LOG" | tail -n1
