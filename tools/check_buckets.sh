#!/usr/bin/env bash
# Parallel-bucket wrapper for tools/check.py on big (sf1/sf10) gates:
# check.py is sequential and a single slow oracle blocks the rest, so
# split the Verify outdir into symlink buckets and run one check.py per
# bucket concurrently. Usage:
#   tools/check_buckets.sh <sfDir> <outDir> <workDir> \
#     "q22_jaccard_pairs" "q95_containment_pairs" "q16_dedup_exact q83_chunk_dedup"
# Each positional arg after workDir is one bucket (space-separated query
# names). Exit code = number of failing buckets; per-bucket logs land in
# <workDir>/bucket<N>.log.
set -u
sfdir=$1; outdir=$2; work=$3; shift 3
# absolute outdir: the symlinks store it verbatim, and a relative path
# would dangle inside the bucket dirs (bucket "passes" on zero results)
outdir=$(cd "$outdir" && pwd) || { echo "bad outDir"; exit 99; }
mkdir -p "$work"
i=0; pids=(); missing=0
for bucket in "$@"; do
  i=$((i+1))
  b="$work/bucket$i"
  rm -rf "$b"; mkdir -p "$b"
  cp "$outdir/oracle_sql.json" "$b/"
  for q in $bucket; do
    # a listed-but-absent query (typo, failed Verify) must FAIL the
    # gate, not be silently skipped
    if [ -e "$outdir/$q" ]; then ln -s "$outdir/$q" "$b/$q"
    else echo "MISSING: $q not in $outdir" >&2; missing=$((missing+1)); fi
  done
  (GRAFT_CHECK_THREADS=${GRAFT_CHECK_THREADS:-3} \
     python3 "$(dirname "$0")/check.py" "$sfdir" "$b" \
     > "$work/bucket$i.log" 2>&1) &
  pids+=($!)
done
fails=$missing
for p in "${pids[@]}"; do wait "$p" || fails=$((fails+1)); done
grep -h "" "$work"/bucket*.log | grep -vE "^$" | sort
exit $fails
