#!/bin/bash
# sf0.1 correctness gate, split into a budgeted main pass and an
# unbudgeted grind pass for the known-quadratic DuckDB twins, merged
# into one artifact (the merge_gate_logs.py discipline). Dev tooling.
#
# Usage: run_sf01_gate.sh <verifyDumpDir> <outArtifact.json>
# Expects the dump to exist (graft.Verify /root/testdata/sf0.1 <dir>).
set -euo pipefail
DUMP=$1
OUT=$2
SF=/root/testdata/sf0.1
WORK=$(mktemp -d /tmp/sf01gate.XXXX)

# twins whose DuckDB side is quadratic at sf0.1 (measured r09-r11:
# dedup_canonical's recursive-CTE cluster oracle ~100 min CPU); they get
# an unbudgeted parallel process instead of a skip, so the artifact
# regains full coverage (r12 directive #2)
GRIND="dedup_clusters dedup_canonical dedup_ngram"

cat > "$WORK/skips.json" <<'EOF'
{
  "dedup_clusters": "ground in the parallel unbudgeted pass, merged below",
  "dedup_canonical": "ground in the parallel unbudgeted pass, merged below",
  "dedup_ngram": "ground in the parallel unbudgeted pass, merged below"
}
EOF

mkdir -p "$WORK/grind"
# filtered oracle map: a full map would make oracle_check emit
# no_spark_output FAILs for every query absent from the grind dir, and
# the merge (grind last, later-wins) would clobber the main pass's
# verdicts with them
python3 - "$DUMP/oracle_sql.json" "$WORK/grind/oracle_sql.json" $GRIND <<'EOF'
import json, sys
full = json.load(open(sys.argv[1]))
keep = {q: full[q] for q in sys.argv[3:] if q in full}
json.dump(keep, open(sys.argv[2], "w"))
EOF
for q in $GRIND; do ln -s "$DUMP/$q" "$WORK/grind/$q"; done

# unbudgeted grind first (longest pole): 12 threads leaves room for the
# budgeted pass + sbt test alongside
ORACLE_TIMEOUT_S= DUCKDB_THREADS=12 \
  python3 scripts/oracle_check.py "$SF" "$WORK/grind" "$WORK/grind.json" \
  > "$WORK/grind.log" 2>&1 &
GRIND_PID=$!

# || true: a FAIL exit must still reach the merge + summary below (the
# summary is where failures get diagnosed)
ORACLE_SKIP_JSON="$WORK/skips.json" ORACLE_TIMEOUT_S=2400 DUCKDB_THREADS=16 \
  python3 scripts/oracle_check.py "$SF" "$DUMP" "$WORK/main.json" \
  > "$WORK/main.log" 2>&1 || true

wait $GRIND_PID || true

# grind records win over the main pass's skip records; --expect asserts
# the merged artifact enumerates EXACTLY SparkEntry.queries (the JVM
# dumps query_keys.json on every Verify run) — exit 2 + diff otherwise
[ -f "$DUMP/query_keys.json" ] || {
  echo "FATAL: $DUMP/query_keys.json missing — re-run graft.Verify" >&2
  exit 2
}
python3 scripts/merge_gate_logs.py --expect "$DUMP/query_keys.json" \
  "$OUT" "$WORK/main.json" "$WORK/grind.json"
echo "workdir: $WORK"
python3 - "$OUT" <<'EOF'
import json, sys
r = json.load(open(sys.argv[1]))
rs = r["records"] if "records" in r else r
ok = sum(1 for v in rs.values() if v.get("hash_match"))
skip = [k for k, v in rs.items() if v.get("err", "") and str(v.get("err")).startswith("skipped")]
fail = [k for k, v in rs.items() if v.get("hash_match") is False]
rows_only = [k for k, v in rs.items() if v.get("err") == "no_oracle"]
print(f"{len(rs)} queries: {ok} hash-green, {len(rows_only)} rows-only, "
      f"{len(skip)} skips {skip}, {len(fail)} FAILS {fail}")
EOF
