#!/usr/bin/env bash
# Generate a vendored minimap2 all-vs-all PAF fixture on a machine with
# minimap2 installed (this build environment has no external aligners).
#
# The internal minimizer overlapper replaces minimap2
# (olc/OverlapLayoutConsensus.java:78-106); committing a real minimap2 ava
# PAF for a small read set lets tests/test_longreads.py's fixture-activated
# comparison drive BOTH overlap sources through the same -pafin bridge and
# assert the internal engine's assembly is equivalent-or-better.
#
# Usage:
#   tools/make_minimap2_paf_fixture.sh <name> reads.fa[.gz] [truth.fa]
#
# Writes tests/golden/minimap2_fixtures/<name>/{reads.fa.gz,minimap2.ava.paf,
# meta.json[,truth.fa]}.  Keep the read set SMALL (hundreds of reads): the
# fixture is committed to git.  The PAF must be over the reads rnabloom-tpu
# will correct, so the comparison test regenerates overlaps on CORRECTED
# reads via -paf first and only uses this vendored PAF when read names
# match; -long corrected reads are named lr.<i> in input order.
set -euo pipefail

REPO_ROOT="$(cd "$(dirname "$0")/.." && pwd)"
FIXTURE_ROOT="${REPO_ROOT}/tests/golden/minimap2_fixtures"

name="${1:?usage: make_minimap2_paf_fixture.sh <name> reads.fa[.gz] [truth.fa]}"
reads="${2:?need a reads FASTA}"
truth="${3:-}"

command -v minimap2 >/dev/null || { echo "minimap2 not on PATH" >&2; exit 3; }

fixture="${FIXTURE_ROOT}/${name}"
mkdir -p "$fixture"
case "$reads" in
*.gz) cp "$reads" "$fixture/reads.fa.gz" ;;
*) gzip -c "$reads" > "$fixture/reads.fa.gz" ;;
esac
[ -n "$truth" ] && cp "$truth" "$fixture/truth.fa"

# ava-ont preset mirrors the reference's long-read overlap invocation
# (OverlapLayoutConsensus.java minimap2 args)
minimap2 -x ava-ont -c "$fixture/reads.fa.gz" "$fixture/reads.fa.gz" \
    > "$fixture/minimap2.ava.paf"

cat > "$fixture/meta.json" <<EOF
{
  "minimap2_version": "$(minimap2 --version)",
  "preset": "ava-ont",
  "n_records": $(wc -l < "$fixture/minimap2.ava.paf")
}
EOF

echo ">> fixture written to ${fixture}"
echo ">> commit it and run: python -m pytest tests/test_longreads.py -k minimap2 -v"
