#!/usr/bin/env bash
# Generate a vendored reference-output parity fixture on ANY machine with
# Java 11+ and network access (this build environment has neither).
#
# Produces tests/golden/reference_fixtures/<name>/ in the layout
# tests/golden/reference_fixtures/README.md documents; committing the
# directory activates tests/test_reference_parity.py automatically and
# flips bench.py's "reference_parity" line to "fixtures present".
#
# Usage:
#   tools/make_reference_fixture.sh pe_default   reads_1.fq.gz reads_2.fq.gz
#   tools/make_reference_fixture.sh se_single    reads.fq.gz
#   tools/make_reference_fixture.sh long_ont     reads.fa.gz
#
# The fixture kind is inferred from the name prefix (pe_/se_/long_) —
# these map to BASELINE.md configs 1, 2 and 5.  Inputs should be SMALL
# (a few thousand reads): fixtures are committed to git.
set -euo pipefail

RNABLOOM_VERSION="${RNABLOOM_VERSION:-v2.0.1}"
RNABLOOM_URL="https://github.com/bcgsc/RNA-Bloom/releases/download/${RNABLOOM_VERSION}/rnabloom_${RNABLOOM_VERSION}.tar.gz"
REPO_ROOT="$(cd "$(dirname "$0")/.." && pwd)"
FIXTURE_ROOT="${REPO_ROOT}/tests/golden/reference_fixtures"

name="${1:?usage: make_reference_fixture.sh <pe_*|se_*|long_*> <reads...>}"
shift
[ $# -ge 1 ] || { echo "need at least one reads file" >&2; exit 2; }

workdir="$(mktemp -d)"
trap 'rm -rf "$workdir"' EXIT

jar="${RNABLOOM_JAR:-}"
if [ -z "$jar" ]; then
    echo ">> downloading RNA-Bloom ${RNABLOOM_VERSION}"
    curl -fsSL "$RNABLOOM_URL" -o "$workdir/rnabloom.tar.gz"
    tar xzf "$workdir/rnabloom.tar.gz" -C "$workdir"
    jar="$(find "$workdir" -name 'RNA-Bloom.jar' | head -1)"
fi
[ -f "$jar" ] || { echo "RNA-Bloom.jar not found" >&2; exit 3; }

fixture="${FIXTURE_ROOT}/${name}"
mkdir -p "$fixture"
outdir="$workdir/out"

# -t 1 everywhere: single-threaded runs are deterministic up to MiniFloat's
# Math.random(), allowing min_jaccard close to 1.0 (see fixture README).
case "$name" in
pe_*)
    left="$1"; right="$2"
    cp "$left" "$fixture/reads_1.fq.gz"
    cp "$right" "$fixture/reads_2.fq.gz"
    cmd=(java -jar "$jar" -left "$fixture/reads_1.fq.gz" \
         -right "$fixture/reads_2.fq.gz" -revcomp-right -t 1 -outdir "$outdir")
    inputs='{"left": "reads_1.fq.gz", "right": "reads_2.fq.gz", "revcomp_right": true}'
    mode=pe
    ;;
se_*)
    cp "$1" "$fixture/reads.fq.gz"
    cmd=(java -jar "$jar" -sef "$fixture/reads.fq.gz" -t 1 -outdir "$outdir")
    inputs='{"sef": ["reads.fq.gz"]}'
    mode=se
    ;;
long_*)
    cp "$1" "$fixture/reads.fa.gz"
    cmd=(java -jar "$jar" -long "$fixture/reads.fa.gz" -t 1 -outdir "$outdir")
    inputs='{"long": "reads.fa.gz"}'
    mode=long
    ;;
*)
    echo "name must start with pe_/se_/long_" >&2; exit 2
    ;;
esac

echo ">> ${cmd[*]}"
"${cmd[@]}"

src="$outdir/rnabloom.transcripts.fa"
[ -f "$src" ] || src="$(find "$outdir" -name '*.transcripts.fa' | head -1)"
[ -f "$src" ] || { echo "reference produced no transcripts.fa" >&2; exit 4; }
cp "$src" "$fixture/expected.transcripts.fa"

cat > "$fixture/config.json" <<EOF
{
  "mode": "${mode}",
  "reference_version": "${RNABLOOM_VERSION}",
  "reference_command": "${cmd[*]}",
  "inputs": ${inputs},
  "params": {"k": 25, "total_mem_bytes": 104857600, "min_transcript_length": 200},
  "min_jaccard": 0.90
}
EOF

echo ">> fixture written to ${fixture}"
echo ">> commit it and run: python -m pytest tests/test_reference_parity.py -v"
