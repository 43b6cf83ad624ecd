#!/bin/bash
# Round-16 item 1: the 10x-documents slope audit (the EmbCorpus pattern
# applied to the text/dedup axis). Builds target/slope_doc (50,000 docs,
# all other tables symlinked to sf0.1) and runs graft.Slope over every
# documents-reading query except the documented brute-force truth leg
# (q_dedup_eval: its P/R truth side is pair-quadratic BY DESIGN and
# already adjudicated in SLOPE.md; at 50k docs it alone would dominate
# the wall clock without informing the bounded-path audit).
set -e
cd "$(dirname "$0")/.."
sbt -batch "runMain graft.DocCorpus"
DOCQ=$(python3 - <<'EOF'
import json, re
o=json.load(open('/tmp/verify_r16e/oracle_sql.json'))
doc=[q for q,s in sorted(o.items()) if re.search(r'\bdocuments\b', s)]
doc=[q for q in doc if q != 'q_dedup_eval']
print(','.join(doc))
EOF
)
SPARK_GRAFT_SF_SMALL=/root/testdata/sf0.1 \
SPARK_GRAFT_SF_BIG=target/slope_doc \
SPARK_GRAFT_SLOPE_OUT=slope_doc.json \
SPARK_GRAFT_ONLY="$DOCQ" \
sbt -batch "runMain graft.Slope"
