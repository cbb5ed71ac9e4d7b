#!/bin/bash
# Capture .explain("formatted") output for a list of registered queries
# into plans/r20/<query>_<tag>.txt via graft.PlanAudit (one sbt session).
# Usage: tools/capture_plans.sh <before|after> q_a q_b ...
set -e
tag="$1"; shift
mkdir -p plans/r20
out=$(mktemp)
sbt -batch "runMain graft.PlanAudit /root/testdata/sf0.001 $*" > "$out" 2>&1
python3 - "$out" "$tag" <<'EOF'
import re, sys
text = open(sys.argv[1]).read()
tag = sys.argv[2]
blocks = re.split(r"^========== (\S+) ==========$", text, flags=re.M)
# blocks[0] is preamble; then alternating name, body
n = 0
for i in range(1, len(blocks) - 1, 2):
    name, body = blocks[i], blocks[i + 1]
    # strip sbt log prefixes and trailing sbt epilogue lines
    lines = [l for l in body.splitlines()
             if not l.startswith("[info] [") and not l.startswith("[success]")
             and not l.startswith("[error]")]
    open(f"plans/r20/{name}_{tag}.txt", "w").write("\n".join(lines).strip() + "\n")
    n += 1
print(f"wrote {n} plan files (tag={tag})")
EOF
rm -f "$out"
