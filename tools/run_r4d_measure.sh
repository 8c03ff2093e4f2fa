#!/bin/bash
# Round-4 measurement pass D: same-session dgrid A/B, open-loop serving
# tail points, ref rounds-32 stretch, attend-table completion.
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site

echo "=== 1/6 dgrid A/B (gpt2s, same session, lens 32/72/112) ==="
timeout 5400 python tools/dgrid_ab.py --out /tmp/r4d_dgrid_ab.json \
  > /tmp/r4d_dgrid_ab.log 2>&1
echo "dgrid_ab rc=$?"

echo "=== 2/6 serving open-loop, chunked, 1900 req/s (~181k offered) ==="
timeout 3600 python tools/serving_bench.py --arrival-rate 1900 \
  --out /tmp/r4d_serv_ol1900.json > /tmp/r4d_serv_ol1900.log 2>&1
echo "ol1900 rc=$?"

echo "=== 3/6 serving open-loop, chunked, 1500 req/s (~143k offered) ==="
timeout 3600 python tools/serving_bench.py --arrival-rate 1500 \
  --out /tmp/r4d_serv_ol1500.json > /tmp/r4d_serv_ol1500.log 2>&1
echo "ol1500 rc=$?"

echo "=== 4/6 ref bench rounds=32 subbursts=4 (same workload, longer bursts) ==="
timeout 3600 python bench.py --rounds 32 --subbursts 4 \
  > /tmp/r4d_ref_r32s4.json 2> /tmp/r4d_ref_r32s4.log
echo "r32s4 rc=$?"

echo "=== 5/6 ref bench rounds=32 subbursts=2 ==="
timeout 3600 python bench.py --rounds 32 --subbursts 2 \
  > /tmp/r4d_ref_r32s2.json 2> /tmp/r4d_ref_r32s2.log
echo "r32s2 rc=$?"

echo "=== 6/6 attend formulations, remaining lens (88,120) ==="
timeout 3600 python tools/attend_formulations.py --lens 88,120 \
  --out /tmp/r4d_attend.json > /tmp/r4d_attend.log 2>&1
echo "attend rc=$?"
echo "=== ALL DONE ==="
