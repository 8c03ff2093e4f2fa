#!/bin/bash
# Round-4 measurement pass B: dgrid kernel shootout, serving A/B after the
# fused-snapshot fix, overcommit with full-size warmup. Sequential on the
# one TPU chip; logs in /tmp/r4b_*.log.
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site

echo "=== 0/7 verify: e2e demo on TPU ==="
timeout 1200 python examples/demo_engine.py --backend both --n-items 32 \
  > /tmp/r4b_demo.log 2>&1
echo "demo rc=$?"

echo "=== 1/7 attend formulations (dgrid vs grouped vs dense) ==="
timeout 3600 python tools/attend_formulations.py --out /tmp/r4b_attend.json \
  > /tmp/r4b_attend.log 2>&1
echo "attend rc=$?"

echo "=== 2/7 gpt2s bench with dgrid ==="
timeout 3600 python bench.py --model gpt2s --attn-dgrid \
  > /tmp/r4b_gpt2s_dgrid.json 2> /tmp/r4b_gpt2s_dgrid.log
echo "gpt2s-dgrid rc=$?"

echo "=== 3/7 ref bench with dgrid ==="
timeout 3600 python bench.py --attn-dgrid \
  > /tmp/r4b_ref_dgrid.json 2> /tmp/r4b_ref_dgrid.log
echo "ref-dgrid rc=$?"

echo "=== 4/7 serving: pipelined (fused snapshot) ==="
timeout 3600 python tools/serving_bench.py --out /tmp/r4b_serving_pipe.json \
  > /tmp/r4b_serving_pipe.log 2>&1
echo "serving-pipe rc=$?"

echo "=== 5/7 serving: legacy chunked ==="
timeout 3600 python tools/serving_bench.py --chunked \
  --out /tmp/r4b_serving_chunked.json > /tmp/r4b_serving_chunked.log 2>&1
echo "serving-chunked rc=$?"

echo "=== 6/7 overcommit at full pool, full-size warmup ==="
timeout 3600 python bench.py --overcommit --warm-requests 2048 \
  > /tmp/r4b_oc4096.json 2> /tmp/r4b_oc4096.log
echo "oc4096 rc=$?"

echo "=== 7/7 overcommit at 75% pool, full-size warmup ==="
timeout 3600 python bench.py --pages 3072 --overcommit --warm-requests 2048 \
  > /tmp/r4b_oc3072.json 2> /tmp/r4b_oc3072.log
echo "oc3072 rc=$?"
echo "=== ALL DONE ==="
