#!/bin/bash
# Round-4 artifact capture: runs the remaining VERDICT-r3 measurement items
# sequentially on the one real TPU chip (each step logs to /tmp/r4_*.log).
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site

echo "=== 1/5 serving bench (VERDICT #5) ==="
timeout 3600 python tools/serving_bench.py --out SERVING_r04.json \
  > /tmp/r4_serving.log 2>&1
echo "serving rc=$?"

echo "=== 2/5 overcommit vs full grant at full pool (VERDICT #3) ==="
timeout 3600 python bench.py --overcommit \
  > /tmp/r4_overcommit_4096.json 2> /tmp/r4_overcommit_4096.log
echo "oc4096 rc=$?"

echo "=== 3/5 full grant at 75% pool ==="
timeout 3600 python bench.py --pages 3072 \
  > /tmp/r4_fullgrant_3072.json 2> /tmp/r4_fullgrant_3072.log
echo "fg3072 rc=$?"

echo "=== 4/5 overcommit at 75% pool ==="
timeout 3600 python bench.py --pages 3072 --overcommit \
  > /tmp/r4_overcommit_3072.json 2> /tmp/r4_overcommit_3072.log
echo "oc3072 rc=$?"

echo "=== 5/5 backend matrix + gpt2s refresh (VERDICT #8) ==="
timeout 3600 python tools/backend_walltimes.py --out BACKENDS_r04.json \
  > /tmp/r4_backends.log 2>&1
echo "backends rc=$?"
timeout 3600 python bench.py --model gpt2s \
  > /tmp/r4_gpt2s.json 2> /tmp/r4_gpt2s.log
echo "gpt2s rc=$?"
echo "=== ALL DONE ==="
