#!/bin/bash
# Round-4 measurement pass C: dgrid hardware validation (post Mosaic fix),
# overcommit with full-size warmup, serving provisioned-capacity tail
# points. Sequential on the one TPU chip; logs in /tmp/r4c_*.log.
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site

echo "=== 0/9 dgrid hardware probe (fail fast) ==="
timeout 1800 python tools/dgrid_probe.py > /tmp/r4c_probe.log 2>&1
rc=$?
echo "probe rc=$rc"
if [ $rc -eq 0 ]; then
  echo "=== 1/9 attend formulations (dgrid vs grouped vs dense) ==="
  timeout 3600 python tools/attend_formulations.py --out /tmp/r4c_attend.json \
    > /tmp/r4c_attend.log 2>&1
  echo "attend rc=$?"

  echo "=== 2/9 gpt2s bench with dgrid ==="
  timeout 3600 python bench.py --model gpt2s --attn-dgrid \
    > /tmp/r4c_gpt2s_dgrid.json 2> /tmp/r4c_gpt2s_dgrid.log
  echo "gpt2s-dgrid rc=$?"

  echo "=== 3/9 ref bench with dgrid ==="
  timeout 3600 python bench.py --attn-dgrid \
    > /tmp/r4c_ref_dgrid.json 2> /tmp/r4c_ref_dgrid.log
  echo "ref-dgrid rc=$?"
else
  echo "probe FAILED — skipping dgrid bench steps 1-3"
fi

echo "=== 4/9 overcommit at full pool, full-size warmup ==="
timeout 3600 python bench.py --overcommit --warm-requests 2048 \
  > /tmp/r4c_oc4096.json 2> /tmp/r4c_oc4096.log
echo "oc4096 rc=$?"

echo "=== 5/9 overcommit at 75% pool, full-size warmup ==="
timeout 3600 python bench.py --pages 3072 --overcommit --warm-requests 2048 \
  > /tmp/r4c_oc3072.json 2> /tmp/r4c_oc3072.log
echo "oc3072 rc=$?"

echo "=== 6/9 full grant at 75% pool, full-size warmup (fair baseline) ==="
timeout 3600 python bench.py --pages 3072 --warm-requests 2048 \
  > /tmp/r4c_fg3072.json 2> /tmp/r4c_fg3072.log
echo "fg3072 rc=$?"

echo "=== 7/9 serving provisioned capacity (1024 req on 1024 slots), pipelined ==="
timeout 3600 python tools/serving_bench.py --requests 1024 \
  --out /tmp/r4c_serving_pipe_prov.json > /tmp/r4c_serving_pipe_prov.log 2>&1
echo "serving-pipe-prov rc=$?"

echo "=== 8/9 serving provisioned capacity, chunked ==="
timeout 3600 python tools/serving_bench.py --requests 1024 --chunked \
  --out /tmp/r4c_serving_chunked_prov.json \
  > /tmp/r4c_serving_chunked_prov.log 2>&1
echo "serving-chunked-prov rc=$?"

echo "=== 9/9 full-grant reference re-run (session control point) ==="
timeout 3600 python bench.py > /tmp/r4c_ref.json 2> /tmp/r4c_ref.log
echo "ref rc=$?"
echo "=== ALL DONE ==="
