#!/bin/bash
# Round-4 pass E: open-loop serving with the PIPELINED loop (host-paced,
# per-burst admission — the regime hypothesis from pass D's chunked
# open-loop latency inversion), plus the gpt2s dgrid-default artifact
# with a same-day grouped control.
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site

echo "=== 1/5 serving open-loop, pipelined, 1900 req/s ==="
timeout 3600 python tools/serving_bench.py --pipelined --arrival-rate 1900 \
  --out /tmp/r4e_serv_pl1900.json > /tmp/r4e_serv_pl1900.log 2>&1
echo "pl1900 rc=$?"

echo "=== 2/5 serving open-loop, pipelined, 1500 req/s ==="
timeout 3600 python tools/serving_bench.py --pipelined --arrival-rate 1500 \
  --out /tmp/r4e_serv_pl1500.json > /tmp/r4e_serv_pl1500.log 2>&1
echo "pl1500 rc=$?"

echo "=== 3/5 serving open-loop, pipelined, 2200 req/s (~210k offered) ==="
timeout 3600 python tools/serving_bench.py --pipelined --arrival-rate 2200 \
  --out /tmp/r4e_serv_pl2200.json > /tmp/r4e_serv_pl2200.log 2>&1
echo "pl2200 rc=$?"

echo "=== 4/5 gpt2s bench, dgrid default ==="
timeout 3600 python bench.py --model gpt2s \
  > /tmp/r4e_gpt2s_dgrid.json 2> /tmp/r4e_gpt2s_dgrid.log
echo "gpt2s-dgrid rc=$?"

echo "=== 5/5 gpt2s bench, grouped control ==="
timeout 3600 python bench.py --model gpt2s --no-attn-dgrid \
  > /tmp/r4e_gpt2s_grouped.json 2> /tmp/r4e_gpt2s_grouped.log
echo "gpt2s-grouped rc=$?"
echo "=== ALL DONE ==="
