#!/bin/bash
# r11 round-close pipeline — SERIAL (single local JVM at a time).
set -x
cd /root/repo
mkdir -p /tmp/r11

echo "== step 1: longfuzz 300x new targets ==" > /tmp/r11/status
python scripts/longfuzz.py 300 windowjoin,setopcte \
  > /tmp/r11/fuzz_new.log 2>&1 || { echo "FUZZ FAILED" >> /tmp/r11/status; exit 1; }

echo "== step 2: canonical bench sf0.1 ==" >> /tmp/r11/status
python bench.py > /tmp/r11/bench_sf01.log 2>&1 \
  || { echo "BENCH sf0.1 FAILED" >> /tmp/r11/status; exit 1; }
cp BENCH_full.json /tmp/r11/BENCH_full_sf01.json

echo "== step 3: bench at sf1 ==" >> /tmp/r11/status
SPARK_GRAFT_SF_DIR=/root/repo/.scale_tmp/sf1 python bench.py \
  > /tmp/r11/bench_sf1.log 2>&1 \
  || { echo "BENCH sf1 FAILED" >> /tmp/r11/status; exit 1; }
cp BENCH_full.json BENCH_sf1_r11.json
cp /tmp/r11/BENCH_full_sf01.json BENCH_full.json

echo "== step 4: sf3 build + top-10 bench ==" >> /tmp/r11/status
python scripts/sf1_bench.py --k=30 --rebuild \
  --entries=dedup_minhash_lsh,dsl_tpch_q18_large_orders,stream_enrich_dim,dsl_window_rank_running,dsl_tpch_q5_local_supplier_volume,temporal_asof_join,stream_sessionize,pipeline_line_dedup,dsl_window_range_frame,dsl_tpch_q3_shipping_priority \
  > /tmp/r11/bench_sf3.log 2>&1 \
  || { echo "BENCH sf3 FAILED" >> /tmp/r11/status; exit 1; }
tail -1 /tmp/r11/bench_sf3.log > BENCH_sf3_r11.json

echo "== step 5: full pytest ==" >> /tmp/r11/status
python -m pytest tests/ -q > /tmp/r11/pytest.log 2>&1 \
  || { echo "PYTEST FAILED" >> /tmp/r11/status; exit 1; }

echo "== step 6: strict exactcheck sf0.01 ==" >> /tmp/r11/status
python scripts/exactcheck.py > /tmp/r11/exact_sf001.log 2>&1 \
  || { echo "EXACT sf0.01 FAILED" >> /tmp/r11/status; exit 1; }

echo "== step 7: strict exactcheck sf0.1 ==" >> /tmp/r11/status
python scripts/exactcheck.py /root/testdata/sf0.1 > /tmp/r11/exact_sf01.log 2>&1 \
  || { echo "EXACT sf0.1 FAILED" >> /tmp/r11/status; exit 1; }

echo "== ALL STEPS GREEN ==" >> /tmp/r11/status
