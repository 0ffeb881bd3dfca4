#!/bin/bash
cd /root/repo
log=/tmp/measure_r2b.log
: > $log
simple() {
  name=$1; script=$2; shift 2
  echo "### $name $(date +%H:%M:%S)" >> $log
  timeout 2000 env "$@" python $script >> $log 2>/tmp/measure_r2b.err
  rc=$?
  echo "rc=$rc $(date +%H:%M:%S)" >> $log
  if [ $rc -ne 0 ]; then sleep 600; fi
}
simple pf_while_solo bench_pf.py
simple pf_chunk bench_pf.py IRIS_PF_BENCH_CHUNK=1
simple loc_chunk bench_loc.py
simple loc_seq bench_loc.py IRIS_LOC_BENCH_SEQ=1
simple slam_final bench.py IRIS_LAMA_BENCH_CHILD=ambient
simple graph bench_graph.py
simple pgo bench_pgo.py
echo DONE >> $log
