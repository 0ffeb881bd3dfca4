#!/bin/bash
# Sequential TPU measurement batch (round 2). One JSON line per run.
cd /root/repo
log=/tmp/measure_r2.log
: > $log
simple() {
  name=$1; script=$2; shift 2
  echo "### $name $(date +%H:%M:%S)" >> $log
  timeout 2000 env "$@" python $script >> $log 2>/tmp/measure_r2.err
  rc=$?
  echo "rc=$rc $(date +%H:%M:%S)" >> $log
  # a timed-out (wedged) attempt leaves the axon lease claimed for
  # ~10-20 min; cool down before the next run instead of cascading
  if [ $rc -ne 0 ]; then sleep 600; fi
}
simple pf_while bench_pf.py
simple pf_unroll2 bench_pf.py IRIS_IRLS_MODE=unroll2
simple pf_scan bench_pf.py IRIS_IRLS_MODE=scan
simple pf_chunk bench_pf.py IRIS_PF_BENCH_CHUNK=1
simple loc_chunk bench_loc.py
simple loc_seq bench_loc.py IRIS_LOC_BENCH_SEQ=1
simple slam_final bench.py IRIS_LAMA_BENCH_CHILD=ambient
simple graph bench_graph.py
simple pgo bench_pgo.py
echo DONE >> $log
