"""Interleaved A/B of IRIS_IRLS_MODE on the office Slam2D bench.

Motivation (docs/BUDGET.md r5): the office Slam2D replay is device-bound
in the per-scan IRLS while loops (~0.9 ms/scan inside the 16-unroll vs
0.37 ms for a converged single step) — the per-trip loop-boundary
latency of the fused-eval while body. "unroll<k>" chains k cond-guarded
steps per trip (bit-identical results, tests/test_solver.py), cutting
trip boundaries ~k-fold at median 3 iterations.

Protocol: subprocess-per-config (the mode is read at trace time and the
program factories are lru-cached, so an in-process flip would silently
reuse the old executable), interleaved twice to ride out tunnel weather.
"""

import json
import os
import subprocess
import sys

MODES = ["while", "unroll2", "unroll4"]
ROUNDS = 2

results = {m: [] for m in MODES}
for r in range(ROUNDS):
    for m in MODES:
        env = dict(os.environ, IRIS_IRLS_MODE=m)
        out = subprocess.run([sys.executable, "bench.py"], env=env,
                             capture_output=True, text=True, timeout=2400)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        row = json.loads(line[-1]) if line else {"value": None,
                                                 "err": out.stderr[-400:]}
        results[m].append(row)
        print(f"[round {r}] {m}: {row.get('value')} "
              f"(reps {row.get('reps')})", flush=True)

print(json.dumps({m: [r.get("value") for r in v]
                  for m, v in results.items()}))
