"""VERDICT r4 #8 follow-up: the interleaved A/B (prof_r5_corridor_ab)
showed HEAD ~1.45x SLOWER than r3 on the corridor Slam2D in the same
session (r3 901.9/633.2/630.4 vs head 605.7/450.1) — a real regression,
not weather. Bisect it across the r4 commits, interleaved:

  75a8ace (r3 tag)  -> /tmp/r3repo
  bdf122f  per-visit prob clamp, 3D DT, escaped-count guards, .smd
  e67f1d8  batched GN kernel, MXU window gathers, graph sync, devprof
  1d3bed3  1-plane sq-domain dist gather; scan-lookup guard
  HEAD     (r5)     -> /root/repo

Run on the TPU: python prof_r5_corridor_bisect.py [rounds]
"""

import json
import os
import subprocess
import sys

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 2
CMD = [sys.executable, "examples/run_long_world.py", "--algos", "slam2d",
       "--steps", "3000", "--beams", "720"]

CONFIGS = [
    ("r3", "/tmp/r3repo"),
    ("bdf122f", "/tmp/bs_bdf122f"),
    ("e67f1d8", "/tmp/bs_e67f1d8"),
    ("1d3bed3", "/tmp/bs_1d3bed3"),
    ("head", "/root/repo"),
]


def run(cwd, tag):
    env = dict(os.environ)
    env["PYTHONPATH"] = cwd + ":/root/.axon_site"
    out = subprocess.run(CMD, cwd=cwd, env=env, capture_output=True,
                         text=True, timeout=2400)
    rows = [json.loads(l) for l in out.stdout.splitlines()
            if l.startswith("{")]
    if not rows:
        print(f"[{tag}] FAILED:\n{out.stdout[-500:]}\n{out.stderr[-1200:]}")
        return None
    r = rows[0]
    print(f"[{tag}] {r['scans_per_sec']} scans/s  ate {r.get('ate_m')}",
          flush=True)
    return r["scans_per_sec"]


def main():
    vals = {t: [] for t, _ in CONFIGS}
    for i in range(ROUNDS):
        for tag, cwd in CONFIGS:
            v = run(cwd, f"{tag} #{i}")
            if v:
                vals[tag].append(v)
    for tag, _ in CONFIGS:
        v = sorted(vals[tag])
        med = v[len(v) // 2] if v else float("nan")
        print(f"{tag}: runs {vals[tag]} median {med}")


if __name__ == "__main__":
    sys.exit(main())
