"""Corridor knob A/Bs (r5): interleaved same-session pairs on the 550 m
world.

  slam2d: IRIS_ESC_HARVEST=1 (default) vs 0 — the bisect flagged the
      per-re-org escaped-counter harvest (bdf122f) as the likely corridor
      regression (r3 mean 716 vs post-bdf122f cluster ~580 over 5 runs).
  pf_slam: IRIS_PF_SCROLL=1 (deadline band re-orgs) vs 0 (full).

Run on the TPU: python prof_r5_corridor_knobs.py [pairs] [algos]
"""

import json
import os
import subprocess
import sys

PAIRS = int(sys.argv[1]) if len(sys.argv) > 1 else 2
ALGOS = sys.argv[2].split(",") if len(sys.argv) > 2 else ["slam2d",
                                                          "pf_slam"]
KNOB = {"slam2d": "IRIS_ESC_HARVEST", "pf_slam": "IRIS_PF_SCROLL"}
# for slam2d the INTERESTING variant is harvest OFF; for pf the default
# scroll ON vs OFF
VARIANTS = {"slam2d": [("harvest", "1"), ("noharvest", "0")],
            "pf_slam": [("scroll", "1"), ("noscroll", "0")]}


def run(algo, tag, env_kv):
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:/root/.axon_site"
    env[env_kv[0]] = env_kv[1]
    cmd = [sys.executable, "examples/run_long_world.py", "--algos", algo,
           "--steps", "3000", "--beams", "720"]
    out = subprocess.run(cmd, cwd="/root/repo", env=env,
                         capture_output=True, text=True, timeout=2400)
    rows = [json.loads(l) for l in out.stdout.splitlines()
            if l.startswith("{")]
    if not rows:
        print(f"[{tag}] FAILED:\n{out.stdout[-400:]}\n{out.stderr[-1200:]}")
        return None
    r = rows[0]
    print(f"[{tag}] {r['scans_per_sec']} scans/s  "
          f"err {r.get('ate_m', r.get('final_err_m'))}", flush=True)
    return r["scans_per_sec"]


def main():
    for algo in ALGOS:
        vals = {}
        for i in range(PAIRS):
            for name, v in VARIANTS[algo]:
                r = run(algo, f"{algo} {name} #{i}", (KNOB[algo], v))
                vals.setdefault(name, []).append(r)
        print(f"== {algo}: {vals}")


if __name__ == "__main__":
    sys.exit(main())
