"""VERDICT r4 #8: interleaved one-session A/B of corridor Slam2D,
r3-tag (75a8ace, snapshot at /tmp/r3repo) vs current HEAD.

r3 measured 1002 scans/s on the 550 m corridor world, r4 measured 601 on
identical config — weather or regression? This alternates subprocess
runs A(r3) B(HEAD) x pairs in ONE session so tunnel weather hits both.

Run on the TPU: python prof_r5_corridor_ab.py [pairs]
"""

import json
import os
import subprocess
import sys

PAIRS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
CMD = [sys.executable, "examples/run_long_world.py", "--algos", "slam2d",
       "--steps", "3000", "--beams", "720"]


def run(cwd, tag):
    env = dict(os.environ)
    env["PYTHONPATH"] = cwd + ":/root/.axon_site"
    out = subprocess.run(CMD, cwd=cwd, env=env, capture_output=True,
                         text=True, timeout=2400)
    rows = [json.loads(l) for l in out.stdout.splitlines()
            if l.startswith("{")]
    if not rows:
        print(f"[{tag}] FAILED:\n{out.stdout[-500:]}\n{out.stderr[-1500:]}")
        return None
    r = rows[0]
    print(f"[{tag}] {r['scans_per_sec']} scans/s  ate {r.get('ate_m')}",
          flush=True)
    return r["scans_per_sec"]


def main():
    a_vals, b_vals = [], []
    for i in range(PAIRS):
        a = run("/tmp/r3repo", f"A r3 #{i}")
        b = run("/root/repo", f"B head #{i}")
        if a:
            a_vals.append(a)
        if b:
            b_vals.append(b)
    med = lambda v: sorted(v)[len(v) // 2] if v else float("nan")
    print(f"A(r3) runs: {a_vals} median {med(a_vals)}")
    print(f"B(head) runs: {b_vals} median {med(b_vals)}")


if __name__ == "__main__":
    sys.exit(main())
