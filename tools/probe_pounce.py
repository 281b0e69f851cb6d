#!/usr/bin/env python
"""Cross-session probe-then-bench: retry until a healthy axon session.

The r3 timing regression (TIMING_INTEGRITY_r03.md) is a per-session
lottery: the same day produced work-scaling probe ratios of 0.58, 0.72,
0.98 and 1.08 on some sessions and healthy clocks on others.  A single
end-of-round bench.py run therefore samples ONE ticket.  This driver buys
many: each attempt is a fresh subprocess (fresh tunnel session); the first
time bench.py publishes a non-stale record it is committed immediately as
BENCH_FRESH_r{N}.json, then the multichip tax bench runs on the same-day
code and its artifact is committed too.

Usage:  python tools/probe_pounce.py [--round 4] [--attempts 12]
        [--sleep 900] [--skip-multichip]

Exit 0 the moment a fresh record lands (or after the attempt budget).
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(timeout_s):
    """One fresh-session bench.py run; returns (record dict | None, tail)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{ROOT}:/root/.axon_site"
    try:
        p = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                           capture_output=True, text=True, timeout=timeout_s,
                           env=env, cwd=ROOT)
    except subprocess.TimeoutExpired:
        return None, "bench.py exceeded its subprocess timeout"
    for line in reversed(p.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line), p.stdout[-2000:]
            except ValueError:
                pass
    return None, (p.stdout + p.stderr)[-2000:]


def commit(paths, msg):
    subprocess.run(["git", "-C", ROOT, "add", "--"] + paths, check=False)
    subprocess.run(["git", "-C", ROOT, "commit", "-q", "-m", msg, "--"]
                   + paths, check=False)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=4)
    ap.add_argument("--attempts", type=int, default=12)
    ap.add_argument("--sleep", type=float, default=900.0)
    ap.add_argument("--bench-timeout", type=float, default=2400.0)
    ap.add_argument("--skip-multichip", action="store_true")
    args = ap.parse_args()

    log_path = os.path.join(ROOT, f"PROBE_POUNCE_r{args.round:02d}.jsonl")
    for attempt in range(1, args.attempts + 1):
        t0 = time.time()
        rec, tail = run_bench(args.bench_timeout)
        entry = {"attempt": attempt, "t": time.strftime("%F %T"),
                 "wall_s": round(time.time() - t0, 1), "record": rec}
        if rec is None:
            entry["tail"] = tail
        with open(log_path, "a") as f:
            f.write(json.dumps(entry) + "\n")
        print(json.dumps(entry), flush=True)

        if (rec is not None and not rec.get("stale")
                and rec.get("session_degraded")):
            # the slope concluded but measured a transfer-pathology
            # session (~0.1-1 s per dispatch), not the chain — record it
            # and keep hunting for a healthy session
            deg = os.path.join(ROOT,
                               f"BENCH_DEGRADED_r{args.round:02d}.jsonl")
            with open(deg, "a") as f:
                f.write(json.dumps(rec) + "\n")
            commit([os.path.basename(deg), os.path.basename(log_path)],
                   "Slope concluded on a transfer-degraded session "
                   f"({rec.get('value')}x apparent; keep hunting)")
            rec = None

        if rec is not None and not rec.get("stale"):
            fresh = os.path.join(ROOT, f"BENCH_FRESH_r{args.round:02d}.json")
            with open(fresh, "w") as f:
                json.dump({"cmd": "python bench.py (probe_pounce attempt "
                                  f"{attempt})", "parsed": rec}, f, indent=1)
                f.write("\n")
            commit([os.path.basename(fresh), os.path.basename(log_path)],
                   f"Fresh integrity-passing on-chip bench: "
                   f"{rec.get('value')}x real-time "
                   f"(method {rec.get('method')}, attempt {attempt})")
            env = dict(os.environ)
            env["PYTHONPATH"] = f"{ROOT}:/root/.axon_site"
            if not args.skip_multichip:
                mc = os.path.join(ROOT,
                                  f"MULTICHIP_BENCH_r{args.round:02d}.json")
                try:
                    p = subprocess.run(
                        [sys.executable,
                         os.path.join(ROOT, "tools", "bench_multichip.py"),
                         "--out", mc],
                        capture_output=True, text=True, timeout=3600,
                        env=env, cwd=ROOT)
                    print(p.stdout[-2000:], p.stderr[-1000:], flush=True)
                    if os.path.exists(mc):
                        commit([os.path.basename(mc)],
                               "Multichip tax bench on a healthy session")
                except subprocess.TimeoutExpired:
                    print("bench_multichip timed out", flush=True)
            # sustained (ingest-inclusive) — needs working D2H, which a
            # healthy probe strongly suggests; r3's artifact is a
            # runtime-blocked placeholder (BENCH_sustained_r03.json)
            sus = os.path.join(ROOT, f"BENCH_sustained_r{args.round:02d}"
                                     ".json")
            try:
                p = subprocess.run(
                    [sys.executable,
                     os.path.join(ROOT, "tools", "bench_sustained.py")],
                    capture_output=True, text=True, timeout=2400,
                    env=env, cwd=ROOT)
                lines = [ln for ln in p.stdout.splitlines()
                         if ln.strip().startswith("{")]
                if lines:
                    with open(sus, "w") as f:
                        f.write("\n".join(lines) + "\n")
                    commit([os.path.basename(sus)],
                           "Sustained ingest-inclusive bench on a healthy "
                           "session")
                else:
                    print("bench_sustained produced no records:",
                          (p.stdout + p.stderr)[-1500:], flush=True)
            except subprocess.TimeoutExpired:
                print("bench_sustained timed out", flush=True)
            return 0
        if attempt < args.attempts:
            time.sleep(args.sleep)
    print("no healthy session found within the attempt budget", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
