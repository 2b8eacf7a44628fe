"""Bench regression gate: refuse to ship a snapshot slower than the last.

Round 3 ended with a driver-verified regression (633 -> 405 fps, 708 ->
827 ms/step) that no check caught because nothing gated a snapshot on
the bench (VERDICT.md round 3, Weak #1 / Next #1). This script is that
gate:

    python bench_gate.py                # runs bench.py, then compares
    python bench_gate.py --from-log F   # compare a saved bench log/JSON

It parses the one-line bench JSON, finds the strongest prior round in
BENCH_r*.json (max fps / min train ms across rounds, so a transiently
bad round can't lower the bar), and exits nonzero if either headline
number is worse than the prior best beyond tolerance (3% — tunnel /
clock jitter measured across rounds is ~1%).

Run this before every end-of-round commit.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
TOL = 0.03


# gated metrics: (bench-JSON key, direction, label). Pose entered the
# bench JSON at r04; rounds without a key simply don't contribute a bar,
# so adding metrics never invalidates old BENCH files.
GATED = [
    ("value", "max", "inference fps"),
    ("train_ms_per_step", "min", "train ms/step"),
    ("pose_fps", "max", "pose inference fps"),
    ("pose_train_ms_per_step", "min", "pose train ms/step"),
]


def prior_best() -> dict:
    """Best value per gated metric across committed BENCH_r*.json
    (max fps / min train ms across rounds, so a transiently bad round
    can't lower the bar)."""
    best = {key: (None, None) for key, _, _ in GATED}
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        try:
            with open(path) as f:
                rec = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        parsed = rec.get("parsed") or {}
        rnd = os.path.basename(path)
        for key, direction, _ in GATED:
            val = parsed.get(key)
            if not isinstance(val, (int, float)):
                continue
            cur = best[key][0]
            better = (cur is None or
                      (val > cur if direction == "max" else val < cur))
            if better:
                best[key] = (float(val), rnd)
    return best


def extract_record(text: str) -> dict:
    """Bench record from a bench.py log or a driver BENCH_r*.json."""
    try:
        whole = json.loads(text)
    except json.JSONDecodeError:
        whole = None
    if isinstance(whole, dict):
        if isinstance(whole.get("parsed"), dict) and \
                "metric" in whole["parsed"]:
            return whole["parsed"]
        if "metric" in whole:
            return whole
        text = whole.get("tail", text)  # driver wrapper without 'parsed'
    rec = None
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                # logs may interleave; try the embedded object
                m = re.search(r"\{.*\}", line)
                if m:
                    try:
                        rec = json.loads(m.group(0))
                    except json.JSONDecodeError:
                        pass
    if rec is None:
        raise SystemExit("bench_gate: no bench JSON line found")
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--from-log", default=None,
                    help="parse an existing bench log instead of running")
    ap.add_argument("--tolerance", type=float, default=TOL)
    args = ap.parse_args()

    if args.from_log:
        with open(args.from_log) as f:
            rec = extract_record(f.read())
    else:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, timeout=3600)
        sys.stderr.write(out.stderr)
        if out.returncode != 0:
            print(f"bench_gate: FAIL — bench.py rc={out.returncode}")
            return 2
        rec = extract_record(out.stdout)

    best = prior_best()
    failures = []
    for key, direction, label in GATED:
        prior, prior_round = best[key]
        val = rec.get(key)
        if prior is None or not isinstance(val, (int, float)):
            continue
        if direction == "max":
            bar = prior * (1 - args.tolerance)
            ok = val >= bar
            bar_name = "floor"
        else:
            bar = prior * (1 + args.tolerance)
            ok = val <= bar
            bar_name = "ceiling"
        verdict = "OK" if ok else "REGRESSION"
        print(f"bench_gate: {label} {val:.1f} vs prior best "
              f"{prior:.1f} ({prior_round}), {bar_name} {bar:.1f} "
              f"-> {verdict}")
        if not ok:
            failures.append(label)
    if failures:
        print(f"bench_gate: FAIL — do not ship: {', '.join(failures)}")
        return 1
    print("bench_gate: PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
