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


def prior_best() -> dict:
    """Best fps and best (lowest) train ms across committed BENCH_r*.json."""
    best = {"fps": None, "fps_round": None,
            "train_ms": None, "train_ms_round": None}
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        try:
            with open(path) as f:
                rec = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        parsed = rec.get("parsed") or {}
        rnd = os.path.basename(path)
        fps = parsed.get("value")
        if isinstance(fps, (int, float)) and (
                best["fps"] is None or fps > best["fps"]):
            best["fps"], best["fps_round"] = float(fps), rnd
        tms = parsed.get("train_ms_per_step")
        if isinstance(tms, (int, float)) and (
                best["train_ms"] is None or tms < best["train_ms"]):
            best["train_ms"], best["train_ms_round"] = float(tms), rnd
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
    fps, tms = rec.get("value"), rec.get("train_ms_per_step")
    failures = []
    if best["fps"] is not None and isinstance(fps, (int, float)):
        floor = best["fps"] * (1 - args.tolerance)
        verdict = "OK" if fps >= floor else "REGRESSION"
        print(f"bench_gate: inference {fps:.1f} fps vs prior best "
              f"{best['fps']:.1f} ({best['fps_round']}), floor "
              f"{floor:.1f} -> {verdict}")
        if fps < floor:
            failures.append("inference fps")
    if best["train_ms"] is not None and isinstance(tms, (int, float)):
        ceil = best["train_ms"] * (1 + args.tolerance)
        verdict = "OK" if tms <= ceil else "REGRESSION"
        print(f"bench_gate: train {tms:.1f} ms/step vs prior best "
              f"{best['train_ms']:.1f} ({best['train_ms_round']}), ceiling "
              f"{ceil:.1f} -> {verdict}")
        if tms > ceil:
            failures.append("train ms/step")
    if failures:
        print(f"bench_gate: FAIL — do not ship: {', '.join(failures)}")
        return 1
    print("bench_gate: PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
