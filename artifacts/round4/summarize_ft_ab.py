"""Summarize the fast-tail convergence A/B.

Same shape as summarize_bwd_ab.py, but base = the benched tier
(precision=high, bwd_precision=default) and fast = that tier +
fast_tail (decoder + FuseNet in bf16/default-MXU during training).
Reads runs/ft_ab_{base,fast}/history.csv, writes
artifacts/round4/ft_ab/summary.json.
"""

import csv
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def read_history(tag):
    path = os.path.join(REPO, "runs", f"ft_ab_{tag}", "history.csv")
    with open(path) as f:
        rows = list(csv.DictReader(f))
    return {int(r["step"]): {k: float(v) for k, v in r.items()
                             if k != "step"} for r in rows}


def main():
    base, fast = read_history("base"), read_history("fast")
    steps = sorted(set(base) & set(fast))
    losses = [k for k in base[steps[0]]
              if k != "seconds" and base[steps[0]].get(k, 0.0) != 0.0]
    out = {
        "steps": steps,
        "trajectories": {
            k: {"base": [base[s][k] for s in steps],
                "fast": [fast[s][k] for s in steps]} for k in losses},
        "final_rel_gap": {
            k: (fast[steps[-1]][k] - base[steps[-1]][k])
            / max(abs(base[steps[-1]][k]), 1e-9) for k in losses},
        "seconds_to_final": {"base": base[steps[-1]]["seconds"],
                             "fast": fast[steps[-1]]["seconds"]},
    }
    os.makedirs(os.path.join(REPO, "artifacts/round4/ft_ab"), exist_ok=True)
    with open(os.path.join(REPO, "artifacts/round4/ft_ab/summary.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"final_rel_gap": out["final_rel_gap"],
                      "seconds_to_final": out["seconds_to_final"]},
                     indent=1))


if __name__ == "__main__":
    main()
