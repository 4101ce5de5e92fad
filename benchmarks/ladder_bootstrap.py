"""Paired bootstrap for eval-ladder head-to-heads (VERDICT r4 item 3).

Reads the JSON lines `examples/eval_ladder.py` prints (one per algo,
with `per_seed` arrays over a COMMON seed list), and reports for each
algo pair: mean difference, 95% bootstrap CI of the difference (paired
resampling over seeds), win rate, and the one-sided sign-flip p-value.

Usage:
  python benchmarks/ladder_bootstrap.py /tmp/dladder30_*.log \
      --pairs PPO:Planner PPO:A*
"""

import argparse
import json
import sys

import numpy as np


def load(paths):
    rows = {}
    for p in paths:
        for line in open(p):
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "algo" in d and "per_seed" in d:
                rows[d["algo"]] = np.asarray(d["per_seed"], float)
    return rows


def paired_bootstrap(a, b, n_boot=100_000, seed=0):
    """a, b: per-seed scores on the SAME seeds. Returns dict with the
    mean difference a-b, its bootstrap 95% CI, win rate, and the
    one-sided p-value that mean(a-b) <= 0 (sign-flip permutation)."""
    rng = np.random.default_rng(seed)
    d = a - b
    n = len(d)
    idx = rng.integers(n, size=(n_boot, n))
    boots = d[idx].mean(axis=1)
    lo, hi = np.percentile(boots, [2.5, 97.5])
    # sign-flip permutation test of H0: symmetric around 0
    flips = rng.choice([-1.0, 1.0], size=(n_boot, n))
    perm = (d * flips).mean(axis=1)
    p = float((perm >= d.mean()).mean())
    return {
        "n": n,
        "mean_diff": round(float(d.mean()), 4),
        "ci95": [round(float(lo), 4), round(float(hi), 4)],
        "win_rate": round(float((d > 0).mean()), 3),
        "p_one_sided": round(p, 5),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logs", nargs="+")
    ap.add_argument("--pairs", nargs="+", default=["PPO:Planner", "PPO:A*"])
    args = ap.parse_args()
    rows = load(args.logs)
    for name, v in sorted(rows.items()):
        print(json.dumps({"algo": name, "n": len(v),
                          "mean": round(float(v.mean()), 4),
                          "std": round(float(v.std(ddof=1)), 4)}))
    for pair in args.pairs:
        a_name, b_name = pair.split(":")
        if a_name not in rows or b_name not in rows:
            print(f"# skip {pair}: missing algo", file=sys.stderr)
            continue
        a, b = rows[a_name], rows[b_name]
        if len(a) != len(b):
            print(f"# skip {pair}: unequal seed counts", file=sys.stderr)
            continue
        out = {"pair": f"{a_name} - {b_name}"}
        out.update(paired_bootstrap(a, b))
        print(json.dumps(out))


if __name__ == "__main__":
    main()
