#!/usr/bin/env python
"""Print a leaderboard from evaluation summary CSVs.

Lightweight counterpart of the reference's gradio leaderboard
(scripts/experiment_leaderboard.py): aggregates one or more summary.csv files
into a single ranked table on stdout.
"""

import argparse
import csv
from collections import defaultdict


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("csvs", nargs="+", help="summary.csv paths")
    parser.add_argument("--metric", default="probe.test_accuracy")
    args = parser.parse_args()

    rows = []
    for path in args.csvs:
        with open(path) as f:
            rows.extend(csv.DictReader(f))
    scores = defaultdict(list)
    for row in rows:
        value = row.get(args.metric)
        if value not in (None, ""):
            scores[row["experiment"]].append(float(value))
    print(f"{'experiment':<40}{'mean ' + args.metric:<28}{'n'}")
    print("-" * 76)
    for name, vals in sorted(scores.items(), key=lambda kv: -sum(kv[1]) / len(kv[1])):
        print(f"{name:<40}{sum(vals) / len(vals):<28.4f}{len(vals)}")


if __name__ == "__main__":
    main()
