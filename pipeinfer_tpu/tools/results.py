"""Summarize results.csv runs (ref: plot.py — which bar-charts
Speed/ITL/TTFT per {Sequential, Speculative, PipeInfer} × model). This tool
renders the same comparison as a text table; pipe into your plotting
environment of choice for graphics."""

from __future__ import annotations

import argparse
import sys


def load(path: str) -> list[dict]:
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            parts = line.split(",")
            if len(parts) < 4:
                continue
            rows.append(
                {
                    "encode_tps": float(parts[0]),
                    "decode_tps": float(parts[1]),
                    "avg_itl_s": float(parts[2]),
                    "ttft_s": float(parts[3]),
                    "label": parts[4] if len(parts) > 4 else f"run{len(rows)}",
                }
            )
    return rows


def main(argv=None):
    p = argparse.ArgumentParser("pipeinfer-results", description=__doc__)
    p.add_argument("csv", help="results.csv path")
    args = p.parse_args(argv)
    rows = load(args.csv)
    if not rows:
        print("no rows", file=sys.stderr)
        return 1
    print(f"{'label':16s} {'encode t/s':>10s} {'decode t/s':>10s} {'avg ITL ms':>10s} {'TTFT ms':>8s}")
    for r in rows:
        print(
            f"{r['label']:16s} {r['encode_tps']:10.2f} {r['decode_tps']:10.2f} "
            f"{r['avg_itl_s'] * 1e3:10.1f} {r['ttft_s'] * 1e3:8.1f}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
