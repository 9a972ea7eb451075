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


def plot(rows: list[dict], out_path: str):
    """Render the reference's three-panel bar chart (ref: plot.py:33-48 —
    Speed / avg ITL / TTFT per labeled run)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    labels = [r["label"] for r in rows]
    panels = [
        ("Speed (tokens/s)", [r["decode_tps"] for r in rows]),
        ("Avg inter-token latency (ms)", [r["avg_itl_s"] * 1e3 for r in rows]),
        ("TTFT (ms)", [r["ttft_s"] * 1e3 for r in rows]),
    ]
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    for ax, (title, vals) in zip(axes, panels):
        ax.bar(range(len(vals)), vals)
        ax.set_xticks(range(len(labels)))
        ax.set_xticklabels(labels, rotation=30, ha="right", fontsize=8)
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def main(argv=None):
    p = argparse.ArgumentParser("pipeinfer-results", description=__doc__)
    p.add_argument("csv", help="results.csv path")
    p.add_argument("--plot", default="", metavar="PNG",
                   help="also render the plot.py-style bar charts to a PNG")
    args = p.parse_args(argv)
    try:
        rows = load(args.csv)
    except OSError as e:
        print(f"error: cannot read {args.csv}: {e}", file=sys.stderr)
        return 1
    if not rows:
        print("no rows", file=sys.stderr)
        return 1
    print(f"{'label':16s} {'encode t/s':>10s} {'decode t/s':>10s} {'avg ITL ms':>10s} {'TTFT ms':>8s}")
    for r in rows:
        print(
            f"{r['label']:16s} {r['encode_tps']:10.2f} {r['decode_tps']:10.2f} "
            f"{r['avg_itl_s'] * 1e3:10.1f} {r['ttft_s'] * 1e3:8.1f}"
        )
    if args.plot:
        plot(rows, args.plot)
        print(f"chart -> {args.plot}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
