"""Export TensorBoard event-file scalars as markdown tables.

Used to commit training-curve evidence (runs/synth256/*) without shipping
raw TensorBoard installs to the reader: the event file stays in the repo
as the source of truth, the README carries the table.

Usage: python tools/export_curves.py <logdir> [--every N] [--tags a,b,c]
"""

import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--every", type=int, default=1,
                    help="print every Nth point (val tags always full)")
    ap.add_argument("--tags", default=None,
                    help="comma-separated tag filter (default: all)")
    args = ap.parse_args()

    from tensorboard.backend.event_processing.event_accumulator import \
        EventAccumulator

    ea = EventAccumulator(args.logdir,
                          size_guidance={"scalars": 0})
    ea.Reload()
    tags = ea.Tags()["scalars"]
    if args.tags:
        keep = set(args.tags.split(","))
        tags = [t for t in tags if t in keep]
    if not tags:
        print("no scalar tags found", file=sys.stderr)
        return 1

    # group tags that share step grids into one table per prefix class
    val_tags = sorted(t for t in tags if t.startswith("val"))
    train_tags = sorted(t for t in tags if not t.startswith("val")
                        and not t.startswith("perf"))
    perf_tags = sorted(t for t in tags if t.startswith("perf"))

    def table(group, every=1):
        if not group:
            return
        series = {t: {e.step: e.value for e in ea.Scalars(t)}
                  for t in group}
        steps = sorted(set().union(*[set(s) for s in series.values()]))
        steps = steps[::every] if every > 1 else steps
        print("| step | " + " | ".join(group) + " |")
        print("|" + "---|" * (len(group) + 1))
        for s in steps:
            row = [f"{series[t].get(s, float('nan')):.4f}"
                   if series[t].get(s) is not None else "-"
                   for t in group]
            print(f"| {s} | " + " | ".join(row) + " |")
        print()

    table(train_tags, args.every)
    table(val_tags)
    table(perf_tags, args.every)
    return 0


if __name__ == "__main__":
    sys.exit(main())
