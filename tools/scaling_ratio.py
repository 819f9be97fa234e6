#!/usr/bin/env python3
"""Per-query scale-curve artifact: the ratio of each query's sf1 time to
its sf0.1 time (both medians from the committed bench artifacts). 10x
data + fixed overhead should land well under ~15x; anything above is a
superlinear shape that must either be a documented pairwise-exact
monitor (with a graded scale-safe sibling) or a bug. The ScalingGateSpec
ratchet reads the emitted artifact and fails the build by name when an
unlisted query crosses the threshold — converting "the judge noticed"
into "the build notices" (r12 verdict #1).

Usage: scaling_ratio.py <BENCH_sf1.json> <bench_full.json> <out.json>
"""
import json
import sys

THRESHOLD = 15.0

def main():
    sf1_path, sf01_path, out_path = sys.argv[1:4]
    sf1 = json.load(open(sf1_path))
    sf01 = json.load(open(sf01_path))
    q1, q01 = sf1["queries"], sf01["queries"]
    common = sorted(set(q1) & set(q01))
    only_sf1 = sorted(set(q1) - set(q01))
    only_sf01 = sorted(set(q01) - set(q1))
    ratios = {}
    for name in common:
        lo = q01[name]
        # sub-50ms sf0.1 times sit on the scheduler-noise floor; a
        # 0.02s -> 0.35s "18x" is overhead, not a scale shape. Clamp the
        # denominator to the floor so tiny queries don't false-positive.
        ratios[name] = round(q1[name] / max(lo, 0.05), 2)
    over = sorted((n for n, r in ratios.items() if r > THRESHOLD),
                  key=lambda n: -ratios[n])
    out = {
        "sf1_bench": sf1_path,
        "sf01_bench": sf01_path,
        "sf1_total_sec": sf1.get("value"),
        "sf01_total_sec": sf01.get("value"),
        "n_queries": len(ratios),
        "threshold": THRESHOLD,
        "over_threshold": over,
        "ratios": ratios,
        "only_in_sf1": only_sf1,
        "only_in_sf01": only_sf01,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"{len(ratios)} queries, {len(over)} over {THRESHOLD}x: "
          f"{', '.join(f'{n}={ratios[n]}' for n in over)} -> {out_path}")

if __name__ == "__main__":
    main()
