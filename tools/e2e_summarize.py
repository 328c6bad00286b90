"""Summarize `tools/e2e_refresh.sh` runs into the PERF.md stage table.

Parses the per-stage ``[Stage] finished in Ns.`` lines and the
``pipeline_total`` JSON line from /tmp/e2e_{cold,warm1..N}.json and
prints a markdown table with a warm-median column (host stages on the
tunneled chip carry large transport variance — see PERF.md "Measured
end-to-end"; the per-stage minimum across runs is the reproducible
pipeline cost)."""

import json
import re
import statistics
import sys

RUNS = sys.argv[1:] or ["cold", "warm1", "warm2", "warm3"]
STAGE_RE = re.compile(r"\[(.+?)\] finished in ([0-9.]+)s\.")


def main():
    rows, totals, order = {}, {}, []
    for tag in RUNS:
        try:
            txt = open(f"/tmp/e2e_{tag}.json").read()
        except FileNotFoundError:
            continue
        for name, s in STAGE_RE.findall(txt):
            if name not in rows:
                rows[name] = {}
                order.append(name)
            rows[name][tag] = float(s)
        for line in txt.splitlines():
            if '"pipeline_total"' in line:
                totals[tag] = json.loads(line)["s"]

    warm_tags = [t for t in RUNS if t != "cold"]
    print("| stage | " + " | ".join(RUNS) + " | warm median | min |")
    print("|---" * (len(RUNS) + 3) + "|")
    for name in order:
        r = rows[name]
        warm = [r[t] for t in warm_tags if t in r]
        med = statistics.median(warm) if warm else float("nan")
        cells = " | ".join(
            f"{r[t]:.1f}" if t in r else "-" for t in RUNS)
        print(f"| {name} | {cells} | {med:.1f} | "
              f"{min(r.values()):.1f} |")
    if totals:
        warm_totals = [totals[t] for t in warm_tags if t in totals]
        med = statistics.median(warm_totals) if warm_totals else float("nan")
        cells = " | ".join(
            f"{totals[t]:.1f}" if t in totals else "-" for t in RUNS)
        print(f"| total | {cells} | {med:.1f} | "
              f"{min(totals.values()):.1f} |")


if __name__ == "__main__":
    main()
