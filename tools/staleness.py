"""Print the certification-staleness report for COVERAGE.md.

For every registry entry: the last round it held a driver pass (exact or
rows-only), computed from the committed CORRECTNESS_r*.json files — the same
data ``collect_queries()`` uses to order the driver's 50-entry verification
window (operators/__init__.py::staleness_fill). Run after each round's
CORRECTNESS file lands and paste the output into COVERAGE.md's staleness
section:

    python tools/staleness.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_ingestion_api_system_spark.operators import (  # noqa: E402
    _WINDOW_SIZE,
    collect_queries,
    correctness_history,
)


def main() -> None:
    queries, _ = collect_queries()
    names = list(queries)
    history = correctness_history()
    window = set(names[:_WINDOW_SIZE])

    by_round: dict[int, list[str]] = {}
    for n in names:
        by_round.setdefault(history.get(n, 0), []).append(n)

    print(f"Registry: {len(names)} entries; window = first {_WINDOW_SIZE}.")
    print(f"In-window this round: {len(window & set(names))} "
          f"(next certification refreshes them).\n")
    print("| Last driver-green | Entries | Names |")
    print("|---|---|---|")
    for rnd in sorted(by_round):
        label = "never" if rnd == 0 else f"r{rnd}"
        entries = by_round[rnd]
        marked = [f"**{n}**" if n in window else n for n in entries]
        print(f"| {label} | {len(entries)} | {', '.join(marked)} |")
    print("\n(bold = in the current round's driver window)")


if __name__ == "__main__":
    main()
