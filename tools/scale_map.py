#!/usr/bin/env python3
"""Regenerate SCALE.md's full-registry exponent map from SCALE_PROBE.json
(the persisted output of `tools/scaling_probe.py --all`).

Rewrites the block between the BEGIN/END markers in SCALE.md in place, so
the map stays mechanical: every registry entry maps to its measured
exponent at the sf0.001→sf0.1 (100×) range. Exits 1 if any registry entry
is missing from the probe record (the map must be total).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

BEGIN = "<!-- BEGIN GENERATED FULL-REGISTRY EXPONENT MAP (tools/scale_map.py) -->"
END = "<!-- END GENERATED FULL-REGISTRY EXPONENT MAP -->"


def main() -> int:
    from data_ingestion_api_system_spark.operators import collect_queries

    registry = list(collect_queries()[0])
    probe = json.loads((ROOT / "SCALE_PROBE.json").read_text())["queries"]
    # a probe entry is usable only with both decade timings present and
    # non-zero (ADVICE r10: an older/partial SCALE_PROBE.json used to raise
    # KeyError/ZeroDivisionError deep in top_decade instead of this message)
    def _defect(n: str) -> str | None:
        # distinguish a PARTIAL probe (key absent) from a CORRUPTED one
        # (recorded timing <= 0, which would break the log-ratio) so the
        # failure message names which case occurred (ADVICE r11)
        if n not in probe:
            return "entry absent"
        t = probe[n].get("t", {})
        for k in ("sf0.001", "sf0.01", "sf0.1"):
            if k not in t:
                return f"timing {k} absent (partial probe)"
            if not t[k] or t[k] <= 0:
                return f"timing {k} = {t[k]!r} (corrupted record)"
        return None

    missing = [(n, d) for n in registry if (d := _defect(n))]
    if missing:
        print(f"probe record missing/malformed for {len(missing)} entries:")
        for n, d in missing[:10]:
            print(f"  {n}: {d}")
        return 1

    import math

    def top_decade(t: dict) -> float:
        # marginal exponent over the LAST 10x (sf0.01 -> sf0.1): the
        # session floor that deflates the full-range exponent is mostly
        # amortized by sf0.01, so this is the better 100 TB predictor —
        # a plan going super-linear shows here first.
        return math.log10(t["sf0.1"] / t["sf0.01"])

    registry_set = set(registry)
    rows = sorted(
        ((v["exponent"], n, v["t"]) for n, v in probe.items() if n in registry_set),
        reverse=True,
    )
    worst_top = max(rows, key=lambda r: top_decade(r[2]))
    worst_any = max(rows[0][0], top_decade(worst_top[2]))
    # derive the audit-threshold claim from the data — a regeneration where
    # an entry crosses 1.3 must not emit prose contradicting its own table
    flag_claim = (
        "≥1.3 would flag hidden super-linear work (none does on either"
        if worst_any < 1.3
        else "≥1.3 flags hidden super-linear work (SOME ENTRIES EXCEED IT —"
    )
    lines = [
        BEGIN,
        "",
        f"All {len(registry)} registry entries, measured at sf0.001 → sf0.1",
        "(100× data), warm best-of-3 per sf; exponent = log100(t_hi/t_lo),",
        "exp₁₀ = log10(t(sf0.1)/t(sf0.01)) — the marginal exponent over the",
        "top decade, where the ~0.3 s session floor is already amortized, so",
        "it is the better 100 TB predictor.",
        "Fixed per-query overhead DEFLATES the full-range exponent,",
        "so ≈0 means overhead-bound, ≈1 means linear data cost dominates, and",
        flag_claim,
        f"measure; worst exp₁₀ = {top_decade(worst_top[2]):+.3f},"
        f" {worst_top[1]}).",
        "",
        "| Entry | t(sf0.001) | t(sf0.01) | t(sf0.1) | exponent | exp₁₀ |",
        "|---|---|---|---|---|---|",
    ]
    for exp, name, t in rows:
        lines.append(
            f"| {name} | {t['sf0.001']:.3f} | {t['sf0.01']:.3f} "
            f"| {t['sf0.1']:.3f} | {exp:+.3f} | {top_decade(t):+.3f} |"
        )
    lines += ["", END]

    scale = (ROOT / "SCALE.md").read_text()
    if BEGIN in scale and END in scale:
        head, rest = scale.split(BEGIN, 1)
        _, tail = rest.split(END, 1)
        scale = head + "\n".join(lines) + tail
    else:
        scale = scale.rstrip() + "\n\n## Full-registry measured exponents (round 10)\n\n" + "\n".join(lines) + "\n"
    (ROOT / "SCALE.md").write_text(scale)
    worst = rows[0]
    print(f"wrote {len(rows)} rows; worst exponent {worst[0]:+.3f} ({worst[1]})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
