#!/usr/bin/env python
"""Regenerate OPERATORS.md from the operator registry.

Usage: python gen_operator_docs.py

One row per registered ``queries()`` key: defining module, the first
sentence of the operator's docstring, and whether the driver contract is
a full value-hash oracle twin or a rows-only check. Rows are grouped by
module and sorted by key so diffs stay stable across rounds (the
registry's own iteration order rotates with the driver-verification
window).
"""

from __future__ import annotations

import inspect
import re

from morphl_model_publishers_churning_users_spark import load_all_operators
from morphl_model_publishers_churning_users_spark import registry


def main() -> None:
    load_all_operators()
    rows = []
    for key, fn in registry.QUERIES.items():
        mod = fn.__module__.split("morphl_model_publishers_churning_users_spark.")[-1]
        doc = inspect.getdoc(fn) or ""
        # Sentence boundary can land at end-of-line ("xxx.\n"), which
        # ". "-splitting misses — collapse newlines first, then split on
        # a period followed by whitespace or end-of-string (ADVICE r4).
        flat = " ".join(doc.split())
        # Don't treat abbreviation periods ("et al.", "vs.", "e.g.",
        # single initials) as sentence ends, and only accept a boundary
        # whose next sentence starts with an uppercase/digit/open-paren —
        # otherwise "Lee et al. 2022-style" truncates mid-cite (ADVICE r5).
        first = re.split(
            r"(?<!\bet al)(?<!\bvs)(?<!\be\.g)(?<!\bi\.e)(?<!\bcf)"
            r"(?<!\b[A-Z])\.(?=\s+[A-Z0-9(]|$)",
            flat,
            maxsplit=1,
        )[0].strip().rstrip(".")
        if len(first) > 160:
            first = first[:157] + "..."
        first = first.replace("|", "\\|")
        oracle = "full" if key in registry.ORACLES else "rows-only"
        rows.append((mod, key, first, oracle))
    rows.sort()

    lines = [
        "# Operator reference",
        "",
        f"{len(rows)} registered operators. Auto-generated — regenerate with",
        "`python gen_operator_docs.py` after adding an operator. \"full\"",
        "oracle = the driver value-hashes the complete result against the",
        "DuckDB twin; \"rows-only\" = the weaker row-count check (none",
        "remain — every key ships a twin, approximate/model ops via the",
        "exact-anchor + ok-flag contract described in SURVEY.md §5).",
        "",
        "| key | module | summary | oracle |",
        "|---|---|---|---|",
    ]
    for mod, key, first, oracle in rows:
        lines.append(f"| `{key}` | {mod} | {first} | {oracle} |")
    lines.append("")

    with open("OPERATORS.md", "w") as f:
        f.write("\n".join(lines))
    print(f"wrote OPERATORS.md ({len(rows)} operators)")


if __name__ == "__main__":
    main()
