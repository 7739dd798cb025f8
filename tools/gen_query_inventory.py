#!/usr/bin/env python
"""Regenerate QUERIES.md — the full catalog inventory (name, tags,
oracle status, bench membership, one-line doc) straight from the
registry, so the document can never drift from the code.

    python tools/gen_query_inventory.py > /dev/null  # writes QUERIES.md
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.catalog import (  # noqa: E402
    load_all,
)


def first_sentence(doc: str) -> str:
    text = " ".join((doc or "").split())
    for stop in (". ", " — ", " - "):
        if stop in text:
            return text.split(stop)[0].rstrip(".") + "."
    return (text[:160] + "…") if len(text) > 160 else (text or "(no doc)")


def main() -> None:
    reg = load_all()
    oracled = sum(1 for s in reg.values() if s.oracle is not None)
    benched = sum(1 for s in reg.values() if s.bench)
    lines = [
        "# QUERIES — catalog inventory (generated)",
        "",
        f"{len(reg)} queries; {oracled} DuckDB-oracled "
        f"({len(reg) - oracled} rows-only by design, each with an oracled "
        f"invariant companion); {benched} in the headline bench suite.",
        "",
        "Regenerate with `python tools/gen_query_inventory.py` — this file",
        "is derived from the registry and should never be edited by hand.",
        "",
        "| query | tags | oracle | bench | what it proves |",
        "|---|---|---|---|---|",
    ]
    for name in sorted(reg):
        s = reg[name]
        lines.append(
            "| `{}` | {} | {} | {} | {} |".format(
                name,
                ", ".join(s.tags) or "—",
                "✓" if s.oracle is not None else "rows-only",
                "✓" if s.bench else "",
                first_sentence(s.doc).replace("|", "\\|"),
            )
        )
    out = os.path.join(REPO, "QUERIES.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(reg)} queries ({oracled} oracled)")


if __name__ == "__main__":
    main()
