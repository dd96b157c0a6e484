"""Entity-frequency measurement backing the HTML-extraction
normalization contract (ops/html.py ENTITIES): count every
entity-shaped token in the synthetic pages corpus and report the
coverage of the fixed decode table.

Usage: python tools/entity_freq.py [sf_dir]   (writes BENCH/ENTITIES.md)
"""

from __future__ import annotations

import re
import sys
from collections import Counter

import duckdb

sys.path.insert(0, "/root/repo")

from vyperdatum_spark.ops.html import ENTITIES  # noqa: E402
from vyperdatum_spark.queries import webtext  # noqa: E402

ENT_RE = re.compile(r"&[a-zA-Z][a-zA-Z0-9]*;|&#[0-9]+;|&#x[0-9a-fA-F]+;")


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    pages = con.execute(
        f"SELECT decode(html) AS h FROM ({webtext._PAGES_SQL})"
    ).df()
    counts: Counter[str] = Counter()
    for h in pages["h"]:
        counts.update(ENT_RE.findall(h))
    table = {e for e, _ in ENTITIES}
    total = sum(counts.values())
    covered = sum(c for e, c in counts.items() if e in table)
    lines = [
        "# HTML entity frequency in the synthetic pages corpus",
        "",
        f"Corpus: `{sf}` ({len(pages):,} pages).  Every entity-shaped",
        "token (`&name;`, `&#n;`, `&#xh;`) counted; the fixed decode",
        "table in `ops/html.py` (the engine's normalization contract —",
        "structural five + typographic-punctuation family + symbol",
        "head + decimal twins, values generated from the stdlib WHATWG",
        "table) is marked ✓.",
        "",
        f"**Coverage: {covered}/{total} occurrences"
        + (f" ({100.0 * covered / total:.2f}%)" if total else " (no entities)")
        + f" across {len(counts)} distinct entities; decode table size "
        f"{len(ENTITIES)}.**",
        "",
        "| entity | count | in table |",
        "|---|---|---|",
    ]
    for e, c in counts.most_common():
        lines.append(f"| `{e}` | {c} | {'✓' if e in table else '—'} |")
    lines += [
        "",
        "Contract notes: `&nbsp;`/`&#160;` normalize to ASCII space (so",
        "the whitespace collapse merges them) and `&shy;`/`&#173;` are",
        "removed (soft hyphen); `&amp;`/`&#38;` decode strictly last so",
        "double-encoded entities round-trip.  The long tail (accented",
        "letter names, math, Greek) is left encoded by contract — a",
        "full WHATWG chain would scan every string ~2,200×/row.",
    ]
    with open("/root/repo/BENCH/ENTITIES.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"coverage {covered}/{total}, distinct {len(counts)}; "
          "wrote BENCH/ENTITIES.md")


if __name__ == "__main__":
    main()
