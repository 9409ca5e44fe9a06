"""Generate the newline-delimited dictionary fixture (S2 side input).

The reference ships a 235,886-word English wordlist (`en`, 2.4 MB)
loaded at startup into a membership set (main.go:108-118). This
generator produces a deterministic stand-in at
capstone_etl_spark/resources/wordlist_en.txt:

- the corpus vocabulary words that the gate should KEEP (deliberately
  excluding 'spark', 'vector', 'dup' and 'merge' so the gate provably
  filters — same trick as the literal DICTIONARY);
- mixed-case + duplicated + whitespace-padded entries of those words,
  so the loader's lower/trim/distinct normalization is exercised;
- ~25k deterministic pronounceable filler words (syllable product), so
  the scan/broadcast path carries a realistically-sized set.

Run: python tools/gen_wordlist.py   (idempotent, writes the fixture)
"""

from __future__ import annotations

import itertools
import os

KEEP = [
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "order", "part",
    "query", "row", "scan", "slow", "small", "sort", "stream", "table",
    "the", "value", "window",
]
# excluded on purpose: spark, vector, dup, merge

SYLLABLES_A = ["ba", "ce", "di", "fo", "gu", "ha", "je", "ki", "lo", "mu",
               "na", "pe", "qi", "ro", "su", "ta", "ve", "wi", "xo", "yu"]
SYLLABLES_B = ["bel", "cor", "dan", "fen", "gil", "hom", "jun", "kar",
               "lim", "mon", "nar", "pol", "quin", "rus", "sel", "tor",
               "ver", "wal", "xen", "yor"]
SYLLABLES_C = ["ate", "ine", "ous", "ism", "ory", "ance", "ment", "ship",
               "ward", "wise", "ify", "ize", "able", "less", "ful", "dom",
               "hood", "ness", "tion", "sion"]


def main() -> None:
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "capstone_etl_spark", "resources", "wordlist_en.txt",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    lines: list[str] = []
    for w in KEEP:
        lines.append(w)
        lines.append(w.upper())          # case-normalization exercised
        lines.append(w.capitalize())
        lines.append(f"  {w}  ")         # trim exercised
    for a, b, c in itertools.product(SYLLABLES_A, SYLLABLES_B, SYLLABLES_C):
        lines.append(a + b + c)
    with open(out, "w", encoding="ascii") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(lines)} lines, {os.path.getsize(out)} bytes")


if __name__ == "__main__":
    main()
