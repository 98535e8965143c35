"""Rewrite the ``queries()`` dict in ``__spark_entry__.py`` so its
first 50 entries are exactly ``via_spark.rotation.suggested_full_head``
(the driver records CORRECTNESS rows only for the head). The tail keeps
its current relative order; comment lines inside the dict body are
replaced by a single head marker comment.

Run after ``scripts/splice_staging.py`` and after committing the prior
round's driver artifacts:

    python scripts/reorder_head.py
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

ENTRY = re.compile(r'^\s{8}"(?P<name>[a-z0-9_]+)":\s*(?P<expr>.+?),\s*$')


def main() -> int:
    import __spark_entry__ as em
    from via_spark import rotation

    head = rotation.suggested_full_head(REPO, em.queries(), cap=50)
    path = REPO / "__spark_entry__.py"
    text = path.read_text()
    lines = text.splitlines(keepends=True)

    # locate the queries() return-dict body
    start = next(
        i for i, ln in enumerate(lines) if ln.startswith("def queries()")
    )
    open_i = next(
        i for i in range(start, len(lines)) if lines[i].rstrip().endswith("return {")
    )
    close_i = next(
        i for i in range(open_i + 1, len(lines)) if lines[i].rstrip() == "    }"
    )

    entries: dict[str, str] = {}
    for ln in lines[open_i + 1 : close_i]:
        m = ENTRY.match(ln)
        if m:
            assert m["name"] not in entries, f"dup entry {m['name']}"
            entries[m["name"]] = m["expr"]
    # The line regex only matches 8-space one-line entries; a multi-line
    # or oddly-formatted entry would be silently dropped and deleted by
    # the rewrite. Cross-check against the imported dict before touching
    # the file (ADVICE r11).
    registered = set(em.queries())
    assert set(entries) == registered, (
        f"parse drift: missed={sorted(registered - set(entries))} "
        f"extra={sorted(set(entries) - registered)}"
    )
    missing = [n for n in head if n not in entries]
    assert not missing, f"head names not in dict: {missing}"

    tail = [n for n in entries if n not in set(head)]
    n_before = len(entries)

    body = [
        "        # --- head (first 50): change-aware rotation — computed by\n"
        "        # via_spark.rotation.suggested_full_head at round start;\n"
        "        # enforced by tests/test_properties.py ---\n"
    ]
    body += [f'        "{n}": {entries[n]},\n' for n in head]
    body.append("        # --- tail: re-proven by tests/test_oracle_parity.py ---\n")
    body += [f'        "{n}": {entries[n]},\n' for n in tail]

    new = lines[: open_i + 1] + body + lines[close_i:]
    # sanity: same entry set, same count
    assert len(head) + len(tail) == n_before
    path.write_text("".join(new))
    print(f"reordered: head={len(head)} tail={len(tail)} total={n_before}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
