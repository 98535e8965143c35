"""Splice the r10 staging registry into the driver contract — the
error-proof version of the registration loop the round-8 close learned
the hard way (a manual reorder once silently DROPPED a query; the exact
`len(QUERIES) == N` pin caught it).

What it does, atomically in the working tree:

1. Appends every ``via_spark.staging.staged_queries()`` entry to the
   TAIL of ``__spark_entry__.queries()`` and its oracle to
   ``oracle_sql()`` (tail, not head: the head reorder is a separate,
   rotation-driven step that needs the new round's committed driver
   artifacts — run ``python -m via_spark.rotation`` afterwards and move
   the suggested 50 names up, as every round does).
2. Bumps the exact-count pin in tests/test_oracle_parity.py.
3. Empties the staging registry (module stays importable; the staged
   parity tests become no-ops while the model/planted tests keep
   running against the cores).

Run from the repo root at the START of round 10, after committing the
driver's r9 artifacts:

    python scripts/splice_staging.py
    python -m via_spark.rotation          # then reorder the head
    python -m pytest tests/test_oracle_parity.py -q

Idempotent: refuses to run if the staging registry is already empty or
any staged name is already registered.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main(root: Path = REPO) -> int:
    """Splice against ``root``'s copies of the three files. The live
    registries are always read from the REAL repo (import machinery);
    passing a different ``root`` edits copies instead — how
    tests/test_staging.py regression-tests this script without touching
    the working tree."""
    entry_path = root / "__spark_entry__.py"
    parity_path = root / "tests" / "test_oracle_parity.py"
    staging_path = root / "via_spark" / "staging.py"

    import __spark_entry__ as em
    from via_spark import staging

    staged = staging.staged_queries()
    staged_sql = staging.staged_oracle_sql()
    if not staged:
        print("staging registry is empty — nothing to splice")
        return 1
    registered = em.queries()
    clash = set(staged) & set(registered)
    assert not clash, f"staged names already registered: {sorted(clash)}"
    assert set(staged) == set(staged_sql)

    q_lines = []
    o_lines = []
    for name, fn in staged.items():
        mod = fn.__module__.rsplit(".", 1)[-1]
        q_lines.append(f'        "{name}": {mod}.{fn.__name__},')
        sql_fn = f"{name}_sql"
        from via_spark import oracles

        assert hasattr(oracles, sql_fn), sql_fn
        o_lines.append(f'        "{name}": oracles.{sql_fn}(),')

    src = entry_path.read_text()
    # Anchor each insert on the LAST entry of ITS OWN dict, searching
    # only within that function's span — a whole-file regex for a query
    # name also matches the same name's oracle_sql() line (the round-7
    # regeneration trap), so the spans are non-negotiable.
    q_names = list(registered)
    o_names = list(em.oracle_sql())
    q_def = src.index("def queries(")
    o_def = src.index("def oracle_sql(")
    assert q_def < o_def
    q_anchor = re.search(rf'^( *"{q_names[-1]}": [^\n]+,)$', src[q_def:o_def], re.M)
    o_anchor = re.search(rf'^( *"{o_names[-1]}": [^\n]+,)$', src[o_def:], re.M)
    assert q_anchor and o_anchor, "could not anchor dict tails"
    # splice bottom-up so offsets stay valid
    spans = sorted(
        [(q_def + q_anchor.end(1), "\n" + "\n".join(q_lines)),
         (o_def + o_anchor.end(1), "\n" + "\n".join(o_lines))],
        reverse=True,
    )
    for pos, insert in spans:
        src = src[:pos] + insert + src[pos:]
    entry_path.write_text(src)

    n_new = len(registered) + len(staged)
    ptxt = parity_path.read_text()
    ptxt2, n_sub = re.subn(
        r"== len\(ORACLES\) == \d+", f"== len(ORACLES) == {n_new}", ptxt
    )
    assert n_sub == 1, "count pin not found"
    parity_path.write_text(ptxt2)

    stxt = staging_path.read_text()
    stxt = re.sub(
        r"def staged_queries\(\).*",
        'def staged_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:\n'
        '    """Spliced into __spark_entry__ at the r10 head — registry drained."""\n'
        "    return {}\n\n\n"
        "def staged_oracle_sql() -> dict[str, str]:\n"
        '    """Spliced into __spark_entry__ at the r10 head — registry drained."""\n'
        "    return {}\n",
        stxt,
        flags=re.S,
    )
    staging_path.write_text(stxt)

    print(f"spliced {len(staged)} queries; parity pin -> {n_new}")
    print("next: python -m via_spark.rotation  (reorder the head)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
