"""Round-open step — run FIRST each round, before any code edit.

Does, in order, the three things that have to happen at round start and
that were repeatedly forgotten when done by hand (VERDICT r8–r11):

1. Commit the driver's round artifacts (``CORRECTNESS_r*.json``,
   ``BENCH_r*.json``, ``BENCH_FULL.json``) if any are untracked or
   modified — ``via_spark.rotation`` fails closed on a dirty artifact
   set and re-flags the whole head.
2. Splice any staged queries (``scripts/splice_staging.py``) so the
   round works against the full surface from the start.
3. Run ``python -m via_spark.rotation`` and print the suggested head.
   The actual head rewrite (``scripts/reorder_head.py``) is left for
   the END of the round — any later code edit re-flags queries, so
   reordering must be the last code-touching step.

Usage:  python scripts/open_round.py
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

ARTIFACT_GLOBS = ["CORRECTNESS_r*.json", "BENCH_r*.json", "BENCH_FULL.json"]


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, check=True, capture_output=True, text=True
    ).stdout


def main() -> int:
    dirty: list[str] = []
    for pat in ARTIFACT_GLOBS:
        for p in sorted(REPO.glob(pat)):
            rel = p.name
            status = _git("status", "--porcelain", "--", rel).strip()
            if status:
                dirty.append(rel)
    if dirty:
        _git("add", "--", *dirty)
        _git("commit", "-m", "round open: commit driver correctness/bench artifacts")
        print(f"committed driver artifacts: {', '.join(dirty)}")
    else:
        print("driver artifacts already tracked and clean")

    splice = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "splice_staging.py")],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    print(splice.stdout.strip() or splice.stderr.strip())
    if splice.returncode != 0:
        print(splice.stderr, file=sys.stderr)
        return splice.returncode

    rot = subprocess.run(
        [sys.executable, "-m", "via_spark.rotation"],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    print(rot.stdout)
    if rot.returncode != 0:
        print(rot.stderr, file=sys.stderr)
        return rot.returncode
    print(
        "next: land code, then run scripts/reorder_head.py as the LAST "
        "code-touching step of the round"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
