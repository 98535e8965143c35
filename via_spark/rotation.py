"""Change-aware CORRECTNESS head rotation (the driver verifies only the
first 50 ``queries()`` entries per round).

The round-6 verdict's gap: the old policy guaranteed every query ONE
green driver row, but a query whose implementing code changed after its
newest green row kept stale credit (e.g. ``dedup_minhash_pairs`` went
green in r4, then gained the band-cap path in r6). This module makes
"needs a driver re-check" computable from the repo itself:

* ``newest_green_rounds`` — per query, the newest round with a fully
  green committed CORRECTNESS row.
* ``module_import_closure`` — static (AST) intra-package import graph of
  ``via_spark``, transitively closed: a query's implementation is its
  callable's module plus everything that module imports. Deliberately
  over-inclusive (module granularity, dependency closure): flagging an
  unchanged query costs one redundant driver row; missing a changed one
  loses the hard signal.
* ``changed_since_round`` — ``git diff`` of those modules against the
  commit that ADDED that round's CORRECTNESS_r{N}.json (the driver
  records the file immediately after verifying that code state, so
  later commits are exactly "changed since verified"). Uncommitted
  working-tree edits count as changed.
* ``recommended_head`` — never-verified queries first, then
  changed-since-green, both sorted by staleness (oldest green round
  first, name tiebreak). When more than 50 queries need re-checking,
  the stalest 50 go this round and the rest keep their priority for the
  next — the ordering converges because a re-verified query's flag
  clears at its new green round.

``tests/test_properties.py::test_rotation_head_policy`` enforces that
``queries()`` actually leads with this head, so the rotation stays
self-auditing as code keeps moving. ``python -m via_spark.rotation``
prints the current recommendation.

``__spark_entry__.py`` itself is NOT a tracked path: it is the adapter
and ordering layer (reordering the head every round would otherwise
flag every wrapper query forever). The few queries defined there as
thin wrappers declare their real modules in ``WRAPPER_DEPS``.
"""

from __future__ import annotations

import ast
import json
import re
import subprocess
import sys
from pathlib import Path

#: Queries implemented as wrappers inside __spark_entry__.py → the
#: via_spark modules that actually implement them (the import closure
#: of these paths is applied on top).
WRAPPER_DEPS: dict[str, tuple[str, ...]] = {
    "tier1_view": ("via_spark/store.py",),
    "rhythm_recent_counts": ("via_spark/store.py", "via_spark/operators/rhythm.py"),
    "rhythm_baseline_stats": ("via_spark/store.py", "via_spark/operators/rhythm.py"),
    "rhythm_anomalies": ("via_spark/operators/rhythm.py",),
    "rhythm_novelty_small_baseline": ("via_spark/operators/rhythm.py",),
    "rhythm_frequency_sensitive": ("via_spark/operators/rhythm.py",),
}


def _git(repo: Path, *args: str) -> str:
    return subprocess.run(
        ["git", "-C", str(repo), *args],
        capture_output=True, text=True, check=True,
    ).stdout


def latest_round(repo: Path) -> int | None:
    """Highest N among the committed CORRECTNESS_r{N}.json files."""
    ns = [
        int(re.search(r"r(\d+)", f.name).group(1))
        for f in repo.glob("CORRECTNESS_r*.json")
    ]
    return max(ns) if ns else None


def newest_green_rounds(repo: Path, max_round: int | None = None) -> dict[str, int]:
    """query name → newest round whose committed CORRECTNESS row is
    fully green (rows + schema + hash, no error). ``max_round`` caps
    which round files are considered (used to reconstruct the state
    before the newest artifact landed)."""
    rounds: dict[str, int] = {}
    for f in sorted(repo.glob("CORRECTNESS_r*.json")):
        n = int(re.search(r"r(\d+)", f.name).group(1))
        if max_round is not None and n > max_round:
            continue
        for name, row in json.loads(f.read_text()).items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            ):
                rounds[name] = max(n, rounds.get(name, 0))
    return rounds


def round_commit(repo: Path, n: int) -> str | None:
    """The commit that ADDED CORRECTNESS_r{n}.json — the driver records
    it right after verifying that code state, so this commit is the
    'verified as of' baseline for round n."""
    out = _git(
        repo, "log", "--diff-filter=A", "--format=%H", "--",
        f"CORRECTNESS_r{n:02d}.json",
    ).strip()
    return out.splitlines()[-1] if out else None


def _module_file(repo: Path, dotted: str) -> str | None:
    """via_spark.operators.dedup → 'via_spark/operators/dedup.py' if it
    is a module file (packages return None)."""
    p = repo / (dotted.replace(".", "/") + ".py")
    return str(p.relative_to(repo)) if p.is_file() else None


def module_import_closure(repo: Path) -> dict[str, set[str]]:
    """repo-relative path → transitive set of via_spark module files it
    imports (including itself). Static AST pass; handles every import
    form used in the package (``from via_spark.x import y``,
    ``from via_spark.operators import dedup``, ``import via_spark.x``)."""
    pkg = repo / "via_spark"
    edges: dict[str, set[str]] = {}
    for py in pkg.rglob("*.py"):
        rel = str(py.relative_to(repo))
        deps: set[str] = set()
        tree = ast.parse(py.read_text())
        for node in ast.walk(tree):
            if isinstance(node, ast.ImportFrom) and node.module and (
                node.module == "via_spark" or node.module.startswith("via_spark.")
            ):
                mf = _module_file(repo, node.module)
                if mf:  # from via_spark.operators.dedup import jaccard
                    deps.add(mf)
                else:  # from via_spark.operators import dedup, rhythm
                    for alias in node.names:
                        sub = _module_file(repo, f"{node.module}.{alias.name}")
                        if sub:
                            deps.add(sub)
            elif isinstance(node, ast.Import):
                for alias in node.names:
                    if alias.name.startswith("via_spark"):
                        mf = _module_file(repo, alias.name)
                        if mf:
                            deps.add(mf)
        edges[rel] = deps
    closure: dict[str, set[str]] = {}

    def close(p: str, seen: set[str]) -> set[str]:
        if p in closure:
            return closure[p]
        seen = seen | {p}
        out = {p}
        for d in edges.get(p, ()):
            out |= {d} if d in seen else close(d, seen)
        closure[p] = out
        return out

    for p in edges:
        close(p, set())
    return closure


def query_impl_paths(repo: Path, queries: dict) -> dict[str, set[str]]:
    """query name → repo-relative implementing module files (closure)."""
    closure = module_import_closure(repo)
    out: dict[str, set[str]] = {}
    for name, fn in queries.items():
        roots: set[str] = set(WRAPPER_DEPS.get(name, ()))
        mod = sys.modules.get(fn.__module__)
        mf = getattr(mod, "__file__", None)
        if mf:
            try:
                rel = str(Path(mf).resolve().relative_to(repo))
            except ValueError:
                rel = None
            if rel and rel != "__spark_entry__.py":
                roots.add(rel)
        paths: set[str] = set()
        for r in roots:
            paths |= closure.get(r, {r})
        out[name] = paths
    return out


def changed_paths_since(repo: Path, commit: str) -> set[str]:
    """Module files changed between ``commit`` and the working tree
    (committed AND uncommitted edits both count)."""
    out = _git(repo, "diff", "--name-only", commit, "--", "via_spark")
    return {line.strip() for line in out.splitlines() if line.strip()}


#: Queries whose oracle builder does not follow the ``<query>_sql``
#: naming convention (parameterized variants sharing one builder).
ORACLE_FN_EXCEPTIONS: dict[str, str] = {
    "rhythm_novelty_small_baseline": "rhythm_anomalies_sql",
    "rhythm_frequency_sensitive": "rhythm_anomalies_sql",
}

_ORACLES_REL = "via_spark/oracles.py"


def _oracle_fn_sources(text: str) -> tuple[dict[str, str], str]:
    """oracles.py source → ({function name: its source segment},
    concatenated source of everything top-level that is NOT a function —
    shared CTE constants etc.)."""
    tree = ast.parse(text)
    fns: dict[str, str] = {}
    shared: list[str] = []
    for node in tree.body:
        seg = ast.get_source_segment(text, node) or ""
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            fns[node.name] = seg
        else:
            shared.append(seg)
    return fns, "\n".join(shared)


def oracle_changed_queries(
    repo: Path, commit: str, query_names: list[str]
) -> set[str]:
    """Queries whose ORACLE contract changed since ``commit`` — the
    driver verifies query AND oracle together, so an edited oracle
    invalidates a green row exactly like edited operator code (the r7
    session-window gap fix changed only oracles.py). Compared at
    per-function granularity from source TEXT (``git show`` + AST — no
    historical import needed); a change to shared top-level material
    (CTE constants) or to a helper function that is no query's builder
    conservatively flags every query."""
    cur = (repo / _ORACLES_REL).read_text()
    try:
        old = _git(repo, "show", f"{commit}:{_ORACLES_REL}")
    except subprocess.CalledProcessError:
        return set(query_names)  # file absent at that commit
    if cur == old:
        return set()
    cur_fns, cur_shared = _oracle_fn_sources(cur)
    old_fns, old_shared = _oracle_fn_sources(old)
    builder_of = {
        q: ORACLE_FN_EXCEPTIONS.get(q, f"{q}_sql") for q in query_names
    }
    builders = set(builder_of.values())
    if cur_shared != old_shared:
        return set(query_names)
    helper_changed = any(
        cur_fns.get(name) != old_fns.get(name)
        for name in set(cur_fns) | set(old_fns)
        if name not in builders
    )
    if helper_changed:
        return set(query_names)
    return {
        q for q, fn in builder_of.items()
        if cur_fns.get(fn) != old_fns.get(fn)
    }


def recommended_head(
    repo: Path, queries: dict, max_round: int | None = None
) -> list[str]:
    """All queries needing a driver row this round, stalest first:
    never-verified (green_round −1), then changed-since-green, sorted by
    (green round, name). ``max_round`` reconstructs the recommendation
    as of an earlier round's artifact state (see the policy test's
    boundary handling)."""
    greens = newest_green_rounds(repo, max_round)
    impl = query_impl_paths(repo, queries)
    names = list(queries)
    diffs: dict[int, set[str]] = {}
    oracle_changed: dict[int, set[str]] = {}
    required: list[tuple[int, str]] = []
    for name in names:
        g = greens.get(name)
        if g is None:
            required.append((-1, name))
            continue
        if g not in diffs:
            c = round_commit(repo, g)
            diffs[g] = changed_paths_since(repo, c) if c else set()
            oracle_changed[g] = (
                oracle_changed_queries(repo, c, names) if c else set()
            )
        if impl[name] & diffs[g] or name in oracle_changed[g]:
            required.append((g, name))
    return [name for _, name in sorted(required)]


def main() -> None:
    repo = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo))
    import __spark_entry__ as em

    qs = em.queries()
    head = recommended_head(repo, qs)
    greens = newest_green_rounds(repo)
    print(f"# {len(head)} queries need a driver row (head cap = 50)")
    for name in head:
        print(f"{name}  (last green: r{greens.get(name, '-')})")


if __name__ == "__main__":
    main()
