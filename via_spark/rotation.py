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
  ``via_spark``, transitively closed by FIXPOINT iteration (a
  path-dependent DFS memo under-includes inside import cycles, which
  this package has): a query's implementation is its callable's module
  plus everything that module imports.
* ``reference_graph`` — the refinement that lets the backlog converge:
  a static FUNCTION-level reference graph ((module, top-level unit) →
  referenced units, resolving same-module names, ``from … import``
  bindings, and module-alias attribute access). A changed module only
  flags the queries whose reachable-unit set intersects the module's
  CHANGED units; edits to shared top-level material (constants,
  imports) or to a module using dynamic dispatch (``getattr``/
  ``globals``/star-import — none today) fall back to flagging the
  whole module. Over-approximation is the invariant: every name/attr
  reference is an edge whether or not it is a call, so "not flagged"
  is a proof of unreachability, not a guess.
* ``changed_since_round`` — ``git diff`` of those modules against the
  commit that ADDED that round's CORRECTNESS_r{N}.json (the driver
  records the file immediately after verifying that code state, so
  later commits are exactly "changed since verified"). Uncommitted
  working-tree edits count as changed; per-unit diffs come from
  ``git show`` + AST source segments, same scheme as the oracle diff.
  A green round whose artifact commit cannot be resolved (artifact
  present but never committed) FAILS CLOSED: its queries are flagged,
  because "changed since verified" is uncomputable without a baseline.
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


def module_import_edges(repo: Path) -> dict[str, set[str]]:
    """repo-relative path → DIRECT via_spark module files it imports.
    Static AST pass; handles every import form used in the package
    (``from via_spark.x import y``, ``from via_spark.operators import
    dedup``, ``import via_spark.x``)."""
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
    return edges


def module_import_closure(repo: Path) -> dict[str, set[str]]:
    """repo-relative path → transitive set of via_spark module files it
    imports (including itself).

    Fixpoint iteration (NOT DFS memoization: a memo filled while a
    cycle is on the stack caches the under-approximation computed
    under that path's ``seen`` set — store.py's closure then misses
    modules reachable only through the cycle). Iterating to a fixed
    point is order-independent and exact for reachability."""
    edges = module_import_edges(repo)
    closure: dict[str, set[str]] = {p: {p} | deps for p, deps in edges.items()}
    changed = True
    while changed:
        changed = False
        for p, cl in closure.items():
            merged = set(cl)
            for d in cl:
                merged |= closure.get(d, {d})
            if merged != cl:
                closure[p] = merged
                changed = True
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


# ---------------------------------------------------------------------------
# Function-level change granularity.
#
# Module-granularity closure flags every query sharing a module when any
# function in it moves — the r7 backlog (77 flagged vs 50 head slots)
# was mostly such collateral. The refinement: diff modules at top-level
# unit (def/class) granularity, and only flag a query when a CHANGED
# unit is statically reachable from its entry callable. The reference
# graph over-approximates (every name/attribute reference is an edge,
# call or not; unresolvable constructs fall back to whole-module), so
# "not flagged" remains a proof, and module-closure stays the outer
# bound via the impl-path intersection.

#: A unit: (repo-relative module path, unit name). Units are top-level
#: defs/classes, top-level BOUND NAMES (constants, import aliases —
#: each carrying its own binding fingerprint so an added constant does
#: not flag the untouched rest of the module), and the ``<module>``
#: residue pseudo-unit holding every statement that cannot be
#: attributed to a name (conditionals, bare calls); every def/class
#: depends on the residue because it may mutate module state at import.
_SHARED_UNIT = "<module>"

Unit = tuple[str, str]

_DYNAMIC_RE = re.compile(r"\bgetattr\s*\(|\bglobals\s*\(\s*\)|\blocals\s*\(\s*\)")

_ASSIGNS = (ast.Assign, ast.AnnAssign, ast.AugAssign)


def _assign_target_names(node: ast.stmt) -> list[str] | None:
    """Plain bound names of a top-level assignment; None when any
    target is not a simple Name (attribute/subscript writes belong to
    the residue)."""
    if isinstance(node, ast.Assign):
        targets = node.targets
    elif isinstance(node, (ast.AnnAssign, ast.AugAssign)):
        targets = [node.target]
    else:
        return None
    names: list[str] = []
    for t in targets:
        elts = t.elts if isinstance(t, (ast.Tuple, ast.List)) else [t]
        for e in elts:
            if not isinstance(e, ast.Name):
                return None
            names.append(e.id)
    return names


def _semantic_dump(node: ast.AST) -> str:
    """Formatting-insensitive fingerprint of an AST node: ``ast.dump``
    with every docstring stripped (recursively), so docstring-only,
    comment-only, and whitespace-only edits never invalidate a green
    row — they cannot change behavior."""
    import copy

    node = copy.deepcopy(node)
    for n in ast.walk(node):
        body = getattr(n, "body", None)
        if (
            isinstance(
                n,
                (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef, ast.Module),
            )
            and body
            and isinstance(body[0], ast.Expr)
            and isinstance(body[0].value, ast.Constant)
            and isinstance(body[0].value.value, str)
        ):
            del body[0]
            if not body:
                body.append(ast.Pass())
    return ast.dump(node)


def _unit_sources(text: str) -> dict[str, str]:
    """Module source → {unit name: change fingerprint}.

    def/class → its docstring-stripped AST dump; each name bound by a
    top-level assignment → the assignment's AST dump; each import
    alias → a normalized ``from X import Y`` descriptor (so extending
    an import list does not change the fingerprint of the aliases
    already in it); docstrings/bare string constants → ignored;
    everything else → concatenated under ``<module>``. A name bound
    twice concatenates fingerprints."""
    tree = ast.parse(text)
    units: dict[str, str] = {}

    def bind(name: str, fp: str) -> None:
        units[name] = units.get(name, "") + "\n" + fp if name in units else fp

    residue: list[str] = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            bind(node.name, _semantic_dump(node))
        elif isinstance(node, ast.Import):
            for alias in node.names:
                bind(
                    alias.asname or alias.name.partition(".")[0],
                    f"import {alias.name}",
                )
        elif isinstance(node, ast.ImportFrom):
            for alias in node.names:
                bind(
                    alias.asname or alias.name,
                    f"from {'.' * node.level}{node.module or ''} "
                    f"import {alias.name}",
                )
        elif isinstance(node, _ASSIGNS) and (
            names := _assign_target_names(node)
        ) is not None:
            fp = _semantic_dump(node)
            for name in names:
                bind(name, fp)
        elif isinstance(node, ast.Expr) and isinstance(node.value, ast.Constant):
            continue  # docstring / bare literal — no runtime effect
        else:
            residue.append(_semantic_dump(node))
    if residue:
        bind(_SHARED_UNIT, "\n".join(residue))
    return units


def changed_units(repo: Path, commit: str, rel: str) -> set[str] | None:
    """Units of ``rel`` whose fingerprint differs between ``commit``
    and the working tree (added/removed/edited all count; a changed
    residue appears as ``<module>``, which every def/class reaches).
    ``None`` = the whole module must count as changed: file absent on
    either side or unparseable."""
    cur_path = repo / rel
    if not cur_path.is_file():
        return None
    cur = cur_path.read_text()
    try:
        old = _git(repo, "show", f"{commit}:{rel}")
    except subprocess.CalledProcessError:
        return None
    if cur == old:
        return set()
    try:
        cur_units = _unit_sources(cur)
        old_units = _unit_sources(old)
    except SyntaxError:
        return None
    return {
        name
        for name in set(cur_units) | set(old_units)
        if cur_units.get(name) != old_units.get(name)
    }


def _attr_chain(node: ast.Attribute) -> list[str] | None:
    """a.b.c.d → ['a','b','c','d'] when the base is a plain Name."""
    parts: list[str] = []
    cur: ast.expr = node
    while isinstance(cur, ast.Attribute):
        parts.append(cur.attr)
        cur = cur.value
    if isinstance(cur, ast.Name):
        parts.append(cur.id)
        parts.reverse()
        return parts
    return None


def reference_graph(
    repo: Path,
) -> tuple[dict[str, set[str]], dict[Unit, set[Unit]], set[str]]:
    """Static unit-level reference graph of the via_spark package.

    Returns ``(units, edges, opaque)``: per-module top-level unit
    names; per-unit referenced units (same-module names, ``from …
    import`` bindings, module-alias and fully-dotted attribute access —
    references, not just calls, so functions passed as values count);
    and the modules whose internals defeat static resolution
    (getattr/globals/locals/star-import — reachability there falls back
    to the whole module import closure).

    Every real unit depends on its module's ``<module>`` pseudo-unit
    (the shared top-level code), whose own edges are the references
    made by that shared code — so a changed function invoked at import
    time flags everything importing the module, transitively.
    """
    pkg = repo / "via_spark"
    sources: dict[str, str] = {
        str(py.relative_to(repo)): py.read_text() for py in pkg.rglob("*.py")
    }
    trees = {rel: ast.parse(src) for rel, src in sources.items()}
    # all diffable unit names per module (defs/classes AND bound names),
    # so a reference to an imported constant resolves to its unit
    units: dict[str, set[str]] = {
        rel: set(_unit_sources(src)) for rel, src in sources.items()
    }
    opaque: set[str] = set()
    edges: dict[Unit, set[Unit]] = {}

    for rel, tree in trees.items():
        if _DYNAMIC_RE.search(sources[rel]):
            opaque.add(rel)
        # name → targets, collected module-wide so function-local
        # imports bind too (union on collision: over-inclusion only).
        mod_alias: dict[str, set[str]] = {}
        from_bind: dict[str, set[Unit]] = {}
        for node in ast.walk(tree):
            if isinstance(node, ast.ImportFrom):
                if not node.module or not (
                    node.module == "via_spark"
                    or node.module.startswith("via_spark.")
                ):
                    continue
                mf = _module_file(repo, node.module)
                for alias in node.names:
                    if alias.name == "*":
                        opaque.add(rel)
                        continue
                    bound = alias.asname or alias.name
                    if mf:
                        from_bind.setdefault(bound, set()).add((mf, alias.name))
                    else:
                        sub = _module_file(repo, f"{node.module}.{alias.name}")
                        target = sub or _module_file(
                            repo, f"{node.module}.__init__"
                        )
                        if target:
                            mod_alias.setdefault(bound, set()).add(target)
            elif isinstance(node, ast.Import):
                for alias in node.names:
                    if alias.name.startswith("via_spark") and alias.asname:
                        mf = _module_file(repo, alias.name)
                        if mf:
                            mod_alias.setdefault(alias.asname, set()).add(mf)

        def refs(root: ast.AST) -> set[Unit]:
            out: set[Unit] = set()
            skip: set[int] = set()  # Name nodes consumed as attr bases
            for node in ast.walk(root):
                if isinstance(node, ast.Attribute):
                    chain = _attr_chain(node)
                    if not chain:
                        continue
                    base = chain[0]
                    if base == "via_spark":
                        # fully-dotted: longest prefix that is a module
                        for i in range(len(chain) - 1, 0, -1):
                            mf = _module_file(repo, ".".join(chain[:i]))
                            if mf:
                                if i < len(chain) and chain[i] in units.get(mf, ()):
                                    out.add((mf, chain[i]))
                                break
                    elif base in mod_alias and len(chain) > 1:
                        for m in mod_alias[base]:
                            if chain[1] in units.get(m, ()):
                                out.add((m, chain[1]))
                        # attr resolved against the module alias — the
                        # bare-Name fallback must not fan out to every
                        # unit of the module
                        cur: ast.expr = node
                        while isinstance(cur, ast.Attribute):
                            cur = cur.value
                        skip.add(id(cur))
            for node in ast.walk(root):
                if (
                    isinstance(node, ast.Name)
                    and isinstance(node.ctx, ast.Load)
                    and id(node) not in skip
                ):
                    if node.id in units[rel]:
                        out.add((rel, node.id))
                    if node.id in from_bind:
                        for m, u in from_bind[node.id]:
                            if u in units.get(m, ()):
                                out.add((m, u))
                            else:
                                # imported name with no matching unit
                                # (re-export, dynamic attr) — depend on
                                # the module's residue conservatively
                                out.add((m, _SHARED_UNIT))
                    if node.id in mod_alias:
                        # bare module reference passed as a value —
                        # anything in it may be used
                        for m in mod_alias[node.id]:
                            out.update((m, u) for u in units.get(m, ()))
                            out.add((m, _SHARED_UNIT))
            return out

        shared_out: set[Unit] = set()
        for n in tree.body:
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                # depends on the residue: import-time statements may
                # mutate state the function reads
                edges[(rel, n.name)] = refs(n) | {(rel, _SHARED_UNIT)}
            elif isinstance(n, (ast.Import, ast.ImportFrom)):
                # the alias units' semantic content is their target,
                # already edged at every reference site
                continue
            elif isinstance(n, _ASSIGNS) and (
                names := _assign_target_names(n)
            ) is not None:
                stmt_refs = refs(n)
                for name in names:
                    edges[(rel, name)] = edges.get((rel, name), set()) | stmt_refs
            elif isinstance(n, ast.Expr) and isinstance(n.value, ast.Constant):
                continue
            else:
                shared_out |= refs(n)
        edges[(rel, _SHARED_UNIT)] = shared_out
    return units, edges, opaque


def query_reach(repo: Path, queries: dict) -> dict[str, set[Unit]]:
    """query name → every unit statically reachable from its entry
    callable (plus, for ``WRAPPER_DEPS`` queries, every unit of the
    declared modules). Opaque modules expand to their whole module
    import closure."""
    units, edges, opaque = reference_graph(repo)
    mod_closure = module_import_closure(repo)
    out: dict[str, set[Unit]] = {}
    for name, fn in queries.items():
        roots: set[Unit] = set()
        for dep in WRAPPER_DEPS.get(name, ()):
            roots |= {(dep, u) for u in units.get(dep, ())}
            roots.add((dep, _SHARED_UNIT))
        mod = sys.modules.get(fn.__module__)
        mf = getattr(mod, "__file__", None)
        rel: str | None = None
        if mf:
            try:
                rel = str(Path(mf).resolve().relative_to(repo))
            except ValueError:
                rel = None
        if rel and rel != "__spark_entry__.py":
            top = fn.__qualname__.split(".")[0]
            if top in units.get(rel, set()):
                roots.add((rel, top))
            else:
                roots |= {(rel, u) for u in units.get(rel, ())}
                roots.add((rel, _SHARED_UNIT))
        seen = set(roots)
        frontier = list(roots)
        while frontier:
            u = frontier.pop()
            for v in edges.get(u, ()):
                if v not in seen:
                    seen.add(v)
                    frontier.append(v)
            if u[0] in opaque:
                for om in mod_closure.get(u[0], {u[0]}):
                    for ou in units.get(om, set()) | {_SHARED_UNIT}:
                        v = (om, ou)
                        if v not in seen:
                            seen.add(v)
                            frontier.append(v)
        out[name] = seen
    return out


#: Queries whose oracle builder does not follow the ``<query>_sql``
#: naming convention (parameterized variants sharing one builder).
ORACLE_FN_EXCEPTIONS: dict[str, str] = {
    "rhythm_novelty_small_baseline": "rhythm_anomalies_sql",
    "rhythm_frequency_sensitive": "rhythm_anomalies_sql",
}

_ORACLES_REL = "via_spark/oracles.py"


def _oracle_fn_sources(text: str) -> dict[str, str]:
    """oracles.py source → {unit name: fingerprint} — same splitter as
    the operator-module diff (builders are function units; shared CTE
    constants are binding units; residue under ``<module>``)."""
    return _unit_sources(text)


def _local_unit_closure(text: str) -> dict[str, set[str]]:
    """Intra-module reference closure: unit → every unit transitively
    referenced by name inside it (self included). Single-module version
    of ``reference_graph`` for oracles.py, whose helpers are all local."""
    tree = ast.parse(text)
    names = set(_unit_sources(text))
    edges: dict[str, set[str]] = {}

    def refs(node: ast.AST) -> set[str]:
        return {
            n.id
            for n in ast.walk(node)
            if isinstance(n, ast.Name)
            and isinstance(n.ctx, ast.Load)
            and n.id in names
        }

    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            edges[node.name] = refs(node)
        elif isinstance(node, _ASSIGNS) and (
            tgt := _assign_target_names(node)
        ) is not None:
            for name in tgt:
                edges[name] = edges.get(name, set()) | refs(node)
    closure = {n: {n} | e for n, e in edges.items()}
    changed = True
    while changed:
        changed = False
        for n, cl in closure.items():
            merged = set(cl)
            for d in cl:
                merged |= closure.get(d, {d})
            if merged != cl:
                closure[n] = merged
                changed = True
    return closure


def oracle_changed_queries(
    repo: Path, commit: str, query_names: list[str]
) -> set[str]:
    """Queries whose ORACLE contract changed since ``commit`` — the
    driver verifies query AND oracle together, so an edited oracle
    invalidates a green row exactly like edited operator code (the r7
    session-window gap fix changed only oracles.py). Compared at
    per-unit granularity from source TEXT (``git show`` + AST — no
    historical import needed); a changed shared helper/constant flags
    exactly the builders that transitively reference it (intra-module
    closure); only a changed RESIDUE statement — or an unparseable
    state — still flags every query."""
    cur = (repo / _ORACLES_REL).read_text()
    try:
        old = _git(repo, "show", f"{commit}:{_ORACLES_REL}")
    except subprocess.CalledProcessError:
        return set(query_names)  # file absent at that commit
    if cur == old:
        return set()
    cur_fns = _oracle_fn_sources(cur)
    old_fns = _oracle_fn_sources(old)
    changed = {
        name
        for name in set(cur_fns) | set(old_fns)
        if cur_fns.get(name) != old_fns.get(name)
    }
    if _SHARED_UNIT in changed:
        return set(query_names)
    closure = _local_unit_closure(cur)
    builder_of = {
        q: ORACLE_FN_EXCEPTIONS.get(q, f"{q}_sql") for q in query_names
    }
    return {
        q
        for q, fn in builder_of.items()
        if changed & closure.get(fn, {fn})
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
    reach = query_reach(repo, queries)
    names = list(queries)
    commits: dict[int, str | None] = {}
    diffs: dict[int, set[str]] = {}
    oracle_changed: dict[int, set[str]] = {}
    units_cache: dict[tuple[int, str], set[str] | None] = {}
    required: list[tuple[int, str]] = []
    for name in names:
        g = greens.get(name)
        if g is None:
            required.append((-1, name))
            continue
        if g not in commits:
            c = commits[g] = round_commit(repo, g)
            diffs[g] = changed_paths_since(repo, c) if c else set()
            oracle_changed[g] = (
                oracle_changed_queries(repo, c, names) if c else set()
            )
        c = commits[g]
        if c is None:
            # Green rows with no resolvable artifact commit (file never
            # committed) have no "verified as of" baseline — fail
            # CLOSED and re-verify rather than granting unanchored
            # green credit.
            required.append((g, name))
            continue
        if name in oracle_changed[g]:
            required.append((g, name))
            continue
        for p in impl[name] & diffs[g]:
            if (g, p) not in units_cache:
                units_cache[(g, p)] = changed_units(repo, c, p)
            cu = units_cache[(g, p)]
            if cu is None or cu & {u for m, u in reach[name] if m == p}:
                required.append((g, name))
                break
    return [name for _, name in sorted(required)]


def suggested_full_head(
    repo: Path, queries: dict, cap: int = 50
) -> list[str]:
    """The required queries (stalest first), then — when slots remain —
    the stalest GREEN queries as fill: re-verifying an old-but-
    unchanged green re-anchors its baseline at the new round's commit,
    shrinking every future diff set, so spare head slots should always
    go to the oldest anchors."""
    head = recommended_head(repo, queries)[:cap]
    if len(head) < cap:
        greens = newest_green_rounds(repo)
        fill = sorted(
            (q for q in queries if q not in set(head)),
            key=lambda q: (greens.get(q, -1), q),
        )
        head += fill[: cap - len(head)]
    return head


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
    full = suggested_full_head(repo, qs)
    print("\n# suggested full 50-row head (required + stalest-green fill):")
    for name in full:
        print(name)


if __name__ == "__main__":
    main()
