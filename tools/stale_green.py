"""Stale-green detector for the registry rotation (VERDICT r6 #4).

The driver's per-round correctness gate verifies only the FIRST 50
entries of ``queries()``; long-stable queries keep their green from an
earlier round.  That policy is sound ONLY if every query whose
behavior changed since its last green is re-listed in the prefix
(registry section B) — previously a by-hand discipline.  This tool
makes it mechanical:

- For each registered query, compute a content hash over
  (a) its rendered oracle SQL string (runtime — catches constant and
      oracle edits),
  (b) the ``q_*`` function's source,
  (c) the source of every entry-file helper and ``pkg/`` function in
      its TRANSITIVE reference closure (textual name-reference BFS —
      approximate, deliberately over-inclusive: a false positive
      re-verifies a green query, a false negative would hide a stale
      one).  The BFS follows CODE words only (docstrings and comments
      are stripped before the word scan, r11): prose like "mirrors
      lsh_similar_pairs" is not a dependency, and following it had
      saturated closures to ~380 functions so that ANY pkg edit
      flagged most of the registry and the >50-entry changed set
      could not fit the driver's 50-slot prefix.  Hashes still cover
      the FULL source (docstrings included) of every closure member,
      so a docstring-only edit of a real dependency still re-flags.
      And
  (d) the source of entry-file module constants it references.
- ``--record`` snapshots hashes to tools/stale_green_hashes.json after
  a green sweep; ``--check`` (the round-end gate) lists queries whose
  hash moved since the snapshot and EXITS 1 if any of them is not in
  the 50-entry driver prefix (an unpromoted change).

Usage:
  python tools/stale_green.py --check     # gate: exit 1 on unpromoted
  python tools/stale_green.py --record    # after a green --exact sweep
"""

from __future__ import annotations

import ast
import hashlib
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PKG = "etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark"
ENTRY = os.path.join(REPO, "__spark_entry__.py")
HASHES = os.path.join(REPO, "tools", "stale_green_hashes.json")
PREFIX = 50


def _top_level_sources(path: str) -> tuple[dict, dict]:
    """(functions, constants): name -> source segment for every
    top-level def and simple assignment in a module."""
    src = open(path).read()
    tree = ast.parse(src)
    funcs: dict[str, str] = {}
    consts: dict[str, str] = {}
    for node in tree.body:
        seg = ast.get_source_segment(src, node)
        if seg is None:
            continue
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            funcs[node.name] = seg
        elif isinstance(node, ast.ClassDef):
            # classes hash as a unit under their name (r11): method
            # edits (LogStore.put_if_absent, the CDF stream reader)
            # were invisible to the closure before this
            funcs[node.name] = seg
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    consts[t.id] = seg
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            consts[node.target.id] = seg
    return funcs, consts


def _pkg_functions() -> dict[str, str]:
    """qualified 'module.func' -> source, for every pkg module.
    Includes classes (hashed as a unit) and module-level constants
    (r11): a const like ``_LOG_STORES = {"": LocalLinkLogStore()}``
    is the code path from ``_commit`` to the LogStore classes, so
    skipping consts hid class edits from every writer's closure."""
    out: dict[str, str] = {}
    for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
        for name in files:
            if not name.endswith(".py"):
                continue
            path = os.path.join(root, name)
            mod = os.path.splitext(os.path.relpath(path, REPO))[0].replace(
                os.sep, "."
            )
            funcs, consts = _top_level_sources(path)
            for fn, seg in funcs.items():
                out[f"{mod}.{fn}"] = seg
            for cn, seg in consts.items():
                out[f"{mod}.{cn}"] = seg
    return out


def _word_index(names: "list[str]") -> dict[str, "list[str]"]:
    """bare final name -> qualified names holding it (for textual
    reference scanning)."""
    idx: dict[str, list[str]] = {}
    for qn in names:
        idx.setdefault(qn.rsplit(".", 1)[-1], []).append(qn)
    return idx


def compute_hashes() -> "dict[str, str]":
    import importlib.util

    spec = importlib.util.spec_from_file_location("__spark_entry__", ENTRY)
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    qmap = entry.queries()
    oracles = entry.oracle_sql()

    entry_funcs, entry_consts = _top_level_sources(ENTRY)
    pkg_funcs = _pkg_functions()
    pkg_idx = _word_index(list(pkg_funcs))
    entry_fn_names = set(entry_funcs)
    const_names = set(entry_consts)
    word_re = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")

    def code_text(text: str) -> str:
        """Strip docstrings/comments so the reference scan follows only
        code words — prose mentions are not dependencies (r11)."""
        text = re.sub(r'"""[\s\S]*?"""', "", text)
        text = re.sub(r"'''[\s\S]*?'''", "", text)
        return re.sub(r"#[^\n]*", "", text)

    def closure(seed_src: str) -> "tuple[set, set, set]":
        """(entry funcs, pkg funcs, entry consts) textually reachable."""
        efuncs: set[str] = set()
        pfuncs: set[str] = set()
        consts: set[str] = set()
        frontier = [seed_src]
        while frontier:
            text = code_text(frontier.pop())
            words = set(word_re.findall(text))
            for w in words & entry_fn_names:
                if w not in efuncs:
                    efuncs.add(w)
                    frontier.append(entry_funcs[w])
            for w in words & const_names:
                consts.add(w)
            for w in words:
                for qn in pkg_idx.get(w, ()):
                    if qn not in pfuncs:
                        pfuncs.add(qn)
                        frontier.append(pkg_funcs[qn])
        return efuncs, pfuncs, consts

    out: dict[str, str] = {}
    for qname, fn in qmap.items():
        fname = getattr(fn, "__name__", None)
        seed = entry_funcs.get(fname, "")
        efuncs, pfuncs, consts = closure(seed)
        h = hashlib.sha256()
        h.update((oracles.get(qname) or "").encode())
        h.update(seed.encode())
        for name in sorted(efuncs):
            if name != fname:
                h.update(entry_funcs[name].encode())
        for name in sorted(consts):
            h.update(entry_consts[name].encode())
        for qn in sorted(pfuncs):
            h.update(pkg_funcs[qn].encode())
        out[qname] = h.hexdigest()
    return out


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "--check"
    hashes = compute_hashes()
    if mode == "--record":
        with open(HASHES, "w") as fh:
            json.dump(hashes, fh, indent=0, sort_keys=True)
        print(json.dumps({"recorded": len(hashes)}))
        return
    recorded = {}
    if os.path.isfile(HASHES):
        recorded = json.load(open(HASHES))
    changed = [q for q in hashes if hashes[q] != recorded.get(q)]
    prefix = list(hashes)[:PREFIX]  # dict order == registry order
    unpromoted = [q for q in changed if q not in prefix]
    dropped = [q for q in recorded if q not in hashes]
    # changed_count is THE round's changed-set number: docs (registry
    # docstring, SCALE.md) must quote this output verbatim instead of
    # hand-counting — three disagreeing hand-written counts shipped in
    # r11 (VERDICT r11 "what's wrong" #1)
    print(
        json.dumps(
            {
                "changed_count": len(changed),
                "changed": changed,
                "unpromoted_changed": unpromoted,
                "dropped_since_record": dropped,
            }
        )
    )
    if unpromoted:
        sys.exit(1)


if __name__ == "__main__":
    main()
