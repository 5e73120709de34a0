"""Cache-hygiene census (VERDICT.md r3 task 5).

Every `.cache()` / `.persist()` in the package pins executor memory until
someone unpersists it. Two lifetimes are acceptable, and every site must
declare which one it has:

1. **Loop-scoped** — the enclosing function itself calls `.unpersist()`
   once an action has materialized the successor (the iterative-loop
   discipline: bpe._learn_merges, iterative.cc_labels).

2. **Session-per-query** — the cached frame feeds the RETURNED lazy
   DataFrame, so the builder cannot unpersist before the caller's action
   runs. The pin lives until the session ends (the driver and bench run
   one session per query / clear between rounds, so this is bounded in
   practice, but a long-lived interactive session accumulates pins).
   These sites carry a `# session-per-query` tag within two lines of the
   cache call, which is the documented opt-in to that trade.

This test fails on any cache site with NEITHER an unpersist in the same
function NOR the tag — so new caches must pick a lifetime explicitly.
"""

from __future__ import annotations

import ast
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "steam_prices_data_engineering_spark"

TAG = "session-per-query"
CACHE_METHODS = {"cache", "persist"}


def _cache_sites(tree: ast.AST) -> list[int]:
    """Line numbers of every .cache()/.persist() call."""
    out = []
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr in CACHE_METHODS
        ):
            # end_lineno of the func attribute = the line holding the
            # literal `.cache` token (chains start lines earlier).
            out.append(node.func.end_lineno or node.lineno)
    return out


def _function_spans(tree: ast.AST) -> list[tuple[int, int]]:
    spans = []
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            spans.append((node.lineno, node.end_lineno))
    return spans


def _unpersist_lines(tree: ast.AST) -> list[int]:
    out = []
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "unpersist"
        ):
            out.append(node.lineno)
    return out


def test_every_cache_site_declares_its_lifetime():
    offenders: list[str] = []
    for path in sorted(PKG.rglob("*.py")):
        src = path.read_text()
        if ".cache()" not in src and ".persist(" not in src:
            continue
        tree = ast.parse(src)
        lines = src.splitlines()
        unpersists = _unpersist_lines(tree)
        spans = _function_spans(tree)
        for ln in _cache_sites(tree):
            # innermost function containing the cache call
            enclosing = [
                (a, b) for a, b in spans if a <= ln <= b
            ]
            if enclosing:
                a, b = max(enclosing, key=lambda s: s[0])
                if any(a <= u <= b for u in unpersists):
                    continue  # loop-scoped lifetime
            window = lines[max(0, ln - 3) : min(len(lines), ln + 2)]
            if any(TAG in w for w in window):
                continue  # declared session-per-query
            offenders.append(f"{path.relative_to(PKG.parent)}:{ln}")
    assert not offenders, (
        "cache sites with no unpersist in the enclosing function and no "
        f"'# {TAG}' tag within 2 lines:\n  " + "\n  ".join(offenders)
    )
