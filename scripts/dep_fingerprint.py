"""Per-query dependency fingerprints for the driver-gate rotation rule.

The driver's correctness gate covers only the FIRST 50 registry entries,
so a query may sit in the tail ONLY while the code it transitively depends
on is byte-identical to what its last green driver round actually ran
(VERDICT r3 "next round" #1: generalize the hard-coded tail-safe set to a
staleness rule).

`query_fingerprint(name)` hashes, at FUNCTION granularity:
  * the query function's own source,
  * the source of every package function/class it transitively references
    (resolved through each function's code object: co_names looked up in
    its __globals__, recursing through nested lambdas/comprehensions via
    co_consts),
  * module-level constants it references (repr-hashed),
  * the query's oracle SQL string.

Function granularity matters: editing one operator in a 300-line module
must not mark every query that imports a *different* function from that
module as stale (e.g. fixing repetition_scores must not evict bm25_search,
which shares text_quality._tokens, from the tail).

Objects whose source can't be recovered (pandas_udf wrappers, C extension
handles) fall back to hashing their defining module's whole file —
conservative in the right direction (more staleness, never less).

`tests/driver_verified_hashes.json` is the manifest of fingerprints as of
each query's last green driver round; refresh it with
`python scripts/refresh_dep_manifest.py <round>` as the LAST step of a
round (after all code changes), which stamps window queries with the
imminent round and verifies tail queries' hashes are unchanged.
"""

from __future__ import annotations

import ast
import hashlib
import importlib
import inspect
import os
import re
import sys
import textwrap
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

PKG = "wikicrawler_spark"


def _in_pkg_module(modname: str | None) -> bool:
    return bool(modname) and (
        modname == PKG or modname.startswith(PKG + ".")
        or modname == "__spark_entry__"
    )


def _module_file_text(mod) -> str:
    f = getattr(mod, "__file__", None)
    if f and os.path.exists(f):
        with open(f, "r") as fh:
            return fh.read()
    return repr(mod)


def _contains_set(v) -> bool:
    if isinstance(v, (set, frozenset)):
        return True
    if isinstance(v, (tuple, list)):
        return any(_contains_set(e) for e in v)
    if isinstance(v, dict):
        return any(_contains_set(k) or _contains_set(x) for k, x in v.items())
    return False


def _canon(v) -> str:
    """Order-independent repr for set-bearing structures."""
    if isinstance(v, (set, frozenset)):
        tag = "frozenset" if isinstance(v, frozenset) else "set"
        return tag + "({" + ", ".join(sorted(_canon(e) for e in v)) + "})"
    if isinstance(v, tuple):
        inner = ", ".join(_canon(e) for e in v)
        return "(" + inner + ("," if len(v) == 1 else "") + ")"
    if isinstance(v, list):
        return "[" + ", ".join(_canon(e) for e in v) + "]"
    if isinstance(v, dict):
        return "{" + ", ".join(f"{_canon(k)}: {_canon(x)}"
                               for k, x in v.items()) + "}"
    return repr(v)


def _const_repr(v) -> str:
    """repr() for constant records, but stable across processes: plain
    repr() of a set/frozenset follows per-process hash-randomized iteration
    order (ADVICE r4 medium), so set-bearing values are rendered with their
    elements sorted by canonical repr. Values with no sets keep the exact
    repr() text so existing manifest fingerprints are unaffected."""
    return _canon(v) if _contains_set(v) else repr(v)


#: Module-level RUNTIME MEMO caches: mutable dicts that fill as the kernel
#: runs but are empty at import. Their contents are execution state, not
#: code — hashing the live value made a query's fingerprint depend on what
#: ELSE ran in the process (found in r6: the in-suite guard test computed
#: different fingerprints than a fresh process once earlier tests had
#: exercised the tokenizer). Record them at their import-time EMPTY state,
#: which is byte-identical to what every fresh-process manifest stamp
#: recorded, so existing manifest hashes stay valid.
_RUNTIME_CACHES = {
    ("wikicrawler_spark.html_tokenizer", "_ATTRS_CACHE"),
    ("wikicrawler_spark.html_tokenizer", "_FRAG_MEMO"),
    # staging-dir ledger: fills with reserved paths as staging queries run
    ("wikicrawler_spark.staging", "_STAGED"),
}


def _const_record(modname: str, attr: str, v) -> str:
    if (modname, attr) in _RUNTIME_CACHES:
        return _const_repr(type(v)())
    return _const_repr(v)


def _all_names(code) -> set:
    """co_names of a code object plus all nested code objects (lambdas,
    comprehensions, inner defs)."""
    names = set(code.co_names) | set(code.co_freevars)
    for c in code.co_consts:
        if isinstance(c, types.CodeType):
            names |= _all_names(c)
    return names


def _local_imports(src: str, defining_module: str) -> list:
    """Objects pulled in by import statements INSIDE a function body (they
    bypass __globals__, e.g. `from .pipeline.curate import curate_corpus`
    inside q_training_corpus)."""
    out = []
    try:
        tree = ast.parse(textwrap.dedent(src))
    except SyntaxError:
        return out
    pkg_parts = defining_module.split(".")
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module is not None or \
                isinstance(node, ast.ImportFrom) and node.level:
            if node.level:  # relative: resolve against the defining module
                base = ".".join(pkg_parts[:len(pkg_parts) - node.level])
                modname = base + ("." + node.module if node.module else "")
            else:
                modname = node.module
            if not _in_pkg_module(modname):
                continue
            try:
                mod = importlib.import_module(modname)
            except ImportError:
                continue
            for alias in node.names:
                if hasattr(mod, alias.name):
                    out.append(getattr(mod, alias.name))
    return out


def _label(obj) -> str:
    mod = getattr(obj, "__module__", None) or ""
    qn = getattr(obj, "__qualname__", None) or getattr(obj, "__name__", repr(obj))
    return f"{mod}:{qn}"


def _closure_records(root_fn) -> list:
    """[(label, source_text)] for the transitive in-package dependency set
    of root_fn, deterministic order."""
    records = {}
    seen = set()
    stack = [root_fn]
    while stack:
        obj = stack.pop()
        if id(obj) in seen:
            continue
        seen.add(id(obj))

        if isinstance(obj, types.FunctionType):
            if not _in_pkg_module(obj.__module__):
                continue
            try:
                src = inspect.getsource(obj)
            except (OSError, TypeError):
                src = _module_file_text(inspect.getmodule(obj))
            records[_label(obj)] = src
            stack.extend(_local_imports(src, obj.__module__))
            g = obj.__globals__
            names = _all_names(obj.__code__)
            for name in sorted(names):
                if name not in g:
                    continue
                v = g[name]
                if isinstance(v, types.ModuleType):
                    if not _in_pkg_module(v.__name__):
                        continue
                    # attribute accesses on the module appear in the same
                    # co_names set: push every module attribute whose name
                    # is referenced by this function
                    for attr in sorted(names):
                        if attr == name or not hasattr(v, attr):
                            continue
                        av = getattr(v, attr)
                        if isinstance(av, re.Pattern):
                            records[f"{v.__name__}:re:{attr}"] = \
                                f"{av.pattern!r}|{av.flags}"
                        elif isinstance(av, (str, int, float, bool, tuple,
                                             frozenset, bytes, list, dict,
                                             set)):
                            records[f"{v.__name__}:const:{attr}"] = \
                                _const_record(v.__name__, attr, av)
                        else:
                            stack.append(av)
                elif isinstance(v, (types.FunctionType, type)):
                    stack.append(v)
                elif callable(v) and _in_pkg_module(
                        getattr(v, "__module__", None)):
                    stack.append(v)  # UDF wrappers etc.
                elif isinstance(v, re.Pattern) \
                        and _in_pkg_module(g.get("__name__")):
                    records[f"{g['__name__']}:re:{name}"] = \
                        f"{v.pattern!r}|{v.flags}"
                elif isinstance(v, (str, int, float, bool, tuple, frozenset,
                                    bytes, list, dict, set)) \
                        and _in_pkg_module(g.get("__name__")):
                    records[f"{g['__name__']}:const:{name}"] = \
                        _const_record(g["__name__"], name, v)
        elif isinstance(obj, type):
            if not _in_pkg_module(obj.__module__):
                continue
            try:
                records[_label(obj)] = inspect.getsource(obj)
            except (OSError, TypeError):
                records[_label(obj)] = _module_file_text(inspect.getmodule(obj))
        elif callable(obj):
            # pandas_udf / ctypes wrappers: no retrievable source — hash the
            # defining module file (conservative)
            modname = getattr(obj, "__module__", None)
            if _in_pkg_module(modname):
                mod = sys.modules.get(modname)
                if mod is not None:
                    records[f"{modname}:modulefile"] = _module_file_text(mod)
    return sorted(records.items())


def query_fingerprint(name: str) -> str:
    import __spark_entry__ as entrymod

    fn = entrymod.queries()[name]
    h = hashlib.sha256()
    for label, src in _closure_records(fn):
        h.update(label.encode())
        h.update(b"\x00")
        h.update(src.encode())
        h.update(b"\x01")
    oracle = entrymod.oracle_sql().get(name)
    if oracle is not None:
        h.update(b"oracle\x00" + oracle.encode())
    return h.hexdigest()


def all_fingerprints() -> dict:
    import __spark_entry__ as entrymod

    return {n: query_fingerprint(n) for n in entrymod.queries()}


if __name__ == "__main__":
    import json

    print(json.dumps(all_fingerprints(), indent=1))
