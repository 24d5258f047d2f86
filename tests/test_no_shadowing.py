"""Guard against silent top-level name shadowing.

Two sessions independently added a `q_rollup` (and later a `q_pivot`) to the
same module; Python silently keeps the LAST definition, turning the earlier
operator into dead code and — worse — swapping which implementation a
registry entry resolves to.  This test fails the moment any module defines
the same top-level function/class/constant twice.
"""

import ast
import collections
import pathlib

PKG = pathlib.Path(__file__).resolve().parent.parent / "entity_resolution_pipeline_ray"


def test_no_duplicate_toplevel_definitions():
    offenders = {}
    for f in PKG.rglob("*.py"):
        tree = ast.parse(f.read_text())
        names = [n.name for n in tree.body if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef))]
        names += [
            t.id
            for n in tree.body
            if isinstance(n, ast.Assign)
            for t in n.targets
            if isinstance(t, ast.Name)
        ]
        dups = [k for k, v in collections.Counter(names).items() if v > 1]
        if dups:
            offenders[str(f)] = dups
    assert not offenders, f"shadowed top-level names: {offenders}"


def test_registry_keys_unique_in_source():
    """Dict literals silently keep the last duplicate key — scan the
    __ray_entry__ source for repeated string keys inside queries()/oracle_sql()."""
    src = (PKG.parent / "__ray_entry__.py").read_text()
    tree = ast.parse(src)
    for fn in tree.body:
        if not (isinstance(fn, ast.FunctionDef) and fn.name in ("queries", "oracle_sql")):
            continue
        for node in ast.walk(fn):
            if isinstance(node, ast.Dict):
                keys = [k.value for k in node.keys if isinstance(k, ast.Constant)]
                dups = [k for k, v in collections.Counter(keys).items() if v > 1]
                assert not dups, f"duplicate registry keys in {fn.name}: {dups}"
