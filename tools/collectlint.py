"""Bounded-`.collect()` lint (VERDICT r11 item #5).

Every driver-side `.collect()` in the non-test package must be a
BOUNDED collect — a K-row centroid/anchor/report frame, never
corpus-sized — and the house convention is to say so in a nearby
comment. This lint makes the convention mandatory: an AST scan fails
unless each `.collect()` call has a comment containing the word
"bounded" (case-insensitive) within the preceding WINDOW lines or on
the call's own lines, stating the bound. tests/test_operators.py runs
it as part of the suite, so an unjustified collect cannot land.

Reference parity note: the reference archiver (main.go) has no
distributed collect concept; this polices OUR 100 TB discipline —
a `.collect()` without a stated bound is how driver-OOM regressions
sneak into a growing registry.

Usage:  python tools/collectlint.py          # scan, print violations
        from collectlint import violations   # [] when clean
"""

from __future__ import annotations

import ast
import os
import re
import sys

WINDOW = 8  # comment must appear within this many lines above the call
_JUSTIFIED = re.compile(r"#.*bounded", re.IGNORECASE)

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pg_archiver_spark",
)


def _collect_calls(tree: ast.AST):
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "collect"
        ):
            yield node


def violations(pkg_dir: str = PKG) -> list[str]:
    out: list[str] = []
    for root, _dirs, files in os.walk(pkg_dir):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            with open(path) as f:
                src = f.read()
            lines = src.splitlines()
            tree = ast.parse(src, filename=path)
            for call in _collect_calls(tree):
                lo = max(0, call.lineno - 1 - WINDOW)
                hi = call.end_lineno or call.lineno
                ctx = "\n".join(lines[lo:hi])
                if not _JUSTIFIED.search(ctx):
                    rel = os.path.relpath(path, os.path.dirname(pkg_dir))
                    out.append(f"{rel}:{call.lineno}")
    return out


if __name__ == "__main__":
    v = violations()
    for site in v:
        print(f"UNJUSTIFIED .collect(): {site} — add a '# bounded: ...' "
              "comment stating the row bound within the preceding "
              f"{WINDOW} lines")
    print(f"{len(v)} unjustified collect site(s)")
    sys.exit(1 if v else 0)
