"""Version / range matching — the depversion library analog.

The reference ships a semver range matcher used by dependency
resolution (`WhichVersionMatches` / `DoesRangeInclude`,
/root/reference/pkg/misc/depversion/depversion.go:43-140): given a set
of known versions and a range expression, return the matching subset.
Re-implemented from the published semver/node-range semantics (not a
port): comparators (=, >, >=, <, <=), caret (^), tilde (~), wildcards
(1.2.x / 1.2.*), hyphen ranges ("1.2.3 - 2.0.0"), space = AND,
"||" = OR.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_VER_RE = re.compile(
    r"^v?(\d+|[xX*])(?:\.(\d+|[xX*]))?(?:\.(\d+|[xX*]))?"
    r"(?:-([0-9A-Za-z.-]+))?(?:\+[0-9A-Za-z.-]+)?$")


@dataclass(frozen=True)
class Version:
    major: int
    minor: int
    patch: int
    pre: tuple = ()

    def key(self):
        # releases sort after any of their prereleases (semver §11)
        return (self.major, self.minor, self.patch,
                len(self.pre) == 0, self.pre)

    def __lt__(self, other: "Version"):
        return self.key() < other.key()

    def __le__(self, other: "Version"):
        return self.key() <= other.key()


def _pre_key(pre: str) -> tuple:
    out = []
    for part in pre.split("."):
        out.append((0, int(part), "") if part.isdigit() else (1, 0, part))
    return tuple(out)


def parse_version(s: str) -> Version | None:
    m = _VER_RE.match(s.strip())
    if not m or any(g in ("x", "X", "*") for g in m.groups()[:3] if g):
        # wildcard components are range syntax, not concrete versions
        if not m:
            return None
    g = m.groups()
    if any(x in ("x", "X", "*") for x in g[:3] if x is not None):
        return None
    return Version(int(g[0]), int(g[1] or 0), int(g[2] or 0),
                   _pre_key(g[3]) if g[3] else ())


def _bound(ver_s: str):
    """Parse a possibly-wildcard version into (floor Version, ceiling
    Version-or-None) for wildcard semantics."""
    m = _VER_RE.match(ver_s.strip())
    if not m:
        return None, None
    g = m.groups()
    parts = [g[0], g[1], g[2]]
    nums = []
    for p in parts:
        if p is None or p in ("x", "X", "*"):
            nums.append(None)
        else:
            nums.append(int(p))
    if nums[0] is None:
        return Version(0, 0, 0), None  # "*" matches everything
    if nums[1] is None:
        return Version(nums[0], 0, 0), Version(nums[0] + 1, 0, 0)
    if nums[2] is None:
        return (Version(nums[0], nums[1], 0),
                Version(nums[0], nums[1] + 1, 0))
    v = Version(nums[0], nums[1], nums[2], _pre_key(g[3]) if g[3] else ())
    return v, None


def _matches_comparator(v: Version, comp: str) -> bool:
    comp = comp.strip()
    if not comp or comp == "*":
        return True
    m = re.match(r"^(>=|<=|>|<|=|\^|~)?\s*(.+)$", comp)
    op, ver_s = (m.group(1) or "="), m.group(2)
    lo, hi = _bound(ver_s)
    if lo is None:
        return False
    if op == "=":
        return (lo <= v < hi) if hi else (v.key() == lo.key())
    if op == ">":
        # ">1.2.x" means ≥ the next minor/major (the whole wildcard
        # block is excluded); ">1.2.3" is a plain strict bound
        return v > lo if hi is None else v >= hi
    if op == ">=":
        return v >= lo
    if op == "<":
        return v < lo
    if op == "<=":
        return (v < hi) if hi else (v <= lo)
    if op == "^":
        if lo.major > 0:
            return lo <= v < Version(lo.major + 1, 0, 0)
        if lo.minor > 0:
            return lo <= v < Version(0, lo.minor + 1, 0)
        return lo <= v < Version(0, 0, lo.patch + 1)
    if op == "~":
        return lo <= v < Version(lo.major, lo.minor + 1, 0)
    return False


def range_includes(range_expr: str, version: str) -> bool:
    """Does ``range_expr`` include ``version``? (DoesRangeInclude)"""
    v = parse_version(version)
    if v is None:
        return False
    range_expr = range_expr.strip()
    for clause in range_expr.split("||"):
        clause = clause.strip()
        hy = re.match(r"^(.+?)\s+-\s+(.+)$", clause)
        if hy:
            lo, hi = parse_version(hy.group(1)), parse_version(hy.group(2))
            if lo is not None and hi is not None and lo <= v <= hi:
                return True
            continue
        comps = clause.split()
        if comps and all(_matches_comparator(v, c) for c in comps):
            return True
        if not comps and clause == "":
            return True
    return False


def which_versions_match(versions: list[str], range_expr: str) -> list[str]:
    """Subset of ``versions`` matched by ``range_expr``, input order
    (WhichVersionMatches)."""
    return [s for s in versions if range_includes(range_expr, s)]
