"""Guard the oracle SQL corpus against DuckDB-version rounding drift.

Round-2 lesson (VERDICT r02 "What's wrong" #1): ``CAST(x AS BIGINT)`` on a
fractional double rounds, and the rounding mode (half-to-even vs half-up)
differs across DuckDB builds — the local gate passed while the driver's
DuckDB produced a different hash for ``zonal_stats``.  Floor division
(``//``) and integer arithmetic are rounding-mode independent; float→int
CASTs on values that can land on a .5 boundary are not.

This test statically scans every oracle SQL string exported by
``__spark_entry__.oracle_sql()`` and rejects any ``CAST(expr AS
BIGINT/INT...)`` whose inner expression contains a ``/`` division — the
exact shape that bit us.  Integer ``//`` floor division is allowed.
"""

import re

import importlib.util
import pathlib

_ENTRY = pathlib.Path(__file__).resolve().parents[1] / "__spark_entry__.py"


def _load_entry():
    spec = importlib.util.spec_from_file_location("spark_entry_mod", _ENTRY)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# CAST( <inner> AS <int type> ) — non-greedy inner without nested parens is
# not enough (casts wrap function calls), so walk parens manually.
_CAST_RE = re.compile(r"CAST\s*\(", re.IGNORECASE)
_INT_TYPE_RE = re.compile(r"AS\s+(BIGINT|INT|INTEGER|SMALLINT|TINYINT|HUGEINT)\s*$",
                          re.IGNORECASE)


def _cast_bodies(sql: str):
    """Yield the full text inside each CAST(...) in sql (paren-balanced)."""
    for m in _CAST_RE.finditer(sql):
        depth = 1
        i = m.end()
        start = i
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        yield sql[start:i - 1]


_INTVAL_FN_RE = re.compile(r"(ceil|ceiling|floor|round)\s*\($", re.IGNORECASE)


def _has_unguarded_float_division(expr: str) -> bool:
    """True if expr contains a ``/`` (not ``//``) that is NOT inside a
    ceil/floor/round call.  ceil/floor/round produce integer-valued doubles
    whose int cast is exact regardless of rounding mode; a bare division is
    the dangerous .5-boundary shape."""
    # Walk chars tracking paren scopes; mark scopes opened by an
    # integer-valued function.
    scopes = []  # True if this paren scope is ceil/floor/round
    guarded_depth = 0
    i = 0
    n = len(expr)
    while i < n:
        c = expr[i]
        if c == "(":
            prefix = expr[:i].rstrip()
            is_intfn = bool(_INTVAL_FN_RE.search(prefix + "("))
            scopes.append(is_intfn)
            if is_intfn:
                guarded_depth += 1
        elif c == ")":
            if scopes and scopes.pop():
                guarded_depth -= 1
        elif c == "/":
            if i + 1 < n and expr[i + 1] == "/":
                i += 2
                continue
            if i > 0 and expr[i - 1] == "/":
                i += 1
                continue
            if guarded_depth == 0:
                return True
        i += 1
    return False


def test_no_rounding_sensitive_int_casts_in_oracles():
    entry = _load_entry()
    offenders = []
    for name, sql in entry.oracle_sql().items():
        for body in _cast_bodies(sql):
            if _INT_TYPE_RE.search(body) and _has_unguarded_float_division(body):
                offenders.append((name, body.strip()[:120]))
    assert not offenders, (
        "Oracle SQL casts a float division to an integer type — the result "
        "depends on the DuckDB build's float->int rounding mode. Use integer "
        "floor division (//) instead. Offenders: %r" % offenders)


def test_zonal_oracle_uses_floor_division():
    """The specific r02 regression: zonal px_lat derivation must use t // 16."""
    entry = _load_entry()
    sql = entry.oracle_sql()["zonal_stats"]
    assert "(t // 16)" in sql
    assert not re.search(r"CAST\s*\(\s*t\s*/\s*16", sql, re.IGNORECASE)
