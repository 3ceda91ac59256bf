#!/usr/bin/env python3
"""VALUE-compare the conformance corpus: DuckDB's own answer vs the
graft engine's (ProbeSql output with JSON-rendered rows).

Usage:
  python3 tools/check_conformance.py <corpus.tsv> <probe_out.tsv> [out.json]

Classification per row:
  MATCH      values equal after normalization
  DIVERGE    values differ (each must be a known, documented divergence
             or it is a bug to fix)
  EXEC_ONLY  value not comparable (nondeterministic, engine-specific by
             contract, or rendered in a type JSON cannot carry)
  FAIL       the engine failed to execute (ProbeSql FAIL row)

Dev tool only (driver-side python; duckdb is the oracle).
"""
import sys, json, math, base64, datetime, decimal
import duckdb

# Rows whose VALUES are inherently not comparable. (r10: the clock/
# random/uuid/txid/sequence rows were converted to value-MATCH — the
# corpus now projects bounded-deterministic booleans that still invoke
# the function, sequences advance identically in both engines in file
# order, and setseed returns NULL in both.)
NONDET = set()
# Engine-specific by documented contract (COVERAGE/VERDICT notes).
# r11 removed 18 names by making graft answer DuckDB's value exactly:
# the session-identity family (current_user/session_user/user →
# 'duckdb'; current_schema → 'main'; current_database/current_catalog
# → 'memory'; current_schemas → 3×main+pg_catalog), the diagnostics
# that already value-matched (current_role, current_query,
# current_setting, in_search_path, stats, vector_type,
# get_block_size), create_sort_key (full byte-encoding parity,
# functions/SortKey.scala), json_transform[/_strict] (string-leaf
# parse + per-leaf cast), row_to_json (named-struct corpus row;
# unnamed-field naming stays doc'd), and alias (enclosing-projection
# alias rewrite).
ENGINE_SPECIFIC = {
    "version",  # engine version strings necessarily differ
    "json_serialize_sql", "json_serialize_plan",  # AST JSON is
    # engine-internal; error-object field sets differ (doc'd)
    # approx by contract — but the small-cardinality corpus inputs are
    # exact in both engines, so count-distinct rows value-MATCH (r10);
    # the quantile forms genuinely differ (DuckDB returns an
    # input-typed approximation: approx_quantile(2.5, 0.5) = 3)
    "approx_quantile", "reservoir_quantile",
    "hash",  # engine-internal hash function
    # bit_length/octet_length: converted r12 — SqlRewrites.rewriteBitLen
    # lowers BIT-shaped args onto the '0'/'1' model (bits = chars,
    # octets = ceil(bits/8)); both rows value-compare now
    "union_value",  # tag+members struct model renders the full struct
}
# set-semantics results: order is unspecified in both engines
ORDER_AGNOSTIC = {"array_distinct", "list_distinct", "array_intersect",
                  "list_intersect", "json_keys"}

import re
_TEMPORAL = re.compile(r"^\d{4}-\d{2}-\d{2}([T ]\d{2}:\d{2}:\d{2})?")
_INTERVAL = re.compile(
    r"^(-?[\d.]+ (?:years?|months?|weeks?|days?|hours?|minutes?|seconds?)"
    r"(?: |$))+$")

def interval_to_seconds(text):
    total = 0.0
    for num, unit in re.findall(r"(-?[\d.]+) (\w+)", text):
        n = float(num)
        u = unit.rstrip("s")
        total += n * {"year": 31104000, "month": 2592000, "week": 604800,
                      "day": 86400, "hour": 3600, "minute": 60,
                      "second": 1}[u]
    return total


def norm(v):
    """normalize a python-side value (either parsed from graft's JSON
    or straight from duckdb) to a comparable shape"""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float, decimal.Decimal)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        if math.isinf(f):
            return "Infinity" if f > 0 else "-Infinity"
        if f == int(f) and abs(f) < 1e15:
            return int(f)
        return float(f"{f:.9g}")
    if isinstance(v, datetime.datetime):
        # millisecond precision: Spark's toJSON truncates micros
        return v.replace(tzinfo=None,
                         microsecond=v.microsecond // 1000 * 1000
                         ).isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, datetime.time):
        # TIMETZ arrives tz-aware; graft's model is the UTC wall time
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.timedelta):
        return f"interval:{v.total_seconds()}"
    if isinstance(v, bytes):
        # graft's toJSON renders binary as bare base64
        return base64.b64encode(v).decode()
    if isinstance(v, (list, tuple)):
        return [norm(x) for x in v]
    if isinstance(v, dict):
        # duckdb MAP values arrive as {'key': [...], 'value': [...]} —
        # normalize to sorted (k, v) pairs so they compare against
        # graft's JSON object rendering
        if set(v.keys()) == {"key", "value"} and \
                isinstance(v.get("key"), list):
            # keys stringified: JSON object keys are always strings
            pairs = sorted(zip([str(norm(k)) for k in v["key"]],
                               [norm(x) for x in v["value"]]),
                           key=lambda kv: kv[0])
            return ["__map__"] + [x for kv in pairs for x in kv]
        # structs carry BOTH shapes: by-key (graft's toJSON DROPS null
        # fields, so a key-subset compare refills them as None) and
        # positional (unnamed-struct field names legitimately differ)
        return {"__struct__": {str(k).lower(): norm(x)
                               for k, x in v.items()},
                "__order__": [norm(x) for x in v.values()]}
    if isinstance(v, str):
        # temporal-shaped strings normalize symmetrically (both the
        # graft JSON rendering inside containers and any duckdb-side
        # string) so timestamps inside LISTs compare (r10)
        if _TEMPORAL.match(v):
            s2 = v.replace("T", " ").removesuffix("Z")
            t = maybe_temporal(s2)
            if not isinstance(t, str):
                return norm(t)
            return s2
        return v
    return str(v)


def graft_map_like(name):
    """functions whose graft result is a MAP rendered as a JSON object
    (keys become object fields)"""
    return name in {"map", "map_concat", "map_from_entries",
                    "histogram", "list_histogram"}


def norm_graft_json(doc, map_like=False, cols=None):
    """graft's df.toJSON row → list of normalized column values.
    toJSON DROPS null fields, so a missing 'v' key means NULL — with
    the oracle's column list we refill them positionally."""
    parsed = json.loads(doc)
    lower_cols = [str(c).lower() for c in (cols or [])]
    by_lower = {str(k).lower(): v for k, v in parsed.items()}
    if cols and all(k in lower_cols for k in by_lower):
        vals = [by_lower.get(c) for c in lower_cols]
    else:
        # column names differ (unnamed expressions) — positional
        vals = list(parsed.values())
    if not vals:
        return [None]
    out = []
    for v in vals:
        if isinstance(v, str) and _TEMPORAL.match(v):
            # Spark renders timestamps like 2024-03-15T10:30:00.000Z
            s = v.replace("T", " ").removesuffix("Z")
            out.append(norm(maybe_temporal(s)))
        elif isinstance(v, str) and _INTERVAL.match(v):
            out.append(f"interval:{interval_to_seconds(v)}")
        elif isinstance(v, str) and spark_interval_seconds(v) is not None:
            out.append(f"interval:{spark_interval_seconds(v)}")
        elif map_like and isinstance(v, dict):
            pairs = sorted(((str(norm(k)), norm(x)) for k, x in v.items()),
                           key=lambda kv: kv[0])
            out.append(["__map__"] + [x for kv in pairs for x in kv])
        else:
            out.append(norm(v))
    return out


def maybe_temporal(s):
    for fmt in ("%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S"):
        try:
            return datetime.datetime.strptime(s, fmt)
        except ValueError:
            pass
    return s


_SPARK_DT_INTERVAL = re.compile(
    r"^INTERVAL '(-?)(?:(\d+) )?(\d+):(\d+):(\d+(?:\.\d+)?)' "
    r"(?:DAY|HOUR|MINUTE) TO SECOND$")


def spark_interval_seconds(s):
    """Spark's ANSI day-time interval rendering → seconds, or None"""
    m = _SPARK_DT_INTERVAL.match(s)
    if not m:
        return None
    sign = -1.0 if m.group(1) == "-" else 1.0
    days = int(m.group(2) or 0)
    total = days * 86400 + int(m.group(3)) * 3600 + \
        int(m.group(4)) * 60 + float(m.group(5))
    return sign * total


def _struct_vs_list(s, lst):
    """graft struct (keyed, null fields DROPPED by toJSON) vs a duckdb
    tuple rendered as a plain list. Digit keys (arrays_zip fields) give
    exact positions; otherwise positional with trailing-None refill."""
    ks = s["__struct__"]
    if ks and all(re.fullmatch(r"\d+", k) for k in ks):
        vals = [ks.get(str(i)) for i in range(len(lst))]
        return all(values_equal(x, y) for x, y in zip(vals, lst))
    order = list(s["__order__"])
    if len(order) < len(lst):
        order += [None] * (len(lst) - len(order))
    return len(order) == len(lst) and all(
        values_equal(x, y) for x, y in zip(order, lst))


def _map_vs_struct(m, s):
    """duckdb MAP (normalized ['__map__', k, v, ...]) vs graft's JSON
    object rendering of a map result (e.g. histogram)"""
    pairs = dict(zip(m[1::2], m[2::2]))
    st = s["__struct__"]
    return len(pairs) == len(st) and all(
        k in st and values_equal(v, st[k]) for k, v in pairs.items())


def values_equal(a, b):
    if isinstance(a, list) and a[:1] == ["__map__"] and \
            isinstance(b, dict) and "__struct__" in b:
        return _map_vs_struct(a, b)
    if isinstance(b, list) and b[:1] == ["__map__"] and \
            isinstance(a, dict) and "__struct__" in a:
        return _map_vs_struct(b, a)
    if isinstance(a, dict) and "__struct__" in a and isinstance(b, list):
        return _struct_vs_list(a, b)
    if isinstance(b, dict) and "__struct__" in b and isinstance(a, list):
        return _struct_vs_list(b, a)
    if isinstance(a, dict) and isinstance(b, dict) and \
            "__struct__" in a and "__struct__" in b:
        ka, kb = set(a["__struct__"]), set(b["__struct__"])
        if ka <= kb or kb <= ka:
            return all(values_equal(a["__struct__"].get(k),
                                    b["__struct__"].get(k))
                       for k in ka | kb)
        return values_equal(a["__order__"], b["__order__"])
    # graft renders int128 (md5_number family) as decimal digit
    # strings — Spark has no HUGEINT — while duckdb hands back a
    # python int. Same number, different carrier.
    if isinstance(a, str) and isinstance(b, int) and \
            re.fullmatch(r"-?\d+", a):
        return int(a) == b
    if isinstance(b, str) and isinstance(a, int) and \
            re.fullmatch(r"-?\d+", b):
        return int(b) == a
    if type(a) is float or type(b) is float:
        try:
            fa, fb = float(a), float(b)
            return math.isclose(fa, fb, rel_tol=1e-6, abs_tol=1e-9)
        except (TypeError, ValueError):
            return False
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(
            values_equal(x, y) for x, y in zip(a, b))
    if isinstance(a, str) and isinstance(b, str):
        if a == b:
            return True
        # DATE vs midnight TIMESTAMP (date_trunc and friends)
        if a + " 00:00:00" == b or b + " 00:00:00" == a:
            return True
        # interval seconds text vs parsed
        if a.startswith("interval:") and b.startswith("interval:"):
            return math.isclose(float(a[9:]), float(b[9:]), rel_tol=1e-6)
        return a.rstrip("0").rstrip(".") == b.rstrip("0").rstrip(".")
    if isinstance(a, str) and b is not None and a.startswith("interval:"):
        return False
    return a == b


def main():
    corpus_path, probe_path = sys.argv[1], sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    corpus = {}
    con = duckdb.connect()
    for line in open(corpus_path):
        line = line.rstrip("\n")
        if not line or line.startswith("--"):
            continue
        name, kind, sql = line.split("\t", 2)
        if kind == "setup":
            con.execute(sql)
            continue
        corpus[name] = sql

    counts = {"MATCH": 0, "DIVERGE": 0, "EXEC_ONLY": 0, "FAIL": 0}
    diverged = []
    for line in open(probe_path):
        line = line.rstrip("\n")
        if not line:
            continue
        status, name, kind, detail = (line.split("\t", 3) + [""])[:4]
        if kind == "setup":
            continue
        if status == "FAIL":
            # parity in rejection: if duckdb itself rejects the same
            # statement, both engines agree it is invalid
            both_reject = False
            if corpus.get(name) is not None:
                try:
                    con.execute(corpus[name]).fetchall()
                except Exception:
                    both_reject = True
            if both_reject:
                counts["MATCH"] += 1
            else:
                counts["FAIL"] += 1
                diverged.append((name, "ENGINE FAIL", detail[:100]))
            continue
        if name in NONDET or name in ENGINE_SPECIFIC:
            counts["EXEC_ONLY"] += 1
            continue
        sql = corpus.get(name)
        if detail.startswith("RAW:"):
            # TIME/interval results fall back to Row.toString. A
            # single-row single-column RAW render IS comparable as text
            # (TIME isoformat matches duckdb's time rendering).
            matched = False
            if sql is not None:
                try:
                    exp = con.execute(sql).fetchall()
                    if len(exp) == 1 and len(exp[0]) == 1:
                        want = norm(exp[0][0])
                        got = detail[4:].strip()
                        if got.startswith("[") and got.endswith("]"):
                            got = got[1:-1]
                        def trimfrac(x):
                            # fractional-seconds zero-trim anchored to
                            # TIME renders (12:34:56.789000 vs .789);
                            # an any-decimal trim would also equate
                            # '2.50' with '2.5' (r11 advice)
                            x = re.sub(r"(\d{2}:\d{2}:\d{2}\.\d*?)0+(?=\D|$)",
                                       r"\1", x)
                            return re.sub(r"(\d{2}:\d{2}:\d{2})\.(?=\D|$)",
                                          r"\1", x)
                        if trimfrac(str(want)) == trimfrac(got):
                            counts["MATCH"] += 1
                            matched = True
                except Exception:
                    pass
            if not matched:
                counts["EXEC_ONLY"] += 1
            continue
        if not detail.startswith("{"):
            # empty render (DDL / zero-row result): execute on the
            # oracle too — BOTH to keep its session state in sync for
            # downstream rows (a skipped CREATE TABLE used to fail
            # every later row touching it) and to MATCH when duckdb
            # also returns zero rows. For query-kind rows the probe
            # now ships the column list (COLS:) so the zero-row MATCH
            # also checks result shape (r11 advice: a wrongly-empty
            # graft result used to auto-MATCH on emptiness alone);
            # DDL/setup rows keep the emptiness-only check (their
            # "shape" is engine bookkeeping, e.g. duckdb's Count).
            ok = False
            if sql is not None:
                try:
                    cur = con.execute(sql)
                    rows = cur.fetchall()
                    exp_cols = [d[0] for d in (cur.description or [])]
                    ok = len(rows) == 0
                    is_query = re.match(
                        r"(?is)^\s*(SELECT|VALUES|FROM|WITH|TABLE|SHOW"
                        r"|DESCRIBE|PRAGMA)\b", sql) is not None
                    if ok and is_query:
                        got_cols = ([c for c in detail[5:].split(",") if c]
                                    if detail.startswith("COLS:") else [])
                        ok = len(got_cols) == len(exp_cols)
                except Exception:
                    ok = False
            counts["MATCH" if ok else "EXEC_ONLY"] += 1
            continue
        if sql is None:
            continue
        try:
            cur = con.execute(sql)
            expected_rows = cur.fetchall()
            exp_cols = [d[0] for d in (cur.description or [])]
        except Exception as e:
            counts["EXEC_ONLY"] += 1
            continue
        got_rows = [norm_graft_json(doc, graft_map_like(name), exp_cols)
                    for doc in detail.split("\x01")]
        exp_rows = [[norm(v) for v in row] for row in expected_rows]
        if name in ORDER_AGNOSTIC:
            def sort_lists(rows):
                return [[sorted(c, key=str) if isinstance(c, list) else c
                         for c in r] for r in rows]
            got_rows = sort_lists(got_rows)
            exp_rows = sort_lists(exp_rows)
        if len(got_rows) == len(exp_rows) and all(
                values_equal(g, e) for g, e in zip(got_rows, exp_rows)):
            counts["MATCH"] += 1
        else:
            counts["DIVERGE"] += 1
            diverged.append((name, str(exp_rows)[:90], str(got_rows)[:90]))

    for name, exp, got in diverged:
        print(f"DIVERGE {name}\n  duckdb: {exp}\n  graft:  {got}")
    print("==", ", ".join(f"{k}: {v}" for k, v in counts.items()), "==")
    if out_path:
        json.dump({"counts": counts,
                   "diverged": [d[0] for d in diverged]},
                  open(out_path, "w"), indent=1)


if __name__ == "__main__":
    main()
