#!/usr/bin/env python3
"""Generate a conformance corpus from DuckDB's own function catalog.

For every scalar/aggregate/macro function in duckdb_functions(), synthesize a
call from its declared parameter types, keep the first overload DuckDB itself
evaluates successfully, and emit TSV lines `name<TAB>kind<TAB>sql` to stdout.
The Scala side (graft.tools.ProbeSql) replays each statement through
Engine.query to measure true end-to-end parity (registry + rewrites + TVFs).

Driver-side tool (duckdb is the oracle); not part of the shipped library.
"""
import sys
import duckdb

con = duckdb.connect()

SAMPLES = {
    "VARCHAR": ["'abc'", "'a,b,c'", "'%a%'"],
    "INTEGER": ["3", "1"],
    "BIGINT": ["3", "1"],
    "HUGEINT": ["3"],
    "SMALLINT": ["3"],
    "TINYINT": ["3"],
    "UBIGINT": ["3"],
    "UINTEGER": ["3"],
    "USMALLINT": ["3"],
    "UTINYINT": ["3"],
    "DOUBLE": ["2.5", "0.5"],
    "FLOAT": ["2.5"],
    "DECIMAL": ["2.5"],
    "BOOLEAN": ["true"],
    "DATE": ["DATE '2024-03-15'"],
    "TIMESTAMP": ["TIMESTAMP '2024-03-15 10:30:00'"],
    "TIMESTAMP WITH TIME ZONE": ["TIMESTAMPTZ '2024-03-15 10:30:00'"],
    "TIME": ["TIME '10:30:45'"],
    "TIME WITH TIME ZONE": ["TIMETZ '10:30:45'"],
    "INTERVAL": ["INTERVAL '2 days'"],
    "BLOB": ["'ab'::BLOB"],
    "JSON": ["'{\"a\":1,\"b\":[1,2]}'"],
    "UUID": ["'47183823-2574-4bfd-b411-99ed177d3e43'::UUID"],
    "BIT": ["'0101'::BIT"],
    "ANY": ["7", "'abc'", "[1,2,3]"],
    "ANY[]": ["[3,1,2]", "['a','b','a']"],
    "VARCHAR[]": ["['a','b','a']"],
    "INTEGER[]": ["[3,1,2]"],
    "BIGINT[]": ["[3,1,2]"],
    "DOUBLE[]": ["[1.0,2.5,0.5]", "[0.5,0.25]"],
    "FLOAT[]": ["[1.0,2.5,0.5]"],
    "T[]": ["[3,1,2]", "['a','b','a']"],
    "LAMBDA": ["x -> x + 1", "(x, y) -> x + y"],
    "MAP(ANY, ANY)": ["MAP {'k1': 5, 'k2': 7}"],
    "STRUCT": ["{'a': 1, 'b': 'x'}"],
}

def candidates(ptype):
    t = (ptype or "ANY").upper()
    if t in SAMPLES:
        return SAMPLES[t]
    if t.startswith("DECIMAL"):
        return SAMPLES["DECIMAL"]
    if t.endswith("[]"):
        return SAMPLES["ANY[]"] + SAMPLES["DOUBLE[]"]
    if t.startswith("MAP"):
        return SAMPLES["MAP(ANY, ANY)"]
    if t.startswith("STRUCT"):
        return SAMPLES["STRUCT"]
    if "LAMBDA" in t or t == "FUNCTION":
        return SAMPLES["LAMBDA"]
    return SAMPLES["ANY"]

rows = con.execute("""
  select function_name, function_type, parameter_types
  from duckdb_functions()
  where function_type in ('scalar','aggregate','macro')
    and not starts_with(function_name,'__')
    and not starts_with(function_name,'icu_')
  order by function_name, length(parameter_types)
""").fetchall()

emitted = set()
for name, ftype, ptypes in rows:
    if name in emitted:
        continue
    if any(c in name for c in "!~<>=@^&|*+-/%"):
        continue  # operator spellings probed separately
    ptypes = ptypes or []
    # cap combinatorics: vary each param over its candidates, first-fit
    import itertools
    pools = [candidates(p)[:3] for p in ptypes]
    found = None
    for combo in itertools.islice(itertools.product(*pools), 40):
        call = f"{name}({', '.join(combo)})"
        sql = f"SELECT {call} AS v"
        try:
            con.execute(sql).fetchall()
            found = sql
            break
        except Exception:
            continue
    if found:
        emitted.add(name)
        kind = ftype
        print(f"{name}\t{kind}\t{found}")

print(f"-- emitted {len(emitted)} of {len({r[0] for r in rows})} names",
      file=sys.stderr)
