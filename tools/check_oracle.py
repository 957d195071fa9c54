#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Registers every parquet table in sfDir as a DuckDB view (by basename), runs
each oracle_sql.json entry, and compares against the Spark parquet dump in
verifyOutDir/<name>: column names (sorted), row count, and a hash of the
sorted value matrix. Mirrors what CORRECTNESS_r{N}.json checks so oracle SQL
bugs are caught before the round gate.

Optional: --exclude-prefix P drops every oracle entry whose name starts
with P (repeatable). Used by the TRI-SCALE sweep: at sf0.1 the emb_*
oracles are O(n^2) all-pairs in DuckDB and are excluded (run
'--exclude-prefix emb_'); everything else is checked at 10x the driver
gate's scale — this sweep caught a real cross-engine halfway-rounding
bug in round 4 that the sf0.01-only gate had missed for three rounds.
"""
import sys, json, glob, os, math
import duckdb

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)

def table_sig(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    mat = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    import hashlib
    h = hashlib.sha256()
    for row in mat:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest(), len(mat)

def main(sf_dir, out_dir, exclude_prefixes=()):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    skipped = [n for n in oracle
               if any(n.startswith(p) for p in exclude_prefixes)]
    for n in skipped:
        del oracle[n]
    if skipped:
        print(f"SKIP ({len(skipped)} excluded): {', '.join(sorted(skipped))}")
    failures = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark dump")
            failures += 1
            continue
        try:
            duck = con.execute(sql)
            dcols = [d[0] for d in duck.description]
            drows = duck.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        sq = con.execute(
            f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
        scols = [d[0] for d in sq.description]
        srows = sq.fetchall()
        if sorted(dcols) != sorted(scols):
            print(f"FAIL {name}: columns duck={sorted(dcols)} spark={sorted(scols)}")
            failures += 1
            continue
        dh, dn = table_sig(drows, dcols)
        sh, sn = table_sig(srows, scols)
        if dn != sn:
            print(f"FAIL {name}: rows duck={dn} spark={sn}")
            failures += 1
        elif dh != sh:
            print(f"FAIL {name}: hash mismatch ({dn} rows)")
            failures += 1
        else:
            print(f"OK   {name}: {dn} rows")
    print(f"{'ALL OK' if failures == 0 else str(failures) + ' FAILURES'}")
    return 1 if failures else 0

if __name__ == "__main__":
    pos, excl = [], []
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--exclude-prefix":
            v = next(it, None)
            if v is None:
                sys.exit("usage: check_oracle.py <sfDir> <verifyOutDir> "
                         "[--exclude-prefix P]... (missing value for "
                         "--exclude-prefix)")
            excl.append(v)
        else:
            pos.append(a)
    if len(pos) != 2:
        sys.exit("usage: check_oracle.py <sfDir> <verifyOutDir> "
                 "[--exclude-prefix P]...")
    sys.exit(main(pos[0], pos[1], tuple(excl)))
