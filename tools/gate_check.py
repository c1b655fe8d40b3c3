#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run after
`sbt "runMain graft.Verify <sfDir> <outDir> [names]"`, compares each
dumped parquet against its DuckDB oracle (row count, schema kind,
value hash with columns sorted by name). Usage:
    python3 tools/gate_check.py <outDir> <sfDir> [name ...]
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np
import datetime

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df

def value_hash(df: pd.DataFrame):
    # a stable, type-sensitive repr: ints stay ints, floats repr'd exactly
    rows = []
    for t in df.itertuples(index=False):
        row = []
        for v in t:
            if v is None or v is pd.NaT or \
                    (isinstance(v, float) and np.isnan(v)):
                row.append("\0")
            elif isinstance(v, (np.floating, float)):
                row.append(repr(float(v)))
            elif isinstance(v, (np.integer, int)):
                row.append(str(int(v)))
            elif isinstance(v, pd.Timestamp):
                # DuckDB hands DATE back as midnight Timestamp; parquet
                # gives datetime.date — canonicalize both to ISO date
                # when there is no time component (the driver's typed
                # compare sees the real DATE type; this is local-only)
                v = v.to_pydatetime()
                if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
                    row.append(v.date().isoformat())
                else:
                    row.append(v.isoformat(sep=" "))
            elif isinstance(v, datetime.datetime):
                if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
                    row.append(v.date().isoformat())
                else:
                    row.append(v.isoformat(sep=" "))
            elif isinstance(v, datetime.date):
                row.append(v.isoformat())
            else:
                row.append(str(v))
        rows.append("\x01".join(row))
    import hashlib
    return hashlib.md5("\n".join(rows).encode()).hexdigest()

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    failures = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not spark_files:
            print(f"[{name}] NO SPARK OUTPUT")
            failures += 1
            continue
        sdf = canon(pd.concat([pd.read_parquet(f) for f in spark_files]))
        try:
            odf = canon(con.sql(sql).df())
        except Exception as e:
            print(f"[{name}] ORACLE ERROR: {e}")
            failures += 1
            continue
        ok_rows = len(sdf) == len(odf)
        ok_cols = list(sdf.columns) == list(odf.columns)
        ok_hash = ok_rows and ok_cols and value_hash(sdf) == value_hash(odf)
        status = "OK" if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"[{name}] {status} rows={len(sdf)}/{len(odf)} "
              f"cols_match={ok_cols} hash_match={ok_hash}")
        if not ok_hash and ok_rows and ok_cols and len(sdf) < 100000:
            # find first differing row for debugging
            s2 = sdf.reset_index(drop=True)
            o2 = odf.reset_index(drop=True)
            for i in range(min(len(s2), len(o2))):
                a, b = list(s2.iloc[i]), list(o2.iloc[i])
                same = all((str(x) == str(y)) or
                           (isinstance(x, float) and isinstance(y, float)
                            and (x == y or (np.isnan(x) and np.isnan(y))))
                           for x, y in zip(a, b))
                if not same:
                    print(f"  first diff at row {i}:")
                    print(f"    spark : {a}")
                    print(f"    oracle: {b}")
                    break
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
