"""Reproduce the driver's vanilla-session environment.

The driver builds its own SparkSession (no engine configs at build time) and
then calls ``__spark_entry__.queries()`` wrappers. Round 1 showed parquet
timestamps arrive as TIMESTAMP_NTZ there, while our engine session reads
them as bigint-nanos (legacy conf) -> LTZ. This script mimics the driver
exactly: vanilla builder, runtime conf only via the entry wrapper.

Usage: python tools/driver_env_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    spark = (
        SparkSession.builder.appName("driver-env-check")
        .master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    print("vanilla events dtypes:", ev.dtypes)
    print("session tz:", spark.conf.get("spark.sql.session.timeZone"))
    print("ansi:", spark.conf.get("spark.sql.ansi.enabled"))

    import duckdb

    import __spark_entry__ as entrymod
    from tools.check_oracle import frame_hash

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = only or list(qs)
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as e:
            msg = str(e).split("\n")[0][:200]
            print(f"FAIL {name}: {msg}")
            failures.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"okNA {name}: rows={len(sdf)} (no oracle) [{dt:.1f}s]")
            continue
        odf = con.sql(oracles[name]).df()
        sn, scols, shash = frame_hash(sdf)
        on, ocols, ohash = frame_hash(odf)
        ok = (sn, scols, shash) == (on, ocols, ohash)
        print(
            f"{'PASS' if ok else 'FAIL'} {name}: rows={sn}/{on} "
            f"cols={'=' if scols == ocols else '≠'} "
            f"hash={'=' if shash == ohash else '≠'} [{dt:.1f}s]"
        )
        if not ok:
            failures.append(name)
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
