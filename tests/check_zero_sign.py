"""One-off: verify emb_ivf_assign engine vs oracle values are bit-identical
(incl. the sign of zero) at sf0.01 — the driver-hash failure mode of r2."""
import math
import struct
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

import __spark_entry__ as entry_mod

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

for name in sys.argv[2].split(",") if len(sys.argv) > 2 else ["emb_ivf_assign", "emb_ivf_topk", "emb_cosine_topk"]:
    got = entry_mod.queries()[name](spark, SF_DIR).toPandas()
    want = con.sql(entry_mod.oracle_sql()[name]).df()
    got = got[sorted(got.columns)].sort_values(list(sorted(got.columns))).reset_index(drop=True)
    want = want[sorted(want.columns)].sort_values(list(sorted(want.columns))).reset_index(drop=True)
    assert len(got) == len(want), (name, len(got), len(want))
    bad = 0
    for c in got.columns:
        for a, b in zip(got[c], want[c]):
            if isinstance(a, float):
                pa = struct.pack("<d", a)
                pb = struct.pack("<d", b)
                if pa != pb and not (math.isnan(a) and math.isnan(b)):
                    bad += 1
            elif a != b:
                bad += 1
    print(name, "rows", len(got), "bit-mismatches", bad)
    assert bad == 0, name
print("OK")
