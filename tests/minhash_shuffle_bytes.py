"""One-off: measure the shuffle-bytes reduction from de-exploding
minhash_signatures (VERDICT r2 #7). Runs the CURRENT implementation and the
old explode(sequence(0,H-1)) shape on the same corpus, then reads total
shuffle write bytes per query from the Spark UI REST API."""
import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from debezium_connector_cassandra_spark.session import get_spark
from debezium_connector_cassandra_spark.functions.text import hash64, shingles_df

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = get_spark(
    app_name="minhash-bytes",
    master="local[16]",
    extra_conf={"spark.ui.enabled": "true"},
)
spark.sparkContext.setLogLevel("ERROR")
ui = spark.sparkContext.uiWebUrl
app_id = spark.sparkContext.applicationId


def shuffle_bytes_since(marker_stage: int) -> int:
    data = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages")
    )
    return sum(
        s.get("shuffleWriteBytes", 0)
        for s in data
        if s["stageId"] > marker_stage and s["status"] == "COMPLETE"
    )


def max_stage() -> int:
    try:
        data = json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages")
        )
        return max((s["stageId"] for s in data), default=-1)
    except Exception:
        return -1


docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")


def sig_current():
    from debezium_connector_cassandra_spark.operators.text_dedup import (
        minhash_signatures,
    )

    return minhash_signatures(docs)


def sig_old(num_hashes=16, k=5):
    sh = shingles_df(docs, k=k)
    seeded = sh.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("i"),
        "shingle",
    )
    h = hash64(F.concat(F.col("i").cast("string"), F.lit("#"), F.col("shingle")))
    return seeded.groupBy("doc_id", "i").agg(F.min(h).alias("mh"))


out = {}
for name, fn in [("old_explode_16x", sig_old), ("current_agg_unpivot", sig_current)]:
    m = max_stage()
    t0 = time.time()
    fn().write.mode("overwrite").format("noop").save()
    wall = round(time.time() - t0, 3)
    b = shuffle_bytes_since(m)
    out[name] = {"shuffle_write_bytes": b, "wall_sec": wall}
    print(name, out[name])

ratio = out["old_explode_16x"]["shuffle_write_bytes"] / max(
    out["current_agg_unpivot"]["shuffle_write_bytes"], 1
)
out["shuffle_bytes_reduction"] = round(ratio, 2)
print(json.dumps(out, indent=1))
