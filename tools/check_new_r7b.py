"""Ad-hoc: verify the q182-q188 batch against their oracles at both SFs."""

import sys

from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
from pos_data_insertion_etl_spark.plans import all_queries  # noqa: E402
from tests.oracle_harness import compare, duck_connection  # noqa: E402

NAMES = [
    "q182_kmeans_lloyd",
    "q183_label_propagation",
    "q184_triangle_count",
    "q185_ewma_dyadic",
    "q186_ngram_novelty",
    "q187_bigram_collocations",
    "q188_copurchase_pairs",
]

if __name__ == "__main__":
    names = sys.argv[1:] or NAMES
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    fails = 0
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = duck_connection(sf_dir)
        for n in names:
            spec = qs[n]
            try:
                ok, msg = compare(spec.spark(spark, sf_dir), con, spec.oracle)
            except Exception as exc:  # noqa: BLE001
                ok, msg = False, f"EXC {type(exc).__name__}: {exc}"
            print(f"{sf_dir.split('/')[-1]} {n}: {'OK' if ok else 'FAIL ' + str(msg)[:400]}")
            fails += 0 if ok else 1
        con.close()
    sys.exit(1 if fails else 0)
