"""Synthesize a larger scale factor from an existing one, deterministically.

The driver provides sf0.001/0.01/0.1; the suite also needs a 10x point to
confirm the per-query constants scale as claimed (simhash agg width, LSH
shuffle volume, MOR read resolution). This replicates every table `factor`
times with key shifts, plus structure-preserving perturbation where verbatim
copies would DISTORT the workload instead of scaling it:

  * documents: a per-replica tag token is injected every 5th token — replicas
    stay realistic text but fall below the near-dup thresholds, so dedup work
    scales ~linearly instead of exploding on 10-way exact-dup groups;
  * embeddings: per-(vec,replica,dim) hash noise moves replicas well outside
    the near-dup cosine threshold, same reasoning;
  * fact/dim tables: pure key-shifted replication (join fan-outs preserved);
    nation/region stay as-is (true dimensions).

Everything is Spark built-ins on xxhash64 — no RNG, same output every run.

Usage: python tools/make_sf_big.py <src_sf_dir> <out_dir> [factor=10]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/dev/shm/aq_sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("aqueduct-make-sf-big")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)

    def replicate(table: str, shift_cols: list[str], tweak=None):
        df = spark.read.parquet(f"{src}/{table}.parquet")
        shifts = {c: df.agg(F.max(c)).collect()[0][0] + 1 for c in shift_cols}
        parts = []
        for i in range(factor):
            p = df
            for c, m in shifts.items():
                p = p.withColumn(c, (F.col(c) + F.lit(i * m)).cast(df.schema[c].dataType))
            if tweak is not None and i > 0:
                p = tweak(p, i)
            parts.append(p)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.repartition(max(cpus, 8)).write.mode("overwrite").parquet(f"{out}/{table}.parquet")
        print(f"{table}: x{factor}", flush=True)

    def doc_tweak(p, i):
        # inject a per-replica tag token after every 5th token: kills enough
        # shingles that replicas are NOT near-dups of the original (measured
        # token-Jaccard ~0.45 vs thresholds 0.5+), while staying valid text
        toks = F.split(F.col("text"), " ")
        tagged = F.array_join(
            F.transform(
                toks, lambda x, j: F.when(j % 5 == 0, F.concat(x, F.lit(f" zz{i}q"))).otherwise(x)
            ),
            " ",
        )
        return p.withColumn("text", tagged).withColumn(
            "n_chars", F.length("text").cast(p.schema["n_chars"].dataType)
        )

    def emb_tweak(p, i):
        # deterministic per-(vec, replica, dim) noise, amplitude 0.25: replicas
        # land well below the near-dup cosine threshold
        noise = lambda x, j: (  # noqa: E731
            (F.pmod(F.xxhash64(F.col("vec_id"), F.lit(i), j), F.lit(1000)).cast("double") / 1000.0 - 0.5)
        )
        return p.withColumn(
            "embedding",
            F.transform(F.col("embedding"), lambda x, j: (x + 0.5 * noise(x, j)).cast("float")),
        )

    replicate("events", ["event_id", "user_id"])
    replicate("documents", ["doc_id"], tweak=doc_tweak)
    replicate("embeddings", ["vec_id"], tweak=emb_tweak)
    replicate("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"])
    replicate("orders", ["o_orderkey", "o_custkey"])
    replicate("customer", ["c_custkey"])
    replicate("supplier", ["s_suppkey"])
    replicate("part", ["p_partkey"])
    for t in ("nation", "region"):  # true dimensions — unchanged
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
        print(f"{t}: copied", flush=True)


if __name__ == "__main__":
    main()
