"""Band-bucket cap: a planted m-doc duplicate cluster must not explode
the near-dup candidate join (VERDICT round 1 skew note)."""

from pyspark.sql import functions as F

from crawler_spark.corpus import minhash_lsh_pairs, simhash_pairs


def _docs(spark):
    rows = [(i, "identical duplicate content repeated for the cluster " * 4)
            for i in range(40)]
    rows += [
        (100 + i, f"unique document number {i} mentioning topic {i * 7} "
                  f"and case {i * 13} in distinct words")
        for i in range(20)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_cap_bounds_planted_cluster(spark):
    docs = _docs(spark)
    uncapped = minhash_lsh_pairs(docs, threshold=0.5).count()
    capped = minhash_lsh_pairs(docs, threshold=0.5, max_bucket=10).count()
    assert uncapped >= 40 * 39 // 2  # the cluster really is quadratic
    assert capped < 50  # cap removed the oversized buckets


def test_minhash_cap_keeps_small_buckets_intact(spark):
    docs = _docs(spark).filter(F.col("doc_id") >= 100)  # distinct docs only
    plain = set(map(tuple, minhash_lsh_pairs(docs, threshold=0.5).collect()))
    capped = set(
        map(tuple, minhash_lsh_pairs(docs, threshold=0.5, max_bucket=10).collect())
    )
    assert plain == capped  # no bucket exceeds the cap -> identical output


def test_simhash_cap_bounds_planted_cluster(spark):
    docs = _docs(spark)
    uncapped = simhash_pairs(docs, max_hamming=3).count()
    capped = simhash_pairs(docs, max_hamming=3, max_bucket=10).count()
    assert uncapped >= 40 * 39 // 2
    assert capped < 50


def test_registered_queries_run_with_cap_active(spark, tmp_path):
    """VERDICT round-2 next #4: the REGISTERED dedup queries (cap ON by
    default) must bound a planted boilerplate cluster larger than the
    cap — the skew protection exists on the path users actually run."""
    from crawler_spark import queries as Q

    rows = [(i, "identical boilerplate page body repeated verbatim " * 4)
            for i in range(1200)]  # 1200 > the registered caps (256/1024)
    rows += [
        (10000 + i, f"unique document number {i} about topic {i * 7} "
                    f"and case {i * 13} in distinct words")
        for i in range(10)
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    n_mh = Q.QUERIES["dedup_minhash_lsh"](spark, str(tmp_path)).count()
    n_sh = Q.QUERIES["dedup_simhash"](spark, str(tmp_path)).count()
    # uncapped, the 1200-doc cluster alone would emit 1200*1199/2 ≈ 719k
    # pairs; the registered caps drop the oversized buckets entirely
    assert n_mh < 1000, f"minhash cap inactive: {n_mh} pairs"
    assert n_sh < 1000, f"simhash cap inactive: {n_sh} pairs"
