"""Physical-plan assertions (SURVEY §4: verify the pruning/shuffle story
with explain(), not hope)."""

from __future__ import annotations

from manga_translator_spark.plans.pipeline import PipelineConfig, extract


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_fused_plan_is_shuffle_free(pages_df):
    plan = _plan(extract(pages_df, PipelineConfig()))
    assert "Exchange" not in plan  # whole pipeline: scan -> python -> project
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan


def test_scan_prunes_to_url_and_html(spark, tmp_path, pages_df):
    # through a real parquet scan (pages_df fixture is in-memory, so write)
    path = str(tmp_path / "pages")
    pages_df.write.parquet(path)
    scan = spark.read.parquet(path)
    plan = _plan(extract(scan, PipelineConfig()))
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema, plan
    line = read_schema[0]
    assert "url" in line and "html" in line
    assert "warc_ts" not in line and "lang" not in line  # pruned


def test_staged_plan_shuffles_only_for_recognition(pages_df):
    plan_norec = _plan(
        extract(pages_df, PipelineConfig(mode="staged", recognize=False))
    )
    assert "Exchange" not in plan_norec  # arrays assembler: zero shuffle
    plan_rec = _plan(extract(pages_df, PipelineConfig(mode="staged")))
    assert "Exchange" in plan_rec  # the small recognized group-back only


def test_cosine_topk_shuffle_is_rank_limited(spark):
    """The exact-ANN window must not shuffle the full pair set: Spark's
    rank-limit pushdown has to insert a partial WindowGroupLimit BEFORE the
    exchange so each partition ships only its local top-k per query."""
    from manga_translator_spark.operators.similarity import cosine_topk

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = cosine_topk(df)._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    exchange_at = min(i for i, l in enumerate(lines) if "Exchange hashpartitioning" in l)
    partial_at = [i for i, l in enumerate(lines) if "WindowGroupLimit" in l and "Partial" in l]
    assert partial_at and max(partial_at) > exchange_at, plan  # partial is BELOW (= before) it
    # and the pair generation itself is a broadcast, not a shuffle join
    assert "BroadcastNestedLoopJoin" in plan


def test_dedup_clusters_multi_hop_chain(spark):
    """Connected-components fixpoint: a 1-2, 2-3 chain (no 1-3 edge) must
    collapse into one cluster with canonical id 1 — requires >1 label-
    propagation round — and isolated docs stay singletons."""
    import pandas as pd

    from manga_translator_spark.operators.dedup import dedup_clusters

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3, 4, 5], "text": ["a", "b", "c", "d", "e"]})
    )
    chain = spark.createDataFrame(
        pd.DataFrame({"doc_a": [1, 2, 5], "doc_b": [2, 3, 4]})
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(docs, pairs=chain).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}


def test_embedding_lsh_candidates_are_capped(spark):
    """Bounded pair fan-out on a pathologically skewed embedding fixture:
    every vector identical => all land in one bucket per band; the
    per-bucket cap must bound candidate pairs at C(cap, 2), not C(n, 2)."""
    import pandas as pd

    from manga_translator_spark.operators.similarity import (
        LSH_EMB_BANDS,
        MAX_EMB_BUCKET,
        lsh_candidate_pairs,
    )

    n = 4 * MAX_EMB_BUCKET
    rows = pd.DataFrame(
        {"vec_id": range(n), "embedding": [[1.0] * 64 for _ in range(n)]}
    )
    df = spark.createDataFrame(rows)
    pairs = lsh_candidate_pairs(df).collect()
    cap_pairs = MAX_EMB_BUCKET * (MAX_EMB_BUCKET - 1) // 2
    assert 0 < len(pairs) <= cap_pairs  # bands dedup to the same capped set
    # deterministic victims: the cap keeps the lowest vec_ids
    assert max(max(p["vec_a"], p["vec_b"]) for p in pairs) < MAX_EMB_BUCKET
