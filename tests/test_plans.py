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
