"""Arrow-stage fusion (llmops._arrow_stage, r13 optimization).

Chained multimodal operators (synth → transcode → decode) compose their
iterator workers into ONE mapInPandas stage instead of paying a JVM↔Python
crossing per operator.  These tests pin the two load-bearing properties:

  1. EQUIVALENCE — the fused chain's rows equal the unfused chain's rows
     (fusion is broken by any Catalyst op in between, e.g. ``.select("*")``,
     which drops the chain tag), and the mixed-format synth equals the
     original three-branch union it replaced.
  2. PLAN SHAPE — a fused chain plans exactly one MapInPandas node; the
     broken chain plans one per operator.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_engine import llmops


def _params(spark, n=60):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.lit(16) + F.col("id") % 9).alias("w"),
        (F.lit(12) + F.col("id") % 7).alias("h"),
        (F.lit(1) + F.col("id") % 5).alias("a"),
        (F.col("id") % 251).alias("b"),
        (F.lit(4) + F.col("id") % 13).alias("p"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_fused_chain_equals_broken_chain(spark):
    """synth_png → transcode_png_jpeg → decode_jpeg_features fused in one
    Python stage returns exactly the rows of the same chain with fusion
    broken between every pair of operators."""
    p = _params(spark)
    png = llmops.synth_png(p, "doc_id", "w", "h", "a", "b")
    fused = llmops.decode_jpeg_features(
        llmops.transcode_png_jpeg(png, "doc_id", "payload"), "doc_id", "payload"
    )
    # .select("*") returns a fresh DataFrame without the chain tag → unfused
    png_b = llmops.synth_png(p, "doc_id", "w", "h", "a", "b").select("*")
    jpg_b = llmops.transcode_png_jpeg(png_b, "doc_id", "payload").select("*")
    broken = llmops.decode_jpeg_features(jpg_b, "doc_id", "payload")
    assert _rows(fused) == _rows(broken)


def test_fused_chain_plans_single_python_stage(spark):
    p = _params(spark)
    png = llmops.synth_png(p, "doc_id", "w", "h", "a", "b")
    fused = llmops.decode_png_features(png, "doc_id", "payload")
    assert fused._jdf.queryExecution().executedPlan().toString().count("MapInPandas") == 1
    broken = llmops.decode_png_features(png.select("*"), "doc_id", "payload")
    assert broken._jdf.queryExecution().executedPlan().toString().count("MapInPandas") == 2


def test_rename_shim_fuses_noncanonical_columns(spark):
    """A chained op consuming the upstream output under different column
    names (gif_frame_sample keeps the caller's id/payload names) still
    fuses via the pandas rename shim with identical results."""
    p = _params(spark).withColumn("n", F.lit(3))
    gif = llmops.synth_gif_animation(p, "doc_id", "w", "h", "n", "a", "b", "p")
    fused = llmops.gif_frame_sample(gif, "doc_id", "payload", stride=2)
    assert fused._jdf.queryExecution().executedPlan().toString().count("MapInPandas") == 1
    broken = llmops.gif_frame_sample(gif.select("*"), "doc_id", "payload", stride=2)
    assert _rows(fused.select("doc_id", "frame_idx", F.hex("frame"))) == _rows(
        broken.select("doc_id", "frame_idx", F.hex("frame"))
    )


def test_synth_image_mixed_equals_union_of_branches(spark):
    p = _params(spark).withColumn("fmt", F.col("doc_id") % 3)
    mixed = llmops.synth_image_mixed(p, "doc_id", "w", "h", "a", "b", "p", "fmt")
    ppm = llmops.synth_ppm(p.filter(F.col("fmt") == 0), "doc_id", "w", "h", "a", "b")
    png = llmops.synth_png(p.filter(F.col("fmt") == 1), "doc_id", "w", "h", "a", "b")
    gif = llmops.synth_gif(p.filter(F.col("fmt") == 2), "doc_id", "w", "h", "a", "b", "p")
    union = ppm.unionByName(png).unionByName(gif)
    assert _rows(mixed.select("doc_id", F.md5(F.hex("payload")))) == _rows(
        union.select("doc_id", F.md5(F.hex("payload")))
    )
