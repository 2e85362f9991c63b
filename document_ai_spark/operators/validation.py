"""Document-level QA predicates + refusal-cause gathering (SURVEY.md §2.10).

Re-expresses the reference's rule validator
(/root/reference/ai_documents/validation/entities.py:27-143) over the
extracted table: each predicate is a boolean column, the failed-cause list is
built with pure array expressions (filter/transform — no UDF, exactly the
`gather_refused_motivs` analog at validation/entities.py:87-119), and
`validated` is the grand conjunction (validation/entities.py:137-140).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# cause name -> (column builder) — analog of the 13 named validators
MIN_DENSITY_WORDS = 5  # avg words/block floor for `low_density`


def validate_extracted(extracted: DataFrame) -> DataFrame:
    """Append predicate columns + `causes` + `validated`."""
    df = (
        extracted.withColumn("c_parse_failed", ~F.col("parse_ok"))
        .withColumn(
            "c_pdf_parse_failed", F.col("err") == F.lit("pdf_parse_failed")
        )
        .withColumn(
            "c_truncated_page", F.col("err") == F.lit("truncated_page")
        )
        .withColumn(
            "c_empty_main_text",
            F.col("parse_ok") & (F.length("main_text") == 0),
        )
        .withColumn(
            "c_low_density",
            F.col("parse_ok")
            & (F.col("charset") != F.lit("binary"))  # html path only
            & (F.length("main_text") > 0)
            & (
                F.size("spans") * MIN_DENSITY_WORDS
                > F.size(F.split(F.col("main_text"), " "))
            ),
        )
    )
    flagged = F.filter(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("name"), F.col(col).alias("failed")
                )
                for name, col in [
                    ("parse_failed", "c_parse_failed"),
                    ("pdf_parse_failed", "c_pdf_parse_failed"),
                    ("truncated_page", "c_truncated_page"),
                    ("empty_main_text", "c_empty_main_text"),
                    ("low_density", "c_low_density"),
                ]
            ]
        ),
        lambda s: s["failed"],
    )
    return df.withColumn(
        "causes", F.transform(flagged, lambda s: s["name"])
    ).withColumn("validated", F.size("causes") == 0)
