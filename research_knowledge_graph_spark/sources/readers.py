"""Input readers (reference S1-S4, ``src/main.py:87-119`` + ``src/utils/pdf.py``).

The reference ingests JSON files/arrays, directories of ``*.json`` + ``*.pdf``,
and plain text files — all driver-side loops. Here each is a distributed
``spark.read``; binary documents (the PDF analog) come through the
``binaryFile`` source and decode in an Arrow-batched UDF.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAPER_FIELDS = ["title", "abstract", "year", "venue", "doi", "arxiv_id", "authors", "text"]


def read_papers_json(spark: SparkSession, path: str) -> DataFrame:
    """S1: one JSON file holding an object or an array of paper dicts
    (``main.py:90-98``). multiLine handles the array form."""
    df = spark.read.option("multiLine", "true").json(path)
    for f in PAPER_FIELDS:
        if f not in df.columns:
            df = df.withColumn(f, F.lit(None).cast("string"))
    return df


def read_papers_dir(spark: SparkSession, path: str) -> DataFrame:
    """S2: directory scan — ``*.json`` papers plus binary docs flattened into
    one logical stream (``main.py:99-116``). Returns the JSON side; binary
    docs come from :func:`read_binary_docs`."""
    return read_papers_json(spark, os.path.join(path, "*.json"))


def read_binary_docs(spark: SparkSession, path: str, glob: str = "*.pdf") -> DataFrame:
    """S3 source: binary documents via the binaryFile source —
    (path, modificationTime, length, content:binary). Text extraction is the
    caller's UDF (html_text.extract_text for web pages; a PDF decode UDF
    would slot in identically — the decode library is stubbed in this
    sandbox, see operators/multimodal.py)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def read_text_files(spark: SparkSession, path: str) -> DataFrame:
    """S4: whole-file text read (``utils/pdf.py:39-60``) — (path, text)."""
    return (
        spark.read.option("wholetext", "true")
        .text(path)
        .withColumn("path", F.input_file_name())
        .select("path", F.col("value").alias("text"))
    )


def assemble_docs_from_papers(papers: DataFrame) -> DataFrame:
    """F7 text assembly over a papers DataFrame: text column = provided
    ``text`` else "Title: …\\n\\nAbstract: …\\n\\n{body}"
    (``paper_ingestion_agent.py:69-81``)."""
    from research_knowledge_graph_spark.functions.textops import assemble_text_col

    body = papers["body"] if "body" in papers.columns else F.lit(None).cast("string")
    return papers.withColumn(
        "doc_text",
        F.coalesce(
            # falsy-text fallthrough, not just NULL: a present-but-empty
            # text field assembles from title/abstract, matching the
            # reference's `or` semantics and the assemble_text_py twin
            F.when(F.length("text") > 0, F.col("text")),
            assemble_text_col(F.col("title"), F.col("abstract"), body),
        ),
    )
