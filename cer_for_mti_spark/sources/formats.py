"""Scans for the reference's seven annotation formats (SURVEY.md §2.1),
re-expressed as order-independent DataFrame parsers.

The reference parses each format with a line-at-a-time Python class
(run_tool_evaluation.py:45-300); physical row order is load-bearing there
(doc grouping by pmid change). Here every parser is a pure projection /
filter / groupBy over a lines DataFrame — order-free, so it distributes.

Input convention: a DataFrame of raw lines (value: string) plus, for
directory-scanned formats, a file column. Use ``read_lines`` /
``read_whole_files`` helpers for paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_lines(spark: SparkSession, path: str) -> DataFrame:
    """Line scan with source file (for pmid-from-filename formats)."""
    return spark.read.text(path).withColumn("file", F.input_file_name())


def read_whole_files(spark: SparkSession, path: str) -> DataFrame:
    """S1: whole-file corpus scan — pmid from filename, first line title,
    second line abstract (reference: BERT_annotator.py:213-230,
    README.md:15)."""
    df = spark.read.text(path, wholetext=True).withColumn(
        "file", F.input_file_name()
    )
    pmid = F.regexp_extract("file", r"([^/]+)\.txt$", 1)
    lines = F.split("value", "\n")
    return df.select(
        pmid.alias("pmid"),
        F.element_at(lines, 1).alias("title"),
        F.element_at(lines, 2).alias("abstract"),
        F.concat_ws(" ", F.element_at(lines, 1), F.element_at(lines, 2)).alias("text"),
    )


def parse_brat(lines: DataFrame) -> DataFrame:
    """S2: BRAT standoff rows ``T<n>\\t<class> <start> <end>\\t<surface>``
    -> (pmid, ann_id, cls, start, end, term). Drops AnnotatorNotes
    metadata (F2, run_tool_evaluation.py:447-448), keeps only T rows
    (F1, :269). Fragment spans ``start end;start2 end2`` use the FIRST
    start and LAST end (the reference's enclosing-span reading,
    :449-462). Expects columns (pmid, value)."""
    parts = F.split("value", "\t")
    meta = F.element_at(parts, 2)
    ann = (
        lines.filter(F.col("value").startswith("T"))
        .filter(~meta.contains("AnnotatorNotes"))
        .select(
            "pmid",
            F.element_at(parts, 1).alias("ann_id"),
            F.split(meta, " ").alias("m"),
            F.element_at(parts, 3).alias("term"),
        )
    )
    offsets = F.split(F.concat_ws(" ", F.slice("m", 2, 100)), "[ ;]")
    return ann.select(
        "pmid",
        "ann_id",
        F.element_at("m", 1).alias("cls"),
        F.element_at(offsets, 1).cast("int").alias("start"),
        F.element_at(offsets, -1).cast("int").alias("end"),
        "term",
    )


def parse_pmid_tsv(lines: DataFrame) -> DataFrame:
    """S3: pmid-keyed TSV ``pmid\\tterm`` -> per-doc term sets — the
    reference's run-length key-change grouping (run_tool_evaluation.py:
    138-160) replaced by groupBy/collect_set (order dependence gone)."""
    parts = F.split("value", "\t")
    return (
        lines.select(
            F.element_at(parts, 1).alias("pmid"),
            F.trim(F.element_at(parts, 2)).alias("term"),
        )
        .filter(F.col("term") != "")
        .dropDuplicates()
    )


def parse_block_format(lines: DataFrame) -> DataFrame:
    """S4: blank-line-delimited blocks, first line of each block is the
    pmid, following lines are terms (ProcessChemDataExtractor,
    run_tool_evaluation.py:181-201). Needs a line number to recover block
    structure — pass (line_no, value) and, for multi-file input,
    (file, line_no, value).

    The running-sum window partitions by the source FILE when a `file`
    column is present — the natural parallel unit of the format (a block
    never spans files), so no task ever sorts more than one file and the
    plan has no single-partition global sort. Without a `file` column
    (single-file input, the reference's shape) the window is global:
    correct, but serial in one task — point big inputs at the file
    variant."""
    per_file = "file" in lines.columns
    if per_file:
        w = Window.partitionBy("file").orderBy("line_no")
        block_key = ["file", "block"]
    else:
        w = Window.orderBy("line_no")
        block_key = ["block"]
    blocks = (
        lines.withColumn("is_boundary", (F.trim("value") == "").cast("int"))
        .withColumn("block", F.sum("is_boundary").over(w))
        .filter(F.trim("value") != "")
    )
    wb = Window.partitionBy(*block_key).orderBy("line_no")
    tagged = blocks.withColumn("rn", F.row_number().over(wb))
    pmids = tagged.filter(F.col("rn") == 1).select(
        *block_key, F.trim("value").alias("pmid")
    )
    terms = tagged.filter(F.col("rn") > 1).select(
        *block_key, F.trim("value").alias("term")
    )
    return pmids.join(terms, block_key).select("pmid", "term").dropDuplicates()


def parse_pubtator(lines: DataFrame,
                   keep_types: tuple[str, ...] = ("Chemical", "Gene")) -> DataFrame:
    """S5: PubTator mixed rows — ``pmid|t|title`` text rows and
    ``pmid\\tstart\\tend\\tmention\\ttype\\tid`` mention rows; keep
    mentions with type in keep_types (F3, run_tool_evaluation.py:215-241)."""
    parts = F.split("value", "\t")
    mentions = lines.filter(F.size(parts) >= 5).select(
        F.element_at(parts, 1).alias("pmid"),
        F.element_at(parts, 2).cast("int").alias("start"),
        F.element_at(parts, 3).cast("int").alias("end"),
        F.element_at(parts, 4).alias("term"),
        F.element_at(parts, 5).alias("type"),
    )
    return mentions.filter(F.col("type").isin(*keep_types)).dropDuplicates()


def parse_json_annotations(spark_json_df: DataFrame) -> DataFrame:
    """S6: ``{pmid: [terms...]}`` JSON -> (pmid, term). Read the file with
    spark.read.json (schema map<string,array<string>>) or pass a DataFrame
    with (pmid, terms array<string>)."""
    return spark_json_df.select(
        "pmid", F.explode("terms").alias("term")
    ).dropDuplicates()


def parse_bio_tsv(lines: DataFrame) -> DataFrame:
    """S7: BIO token stream ``pmid\\ttoken\\tlabel`` with a line number ->
    (pmid, pos, token, label) — position comes from the line number so
    downstream windows are deterministic, unlike the reference's implicit
    file order (BERT_annotator.py:175-211)."""
    parts = F.split("value", "\t")
    return lines.select(
        F.element_at(parts, 1).alias("pmid"),
        F.col("line_no").alias("pos"),
        F.element_at(parts, 2).alias("token"),
        F.element_at(parts, 3).alias("label"),
    )


def parse_cdi_tsv(lines: DataFrame) -> DataFrame:
    """S8: CDI task TSV ``pmid\\ttitle\\tabstract`` -> (pmid, text) with
    text = title + ' ' + abstract (_read_CDI_data,
    BERT_annotator.py:232-252)."""
    parts = F.split("value", "\t")
    return lines.filter(F.size(parts) >= 3).select(
        F.element_at(parts, 1).alias("pmid"),
        F.concat_ws(
            " ", F.element_at(parts, 2), F.element_at(parts, 3)
        ).alias("text"),
    )


def merge_sentencepiece(tokens: DataFrame) -> DataFrame:
    """W3: SentencePiece subtoken merge — a token starting with the
    SPIECE_UNDERLINE ``▁`` begins a new word; any other token appends to
    the previous word; the ``▁`` is stripped from the output
    (XLNet_annotator.py:846-859; offline variant convert_output.py:57-77).
    Same running-segment trick as merge_wordpiece, keyed on the prefix
    instead of the 'X' label. Leading continuation pieces before the first
    ▁ token of a doc form their own segment (seg 0), mirroring the
    reference's list-append semantics when decoded_tokens is primed by the
    first row."""
    w = Window.partitionBy("pmid").orderBy("pos")
    seg = F.sum(
        F.when(F.col("token").startswith("▁"), 1).otherwise(0)
    ).over(w)
    merged = (
        tokens.withColumn("seg", seg)
        .withColumn("piece", F.regexp_replace("token", r"^▁", ""))
        .groupBy("pmid", "seg")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "piece"))),
                    lambda s: s["piece"],
                ),
                "",
            ).alias("token"),
            F.min_by("label", "pos").alias("label"),
            F.min("pos").alias("pos"),
        )
    )
    return merged.select("pmid", "pos", "token", "label")


def merge_wordpiece(tokens: DataFrame) -> DataFrame:
    """W2: WordPiece subtoken merge — label 'X' rows strip the '##' prefix
    and append to the previous token (BERT_annotator.py:667-694).
    Running-segment trick: new segment wherever label != 'X'."""
    w = Window.partitionBy("pmid").orderBy("pos")
    seg = F.sum(F.when(F.col("label") != "X", 1).otherwise(0)).over(w)
    merged = (
        tokens.withColumn("seg", seg)
        .withColumn(
            "piece", F.regexp_replace("token", r"^##", "")
        )
        .groupBy("pmid", "seg")
        .agg(
            # collect_list is unordered after a shuffle: sort by pos first
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "piece"))),
                    lambda s: s["piece"],
                ),
                "",
            ).alias("token"),
            F.min_by("label", "pos").alias("label"),
            F.min("pos").alias("pos"),
        )
    )
    return merged.select("pmid", "pos", "token", "label")


def canonicalize_formula(col):
    """C6: the reference's formula re-join — remove spaces WordPiece
    inserted around - / ( ) (BERT_annotator.py:722-729):
    'beta - globulin' -> 'beta-globulin'."""
    return F.regexp_replace(col, r"\s*([-/()])\s*", "$1")


def bio_decode(tokens: DataFrame) -> DataFrame:
    """W1: BIO entity reconstitution — 'B-*' starts an entity, 'I-*'
    appends, 'O' flushes (BERT_annotator.py:697-752; convert_output.py:
    79-125). Stateful scan -> running-segment window: segment id is the
    running count of non-continuation labels; entity = concat of tokens
    in segments whose first label starts with B."""
    w = Window.partitionBy("pmid").orderBy("pos")
    is_start = (~F.col("label").startswith("I")).cast("int")
    seg = F.sum(is_start).over(w)
    ents = (
        tokens.withColumn("seg", seg)
        .groupBy("pmid", "seg")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "token"))),
                    lambda s: s["token"],
                ),
                " ",
            ).alias("raw_term"),
            F.min_by("label", "pos").alias("first_label"),
            F.min("pos").alias("pos"),
        )
        .filter(F.col("first_label").startswith("B"))
    )
    return ents.select(
        "pmid", "pos",
        canonicalize_formula(F.col("raw_term")).alias("term"),
        F.regexp_extract("first_label", r"^B-?(.*)$", 1).alias("cls"),
    )
