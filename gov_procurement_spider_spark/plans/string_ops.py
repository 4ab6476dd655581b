"""F9/F10 multi-line-cell probes and the Python UDTF surface (SURVEY §2.8,
§2.11).

F9/F10 are the reference's '<br>'-split → '：'-suffix → '；'-rejoin cell
normalizations (chongqing.py:71-75, sichuan.py:144-145, hebei.py:143-146).
The UDTF probe exercises Spark 4's python UDTF API on the reference's
parse() 1→N contract (parser_module_specification.md:27-32) — kept as an API
demo: the engine's production path is explode over vectorized extraction
(see crawler/fetcher.py and operators/splitter.py), because row-at-a-time
python UDTFs are the slow path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


@register(
    "f9_multiline_cell_join",
    """
    SELECT p_partkey,
           array_to_string(
             list_transform(
               string_split(p_name || '<br>规格：' || p_type || '<br>品牌：' || p_brand,
                            '<br>'),
               x -> string_split(x, '：')[-1]),
             '；') AS cell
    FROM part WHERE p_partkey % 7 = 0
    """,
)
def f9_multiline_cell_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: '<br>'-split, keep the value after '：', rejoin with '；'
    (ref chongqing.py:71-75 / spec §102-108), pure column expressions."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 7 == 0)
    raw = F.concat(
        "p_name", F.lit("<br>规格："), "p_type", F.lit("<br>品牌："), "p_brand"
    )
    return p.select(
        "p_partkey",
        F.concat_ws(
            "；",
            F.transform(
                F.split(raw, "<br>"), lambda x: F.substring_index(x, "：", -1)
            ),
        ).alias("cell"),
    )


@register(
    "f10_dun_split_rejoin",
    """
    SELECT p_partkey,
           array_to_string(string_split(p_name || '、' || p_type || '、' || p_brand, '、'),
                           ' | ') AS joined
    FROM part WHERE p_partkey % 11 = 0
    """,
)
def f10_dun_split_rejoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10: '、'-split + ' | '-rejoin (ref hebei.py:143-146)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 11 == 0)
    raw = F.concat("p_name", F.lit("、"), "p_type", F.lit("、"), "p_brand")
    return p.select(
        "p_partkey",
        F.concat_ws(" | ", F.split(raw, "、")).alias("joined"),
    )


@register(
    "u1_udtf_word_freq",
    """
    SELECT doc_id, word, count(*) AS n
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word LIKE 'a%'
    GROUP BY doc_id, word
    """,
)
def u1_udtf_word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 `@udtf`) emitting (word, count) rows per doc —
    the parse()-shaped 1→N UDTF surface, lateral-joined per input row."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, n bigint")
    class WordFreq:
        def eval(self, text: str):
            counts: dict[str, int] = {}
            for w in (text or "").split(" "):
                if w.startswith("a"):
                    counts[w] = counts.get(w, 0) + 1
            for w, n in counts.items():
                yield w, n

    spark.udtf.register("word_freq", WordFreq)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_docs_udtf")
    return spark.sql(
        "SELECT d.doc_id, w.word, w.n FROM _docs_udtf d, LATERAL word_freq(d.text) w"
    )
