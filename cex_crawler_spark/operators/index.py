"""Inverted-index construction and BM25 retrieval over the crawled corpus.

The reference stores scraped announcements as flat CSV and searches
them with pandas string filters (/root/reference/*/search in-memory);
a 100 TB crawl serves queries through an inverted index.  Postings
here stay RELATIONAL — (term, doc_id, tf) — which is exactly the
shape a distributed index shard build wants: group-by term gives the
posting lists, `linkgraph.compress_adjacency`'s gap coding applies
verbatim to the sorted doc-id lists for storage.

Scale notes:
- `build_postings` is one explode + one (term, doc) count — map-side
  combinable; a corpus-wide stopword is one aggregate key per doc.
- `bm25_topk` touches only the query terms' postings (an IN-literal
  filter that pushes into the parquet scan of a term-partitioned
  postings table), joins the dim-sized doc-length table, and
  aggregates per doc.  Corpus constants (N, avgdl) ride a one-row
  broadcast.  Scores round(4) for engine parity (ln is IEEE-stable
  at that precision — same discipline as the unigram/bigram LM ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def build_postings(
    docs: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(term, doc_id, tf) — relational inverted postings."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )


def bm25_scores(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(doc_id, n_hit_terms, score) — BM25 top-k (Robertson/Sparck
    Jones probabilistic weighting, the Okapi formulation with the
    +1-inside-the-log idf so scores stay positive):

        idf(t)  = ln(1 + (N − df + 0.5)/(df + 0.5))
        s(d,q)  = Σ_t idf·tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    Deterministic output: score rounds to 4 decimals and the order is
    (score DESC, doc_id ASC), so the top-k SET is engine-replayable.
    """
    postings = build_postings(docs, text_col, id_col).filter(
        F.col("term").isin(list(query_terms))
    )
    dl = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(F.col(text_col))).alias("dl"),
    )
    consts = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl") / F.count("*")).alias("avgdl"),
    )
    df_stats = postings.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        postings.join(df_stats, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(consts))
        .select(
            "doc_id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (1 - b + F.lit(b) * F.col("dl") / F.col("avgdl"))
                )
            ).alias("part"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_hit_terms"),
            F.round(F.sum("part"), 4).alias("score"),
        )
    )
    return scored


def bm25_topk(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k wrapper over :func:`bm25_scores` — (score DESC, doc_id)
    makes the k-set engine-replayable."""
    return (
        bm25_scores(docs, text_col, id_col, query_terms, k1, b)
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(k)
    )


def anchor_boosted_topk(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    anchors: DataFrame,
    query_terms: list[str],
    k: int = 20,
    w_body: float = 0.7,
    w_anchor: float = 0.3,
) -> DataFrame:
    """(doc_id, body_score, anchor_score, score) — two-field retrieval
    (BM25F-lite): the page's own text AND the anchor text others use
    to link to it, scored as separate BM25 fields and fused with
    fixed weights.  Anchor text is the web's oldest relevance hack —
    the linking page describes the target better than the target
    describes itself (nav chrome, image-only pages, the classic
    "miserable failure" effect) — which is why every web engine
    indexes it as a field.

    ``anchors``: (doc_id, anchor) rows from ``linkgraph.page_links``
    (href resolved/grouped upstream).  Each field's BM25 uses its OWN
    corpus statistics.  Scale shape: the anchor field is one
    collect-free groupBy concat (anchor rows are short) + the same
    postings path; fusion is a full-outer hash join on doc_id.
    """
    anchor_docs = anchors.groupBy(F.col(id_col).alias("doc_id")).agg(
        F.concat_ws(" ", F.collect_list("anchor")).alias("__atext")
    ).select(F.col("doc_id").alias(id_col), F.col("__atext"))
    sb = bm25_scores(docs, text_col, id_col, query_terms).select(
        "doc_id", F.col("score").alias("body_score")
    )
    sa = bm25_scores(anchor_docs, "__atext", id_col, query_terms).select(
        "doc_id", F.col("score").alias("anchor_score")
    )
    fused = sb.join(sa, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("body_score", F.lit(0.0)).alias("body_score"),
        F.coalesce("anchor_score", F.lit(0.0)).alias("anchor_score"),
    ).withColumn(
        "score",
        F.round(
            F.lit(w_body) * F.col("body_score")
            + F.lit(w_anchor) * F.col("anchor_score"),
            4,
        ),
    )
    return fused.orderBy(F.col("score").desc(), F.col("doc_id")).limit(k)


def positional_rows(
    docs: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(doc_id, pos, term) — the positional index rows a phrase query
    consumes.  One posexplode; positions are 0-based offsets in the
    tokenized doc."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "term"),
    )


def phrase_match(
    docs: DataFrame, text_col: str, id_col: str, phrase_terms: list[str]
) -> DataFrame:
    """(doc_id, n_occurrences, first_pos) — EXACT phrase retrieval via
    position-adjacency joins over the positional index (the classic
    next-word join: term_i at pos p must meet term_{i+1} at p+1).
    Bag-of-words BM25 can't distinguish "merge join" from "join ...
    merge"; phrase queries are why positional postings exist.

    Scale shape: each adjacency join is keyed (doc_id, pos) and only
    touches the phrase terms' rows (IN-literal pushdown); a P-term
    phrase is P−1 hash joins, fanout bounded by true occurrences.
    """
    if not phrase_terms:
        raise ValueError("phrase_terms must be non-empty")
    rows = positional_rows(docs, text_col, id_col).filter(
        F.col("term").isin(list(phrase_terms))
    ).persist()
    cur = rows.filter(F.col("term") == phrase_terms[0]).select(
        "doc_id", F.col("pos").alias("start"), F.col("pos").alias("pos")
    )
    for t in phrase_terms[1:]:
        nxt = rows.filter(F.col("term") == t).select(
            F.col("doc_id").alias("__d"), F.col("pos").alias("__p")
        )
        cur = cur.join(
            nxt,
            (F.col("doc_id") == F.col("__d"))
            & (F.col("__p") == F.col("pos") + 1),
        ).select("doc_id", "start", F.col("__p").alias("pos"))
    out = cur.groupBy("doc_id").agg(
        F.count("*").alias("n_occurrences"),
        F.min("start").alias("first_pos"),
    )
    rows.unpersist()
    return out


def phrase_snippets(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    phrase_terms: list[str],
    context: int = 3,
) -> DataFrame:
    """(doc_id, n_occurrences, first_pos, snippet) — keyword-in-
    context extraction: ``context`` tokens either side of the FIRST
    phrase occurrence, rebuilt scan-side from the token array (no
    second pass over text, no UDF).  The result-page tier of the
    search stack."""
    hits = phrase_match(docs, text_col, id_col, phrase_terms)
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("__t")
    )
    start = F.greatest(F.col("first_pos") - context, F.lit(0))
    length = F.lit(len(phrase_terms) + 2 * context)
    return hits.join(toks, "doc_id").select(
        "doc_id",
        "n_occurrences",
        "first_pos",
        F.array_join(
            F.slice(F.col("__t"), (start + 1).cast("int"), length), " "
        ).alias("snippet"),
    )


def term_suggest(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    queries: list[str],
    max_distance: int = 2,
    k: int = 3,
) -> DataFrame:
    """(query, rank, suggestion, distance, df) — spelling suggestions
    from the corpus's OWN vocabulary: candidates within ``max_
    distance`` edits (exact integer Levenshtein DP — engine-
    replayable, unlike embedding similarity), ranked by (distance,
    −document-frequency, term).  Vocabulary df is one aggregate;
    the query list is a broadcast literal cross join — vocab × |q|
    rows, scan-side distance."""
    from pyspark.sql import Window

    vocab = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("term")
        .agg(F.count_distinct("doc_id").alias("df"))
    )
    qdf = docs.sparkSession.createDataFrame(
        [(q,) for q in queries], ["query"]
    )
    cand = (
        vocab.crossJoin(F.broadcast(qdf))
        .withColumn("distance", F.levenshtein("query", "term"))
        .filter(F.col("distance") <= max_distance)
    )
    w = Window.partitionBy("query").orderBy(
        "distance", F.col("df").desc(), "term"
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query", "rank", F.col("term").alias("suggestion"),
                "distance", "df")
    )


def merge_postings(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold a DELTA postings segment (re-crawled docs, re-tokenized)
    into a standing segment: the delta's documents REPLACE their base
    rows entirely (a revisit may drop terms — per-term upsert would
    leak stale postings), untouched documents pass through one
    anti-join.  Work is O(base + delta) with a doc-keyed anti-join —
    independent of how many merges preceded, the Lucene
    segment-replace discipline relationally.

    The correctness invariant (oracled): merge(build(old),
    build(changed)) ≡ build(current corpus) — incremental indexing
    equals from-scratch.
    """
    upd = delta.select("doc_id").distinct()
    return base.join(upd, "doc_id", "left_anti").unionByName(delta)


def standing_alerts(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    queries: DataFrame,
) -> DataFrame:
    """(query_id, doc_id, n_terms) — PROSPECTIVE search (percolation):
    standing conjunctive queries matched against newly crawled
    documents, the inverse of retrieval — the index is small (the
    alert table), the query stream is the crawl.  A doc matches when
    it contains ALL of a query's terms.

    ``queries``: (query_id, term) rows — one row per required term.

    Scale shape: docs explode once to DISTINCT (doc, term), semi-
    filtered by the broadcast alert-term dim BEFORE any join fan-out;
    match = count of satisfied terms per (query, doc) equal to the
    query's term count (map-combinable count + one broadcast join —
    never docs × queries).
    """
    qsize = queries.groupBy("query_id").agg(F.count("*").alias("__need"))
    doc_terms = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .distinct()
        .join(F.broadcast(queries.select("term").distinct()), "term", "left_semi")
    )
    hits = doc_terms.join(F.broadcast(queries), "term").groupBy(
        "query_id", "doc_id"
    ).agg(F.count("*").alias("n_terms"))
    return hits.join(F.broadcast(qsize), "query_id").filter(
        F.col("n_terms") == F.col("__need")
    ).select("query_id", "doc_id", "n_terms")
