"""Oracle-paired text-analysis & dedup queries over the ``documents``
table (BASELINE.json north star: dedup + text analysis).

The shingle / MinHash / LSH machinery uses md5 hex strings as hashes, so
the DuckDB oracle reproduces signatures, buckets, candidates and Jaccard
values *exactly* — the approximate algorithm itself is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions import text as TX
from ..operators import dedup_first, grouped_running_sum
from ..operators.minhash import (
    MINHASH_COEFFS,
    MINHASH_P,
    candidate_pairs,
    jaccard,
    lsh_bands,
    minhash_signatures,
    positioned_shingles,
    prefix_filter_pairs,
    probe_candidates,
    shared_shingle_pairs,
    shingles,
)
from .relational import _register

# Shared DuckDB CTEs mirroring functions/text.py + operators/minhash.py.
_TOKENS_CTE = """
WITH tok AS (
    SELECT doc_id, text, regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+') AS tokens
    FROM documents
)
"""


# MinHash oracle snippets — generated from the SAME coefficients the Spark
# operator uses (operators/minhash.py), so the two sides cannot drift.
_H1_SQL = "CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT)"
_H2_SQL = "CAST(('0x' || substr(md5(shingle), 9, 8)) AS BIGINT)"
_SIG_COLS_SQL = ",\n           ".join(
    f"min(({a} * {_H1_SQL} + {b} * {_H2_SQL} + {c}) % {MINHASH_P}) AS h{s}"
    for s, (a, b, c) in enumerate(MINHASH_COEFFS)
)
_BANDS_ROWS_SQL = "\n    UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_idx, "
    f"md5(CAST(h{2 * b} AS VARCHAR) || ':' || CAST(h{2 * b + 1} AS VARCHAR))"
    f" AS band_hash FROM sig"
    for b in range(4)
)

_SHINGLE_CTE = (
    _TOKENS_CTE
    + """
, pos AS (
    SELECT doc_id, tokens,
           unnest(generate_series(1, greatest(len(tokens) - 4, 0))) AS i
    FROM tok
),
sh AS (
    SELECT DISTINCT doc_id, array_to_string(tokens[i:i+4], ' ') AS shingle
    FROM pos
)
"""
)

_MINHASH_CTE = (
    _SHINGLE_CTE
    + """
, sig AS (
    SELECT doc_id,
           """ + _SIG_COLS_SQL + """
    FROM sh GROUP BY doc_id
),
bands AS (
    """ + _BANDS_ROWS_SQL + """
),
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
)
"""
)

_JACCARD_TAIL = """
, sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
    SELECT c.id_a, c.id_b, count(*) AS n_common
    FROM cand c
    JOIN sh a ON a.doc_id = c.id_a
    JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
    GROUP BY c.id_a, c.id_b
)
SELECT cm.id_a, cm.id_b,
       CAST(cm.n_common AS DOUBLE) / (na.n_sh + nb.n_sh - cm.n_common) AS jaccard
FROM common cm
JOIN sizes na ON na.doc_id = cm.id_a
JOIN sizes nb ON nb.doc_id = cm.id_b
"""


@_register(
    "text_token_stats",
    _TOKENS_CTE
    + """
    SELECT doc_id,
           CAST(len(tokens) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+')) AS BIGINT)
               AS n_bpe_tokens,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM tok
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish alpha/digit-run tokens."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.token_count("text").cast("long").alias("n_tokens"),
        F.size(TX.bpe_ish_tokens("text")).cast("long").alias("n_bpe_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )


@_register(
    "text_quality_scores",
    _TOKENS_CTE
    + """
    SELECT doc_id,
           CAST(length(list_filter(tokens,
                    t -> list_contains(['the','a','and','is'], t))) AS DOUBLE)
               / len(tokens)
             - 0.5 * coalesce(
                   CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))
                        AS DOUBLE) / nullif(length(text), 0), 0.0)
             + 0.1 * (least(CAST(len(tokens) AS DOUBLE), 100.0) / 100.0)
               AS quality_score
    FROM tok
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality heuristic: stopword density - punctuation soup + length bonus."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", TX.quality_score("text").alias("quality_score"))


@_register(
    "text_lang_id",
    _TOKENS_CTE
    + """
    , hits AS (
        SELECT doc_id,
           length(list_filter(tokens, t -> list_contains(['der','die','und','ist'], t))) AS h_de,
           length(list_filter(tokens, t -> list_contains(['the','a','and','is'], t))) AS h_en,
           length(list_filter(tokens, t -> list_contains(['el','los','y','es'], t))) AS h_es,
           length(list_filter(tokens, t -> list_contains(['le','la','et','est'], t))) AS h_fr
        FROM tok
    )
    SELECT doc_id,
           CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
                WHEN h_de = greatest(h_de, h_en, h_es, h_fr) THEN 'de'
                WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
                WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
                ELSE 'fr' END AS lang_pred
    FROM hits
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID (deterministic tiebreak de<en<es<fr)."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", TX.lang_id("text").alias("lang_pred"))


# Repetition-stat CTE chain, shared by the standalone query and the
# composed curation pipeline below (one definition, two consumers).
_REP_CTES = (
    _TOKENS_CTE
    + """
    , idx AS (
        SELECT doc_id, tokens,
               unnest(generate_series(1, len(tokens))) AS i
        FROM tok
    ),
    words AS (
        SELECT doc_id, tokens[i] AS w, i AS pos
        FROM idx WHERE tokens[i] <> ''
    ),
    big AS (
        SELECT doc_id,
               w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS bg
        FROM words
    ),
    bgc AS (
        SELECT doc_id, bg, count(*) AS c
        FROM big WHERE bg IS NOT NULL GROUP BY doc_id, bg
    ),
    bstats AS (
        SELECT doc_id, max(c) AS maxc, sum(c) AS nbg FROM bgc GROUP BY doc_id
    ),
    wstats AS (
        SELECT doc_id, count(*) AS nw, count(DISTINCT w) AS ndw
        FROM words GROUP BY doc_id
    ),
    rep AS (
        SELECT w.doc_id,
               coalesce(CAST(b.maxc AS DOUBLE) / b.nbg, 0.0) AS top_bigram_frac,
               1.0 - CAST(w.ndw AS DOUBLE) / w.nw AS dup_word_frac,
               (coalesce(CAST(b.maxc AS DOUBLE) / b.nbg, 0.0) <= 0.0625
                AND 1.0 - CAST(w.ndw AS DOUBLE) / w.nw <= 0.8) AS keep
        FROM wstats w LEFT JOIN bstats b ON w.doc_id = b.doc_id
    )
"""
)


@_register(
    "repetition_filter_stats",
    _REP_CTES
    + """
    SELECT doc_id, top_bigram_frac, dup_word_frac, keep FROM rep
    """,
)
def repetition_filter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document: the
    fraction of bigram slots occupied by the single most repeated
    bigram, the duplicate-word fraction, and a keep flag over both
    (thresholds chosen so the synthetic corpus splits) — the "remove
    boilerplate / degenerate repetition" stage of a training-data
    pipeline (Rae et al. 2021 section A1.3, public).

    Plan shape: ZERO shuffles, ONE scan.  A per-document statistic never
    needs an explode fan-out — the whole computation is array
    higher-order functions inside one narrow projection (bigrams via
    zip_with over two slices; the most-repeated-bigram count as the
    longest run in the SORTED bigram array, found by a single
    ``aggregate`` fold).  The naive posexplode -> lead-window ->
    re-aggregate formulation of the same stats costs two scans and four
    exchanges; this one is embarrassingly parallel at any scale.  The
    DuckDB oracle intentionally uses the exploded relational
    formulation — two independent derivations, same values.  Fractions
    are single IEEE divisions of exact integers — bit-identical across
    engines, no rounding convention needed."""
    d = load(spark, sf_dir, "documents")
    # "contains any non-whitespace char" is EXACTLY nw > 0 (nw counts
    # the non-empty WS_REGEX tokens) and pushes to the scan as a cheap
    # first-match predicate — filtering on the nw column would push the
    # substituted token-split HOF down instead (re-evaluating it once
    # per row just to filter).  NOT trim(text) <> '': trim strips only
    # 0x20 spaces, so a tab/VT-edged whitespace-only doc would slip
    # through (the hostile-whitespace fixture caught exactly that).
    stats = _with_repetition_raw(
        d.filter(F.col("text").rlike("[^ \t\n\x0B\f\r]")), "doc_id"
    )
    top_frac, dup_frac, keep = _repetition_fracs()
    return stats.select(
        "doc_id",
        top_frac.alias("top_bigram_frac"),
        dup_frac.alias("dup_word_frac"),
        keep.alias("keep"),
    )


def _with_repetition_raw(df: DataFrame, *keep_cols: str) -> DataFrame:
    """``keep_cols`` + the four per-document integer repetition stats
    (nw, ndw, maxc, nbg) as Catalyst array-HOF columns over ``text`` —
    shared by the standalone stats query and the composed curation
    pipeline so both fuse into a single scan.  The token and bigram
    arrays STAGE as real columns in their own projections (single
    evaluation: interpreted HOFs get no codegen subexpression
    elimination, and CollapseProject refuses to inline non-cheap
    expressions into their several consumers — the
    :func:`gopher_dup_trigram_chars` staging discipline, measured 2.3x
    on the trigram chain)."""
    toks = "filter(split(trim(text), '[ \\\\t\\\\n\\\\x0B\\\\f\\\\r]+'), x -> x != '')"
    bigrams = (
        "zip_with(slice(__toks, 1, greatest(size(__toks) - 1, 0)), "
        "slice(__toks, 2, greatest(size(__toks) - 1, 0)), "
        "(a, b) -> concat(a, ' ', b))"
    )
    # longest equal-run in the sorted bigram array == max occurrence
    # count of any single bigram; one fold, no grouping
    maxc = (
        "aggregate(array_sort(__bg), "
        "named_struct('prev', '', 'run', 0L, 'best', 0L), "
        "(acc, x) -> IF(x = acc.prev, "
        "named_struct('prev', x, 'run', acc.run + 1L, "
        "'best', greatest(acc.best, acc.run + 1L)), "
        "named_struct('prev', x, 'run', 1L, 'best', greatest(acc.best, 1L))), "
        "acc -> acc.best)"
    )
    return (
        df.select(*keep_cols, F.expr(toks).alias("__toks"))
        .select(*keep_cols, "__toks", F.expr(bigrams).alias("__bg"))
        .select(
            *keep_cols,
            F.expr("size(__toks)").cast("long").alias("nw"),
            F.expr("size(array_distinct(__toks))").cast("long").alias("ndw"),
            F.expr(maxc).alias("maxc"),
            F.expr("size(__bg)").cast("long").alias("nbg"),
        )
    )


def _repetition_fracs() -> tuple:
    """(top_bigram_frac, dup_word_frac, keep) expressions over the raw
    stat columns from :func:`_with_repetition_raw`."""
    top_frac = F.when(
        F.col("nbg") > 0, F.col("maxc").cast("double") / F.col("nbg")
    ).otherwise(F.lit(0.0))
    dup_frac = F.lit(1.0) - F.col("ndw").cast("double") / F.col("nw")
    return top_frac, dup_frac, (top_frac <= 0.0625) & (dup_frac <= 0.8)


@_register(
    "corpus_curation_pipeline",
    _REP_CTES
    + """
    , kept AS (SELECT doc_id FROM rep WHERE keep),
    sized AS (
        SELECT t.doc_id, d.lang,
               CAST(len(t.tokens) AS BIGINT) AS n_tokens,
               md5('cur' || CAST(t.doc_id AS VARCHAR)) AS h
        FROM tok t
        JOIN kept k ON k.doc_id = t.doc_id
        JOIN documents d ON d.doc_id = t.doc_id
    ),
    cum AS (
        SELECT doc_id, lang, n_tokens,
               sum(n_tokens) OVER (
                   PARTITION BY lang ORDER BY h, doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum_tokens
        FROM sized
    )
    SELECT doc_id, lang, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM cum
    WHERE cum_tokens <= CASE WHEN lang = 'en' THEN 6000 ELSE 2000 END
    """,
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation run: repetition quality filter -> per-language
    token-budget mixture over the SURVIVORS (en 6k, others 2k — binding
    on the filtered corpus).  Because the repetition stats are per-row
    array-HOF expressions, the filter FUSES into the mixture's scan (no
    join, no second scan — shared via ``_with_repetition_raw``); the
    cumulative sum then runs as the same two-pass range-partition
    decomposition as :func:`token_budget_mixture` (``operators/windows.
    grouped_running_sum``), so no stage ever funnels a whole language
    through one task.  That fusion is the payoff of keeping quality
    signals narrow; a groupBy-based filter stage would have forced a
    join here."""
    d = load(spark, sf_dir, "documents")
    with_stats = _with_repetition_raw(
        d.filter(F.col("text").rlike("[^ \t\n\x0B\f\r]")),
        "doc_id",
        "lang",
        "text",
    )  # non-ws-char containment == nw > 0, pushed cheap (see above)
    _, _, keep = _repetition_fracs()
    sized = with_stats.filter(keep).select(
        "doc_id",
        "lang",
        TX.token_count("text").cast("long").alias("n_tokens"),
        F.md5(F.concat(F.lit("cur"), F.col("doc_id").cast("string"))).alias("h"),
    )
    budget = F.when(F.col("lang") == "en", F.lit(6000)).otherwise(F.lit(2000))
    # cut_source: the UNFILTERED cheap key projection — the repetition
    # filter would force the HOF stats to evaluate in the cut-sample
    # pass, but cuts only affect bucket balance, so sampling the raw
    # corpus's key distribution is both correct and scan-cheap.
    cut_src = d.select(
        "lang",
        F.md5(F.concat(F.lit("cur"), F.col("doc_id").cast("string"))).alias("h"),
        "doc_id",
    )
    return (
        grouped_running_sum(
            sized,
            "lang",
            ["h", "doc_id"],
            "n_tokens",
            out_col="cum_tokens",
            cut_source=cut_src,
        )
        .filter(F.col("cum_tokens") <= budget)
        .select("doc_id", "lang", "n_tokens", "cum_tokens")
    )


@_register(
    "text_fingerprints",
    """
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS fp
    FROM documents
    """,
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 of normalized text."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", TX.fingerprint("text").alias("fp"))


@_register(
    "exact_dedup_documents",
    """
    SELECT doc_id, md5(regexp_replace(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS fp
    FROM documents
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY md5(regexp_replace(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))
        ORDER BY doc_id) = 1
    """,
)
def exact_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the fingerprint, keep lowest doc_id.
    The shuffle carries (fp, doc_id) only — never the document text."""
    d = load(spark, sf_dir, "documents")
    fp = d.select("doc_id", TX.fingerprint("text").alias("fp"))
    return dedup_first(fp, ["fp"], ["doc_id"]).select("doc_id", "fp")


@_register(
    "ngram_jaccard_pairs",
    _SHINGLE_CTE
    + """
, cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
)
"""
    + _JACCARD_TAIL,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram (5-shingle) Jaccard for every pair sharing a shingle —
    the inverted-index candidate join (precise tier of the dedup family).

    The shingle index feeds candidate generation and both sides of the
    verification join; at this scale Spark's pipelined recompute beats
    caching (measured), while a 100 TB run would materialize the index
    to parquet once and reuse it."""
    d = load(spark, sf_dir, "documents")
    sh = shingles(d)
    return jaccard(shared_shingle_pairs(sh), sh)


@_register("minhash_lsh_near_dup", _MINHASH_CTE + _JACCARD_TAIL)
def minhash_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(8 perms) + LSH(4 bands) candidates, verified with exact
    Jaccard — the scale tier: only bucket-mates are ever compared."""
    d = load(spark, sf_dir, "documents")
    sh = shingles(d)
    cands = candidate_pairs(lsh_bands(minhash_signatures(sh)))
    return jaccard(cands, sh)


@_register(
    "minhash_dedup_survivors",
    _MINHASH_CTE
    + """
    , sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
        SELECT c.id_a, c.id_b, count(*) AS n_common
        FROM cand c
        JOIN sh a ON a.doc_id = c.id_a
        JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
        GROUP BY c.id_a, c.id_b
    ),
    dupes AS (
        SELECT DISTINCT cm.id_b AS doc_id
        FROM common cm
        JOIN sizes na ON na.doc_id = cm.id_a
        JOIN sizes nb ON nb.doc_id = cm.id_b
        WHERE CAST(cm.n_common AS DOUBLE) / (na.n_sh + nb.n_sh - cm.n_common) >= 0.5
    )
    SELECT d.doc_id FROM documents d
    WHERE NOT EXISTS (SELECT 1 FROM dupes x WHERE x.doc_id = d.doc_id)
    """,
)
def minhash_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup dedup: drop the higher doc_id of every verified
    pair with Jaccard >= 0.5; anti-join the corpus against the drop list."""
    d = load(spark, sf_dir, "documents")
    sh = shingles(d)
    cands = candidate_pairs(lsh_bands(minhash_signatures(sh)))
    dupes = (
        jaccard(cands, sh)
        .filter(F.col("jaccard") >= 0.5)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    return d.select("doc_id").join(dupes, "doc_id", "left_anti")



# SimHash oracle: md5 low-60-bit lane via the '0x'||hex cast, 16 signed
# bit-votes, sign -> bit reassembly — generated to mirror the Spark exprs.
_SIMHASH_VOTES_SQL = ",\n           ".join(
    f"SUM(CASE WHEN (h & {1 << bit}) > 0 THEN 1 ELSE -1 END) AS b{bit}"
    for bit in range(16)
)
_SIMHASH_ASSEMBLE_SQL = " + ".join(
    f"(CASE WHEN COALESCE(b{bit}, 0) > 0 THEN {1 << bit} ELSE 0 END)"
    for bit in range(16)
)
_SIMHASH_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+') AS tokens
        FROM documents
    ),
    ex AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) AS h
        FROM tok, unnest(tokens) AS u(t)
    ),
    sig AS (
        SELECT doc_id,
           {_SIMHASH_VOTES_SQL}
        FROM ex GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST({_SIMHASH_ASSEMBLE_SQL} AS BIGINT) AS simhash
    FROM documents d LEFT JOIN sig USING (doc_id)
"""

@_register("simhash_signatures", _SIMHASH_ORACLE)
def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document from md5-derived token hashes: for each
    bit, sum +1/-1 over tokens and take the sign.  Pure Catalyst exprs
    (conv/shift/and); one narrow projection, no shuffle."""
    d = load(spark, sf_dir, "documents")
    # explode + 16 conditional SUMs in one hash aggregate — equivalent to
    # a per-row HOF fold but fully inside whole-stage codegen (HOF lambda
    # bodies evaluate interpreted; see operators/minhash.py shingles).
    h = F.conv(F.substring(F.md5("t"), 1, 15), 16, 10).cast("long")
    ex = d.select("doc_id", F.explode(TX.tokens("text")).alias("t")).select(
        "doc_id", h.alias("h")
    )
    aggs = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(1 << bit)) > 0, 1).otherwise(-1)
        ).alias(f"b{bit}")
        for bit in range(16)
    ]
    sig = ex.groupBy("doc_id").agg(*aggs)
    sim = F.lit(0).cast("long")
    for bit in range(16):
        sim = sim + F.when(
            F.coalesce(F.col(f"b{bit}"), F.lit(0)) > 0, F.lit(1 << bit)
        ).otherwise(F.lit(0))
    # left join keeps token-less docs with simhash 0, as the fold did
    return (
        d.select("doc_id")
        .join(sig, "doc_id", "left")
        .select("doc_id", sim.alias("simhash"))
    )


_VERIFIED_PAIRS_TAIL = """
, sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
    SELECT c.id_a, c.id_b, count(*) AS n_common
    FROM cand c
    JOIN sh a ON a.doc_id = c.id_a
    JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
    GROUP BY c.id_a, c.id_b
),
verified AS (
    SELECT cm.id_a, cm.id_b
    FROM common cm
    JOIN sizes na ON na.doc_id = cm.id_a
    JOIN sizes nb ON nb.doc_id = cm.id_b
    WHERE CAST(cm.n_common AS DOUBLE)
          / (na.n_sh + nb.n_sh - cm.n_common) >= 0.5
)
"""


@_register(
    "near_dup_components",
    _MINHASH_CTE.replace("WITH tok", "WITH RECURSIVE tok", 1)
    + _VERIFIED_PAIRS_TAIL
    + """
    , und AS (SELECT id_a AS a, id_b AS b FROM verified
              UNION SELECT id_b, id_a FROM verified),
    walk AS (
        SELECT a, b FROM und
        UNION
        SELECT w.a, e.b FROM walk w JOIN und e ON w.b = e.a
    )
    SELECT a AS doc_id, LEAST(a, MIN(b)) AS component
    FROM walk GROUP BY a
    """,
)
def near_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS: verified pairs (Jaccard >= 0.5) fed into
    iterative min-label connected components (operators/graph.py) — the
    engine's iterative fixpoint operator, oracle-checked against a
    recursive-CTE transitive closure."""
    from ..operators.graph import connected_components

    d = load(spark, sf_dir, "documents")
    sh = shingles(d)
    verified = (
        jaccard(candidate_pairs(lsh_bands(minhash_signatures(sh))), sh)
        .filter(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b")
    )
    return connected_components(verified).select(
        F.col("id").alias("doc_id"), "component"
    )


@_register(
    "tfidf_top_terms",
    _TOKENS_CTE
    + """
    , tl AS (SELECT doc_id, unnest(tokens) AS token FROM tok),
    tc AS (SELECT doc_id, token, COUNT(*) AS n_td FROM tl GROUP BY doc_id, token),
    dl AS (SELECT doc_id, token, n_td,
                  SUM(n_td) OVER (PARTITION BY doc_id) AS len_d
           FROM tc),
    idf AS (SELECT token, COUNT(*) AS n_df FROM tc GROUP BY token),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT dl.doc_id, dl.token,
               round((CAST(dl.n_td AS DOUBLE) / dl.len_d)
                     * ln((n.n_docs + 1.0) / (idf.n_df + 1.0)), 6) AS tfidf
        FROM dl JOIN idf USING (token) CROSS JOIN n
    )
    SELECT doc_id, token, tfidf, CAST(rnk AS INT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, token) AS rnk
          FROM scored)
    WHERE rnk <= 5
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document.  Term counts aggregate once;
    document length rides the SAME doc_id partitioning as a window (no
    second scan); document frequency is the only token-keyed shuffle.
    ln() is IEEE-identical across engines on these arguments and the
    6-digit round absorbs any last-ulp skew."""
    d = load(spark, sf_dir, "documents")
    tl = d.select("doc_id", F.explode(TX.tokens("text")).alias("token"))
    tc = tl.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("n_td"))
    dl = tc.withColumn(
        "len_d", F.sum("n_td").over(Window.partitionBy("doc_id"))
    )
    idf = tc.groupBy("token").agg(F.count(F.lit(1)).alias("n_df"))
    n_docs = d.count()
    scored = dl.join(idf, "token").select(
        "doc_id",
        "token",
        F.round(
            (F.col("n_td").cast("double") / F.col("len_d"))
            * F.log((F.lit(n_docs) + 1.0) / (F.col("n_df") + 1.0)),
            6,
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "token")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("doc_id", "token", "tfidf", "rank")
    )


@_register(
    "training_data_pipeline",
    """
    WITH tok AS (
        SELECT doc_id, text, regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+') AS tokens
        FROM documents
    ),
    scored AS (
        SELECT doc_id, text, tokens,
               CAST(length(list_filter(tokens,
                        t -> list_contains(['the','a','and','is'], t))) AS DOUBLE)
                   / len(tokens)
                 - 0.5 * coalesce(
                       CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))
                            AS DOUBLE) / nullif(length(text), 0), 0.0)
                 + 0.1 * (least(CAST(len(tokens) AS DOUBLE), 100.0) / 100.0) AS q,
               length(list_filter(tokens, t -> list_contains(['der','die','und','ist'], t))) AS h_de,
               length(list_filter(tokens, t -> list_contains(['the','a','and','is'], t))) AS h_en,
               length(list_filter(tokens, t -> list_contains(['el','los','y','es'], t))) AS h_es,
               length(list_filter(tokens, t -> list_contains(['le','la','et','est'], t))) AS h_fr
        FROM tok
    ),
    kept AS (
        SELECT doc_id, text FROM scored
        WHERE q >= 0.05
          AND greatest(h_de, h_en, h_es, h_fr) > 0
          AND h_de <> greatest(h_de, h_en, h_es, h_fr)
          AND h_en = greatest(h_de, h_en, h_es, h_fr)
    ),
    ex AS (
        SELECT doc_id, text,
               md5(regexp_replace(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS f
        FROM kept
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY md5(regexp_replace(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))
            ORDER BY doc_id) = 1
    ),
    ktok AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+') AS tokens FROM ex
    ),
    pos AS (
        SELECT doc_id, tokens,
               unnest(generate_series(1, greatest(len(tokens) - 4, 0))) AS i
        FROM ktok
    ),
    sh AS (
        SELECT DISTINCT doc_id, array_to_string(tokens[i:i+4], ' ') AS shingle
        FROM pos
    ),
    sig AS (
        SELECT doc_id,
           """ + _SIG_COLS_SQL + """
        FROM sh GROUP BY doc_id
    ),
    bands AS (
    """ + _BANDS_ROWS_SQL + """
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
         AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
        SELECT c.id_a, c.id_b, count(*) AS n_common
        FROM cand c
        JOIN sh a ON a.doc_id = c.id_a
        JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
        GROUP BY c.id_a, c.id_b
    ),
    dupes AS (
        SELECT DISTINCT cm.id_b AS doc_id
        FROM common cm
        JOIN sizes na ON na.doc_id = cm.id_a
        JOIN sizes nb ON nb.doc_id = cm.id_b
        WHERE CAST(cm.n_common AS DOUBLE)
              / (na.n_sh + nb.n_sh - cm.n_common) >= 0.5
    )
    SELECT e.doc_id,
           CAST(len(regexp_split_to_array(trim(e.text), '[ \\t\\n\\x0B\\f\\r]+')) AS BIGINT)
               AS n_tokens
    FROM ex e
    WHERE NOT EXISTS (SELECT 1 FROM dupes d WHERE d.doc_id = e.doc_id)
      AND substr(md5('tdp' || CAST(e.doc_id AS VARCHAR)), 1, 4) < '8000'
    """,
)
def training_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed end-to-end training-data prep run — what a user of
    this engine actually executes nightly: quality filter -> language
    filter (en) -> exact dedup (fingerprint, keep lowest id) -> near-dup
    dedup (MinHash+LSH verified Jaccard >= 0.5) -> deterministic 50%
    sample -> token accounting.  Every stage is one of the engine's
    proven operators composed lazily into a single Catalyst plan; the
    oracle replays the identical chain in SQL.

    Shared-subtree note: ``ex`` feeds three sinks (the shingle index,
    the survivor anti-join, the sample) and ``sh`` two (the minhash
    chain and the jaccard shingle-set join), so the lazy plan
    re-evaluates the quality->lang->exact-dedup subtree per sink.  A
    round-4 ``localCheckpoint(eager=True)`` materialization of both was
    measured FASTER in-session but SLOWER under the driver's bench
    conditions (3.14s -> 4.17s) and is scale-hostile anyway
    (executor-local blocks are lost on executor failure; eager
    materialization defeats whole-plan optimization), so the plan stays
    fully lazy.  At cluster scale, a user re-running this nightly
    should ``persist(MEMORY_AND_DISK)`` ``ex`` scoped to the job — or
    ``df.checkpoint()`` against a reliable dir — rather than bake
    materialization into the operator."""
    from ..operators.sampling import deterministic_sample

    d = load(spark, sf_dir, "documents")
    kept = d.select(
        "doc_id",
        "text",
        TX.quality_score("text").alias("q"),
        TX.lang_id("text").alias("lang_pred"),
    ).filter((F.col("q") >= 0.05) & (F.col("lang_pred") == "en"))

    fp = kept.select("doc_id", "text", TX.fingerprint("text").alias("f"))
    ex = dedup_first(fp, ["f"], ["doc_id"]).select("doc_id", "text")
    sh = shingles(ex)
    dupes = (
        jaccard(candidate_pairs(lsh_bands(minhash_signatures(sh))), sh)
        .filter(F.col("jaccard") >= 0.5)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    survivors = ex.join(dupes, "doc_id", "left_anti")
    sampled = deterministic_sample(survivors, "doc_id", 0.5, salt="tdp")
    return sampled.select(
        "doc_id", TX.token_count("text").cast("long").alias("n_tokens")
    )


# ---------------------------------------------------------------------------
# Token-budget mixture — the data-mixture construction step: fill a
# per-language token budget deterministically.
# ---------------------------------------------------------------------------


@_register(
    "token_budget_mixture",
    _TOKENS_CTE
    + """
    , sized AS (
        SELECT doc_id, lang,
               CAST(len(tokens) AS BIGINT) AS n_tokens,
               md5('mix' || CAST(doc_id AS VARCHAR)) AS h
        FROM tok JOIN documents USING (doc_id)
    ),
    cum AS (
        SELECT doc_id, lang, n_tokens,
               sum(n_tokens) OVER (
                   PARTITION BY lang ORDER BY h, doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum_tokens
        FROM sized
    )
    SELECT doc_id, lang, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM cum
    WHERE cum_tokens <= CASE WHEN lang = 'en' THEN 8000 ELSE 3000 END
    """,
)
def token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture construction: fill each language's token budget (en
    8k, others 3k here — chosen to BIND on the test corpus, so the cut
    is exercised, not vacuous) by taking documents in deterministic salted-hash
    order until the running token total crosses the budget — the "build
    a 1B-token mix at fixed language proportions" step of assembling a
    training corpus.  Hash order makes the selection a reproducible
    uniform sample of each language, not a prefix of ingestion order.

    Plan: the per-language cumulative sum runs as the TWO-PASS
    range-partition decomposition (``operators/windows.
    grouped_running_sum``), not a ``Window.partitionBy(lang)`` — the
    single-window formulation funnels each language's entire corpus
    through one sequential task, and at 100 TB "en" alone is tens of TB.
    Range partitioning on (lang, h, doc_id) bounds every task at the
    planner's partition size regardless of language skew; per-range
    partial sums plus broadcast per-range offsets reassemble the exact
    global running sum.  Budgets arrive as an expression, so changing
    the mix never changes the plan shape."""
    d = load(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id",
        "lang",
        TX.token_count("text").cast("long").alias("n_tokens"),
        F.md5(F.concat(F.lit("mix"), F.col("doc_id").cast("string"))).alias("h"),
    )
    budget = F.when(F.col("lang") == "en", F.lit(8000)).otherwise(F.lit(3000))
    return (
        grouped_running_sum(
            sized,
            "lang",
            ["h", "doc_id"],
            "n_tokens",
            out_col="cum_tokens",
            # no cut_source needed: the cut sample projects only
            # (lang, h, doc_id) and Catalyst prunes the tokenize column
        )
        .filter(F.col("cum_tokens") <= budget)
        .select("doc_id", "lang", "n_tokens", "cum_tokens")
    )


# ---------------------------------------------------------------------------
# PII redaction — regex scrub of emails / phone numbers before training.
# The synthetic corpus contains no PII, so each doc gets a deterministic
# email + phone appended first; the redactor then has real work to do and
# the oracle checks both the match counts and the scrubbed text hash.
# ---------------------------------------------------------------------------

_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"


@_register(
    "pii_redact_documents",
    r"""
    WITH injected AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com call 415-555-0'
                    || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') AS raw
        FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}'))
             AS n_emails,
           len(regexp_extract_all(raw, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS n_phones,
           md5(regexp_replace(
                 regexp_replace(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}',
                                '<EMAIL>', 'g'),
                 '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS redacted_md5
    FROM injected
    """,
)
def pii_redact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data PII scrub: count then redact email/phone patterns
    per document, emitting the scrubbed text's md5 (fixed-width, engine-
    portable).  Pure JVM regexp — narrow transformation, no shuffle, no
    Python; at 100 TB this runs at scan speed with the patterns compiled
    once per task."""
    docs = load(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com call 415-555-0"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(raw, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(raw, F.lit(_EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(raw, F.lit(_PHONE_RE), 0)).alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )


# ---------------------------------------------------------------------------
# Repetition scoring — boilerplate/spam signal: share of the document
# taken by its single most frequent token.
# ---------------------------------------------------------------------------


@_register(
    "doc_repetition_scores",
    """
    WITH tok AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+') AS tokens
        FROM documents
    ),
    counts AS (
        SELECT doc_id, t AS token, COUNT(*) AS cnt
        FROM tok, unnest(tokens) AS u(t)
        GROUP BY doc_id, t
    ),
    ranked AS (
        SELECT doc_id, token, cnt,
               SUM(cnt) OVER (PARTITION BY doc_id) AS total,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY cnt DESC, token) AS rn
        FROM counts
    )
    SELECT doc_id, token AS top_token, cnt AS top_count,
           CAST(total AS BIGINT) AS total_tokens,
           CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) AS repetition_ratio
    FROM ranked WHERE rn = 1
    """,
)
def doc_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition ratio = count of the most frequent token
    / total tokens (tie-broken to the lexicographically first token so
    both engines pick the same winner).  Shape: explode -> two-level
    count -> one analytic window, all partitioned by doc_id — the
    explode never leaves its partition's doc_ids, so at 100 TB this is
    one shuffle on (doc_id, token) and one on doc_id."""
    docs = load(spark, sf_dir, "documents")
    counts = (
        docs.select("doc_id", F.explode(TX.tokens("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("doc_id")
    ranked = counts.withColumn("total", F.sum("cnt").over(w)).withColumn(
        "rn",
        F.row_number().over(w.orderBy(F.col("cnt").desc(), "token")),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "doc_id",
        F.col("token").alias("top_token"),
        F.col("cnt").alias("top_count"),
        F.col("total").alias("total_tokens"),
        (F.col("cnt").cast("double") / F.col("total").cast("double")).alias(
            "repetition_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination — flag training docs that share any 5-gram
# with a held-out benchmark set (the standard pre-training hygiene pass).
# ---------------------------------------------------------------------------


@_register(
    "decontaminate_documents",
    _SHINGLE_CTE
    + """
    , bench AS (
        SELECT DISTINCT shingle, doc_id AS bench_id FROM sh WHERE doc_id % 97 = 0
    ),
    train AS (
        SELECT doc_id, shingle FROM sh WHERE doc_id % 97 <> 0
    )
    SELECT t.doc_id,
           COUNT(DISTINCT t.shingle) AS n_overlap_shingles,
           COUNT(DISTINCT b.bench_id) AS n_benchmark_docs_hit
    FROM train t JOIN bench b ON t.shingle = b.shingle
    GROUP BY t.doc_id
    """,
)
def decontaminate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination scan: training documents (doc_id % 97 != 0) that
    share at least one 5-token shingle with the benchmark split
    (doc_id % 97 == 0), with overlap breadth per doc.

    Scale shape: both sides reduce to DISTINCT (doc, shingle) before the
    join, the benchmark side is orders of magnitude smaller and
    broadcastable, and the join key is the shingle string (hash it to a
    64-bit for 100 TB).  This is the exact-match decontamination pass a
    training pipeline runs against eval suites before every dump."""
    sh = shingles(load(spark, sf_dir, "documents"))
    bench = (
        sh.filter(F.col("doc_id") % 97 == 0)
        .select(F.col("shingle"), F.col("doc_id").alias("bench_id"))
        .distinct()
    )
    train = sh.filter(F.col("doc_id") % 97 != 0)
    return (
        train.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("shingle").alias("n_overlap_shingles"),
            F.countDistinct("bench_id").alias("n_benchmark_docs_hit"),
        )
    )


# ---------------------------------------------------------------------------
# Bigram language-model scoring — the classic LM-based quality filter:
# score each document by the average log-probability of its bigrams under
# a model trained on the corpus itself.
# ---------------------------------------------------------------------------


@_register(
    "bigram_lm_scores",
    _TOKENS_CTE
    + """
    , pos AS (
        SELECT doc_id, tokens,
               unnest(generate_series(1, len(tokens) - 1)) AS i
        FROM tok
        WHERE len(tokens) >= 2
    ),
    bigrams AS (
        SELECT doc_id, tokens[i] AS w1, tokens[i + 1] AS w2 FROM pos
    ),
    uni AS (
        SELECT w1, COUNT(*) AS c1 FROM bigrams GROUP BY w1
    ),
    big AS (
        SELECT w1, w2, COUNT(*) AS c12 FROM bigrams GROUP BY w1, w2
    )
    SELECT b.doc_id,
           COUNT(*) AS n_bigrams,
           round(AVG(ln(CAST(g.c12 AS DOUBLE) / u.c1)), 6) AS avg_logprob
    FROM bigrams b
    JOIN big g ON b.w1 = g.w1 AND b.w2 = g.w2
    JOIN uni u ON b.w1 = u.w1
    GROUP BY b.doc_id
    """,
)
def bigram_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-based quality scoring: train a bigram model on the corpus
    (P(w2|w1) = c(w1,w2) / c(w1)) and score every document by its mean
    bigram log-probability — low scores mark unnatural word salad, the
    filter perplexity-based pipelines apply before training.

    Scale shape: two grouped counts over the exploded bigram stream,
    joined back on the bigram key — the model IS a DataFrame, so
    "training" and "scoring" are the same shuffle framework with no
    driver-side state; swap the corpus counts for a persisted table to
    score new data against a frozen model.  ln() agrees bit-for-bit
    across engines; the per-doc mean is rounded to 6dp to absorb
    summation-order ulps (same convention as tfidf)."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", TX.tokens("text").alias("tk")).filter(
        F.size("tk") >= 2
    )
    bigrams = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.size("tk") - 2)).alias("i"),
        F.col("tk"),
    ).select(
        "doc_id",
        F.col("tk")[F.col("i")].alias("w1"),
        F.col("tk")[F.col("i") + 1].alias("w2"),
    )
    uni = bigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    big = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    scored = (
        bigrams.join(big, ["w1", "w2"])
        .join(uni, "w1")
        .withColumn("lp", F.log(F.col("c12").cast("double") / F.col("c1")))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("lp"), 6).alias("avg_logprob"),
    )


# ---------------------------------------------------------------------------
# Interpolated Kneser-Ney bigram scoring — the smoothing that separates
# a toy bigram model from the n-gram LMs quality filters actually ship
# (KenLM-style pipelines are interpolated-KN end to end).
# ---------------------------------------------------------------------------

_KN_D = 0.75  # absolute discount (Kneser & Ney's standard fixed value)


@_register(
    "kneser_ney_bigram_scores",
    _TOKENS_CTE
    + f"""
    , pos AS (
        SELECT doc_id, tokens,
               unnest(generate_series(1, len(tokens) - 1)) AS i
        FROM tok
        WHERE len(tokens) >= 2
    ),
    bigrams AS (
        SELECT doc_id, tokens[i] AS w1, tokens[i + 1] AS w2 FROM pos
    ),
    big AS (
        SELECT w1, w2, COUNT(*) AS c12 FROM bigrams GROUP BY w1, w2
    ),
    hist AS (
        SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
               CAST(COUNT(*) AS BIGINT) AS nf
        FROM big GROUP BY w1
    ),
    cont AS (
        SELECT w2, CAST(COUNT(*) AS BIGINT) AS nb FROM big GROUP BY w2
    ),
    btypes AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS bt FROM big
    )
    SELECT b.doc_id,
           COUNT(*) AS n_bigrams,
           round(AVG(ln(
               (CAST(g.c12 AS DOUBLE) - {_KN_D}) / h.c1
               + ({_KN_D} * CAST(h.nf AS DOUBLE) / h.c1)
                 * (CAST(c.nb AS DOUBLE) / t.bt)
           )), 6) AS avg_logprob_kn
    FROM bigrams b
    JOIN big g ON b.w1 = g.w1 AND b.w2 = g.w2
    JOIN hist h ON b.w1 = h.w1
    JOIN cont c ON b.w2 = c.w2
    CROSS JOIN btypes t
    GROUP BY b.doc_id
    """,
)
def kneser_ney_bigram_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; Chen &
    Goodman 1999, public): P(w2|w1) = (c(w1,w2) - D)/c(w1) +
    (D * N1+(w1,.)/c(w1)) * N1+(.,w2)/|bigram types|, D={d} — the
    continuation-probability backoff that fixes the "San Francisco"
    pathology (frequent-but-unversatile words get low continuation
    mass), scored as each document's mean bigram log-probability.  The
    smoothing the production perplexity filters (KenLM-style) actually
    use, vs :func:`bigram_lm_scores`' unsmoothed MLE.

    Cross-engine exactness: every model quantity (c12, c1, N1+ forward
    and backward, bigram-type count) is an exact integer; the smoothed
    probability is built double-op-for-double-op in the same order on
    both engines, and every corpus bigram has c12 >= 1 > D so the
    discounted term is strictly positive — no max(.,0) branch to
    diverge on.  The per-doc mean is rounded to 6dp (the tfidf
    convention).  Scale shape: the model is three grouped contractions
    of the bigram-TYPE relation (types, histories, continuations) plus
    ONE 1-row type-count broadcast; scoring joins the bigram stream
    back on its keys — no driver-side state, same shuffle framework as
    the MLE scorer."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", TX.tokens("text").alias("tk")).filter(
        F.size("tk") >= 2
    )
    bigrams = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.size("tk") - 2)).alias("i"),
        F.col("tk"),
    ).select(
        "doc_id",
        F.col("tk")[F.col("i")].alias("w1"),
        F.col("tk")[F.col("i") + 1].alias("w2"),
    )
    big = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    hist = big.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("nf"),
    )
    cont = big.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("nb"))
    btypes = big.agg(F.count(F.lit(1)).cast("long").alias("bt"))
    scored = (
        bigrams.join(big, ["w1", "w2"])
        .join(hist, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(btypes))
        .withColumn(
            "lp",
            F.log(
                (F.col("c12").cast("double") - F.lit(_KN_D)) / F.col("c1")
                + (F.lit(_KN_D) * F.col("nf").cast("double") / F.col("c1"))
                * (F.col("nb").cast("double") / F.col("bt"))
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("lp"), 6).alias("avg_logprob_kn"),
    )


kneser_ney_bigram_scores.__doc__ = kneser_ney_bigram_scores.__doc__.format(
    d=_KN_D
)


# ---------------------------------------------------------------------------
# Shannon entropy profiling — label-balance diagnostics per source.
# ---------------------------------------------------------------------------


@_register(
    "lang_entropy_by_source",
    """
    WITH counts AS (
        SELECT source, lang, COUNT(*) AS n
        FROM documents GROUP BY source, lang
    ),
    tot AS (
        SELECT source, SUM(n) AS total FROM counts GROUP BY source
    )
    SELECT c.source,
           CAST(any_value(t.total) AS BIGINT) AS n_docs,
           COUNT(*) AS n_langs,
           round(-SUM((CAST(c.n AS DOUBLE) / t.total)
                      * ln(CAST(c.n AS DOUBLE) / t.total)), 6) AS lang_entropy
    FROM counts c JOIN tot t USING (source)
    GROUP BY c.source
    """,
)
def lang_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the language mix per document source — the
    balance diagnostic for dataset curation (entropy 0 = monolingual
    source; ln(k) = uniform over k languages).  Integer counts make the
    probabilities exact; two tiny grouped aggregates and a broadcast
    join, never a second scan of the documents."""
    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.groupBy("source").agg(F.sum("n").alias("total"))
    p = F.col("n").cast("double") / F.col("total")
    return (
        counts.join(F.broadcast(tot), "source")
        .groupBy("source")
        .agg(
            F.first("total").cast("long").alias("n_docs"),
            F.count(F.lit(1)).alias("n_langs"),
            F.round(-F.sum(p * F.log(p)), 6).alias("lang_entropy"),
        )
    )


# ---------------------------------------------------------------------------
# Collocation mining — top bigrams by pointwise mutual information.
# ---------------------------------------------------------------------------


@_register(
    "top_collocations_pmi",
    _TOKENS_CTE
    + """
    , pos AS (
        SELECT doc_id, tokens, unnest(generate_series(1, len(tokens) - 1)) AS i
        FROM tok WHERE len(tokens) >= 2
    ),
    bg AS (SELECT tokens[i] AS w1, tokens[i + 1] AS w2 FROM pos),
    big AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
    uni1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1),
    uni2 AS (SELECT w2, COUNT(*) AS c2 FROM bg GROUP BY w2),
    tot AS (SELECT COUNT(*) AS n FROM bg)
    SELECT w1, w2, CAST(c12 AS BIGINT) AS c12,
           round(ln(CAST(c12 AS DOUBLE) * n / (CAST(c1 AS DOUBLE) * c2)), 6) AS pmi
    FROM big JOIN uni1 USING (w1) JOIN uni2 USING (w2), tot
    WHERE c12 >= 5
    ORDER BY pmi DESC, w1, w2
    LIMIT 20
    """,
)
def top_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: the 20 bigrams (count >= 5) with the highest
    pointwise mutual information ln(P(w1,w2) / (P(w1)P(w2))) — the
    classic phrase detector ("new york") run before tokenizer/vocab
    builds.  Three grouped counts off one exploded bigram stream; the
    grand total is a 1-row broadcast; deterministic ln + round(6) with a
    full tiebreak on the limit."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(TX.tokens("text").alias("tk")).filter(F.size("tk") >= 2)
    bg = toks.select(
        F.explode(F.sequence(F.lit(0), F.size("tk") - 2)).alias("i"), "tk"
    ).select(
        F.col("tk")[F.col("i")].alias("w1"), F.col("tk")[F.col("i") + 1].alias("w2")
    )
    big = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    uni1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    uni2 = bg.groupBy("w2").agg(F.count(F.lit(1)).alias("c2"))
    tot = bg.agg(F.count(F.lit(1)).alias("n"))
    pmi = F.round(
        F.log(
            F.col("c12").cast("double")
            * F.col("n")
            / (F.col("c1").cast("double") * F.col("c2"))
        ),
        6,
    )
    return (
        big.filter(F.col("c12") >= 5)
        .join(uni1, "w1")
        .join(uni2, "w2")
        .join(F.broadcast(tot))
        .select("w1", "w2", F.col("c12").cast("long").alias("c12"), pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Privacy: stable pseudonymization — join-preserving key replacement.
# ---------------------------------------------------------------------------


@_register(
    "pseudonymize_customer_orders",
    """
    WITH pseud AS (
        SELECT o_custkey,
               'u_' || substr(md5('salt-2026:' || CAST(o_custkey AS VARCHAR)), 1, 12)
                 AS pseudonym,
               CAST(o_totalprice AS DECIMAL(18,2)) AS price
        FROM orders
    )
    SELECT pseudonym,
           COUNT(*) AS n_orders,
           CAST(SUM(price) AS DOUBLE) AS total_spend
    FROM pseud
    GROUP BY pseudonym
    """,
)
def pseudonymize_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudonymization for training exports: the customer key is
    replaced by a salted-hash pseudonym that is STABLE (same key ->
    same pseudonym, so joins and groupBys still work) but not
    reversible without the salt.  Aggregating by pseudonym proves
    join-preservation: the rollup matches the raw-key rollup
    cardinality exactly."""
    o = load(spark, sf_dir, "orders")
    pseudonym = F.concat(
        F.lit("u_"),
        F.substring(
            F.md5(F.concat(F.lit("salt-2026:"), F.col("o_custkey").cast("string"))),
            1,
            12,
        ),
    )
    return (
        o.select(pseudonym.alias("pseudonym"), _dec_price())
        .groupBy("pseudonym")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("price").cast("double").alias("total_spend"),
        )
    )


def _dec_price():
    return F.col("o_totalprice").cast("decimal(18,2)").alias("price")


# ---------------------------------------------------------------------------
# Privacy: k-anonymity audit over quasi-identifiers.
# ---------------------------------------------------------------------------


@_register(
    "k_anonymity_audit",
    """
    WITH eq_classes AS (
        SELECT c_nationkey, c_mktsegment, COUNT(*) AS class_size
        FROM customer
        GROUP BY c_nationkey, c_mktsegment
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(MIN(class_size) AS BIGINT) AS k_anonymity,
           CAST(SUM(CASE WHEN class_size < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS classes_below_5,
           CAST(SUM(CASE WHEN class_size < 5 THEN class_size ELSE 0 END) AS BIGINT)
             AS rows_at_risk
    FROM eq_classes
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity of the (nation, market-segment) quasi-identifier
    pair: the dataset's k is the SMALLEST equivalence class, and the
    audit counts classes (and rows) under the k=5 release threshold —
    the check a governance gate runs before sharing any training
    extract.  One grouped count plus a 1-row summary."""
    c = load(spark, sf_dir, "customer")
    classes = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("class_size")
    )
    return classes.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("class_size").cast("long").alias("k_anonymity"),
        F.sum(F.when(F.col("class_size") < 5, 1).otherwise(0))
        .cast("long")
        .alias("classes_below_5"),
        F.sum(F.when(F.col("class_size") < 5, F.col("class_size")).otherwise(0))
        .cast("long")
        .alias("rows_at_risk"),
    )


# ---------------------------------------------------------------------------
# Sequence packing — assign documents to fixed-token context windows
# (the "pack the corpus into 512-token training sequences" step).
# ---------------------------------------------------------------------------

_PACK_BUDGET = 512


@_register(
    "sequence_packing_bins",
    _TOKENS_CTE
    + f"""
    , sized AS (
        SELECT doc_id, CAST(len(tokens) AS BIGINT) AS n_tokens,
               md5('pack' || CAST(doc_id AS VARCHAR)) AS h
        FROM tok
    ),
    cum AS (
        SELECT doc_id, n_tokens,
               sum(n_tokens) OVER (
                   ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS cum_tokens
        FROM sized
    )
    SELECT CAST((cum_tokens - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
           CAST(MIN(cum_tokens - n_tokens) AS BIGINT) AS bin_start_offset,
           CAST(MAX(cum_tokens) > ((cum_tokens - n_tokens) // {_PACK_BUDGET} + 1)
                                   * {_PACK_BUDGET} AS INT) AS straddles_next
    FROM cum
    GROUP BY (cum_tokens - n_tokens) // {_PACK_BUDGET}
    """,
)
def sequence_packing_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy contiguous sequence packing: shuffle the corpus into a
    deterministic salted-hash order, run a GLOBAL token running sum, and
    assign each document to the context window its starting offset
    falls in (``start div budget``) — documents may straddle a window
    boundary, exactly as LLM pretraining packers concatenate-then-split.
    Emits per-bin occupancy (docs, tokens, start offset, straddle flag).

    Scale shape: the global cumulative sum is the classic sequential
    trap, and here it runs through :func:`grouped_running_sum` with a
    constant group key — range-partition on the hash order, per-range
    local sums, broadcast per-range offsets — so no single task ever
    sees more than one range of the corpus (the same decomposition the
    token-budget mixture and KS statistic use).  The bin assignment and
    rollup after it are ordinary hash aggregation.  Determinism: the
    pack order is md5(doc_id), so the same corpus packs identically on
    any engine, partitioning, or cluster size."""
    d = load(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id",
        TX.token_count("text").cast("long").alias("n_tokens"),
        F.md5(F.concat(F.lit("pack"), F.col("doc_id").cast("string"))).alias("h"),
    )
    cum = grouped_running_sum(
        sized.withColumn("__one", F.lit(1)),
        "__one",
        ["h", "doc_id"],
        "n_tokens",
        out_col="cum_tokens",
    )
    binned = cum.select(
        "doc_id",
        "n_tokens",
        "cum_tokens",
        F.expr(f"(cum_tokens - n_tokens) div {_PACK_BUDGET}").alias("bin_id"),
    )
    return binned.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.min(F.col("cum_tokens") - F.col("n_tokens")).alias("bin_start_offset"),
        (
            F.max("cum_tokens") > (F.col("bin_id") + 1) * F.lit(_PACK_BUDGET)
        )
        .cast("int")
        .alias("straddles_next"),
    )


# ---------------------------------------------------------------------------
# 60-bit SimHash near-dup pair generation — banded candidate join, never
# all-pairs.  The 16-bit `simhash_signatures` demo is too coarse to band
# (16 buckets/band degenerates toward all-pairs); this variant uses the
# full 60 md5-derived bits so each of the 4 bands has 2^15 buckets, and
# pigeonhole guarantees any pair with hamming <= 3 collides in at least
# one band.
# ---------------------------------------------------------------------------

_SH64_BITS = 60
_SH64_BANDS = 4  # 4 bands x 15 bits; finds every pair with hamming <= 3
_SH64_HAMMING_MAX = 3

_SH64_VOTES_SQL = ",\n               ".join(
    f"SUM(CASE WHEN (h & {1 << b}) > 0 THEN 1 ELSE -1 END) AS b{b}"
    for b in range(_SH64_BITS)
)
_SH64_ASSEMBLE_SQL = " + ".join(
    f"(CASE WHEN COALESCE(b{b}, 0) > 0 THEN {1 << b} ELSE 0 END)"
    for b in range(_SH64_BITS)
)


@_register(
    "simhash64_near_dup_pairs",
    f"""
    WITH sigs AS (
        WITH tok AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+') AS tokens
            FROM documents
        ),
        ex AS (
            SELECT doc_id,
                   CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) AS h
            FROM tok, unnest(tokens) AS u(t)
        ),
        sig AS (
            SELECT doc_id,
               {_SH64_VOTES_SQL}
            FROM ex GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST({_SH64_ASSEMBLE_SQL} AS BIGINT) AS simhash
        FROM documents d LEFT JOIN sig USING (doc_id)
    ),
    bands AS (
        SELECT doc_id, simhash, band_idx,
               (simhash >> (band_idx * 15)) & 32767 AS band_val
        FROM sigs, (VALUES (0), (1), (2), (3)) b(band_idx)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
               a.simhash AS sa, c.simhash AS sb
        FROM bands a JOIN bands c
          ON a.band_idx = c.band_idx AND a.band_val = c.band_val
         AND a.doc_id < c.doc_id
    )
    SELECT id_a, id_b,
           CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
    FROM cand
    WHERE bit_count(xor(sa, sb)) <= {_SH64_HAMMING_MAX}
    """,
)
def simhash64_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate candidate pairs at corpus scale: 60-bit
    signatures (one md5 per token, +1/-1 bit votes in a single hash
    aggregate), banded into 4 x 15-bit keys, candidates generated by an
    equi-join on (band_idx, band_val) — signatures shuffle, never
    documents, and never all-pairs — then exact Hamming distance
    (xor + bit_count, one codegen'd expression) keeps pairs within 3
    bits.  Pigeonhole: hamming <= 3 over 4 bands forces at least one
    identical band, so the banding loses nothing the threshold keeps.
    The 100 TB shape is identical to the MinHash LSH path
    (operators/minhash.py); only the signature arithmetic differs."""
    d = load(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5("t"), 1, 15), 16, 10).cast("long")
    ex = d.select("doc_id", F.explode(TX.tokens("text")).alias("t")).select(
        "doc_id", h.alias("h")
    )
    # two-level: collapse repeated token hashes per doc FIRST (cheap
    # count aggregate), then run the 60 conditional sums weighted by the
    # count — identical votes, but the wide aggregate sees one row per
    # DISTINCT token instead of one per occurrence (measured 1.2s ->
    # 0.85s at sf0.1 on the vote stage; repetitive corpora gain more)
    cnts = ex.groupBy("doc_id", "h").agg(F.count(F.lit(1)).alias("c"))
    aggs = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(1 << b)) > 0, F.col("c")).otherwise(
                -F.col("c")
            )
        ).alias(f"b{b}")
        for b in range(_SH64_BITS)
    ]
    votes = cnts.groupBy("doc_id").agg(*aggs)
    sim = F.lit(0).cast("long")
    for b in range(_SH64_BITS):
        sim = sim + F.when(
            F.coalesce(F.col(f"b{b}"), F.lit(0)) > 0, F.lit(1 << b)
        ).otherwise(F.lit(0))
    sigs = (
        d.select("doc_id")
        .join(votes, "doc_id", "left")
        .select("doc_id", sim.alias("simhash"))
    )
    band_idx = F.explode(F.array(*[F.lit(i) for i in range(_SH64_BANDS)])).alias(
        "band_idx"
    )
    bands = sigs.select("doc_id", "simhash", band_idx).select(
        "doc_id",
        "simhash",
        "band_idx",
        F.expr("shiftright(simhash, band_idx * 15) & 32767").alias("band_val"),
    )
    right = bands.select(
        F.col("doc_id").alias("id_b"),
        F.col("simhash").alias("sb"),
        F.col("band_idx").alias("bi"),
        F.col("band_val").alias("bv"),
    )
    cand = (
        bands.join(
            right,
            (F.col("band_idx") == F.col("bi"))
            & (F.col("band_val") == F.col("bv"))
            & (F.col("doc_id") < F.col("id_b")),
        )
        .select(
            F.col("doc_id").alias("id_a"), "id_b", F.col("simhash").alias("sa"), "sb"
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return cand.select(
        "id_a", "id_b", hamming.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= _SH64_HAMMING_MAX)


# ---------------------------------------------------------------------------
# Corpus datasheet — the per-language / per-source rollup a dataset card
# reports, in one Expand + one shuffle.
# ---------------------------------------------------------------------------


@_register(
    "corpus_statistics_report",
    _TOKENS_CTE
    + """
    , sized AS (
        SELECT d.doc_id, d.lang, d.source, d.n_chars,
               CAST(len(tokens) AS BIGINT) AS n_tokens
        FROM documents d JOIN tok ON d.doc_id = tok.doc_id
    )
    SELECT lang, source,
           CAST(grouping_id(lang, source) AS BIGINT) AS gid,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
           ROUND(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*), 6) AS avg_tokens
    FROM sized
    GROUP BY GROUPING SETS ((lang), (source), ())
    """,
)
def corpus_statistics_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset-card rollup: document counts, token/char totals, max
    and mean document length, broken out per language, per source, and
    corpus-wide — one GROUPING SETS pass (a single Expand + one
    shuffle), not three scans.  Averages compute from exact integer
    sums divided at the edge, so the report is bit-stable at any
    partitioning.  At 100 TB this is the nightly corpus telemetry
    query: expression-only per-row work fused into the scan, and the
    aggregate output is bounded by |langs| + |sources| + 1 rows."""
    d = load(spark, sf_dir, "documents")
    d.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        TX.token_count("text").cast("long").alias("n_tokens"),
    ).createOrReplaceTempView("corpus_sized")
    return spark.sql(
        """
        SELECT lang, source,
               CAST(grouping_id(lang, source) AS BIGINT) AS gid,
               COUNT(*) AS n_docs,
               SUM(n_tokens) AS total_tokens,
               SUM(n_chars) AS total_chars,
               MAX(n_tokens) AS max_tokens,
               ROUND(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*), 6) AS avg_tokens
        FROM corpus_sized
        GROUP BY GROUPING SETS ((lang), (source), ())
        """
    )


# ---------------------------------------------------------------------------
# Near-dup threshold sweep — the similarity histogram an operator reads
# before choosing the dedup cutoff.
# ---------------------------------------------------------------------------


@_register(
    "near_dup_threshold_histogram",
    _MINHASH_CTE
    + """
    , sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
        SELECT c.id_a, c.id_b, count(*) AS n_common
        FROM cand c
        JOIN sh a ON a.doc_id = c.id_a
        JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
        GROUP BY c.id_a, c.id_b
    ),
    jac AS (
        SELECT CAST(cm.n_common AS DOUBLE)
                 / (na.n_sh + nb.n_sh - cm.n_common) AS jaccard
        FROM common cm
        JOIN sizes na ON na.doc_id = cm.id_a
        JOIN sizes nb ON nb.doc_id = cm.id_b
    )
    SELECT CAST(least(floor(jaccard * 10), 9) AS BIGINT) AS bucket,
           COUNT(*) AS n_pairs,
           ROUND(MIN(jaccard), 6) AS min_jaccard,
           ROUND(MAX(jaccard), 6) AS max_jaccard
    FROM jac
    GROUP BY 1
    """,
)
def near_dup_threshold_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile histogram of exact Jaccard over the LSH candidate pairs —
    the threshold-sweep report you read BEFORE committing to a dedup
    cutoff (a bimodal histogram says 0.5 is safe; a smear says tighten
    the bands).  Reuses the whole MinHash->LSH->verify chain unchanged;
    the added cost over the near-dup query is one decile aggregation of
    the already-scored pairs, so at 100 TB the sweep is free relative
    to the dedup itself.  Identical integer arithmetic feeds both
    engines' doubles, so bucket edges cannot disagree."""
    d = load(spark, sf_dir, "documents")
    sh = shingles(d)
    scored = jaccard(candidate_pairs(lsh_bands(minhash_signatures(sh))), sh)
    bucket = F.least(F.floor(F.col("jaccard") * 10), F.lit(9)).cast("long")
    return scored.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.min("jaccard"), 6).alias("min_jaccard"),
        F.round(F.max("jaccard"), 6).alias("max_jaccard"),
    )


# ---------------------------------------------------------------------------
# Incremental near-dup — dedup a NEW ingestion batch against the existing
# corpus without re-pairing the corpus with itself.
# ---------------------------------------------------------------------------


_INCR_NEAR_DUP_ORACLE = (
    _MINHASH_CTE.replace(
        """cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
)""",
        """cand AS (
    SELECT DISTINCT b.doc_id AS id_a, a.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
    WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
)""",
    )
    + """
    , sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
        SELECT c.id_a, c.id_b, count(*) AS n_common
        FROM cand c
        JOIN sh a ON a.doc_id = c.id_a
        JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
        GROUP BY c.id_a, c.id_b
    ),
    jac AS (
        SELECT cm.id_b AS new_doc,
               CAST(cm.n_common AS DOUBLE)
                 / (na.n_sh + nb.n_sh - cm.n_common) AS jaccard
        FROM common cm
        JOIN sizes na ON na.doc_id = cm.id_a
        JOIN sizes nb ON nb.doc_id = cm.id_b
    )
    SELECT new_doc, COUNT(*) AS n_corpus_matches,
           ROUND(MAX(jaccard), 6) AS max_jaccard
    FROM jac
    WHERE jaccard >= 0.5
    GROUP BY new_doc
    """
)


@_register("incremental_near_dup_new_batch", _INCR_NEAR_DUP_ORACLE)
def incremental_near_dup_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time near-dup: treat doc_id % 10 == 0 as the incoming
    batch and the rest as the standing corpus, and find each new
    document's near-duplicates IN THE CORPUS — the candidate join is
    batch-bands against corpus-bands, so the corpus is never re-paired
    with itself.  This is the production incremental flow at 100 TB:
    the corpus band index is a materialized table keyed by
    (band_idx, band_hash); each ingestion batch computes only its own
    signatures and probes the index with an equi-join whose cost scales
    with the BATCH, not the corpus.  Per new doc, emits how many corpus
    near-dups it has (jaccard >= 0.5) and the closest score — the
    keep/drop signal."""
    d = load(spark, sf_dir, "documents")
    sh = shingles(d)
    bands = lsh_bands(minhash_signatures(sh))
    corpus_b = bands.filter(F.col("doc_id") % 10 != 0).select(
        F.col("doc_id").alias("id_a"), "band_idx", "band_hash"
    )
    batch_b = bands.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("id_b"), "band_idx", "band_hash"
    )
    # probe_candidates carries the same hot-bucket cap as the full
    # self-join path (None here = exact, the oracle-paired contract;
    # production ingestion passes max_bucket_size to stay consistent
    # with a capped full-dedup run)
    cands = probe_candidates(batch_b, corpus_b, max_bucket_size=None)
    scored = jaccard(cands, sh)
    return (
        scored.filter(F.col("jaccard") >= 0.5)
        .groupBy(F.col("id_b").alias("new_doc"))
        .agg(
            F.count(F.lit(1)).alias("n_corpus_matches"),
            F.round(F.max("jaccard"), 6).alias("max_jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Language-ID confusion matrix — detected language vs metadata label.
# ---------------------------------------------------------------------------


@_register(
    "lang_id_confusion_matrix",
    _TOKENS_CTE
    + """
    , hits AS (
        SELECT doc_id,
           length(list_filter(tokens, t -> list_contains(['der','die','und','ist'], t))) AS h_de,
           length(list_filter(tokens, t -> list_contains(['the','a','and','is'], t))) AS h_en,
           length(list_filter(tokens, t -> list_contains(['el','los','y','es'], t))) AS h_es,
           length(list_filter(tokens, t -> list_contains(['le','la','et','est'], t))) AS h_fr
        FROM tok
    ),
    pred AS (
        SELECT doc_id,
               CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
                    WHEN h_de = greatest(h_de, h_en, h_es, h_fr) THEN 'de'
                    WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
                    WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
                    ELSE 'fr' END AS lang_pred
        FROM hits
    )
    SELECT d.lang AS lang_label, p.lang_pred, COUNT(*) AS n_docs
    FROM documents d JOIN pred p ON d.doc_id = p.doc_id
    GROUP BY 1, 2
    """,
)
def lang_id_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix between the corpus's METADATA language labels
    and the engine's detected language — the disagreement report a
    curation pipeline reads before trusting either signal (a heavy
    off-diagonal row means mislabeled ingest or a weak detector; 'und'
    volume measures detector coverage).  One narrow lang-id projection
    fused into the scan plus one small aggregate; at 100 TB the output
    is |langs|^2 rows regardless of corpus size."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.col("lang").alias("lang_label"), TX.lang_id("text").alias("lang_pred"))
        .groupBy("lang_label", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Dedup impact report — near-dup cluster size distribution.
# ---------------------------------------------------------------------------


@_register(
    "near_dup_cluster_sizes",
    _MINHASH_CTE.replace("WITH tok", "WITH RECURSIVE tok", 1)
    + _VERIFIED_PAIRS_TAIL
    + """
    , und AS (SELECT id_a AS a, id_b AS b FROM verified
              UNION SELECT id_b, id_a FROM verified),
    walk AS (
        SELECT a, b FROM und
        UNION
        SELECT w.a, e.b FROM walk w JOIN und e ON w.b = e.a
    ),
    comp AS (
        SELECT a AS doc_id, LEAST(a, MIN(b)) AS component
        FROM walk GROUP BY a
    ),
    csizes AS (
        SELECT component, COUNT(*) AS cluster_size FROM comp GROUP BY component
    )
    SELECT cluster_size,
           COUNT(*) AS n_clusters,
           CAST(SUM(cluster_size - 1) AS BIGINT) AS docs_removable
    FROM csizes
    GROUP BY cluster_size
    """,
)
def near_dup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup IMPACT report: distribution of near-dup cluster sizes
    plus, per size, how many documents keep-one-per-cluster dedup would
    remove — the number an operator quotes when asked 'what does dedup
    buy us?'.  Two small re-aggregations of the connected-components
    output (cluster sizes are bounded by duplication, not corpus size);
    everything upstream reuses the verified-pair + min-label machinery
    unchanged."""
    from ..operators.graph import connected_components

    d = load(spark, sf_dir, "documents")
    sh = shingles(d)
    verified = (
        jaccard(candidate_pairs(lsh_bands(minhash_signatures(sh))), sh)
        .filter(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b")
    )
    comp = connected_components(verified)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum(F.col("cluster_size") - 1).alias("docs_removable"),
    )


# ---------------------------------------------------------------------------
# Grouped sequence packing — one context-window stream PER SOURCE.
# ---------------------------------------------------------------------------


@_register(
    "sequence_packing_by_source",
    _TOKENS_CTE
    + f"""
    , sized AS (
        SELECT t.doc_id, d.source,
               CAST(len(tokens) AS BIGINT) AS n_tokens,
               md5('packs' || CAST(t.doc_id AS VARCHAR)) AS h
        FROM tok t JOIN documents d ON t.doc_id = d.doc_id
    ),
    cum AS (
        SELECT doc_id, source, n_tokens,
               sum(n_tokens) OVER (
                   PARTITION BY source
                   ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS cum_tokens
        FROM sized
    )
    SELECT source,
           CAST((cum_tokens - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
    FROM cum
    GROUP BY 1, 2
    """,
)
def sequence_packing_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped sequence packing: each SOURCE gets its own deterministic
    context-window stream (multi-corpus training runs pack per-dataset
    so one corpus's windows never interleave with another's), via
    :func:`grouped_running_sum` with ``source`` as the group key — the
    same two-pass range-partition cumsum as the global packer, so a
    giant source spans many bounded partitions instead of one
    sequential task.  Emits per-(source, window) occupancy."""
    d = load(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id",
        "source",
        TX.token_count("text").cast("long").alias("n_tokens"),
        F.md5(F.concat(F.lit("packs"), F.col("doc_id").cast("string"))).alias("h"),
    )
    cum = grouped_running_sum(
        sized, "source", ["h", "doc_id"], "n_tokens", out_col="cum_tokens"
    )
    return (
        cum.select(
            "source",
            "n_tokens",
            F.expr(f"(cum_tokens - n_tokens) div {_PACK_BUDGET}").alias("bin_id"),
        )
        .groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Exact-dup rate per source — the datasheet's duplication column.
# ---------------------------------------------------------------------------


@_register(
    "dedup_rate_by_source",
    """
    WITH fp AS (
        SELECT source,
               md5(regexp_replace(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS f
        FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT f) AS n_unique,
           ROUND(1.0 - CAST(COUNT(DISTINCT f) AS DOUBLE) / COUNT(*), 6)
             AS dup_rate
    FROM fp
    GROUP BY source
    """,
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplication rate over the same normalized-text
    fingerprint the dedup operator keys on — the 'how dirty is this
    feed' number that decides which sources get the expensive near-dup
    pass.  One scan, one aggregate; the distinct-count re-shuffles
    16-byte fingerprints, never text.  At 100 TB swap the exact
    COUNT(DISTINCT) for the per-source HLL sketch when an estimate is
    acceptable — the rest of the plan is unchanged."""
    d = load(spark, sf_dir, "documents")
    fp = d.select(
        "source",
        F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")).alias("f"),
    )
    return fp.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("f").alias("n_unique"),
        F.round(
            F.lit(1.0) - F.countDistinct("f").cast("double") / F.count(F.lit(1)), 6
        ).alias("dup_rate"),
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility — chars/token and BPE-vs-whitespace ratios per lang.
# ---------------------------------------------------------------------------


@_register(
    "tokenizer_fertility_by_lang",
    _TOKENS_CTE
    + """
    , sized AS (
        SELECT d.lang,
               CAST(len(tokens) AS BIGINT) AS n_ws,
               CAST(len(regexp_extract_all(d.text, '[a-zA-Z]+|[0-9]+'))
                    AS BIGINT) AS n_bpe,
               CAST(length(d.text) AS BIGINT) AS n_chars
        FROM documents d JOIN tok t ON d.doc_id = t.doc_id
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_ws) AS BIGINT) AS ws_tokens,
           CAST(SUM(n_bpe) AS BIGINT) AS bpe_tokens,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / SUM(n_ws), 6)
             AS chars_per_ws_token,
           ROUND(CAST(SUM(n_bpe) AS DOUBLE) / SUM(n_ws), 6) AS fertility
    FROM sized
    GROUP BY lang
    """,
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer diagnostics per language: characters per whitespace
    token and BPE-ish fertility (subword pieces per word) — the numbers
    that decide whether a vocabulary under-serves a language (high
    fertility means more compute per document for the same text).
    Integer token/char counts aggregate exactly; the two ratios divide
    once at the edge.  All tokenization is JVM regexp fused into the
    scan — the report costs one aggregate over corpus-wide counts."""
    d = load(spark, sf_dir, "documents")
    sized = d.select(
        "lang",
        TX.token_count("text").cast("long").alias("n_ws"),
        F.size(TX.bpe_ish_tokens("text")).cast("long").alias("n_bpe"),
        F.length("text").cast("long").alias("n_chars"),
    )
    return sized.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_ws").alias("ws_tokens"),
        F.sum("n_bpe").alias("bpe_tokens"),
        F.round(
            F.sum("n_chars").cast("double") / F.sum("n_ws"), 6
        ).alias("chars_per_ws_token"),
        F.round(F.sum("n_bpe").cast("double") / F.sum("n_ws"), 6).alias(
            "fertility"
        ),
    )


# ---------------------------------------------------------------------------
# Temperature resampling — rebalance language shares like multilingual
# pretraining mixes do (share^(1/T), T>1 upweights tail languages).
# ---------------------------------------------------------------------------

_MIX_T = 2.0


@_register(
    "temperature_resample_mixture",
    f"""
    WITH counts AS (
        SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY lang
    ),
    tot AS (SELECT SUM(n_l) AS n FROM counts),
    ratios AS (
        SELECT lang, n_l,
               pow(CAST(n_l AS DOUBLE) / n, 1.0 / {_MIX_T})
                 / (CAST(n_l AS DOUBLE) / n) AS ratio
        FROM counts CROSS JOIN tot
    ),
    keep AS (
        SELECT lang, n_l,
               ROUND(ratio / (SELECT MAX(ratio) FROM ratios), 6) AS p_keep
        FROM ratios
    )
    SELECT d.lang, ANY_VALUE(k.n_l) AS n_docs, ANY_VALUE(k.p_keep) AS p_keep,
           CAST(COUNT(*) FILTER (
               WHERE CAST(('0x' || substr(md5('temp' || CAST(d.doc_id AS VARCHAR)),
                           1, 13)) AS BIGINT) / 4503599627370496.0
                     < k.p_keep) AS BIGINT) AS n_selected
    FROM documents d JOIN keep k ON d.lang = k.lang
    GROUP BY d.lang
    """,
)
def temperature_resample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture rebalancing: per-language keep
    probabilities proportional to share^(1/T) / share (T=2 here), the
    standard multilingual-pretraining trick that upweights tail
    languages without a hard budget.  Probabilities normalize against
    the maximum ratio (so the rarest language keeps everything) and are
    ROUNDED to 6 digits BEFORE the acceptance comparison — pow() may
    differ in the last ulp across math libraries, and the rounding makes
    the selection threshold, and therefore every accept/reject decision,
    bit-identical on any engine.  Acceptance itself is the engine-wide
    md5-uniform pattern: a pure row function, no rand(), reproducible
    under any partitioning.  Two dimension-sized aggregates + one
    broadcast join; the corpus is scanned once."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    tot = counts.agg(F.sum("n_l").alias("n"))
    share = F.col("n_l").cast("double") / F.col("n")
    ratios = counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_l",
        (F.pow(share, F.lit(1.0 / _MIX_T)) / share).alias("ratio"),
    )
    mx = ratios.agg(F.max("ratio").alias("mx"))
    keep = ratios.crossJoin(F.broadcast(mx)).select(
        "lang", "n_l", F.round(F.col("ratio") / F.col("mx"), 6).alias("p_keep")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("temp"), F.col("doc_id").cast("string"))), 1, 13
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4503599627370496.0)
    )
    return (
        d.join(F.broadcast(keep), "lang")
        .groupBy("lang")
        .agg(
            F.first("n_l").alias("n_docs"),
            F.first("p_keep").alias("p_keep"),
            F.sum((u < F.col("p_keep")).cast("int")).cast("long").alias("n_selected"),
        )
    )


# ---------------------------------------------------------------------------
# Vocabulary affinity per source — does each sub-corpus speak the same
# language as the whole mix?  Pure integer ranks, no float distance.
# ---------------------------------------------------------------------------

_VOCAB_TOPK = 25


@_register(
    "vocab_topk_overlap_by_source",
    _TOKENS_CTE
    + f"""
    , tw AS (SELECT doc_id, unnest(tokens) AS token FROM tok),
    words AS (
        SELECT d.source, tw.token
        FROM tw JOIN documents d ON d.doc_id = tw.doc_id
        WHERE tw.token <> ''
    ),
    src_top AS (
        SELECT source, token
        FROM (SELECT source, token, COUNT(*) AS c FROM words GROUP BY 1, 2)
        QUALIFY ROW_NUMBER() OVER (PARTITION BY source
                                   ORDER BY c DESC, token) <= {_VOCAB_TOPK}
    ),
    glob_top AS (
        SELECT token FROM (SELECT token, COUNT(*) AS c FROM words GROUP BY 1)
        ORDER BY c DESC, token LIMIT {_VOCAB_TOPK}
    )
    SELECT s.source,
           CAST(COUNT(g.token) AS BIGINT) AS n_shared,
           ROUND(CAST(COUNT(g.token) AS DOUBLE)
                 / ({2 * _VOCAB_TOPK} - COUNT(g.token)), 6) AS overlap_jaccard
    FROM src_top s LEFT JOIN glob_top g ON g.token = s.token
    GROUP BY s.source
    """,
)
def vocab_topk_overlap_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary affinity: Jaccard overlap between each
    source's top-25 tokens (by count, token-tiebroken) and the whole
    corpus's top-25 — the "is this feed drifting off-distribution"
    report a mixture owner reads before re-weighting.  Integer ranks
    with a deterministic tiebreak, so the comparison is exact on any
    engine — no float distance, no sampling.

    Scale shape: the explode shuffles (source, token) pairs with
    map-side partial counts (vocab-sized, not corpus-sized); per-source
    top-k is a rank window over the aggregated counts partitioned by
    source; the GLOBAL top-k is a TakeOrdered heap (orderBy+limit),
    never an unpartitioned rank window; the final overlap joins two
    k-row-per-source frames."""
    d = load(spark, sf_dir, "documents")
    words = d.select(
        "source", F.explode(TX.tokens("text")).alias("token")
    ).filter(F.col("token") != "")
    src_counts = words.groupBy("source", "token").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("source").orderBy(F.desc("c"), "token")
    src_top = (
        src_counts.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= _VOCAB_TOPK)
        .select("source", "token")
    )
    glob_top = (
        words.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "token")
        .limit(_VOCAB_TOPK)
        .select("token", F.lit(1).alias("__hit"))
    )
    shared = F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
    return (
        src_top.join(F.broadcast(glob_top), "token", "left")
        .groupBy("source")
        .agg(
            shared.cast("long").alias("n_shared"),
            F.round(
                shared.cast("double") / (F.lit(2 * _VOCAB_TOPK) - shared), 6
            ).alias("overlap_jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Span-level decontamination — longest EXACT shared token run between a
# corpus document and any benchmark document (Lee et al.-style substring
# contamination, expressed as consecutive shared shingle positions).
# ---------------------------------------------------------------------------


@_register(
    "benchmark_span_decontamination",
    _TOKENS_CTE
    + """
    , posed AS (
        SELECT doc_id, i AS pos, array_to_string(tokens[i:i+4], ' ') AS shingle
        FROM tok, LATERAL (
            SELECT unnest(generate_series(1, greatest(len(tokens) - 4, 0))) AS i
        )
    ),
    bench AS (
        SELECT DISTINCT shingle FROM posed WHERE doc_id % 17 = 0
    ),
    hits AS (
        SELECT DISTINCT p.doc_id, p.pos
        FROM posed p JOIN bench b ON b.shingle = p.shingle
        WHERE p.doc_id % 17 <> 0
    ),
    runs AS (
        SELECT doc_id, pos,
               pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
                   AS island
        FROM hits
    ),
    spans AS (
        SELECT doc_id, COUNT(*) AS run_len
        FROM runs GROUP BY doc_id, island
    )
    SELECT doc_id,
           CAST(MAX(run_len) + 4 AS BIGINT) AS longest_shared_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_shared_spans
    FROM spans
    GROUP BY doc_id
    HAVING MAX(run_len) >= 3
    """,
)
def benchmark_span_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring contamination report: for every corpus document
    (doc_id % 17 != 0), the longest run of consecutive 5-token shingle
    positions whose shingles ALL appear in some benchmark document
    (doc_id % 17 == 0) — i.e. the longest token span that is verbatim
    benchmark material — plus how many maximal shared spans the doc has.
    Docs whose longest span is below 7 tokens (run < 3) are dropped as
    incidental overlap; everything reported is a removal candidate.

    Scale shape: position-keeping shingles explode at the scan; the
    contamination probe is a hash equi-join against the DISTINCT
    benchmark shingle set (benchmark-sized, broadcastable in the common
    case); runs compress via the gaps-and-islands trick — a window
    partitioned BY DOCUMENT ordered by position, bounded by document
    length, never corpus-wide.  Cited: the reference has no dedup
    tooling; this extends SURVEY §2's dedup family
    (Lee et al. 2022-style exact-substring decontamination)."""
    d = load(spark, sf_dir, "documents")
    posed = positioned_shingles(d)
    bench = (
        posed.filter(F.col("doc_id") % 17 == 0).select("shingle").distinct()
    )
    hits = (
        posed.filter(F.col("doc_id") % 17 != 0)
        .join(bench, "shingle")
        .select("doc_id", "pos")
        .distinct()
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = hits.withColumn("island", F.col("pos") - F.row_number().over(w))
    spans = runs.groupBy("doc_id", "island").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return (
        spans.groupBy("doc_id")
        .agg(
            (F.max("run_len") + F.lit(4)).cast("long").alias("longest_shared_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_shared_spans"),
        )
        .filter(F.col("longest_shared_tokens") >= 7)
    )


@_register(
    "longest_shared_passage_pairs",
    _TOKENS_CTE
    + """
    , posed AS (
        SELECT doc_id, i AS pos, array_to_string(tokens[i:i+4], ' ') AS shingle
        FROM tok, LATERAL (
            SELECT unnest(generate_series(1, greatest(len(tokens) - 4, 0))) AS i
        )
    ),
    matches AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               a.pos AS pos_a, b.pos AS pos_b
        FROM posed a
        JOIN posed b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    ),
    runs AS (
        SELECT id_a, id_b, pos_a,
               pos_a - ROW_NUMBER() OVER (
                   PARTITION BY id_a, id_b, pos_a - pos_b ORDER BY pos_a
               ) AS island,
               pos_a - pos_b AS diag
        FROM matches
    ),
    spans AS (
        SELECT id_a, id_b, COUNT(*) AS run_len
        FROM runs GROUP BY id_a, id_b, diag, island
    )
    SELECT id_a, id_b,
           CAST(MAX(run_len) + 4 AS BIGINT) AS longest_shared_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_shared_spans
    FROM spans GROUP BY id_a, id_b
    HAVING MAX(run_len) >= 3
    """,
)
def longest_shared_passage_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAIRWISE exact longest shared passage: for every document pair
    sharing a verbatim token run of >= 7 tokens, the run's exact length
    and the pair's total number of maximal shared spans — the
    doc-vs-doc sibling of :func:`benchmark_span_decontamination`, and
    the exact ground truth the approximate detectors (winnowing
    overlap, max-containment) trade against.

    A shared passage of L tokens is L - 4 consecutive 5-shingle
    positions at a CONSTANT position offset, so runs live on the
    DIAGONALS of the position-match matrix: group matches by
    (pair, pos_a - pos_b) and compress consecutive pos_a values with
    the gaps-and-islands trick.  ``pos_a`` is unique within a
    (pair, diagonal), so the island window is totally ordered —
    deterministic by construction.

    Scale shape: the join key is the SHINGLE (inverted-index join —
    signatures shuffle, not documents); the islands window partitions
    by (pair, diagonal) and is bounded by document length, never
    corpus-wide.  Hot boilerplate shingles are the usual hazard; the
    ``candidate_pairs(max_bucket_size=...)`` cap composes onto
    ``posed`` unchanged when a production corpus needs it (kept exact
    here — the oracle-paired contract)."""
    d = load(spark, sf_dir, "documents")
    posed = positioned_shingles(d)
    a, b = posed.alias("a"), posed.alias("b")
    matches = a.join(
        b,
        (F.col("a.shingle") == F.col("b.shingle"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        F.col("a.pos").alias("pos_a"),
        (F.col("a.pos") - F.col("b.pos")).alias("diag"),
    )
    w = Window.partitionBy("id_a", "id_b", "diag").orderBy("pos_a")
    runs = matches.withColumn("island", F.col("pos_a") - F.row_number().over(w))
    spans = runs.groupBy("id_a", "id_b", "diag", "island").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return (
        spans.groupBy("id_a", "id_b")
        .agg(
            (F.max("run_len") + F.lit(4)).cast("long").alias(
                "longest_shared_tokens"
            ),
            F.count(F.lit(1)).cast("long").alias("n_shared_spans"),
        )
        .filter(F.col("longest_shared_tokens") >= 7)
    )


# ---------------------------------------------------------------------------
# MinHash estimator calibration — how well does the 8-perm signature
# estimate true Jaccard on the pairs LSH actually surfaces?
# ---------------------------------------------------------------------------

_CALIB_SIG_EQ_SQL = " + ".join(
    f"CASE WHEN sa.h{s} = sb.h{s} THEN 1 ELSE 0 END" for s in range(8)
)


@_register(
    "minhash_estimate_calibration",
    _MINHASH_CTE
    + """
    , sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
        SELECT c.id_a, c.id_b, count(*) AS n_common
        FROM cand c
        JOIN sh a ON a.doc_id = c.id_a
        JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
        GROUP BY c.id_a, c.id_b
    ),
    scored AS (
        SELECT cm.id_a, cm.id_b,
               CAST(cm.n_common AS DOUBLE)
                 / (na.n_sh + nb.n_sh - cm.n_common) AS true_j,
               ("""
    + _CALIB_SIG_EQ_SQL
    + """) AS n_eq
        FROM common cm
        JOIN sizes na ON na.doc_id = cm.id_a
        JOIN sizes nb ON nb.doc_id = cm.id_b
        JOIN sig sa ON sa.doc_id = cm.id_a
        JOIN sig sb ON sb.doc_id = cm.id_b
    )
    SELECT n_eq,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(AVG(true_j), 6) AS mean_true_jaccard,
           ROUND(AVG(abs(n_eq / 8.0 - true_j)), 6) AS mean_abs_err
    FROM scored
    GROUP BY n_eq
    """,
)
def minhash_estimate_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-quality report for the MinHash estimator itself: for every
    LSH-surfaced candidate pair, compare the signature-agreement
    estimate (matching components / 8) against the exact shingle-set
    Jaccard, grouped by agreement count — the calibration table that
    tells a dedup owner what threshold a given signature width can
    actually enforce (8 perms quantize estimates to eighths; more perms
    narrow the error at linear signature cost).

    Exactness: the estimate is integer component-agreement and the true
    Jaccard an exact ratio; only the final averages run in double,
    rounded at the edge.  Scale shape: signatures join per-pair (two
    dim-width rows per pair), the shingle-intersection join is the same
    bounded candidate verification as minhash_lsh_near_dup."""
    d = load(spark, sf_dir, "documents")
    sh = shingles(d)
    sig = minhash_signatures(sh)
    cands = candidate_pairs(lsh_bands(sig))
    true_j = jaccard(cands, sh).withColumnRenamed("jaccard", "true_j")
    sa = sig.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"h{s}").alias(f"ha{s}") for s in range(8)],
    )
    sb = sig.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"h{s}").alias(f"hb{s}") for s in range(8)],
    )
    n_eq = sum(
        F.when(F.col(f"ha{s}") == F.col(f"hb{s}"), 1).otherwise(0)
        for s in range(8)
    )
    scored = (
        true_j.join(sa, "id_a")
        .join(sb, "id_b")
        .select("true_j", n_eq.alias("n_eq"))
    )
    return scored.groupBy("n_eq").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.avg("true_j"), 6).alias("mean_true_jaccard"),
        F.round(
            F.avg(F.abs(F.col("n_eq") / F.lit(8.0) - F.col("true_j"))), 6
        ).alias("mean_abs_err"),
    )


# ---------------------------------------------------------------------------
# RAG-style document chunking — fixed-size token windows with overlap.
# ---------------------------------------------------------------------------

_CHUNK_SIZE = 64
_CHUNK_STRIDE = 48  # 16-token overlap


@_register(
    "chunk_documents_overlapping",
    _TOKENS_CTE
    + f"""
    , chunks AS (
        SELECT doc_id,
               CAST((i - 1) / {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
               least(len(tokens) - i + 1, {_CHUNK_SIZE}) AS n_tokens,
               array_to_string(tokens[i:i+{_CHUNK_SIZE - 1}], ' ') AS chunk_text
        FROM tok, LATERAL (
            SELECT unnest(generate_series(1, greatest(len(tokens), 1),
                                          {_CHUNK_STRIDE})) AS i
        )
        WHERE len(tokens) > 0
    )
    SELECT doc_id, chunk_idx,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           md5(chunk_text) AS chunk_fp
    FROM chunks
    """,
)
def chunk_documents_overlapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG/pretraining chunker: split every document into fixed 64-token
    windows advancing 48 tokens per step (16-token overlap so no
    sentence is orphaned at a boundary) — the 1:N row expansion every
    retrieval index build runs.  Emits (doc_id, chunk_idx, n_tokens,
    chunk_fp) with the fingerprint standing in for the chunk text so the
    oracle hash-checks content without hauling strings.

    Scale shape: explode(sequence(1, len, stride)) expands at the scan
    with plain slice/concat_ws (codegen'd, no HOF lambdas) — no shuffle
    at all; chunk count per doc is len/stride, so output size tracks
    corpus token count, and the md5 keeps the comparison narrow."""
    d = load(spark, sf_dir, "documents")
    base = d.select("doc_id", TX.tokens("text").alias("__tk")).filter(
        F.size("__tk") > 0
    )
    return base.select(
        "doc_id",
        "__tk",
        F.explode(
            F.sequence(
                F.lit(1), F.greatest(F.size("__tk"), F.lit(1)), F.lit(_CHUNK_STRIDE)
            )
        ).alias("i"),
    ).select(
        "doc_id",
        ((F.col("i") - 1) / F.lit(_CHUNK_STRIDE)).cast("long").alias("chunk_idx"),
        F.least(
            F.size("__tk") - F.col("i") + 1, F.lit(_CHUNK_SIZE)
        ).cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(" ", F.slice("__tk", F.col("i"), _CHUNK_SIZE))).alias(
            "chunk_fp"
        ),
    )


# ---------------------------------------------------------------------------
# Streaming twin of the incremental near-dup probe — same oracle, so the
# driver row asserts stream/batch parity for the ingestion flow.
# ---------------------------------------------------------------------------

_stream_neardup_counter = [0]


@_register("streaming_incremental_near_dup", _INCR_NEAR_DUP_ORACLE)
def streaming_incremental_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental near-dup probe as a genuine stream: incoming
    documents arrive per micro-batch and probe the standing corpus band
    index inside ``foreachBatch`` (see
    ``streaming/events_stream.incremental_near_dup_stream``).  Shares
    the batch query's DuckDB oracle, so a green driver row proves the
    streaming path emits byte-identical keep/drop signals to the batch
    path — the same stream/batch-parity discipline as the OHLC and
    token-monitor twins."""
    import shutil
    import tempfile

    from ..streaming.events_stream import incremental_near_dup_stream

    _stream_neardup_counter[0] += 1
    out_dir = tempfile.mkdtemp(prefix=f"neardup_stream_{_stream_neardup_counter[0]}_")
    shutil.rmtree(out_dir)  # parquet sink wants to create it
    return incremental_near_dup_stream(spark, sf_dir, out_dir)


# ---------------------------------------------------------------------------
# Leakage-guarded train/test split — the benchmark-integrity guard every
# training-data pipeline needs: near-duplicates of held-out documents
# must not remain in train.
# ---------------------------------------------------------------------------


@_register(
    "leakage_guarded_split",
    _MINHASH_CTE
    + """
    , sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
        SELECT c.id_a, c.id_b, count(*) AS n_common
        FROM cand c
        JOIN sh a ON a.doc_id = c.id_a
        JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
        GROUP BY c.id_a, c.id_b
    ),
    near AS (
        SELECT cm.id_a, cm.id_b
        FROM common cm
        JOIN sizes na ON na.doc_id = cm.id_a
        JOIN sizes nb ON nb.doc_id = cm.id_b
        WHERE CAST(cm.n_common AS DOUBLE)
              / (na.n_sh + nb.n_sh - cm.n_common) >= 0.5
    ),
    tst AS (
        SELECT doc_id FROM documents
        WHERE substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 4) < '1999'
    ),
    leaky AS (
        SELECT n.id_a AS doc_id FROM near n JOIN tst t ON n.id_b = t.doc_id
        UNION
        SELECT n.id_b FROM near n JOIN tst t ON n.id_a = t.doc_id
    )
    SELECT d.doc_id,
           CASE WHEN t.doc_id IS NOT NULL THEN 'test'
                WHEN l.doc_id IS NOT NULL THEN 'train_excluded_leak'
                ELSE 'train' END AS split
    FROM documents d
    LEFT JOIN tst t ON t.doc_id = d.doc_id
    LEFT JOIN leaky l ON l.doc_id = d.doc_id
    """,
)
def leakage_guarded_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination-aware train/test split: ~12% of documents hold out
    as test (md5-prefix split, the engine-wide no-rand() rule), and any
    TRAIN document that is an LSH-verified near-duplicate (Jaccard >=
    0.5) of a test document is EXCLUDED from train — the leakage guard
    without which held-out evaluation silently measures memorized
    near-copies.  Every document gets a label: test /
    train_excluded_leak / train.

    Scale shape: the near-dup pair set is the same banded-LSH
    candidate + exact-verify machinery as the dedup family (signatures
    shuffle, never documents); the guard itself is two broadcastable
    semi-join probes of the pair list against the test ids.  The same
    query with ``near_dup_components`` instead of direct pairs would
    harden the guard to transitive leaks — at higher cost — when the
    eval set is adversarial."""
    d = load(spark, sf_dir, "documents")
    sh = shingles(d)
    cands = candidate_pairs(lsh_bands(minhash_signatures(sh)))
    near = jaccard(cands, sh).filter(F.col("jaccard") >= 0.5).select("id_a", "id_b")
    tst = d.filter(
        F.substring(
            F.md5(F.concat(F.lit("split"), F.col("doc_id").cast("string"))), 1, 4
        )
        < "1999"
    ).select("doc_id")
    leaky = (
        near.join(tst.withColumnRenamed("doc_id", "id_b"), "id_b")
        .select(F.col("id_a").alias("doc_id"))
        .union(
            near.join(tst.withColumnRenamed("doc_id", "id_a"), "id_a").select(
                F.col("id_b").alias("doc_id")
            )
        )
        .distinct()
    )
    return (
        d.select("doc_id")
        .join(tst.withColumn("__t", F.lit(1)), "doc_id", "left")
        .join(leaky.withColumn("__l", F.lit(1)), "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("__t").isNotNull(), F.lit("test"))
            .when(F.col("__l").isNotNull(), F.lit("train_excluded_leak"))
            .otherwise(F.lit("train"))
            .alias("split"),
        )
    )


# ---------------------------------------------------------------------------
# Split-and-pack: the full context-window assembly — long documents split
# into window-sized pieces FIRST, then all pieces pack greedily, so no
# single row ever exceeds the window and any piece crosses at most one
# boundary (whole-doc packing can drag a 10k-token doc across dozens).
# ---------------------------------------------------------------------------

_SP_WINDOW = 64


@_register(
    "split_and_pack_bins",
    _TOKENS_CTE
    + f"""
    , pieces AS (
        SELECT doc_id,
               CAST((i - 1) // {_SP_WINDOW} AS BIGINT) AS piece_idx,
               CAST(least(len(tokens) - i + 1, {_SP_WINDOW}) AS BIGINT)
                   AS n_tokens,
               md5('sp' || CAST(doc_id AS VARCHAR) || ':'
                   || CAST((i - 1) // {_SP_WINDOW} AS VARCHAR)) AS h
        FROM tok, LATERAL (
            SELECT unnest(generate_series(1, greatest(len(tokens), 1),
                                          {_SP_WINDOW})) AS i
        )
        WHERE len(tokens) > 0
    ),
    cum AS (
        SELECT doc_id, piece_idx, n_tokens,
               sum(n_tokens) OVER (
                   ORDER BY h, doc_id, piece_idx
                   ROWS UNBOUNDED PRECEDING) AS cum_tokens
        FROM pieces
    )
    SELECT CAST((cum_tokens - n_tokens) // {_SP_WINDOW} AS BIGINT) AS bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_pieces,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
    FROM cum
    GROUP BY 1
    """,
)
def split_and_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window assembly done the way pretraining loaders actually
    do it: documents longer than the 64-token window SPLIT into
    window-sized pieces first (the chunker without overlap), then every
    piece packs greedily in deterministic md5 order.  Since no piece
    exceeds the window, every piece crosses AT MOST one bin boundary
    and a loader can pad-align bins with bounded waste — whole-doc
    packing (``sequence_packing_bins``) can drag one long document
    across arbitrarily many windows.  Emits per-bin piece/doc occupancy
    and token fill.

    Scale shape: the split is the chunker's explode(sequence) at the
    scan; the global pack order cumsum runs through
    :func:`grouped_running_sum` with a constant group key (bucketed
    two-pass, no sequential task); the rollup is ordinary hash
    aggregation."""
    d = load(spark, sf_dir, "documents")
    base = d.select("doc_id", TX.tokens("text").alias("__tk")).filter(
        F.size("__tk") > 0
    )
    pieces = base.select(
        "doc_id",
        "__tk",
        F.explode(
            F.sequence(
                F.lit(1), F.greatest(F.size("__tk"), F.lit(1)), F.lit(_SP_WINDOW)
            )
        ).alias("i"),
    ).select(
        "doc_id",
        ((F.col("i") - 1) / F.lit(_SP_WINDOW)).cast("long").alias("piece_idx"),
        F.least(F.size("__tk") - F.col("i") + 1, F.lit(_SP_WINDOW))
        .cast("long")
        .alias("n_tokens"),
        F.md5(
            F.concat(
                F.lit("sp"),
                F.col("doc_id").cast("string"),
                F.lit(":"),
                ((F.col("i") - 1) / F.lit(_SP_WINDOW)).cast("long").cast("string"),
            )
        ).alias("h"),
    )
    cum = grouped_running_sum(
        pieces.withColumn("__one", F.lit(1)),
        "__one",
        ["h", "doc_id", "piece_idx"],
        "n_tokens",
        out_col="cum_tokens",
    )
    return (
        cum.select(
            "doc_id",
            "n_tokens",
            F.expr(f"(cum_tokens - n_tokens) div {_SP_WINDOW}").alias("bin_id"),
        )
        .groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pieces"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("bin_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Quality-aware dedup survivor selection — WHICH copy to keep matters:
# keep each near-dup cluster's highest-quality member, not its lowest id.
# ---------------------------------------------------------------------------


@_register(
    "near_dup_quality_survivors",
    _MINHASH_CTE.replace("WITH tok", "WITH RECURSIVE tok", 1)
    + _VERIFIED_PAIRS_TAIL
    + """
    , und AS (SELECT id_a AS a, id_b AS b FROM verified
              UNION SELECT id_b, id_a FROM verified),
    walk AS (
        SELECT a, b FROM und
        UNION
        SELECT w.a, e.b FROM walk w JOIN und e ON w.b = e.a
    ),
    comp AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS component
             FROM walk GROUP BY a),
    allc AS (
        SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
        FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    ),
    qual AS (
        SELECT doc_id,
               ROUND(
                 CAST(length(list_filter(tokens,
                          t -> list_contains(['the','a','and','is'], t))) AS DOUBLE)
                     / len(tokens)
                   - 0.5 * coalesce(
                         CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))
                              AS DOUBLE) / nullif(length(text), 0), 0.0)
                   + 0.1 * (least(CAST(len(tokens) AS DOUBLE), 100.0) / 100.0),
                 6) AS q
        FROM tok
    )
    SELECT component, doc_id AS kept_doc_id, q AS quality,
           CAST(n_members AS BIGINT) AS n_members
    FROM (
        SELECT ac.component, ac.doc_id, qual.q,
               COUNT(*) OVER (PARTITION BY ac.component) AS n_members,
               ROW_NUMBER() OVER (PARTITION BY ac.component
                                  ORDER BY qual.q DESC, ac.doc_id) AS rn
        FROM allc ac JOIN qual ON qual.doc_id = ac.doc_id
    )
    WHERE rn = 1
    """,
)
def near_dup_quality_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup survivor selection done the way a curation pipeline should:
    within every near-dup cluster (LSH-verified components, Jaccard >=
    0.5), keep the HIGHEST-QUALITY member — min-doc-id keep-first
    throws away the cleanest copy whenever the boilerplate-laden one
    ingested earlier.  Singletons keep themselves, so the output IS the
    post-dedup corpus: (component, kept_doc_id, quality, n_members).

    Determinism across engines: members rank on the ROUNDED quality
    (6 digits, the engine-wide edge convention) with a doc_id tiebreak,
    so an unrounded last-ulp difference can never flip the survivor.
    Scale shape: components from the iterative min-label operator
    (signatures shuffle, not documents); the rank window partitions BY
    COMPONENT — cluster-sized, the same bounded shape as every per-doc
    window in the dedup family."""
    from ..operators.graph import connected_components

    d = load(spark, sf_dir, "documents")
    sh = shingles(d)
    verified = (
        jaccard(candidate_pairs(lsh_bands(minhash_signatures(sh))), sh)
        .filter(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b")
    )
    comp = connected_components(verified).select(
        F.col("id").alias("doc_id"), "component"
    )
    allc = (
        d.select("doc_id", F.round(TX.quality_score("text"), 6).alias("q"))
        .join(comp, "doc_id", "left")
        .select(
            "doc_id", "q", F.coalesce("component", "doc_id").alias("component")
        )
    )
    w = Window.partitionBy("component")
    wr = w.orderBy(F.desc("q"), "doc_id")
    return (
        allc.withColumn("n_members", F.count(F.lit(1)).over(w).cast("long"))
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "component",
            F.col("doc_id").alias("kept_doc_id"),
            F.col("q").alias("quality"),
            "n_members",
        )
    )


# ---------------------------------------------------------------------------
# Compression-ratio quality signal — the classic "too compressible =
# boilerplate, too incompressible = noise" filter (used by Gopher/
# MassiveText-style curation).  zlib lives in Python, so this is the
# text family's one Arrow mapInPandas operator.
# ---------------------------------------------------------------------------


@_register("compression_ratio_filter")  # rows-only: no zlib in the SQL oracle
def compression_ratio_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document zlib compression ratio (compressed bytes / raw
    bytes, level 6) plus a keep flag for the [0.2, 0.8] band —
    highly compressible documents are templated boilerplate, nearly
    incompressible ones are binary junk or high-entropy noise; natural
    prose sits in between.  Registered rows-only: DuckDB has no zlib,
    and re-implementing DEFLATE in SQL would test the oracle, not the
    operator.  Determinism: zlib with a fixed level is a pure function
    of the bytes (same library everywhere in this deployment), and the
    quality contract is pinned by ordering tests
    (tests/test_properties.py::test_compression_ratio_orders_text_regimes).

    Scale shape: Arrow-batched ``mapInPandas`` — the same 1:1
    scan-parallel shape as the media codecs; no shuffle, no state, and
    the UTF-8 encode + deflate cost rides the scan exactly like
    tokenization does JVM-side."""
    import pandas as pd
    import zlib

    d = load(spark, sf_dir, "documents")

    def score(batches):
        for pdf in batches:
            raw = pdf["text"].map(lambda t: len(t.encode("utf-8")))
            comp = pdf["text"].map(
                lambda t: len(zlib.compress(t.encode("utf-8"), 6))
            )
            ratio = (comp / raw.clip(lower=1)).round(6)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": raw.astype("int64"),
                    "n_compressed": comp.astype("int64"),
                    "compression_ratio": ratio,
                    "keep": (ratio >= 0.2) & (ratio <= 0.8) & (raw > 0),
                }
            )

    return d.select("doc_id", "text").mapInPandas(
        score,
        "doc_id long, n_bytes long, n_compressed long,"
        " compression_ratio double, keep boolean",
    )


# ---------------------------------------------------------------------------
# Epoch schedule per source — when a uniform mixture wants more tokens
# from a source than it has, the source repeats (multi-epoch); cap the
# repetition and report the shortfall.
# ---------------------------------------------------------------------------

_EPOCH_CAP = 4.0


@_register(
    "epochs_per_source_schedule",
    _TOKENS_CTE
    + f"""
    , avail AS (
        SELECT d.source, CAST(SUM(len(t.tokens)) AS BIGINT) AS available_tokens
        FROM tok t JOIN documents d ON d.doc_id = t.doc_id
        GROUP BY d.source
    ),
    tot AS (
        SELECT CAST(SUM(available_tokens) AS BIGINT) AS budget,
               COUNT(*) AS n_sources
        FROM avail
    )
    SELECT a.source, a.available_tokens,
           CAST(t.budget // t.n_sources AS BIGINT) AS target_tokens,
           ROUND(least(CAST(t.budget // t.n_sources AS DOUBLE)
                       / a.available_tokens, {_EPOCH_CAP}), 6) AS epochs,
           CAST(CAST(t.budget // t.n_sources AS DOUBLE)
                / a.available_tokens > {_EPOCH_CAP} AS BOOLEAN) AS capped
    FROM avail a CROSS JOIN tot t
    """,
)
def epochs_per_source_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-epoch mixture schedule: give every source an equal share of
    the total token budget; a source with fewer tokens than its share
    REPEATS (epochs > 1) up to the standard 4-epoch repetition cap
    (beyond which memorization outweighs coverage), and the capped flag
    names the sources that cannot fill their share — the report that
    drives re-weighting or sourcing decisions.

    All counts are exact integers; the single epochs division runs once
    per source in double and rounds at the edge.  Scale shape: one
    corpus scan into a per-source token aggregate (map-side combined),
    one 1-row totals aggregate broadcast back — the Q15/Q22 scalar
    pattern; nothing after the first aggregate touches corpus-sized
    data."""
    d = load(spark, sf_dir, "documents")
    avail = (
        d.select("source", TX.token_count("text").cast("long").alias("n"))
        .groupBy("source")
        .agg(F.sum("n").alias("available_tokens"))
    )
    tot = avail.agg(
        F.sum("available_tokens").alias("budget"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    target = F.floor(F.col("budget") / F.col("n_sources")).cast("long")
    raw_epochs = target.cast("double") / F.col("available_tokens")
    return avail.crossJoin(F.broadcast(tot)).select(
        "source",
        "available_tokens",
        target.alias("target_tokens"),
        F.round(F.least(raw_epochs, F.lit(_EPOCH_CAP)), 6).alias("epochs"),
        (raw_epochs > F.lit(_EPOCH_CAP)).alias("capped"),
    )


# ---------------------------------------------------------------------------
# Curriculum ordering — interleaved training order: rank every document
# within its language by quality, then emit rank-1 docs of every language
# first, then rank-2, and so on.  The standard anti-clumping prep before
# sharding a multilingual corpus into a training run.
# ---------------------------------------------------------------------------


@_register(
    "curriculum_interleave_order",
    _TOKENS_CTE
    + """
    , qual AS (
        SELECT t.doc_id, d.lang,
               ROUND(
                 CAST(length(list_filter(t.tokens,
                          x -> list_contains(['the','a','and','is'], x))) AS DOUBLE)
                     / len(t.tokens)
                   - 0.5 * coalesce(
                         CAST(length(t.text) - length(regexp_replace(t.text, '[.,;:!?]', '', 'g'))
                              AS DOUBLE) / nullif(length(t.text), 0), 0.0)
                   + 0.1 * (least(CAST(len(t.tokens) AS DOUBLE), 100.0) / 100.0),
                 6) AS q
        FROM tok t JOIN documents d ON d.doc_id = t.doc_id
    ),
    r AS (
        SELECT doc_id, lang, q,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY q DESC, doc_id) AS lang_rank
        FROM qual
    )
    SELECT doc_id, lang, q, lang_rank,
           ROW_NUMBER() OVER (ORDER BY lang_rank, lang, doc_id) - 1 AS global_pos
    FROM r
    """,
)
def curriculum_interleave_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-curriculum training order with language interleaving:
    per-language quality rank (best first, 6-digit rounded quality with
    doc_id tiebreak — the engine-wide edge convention, so an unrounded
    last-ulp difference can never flip an order), then a GLOBAL position
    that cycles through the languages rank-by-rank, so no early shard of
    the training run is dominated by one language.

    Scale shape — the oracle's two windows would both be scale traps and
    neither runs here:

    - the per-language rank is ``ROW_NUMBER() OVER (PARTITION BY lang)``
      in the oracle, i.e. one sequential task per language ("en" alone is
      tens of TB at 100 TB).  The engine computes it as a running count
      of 1 through :func:`~..operators.windows.grouped_running_sum` —
      the bucketed two-pass cumsum, bounded per-task work for any skew;
    - the global interleave position is a GLOBAL ``ROW_NUMBER()`` in the
      oracle (single-task total sort).  The engine derives it
      ALGEBRAICALLY from the per-language doc counts: for a doc at rank
      r in language g, ``global_pos = sum_l min(n_l, r-1) + |{l < g :
      n_l >= r}|`` — every rank below r contributes one doc per language
      that has one, and within rank r earlier languages go first.  The
      counts are a languages-sized dim aggregated once and broadcast as
      ONE array row (the Q15/Q22 scalar pattern); the positions are then
      per-row HOF arithmetic over that array — no second bucketed pass,
      no total sort, nothing corpus-sized past the rank stage.
    """
    d = load(spark, sf_dir, "documents")
    q = d.select(
        "doc_id",
        "lang",
        F.round(TX.quality_score("text"), 6).alias("q"),
    ).select("*", (-F.col("q")).alias("negq"), F.lit(1).alias("one"))
    ranked = grouped_running_sum(
        q,
        "lang",
        ["negq", "doc_id"],
        "one",
        out_col="lang_rank",
        # cuts only affect bucket balance: sample the cheap key projection
        # (lang + rounded quality), not the full ranked plan
        cut_source=q.select("lang", "negq", "doc_id"),
    ).drop("negq", "one")
    lang_counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    lc = lang_counts.agg(
        F.array_sort(F.collect_list(F.struct("lang", "n"))).alias("lc")
    )
    rank = F.col("lang_rank")
    before_rounds = F.aggregate(
        "lc",
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.least(x["n"], rank - F.lit(1)),
    )
    before_ties = F.size(
        F.filter("lc", lambda x: (x["n"] >= rank) & (x["lang"] < F.col("lang")))
    ).cast("long")
    return ranked.crossJoin(F.broadcast(lc)).select(
        "doc_id",
        "lang",
        "q",
        rank.cast("long").alias("lang_rank"),
        (before_rounds + before_ties).alias("global_pos"),
    )


# ---------------------------------------------------------------------------
# Dataset datasheet — the per-(source, language) composition report every
# corpus release ships ("Datasheets for Datasets"): volume, token mass,
# quality, and exact-duplication rate in ONE aggregation pass.
# ---------------------------------------------------------------------------


@_register(
    "dataset_datasheet_by_source",
    _TOKENS_CTE
    + """
    , base AS (
        SELECT d.source, d.lang,
               CAST(len(t.tokens) AS BIGINT) AS nt,
               ROUND(
                 CAST(length(list_filter(t.tokens,
                          x -> list_contains(['the','a','and','is'], x))) AS DOUBLE)
                     / len(t.tokens)
                   - 0.5 * coalesce(
                         CAST(length(t.text) - length(regexp_replace(t.text, '[.,;:!?]', '', 'g'))
                              AS DOUBLE) / nullif(length(t.text), 0), 0.0)
                   + 0.1 * (least(CAST(len(t.tokens) AS DOUBLE), 100.0) / 100.0),
                 6) AS q,
               md5(regexp_replace(lower(trim(t.text)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS fp
        FROM tok t JOIN documents d ON d.doc_id = t.doc_id
    )
    SELECT source, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(nt) AS BIGINT) AS total_tokens,
           ROUND(CAST(SUM(nt) AS DOUBLE) / COUNT(*), 6) AS avg_tokens,
           MAX(nt) AS max_tokens,
           ROUND(CAST(SUM(CAST(q AS DECIMAL(12,6))) AS DOUBLE) / COUNT(*), 6)
               AS avg_quality,
           COUNT(DISTINCT fp) AS n_unique_docs,
           ROUND(1.0 - CAST(COUNT(DISTINCT fp) AS DOUBLE) / COUNT(*), 6)
               AS dup_rate
    FROM base
    GROUP BY source, lang
    """,
)
def dataset_datasheet_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, language) datasheet: document count, exact token
    mass, mean/max tokens, mean quality, and the exact-duplicate rate
    (1 - distinct fingerprints / docs) — the composition table a corpus
    release publishes and a mixture designer reads first.  Complements
    :func:`corpus_statistics_report` (the volume-only GROUPING SETS
    rollup): this is the full-crossing cell table with the two metrics
    that need more than integer sums — a float-exact quality mean and a
    distinct-count dup rate.

    Determinism across engines: the only float accumulation is the
    quality mean, and floating addition is order-sensitive — so the
    6-digit-rounded qualities are summed EXACTLY as DECIMAL(12,6) and
    only the final single division runs in double (one IEEE op, then the
    6-digit edge round; same on both sides).  Token sums are exact
    BIGINTs; the two rates are single double divisions of exact
    integers.

    Scale shape: one corpus scan into one (source, lang)-keyed
    aggregate — dim-sized output, map-side partial aggregation for every
    column; COUNT(DISTINCT fp) expands to the standard two-phase
    expand/merge, keyed on (source, lang, fp), so the shuffle carries
    fingerprints, never text.  No windows, no joins, no second pass."""
    d = load(spark, sf_dir, "documents")
    base = d.select(
        "source",
        "lang",
        TX.token_count("text").cast("long").alias("nt"),
        F.round(TX.quality_score("text"), 6).alias("q"),
        TX.fingerprint("text").alias("fp"),
    )
    n = F.count(F.lit(1))
    return base.groupBy("source", "lang").agg(
        n.alias("n_docs"),
        F.sum("nt").alias("total_tokens"),
        F.round(F.sum("nt").cast("double") / n, 6).alias("avg_tokens"),
        F.max("nt").alias("max_tokens"),
        F.round(
            F.sum(F.col("q").cast("decimal(12,6)")).cast("double") / n, 6
        ).alias("avg_quality"),
        F.count_distinct(F.col("fp")).alias("n_unique_docs"),
        F.round(
            F.lit(1.0) - F.count_distinct(F.col("fp")).cast("double") / n, 6
        ).alias("dup_rate"),
    )


# ---------------------------------------------------------------------------
# Exact similarity join with lossless prefix filtering (AllPairs/PPJoin).
# ---------------------------------------------------------------------------


@_register(
    "prefix_filtered_jaccard_pairs",
    _SHINGLE_CTE
    + """
, cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
), sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
    SELECT c.id_a, c.id_b, count(*) AS n_common
    FROM cand c
    JOIN sh a ON a.doc_id = c.id_a
    JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
    GROUP BY c.id_a, c.id_b
)
SELECT cm.id_a, cm.id_b,
       CAST(cm.n_common AS DOUBLE) / (na.n_sh + nb.n_sh - cm.n_common) AS jaccard
FROM common cm
JOIN sizes na ON na.doc_id = cm.id_a
JOIN sizes nb ON nb.doc_id = cm.id_b
WHERE CAST(cm.n_common AS DOUBLE) / (na.n_sh + nb.n_sh - cm.n_common) >= 0.6
""",
)
def prefix_filtered_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All document pairs with exact 5-shingle Jaccard >= 0.6, found via
    lossless prefix filtering (:func:`prefix_filter_pairs`): only the
    rarest ``n - ceil(0.6 n) + 1`` shingles of each document enter the
    inverted-index self-join, yet no qualifying pair can be missed.

    The EXACT counterpart of the approximate LSH tier: MinHash banding
    trades recall for candidate volume, while the prefix filter prunes
    by algebra — the oracle deliberately runs the UNPRUNED any-shared-
    shingle join and the hash match proves losslessness on real data
    (a dedicated test additionally cross-validates against
    ``ngram_jaccard_pairs`` filtered to the same threshold, and that
    pruning actually shrinks the candidate set).

    Scale: candidate generation cost tracks document-frequency-RARE
    shingles, so the corpus-wide boilerplate shingle that forces a
    hot-bucket cap in the LSH tier simply never joins here; candidate
    verification reuses the array-intersect :func:`jaccard` scorer over
    pruned pairs only."""
    return prefix_jaccard_pairs_run(spark, sf_dir, threshold=0.6)


_PJS_PCT = 25  # deterministic md5-lane sample for the sampled audit tier


def prefix_jaccard_pairs_run(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.6,
    sample_pct: int | None = None,
    n_shards: int | None = None,
    sample_bp: int | None = None,
) -> DataFrame:
    """Parameterized exact prefix-filtered Jaccard audit (VERDICT r13
    #6): the fourth-decade probe measured the GLOBAL variant's
    candidate sort going alpha~1.13 superlinear (n log n sort +
    scheduling, not skew), so the operational ruling — "run the exact
    audit on samples or per-shard at scale" — is a code path here, not
    prose.

    * ``sample_pct`` — keep only documents whose deterministic md5 lane
      (``md5('pjs:' || doc_id) % 100``) falls below the percentage; the
      audit is then EXACT on the sampled sub-corpus and its cost scales
      with the sample, independent of corpus growth.  The lane is
      oracle-replayable, so the sampled tier stays hash-verified.
    * ``n_shards`` — assign each document to one of S md5 shards and
      run the whole audit within each shard (see
      :func:`...operators.minhash.prefix_filter_pairs` ``shard_col``):
      per-shard sorts are (n/S) log(n/S) and shards schedule
      independently, trading cross-shard pairs for a flat scale curve.

    ``sample_bp`` is the fine-grained (basis-point, lane % 10000) twin
    of ``sample_pct`` for PINNED-BUDGET scale probes: on an x30 corpus,
    bp = 2500/30 keeps the absolute sampled-document count constant, so
    the audit's cost curve can be measured at a fixed budget.

    ``sample_pct`` and ``sample_bp`` are mutually exclusive (they are
    two granularities of the SAME md5 lane; passing both is ambiguous
    and raises ``ValueError`` — ADVICE r14).  Either sampling knob
    composes with ``n_shards``; the serving path for full-corpus
    near-dup remains MinHash-LSH banding (the r13 adjudication)."""
    if sample_pct is not None and sample_bp is not None:
        raise ValueError(
            "sample_pct and sample_bp are two granularities of the same "
            "md5 sampling lane — pass at most one"
        )
    d = load(spark, sf_dir, "documents")
    if sample_pct is not None or sample_bp is not None:
        mod, cut = (
            (100, int(sample_pct)) if sample_pct is not None else (10000, int(sample_bp))
        )
        lane = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.lit("pjs:"), F.col("doc_id").cast("string"))
                    ),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("long")
            % mod
        )
        d = d.filter(lane < cut)
    sh = shingles(d)
    if n_shards is not None and int(n_shards) > 1:
        shard = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.lit("pjh:"), F.col("doc_id").cast("string"))
                    ),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("long")
            % int(n_shards)
        )
        sh = sh.withColumn("__shard", shard)
        cands = prefix_filter_pairs(sh, threshold, shard_col="__shard")
        sh = sh.drop("__shard")
    else:
        cands = prefix_filter_pairs(sh, threshold)
    return jaccard(cands, sh).filter(F.col("jaccard") >= threshold)


@_register(
    "prefix_jaccard_sampled_pairs",
    _TOKENS_CTE.replace(
        "FROM documents",
        f"""FROM documents
    WHERE CAST(('0x' || substr(md5('pjs:' || CAST(doc_id AS VARCHAR)), 1, 13))
               AS BIGINT) % 100 < {_PJS_PCT}""",
    )
    + """
, pos AS (
    SELECT doc_id, tokens,
           unnest(generate_series(1, greatest(len(tokens) - 4, 0))) AS i
    FROM tok
),
sh AS (
    SELECT DISTINCT doc_id, array_to_string(tokens[i:i+4], ' ') AS shingle
    FROM pos
), cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
), sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
    SELECT c.id_a, c.id_b, count(*) AS n_common
    FROM cand c
    JOIN sh a ON a.doc_id = c.id_a
    JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
    GROUP BY c.id_a, c.id_b
)
SELECT cm.id_a, cm.id_b,
       CAST(cm.n_common AS DOUBLE) / (na.n_sh + nb.n_sh - cm.n_common) AS jaccard
FROM common cm
JOIN sizes na ON na.doc_id = cm.id_a
JOIN sizes nb ON nb.doc_id = cm.id_b
WHERE CAST(cm.n_common AS DOUBLE) / (na.n_sh + nb.n_sh - cm.n_common) >= 0.6
""",
)
def prefix_jaccard_sampled_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAMPLED exact-Jaccard audit tier (VERDICT r13 #6): identical
    semantics to :func:`prefix_filtered_jaccard_pairs` but over the
    deterministic 25% md5-lane document sample, which is the tier that
    stays affordable when the full-corpus exact audit's measured
    alpha~1.13 sort superlinearity bites (x30 probe, SCALE.md r13).
    The oracle runs the UNPRUNED any-shared-shingle join over the SAME
    sampled sub-corpus, so losslessness of the prefix filter is
    hash-proven on the sampled tier exactly as on the full one."""
    return prefix_jaccard_pairs_run(
        spark, sf_dir, threshold=0.6, sample_pct=_PJS_PCT
    )


@_register("bpe_train_merges")  # rows-only: iterative data-dependent argmax loop
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the first 10 BPE merges on the documents corpus — tokenizer
    TRAINING (the merge table a byte-pair tokenizer applies), learned
    with corpus-sized work only in the initial word count; see
    ``operators/bpe.py`` for the vocab-sized iteration design and the
    determinism argument.  Rows-only by driver contract (each merge
    choice depends on the previous merge's application — not
    SQL-expressible); the strong check is the property test pinning the
    learned merges equal to a plain-Python BPE reference on the same
    vocabulary, under any partitioning."""
    from ..operators.bpe import bpe_train_df, char_vocab

    d = load(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(TX.tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return bpe_train_df(char_vocab(words), 10)


@_register("bpe_segment_fertility")  # rows-only: consumes the trained merges
def bpe_segment_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fertility (pieces per word) of the 10-merge learned BPE, per
    language: train on the corpus vocabulary, segment the DISTINCT
    words in one Arrow pass, then join the word->n_pieces map back to
    the exploded corpus — tokenizer application cost scales with the
    vocabulary while the per-language statistic aggregates the corpus
    with exact integer sums.  The learned-tokenizer twin of
    ``tokenizer_fertility_by_lang`` (fixed regex segmentation)."""
    from ..operators.bpe import bpe_segment_words, bpe_train, char_vocab

    d = load(spark, sf_dir, "documents")
    tl = d.select("lang", F.explode(TX.tokens("text")).alias("word"))
    words = tl.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    merges = bpe_train(char_vocab(words), 10)
    seg = bpe_segment_words(words, merges).select(
        "word", F.size("pieces").alias("n_pieces")
    )
    return (
        tl.join(seg, "word")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_pieces").alias("n_pieces"),
            F.round(
                F.sum("n_pieces").cast("double") / F.count(F.lit(1)), 6
            ).alias("fertility"),
        )
    )


# ---------------------------------------------------------------------------
# Inverted index + conjunctive (AND) keyword search.
# ---------------------------------------------------------------------------


@_register(
    "inverted_index_conjunctive",
    _TOKENS_CTE
    + """
    , tld AS (
        SELECT DISTINCT doc_id, unnest(tokens) AS token FROM tok
    ),
    postings AS (SELECT doc_id, token FROM tld WHERE token <> ''),
    dfreq AS (SELECT token, COUNT(*) AS n_df FROM postings GROUP BY token),
    top3 AS (
        SELECT token, n_df FROM (
            SELECT *, ROW_NUMBER() OVER (ORDER BY n_df DESC, token) AS r
            FROM dfreq
        ) WHERE r <= 3
    ),
    pairs AS (
        SELECT x.token AS t1, x.n_df AS df1, y.token AS t2, y.n_df AS df2
        FROM top3 x JOIN top3 y ON x.token < y.token
    )
    SELECT p.t1, p.t2,
           CAST(p.df1 AS BIGINT) AS df1, CAST(p.df2 AS BIGINT) AS df2,
           CAST(COUNT(*) AS BIGINT) AS n_both,
           CAST(MIN(a.doc_id) AS BIGINT) AS first_doc
    FROM pairs p
    JOIN postings a ON a.token = p.t1
    JOIN postings b ON b.token = p.t2 AND b.doc_id = a.doc_id
    GROUP BY p.t1, p.t2, p.df1, p.df2
    """,
)
def inverted_index_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive (AND) keyword search over an inverted index: build
    the postings relation (distinct doc_id per token), take the 3
    highest-document-frequency terms, and for every term pair report
    how many documents contain BOTH plus the first matching doc — the
    search-engine primitive where a multi-term query intersects
    posting lists.

    Scale shape: the postings build is the explode+distinct the TF-IDF
    family already pays (one shuffle on (doc_id, token)); query terms
    arrive as a BROADCAST pair relation, so each posting-list fetch is
    a broadcast-filtered scan, and the intersection itself is one
    doc_id-keyed equi-join BETWEEN THE TWO FILTERED POSTING LISTS —
    cost is bounded by the posting lists of the queried terms, never
    the corpus (the "drive the join from the shortest posting list"
    rule falls out of the filter).  The top-3 selection is an
    orderBy+limit over the vocabulary-sized dfreq aggregate —
    TakeOrderedAndProject (per-partition heaps + one k-row merge, the
    top_revenue_orders shape), no single-partition window anywhere.
    Stopword-dense terms make hot posting lists; the cap story is the
    LSH hot-bucket one, unchanged."""
    d = load(spark, sf_dir, "documents")
    postings = (
        d.select("doc_id", F.explode(TX.tokens("text")).alias("token"))
        .filter(F.col("token") != "")
        .distinct()
    )
    dfreq = postings.groupBy("token").agg(F.count(F.lit(1)).alias("n_df"))
    top3 = dfreq.orderBy(F.desc("n_df"), "token").limit(3)
    # pair enumeration stays inside ONE k-row array (k=3): a t1 < t2
    # relational self-join is a non-equi predicate — BroadcastNestedLoop
    # — which the plan guard rightly refuses repo-wide, so the k x k
    # cross happens as array HOFs on the collected top-k instead (set
    # semantics: p.t1 < p.t2 makes the result independent of
    # collect_list's order)
    arr = top3.agg(
        F.collect_list(F.struct(F.col("token"), F.col("n_df"))).alias("ts")
    )
    pairs = arr.select(
        F.explode(
            F.expr(
                "flatten(transform(ts, x -> "
                "filter(transform(ts, y -> struct("
                "x.token as t1, x.n_df as df1, y.token as t2, y.n_df as df2)), "
                "p -> p.t1 < p.t2)))"
            )
        ).alias("pr")
    ).select("pr.t1", "pr.df1", "pr.t2", "pr.df2")
    a = postings.select(F.col("token").alias("t1"), F.col("doc_id"))
    b = postings.select(F.col("token").alias("t2"), F.col("doc_id"))
    return (
        F.broadcast(pairs)
        .join(a, "t1")
        .join(b, ["t2", "doc_id"])
        .groupBy("t1", "t2", "df1", "df2")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_both"),
            F.min("doc_id").cast("long").alias("first_doc"),
        )
        .select(
            "t1",
            "t2",
            F.col("df1").cast("long").alias("df1"),
            F.col("df2").cast("long").alias("df2"),
            "n_both",
            "first_doc",
        )
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints — MOSS-style rolling-hash document signatures.
# ---------------------------------------------------------------------------


@_register(
    "winnowing_fingerprints",
    _TOKENS_CTE
    + """
    , posed AS (
        SELECT doc_id, i AS pos, array_to_string(tokens[i:i+4], ' ') AS shingle
        FROM tok, LATERAL (
            SELECT unnest(generate_series(1, greatest(len(tokens) - 4, 0))) AS i
        )
    ),
    hashed AS (
        SELECT doc_id, pos,
               CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS h,
               COUNT(*) OVER (PARTITION BY doc_id) AS n
        FROM posed
    ),
    wmin AS (
        SELECT doc_id, pos, n,
               MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
        FROM hashed
    )
    SELECT DISTINCT doc_id, fp FROM wmin
    WHERE pos <= greatest(n - 3, 1)
    """,
)
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken
    2003 — the MOSS algorithm, public): hash every positioned 5-token
    shingle to a 60-bit md5 lane, slide a window of w=4 consecutive
    hashes, keep each window's MINIMUM, and emit the distinct selected
    values per document.  Winnowing's guarantee — every shared run of
    at least w+k-1 tokens contributes at least one IDENTICAL selected
    fingerprint in both documents — makes the signature joinable for
    plagiarism/near-dup detection at a density of ~2/(w+1) of all
    shingles, the third fingerprint tier between the whole-document
    md5 (`text_fingerprints`) and full positioned shingles
    (`benchmark_span_decontamination`).

    Selection keeps VALUES not positions, so the rightmost-vs-leftmost
    min tie rule that makes winnowing implementations drift does not
    arise — the distinct min-value set is tie-rule-independent, and the
    engines cannot disagree on it.  Documents with fewer than w full
    windows winnow to a single fingerprint (the global min — the
    standard short-document rule), via the same partial-window MIN both
    sides: valid window starts are pos <= greatest(n - w + 1, 1).

    Scale shape: one explode at the scan (the positioned-shingle shape
    shared with decontamination), then ONE shuffle on doc_id for the
    per-document ordered window; the window frame is w rows, state is
    O(w), and the output contracts ~2/(w+1)-fold before the distinct.
    Nothing is corpus-global; per-doc cost is linear in document
    length."""
    d = load(spark, sf_dir, "documents")
    posed = positioned_shingles(d)
    h = F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long")
    wdoc = Window.partitionBy("doc_id")
    wmin = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
    )
    hashed = posed.select(
        "doc_id",
        "pos",
        h.alias("h"),
        F.count(F.lit(1)).over(wdoc).alias("n"),
    )
    return (
        hashed.select(
            "doc_id",
            "pos",
            "n",
            F.min("h").over(wmin).alias("fp"),
        )
        .filter(F.col("pos") <= F.greatest(F.col("n") - 3, F.lit(1)))
        .select("doc_id", "fp")
        .distinct()
    )


@_register(
    "winnowing_overlap_pairs",
    _TOKENS_CTE
    + """
    , posed AS (
        SELECT doc_id, i AS pos, array_to_string(tokens[i:i+4], ' ') AS shingle
        FROM tok, LATERAL (
            SELECT unnest(generate_series(1, greatest(len(tokens) - 4, 0))) AS i
        )
    ),
    hashed AS (
        SELECT doc_id, pos,
               CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS h,
               COUNT(*) OVER (PARTITION BY doc_id) AS n
        FROM posed
    ),
    wmin AS (
        SELECT doc_id, pos, n,
               MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
        FROM hashed
    ),
    fps AS (
        SELECT DISTINCT doc_id, fp FROM wmin
        WHERE pos <= greatest(n - 3, 1)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(COUNT(*) AS BIGINT) AS shared_fps
    FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= 2
    """,
)
def winnowing_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate near-dup pairs from winnowing signatures: documents
    sharing >= 2 selected fingerprints, with the shared count — the
    detection join of the MOSS pipeline, and the fourth candidate
    generator next to MinHash-LSH banding, SimHash banding and prefix
    filtering.  By the winnowing guarantee, any pair sharing a token
    run of >= 2(w + k - 1) tokens across two windows is caught; the
    >= 2 threshold discards single-hash coincidences.

    Scale shape: the join key is the FINGERPRINT — signatures shuffle
    (the contracted ~2/(w+1) relation), never documents, exactly the
    LSH-band join shape.  A boilerplate fingerprint shared by a huge
    doc set is the hot-bucket hazard; the cap from
    ``operators/minhash.candidate_pairs`` (window count per bucket)
    bolts onto the ``fps`` relation unchanged when a corpus needs it."""
    d = load(spark, sf_dir, "documents")
    fps = winnowing_fingerprints(spark, sf_dir)
    a = fps.alias("a")
    b = fps.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
        .filter(F.col("shared_fps") >= 2)
    )


# ---------------------------------------------------------------------------
# Mutual information between language and source — corpus-composition
# dependence, same contingency-cell shape as chi_square_status_priority.
# ---------------------------------------------------------------------------


@_register(
    "mutual_information_lang_source",
    """
    WITH cells AS (
        SELECT lang, source, COUNT(*) AS c
        FROM documents GROUP BY lang, source
    ),
    tots AS (
        SELECT lang, source, c,
               SUM(c) OVER (PARTITION BY lang) AS n_l,
               SUM(c) OVER (PARTITION BY source) AS n_s,
               SUM(c) OVER () AS grand
        FROM cells
    )
    SELECT round(SUM((CAST(c AS DOUBLE) / grand)
                     * ln(CAST(c AS DOUBLE) * grand
                          / (CAST(n_l AS DOUBLE) * n_s))), 6) AS mi_nats,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(any_value(grand) AS BIGINT) AS n_docs
    FROM tots
    """,
)
def mutual_information_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (nats) between a document's language and its
    source — the corpus-composition dependence diagnostic: MI 0 means
    every source has the same language mix, higher values mean sources
    specialize (the thing a mixture rebalancer needs to know before
    reweighting by either axis alone).  Same shape as
    :func:`chi_square_status_priority`: ONE grouped count builds the
    contingency cells (|langs| x |sources| rows), windowed marginals
    over the CELLS supply n_l / n_s / N with no rescan, and the
    cell-count-sized sum of exact-integer-ratio terms rounds to 6dp at
    the edge.  The windows partition a dim-sized post-aggregation frame
    (the documented exemption)."""
    d = load(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("c"))
    tots = (
        cells.withColumn("n_l", F.sum("c").over(Window.partitionBy("lang")))
        .withColumn("n_s", F.sum("c").over(Window.partitionBy("source")))
        .withColumn("grand", F.sum("c").over(Window.partitionBy()))
    )
    term = (F.col("c").cast("double") / F.col("grand")) * F.log(
        F.col("c").cast("double")
        * F.col("grand")
        / (F.col("n_l").cast("double") * F.col("n_s"))
    )
    return tots.agg(
        F.round(F.sum(term), 6).alias("mi_nats"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.first("grand").cast("long").alias("n_docs"),
    )


@_register(
    "containment_pairs",
    _SHINGLE_CTE
    + """
, cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
    SELECT c.id_a, c.id_b, count(*) AS n_common
    FROM cand c
    JOIN sh a ON a.doc_id = c.id_a
    JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
    GROUP BY c.id_a, c.id_b
)
SELECT cm.id_a, cm.id_b,
       CAST(cm.n_common AS DOUBLE) / least(na.n_sh, nb.n_sh) AS containment
FROM common cm
JOIN sizes na ON na.doc_id = cm.id_a
JOIN sizes nb ON nb.doc_id = cm.id_b
WHERE CAST(cm.n_common AS DOUBLE) / least(na.n_sh, nb.n_sh) >= 0.5
    """,
)
def containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-containment near-dup pairs: |A n B| / min(|A|, |B|) >= 0.5
    over distinct 5-shingle sets — the ASYMMETRIC companion of
    `ngram_jaccard_pairs`.  Jaccard misses a short document embedded
    verbatim in a long one (the union term swamps the intersection);
    containment is exactly the quote/excerpt/boilerplate-inclusion
    detector (Broder 1997's resemblance-vs-containment distinction,
    public).

    Same machinery as the Jaccard tier — inverted-index candidates,
    per-doc collect_set, codegen'd array_intersect on candidate rows
    only — with the division's denominator swapped to the smaller set
    size; the single IEEE division of exact integers needs no edge
    rounding (the `_JACCARD_TAIL` convention)."""
    d = load(spark, sf_dir, "documents")
    sh = shingles(d)
    pairs = shared_shingle_pairs(sh)
    sets = sh.groupBy("doc_id").agg(F.collect_set("shingle").alias("__shs"))
    a = sets.select(F.col("doc_id").alias("id_a"), F.col("__shs").alias("__sa"))
    b = sets.select(F.col("doc_id").alias("id_b"), F.col("__shs").alias("__sb"))
    n_common = F.size(F.array_intersect("__sa", "__sb"))
    containment = n_common.cast("double") / F.least(
        F.size("__sa"), F.size("__sb")
    )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", containment.alias("containment"))
        .filter(F.col("containment") >= 0.5)
    )


@_register(
    "diversified_topk_docs",
    """
    WITH ranked AS (
        SELECT doc_id, source, n_chars,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id) AS src_rank
        FROM documents
    ),
    capped AS (SELECT * FROM ranked WHERE src_rank <= 2)
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(src_rank AS BIGINT) AS src_rank, CAST(rnk AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS rnk
          FROM capped)
    WHERE rnk <= 10
    """,
)
def diversified_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversified global top-10 documents by length with AT MOST 2 PER
    SOURCE — the search/recsys result-diversification pattern (MMR's
    hard-quota cousin): a plain top-k would let one prolific source
    fill the whole page.

    Two stages, each scale-shaped: the per-source quota is a
    source-partitioned row_number (one shuffle, arbitrary source
    count), which contracts the corpus to <= 2 x n_sources rows; the
    global ordering then runs on THAT dim-bounded frame (the documented
    single-window exemption — bounded by source cardinality, never
    corpus size).  Both ranks tie-break on doc_id so engines cannot
    disagree on equal lengths."""
    d = load(spark, sf_dir, "documents")
    w_src = Window.partitionBy("source").orderBy(F.desc("n_chars"), "doc_id")
    capped = (
        d.select("doc_id", "source", "n_chars")
        .withColumn("src_rank", F.row_number().over(w_src))
        .filter(F.col("src_rank") <= 2)
    )
    w_glob = Window.orderBy(F.desc("n_chars"), "doc_id")
    return (
        capped.withColumn("rank", F.row_number().over(w_glob))
        .filter(F.col("rank") <= 10)
        .select(
            "doc_id",
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.col("src_rank").cast("long").alias("src_rank"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# Greedy max-coverage document selection — the submodular data-curation
# primitive: pick k documents that together cover the most vocabulary.
# ---------------------------------------------------------------------------

_COVERAGE_STEPS = 5


def _coverage_steps_sql(k: int) -> str:
    """Unrolled greedy steps p1..p{k} (the k-core recursion-free CTE
    convention): r{i} is the (doc, token) relation with already-picked
    docs and already-covered tokens removed; p{i} is that round's
    argmax pick with deterministic (gain DESC, doc_id ASC) tie-break."""
    ctes = ["r1 AS (SELECT doc_id, token FROM u)"]
    for i in range(1, k + 1):
        ctes.append(
            f"p{i} AS (SELECT doc_id, COUNT(*) AS gain FROM r{i}"
            f" GROUP BY doc_id ORDER BY gain DESC, doc_id LIMIT 1)"
        )
        if i < k:
            ctes.append(
                f"r{i + 1} AS (SELECT r.doc_id, r.token FROM r{i} r"
                f" WHERE r.doc_id NOT IN (SELECT doc_id FROM p{i})"
                f" AND r.token NOT IN (SELECT u2.token FROM u u2"
                f" JOIN p{i} pp ON u2.doc_id = pp.doc_id))"
            )
    picks = "\n        UNION ALL ".join(
        f"SELECT {i} AS step, doc_id, gain FROM p{i}" for i in range(1, k + 1)
    )
    return ",\n    ".join(ctes) + f",\n    picks AS (\n        {picks}\n    )"


@_register(
    "greedy_coverage_selection",
    _SHINGLE_CTE
    + f"""
    , u AS (SELECT doc_id, shingle AS token FROM sh),
    {_coverage_steps_sql(_COVERAGE_STEPS)}
    SELECT CAST(step AS BIGINT) AS step, doc_id,
           CAST(gain AS BIGINT) AS gain,
           CAST(SUM(gain) OVER (ORDER BY step) AS BIGINT) AS covered_tokens
    FROM picks
    """,
)
def greedy_coverage_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy max-coverage selection of {k} documents: each step picks
    the document covering the most NOT-YET-COVERED distinct 5-token
    shingles (ties to the lowest doc_id), reporting the step, the
    pick, its marginal gain and the cumulative covered-shingle count.
    This is the classic (1 - 1/e)-approximate submodular maximization
    — the "smallest representative subset" primitive behind corpus
    summarization, eval split seeding, and content-coverage curation.
    (Shingles, not tokens: the synthetic corpus has a ~31-word
    vocabulary, which one document covers entirely — n-gram coverage
    is the non-degenerate objective, and the production-realistic one.)

    Iterative driver loop with the repo's k-core/PageRank lineage
    convention: every per-round frame is ``localCheckpoint(eager=True)``
    so the plan tree stays CONSTANT-SIZE across steps.  (The first cut
    only ``persist()``-ed the rounds; each round's plan then embedded
    every earlier round's, and at sf0.1 the compounded tree OOM'd the
    JVM inside AQE's plan-string build — plan growth, not data growth,
    was the killer.)  Each step's argmax is a 1-row
    ``orderBy(gain desc, doc_id).limit(1)`` frame used directly in the
    next step's anti-joins (dropping the picked doc and its tokens).
    The marginal gain IS the newly-covered count, so the cumulative
    coverage is a running sum over the k-row picks frame
    (unpartitioned window over k rows — the documented dim-sized
    exemption).

    Scale shape: the (doc, shingle) universe is the shared
    ``shingles()`` relation (per-doc distinct, built at the scan — the
    whole dedup family's input), checkpointed once and probed by every
    step.  Each step is one shuffled aggregate over the REMAINING
    relation (monotonically shrinking, k-core-style) plus two
    anti-joins against 1-row / one-doc-sized broadcast frames."""
    d = load(spark, sf_dir, "documents")
    u = (
        shingles(d)
        .withColumnRenamed("shingle", "token")
        .localCheckpoint(eager=True)
    )
    remaining = u
    picks = []
    for step in range(1, _COVERAGE_STEPS + 1):
        pick = (
            remaining.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("gain"))
            .orderBy(F.col("gain").desc(), "doc_id")
            .limit(1)
            .withColumn("step", F.lit(step).cast("long"))
            .localCheckpoint(eager=True)
        )
        picks.append(pick)
        if step < _COVERAGE_STEPS:
            pick_tokens = u.join(
                pick.select("doc_id"), "doc_id", "semi"
            ).select("token")
            remaining = (
                remaining.join(pick.select("doc_id"), "doc_id", "left_anti")
                .join(F.broadcast(pick_tokens), "token", "left_anti")
                .localCheckpoint(eager=True)
            )
    allp = picks[0]
    for p in picks[1:]:
        allp = allp.unionAll(p)
    w = Window.orderBy("step").rowsBetween(Window.unboundedPreceding, 0)
    return allp.select(
        "step",
        "doc_id",
        F.col("gain").cast("long").alias("gain"),
        F.sum("gain").over(w).cast("long").alias("covered_tokens"),
    )


greedy_coverage_selection.__doc__ = greedy_coverage_selection.__doc__.format(
    k=_COVERAGE_STEPS
)


# ---------------------------------------------------------------------------
# Heaps' law vocabulary growth — distinct-type count vs cumulative token
# count along the corpus, the curve a tokenizer-budget planner reads to
# decide whether more data still buys new vocabulary.
# ---------------------------------------------------------------------------


@_register(
    "heaps_law_vocab_growth",
    _TOKENS_CTE
    + """
    , docs AS (
        SELECT d.source, d.doc_id, len(t.tokens) AS n_tokens
        FROM documents d JOIN tok t ON t.doc_id = d.doc_id
    ),
    rng AS (
        SELECT source, MIN(doc_id) AS mn, MAX(doc_id) AS mx
        FROM docs GROUP BY source
    ),
    db AS (
        SELECT docs.source, docs.doc_id, docs.n_tokens,
               CAST(FLOOR((docs.doc_id - rng.mn) * 10.0
                          / (rng.mx - rng.mn + 1)) AS BIGINT) + 1 AS bucket
        FROM docs JOIN rng ON rng.source = docs.source
    ),
    spine AS (
        SELECT source, bucket,
               COUNT(*) AS n_docs, SUM(n_tokens) AS bucket_tokens
        FROM db GROUP BY source, bucket
    ),
    typ AS (
        SELECT db.source, u.token, MIN(db.bucket) AS first_bucket
        FROM db
        JOIN (SELECT doc_id, unnest(tokens) AS token FROM tok) u
          ON u.doc_id = db.doc_id
        GROUP BY db.source, u.token
    ),
    newv AS (
        SELECT source, first_bucket AS bucket, COUNT(*) AS new_types
        FROM typ GROUP BY source, first_bucket
    )
    SELECT s.source, s.bucket,
           CAST(s.n_docs AS BIGINT) AS n_docs,
           CAST(SUM(s.bucket_tokens) OVER w AS BIGINT) AS cum_tokens,
           CAST(SUM(COALESCE(n.new_types, 0)) OVER w AS BIGINT) AS cum_vocab
    FROM spine s LEFT JOIN newv n
      ON n.source = s.source AND n.bucket = s.bucket
    WINDOW w AS (PARTITION BY s.source ORDER BY s.bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def heaps_law_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps' law curve per source: cumulative token count vs cumulative
    distinct-type (vocabulary) count at ten equal doc-id checkpoints —
    the "does more data still buy new vocabulary?" diagnostic behind
    corpus-size planning and dedup ROI estimates.

    The checkpoint buckets derive from the doc_id RANGE (an explicit
    floor formula spelled identically on both sides — no engine
    width_bucket semantics in play), NOT from a row-ordering window, so
    bucket assignment is a scan-side scalar expression: zero shuffles
    until the two grouped aggregates.  A type's first appearance is
    ``min(bucket) per (source, token)`` (one shuffle on the exploded
    token relation — the vocabulary contraction), new-type counts then
    join the doc-stats spine so buckets whose tokens are all old still
    appear.  The cumulative window runs on the <= 10 x n_sources spine
    (the documented dim-sized exemption).  Empty docs contribute their
    single empty-string token identically in both engines (the
    hostile-whitespace contract)."""
    d = load(spark, sf_dir, "documents")
    docs = d.select(
        "source", "doc_id", TX.token_count(F.col("text")).alias("n_tokens")
    )
    rng = docs.groupBy("source").agg(
        F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx")
    )
    bucket = (
        F.floor(
            (F.col("doc_id") - F.col("mn"))
            * F.lit(10.0)
            / (F.col("mx") - F.col("mn") + 1)
        ).cast("long")
        + 1
    )
    db = docs.join(F.broadcast(rng), "source").select(
        "source", "doc_id", "n_tokens", bucket.alias("bucket")
    )
    spine = db.groupBy("source", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bucket_tokens"),
    )
    toks = d.select(
        "doc_id", F.explode(TX.tokens(F.col("text"))).alias("token")
    )
    typ = (
        db.select("source", "doc_id", "bucket")
        .join(toks, "doc_id")
        .groupBy("source", "token")
        .agg(F.min("bucket").alias("bucket"))
    )
    newv = typ.groupBy("source", "bucket").agg(
        F.count(F.lit(1)).alias("new_types")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(newv, ["source", "bucket"], "left")
        .select(
            "source",
            "bucket",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.sum("bucket_tokens").over(w).cast("long").alias("cum_tokens"),
            F.sum(F.coalesce(F.col("new_types"), F.lit(0)))
            .over(w)
            .cast("long")
            .alias("cum_vocab"),
        )
    )


# ---------------------------------------------------------------------------
# Zipf rank-frequency checkpoints — the distribution-shape read on the
# shingle vocabulary, reported as exact integers (no cross-engine float
# log fits; the r8 tokenizer lesson applied to math.log).
# ---------------------------------------------------------------------------

_ZIPF_RANKS = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512)


@_register(
    "zipf_rank_frequency_curve",
    _SHINGLE_CTE
    + f"""
    , freq AS (
        SELECT shingle, COUNT(*) AS doc_freq
        FROM sh GROUP BY shingle
    ),
    top AS (
        SELECT shingle, doc_freq
        FROM freq ORDER BY doc_freq DESC, shingle LIMIT 512
    ),
    ranked AS (
        SELECT ROW_NUMBER() OVER (ORDER BY doc_freq DESC, shingle) AS rank,
               shingle, doc_freq
        FROM top
    )
    SELECT CAST(rank AS BIGINT) AS rank, shingle,
           CAST(doc_freq AS BIGINT) AS doc_freq,
           CAST(rank * doc_freq AS BIGINT) AS freq_times_rank
    FROM ranked
    WHERE rank IN ({', '.join(str(r) for r in _ZIPF_RANKS)})
    """,
)
def zipf_rank_frequency_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency checkpoints of the 5-token shingle
    vocabulary: document frequency at ranks 1, 2, 4, ... 512, with the
    ``rank x frequency`` product — constant under an ideal Zipf law, so
    the checkpoint row set IS the distribution-shape read (a boilerplate
    -heavy corpus shows a flat head; an over-deduped one decays fast).

    Exact integers only: no log-log regression, because ``log`` is
    libm-dependent (Java Math.log10 is 1-ulp, not correctly rounded)
    and cross-engine float fits are exactly the portability trap the
    round-8 whitespace contract exists to prevent.

    Scale shape: frequencies are one shuffled count over the shared
    per-doc-distinct shingle relation; the head is a
    TakeOrderedAndProject top-512 with a unique (freq DESC, shingle)
    tie-break, and the rank window runs on those 512 rows only (the
    dim-sized exemption)."""
    d = load(spark, sf_dir, "documents")
    freq = (
        shingles(d)
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
    )
    top = freq.orderBy(F.col("doc_freq").desc(), "shingle").limit(512)
    ranked = top.select(
        F.row_number()
        .over(Window.orderBy(F.col("doc_freq").desc(), "shingle"))
        .alias("rank"),
        "shingle",
        "doc_freq",
    )
    return ranked.filter(F.col("rank").isin(*_ZIPF_RANKS)).select(
        F.col("rank").cast("long").alias("rank"),
        "shingle",
        F.col("doc_freq").cast("long").alias("doc_freq"),
        (F.col("rank") * F.col("doc_freq"))
        .cast("long")
        .alias("freq_times_rank"),
    )


# ---------------------------------------------------------------------------
# l-diversity audit — the sensitive-attribute companion of
# k_anonymity_audit: class sizes alone don't stop attribute disclosure.
# ---------------------------------------------------------------------------

_ACCTBAL_BAND_SQL = """CASE WHEN c_acctbal < 0 THEN 'negative'
                 WHEN c_acctbal < 3000 THEN 'low'
                 WHEN c_acctbal < 7000 THEN 'mid'
                 ELSE 'high' END"""


@_register(
    "l_diversity_audit",
    f"""
    WITH eq AS (
        SELECT c_nationkey, c_mktsegment,
               COUNT(*) AS class_size,
               COUNT(DISTINCT {_ACCTBAL_BAND_SQL}) AS l_distinct
        FROM customer
        GROUP BY c_nationkey, c_mktsegment
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(MIN(l_distinct) AS BIGINT) AS l_diversity,
           CAST(SUM(CASE WHEN l_distinct < 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS classes_below_2,
           CAST(SUM(CASE WHEN l_distinct < 2 THEN class_size ELSE 0 END)
                AS BIGINT) AS rows_at_risk
    FROM eq
    """,
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity of the (nation, market-segment) quasi-identifier over
    the account-balance band as the sensitive attribute: the dataset's
    l is the class with the FEWEST distinct sensitive values — a class
    can be k-anonymous (large) yet still disclose the attribute if
    every member shares one band.  The governance gate reads this
    NEXT TO ``k_anonymity_audit`` before releasing any extract.

    One grouped count-distinct (band cardinality is 4, so the distinct
    state per group is bounded) plus a 1-row summary — the same
    two-level contraction as the k-anonymity audit, exact integers
    throughout."""
    c = load(spark, sf_dir, "customer")
    band = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
    )
    eq = c.select("c_nationkey", "c_mktsegment", band.alias("band")).groupBy(
        "c_nationkey", "c_mktsegment"
    ).agg(
        F.count(F.lit(1)).alias("class_size"),
        F.countDistinct("band").alias("l_distinct"),
    )
    return eq.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("l_distinct").cast("long").alias("l_diversity"),
        F.sum(F.when(F.col("l_distinct") < 2, 1).otherwise(0))
        .cast("long")
        .alias("classes_below_2"),
        F.sum(F.when(F.col("l_distinct") < 2, F.col("class_size")).otherwise(0))
        .cast("long")
        .alias("rows_at_risk"),
    )


# ---------------------------------------------------------------------------
# Encoding-quality audit — mojibake and control-character screening, the
# "was this corpus decoded correctly?" gate that runs before any text op.
# ---------------------------------------------------------------------------

# Explicit textual escapes, interpreted identically by Java regex and
# RE2 (the WS_REGEX portability contract applied to control characters):
# C0 controls minus the whitespace class members (\t\n\x0B\f\r), plus DEL.
_CTRL_CLASS = r"[\x00-\x08\x0E-\x1F\x7F]"
_REPLACEMENT_CHAR = r"\x{FFFD}"
_INVISIBLE_CLASS = r"[\x{00A0}\x{200B}\x{200C}\x{200D}\x{FEFF}]"


@_register(
    "encoding_quality_audit",
    f"""
    WITH scored AS (
        SELECT source,
               length(text) - length(regexp_replace(text, '{_CTRL_CLASS}', '', 'g'))
                 AS n_ctrl,
               length(text) - length(regexp_replace(text, '{_REPLACEMENT_CHAR}', '', 'g'))
                 AS n_repl,
               length(text) - length(regexp_replace(text, '{_INVISIBLE_CLASS}', '', 'g'))
                 AS n_invis
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_ctrl > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_with_control,
           CAST(SUM(n_ctrl) AS BIGINT) AS total_control_chars,
           CAST(SUM(CASE WHEN n_repl > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_with_replacement,
           CAST(SUM(CASE WHEN n_invis > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_with_invisibles
    FROM scored GROUP BY source
    """,
)
def encoding_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source encoding-quality screen: documents carrying C0
    control characters (decoder artifacts; the whitespace class members
    are excluded — they're legitimate), U+FFFD replacement characters
    (the definitive mojibake tell: some byte sequence failed to
    decode), and invisible formatting characters (NBSP, zero-width
    joiners, BOM) that silently corrupt tokenization and dedup
    fingerprints downstream.

    Counting is the replace-diff identity (length minus length after
    class removal) over EXPLICIT textual escape classes — interpreted
    identically by Java regex and RE2, the same portability contract
    as WS_REGEX.  One scan, one per-source contraction; all integers."""
    d = load(spark, sf_dir, "documents")
    def _count(cls: str) -> F.Column:
        return F.length("text") - F.length(
            F.regexp_replace(F.col("text"), cls, "")
        )
    scored = d.select(
        "source",
        _count(_CTRL_CLASS).alias("n_ctrl"),
        _count(_REPLACEMENT_CHAR).alias("n_repl"),
        _count(_INVISIBLE_CLASS).alias("n_invis"),
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("n_ctrl") > 0, 1).otherwise(0))
        .cast("long")
        .alias("docs_with_control"),
        F.sum("n_ctrl").cast("long").alias("total_control_chars"),
        F.sum(F.when(F.col("n_repl") > 0, 1).otherwise(0))
        .cast("long")
        .alias("docs_with_replacement"),
        F.sum(F.when(F.col("n_invis") > 0, 1).otherwise(0))
        .cast("long")
        .alias("docs_with_invisibles"),
    )


# ---------------------------------------------------------------------------
# Vocabulary drift between two sources — PSI over the shared top-K
# token vocabulary, the "did this source change register?" monitor.
# ---------------------------------------------------------------------------

_VOCAB_PSI_K = 20


@_register(
    "vocab_psi_between_sources",
    _TOKENS_CTE
    + f"""
    , tk AS (
        SELECT t.doc_id, d.source, u.token
        FROM tok t
        JOIN documents d ON d.doc_id = t.doc_id
        JOIN (SELECT doc_id, unnest(tokens) AS token FROM tok) u
          ON u.doc_id = t.doc_id
        WHERE d.source IN ('src0', 'src1')
    ),
    topv AS (
        SELECT token FROM (
            SELECT token, COUNT(*) AS c FROM tk GROUP BY token
            ORDER BY c DESC, token LIMIT {_VOCAB_PSI_K}
        )
    ),
    bucketed AS (
        SELECT CASE WHEN v.token IS NOT NULL THEN tk.token
                    ELSE '__other__' END AS bucket,
               tk.source
        FROM tk LEFT JOIN topv v ON v.token = tk.token
    ),
    counts AS (
        SELECT bucket,
               SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS n1,
               SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS n2
        FROM bucketed GROUP BY bucket
    ),
    probs AS (
        SELECT bucket,
               (n1 + 0.5) / (SUM(n1) OVER () + 0.5 * COUNT(*) OVER ()) AS p,
               (n2 + 0.5) / (SUM(n2) OVER () + 0.5 * COUNT(*) OVER ()) AS q
        FROM counts
    )
    SELECT round(SUM((p - q) * ln(p / q)), 6) + 0 AS psi,
           CAST(COUNT(*) AS BIGINT) AS n_buckets
    FROM probs
    """,
)
def vocab_psi_between_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability index of src0's token distribution against
    src1's, over the combined top-{k} vocabulary plus an ``__other__``
    tail bucket (0.5 smoothing) — ``psi_price_drift``'s vocabulary
    twin, the register/topic drift monitor a mixture owner runs between
    snapshots of the same source.

    Same numeric conventions as the price PSI: the ln() terms run over
    a BOUNDED bucket count ({k}+1) with O(1) magnitudes, where 6dp edge
    rounding is a real cross-engine contract; counts and the top-K
    selection (count DESC, token tiebreak) are exact integers.  Scale
    shape: one exploded-token count per source (shuffle on token), a
    TakeOrdered top-K, and a broadcast membership join — corpus-sized
    data never crosses unaggregated."""
    d = load(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1")
    )
    tk = d.select(
        "source", F.explode(TX.tokens(F.col("text"))).alias("token")
    )
    topv = (
        tk.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "token")
        .limit(_VOCAB_PSI_K)
        .select("token", F.lit(1).alias("__in_top"))
    )
    bucketed = tk.join(F.broadcast(topv), "token", "left").select(
        F.when(F.col("__in_top").isNotNull(), F.col("token"))
        .otherwise(F.lit("__other__"))
        .alias("bucket"),
        "source",
    )
    counts = bucketed.groupBy("bucket").agg(
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("source") == "src1", 1).otherwise(0)).alias("n2"),
    )
    tot = counts.agg(
        F.sum("n1").alias("t1"),
        F.sum("n2").alias("t2"),
        F.count(F.lit(1)).alias("nb"),
    )
    probs = counts.crossJoin(F.broadcast(tot)).select(
        (
            (F.col("n1") + 0.5) / (F.col("t1") + 0.5 * F.col("nb"))
        ).alias("p"),
        (
            (F.col("n2") + 0.5) / (F.col("t2") + 0.5 * F.col("nb"))
        ).alias("q"),
    )
    return probs.agg(
        (
            F.round(
                F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))),
                6,
            )
            + 0
        ).alias("psi"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
    )


vocab_psi_between_sources.__doc__ = vocab_psi_between_sources.__doc__.format(
    k=_VOCAB_PSI_K
)


# ---------------------------------------------------------------------------
# Near-dup cluster source purity — is duplication syndication (cross-
# source) or reposting (within-source)?  The provenance read on clusters.
# ---------------------------------------------------------------------------


@_register(
    "near_dup_cluster_source_purity",
    _MINHASH_CTE.replace("WITH tok", "WITH RECURSIVE tok", 1)
    + _VERIFIED_PAIRS_TAIL
    + """
    , und AS (SELECT id_a AS a, id_b AS b FROM verified
              UNION SELECT id_b, id_a FROM verified),
    walk AS (
        SELECT a, b FROM und
        UNION
        SELECT w.a, e.b FROM walk w JOIN und e ON w.b = e.a
    ),
    comp AS (
        SELECT a AS doc_id, LEAST(a, MIN(b)) AS component
        FROM walk GROUP BY a
    ),
    labeled AS (
        SELECT c.component, d.source
        FROM comp c JOIN documents d ON d.doc_id = c.doc_id
    ),
    per_source AS (
        SELECT component, source, COUNT(*) AS n
        FROM labeled GROUP BY component, source
    )
    SELECT component,
           CAST(SUM(n) AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_sources,
           round(CAST(MAX(n) AS DOUBLE) / SUM(n), 6) AS purity
    FROM per_source GROUP BY component
    """,
)
def near_dup_cluster_source_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source purity of each near-duplicate cluster: the fraction of
    members contributed by the cluster's dominant source — purity 1.0
    means within-source reposting (dedup freely), purity near 1/k
    means cross-source syndication (dedup may collapse provenance a
    mixture weighting still needs).  The provenance diagnostic next to
    ``near_dup_cluster_sizes`` and ``dedup_rate_by_source``.

    Same verified-pair + min-label component machinery as
    ``near_dup_components`` (iterative operator engine-side, recursive
    CTE oracle-side), then one doc->source join and two dim-sized
    contractions; the purity ratio is integers until the single edge
    division (bounded in (0, 1] — rounding is a real contract)."""
    from ..operators.graph import connected_components

    d = load(spark, sf_dir, "documents")
    sh = shingles(d)
    verified = (
        jaccard(candidate_pairs(lsh_bands(minhash_signatures(sh))), sh)
        .filter(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b")
    )
    comp = connected_components(verified).select(
        F.col("id").alias("doc_id"), "component"
    )
    labeled = comp.join(d.select("doc_id", "source"), "doc_id")
    per_source = labeled.groupBy("component", "source").agg(
        F.count(F.lit(1)).alias("n")
    )
    return per_source.groupBy("component").agg(
        F.sum("n").cast("long").alias("cluster_size"),
        F.count(F.lit(1)).cast("long").alias("n_sources"),
        F.round(F.max("n").cast("double") / F.sum("n"), 6).alias("purity"),
    )


# ---------------------------------------------------------------------------
# Corpus readability — Flesch reading ease from aggregate counts, the
# audience-level read a curation owner puts on the datasheet.
# ---------------------------------------------------------------------------


@_register(
    "flesch_readability_by_source",
    _TOKENS_CTE
    + """
    , feat AS (
        SELECT d.source,
               len(t.tokens) AS n_words,
               greatest(len(str_split(d.text, '. ')), 1) AS n_sentences,
               len(regexp_extract_all(lower(d.text), '[aeiouy]+')) AS n_vgroups
        FROM documents d JOIN tok t ON t.doc_id = d.doc_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_words,
           CASE WHEN SUM(n_words) > 0 AND SUM(n_sentences) > 0
                THEN round(206.835
                           - 1.015 * (CAST(SUM(n_words) AS DOUBLE)
                                      / SUM(n_sentences))
                           - 84.6 * (CAST(SUM(n_vgroups) AS DOUBLE)
                                     / SUM(n_words)), 4) + 0
                ELSE NULL END AS flesch_reading_ease
    FROM feat GROUP BY source
    """,
)
def flesch_readability_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level Flesch reading ease per source, with vowel-group
    runs as the syllable proxy (the standard dictionary-free
    heuristic): 206.835 − 1.015·(words/sentences) − 84.6·(syllables/
    words) — the audience-level readability line on a dataset
    datasheet, next to the quality and entropy panels.

    Computed from AGGREGATE integer counts (Σ words, Σ sentences,
    Σ vowel groups per source), NOT as a mean of per-doc scores — a
    mean of doubles accumulates in engine- and partition-dependent
    order, while the aggregate ratios divide exact integers once in a
    fixed expression (the ANOVA lesson).  Sentence count floors at 1
    (a doc with no '. ' separator is one sentence); syllable groups
    come from regexp_extract_all over an explicit lowercase vowel
    class, portable across Java regex and RE2.  One scan, one
    per-source contraction."""
    d = load(spark, sf_dir, "documents")
    feat = d.select(
        "source",
        TX.token_count(F.col("text")).alias("n_words"),
        F.greatest(
            F.size(F.split(F.col("text"), r"\. ", -1)), F.lit(1)
        ).alias("n_sentences"),
        F.size(
            F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")
        ).alias("n_vgroups"),
    )
    sw = F.sum("n_words")
    ss = F.sum("n_sentences")
    sv = F.sum("n_vgroups")
    return feat.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        sw.cast("long").alias("total_words"),
        F.when(
            (sw > 0) & (ss > 0),
            F.round(
                F.lit(206.835)
                - F.lit(1.015) * (sw.cast("double") / ss)
                - F.lit(84.6) * (sv.cast("double") / sw),
                4,
            )
            + 0,
        ).alias("flesch_reading_ease"),
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition: duplicate-trigram CHARACTER fraction.
# ---------------------------------------------------------------------------

# Filtered-token + positioned-word CTE used by the Gopher metrics: words
# are the non-empty whitespace tokens with their filtered-sequence
# adjacency (lead over pos == neighbors in the filtered array).
_WORDS_CTE = (
    _TOKENS_CTE
    + """
    , idx AS (
        SELECT doc_id, tokens,
               unnest(generate_series(1, len(tokens))) AS i
        FROM tok
    ),
    words AS (
        SELECT doc_id, tokens[i] AS w, i AS pos
        FROM idx WHERE tokens[i] <> ''
    )
"""
)


# Shared Spark-side expressions for the Gopher trigram metrics.  The
# trigram chain is expensive and interpreted (HOF), so consumers stage
# it as a real column (``__tg``) in its own projection — see the
# docstring of :func:`gopher_dup_trigram_chars`.
_TOKS_EXPR = "filter(split(trim(text), '[ \\\\t\\\\n\\\\x0B\\\\f\\\\r]+'), x -> x != '')"
# trigrams FROM the staged ``__toks`` column (never inline the token
# split here — slices/sizes would re-evaluate it five times per row)
_TG_EXPR = (
    "zip_with(zip_with(slice(__toks, 1, greatest(size(__toks) - 2, 0)), "
    "slice(__toks, 2, greatest(size(__toks) - 2, 0)), "
    "(a, b) -> concat(a, ' ', b)), "
    "slice(__toks, 3, greatest(size(__toks) - 2, 0)), "
    "(ab, c) -> concat(ab, ' ', c))"
)
_TG_DUP_CHARS = (
    "aggregate(array_sort(__tg), "
    "named_struct('prev', '', 'run', 0L, 'dup', 0L), "
    "(acc, x) -> IF(x = acc.prev, "
    "named_struct('prev', x, 'run', acc.run + 1L, 'dup', acc.dup), "
    "named_struct('prev', x, 'run', 1L, 'dup', acc.dup + "
    "IF(acc.run > 1L, acc.run * CAST(length(acc.prev) AS BIGINT), 0L))), "
    "acc -> acc.dup + IF(acc.run > 1L, "
    "acc.run * CAST(length(acc.prev) AS BIGINT), 0L))"
)
_TG_TOT_CHARS = "aggregate(__tg, 0L, (a, x) -> a + CAST(length(x) AS BIGINT))"


@_register(
    "gopher_dup_trigram_chars",
    _WORDS_CTE
    + """
    , tg AS (
        SELECT doc_id,
               w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win AS g
        FROM words
        WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
        QUALIFY lead(w, 2) OVER win IS NOT NULL
    ),
    tgc AS (SELECT doc_id, g, COUNT(*) AS c FROM tg GROUP BY doc_id, g),
    per_doc AS (
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_trigrams,
               CAST(SUM(CASE WHEN c > 1 THEN c * length(g) ELSE 0 END) AS BIGINT)
                   AS dup_trigram_chars,
               CAST(SUM(c * length(g)) AS BIGINT) AS total_trigram_chars
        FROM tgc GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(p.n_trigrams, 0) AS n_trigrams,
           coalesce(p.dup_trigram_chars, 0) AS dup_trigram_chars,
           coalesce(p.total_trigram_chars, 0) AS total_trigram_chars,
           round(coalesce(CAST(p.dup_trigram_chars AS DOUBLE)
                          / nullif(p.total_trigram_chars, 0), 0.0), 6)
               AS dup_trigram_char_frac
    FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
    """,
)
def gopher_dup_trigram_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-n-gram character fraction (Gopher repetition rules, Rae
    et al. 2021, public): the share of trigram characters belonging to
    trigrams that occur more than once WITHIN the document — the
    char-weighted repetition signal the token-level top-bigram fraction
    (:func:`doc_repetition_stats`) misses (a long repeated phrase counts
    by its length, not just its frequency).

    Scale shape: everything is per-row array higher-order functions over
    the token array — trigram construction by sliced ``zip_with``, the
    duplicate-char count by ONE fold over the sorted trigram array
    (longest-equal-run bookkeeping, same trick as the bigram max-count in
    ``_repetition_raw_cols``) — so the metric fuses into the scan with
    zero shuffles and no explode; the oracle's unnest/group-by is the
    cross-engine twin, not the plan.  The trigram array MATERIALIZES in
    its own projection before the three consumers: HOFs never codegen,
    so whole-stage subexpression elimination cannot deduplicate them —
    an inline spelling evaluates the zip_with chain three times
    (measured 2.3x slower at sf0.1) — while CollapseProject refuses to
    inline a non-cheap expression into multiple uses, so the staged
    column is computed exactly once."""
    d = load(spark, sf_dir, "documents")
    staged = (
        d.select("doc_id", F.expr(_TOKS_EXPR).alias("__toks"))
        .select("doc_id", F.expr(_TG_EXPR).alias("__tg"))
        # the folds stage too: the frac consumes both, and an inline
        # spelling would run each interpreted fold twice
        .select(
            "doc_id",
            F.expr("size(__tg)").cast("long").alias("n_trigrams"),
            F.expr(_TG_DUP_CHARS).alias("dup_trigram_chars"),
            F.expr(_TG_TOT_CHARS).alias("total_trigram_chars"),
        )
    )
    return staged.select(
        "doc_id",
        "n_trigrams",
        "dup_trigram_chars",
        "total_trigram_chars",
        F.round(
            F.coalesce(
                F.col("dup_trigram_chars").cast("double")
                / F.nullif(F.col("total_trigram_chars"), F.lit(0)),
                F.lit(0.0),
            ),
            6,
        ).alias("dup_trigram_char_frac"),
    )


# ---------------------------------------------------------------------------
# Gopher-style quality rules: per-document flags + composite keep.
# ---------------------------------------------------------------------------


@_register(
    "gopher_quality_rules",
    _TOKENS_CTE
    + """
    , base AS (
        SELECT doc_id,
               list_filter(tokens, x -> x <> '') AS t
        FROM tok
    ),
    stats AS (
        SELECT doc_id,
               CAST(len(t) AS BIGINT) AS nw,
               CAST(len(list_distinct(t)) AS BIGINT) AS ndw,
               CAST(list_sum(list_transform(t, w -> length(w))) AS BIGINT)
                   AS total_word_chars,
               (CASE WHEN list_contains(t, 'the') THEN 1 ELSE 0 END
                + CASE WHEN list_contains(t, 'a') THEN 1 ELSE 0 END
                + CASE WHEN list_contains(t, 'and') THEN 1 ELSE 0 END
                + CASE WHEN list_contains(t, 'is') THEN 1 ELSE 0 END)
                   AS n_stop_distinct
        FROM base
    )
    SELECT doc_id, nw,
           round(CAST(total_word_chars AS DOUBLE) / nullif(nw, 0), 6)
               AS mean_word_len,
           CAST(n_stop_distinct AS INT) AS n_stop_distinct,
           round(1.0 - CAST(ndw AS DOUBLE) / nullif(nw, 0), 6)
               AS dup_word_frac,
           nw BETWEEN 25 AND 80 AS wc_ok,
           CAST(total_word_chars AS DOUBLE) / nullif(nw, 0)
               BETWEEN 4.0 AND 5.0 AS mwl_ok,
           n_stop_distinct >= 2 AS stop_ok,
           1.0 - CAST(ndw AS DOUBLE) / nullif(nw, 0) <= 0.5 AS dup_ok,
           (nw BETWEEN 25 AND 80)
               AND (CAST(total_word_chars AS DOUBLE) / nullif(nw, 0)
                    BETWEEN 4.0 AND 5.0)
               AND n_stop_distinct >= 2
               AND (1.0 - CAST(ndw AS DOUBLE) / nullif(nw, 0) <= 0.5)
               AS keep
    FROM stats
    """,
)
def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, public):
    word-count bounds, mean-word-length bounds, minimum distinct-
    stopword evidence, and a duplicate-word ceiling, each emitted as a
    flag plus the composite ``keep`` — the canonical pre-training
    heuristic filter, with thresholds chosen to BIND on this corpus
    (every rule rejects some documents, so the flags are exercised, not
    vacuous).

    All comparisons run on EXACT values (integer counts and exact
    int/int double divisions — identical IEEE results in both engines);
    the rounded columns are presentation only, so a rounding boundary
    can never flip a flag differently across engines.  Zero shuffles:
    pure array-HOF projections fused into the scan."""
    toks = "filter(split(trim(text), '[ \\\\t\\\\n\\\\x0B\\\\f\\\\r]+'), x -> x != '')"
    nw = F.expr(f"size({toks})").cast("long")
    ndw = F.expr(f"size(array_distinct({toks}))").cast("long")
    twc = F.expr(
        f"aggregate({toks}, 0L, (a, w) -> a + CAST(length(w) AS BIGINT))"
    )
    n_stop = sum(
        F.expr(f"array_contains({toks}, '{w}')").cast("int")
        for w in ("the", "a", "and", "is")
    )
    mwl = twc.cast("double") / F.nullif(nw, F.lit(0))
    dupf = F.lit(1.0) - ndw.cast("double") / F.nullif(nw, F.lit(0))
    wc_ok = nw.between(25, 80)
    mwl_ok = (mwl >= 4.0) & (mwl <= 5.0)
    stop_ok = n_stop >= 2
    dup_ok = dupf <= 0.5
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        nw.alias("nw"),
        F.round(mwl, 6).alias("mean_word_len"),
        n_stop.alias("n_stop_distinct"),
        F.round(dupf, 6).alias("dup_word_frac"),
        wc_ok.alias("wc_ok"),
        mwl_ok.alias("mwl_ok"),
        stop_ok.alias("stop_ok"),
        dup_ok.alias("dup_ok"),
        (wc_ok & mwl_ok & stop_ok & dup_ok).alias("keep"),
    )


# ---------------------------------------------------------------------------
# BM25 ranked retrieval over the documents corpus.
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "join", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 15


def _bm25_oracle_sql() -> str:
    tf_cols = ",\n               ".join(
        f"CAST(len(list_filter(tokens, x -> x = '{t}')) AS BIGINT) AS tf_{t}"
        for t in _BM25_TERMS
    )
    df_cols = ", ".join(
        f"CAST(COUNT(*) FILTER (tf_{t} > 0) AS BIGINT) AS df_{t}"
        for t in _BM25_TERMS
    )
    score = "\n                 + ".join(
        f"CASE WHEN f.tf_{t} > 0 THEN "
        f"ln(1.0 + (s.n_docs - s.df_{t} + 0.5) / (s.df_{t} + 0.5)) "
        f"* f.tf_{t} * ({_BM25_K1} + 1.0) "
        f"/ (f.tf_{t} + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * f.dl / s.avgdl)) "
        f"ELSE 0.0 END"
        for t in _BM25_TERMS
    )
    return (
        _TOKENS_CTE
        + f"""
    , feat AS (
        SELECT doc_id,
               CAST(len(list_filter(tokens, x -> x <> '')) AS BIGINT) AS dl,
               {tf_cols}
        FROM tok
    ),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
               {df_cols}
        FROM feat
    )
    SELECT f.doc_id,
           round({score}, 6) AS bm25
    FROM feat f CROSS JOIN stats s
    ORDER BY round({score}, 6) DESC, f.doc_id
    LIMIT {_BM25_TOPK}
    """
    )


@_register("bm25_topk_docs", _bm25_oracle_sql())
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (Robertson/Sparck Jones, public) top-{k} documents for a
    fixed conjunctive-ish query ({terms}): per-term Lucene-style idf
    ``ln(1 + (N - df + 0.5)/(df + 0.5))`` and the saturating tf part
    with k1={k1}, b={b}, summed over matched terms — the lexical
    ranking companion of :func:`tfidf_top_terms` (which scores TERMS;
    this ranks DOCUMENTS) and the BM25 leg a production hybrid
    retriever pairs with dense scores (``hybrid_search_rrf``).

    Scale shape: per-document tf/dl are array-HOF projections fused
    into the scan (no explode, no posting-list shuffle); the corpus
    stats (N, avgdl, per-term df) are ONE tiny aggregate row broadcast
    back; ranking is TakeOrderedAndProject on the rounded score.  Both
    engines rank on the ROUNDED score with doc_id tiebreak, so a
    floating-point boundary cannot order them differently."""
    d = load(spark, sf_dir, "documents")
    feat = d.select("doc_id", F.expr(_TOKS_EXPR).alias("__toks")).select(
        "doc_id",
        F.expr("size(__toks)").cast("long").alias("dl"),
        *[
            F.expr(f"size(filter(__toks, x -> x = '{t}'))")
            .cast("long")
            .alias(f"tf_{t}")
            for t in _BM25_TERMS
        ],
    )
    stats = feat.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.count(F.when(F.col(f"tf_{t}") > 0, 1)).cast("long").alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )
    scored = feat.join(F.broadcast(stats))
    score = None
    for t in _BM25_TERMS:
        tf = F.col(f"tf_{t}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{t}") + F.lit(0.5))
            / (F.col(f"df_{t}") + F.lit(0.5))
        )
        part = F.when(
            tf > 0,
            idf
            * tf
            * F.lit(_BM25_K1 + 1.0)
            / (
                tf
                + F.lit(_BM25_K1)
                * (
                    F.lit(1.0)
                    - F.lit(_BM25_B)
                    + F.lit(_BM25_B) * F.col("dl") / F.col("avgdl")
                )
            ),
        ).otherwise(F.lit(0.0))
        score = part if score is None else score + part
    return (
        scored.select("doc_id", F.round(score, 6).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(_BM25_TOPK)
    )


bm25_topk_docs.__doc__ = bm25_topk_docs.__doc__.format(
    k=_BM25_TOPK, terms=", ".join(_BM25_TERMS), k1=_BM25_K1, b=_BM25_B
)


# ---------------------------------------------------------------------------
# Query-likelihood retrieval with Dirichlet smoothing — the language-
# modeling companion of BM25 (the other classic lexical scorer a
# production retriever offers).
# ---------------------------------------------------------------------------

_QL_MU = 300.0  # Dirichlet pseudo-count (Zhai & Lafferty's effective range)


def _ql_oracle_sql() -> str:
    tf_cols = ",\n               ".join(
        f"CAST(len(list_filter(tokens, x -> x = '{t}')) AS BIGINT) AS tf_{t}"
        for t in _BM25_TERMS
    )
    cf_cols = ", ".join(
        f"CAST(SUM(tf_{t}) AS BIGINT) AS cf_{t}" for t in _BM25_TERMS
    )
    score = "\n                 + ".join(
        f"CASE WHEN s.cf_{t} > 0 THEN "
        f"ln((f.tf_{t} + {_QL_MU} * (CAST(s.cf_{t} AS DOUBLE) / s.ct)) "
        f"/ (f.dl + {_QL_MU})) ELSE 0.0 END"
        for t in _BM25_TERMS
    )
    return (
        _TOKENS_CTE
        + f"""
    , feat AS (
        SELECT doc_id,
               CAST(len(list_filter(tokens, x -> x <> '')) AS BIGINT) AS dl,
               {tf_cols}
        FROM tok
    ),
    stats AS (
        SELECT CAST(SUM(dl) AS BIGINT) AS ct, {cf_cols}
        FROM feat
    )
    SELECT f.doc_id,
           round({score}, 6) AS ql_score
    FROM feat f CROSS JOIN stats s
    ORDER BY round({score}, 6) DESC, f.doc_id
    LIMIT {_BM25_TOPK}
    """
    )


@_register("query_likelihood_dirichlet_topk", _ql_oracle_sql())
def query_likelihood_dirichlet_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet prior smoothing (Zhai &
    Lafferty 2001, public) for the same fixed query as
    :func:`bm25_topk_docs`: score(d) = sum over query terms of
    ln((tf + mu * cf/|C|) / (dl + mu)) with mu={mu} — the language-
    modeling scorer that complements BM25's tf-saturation view (BM25
    rewards term saturation, QL rewards short documents whose language
    model concentrates on the query).  Terms absent from the whole
    corpus contribute 0 rather than -inf (the cf > 0 guard, identical
    on both engines).

    Cross-engine exactness: tf/dl/cf/|C| are exact integers; the
    smoothed probability is built double-op-for-double-op in the same
    order on both engines and both sides rank on the ROUNDED score
    with doc_id tiebreak (the BM25 discipline).  Scale shape: per-doc
    tf/dl are array-HOF projections fused into the scan; corpus stats
    are ONE aggregate row broadcast back; TakeOrderedAndProject on the
    rounded score."""
    d = load(spark, sf_dir, "documents")
    feat = d.select("doc_id", F.expr(_TOKS_EXPR).alias("__toks")).select(
        "doc_id",
        F.expr("size(__toks)").cast("long").alias("dl"),
        *[
            F.expr(f"size(filter(__toks, x -> x = '{t}'))")
            .cast("long")
            .alias(f"tf_{t}")
            for t in _BM25_TERMS
        ],
    )
    stats = feat.agg(
        F.sum("dl").cast("long").alias("ct"),
        *[F.sum(f"tf_{t}").cast("long").alias(f"cf_{t}") for t in _BM25_TERMS],
    )
    scored = feat.join(F.broadcast(stats))
    score = None
    for t in _BM25_TERMS:
        part = F.when(
            F.col(f"cf_{t}") > 0,
            F.log(
                (
                    F.col(f"tf_{t}")
                    + F.lit(_QL_MU)
                    * (F.col(f"cf_{t}").cast("double") / F.col("ct"))
                )
                / (F.col("dl") + F.lit(_QL_MU))
            ),
        ).otherwise(F.lit(0.0))
        score = part if score is None else score + part
    return (
        scored.select("doc_id", F.round(score, 6).alias("ql_score"))
        .orderBy(F.desc("ql_score"), "doc_id")
        .limit(_BM25_TOPK)
    )


query_likelihood_dirichlet_topk.__doc__ = (
    query_likelihood_dirichlet_topk.__doc__.format(mu=_QL_MU)
)


# ---------------------------------------------------------------------------
# Fused Gopher curation pipeline — rules + repetition + exact dedup in
# one lazy plan, reported per source.
# ---------------------------------------------------------------------------

_GCP_DUP_TRI_MAX = 0.02


@_register(
    "gopher_curation_pipeline",
    _WORDS_CTE
    + f"""
    , tg AS (
        SELECT doc_id,
               w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win AS g
        FROM words
        WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
        QUALIFY lead(w, 2) OVER win IS NOT NULL
    ),
    tgc AS (SELECT doc_id, g, COUNT(*) AS c FROM tg GROUP BY doc_id, g),
    tri AS (
        SELECT doc_id,
               SUM(CASE WHEN c > 1 THEN c * length(g) ELSE 0 END) AS dupc,
               SUM(c * length(g)) AS totc
        FROM tgc GROUP BY doc_id
    ),
    stats AS (
        SELECT doc_id,
               CAST(len(list_filter(tokens, x -> x <> '')) AS BIGINT) AS nw,
               CAST(len(list_distinct(list_filter(tokens, x -> x <> '')))
                    AS BIGINT) AS ndw,
               CAST(list_sum(list_transform(list_filter(tokens, x -> x <> ''),
                                            w -> length(w))) AS BIGINT) AS twc,
               (CASE WHEN list_contains(tokens, 'the') THEN 1 ELSE 0 END
                + CASE WHEN list_contains(tokens, 'a') THEN 1 ELSE 0 END
                + CASE WHEN list_contains(tokens, 'and') THEN 1 ELSE 0 END
                + CASE WHEN list_contains(tokens, 'is') THEN 1 ELSE 0 END)
                   AS n_stop
        FROM tok
    ),
    flagged AS (
        SELECT d.doc_id, d.source, s.nw,
               (s.nw BETWEEN 25 AND 80)
               AND (CAST(s.twc AS DOUBLE) / nullif(s.nw, 0)
                    BETWEEN 4.0 AND 5.0)
               AND s.n_stop >= 2
               AND (1.0 - CAST(s.ndw AS DOUBLE) / nullif(s.nw, 0) <= 0.5)
               AND coalesce(CAST(t.dupc AS DOUBLE) / nullif(t.totc, 0), 0.0)
                   <= {_GCP_DUP_TRI_MAX}
                   AS keep,
               md5(regexp_replace(lower(trim(d.text)),
                                  '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS fp
        FROM documents d
        JOIN stats s ON s.doc_id = d.doc_id
        LEFT JOIN tri t ON t.doc_id = d.doc_id
    ),
    kept AS (
        SELECT doc_id, source, nw, fp,
               ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM flagged WHERE keep
    )
    SELECT f.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN f.keep THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept_rules,
           CAST(coalesce(SUM(CASE WHEN k.rn = 1 THEN 1 END), 0) AS BIGINT)
               AS n_kept_unique,
           CAST(coalesce(SUM(CASE WHEN k.rn = 1 THEN k.nw END), 0) AS BIGINT)
               AS kept_tokens
    FROM flagged f
    LEFT JOIN kept k ON k.doc_id = f.doc_id
    GROUP BY f.source
    """,
)
def gopher_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-9 curation composition, ONE lazy plan: Gopher quality
    rules (word count, mean word length, stopword evidence, dup-word
    ceiling) + the duplicate-trigram character ceiling + exact
    normalized-fingerprint dedup (keep-first by doc_id), contracted to
    a per-source yield report (docs -> rule survivors -> unique
    survivors -> surviving token budget).  This is the datasheet a
    pretraining-data owner reads to see WHERE each source's tokens die
    in the funnel.

    Fusion: every per-document signal (token stats, trigram fold,
    fingerprint) is a scan-side projection — the only shuffles are the
    per-fingerprint keep-first window and the final per-source
    contraction.  The token array and the trigram array each stage as
    a REAL column in their own projection before their many consumers:
    interpreted HOFs get no codegen subexpression elimination, and
    CollapseProject refuses to inline non-cheap expressions into
    multiple uses — so each array computes once per row instead of
    once per consumer (measured 2.3x on the trigram chain alone)."""
    d = load(spark, sf_dir, "documents")
    staged = d.select(
        "doc_id",
        "source",
        F.expr(_TOKS_EXPR).alias("__toks"),
        TX.fingerprint("text").alias("fp"),
    ).select("*", F.expr(_TG_EXPR).alias("__tg"))
    nw = F.expr("size(__toks)").cast("long")
    ndw = F.expr("size(array_distinct(__toks))").cast("long")
    twc = F.expr("aggregate(__toks, 0L, (a, w) -> a + CAST(length(w) AS BIGINT))")
    n_stop = sum(
        F.expr(f"array_contains(__toks, '{w}')").cast("int")
        for w in ("the", "a", "and", "is")
    )
    mwl = twc.cast("double") / F.nullif(nw, F.lit(0))
    dupf = F.lit(1.0) - ndw.cast("double") / F.nullif(nw, F.lit(0))
    trif = F.coalesce(
        F.expr(_TG_DUP_CHARS).cast("double")
        / F.nullif(F.expr(_TG_TOT_CHARS), F.lit(0)),
        F.lit(0.0),
    )
    keep = (
        nw.between(25, 80)
        & (mwl >= 4.0)
        & (mwl <= 5.0)
        & (n_stop >= 2)
        & (dupf <= 0.5)
        & (trif <= _GCP_DUP_TRI_MAX)
    )
    flagged = staged.select(
        "doc_id",
        "source",
        nw.alias("nw"),
        keep.alias("keep"),
        "fp",
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    kept = (
        flagged.filter("keep")
        .withColumn("rn", F.row_number().over(w))
        .select("doc_id", F.col("rn"), F.col("nw").alias("knw"))
    )
    return (
        flagged.join(kept, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("keep").cast("int")).cast("long").alias("n_kept_rules"),
            F.coalesce(
                F.sum(F.when(F.col("rn") == 1, 1)), F.lit(0)
            ).cast("long").alias("n_kept_unique"),
            F.coalesce(
                F.sum(F.when(F.col("rn") == 1, F.col("knw"))), F.lit(0)
            ).cast("long").alias("kept_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# TextRank keyword extraction — PageRank over the word adjacency graph.
# ---------------------------------------------------------------------------

_TR_ITERS = 4
_TR_DAMP = 0.85
_TR_TOPK = 15


def _textrank_oracle_sql() -> str:
    """Unrolled-iteration DuckDB twin of the Spark TextRank loop —
    generated from the same constants (the ``_pagerank_oracle_sql``
    convention), with the identical round-to-6 boundary per step."""
    iters = []
    prev = "r0"
    for k in range(1, _TR_ITERS + 1):
        iters.append(
            f""",
    r{k} AS (
        SELECT b.node,
               round(CAST(0.15 AS DOUBLE) / b.n
                     + CAST({_TR_DAMP} AS DOUBLE) * coalesce(c.contrib, 0), 6)
                   AS pr
        FROM (SELECT node, n FROM nodes, nn) b
        LEFT JOIN (
            SELECT e.dst AS node, sum(r.pr / d.outdeg) AS contrib
            FROM edges e
            JOIN {prev} r ON r.node = e.src
            JOIN deg d ON d.src = e.src
            GROUP BY e.dst
        ) c USING (node)
    )"""
        )
        prev = f"r{k}"
    return (
        """
    WITH tok AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(trim(text),
                           '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '') AS t
        FROM documents
    ),
    idx AS (
        SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
        FROM tok
    ),
    e0 AS (
        SELECT DISTINCT LEAST(t[i], t[i + 1]) AS a,
                        GREATEST(t[i], t[i + 1]) AS b
        FROM idx WHERE t[i] <> t[i + 1]
    ),
    edges AS (SELECT a AS src, b AS dst FROM e0
              UNION ALL SELECT b, a FROM e0),
    deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    nn AS (SELECT count(*) AS n FROM nodes),
    r0 AS (SELECT node, round(CAST(1.0 AS DOUBLE) / n, 6) AS pr
           FROM nodes, nn)
    """
        + "".join(iters)
        + f"""
    SELECT node AS word, pr AS textrank
    FROM r{_TR_ITERS}
    ORDER BY pr DESC, node
    LIMIT {_TR_TOPK}"""
    )


@_register("textrank_keywords", _textrank_oracle_sql())
def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004, public):
    PageRank over the corpus-wide word ADJACENCY graph (undirected
    edges between consecutive tokens), {iters} damped iterations, top
    {k} words by final score — the unsupervised keyword extractor that
    needs no training data, here run corpus-level (the per-document
    variant just adds doc_id to every key).

    Scale shape: edges derive from the token arrays by slice-zip (no
    explode until the DISTINCT pair contraction, which is map-side
    combinable); the iteration state is VOCABULARY-sized — word graphs
    grow with vocabulary (Heaps-law sublinear), not corpus size, so the
    loop's joins are dim-sized at any corpus scale.  Each step rounds
    to 6 before the next (the pagerank_customer_supplier cross-engine
    contract, oracle = generated unrolled CTEs)."""
    toks = "filter(split(trim(text), '[ \\\\t\\\\n\\\\x0B\\\\f\\\\r]+'), x -> x != '')"
    pairs = (
        f"zip_with(slice({toks}, 1, greatest(size({toks}) - 1, 0)), "
        f"slice({toks}, 2, greatest(size({toks}) - 1, 0)), "
        f"(a, b) -> named_struct('a', least(a, b), 'b', greatest(a, b)))"
    )
    d = load(spark, sf_dir, "documents")
    e0 = (
        d.select(F.explode(F.expr(pairs)).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    edges = e0.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        e0.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # r16 OPT (the pagerank loop discipline, guide §2.4/§5): the
    # weighted edge relation is loop-INVARIANT and must persist — the
    # per-iteration localCheckpoints split the run into jobs that
    # cannot share exchanges, so the unpersisted explode+distinct edge
    # pipeline, deg and nodes all recomputed from the documents scan
    # EVERY iteration.  deg folds into the persisted relation (one
    # join instead of two per iteration), and on the BIDIRECTIONAL
    # union every node appears as a dst, so contrib already covers the
    # node domain and the old nodes LEFT JOIN (whose coalesce never
    # fired) is dropped — the same full-coverage argument as
    # pagerank_run.  Measured (bench methodology, interleaved):
    # 4.3-7.9s -> 1.8-2.9s at sf0.1.
    edges_w = edges.join(deg, "src").persist()
    nodes = edges_w.select(F.col("src").alias("node")).distinct()
    n_nodes = nodes.count()  # vocabulary-sized scalar; bounds the loop state
    ranks = nodes.select(
        "node", F.round(F.lit(1.0) / n_nodes, 6).alias("pr")
    )
    for _ in range(_TR_ITERS):
        contrib = (
            edges_w.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("contrib"))
        )
        ranks = contrib.select(
            F.col("dst").alias("node"),
            F.round(
                F.lit(0.15) / n_nodes + F.lit(_TR_DAMP) * F.col("contrib"),
                6,
            ).alias("pr"),
        )
        ranks = ranks.localCheckpoint(eager=False)
    return (
        ranks.select(F.col("node").alias("word"), F.col("pr").alias("textrank"))
        .orderBy(F.desc("textrank"), "word")
        .limit(_TR_TOPK)
    )


textrank_keywords.__doc__ = textrank_keywords.__doc__.format(
    iters=_TR_ITERS, k=_TR_TOPK
)


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
# public): hashed n-gram bag-of-words importance weights toward a
# target distribution; the principled "make the corpus look like the
# target" selector that generalizes hand-written quality rules.
# ---------------------------------------------------------------------------

_DSIR_B = 64  # hashed n-gram buckets
_DSIR_ALPHA = 0.5  # add-alpha smoothing
_DSIR_TOPK = 100  # selected budget
_DSIR_TARGET_LANG = "en"  # the "high-quality target" stand-in


@_register(
    "dsir_importance_weights",
    f"""
    WITH tok AS (
        SELECT doc_id, lang,
               list_filter(regexp_split_to_array(trim(text),
                           '[ \\t\\n\\x0B\\f\\r]+'), t -> t != '') AS tokens
        FROM documents
    ),
    uni AS (
        SELECT doc_id, lang, tokens[i] AS gram
        FROM tok, LATERAL (SELECT unnest(generate_series(1, len(tokens))) AS i)
    ),
    bi AS (
        SELECT doc_id, lang, tokens[i] || ' ' || tokens[i + 1] AS gram
        FROM tok,
             LATERAL (SELECT unnest(generate_series(1, len(tokens) - 1)) AS i)
    ),
    g AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
    b AS (
        SELECT doc_id, lang,
               CAST(('0x' || substr(md5('dsir_' || gram), 1, 8)) AS BIGINT)
                   % {_DSIR_B} AS bucket
        FROM g
    ),
    src AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cs FROM b GROUP BY 1),
    tgt AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS ct FROM b
            WHERE lang = '{_DSIR_TARGET_LANG}' GROUP BY 1),
    ratio AS (
        SELECT s.bucket,
               CAST(round(
                 ln((coalesce(t.ct, 0) + {_DSIR_ALPHA})
                    / (SUM(coalesce(t.ct, 0)) OVER ()
                       + {_DSIR_ALPHA * _DSIR_B}))
                 - ln((s.cs + {_DSIR_ALPHA})
                      / (SUM(s.cs) OVER () + {_DSIR_ALPHA * _DSIR_B})),
                 6) AS DECIMAL(18,6)) AS lr
        FROM src s LEFT JOIN tgt t USING (bucket)
    ),
    w AS (
        SELECT b.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               SUM(r.lr) AS lw
        FROM b JOIN ratio r USING (bucket)
        GROUP BY 1
    ),
    w2 AS (
        SELECT d.doc_id,
               coalesce(w.n_grams, 0) AS n_grams,
               coalesce(w.lw, CAST(0 AS DECIMAL(18,6))) AS lw
        FROM documents d LEFT JOIN w ON w.doc_id = d.doc_id
    ),
    kth AS (
        SELECT lw AS klw, doc_id AS kdoc FROM w2
        ORDER BY lw DESC, doc_id LIMIT 1 OFFSET {_DSIR_TOPK - 1}
    )
    SELECT w2.doc_id,
           CAST(w2.n_grams AS BIGINT) AS n_grams,
           round(CAST(w2.lw AS DOUBLE), 6) + 0.0 AS log_weight,
           CAST(CASE WHEN k.klw IS NULL THEN 1
                     WHEN w2.lw > k.klw
                          OR (w2.lw = k.klw AND w2.doc_id <= k.kdoc) THEN 1
                     ELSE 0 END AS INTEGER) AS selected
    FROM w2 LEFT JOIN kth k ON TRUE
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, public): score every
    document by how much more likely its hashed n-gram bag (unigrams +
    bigrams over the WS_REGEX token contract, md5 -> {b} buckets) is
    under the TARGET distribution (lang='{tl}' documents — the
    high-quality-target stand-in) than under the raw-source
    distribution, with add-{a} smoothing; select the top-{k} by weight.
    log w(doc) = sum over grams of [ln p_target(bucket) -
    ln p_source(bucket)] — the hashed-ngram approximation of the
    importance ratio the paper resamples by.

    Determinism: each BUCKET's log-ratio is rounded to 6 and cast
    DECIMAL(18,6) once ({b} values), so the per-document sum is an
    EXACT decimal sum of identical addends on both engines (the 1-ulp
    libm-vs-Math.log hazard is confined to the pre-round bucket
    values); selection ranks on the exact decimal with doc_id
    tiebreak via a 1-row k-th-threshold broadcast (the Q22 scalar
    pattern — no global rank window over the corpus).

    Scale shape: one corpus scan explodes grams and contracts map-side
    to {b} source + {b} target bucket counts (two broadcast-sized
    aggregates; totals via a window over the {b}-row frame — the
    canonical dim-sized exception); per-doc weights are one
    gram-explode joined to the broadcast ratio table and contracted by
    doc_id; the top-k threshold is TakeOrdered, never a sort."""
    d = load(spark, sf_dir, "documents")
    staged = d.select("doc_id", "lang", F.expr(_TOKS_EXPR).alias("__toks"))
    grams = staged.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "concat(__toks, zip_with("
                "slice(__toks, 1, greatest(size(__toks) - 1, 0)), "
                "slice(__toks, 2, greatest(size(__toks) - 1, 0)), "
                "(a, b) -> concat(a, ' ', b)))"
            )
        ).alias("gram"),
    )
    b = grams.select(
        "doc_id",
        "lang",
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("dsir_"), F.col("gram"))), 1, 8),
                16,
                10,
            ).cast("long")
            % _DSIR_B
        ).alias("bucket"),
    )
    # ONE pass for both distributions: the gram explode is fact-sized,
    # so source and target counts come from a single map-side-combined
    # aggregate instead of two scans (a third scan computes per-doc
    # weights below — 3 passes -> 2)
    srctgt = b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cs"),
        F.sum((F.col("lang") == _DSIR_TARGET_LANG).cast("int"))
        .cast("long")
        .alias("ct"),
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    denom = float(_DSIR_ALPHA * _DSIR_B)
    ratio = (
        srctgt
        .select(
            "bucket",
            F.round(
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(_DSIR_ALPHA))
                    / (
                        F.sum(F.coalesce(F.col("ct"), F.lit(0))).over(w_all)
                        + F.lit(denom)
                    )
                )
                - F.log(
                    (F.col("cs") + F.lit(_DSIR_ALPHA))
                    / (F.sum("cs").over(w_all) + F.lit(denom))
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("lr"),
        )
    )
    w = (
        b.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum("lr").alias("lw"),
        )
    )
    w2 = d.select("doc_id").join(w, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce(F.col("lw"), F.lit(0).cast("decimal(18,6)")).alias("lw"),
    )
    kth = (
        w2.orderBy(F.desc("lw"), "doc_id")
        .limit(_DSIR_TOPK)
        .orderBy(F.asc("lw"), F.desc("doc_id"))
        .limit(1)
        .select(F.col("lw").alias("klw"), F.col("doc_id").alias("kdoc"))
    )
    return w2.join(F.broadcast(kth), F.lit(True), "left").select(
        "doc_id",
        "n_grams",
        (F.round(F.col("lw").cast("double"), 6) + 0.0).alias("log_weight"),
        F.when(
            F.col("klw").isNull()
            | (F.col("lw") > F.col("klw"))
            | ((F.col("lw") == F.col("klw")) & (F.col("doc_id") <= F.col("kdoc"))),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("selected"),
    )


dsir_importance_weights.__doc__ = dsir_importance_weights.__doc__.format(
    b=_DSIR_B, a=_DSIR_ALPHA, k=_DSIR_TOPK, tl=_DSIR_TARGET_LANG
)


# ---------------------------------------------------------------------------
# Good-Turing unseen-vocabulary mass (Good 1953, public) — per source.
# ---------------------------------------------------------------------------


@_register(
    "good_turing_unseen_mass",
    """
    WITH tok AS (
        SELECT doc_id, source,
               list_filter(regexp_split_to_array(trim(text),
                           '[ \\t\\n\\x0B\\f\\r]+'), t -> t != '') AS tokens
        FROM documents
    ),
    w AS (
        SELECT source, tokens[i] AS word
        FROM tok, LATERAL (SELECT unnest(generate_series(1, len(tokens))) AS i)
    ),
    wc AS (
        SELECT source, word, CAST(COUNT(*) AS BIGINT) AS r
        FROM w GROUP BY 1, 2
    )
    SELECT source,
           CAST(SUM(r) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab_size,
           CAST(SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
           CAST(SUM(CASE WHEN r = 2 THEN 1 ELSE 0 END) AS BIGINT) AS doubletons,
           round(CAST(SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / SUM(r), 6) + 0.0 AS p_unseen,
           round(1.0 - CAST(SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / SUM(r), 6) + 0.0 AS coverage
    FROM wc
    GROUP BY source
    """,
)
def good_turing_unseen_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing estimate of the UNSEEN vocabulary mass per source
    (Good 1953, public): P0 = N1/N — the total probability a fresh
    token from the same source is a word never seen in the corpus,
    estimated from the hapax count.  The curation read: a source whose
    p_unseen stays high after millions of tokens is open-vocabulary
    (code, user IDs, noise) and will keep inflating the tokenizer's
    byte-fallback rate; coverage = 1 - P0 is the sampling-sufficiency
    gate the Heaps-law curve (``heaps_law_vocab_growth``) trends over
    time.  Doubletons ship alongside because N1/N2 drives the standard
    Simple Good-Turing smoothing ratio.

    All integer arithmetic until two final divisions rounded at the
    edge.  Scale shape: token explode contracts map-side to (source,
    word) counts — vocabulary-sized, Heaps-sublinear — then one
    (source)-level fold; no windows, no joins."""
    d = load(spark, sf_dir, "documents")
    w = d.select(
        "source", F.explode(F.expr(_TOKS_EXPR)).alias("word")
    )
    wc = w.groupBy("source", "word").agg(
        F.count(F.lit(1)).cast("long").alias("r")
    )
    n1 = F.sum(F.when(F.col("r") == 1, 1).otherwise(0)).cast("long")
    return wc.groupBy("source").agg(
        F.sum("r").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        n1.alias("hapax"),
        F.sum(F.when(F.col("r") == 2, 1).otherwise(0))
        .cast("long")
        .alias("doubletons"),
        (
            F.round(n1.cast("double") / F.sum("r"), 6) + 0.0
        ).alias("p_unseen"),
        (
            F.round(1.0 - n1.cast("double") / F.sum("r"), 6) + 0.0
        ).alias("coverage"),
    )


# ---------------------------------------------------------------------------
# Cohen's kappa between the lang-id heuristic and the metadata labels
# (Cohen 1960, public) — chance-corrected agreement, the scalar the
# confusion matrix (lang_id_confusion_matrix) summarizes to.
# ---------------------------------------------------------------------------


@_register(
    "cohens_kappa_langid",
    _TOKENS_CTE
    + """
    , hits AS (
        SELECT doc_id,
           length(list_filter(tokens, t -> list_contains(['der','die','und','ist'], t))) AS h_de,
           length(list_filter(tokens, t -> list_contains(['the','a','and','is'], t))) AS h_en,
           length(list_filter(tokens, t -> list_contains(['el','los','y','es'], t))) AS h_es,
           length(list_filter(tokens, t -> list_contains(['le','la','et','est'], t))) AS h_fr
        FROM tok
    ),
    pred AS (
        SELECT doc_id,
               CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
                    WHEN h_de = greatest(h_de, h_en, h_es, h_fr) THEN 'de'
                    WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
                    WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
                    ELSE 'fr' END AS lang_pred
        FROM hits
    ),
    cm AS (
        SELECT d.lang AS y, p.lang_pred AS yhat
        FROM documents d JOIN pred p ON d.doc_id = p.doc_id
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN y = yhat THEN 1 ELSE 0 END) AS BIGINT)
                   AS agree
        FROM cm
    ),
    rowm AS (SELECT y AS cls, CAST(COUNT(*) AS BIGINT) AS r FROM cm GROUP BY 1),
    colm AS (SELECT yhat AS cls, CAST(COUNT(*) AS BIGINT) AS c FROM cm GROUP BY 1),
    pe_num AS (
        SELECT CAST(coalesce(SUM(r.r * c.c), 0) AS BIGINT) AS pn
        FROM rowm r JOIN colm c USING (cls)
    )
    SELECT t.n AS n_docs,
           round(CAST(t.agree AS DOUBLE) / t.n, 6) + 0.0 AS po,
           round(CAST(p.pn AS DOUBLE) / t.n / t.n, 6) + 0.0 AS pe,
           CASE WHEN CAST(p.pn AS DOUBLE) / t.n / t.n < 1.0
                THEN round((CAST(t.agree AS DOUBLE) / t.n
                            - CAST(p.pn AS DOUBLE) / t.n / t.n)
                           / (1.0 - CAST(p.pn AS DOUBLE) / t.n / t.n), 6) + 0.0
                ELSE NULL END AS kappa
    FROM tot t CROSS JOIN pe_num p
    """,
)
def cohens_kappa_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the stopword-vote language detector and
    the corpus's metadata labels: chance-corrected agreement
    (po - pe)/(1 - pe), where pe is the agreement two INDEPENDENT
    annotators with these marginals would reach by luck — raw accuracy
    over-credits any detector on a skewed-language corpus (predicting
    the majority class alone scores po = its share).  kappa is the one
    number to trend when deciding whether to trust ingest labels or
    the detector (the per-cell view is ``lang_id_confusion_matrix``).

    Exactness: all counts integer; po, pe and kappa are ratio-valued
    doubles computed with the identical expression tree on both
    engines and rounded at the edge; the degenerate pe = 1 case (a
    single class on both margins) yields NULL, never a 0/0.

    Scale shape: one lang-id projection fused into the scan, one
    count contraction, |langs|-sized marginal frames, and a 1-row x
    1-row combine (the ab_test_t_statistic scalar pattern)."""
    d = load(spark, sf_dir, "documents")
    cm = d.select(
        F.col("lang").alias("y"), TX.lang_id("text").alias("yhat")
    )
    tot = cm.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("y") == F.col("yhat")).cast("int")).cast("long").alias("agree"),
    )
    rowm = cm.groupBy(F.col("y").alias("cls")).agg(
        F.count(F.lit(1)).cast("long").alias("r")
    )
    colm = cm.groupBy(F.col("yhat").alias("cls")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    pe_num = (
        rowm.join(colm, "cls")
        .agg(
            F.coalesce(F.sum(F.col("r") * F.col("c")), F.lit(0))
            .cast("long")
            .alias("pn")
        )
    )
    po = F.col("agree").cast("double") / F.col("n")
    pe = F.col("pn").cast("double") / F.col("n") / F.col("n")
    return tot.crossJoin(F.broadcast(pe_num)).select(
        F.col("n").alias("n_docs"),
        (F.round(po, 6) + 0.0).alias("po"),
        (F.round(pe, 6) + 0.0).alias("pe"),
        F.when(pe < 1.0, F.round((po - pe) / (1.0 - pe), 6) + 0.0)
        .otherwise(F.lit(None))
        .alias("kappa"),
    )


# ---------------------------------------------------------------------------
# Yule's K vocabulary-richness characteristic (Yule 1944, public).
# ---------------------------------------------------------------------------


@_register(
    "yules_k_by_source",
    """
    WITH tok AS (
        SELECT doc_id, source,
               list_filter(regexp_split_to_array(trim(text),
                           '[ \\t\\n\\x0B\\f\\r]+'), t -> t != '') AS tokens
        FROM documents
    ),
    w AS (
        SELECT source, tokens[i] AS word
        FROM tok, LATERAL (SELECT unnest(generate_series(1, len(tokens))) AS i)
    ),
    wc AS (
        SELECT source, word, CAST(COUNT(*) AS BIGINT) AS r
        FROM w GROUP BY 1, 2
    )
    SELECT source,
           CAST(SUM(r) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab_size,
           round(10000.0
                 * CAST(SUM(CAST(r AS DECIMAL(19,0))
                            * CAST(r AS DECIMAL(19,0))) - SUM(r) AS DOUBLE)
                 / (CAST(SUM(r) AS DOUBLE) * SUM(r)), 6) + 0.0 AS yules_k
    FROM wc
    GROUP BY source
    HAVING SUM(r) > 0
    """,
)
def yules_k_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's K vocabulary-richness characteristic per source (Yule
    1944, public): K = 10^4 (Σ r²N_r − N)/N² over the word frequency
    spectrum — LENGTH-INVARIANT unlike the raw type-token ratio, which
    is why stylometry and corpus QA use it to compare sources of very
    different sizes (high K = repetitive/templated vocabulary; low K =
    rich).  Completes the frequency-spectrum family next to
    ``good_turing_unseen_mass`` (same spectrum, the tail end) and
    ``heaps_law_vocab_growth`` (its growth curve).

    Exactness: word counts integer; Σr² accumulates in DECIMAL(19,0)
    operands (int128-backed — word counts square past int64 at corpus
    scale) and only the final K ratio runs in double, rounded at the
    edge.  Scale shape: one token explode contracting map-side to the
    vocabulary-sized (source, word) counts, then one source-level
    fold; no joins, no windows."""
    d = load(spark, sf_dir, "documents")
    w = d.select("source", F.explode(F.expr(_TOKS_EXPR)).alias("word"))
    wc = w.groupBy("source", "word").agg(
        F.count(F.lit(1)).cast("long").alias("r")
    )
    rdec = F.col("r").cast("decimal(19,0)")
    return (
        wc.groupBy("source")
        .agg(
            F.sum("r").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("vocab_size"),
            (
                F.round(
                    F.lit(10000.0)
                    * (F.sum(rdec * rdec) - F.sum("r")).cast("double")
                    / (F.sum("r").cast("double") * F.sum("r")),
                    6,
                )
                + 0.0
            ).alias("yules_k"),
        )
        .filter(F.col("n_tokens") > 0)
    )


# ---------------------------------------------------------------------------
# Water-filling token-budget allocation — the max-min fair cap solver
# for a training mixture under a global token budget.
# ---------------------------------------------------------------------------

_WF_BUDGET_FRAC = 0.5  # global budget = 50% of the corpus's tokens


@_register(
    "water_filling_token_caps",
    f"""
    WITH tok AS (
        SELECT source,
               CAST(len(list_filter(regexp_split_to_array(trim(text),
                    '[ \\t\\n\\x0B\\f\\r]+'), t -> t != '')) AS BIGINT) AS n
        FROM documents
    ),
    avail AS (
        SELECT source, CAST(SUM(n) AS BIGINT) AS avail
        FROM tok GROUP BY 1 HAVING SUM(n) > 0
    ),
    tot AS (
        SELECT CAST(FLOOR(SUM(avail) * {_WF_BUDGET_FRAC}) AS BIGINT) AS budget,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM avail
    ),
    r AS (
        SELECT source, avail,
               ROW_NUMBER() OVER (ORDER BY avail, source) AS rn,
               SUM(avail) OVER (ORDER BY avail, source
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum
        FROM avail
    ),
    lvl AS (
        -- the water level: smallest sources saturate in rank order;
        -- the first rank where capping the REST at this source's avail
        -- would still exceed the budget marks the level's bracket
        SELECT MAX(CASE WHEN cum - avail + (t.k - rn + 1) * avail
                             < t.budget
                        THEN rn ELSE 0 END) AS sat_rn
        FROM r CROSS JOIN tot t
    ),
    level AS (
        SELECT CASE WHEN l.sat_rn = 0
                    THEN CAST(FLOOR(t.budget / t.k) AS BIGINT)
                    ELSE CAST(FLOOR((t.budget
                          - coalesce((SELECT cum FROM r WHERE rn = l.sat_rn), 0))
                         / (t.k - l.sat_rn)) AS BIGINT)
               END AS c,
               l.sat_rn
        FROM lvl l CROSS JOIN tot t
    )
    SELECT r.source, r.avail,
           CAST(CASE WHEN r.rn <= lv.sat_rn THEN r.avail
                     ELSE LEAST(r.avail, lv.c) END AS BIGINT) AS cap,
           CAST(CASE WHEN r.rn <= lv.sat_rn OR r.avail <= lv.c
                     THEN 1 ELSE 0 END AS INTEGER) AS saturated
    FROM r CROSS JOIN level lv
    """,
)
def water_filling_token_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-min fair (water-filling) per-source token caps under a
    global budget of {frac:.0%} of the corpus: pour the budget evenly
    across sources, letting small sources SATURATE at their available
    tokens and redistributing their unused share to the rest — the
    allocation that maximizes the minimum per-source share, which is
    how a training mix caps dominant sources without starving rare
    ones (the optimization-flavored sibling of
    ``token_budget_mixture``'s fixed-proportion sampler).

    Exact integer water level: sources sort by availability; the
    saturation prefix is found by ONE closed-form scan over the
    |sources| frame (a source saturates iff giving every LARGER source
    its own availability as the cap still under-spends the budget),
    and the final level is integer division of the residual budget
    over the unsaturated count — no iteration, no floats anywhere, so
    both engines agree bit-for-bit.  Note Σcaps can undershoot the
    budget by < k tokens (integer level); the training loop's
    last-batch rule absorbs it.

    Scale shape: one scan-local token count, one source contraction;
    everything after lives on the |sources| frame (dim-sized windows +
    1-row budget/level scalars)."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "source", F.expr(f"CAST(size({_TOKS_EXPR}) AS LONG)").alias("n")
    )
    avail = (
        tok.groupBy("source")
        .agg(F.sum("n").cast("long").alias("avail"))
        .filter(F.col("avail") > 0)
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_ord = Window.orderBy("avail", "source")
    r = avail.select(
        "source",
        "avail",
        F.row_number().over(w_ord).alias("rn"),
        F.sum("avail")
        .over(w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
        F.floor(F.sum("avail").over(w_all) * _WF_BUDGET_FRAC)
        .cast("long")
        .alias("budget"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("k"),
    )
    sat = r.agg(
        F.max(
            F.when(
                F.col("cum") - F.col("avail")
                + (F.col("k") - F.col("rn") + 1) * F.col("avail")
                < F.col("budget"),
                F.col("rn"),
            ).otherwise(F.lit(0))
        ).alias("sat_rn")
    )
    sat_cum = (
        r.join(F.broadcast(sat), r["rn"] == sat["sat_rn"])
        .select(F.col("cum").alias("sat_cum"))
    )
    level = (
        sat.join(F.broadcast(sat_cum), F.lit(True), "left")
        .crossJoin(
            F.broadcast(
                r.agg(F.max("budget").alias("budget"), F.max("k").alias("k"))
            )
        )
        .select(
            "sat_rn",
            F.when(
                F.col("sat_rn") == 0,
                F.floor(F.col("budget") / F.col("k")).cast("long"),
            )
            .otherwise(
                F.floor(
                    (F.col("budget") - F.coalesce(F.col("sat_cum"), F.lit(0)))
                    / (F.col("k") - F.col("sat_rn"))
                ).cast("long")
            )
            .alias("c"),
        )
    )
    return r.crossJoin(F.broadcast(level)).select(
        "source",
        "avail",
        F.when(F.col("rn") <= F.col("sat_rn"), F.col("avail"))
        .otherwise(F.least(F.col("avail"), F.col("c")))
        .cast("long")
        .alias("cap"),
        F.when(
            (F.col("rn") <= F.col("sat_rn")) | (F.col("avail") <= F.col("c")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("saturated"),
    )


water_filling_token_caps.__doc__ = water_filling_token_caps.__doc__.format(
    frac=_WF_BUDGET_FRAC
)


# ---------------------------------------------------------------------------
# MTLD lexical diversity (McCarthy & Jarvis 2010, public) — the
# length-robust diversity measure corpus-quality reports pair with
# Yule's K; also the engine's showcase that a CUSTOM SEQUENTIAL
# operator (a stateful left-to-right scan with resets) expresses as an
# order-pinned HOF fold on BOTH engines, no UDF, no driver state.
# ---------------------------------------------------------------------------

_MTLD_TTR = 0.72  # the paper's factor threshold


def _mtld_spark_state(arr: str) -> str:
    """Spark SQL aggregate() fold: state = (t tokens-in-segment, k
    distinct-types-in-segment, ts newline-delimited type set, f full
    factors).  Tokens are whitespace-split so chr(10) cannot occur in
    a token — the string encoding is collision-free."""
    new_k = (
        "CASE WHEN instr(concat(char(10), acc.ts, char(10)),"
        " concat(char(10), w, char(10))) > 0 THEN acc.k ELSE acc.k + 1 END"
    )
    new_ts = (
        "CASE WHEN instr(concat(char(10), acc.ts, char(10)),"
        " concat(char(10), w, char(10))) > 0 THEN acc.ts"
        " ELSE concat(acc.ts, char(10), w) END"
    )
    return f"""aggregate(
        {arr},
        named_struct('t', 0, 'k', 0, 'ts', '', 'f', 0),
        (acc, w) -> CASE
          WHEN (CAST(({new_k}) AS DOUBLE) / (acc.t + 1)) < {_MTLD_TTR}
          THEN named_struct('t', 0, 'k', 0, 'ts', '', 'f', acc.f + 1)
          ELSE named_struct('t', acc.t + 1, 'k', {new_k}, 'ts', {new_ts},
                            'f', acc.f) END
    )"""


def _mtld_oracle_sql() -> str:
    """DuckDB oracle as a RECURSIVE CTE walking one token per level —
    deliberately NOT a list_reduce fold: DuckDB v1.0's list_reduce
    corrupts VARIABLE-WIDTH accumulators (VARCHAR / LIST / STRUCT
    containing either) across rows under vectorized execution
    (observed: ~1% of rows inherit another row's type set; fixed-width
    scalar accumulators like the kcenter distance fold are unaffected).
    Recursive-CTE state is ordinary column data, immune by
    construction.  The partial-factor divisor embeds repr(1.0 - 0.72)
    so both engines divide by the IDENTICAL double."""
    div = repr(1.0 - _MTLD_TTR)
    reset = f"(CAST(nk AS DOUBLE) / (t + 1)) < {_MTLD_TTR}"
    member = (
        "position((chr(10) || w[i + 1] || chr(10))"
        " IN (chr(10) || ts || chr(10))) > 0"
    )

    def denom(d: str) -> str:
        return f"max(CASE WHEN dir = '{d}' THEN denom END)"

    return f"""
    WITH RECURSIVE tok AS (
        SELECT doc_id,
               regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+')
                   AS tokens
        FROM documents
    ),
    base AS (
        SELECT doc_id, CAST(len(w) AS BIGINT) AS n, w FROM (
            SELECT doc_id, list_filter(tokens, x -> x <> '') AS w FROM tok
        ) WHERE len(w) >= 1
    ),
    walk(doc_id, n, w, dir, i, t, k, ts, f) AS (
        SELECT doc_id, n, w, 'f', 0, 0, 0, '', 0 FROM base
        UNION ALL
        SELECT doc_id, n, list_reverse(w), 'b', 0, 0, 0, '', 0 FROM base
        UNION ALL
        SELECT doc_id, n, w, dir, i + 1,
               CASE WHEN {reset} THEN 0 ELSE t + 1 END,
               CASE WHEN {reset} THEN 0 ELSE nk END,
               CASE WHEN {reset} THEN '' ELSE nts END,
               CASE WHEN {reset} THEN f + 1 ELSE f END
        FROM (
            SELECT doc_id, n, w, dir, i, t, f,
                   CASE WHEN {member} THEN k ELSE k + 1 END AS nk,
                   CASE WHEN {member} THEN ts
                        ELSE ts || chr(10) || w[i + 1] END AS nts
            FROM walk WHERE i < n
        )
    ),
    fin AS (
        SELECT doc_id, n, dir,
               f + (CASE WHEN t > 0 THEN
                         (1.0 - CAST(k AS DOUBLE) / t) / {div}
                         ELSE 0.0 END) AS denom
        FROM walk WHERE i = n
    ),
    m AS (
        SELECT doc_id, any_value(n) AS n_tokens,
               CASE WHEN {denom('f')} > 0
                    THEN any_value(n) / {denom('f')} END AS fwd,
               CASE WHEN {denom('b')} > 0
                    THEN any_value(n) / {denom('b')} END AS bwd
        FROM fin GROUP BY doc_id
    )
    SELECT doc_id, n_tokens,
           round(fwd, 6) AS mtld_fwd,
           round(bwd, 6) AS mtld_bwd,
           round((fwd + bwd) / 2.0, 6) AS mtld
    FROM m
    """


@_register("mtld_lexical_diversity", _mtld_oracle_sql())
def mtld_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MTLD lexical diversity per document (McCarthy & Jarvis 2010):
    walk the token stream, count a "factor" each time the running
    type-token ratio of the current segment falls below {thr}, add the
    proportional partial factor for the remainder, MTLD = n_tokens /
    factors — averaged over the forward and backward passes as the
    paper specifies.  Length-robust where raw TTR is not; pairs with
    Yule's K in a corpus-quality datasheet.

    Engineering point: the scan is a STATEFUL SEQUENTIAL fold with
    resets — the shape that usually gets written as a Python UDF — but
    it runs here as a pure order-pinned HOF fold (Spark ``aggregate``
    / DuckDB ``list_reduce``) with IDENTICAL algebra on both engines:
    state = (segment length, distinct count, newline-delimited type
    set, factors); TTR comparisons are exact int/int doubles.  Zero
    shuffles — fused into the scan.

    Scale shape: per-document state is bounded by segment vocabulary
    (segments reset at TTR {thr}, so the type-set string stays small);
    the whole operator is a narrow projection."""
    docs = load(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.expr(
            f"filter({_TOKS_EXPR.replace('text', 'text')}, x -> x != '')"
        ).alias("w"),
    ).filter(F.size("w") >= 1)
    st = base.select(
        "doc_id",
        F.size("w").cast("long").alias("n_tokens"),
        F.expr(_mtld_spark_state("w")).alias("sf"),
        F.expr(_mtld_spark_state("reverse(w)")).alias("sb"),
    )

    def dn(s: str):
        return F.col(f"{s}.f") + F.when(
            F.col(f"{s}.t") > 0,
            (
                F.lit(1.0)
                - F.col(f"{s}.k").cast("double") / F.col(f"{s}.t")
            )
            / F.lit(1.0 - _MTLD_TTR),
        ).otherwise(F.lit(0.0))

    m = st.select(
        "doc_id",
        "n_tokens",
        F.when(dn("sf") > 0, F.col("n_tokens") / dn("sf")).alias("fwd"),
        F.when(dn("sb") > 0, F.col("n_tokens") / dn("sb")).alias("bwd"),
    )
    return m.select(
        "doc_id",
        "n_tokens",
        F.round("fwd", 6).alias("mtld_fwd"),
        F.round("bwd", 6).alias("mtld_bwd"),
        F.round((F.col("fwd") + F.col("bwd")) / 2.0, 6).alias("mtld"),
    )


mtld_lexical_diversity.__doc__ = mtld_lexical_diversity.__doc__.format(
    thr=_MTLD_TTR
)


# ---------------------------------------------------------------------------
# t-closeness — the third member of the release-audit trio (Li, Li &
# Venkatasubramanian 2007): a class can be k-anonymous AND l-diverse
# yet still leak if its sensitive-value DISTRIBUTION deviates from the
# global one.
# ---------------------------------------------------------------------------

_TCLOSE_THRESHOLD = 0.2  # release gate; binds on this corpus


@_register(
    "t_closeness_audit",
    f"""
    WITH b AS (
        SELECT c_nationkey, c_mktsegment, {_ACCTBAL_BAND_SQL} AS band
        FROM customer
    ),
    eq AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS class_size,
               CAST(COUNT(*) FILTER (band = 'negative') AS BIGINT) AS c1,
               CAST(COUNT(*) FILTER (band = 'low') AS BIGINT) AS c2,
               CAST(COUNT(*) FILTER (band = 'mid') AS BIGINT) AS c3
        FROM b GROUP BY c_nationkey, c_mktsegment
    ),
    g AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(*) FILTER (band = 'negative') AS BIGINT) AS g1,
               CAST(COUNT(*) FILTER (band = 'low') AS BIGINT) AS g2,
               CAST(COUNT(*) FILTER (band = 'mid') AS BIGINT) AS g3
        FROM b
    ),
    emd AS (
        SELECT class_size,
               round((
                   abs(CAST(c1 AS DOUBLE) / class_size - CAST(g1 AS DOUBLE) / n)
                 + abs((CAST(c1 AS DOUBLE) / class_size - CAST(g1 AS DOUBLE) / n)
                     + (CAST(c2 AS DOUBLE) / class_size - CAST(g2 AS DOUBLE) / n))
                 + abs(((CAST(c1 AS DOUBLE) / class_size - CAST(g1 AS DOUBLE) / n)
                     + (CAST(c2 AS DOUBLE) / class_size - CAST(g2 AS DOUBLE) / n))
                     + (CAST(c3 AS DOUBLE) / class_size - CAST(g3 AS DOUBLE) / n))
               ) / 3.0, 6) AS emd
        FROM eq CROSS JOIN g
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
           max(emd) AS t_closeness,
           CAST(SUM(CASE WHEN emd >= {_TCLOSE_THRESHOLD} THEN 1 ELSE 0 END)
                AS BIGINT) AS classes_above_t,
           CAST(SUM(CASE WHEN emd >= {_TCLOSE_THRESHOLD} THEN class_size
                         ELSE 0 END) AS BIGINT) AS rows_at_risk
    FROM emd
    """,
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness of the (nation, market-segment) quasi-identifier over
    the ORDERED account-balance band (negative < low < mid < high):
    per class, the ordered-EMD between the class's band distribution
    and the global one — (1/(m-1)) * sum of |running probability
    deficit| — and the release audit reads the max (the dataset's t)
    plus the classes at or above {t}.  Completes the governance trio
    next to ``k_anonymity_audit`` (class size) and
    ``l_diversity_audit`` (distinct sensitive values): a class can
    pass both and still leak "everyone here is in the top band".

    Cross-engine exactness: band counts are exact integers; each
    running deficit is built double-op-for-double-op in the same order
    on both engines, rounded to 6dp BEFORE the max/threshold so a
    float boundary cannot flip a class across the gate differently.
    Scale shape: one grouped conditional-count contraction (4 fixed
    bands -> fixed-width rows), a 1-row global broadcast, a 1-row
    summary — the same two-level contraction as its siblings."""
    c = load(spark, sf_dir, "customer")
    band = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
    )
    b = c.select("c_nationkey", "c_mktsegment", band.alias("band"))
    eq = b.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("class_size"),
        F.count(F.when(F.col("band") == "negative", 1)).cast("long").alias("c1"),
        F.count(F.when(F.col("band") == "low", 1)).cast("long").alias("c2"),
        F.count(F.when(F.col("band") == "mid", 1)).cast("long").alias("c3"),
    )
    g = b.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count(F.when(F.col("band") == "negative", 1)).cast("long").alias("g1"),
        F.count(F.when(F.col("band") == "low", 1)).cast("long").alias("g2"),
        F.count(F.when(F.col("band") == "mid", 1)).cast("long").alias("g3"),
    )

    def dev(ci: str, gi: str):
        return (
            F.col(ci).cast("double") / F.col("class_size")
            - F.col(gi).cast("double") / F.col("n")
        )

    d1 = dev("c1", "g1")
    d2 = d1 + dev("c2", "g2")
    d3 = d2 + dev("c3", "g3")
    emd = eq.crossJoin(F.broadcast(g)).select(
        "class_size",
        F.round((F.abs(d1) + F.abs(d2) + F.abs(d3)) / F.lit(3.0), 6).alias("emd"),
    )
    return emd.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.max("emd").alias("t_closeness"),
        F.sum(F.when(F.col("emd") >= _TCLOSE_THRESHOLD, 1).otherwise(0))
        .cast("long")
        .alias("classes_above_t"),
        F.sum(
            F.when(F.col("emd") >= _TCLOSE_THRESHOLD, F.col("class_size")).otherwise(0)
        )
        .cast("long")
        .alias("rows_at_risk"),
    )


t_closeness_audit.__doc__ = t_closeness_audit.__doc__.format(
    t=_TCLOSE_THRESHOLD
)


# ---------------------------------------------------------------------------
# Burrows' Delta (Burrows 2002, public) — the stylometry standard:
# distance between sources in z-scored most-frequent-word space.  In a
# training-data pipeline this is the STYLE-DRIFT matrix between corpus
# sources (near-zero delta = redundant styling; outlier rows = a source
# whose register differs from everything else).
# ---------------------------------------------------------------------------

_DELTA_TOP_WORDS = 20


@_register(
    "burrows_delta_sources",
    _TOKENS_CTE
    + f"""
    , w AS (
        SELECT doc_id, source, unnest(list_filter(tokens, x -> x <> '')) AS word
        FROM (SELECT t.doc_id, d.source, t.tokens
              FROM tok t JOIN documents d USING (doc_id))
    ),
    top_words AS (
        SELECT word FROM (
            SELECT word, COUNT(*) AS c,
                   ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, word) AS rn
            FROM w GROUP BY word
        ) WHERE rn <= {_DELTA_TOP_WORDS}
    ),
    tot AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS t FROM w GROUP BY source
    ),
    f AS MATERIALIZED (
        SELECT s.source, tw.word,
               CAST(COALESCE(c.cnt, 0) AS DOUBLE) / s.t AS f
        FROM tot s CROSS JOIN top_words tw
        LEFT JOIN (
            SELECT source, word, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM w JOIN top_words USING (word) GROUP BY source, word
        ) c ON c.source = s.source AND c.word = tw.word
    ),
    mu AS MATERIALIZED (
        SELECT word, SUM(f) / COUNT(*) AS mean_f, CAST(COUNT(*) AS BIGINT) AS ns
        FROM f GROUP BY word
    ),
    sd AS MATERIALIZED (
        SELECT f.word,
               sqrt(SUM((f.f - mu.mean_f) * (f.f - mu.mean_f)) / mu.ns) AS std_f
        FROM f JOIN mu USING (word) GROUP BY f.word, mu.ns
    ),
    z AS MATERIALIZED (
        SELECT f.source, f.word, (f.f - mu.mean_f) / sd.std_f AS z
        FROM f JOIN mu USING (word) JOIN sd USING (word)
        WHERE sd.std_f > 0
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           round(SUM(abs(a.z - b.z)) / COUNT(*), 6) AS delta
    FROM z a JOIN z b ON a.word = b.word AND a.source < b.source
    GROUP BY a.source, b.source
    """,
)
def burrows_delta_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta between every pair of document sources: z-score
    each source's relative frequency of the corpus's {m} most frequent
    words (deterministic top-{m}: count desc, word tiebreak), then
    Delta(a, b) = mean |z_a - z_b| over the words with nonzero spread —
    the stylometry-standard style-drift matrix (a near-zero pair is
    stylistically redundant; an outlier row is a register shift worth
    a curation look).

    Cross-engine care: relative frequencies are exact int/int doubles;
    the per-word mean/std use the TWO-PASS deviation form, so an
    all-equal word has deviations exactly 0.0 on both engines and the
    std > 0 gate cannot flip (the variance shortcut's cancellation
    noise could); remaining summation-order ulps (~20 addends, z-scale
    magnitudes) are absorbed by the 6dp rounding.  Scale shape: one
    token explode contracted to (source, word) counts; everything after
    lives on |sources| x {m} rows — the pair join is over a frame that
    fits in one broadcast at any corpus size."""
    docs = load(spark, sf_dir, "documents")
    w = docs.select(
        "source", F.explode(F.expr(f"filter({_TOKS_EXPR}, x -> x != '')")).alias("word")
    )
    top_words = (
        w.groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "word")
        .limit(_DELTA_TOP_WORDS)
        .select("word")
    )
    tot = w.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("t"))
    cnt = (
        w.join(F.broadcast(top_words), "word")
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    f = (
        tot.crossJoin(F.broadcast(top_words))
        .join(cnt, ["source", "word"], "left")
        .select(
            "source",
            "word",
            (
                F.coalesce(F.col("cnt"), F.lit(0)).cast("double") / F.col("t")
            ).alias("f"),
        )
    )
    mu = f.groupBy("word").agg(
        (F.sum("f") / F.count(F.lit(1))).alias("mean_f"),
        F.count(F.lit(1)).cast("long").alias("ns"),
    )
    sd = (
        f.join(F.broadcast(mu), "word")
        .groupBy("word", "ns")
        .agg(
            F.sqrt(
                F.sum(
                    (F.col("f") - F.col("mean_f"))
                    * (F.col("f") - F.col("mean_f"))
                )
                / F.col("ns")
            ).alias("std_f")
        )
        .select("word", "std_f")
    )
    z = (
        f.join(F.broadcast(mu), "word")
        .join(F.broadcast(sd), "word")
        .filter(F.col("std_f") > 0)
        .select(
            "source",
            "word",
            ((F.col("f") - F.col("mean_f")) / F.col("std_f")).alias("z"),
        )
    )
    a = z.select(
        F.col("source").alias("source_a"), "word", F.col("z").alias("za")
    )
    b = z.select(
        F.col("source").alias("source_b"), "word", F.col("z").alias("zb")
    )
    return (
        a.join(b, "word")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.round(
                F.sum(F.abs(F.col("za") - F.col("zb"))) / F.count(F.lit(1)), 6
            ).alias("delta"),
        )
    )


burrows_delta_sources.__doc__ = burrows_delta_sources.__doc__.format(
    m=_DELTA_TOP_WORDS
)


# ---------------------------------------------------------------------------
# Corpus-level boilerplate removal — the CCNet / RefinedWeb "shared line"
# pass, at 5-gram granularity (this corpus is single-line by construction).
# ---------------------------------------------------------------------------

_BOILERPLATE_DF = 3  # a shingle in >= this many distinct docs is boilerplate


@_register(
    "boilerplate_ngram_removal",
    _SHINGLE_CTE
    + f"""
, dfq AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle),
flagged AS (
    SELECT s.doc_id, s.shingle, (q.df >= {_BOILERPLATE_DF}) AS is_bp
    FROM sh s JOIN dfq q ON q.shingle = s.shingle
)
SELECT d.source,
       CAST(COUNT(DISTINCT f.doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS total_shingles,
       CAST(SUM(CASE WHEN f.is_bp THEN 1 ELSE 0 END) AS BIGINT)
           AS removed_occurrences,
       CAST(COUNT(DISTINCT CASE WHEN f.is_bp THEN f.shingle END) AS BIGINT)
           AS distinct_boilerplate,
       round(CAST(SUM(CASE WHEN f.is_bp THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS removed_frac
FROM flagged f JOIN documents d ON d.doc_id = f.doc_id
GROUP BY d.source
""",
)
def boilerplate_ngram_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level boilerplate pass: a 5-gram that appears in >= 3
    DISTINCT documents is boilerplate (headers, navigation chrome,
    license blurbs — the shared-content class CCNet removes by hashing
    lines across shards, Wenzek et al. 2020, and RefinedWeb keeps as a
    line-dedup stage; this corpus is single-line word soup, so the pass
    runs at shingle granularity with the exact same corpus-df
    mechanic).  Reports, per source: docs touched, total doc-shingle
    incidences, incidences a removal pass would drop, distinct
    boilerplate shingles seen, and the removed fraction.

    Scale shape: the shingle relation is the engine's standard explode
    + narrow distinct; the corpus df is one groupBy on the shingle key
    and the flag join lands on the SAME key, so Catalyst reuses the
    hash partitioning (no second shuffle of the big relation); the
    source attach is a doc-keyed equi-join; the final rollup is
    |sources|-sized.  Nothing is quadratic: unlike the pairwise dedup
    tiers, boilerplate removal is a per-(doc, shingle) predicate
    against a corpus-level frequency — the same shape at 100 TB, where
    the df table is the only state that grows with corpus diversity."""
    d = load(spark, sf_dir, "documents")
    sh = shingles(d)  # (doc_id, shingle), distinct per doc
    dfq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    flagged = sh.join(dfq, "shingle").select(
        "doc_id",
        "shingle",
        (F.col("df") >= _BOILERPLATE_DF).alias("is_bp"),
    )
    bp = F.when(F.col("is_bp"), 1).otherwise(0)
    return (
        flagged.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("total_shingles"),
            F.sum(bp).cast("long").alias("removed_occurrences"),
            F.countDistinct(F.when(F.col("is_bp"), F.col("shingle")))
            .cast("long")
            .alias("distinct_boilerplate"),
            F.round(
                F.sum(bp).cast("double") / F.count(F.lit(1)), 6
            ).alias("removed_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Differentially-private release simulation — the MECHANISM member of the
# privacy family (k-anonymity / l-diversity / t-closeness audit the data;
# this one actually perturbs the release).
# ---------------------------------------------------------------------------


@_register(
    "dp_noisy_counts_seeded",
    """
    WITH counts AS (
        SELECT n.n_name, COUNT(*) AS c
        FROM customer cu JOIN nation n ON cu.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    ),
    drawn AS (
        SELECT n_name, c,
               CAST(('0x' || substr(md5('dp11' || n_name), 1, 13)) AS BIGINT)
                   / 4503599627370496.0 AS u
        FROM counts
    )
    SELECT n_name,
           CAST(c + (CASE WHEN u >= 0.5 THEN 1 ELSE -1 END)
                    * CAST(floor(-ln(1 - 2 * abs(u - 0.5))) AS BIGINT)
                AS BIGINT) AS noisy_count,
           CAST(1.0 AS DOUBLE) AS epsilon
    FROM drawn
    """,
)
def dp_noisy_counts_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation customer counts released through the two-sided
    GEOMETRIC mechanism (the discrete Laplace — the universally optimal
    integer-count mechanism of Ghosh-Roughgarden-Sundararajan 2009,
    public) at epsilon = 1, sensitivity 1: noise = sign * Geom drawn by
    inverse CDF, k = floor(-ln(1 - u') / eps) with u' folded from a
    uniform.

    The uniform is md5-SEEDED from the group key (the engine's A-Res /
    negative-sampling convention), which makes the release REPLAYABLE —
    the property the oracle pair needs and what a pipeline wants for
    deterministic test runs.  Stated honestly (docstring is the spec):
    a hash of the public group key is NOT cryptographic randomness, so
    this query is the release *simulation* for engine parity and
    magnitude auditing; a production release swaps u for a real RNG and
    keeps every other expression unchanged.

    Portability: one ln per group on an md5-derived rational (the
    weighted_sample_orders precedent), floored to an integer — a
    cross-engine floor flip would need the true value within 1 ulp of
    an integer, negligible over 25 dim-sized groups.  Scale shape: one
    grouped count (map-side partial), noise is a scalar expression on
    the |nations|-sized result; nothing else touches the fact table."""
    cu = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    counts = (
        cu.join(F.broadcast(n), cu.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    u = F.conv(
        F.substring(F.md5(F.concat(F.lit("dp11"), F.col("n_name"))), 1, 13),
        16,
        10,
    ).cast("double") / F.lit(4503599627370496.0)
    mag = F.floor(-F.log(1 - 2 * F.abs(u - 0.5))).cast("long")
    sign = F.when(u >= 0.5, F.lit(1)).otherwise(F.lit(-1))
    return counts.select(
        "n_name",
        (F.col("c") + sign * mag).cast("long").alias("noisy_count"),
        F.lit(1.0).cast("double").alias("epsilon"),
    )


# ---------------------------------------------------------------------------
# RAKE keyword extraction — stopword-delimited phrases, degree/frequency
# word scores (the non-graph sibling of textrank_keywords).
# ---------------------------------------------------------------------------

_RAKE_STOPS = ["the", "a", "and", "is"]  # the text_quality_scores list
_RAKE_MAX_LEN = 4
_RAKE_TOPK = 3


@_register(
    "rake_keywords_by_source",
    f"""
    WITH tokd AS (
        SELECT d.doc_id, d.source,
               list_filter(regexp_split_to_array(trim(d.text),
                           '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '') AS t
        FROM documents d
    ),
    pos AS (
        SELECT doc_id, source, t[i] AS w, i,
               CASE WHEN list_contains({_RAKE_STOPS!r}, t[i])
                    THEN 1 ELSE 0 END AS stop
        FROM (SELECT doc_id, source, t,
                     unnest(generate_series(1, len(t))) AS i FROM tokd)
    ),
    seg AS (
        SELECT doc_id, source, w, i, stop,
               SUM(stop) OVER (PARTITION BY doc_id ORDER BY i) AS pid
        FROM pos
    ),
    runs AS (SELECT doc_id, source, pid, w, i FROM seg WHERE stop = 0),
    asm AS (
        SELECT doc_id, source, pid,
               string_agg(w, ' ' ORDER BY i) AS phrase,
               COUNT(*) AS plen
        FROM runs GROUP BY doc_id, source, pid
    ),
    cand AS (SELECT * FROM asm WHERE plen <= {_RAKE_MAX_LEN}),
    occ AS (
        SELECT r.source, r.w, c.plen
        FROM runs r
        JOIN cand c ON c.doc_id = r.doc_id AND c.pid = r.pid
    ),
    ws AS (
        SELECT source, w,
               CAST(round(CAST(SUM(plen) AS DOUBLE) / COUNT(*), 6)
                    AS DECIMAL(18,6)) AS score_w
        FROM occ GROUP BY source, w
    ),
    phr AS (
        SELECT source, phrase, MAX(plen) AS n_words,
               COUNT(*) AS n_occurrences
        FROM cand GROUP BY source, phrase
    ),
    pw AS (
        SELECT p.source, p.phrase, p.n_words, p.n_occurrences, s.score_w
        FROM (SELECT source, phrase, n_words, n_occurrences,
                     unnest(regexp_split_to_array(phrase, ' ')) AS w
              FROM phr) p
        JOIN ws s ON s.source = p.source AND s.w = p.w
    ),
    scored AS (
        SELECT source, phrase, n_words, n_occurrences,
               SUM(score_w) AS score
        FROM pw GROUP BY source, phrase, n_words, n_occurrences
    )
    SELECT source, phrase, CAST(n_words AS BIGINT) AS n_words,
           CAST(n_occurrences AS BIGINT) AS n_occurrences,
           CAST(score AS DOUBLE) AS score, CAST(rnk AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                       ORDER BY score DESC, phrase) AS rnk
          FROM scored)
    WHERE rnk <= {_RAKE_TOPK}
    """,
)
def rake_keywords_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction per source (Rose et al. 2010, public):
    stopwords delimit candidate phrases (runs capped at 4 words, the
    common implementation bound), each word scores degree/frequency
    over the candidate occurrences — degree counts the full length of
    every phrase occurrence containing the word, rewarding words that
    live in long phrases — and a phrase scores the sum of its word
    scores; top-3 phrases per source.  The degree/frequency heuristic
    is the non-graph sibling of :func:`textrank_keywords` (which ranks
    single words by PageRank over adjacency).

    Portability: word scores are rounded to DECIMAL(18,6) BEFORE the
    phrase sum, so the sum is summation-order-exact (the Burrows-Delta
    z-score convention); ranking breaks ties on the phrase string.

    Scale shape: tokenize + posexplode is the corpus scan; phrase
    assembly is a per-(doc, run) sort-grouped string_agg (doc-bounded
    groups); word stats and phrase stats are two grouped aggregates
    keyed by (source, word) / (source, phrase); the re-explode of
    DISTINCT phrases for scoring is bounded by phrase length <= 4.
    Nothing joins fact-to-fact except through bounded keys."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        "source",
        F.filter(TX.tokens("text"), lambda x: x != "").alias("t"),
    )
    pos = tok.select(
        "doc_id",
        "source",
        F.posexplode("t").alias("i", "w"),
    ).select(
        "doc_id",
        "source",
        "w",
        "i",
        F.when(F.col("w").isin(_RAKE_STOPS), 1).otherwise(0).alias("stop"),
    )
    wseg = Window.partitionBy("doc_id").orderBy("i")
    seg = pos.withColumn("pid", F.sum("stop").over(wseg))
    runs = seg.filter(F.col("stop") == 0).select(
        "doc_id", "source", "pid", "w", "i"
    )
    asm = runs.groupBy("doc_id", "source", "pid").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "w"))),
                lambda s: s["w"],
            ),
        ).alias("phrase"),
        F.count(F.lit(1)).alias("plen"),
    )
    cand = asm.filter(F.col("plen") <= _RAKE_MAX_LEN)
    occ = runs.join(
        cand.select("doc_id", "pid", "plen"), ["doc_id", "pid"]
    ).select("source", "w", "plen")
    ws = occ.groupBy("source", "w").agg(
        F.round(F.sum("plen").cast("double") / F.count(F.lit(1)), 6)
        .cast("decimal(18,6)")
        .alias("score_w")
    )
    phr = cand.groupBy("source", "phrase").agg(
        F.max("plen").alias("n_words"),
        F.count(F.lit(1)).alias("n_occurrences"),
    )
    pw = phr.select(
        "source",
        "phrase",
        "n_words",
        "n_occurrences",
        F.explode(F.split("phrase", " ")).alias("w"),
    ).join(ws, ["source", "w"])
    scored = pw.groupBy("source", "phrase", "n_words", "n_occurrences").agg(
        F.sum("score_w").alias("score")
    )
    wr = Window.partitionBy("source").orderBy(F.desc("score"), "phrase")
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= _RAKE_TOPK)
        .select(
            "source",
            "phrase",
            F.col("n_words").cast("long").alias("n_words"),
            F.col("n_occurrences").cast("long").alias("n_occurrences"),
            F.col("score").cast("double").alias("score"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# Dunning log-likelihood keyness — which words characterize each source
# (the signed G^2 complement of vocab_psi / Burrows' Delta).
# ---------------------------------------------------------------------------

_KEYNESS_TOPK = 5


@_register(
    "dunning_llr_keyness",
    _TOKENS_CTE
    + f"""
    , w AS (
        SELECT d.source, u.w AS word
        FROM tok t
        JOIN documents d ON d.doc_id = t.doc_id,
        unnest(list_filter(t.tokens, x -> x <> '')) AS u(w)
    ),
    sw AS (SELECT source, word, COUNT(*) AS a FROM w GROUP BY 1, 2),
    stot AS (SELECT source, COUNT(*) AS n1 FROM w GROUP BY 1),
    wtot AS (SELECT word, COUNT(*) AS cw FROM w GROUP BY 1),
    ctot AS (SELECT COUNT(*) AS n FROM w),
    scored AS (
        SELECT sw.source, sw.word, sw.a, wtot.cw - sw.a AS b,
               stot.n1, ctot.n - stot.n1 AS n2,
               round(2 * (
                   CASE WHEN sw.a > 0 THEN sw.a * ln(CAST(sw.a AS DOUBLE)
                        / (CAST(stot.n1 AS DOUBLE) * wtot.cw / ctot.n))
                        ELSE 0 END
                   + CASE WHEN wtot.cw - sw.a > 0
                          THEN (wtot.cw - sw.a)
                               * ln(CAST(wtot.cw - sw.a AS DOUBLE)
                                    / (CAST(ctot.n - stot.n1 AS DOUBLE)
                                       * wtot.cw / ctot.n))
                          ELSE 0 END), 6) AS g2,
               CASE WHEN CAST(sw.a AS DOUBLE) * (ctot.n - stot.n1)
                         > CAST(wtot.cw - sw.a AS DOUBLE) * stot.n1
                    THEN 1 ELSE -1 END AS direction
        FROM sw
        JOIN stot ON stot.source = sw.source
        JOIN wtot ON wtot.word = sw.word
        CROSS JOIN ctot
    )
    SELECT source, word, CAST(a AS BIGINT) AS cnt_in,
           CAST(b AS BIGINT) AS cnt_rest, g2,
           CAST(direction AS INT) AS direction, CAST(rnk AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                       ORDER BY g2 DESC, word) AS rnk
          FROM scored)
    WHERE rnk <= {_KEYNESS_TOPK}
    """,
)
def dunning_llr_keyness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning log-likelihood keyness (Dunning 1993, public — the
    corpus-linguistics standard for "which words CHARACTERIZE this
    source vs the rest"): per (source, word), G^2 = 2[a ln(a/E_a) +
    b ln(b/E_b)] over the word's in-source count a and rest-of-corpus
    count b against their expected splits; top-5 per source, with the
    overuse direction signed by the exact integer cross-multiplication
    a*n2 > b*n1 (no frequency ratio float ever decides the sign).
    Complements vocab_psi (distribution drift) and Burrows' Delta
    (stylometry): keyness names the WORDS responsible.

    Portability: counts are integers, each G^2 term is one ln on an
    integer-derived rational (the TF-IDF convention), zero-count terms
    contribute exactly 0 on both engines, and ranking runs over the
    ROUNDED score with the word tiebreak.

    Scale shape: one tokenize-explode scan; three grouped contractions
    (source-word, source, word) of which two are dim-sized; the corpus
    total is a 1-row broadcast; the per-source top-k is a window over
    the (source, word) contraction, never the token stream."""
    d = load(spark, sf_dir, "documents")
    w = d.select(
        "source",
        F.explode(F.filter(TX.tokens("text"), lambda x: x != "")).alias("word"),
    )
    sw = w.groupBy("source", "word").agg(F.count(F.lit(1)).alias("a"))
    stot = w.groupBy("source").agg(F.count(F.lit(1)).alias("n1"))
    wtot = w.groupBy("word").agg(F.count(F.lit(1)).alias("cw"))
    ctot = w.agg(F.count(F.lit(1)).alias("n"))
    j = (
        sw.join(F.broadcast(stot), "source")
        .join(wtot, "word")
        .crossJoin(F.broadcast(ctot))
    )
    a = F.col("a").cast("double")
    b = (F.col("cw") - F.col("a")).cast("double")
    n1 = F.col("n1").cast("double")
    n2 = (F.col("n") - F.col("n1")).cast("double")
    t1 = F.when(
        F.col("a") > 0,
        F.col("a") * F.log(a / (n1 * F.col("cw") / F.col("n"))),
    ).otherwise(F.lit(0))
    t2 = F.when(
        F.col("cw") - F.col("a") > 0,
        (F.col("cw") - F.col("a"))
        * F.log(b / (n2 * F.col("cw") / F.col("n"))),
    ).otherwise(F.lit(0))
    scored = j.select(
        "source",
        "word",
        F.col("a"),
        (F.col("cw") - F.col("a")).alias("b"),
        F.round(2 * (t1 + t2), 6).alias("g2"),
        F.when(
            a * (F.col("n") - F.col("n1")) > b * F.col("n1"), 1
        ).otherwise(-1).alias("direction"),
    )
    wr = Window.partitionBy("source").orderBy(F.desc("g2"), "word")
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= _KEYNESS_TOPK)
        .select(
            "source",
            "word",
            F.col("a").cast("long").alias("cnt_in"),
            F.col("b").cast("long").alias("cnt_rest"),
            "g2",
            F.col("direction").cast("int").alias("direction"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# Chao1 richness — how much vocabulary a source HASN'T shown yet
# (the abundance-based companion of Good-Turing's unseen MASS).
# ---------------------------------------------------------------------------


@_register(
    "chao1_vocab_richness",
    _TOKENS_CTE
    + """
    , w AS (
        SELECT d.source, u.w AS word
        FROM tok t
        JOIN documents d ON d.doc_id = t.doc_id,
        unnest(list_filter(t.tokens, x -> x <> '')) AS u(w)
    ),
    freq AS (SELECT source, word, COUNT(*) AS c FROM w GROUP BY 1, 2),
    spec AS (
        SELECT source,
               COUNT(*) AS s_obs,
               SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS f1,
               SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS f2
        FROM freq GROUP BY source
    )
    SELECT source,
           CAST(s_obs AS BIGINT) AS s_obs,
           CAST(f1 AS BIGINT) AS f1,
           CAST(f2 AS BIGINT) AS f2,
           round(s_obs + CASE WHEN f2 > 0
                              THEN CAST(f1 AS DOUBLE) * f1 / (2.0 * f2)
                              ELSE CAST(f1 AS DOUBLE) * (f1 - 1) / 2.0 END,
                 6) AS chao1
    FROM spec
    """,
)
def chao1_vocab_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 richness estimator per source (Chao 1984, public — the
    abundance-based lower bound on TOTAL vocabulary size, observed +
    unseen): S_chao1 = S_obs + F1^2/(2 F2), falling back to the
    bias-corrected F1(F1-1)/2 form when no doubletons exist.  The
    companion of ``good_turing_unseen_mass``: Good-Turing prices the
    probability MASS of unseen words, Chao1 counts the unseen TYPES —
    a corpus datasheet reports both.

    Counts are integers end to end; the single division is rounded at
    the edge.  One tokenize-explode scan, one (source, word)
    contraction, one |sources|-sized spectrum rollup — map-side
    partials all the way (the Yule's K shape)."""
    d = load(spark, sf_dir, "documents")
    w = d.select(
        "source",
        F.explode(F.filter(TX.tokens("text"), lambda x: x != "")).alias("word"),
    )
    freq = w.groupBy("source", "word").agg(F.count(F.lit(1)).alias("c"))
    spec = freq.groupBy("source").agg(
        F.count(F.lit(1)).alias("s_obs"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).alias("f2"),
    )
    f1 = F.col("f1").cast("double")
    est = F.when(
        F.col("f2") > 0, f1 * F.col("f1") / (2.0 * F.col("f2"))
    ).otherwise(f1 * (F.col("f1") - 1) / 2.0)
    return spec.select(
        "source",
        F.col("s_obs").cast("long").alias("s_obs"),
        F.col("f1").cast("long").alias("f1"),
        F.col("f2").cast("long").alias("f2"),
        F.round(F.col("s_obs") + est, 6).alias("chao1"),
    )


# ---------------------------------------------------------------------------
# Word adaptation — Church's "seen once, expect again" burstiness:
# P(word recurs in a doc | it appeared at all).
# ---------------------------------------------------------------------------

_ADAPT_MIN_DF = 5
_ADAPT_TOPK = 10


@_register(
    "word_adaptation_scores",
    _TOKENS_CTE
    + f"""
    , wc AS (
        SELECT t.doc_id, u.w AS word, COUNT(*) AS c
        FROM tok t, unnest(list_filter(t.tokens, x -> x <> '')) AS u(w)
        GROUP BY t.doc_id, u.w
    ),
    stats AS (
        SELECT word,
               COUNT(*) AS df1,
               SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS df2,
               SUM(c) AS cf
        FROM wc GROUP BY word
    ),
    scored AS (
        SELECT word, df1, df2, cf,
               round(CAST(df2 AS DOUBLE) / df1, 6) AS adaptation
        FROM stats WHERE df1 >= {_ADAPT_MIN_DF}
    )
    SELECT word, CAST(df1 AS BIGINT) AS df_once,
           CAST(df2 AS BIGINT) AS df_twice,
           CAST(cf AS BIGINT) AS cf, adaptation,
           CAST(rnk AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY adaptation DESC, word) AS rnk
          FROM scored)
    WHERE rnk <= {_ADAPT_TOPK}
    """,
)
def word_adaptation_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word adaptation (Church 2000's "Empirical estimates of
    adaptation", public): P(a word appears AGAIN in a document | it
    appeared at all) = df_twice / df_once — the burstiness signal that
    separates content words (bursty: once a doc mentions a topic it
    keeps mentioning it) from function words (Poisson-ish), which a
    Poisson/unigram independence assumption gets badly wrong.  Top-10
    most adaptive words with df >= 5, ranked on the rounded score with
    the word tiebreak.  The cross-DOC companion of
    ``doc_repetition_scores`` (within-doc) and the document-frequency
    cousin of ``fano_burstiness_by_event_type`` (variance-based).

    Counts are integers; the single ratio rounds at the edge.  One
    tokenize-explode, one (doc, word) contraction, one word rollup,
    one top-k window over word stats."""
    d = load(spark, sf_dir, "documents")
    wc = (
        d.select(
            "doc_id",
            F.explode(F.filter(TX.tokens("text"), lambda x: x != "")).alias(
                "word"
            ),
        )
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stats = wc.groupBy("word").agg(
        F.count(F.lit(1)).alias("df1"),
        F.sum(F.when(F.col("c") >= 2, 1).otherwise(0)).alias("df2"),
        F.sum("c").alias("cf"),
    )
    scored = stats.filter(F.col("df1") >= _ADAPT_MIN_DF).select(
        "word",
        "df1",
        "df2",
        "cf",
        F.round(F.col("df2").cast("double") / F.col("df1"), 6).alias(
            "adaptation"
        ),
    )
    w = Window.orderBy(F.desc("adaptation"), "word")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _ADAPT_TOPK)
        .select(
            "word",
            F.col("df1").cast("long").alias("df_once"),
            F.col("df2").cast("long").alias("df_twice"),
            F.col("cf").cast("long").alias("cf"),
            "adaptation",
            F.col("rnk").cast("long").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# Rocchio relevance feedback — query expansion from top/bottom feedback
# (the feedback member of the retrieval family: BM25 / QL / TF-IDF).
# ---------------------------------------------------------------------------

_ROCCHIO_VOCAB = 20
_ROCCHIO_QUERY = ("spark", "table")
_ROCCHIO_REL = 5
_ROCCHIO_POOL = 20
_ROCCHIO_TOPK = 10


@_register(
    "rocchio_feedback_rerank",
    _TOKENS_CTE
    + f"""
    , w AS (
        SELECT t.doc_id, u.w AS word
        FROM tok t, unnest(list_filter(t.tokens, x -> x <> '')) AS u(w)
    ),
    vocab AS (
        SELECT word FROM (
            SELECT word, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, word)
                       AS rnk
            FROM w GROUP BY word
        ) WHERE rnk <= {_ROCCHIO_VOCAB}
    ),
    tf AS (
        SELECT w.doc_id, w.word, COUNT(*) AS tf
        FROM w JOIN vocab v ON v.word = w.word
        GROUP BY w.doc_id, w.word
    ),
    s0 AS (
        SELECT doc_id, SUM(tf) AS score0
        FROM tf WHERE word IN {_ROCCHIO_QUERY!r}
        GROUP BY doc_id
    ),
    pool AS (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score0 DESC, doc_id)
                   AS rnk
        FROM s0
    ),
    rel AS (SELECT doc_id FROM pool WHERE rnk <= {_ROCCHIO_REL}),
    nonrel AS (SELECT doc_id FROM pool
               WHERE rnk > {_ROCCHIO_POOL - _ROCCHIO_REL}
                 AND rnk <= {_ROCCHIO_POOL}),
    cr AS (
        SELECT v.word,
               CAST(round(CAST(COALESCE(SUM(t.tf), 0) AS DOUBLE)
                          / {_ROCCHIO_REL}, 9) AS DECIMAL(18,9)) AS c
        FROM vocab v
        LEFT JOIN (SELECT tf.word, tf.tf FROM tf
                   JOIN rel ON rel.doc_id = tf.doc_id) t
          ON t.word = v.word
        GROUP BY v.word
    ),
    cn AS (
        SELECT v.word,
               CAST(round(CAST(COALESCE(SUM(t.tf), 0) AS DOUBLE)
                          / {_ROCCHIO_REL}, 9) AS DECIMAL(18,9)) AS c
        FROM vocab v
        LEFT JOIN (SELECT tf.word, tf.tf FROM tf
                   JOIN nonrel ON nonrel.doc_id = tf.doc_id) t
          ON t.word = v.word
        GROUP BY v.word
    ),
    q2 AS (
        SELECT cr.word,
               CAST(CASE WHEN cr.word IN {_ROCCHIO_QUERY!r}
                         THEN 1 ELSE 0 END AS DECIMAL(18,9))
               + CAST(0.75 AS DECIMAL(3,2)) * cr.c
               - CAST(0.15 AS DECIMAL(3,2)) * cn.c AS qw
        FROM cr JOIN cn ON cn.word = cr.word
    ),
    rescored AS (
        SELECT tf.doc_id, SUM(q2.qw * tf.tf) AS score
        FROM tf JOIN q2 ON q2.word = tf.word
        GROUP BY tf.doc_id
    )
    SELECT doc_id, CAST(score AS DOUBLE) AS score,
           CAST(rnk AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk
          FROM rescored)
    WHERE rnk <= {_ROCCHIO_TOPK}
    """,
)
def rocchio_feedback_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rocchio relevance feedback (Rocchio 1971, public — THE classic
    query-expansion loop): an initial term-frequency retrieval for the
    query ("spark", "table") picks a 20-doc pool; the top 5 act as
    positive feedback and the pool's bottom 5 as negative; the
    expanded query q' = q + 0.75 * centroid(rel) - 0.15 *
    centroid(nonrel) over the top-20 vocabulary then re-ranks the
    corpus.  Completes the retrieval shelf: BM25 (lexical ranking),
    QL-Dirichlet (language model), TF-IDF (weighting), RRF (fusion),
    MMR (diversity) — Rocchio adds the FEEDBACK loop.

    Exactness: term frequencies are integers; both centroids round
    ONCE to DECIMAL(18,9); the Rocchio combination uses exact DECIMAL
    literals (0.75, 0.15), so every expanded weight and re-ranking
    score is exact DECIMAL arithmetic — both rank windows tie-break on
    doc_id.

    Scale shape: vocabulary and feedback pools are fixed-k TakeOrdered
    shapes; the tf relation is corpus-linear restricted to 20 words;
    centroids are 20-row aggregates; the re-rank is one broadcast join
    of a 20-row query vector onto the tf relation."""
    d = load(spark, sf_dir, "documents")
    w = d.select(
        "doc_id",
        F.explode(F.filter(TX.tokens("text"), lambda x: x != "")).alias("word"),
    )
    vocab = (
        w.groupBy("word")
        .agg(F.count(F.lit(1)).alias("cf"))
        .orderBy(F.desc("cf"), "word")
        .limit(_ROCCHIO_VOCAB)
        .select("word")
    )
    tf = (
        w.join(F.broadcast(vocab), "word")
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    s0 = (
        tf.filter(F.col("word").isin(*_ROCCHIO_QUERY))
        .groupBy("doc_id")
        .agg(F.sum("tf").alias("score0"))
    )
    pool = s0.orderBy(F.desc("score0"), "doc_id").limit(_ROCCHIO_POOL)
    wp = Window.orderBy(F.desc("score0"), "doc_id")
    pool = pool.withColumn("rnk", F.row_number().over(wp))
    rel = pool.filter(F.col("rnk") <= _ROCCHIO_REL).select("doc_id")
    nonrel = pool.filter(
        (F.col("rnk") > _ROCCHIO_POOL - _ROCCHIO_REL)
        & (F.col("rnk") <= _ROCCHIO_POOL)
    ).select("doc_id")

    def centroid(docs):
        return (
            vocab.join(
                tf.join(docs, "doc_id").select("word", "tf"), "word", "left"
            )
            .groupBy("word")
            .agg(
                F.round(
                    F.coalesce(F.sum("tf"), F.lit(0)).cast("double")
                    / _ROCCHIO_REL,
                    9,
                )
                .cast("decimal(18,9)")
                .alias("c")
            )
        )

    cr = centroid(rel)
    cn = centroid(nonrel).withColumnRenamed("c", "c2")
    q2 = cr.join(cn, "word").select(
        "word",
        (
            F.when(F.col("word").isin(*_ROCCHIO_QUERY), 1)
            .otherwise(0)
            .cast("decimal(18,9)")
            + F.lit(0.75).cast("decimal(3,2)") * F.col("c")
            - F.lit(0.15).cast("decimal(3,2)") * F.col("c2")
        ).alias("qw"),
    )
    rescored = (
        tf.join(F.broadcast(q2), "word")
        .groupBy("doc_id")
        .agg(F.sum(F.col("qw") * F.col("tf")).alias("score"))
    )
    wr = Window.orderBy(F.desc("score"), "doc_id")
    return (
        rescored.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= _ROCCHIO_TOPK)
        .select(
            "doc_id",
            F.col("score").cast("double").alias("score"),
            F.col("rnk").cast("long").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# KWIC concordance — keyword in context, the corpus inspection tool.
# ---------------------------------------------------------------------------

_KWIC_TARGET = "spark"
_KWIC_WIN = 3


@_register(
    "kwic_concordance",
    _TOKENS_CTE
    + f"""
    , pos AS (
        SELECT doc_id, t, i
        FROM (SELECT doc_id, list_filter(tokens, x -> x <> '') AS t
              FROM tok),
             LATERAL (SELECT unnest(generate_series(1, len(t))) AS i)
        WHERE t[i] = '{_KWIC_TARGET}'
    )
    SELECT doc_id, CAST(i AS BIGINT) AS position,
           COALESCE(array_to_string(
               t[greatest(i - {_KWIC_WIN}, 1):i - 1], ' '), '')
               AS left_context,
           COALESCE(array_to_string(
               t[i + 1:least(i + {_KWIC_WIN}, len(t))], ' '), '')
               AS right_context
    FROM pos
    WHERE doc_id % 7 = 0
    """,
)
def kwic_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-in-context concordance for '{w}' (the corpus tool every
    linguist and every data-quality reviewer greps with — KWIC is the
    oldest text-analysis display there is, Luhn 1960, public): every
    occurrence in the 1-in-7 doc sample with {k} words of left/right
    context.  Window edges clamp (DuckDB's inclusive 1-based slices
    and Spark's slice(start, length) spell the SAME clamped ranges —
    the boundary arithmetic is the whole cross-engine content here).

    Scale shape: tokenize + position explode, a pure row filter on the
    target, per-row array slicing — scan-local, no shuffle at all."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    base = d.select(
        "doc_id", F.filter(TX.tokens("text"), lambda x: x != "").alias("t")
    )
    pos = base.select(
        "doc_id", "t", F.posexplode("t").alias("i0", "w")
    ).filter(F.col("w") == _KWIC_TARGET)
    # Spark posexplode is 0-based; the oracle's generate_series is
    # 1-based — normalize to the 1-based position once
    i = F.col("i0") + 1
    left_start = F.greatest(i - _KWIC_WIN, F.lit(1))
    left_len = i - left_start
    right_len = F.least(
        F.lit(_KWIC_WIN), F.size("t") - i
    )
    return pos.select(
        "doc_id",
        i.cast("long").alias("position"),
        F.concat_ws(
            " ", F.slice("t", left_start, F.greatest(left_len, F.lit(0)))
        ).alias("left_context"),
        F.concat_ws(
            " ",
            F.slice(
                "t",
                i + 1,
                F.greatest(right_len, F.lit(0)),
            ),
        ).alias("right_context"),
    )


kwic_concordance.__doc__ = kwic_concordance.__doc__.format(
    w=_KWIC_TARGET, k=_KWIC_WIN
)


# ---------------------------------------------------------------------------
# Hellinger / Bhattacharyya distances between per-source language mixes —
# the bounded, symmetric mixture-drift metrics next to vocab_psi (which is
# unbounded and blows up on vanishing bins).
# ---------------------------------------------------------------------------


@_register(
    "hellinger_lang_mix_by_source_pair",
    """
    WITH cells AS (
        SELECT source, lang, CAST(COUNT(*) AS DECIMAL(19,0)) AS c
        FROM documents GROUP BY 1, 2
    ),
    tot AS (
        SELECT source, CAST(SUM(c) AS DECIMAL(19,0)) AS n
        FROM cells GROUP BY source
    ),
    langs AS (SELECT DISTINCT lang FROM cells),
    grid AS (
        SELECT t.source, t.n, l.lang, COALESCE(c.c, 0) AS c
        FROM tot t CROSS JOIN langs l
        LEFT JOIN cells c ON c.source = t.source AND c.lang = l.lang
    ),
    pairs AS (
        SELECT a.source AS source_a, b.source AS source_b,
               SUM(sqrt((CAST(a.c AS DOUBLE) / CAST(a.n AS DOUBLE))
                        * (CAST(b.c AS DOUBLE) / CAST(b.n AS DOUBLE)))) AS bc,
               CAST(COUNT(*) AS BIGINT) AS n_langs
        FROM grid a JOIN grid b
          ON a.lang = b.lang AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT source_a, source_b, n_langs,
           round(bc, 6) AS bhattacharyya_coef,
           round(sqrt(greatest(1 - bc, 0)), 6) AS hellinger
    FROM pairs
    """,
)
def hellinger_lang_mix_by_source_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bhattacharyya coefficient and Hellinger distance (Bhattacharyya
    1943, Hellinger 1909 — public) between every pair of sources'
    language mixtures: BC = sum_l sqrt(p_l q_l), H = sqrt(1 - BC).
    The BOUNDED drift metrics for categorical mixtures —
    vocab_psi_between_sources diverges on vanishing bins and
    mutual_information_lang_source is a single pooled number; Hellinger
    is a metric in [0,1] per source pair, which is what a corpus
    dashboard thresholds when a new crawl's language mix shifts.

    Parity: counts and totals are exact integers on the zero-filled
    source x lang grid (a language absent from one source contributes
    sqrt(0) = 0, identically on both engines); each pair's BC sums a
    handful of same-magnitude doubles, absorbed by the 6dp edge
    rounding (the chi2_independence convention), and greatest(1-bc, 0)
    clamps the one-ulp-past-1.0 case before the sqrt on both sides.

    Scale shape: one map-side-combinable (source, lang) contraction;
    everything after is grid-sized (|sources| x |langs|).  Output: one
    row per unordered source pair."""
    d = load(spark, sf_dir, "documents")
    cells = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("decimal(19,0)").alias("c")
    )
    tot = cells.groupBy("source").agg(
        F.sum("c").cast("decimal(19,0)").alias("n")
    )
    langs = cells.select("lang").distinct()
    grid = (
        tot.crossJoin(langs)
        .join(cells, ["source", "lang"], "left")
        .select(
            "source", "n", "lang", F.coalesce(F.col("c"), F.lit(0)).alias("c")
        )
    )
    a, b = grid.alias("a"), grid.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(
            F.sum(
                F.sqrt(
                    (F.col("a.c").cast("double") / F.col("a.n").cast("double"))
                    * (F.col("b.c").cast("double") / F.col("b.n").cast("double"))
                )
            ).alias("bc"),
            F.count(F.lit(1)).cast("long").alias("n_langs"),
        )
    )
    return pairs.select(
        "source_a",
        "source_b",
        "n_langs",
        F.round("bc", 6).alias("bhattacharyya_coef"),
        F.round(F.sqrt(F.greatest(1 - F.col("bc"), F.lit(0.0))), 6).alias(
            "hellinger"
        ),
    )


# ---------------------------------------------------------------------------
# Heaps-law vocabulary-growth checkpoints — V(n) and T(n) at doubling
# document counts: the corpus-saturation read behind dedup/quality audits.
# Integers only (the zipf precedent): no log-log fit, because cross-engine
# libm float fits are the portability trap the whitespace contract bans.
# ---------------------------------------------------------------------------

_HEAPS_CHECKPOINTS = [2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096]


@_register(
    "heaps_vocab_growth_checkpoints",
    _TOKENS_CTE
    + f"""
    , ranked_docs AS (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) AS rn,
               len(tokens) AS tc
        FROM tok
    ),
    first_seen AS (
        SELECT u.token, MIN(r.rn) AS first_rn
        FROM (SELECT doc_id, unnest(tokens) AS token FROM tok) u
        JOIN ranked_docs r ON r.doc_id = u.doc_id
        GROUP BY u.token
    ),
    cps AS (
        SELECT unnest(ARRAY{_HEAPS_CHECKPOINTS}) AS n_docs
    ),
    valid AS (
        SELECT n_docs FROM cps
        WHERE n_docs <= (SELECT COUNT(*) FROM ranked_docs)
    ),
    t AS (
        SELECT v.n_docs, CAST(SUM(CASE WHEN r.rn <= v.n_docs THEN r.tc
                                       ELSE 0 END) AS BIGINT) AS total_tokens
        FROM valid v CROSS JOIN ranked_docs r
        GROUP BY v.n_docs
    ),
    vv AS (
        SELECT v.n_docs, CAST(SUM(CASE WHEN f.first_rn <= v.n_docs THEN 1
                                       ELSE 0 END) AS BIGINT) AS vocab_size
        FROM valid v CROSS JOIN first_seen f
        GROUP BY v.n_docs
    )
    SELECT CAST(t.n_docs AS BIGINT) AS n_docs, t.total_tokens, vv.vocab_size,
           round(CAST(vv.vocab_size AS DOUBLE) / t.total_tokens, 6)
               AS vocab_per_token
    FROM t JOIN vv ON t.n_docs = vv.n_docs
    """,
)
def heaps_vocab_growth_checkpoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth checkpoints (Heaps 1978, public):
    distinct-vocabulary size V and cumulative token count T after the
    first n documents (doc_id order), at doubling n — the checkpoint
    row set IS the saturation curve (V ~ k T^beta; a crawl full of
    boilerplate or duplicates flattens early, an over-filtered corpus
    keeps climbing).  The zipf_rank_frequency_curve convention applies:
    exact integers only, no in-engine log-log fit (libm logs are the
    cross-engine trap), plus one single-division type-token ratio.

    V(n) never needs a corpus-ordered cumsum: each token contracts to
    its FIRST document rank (one grouped MIN), and every checkpoint is
    a conditional count over that contraction — the checkpoint grid is
    a 12-row broadcast.  The one ordered window ranks the DOCUMENT
    table (the corpus catalog, ~100x smaller than the token relation;
    the mann_whitney dimension-window precedent).

    Scale shape: one token explode feeding one grouped MIN
    (map-side-combinable), one doc-sized rank window, two
    checkpoint-grid conditional aggregates.  Output: <= 12 rows."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", TX.tokens("text").alias("toks"))
    ranked = tok.select(
        "doc_id",
        F.size("toks").alias("tc"),
        F.row_number().over(Window.orderBy("doc_id")).alias("rn"),
    )
    first_seen = (
        tok.select("doc_id", F.explode("toks").alias("token"))
        .join(ranked.select("doc_id", "rn"), "doc_id")
        .groupBy("token")
        .agg(F.min("rn").alias("first_rn"))
    )
    n_docs_total = ranked.agg(F.count(F.lit(1)).alias("nd"))
    cps = spark.createDataFrame(
        [(c,) for c in _HEAPS_CHECKPOINTS], "n_docs long"
    )
    valid = cps.crossJoin(F.broadcast(n_docs_total)).filter(
        F.col("n_docs") <= F.col("nd")
    ).select("n_docs")
    t = (
        F.broadcast(valid)
        .crossJoin(ranked.select("rn", "tc"))
        .groupBy("n_docs")
        .agg(
            F.sum(
                F.when(F.col("rn") <= F.col("n_docs"), F.col("tc")).otherwise(0)
            )
            .cast("long")
            .alias("total_tokens")
        )
    )
    vv = (
        F.broadcast(valid)
        .crossJoin(first_seen)
        .groupBy("n_docs")
        .agg(
            F.sum(
                F.when(F.col("first_rn") <= F.col("n_docs"), 1).otherwise(0)
            )
            .cast("long")
            .alias("vocab_size")
        )
    )
    return (
        t.join(vv, "n_docs")
        .select(
            F.col("n_docs").cast("long").alias("n_docs"),
            "total_tokens",
            "vocab_size",
            F.round(
                F.col("vocab_size").cast("double") / F.col("total_tokens"), 6
            ).alias("vocab_per_token"),
        )
    )


# ---------------------------------------------------------------------------
# Round 14: per-source LM evaluation — corpus-model cross-entropy /
# perplexity per source, and per-source KL divergence from the corpus
# unigram mixture over a bounded vocabulary.
# ---------------------------------------------------------------------------


@_register(
    "bigram_perplexity_by_source",
    _TOKENS_CTE
    + """
    , pos AS (
        SELECT doc_id, tokens,
               unnest(generate_series(1, len(tokens) - 1)) AS i
        FROM tok
        WHERE len(tokens) >= 2
    ),
    bigrams AS (
        SELECT d.source, b.w1, b.w2
        FROM (SELECT doc_id, tokens[i] AS w1, tokens[i + 1] AS w2 FROM pos) b
        JOIN documents d ON d.doc_id = b.doc_id
    ),
    big AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
            FROM bigrams GROUP BY w1, w2),
    hist AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM big GROUP BY w1),
    voc AS (SELECT CAST(COUNT(DISTINCT w2) AS BIGINT) AS v FROM bigrams),
    sb AS (
        SELECT source, w1, w2, CAST(COUNT(*) AS DECIMAL(19,0)) AS n_sw
        FROM bigrams GROUP BY source, w1, w2
    ),
    terms AS (
        SELECT s.source, s.n_sw,
               CAST(round(ln((g.c12 + 1.0) / (h.c1 + voc.v)), 6)
                    AS DECIMAL(18,6)) AS lp
        FROM sb s
        JOIN big g ON g.w1 = s.w1 AND g.w2 = s.w2
        JOIN hist h ON h.w1 = s.w1
        CROSS JOIN voc
    )
    SELECT source,
           CAST(SUM(n_sw) AS BIGINT) AS n_bigrams,
           round(-CAST(SUM(n_sw * lp) AS DOUBLE) / CAST(SUM(n_sw) AS DOUBLE), 6)
               AS cross_entropy_nats,
           round(exp(-CAST(SUM(n_sw * lp) AS DOUBLE)
                     / CAST(SUM(n_sw) AS DOUBLE)), 6) AS perplexity
    FROM terms
    GROUP BY source
    """,
)
def bigram_perplexity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source cross-entropy and perplexity under the CORPUS-trained
    add-one bigram model (Jurafsky & Martin ch. 3, public): P(w2|w1) =
    (c(w1,w2)+1)/(c(w1)+V) — the mixture-eval table a data-curation
    owner reads to see which source the corpus LM finds surprising
    (high perplexity flags register drift or noise; the per-SOURCE twin
    of ``bigram_lm_scores``'s per-document filter, with smoothing so
    the score is a proper held-in evaluation).

    Determinism: the per-bigram-TYPE log-probability is ONE identical
    double expression rounded to 6dp and fixed as DECIMAL(18,6); the
    per-source sum weights those constants by exact DECIMAL counts
    (order-free), and the final division/exp run at the edge.

    Scale shape: the model is two grouped counts on the exploded
    bigram stream (the bigram_lm_scores shuffle); the per-source
    contraction groups by (source, w1, w2) BEFORE joining model
    probabilities, so the join moves bigram TYPES, not tokens.
    Output: one row per source."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "source", "doc_id", TX.tokens("text").alias("tk")
    ).filter(F.size("tk") >= 2)
    bigrams = toks.select(
        "source",
        F.explode(F.sequence(F.lit(0), F.size("tk") - 2)).alias("i"),
        F.col("tk"),
    ).select(
        "source",
        F.col("tk")[F.col("i")].alias("w1"),
        F.col("tk")[F.col("i") + 1].alias("w2"),
    )
    big = bigrams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )
    hist = big.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    voc = bigrams.agg(F.countDistinct("w2").cast("long").alias("v"))
    sb = bigrams.groupBy("source", "w1", "w2").agg(
        F.count(F.lit(1)).cast("decimal(19,0)").alias("n_sw")
    )
    terms = (
        sb.join(big, ["w1", "w2"])
        .join(hist, "w1")
        .crossJoin(F.broadcast(voc))
        .select(
            "source",
            "n_sw",
            F.round(
                F.log((F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.col("v"))),
                6,
            )
            .cast("decimal(18,6)")
            .alias("lp"),
        )
    )
    h = -F.sum(F.col("n_sw") * F.col("lp")).cast("double") / F.sum(
        "n_sw"
    ).cast("double")
    return terms.groupBy("source").agg(
        F.sum("n_sw").cast("long").alias("n_bigrams"),
        F.round(h, 6).alias("cross_entropy_nats"),
        F.round(F.exp(h), 6).alias("perplexity"),
    )


@_register(
    "ccnet_perplexity_buckets",
    _TOKENS_CTE
    + """
    , pos AS (
        SELECT doc_id, tokens,
               unnest(generate_series(1, len(tokens) - 1)) AS i
        FROM tok
        WHERE len(tokens) >= 2
    ),
    bigrams AS (
        SELECT d.doc_id, d.source, b.w1, b.w2
        FROM (SELECT doc_id, tokens[i] AS w1, tokens[i + 1] AS w2 FROM pos) b
        JOIN documents d ON d.doc_id = b.doc_id
    ),
    big AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
            FROM bigrams GROUP BY w1, w2),
    hist AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM big GROUP BY w1),
    voc AS (SELECT CAST(COUNT(DISTINCT w2) AS BIGINT) AS v FROM big),
    db AS (
        SELECT doc_id, source, w1, w2, CAST(COUNT(*) AS DECIMAL(19,0)) AS n_dw
        FROM bigrams GROUP BY doc_id, source, w1, w2
    ),
    doch AS (
        SELECT s.doc_id, any_value(s.source) AS source,
               round(-CAST(SUM(s.n_dw * CAST(round(
                         ln((g.c12 + 1.0) / (h.c1 + voc.v)), 6)
                         AS DECIMAL(18,6))) AS DOUBLE)
                     / CAST(SUM(s.n_dw) AS DOUBLE), 6) AS h6
        FROM db s
        JOIN big g ON g.w1 = s.w1 AND g.w2 = s.w2
        JOIN hist h ON h.w1 = s.w1
        CROSS JOIN voc
        GROUP BY s.doc_id
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM doch),
    perv AS (SELECT h6, CAST(COUNT(*) AS BIGINT) AS cnt FROM doch GROUP BY h6),
    cumv AS (
        SELECT h6, SUM(cnt) OVER (ORDER BY h6
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM perv
    ),
    th AS (
        SELECT MIN(CASE WHEN cum >= CAST(floor((t.n + 2) / 3.0) AS BIGINT)
                        THEN h6 END) AS t1,
               MIN(CASE WHEN cum >= CAST(floor((2 * t.n + 2) / 3.0) AS BIGINT)
                        THEN h6 END) AS t2
        FROM cumv CROSS JOIN tot t
    )
    SELECT d.source,
           CASE WHEN d.h6 <= th.t1 THEN 'head'
                WHEN d.h6 <= th.t2 THEN 'middle'
                ELSE 'tail' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           round(CAST(SUM(CAST(d.h6 AS DECIMAL(18,6))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS mean_logloss
    FROM doch d CROSS JOIN th
    GROUP BY 1, 2
    """,
)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020, public):
    score EVERY document's cross-entropy under the corpus-trained
    add-one bigram LM (the :func:`bigram_perplexity_by_source` model,
    verbatim), split the corpus at the GLOBAL logloss terciles, and
    release per (source, head/middle/tail) document counts with mean
    logloss — the quality-filter table a curation pipeline thresholds
    on (CCNet keeps 'head', reviews 'middle', drops 'tail').

    Pre-registered distinctness vs ``bigram_perplexity_by_source``:
    that op EVALUATES the LM per source (one row per source); this one
    SCORES EACH DOCUMENT and buckets — the filtering operator itself,
    whose output grain is (source x bucket) membership.

    Determinism: per-bigram-type log-probs are 6dp DECIMAL(18,6)
    constants (the LM convention); each document's logloss weights
    them by exact DECIMAL counts, divides once, and rounds to 6dp —
    and the tercile thresholds are ORDER STATISTICS of those rounded
    values, computed as min-above-ceil(k·n/3) on the logloss value
    contraction's running count (no engine percentile function, whose
    boundary semantics differ between engines).  Docs with < 2 tokens
    have no bigram and are excluded (unscorable) on both sides.

    Scale shape: the LM build is the existing two grouped counts on
    the exploded bigram stream; the model type table PERSISTS
    (vocabulary-bounded) so hist/voc derive without re-exploding the
    corpus, and V counts distinct continuations over TYPES (equal by
    definition to the stream count — the r14 single-scan lesson); doc
    scoring contracts to (doc, bigram type) BEFORE the model join; the
    per-doc score frame PERSISTS (one row per doc) so the
    threshold/total/bucket branches reuse it; the threshold pass is a
    value-grid cumsum via :func:`grouped_running_sum`, and bucketing
    is a scalar broadcast.  Output: one row per (source, bucket) —
    <= 3·|sources|."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "source", "doc_id", TX.tokens("text").alias("tk")
    ).filter(F.size("tk") >= 2)
    bigrams = toks.select(
        "source",
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.size("tk") - 2)).alias("i"),
        F.col("tk"),
    ).select(
        "source",
        "doc_id",
        F.col("tk")[F.col("i")].alias("w1"),
        F.col("tk")[F.col("i") + 1].alias("w2"),
    )
    big = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
        .persist()
    )
    hist = big.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    voc = big.agg(F.countDistinct("w2").cast("long").alias("v"))
    db = bigrams.groupBy("doc_id", "source", "w1", "w2").agg(
        F.count(F.lit(1)).cast("decimal(19,0)").alias("n_dw")
    )
    lp = (
        F.round(
            F.log((F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.col("v"))), 6
        )
        .cast("decimal(18,6)")
        .alias("lp")
    )
    doch = (
        db.join(big, ["w1", "w2"])
        .join(hist, "w1")
        .crossJoin(F.broadcast(voc))
        .select("doc_id", "source", "n_dw", lp)
        .groupBy("doc_id")
        .agg(
            F.first("source").alias("source"),
            F.round(
                -F.sum(F.col("n_dw") * F.col("lp")).cast("double")
                / F.sum("n_dw").cast("double"),
                6,
            ).alias("h6"),
        )
        .persist()
    )
    tot = doch.agg(F.count(F.lit(1)).cast("long").alias("n"))
    perv = doch.groupBy("h6").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    cumv = grouped_running_sum(
        perv.withColumn("__one", F.lit(1)), "__one", ["h6"], ["cnt"], out_col=["cum"]
    )
    k1 = F.floor((F.col("n") + 2) / 3.0).cast("long")
    k2 = F.floor((2 * F.col("n") + 2) / 3.0).cast("long")
    th = (
        cumv.crossJoin(F.broadcast(tot))
        .agg(
            F.min(F.when(F.col("cum") >= k1, F.col("h6"))).alias("t1"),
            F.min(F.when(F.col("cum") >= k2, F.col("h6"))).alias("t2"),
        )
    )
    bucket = (
        F.when(F.col("h6") <= F.col("t1"), F.lit("head"))
        .when(F.col("h6") <= F.col("t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket")
    )
    return (
        doch.crossJoin(F.broadcast(th))
        .groupBy("source", bucket)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(
                F.sum(F.col("h6").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("mean_logloss"),
        )
    )


_KL_VOCAB_K = 200  # bounded vocabulary: top-K corpus tokens + __other__


@_register(
    "kl_divergence_source_vs_corpus",
    _TOKENS_CTE
    + f"""
    , tk AS (
        SELECT d.source, u.token
        FROM tok t
        JOIN documents d ON d.doc_id = t.doc_id
        JOIN (SELECT doc_id, unnest(tokens) AS token FROM tok) u
          ON u.doc_id = t.doc_id
        WHERE u.token <> ''
    ),
    topv AS (
        SELECT token FROM (
            SELECT token, COUNT(*) AS c FROM tk GROUP BY token
            ORDER BY c DESC, token LIMIT {_KL_VOCAB_K}
        )
    ),
    bucketed AS (
        SELECT tk.source,
               CASE WHEN v.token IS NOT NULL THEN tk.token
                    ELSE '__other__' END AS bucket
        FROM tk LEFT JOIN topv v ON v.token = tk.token
    ),
    buckets AS (SELECT DISTINCT bucket FROM bucketed),
    nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM buckets),
    src_tot AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS ns
        FROM bucketed GROUP BY source
    ),
    cell AS (
        SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS c
        FROM bucketed GROUP BY source, bucket
    ),
    corpus AS (
        SELECT bucket, CAST(SUM(c) AS BIGINT) AS cc FROM cell GROUP BY bucket
    ),
    corpus_tot AS (SELECT CAST(SUM(cc) AS BIGINT) AS n FROM corpus),
    grid AS (
        SELECT s.source, s.ns, b.bucket, COALESCE(c.c, 0) AS c,
               co.cc, ct.n, nb.k
        FROM src_tot s
        CROSS JOIN buckets b
        LEFT JOIN cell c ON c.source = s.source AND c.bucket = b.bucket
        JOIN corpus co ON co.bucket = b.bucket
        CROSS JOIN corpus_tot ct CROSS JOIN nb
    )
    SELECT source,
           any_value(CAST(ns AS BIGINT)) AS n_tokens,
           any_value(k) AS n_buckets,
           round(CAST(SUM(CAST(round(((c + 1.0) / (ns + k))
                     * ln(((c + 1.0) / (ns + k)) / ((cc + 1.0) / (n + k))),
                     6) AS DECIMAL(18,6))) AS DOUBLE), 6) + 0 AS kl_nats
    FROM grid
    GROUP BY source
    """,
)
def kl_divergence_source_vs_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL divergence (Kullback & Leibler 1951, public) of each source's
    token distribution from the pooled corpus distribution, over the
    bounded top-{k} vocabulary plus an ``__other__`` tail bucket with
    add-one smoothing — the per-source drift DIRECTION reading next to
    vocab_psi_between_sources (symmetric, two named sources) and
    hellinger_lang_mix (language cells): KL(source || corpus) is the
    expected per-token log-loss of coding a source with corpus
    statistics, i.e. the DSIR-style importance signal per source.

    Determinism: the bigram_perplexity discipline — a BOUNDED ({k}+1)
    bucket grid (zero-filled per source), exact integer counts
    everywhere, each double p*ln(p/q) term rounded 6dp and pinned to
    DECIMAL(18,6) BEFORE the sum (exact decimal addition, so the total
    is partition/order-independent; ADVICE r14), and one 6dp edge
    round.

    Scale shape: one exploded-token (source, token) contraction, a
    TakeOrdered top-K, a broadcast membership join, then grid-sized
    (|sources| x {k}+1) algebra.  Output: one row per source."""
    d = load(spark, sf_dir, "documents")
    tk = d.select(
        "source", F.explode(TX.tokens(F.col("text"))).alias("token")
    ).filter(F.col("token") != "")
    topv = (
        tk.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "token")
        .limit(_KL_VOCAB_K)
        .select("token")
    )
    bucketed = tk.join(
        F.broadcast(topv.withColumn("__in", F.lit(1))), "token", "left"
    ).select(
        "source",
        F.when(F.col("__in").isNotNull(), F.col("token"))
        .otherwise(F.lit("__other__"))
        .alias("bucket"),
    )
    buckets = bucketed.select("bucket").distinct()
    nb = buckets.agg(F.count(F.lit(1)).cast("long").alias("k"))
    src_tot = bucketed.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("ns")
    )
    cell = bucketed.groupBy("source", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    corpus = cell.groupBy("bucket").agg(F.sum("c").cast("long").alias("cc"))
    corpus_tot = corpus.agg(F.sum("cc").cast("long").alias("n"))
    grid = (
        src_tot.crossJoin(buckets)
        .join(cell, ["source", "bucket"], "left")
        .select(
            "source", "ns", "bucket", F.coalesce(F.col("c"), F.lit(0)).alias("c")
        )
        .join(corpus, "bucket")
        .crossJoin(F.broadcast(corpus_tot))
        .crossJoin(F.broadcast(nb))
    )
    p = (F.col("c") + F.lit(1.0)) / (F.col("ns") + F.col("k"))
    q = (F.col("cc") + F.lit(1.0)) / (F.col("n") + F.col("k"))
    # ADVICE r14: pin each p*ln(p/q) term to DECIMAL(18,6) BEFORE the
    # sum (the bigram_perplexity convention) so the ~201-term total is
    # exact decimal addition — partition/order-independent — instead of
    # FP summation that could flip the 6dp edge round between engines.
    term = F.round(p * F.log(p / q), 6).cast("decimal(18,6)")
    return grid.groupBy("source").agg(
        F.first(F.col("ns")).alias("n_tokens"),
        F.first(F.col("k")).alias("n_buckets"),
        (F.round(F.sum(term).cast("double"), 6) + F.lit(0)).alias("kl_nats"),
    )


kl_divergence_source_vs_corpus.__doc__ = (
    kl_divergence_source_vs_corpus.__doc__.replace("{k}", str(_KL_VOCAB_K))
)
