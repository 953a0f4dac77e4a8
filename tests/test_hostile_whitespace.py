"""Cross-engine whitespace-portability parity on a hostile corpus.

Round-7 post-mortem: the driver's corpus contained U+000B (vertical tab),
on which Java regex ``\\s`` (Spark) and RE2 ``\\s`` (DuckDB) disagree —
Java's class includes it, RE2's does not — so two oracle-paired queries
hash-FAILed at the driver while every local replay stayed green.  The fix
(``functions/text.py:WS_REGEX``) spells the whitespace class explicitly.

These tests make the portability contract TESTED rather than assumed:
a synthetic ``documents`` table stuffed with hostile whitespace (U+000B,
NBSP, U+2028/U+2029, leading/trailing tabs, empty and whitespace-only
documents) is materialized as parquet, and the real registered
queries + their DuckDB oracles run over it through the same comparator
the driver uses.  If either engine ever tokenizes, normalizes or
fingerprints any of these documents differently, these tests fail before
the driver does.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from data_engineering_sf_mobile_food_facilities_public_spark.functions import text as TX
from tests.conftest import SF_SMOKE
from tests.parity import TESTDATA_TABLES, compare

from pyspark.sql import functions as F

# Every way whitespace can be hostile: the r7 driver killer (U+000B),
# Unicode spaces neither engine's \s matches (both engines must AGREE to
# not split on them), boundary whitespace (leading/trailing empty-token
# behavior), and degenerate documents.
HOSTILE_DOCS = [
    ("vertical tab between words", "alpha\x0bbeta"),
    ("vertical tab run", "alpha\x0b\x0b\x0bbeta"),
    ("leading + trailing vertical tab", "\x0balpha beta\x0b"),
    ("nbsp between words", "alpha\xa0beta"),
    ("line separator u2028", "alpha beta"),
    ("paragraph separator u2029", "alpha beta"),
    ("leading tab", "\talpha beta"),
    ("trailing tab", "alpha beta\t"),
    ("leading newline", "\nalpha beta"),
    ("crlf between words", "alpha\r\nbeta"),
    ("form feed", "alpha\fbeta"),
    ("empty document", ""),
    ("whitespace-only spaces", "   "),
    ("whitespace-only mixed", " \t\x0b\f\r\n "),
    ("mixed everything", "\x0b the\tquick brown\xa0fox \x0b jumps \r\n"),
    ("normal control", "the quick brown fox jumps over the lazy dog"),
]


@pytest.fixture(scope="module")
def hostile_dir(spark, tmp_path_factory):
    """A testdata-shaped dir whose ``documents`` table is the hostile
    corpus; all other tables symlink to the sf0.001 fixtures so every
    registered query / oracle pair can run against it unchanged."""
    root = tmp_path_factory.mktemp("hostile_sf")
    for t in TESTDATA_TABLES:
        if t != "documents":
            os.symlink(f"{SF_SMOKE}/{t}.parquet", root / f"{t}.parquet")
    rows = [
        (i, text, ["en", "de", "es", "fr"][i % 4], f"src{i % 3}", len(text))
        for i, (_, text) in enumerate(HOSTILE_DOCS)
    ]
    (
        spark.createDataFrame(
            rows, "doc_id: long, text: string, lang: string, source: string, n_chars: long"
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(str(root / "_documents_dir"))
    )
    # single plain parquet file, like the driver fixtures
    part = next((root / "_documents_dir").glob("part-*.parquet"))
    os.rename(part, root / "documents.parquet")
    return str(root)


def test_spark_duckdb_agree_on_hostile_token_counts(spark):
    """Regression for the r7 root cause: per-document token counts must be
    identical in Spark (Java regex) and DuckDB (RE2) for every hostile
    case — including U+000B, where the two engines' \\s shorthands are
    PROVEN divergent (Java splits, RE2 does not)."""
    df = spark.createDataFrame(
        [(n, t) for n, t in HOSTILE_DOCS], "name: string, text: string"
    )
    got = {
        r["name"]: (r["n_tok"], r["fp"])
        for r in df.select(
            "name",
            TX.token_count("text").alias("n_tok"),
            TX.fingerprint("text").alias("fp"),
        ).collect()
    }
    con = duckdb.connect()
    ws = TX.WS_REGEX  # DuckDB plain '…' literals do not unescape backslashes
    for name, text in HOSTILE_DOCS:
        n_tok, fp = con.execute(
            f"SELECT len(regexp_split_to_array(trim(?), '{ws}')), "
            f"md5(regexp_replace(lower(trim(?)), '{ws}', ' ', 'g'))",
            [text, text],
        ).fetchone()
        assert got[name] == (n_tok, fp), (
            f"{name!r}: spark={got[name]} duckdb={(n_tok, fp)} text={text!r}"
        )
    con.close()


def test_java_shorthand_ws_would_still_diverge(spark):
    """Documents WHY WS_REGEX exists: the engines' \\s shorthands really
    do disagree on U+000B.  If a Spark upgrade ever changes this, the
    comment in functions/text.py should be revisited — but WS_REGEX stays
    correct either way."""
    (n_java,) = spark.createDataFrame([("a\x0bb",)], "text: string").select(
        F.size(F.split(F.trim("text"), r"\s+"))
    ).first()
    con = duckdb.connect()
    (n_re2,) = con.execute(
        r"SELECT len(regexp_split_to_array(trim('a' || chr(11) || 'b'), '\s+'))"
    ).fetchone()
    con.close()
    assert n_java == 2 and n_re2 == 1  # the divergence the fix neutralizes


# The full oracle-paired text family, replayed on the hostile corpus with
# the driver's own comparator.  Names are matched by membership in the
# registry so a rename fails loudly rather than silently skipping.
_HOSTILE_PANEL = [
    # r13 Hellinger: hostile docs concentrate languages in few sources;
    # a lang absent from one source contributes sqrt(0) identically and
    # single-source corpora emit zero pairs on both engines
    "hellinger_lang_mix_by_source_pair",
    # r13 Heaps checkpoints: the hostile corpus has fewer docs than
    # most checkpoints (they drop identically); whitespace-only and
    # empty docs contribute zero/empty token arrays whose first-seen
    # ranks and counts must agree exactly
    "heaps_vocab_growth_checkpoints",
    "text_token_stats",
    "text_quality_scores",
    "text_lang_id",
    "text_fingerprints",
    "exact_dedup_documents",
    "repetition_filter_stats",
    "corpus_curation_pipeline",
    "token_budget_mixture",
    "training_data_pipeline",
    "minhash_lsh_near_dup",
    "near_dup_components",
    "ngram_jaccard_pairs",
    # round-8 additions — every new tokenizer consumer joins the panel
    "vocab_topk_overlap_by_source",
    "benchmark_span_decontamination",
    "chunk_documents_overlapping",
    "split_and_pack_bins",
    "leakage_guarded_split",
    "near_dup_quality_survivors",
    "minhash_estimate_calibration",
    "curriculum_interleave_order",
    "dataset_datasheet_by_source",
    # lossless prefix filtering consumes the same shingle relation: the
    # hostile corpus (empty docs, whitespace-only docs, exotic spaces)
    # must prune identically on both engines
    "prefix_filtered_jaccard_pairs",
    # r14: the sampled audit tier consumes the same shingle relation
    # through an md5 document lane — the lane arithmetic and the pruned
    # join must agree on hostile docs on both engines
    "prefix_jaccard_sampled_pairs",
    # r14 LM eval pair: whitespace-only docs yield zero bigrams (the
    # len >= 2 filter) and empty tokens must drop from the KL vocab;
    # single-source corpora still release (KL ~ 0 vs themselves)
    "bigram_perplexity_by_source",
    "kl_divergence_source_vs_corpus",
    # r15: document-level scoring under the same corpus LM — unscorable
    # docs (zero bigrams) must drop identically, and the tercile
    # thresholds are order statistics over very few distinct logloss
    # values (heavy ties: whole buckets can collapse to one value)
    "ccnet_perplexity_buckets",
    # conjunctive search explodes the token array into postings: empty
    # tokens from whitespace-only docs must be dropped identically, and
    # the top-df selection must tie-break identically on both engines
    "inverted_index_conjunctive",
    # round-9 additions: the Gopher rules and BM25 consume the same
    # filtered-token relation — empty/whitespace-only docs must yield
    # zero trigrams, NULL-guarded divisions, and zero-length BM25 docs
    # identically on both engines
    "gopher_dup_trigram_chars",
    "gopher_quality_rules",
    "bm25_topk_docs",
    "gopher_curation_pipeline",
    # r9 TextRank: empty/whitespace-only docs contribute no edges;
    # single-token docs have no pairs; uniform graphs are pure word
    # tiebreaks at every rank
    "textrank_keywords",
    # r9 image aHash near-dup: every hostile doc still synthesizes a
    # decodable image (md5 of empty/whitespace text is defined); flat
    # images (no pixel above the mean) hash to 0 and all pair up
    "image_ahash_near_dup",
    # r10 pHash twin: same synthesized corpus; flat images have every
    # AC coefficient exactly 0 -> sign bit 0 -> hash 0 and all pair up
    "image_phash_near_dup",
    # r11 audio member of the crossover: every hostile doc still
    # synthesizes a decodable WAV (md5 of empty/whitespace text is
    # defined); clips whose second-order band differences are never
    # positive fingerprint to 0 and all pair up
    "audio_fingerprint_near_dup",
    # r11 scene change: every hostile doc synthesizes a decodable
    # animated GIF; single-frame clips (md5[1] % 3 == 0) must emit
    # ZERO transitions identically on both engines
    "video_scene_change_gif",
    # r11 QL-Dirichlet: empty/whitespace-only docs have dl = 0 and
    # score from the smoothed collection model alone; query terms
    # absent from the hostile corpus take the cf > 0 guard to 0
    # identically on both engines
    "query_likelihood_dirichlet_topk",
    # r11 Kneser-Ney: empty and single-token docs contribute no
    # bigrams and must vanish from the scores; a hostile corpus where
    # some history has ONE continuation exercises nf = 1 discount mass
    "kneser_ney_bigram_scores",
    # r11 MTLD: empty/whitespace-only docs vanish via the token floor;
    # single-token docs have TTR exactly 1 -> zero factors -> NULL
    # MTLD identically; all-distinct docs exercise the pure partial
    # factor on both engines
    "mtld_lexical_diversity",
    # r11 Burrows' Delta: sources whose every doc is empty get t = 0
    # rows only if they emitted tokens (they vanish from tot
    # identically); words uniform across all sources have exactly-zero
    # two-pass deviations and must drop via the std > 0 gate on both
    # engines; the top-word tiebreak must agree on tied counts
    "burrows_delta_sources",
    # r11 boilerplate pass consumes the shingle relation + corpus df:
    # empty/whitespace-only docs must vanish from the shingle relation
    # identically, and hostile-doc shingles shared across the corpus
    # must cross the df threshold identically on both engines
    "boilerplate_ngram_removal",
    # r11 RAKE: empty/whitespace-only docs must vanish at the token
    # filter identically; all-stopword docs produce zero candidate
    # phrases; the decimal word-score rounding must agree before the
    # phrase sum on both engines
    "rake_keywords_by_source",
    # r11 keyness: empty/whitespace-only docs contribute no tokens; a
    # word confined to ONE source has b = 0 (term contributes exactly
    # 0); the integer cross-multiplied direction sign must agree
    "dunning_llr_keyness",
    # r11 Chao1: an all-hapax source takes the no-doubleton
    # bias-corrected branch (F1(F1-1)/2) — both engines must branch
    # identically; empty docs contribute no tokens
    "chao1_vocab_richness",
    # r11 adaptation: hostile docs where every word is hapax give
    # df_twice = 0 (adaptation exactly 0); the df floor must prune
    # identically; rank ties on equal adaptation break on the word
    "word_adaptation_scores",
    # r11 Rocchio: hostile corpora where the query terms never occur
    # leave the feedback pool EMPTY (centroids all zero, q' = q) —
    # both engines must degrade to the raw query identically; vocab
    # rank ties on equal cf break on the word
    "rocchio_feedback_rerank",
    # r11 KWIC: target at position 1 / at the last token clamps the
    # context windows to EMPTY strings (never NULL) identically;
    # hostile docs without the target vanish at the row filter
    "kwic_concordance",
    # winnowing consumes positioned shingles: short/empty/whitespace-only
    # docs exercise the partial-window single-fingerprint rule
    "winnowing_fingerprints",
    "winnowing_overlap_pairs",
    # r10 DSIR: empty/whitespace-only docs have zero grams -> weight
    # 0.000000 exactly on both engines, still ranked for selection; the
    # per-bucket pre-rounded DECIMAL log-ratios must sum identically
    "dsir_importance_weights",
    # r10 Good-Turing: empty/whitespace-only docs contribute no words;
    # a source whose every word is hapax has p_unseen exactly 1.0 and
    # coverage exactly 0.0 on both engines
    "good_turing_unseen_mass",
    # r10 Cohen's kappa: empty/whitespace docs predict 'und' (never in
    # the label margin -> zero product term), and a degenerate
    # single-class corpus must yield pe=1 -> NULL kappa identically
    "cohens_kappa_langid",
    # r10 Yule's K: an all-hapax source has K exactly 0; empty and
    # whitespace-only docs contribute no spectrum mass; sources whose
    # every doc is empty must vanish via the HAVING guard identically
    "yules_k_by_source",
    # r10 water filling: empty/whitespace-only sources vanish via the
    # avail > 0 guard; tiny sources must SATURATE and redistribute
    # their unused share with bit-identical integer level math
    "water_filling_token_caps",
    # containment divides by the SMALLER set: degenerate short docs are
    # exactly where min(|A|,|B|) goes to 1
    "containment_pairs",
    # pairwise diagonal-run detection consumes positioned shingles:
    # empty/whitespace-only docs must vanish identically and the island
    # window must see identical positions on both engines
    "longest_shared_passage_pairs",
    # greedy coverage consumes the shingle relation: short/empty docs
    # must drop out of the universe identically, and the argmax
    # tie-break must agree when gains collide on degenerate corpora
    "greedy_coverage_selection",
    # Heaps/Zipf consume the tokenizer and the shingle relation:
    # empty and whitespace-only docs must contribute identical
    # empty-string types and vanish from shingles identically
    "heaps_law_vocab_growth",
    "zipf_rank_frequency_curve",
    # the encoding audit counts the very characters this corpus is
    # made of: \x0B (in the WS class, NOT control), NBSP, zero-width
    "encoding_quality_audit",
    # vocab PSI and cluster purity consume tokens/shingles: empty
    # and whitespace-only docs must bucket/cluster identically
    "vocab_psi_between_sources",
    "near_dup_cluster_source_purity",
    # readability on empty/whitespace-only docs: token floor and
    # the 1-sentence floor must degrade identically on both engines
    "flesch_readability_by_source",
]


def test_winnowing_guarantee_shared_run_yields_shared_fingerprint(spark, tmp_path):
    """The winnowing property (Schleimer et al. 2003): any shared token
    run of length >= w + k - 1 (= 4 + 5 - 1 = 8) must contribute at
    least one identical selected fingerprint to both documents."""
    import __spark_entry__ as e

    shared = "s0 s1 s2 s3 s4 s5 s6 s7"  # exactly w + k - 1 tokens
    rows = [
        (1, f"aa bb cc {shared} dd ee", "en", "src0", 0),
        (2, f"xx yy {shared} zz ww vv uu", "en", "src1", 0),
        (3, "totally different words here only once each time", "en", "src2", 0),
    ]
    root = tmp_path / "winnow_sf"
    root.mkdir()
    import os as _os

    from tests.conftest import SF_SMOKE
    from tests.parity import TESTDATA_TABLES

    for t in TESTDATA_TABLES:
        if t != "documents":
            _os.symlink(f"{SF_SMOKE}/{t}.parquet", root / f"{t}.parquet")
    df = spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string, n_chars: long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(root / "_d"))
    part = next((root / "_d").glob("part-*.parquet"))
    _os.rename(part, root / "documents.parquet")

    out = e.queries()["winnowing_fingerprints"](spark, str(root)).collect()
    fps = {}
    for r in out:
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert fps[1] & fps[2], "shared 8-token run produced no shared fingerprint"
    assert not (fps[1] & fps[2]) & fps[3], "unrelated doc shares a fingerprint"


@pytest.mark.parametrize("name", _HOSTILE_PANEL)
def test_text_family_parity_on_hostile_corpus(spark, hostile_dir, name):
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert name in queries and name in oracles, f"{name} not registered"
    problems = compare(queries[name](spark, hostile_dir), oracles[name], hostile_dir)
    assert not problems, f"{name} on hostile corpus: {problems}"
