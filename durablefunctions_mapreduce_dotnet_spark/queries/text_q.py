"""Text-analysis queries over the ``documents`` table (north-star scope)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.curation import hash_bucket
from ..operators.textops import (
    contamination_overlap,
    fingerprint,
    language_id,
    quality_score,
    repetition_stats,
    text_stats,
)
from ..sources.readers import read_table


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_stats(read_table(spark, sf_dir, "documents"))


_TEXT_STATS_SQL = r"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
       CAST(length(text) AS DOUBLE) / nullif(CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE), 0) AS avg_token_len,
       CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) / nullif(CAST(length(text) AS DOUBLE), 0) AS punct_ratio,
       CAST(len(regexp_extract_all(lower(text), '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS DOUBLE)
         / nullif(CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS DOUBLE), 0) AS stopword_ratio
FROM documents
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_score(read_table(spark, sf_dir, "documents"))


_TEXT_QUALITY_SQL = r"""
WITH s AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
         CAST(len(regexp_extract_all(lower(text), '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS DOUBLE)
           / nullif(CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS DOUBLE), 0) AS stopword_ratio,
         CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE)
           / nullif(CAST(length(text) AS DOUBLE), 0) AS punct_ratio
  FROM documents
)
SELECT doc_id, n_tokens, stopword_ratio, punct_ratio,
       (n_tokens >= 10 AND n_tokens <= 100000
        AND stopword_ratio >= 0.01 AND punct_ratio <= 0.2) AS passes_quality
FROM s
"""


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return language_id(read_table(spark, sf_dir, "documents"))


_TEXT_LANGID_SQL = r"""
WITH s AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|is)\b')) AS BIGINT) AS score_en,
         CAST(len(regexp_extract_all(lower(text), '\b(el|la|los|de|que|es)\b')) AS BIGINT) AS score_es,
         CAST(len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist)\b')) AS BIGINT) AS score_de,
         CAST(len(regexp_extract_all(lower(text), '\b(le|les|des|et|est)\b')) AS BIGINT) AS score_fr
  FROM documents
)
SELECT doc_id, score_en, score_es, score_de, score_fr,
       CASE WHEN greatest(score_en, score_es, score_de, score_fr) = 0 THEN 'und'
            WHEN score_en = greatest(score_en, score_es, score_de, score_fr) THEN 'en'
            WHEN score_es = greatest(score_en, score_es, score_de, score_fr) THEN 'es'
            WHEN score_de = greatest(score_en, score_es, score_de, score_fr) THEN 'de'
            ELSE 'fr' END AS predicted_lang
FROM s
"""


def q_text_langid_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frozen char-trigram language/domain classifier
    (operators.textops.langid_trigram) — the model-scoring tier beyond
    the stopword heuristic (text_langid) and the logistic quality score:
    per-class add-one-smoothed trigram log-probabilities frozen to
    INTEGER literals (LANGID_SCALE·ln p), broadcast-joined against
    exploded per-occurrence trigrams, integer-summed per class, argmax
    with alphabetical tie-break.  Integer scores make the argmax — the
    part of a classifier that must be exact — bit-identical on both
    engines."""
    from ..operators.textops import langid_trigram

    d = read_table(spark, sf_dir, "documents")
    return langid_trigram(d).orderBy("doc_id")


def q_text_langid_trigram_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass Arrow twin of text_langid_trigram (no explode, no
    join, no shuffle — the char_entropy_fast pattern); int64 arithmetic
    means bit-identity with the slow path is structural, and both share
    one oracle."""
    from ..operators.textops import langid_trigram_fast

    d = read_table(spark, sf_dir, "documents")
    return langid_trigram_fast(d).orderBy("doc_id")


def _langid_trigram_oracle_sql() -> str:
    """Mirror of langid_trigram over the SAME frozen model: the weight
    table is interpolated as literal VALUES from langid_model() (the
    QUALITY_LR_WEIGHTS shared-literal pattern — the model is part of
    the query spec), scoring re-derived independently: per-occurrence
    lowered char trigrams, per-class integer sums with the unseen term
    for out-of-vocabulary grams, GREATEST argmax with alphabetical
    tie-break."""
    from ..operators.textops import langid_model

    weights, unseen, classes = langid_model()
    rows = ",\n    ".join(
        "('{}', {})".format(
            g.replace("'", "''"), ", ".join(str(x) for x in w)
        )
        for g, w in sorted(weights.items())
    )
    cols = ", ".join(f"w_{c}" for c in classes)
    sums = ",\n         ".join(
        f"SUM(COALESCE(w_{c}, {unseen[i]})) AS s_{c}"
        for i, c in enumerate(classes)
    )
    best = "greatest({})".format(", ".join(f"s_{c}" for c in classes))
    # leading NULL guard: a NULL-text doc has no sc row, and without it
    # the NULL = best comparisons would fall through to the ELSE class
    case = f"WHEN s_{classes[0]} IS NULL THEN NULL " + " ".join(
        f"WHEN s_{c} = {best} THEN '{c}'" for c in classes[:-1]
    ) + f" ELSE '{classes[-1]}'"
    return f"""
WITH w(gram, {cols}) AS (VALUES
    {rows}
),
tg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(length(text) - 2, 1) + 1),
                               i -> substr(lower(text), i, 3))) AS gram
  FROM documents WHERE text IS NOT NULL
),
sc AS (
  SELECT doc_id,
         {sums}
  FROM tg LEFT JOIN w USING (gram)
  GROUP BY doc_id
)
SELECT d.doc_id,
       CASE {case} END AS lang_pred,
       -- DuckDB SUM(BIGINT) is HUGEINT, which pandas surfaces as
       -- float64 — the driver's strict compare would see 1540.0 vs
       -- Spark's int64 1540; cast the OUTPUT back to BIGINT
       CAST({best} AS BIGINT) AS lang_score
FROM documents d LEFT JOIN sc USING (doc_id)
ORDER BY d.doc_id
"""


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 + Rabin rolling-hash fingerprints of normalized text (the
    xxhash64 companion column is exposed by the operator but left out
    here — DuckDB can't mirror it)."""
    return fingerprint(read_table(spark, sf_dir, "documents")).select(
        "doc_id", "fp_md5", "fp_rolling"
    )


_TEXT_FP_SQL = r"""
WITH n AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
  FROM documents
)
SELECT doc_id, md5(norm) AS fp_md5,
       list_reduce(list_prepend(CAST(0 AS BIGINT),
         list_transform(range(1, length(norm) + 1),
                        i -> CAST(ascii(substr(norm, i, 1)) AS BIGINT))),
         (acc, c) -> (acc * 131 + c) % 2147483647) AS fp_rolling
FROM n
"""


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc duplicate-3-gram fraction (Gopher-style repetition
    quality rule)."""
    return repetition_stats(read_table(spark, sf_dir, "documents"), n=3)


_TEXT_REPETITION_SQL = r"""
WITH g AS (
  SELECT doc_id,
         greatest(len(regexp_extract_all(lower(text), '\S+')) - 2, 1) AS n_grams,
         len(list_distinct(
           list_transform(range(1, greatest(len(regexp_extract_all(lower(text), '\S+')) - 2, 1) + 1),
                          i -> array_to_string(regexp_extract_all(lower(text), '\S+')[i:i+2], ' '))
         )) AS n_distinct
  FROM documents
)
SELECT doc_id,
       CAST(n_grams AS BIGINT) AS n_grams,
       CAST(n_distinct AS BIGINT) AS n_distinct,
       1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_grams AS DOUBLE) AS repetition_ratio
FROM g
"""


def q_text_topgram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-gram concentration signals (operators.textops.
    gram_concentration) — the Gopher rule family text_repetition
    doesn't cover: how much of each doc its single worst token /
    bigram and its duplicated trigrams account for, plus the flag.
    Only MAX counts feed the fractions, so the row is hash-exact with
    no tie-break argument needed."""
    from ..operators.textops import gram_concentration

    return gram_concentration(read_table(spark, sf_dir, "documents")).orderBy(
        "doc_id"
    )


_TEXT_TOPGRAM_SQL = r"""
WITH tt AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS t
  FROM documents
  WHERE len(regexp_extract_all(lower(text), '\S+')) > 0
),
w AS (
  SELECT doc_id, MAX(c)::BIGINT AS max_w, SUM(c)::BIGINT AS n_w FROM (
    SELECT doc_id, g, COUNT(*) AS c
    FROM (SELECT doc_id, unnest(t) AS g FROM tt)
    GROUP BY doc_id, g
  ) GROUP BY doc_id
),
b AS (
  SELECT doc_id, MAX(c)::BIGINT AS max_b FROM (
    SELECT doc_id, g, COUNT(*) AS c
    FROM (SELECT doc_id,
                 unnest(list_transform(range(1, len(t)),
                                       i -> t[i] || ' ' || t[i + 1])) AS g
          FROM tt WHERE len(t) >= 2)
    GROUP BY doc_id, g
  ) GROUP BY doc_id
),
t3 AS (
  SELECT doc_id,
         SUM(CASE WHEN c >= 2 THEN c ELSE 0 END)::BIGINT AS dup_t,
         SUM(c)::BIGINT AS n_t
  FROM (
    SELECT doc_id, g, COUNT(*) AS c
    FROM (SELECT doc_id,
                 unnest(list_transform(range(1, len(t) - 1),
                                       i -> t[i] || ' ' || t[i + 1] || ' '
                                            || t[i + 2])) AS g
          FROM tt WHERE len(t) >= 3)
    GROUP BY doc_id, g
  ) GROUP BY doc_id
)
SELECT w.doc_id, n_w AS n_tokens,
       max_w / n_w AS max_word_frac,
       2 * max_b / n_w AS top_bigram_frac,
       dup_t / n_t AS dup_trigram_frac,
       (2 * max_b / n_w > 0.18) OR (dup_t / n_t > 0.30)
         OR (max_w / n_w > 0.20) AS flagged
FROM w LEFT JOIN b USING (doc_id) LEFT JOIN t3 USING (doc_id)
ORDER BY doc_id
"""


def q_text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: hash-buckets 97-99 of documents play
    the held-out eval set; flag remaining corpus docs sharing any word
    5-gram with it."""
    d = read_table(spark, sf_dir, "documents")
    is_eval = hash_bucket("doc_id") >= 97
    return contamination_overlap(d.where(~is_eval), d.where(is_eval), n=5)


_TEXT_DECON_SQL = r"""
WITH grams AS (
  SELECT doc_id, (((doc_id * 2654435761) % 4294967296 + 4294967296) % 4294967296) % 100 AS bucket,
         unnest(list_distinct(
           list_transform(range(1, greatest(len(regexp_extract_all(lower(text), '\S+')) - 4, 1) + 1),
                          i -> array_to_string(regexp_extract_all(lower(text), '\S+')[i:i+4], ' '))
         )) AS gram
  FROM documents
),
eval_grams AS (SELECT DISTINCT gram FROM grams WHERE bucket >= 97)
SELECT g.doc_id, COUNT(*) AS n_shared_grams
FROM grams g JOIN eval_grams e USING (gram)
WHERE g.bucket < 97
GROUP BY g.doc_id
HAVING COUNT(*) >= 1
"""


def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace vs BPE-ish-regex token counts per document (the
    budget/packing currencies) — pure codegen'd expressions, regex
    restricted to the Java/RE2-identical subset."""
    from ..operators.textops import token_counts

    d = read_table(spark, sf_dir, "documents")
    return token_counts(d).orderBy("doc_id")


_TEXT_TOKENS_SQL = """
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '\\S+')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text,
         '''(s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+'
       )) AS BIGINT) AS n_bpe_tokens
FROM documents ORDER BY doc_id
"""


def q_text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc Shannon character entropy (gibberish/junk signal) with
    an order-free decimal-summed fold — exact 9 dp parity."""
    from ..operators.textops import char_entropy

    d = read_table(spark, sf_dir, "documents")
    return char_entropy(d).orderBy("doc_id")


def q_text_lm_score_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass Arrow LM scorer (``lm_bigram_score_fast``): the
    reference counts stay a combiner aggregate, but corpus scoring is
    one mapInPandas — no explode, no join, no shuffle.  Bit-identical
    to ``text_lm_score`` (quantized-decimal term table × occurrence
    counts), so it shares that query's oracle verbatim.  Measured
    3.12 s → 0.74 s at sf0.1."""
    from ..operators.textops import lm_bigram_score_fast

    d = read_table(spark, sf_dir, "documents")
    ref = d.where(F.col("doc_id") % 10 == 0)
    return lm_bigram_score_fast(d, ref).orderBy("doc_id")


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical normalization pass (control chars → space, whitespace
    collapse, trim, lowercase) — pure codegen'd expressions pipelined
    into the scan; the oracle repeats each step with RE2's 'g' flag."""
    from ..operators.textops import normalize_text

    d = read_table(spark, sf_dir, "documents")
    return normalize_text(d).orderBy("doc_id")


_TEXT_NORMALIZE_SQL = r"""
SELECT doc_id,
       lower(trim(regexp_replace(
         regexp_replace(text, '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', ' ', 'g'),
         '[ \t\n\r]+', ' ', 'g'))) AS text_norm,
       CAST(length(text) AS BIGINT) AS n_chars_raw,
       CAST(length(lower(trim(regexp_replace(
         regexp_replace(text, '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', ' ', 'g'),
         '[ \t\n\r]+', ' ', 'g')))) AS BIGINT) AS n_chars_norm
FROM documents
ORDER BY doc_id
"""


def q_text_entropy_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The single-pass Arrow kernel (``char_entropy_fast``) — the 100 TB
    path: no explode, no shuffle, no join; one ``mapInPandas`` over the
    scan.  Bit-identical to ``text_entropy`` (the kernel replicates
    Spark's double→decimal quantization and HALF_UP rounding), so it
    shares that query's oracle verbatim — parity here proves the fast
    path, not just the mirrorable formulation.  Measured 2.25 s → 0.50 s
    at sf0.1."""
    from ..operators.textops import char_entropy_fast

    d = read_table(spark, sf_dir, "documents")
    return char_entropy_fast(d).orderBy("doc_id")


_TEXT_ENTROPY_SQL = """
WITH lens AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS n FROM documents
),
chars AS (
  SELECT doc_id, unnest(list_transform(range(1, length(text) + 1),
                                       i -> substr(text, i, 1))) AS ch
  FROM documents
),
counts AS (SELECT doc_id, ch, COUNT(*) AS cnt FROM chars GROUP BY doc_id, ch),
ent AS (
  SELECT c.doc_id,
         CAST(SUM(CAST(-(cnt / CAST(n AS DOUBLE)) * log2(cnt / CAST(n AS DOUBLE))
                       AS DECIMAL(38,18))) AS DOUBLE) AS e
  FROM counts c JOIN lens USING (doc_id)
  GROUP BY c.doc_id
)
SELECT l.doc_id,
       ROUND(COALESCE(e, CAST(0 AS DOUBLE)), 9) AS entropy_bits,
       l.n AS n_chars_exact
FROM lens l LEFT JOIN ent USING (doc_id)
ORDER BY doc_id
"""


def q_text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style statistical quality filter: average add-one-smoothed
    char-bigram log-probability under a held-out reference slice
    (every 10th doc)."""
    from ..operators.textops import lm_bigram_score

    d = read_table(spark, sf_dir, "documents")
    ref = d.where(F.col("doc_id") % 10 == 0)
    return lm_bigram_score(d, ref).orderBy("doc_id")


_TEXT_LM_SQL = """
WITH ref AS (
  SELECT text FROM documents WHERE doc_id % 10 = 0 AND length(text) >= 2
),
rbg AS (
  SELECT unnest(list_transform(range(1, length(text)), i -> substr(text, i, 2))) AS bg
  FROM ref
),
rc AS (SELECT bg, COUNT(*) AS cnt FROM rbg GROUP BY bg),
tot AS (SELECT SUM(cnt) AS total, COUNT(*) AS v FROM rc),
dbg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, length(text)), i -> substr(text, i, 2))) AS bg
  FROM documents WHERE length(text) >= 2
),
sc AS (
  SELECT doc_id,
         CAST(SUM(CAST(ln(CAST(COALESCE(cnt, 0) + 1 AS DOUBLE)
                          / CAST(total + v AS DOUBLE)) AS DECIMAL(38,18))) AS DOUBLE)
           / COUNT(*) AS s
  FROM dbg LEFT JOIN rc USING (bg) CROSS JOIN tot
  GROUP BY doc_id
)
SELECT d.doc_id, ROUND(s, 9) AS lm_score
FROM documents d LEFT JOIN sc USING (doc_id)
ORDER BY d.doc_id
"""


_BPE_MERGES = 8


def q_text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge learning (operators.textops.learn_bpe_merges,
    replace-semantics variant) — FULL oracle parity: the iterative loop
    is unrolled into CTEs (the kmeans/pagerank pattern), so the learned
    merge ranking is hash-checked, not rows-only."""
    from ..operators.textops import learn_bpe_merges

    d = read_table(spark, sf_dir, "documents")
    return learn_bpe_merges(d, n_merges=_BPE_MERGES).orderBy("rank")


def _bpe_learn_ctes(n: int = _BPE_MERGES) -> str:
    """The unrolled BPE-learning CTE chain (w0..wN, b1..bN) shared by
    the merge-learning and the encode oracles — bI is the rank-I merge."""
    its = []
    for i in range(1, n + 1):
        prev = f"w{i - 1}"
        its.append(f"""
p{i} AS (
  SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM (
    SELECT unnest(list_transform(range(1, len(s)),
                                 j -> s[j] || ' ' || s[j + 1])) AS pair,
           freq
    FROM (SELECT string_split(trim(sym), ' ') AS s, freq FROM {prev})
  ) GROUP BY pair
),
b{i} AS (SELECT pair, cnt FROM p{i} ORDER BY cnt DESC, pair ASC LIMIT 1),
w{i} AS (
  SELECT replace(sym,
                 ' ' || b.pair || ' ',
                 ' ' || replace(b.pair, ' ', '') || ' ') AS sym,
         freq
  FROM {prev} CROSS JOIN b{i} b
)""")
    body = ",".join(its)
    return f"""w0 AS (
  SELECT ' ' || trim(regexp_replace(w, '(.)', '\\1 ', 'g')) || ' ' AS sym,
         freq
  FROM (
    SELECT w, COUNT(*) AS freq
    FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
    WHERE w <> '' GROUP BY w
  )
),{body}"""


def _bpe_oracle_sql(n: int = _BPE_MERGES) -> str:
    finals = [
        f"SELECT CAST({i} AS BIGINT) AS rank, pair, cnt AS freq FROM b{i}"
        for i in range(1, n + 1)
    ]
    union = " UNION ALL ".join(finals)
    return f"""
WITH {_bpe_learn_ctes(n)}
SELECT * FROM ({union}) ORDER BY rank
"""


def q_text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn BPE merges, then ENCODE the corpus with them
    (operators.textops.bpe_encode): per-doc word and token counts —
    the full train-tokenizer → tokenize-everything pipeline, vocab-side
    encoding so corpus work is whitespace-split + join only.  Token
    counts are integers, so the unrolled learn+encode oracle
    hash-matches exactly."""
    from ..operators.textops import bpe_encode, learn_bpe_merges

    d = read_table(spark, sf_dir, "documents")
    merges = learn_bpe_merges(d, n_merges=_BPE_MERGES)
    return bpe_encode(d, merges).orderBy("doc_id")


def _bpe_encode_oracle_sql(n: int = _BPE_MERGES) -> str:
    # chain the learned merges over the distinct-word vocabulary, in
    # rank order, with the same replace semantics as learning
    vs = []
    for i in range(1, n + 1):
        vs.append(f""",
v{i} AS (
  SELECT w,
         replace(sym, ' ' || b.pair || ' ',
                 ' ' || replace(b.pair, ' ', '') || ' ') AS sym
  FROM v{i - 1} CROSS JOIN b{i} b
)""")
    chain = "".join(vs)
    return f"""
WITH {_bpe_learn_ctes(n)},
dw AS (
  SELECT doc_id, w
  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        FROM documents)
  WHERE w <> ''
),
v0 AS (
  SELECT DISTINCT w,
         ' ' || trim(regexp_replace(w, '(.)', '\\1 ', 'g')) || ' ' AS sym
  FROM dw
){chain},
enc AS (SELECT w, len(string_split(trim(sym), ' ')) AS nt FROM v{n}),
per AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(SUM(nt) AS BIGINT) AS n_tokens
  FROM dw JOIN enc USING (w) GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(n_words, 0) AS n_words,
       COALESCE(n_tokens, 0) AS n_tokens
FROM documents d LEFT JOIN per USING (doc_id)
ORDER BY d.doc_id
"""




def q_text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PMI word-bigram collocations with a support floor of 5
    (operators.textops.pmi_collocations) — phrase mining for vocabulary
    construction, formula-mirrored in the oracle (identical
    left-associative double products, ranked at 9 dp)."""
    from ..operators.textops import pmi_collocations

    d = read_table(spark, sf_dir, "documents")
    return pmi_collocations(d, k=20, min_count=5)


_TEXT_COLLOC_SQL = """
WITH toks AS (
  SELECT list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
  FROM documents
),
uni AS (
  SELECT word, COUNT(*) AS c
  FROM (SELECT unnest(w) AS word FROM toks) GROUP BY word
),
allbig AS (
  SELECT unnest(CASE WHEN len(w) >= 2
                     THEN list_transform(range(1, len(w)),
                                         i -> w[i] || ' ' || w[i + 1])
                     ELSE [] END) AS bigram
  FROM toks
),
big AS (
  SELECT bigram, COUNT(*) AS n_ab FROM allbig GROUP BY bigram
  HAVING COUNT(*) >= 5
),
totals AS (
  SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM uni) AS n_uni,
         (SELECT COUNT(*) FROM allbig) AS n_big
),
scored AS (
  SELECT bigram, n_ab,
         ROUND(ln((CAST(n_ab AS DOUBLE) * CAST(n_uni AS DOUBLE)
                   * CAST(n_uni AS DOUBLE))
                  / (CAST(n_big AS DOUBLE) * CAST(ua.c AS DOUBLE)
                     * CAST(ub.c AS DOUBLE))), 9) AS p9
  FROM big
  JOIN uni ua ON ua.word = string_split(bigram, ' ')[1]
  JOIN uni ub ON ub.word = string_split(bigram, ' ')[2]
  CROSS JOIN totals
)
SELECT bigram, n_ab, ROUND(p9, 6) AS pmi
FROM scored ORDER BY p9 DESC, bigram LIMIT 20
"""


_BM25_TERMS = ("merge", "spark", "window")


def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 for a fixed three-term query
    (operators.textops.bm25_topk) — lexical ranked retrieval, mirrored
    formula-for-formula (idf, tf saturation, length normalization) in
    the oracle."""
    from ..operators.textops import bm25_topk

    d = read_table(spark, sf_dir, "documents")
    return bm25_topk(d, list(_BM25_TERMS), k=10).orderBy(
        F.desc("score"), "doc_id"
    )


def _bm25_oracle_sql(k: int = 10, k1: float = 1.2, b: float = 0.75) -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
WITH tok AS (
  SELECT doc_id, w
  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents)
  WHERE w <> ''
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(CAST(dl AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, w, COUNT(*) AS tf FROM tok WHERE w IN ({terms})
  GROUP BY doc_id, w
),
dfreq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
scored AS (
  SELECT tf.doc_id,
         ROUND(SUM(
           ln((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
           * (tf.tf * {k1 + 1.0})
           / (tf.tf + {k1} * ({1.0 - b} + {b} * dl.dl / stats.avgdl))
         ), 9) AS s9
  FROM tf JOIN dfreq USING (w) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, ROUND(s9, 6) AS score
FROM scored ORDER BY s9 DESC, doc_id LIMIT {k}
"""


def q_text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick document vectors (operators.textops.
    feature_hash_vectors): 16-dim signed token-count vectors with NO
    vocabulary state — the model-free embedding baseline.  md5-prefix
    hashing makes bucket and sign engine-portable; weights are exact
    signed integers, hash-exact."""
    from ..operators.textops import feature_hash_vectors

    d = read_table(spark, sf_dir, "documents")
    return feature_hash_vectors(d, dims=16).orderBy("doc_id", "dim")


_FEATURE_HASHING_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS w
  FROM documents
),
hashed AS (
  SELECT doc_id,
         CAST('0x' || substring(md5(w), 1, 8) AS BIGINT) % 16 AS dim,
         CASE WHEN CAST('0x' || substring(md5(w), 9, 1) AS BIGINT) % 2 = 0
              THEN 1 ELSE -1 END AS s
  FROM toks
)
SELECT doc_id, dim, CAST(SUM(s) AS BIGINT) AS weight
FROM hashed GROUP BY doc_id, dim
HAVING SUM(s) != 0
ORDER BY doc_id, dim
"""


def q_text_quality_logistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frozen logistic-regression quality scores
    (operators.textops.logistic_quality_score): the deployed-classifier
    shape — engineered features, literal weights, sigmoid — as pure
    codegen'd row expressions.  6 dp rounding absorbs cross-engine
    ln/exp ulps (dsir_weights precedent)."""
    from ..operators.textops import logistic_quality_score

    d = read_table(spark, sf_dir, "documents")
    return logistic_quality_score(d).orderBy("doc_id")


def _quality_logistic_sql() -> str:
    from ..operators.textops import QUALITY_LR_WEIGHTS

    w0, w1, w2, w3, w4 = (repr(float(w)) for w in QUALITY_LR_WEIGHTS)
    return rf"""
WITH s AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
         CAST(length(text) AS DOUBLE)
           / nullif(CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE), 0) AS avg_token_len,
         CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE)
           / nullif(CAST(length(text) AS DOUBLE), 0) AS punct_ratio,
         CAST(len(regexp_extract_all(lower(text), '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS DOUBLE)
           / nullif(CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS DOUBLE), 0) AS stopword_ratio
  FROM documents
)
SELECT doc_id,
       ROUND(1.0 / (1.0 + exp(-({w0} + {w1} * ln(1.0 + CAST(n_tokens AS DOUBLE))
                                + {w2} * stopword_ratio + {w3} * punct_ratio
                                + {w4} * avg_token_len))), 6) AS quality_score
FROM s ORDER BY doc_id
"""


def q_text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus vocabulary: OLS slope of
    ln(frequency) against ln(rank) over the top-2000 words — the
    rank-frequency power-law exponent, the classic corpus-health
    diagnostic (natural text ≈ −1; templated/synthetic corpora
    flatten).  Word counts are one combiner aggregate; the rank window
    runs on the vocabulary-sized frame; ln values are quantized
    floor(ln·10⁶+0.5) to exact integers (the embedding_covariance
    trick) so all OLS sums are decimal-exact and the single final
    division is the only FP op — hash-exact at 6 dp."""
    d = read_table(spark, sf_dir, "documents")
    counts = (
        d.select(
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(2000)
    )
    rank_w = Window.orderBy(F.desc("c"), "w")
    q = counts.select(
        F.floor(
            F.log(F.row_number().over(rank_w).cast("double")) * 1e6 + F.lit(0.5)
        ).cast("decimal(38,0)").alias("x"),
        F.floor(F.log(F.col("c").cast("double")) * 1e6 + F.lit(0.5))
        .cast("decimal(38,0)")
        .alias("y"),
    )
    s = q.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_terms"),
        F.round(slope, 6).alias("zipf_slope"),
    )


_ZIPF_SQL = """
WITH counts AS (
  SELECT w, COUNT(*) AS c FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents
  ) GROUP BY w ORDER BY c DESC, w LIMIT 2000
),
q AS (
  SELECT CAST(FLOOR(ln(CAST(ROW_NUMBER() OVER (ORDER BY c DESC, w) AS DOUBLE)) * 1e6 + 0.5) AS DECIMAL(38,0)) AS x,
         CAST(FLOOR(ln(CAST(c AS DOUBLE)) * 1e6 + 0.5) AS DECIMAL(38,0)) AS y
  FROM counts
),
s AS (
  SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM q
)
SELECT CAST(n AS BIGINT) AS n_terms,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS zipf_slope
FROM s
"""


def q_text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provably-exact frequent vocabulary items ≥ 2% of all tokens
    (operators.textops.heavy_hitters_exact): per-partition Misra-Gries
    summaries (map-only, ≤ k·P candidate shuffle) + an exact
    verification pass over only the candidates — the two-pass recipe
    that makes heavy hitters hash-checkable at 100 TB where a full
    GROUP BY + global sort is not.  The oracle is the brute-force
    GROUP BY ... HAVING with the same integer threshold: if the sketch
    pass ever dropped a true heavy hitter, the value hash breaks."""
    from ..operators.textops import heavy_hitters_exact

    d = read_table(spark, sf_dir, "documents")
    return heavy_hitters_exact(d, num=2, den=100, k=64)


_HEAVY_HITTERS_SQL = """
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
  FROM documents
),
tot AS (SELECT COUNT(*) AS n FROM toks)
SELECT token, COUNT(*) AS freq
FROM toks, tot
GROUP BY token, tot.n
HAVING COUNT(*) * 100 >= tot.n * 2
ORDER BY freq DESC, token
"""


def q_text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth curve: cumulative distinct terms vs
    cumulative tokens at ~20 equal-width checkpoints of the ingestion
    order — the corpus-health curve that flags both a stalled crawl
    (vocab flatlines: duplicated content) and junk floods (vocab grows
    ~linearly: random strings).  Distributed shape: one explode, then
    each term reduces to its FIRST document (min doc_id, a combiner
    agg) — cumulative vocab at checkpoint d is just a count of terms
    with first_doc <= d, so no distinct-per-prefix rescan, no growing
    state: two tiny per-checkpoint aggregates + a window over the
    CHECKPOINT table.  The checkpoint stride SCALES with the corpus
    (max_id/20 + 1, a 1-row broadcast), so the window input is <= ~21
    rows at ANY corpus size — never corpus-sized.  The sibling
    text_zipf_slope fits the frequency law; this one tracks the
    growth law."""
    d = read_table(spark, sf_dir, "documents")
    mx = d.agg(F.max("doc_id").alias("_mx"))
    tok = (
        d.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), r"\s+")).alias("term"),
        )
        .where(F.col("term") != "")
        .crossJoin(F.broadcast(mx))
    )
    stride = F.floor(F.col("_mx") / 20) + 1
    ck = lambda col: (F.floor(col / stride) + 1).cast("long")  # noqa: E731
    toks = tok.groupBy(ck(F.col("doc_id")).alias("ckpt")).agg(
        F.count(F.lit(1)).alias("toks")
    )
    # _mx is a broadcast constant; MIN re-exposes it past the groupBy
    first = tok.groupBy("term").agg(
        F.min("doc_id").alias("fd"), F.min("_mx").alias("_mx")
    )
    vocab = first.groupBy(ck(F.col("fd")).alias("ckpt")).agg(
        F.count(F.lit(1)).alias("vocab")
    )
    both = (
        toks.join(vocab, "ckpt", "full")
        .select(
            "ckpt",
            F.coalesce("toks", F.lit(0)).alias("toks"),
            F.coalesce("vocab", F.lit(0)).alias("vocab"),
        )
    )
    w = Window.orderBy("ckpt").rowsBetween(Window.unboundedPreceding, 0)
    return both.select(
        "ckpt",
        F.sum("toks").over(w).alias("cum_tokens"),
        F.sum("vocab").over(w).alias("cum_vocab"),
    ).orderBy("ckpt")


_TEXT_VOCAB_GROWTH_SQL = """
WITH mx AS (
  SELECT MAX(doc_id) // 20 + 1 AS stride FROM documents
), tok AS (
  SELECT doc_id, t.term
  FROM documents, unnest(regexp_extract_all(lower(text), '\\S+')) AS t(term)
), toks AS (
  SELECT doc_id // stride + 1 AS ckpt, COUNT(*) AS toks
  FROM tok CROSS JOIN mx GROUP BY 1
), first AS (
  SELECT term, MIN(doc_id) AS fd FROM tok GROUP BY term
), vocab AS (
  SELECT fd // stride + 1 AS ckpt, COUNT(*) AS vocab
  FROM first CROSS JOIN mx GROUP BY 1
), merged AS (
  SELECT COALESCE(t.ckpt, v.ckpt) AS ckpt,
         COALESCE(t.toks, 0) AS toks,
         COALESCE(v.vocab, 0) AS vocab
  FROM toks t FULL JOIN vocab v ON t.ckpt = v.ckpt
)
SELECT ckpt,
       CAST(SUM(toks) OVER (ORDER BY ckpt) AS BIGINT) AS cum_tokens,
       CAST(SUM(vocab) OVER (ORDER BY ckpt) AS BIGINT) AS cum_vocab
FROM merged
ORDER BY ckpt
"""


QUERIES = {
    "text_vocab_growth": q_text_vocab_growth,
    "text_heavy_hitters": q_text_heavy_hitters,
    "text_feature_hashing": q_text_feature_hashing,
    "text_quality_logistic": q_text_quality_logistic,
    "text_zipf_slope": q_text_zipf_slope,
    "text_bm25": q_text_bm25,
    "text_bpe_merges": q_text_bpe_merges,
    "text_bpe_encode": q_text_bpe_encode,
    "text_collocations": q_text_collocations,
    "text_lm_score": q_text_lm_score,
    "text_lm_score_fast": q_text_lm_score_fast,
    "text_entropy": q_text_entropy,
    "text_entropy_fast": q_text_entropy_fast,
    "text_normalize": q_text_normalize,
    "text_tokens": q_text_tokens,
    "text_stats": q_text_stats,
    "text_repetition": q_text_repetition,
    "text_topgram_concentration": q_text_topgram,
    "text_decontaminate": q_text_decontaminate,
    "text_quality": q_text_quality,
    "text_langid": q_text_langid,
    "text_langid_trigram": q_text_langid_trigram,
    "text_langid_trigram_fast": q_text_langid_trigram_fast,
    "text_fingerprint": q_text_fingerprint,
}
ORACLES = {
    "text_vocab_growth": _TEXT_VOCAB_GROWTH_SQL,
    "text_heavy_hitters": _HEAVY_HITTERS_SQL,
    "text_bm25": _bm25_oracle_sql(),
    "text_bpe_merges": _bpe_oracle_sql(),
    "text_bpe_encode": _bpe_encode_oracle_sql(),
    "text_collocations": _TEXT_COLLOC_SQL,
    "text_feature_hashing": _FEATURE_HASHING_SQL,
    "text_quality_logistic": _quality_logistic_sql(),
    "text_zipf_slope": _ZIPF_SQL,
    "text_lm_score": _TEXT_LM_SQL,
    "text_lm_score_fast": _TEXT_LM_SQL,
    "text_entropy": _TEXT_ENTROPY_SQL,
    "text_entropy_fast": _TEXT_ENTROPY_SQL,
    "text_normalize": _TEXT_NORMALIZE_SQL,
    "text_tokens": _TEXT_TOKENS_SQL,
    "text_stats": _TEXT_STATS_SQL,
    "text_repetition": _TEXT_REPETITION_SQL,
    "text_topgram_concentration": _TEXT_TOPGRAM_SQL,
    "text_decontaminate": _TEXT_DECON_SQL,
    "text_quality": _TEXT_QUALITY_SQL,
    "text_langid": _TEXT_LANGID_SQL,
    "text_langid_trigram": _langid_trigram_oracle_sql(),
    "text_langid_trigram_fast": _langid_trigram_oracle_sql(),
    "text_fingerprint": _TEXT_FP_SQL,
}
