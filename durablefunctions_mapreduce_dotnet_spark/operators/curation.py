"""Dataset-curation operators for training-data pipelines: deterministic
sampling/splits, sequence packing, vocabulary statistics, PII redaction.

All are pure built-in-expression plans (codegen'd, shuffle-minimal) so
they hold at 100 TB: sampling/splitting is a stateless per-row hash (no
shuffle at all), packing is one window per source shard, vocabulary is a
combiner-reduced word count, redaction is a per-row regex rewrite.

Determinism doctrine: sampling uses an explicit multiplicative integer
hash (Knuth 2654435761 mod 2^32) rather than ``rand(seed)`` or an
engine-specific hash — the SAME rows are selected on any engine, any
partitioning, any retry, and the DuckDB oracle can mirror it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Knuth multiplicative constant; bucket space 2^32
_KNUTH = 2654435761
_M32 = 4294967296


def portable_hash(id_col: Column | str) -> Column:
    """THE portable hash, in one place: ``(id * Knuth) % 2^32`` — every
    sampling/splitting/ranking operator and oracle derives from this
    single definition.  Ids large enough to need care arrive as bigint;
    the product stays < 2^63 for ids < ~3.4e9 (shard first beyond
    that)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    # pmod, not %: Spark's % is a SIGNED remainder, so a negative id
    # would hash negative — below every sampling threshold (rate bugs)
    # and outside the documented [0, 2^32) contract.  The SQL oracles
    # mirror with ((x % m) + m) % m.
    return F.pmod(c * F.lit(_KNUTH), F.lit(_M32))


def hash_bucket(id_col: Column | str, n_buckets: int = 100) -> Column:
    """Deterministic engine-portable bucket in [0, n_buckets)."""
    return portable_hash(id_col) % F.lit(n_buckets)


def sample_fraction(df: DataFrame, id_col: str, percent: int) -> DataFrame:
    """Keep ~percent% of rows, deterministically (hash-bucket < percent)."""
    return df.where(hash_bucket(id_col) < percent)


def sample_stratified(
    df: DataFrame, id_col: str, stratum_col: str, rates: dict[str, int], default: int = 0
) -> DataFrame:
    """Per-stratum sampling rates (percent), e.g. downsample dominant
    languages and keep the tail — the standard corpus-rebalancing move.
    Stateless per-row predicate: no shuffle, no sort, retry-stable."""
    rate = F.lit(default)
    for key, pct in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == key, F.lit(pct)).otherwise(rate)
    return df.where(hash_bucket(id_col) < rate)


def sample_weighted(df: DataFrame, id_col: str, weight_col: str, k: int) -> DataFrame:
    """Deterministic weight-proportional sampling without replacement —
    Efraimidis-Spirakis A-ES with the portable hash as the uniform
    source: ``u = (hash(id) + 0.5) / 2^32`` in (0,1), rank key
    ``ln(u) / w`` (the log-transformed ``u^(1/w)``, same order), keep
    the k LARGEST keys.  Heavier rows win proportionally more often,
    yet membership is a pure function of (id, weight): stable across
    engines, partitionings and retries, and SQL-mirrorable.

    The plan is a global top-k (``TakeOrderedAndProject``): map-side
    partial top-k per task, k rows to the driver-side final — no full
    sort, no single-partition shuffle.  FP note: selection compares
    ln-key GAPS (~1e-3 on real corpora) against cross-libm ln skew
    (≤1 ulp), so the chosen set is engine-stable; the key itself is
    dropped from the output to keep the hash contract integer-clean.

    Rows with non-positive weight are EXCLUDED (ln(u) < 0, so w < 0
    would flip the key sign and deterministically beat every valid row,
    and w = 0 yields a NULL key) — a corrupt upstream weight must not
    poison the draw.
    """
    u = (portable_hash(id_col) + F.lit(0.5)) / F.lit(float(_M32))
    key = F.log(u) / F.col(weight_col)
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("_wkey", key)
        .orderBy(F.col("_wkey").desc(), F.col(id_col))
        .limit(k)
        .drop("_wkey")
    )


def train_val_test_split(
    df: DataFrame, id_col: str, val_percent: int = 5, test_percent: int = 5
) -> DataFrame:
    """Adds a ``split`` column (train/val/test) from the same portable
    hash — membership is a pure function of the id, so the split is
    stable across runs, engines and repartitioning."""
    b = hash_bucket(id_col)
    train_hi = 100 - val_percent - test_percent
    return df.withColumn(
        "split",
        F.when(b < train_hi, "train")
        .when(b < train_hi + val_percent, "val")
        .otherwise("test"),
    )


def string_hash_bucket(col: Column | str, n_buckets: int = 100) -> Column:
    """Portable bucket in [0, n_buckets) from a STRING key: the first 8
    hex digits of md5 parsed as an integer — md5 is bit-standardized,
    so any engine computes the same bucket (DuckDB mirrors with
    ``CAST('0x' || substring(md5(x),1,8) AS BIGINT)``).  The string
    sibling of :func:`portable_hash` for group keys that aren't ids."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint") % F.lit(
        n_buckets
    )


def group_aware_split(
    df: DataFrame,
    group_col: str,
    val_percent: int = 5,
    test_percent: int = 5,
) -> DataFrame:
    """Leakage-safe train/val/test split: the split is a pure function
    of the GROUP key (source, domain, near-dup cluster id, …), so every
    row of a group lands in the same split — the guard against
    train/test contamination through near-duplicate or same-origin
    documents that a per-row hash split (:func:`train_val_test_split`)
    cannot provide.  Same stateless no-shuffle shape: a per-row
    expression over the scan, stable under engines, retries and
    repartitioning."""
    b = string_hash_bucket(group_col)
    train_hi = 100 - val_percent - test_percent
    return df.withColumn(
        "split",
        F.when(b < train_hi, "train")
        .when(b < train_hi + val_percent, "val")
        .otherwise("test"),
    )


def chunk_documents(
    df: DataFrame,
    chunk_chars: int = 512,
    overlap_chars: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping sliding-window chunking — the context-window
    ingestion primitive (RAG indexing, long-doc training samples):
    each document becomes ceil-covering chunks of ``chunk_chars`` with
    ``overlap_chars`` carried between neighbors (stride =
    chunk - overlap), so no boundary content is lost to a hard cut.

    Pure codegen'd expressions — ``sequence`` over chunk starts,
    ``explode``, ``substring`` — pipelined into the scan: no UDF, no
    shuffle; output size is input/stride-linear and each chunk row is
    independent downstream (embed/filter/dedup per chunk).  Char-based
    here because it must mirror into SQL exactly; a token-based variant
    is the same plan with the BPE-ish token array (textops) in place of
    the char axis.  Documents shorter than one chunk yield exactly one
    chunk (the whole text); empty/NULL texts yield no rows (nothing to
    index).
    """
    if overlap_chars >= chunk_chars:
        raise ValueError("overlap_chars must be smaller than chunk_chars")
    stride = chunk_chars - overlap_chars
    text = F.col(text_col)
    n = F.length(text)
    # last start: the largest k*stride+1 that still begins new content
    # (start <= n - overlap for multi-chunk docs), i.e. ceil coverage
    # without a trailing chunk that is pure overlap of the previous one
    last_start = (
        F.greatest(
            F.ceil((n - F.lit(chunk_chars)) / F.lit(float(stride))).cast("bigint"),
            F.lit(0).cast("bigint"),
        )
        * F.lit(stride)
        + F.lit(1)
    )
    starts = F.sequence(F.lit(1).cast("bigint"), last_start, F.lit(stride).cast("bigint"))
    return (
        df.where(n > 0)
        .select(F.col(id_col), text, F.posexplode(starts).alias("_i", "_start"))
        .select(
            F.col(id_col),
            F.col("_i").cast("bigint").alias("chunk_idx"),
            F.substring(text, F.col("_start").cast("int"), F.lit(chunk_chars)).alias(
                "chunk_text"
            ),
        )
    )


def chunk_documents_tokens(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap_tokens: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-budget sibling of :func:`chunk_documents` — the variant a
    training pipeline actually feeds a model: the text is
    pre-tokenized with the BPE-ish regex (``textops.BPE_ISH_RE``, the
    same token currency as ``token_counts``/``pack_documents``) and
    cut into ceil-covering token windows with ``overlap_tokens``
    carried between neighbors.  Chunk text is the concatenation of the
    token slice — the regex's tokens carry their leading whitespace,
    so stitching chunks (minus overlaps) reconstructs the original
    text exactly.

    Same execution shape as the char variant: tokenize → sequence of
    starts → explode → per-row array slice+join, all codegen'd/
    interpreted JVM expressions pipelined into the scan; no UDF, no
    shuffle.  Docs with zero tokens (empty/NULL) yield no rows.
    """
    from .textops import BPE_ISH_RE

    if overlap_tokens >= chunk_tokens:
        raise ValueError("overlap_tokens must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap_tokens
    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_RE), F.lit(0))
    base = df.select(F.col(id_col), toks.alias("_toks")).where(F.size("_toks") > 0)
    n = F.size("_toks").cast("bigint")
    k = F.greatest(
        F.ceil((n - F.lit(chunk_tokens)) / F.lit(float(stride))).cast("bigint"),
        F.lit(0).cast("bigint"),
    )
    starts = F.sequence(
        F.lit(0).cast("bigint"), k * F.lit(stride), F.lit(stride).cast("bigint")
    )
    return base.select(
        F.col(id_col), F.col("_toks"), F.posexplode(starts).alias("_i", "_s")
    ).select(
        F.col(id_col),
        F.col("_i").cast("bigint").alias("chunk_idx"),
        F.array_join(
            F.slice("_toks", F.col("_s").cast("int") + F.lit(1), chunk_tokens), ""
        ).alias("chunk_text"),
        F.least(
            F.size("_toks").cast("bigint") - F.col("_s"), F.lit(chunk_tokens)
        ).alias("n_tokens"),
    )


def pack_documents(
    df: DataFrame,
    budget_tokens: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Concat-and-chunk sequence packing at document granularity: within
    each group (ordered by id), documents are laid end-to-end and cut
    into packs of ``budget_tokens`` — ``pack_id = floor(exclusive-prefix
    -sum(tokens) / budget)``, the deterministic window form of the
    standard training-data packing pass.

    One window per group: shuffle keyed on ``group_col``, linear work;
    skew caps out at the largest single source (pre-shard hot sources by
    salting the group key if one source dominates)."""
    n_tokens = F.regexp_count(F.col(text_col), F.lit(r"\S+")).cast("bigint")
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        df.select(F.col(id_col), F.col(group_col), n_tokens.alias("n_tokens"))
        .withColumn("pack_id", F.floor(pre / F.lit(budget_tokens)))
    )


def pack_bestfit(
    df: DataFrame,
    budget_tokens: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    n_buckets: int = 2,
) -> DataFrame:
    """First-fit-decreasing sequence packing — the fill-maximizing
    upgrade of ``pack_documents``'s concat-and-chunk: within each
    (group, bucket) the docs are taken in (tokens DESC, id ASC) order
    and each is placed into the LOWEST-indexed open pack that still
    has room, else a new pack opens (packs numbered 1.. by opening
    order).  Every pack respects the budget, so the trainer pays
    padding only — never the truncation/overflow of whole-doc
    concat-and-chunk (``q_pack_policy_audit`` quantifies the gap).
    A doc longer than the budget opens its own pack whose remainder
    goes negative — nothing else ever fits in it, so oversize docs are
    deterministic singletons, uniform with the normal rule.

    Scale shape: docs are split into ``n_buckets`` portable-hash
    buckets (60-bit md5-prefix of the id — bit-reproducible in DuckDB)
    and FFD runs per (group, bucket) in ``applyInPandas``: one shuffle
    keyed on (group, bucket), task memory O(bucket), no global sort.
    Hash buckets see a representative length mix (rank-sliced buckets
    would segregate lengths and pack strictly worse).  Production
    sizing: n_buckets ≈ corpus_docs / target_bucket_docs keeps the
    per-task working set fixed as data grows; packing quality degrades
    only by the bucket-boundary fragmentation (≤ one underfilled pack
    per bucket)."""
    n_tokens = F.regexp_count(F.col(text_col), F.lit(r"\S+")).cast("bigint")
    base = df.select(
        F.col(id_col), F.col(group_col), n_tokens.alias("n_tokens")
    )
    return _ffd_pack_counts(base, budget_tokens, id_col, group_col, n_buckets)


class _FirstFit:
    """Lowest-indexed open pack with remainder >= need, in O(log P)
    per placement: a max-segment-tree over pack remainders, first-fit
    found by leftmost descent.  Exactly the linear-scan first-fit rule
    (differential-fuzzed against the from-scratch Python reference in
    tests/test_property_fuzz.py), but the per-bucket worst case drops
    from O(docs × open_packs) to O(docs × log docs) — a bucket of many
    tiny docs at a large budget no longer goes quadratic.  Capacity is
    the doc count (a pack only opens when a doc starts it), so memory
    stays O(bucket) like the scan it replaces."""

    def __init__(self, n_docs: int):
        cap = 1
        while cap < max(1, n_docs):
            cap *= 2
        self.cap = cap
        self.tree = [-1] * (2 * cap)  # -1 = not yet opened
        self.n_open = 0

    def place(self, need: int, budget: int) -> int:
        """Pack number (1-based, opening order) that receives ``need``."""
        t, cap = self.tree, self.cap
        if t[1] >= need:  # some open pack fits: walk to the leftmost
            node = 1
            while node < cap:
                node = 2 * node if t[2 * node] >= need else 2 * node + 1
            t[node] -= need
        else:  # open a new pack (remainder may go negative: oversize doc)
            node = cap + self.n_open
            self.n_open += 1
            t[node] = budget - need
        pack = node - cap + 1
        node //= 2
        while node:
            t[node] = max(t[2 * node], t[2 * node + 1])
            node //= 2
        return pack


def _ffd_pack_counts(
    base: DataFrame,
    budget_tokens: int,
    id_col: str,
    group_col: str,
    n_buckets: int,
) -> DataFrame:
    """FFD over precomputed (id, group, n_tokens) rows — the shared
    core of ``pack_bestfit`` (whole docs) and ``split_pack_bestfit``
    (budget-capped pieces).  Output schema mirrors the input's id and
    group column types rather than hard-coding them."""
    import pandas as pd

    id_type = base.schema[id_col].dataType.simpleString()
    group_type = base.schema[group_col].dataType.simpleString()
    bucket = (
        F.expr(
            f"cast(conv(substr(md5(cast({id_col} as string)), 1, 15), 16, 10)"
            " as bigint)"
        )
        % n_buckets
    ).cast("int")
    base = base.select(
        F.col(id_col),
        F.col(group_col),
        bucket.alias("bucket"),
        F.col("n_tokens"),
    )

    def ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", id_col], ascending=[False, True]
        ).reset_index(drop=True)
        fit = _FirstFit(len(pdf))
        pdf["pack"] = pd.Series(
            [fit.place(int(need), budget_tokens) for need in pdf["n_tokens"]],
            dtype="int32",
        )
        return pdf

    return base.groupBy(group_col, "bucket").applyInPandas(
        ffd,
        f"{id_col} {id_type}, {group_col} {group_type}, bucket int,"
        " n_tokens bigint, pack int",
    )


def split_pack_bestfit(
    df: DataFrame,
    budget_tokens: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    n_buckets: int = 2,
) -> DataFrame:
    """Split-then-pack — the policy a production trainer actually
    runs, completing the q_pack_policy_audit decision table: each doc
    is first cut into budget-capped token runs (full pieces + one
    remainder; ``piece_id = doc_id·10⁶ + piece_idx`` keeps ids
    deterministic and join-recoverable), then FFD packs the PIECES.
    No piece exceeds the budget, so unlike whole-doc best-fit there
    are no oversize singletons (zero overflow at ANY budget) and the
    full pieces close packs at exactly 100% fill; only remainders
    fragment.  Token runs are contiguous, so attention-mask packing
    can reconstruct each doc from (doc_id, piece_idx) order.

    Plan: the split is a codegen'd sequence-explode over the token
    count (no text shuffles — only (piece, count) scalars), then the
    shared bucketed-FFD core; same O(bucket) task memory."""
    n = F.regexp_count(F.col(text_col), F.lit(r"\S+")).cast("bigint")
    b = F.lit(budget_tokens).cast("bigint")
    base = df.select(F.col(id_col), F.col(group_col), n.alias("_n")).where(
        F.col("_n") > 0
    )
    pieces = base.select(
        F.col(id_col).alias("_doc"),
        F.col(group_col),
        F.col("_n"),
        F.explode(
            F.expr(f"sequence(cast(0 as bigint), (_n - 1) div {budget_tokens})")
        ).alias("piece_idx"),
    ).select(
        (F.col("_doc") * F.lit(1_000_000) + F.col("piece_idx")).alias("piece_id"),
        F.col("_doc").alias(id_col),
        F.col("piece_idx"),
        F.col(group_col),
        F.least(b, F.col("_n") - F.col("piece_idx") * b).alias("n_tokens"),
    )
    packed = _ffd_pack_counts(
        pieces.select("piece_id", group_col, "n_tokens"),
        budget_tokens,
        "piece_id",
        group_col,
        n_buckets,
    )
    return packed.join(
        pieces.select("piece_id", id_col, "piece_idx"), "piece_id"
    ).select(
        "piece_id", id_col, "piece_idx", group_col, "bucket", "n_tokens", "pack"
    )


def pack_nextfit(
    df: DataFrame,
    budget_tokens: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Next-fit document-granularity packing — the honest LOSSLESS
    baseline for ``pack_bestfit``: walk docs in id order with ONE open
    pack, close it whenever the next doc doesn't fit (no straddling,
    so unlike ``pack_documents`` nothing overfills/truncates; unlike
    best-fit, closed packs never reopen, so mid-stream waste stays).
    An oversize doc (> budget) becomes an overfilled singleton — the
    open pack it forces is closed by whatever follows.

    One ``applyInPandas`` task per group, linear walk: same skew note
    as ``pack_documents`` (pre-shard hot sources if one dominates —
    sequential order is only meaningful within a shard anyway)."""
    import pandas as pd

    n_tokens = F.regexp_count(F.col(text_col), F.lit(r"\S+")).cast("bigint")
    base = df.select(
        F.col(id_col), F.col(group_col), n_tokens.alias("n_tokens")
    )
    id_type = base.schema[id_col].dataType.simpleString()
    group_type = base.schema[group_col].dataType.simpleString()

    def nextfit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        packs, pack, fill = [], 0, None
        for need in pdf["n_tokens"]:
            if fill is None or fill + need > budget_tokens:
                pack, fill = pack + 1, int(need)
            else:
                fill += int(need)
            packs.append(pack)
        pdf["pack"] = pd.Series(packs, dtype="int32")
        return pdf

    return base.groupBy(group_col).applyInPandas(
        nextfit,
        f"{id_col} {id_type}, {group_col} {group_type}, n_tokens bigint,"
        " pack int",
    )


def vocab_top_terms(
    df: DataFrame, text_col: str = "text", k: int = 50
) -> DataFrame:
    """Top-k vocabulary by document frequency (distinct docs containing
    the word), tie-broken (df desc, term asc) — corpus-level vocabulary
    statistics.  Per-doc distinct + combiner-reduced count: the shuffle
    carries (term, partial count), never raw text; final top-k is a
    ``TakeOrderedAndProject``, not a global sort."""
    words = df.select(
        F.explode(
            F.array_distinct(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
            )
        ).alias("term")
    )
    counts = words.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    return counts.orderBy(F.desc("doc_freq"), F.asc("term")).limit(k)


def doc_top_distinctive_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    max_doc_id: int | None = None,
) -> DataFrame:
    """Per-document top-k distinctive terms: rank by (term frequency
    desc, document frequency asc, term asc) and attach the TF-IDF score.

    The RANKING is pure integer lexicographic ordering — engine-exact,
    no FP in the decision path (for fixed tf it coincides with tf·idf
    order; across tf values it prefers frequent-in-doc first, a
    documented, deterministic choice).  The tf·idf VALUE (tf·ln(N/df))
    is emitted rounded to 6 dp as a score column only.

    Two shuffles total: term-level df aggregation (combiner-reduced),
    then the per-doc top-k window keyed on doc id."""
    if max_doc_id is not None:
        df = df.where(F.col(id_col) <= max_doc_id)
    # lazy corpus count: a 1-row aggregate broadcast into the plan —
    # an eager df.count() here would launch a full scan at
    # plan-CONSTRUCTION time and pay for the corpus twice
    n_docs = df.select(F.count(F.lit(1)).cast("double").alias("_n_docs"))
    terms = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
        ).alias("term"),
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy(id_col).orderBy(
        F.desc("tf"), F.asc("df"), F.asc("term")
    )
    return (
        tf.join(dfreq, "term")
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            "tf",
            "df",
            "rank",
            F.round(
                F.col("tf") * F.log(F.col("_n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )


#: no lookaround — portable across Java regex (Spark) and RE2 (DuckDB)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"


def redact_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Count and redact email/phone PII spans — the scrubbing pass every
    training corpus gets.  Pure per-row regex rewrite (codegen'd, no
    shuffle); patterns deliberately avoid lookaround so the oracle can
    run the identical regex."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("bigint").alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ).alias("redacted"),
    )


def fixed_width_histogram(
    df: DataFrame, value_col: str, width: float
) -> DataFrame:
    """Single-pass fixed-width histogram: bucket id, inclusive lower
    edge, count, exact sum, min, max per bucket.

    One map-side-combined hash aggregate over the scan — no sort, no
    second pass for bounds (equi-depth/quantile histograms need the
    two-pass ``approxQuantile`` route; this is the profiling/dashboard
    staple that doesn't).  ``floor`` is written explicitly because
    Spark's double→long cast truncates while DuckDB's rounds — floor is
    the one both engines agree on (same guard as
    ``timeseries.gap_fill``).  Buckets with no rows simply don't appear
    (densify against ``sequence(min, max)`` downstream if a chart needs
    zeros — that's presentation, not aggregation).
    """
    from ..functions.numeric import dsum

    b = F.floor(F.col(value_col) / F.lit(width)).cast("long")
    return (
        df.groupBy(b.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum(value_col, "sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .withColumn("bucket_lo", F.col("bucket") * F.lit(width))
        .select("bucket", "bucket_lo", "n_rows", "sum_value", "min_value", "max_value")
        .orderBy("bucket")
    )


def quality_audit(
    df: DataFrame,
    key_cols: list[str],
    not_null: list[str] | None = None,
    bounds: dict[str, tuple[float, float]] | None = None,
    reference: tuple[DataFrame, str, str] | None = None,
) -> DataFrame:
    """Declarative data-quality audit (the Deequ/dbt-test shape): verify
    key uniqueness, NULL-freedom, numeric bounds, and (optionally)
    referential integrity, and emit one row per check:
    ``(check string, metric bigint, passed boolean)`` where ``metric``
    counts the violating rows (0 = clean).

    ONE combiner-reduced scan computes every row-level check — the
    violation counters are conditional counts riding a single hash
    aggregate with the exact key-distinct (no per-check scans, the
    N-scans-for-N-checks trap a naive audit falls into).  The optional
    referential check is a broadcast-or-shuffled ANTI join against the
    reference keys only (projected, so the reference's payload never
    moves).  Counters use COUNT(CASE) not SUM(CASE): engines agree on
    COUNT's BIGINT where SUM-of-int types diverge.
    """
    not_null = not_null or []
    bounds = bounds or {}
    key = F.struct(*[F.col(c) for c in key_cols])
    aggs = [
        F.count(F.lit(1)).alias("_n"),
        F.countDistinct(key).alias("_kd"),
    ]
    for c in not_null:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"_nn_{c}"))
    for c, (lo, hi) in bounds.items():
        aggs.append(
            F.count(
                F.when((F.col(c) < F.lit(lo)) | (F.col(c) > F.lit(hi)), 1)
            ).alias(f"_ob_{c}")
        )
    a = df.agg(*aggs)
    checks = [(f"key_unique:{','.join(key_cols)}", F.col("_n") - F.col("_kd"))]
    checks += [(f"not_null:{c}", F.col(f"_nn_{c}")) for c in not_null]
    checks += [(f"bounds:{c}", F.col(f"_ob_{c}")) for c, _ in bounds.items()]
    rows = a.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("check"),
                        m.cast("long").alias("metric"),
                        (m == 0).alias("passed"),
                    )
                    for name, m in checks
                ]
            )
        ).alias("_r")
    ).select("_r.*")
    if reference is not None:
        ref_df, fk, pk = reference
        orphans = (
            df.select(F.col(fk))
            .join(ref_df.select(F.col(pk).alias(fk)).distinct(), fk, "left_anti")
            .agg(F.count(F.lit(1)).alias("metric"))
            .select(
                F.lit(f"fk_exists:{fk}").alias("check"),
                F.col("metric").cast("long").alias("metric"),
                (F.col("metric") == 0).alias("passed"),
            )
        )
        rows = rows.unionByName(orphans)
    return rows.orderBy("check")


def temperature_mix(
    df: DataFrame,
    id_col: str,
    source_col: str,
    target_fraction: float = 0.5,
) -> DataFrame:
    """Temperature-based domain mixing (the training-mixture staple):
    resample so source shares follow ``sqrt(n_s)`` instead of raw counts
    — big sources are down-weighted, small sources up-weighted, total
    draw ≈ ``target_fraction`` of the corpus.

    Per-source keep rate ``r_s = (√n_s / Σ√n) · N / n_s`` (clamped to
    1); each doc keeps iff its portable multiplicative hash falls below
    ``floor(r_s · 2³²)`` — exact integer comparison, deterministic and
    engine-portable.  The exponent is FIXED at 0.5 because IEEE
    requires ``sqrt`` correctly rounded — both engines produce the same
    bits — while ``pow(n, α)`` for general α may differ by an ulp
    across libms and flip boundary hashes.  Source stats are a
    combiner-reduced aggregate broadcast back; text never shuffles.

    Returns per-source totals: (source, n_docs, n_kept).
    """
    stats = df.groupBy(F.col(source_col).alias("_src")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    # Σ√n through DECIMAL: sqrt itself is IEEE correctly-rounded on
    # both engines, but a plain double SUM is order-dependent and the
    # engines fold in different orders — the same discipline as dsum
    tot = stats.agg(
        F.sum(F.sqrt(F.col("_n").cast("double")).cast("decimal(38,18)"))
        .cast("double")
        .alias("_sw"),
        F.sum("_n").alias("_total"),
    )
    rates = stats.crossJoin(F.broadcast(tot)).select(
        "_src",
        "_n",
        F.least(
            F.lit(1.0),
            (F.sqrt(F.col("_n").cast("double")) / F.col("_sw"))
            * (F.col("_total").cast("double") * F.lit(target_fraction))
            / F.col("_n").cast("double"),
        ).alias("_rate"),
    )
    cut = F.floor(F.col("_rate") * F.lit(4294967296.0)).cast("long")
    kept = (
        df.select(F.col(id_col).alias("_id"), F.col(source_col).alias("_src"))
        .join(F.broadcast(rates), "_src")
        .where(portable_hash("_id") < cut)
        .groupBy("_src")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        rates.join(kept, "_src", "left")
        .select(
            F.col("_src").alias(source_col),
            F.col("_n").alias("n_docs"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
        .orderBy(source_col)
    )


def boilerplate_ngrams(
    df: DataFrame,
    n: int = 5,
    min_docs: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level boilerplate mining: word n-grams that recur across
    ``min_docs``+ DISTINCT documents — headers, license banners,
    navigation chrome, template sentences.  (C4 does this per-line;
    these synthetic docs are single-line, so the phrase axis is the
    n-gram.)  The output phrase list is what a cleaning pass joins
    against to strip or down-weight template content.

    Plan: per-doc distinct n-grams (pure codegen'd sequence/slice
    expressions — no UDF), one explode, one combiner-reduced count per
    phrase.  The explode is ~|tokens| rows per doc and the shuffle
    carries (phrase, partial count) with map-side combine — the
    wordcount shape, linear at any corpus size.  Guard: ``sequence``
    is only evaluated when the doc has ≥ n tokens (Spark's sequence
    DESCENDS when stop < start — an unguarded ``sequence(1, size-n+1)``
    would silently emit reversed junk grams for short docs).
    """
    # token array MATERIALIZED first: slicing the split expression
    # inside the transform lambda re-runs the split per gram position
    # (the O(len²)-per-document interpreted-HOF pattern, r08)
    tt = df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("_t"))
    k = F.size(F.col("_t")) - F.lit(n - 1)
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_join(F.slice(F.col("_t"), i, n), " "),
        )
    )
    return (
        tt.select(
            F.col(id_col),
            F.explode(
                F.when(k >= 1, grams).otherwise(F.array().cast("array<string>"))
            ).alias("phrase"),
        )
        .groupBy("phrase")
        .agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def dsir_weights(
    df: DataFrame,
    target: Column,
    n_buckets: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document importance weights for target-distribution matching
    (the hashed-n-gram DSIR recipe: Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score(doc) =
    Σ_tokens log p̂(bucket)/q̂(bucket), where p̂ is the add-one-smoothed
    hashed-unigram distribution of the TARGET slice (rows matching
    ``target``) and q̂ of the whole corpus.  High-weight docs look like
    the target domain; resampling by weight tilts a raw crawl toward
    it.

    Plan shape for 100 TB: tokens explode once; both bucket histograms
    are ``n_buckets``-row aggregates (combiner-reduced, fixed-size
    shuffle); the per-bucket log-ratio table is broadcast back onto the
    token stream; per-doc summation is one groupBy.  Nothing driver-
    side, nothing quadratic; the bucket count is the only memory knob.
    The md5-prefix bucket hash is the portable-hash doctrine for
    STRINGS (same value in Spark and DuckDB — see group_aware_split).
    Weights are ROUNDed at 6 dp: the sum of per-token doubles is
    order-sensitive at ~1e-15 and libm log may differ by an ulp across
    engines; 6 dp is far above both (the moments precedent).
    """
    tok = (
        df.select(
            F.col(id_col),
            target.alias("_is_target"),
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w"),
        )
        .where(F.col("w") != "")
        .select(
            F.col(id_col),
            "_is_target",
            (
                F.conv(F.substring(F.md5(F.col("w")), 1, 8), 16, 10).cast("bigint")
                % F.lit(n_buckets)
            ).alias("b"),
        )
    )
    hist = tok.groupBy("b").agg(
        F.count("*").alias("q_cnt"),
        F.count(F.when(F.col("_is_target"), 1)).alias("t_cnt"),
    )
    tot = hist.agg(
        F.sum("q_cnt").alias("q_tot"), F.sum("t_cnt").alias("t_tot")
    )
    llr = (
        hist.crossJoin(F.broadcast(tot))  # 1-row totals
        .select(
            "b",
            (
                F.log((F.col("t_cnt") + 1).cast("double") / (F.col("t_tot") + n_buckets).cast("double"))
                - F.log((F.col("q_cnt") + 1).cast("double") / (F.col("q_tot") + n_buckets).cast("double"))
            ).alias("llr"),
        )
    )
    return (
        tok.join(F.broadcast(llr), "b")
        .groupBy(id_col)
        .agg(
            F.round(F.sum("llr"), 6).alias("weight"),
            F.count("*").alias("n_tokens"),
        )
    )


def ngram_novelty(
    df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document novelty: the fraction of the doc's distinct word
    n-grams that appear in NO other document — the inverse signal of
    :func:`boilerplate_ngrams` (template content scores ~0, unique
    prose ~1).  Curation uses it two ways: low-novelty docs are
    template/mirror suspects; and for eval-set construction, HIGH
    corpus-overlap (low novelty vs the training corpus) flags
    contamination/memorization risk.

    Same wordcount shape as the boilerplate miner: one explode, one
    combiner-reduced count per gram, one broadcast-size-agnostic join
    back, one per-doc aggregate.  The ratio is a SINGLE integer÷integer
    divide — no FP sum, so the oracle hash-matches with no rounding
    scaffolding.
    """
    # token array MATERIALIZED first — same O(len²) interpreted-HOF
    # avoidance as boilerplate_ngrams (r08)
    tt = df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("_t"))
    k = F.size(F.col("_t")) - F.lit(n - 1)
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_join(F.slice(F.col("_t"), i, n), " "),
        )
    )
    exploded = tt.select(
        F.col(id_col),
        F.explode(
            F.when(k >= 1, grams).otherwise(F.array().cast("array<string>"))
        ).alias("_g"),
    )
    counts = exploded.groupBy("_g").agg(F.count("*").alias("_docs"))
    return (
        exploded.join(counts, "_g")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.count(F.when(F.col("_docs") == 1, 1)).alias("n_novel"),
        )
        .select(
            id_col,
            "n_grams",
            "n_novel",
            (F.col("n_novel").cast("double") / F.col("n_grams").cast("double")).alias(
                "novelty"
            ),
        )
    )


def k_anonymize(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
    redacted: str = "*",
) -> DataFrame:
    """k-anonymity enforcement over quasi-identifier columns — the
    privacy gate a training-data pipeline runs before releasing
    metadata-bearing corpora (Sweeney 2002): any row whose
    quasi-identifier EQUIVALENCE CLASS (the exact combination of
    ``quasi_cols`` values) holds fewer than ``k`` rows is re-identifiable
    by linkage, so its quasi values are suppressed (replaced with
    ``redacted``) rather than dropped — content survives, linkage keys
    don't.

    Returns the input frame with each quasi column rewritten
    (string-cast; suppression is a string-domain operation) plus
    ``class_size`` (the pre-suppression class population) and
    ``suppressed``.

    Scale shape: one combiner-reduced groupBy over the quasi columns
    produces the class-size table — at most |distinct combinations|
    rows, orders of magnitude below the corpus for real quasi spaces —
    joined back onto the stream.  No forced broadcast hint: for
    low-cardinality quasi spaces AQE auto-broadcasts the class-size
    table (same plan as a hint), while a pathological near-unique quasi
    space — where the table approaches corpus size — degrades to a
    sort-merge join instead of OOMing the driver on a forced broadcast.
    (A window count over the same keys computes the identical thing
    with a full shuffle of the corpus either way.)  NULL quasi values
    form their own class (null-safe grouping), matching SQL GROUP BY
    semantics in both engines.
    """
    qs = [F.col(c).cast("string") for c in quasi_cols]
    sizes = df.groupBy(*qs).agg(F.count(F.lit(1)).alias("class_size"))
    cond = [df[c].cast("string").eqNullSafe(sizes[c]) for c in quasi_cols]
    joined = df.join(sizes.select(*quasi_cols, "class_size"), cond, "left")
    small = F.col("class_size") < k
    out_cols = []
    for c in df.columns:
        if c in quasi_cols:
            out_cols.append(
                F.when(small, F.lit(redacted))
                .otherwise(df[c].cast("string"))
                .alias(c)
            )
        else:
            out_cols.append(df[c])
    return joined.select(*out_cols, "class_size", small.alias("suppressed"))


def domain_cap(
    df: DataFrame,
    domain_col: str = "source",
    order_col: str = "n_chars",
    id_col: str = "doc_id",
    cap: int = 10,
) -> DataFrame:
    """Per-domain document cap — the crawl-pipeline rebalancer: no
    single source may contribute more than ``cap`` documents, and the
    kept ones are its best by the rank key (here the exact-integer
    length column; in production swap any computed quality score in —
    the plan is identical).  Deterministic tie-break by id.

    Scale shape: ONE window pass partitioned by domain (count per
    domain is naturally bounded by crawl politeness; a pathological
    mega-domain is exactly what the cap truncates, and AQE's skew
    handling splits its sort).  No self-join, no global sort.
    Output: input columns + ``domain_rank``."""
    from pyspark.sql import Window

    w = Window.partitionBy(domain_col).orderBy(
        F.desc(order_col), F.asc(id_col)
    )
    return (
        df.withColumn("domain_rank", F.row_number().over(w))
        .where(F.col("domain_rank") <= cap)
    )


def epoch_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    epoch: int = 1,
) -> DataFrame:
    """Deterministic training-epoch shuffle: every row gets a
    pseudorandom but REPRODUCIBLE permutation key (the portable
    multiplicative hash of ``id + epoch·1000003`` — a different
    permutation every epoch, the same one on every retry/engine), a
    shard assignment, and its position within the shard.  This is the
    global-shuffle-before-sharding step of a training-data writer,
    WITHOUT a global sort: per-shard ``row_number`` is a partitioned
    window, so the only exchange is the shard hash partition — each
    writer task then streams its shard in key order.

    Output: (id, shard, position) — all integers, mirrored exactly in
    SQL."""
    from pyspark.sql import Window

    key = portable_hash(F.col(id_col) + F.lit(epoch * 1_000_003))
    w = Window.partitionBy("shard").orderBy("shuffle_key", id_col)
    return (
        df.select(
            F.col(id_col),
            key.alias("shuffle_key"),
            (key % F.lit(n_shards)).alias("shard"),
        )
        .withColumn("position", F.row_number().over(w))
        .select(id_col, "shard", "position")
    )


def synth_url_col(doc_id: Column | str = "doc_id", source: Column | str = "source") -> Column:
    """Deterministic MESSY URL for one doc — the generator half of the
    hash-exact URL-normalization round-trip (the synth_bmp/synth_wav
    pattern: the test corpus carries no URLs, so the query synthesizes
    them closed-form from columns both engines see identically).  Every
    normalization hazard is exercised by construction: upper-case
    scheme and host, a ``www.`` prefix, default ports (``:80``/``:443``
    — including https-default on an http URL, which must be KEPT),
    non-default ``:8080``, ``utm_*`` tracking params before and after
    real params, unsorted query keys, and fragments."""
    d = F.col(doc_id) if isinstance(doc_id, str) else doc_id
    s = F.col(source) if isinstance(source, str) else source
    m = lambda k: F.pmod(d, F.lit(k))
    scheme = F.when(m(2) == 0, F.lit("HTTP")).otherwise(F.lit("https"))
    host = (
        F.when(m(3) == 0, F.concat(F.lit("WWW."), F.upper(s), F.lit(".Example.COM")))
        .when(m(3) == 1, F.concat(s, F.lit(".example.com")))
        .otherwise(F.concat(F.lit("www."), s, F.lit(".EXAMPLE.com")))
    )
    port = (
        F.when(m(5) == 0, F.lit(":80"))
        .when(m(5) == 1, F.lit(":443"))
        .when(m(5) == 2, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    path = F.concat(F.lit("/docs/"), m(50).cast("string"))
    query = (
        F.when(
            m(4) == 0,
            F.concat(
                F.lit("?utm_source=feed&id="), m(7).cast("string"), F.lit("&utm_campaign=x")
            ),
        )
        .when(m(4) == 1, F.concat(F.lit("?ref=home&id="), m(7).cast("string")))
        .when(m(4) == 2, F.lit("?utm_medium=em"))
        .otherwise(F.lit(""))
    )
    frag = F.when(m(6) == 0, F.lit("#top")).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port, path, query, frag)


#: query params stripped by URL normalization (tracking noise)
URL_TRACKING_RE = "^(utm_[a-z]+|fbclid|gclid)="


def normalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Canonical URL normalization as PURE codegen'd string expressions
    (no UDF, no driver loop — the plan a 100 TB crawl wants): crawl
    pipelines key dedup, domain caps and robots policy on the
    normalized form, so the rules are the standard canonicalization
    set, each deterministic and engine-mirrorable:

    1. scheme and host lower-cased; one leading ``www.`` stripped
    2. default ports dropped (``http:80``, ``https:443``); any other
       explicit port kept — including ``:443`` on an *http* URL
    3. fragment dropped
    4. query: tracking params removed (``utm_*``, ``fbclid``,
       ``gclid``), the rest BYTE-SORTED and rejoined — param order no
       longer distinguishes URLs; an emptied query drops its ``?``

    Adds ``host`` (the rollup/dedup key) and ``url_norm``; feeds
    :func:`domain_cap` / :func:`temperature_mix` directly."""
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    qs = F.regexp_extract(u, r"\?([^#]*)", 1)
    host = F.regexp_replace(
        F.regexp_replace(F.lower(hostport), r":\d+$", ""), r"^www\.", ""
    )
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    params = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda x: (x != "") & ~x.rlike(URL_TRACKING_RE),
        )
    )
    norm = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(
            F.size(params) > 0,
            F.concat(F.lit("?"), F.array_join(params, "&")),
        ).otherwise(F.lit("")),
    )
    return df.withColumn("host", host).withColumn("url_norm", norm)


def stride_schedule(
    counts: DataFrame,
    n_steps: int,
    key_col: str = "lang",
    cnt_col: str = "cnt",
) -> DataFrame:
    """Deterministic stride-scheduler interleave: the exact order in
    which a training pipeline emits examples from several corpora at
    fixed ratios.  Source ``key``'s k-th emission happens at virtual
    time (2k+1)/(2*cnt) — strides proportional to 1/share, phase-offset
    to the stride midpoint — which yields the classic guarantee that
    after ANY prefix of n steps each source has emitted within 1 of
    n*share: no burst, no starvation, reproducible from row one
    (property-fuzzed against a from-scratch reference in
    tests/test_property_fuzz.py).

    ``counts`` is a per-source weight table (a combiner-reduced
    aggregate — sources, not rows, so broadcast-sized).  The first
    ``n_steps`` emissions are selected by a TakeOrderedAndProject over
    sources x n_steps candidate times; the row_number window that
    assigns step ids runs on that bounded result, never on anything
    corpus-sized.  Times are one double division with identical
    operands on any engine; (t, key) is a total order (t is strictly
    increasing in k within a source), so the schedule is
    engine-independent."""
    seq = counts.select(
        key_col,
        cnt_col,
        F.explode(F.sequence(F.lit(0), F.lit(n_steps - 1))).alias("k"),
    )
    timed = seq.select(
        key_col,
        F.col("k").cast("long").alias("k"),
        ((2 * F.col("k") + 1) / (2 * F.col(cnt_col))).alias("t"),
    )
    first = timed.orderBy("t", key_col).limit(n_steps)
    w = Window.orderBy("t", key_col)
    return (
        first.withColumn("step", F.row_number().over(w).cast("long"))
        .select("step", key_col, "k")
        .orderBy("step")
    )
