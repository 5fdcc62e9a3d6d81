"""Deterministic synthetic journal (WAL) generator.

Models the IBM i journal the reference connector tails
(entry layout: ``journal-parsing/.../rjne0200/EntryHeader.java:9-46``;
entry-type codes: ``journal-parsing/.../JournalEntryType.java:6-42``)
as a *columnar changelog table* over Common-Crawl-style web pages
(``url, warc_ts, html, text, lang`` — BASELINE.json input_hint).

Everything is a pure function of ``spark.range(n)`` row ids hashed
with ``xxhash64`` — no Python RNG on executors, so the same config
yields byte-identical data at any parallelism and any scale (the
generator is O(n) with one window only when before-images are exact).

Journal semantics reproduced (SURVEY.md §1.3):
- total order per receiver; receivers rotate every
  ``receiver_rotation`` entries and ``seq`` optionally *resets* per
  receiver (ordering key is then ``(receiver_idx, seq)``, never
  ``seq`` alone — ReceiverPagination.java:160-195 edge case);
- updates emit a before-image (``R.UB``) entry immediately followed
  by the after-image (``R.UP``) unless "minimized" (UP only);
- transactions: ``C.SC`` opens commit-cycle, ``C.CM`` closes it;
- noise the engine must filter: an ignored table, ``F.OP``/``F.CL``
  member ops, and ``D.CG`` schema-change markers;
- hot-url skew: power-law url popularity (``skew`` knob).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# 6 sequence slots per logical op keep every entry kind's seq a pure,
# collision-free function of the op index (gaps in seq are normal in
# real journals; only monotonicity matters):
#   slot 0: C.SC of the cycle starting at this op
#   slot 1: R.UB before-image      slot 2: R.PT/UP/DL data row
#   slot 3: F.OP/F.CL noise        slot 4: C.CM of cycle ending here
#   slot 5: D.CG schema-change marker
_SLOTS = 6


@dataclass
class JournalGenConfig:
    n_urls: int = 1_000
    n_ops: int = 10_000
    seed: int = 42
    skew: float = 2.0  # >1 concentrates ops on low url ids (zipf-ish)
    update_pct: float = 0.80  # P(update | not first op for url)
    # P(minimized update) -> UP with no preceding UB
    minimized_pct: float = 0.20
    txn_size: int = 50  # logical ops per commit cycle
    receiver_rotation: int = 2_000  # journal entries per receiver
    seq_reset_per_receiver: bool = True
    ignore_table_pct: float = 0.05  # noise rows on an ignored table
    member_noise_pct: float = 0.02  # F.OP / F.CL noise entries
    schema_change_every: int = 0  # if >0, a D.CG row every N cycles
    exact_before_images: bool = True  # lag-window true before image
    base_ts: str = "2024-01-01 00:00:00"
    # payload sizing: body bulk ~ 32*html_bulk_repeat bytes (real
    # Common-Crawl pages are KB-scale; small default keeps unit tests
    # fast, benches crank it up)
    html_bulk_repeat: int = 2


def _u(col, seed: int, salt: str):
    """Deterministic uniform [0,1) from a column (xxhash64-based)."""
    h = F.xxhash64(F.lit(salt), F.lit(seed), col)
    return (F.pmod(h, F.lit(1_000_000_000)).cast("double")) / 1_000_000_000.0


def _make_url(url_id):
    return F.concat(
        F.lit("https://site-"),
        F.pmod(url_id, F.lit(997)).cast("string"),
        F.lit(".example.com/page/"),
        url_id.cast("string"),
    )


def _make_lang(url_id):
    return F.element_at(
        F.array(*[F.lit(x) for x in ("en", "de", "fr", "es", "it")]),
        (F.pmod(F.xxhash64(F.lit("lang"), url_id), F.lit(5)) + 1).cast("int"),
    )


def _make_html(url, version, lang, bulk_repeat: int = 2):
    """Deterministic html payload for (url, version).

    The body text is a pure function of (url, version) so that the
    byte-identical-text-per-url invariant is checkable: extracting
    text from this html must reproduce exactly what a naive oracle
    computes. Includes tags, entities, and control chars to exercise
    the decode UDF (C3/C6/C8). ``bulk_repeat`` scales the body toward
    realistic page sizes.
    """
    word = F.substring(F.md5(F.concat(url, F.lit("#"), version.cast("string"))), 1, 8)
    body = F.concat(
        F.lit("Title "),
        word,
        F.lit(" v"),
        version.cast("string"),
        F.lit(" lang="),
        lang,
        F.lit(" content "),
        F.md5(F.concat(F.lit("p1"), url, version.cast("string"))),
        F.lit(" "),
        F.md5(F.concat(F.lit("p2"), url, version.cast("string"))),
        F.lit(" "),
        F.repeat(
            F.concat(
                F.md5(F.concat(F.lit("bulk"), url, version.cast("string"))),
                F.lit(" "),
            ),
            bulk_repeat,
        ),
    )
    html = F.concat(
        F.lit('<html><head><meta charset="utf-8"><title>T</title>'),
        F.lit("<script>var x=1;</script><style>.a{}</style></head><body><h1>"),
        word,
        F.lit("</h1><p>"),
        body,
        F.lit(" &amp; tail\x01</p></body></html>"),
    )
    return F.encode(html, "UTF-8")


def generate_pages(spark: SparkSession, cfg: JournalGenConfig) -> DataFrame:
    """Initial snapshot source table: version-0 page per url."""
    df = spark.range(cfg.n_urls).withColumnRenamed("id", "url_id")
    url = _make_url(F.col("url_id"))
    lang = _make_lang(F.col("url_id"))
    version = F.lit(0).cast("long")
    return df.select(
        url.alias("url"),
        (
            F.to_timestamp(F.lit(cfg.base_ts)).cast("long") - F.lit(86400)
            + F.pmod(F.col("url_id"), F.lit(86400))
        ).cast("timestamp").alias("warc_ts"),
        _make_html(url, version, lang, cfg.html_bulk_repeat).alias("html"),
        lang.alias("lang"),
        version.alias("version"),
    )


def generate_journal(spark: SparkSession, cfg: JournalGenConfig) -> DataFrame:
    """Build the changelog table (FIXTURES.md §2 schema).

    Row-op entries (R.PT/R.UB/R.UP/R.DL) + commit markers (C.SC/C.CM)
    + configurable noise. Output is *unordered* (the engine must sort
    by the (receiver_idx, seq) key, never rely on file order).
    """
    ops = spark.range(cfg.n_ops).withColumnRenamed("id", "op_idx")

    u_url = _u(F.col("op_idx"), cfg.seed, "url")
    url_id = F.least(
        F.floor(F.pow(u_url, F.lit(cfg.skew)) * cfg.n_urls),
        F.lit(cfg.n_urls - 1),
    ).cast("long")
    ops = ops.withColumn("url_id", url_id)

    # version = 1-based count of ops on this url so far (window; the
    # datagen may shuffle — the engine under test must not care)
    from pyspark.sql import Window as W

    w = W.partitionBy("url_id").orderBy("op_idx")
    ops = ops.withColumn("version", F.row_number().over(w).cast("long"))

    u_op = _u(F.col("op_idx"), cfg.seed, "op")
    u_min = _u(F.col("op_idx"), cfg.seed, "minimized")
    ops = ops.withColumn(
        "kind",
        F.when(F.col("version") == 1, F.lit("PT"))
        .when(u_op < cfg.update_pct, F.lit("UP"))
        .otherwise(F.lit("DL")),
    ).withColumn(
        "minimized", (u_min < cfg.minimized_pct) & (F.col("kind") == "UP")
    )

    url = _make_url(F.col("url_id"))
    lang = _make_lang(F.col("url_id"))
    ops = ops.withColumn("url", url).withColumn("lang", lang)

    if cfg.exact_before_images:
        # true previous after-image version number per url (0 = from
        # the snapshot pages table)
        ops = ops.withColumn(
            "prev_version", F.coalesce(F.lag("version").over(w), F.lit(0)).cast("long")
        )
    else:
        ops = ops.withColumn("prev_version", (F.col("version") - 1).cast("long"))

    base_ts = F.to_timestamp(F.lit(cfg.base_ts)).cast("long")
    entry_ts = (base_ts + F.col("op_idx")).cast("timestamp")
    commit_cycle = (F.col("op_idx") / cfg.txn_size).cast("long")

    html_after = _make_html(F.col("url"), F.col("version"), F.col("lang"), cfg.html_bulk_repeat)
    html_before = _make_html(F.col("url"), F.col("prev_version"), F.col("lang"), cfg.html_bulk_repeat)

    u_ignore = _u(F.col("op_idx"), cfg.seed, "ignore")
    table_name = F.when(u_ignore < cfg.ignore_table_pct, F.lit("IGNORE")).otherwise(
        F.lit("PAGES")
    )

    data_seq = (F.col("op_idx") * _SLOTS + 2).alias("gseq")

    # data entries: the after-image / delete row
    data = ops.select(
        data_seq,
        entry_ts.alias("entry_ts"),
        F.lit("R").alias("journal_code"),
        F.col("kind").alias("entry_type"),
        commit_cycle.alias("commit_cycle"),
        table_name.alias("table_name"),
        F.col("url"),
        F.when(F.col("kind") == "DL", html_before).alias("before_html"),
        F.when(F.col("kind") != "DL", html_after).alias("html"),
        entry_ts.alias("warc_ts"),
        F.col("lang"),
        F.array(
            F.lit(False), F.lit(False), (F.col("kind") == "DL"), F.lit(False)
        ).alias("null_mask"),
    )

    # before-image entries for non-minimized updates
    ub = (
        ops.filter((F.col("kind") == "UP") & ~F.col("minimized"))
        .select(
            (F.col("op_idx") * _SLOTS + 1).alias("gseq"),
            entry_ts.alias("entry_ts"),
            F.lit("R").alias("journal_code"),
            F.lit("UB").alias("entry_type"),
            commit_cycle.alias("commit_cycle"),
            table_name.alias("table_name"),
            F.col("url"),
            html_before.alias("before_html"),
            F.lit(None).cast("binary").alias("html"),
            entry_ts.alias("warc_ts"),
            F.col("lang"),
            F.array(
                F.lit(False), F.lit(False), F.lit(False), F.lit(True)
            ).alias("null_mask"),
        )
    )

    # commit-cycle markers: SC before the first op of the cycle, CM
    # after the last
    n_cycles = (cfg.n_ops + cfg.txn_size - 1) // cfg.txn_size
    cycles = spark.range(n_cycles).withColumnRenamed("id", "cycle")
    last_op = F.least(
        (F.col("cycle") + 1) * cfg.txn_size - 1, F.lit(cfg.n_ops - 1)
    )

    def _marker(entry_type: str, gseq_col, ts_off):
        return cycles.select(
            gseq_col.alias("gseq"),
            (base_ts + ts_off).cast("timestamp").alias("entry_ts"),
            F.lit("C").alias("journal_code"),
            F.lit(entry_type).alias("entry_type"),
            F.col("cycle").alias("commit_cycle"),
            F.lit(None).cast("string").alias("table_name"),
            F.lit(None).cast("string").alias("url"),
            F.lit(None).cast("binary").alias("before_html"),
            F.lit(None).cast("binary").alias("html"),
            F.lit(None).cast("timestamp").alias("warc_ts"),
            F.lit(None).cast("string").alias("lang"),
            F.lit(None).cast("array<boolean>").alias("null_mask"),
        )

    sc = _marker("SC", F.col("cycle") * cfg.txn_size * _SLOTS, F.col("cycle") * cfg.txn_size)
    cm = _marker("CM", last_op * _SLOTS + 4, last_op)

    entries = data.unionByName(ub).unionByName(sc).unionByName(cm)

    # member-op noise the engine must drop (F4: F.OP / F.CL)
    if cfg.member_noise_pct > 0:
        n_noise = int(cfg.n_ops * cfg.member_noise_pct)
        if n_noise > 0:
            stride = max(1, cfg.n_ops // n_noise)
            noise = spark.range(n_noise).select(
                # unique op slots by construction (strided, slot 3)
                (F.col("id") * stride * _SLOTS + 3).alias("gseq"),
                (base_ts + F.col("id")).cast("timestamp").alias("entry_ts"),
                F.lit("F").alias("journal_code"),
                F.when(F.pmod(F.col("id"), F.lit(2)) == 0, F.lit("OP"))
                .otherwise(F.lit("CL"))
                .alias("entry_type"),
                F.lit(None).cast("long").alias("commit_cycle"),
                F.lit("PAGES").alias("table_name"),
                F.lit(None).cast("string").alias("url"),
                F.lit(None).cast("binary").alias("before_html"),
                F.lit(None).cast("binary").alias("html"),
                F.lit(None).cast("timestamp").alias("warc_ts"),
                F.lit(None).cast("string").alias("lang"),
                F.lit(None).cast("array<boolean>").alias("null_mask"),
            )
            entries = entries.unionByName(noise)

    # schema-change markers (T12: D.CG) — version tag in table_name
    if cfg.schema_change_every > 0:
        n_sc = n_cycles // cfg.schema_change_every
        if n_sc > 0:
            changes = spark.range(1, n_sc + 1).select(
                # slot 5 of the last op before the cycle boundary
                (
                    (F.col("id") * cfg.schema_change_every * cfg.txn_size - 1) * _SLOTS
                    + 5
                ).alias("gseq"),
                (base_ts + F.col("id") * cfg.schema_change_every * cfg.txn_size)
                .cast("timestamp")
                .alias("entry_ts"),
                F.lit("D").alias("journal_code"),
                F.lit("CG").alias("entry_type"),
                F.lit(None).cast("long").alias("commit_cycle"),
                F.concat(F.lit("PAGES@v"), F.col("id").cast("string")).alias(
                    "table_name"
                ),
                F.lit(None).cast("string").alias("url"),
                F.lit(None).cast("binary").alias("before_html"),
                F.lit(None).cast("binary").alias("html"),
                F.lit(None).cast("timestamp").alias("warc_ts"),
                F.lit(None).cast("string").alias("lang"),
                F.lit(None).cast("array<boolean>").alias("null_mask"),
            )
            entries = entries.unionByName(changes)

    # receiver chain: rotate every receiver_rotation *entries* worth
    # of gseq slots; seq resets per receiver when configured
    rot = cfg.receiver_rotation * _SLOTS
    receiver_idx = F.floor(F.col("gseq") / rot).cast("int")
    seq = (
        (F.pmod(F.col("gseq"), F.lit(rot)) + 1)
        if cfg.seq_reset_per_receiver
        else (F.col("gseq") + 1)
    ).cast("long")

    return entries.select(
        F.concat(F.lit("RCV"), F.lpad(receiver_idx.cast("string"), 6, "0")).alias(
            "receiver"
        ),
        receiver_idx.alias("receiver_idx"),
        seq.alias("seq"),
        "entry_ts",
        "journal_code",
        "entry_type",
        "commit_cycle",
        "table_name",
        "url",
        "before_html",
        "html",
        "warc_ts",
        "lang",
        "null_mask",
    )


def write_journal(
    spark: SparkSession, cfg: JournalGenConfig, path: str, num_files: int | None = None
) -> None:
    """Materialize the journal as parquet, clustered by ordering key.

    At 100 TB the journal would be an Iceberg table partitioned by
    ``receiver`` (partition pruning = the reference's server-side
    range restriction); locally plain parquet partitioned the same
    way keeps the scan path identical.
    """
    df = generate_journal(spark, cfg)
    if num_files:
        df = df.repartition(num_files)
    df.write.mode("overwrite").partitionBy("receiver_idx").parquet(path)
