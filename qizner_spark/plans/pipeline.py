"""The flagship end-to-end KG-construction DAG.

Spark translation of the reference raw-text entry point
(predict_sents, /root/reference/train_ner.py:657-719) extended with
the KG stages (north_star):

    pages(url, warc_ts, html, text, lang)          # scan
      -> extract_text (byte-identical per url)     # native exprs
      -> DROP html (column pruning before any shuffle)
      -> detect_mentions                           # one mapInPandas:
             tokenize (T1/T2) -> segment (D3) -> score -> decode (L6)
             -> in-worker segment merge (D5, NO shuffle) -> flatten (L10)
      -> link entities (guarded alias join)        # E5 dictionary
      -> co-mention edges per url                  # self-join per doc
      -> connected components (large/small-star)   # canonicalization
      -> triples (subj, pred, obj, url, warc_ts, prob)

Shuffle inventory (the whole point at 100 TB):
  1. alias-dictionary build: one groupBy(mention, ent_type) over the
     (small) mention table — map-side combined;
  2. co-mention edge build: mentions re-keyed by url (narrow if
     detection output is already url-clustered, which it is — no
     repartitioning happened since);
  3. connected components: O(log n) bounded rounds;
  4. final write, partitioned by bucket(subj).
The html binary never crosses a stage boundary. Everything before
detection is whole-stage codegen; detection is one Arrow pass.

SortMergeJoin disposition (audited on the executed sf0.001 plan,
locked in by tests/test_plan_shape.py): the initial physical plan
contains 5 SMJs — the nodes ⟕ components left join inside
``assign_components`` (appearing once per assembly branch that
references ``canon``) and the per-url co-mention self-join in
``canon_edges``. At sandbox scale AQE's runtime statistics convert
every one of them to BroadcastHashJoin (final plan: 0 SMJ, 0
CartesianProduct, 0 BroadcastNestedLoopJoin). At 100 TB the url
self-join and the entity/components joins legitimately STAY
sort-merge — both sides are large, the url key is already clustered
from detection (no extra shuffle for the sort), and pinning a
broadcast there is exactly the OOM the ``broadcast_components``
guard exists to prevent. No action needed; the plan picks the right
strategy at each scale because the joins are unhinted equi-joins.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from qizner_spark.gazetteer import GAZETTEER_FULL
from qizner_spark.operators.linking import build_alias_dictionary, link_mentions
from qizner_spark.operators.mentions import detect_mentions
from qizner_spark.sources.pages import extract_text_col, pages_from_documents


def default_scorer_factory():
    from qizner_spark.core.scoring import GazetteerScorer
    from qizner_spark.gazetteer import GAZETTEER_FULL as GAZ

    return GazetteerScorer(GAZ, token_deli=" ")


def extract_pages_text(pages: DataFrame, validate: bool = True) -> DataFrame:
    """html -> text with the byte-identity invariant enforced IN the
    plan: rows whose extraction mismatches the stored text are routed
    to an error flag column (kept 0 at all times in tests). The heavy
    html column is dropped immediately after."""
    out = pages.withColumn("extracted", extract_text_col("html"))
    if validate:
        out = out.withColumn(
            "extract_ok", (F.col("extracted") == F.col("text")).cast("int")
        )
    return out.select(
        "url", "warc_ts", F.col("extracted").alias("text"), "lang",
        *(["extract_ok"] if validate else []),
    )


# Per-doc distinct-entity ceiling for the co-mention self-join. The
# join is O(k^2) pairs per document and is keyed on url, so the
# hot-KEY salting in operators/graph.py cannot reach it: one spammy
# page with 10^4 distinct entities would emit 5x10^7 pairs from a
# single row group — an unfixable one-task straggler at 10^12 docs.
# 1000 bounds any document at <=500k pairs while being far above the
# entity count of any real page; None disables the cap entirely.
DEFAULT_MAX_ENTITIES_PER_DOC = 1000


def _per_doc_entities(linked: DataFrame,
                      max_entities_per_doc: int | None) -> DataFrame:
    """Per-doc DISTINCT entity set feeding the co-mention self-join,
    optionally capped to the ``max_entities_per_doc`` most confident
    entities per url (rank: max mention prob DESC, entity_id ASC for
    deterministic ties).

    ONE url-hash exchange serves the whole chain: HashPartitioning
    (url) satisfies the (url, entity_id) aggregation's clustered
    distribution (same url => colocated), the rank window's url
    partition, AND the downstream self-join on url — without the
    explicit repartition the planner keys the aggregation on
    (url, entity_id) and the window/join then re-shuffle on url
    (measured: 4 distinct exchanges -> 2, one per join side)."""
    keyed = linked.select(
        "url", "entity_id",
        (F.col("prob") if "prob" in linked.columns else F.lit(0.0)).alias("_p"),
    ).repartition(F.col("url"))
    if max_entities_per_doc is None:
        return keyed.select("url", "entity_id").distinct()
    from pyspark.sql import Window

    ranked = keyed.groupBy("url", "entity_id").agg(F.max("_p").alias("_rank_prob"))
    w = Window.partitionBy("url").orderBy(
        F.col("_rank_prob").desc(), F.col("entity_id").asc()
    )
    return (
        ranked.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= max_entities_per_doc)
        .select("url", "entity_id")
    )


# public name for the capped per-doc membership table (the co-mention
# self-join input); entity-similarity reads (cooccurrence_jaccard)
# must see the SAME capped set the edge build sees.
def per_doc_entity_set(linked: DataFrame,
                       max_entities_per_doc: int | None = DEFAULT_MAX_ENTITIES_PER_DOC
                       ) -> DataFrame:
    return _per_doc_entities(linked, max_entities_per_doc)


def comention_edges(linked: DataFrame,
                    max_entities_per_doc: int | None = DEFAULT_MAX_ENTITIES_PER_DOC
                    ) -> DataFrame:
    """Distinct entity pairs co-mentioned in the same document.

    Self-join on url over the per-doc DISTINCT entity set (deduped
    before the join so a hot page with 10^3 repeat mentions of one
    entity contributes each pair once). ``max_entities_per_doc``
    bounds the per-doc pair explosion (see
    ``DEFAULT_MAX_ENTITIES_PER_DOC``); capped-out entities still
    exist downstream (CC treats them as singletons) — they just stop
    minting O(k^2) edges."""
    per_doc = _per_doc_entities(linked, max_entities_per_doc)
    a = per_doc.alias("a")
    b = per_doc.alias("b")
    return (
        a.join(b, "url")
        .where(F.col("a.entity_id") < F.col("b.entity_id"))
        .select(
            F.col("a.entity_id").alias("src"),
            F.col("b.entity_id").alias("dst"),
            F.col("url"),
        )
    )


def build_kg(
    spark: SparkSession,
    pages: DataFrame,
    scorer_factory=None,
    max_seg_len: int = 512,
    flat: bool = True,
    decode_threshold: float = 0.5,
    persist_intermediates: bool = True,
    salt_buckets: int | None = None,
    broadcast_components: bool = False,
    broadcast_alias: bool | int = False,
    max_entities_per_doc: int | None = DEFAULT_MAX_ENTITIES_PER_DOC,
) -> dict[str, DataFrame]:
    """Run the full DAG; returns every intermediate plus ``triples``.

    ``persist_intermediates`` materializes the mentions table once
    (MEMORY_AND_DISK): the triples plan references it from five
    branches (alias build, linking, provenance, edges, components),
    and without persistence each action re-runs the Arrow detection
    stage per branch. Production equivalent: write mentions to a
    staging Iceberg table between phases.

    ``broadcast_components`` (default False): the entity->canonical
    map is UNBOUNDED — on 10^12-doc webtext the canonical-entity
    vocabulary is easily 10^8+ rows, and an unconditional
    ``F.broadcast`` hint there OOMs the driver/executors. Left
    unhinted, AQE's runtime size statistics convert the join to
    broadcast-hash exactly when the side is genuinely under
    spark.sql.autoBroadcastJoinThreshold — the correct size estimate
    at every scale. Pass True only when the caller KNOWS the entity
    dimension is bounded-small (e.g. a closed dictionary).

    ``broadcast_alias`` (default False): same doctrine for the alias
    dictionary — the mention-surface vocabulary of an open corpus is
    Zipfian-unbounded, so the link join is unhinted by default (AQE
    decides); True force-broadcasts a KNOWN-bounded curated
    dictionary; an int ``f`` takes the hybrid hot/cold path (see
    :func:`~qizner_spark.operators.linking.link_mentions`)."""
    scorer_factory = scorer_factory or default_scorer_factory

    from qizner_spark.session import ensure_scan_parallelism

    docs = extract_pages_text(pages).where(F.col("extract_ok") == 1).drop("extract_ok")
    # Widen an under-split source (single-row-group sandbox parquet:
    # guide §2.5 "one huge unsplittable file") so the Arrow detection
    # pass below uses every core — placed AFTER the html drop so only
    # the narrow extracted columns ever cross the exchange, and after
    # any caller-side limit so row selection stays deterministic. At
    # production layouts (input pre-split >= parallelism) it's a no-op.
    docs = ensure_scan_parallelism(docs)

    # provenance (warc_ts) rides THROUGH the Arrow pass on every
    # mention row instead of a join back to the pages table: a
    # passthrough value costs bytes in the mention rows; the join it
    # replaces is a full mention-table shuffle at 10^12 docs.
    mentions = detect_mentions(
        docs, scorer_factory, key_col="url", text_col="text", lang_col="lang",
        max_seg_len=max_seg_len, flat=flat, threshold=decode_threshold,
        passthrough_cols=["warc_ts"],
    ).withColumnRenamed("doc_key", "url")
    if persist_intermediates:
        from pyspark import StorageLevel

        mentions = mentions.persist(StorageLevel.MEMORY_AND_DISK)
        # Materialization BARRIER (round 6): build the cache under one
        # controlled job before anything references it. The alias
        # broadcast future and the link-join probe side otherwise
        # race to materialize the same uncached relation concurrently
        # — Spark stages coordinate per cached PARTITION only after
        # one writer finishes, so the whole detection pass executed
        # 2-3x inside the first job (observed as multiple 64-task
        # documents-scan stages in one kg action). Production analog:
        # writing the staging table IS this barrier.
        mentions.count()

    assembled = assemble_kg(
        mentions, salt_buckets=salt_buckets,
        broadcast_components=broadcast_components,
        broadcast_alias=broadcast_alias,
        max_entities_per_doc=max_entities_per_doc,
    )
    return {"docs": docs, "mentions": mentions, **assembled}


def assemble_kg(
    mentions: DataFrame,
    salt_buckets: int | None = None,
    broadcast_components: bool = False,
    broadcast_alias: bool | int = False,
    max_entities_per_doc: int | None = DEFAULT_MAX_ENTITIES_PER_DOC,
) -> dict[str, DataFrame]:
    """Corpus-GLOBAL compaction half of the KG DAG — alias dictionary
    -> linking -> co-mention edges -> connected components -> triple
    assembly — over an already-materialized mention table.

    Factored out of :func:`build_kg` so the incremental path shares it
    verbatim. The split line is principled, not convenience: mention
    DETECTION is per-document (embarrassingly incremental — stream it
    micro-batch by micro-batch into an append sink; it is also ~all
    of the compute at 10^12 docs), while everything here aggregates
    ACROSS documents (the alias dictionary, the co-mention graph,
    canonicalization) and must recompute over the accumulated mention
    table — the periodic compaction pass of a continuously-landing
    crawl. Streaming detection + this over the sink is therefore
    identical to the batch DAG by construction (hash-verified
    end-to-end by the ``kg_stream_increments`` driver oracle).

    Shuffle inventory (round-6 restructure): every triple branch and
    the CC edge build are re-aggregations of ONE shared
    (url, entity_id, mention, ent_type)-level rollup (``ent_pre``):

      * the groupBy collapses the k repeat-mentions of an entity
        inside a document map-side BEFORE anything shuffles (guide
        §2.3 "aggregate before you shuffle" — detection emits whole
        documents per partition, so the partial aggregate removes the
        duplication at the source);
      * one repartition(url) then establishes the partitioning every
        downstream consumer needs — branch groupBys (url-superset
        keys), the cap window (url partition), the co-mention
        self-join (url key) and its pair-fold groupBy all plan ZERO
        further exchanges;
      * ``ent_pre`` is persisted: the eager CC phase and the triples
        action both read it, and (measured, round 6) per-branch column
        pruning otherwise specializes each branch's copy of the
        subtree so exchange reuse NEVER fires — the previous
        "shared" canon exchange really ran four times, shuffling the
        full mention table once per branch.

    prob/warc_ts fold exactly (min/max are order-independent), so the
    triples are hash-identical to the mention-level formulation —
    oracle-verified by the kg_triples / kg_triples_full /
    kg_triples_seq / kg_stream_increments driver queries."""
    alias = build_alias_dictionary(mentions)
    linked = link_mentions(mentions, alias, broadcast_alias=broadcast_alias)

    from pyspark import StorageLevel

    from qizner_spark.operators.graph import DEFAULT_SALT_BUCKETS
    from qizner_spark.operators.linking import entity_id_col

    # Round 6 (revised): the rollup links by PROJECTION, not join.
    # assemble_kg always builds its dictionary from this very mention
    # table, so the link join is an identity attach of the
    # deterministic slug (see entity_id_col: every (mention, ent_type)
    # key matches, and the id is unique per key, so frequency
    # tie-breaking cannot pick a different value) — skipping it
    # removes a full mention-cache scan + aggregation + broadcast
    # build from the hot path. Verified row-identical via the
    # kg-family oracles; the public ``alias``/``linked`` stages (and
    # ``broadcast_alias``) are untouched for callers that link
    # against EXTERNAL dictionaries.
    ent_pre = (
        mentions.withColumn("entity_id", entity_id_col())
        .groupBy("url", "entity_id", "mention", "ent_type")
        .agg(
            F.min("warc_ts").alias("warc_ts"),
            F.min("prob").alias("prob"),
            F.max("prob").alias("_rp"),
        )
        .repartition(F.col("url"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # NO count() barrier here (round 6, revised): the connected-
    # components probe below is the first job to reference this cache,
    # and its plan references it exactly ONCE (edges -> distinct is a
    # shuffle, whose map stage scans and therefore populates EVERY
    # ent_pre partition before the reduce/limit runs) — a single
    # writer, so the concurrent-futures race the other barriers guard
    # against cannot occur, and the probe job doubles as the barrier.
    # Co-mention pair enumeration (round 6, array form): pairs come
    # from a per-url SORTED ENTITY ARRAY expanded by nested
    # transforms instead of a per-url self-join. The rollup is
    # url-partitioned, so the groupBy(url) plans no exchange; the
    # O(k^2) expansion is one native codegen projection per url — no
    # join hash table, no second derivation of the probe side, and no
    # per-pair row machinery before the fold (same rewrite that took
    # the relational co-mention family 4.8 s -> 1.6 s at sf1.0).
    # Row-identity proof: the array is the capped per-doc DISTINCT
    # entity set sorted by entity_id, and (i < j) enumeration over a
    # sorted array IS the a.entity_id < b.entity_id join predicate;
    # the cap keeps top-``max_entities_per_doc`` by (max mention prob
    # DESC, entity_id ASC) — array_sort on (-prob, entity_id) structs
    # + slice selects exactly the rows the old row_number window
    # kept. The cap also bounds every array (task memory) — with
    # cap=None the self-join form streams unbounded per-url pair
    # sets instead of materializing them, so that path is kept.
    if max_entities_per_doc is not None:
        cap = int(max_entities_per_doc)
        ent_url = ent_pre.groupBy("url", "entity_id").agg(
            F.max("_rp").alias("_rank_prob")
        )
        ents = ent_url.groupBy("url").agg(
            F.array_sort(
                F.collect_list(
                    F.struct((-F.col("_rank_prob")).alias("_nrp"), F.col("entity_id"))
                )
            ).alias("_r")
        ).select(
            "url",
            F.expr(
                f"sort_array(transform(slice(_r, 1, {cap}), s -> s.entity_id))"
            ).alias("_e"),
        )
        edges = ents.select(
            "url",
            F.explode(
                F.expr(
                    "flatten(transform(_e, (x, i) -> "
                    "transform(slice(_e, i + 2, size(_e)), y -> "
                    "struct(x AS src, y AS dst))))"
                )
            ).alias("_p"),
        ).select(F.col("_p.src").alias("src"), F.col("_p.dst").alias("dst"), "url")
    else:
        per_doc = ent_pre.select("url", "entity_id").distinct()
        pa, pb = per_doc.alias("a"), per_doc.alias("b")
        edges = (
            pa.join(pb, "url")
            .where(F.col("a.entity_id") < F.col("b.entity_id"))
            .select(
                F.col("a.entity_id").alias("src"),
                F.col("b.entity_id").alias("dst"),
                F.col("url"),
            )
        )
    from qizner_spark.operators.graph import connected_components

    comp = connected_components(
        edges.select("src", "dst"),
        salt_buckets=salt_buckets if salt_buckets is not None else DEFAULT_SALT_BUCKETS,
    )
    # full node -> canonical map (isolated entities are their own
    # component) — the public stages entry, same rows assign_components
    # produces, built from the single probe above instead of a second
    # connected_components run.
    components = (
        ent_pre.select(F.col("entity_id").cast("string").alias("node")).distinct()
        .join(comp, "node", "left")
        .withColumn("component", F.coalesce("component", F.col("node")))
        .withColumnRenamed("node", "entity_id")
        .withColumnRenamed("component", "canonical_id")
    )

    persisted: list[DataFrame]
    if getattr(comp, "_qizner_local_rows", None) is not None and not broadcast_components:
        # Common path (round 6, revised): the component map was solved
        # by driver-side union-find, so ``comp`` is a LocalRelation
        # with EXACT size statistics (bounded by construction at
        # <= 2 x driver_threshold nodes) — the planner natively picks
        # a broadcast hash join against it whenever it is genuinely
        # under the broadcast threshold, no hint and no doctrine
        # violation (the guard exists for UNKNOWN-size dimensions).
        # A broadcast left join preserves the streamed side's
        # url partitioning, so the canonicalized rollup needs NO
        # repartition, NO second persist and NO count barrier: every
        # triple branch re-attaches canonical ids from the broadcast
        # against the already-cached ent_pre inside the one triples
        # action (concurrent subtree reads of a FULLY materialized
        # cache are safe — the race is only on population). Two
        # sequential jobs replace the previous four.
        cmap = (comp.withColumnRenamed("node", "entity_id")
                    .withColumnRenamed("component", "_canon"))
        pre_canon = (
            ent_pre.join(cmap, "entity_id", "left")
            .withColumn("canonical_id", F.coalesce("_canon", F.col("entity_id")))
            .drop("_canon")
        )
        persisted = [ent_pre]
    else:
        # Large-graph path: the distributed CC output has no usable
        # size statistics, so the initial components join plans as a
        # sort-merge join — without a single materialization EVERY
        # branch would re-plan that join, re-derive the components
        # subtree, and re-exchange the cached rollup on entity_id
        # before AQE could convert anything (measured round 6: three
        # extra shuffle map-stages of the rollup per triples action).
        # The explicit repartition inside the cached plan guarantees
        # the cache reports url hash-partitioning at EVERY scale, so
        # the branch aggregations, the pair enumeration and the
        # pair-fold groupBy all plan zero further exchanges.
        comp_side = F.broadcast(components) if broadcast_components else components
        pre_canon = (
            ent_pre.join(comp_side, "entity_id")
            .repartition(F.col("url"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        # materialization barrier — the triples action otherwise races
        # FOUR concurrent references (three branches + the cap rollup)
        # into an uncached relation
        pre_canon.count()
        persisted = [ent_pre, pre_canon]

    # Branch-local aggregation replaces a global dropDuplicates over
    # the unioned triples: each branch groups on ITS OWN key while the
    # rows are still narrow, so nothing re-shuffles after the union.
    # prob = min of contributing mention probs (FIXTURES.md F5);
    # min-of-mins over the rollup == min over mention rows.
    # Round 6 (revised): the type and alias branches FUSE into one
    # GROUPING SETS aggregation — one scan of the canonicalized
    # rollup and one aggregation operator instead of two of each,
    # with grouping() disambiguating the two sets (verified
    # row-identical by exceptAll both ways and ~30% faster at sf1.0:
    # 1.32 -> 0.92 s for the two branches). Every grouping set
    # contains url, so the url-clustered input still satisfies the
    # aggregation with zero exchanges.
    gs = pre_canon.groupingSets(
        [["url", "canonical_id", "ent_type"], ["url", "canonical_id", "mention"]],
        "url", "canonical_id", "ent_type", "mention",
    ).agg(
        F.min("warc_ts").alias("warc_ts"), F.min("prob").alias("prob"),
        F.grouping("ent_type").alias("_g"),
    )
    type_alias_triples = gs.select(
        F.col("canonical_id").alias("subj"),
        F.when(F.col("_g") == 0, F.lit("type")).otherwise(F.lit("alias")).alias("pred"),
        F.when(F.col("_g") == 0, F.col("ent_type")).otherwise(F.col("mention")).alias("obj"),
        "url", "warc_ts", "prob",
    )
    # co-mention edge triples: the SAME pair enumeration as the CC
    # edges (the cap window re-ranks the canonicalized rollup on the
    # identical (max prob DESC, entity_id ASC) key, so the kept entity
    # set matches ``capped`` row for row), endpoints rewritten to
    # canonical ids (north_star: CC runs over the co-mention graph
    # itself, so co-mentioned entities often share a component —
    # subj == obj is then an intra-cluster edge). The only aggregation
    # is the per-url canonical-pair fold, and its key set contains url
    # — still no exchange.
    ent_doc = pre_canon.groupBy("url", "entity_id", "canonical_id").agg(
        F.min("warc_ts").alias("warc_ts"),
        F.min("prob").alias("prob"),
        F.max("_rp").alias("_rank_prob"),
    )
    if max_entities_per_doc is not None:
        # array-form pair enumeration with the canonical-id / fold
        # payload riding along (see the edges comment above): cap by
        # (-prob, entity_id) struct sort + slice == the old row_number
        # window; re-sorting the kept structs entity_id-first restores
        # the a.entity_id < b.entity_id pair order; per-pair payload
        # (x.warc_ts, least(x.prob, y.prob)) matches the join form's
        # (a.warc_ts, least(a.prob, b.prob)) exactly, so the
        # (url, subj, obj) min/min fold is hash-identical.
        cap2 = int(max_entities_per_doc)
        pair_payload = (
            "flatten(transform(_e, (x, i) -> "
            "transform(slice(_e, i + 2, size(_e)), y -> "
            "struct(x.canonical_id AS subj, y.canonical_id AS obj, "
            "x.warc_ts AS warc_ts, least(x.prob, y.prob) AS prob))))"
        )
        pairs = ent_doc.groupBy("url").agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("_rank_prob")).alias("_nrp"),
                        F.col("entity_id"), F.col("canonical_id"),
                        F.col("warc_ts"), F.col("prob"),
                    )
                )
            ).alias("_r")
        ).select(
            "url",
            F.expr(
                f"array_sort(transform(slice(_r, 1, {cap2}), s -> "
                "struct(s.entity_id AS entity_id, s.canonical_id AS canonical_id, "
                "s.warc_ts AS warc_ts, s.prob AS prob)))"
            ).alias("_e"),
        ).select("url", F.explode(F.expr(pair_payload)).alias("_p")).select(
            "url", "_p.subj", "_p.obj", "_p.warc_ts", "_p.prob"
        )
        canon_edges = (
            pairs.groupBy("url", "subj", "obj")
            .agg(F.min("warc_ts").alias("warc_ts"), F.min("prob").alias("prob"))
            .select("subj", F.lit("mentioned_with").alias("pred"),
                    F.col("obj"), "url", "warc_ts", "prob")
        )
    else:
        ent_doc = ent_doc.drop("_rank_prob")
        ea, eb = ent_doc.alias("a"), ent_doc.alias("b")
        canon_edges = (
            ea.join(eb, "url")
            .where(F.col("a.entity_id") < F.col("b.entity_id"))
            .groupBy(
                F.col("url"),
                F.col("a.canonical_id").alias("subj"),
                F.col("b.canonical_id").alias("obj"),
            )
            .agg(
                F.min(F.col("a.warc_ts")).alias("warc_ts"),
                F.min(F.least("a.prob", "b.prob")).alias("prob"),
            )
            .select("subj", F.lit("mentioned_with").alias("pred"),
                    F.col("obj"), "url", "warc_ts", "prob")
        )
    triples = type_alias_triples.unionByName(canon_edges)
    # the persisted rollups' lineage belongs to the CALLER, mirroring
    # minhash_dedup_pairs / build_kg's mentions persist
    triples._qizner_persisted = persisted

    return {
        "alias": alias,
        "linked": linked,
        "edges": edges,
        "components": components,
        "triples": triples,
    }


def build_kg_from_sf_dir(spark: SparkSession, sf_dir: str, **kw) -> dict[str, DataFrame]:
    # widen=True: the full-corpus entry takes no limit slices, so the
    # narrow document rows repartition BEFORE the html wrap — the
    # wrap/extract/validate projections run at full parallelism on an
    # under-split sandbox layout instead of inside the single scan
    # task (see pages_from_documents; build_kg's own widen then
    # becomes a planning-time no-op).
    return build_kg(spark, pages_from_documents(spark, sf_dir, widen=True), **kw)


def write_triples(
    triples: DataFrame, path: str, n_buckets: int = 64, mode: str = "overwrite"
) -> None:
    """Partitioned triple sink: deterministic bucket of subj (Iceberg
    partition transform stand-in; parquet in the sandbox)."""
    (
        triples.withColumn("subj_bucket", F.pmod(F.xxhash64("subj"), F.lit(n_buckets)))
        .write.mode(mode)
        .partitionBy("subj_bucket")
        .parquet(path)
    )


def run_with_metrics(
    spark: SparkSession, pages: DataFrame, out_path: str | None = None,
    n_buckets: int = 64, **kw,
) -> dict:
    """Execute the DAG, recording wall-clock + row counts (the
    per-run metrics rows the north_rule requires; written alongside
    the sink as ``_metrics`` when a path is given).

    Lineage is logged PER PARTITION (north_rule: "lineage and
    throughput metrics logged per partition"): one row per
    subj_bucket with its triple count and distinct source-url count,
    written to ``{out_path}_metrics_partitions``. One extra groupBy
    on the already-persisted triples — at 10^12 docs this is a
    64-row aggregate, not a second pass over the data."""
    t0 = time.time()
    stages = build_kg(spark, pages, **kw)  # mentions already persisted inside
    stages["triples"] = stages["triples"].persist()
    n_docs = stages["docs"].count()
    n_mentions = stages["mentions"].count()
    n_triples = stages["triples"].count()
    wall = time.time() - t0
    metrics = {
        "n_docs": n_docs,
        "n_mentions": n_mentions,
        "n_triples": n_triples,
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 2) if wall > 0 else None,
        "ts": int(time.time()),
    }
    if out_path:
        write_triples(stages["triples"], out_path, n_buckets=n_buckets)
        spark.createDataFrame([metrics]).write.mode("append").json(f"{out_path}_metrics")
        per_part = (
            stages["triples"]
            .withColumn("subj_bucket",
                        F.pmod(F.xxhash64("subj"), F.lit(n_buckets)))
            .groupBy("subj_bucket")
            .agg(F.count(F.lit(1)).alias("n_triples"),
                 F.countDistinct("url").alias("n_source_urls"),
                 F.min("warc_ts").alias("min_warc_ts"),
                 F.max("warc_ts").alias("max_warc_ts"))
            .withColumn("wall_sec", F.lit(round(wall, 3)))
            .withColumn("ts", F.lit(int(time.time())))
        )
        per_part.coalesce(1).write.mode("append").json(
            f"{out_path}_metrics_partitions")
    return {"stages": stages, "metrics": metrics}
