"""Stages 4-6 — entity canonicalization, graph materialization, cross-doc linking.

Reference semantics being reimplemented:

- **Exact-label canonicalization** (G3, ``ingestion_service.py:105-129``):
  on insert, ``find_node_by_label(label, type)`` reuses an existing node ⇒
  global entity resolution keyed on the exact normalized label. Batch
  equivalent: canonical node id = sha2("node", entity_type, label); node
  attributes (description/properties) come from the globally FIRST arrival
  (ingestion order ⇒ here the deterministic (url, seq) order).
- **Paper nodes** are created unconditionally per document (no label lookup,
  ``ingestion_service.py:66-67``): id = sha2("paper", url).
- **Edge materialization** (``ingestion_service.py:131-167``): paper→entity
  edge per validated entity (AUTHORED_BY for authors, else INTRODUCES,
  confidence 1.0); intra-doc relationship edges resolve raw endpoint labels
  against THIS document's validated entity dict — unresolved endpoints are
  SILENTLY DROPPED (``:154``), replicated here via inner joins.
- **Edge uniqueness** (``sql/schema.sql:36`` + swallowed insert error):
  one edge per (from, to, type), first insertion wins.
- **Cross-doc linking** (J8, ``graph_service.py:167-316``): candidate pairs =
  documents sharing ≥1 dataset/method/concept node (inverted-index blocking
  ⇒ here a self-equi-join on entity_id), deduped as unordered pairs, scored
  by the pair operator (DEBUG fixture: one SIMILAR_TO edge, confidence 0.75,
  ``relationship_linking_agent.py:161-182``), with the direction rule for
  asymmetric types (``relationship_linking_agent.py:144-147``).

Scale notes (the part that matters at 100 TB):

- The blocking self-join is the skew point — hot entities (head labels)
  produce quadratic pair blowup. Mitigations: (a) AQE skew-join is on
  session-wide; (b) ``max_block_degree`` drops blocking keys hotter than a
  bound *before* the join (a standard entity-resolution guardrail — a key
  shared by 10⁶ docs contributes 5·10¹¹ pairs and no information);
  (c) the join keys are pre-projected narrow (two string columns).
- Canonical ids are content hashes, so canonicalization needs NO global
  dictionary build or broadcast of all labels — the "alias dictionary
  broadcast" appears only in the optional fuzzy path (MinHash-LSH →
  connected components, ``canonicalize_fuzzy``), where the small
  cluster→canonical map is broadcast-joined back onto mentions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from research_knowledge_graph_spark.functions.hashing import (
    bin_id_lt,
    bin_to_id,
    det_id,
    id_to_bin,
)
from research_knowledge_graph_spark.functions.salt import (
    attach_hot_degrees,
    salted_join_sides,
    salted_self_join_sides,
)
from research_knowledge_graph_spark.functions.sanitize import sanitize_string_col

ENTITY_EDGE_CONFIDENCE = 1.0
CROSS_DOC_TYPES = ("dataset", "method", "concept")
# cross-paper predicates pointing doc2→doc1 (relationship_linking_agent.py:144-147)
REVERSED_CROSS_PREDS = ("IMPROVES_ON", "EXTENDS", "REFINES_CONCEPT")


def paper_node_id(url_col) -> F.Column:
    return det_id("paper", url_col)


def entity_node_id(entity_type_col, label_col) -> F.Column:
    return det_id("node", entity_type_col, label_col)


def build_paper_nodes(metadata: DataFrame) -> DataFrame:
    """One paper node per document (url is the identity)."""
    return metadata.select(
        paper_node_id(F.col("url")).alias("id"),
        F.lit("paper").alias("node_type"),
        sanitize_string_col(F.coalesce(F.col("title"), F.lit("Unknown Paper"))).alias("label"),
        F.map_filter(
            F.create_map(
                F.lit("url"), F.col("url"),
                F.lit("abstract"), sanitize_string_col(F.coalesce(F.col("abstract"), F.lit(""))),
                F.lit("year"), F.col("year").cast("string"),
            ),
            lambda _, v: v.isNotNull(),
        ).alias("properties"),
        F.col("url"),
    )


def _canonical_label_col(mentions: DataFrame) -> F.Column:
    """Node-identity label: the fuzzy path adds ``canonical_label``
    (cluster canonical); otherwise the normalized surface label."""
    if "canonical_label" in mentions.columns:
        return F.coalesce(F.col("canonical_label"), F.col("label"))
    return F.col("label")


def build_entity_nodes(mentions_valid: DataFrame) -> DataFrame:
    """Global canonicalization: one node per (entity_type, canonical label);
    description/properties from the globally-first (url, seq) arrival.

    Single hash-aggregate; no join, no window. The reference's per-insert
    ``find_node_by_label`` N+1 loop becomes one shuffle on the entity key.
    """
    mentions_valid = mentions_valid.withColumn("_canon", _canonical_label_col(mentions_valid))
    return (
        mentions_valid.groupBy("entity_type", F.col("_canon").alias("label"))
        .agg(
            F.min_by(F.struct("description", "properties"), F.struct("url", "seq")).alias("_first"),
        )
        .select(
            entity_node_id(F.col("entity_type"), F.col("label")).alias("id"),
            F.col("entity_type").alias("node_type"),
            "label",
            F.map_concat(
                F.map_filter(
                    F.create_map(F.lit("description"), F.col("_first.description")),
                    lambda _, v: v.isNotNull(),
                ),
                F.col("_first.properties"),
            ).alias("properties"),
            F.lit(None).cast("string").alias("url"),
        )
    )


def build_edges(
    metadata: DataFrame,
    mentions_valid: DataFrame,
    triples_valid: DataFrame,
    resolve_titles: bool = False,
) -> DataFrame:
    """Materialize intra-document edges.

    paper→entity INTRODUCES/AUTHORED_BY edges + relationship edges with both
    endpoints resolved against the same document's entity dict (inner joins =
    the reference's silent drop of unresolved endpoints,
    ``ingestion_service.py:154``).

    ``resolve_titles=False`` replicates the reference exactly: the paper
    itself is NOT in the entity dict, so triples whose subject is the
    document title are dropped. ``True`` (heuristic mode) additionally
    resolves the title to the paper node — doc-level predicates
    (EVALUATES_ON etc.) then materialize as paper→entity edges.
    """
    ent = mentions_valid.select(
        "url",
        "seq",
        "entity_type",
        "label",  # surface label: the triple-endpoint resolution key
        entity_node_id(
            F.col("entity_type"), _canonical_label_col(mentions_valid)
        ).alias("entity_id"),
    )

    paper_entity = ent.select(
        paper_node_id(F.col("url")).alias("from_node_id"),
        F.col("entity_id").alias("to_node_id"),
        F.when(F.col("entity_type").isin("author", "authors"), F.lit("AUTHORED_BY"))
        .otherwise(F.lit("INTRODUCES"))
        .alias("edge_type"),
        F.lit(ENTITY_EDGE_CONFIDENCE).alias("confidence"),
        F.create_map().cast("map<string,string>").alias("properties"),
        F.col("url").alias("src_url"),
        F.col("seq").cast("long").alias("order_seq"),
    )

    # per-doc label→id resolution (J12): raw triple endpoints vs the doc's
    # validated (normalized) labels — exact string match, like
    # ``entity_nodes.get(rel.from_entity_label)``.
    #
    # Shuffle shape: the naive form is two composite-key joins —
    # (url, subj)=(url, label) then (url, obj)=(url, label) — which shuffle
    # the FULL triples table (rationale/evidence payload) twice on two
    # different keys. Instead the doc dict is folded to one
    # map<label, array<id>> row per url (two narrow label-side shuffles,
    # with map-side partial aggregation on neither but rows of just
    # label+id), and the triples shuffle ONCE on url; endpoint resolution
    # becomes a map lookup. A label can resolve to several ids within one
    # doc (same surface label, different entity types), hence the array +
    # explode — the old join's per-(seq) duplicate matches carried an
    # identical payload and were collapsed by the final (from,to,type)
    # dedup anyway, so `collect_set` here changes no output.
    #
    # Skew: keying on url alone puts one document's whole dict + triples on
    # one task, where the old (url, label) keys spread a doc across
    # reducers. That is safe here because the group is bounded by a single
    # web page's length (mentions and triples per doc are O(page bytes),
    # capped upstream by the fetch/extract stages) — unlike a join key of
    # unbounded cardinality, the per-url group cannot grow with corpus size.
    dict_df = ent.select("url", "label", "entity_id")
    if resolve_titles:
        dict_df = dict_df.unionByName(
            metadata.select(
                "url",
                F.col("title").alias("label"),
                paper_node_id(F.col("url")).alias("entity_id"),
            )
        )
    doc_dict = (
        dict_df.filter(F.col("label").isNotNull())  # null never equi-joined; map keys must be non-null
        .groupBy("url", "label")
        .agg(F.array_sort(F.collect_set("entity_id")).alias("ids"))
        .groupBy("url")
        .agg(F.map_from_entries(F.collect_list(F.struct("label", "ids"))).alias("_dict"))
    )
    rel = (
        triples_valid.alias("t")
        .join(doc_dict, "url")
        .select(
            F.element_at(F.col("_dict"), F.col("t.subj")).alias("_from_ids"),
            F.element_at(F.col("_dict"), F.col("t.obj")).alias("_to_ids"),
            F.col("t.pred").alias("edge_type"),
            F.col("t.confidence").alias("confidence"),
            F.map_filter(
                F.create_map(
                    F.lit("rationale"), F.col("t.rationale"),
                    F.lit("evidence_span"), F.col("t.evidence_span"),
                ),
                lambda _, v: v.isNotNull(),
            ).alias("properties"),
            F.col("t.url").alias("src_url"),
            # rels materialize after entities (hence the 1e9 base), and
            # WITHIN a doc they order by the extraction ordinal: two
            # templates can assert the same (from, to, type) with different
            # confidences, and the constant-order_seq tie made the min_by
            # winner nondeterministic (arbitrary encounter order) — breaking
            # the bit-identical re-run invariant. Tolerates legacy triple
            # frames without the seq column.
            (
                F.lit(1_000_000_000)
                + (
                    F.col("t.seq").cast("long")
                    if "seq" in triples_valid.columns
                    else F.lit(0)
                )
            ).alias("order_seq"),
        )
        # inner-join semantics preserved: an unresolved endpoint (label not
        # in THIS doc's dict) drops the triple silently (ingestion_service.py:154)
        .filter(F.col("_from_ids").isNotNull() & F.col("_to_ids").isNotNull())
        .withColumn("from_node_id", F.explode("_from_ids"))
        .withColumn("to_node_id", F.explode("_to_ids"))
        .drop("_from_ids", "_to_ids")
    )

    edges = paper_entity.unionByName(rel)
    # (from, to, type) uniqueness, first insertion (src_url, order_seq) wins —
    # hash aggregate with min_by instead of a window (a window would add a
    # full sort per partition; min_by is one partial-aggregating shuffle).
    return (
        edges.groupBy("from_node_id", "to_node_id", "edge_type")
        .agg(
            F.min_by(
                F.struct("confidence", "properties", "src_url"),
                F.struct("src_url", "order_seq"),
            ).alias("_first")
        )
        .select(
            det_id("edge", "from_node_id", "to_node_id", "edge_type").alias("id"),
            "from_node_id",
            "to_node_id",
            "edge_type",
            F.col("_first.confidence").alias("confidence"),
            F.col("_first.properties").alias("properties"),
            F.col("_first.src_url").alias("src_url"),
        )
    )


# ---------------------------------------------------------------------------
# Cross-document linking (stage 6)
# ---------------------------------------------------------------------------

def candidate_pairs(
    nodes: DataFrame,
    edges: DataFrame,
    max_block_degree: int | None = 1000,
    salt_above: int | None = 256,
    max_salts: int = 16,
) -> DataFrame:
    """Shared-entity blocking join (J8): pairs of papers connected to the
    same dataset/method/concept node.

    Returns (paper_a, paper_b) with paper_a < paper_b (unordered-pair dedup,
    A7). Skew defenses, outermost first:

    - ``max_block_degree`` caps hot blocking keys *before* the self-join —
      at web scale a head entity shared by millions of docs adds O(n²) pairs
      and zero linking signal;
    - ``salt_above`` (degree-aware salting, on by default): keys hotter than
      this degree are split across ``min(max_salts, ceil(deg/salt_above))``
      salt slots so no single reducer owns a head key's quadratic pair
      blowup (see ``salt.py::salted_self_join_sides``); cold keys are untouched;
    - AQE skew-join (session-wide) splits any residual hot partitions.
    """
    pe = _postings(nodes, edges)
    thresholds = [t for t in (max_block_degree, salt_above) if t is not None]
    need_degrees = bool(thresholds)
    if need_degrees:
        # hot-key-only degree attach at the smaller threshold (both
        # consumers' cutoffs are ≥ it) — see functions/salt.py::
        # attach_hot_degrees for the pigeonhole + AQE rationale
        pe = attach_hot_degrees(pe, "entity_id", min(thresholds))
        if max_block_degree is not None:
            pe = pe.filter(F.col("deg") <= max_block_degree)

    if salt_above is not None:
        sa, sb = salted_self_join_sides(pe, "paper_id", salt_above, max_salts)
        a, b = sa.alias("a"), sb.alias("b")
        # bin_id_lt, not a raw binary <: string-order contract must hold
        # even for a corpus mixing hex with foreign id shapes (cross-tag
        # pairs decode; same-tag pairs stay on the memcmp fast path)
        cond = (
            (F.col("a.entity_id") == F.col("b.entity_id"))
            & (F.col("a._salt") == F.col("b._salt"))
            & bin_id_lt(F.col("a.paper_id"), F.col("b.paper_id"))
        )
    else:
        if need_degrees:
            pe = pe.drop("deg")
        a, b = pe.alias("a"), pe.alias("b")
        cond = (F.col("a.entity_id") == F.col("b.entity_id")) & bin_id_lt(
            F.col("a.paper_id"), F.col("b.paper_id")
        )
    return (
        a.join(b, cond)
        .select(
            F.col("a.paper_id").alias("paper_a"),
            F.col("b.paper_id").alias("paper_b"),
        )
        # dedup on the NARROW binary pair (this is the path's biggest
        # exchange — near-quadratic pre-combine), hex back after
        .distinct()
        .select(
            bin_to_id("paper_a").alias("paper_a"),
            bin_to_id("paper_b").alias("paper_b"),
        )
    )


def score_pairs_fixture(pairs: DataFrame) -> DataFrame:
    """Pair-scoring operator, reference DEBUG semantics
    (``relationship_linking_agent.py:161-182``): every candidate pair yields
    one SIMILAR_TO edge, confidence 0.75. Direction: paper_a→paper_b with
    the canonical (smaller id first) pair order; asymmetric predicates would
    be flipped by :func:`orient_cross_edges`."""
    props = F.create_map(
        F.lit("rationale"),
        F.lit("Papers appear to be related based on similar topics (DEBUG mode)"),
        F.lit("evidence_concepts"),
        F.lit('["3D Gaussian Splatting", "Neural Rendering"]'),
    )
    return pairs.select(
        F.col("paper_a").alias("from_node_id"),
        F.col("paper_b").alias("to_node_id"),
        F.lit("SIMILAR_TO").alias("edge_type"),
        F.lit(0.75).alias("confidence"),
        props.alias("properties"),
    )


def orient_cross_edges(scored: DataFrame) -> DataFrame:
    """Direction rule F10 (``relationship_linking_agent.py:144-147``): for
    IMPROVES_ON / EXTENDS / REFINES_CONCEPT the edge points doc2→doc1."""
    flip = F.col("edge_type").isin(*REVERSED_CROSS_PREDS)
    return scored.select(
        F.when(flip, F.col("to_node_id")).otherwise(F.col("from_node_id")).alias("from_node_id"),
        F.when(flip, F.col("from_node_id")).otherwise(F.col("to_node_id")).alias("to_node_id"),
        "edge_type",
        "confidence",
        "properties",
    )


def cross_link(
    nodes: DataFrame, edges: DataFrame, max_block_degree: int | None = 1000
) -> DataFrame:
    """Full stage 6: blocking → pair scoring → orientation → edge rows."""
    pairs = candidate_pairs(nodes, edges, max_block_degree)
    scored = orient_cross_edges(score_pairs_fixture(pairs))
    return scored.withColumn(
        "id", det_id("edge", "from_node_id", "to_node_id", "edge_type")
    ).select(
        "id", "from_node_id", "to_node_id", "edge_type", "confidence", "properties",
        F.lit(None).cast("string").alias("src_url"),
    )


def _postings(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """(paper_id, entity_id) blocking postings — any edge into a
    dataset/method/concept node asserts a posting for its source node
    (paper OR entity, matching :func:`candidate_pairs` exactly).

    Ids are narrowed to tagged BINARY (``hashing.id_to_bin``) at the scan
    projection, BEFORE the join/distinct exchanges: the posting rows are
    nothing but two ids, so halving id bytes halves this path's shuffle
    volume end-to-end (join → distinct → degree agg → pair join → pair
    distinct). The enumerators hex back at their exit — callers never see
    the binary form."""
    ent_nodes = nodes.filter(F.col("node_type").isin(*CROSS_DOC_TYPES)).select(
        id_to_bin("id").alias("entity_id")
    )
    # No broadcast hint: the entity-id dim is one row per distinct
    # dataset/method/concept node — O(corpus) at web scale, so a forced
    # broadcast is a driver-OOM risk (the t10 lesson). AQE converts to
    # broadcast at runtime whenever the dim is actually small.
    e = edges.select(
        id_to_bin("from_node_id").alias("paper_id"),
        id_to_bin("to_node_id").alias("_to_bin"),
    )
    return (
        e.join(ent_nodes, e._to_bin == ent_nodes.entity_id)
        .select("paper_id", "entity_id")
        .distinct()
    )


def incremental_candidate_pairs(
    nodes: DataFrame,
    edges: DataFrame,
    new_edges: DataFrame,
    max_block_degree: int | None = 1000,
    salt_above: int | None = 256,
    max_salts: int = 16,
    postings: DataFrame | None = None,
    new_postings: DataFrame | None = None,
) -> DataFrame:
    """Candidate pairs TOUCHING a posting asserted by this batch's edges:
    the batch-side postings join against ALL postings on the blocking key.
    A pair whose both postings predate the batch was enumerated when its
    younger posting was new, so nothing is re-enumerated and nothing is
    missed — per batch the join is O(batch × avg-degree), not O(corpus²).
    Degrees (for the cap) are computed over the FULL posting list, so a
    key that crosses the cap as the corpus grows stops producing pairs,
    same as a full recompute.

    ``salt_above`` (same default as the batch path, round-2 verdict #5):
    the batch side bounds the join size, but a hot key in the FULL posting
    list ``pe`` still concentrates one reducer. Salting here is the mirror
    of ``salt.py::salted_join_sides``: the BIG side (pe) gets one slot per row
    (hash of paper_id); the SMALL batch side is replicated into all of the
    key's ``min(max_salts, ceil(deg/salt_above))`` slots — replication cost
    is O(batch), never O(corpus). Cold keys get one slot (zero replication,
    identical plan to unsalted).

    ``postings`` / ``new_postings``: the corpus / batch posting frames
    ((paper_id, entity_id) binary, distinct) when the caller already has
    them — the incremental pipeline maintains the corpus postings as an
    append-only table, turning the per-batch full ``edges × ent_nodes``
    join + distinct into a narrow table scan. Omitted, both sides are
    derived from the node/edge tables exactly as before."""
    pe = postings if postings is not None else _postings(nodes, edges)
    pe_new = (
        new_postings if new_postings is not None else _postings(nodes, new_edges)
    )
    thresholds = [t for t in (max_block_degree, salt_above) if t is not None]
    if thresholds:
        # ONE bounded hot dim (≤ |pe|/cutoff keys by pigeonhole) feeds BOTH
        # sides: the degree cap and the salter only need exact degrees for
        # hot keys, and the batch side inherits them from the same dim —
        # the previous corpus-wide keys.distinct() per batch existed only
        # to hand pe_new its degrees/cap and cost a full posting shuffle
        # every micro-batch (AQE broadcasts the dim; no force — the t10
        # rule). Cold rows default to deg = 1 (≤ any threshold).
        cutoff = min(thresholds)
        hot = (
            pe.groupBy("entity_id")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") > cutoff)
        )
        pe = pe.join(hot, "entity_id", "left").withColumn(
            "deg", F.coalesce("deg", F.lit(1))
        )
        pe_new = pe_new.join(hot, "entity_id", "left").withColumn(
            "deg", F.coalesce("deg", F.lit(1))
        )
        if max_block_degree is not None:
            # degrees are over the FULL posting list, so a key crossing the
            # cap as the corpus grows stops producing pairs on BOTH sides —
            # same outcome as a full recompute
            pe = pe.filter(F.col("deg") <= max_block_degree)
            pe_new = pe_new.filter(F.col("deg") <= max_block_degree)

    if salt_above is not None:
        # big corpus side one-slot, bounded batch side replicated — the
        # shared construction in salt.py (deg values agree per key: both
        # sides joined the same hot dim)
        b, a = salted_join_sides(pe, pe_new, "paper_id", salt_above, max_salts)
        cond = (
            (F.col("a.entity_id") == F.col("b.entity_id"))
            & (F.col("a._salt") == F.col("b._salt"))
            & (F.col("a.paper_id") != F.col("b.paper_id"))
        )
    else:
        if thresholds:
            pe = pe.drop("deg")
            pe_new = pe_new.drop("deg")
        a, b = pe_new, pe
        cond = (F.col("a.entity_id") == F.col("b.entity_id")) & (
            F.col("a.paper_id") != F.col("b.paper_id")
        )
    lt = bin_id_lt(F.col("a.paper_id"), F.col("b.paper_id"))
    return (
        a.alias("a")
        .join(b.alias("b"), cond)
        .select(
            # bin_id_lt-ordered min/max, not binary least/greatest: the
            # string-order contract must survive a mixed-id-shape corpus
            # (the != join guard rules out equality, so !lt ⇒ b < a)
            F.when(lt, F.col("a.paper_id")).otherwise(F.col("b.paper_id")).alias("paper_a"),
            F.when(lt, F.col("b.paper_id")).otherwise(F.col("a.paper_id")).alias("paper_b"),
        )
        # dedup narrow, hex back after
        .distinct()
        .select(
            bin_to_id("paper_a").alias("paper_a"),
            bin_to_id("paper_b").alias("paper_b"),
        )
    )


def cross_link_incremental(
    nodes: DataFrame,
    edges: DataFrame,
    new_edges: DataFrame,
    max_block_degree: int | None = 1000,
    salt_above: int | None = 256,
    max_salts: int = 16,
    postings: DataFrame | None = None,
    new_postings: DataFrame | None = None,
) -> DataFrame:
    """Stage-6 delta for one ingest batch: score/orient only the pairs that
    involve a posting asserted by this batch. Ids are content hashes, so
    the delta dedups against prior batches by key downstream
    (``TableIO.append_rows``). ``salt_above`` defaults match the batch path
    (:func:`candidate_pairs`); ``postings``/``new_postings`` as in
    :func:`incremental_candidate_pairs`."""
    pairs = incremental_candidate_pairs(
        nodes, edges, new_edges, max_block_degree, salt_above, max_salts,
        postings=postings, new_postings=new_postings,
    )
    scored = orient_cross_edges(score_pairs_fixture(pairs))
    return scored.withColumn(
        "id", det_id("edge", "from_node_id", "to_node_id", "edge_type")
    ).select(
        "id", "from_node_id", "to_node_id", "edge_type", "confidence", "properties",
        F.lit(None).cast("string").alias("src_url"),
    )
