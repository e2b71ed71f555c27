"""The FAST ingest pipeline as composable Spark operators.

This is the reference's entire dataflow (reference lib/ingest.js:194-319)
re-expressed as DataFrame transformations:

    triples ──filter_triples──▶ parsed ──┬─ aggregate_fast ──▶ fast docs
                                         └─ sameas_index  ──▶ URI→labels
    fast docs ⨝ sameas index (broadcast) ──▶ enriched docs
    enriched docs across files ──merge_fast──▶ final `fast` table
    agent parsed ⨝ viaf (disjunctive keys) ──▶ updated `viaf` table

Deterministic divergences from the reference (SURVEY.md §7.3):
  * prefLabel is MAX over candidates instead of last-write-in-stream-order
    (reference lib/ingest.js:245 is arrival-order dependent);
  * arrays are sorted + distinct (the driver's value hash is
    order-insensitive, and the reference itself dedupes on merge,
    reference lib/ingest.js:144-155);
  * cross-file duplicate ids are merged BEFORE the write in one
    ``groupBy(_id)`` instead of insert-fail-then-patch
    (reference lib/ingest.js:174-183) — same converged end state, no
    read-modify-write race.

Scale notes (100 TB): every step is a shuffle-on-key hash aggregate or a
broadcast join — no driver-side state, no per-row Python. The reference's
">1 GB per process" in-heap maps (reference lib/ingest.js:3,102-103) become
spillable ObjectHashAggregates; the sameAs label index (small relative to
the triple corpus) is broadcast, so enrichment adds no shuffle of the big
side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import (
    fast_id,
    last_segment,
    normalize_and_singularize,
    normalize_and_singularize_py,
    nt_literal,
)

PRED_SAMEAS = "http://schema.org/sameAs"
PRED_PREFLABEL = "http://www.w3.org/2004/02/skos/core#prefLabel"
PRED_ALTLABEL = "http://www.w3.org/2004/02/skos/core#altLabel"
PRED_RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"

# Filename → authority type (reference lib/ingest.js:201-210); 'Agent' files
# additionally drive the VIAF enrichment branch (reference lib/ingest.js:212).
FILE_TYPES = {
    "FASTChronological": "Chronological",
    "FASTCorporate": "Corporate",
    "FASTEvent": "Event",
    "FASTFormGenre": "Form",
    "FASTGeographic": "Geographic",
    "FASTPersonal": "Personal",
    "FASTTitle": "Title",
    "FASTTopical": "Topical",
}
AGENT_TYPES = ("Corporate", "Event", "Personal")


def type_from_filename(path: Column) -> Column:
    """Derive the authority type from the source filename
    (reference lib/ingest.js:201-210); use with ``input_file_name()``."""
    expr = F.lit(None).cast("string")
    out = None
    for stem, type_name in FILE_TYPES.items():
        cond = path.contains(stem)
        out = F.when(cond, F.lit(type_name)) if out is None else out.when(cond, F.lit(type_name))
    return out.otherwise(expr)


# ---------------------------------------------------------------------------
# P1 — predicate-dispatch project+filter (reference lib/fast_parse.js:17-55)
# ---------------------------------------------------------------------------

def filter_triples(triples: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """Route each (subject, predicate, object) triple into a parsed record.

    Output columns (NULL = field absent, replacing the reference's ''/false
    sentinels): rec_type ('fast'|'sameAsLabel'), id, prefLabel, altLabel,
    label, sameAsLc, sameAsViaf, normalized, subject. Non-matching triples
    are dropped (P7 compact). ``keep`` passes extra columns through (e.g.
    the per-file branch tag in the fused multi-file pipeline).
    """
    s, p, o = F.col("subject"), F.col("predicate"), F.col("object")

    is_fast = s.contains("/fast/")                                   # P2
    bad_nan = s.contains("/fast/NaN") | o.contains("/fast/NaN")      # P3
    is_label_pred = p.isin(PRED_PREFLABEL, PRED_ALTLABEL, PRED_RDFS_LABEL)  # P4

    literal = nt_literal(o)
    label_ok = F.length(literal) >= 2                                # P6
    lit_or_null = F.when(label_ok, literal)

    fast_branch = is_fast & ~bad_nan
    sameas_label_branch = (~is_fast) & (p == PRED_RDFS_LABEL)

    parsed = triples.select(
        F.when(fast_branch, F.lit("fast"))
        .when(sameas_label_branch, F.lit("sameAsLabel"))
        .alias("rec_type"),
        F.when(fast_branch, fast_id(s)).alias("id"),                 # F1
        F.when(fast_branch & (p == PRED_PREFLABEL), lit_or_null).alias("prefLabel"),
        F.when(fast_branch & (p == PRED_ALTLABEL), lit_or_null).alias("altLabel"),
        F.when(fast_branch & (p == PRED_RDFS_LABEL), lit_or_null)
        .when(sameas_label_branch, literal)
        .alias("label"),
        F.when(                                                      # P5
            fast_branch & (p == PRED_SAMEAS) & o.contains("id.loc.gov"), o
        ).alias("sameAsLc"),
        F.when(
            fast_branch & (p == PRED_SAMEAS) & o.contains("viaf.org"), o
        ).alias("sameAsViaf"),
        F.when(
            fast_branch & is_label_pred & label_ok,
            normalize_and_singularize(literal),                      # F4+F5
        )
        .when(sameas_label_branch, normalize_and_singularize(literal))
        .alias("normalized"),
        F.when(sameas_label_branch, s).alias("subject"),
        *[F.col(k) for k in keep],
    )
    return parsed.filter(F.col("rec_type").isNotNull())              # P7


def filter_triple_obj_py(triple: dict) -> dict | str:
    """Pure-Python twin of ``filter_triples`` for golden parity tests —
    mirrors the reference's filterTripleObj record shapes
    (reference lib/fast_parse.js:17-55)."""
    import re

    s, p, o = triple["subject"], triple["predicate"], triple["object"]
    if "/fast/" in s:
        if "/fast/NaN" in s or "/fast/NaN" in o:
            return ""
        obj: dict = {"type": "fast"}
        m = re.search(r"/fast/([0-9]+)", s)
        obj["id"] = int(m.group(1)) if m else None
        if p == PRED_SAMEAS:
            if "id.loc.gov" in o:
                obj["sameAsLc"] = o
            if "viaf.org" in o:
                obj["sameAsViaf"] = o
        if p in (PRED_PREFLABEL, PRED_ALTLABEL, PRED_RDFS_LABEL):
            lit = _literal_py(o)
            if len(lit) >= 2:
                if p == PRED_PREFLABEL:
                    obj["prefLabel"] = lit
                if p == PRED_ALTLABEL:
                    obj["altLabel"] = lit
                if p == PRED_RDFS_LABEL:
                    obj["label"] = lit
                obj["normalized"] = normalize_and_singularize_py(lit)
        return obj
    if p == PRED_RDFS_LABEL:
        lit = _literal_py(o)
        return {
            "type": "sameAsLabel",
            "label": lit,
            "subject": s,
            "normalized": normalize_and_singularize_py(lit),
        }
    return ""


def _literal_py(o: str) -> str:
    import re

    m = re.match(r'^"(.*)"', o)
    if not m:
        return o
    out = m.group(1)
    for esc, ch in (('\\"', '"'), ("\\n", "\n"), ("\\t", "\t"), ("\\r", "\r"), ("\\\\", "\\")):
        out = out.replace(esc, ch)
    return out


# ---------------------------------------------------------------------------
# A1-A5 — keyed aggregation into FAST authority docs
# (reference lib/ingest.js:242-262)
# ---------------------------------------------------------------------------

def _sorted_set(col: Column) -> Column:
    """collect non-null values → sorted distinct array (order-stable)."""
    return F.array_sort(F.array_distinct(F.collect_list(col)))


def aggregate_fast(
    parsed: DataFrame,
    type_name: str | Column = "Topical",
    extra_keys: tuple[str, ...] = (),
) -> DataFrame:
    """One FAST authority document per (``extra_keys``, id).

    Spark's spillable hash aggregate replaces the reference's per-process
    in-heap map (reference lib/ingest.js:102,242-262); prefLabel uses
    MAX-priority coalesce (deterministic variant of last-write-wins +
    fill-if-missing, reference lib/ingest.js:245-246); the sameAs arrays
    collect both the URI and its last path segment
    (reference lib/ingest.js:248-255). ``extra_keys`` (e.g. the branch tag)
    lets ALL source files aggregate in one shuffle instead of one job per
    file — the fused formulation that replaces the reference's
    process-per-file topology at scale.
    """
    type_col = F.lit(type_name) if isinstance(type_name, str) else type_name
    fast = parsed.filter(F.col("rec_type") == "fast")
    return (
        fast.groupBy(*extra_keys, "id")
        .agg(
            F.coalesce(F.max("prefLabel"), F.max("label")).alias("prefLabel"),  # A2
            _sorted_set(F.col("altLabel")).alias("altLabel"),                   # A3
            _sorted_set(                                                        # A4
                F.when(
                    F.col("sameAsLc").isNotNull(),
                    F.array(F.col("sameAsLc"), last_segment(F.col("sameAsLc"))),
                )
            ).alias("_lc_pairs"),
            _sorted_set(
                F.when(
                    F.col("sameAsViaf").isNotNull(),
                    F.array(F.col("sameAsViaf"), last_segment(F.col("sameAsViaf"))),
                )
            ).alias("_viaf_pairs"),
            _sorted_set(F.col("normalized")).alias("normalized"),               # A5
        )
        .select(
            *extra_keys,
            F.col("id").alias("_id"),                                           # _id = fast id
            F.col("id").alias("fast"),
            type_col.alias("type"),
            "prefLabel",
            "altLabel",
            F.array_sort(F.array_distinct(F.flatten(F.col("_lc_pairs")))).alias("sameAsLc"),
            F.array_sort(F.array_distinct(F.flatten(F.col("_viaf_pairs")))).alias("sameAsViaf"),
            "normalized",
        )
    )


def sameas_index(parsed: DataFrame, extra_keys: tuple[str, ...] = ()) -> DataFrame:
    """A7 — URI → labels index from 'sameAsLabel' records
    (reference lib/ingest.js:257-260 builds this as ``allSameAs``)."""
    return (
        parsed.filter(F.col("rec_type") == "sameAsLabel")
        .groupBy(*extra_keys, "subject")
        .agg(
            _sorted_set(F.col("label")).alias("sa_labels"),
            _sorted_set(F.col("normalized")).alias("sa_normalized"),
        )
    )


# ---------------------------------------------------------------------------
# J1 — sameAs enrichment join (reference lib/ingest.js:267-289)
# ---------------------------------------------------------------------------

def enrich_with_sameas(
    fast_docs: DataFrame,
    sameas: DataFrame,
    extra_keys: tuple[str, ...] = (),
) -> DataFrame:
    """Append sameAs labels into altLabel/normalized.

    Explode the doc's LC+VIAF URIs, probe the (broadcast) label index, and
    re-aggregate — a set-oriented broadcast hash join replacing the
    reference's per-record probe of its in-heap ``allSameAs`` map. Only
    full URIs match the index (the reference probes the map with the URIs
    it collected; bare-id segments never hit, reference lib/ingest.js:269,279).
    With ``extra_keys`` the index is probed per source file (the
    reference's ``allSameAs`` is file-local state).
    """
    keys = list(extra_keys)
    uris = F.array_union("sameAsViaf", "sameAsLc")
    exploded = fast_docs.select(
        *keys, "_id", F.explode_outer(uris).alias("uri")
    ).filter(F.col("uri").contains("/"))  # full URIs only, skip bare segments
    hits = (
        exploded.join(
            F.broadcast(sameas.withColumnRenamed("subject", "uri")),
            ["uri", *keys],
            "inner",
        )
        .groupBy(*keys, "_id")
        .agg(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("sa_labels")))).alias("hit_labels"),
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("sa_normalized")))).alias("hit_normalized"),
        )
    )
    joined = fast_docs.join(F.broadcast(hits), ["_id", *keys], "left")
    return joined.select(
        *keys,
        "_id",
        "fast",
        "type",
        "prefLabel",
        F.array_sort(
            F.array_union(
                "altLabel",
                F.coalesce("hit_labels", F.array().cast("array<string>")),
            )
        ).alias("altLabel"),
        "sameAsLc",
        "sameAsViaf",
        F.array_sort(
            F.array_union(
                "normalized",
                F.coalesce("hit_normalized", F.array().cast("array<string>")),
            )
        ).alias("normalized"),
    )


# ---------------------------------------------------------------------------
# A6 — deterministic cross-file merge (reference lib/ingest.js:134-165)
# ---------------------------------------------------------------------------

def merge_fast(docs: DataFrame) -> DataFrame:
    """Merge duplicate ``_id``s produced by different source files.

    The reference discovers duplicates via insert failure and patches the
    stored doc (updateToBestFast, reference lib/ingest.js:134-165,174-183);
    we converge to the same end state in one pre-write aggregate:
      * ``type``  — from the "biggest" record. The reference compares JSON
        serialization lengths (reference lib/ingest.js:141); we use an
        engine-portable record weight — len(type) + len(prefLabel) + total
        chars of all array elements (incl. separators) — with a type-name
        tiebreak, so the DuckDB oracle can compute the identical rule;
      * ``prefLabel`` — MAX-coalesce across records (reference :143);
      * arrays — element-wise distinct union (reference :144-155).
    """
    weight = (
        F.length("type")
        + F.coalesce(F.length("prefLabel"), F.lit(0))
        + F.length(
            F.concat_ws(",", "altLabel", "sameAsLc", "sameAsViaf", "normalized")
        )
    )
    return (
        docs.groupBy("_id")
        .agg(
            F.first("fast").alias("fast"),
            F.max_by("type", F.struct(weight.alias("w"), F.col("type").alias("t"))).alias("type"),
            F.max("prefLabel").alias("prefLabel"),
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("altLabel")))).alias("altLabel"),
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("sameAsLc")))).alias("sameAsLc"),
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("sameAsViaf")))).alias("sameAsViaf"),
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("normalized")))).alias("normalized"),
        )
    )


# ---------------------------------------------------------------------------
# P8/P9 — pre-write filters (reference lib/ingest.js:298-309)
# ---------------------------------------------------------------------------

def filter_bad_docs(docs: DataFrame) -> DataFrame:
    """P8 — drop docs with no FAST id ('Bad Fast Obj',
    reference lib/ingest.js:304-307)."""
    return docs.filter(F.col("fast").isNotNull())


def filter_skip_viaf(docs: DataFrame) -> DataFrame:
    """P9 — TermEvent mode: drop docs already handled via VIAF in Agent mode
    (reference lib/ingest.js:298-303)."""
    return docs.filter(F.size("sameAsViaf") == 0)


# ---------------------------------------------------------------------------
# J2/J3 — VIAF enrichment (reference lib/ingest.js:108-128,212-232)
# ---------------------------------------------------------------------------

def derive_other_id(parsed: DataFrame) -> DataFrame:
    """Agent branch row transform: otherId = last path segment of sameAsLc,
    else of sameAsViaf, else drop (reference lib/ingest.js:217-228)."""
    other = F.coalesce(
        last_segment(F.col("sameAsLc")), last_segment(F.col("sameAsViaf"))
    )
    return (
        parsed.filter(F.col("rec_type") == "fast")
        .select(F.col("id").alias("fast_id"), other.alias("otherId"))
        .filter(F.col("otherId").isNotNull())
    )


def viaf_lookup_join(fast_links: DataFrame, viaf: DataFrame) -> DataFrame:
    """J2 — disjunctive-key lookup as a UNION of two equi-joins.

    ``viaf == otherId OR lcId == otherId`` written as one OR-join would
    force a nested-loop; two hash joins + dedup keeps both probes
    broadcast/shuffle-hash-joinable at any scale
    (reference lib/ingest.js:108-113).
    """
    by_viaf = fast_links.join(viaf, fast_links.otherId == viaf.viaf, "inner")
    by_lc = fast_links.join(viaf, fast_links.otherId == viaf.lcId, "inner")
    return by_viaf.unionByName(by_lc).select("_id", "fast_id").dropDuplicates(
        ["_id", "fast_id"]
    )


def update_viaf(viaf: DataFrame, matches: DataFrame) -> DataFrame:
    """J3 — append new FAST ids to each matched VIAF doc's ``fast`` array
    (membership-checked, reference lib/ingest.js:114-127), as one
    set-oriented merge instead of per-row point updates."""
    new_ids = matches.groupBy("_id").agg(
        F.array_sort(F.collect_set("fast_id")).alias("_new_fast")
    )
    return viaf.join(new_ids, "_id", "left").select(
        "_id",
        "viaf",
        "lcId",
        F.array_sort(
            F.array_union(
                F.coalesce(F.col("fast"), F.array().cast("array<bigint>")),
                F.coalesce(F.col("_new_fast"), F.array().cast("array<bigint>")),
            )
        ).alias("fast"),
    )


# ---------------------------------------------------------------------------
# Full job assembly (reference lib/ingest.js:194-319 end-to-end)
# ---------------------------------------------------------------------------

def _tagged_union(
    triples_by_type: dict[str, DataFrame], types: tuple[str, ...] | None = None
) -> DataFrame | None:
    """Union all per-type triple DataFrames with a ``branch`` tag column —
    the single-scan replacement for the reference's one-OS-process-per-file
    topology (reference lib/ingest.js:58,68-69). ``types`` filters which
    branches participate."""
    out = None
    for type_name, triples in triples_by_type.items():
        if types is not None and type_name not in types:
            continue
        t = triples.withColumn("branch", F.lit(type_name))
        out = t if out is None else out.unionByName(t)
    return out


def build_fast_table(triples_by_type: dict[str, DataFrame]) -> DataFrame:
    """The complete topical pipeline (§3.2), FUSED across source files:
    tag each file's triples with a ``branch`` column, then run ONE
    parse-filter → ONE (branch, id) aggregate → ONE broadcast enrichment
    join → (Event: skip-viaf filter, replacing the FASTTermEvent
    double-read, reference lib/ingest.js:58,298-302) → cross-file merge.

    Per-file semantics are preserved because ``branch`` rides in every
    grouping/join key; the fusion turns 4×(agg+join) jobs into one shuffle
    per logical step — at 100 TB that is the difference between 8
    sequential jobs and one wide plan (and locally it removes ~12 tiny
    stage barriers).

    Agent-type files contribute ONLY via the Event re-read minus VIAF-linked
    terms (reference lib/ingest.js:11,298-302): Corporate/Personal feed the
    viaf branch, not this table.
    """
    non_agent = tuple(
        t for t in triples_by_type if t not in AGENT_TYPES or t == "Event"
    )
    return build_fast_table_tagged(_tagged_union(triples_by_type, non_agent))


def build_fast_table_tagged(tagged: DataFrame) -> DataFrame:
    """build_fast_table over ONE pre-tagged triples DataFrame (column
    ``branch`` = authority type) — the single-scan entry used by the job
    runner, where the tag comes from ``input_file_name()``. Corporate/
    Personal rows must already be excluded (they feed only the viaf
    branch); Event rows get the skip-viaf filter here."""
    # parsed feeds three consumers (doc aggregate, label index, enrichment
    # probe); persist so the parse+normalize expressions run once — the
    # spillable analogue of the reference's materialized maps.
    from pyspark import StorageLevel

    parsed = filter_triples(tagged, keep=("branch",)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    docs = aggregate_fast(parsed, F.col("branch"), extra_keys=("branch",))
    enriched = enrich_with_sameas(
        docs, sameas_index(parsed, extra_keys=("branch",)), extra_keys=("branch",)
    )
    enriched = enriched.filter(
        ~((F.col("branch") == "Event") & (F.size("sameAsViaf") > 0))
    )
    return merge_fast(filter_bad_docs(enriched).drop("branch"))


def build_viaf_updates(
    triples_by_type: dict[str, DataFrame], viaf: DataFrame
) -> DataFrame:
    """The Agent/VIAF branch over Corporate/Event/Personal files
    (reference lib/ingest.js:212-232): one fused parse → derive otherId →
    disjunctive lookup join → set-oriented array append. (otherId links
    are file-independent, so no branch tag is needed here.)"""
    return build_viaf_updates_tagged(
        _tagged_union(triples_by_type, AGENT_TYPES), viaf
    )


def build_viaf_updates_tagged(agent_triples: DataFrame, viaf: DataFrame) -> DataFrame:
    """build_viaf_updates over one pre-filtered DataFrame of Agent-file
    triples (Corporate/Event/Personal)."""
    links = derive_other_id(filter_triples(agent_triples))
    matches = viaf_lookup_join(links, viaf)
    return update_viaf(viaf, matches)
