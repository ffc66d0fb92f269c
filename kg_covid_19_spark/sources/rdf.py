"""RDF n-triples source (S9) — GO-CAM transform as a Spark plan.

Reference: kg_covid_19/transform_utils/gocam_transform/gocam_transform.py
delegates to the KGX `Transformer` with (a) a custom prefix→IRI
contraction map (gocam_transform.py:62-72), and (b) a set of predicates
treated as *node properties* rather than edges
(gocam_transform.py:75-79). The observable contract reproduced here:

* each `<s> <p> <o> .` line becomes one (subject, predicate, object)
  triple; literal objects are kept as strings;
* IRIs contract to CURIEs by longest-prefix match over the contraction
  map (plus the biolink vocab → `biolink:` and OBO PURLs), falling back
  to the raw IRI when no prefix matches (KGX behavior);
* triples whose predicate is in `node_property_predicates` are folded
  onto the subject node as properties, not emitted as edges;
* nodes = distinct subjects ∪ IRI objects of edge triples, categorized
  with guess_bl_category (C4).

The contraction map is a static when-chain (JVM-side, codegen-friendly)
ordered by prefix length so the longest IRI prefix wins — the broadcast-
join alternative only pays off when the map is data-dependent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.curie import guess_bl_category

SOURCE = "GOCAMs"

# gocam_transform.py:62-72 + the standard biolink/OBO contractions KGX
# applies from its built-in context.
GOCAM_CMAP = {
    "REACT": "http://purl.obolibrary.org/obo/go/extensions/reacto.owl#REACTO_",
    "WB": "http://identifiers.org/wormbase/",
    "FB": "http://identifiers.org/flybase/",
    "LEGO": "http://geneontology.org/lego/",
    "GOCAM": "http://model.geneontology.org/",
    "TAIR.LOCUS": "http://identifiers.org/tair.locus/",
    "POMBASE": "http://identifiers.org/PomBase",
    "DICTYBASE.GENE": "http://identifiers.org/dictybase.gene/",
    "XENBASE": "http://identifiers.org/xenbase/",
    "biolink": "https://w3id.org/biolink/vocab/",
    "GO": "http://purl.obolibrary.org/obo/GO_",
    "ECO": "http://purl.obolibrary.org/obo/ECO_",
    "UniProtKB": "http://identifiers.org/uniprot/",
}

# gocam_transform.py:75-79
GOCAM_NODE_PROPERTY_PREDICATES = {
    "http://geneontology.org/lego/evidence",
    "https://w3id.org/biolink/vocab/subjectActivity",
    "https://w3id.org/biolink/vocab/objectActivity",
}

# <s> <p> <o .|literal> . — o is either an IRI or a quoted literal
# (lang tags / datatypes allowed after the closing quote)
_NT_RE = (
    r'^\s*<([^>]+)>\s+<([^>]+)>\s+(?:<([^>]+)>|"((?:[^"\\]|\\.)*)"[^.]*)\s*\.\s*$'
)


def contract_iri(col: Column, cmap: dict[str, str] | None = None) -> Column:
    """IRI → CURIE by longest-prefix match; raw value on no match."""
    cmap = GOCAM_CMAP if cmap is None else cmap
    expr = col
    # shortest first so later (longer) when-branches take precedence in
    # the fold below — build as reversed coalesce of length-desc matches
    out = None
    for prefix, iri in sorted(cmap.items(), key=lambda kv: -len(kv[1])):
        hit = F.when(
            col.startswith(iri),
            F.concat(F.lit(prefix + ":"), F.substring(col, len(iri) + 1, 2**18)),
        )
        out = hit if out is None else F.coalesce(out, hit)
    return F.coalesce(out, expr)


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """n-triples file → (subject, predicate, object, is_literal)."""
    lines = spark.read.text(path).filter(
        ~F.col("value").rlike(r"^\s*(#|$)")
    )
    s = F.regexp_extract("value", _NT_RE, 1)
    p = F.regexp_extract("value", _NT_RE, 2)
    o_iri = F.regexp_extract("value", _NT_RE, 3)
    o_lit = F.regexp_extract("value", _NT_RE, 4)
    return (
        lines.select(
            s.alias("subject_iri"),
            p.alias("predicate_iri"),
            F.when(o_iri != "", o_iri).alias("object_iri"),
            # single-pass unescape: \" → " and \\ → \ (n-triples grammar)
            F.when(
                o_iri == "",
                F.regexp_replace(o_lit, r'\\(["\\])', r"$1"),
            ).alias("object_literal"),
        )
        .filter(F.col("subject_iri") != "")
    )


def gocam_transform(
    spark: SparkSession,
    nt_file: str,
    cmap: dict[str, str] | None = None,
    node_property_predicates: set[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """GO-CAM n-triples → (nodes, edges) KGX frames."""
    npreds = (
        GOCAM_NODE_PROPERTY_PREDICATES
        if node_property_predicates is None
        else node_property_predicates
    )
    triples = read_ntriples(spark, nt_file).cache()

    is_nprop = F.col("predicate_iri").isin(*npreds)

    edge_triples = triples.filter(~is_nprop)
    edges = edge_triples.select(
        contract_iri(F.col("subject_iri"), cmap).alias("subject"),
        contract_iri(F.col("predicate_iri"), cmap).alias("predicate"),
        F.coalesce(
            contract_iri(F.col("object_iri"), cmap),
            F.col("object_literal"),
        ).alias("object"),
        F.lit("").alias("relation"),
        F.lit(SOURCE).alias("provided_by"),
    )

    # node-property triples fold onto the subject as a properties map
    nprops = (
        triples.filter(is_nprop)
        .groupBy("subject_iri")
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        contract_iri(F.col("predicate_iri"), cmap).alias("k"),
                        F.coalesce(
                            contract_iri(F.col("object_iri"), cmap),
                            F.col("object_literal"),
                        ).alias("v"),
                    )
                )
            ).alias("properties")
        )
    )

    endpoint_iris = (
        edge_triples.select(F.col("subject_iri").alias("iri"))
        .unionByName(
            edge_triples.filter(F.col("object_iri").isNotNull()).select(
                F.col("object_iri").alias("iri")
            )
        )
        .distinct()
    )
    nodes = (
        endpoint_iris.join(
            nprops.withColumnRenamed("subject_iri", "iri"), "iri", "left"
        )
        .select(
            contract_iri(F.col("iri"), cmap).alias("id"),
            F.lit("").alias("name"),
            guess_bl_category(contract_iri(F.col("iri"), cmap)).alias(
                "category"
            ),
            F.lit(SOURCE).alias("provided_by"),
            F.coalesce(
                F.col("properties"),
                F.map_from_arrays(F.array(), F.array()).cast(
                    "map<string,string>"
                ),
            ).alias("properties"),
        )
        .dropDuplicates(["id"])
    )
    return nodes, edges


# ---------------------------------------------------------------------------
# n-triples SINK (K2's Jenkins variant: merged graph → merged-kg.nt.gz,
# merge_jenkins.yaml). CURIEs expand back to IRIs by prefix table +
# OBO-purl rule — the exact inverse of contract_iri/contract_obo, so a
# write → read_ntriples → contract round trip is the identity (pinned by
# test_rdf).
# ---------------------------------------------------------------------------

RDF_TYPE_IRI = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_LABEL_IRI = "http://www.w3.org/2000/01/rdf-schema#label"

# prefixes that expand through the OBO PURL pattern
OBO_PREFIXES = ("MONDO", "CHEBI", "GO", "ECO", "HP", "DOID", "NCBITaxon")
_OBO_BASE = "http://purl.obolibrary.org/obo/"

# engine-default expansion table: reverse of the reader's contraction
# families plus the identifier namespaces the KG's prefixes come from
NT_EXPAND: dict[str, str] = {
    **{p: iri for p, iri in GOCAM_CMAP.items()},
    "MESH": "https://id.nlm.nih.gov/mesh/",
    "NCBIGene": "http://identifiers.org/ncbigene/",
    "CORD": "https://kghub.io/cord/",
    "DrugCentral": "https://drugcentral.org/drugcard/",
}


def expand_curie(col: Column, cmap: dict[str, str] | None = None) -> Column:
    """CURIE → IRI: OBO prefixes via the PURL pattern, everything else
    via the expansion table; unmapped prefixes get a deterministic
    ``urn:x-curie:`` form (never dropped — lossless by construction)."""
    cmap = NT_EXPAND if cmap is None else cmap
    pfx = F.regexp_extract(col, "^([^:]+):", 1)
    local = F.regexp_replace(col, "^[^:]+:", "")
    expr = F.concat(F.lit("urn:x-curie:"), col)
    for p, iri in sorted(cmap.items()):
        expr = F.when(pfx == p, F.concat(F.lit(iri), local)).otherwise(expr)
    obo = F.concat(F.lit(_OBO_BASE), pfx, F.lit("_"), local)
    return F.when(pfx.isin(*OBO_PREFIXES), obo).otherwise(expr)


def _nt_literal(col: Column) -> Column:
    """Quote + escape a literal per the n-triples grammar (backslash
    first, then quote; the text kernel guarantees no raw newlines)."""
    esc = F.regexp_replace(col, r"\\", r"\\\\")
    esc = F.regexp_replace(esc, '"', '\\\\"')
    return F.concat(F.lit('"'), esc, F.lit('"'))


def ntriples_lines(
    nodes: DataFrame,
    edges: DataFrame,
    cmap: dict[str, str] | None = None,
) -> DataFrame:
    """(nodes, edges) → one-column frame of n-triples lines:
    ``<id> rdf:type <category>``, ``<id> rdfs:label "name"`` (when
    named), and ``<s> <predicate> <o>`` per edge."""
    wrap = lambda c: F.concat(F.lit("<"), c, F.lit(">"))
    type_lines = nodes.select(
        F.concat_ws(
            " ",
            wrap(expand_curie(F.col("id"), cmap)),
            wrap(F.lit(RDF_TYPE_IRI)),
            wrap(expand_curie(F.col("category"), cmap)),
            F.lit("."),
        ).alias("value")
    )
    label_lines = nodes.filter(F.col("name").isNotNull()).select(
        F.concat_ws(
            " ",
            wrap(expand_curie(F.col("id"), cmap)),
            wrap(F.lit(RDFS_LABEL_IRI)),
            _nt_literal(F.col("name")),
            F.lit("."),
        ).alias("value")
    )
    edge_lines = edges.select(
        F.concat_ws(
            " ",
            wrap(expand_curie(F.col("subject"), cmap)),
            wrap(expand_curie(F.col("predicate"), cmap)),
            wrap(expand_curie(F.col("object"), cmap)),
            F.lit("."),
        ).alias("value")
    )
    return type_lines.unionAll(label_lines).unionAll(edge_lines)


def write_ntriples(
    nodes: DataFrame,
    edges: DataFrame,
    path: str,
    cmap: dict[str, str] | None = None,
    gzipped: bool = True,
) -> None:
    """Write the merged graph as (gzipped) n-triples part files — the
    reference Jenkins pipeline's merged-kg.nt.gz artifact, distributed
    (one part per partition; a downstream cat is the single-file
    form)."""
    writer = ntriples_lines(nodes, edges, cmap).write.mode("overwrite")
    if gzipped:
        writer = writer.option("compression", "gzip")
    writer.text(path)
