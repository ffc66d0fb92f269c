"""Zhou et al. virus-host protein transform (PDF table source, S7).

Reference: kg_covid_19/transform_utils/zhou_host_proteins/
zhou_transform.py — tabula extracts the Suppl-Fig-3 table from pages
5-7 of the paper's PDF (zhou_transform.py:81-85), the multi-page JSON
becomes row dicts with the first page's first row as the shared header
(utils/transform_utils.py:28-68), and each row emits a host-gene node,
a virus node, and one interacts_with edge keyed by a fixed
coronavirus→taxon table (zhou_transform.py:60-70, 96-137).

Split exactly like the reference splits it:

* **decode** — `read_pdf_tables` is the tabula call. Tabula is used
  when importable; otherwise a pure-Python text-layer extractor
  (content streams → BT/ET rows, stdlib zlib for /FlateDecode) makes
  the branch runnable on a real PDF byte string without any PDF
  library. Only scanned PDFs with no text layer remain behind the
  explicit NotImplementedError seam (they need OCR); the Spark-side
  plumbing takes any DataFrame with the table's four columns.
* **transform** — `zhou_transform(spark, rows_df)`: pure column
  algebra over those rows, including the reference's behavior of
  raising on an unknown coronavirus (implemented as a raise-on-collect
  guard column so the check stays distributed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SOURCE = "zhou_host_proteins"

ZHOU_NODE_COLS = ["id", "name", "category", "provided_by"]
ZHOU_EDGE_COLS = [
    "subject", "predicate", "object", "relation", "provided_by", "type",
    "publication",
]

# zhou_transform.py:63-70
CORONA_TAXON = {
    "IBV": 11120,
    "MHV": 502104,
    "HCoV-NL63": 277944,
    "HCoV-229E": 11137,
    "SARS": 227859,
    "MERS": 1335626,
}

TABLE_COLUMNS = ["Coronavirus", "Host Gene ID", "Host Protein", "PubMed ID"]


SIDECAR_FILE = "41421_2020_153_MOESM1_ESM.tables.json"

# tabula.io.read_pdf(output_format-ish) JSON: a top-level array of page
# objects, each {"data": [[{"text": ...} × cells] × rows]}
# (utils/transform_utils.py:28-68).
_SIDECAR_SCHEMA = (
    "array<struct<data: array<array<struct<text: string>>>>>"
)


def read_table_sidecar(spark: SparkSession, json_path: str) -> DataFrame:
    """Pre-extracted tabula-JSON sidecar → table rows.

    The PDF decode itself needs tabula (stubbed below); its raw JSON
    output is a plain file this reader parses with the reference's
    exact semantics (multi_page_table_to_list + get_header_items,
    utils/transform_utils.py:28-68): the header is the FIRST page's
    FIRST row, every other row of every page zips against it.

    Read as wholetext + from_json (not spark.read.json) so the page
    array stays one ordered value — element order is what defines
    "first page / first row". One task for a KB-sized sidecar; the
    exploded rows distribute from there.
    """
    pages = spark.read.text(json_path, wholetext=True).select(
        F.from_json("value", _SIDECAR_SCHEMA).alias("pages")
    )
    # F.get, not getItem: Spark 4 ANSI getItem throws on empty arrays,
    # so a malformed/empty sidecar should surface as a clear error here
    # rather than an INVALID_ARRAY_INDEX deep in the scan
    head = pages.select(
        F.get(F.get(F.col("pages"), 0)["data"], 0).alias("h")
    ).first()["h"]
    if not head:
        raise ValueError(f"sidecar has no header row: {json_path}")
    header = [r["text"] for r in head]
    rows = (
        pages.select(F.posexplode("pages").alias("pg", "page"))
        .select("pg", F.posexplode("page.data").alias("ri", "row"))
        .filter(~((F.col("pg") == 0) & (F.col("ri") == 0)))
        .select(F.transform("row", lambda c: c["text"]).alias("cells"))
    )
    # F.get (null on missing), not getItem (ANSI throw): real tabula
    # output has ragged rows, and the reference's zip(header, row)
    # truncates rather than crashes (transform_utils.py:50-52)
    return rows.select(
        *[F.get("cells", i).alias(h) for i, h in enumerate(header)]
    )


_PDF_STRING = rb"\((?:[^()\\]|\\.)*\)"


def _pdf_unescape(raw: bytes) -> str:
    """PDF literal-string body → text: \\( \\) \\\\ \\n \\r \\t and
    3-digit octal escapes (the subset simple text layers use)."""
    out, i = [], 0
    esc = {b"n": "\n", b"r": "\r", b"t": "\t", b"(": "(", b")": ")",
           b"\\": "\\"}
    while i < len(raw):
        c = raw[i:i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1:i + 2]
            if nxt.isdigit():
                j = i + 1
                while j < min(i + 4, len(raw)) and raw[j:j + 1].isdigit():
                    j += 1
                out.append(chr(int(raw[i + 1:j], 8)))
                i = j
                continue
            out.append(esc.get(nxt, nxt.decode("latin-1")))
            i += 2
            continue
        out.append(c.decode("latin-1"))
        i += 1
    return "".join(out)


def _pdf_content_streams(pdf: bytes) -> list[bytes]:
    """All stream objects in document order, inflated when the object
    dictionary declares /FlateDecode. For the simple one-content-
    stream-per-page PDFs this fallback targets, stream order IS page
    order (documented approximation vs a full page-tree walk)."""
    import re as _re
    import zlib

    streams = []
    for m in _re.finditer(rb"stream\r?\n", pdf):
        end = pdf.find(b"endstream", m.end())
        if end < 0:
            continue
        body = pdf[m.end():end].rstrip(b"\r\n")
        head = pdf[max(0, m.start() - 2048):m.start()]
        # Find the opening '<<' of the object dictionary that CLOSES
        # right before `stream` by scanning right-to-left and balancing
        # '>>' against '<<' — a nested dict (e.g. /DecodeParms <<...>>)
        # must not hide the /FlateDecode token, which can appear
        # anywhere in the outer dict, so the naive "substring after the
        # last '<<'" check is wrong.
        depth = 0
        open_at = None
        if head.rstrip().endswith(b">>"):
            for t in reversed(list(_re.finditer(rb"<<|>>", head))):
                if t.group() == b">>":
                    depth += 1
                else:
                    depth -= 1
                    if depth == 0:
                        open_at = t.start()
                        break
        if open_at is not None and b"/FlateDecode" in head[open_at:]:
            try:
                body = zlib.decompress(body)
            except zlib.error:
                continue
        streams.append(body)
    return streams


def _pdf_text_rows(stream: bytes) -> list[list[str]]:
    """Content stream → text rows. Inside each BT…ET block, every line
    move (Td/TD/T*) starts a new row; each show-text op contributes one
    CELL — `(…) Tj` as-is, `[…] TJ` with its kerned fragments joined.
    That is exactly how a text-layer table lays out: one positioning op
    per row, one text run per cell."""
    import re as _re

    tok = _re.compile(
        rb"(?P<str>" + _PDF_STRING + rb")\s*Tj"
        rb"|\[(?P<arr>(?:" + _PDF_STRING + rb"|[^\]])*)\]\s*TJ"
        rb"|(?P<nl>(?:[-\d.]+\s+[-\d.]+\s+(?:Td|TD))|T\*|BT)"
    )
    rows: list[list[str]] = []
    cur: list[str] | None = None
    for m in tok.finditer(stream):
        if m.group("nl") is not None:
            if cur:
                rows.append(cur)
            cur = []
        elif m.group("str") is not None:
            (cur := [] if cur is None else cur).append(
                _pdf_unescape(m.group("str")[1:-1])
            )
        else:
            frags = _re.findall(_PDF_STRING, m.group("arr"))
            (cur := [] if cur is None else cur).append(
                "".join(_pdf_unescape(f[1:-1]) for f in frags)
            )
    if cur:
        rows.append(cur)
    return rows


def read_pdf_tables(spark: SparkSession, pdf_path: str,
                    pages: tuple[int, ...] = (5, 6, 7)) -> DataFrame:
    """tabula.io.read_pdf equivalent (zhou_transform.py:81-85).

    Preferred branch is tabula when importable (full geometric table
    detection). Without it — this container — a pure-Python text-layer
    extractor runs: content streams are located (FlateDecode inflated
    via stdlib zlib), each selected page's BT/ET text rows become table
    rows, and the reference's header semantics apply exactly as in the
    sidecar reader (first row of the first selected page is the header,
    every other row zips against it with ragged-row truncation,
    utils/transform_utils.py:28-68). A PDF with no extractable text
    layer (scanned images) still raises NotImplementedError — that
    genuinely needs OCR this environment does not ship."""
    try:
        import tabula  # type: ignore

        pdf_rows = None
    except ImportError:
        with open(pdf_path, "rb") as fh:
            pdf = fh.read()
        streams = _pdf_content_streams(pdf)
        pdf_rows = []
        for pg in pages:
            if 0 < pg <= len(streams):
                pdf_rows.extend(_pdf_text_rows(streams[pg - 1]))
        if not pdf_rows:
            raise NotImplementedError(
                f"no text layer on pages {pages} of {pdf_path} — "
                "scanned PDFs need tabula/OCR; pass extracted rows to "
                "zhou_transform(spark, rows_df) instead"
            )
    if pdf_rows is None:
        dfs = tabula.read_pdf(pdf_path, pages=list(pages),
                              multiple_tables=True)
        pdf_rows = [list(df.columns) for df in dfs[:1]]
        for df in dfs:
            pdf_rows.extend([str(v) for v in row] for row in df.values)
    header, data = pdf_rows[0], pdf_rows[1:]
    fitted = [
        tuple((row + [None] * len(header))[: len(header)]) for row in data
    ]
    return spark.createDataFrame(
        fitted, ", ".join(f"`{c}` string" for c in header)
    )


def zhou_transform(spark: SparkSession, rows: DataFrame
                   ) -> tuple[DataFrame, DataFrame]:
    """Fig-3 table rows → (nodes, edges) (zhou_transform.py:96-150).

    `rows` must carry TABLE_COLUMNS. Unknown coronavirus names raise at
    evaluation, matching zhou_transform.py:98-101."""
    lit = F.lit
    taxon = F.map_from_arrays(
        F.array(*[lit(k) for k in CORONA_TAXON]),
        F.array(*[lit(str(v)) for v in CORONA_TAXON.values()]),
    )
    checked = rows.withColumn(
        "corona_curie",
        F.when(
            taxon[F.col("Coronavirus")].isNotNull(),
            F.concat(lit("NCBITaxon:"), taxon[F.col("Coronavirus")]),
        ).otherwise(
            F.raise_error(
                F.concat(
                    lit("Can't find info for coronavirus "),
                    F.col("Coronavirus"),
                )
            )
        ),
    )
    gene_id = F.concat(lit("NCBIGene:"), F.col("Host Gene ID"))
    gene_nodes = checked.select(
        gene_id.alias("id"),
        F.col("Host Protein").alias("name"),
        lit("biolink:Gene").alias("category"),
        lit(SOURCE).alias("provided_by"),
    )
    virus_nodes = checked.select(
        F.col("corona_curie").alias("id"),
        F.col("Coronavirus").alias("name"),
        lit("biolink:OrganismalEntity").alias("category"),
        lit(SOURCE).alias("provided_by"),
    )
    # reference writes both nodes per row, no dedup (zhou_transform.py:105-129)
    nodes = gene_nodes.unionByName(virus_nodes).select(*ZHOU_NODE_COLS)
    edges = checked.select(
        gene_id.alias("subject"),
        lit("biolink:interacts_with").alias("predicate"),
        F.col("corona_curie").alias("object"),
        lit("RO:0002437").alias("relation"),
        lit(SOURCE).alias("provided_by"),
        lit("biolink:Association").alias("type"),
        F.concat(lit("PMID:"), F.col("PubMed ID")).alias("publication"),
    ).select(*ZHOU_EDGE_COLS)
    return nodes, edges
