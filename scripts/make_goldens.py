"""Generate the checked-in golden fixtures (FIXTURES.md §2).

Run once (and only deliberately — regenerating goldens is a semantic
change that needs review, like editing the reference's testdata.go):

    python scripts/make_goldens.py
"""

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from guacray.data.pages import generate_pages
from guacray.data.reference import reference_graph, reference_triples
from guacray.functions.text import extract_text

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden")
N_PAGES = 64


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    pages = generate_pages(N_PAGES)

    text_rows = [{"url": r["url"],
                  "text_extracted": extract_text(r["html"]),
                  "text_sha256": hashlib.sha256(
                      extract_text(r["html"]).encode()).hexdigest()}
                 for r in pages.to_pylist()]
    pq.write_table(pa.Table.from_pylist(text_rows),
                   os.path.join(OUT, "golden_text.parquet"))

    triples = reference_triples(pages)
    pq.write_table(pa.Table.from_pylist(triples),
                   os.path.join(OUT, "golden_triples.parquet"))

    nodes, edges = reference_graph(pages)
    pq.write_table(pa.Table.from_pylist(nodes),
                   os.path.join(OUT, "golden_nodes.parquet"))
    pq.write_table(pa.Table.from_pylist(edges),
                   os.path.join(OUT, "golden_edges.parquet"))
    print(f"goldens written to {OUT}: {N_PAGES} pages, "
          f"{len(triples)} triples, {len(nodes)} nodes, {len(edges)} edges")


if __name__ == "__main__":
    main()
