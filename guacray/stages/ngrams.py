"""Word-n-gram corpus operators: boilerplate mining + decontamination.

The reference deduplicates only by exact content key
(/root/reference/pkg/assembler/assembler.go:196-308); a web-scale
training-data engine additionally needs the n-gram layer used by
C4/RefinedWeb-style corpus cleaning:

  ngram_explode     DISTINCT (doc, word-k-gram) rows, fully vectorized
  repeated_ngrams   k-grams appearing in >= min_docs distinct docs —
                    the boilerplate / template-text mining primitive
  decontaminate     per-doc count of k-grams shared with a benchmark
                    set — eval-suite decontamination

Scale shape: the explode is a per-batch Arrow kernel chain (split →
flatten+parent-indices → k shifted slices joined element-wise) with a
local distinct combiner, so the exchange moves only (gram, doc) rows;
the benchmark side of ``decontaminate`` is collected ONCE and
broadcast via ``ray.put`` (an eval suite is small by contract) — the
corpus side streams and never shuffles.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray

from .agg import agg_by_name, grouped_agg


def word_windows(texts, k: int):
    """THE word-k-gram window kernel, shared by every n-gram operator
    (explode, repetition metrics): single-space split (== DuckDB
    ``string_split(text, ' ')``), flatten with parent indices, k
    shifted slices joined element-wise, windows masked to stay inside
    one document's word list.  Returns ``(words, parents, grams)``
    where ``parents``/``grams`` are the VALID windows' row indices and
    gram strings (empty arrays when no document has k words) — one
    implementation so a tokenizer/windowing change can never drift
    between the SQL-checked operators built on it."""
    words = pc.split_pattern(texts, " ")
    flat = pc.list_flatten(words).combine_chunks()
    parents = pc.list_parent_indices(words).combine_chunks()
    m = len(flat) - k + 1
    if m <= 0:
        empty_p = pa.array([], parents.type if len(parents) else pa.int64())
        return words, empty_p, pa.array([], pa.string())
    grams = pc.binary_join_element_wise(
        *(flat.slice(j, m) for j in range(k)), pa.scalar(" "))
    # a window is valid iff it stays inside one document's word list
    valid = pc.equal(parents.slice(0, m), parents.slice(k - 1, m))
    return (words, pc.filter(parents.slice(0, m), valid),
            pc.filter(grams, valid))


def ngram_explode_batch(batch: pa.Table, k: int, *,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> pa.Table:
    """Per-batch kernel: DISTINCT (id, ngram) rows, no Python row loop.

    Tokenization/windowing = ``word_windows``; docs with fewer than k
    words emit nothing (the parent-index mask can never match across
    documents)."""
    empty = pa.table({id_col: pa.array([], batch[id_col].type),
                      "ngram": pa.array([], pa.string())})
    if batch.num_rows == 0:
        return empty
    _, parents, grams = word_windows(batch[text_col], k)
    if len(grams) == 0:
        return empty
    tbl = pa.table({
        id_col: pc.take(batch[id_col], parents),
        "ngram": grams,
    })
    return agg_by_name(tbl, [id_col, "ngram"], [])  # per-doc distinct


def ngram_explode(ds, k: int = 3, *, id_col: str = "doc_id",
                  text_col: str = "text"):
    """Dataset wrapper over ``ngram_explode_batch``.  Distinctness is
    global because each document lives in exactly one batch row."""
    return ds.map_batches(
        lambda t: ngram_explode_batch(t, k, id_col=id_col,
                                      text_col=text_col),
        batch_format="pyarrow")


def repeated_ngrams(ds, k: int = 3, min_docs: int = 3, *,
                    id_col: str = "doc_id", text_col: str = "text"):
    """k-grams occurring in >= min_docs DISTINCT documents → (ngram,
    n_docs).  Count-distinct comes free: the explode already emits each
    (doc, gram) once, so a grouped count per gram is the doc count."""
    pairs = ngram_explode(ds, k, id_col=id_col, text_col=text_col)
    counts = grouped_agg(pairs, ["ngram"], [(id_col, "count", "n_docs")])
    lo = pa.scalar(min_docs, type=pa.int64())
    return counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_docs"], lo)),
        batch_format="pyarrow")


def decontaminate(ds, benchmark_ds, k: int = 3, *,
                  id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, n_hits): distinct k-grams each corpus doc shares with
    the benchmark corpus (docs with zero overlap are absent).

    The benchmark gram set is materialized on the driver and broadcast
    — the contract is that it is an eval suite (thousands of docs), not
    a second corpus; at 100 TB the corpus side still streams in one
    pass with a per-batch ``is_in`` membership kernel."""
    bench = ngram_explode(benchmark_ds, k, id_col=id_col,
                          text_col=text_col)
    grams = grouped_agg(bench, ["ngram"], [])
    value_set = pa.array(sorted(grams.to_pandas()["ngram"]),
                         type=pa.string())
    ref = ray.put(value_set)

    def member(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.is_in(batch["ngram"],
                                     value_set=ray.get(ref)))
        return agg_by_name(keep, [id_col], [("ngram", "count", "n_hits")])

    pairs = ngram_explode(ds, k, id_col=id_col, text_col=text_col)
    hits = pairs.map_batches(member, batch_format="pyarrow")
    # per-doc partials are already complete (one batch per doc), but a
    # final exchange keeps the contract under any upstream re-batching
    return grouped_agg(hits, [id_col], [("n_hits", "sum", "n_hits")])
