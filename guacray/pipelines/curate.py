"""Composed training-data curation pipeline over a documents table.

The showpiece composition of the training-data operators — the shape a
100 TB pretraining-data run takes:

    read(documents)
      → language-ID + quality scoring            # ONE fused pass (both
        (worker-cached classifier, vectorized)   #  row-local scores)
      → exact dedup (two-phase exchange)         # canonical copy per text
      → near-dup removal (MinHash-LSH)           # drop the non-canonical of each pair
      → seeded sample                            # downsample to budget
      → write curated parquet

Each stage is the independently-tested operator from stages/; this
module only wires them.  Keep/drop decisions stay DISTRIBUTED: each
gate produces an id-keyed Dataset that is applied with the size-aware
``semi_join`` (broadcast sorted-array filter below threshold,
hash-partitioned join above) — no O(corpus) id set is ever collected
to the driver, so the composition survives 100 TB.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..stages.agg import semi_join
from ..stages.dedup import exact_dedup, minhash_lsh_pairs
from ..stages.ngrams import decontaminate
from ..stages.quality import quality_scores_batch


def curate(sf_dir: str, *, allow_langs=("en", "es", "de", "fr"),
           min_quality: float = 0.3, near_dup_threshold: float = 0.6,
           sample_fraction: float | None = None, seed: int = 7,
           shuffle: bool = False, decontam_modulus: int | None = None,
           decontam_ngram: int = 3):
    """documents → curated Dataset (doc_id, text, lang).

    keep = lang-gate ∩ quality-gate ∩ exact-canonical
           [− benchmark-contaminated] − near-dup-dropped,
    expressed as chained semi joins and anti joins over id-keyed
    decision Datasets.  ``decontam_modulus`` switches on the
    benchmark-decontamination gate: docs with ``doc_id %% modulus == 0``
    stand in for the eval suite; they AND every doc sharing a
    ``decontam_ngram``-gram with them are dropped (the benchmark gram
    set broadcasts; the corpus side streams).
    """
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text", "lang"])

    # 1+2. language gate (on the PREDICTED language — the provided lang
    # column is metadata; curation trusts the classifier) fused with the
    # quality gate into ONE pass over docs: both are row-local scores,
    # so separate executions would only pay a second full scan.  LangID
    # is worker-cached (the MinHasher pattern) — its profiles are tiny,
    # and for short composed jobs actor-pool ramp costs more than it
    # amortizes.
    allow = pa.array(sorted(allow_langs))
    _lid_cache: dict = {}

    def lang_q_gate(t: pa.Table) -> pa.Table:
        from ..stages.quality import LangID
        lid = _lid_cache.get("lid")
        if lid is None:
            lid = _lid_cache["lid"] = LangID()
        scored = lid(t)
        keep = pc.is_in(scored["lang_pred"], value_set=allow)
        t = t.append_column("__q", quality_scores_batch(t)["quality"])

        keep = pc.and_(keep, pc.greater_equal(
            t["__q"], pa.scalar(min_quality)))
        return t.filter(keep).select(["doc_id"])

    keep_lang_q = docs.map_batches(lang_q_gate, batch_format="pyarrow")

    # 3. exact dedup: canonical (min doc_id) copy per distinct text
    canon = exact_dedup(docs).select_columns(["doc_id"])

    # gates first, signatures second: MinHash signing is the expensive
    # stage, so it consumes only the lang/quality/exact-canonical
    # SURVIVORS, not the whole corpus.  Materialized because two
    # consumers follow (the signature pass and the final anti join) —
    # at 100 TB this materialization is the natural checkpoint between
    # the cheap gates and the expensive near-dup stage.
    survivors = semi_join(docs, keep_lang_q, on="doc_id")
    survivors = semi_join(survivors, canon, on="doc_id").materialize()

    # 3b. (optional) benchmark decontamination: the benchmark slice is
    # drawn from the RAW corpus (an eval suite is external — it is not
    # subject to the training-data quality gates), and both it and
    # every survivor sharing an n-gram with it are anti-joined away
    if decontam_modulus is not None:
        def bench_rows(t: pa.Table) -> pa.Table:
            m = (t["doc_id"].to_numpy() % decontam_modulus) == 0
            return t.filter(pa.array(m))
        bench = docs.map_batches(bench_rows, batch_format="pyarrow")
        hits = decontaminate(survivors, bench, k=decontam_ngram) \
            .select_columns(["doc_id"])
        survivors = semi_join(survivors, hits, on="doc_id",
                              anti=True)
        survivors = survivors.map_batches(
            lambda t: t.filter(pa.array(
                (t["doc_id"].to_numpy() % decontam_modulus) != 0)),
            batch_format="pyarrow").materialize()

    # 4. near-dup among survivors: drop doc_b (the higher id) of each pair
    dropped = minhash_lsh_pairs(survivors, threshold=near_dup_threshold) \
        .select_columns(["doc_b"])

    out = semi_join(survivors, dropped, on="doc_id", right_on="doc_b",
                    anti=True)
    if sample_fraction is not None:
        out = out.random_sample(sample_fraction, seed=seed)
    if shuffle:
        # training-order decorrelation — the standard last step before
        # writing a pretraining shard
        out = out.random_shuffle(seed=seed)
    return out


def curation_report(sf_dir: str, **kwargs):
    """One-row summary: rows in/out per gate (rows-only oracle)."""
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id"])
    n_in = docs.count()
    out = curate(sf_dir, **kwargs)
    n_out = out.count()
    return pa.table({
        "n_input": pa.array([n_in], type=pa.int64()),
        "n_curated": pa.array([n_out], type=pa.int64()),
        "keep_rate": pa.array([round(n_out / max(1, n_in), 4)],
                              type=pa.float64()),
    })
