"""Text-analysis pipelines over ``documents``: token counting, quality
scoring, language-ID, document fingerprinting (SURVEY §2.8 scalar function
library + M16 signature analog)."""

from __future__ import annotations

import polars as pl
import pyarrow as pa

from spider_ray.kernels import tokens as tk
from spider_ray.pipelines.relational import _concat, _sorted
from spider_ray.sources.tables import read_table
from spider_ray.stages.agg import partial_final_agg


def q_token_stats(sf_dir: str) -> pa.Table:
    """Per-lang token statistics — whitespace tokens counted vectorized
    (polars count_matches of ``\\S+``), aggregated partial→final."""
    ds = read_table(sf_dir, "documents", columns=["lang", "text", "n_chars"])

    def partial(lf: pl.LazyFrame) -> pl.LazyFrame:
        return (
            lf.with_columns(n_tokens=pl.col("text").str.count_matches(r"\S+"))
            .group_by("lang")
            .agg(
                n_docs=pl.len(),
                total_tokens=pl.col("n_tokens").sum(),
                total_chars=pl.col("n_chars").sum(),
            )
        )

    def final(lf: pl.LazyFrame) -> pl.LazyFrame:
        return (
            lf.group_by("lang")
            .agg(
                n_docs=pl.col("n_docs").sum(),
                total_tokens=pl.col("total_tokens").sum(),
                avg_chars=pl.col("total_chars").sum() / pl.col("n_docs").sum(),
            )
            .sort("lang")
        )

    return partial_final_agg(ds, partial, final)


def q_bpe_token_count(sf_dir: str) -> pa.Table:
    """Global BPE-ish token count (letter runs / digit runs / single
    punctuation — TOKEN_RE), per source. Vectorized regex count per batch."""
    ds = read_table(sf_dir, "documents", columns=["source", "text"])

    def partial(lf: pl.LazyFrame) -> pl.LazyFrame:
        return (
            lf.with_columns(
                n_bpe=pl.col("text").str.count_matches(tk.TOKEN_RE.pattern)
            )
            .group_by("source")
            .agg(n_docs=pl.len(), bpe_tokens=pl.col("n_bpe").sum())
        )

    def final(lf: pl.LazyFrame) -> pl.LazyFrame:
        return (
            lf.group_by("source")
            .agg(
                n_docs=pl.col("n_docs").sum(),
                bpe_tokens=pl.col("bpe_tokens").sum(),
            )
            .sort("source")
        )

    return partial_final_agg(ds, partial, final)


def q_quality_scores(sf_dir: str) -> pa.Table:
    """Per-doc quality metrics (length / punct / digit ratios) — the
    worthless-page-classifier analog (M13) as vectorized columns."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        lf = pl.from_arrow(batch)
        out = lf.with_columns(
            n_chars=pl.col("text").str.len_chars().cast(pl.Int64),
            n_tokens=pl.col("text").str.count_matches(r"\S+").cast(pl.Int64),
            n_punct=pl.col("text").str.count_matches(r"[!-/:-@\[-`{-~]").cast(pl.Int64),
            n_digit=pl.col("text").str.count_matches(r"[0-9]").cast(pl.Int64),
        ).select(
            "doc_id",
            "n_chars",
            "n_tokens",
            punct_ratio=pl.col("n_punct") / pl.col("n_chars"),
            digit_ratio=pl.col("n_digit") / pl.col("n_chars"),
        )
        return out.to_arrow()

    t = _concat(ds.map_batches(score, batch_format="pyarrow"))
    return _sorted(t, "doc_id")


def q_langid(sf_dir: str) -> pa.Table:
    """Heuristic language ID per doc + agreement with the labeled lang.
    Non-SQL heuristic → rows-only driver check; determinism is the contract."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def predict(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        preds = [tk.detect_lang(t) for t in batch["text"].to_pylist()]
        labels = batch["lang"].to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "pred_lang": pa.array(preds, pa.string()),
                "agree": pa.array(
                    [p == l for p, l in zip(preds, labels)], pa.bool_()
                ),
            }
        )

    t = _concat(ds.map_batches(predict, batch_format="pyarrow"))
    return _sorted(t, "doc_id")


def q_fingerprints(sf_dir: str) -> pa.Table:
    """Winnowing rolling-hash fingerprint per doc (M16 signature analog).
    Non-SQL → rows-only check; stable across runs by construction."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        fps = [tk.doc_fingerprint(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "fingerprint": pa.array(fps, pa.uint64()),
            }
        )

    t = _concat(ds.map_batches(fp, batch_format="pyarrow"))
    return _sorted(t, "doc_id")


from spider_ray._serial import register_all as _register_all  # noqa: E402

_register_all()
