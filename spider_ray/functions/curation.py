"""Corpus-curation pipelines over ``documents`` — the remaining standard
stages of a large-scale training-data pipeline (per build brief): PII
redaction, benchmark decontamination, and repetition filtering (Gopher-style
rules, Rae et al. 2021, arXiv:2112.11446 §A1.1 — reimplemented from the
published description).

All three are SQL-oracled bit-exact: the PII patterns run on RE2 on BOTH
sides (pyarrow.compute and DuckDB), the decontamination joins on shingle
STRINGS, and the repetition metrics are integer counts with integer
cross-multiplied thresholds (no float round-trip).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from spider_ray.kernels import tokens as tk
from spider_ray.pipelines.relational import _concat, _sorted
from spider_ray.sources.tables import read_table

# RE2-compatible on both engines (pyarrow.compute and DuckDB); non-capturing
# groups so DuckDB's regexp_extract_all(s, pat) (group 0) counts full matches
EMAIL_PAT = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PHONE_PAT = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"
IP_PAT = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"

# deterministic PII augmentation (the synthetic corpus carries no PII, so
# the query plants some as a pure function of doc_id — replayed verbatim in
# the SQL oracle; see oracle_sql()["pii_redact"])
_AUG = (
    " contact user", "@example.com or call +1-555-", " from 10.", ".", ".7"
)


def _augment(batch: pa.Table) -> pa.ChunkedArray:
    ids = pc.cast(batch["doc_id"], pa.string())
    # pyarrow 16 ships no modulo kernel — numpy over the zero-copy int64
    # view, then one cast back to string per derived column
    idv = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    pad4 = pc.utf8_lpad(
        pc.cast(pa.array(idv % 10000, pa.int64()), pa.string()),
        width=4, padding="0",
    )
    m200 = pc.cast(pa.array(idv % 200, pa.int64()), pa.string())
    m250 = pc.cast(pa.array(idv % 250, pa.int64()), pa.string())
    # NB: binary_join_element_wise treats its LAST argument as the separator
    return pc.binary_join_element_wise(
        batch["text"], _AUG[0], ids, _AUG[1], pad4, _AUG[2], m200,
        _AUG[3], m250, _AUG[4], "",
    )


def q_pii_redact(sf_dir: str) -> pa.Table:
    """PII redaction (C4/RefinedWeb-style scrub): plant deterministic
    email/phone/IPv4 strings per doc, then count + redact them with
    compiled RE2 kernels — one fully vectorized ``map_batches`` pass
    (``pc.count_substring_regex`` + ``pc.replace_substring_regex``), no
    Python loop, no shuffle. Scale shape: embarrassingly parallel map."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def redact(batch: pa.Table) -> pa.Table:
        aug = _augment(batch)
        n_em = pc.count_substring_regex(aug, EMAIL_PAT)
        n_ph = pc.count_substring_regex(aug, PHONE_PAT)
        n_ip = pc.count_substring_regex(aug, IP_PAT)
        clean = pc.replace_substring_regex(aug, EMAIL_PAT, "<EMAIL>")
        clean = pc.replace_substring_regex(clean, PHONE_PAT, "<PHONE>")
        clean = pc.replace_substring_regex(clean, IP_PAT, "<IP>")
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "clean_text": clean,
                "n_emails": pc.cast(n_em, pa.int64()),
                "n_phones": pc.cast(n_ph, pa.int64()),
                "n_ips": pc.cast(n_ip, pa.int64()),
            }
        )

    return _sorted(_concat(ds.map_batches(redact, batch_format="pyarrow")),
                   "doc_id")


DECON_K = 4  # shingle width (words); 4 yields non-trivial overlap on the
# synthetic corpus at both test SFs (8/494 docs at sf0.01, 727/4948 at sf0.1)
DECON_BENCH_MOD = 97  # doc_id % 97 == 0 → the held-out "benchmark" docs


def q_decontaminate(sf_dir: str) -> pa.Table:
    """Benchmark decontamination (GPT-3/Pile-style): flag every training
    doc sharing a k-word shingle with the benchmark set. The benchmark side
    is SMALL BY CONSTRUCTION (the held-out eval set) → its distinct shingle
    set is broadcast once via ``ray.put`` and each streamed train batch
    membership-tests against it — no shuffle, no driver pass over the
    corpus. At a benchmark too big for an in-memory string set, swap in the
    64-bit shingle hashes + mergeable Bloom with exact verify on positives
    (q_bloom_anti_join's machinery). Returns (doc_id, n_shared) for
    contaminated train docs; n_shared counts DISTINCT shared shingles."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def bench_only(batch: pa.Table) -> pa.Table:
        idv = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(idv % DECON_BENCH_MOD == 0))

    bench_parts = ray.get(
        ds.map_batches(bench_only, batch_format="pyarrow")
        .materialize().to_arrow_refs()
    )
    bench_set: set[str] = set()
    for t in bench_parts:
        if t.num_rows == 0:  # empty blocks may carry an empty schema
            continue
        for txt in t["text"].to_pylist():
            bench_set.update(tk.word_shingles(txt, DECON_K))
    bench_ref = ray.put(frozenset(bench_set))

    def contaminated(batch: pa.Table) -> pa.Table:
        bset = ray.get(bench_ref)
        ids = batch["doc_id"].to_pylist()
        out_id, out_n = [], []
        for i, txt in enumerate(batch["text"].to_pylist()):
            if ids[i] % DECON_BENCH_MOD == 0:
                continue
            n = sum(1 for s in tk.word_shingles(txt, DECON_K) if s in bset)
            if n:
                out_id.append(ids[i])
                out_n.append(n)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_shared": pa.array(out_n, pa.int64()),
            }
        )

    return _sorted(
        _concat(ds.map_batches(contaminated, batch_format="pyarrow")),
        "doc_id",
    )


def q_repetition_filter(sf_dir: str) -> pa.Table:
    """Gopher-style repetition gate: per-doc duplicate-word and top-bigram
    concentration, kept as INTEGER counts (float fractions don't survive a
    dtype-strict hash compare) with the thresholds applied by integer
    cross-multiplication: flagged ⇔ top bigram > 20% of bigrams OR distinct
    words < 50% of words. One streamed map pass, no shuffle."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        n_words, n_dist, top_bg, n_bg = [], [], [], []
        for txt in batch["text"].to_pylist():
            w = tk.ws_tokens(txt)
            n_words.append(len(w))
            n_dist.append(len(set(w)))
            if len(w) >= 2:
                from collections import Counter

                c = Counter(zip(w, w[1:]))
                top_bg.append(max(c.values()))
                n_bg.append(len(w) - 1)
            else:
                top_bg.append(0)
                n_bg.append(0)
        nw = np.asarray(n_words, dtype=np.int64)
        nd = np.asarray(n_dist, dtype=np.int64)
        tb = np.asarray(top_bg, dtype=np.int64)
        nb = np.asarray(n_bg, dtype=np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(nw, pa.int64()),
                "n_distinct_words": pa.array(nd, pa.int64()),
                "top_bigram_n": pa.array(tb, pa.int64()),
                "n_bigrams": pa.array(nb, pa.int64()),
                "flagged": pa.array((tb * 5 > nb) | (nd * 2 < nw)),
            }
        )

    return _sorted(_concat(ds.map_batches(stats, batch_format="pyarrow")),
                   "doc_id")
