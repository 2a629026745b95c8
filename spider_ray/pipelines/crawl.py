"""The Ray-Data-native crawl loop (north rule).

Per generation (G2 loop semantics, SURVEY §3.3 — frontier[g] → schedule →
fetch → extract → frontier[g+1]):

1. candidates (arrow) → ``ray.data`` ``map_batches(normalize)`` — stateless
   canonicalize/rules/robots/bands stage, robots table broadcast via
   ``ray.put``;
2. ``groupby(shard).map_groups`` routes each shard's rows to its
   ``ShardActor`` (named raw actor: the one shared-mutable-state piece the
   Dataset API can't express) which admits against its cuckoo seen-set and
   runs the politeness DES → returns timed fetch permits;
3. permits → ``ds.sort`` by the global crawl-order key (the wave's wide
   shuffle) → ``map_batches(FetchWorker, concurrency=N)`` actor pool holding
   the warm WebIndex — fetch-sim + image decode/recompress/phash;
4. fetch output materialized to per-(gen) parquet sinks: status, images
   (after shard-actor first-wins dedup), next-gen candidates
   (retries + extracted outlinks);
5. checkpoint per (gen, shard): scheduler state pickle + ``_DONE`` marker +
   metrics rows → a killed run resumes at the last complete generation
   without re-fetching (fetch lookups are counted to prove it).

The wave flows by OBJECT-STORE BLOCK REFS end to end: candidates enter as
block refs, permits come back from the shard actors as per-shard Arrow table
refs, big waves sort distributed (ray.data over those refs), fetched blocks
stay in the object store, and every sink (status / images / next-candidates /
seen) streams one small derived block at a time through a ParquetWriter —
driver RSS is bounded by a single block regardless of wave or frontier size.
Small waves (≤ DS_SORT_THRESHOLD permits) take a driver-side shortcut for the
permit sort only; both paths produce byte-identical output
(test_distributed_sort_path_identical forces the refs path).
"""

from __future__ import annotations

import os
import pickle
import shutil

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from spider_ray.kernels.hashing import hash64
from spider_ray.pipelines.oracle import (
    load_corpus,
    load_corpus_control,
    load_corpus_shard,
    permit_sort_key,
)
from spider_ray.stages.fetchsim import (
    WebIndex,
    fetch_one,
    process_image,
    result_to_rows,
)
from spider_ray.stages.normalize import normalize_batch, shard_meta
from spider_ray.state.load_controller import LoadOptions
from spider_ray.state.scheduler import FetchPermit, ShardScheduler

MAX_GENS = 8


def _driver_rss_kb() -> int:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1])
    except OSError:
        pass
    return 0

PERMIT_SCHEMA = pa.schema(
    [
        ("fetch_ts", pa.int64()),
        ("url", pa.string()),
        ("url_hash", pa.uint64()),
        ("host", pa.string()),
        ("priority", pa.int16()),
        ("gen", pa.int32()),
        ("seq", pa.int64()),
        ("depth", pa.int16()),
        ("tried", pa.int16()),
        ("referer", pa.string()),
        ("dedup_hits", pa.int64()),
        ("shard", pa.int32()),
    ]
)


@ray.remote
class ShardActor:
    """Owns one ShardScheduler — cuckoo seen-set, politeness state, clock."""

    def __init__(self, shard_id, num_shards, load_rows, options_dict,
                 corpus_dir, hot_hosts=(), seen_capacity=1 << 18):
        options = LoadOptions(**options_dict) if options_dict else None
        self.sched = ShardScheduler(
            shard_id, num_shards, load_rows, options,
            seen_capacity=seen_capacity,
        )
        # this shard's slice of the fetch-completion metadata, derived from
        # the actor's own pruned parquet read — the driver never holds the
        # O(corpus) dict (r2 verdict item 4)
        self.meta = shard_meta(
            corpus_dir, shard_id, num_shards, tuple(hot_hosts)
        )

    def schedule(self, rows: list[dict], wave_start: int) -> dict:
        rows = sorted(rows, key=lambda r: r["seq"])
        accepted, hits = self.sched.admit(rows)
        permits = self.sched.run_wave(accepted, wave_start, self.meta)
        self._permits = permits
        self._dedup_hits = hits
        return {
            "dedup_hits": hits,
            "candidates": len(rows),
            "scheduled": len(permits),
            "top_host": getattr(self.sched, "last_top_host", ""),
            "top_host_n": getattr(self.sched, "last_top_host_n", 0),
        }

    def take_permits(self) -> pa.Table:
        """This wave's permits as one Arrow table (the actor's shard slice).
        Returned as a separate remote call so the driver can hold only the
        ObjectRef and feed it straight into the permit sort / fetch stage —
        permits never materialize driver-side."""
        permits = getattr(self, "_permits", [])
        self._permits = []
        rows = [
            {
                **p.__dict__,
                "dedup_hits": self._dedup_hits,
                "shard": self.sched.shard_id,
            }
            for p in permits
        ]
        return pa.Table.from_pylist(rows, schema=PERMIT_SCHEMA)

    def enqueue(self, table: pa.Table) -> int:
        """Streamed routing: map_batches tasks push this shard's rows here
        as zero-copy Arrow tables; order is restored by seq at
        schedule_wave time."""
        self._buf = getattr(self, "_buf", [])
        self._buf.append(table)
        return len(self._buf)

    def schedule_wave(self, wave_start: int) -> dict:
        tables = getattr(self, "_buf", [])
        self._buf = []
        # arrow-kernel sort by seq BEFORE the one unavoidable to_pylist
        # (the DES consumes per-row dicts); schedule()'s python sort then
        # sees already-ordered input (Timsort O(n))
        rows = (
            pa.concat_tables(tables, promote_options="default")
            .sort_by("seq")
            .to_pylist()
            if tables
            else []
        )
        out = self.schedule(rows, wave_start)
        out["fp_audit"] = self.sched.fp_audit
        out["seen_size"] = self.sched.seen.size
        out["clock"] = self.sched.clock
        # cumulative cuckoo insert failures (filter saturation) — nonzero
        # means seen_capacity is undersized and exactly-once is degraded
        out["cuckoo_add_failures"] = (
            self.sched.seen_add_failures + self.sched.image_add_failures
        )
        return out

    def admit_images(self, hashes: list[int]) -> list[bool]:
        return self.sched.admit_images(np.array(hashes, dtype=np.uint64)).tolist()

    def clock(self) -> int:
        return self.sched.clock

    def state_dict(self) -> bytes:
        return pickle.dumps(self.sched.state_dict())

    def load_state(self, blob: bytes) -> None:
        self.sched = ShardScheduler.from_state_dict(pickle.loads(blob))

    def seen_rows(self) -> list[tuple]:
        return self.sched.seen_urls

    def seen_count(self) -> int:
        return len(self.sched.seen_urls)

    def seen_table(self) -> pa.Table:
        """This shard's seen set as one Arrow table (with the
        order-preserving int64 ``sort_key`` for the distributed sort)."""
        rows = self.sched.seen_urls
        uh = np.array([r[0] for r in rows], dtype=np.uint64)
        return pa.table(
            {
                "url_hash": pa.array(uh, pa.uint64()),
                "url": pa.array([r[1] for r in rows], pa.string()),
                "first_gen": pa.array(
                    [r[2] for r in rows], pa.int32()
                ),
                "sort_key": pa.array(
                    (uh ^ np.uint64(1 << 63)).view(np.int64), pa.int64()
                ),
            }
        )


class FetchWorker:
    """Actor-pool fetch + decode stage: WebIndex built once per actor in
    ``__init__`` (T6 warm state), per-batch work is fetch-sim + image
    decode/recompress/phash.

    With ``num_owners > 1`` (the crawl loop's fetch pool) each actor
    holds only its SLICE of the simulated web — pages by URL hash
    (NOT host hash: fetch-sim is per-URL pure and URL hashing stays
    balanced under hot hosts), image payloads by image_id hash
    (``oracle.load_corpus_shard``) — so per-actor RSS is
    O(corpus / pool) instead of O(corpus). The wave dispatch routes
    permits and image refs to the owning actor BY THE SAME KEYS
    (hash64(url) / hash64(image_id) mod pool — the dispatch key and the
    slice predicate must stay aligned or lookups silently 404) and
    reassembles results in original order (``_fetch_window_sharded`` /
    ``_process_refs_window_sharded``). ``num_owners == 1`` keeps the
    full index (the single-actor / test construction)."""

    def __init__(
        self,
        corpus_dir: str,
        owner: int = 0,
        num_owners: int = 1,
        parse_html: bool = False,
    ):
        if num_owners <= 1:
            c = load_corpus(corpus_dir, parse_html=parse_html)
            self.index = WebIndex(
                c["pages"], c["images"], parse_html=parse_html
            )
        else:
            c = load_corpus_shard(
                corpus_dir, owner, num_owners, parse_html=parse_html
            )
            self.index = WebIndex(
                c["pages"],
                c["images"],
                image_members=c["image_members"],
                parse_html=parse_html,
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        # The per-URL fetch_one() call is the per-row DES/fetch contract and
        # stays a loop; everything the permit merely passes through stays
        # COLUMNAR (zero-copy from the input batch) — only the fetch RESULT
        # fields are accumulated row-wise.
        fetch_ts = batch["fetch_ts"].to_pylist()
        urls = batch["url"].to_pylist()
        url_hash = batch["url_hash"].to_pylist()
        hosts = batch["host"].to_pylist()
        prio = batch["priority"].to_pylist()
        gens = batch["gen"].to_pylist()
        seqs = batch["seq"].to_pylist()
        depths = batch["depth"].to_pylist()
        trieds = batch["tried"].to_pylist()
        referers = batch["referer"].to_pylist()
        status, eff, retry, viap, outlinks, images = [], [], [], [], [], []
        for i in range(batch.num_rows):
            p = FetchPermit(
                fetch_ts=fetch_ts[i], url=urls[i], url_hash=url_hash[i],
                host=hosts[i], priority=prio[i], gen=gens[i],
                seq=seqs[i], depth=depths[i], tried=trieds[i],
                referer=referers[i],
            )
            res = fetch_one(p, self.index)
            status.append(res.status)
            eff.append(res.effective_url)
            retry.append(res.retry)
            viap.append(res.via_proxy)
            outlinks.append(
                [{"url": o["url"], "depth": o["depth"]} for o in res.outlink_rows]
            )
            images.append(res.image_rows)
        return pa.table(
            {
                "url": batch["url"].cast(pa.string()),
                "host": batch["host"].cast(pa.string()),
                "fetch_ts": batch["fetch_ts"].cast(pa.int64()),
                "gen": batch["gen"].cast(pa.int32()),
                "seq": batch["seq"].cast(pa.int64()),
                "priority": batch["priority"].cast(pa.int16()),
                "depth": batch["depth"].cast(pa.int16()),
                "tried": batch["tried"].cast(pa.int16()),
                "referer": batch["referer"].cast(pa.string()),
                "status": pa.array(status, pa.int32()),
                "effective_url": pa.array(eff, pa.string()),
                "retry": pa.array(retry, pa.bool_()),
                "via_proxy": pa.array(viap, pa.string()),
                "outlinks": pa.array(
                    outlinks,
                    pa.list_(pa.struct([("url", pa.string()), ("depth", pa.int64())])),
                ),
                "images": pa.array(
                    images,
                    pa.list_(
                        pa.struct(
                            [("image_id", pa.string()), ("alt", pa.string())]
                        )
                    ),
                ),
            }
        )


IMAGE_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int64()),
        ("h", pa.int64()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
        ("dims_ok", pa.bool_()),
        ("first_gen", pa.int32()),
    ]
)

SEEN_SCHEMA = pa.schema(
    [
        ("url_hash", pa.uint64()),
        ("url", pa.string()),
        ("first_gen", pa.int32()),
    ]
)

# FetchWorker output minus the two list columns — the per-gen status sink
STATUS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("fetch_ts", pa.int64()),
        ("gen", pa.int32()),
        ("seq", pa.int64()),
        ("priority", pa.int16()),
        ("depth", pa.int16()),
        ("tried", pa.int16()),
        ("referer", pa.string()),
        ("status", pa.int32()),
        ("effective_url", pa.string()),
        ("retry", pa.bool_()),
        ("via_proxy", pa.string()),
    ]
)


class _FetchActorImpl(FetchWorker):
    def fetch_batch(self, batch: pa.Table) -> pa.Table:
        return self(batch)

    def process_refs(self, refs: list[dict], gen: int) -> pa.Table:
        """Decode/recompress/phash the deduped image refs (post-dedup only —
        each unique image is processed exactly once per run)."""
        rows = [
            {**process_image(self.index.images[r["image_id"]], r["alt"]),
             "first_gen": gen}
            for r in refs
            if r["image_id"] in self.index.images
        ]
        return pa.Table.from_pylist(rows, schema=IMAGE_SCHEMA)

    def index_stats(self) -> dict:
        """Per-actor slice footprint — the scale-evidence counter behind
        the sharded-WebIndex stress (BASELINE §: per-actor RSS must be
        O(corpus / pool), not O(corpus))."""
        import resource

        return {
            "pages": len(self.index.pages),
            "images": len(self.index.images),
            "image_payload_bytes": sum(
                len(r["bytes"]) for r in self.index.images.values()
            ),
            "maxrss_kb": resource.getrusage(resource.RUSAGE_SELF).ru_maxrss,
        }

    def process_refs_pos(
        self, refs: list[dict], gen: int, positions: list[int]
    ) -> tuple[pa.Table, list[int]]:
        """:meth:`process_refs` plus the surviving original positions, so
        the sharded dispatch (``_process_refs_sharded``) can reassemble
        the per-owner results into the caller's original ref order."""
        rows, kept = [], []
        for r, p in zip(refs, positions):
            row = self.index.images.get(r["image_id"])
            if row is not None:
                rows.append(
                    {**process_image(row, r["alt"]), "first_gen": gen}
                )
                kept.append(p)
        return pa.Table.from_pylist(rows, schema=IMAGE_SCHEMA), kept


# Dispatch shims for the SHARDED fetch pool: pure reassembly — results are
# bit-identical to sending the whole block to one full-index actor, because
# fetch-sim rows are pure per-permit functions and take() restores the
# caller's row order. WINDOWED on purpose: one shim task routes a GROUP of
# blocks with exactly |pool| batched sub-calls and hands back per-block
# results via num_returns — per-block × per-owner fan-out (measured 24×
# dispatch slowdown: a 0-cpu worker spawn per chunk plus F tiny RPCs each)
# never happens. num_cpus=0: the shim only splits, awaits and concatenates.

DISPATCH_WINDOW = 16  # blocks routed per shim task


@ray.remote(num_cpus=0)
def _fetch_window_sharded(pool: list, *blocks: pa.Table):
    t = pa.concat_tables(blocks, promote_options="default")
    if t.num_rows == 0:
        # a window of all-empty blocks (range-partition sorts emit empty
        # blocks under heavy key concentration, e.g. hot-host runs):
        # np.concatenate/pa.concat_tables over zero owner groups would
        # raise — produce correctly-schema'd empty fetch outputs instead
        empty = ray.get(pool[0].fetch_batch.remote(t))
        return (
            empty
            if len(blocks) == 1
            else tuple(empty.slice(0, 0) for _ in blocks)
        )
    owners = (
        hash64(t["url"]) % np.uint64(len(pool))
    ).astype(np.int64)
    futs, idxs = [], []
    for o in np.unique(owners):
        ix = np.flatnonzero(owners == o)
        futs.append(pool[int(o)].fetch_batch.remote(t.take(ix)))
        idxs.append(ix)
    parts = ray.get(futs)
    order = np.argsort(np.concatenate(idxs), kind="stable")
    merged = pa.concat_tables(parts, promote_options="default").take(order)
    out, off = [], 0
    for b in blocks:
        out.append(merged.slice(off, b.num_rows))
        off += b.num_rows
    return out[0] if len(out) == 1 else tuple(out)


@ray.remote(num_cpus=0)
def _process_refs_window_sharded(pool: list, gen: int, *ref_lists):
    def empties():
        e = pa.Table.from_pylist([], schema=IMAGE_SCHEMA)
        return e if len(ref_lists) == 1 else tuple(e for _ in ref_lists)

    flat = [r for lst in ref_lists for r in lst]
    if not flat:
        return empties()
    owners = (
        hash64([r["image_id"] for r in flat]) % np.uint64(len(pool))
    ).astype(np.int64)
    futs = []
    for o in np.unique(owners):
        ix = np.flatnonzero(owners == o)
        futs.append(
            pool[int(o)].process_refs_pos.remote(
                [flat[i] for i in ix], gen, [int(i) for i in ix]
            )
        )
    parts = ray.get(futs)
    pos = np.concatenate(
        [np.asarray(k, dtype=np.int64) for _, k in parts]
    )
    order = np.argsort(pos, kind="stable")
    merged = pa.concat_tables(
        [t for t, _ in parts], promote_options="default"
    ).take(order)
    pos_sorted = pos[order]
    bounds = np.cumsum([len(lst) for lst in ref_lists])
    cuts = np.searchsorted(pos_sorted, bounds, side="left")
    out, prev = [], 0
    for c in cuts:
        out.append(merged.slice(prev, int(c) - prev))
        prev = int(c)
    return out[0] if len(out) == 1 else tuple(out)


def _submit_windowed(task, head_args: tuple, items: list) -> list:
    """Submit ``items`` through ``task`` in DISPATCH_WINDOW groups with
    ``num_returns`` matching the group size; returns one ObjectRef per
    item, in item order."""
    refs: list = []
    for i in range(0, len(items), DISPATCH_WINDOW):
        grp = items[i : i + DISPATCH_WINDOW]
        r = task.options(num_returns=len(grp)).remote(*head_args, *grp)
        refs.extend([r] if len(grp) == 1 else r)
    return refs


# Fetch actors are deterministic and stateless across calls (the WebIndex
# is rebuilt in __init__), so Ray may transparently restart one that dies
# and retry its in-flight batch — fetch-sim results are pure functions of
# the permit row. ShardActor deliberately has NO restarts: its scheduler
# state is only valid as of the last per-gen checkpoint, so a mid-wave
# death must fail the run loudly and be recovered via run_crawl(resume=True)
# from the last _DONE generation (never silently with empty state).
FetchActorCls = ray.remote(max_restarts=2, max_task_retries=2)(
    _FetchActorImpl
)


def _seeds_candidates(seeds: pa.Table) -> pa.Table:
    return pa.table(
        {
            "url": seeds["url"],
            "depth": seeds["depth"],
            "tried": pa.array([0] * seeds.num_rows, pa.int16()),
            "priority": seeds["priority"],
            "referer": seeds["referer"],
        }
    )


def _with_seq(t: pa.Table) -> pa.Table:
    if "seq" in t.column_names:
        return t
    return t.append_column("seq", pa.array(np.arange(t.num_rows), pa.int64()))


def _chunks(t: pa.Table, rows_per_chunk: int) -> list[pa.Table]:
    if t.num_rows <= rows_per_chunk:
        return [t]
    return [
        t.slice(i, rows_per_chunk) for i in range(0, t.num_rows, rows_per_chunk)
    ]


CANDIDATE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("depth", pa.int16()),
        ("tried", pa.int16()),
        ("priority", pa.int16()),
        ("referer", pa.string()),
    ]
)

SORT_KEYS = [("fetch_ts", "ascending"), ("priority", "ascending"),
             ("gen", "ascending"), ("seq", "ascending"), ("host", "ascending")]
DS_SORT_THRESHOLD = 200_000  # permits above this use a distributed ds.sort


SINK_ROLL_BYTES = 128 << 20  # roll per-gen sink files past ~128 MB


class RollingWriter:
    """Single-logical-stream parquet sink that ROLLS to a new part file
    once the current one passes ``roll_bytes`` — the resumable-output rule
    ("never one giant file"): ``<base>.parquet`` then
    ``<base>.part00001.parquet``, … ``read_sink`` orders parts by PARSED
    index (not lexicographically), so the stream order survives any part
    count. At demo scale everything lands in the single base file, so
    small-corpus readers and old outputs are untouched."""

    def __init__(self, dir_: str, base: str,
                 roll_bytes: int | None = None):
        self.dir = dir_
        self.base = base
        # resolved at call time so tests can lower the module constant
        self.roll_bytes = (
            roll_bytes if roll_bytes is not None else SINK_ROLL_BYTES
        )
        self.writer = None
        self.part = 0
        self.cur_bytes = 0
        self.n_rows = 0

    def _path(self) -> str:
        if self.part == 0:
            return os.path.join(self.dir, f"{self.base}.parquet")
        return os.path.join(
            self.dir, f"{self.base}.part{self.part:05d}.parquet"
        )

    def write(self, t: pa.Table) -> None:
        if t.num_rows == 0:
            return
        if self.writer is not None and self.cur_bytes >= self.roll_bytes:
            self.writer.close()
            self.writer = None
            self.part += 1
            self.cur_bytes = 0
        if self.writer is None:
            self.writer = pq.ParquetWriter(self._path(), t.schema)
        self.writer.write_table(t)
        self.cur_bytes += t.nbytes
        self.n_rows += t.num_rows

    def close(self, empty_schema: pa.Schema) -> None:
        if self.writer is None:
            pq.write_table(
                pa.Table.from_pylist([], schema=empty_schema), self._path()
            )
        else:
            self.writer.close()


def read_sink(dir_: str, base: str) -> pa.Table:
    """Read one logical sink stream back (base file + rolled parts, in
    STREAM order — parts sort numerically by parsed index, so the order
    holds no matter how many digits a part number grows to)."""
    import glob as _glob
    import re as _re

    name = base[: -len(".parquet")] if base.endswith(".parquet") else base
    part_re = _re.compile(
        _re.escape(name) + r"\.part(\d+)\.parquet$"
    )

    def _order(p: str) -> int:
        m = part_re.search(os.path.basename(p))
        return int(m.group(1)) if m else 0  # base file = part 0

    paths = sorted(
        _glob.glob(os.path.join(dir_, f"{name}*.parquet")), key=_order
    )
    return pa.concat_tables(
        [pq.read_table(p) for p in paths], promote_options="default"
    )


# --- per-block derivative tasks (refs-mode wave flow) -----------------------
# Each takes an ObjectRef of a fetched block and returns a SMALL derived
# table; the heavy fetched block itself never lands on the driver.


@ray.remote
def _apply_result_handler(handler, block: pa.Table) -> pa.Table:
    """User extension seam — the CrawlTaskHandler analog (reference
    crawler.h:29-35, wired in crawler_main.cc:65-75): a pluggable callable
    applied to every fetched block BEFORE the status/image/candidate
    derivations, running distributed (one remote task per block; the handler
    is ``ray.put`` once and dereferenced per task, never re-shipped per
    batch). The handler may filter rows, rewrite values, or append columns
    (appended columns flow into the status sink); it must preserve the
    FetchWorker output columns the downstream derivations read."""
    out = handler(block)
    missing = [c for c in block.column_names if c not in out.column_names]
    if missing:
        raise ValueError(
            f"result_handler dropped required fetched-block columns {missing}"
        )
    return out


@ray.remote
def _block_status(block: pa.Table) -> pa.Table:
    return block.drop_columns(["outlinks", "images"])


@ray.remote
def _block_image_refs(block: pa.Table) -> pa.Table:
    """(image_id, alt) refs of one fetched block — global crawl order and
    in-page order preserved (polars explode keeps both)."""
    df = (
        pl.from_arrow(block.select(["images"]))
        .explode("images")
        .drop_nulls("images")
        .unnest("images")
    )
    return df.to_arrow()


@ray.remote(num_returns=2)
def _block_candidates(block: pa.Table):
    """One fetched block → (retry candidates, outlink candidates), both in
    crawl order. The wave-level candidate sequence is ALL retries (block
    order) then ALL outlinks (block order) — the seq-assignment seam the
    oracle shares."""
    fdf = pl.from_arrow(block)
    retries = fdf.filter(pl.col("retry")).select(
        pl.col("url"),
        pl.col("depth").cast(pl.Int16),
        (pl.col("tried") + 1).cast(pl.Int16).alias("tried"),
        pl.col("priority").cast(pl.Int16),
        pl.col("referer"),
    )
    outlinks = (
        fdf.select(pl.col("effective_url"), pl.col("outlinks"))
        .explode("outlinks")
        .drop_nulls("outlinks")
        .unnest("outlinks")
        .select(
            pl.col("url"),
            pl.col("depth").cast(pl.Int16),
            pl.lit(0, dtype=pl.Int16).alias("tried"),
            pl.lit(None, dtype=pl.Int16).alias("priority"),
            pl.col("effective_url").alias("referer"),
        )
    )
    return (
        retries.to_arrow().cast(CANDIDATE_SCHEMA),
        outlinks.to_arrow().cast(CANDIDATE_SCHEMA),
    )


def run_crawl(
    corpus_dir: str,
    out_dir: str,
    num_shards: int = 4,
    max_gens: int = MAX_GENS,
    options: LoadOptions | None = None,
    fetch_concurrency: int = 4,
    resume: bool = False,
    seen_capacity: int = 1 << 18,
    hot_hosts: tuple[str, ...] = (),
    host_ips: dict[str, list[str]] | None = None,
    hot_ips: tuple[str, ...] = (),
    result_handler=None,
    sitemap_seeds: bool = False,
    parse_html: bool = False,
) -> dict:
    """Run (or resume) the crawl; writes per-gen parquet sinks under
    ``out_dir`` and returns summary paths + counters.

    ``result_handler`` is the user-extension seam (§2.10; reference
    ``CrawlTaskHandler``, crawler.h:29-35): an optional picklable callable
    ``pa.Table -> pa.Table`` applied to every fetched block, distributed,
    before the status / image / candidate derivations (see
    ``_apply_result_handler``). ``None`` (default) keeps the engine's exact
    oracle-parity behavior; a handler that filters rows or rewrites
    outlink/retry columns deliberately changes the downstream crawl — that
    is the point of the hook, and it is the caller's contract.

    ``hot_ips`` is the IP-level diversion valve (J4,
    ip_url_split.cc:21,85-97): every host whose resolved IP (per
    ``host_ips``) is hot gets the SAME dedicated-shard treatment as an
    explicit hot host — its politeness budget owns one proxy-flagged
    partition and stops competing with hash-assigned hosts. The derivation
    is deterministic (sorted host walk), so it is a parity seam shared with
    the oracle, which receives the derived host set."""
    import json

    if hot_ips:
        if not host_ips:
            raise ValueError("hot_ips requires a host_ips resolution table")
        derived = tuple(
            h
            for h in sorted(host_ips)
            if any(ip in hot_ips for ip in host_ips[h])
            and h not in hot_hosts
        )
        hot_hosts = tuple(hot_hosts) + derived

    os.makedirs(out_dir, exist_ok=True)
    if not resume:
        stale = [
            d for d in os.listdir(out_dir) if d.startswith("gen=")
        ]
        if stale:
            # a fresh run must own the whole out_dir: a COMPLETED old gen
            # (with _DONE) survives the per-gen markerless cleanup below,
            # and its extra rolled sink parts would be concatenated by
            # read_sink alongside the new run's output (double-count)
            raise ValueError(
                f"out_dir {out_dir} already holds generations "
                f"({sorted(stale)[:3]}…); pass resume=True to continue "
                "that run, or point a fresh run at an empty directory"
            )
        # NOTE: a pre-existing control.json is deliberately honored by a
        # fresh run — it is a live control channel (T8 zk-watch analog),
        # and pre-seeding directives (pause, stop_after_gen,
        # fetch_concurrency) before launch is part of its contract
        # (test_dynamic_control_stop_and_resume does exactly that)
    # pin the run's sharding topology: shard assignment (num_shards,
    # hot_hosts) and seen-set sizing are part of the checkpointed state —
    # a resume under a DIFFERENT topology would silently re-route hosts
    # away from the actors holding their politeness/seen state
    cfg_path = os.path.join(out_dir, "run_config.json")
    # hash-provider canary: checkpoints persist hash64 outputs (cuckoo
    # fingerprints, exact_seen keys, url_hash), but the polars xxhash
    # kernel only guarantees determinism within one environment. A resume
    # under a polars build that hashes differently would silently miss
    # every restored seen key and re-fetch the whole history — reject it
    # loudly instead by pinning a canary hash at run start.
    canary = int(hash64(["spider-ray-hash-canary-v1"])[0])
    cfg = {
        "num_shards": num_shards,
        "hot_hosts": list(hot_hosts),
        "seen_capacity": seen_capacity,
        "sitemap_seeds": bool(sitemap_seeds),
        "hash_canary": canary,
    }
    if resume and os.path.exists(cfg_path):
        with open(cfg_path) as f:
            stored = json.load(f)
        if stored.get("hash_canary", canary) != canary:
            raise ValueError(
                "resume hash-provider mismatch: the checkpointed run's "
                f"hash64 canary {stored['hash_canary']} != this "
                f"environment's {canary} (different polars build?); the "
                "persisted seen-set/url_hash values are not comparable — "
                "resume on the original environment or restart the crawl"
            )
        # checkpoints written before sitemap_seeds existed lack the key;
        # those runs were necessarily started without sitemap seeding, so
        # default it rather than failing the whole-dict comparison
        stored.setdefault("sitemap_seeds", False)
        topo = {k: v for k, v in cfg.items() if k != "hash_canary"}
        stored_topo = {k: v for k, v in stored.items() if k != "hash_canary"}
        if stored_topo != topo:
            raise ValueError(
                f"resume topology mismatch: run was started with "
                f"{stored_topo}, resume requested {topo}; pass identical "
                "num_shards / hot_hosts / seen_capacity (they shard the "
                "checkpointed scheduler state)"
            )
    else:
        with open(cfg_path, "w") as f:
            json.dump(cfg, f)
    c = load_corpus_control(corpus_dir)
    if sitemap_seeds:
        # sitemap-driven frontier seeding (robots Sitemap: directives →
        # urlset/<sitemapindex> mining): the DISTRIBUTED discovery chain
        # (functions/sitemap.py) appends its candidates to the seed
        # frontier in deterministic (host, url) order; unknown (fresh)
        # URLs 404-terminate like any dead link, already-crawled ones
        # dedup through the canonicalize+seen pass. The oracle runs an
        # independent single-process discovery (oracle.sitemap_seed_urls)
        # — crawl parity under this flag tests the whole chain.
        from spider_ray.functions.sitemap import (
            augment_seeds,
            sitemap_candidates,
        )

        c["seeds"] = augment_seeds(
            c["seeds"], sitemap_candidates(corpus_dir)["url"].to_pylist()
        )
    # robots Crawl-delay → per-host QPS caps (shared derivation with the
    # oracle: politeness parity by construction)
    from spider_ray.state.load_controller import apply_crawl_delays

    c["load_rows"] = apply_crawl_delays(c["load_rows"], c["robots"], options)
    robots_ref = ray.put(c["robots"])
    # put the user handler once; every per-block task derefs the same object
    handler_ref = ray.put(result_handler) if result_handler is not None else None
    options_dict = (options or LoadOptions()).__dict__

    # size the per-shard cuckoo to the expected URL population: checkpoint
    # size is proportional (2 filters x 2B/slot), so oversizing inflates
    # per-gen checkpoint writes
    actors = [
        ShardActor.remote(
            s, num_shards, c["load_rows"], options_dict, corpus_dir,
            hot_hosts=tuple(hot_hosts), seen_capacity=seen_capacity,
        )
        for s in range(num_shards)
    ]
    # persistent fetch actor pool: each actor builds ITS SLICE of the
    # WebIndex once in __init__ (pages by URL hash — the same predicate
    # load_corpus_shard and the dispatch key use; NOT host hash — and
    # image payloads by image_id hash) and keeps it across every
    # generation of this run —
    # per-actor RSS is O(corpus / pool), not O(corpus)
    # parse_html (opt-in M8-over-bytes mode) is NOT a topology key: it is
    # byte-equal to table mode on round-trip corpora (pinned by test), so
    # a resume may toggle it freely — the checkpointed scheduler state is
    # unaffected.
    fetch_pool = [
        FetchActorCls.remote(corpus_dir, i, fetch_concurrency, parse_html)
        for i in range(fetch_concurrency)
    ]

    # everything from here on runs against live actors; ANY exit path —
    # success, mid-wave actor death, a driver exception — must tear the
    # fleet down, or each failed attempt leaks num_shards + fetch_pool
    # actors (each holding O(seen) / WebIndex state) into the session
    try:
        def _as_blocks(t: pa.Table) -> tuple[list, int]:
            """Chunk a candidate table into object-store block refs — from here
            on the wave flows by refs."""
            return [ray.put(ch) for ch in _chunks(t, 4096)], t.num_rows

        start_gen = 0
        cand_blocks, cand_count = _as_blocks(_with_seq(_seeds_candidates(c["seeds"])))
        wave_start = 0
        if resume:
            done_gens = sorted(
                int(d.split("=")[1])
                for d in os.listdir(out_dir)
                if d.startswith("gen=")
                and os.path.exists(os.path.join(out_dir, d, "_DONE"))
            )
            if done_gens:
                g = done_gens[-1]
                ck = os.path.join(out_dir, f"gen={g}", "ckpt")
                for s, a in enumerate(actors):
                    with open(os.path.join(ck, f"shard_{s}.pkl"), "rb") as f:
                        ray.get(a.load_state.remote(f.read()))
                cand_blocks, cand_count = _as_blocks(
                    read_sink(os.path.join(out_dir, f"gen={g}"), "next_candidates")
                )
                with open(os.path.join(ck, "wave_start.txt")) as f:
                    wave_start = int(f.read())
                start_gen = g + 1

        # T8 dynamic-config watch (zk-watch analog, job_manager.cc:191-237):
        # `control.json` in out_dir is re-read at every generation boundary.
        # Hot-swappable mid-run: pause, graceful stop_after_gen (resumable —
        # the normal resume path continues the crawl), fetch_concurrency
        # (fetch actors are stateless, so the pool resizes freely). Politeness
        # / sharding knobs are deliberately NOT hot-swappable — they shard the
        # checkpointed scheduler state (same invariant the resume topology
        # check enforces).
        ctl_path = os.path.join(out_dir, "control.json")

        def _read_control() -> dict:
            try:
                with open(ctl_path) as f:
                    return json.load(f)
            except (OSError, ValueError):
                return {}

        stopped_by_control = False
        total_fetched = 0
        for gen in range(start_gen, max_gens):
            if cand_count == 0:
                break
            ctl = _read_control()
            while ctl.get("pause"):
                import time as _time

                _time.sleep(0.2)
                ctl = _read_control()
            if ctl.get("stop_after_gen") is not None:
                sag = int(ctl["stop_after_gen"])
                # a directive SATISFIED by a previous attempt (resume
                # starts past it) is spent — honoring it literally would
                # make every resume after a graceful stop a no-op; the
                # resume path is the documented way to continue the crawl
                if start_gen <= sag < gen:
                    stopped_by_control = True
                    break
            want = int(ctl.get("fetch_concurrency") or 0)
            if want > 0 and want != len(fetch_pool):
                # index slices are a function of the pool size, so a
                # resize rebuilds the whole (stateless) pool rather than
                # appending/popping actors with stale slice assignments
                for a in fetch_pool:
                    ray.kill(a)
                fetch_pool = [
                    FetchActorCls.remote(corpus_dir, i, want, parse_html)
                    for i in range(want)
                ]
            gen_dir = os.path.join(out_dir, f"gen={gen}")
            if os.path.isdir(gen_dir) and not os.path.exists(
                os.path.join(gen_dir, "_DONE")
            ):
                # leftovers from a killed attempt at this generation (hard
                # kill mid-gen): sink part files the retry doesn't re-write —
                # rolled parts past the retry's roll count, or an unclosed
                # trailing parquet — would otherwise survive and double-count
                # (or fail) in read_sink. The retry owns the whole gen.
                shutil.rmtree(gen_dir)
            os.makedirs(os.path.join(gen_dir, "ckpt"), exist_ok=True)

            # 1. normalize (stateless mb; robots broadcast) over the candidate
            # block refs — the wave enters as object-store blocks, not a
            # driver table.
            cand_ds = ray.data.from_arrow_refs(list(cand_blocks))

            def _norm(batch: pa.Table, g=gen) -> pa.Table:
                rob = ray.get(robots_ref)
                out, _m = normalize_batch(
                    batch, rob, num_shards, g, hot_hosts=hot_hosts
                )
                return out

            norm_ds = cand_ds.map_batches(_norm, batch_format="pyarrow")

            # 2. route to shard actors directly from the streaming map stage —
            # co-location by message passing instead of a groupby shuffle (the
            # actor IS the partition owner; rows move exactly once, and small
            # waves skip all-to-all overhead). Order restored by seq in-actor.
            actor_list = list(actors)

            def _route(batch: pa.Table) -> pa.Table:
                if batch.num_rows == 0:
                    return pa.table({"shard": pa.array([], pa.int32()),
                                     "n": pa.array([], pa.int64())})
                import polars as _pl

                df = _pl.from_arrow(batch)
                futs, counts = [], {}
                for (sh,), sub in df.group_by("shard"):
                    futs.append(actor_list[int(sh)].enqueue.remote(sub.to_arrow()))
                    counts[int(sh)] = sub.height
                ray.get(futs)
                return pa.table(
                    {
                        "shard": pa.array(list(counts), pa.int32()),
                        "n": pa.array(list(counts.values()), pa.int64()),
                    }
                )

            # consume the routed dataset (one pass; side effects land in actors)
            # max_retries=0: a _route task that dies AFTER some of its
            # enqueue.remote calls committed must fail the run loudly
            # (resume recovers at the last _DONE gen) — a silent Ray-level
            # task retry would re-run every enqueue and double-count the
            # duplicated candidate rows in the shard metrics
            for _ in norm_ds.map_batches(
                _route, batch_format="pyarrow", max_retries=0
            ).iter_batches(
                batch_size=None
            ):
                pass

            # 3. schedule each shard's wave (politeness DES in the actors).
            # Permits come back as per-shard Arrow TABLE REFS — the driver holds
            # ObjectRefs, never the rows.
            wave_res = ray.get(
                [a.schedule_wave.remote(wave_start) for a in actors]
            )
            permit_refs = [a.take_permits.remote() for a in actors]
            n_permits = sum(r["scheduled"] for r in wave_res)

            # permits → global crawl-order sort → fetch pool. Small waves pull
            # the bounded permit tables and sort with the arrow kernel; waves
            # past DS_SORT_THRESHOLD sort distributed (ray.data over the refs)
            # and the sorted blocks go straight to the fetch actors. SORT_KEYS
            # is a total order, so both paths yield the identical global row
            # sequence (asserted by test_distributed_sort_path_identical).
            if n_permits <= DS_SORT_THRESHOLD:
                permits_t = pa.concat_tables(
                    ray.get(permit_refs), promote_options="default"
                ).sort_by(SORT_KEYS)
                fetch_in = _chunks(permits_t, 256) if permits_t.num_rows else []
            else:
                sorted_ds = ray.data.from_arrow_refs(permit_refs).sort(
                    [k for k, _ in SORT_KEYS]
                )
                fetch_in = list(sorted_ds.materialize().to_arrow_refs())
            fetched_refs = _submit_windowed(
                _fetch_window_sharded, (fetch_pool,), fetch_in
            )
            if result_handler is not None:
                fetched_refs = [
                    _apply_result_handler.remote(handler_ref, r)
                    for r in fetched_refs
                ]

            # 4. per-block derivative tasks, submitted up front and consumed in
            # global crawl order — the heavy fetched blocks stay in the object
            # store; the driver only streams SMALL derived tables, one block at
            # a time, into single-file parquet sinks (RSS stays flat no matter
            # the wave size).
            status_refs = [_block_status.remote(r) for r in fetched_refs]
            imref_refs = [_block_image_refs.remote(r) for r in fetched_refs]
            cand_refs = [_block_candidates.remote(r) for r in fetched_refs]

            # Windowed pulls: one ray.get round-trip per WINDOW blocks instead
            # of per block (a 16-shard wave can produce dozens of sorted
            # blocks; strictly per-block gets made the driver latency-bound).
            # Memory stays bounded: ≤ WINDOW small derived blocks at a time.
            WINDOW = 8

            def _iter_windowed(refs):
                for i in range(0, len(refs), WINDOW):
                    yield from ray.get(list(refs[i : i + WINDOW]))

            # 4a. status sink (streamed, global crawl order, rolled parts)
            n_fetched = n2 = n4 = n5 = 0
            status_writer = RollingWriter(gen_dir, "status")
            for st in _iter_windowed(status_refs):
                status_writer.write(st)
                n_fetched += st.num_rows
                codes = st["status"].to_numpy(zero_copy_only=False)
                n2 += int(((codes >= 200) & (codes < 300)).sum())
                n4 += int(((codes >= 400) & (codes < 500)).sum())
                n5 += int(((codes >= 500)).sum())
            status_writer.close(STATUS_SCHEMA)
            total_fetched += n_fetched

            # 4b. image sink: first-wins dedup on REFS via shard actors, then
            # decode/recompress/phash only the kept refs in the fetch pool.
            # Admit SUBMISSION stays strictly in crawl order (actor tasks from
            # one caller execute in submission order, so each shard sees the
            # same hash sequence as the whole-wave path — the parity seam is
            # block-size-invariant); result GATHERING is pipelined one window
            # behind submission, overlapping admits with routing.
            img_futs = []

            def _drain(window):
                if not window:
                    return
                entries, futs = window
                # ONE batched round-trip for the window's shard admits —
                # a per-shard ray.get loop serializes a driver RTT per
                # shard, exactly the latency the windowing exists to avoid
                got = ray.get(list(futs.values()))
                results = dict(zip(futs.keys(), got))
                for refs_t, rec in entries:
                    keep = np.zeros(refs_t.num_rows, dtype=bool)
                    for s, (idxs, start) in rec.items():
                        keep[idxs] = results[s][start : start + len(idxs)]
                    kept = refs_t.filter(pa.array(keep)).to_pylist()
                    chunk_lists = [
                        kept[j : j + 64] for j in range(0, len(kept), 64)
                    ]
                    img_futs.extend(
                        _submit_windowed(
                            _process_refs_window_sharded,
                            (fetch_pool, gen),
                            chunk_lists,
                        )
                    )

            prev_window = None
            for i in range(0, len(imref_refs), WINDOW):
                # ONE admit RPC per shard per window: the window's blocks are
                # walked in crawl order and each shard's hashes concatenate in
                # that order, so the per-shard admit sequence is identical to
                # the per-block (and whole-wave) construction
                per_shard: dict[int, list] = {}
                entries = []
                for refs_t in ray.get(list(imref_refs[i : i + WINDOW])):
                    if refs_t.num_rows == 0:
                        continue
                    ih = hash64(refs_t["image_id"])
                    shard_of = (ih % np.uint64(num_shards)).astype(np.int64)
                    rec = {}
                    for s in np.unique(shard_of):
                        idxs = np.flatnonzero(shard_of == s)
                        lst = per_shard.setdefault(int(s), [])
                        rec[int(s)] = (idxs, len(lst))
                        lst.extend(int(h) for h in ih[idxs])
                    entries.append((refs_t, rec))
                futs = {
                    s: actors[s].admit_images.remote(h)
                    for s, h in per_shard.items()
                }
                _drain(prev_window)
                prev_window = (entries, futs)
            _drain(prev_window)
            img_writer = RollingWriter(gen_dir, "images")
            for t in _iter_windowed(img_futs):
                img_writer.write(t)
            img_writer.close(IMAGE_SCHEMA)
            n_images = img_writer.n_rows

            # 4c. next-gen candidates: ALL retries (crawl order) then ALL
            # outlinks (crawl order) — identical sequence to the whole-wave
            # construction; seq assigned with a running offset per block. The
            # seq'd blocks are re-put as the next wave's input refs AND streamed
            # into the single-file checkpoint.
            retry_refs = [p[0] for p in cand_refs]
            outlink_refs = [p[1] for p in cand_refs]
            cand_writer = RollingWriter(gen_dir, "next_candidates")
            next_cand_refs: list = []
            offset = 0
            for t in _iter_windowed(retry_refs + outlink_refs):
                if t.num_rows == 0:
                    continue
                t = t.append_column(
                    "seq",
                    pa.array(np.arange(offset, offset + t.num_rows), pa.int64()),
                )
                offset += t.num_rows
                cand_writer.write(t)
                next_cand_refs.append(ray.put(t))
            cand_writer.close(CANDIDATE_SCHEMA.append(pa.field("seq", pa.int64())))
            cand_blocks = next_cand_refs
            cand_count = offset

            # 5. checkpoint: scheduler state per shard + wave clock + marker
            wave_start = max(ray.get([a.clock.remote() for a in actors]))
            for s, a in enumerate(actors):
                blob = ray.get(a.state_dict.remote())
                with open(os.path.join(gen_dir, "ckpt", f"shard_{s}.pkl"), "wb") as f:
                    f.write(blob)
            with open(os.path.join(gen_dir, "ckpt", "wave_start.txt"), "w") as f:
                f.write(str(wave_start))
            # per-(gen, shard) lineage + metrics rows (north rule: every
            # partition checkpoints its lineage and metrics); counters were
            # accumulated during the streaming sinks. driver_rss_kb proves the
            # block-ref wave flow: it must stay flat across generations even as
            # the frontier grows.
            mrows = [
                {
                    "gen": gen,
                    "shard": sh,
                    "candidates": res["candidates"],
                    "dedup_hits": res["dedup_hits"],
                    "scheduled": res["scheduled"],
                    "top_host": res.get("top_host", ""),
                    "top_host_n": res.get("top_host_n", 0),
                    "cuckoo_fp_audit": res.get("fp_audit", 0),
                    "cuckoo_add_failures": res.get("cuckoo_add_failures", 0),
                    "seen_size": res.get("seen_size", 0),
                    "shard_clock_us": res.get("clock", 0),
                    "fetched_total": n_fetched,
                    "http_2xx": n2,
                    "http_4xx": n4,
                    "http_5xx": n5,
                    "images": n_images,
                    "next_candidates": cand_count,
                    "wave_end_us": wave_start,
                    "driver_rss_kb": _driver_rss_kb(),
                }
                for sh, res in enumerate(wave_res)
            ]
            metrics_t = pa.Table.from_pylist(mrows)
            pq.write_table(metrics_t, os.path.join(gen_dir, "metrics.parquet"))
            with open(os.path.join(gen_dir, "_DONE"), "w") as f:
                f.write("ok")

        # final: merged seen table, globally sorted by (url_hash, url). Small
        # sets concat+sort driver-side (bounded); big sets sort distributed
        # over the per-shard table refs using the order-preserving int64
        # bit-flip key (ray's sort doesn't take uint64) and stream-write.
        seen_refs = [a.seen_table.remote() for a in actors]
        seen_path = os.path.join(out_dir, "seen.parquet")
        n_seen = sum(ray.get([a.seen_count.remote() for a in actors]))
        if n_seen <= DS_SORT_THRESHOLD:
            seen_t = pa.concat_tables(
                ray.get(seen_refs), promote_options="default"
            ).sort_by([("url_hash", "ascending"), ("url", "ascending")])
            pq.write_table(seen_t.drop_columns(["sort_key"]), seen_path)
        else:
            sorted_ds = ray.data.from_arrow_refs(seen_refs).sort(
                ["sort_key", "url"]
            )
            writer = RollingWriter(out_dir, "seen")
            for bref in sorted_ds.materialize().to_arrow_refs():
                b = ray.get(bref)
                if b.num_rows == 0:
                    continue
                writer.write(b.drop_columns(["sort_key"]))
            writer.close(SEEN_SCHEMA)

        return {
            "out_dir": out_dir,
            "total_fetched": total_fetched,
            "stopped_by_control": stopped_by_control,
            "fetch_pool_size": len(fetch_pool),
        }
    finally:
        for a in actors + fetch_pool:
            ray.kill(a)


from spider_ray._serial import register_all as _register_all  # noqa: E402

_register_all()


def gc_checkpoints(out_dir: str, keep: int = 2) -> dict:
    """Checkpoint retention GC for a long-running / resumed crawl.

    Resume (see ``run_crawl``) reads exactly ONE generation's recovery
    state: the latest ``_DONE`` gen's ``ckpt/`` (pickled shard
    schedulers + ``wave_start.txt``) and its ``next_candidates`` sink.
    Every EARLIER gen's ckpt + next_candidates is dead weight that
    accumulates forever on a 10^10-URL crawl (each ckpt is O(seen/shard)
    — the dominant state). This removes them for all but the newest
    ``keep`` DONE generations, NEVER touching data sinks (status /
    images / metrics) or any gen without a ``_DONE`` marker (an
    in-flight or killed attempt still needed for wipe-and-retry).

    Returns ``{"removed_gens": [...], "bytes_freed": int}``. Safe to run
    while the crawl is stopped (the intended window: between a graceful
    stop and its resume) and idempotent."""
    import shutil as _shutil

    done_gens = sorted(
        int(d.split("=")[1])
        for d in os.listdir(out_dir)
        if d.startswith("gen=")
        and os.path.exists(os.path.join(out_dir, d, "_DONE"))
    )
    removed, freed = [], 0
    for g in done_gens[:-keep] if keep > 0 else done_gens[:-1]:
        gen_dir = os.path.join(out_dir, f"gen={g}")
        targets = [os.path.join(gen_dir, "ckpt")] + [
            os.path.join(gen_dir, f)
            for f in os.listdir(gen_dir)
            if f == "next_candidates.parquet"
            or (
                f.startswith("next_candidates.part")
                and f.endswith(".parquet")
            )
        ]
        got_one = False
        for t in targets:
            if os.path.isdir(t):
                freed += sum(
                    os.path.getsize(os.path.join(r, f))
                    for r, _, fs in os.walk(t)
                    for f in fs
                )
                _shutil.rmtree(t)
                got_one = True
            elif os.path.isfile(t):
                freed += os.path.getsize(t)
                os.remove(t)
                got_one = True
        if got_one:
            removed.append(g)
    return {"removed_gens": removed, "bytes_freed": freed}
