"""The scheduler-cadence shim (spider_ray/compat.py) must wrap Ray's
streaming-executor module exactly once, stay idempotent, and never stack
shim-on-shim. Functional correctness under the shim is pinned by
tests/test_frontier_bench.py (run_frontier_bench applies it and the
distributed result must equal the single-process UDF run)."""

import ray as real_ray

from spider_ray.compat import tighten_scheduler_cadence


def _ses():
    import ray.data._internal.execution.streaming_executor_state as ses

    return ses


def test_shim_applies_and_is_idempotent():
    assert tighten_scheduler_cadence(0.01) is True
    ses = _ses()
    shim1 = ses.ray
    assert getattr(shim1, "_spider_ray_real") is real_ray
    assert tighten_scheduler_cadence(0.01) is True
    assert ses.ray is shim1  # same shim object, not re-wrapped

    # re-tuning wraps the REAL module again, never the previous shim
    assert tighten_scheduler_cadence(0.02) is True
    shim2 = ses.ray
    assert shim2 is not shim1
    assert getattr(shim2, "_spider_ray_real") is real_ray
    # non-wait attributes delegate to real ray
    assert ses.ray.ObjectRef is real_ray.ObjectRef
    # restore the default for the rest of the session
    assert tighten_scheduler_cadence(0.01) is True


def test_shim_rewrites_only_the_loop_call_shape(ray_session):
    tighten_scheduler_cadence(0.01)
    ses = _ses()

    @real_ray.remote
    def f():
        return 1

    refs = [f.remote() for _ in range(3)]
    # the executor's call shape (timeout=0.1, fetch_local=False) goes through
    # the shim; a user-shaped wait with another timeout must behave as stock
    ready, rest = ses.ray.wait(refs, num_returns=3, timeout=30.0)
    assert len(ready) == 3 and rest == []
    assert real_ray.get(ready) == [1, 1, 1]


def test_workers_inherit_single_polars_thread(ray_session):
    """The session entry points export POLARS_MAX_THREADS=1 BEFORE
    ray.init (workers inherit the raylet's env): 32 concurrent 1-CPU map
    tasks each running polars' default one-thread-per-core pool cost
    ~20-25% end to end (BASELINE.md §11). Ray caps arrow (pa.cpu_count)
    and OMP itself; polars reads only its own env var — this pins the
    one pool Ray does not manage."""
    import pyarrow as pa
    import ray

    def probe(batch):
        import polars as pl

        return pa.table({"tp": [pl.thread_pool_size()]})

    ds = ray.data.range(2, override_num_blocks=2).map_batches(
        probe, batch_format="numpy", batch_size=None
    )
    assert {r["tp"] for r in ds.take_all()} == {1}
