"""Self-contained serialization for Ray workers.

Ray workers don't necessarily have this repo on ``sys.path`` (the embedding
driver owns ``ray.init``). Registering every ``spider_ray`` module for
cloudpickle pickle-by-value makes ``map_batches`` closures and actor classes
fully self-describing, so pipelines run regardless of worker environment.

Each pipeline module calls :func:`register_all` at import time (its own
dependencies are already in ``sys.modules`` by then).
"""

from __future__ import annotations

import sys

_registered: set[str] = set()


def register_all() -> None:
    try:
        from ray import cloudpickle as cp
    except Exception:  # pragma: no cover
        return
    for name, mod in list(sys.modules.items()):
        if mod is None or name in _registered:
            continue
        if name == "spider_ray" or name.startswith("spider_ray."):
            try:
                cp.register_pickle_by_value(mod)
                _registered.add(name)
            except Exception:
                pass
