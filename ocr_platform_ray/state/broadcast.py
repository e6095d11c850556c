"""Broadcast small-side tables (SURVEY.md §2.3 T2, §2.4 J1/J5).

The reference caches small dimension data per process (bookId->url LRU,
apps/queue/src/services/book.ts:4-26; Airtable dims fetched once,
lib/airtable/index.ts:19-152).  The Ray-native equivalent: ``ray.put`` the
table ONCE on the driver, pass the ObjectRef into stages, and ``ray.get``
it in actor ``__init__`` (or at first use) — read from the local object
store by every task on the node, never re-shipped per batch."""

from __future__ import annotations

from typing import Any, Callable

import ray


def broadcast(obj: Any) -> "ray.ObjectRef":
    """Put a small object (dict / pandas / Arrow table) in the object store
    once.  Workers read it zero-copy (Arrow) or once per actor."""
    return ray.put(obj)


_GET_CACHE: dict = {}


def cached_get(ref: "ray.ObjectRef") -> Any:
    """``ray.get`` with a per-worker deserialization cache.

    Lets STATELESS map_batches stages (plain callable instances — no actor
    pool, so no per-execution pool spin-up) still pay the broadcast
    deserialization only once per worker: Ray caches the deserialized task
    closure per worker, so this module-level dict persists across that
    closure's batches."""
    key = ref.hex()
    if key not in _GET_CACHE:
        _GET_CACHE[key] = ray.get(ref)
    return _GET_CACHE[key]


class BroadcastLookup:
    """Callable-class template for broadcast-probe stages: resolve the
    ObjectRef once per actor in ``__init__``, probe per batch in
    ``__call__`` via a user function ``fn(batch, small)``."""

    def __init__(self, small_ref: "ray.ObjectRef", fn: Callable):
        self.small = ray.get(small_ref)
        self.fn = fn

    def __call__(self, batch):
        return self.fn(batch, self.small)
