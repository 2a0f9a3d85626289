"""Generation-scoped release of persisted DataFrame handles.

Several exact total-order operators (``relational.global_order_index``
consumers: the exact-NTILE RFM path, customer Pareto, global rank)
``persist(MEMORY_AND_DISK)`` intermediate frames whose *contents pin
sampled range-partition boundaries* — unpersisting them before the
result is materialized would let a recompute re-sample boundaries and
invalidate the driver-side offset tables (see the
``global_order_index`` docstring).  They therefore cannot unpersist
eagerly.  But never unpersisting leaks cache entries across repeated
invocations (bench's min-of-3 passes, a long-lived SQL endpoint):
Spark's CacheManager holds persisted plans until an explicit
``unpersist``, so the ContextCleaner never reclaims them.

The contract here is *generational*: each invocation of an operator
registers its persisted handles under a stable tag and the PREVIOUS
generation for that tag is unpersisted.  By the time an operator is
re-invoked, the prior invocation's result has been consumed (the
driver collects between calls), so releasing its pinned frames is
safe; at most ONE generation per tag stays cached.

Correctness under late re-materialization (holding an old lazy result
frame across a re-invocation, then collecting it): every rotated
frame is CONTENT-DETERMINISTIC (aggregates, decode tables, score
tables) — a recompute through the released handle reproduces the same
rows, just slower.  The one layout-sensitive frame in the engine (the
``global_order_index`` range exchange, whose driver-side offsets pin
a sampled partitioning) is ``localCheckpoint``-ed with its lineage
CUT, so a stale read either serves the checkpointed blocks or fails
loudly — it can never silently recompute under stale offsets.

``release()`` lets a long-lived endpoint drop everything explicitly
(e.g. on session close).
"""

from __future__ import annotations

import threading

_lock = threading.Lock()
_generations: dict[str, list] = {}


def rotate(tag: str, handles) -> None:
    """Register this invocation's persisted frames under ``tag``;
    unpersist (non-blocking) the previous generation for the same tag.

    ``localCheckpoint``-ed frames have no CacheManager entry, so their
    ``unpersist`` is a no-op — their blocks are freed by the
    ContextCleaner once BOTH runtimes drop the references. Dropping the
    registry reference here plus one ``gc.collect()`` starts that chain
    promptly (py4j releases the JVM proxy on Python GC) instead of
    waiting for an incidental collection; blocks still referenced by a
    live result frame's lineage correctly stay alive (freeing them
    would fail that frame loudly — lineage is cut)."""
    import gc

    with _lock:
        old = _generations.get(tag, [])
        _generations[tag] = [h for h in handles if h is not None]
    had_old = bool(old)
    for h in old:
        try:
            h.unpersist(blocking=False)
        except Exception:
            # a handle whose SparkContext is gone is already released
            pass
    if had_old:
        # the loop variable would otherwise keep the LAST handle alive
        # through the collect — exactly the frame the GC is for
        del h, old
        gc.collect()


def release(tag: str | None = None) -> None:
    """Unpersist the current generation for ``tag`` (all tags when
    ``None``).  For endpoint shutdown / test teardown."""
    with _lock:
        if tag is None:
            drop = [h for hs in _generations.values() for h in hs]
            _generations.clear()
        else:
            drop = _generations.pop(tag, [])
    for h in drop:
        try:
            h.unpersist(blocking=False)
        except Exception:
            pass


def cached_count(tag: str | None = None) -> int:
    """Number of live registered handles (for tests)."""
    with _lock:
        if tag is None:
            return sum(len(v) for v in _generations.values())
        return len(_generations.get(tag, []))
