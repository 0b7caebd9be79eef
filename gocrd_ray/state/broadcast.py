"""Broadcast small sides: ``ray.put`` once, read inside every task/actor.

The pattern the whole engine uses for small lookup sides (manifest href
sets, query matrices, LSH centroids, language profiles): never ship the
object per batch (it would be re-serialized into every task's arg list),
never shuffle-join a small side — put it in the object store once and
``ray.get`` it from worker-local shared memory.
"""

from __future__ import annotations

from typing import Any, Callable


def broadcast(value: Any):
    """Put once; returns the ObjectRef to capture in stage closures."""
    import ray

    return ray.put(value)


class WithBroadcast:
    """Callable-class wrapper: resolve a broadcast ref once per ACTOR
    (in __init__), then apply fn(batch, value) per batch.

    Usage::

        ref = broadcast(big_lookup)
        ds.map_batches(WithBroadcast, fn_constructor_kwargs={
            "ref": ref, "fn": my_batch_fn}, concurrency=(1, 8),
            batch_format="pyarrow")
    """

    def __init__(self, ref, fn: Callable):
        import ray

        self.value = ray.get(ref)  # one fetch per actor, zero-copy plasma
        self.fn = fn

    def __call__(self, batch):
        return self.fn(batch, self.value)
