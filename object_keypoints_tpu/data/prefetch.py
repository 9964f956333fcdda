"""Host -> device prefetching.

Replaces the reference's process-based loading (torch DataLoader workers,
scripts/train.py:143-149; the vendored prefetch processes + pinned-memory
thread, corner_net_lite/train.py:49-87,116-142) with a background thread
that stages the next batches onto the device while the current step runs —
the JAX-idiomatic double-buffering recipe.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional

import jax


_SENTINEL = object()


def device_prefetch(batches: Iterable, buffer_size: int = 2,
                    sharding: Optional[jax.sharding.Sharding] = None) -> Iterator:
    """Yield device-resident batches, staying ``buffer_size`` ahead.

    When ``sharding`` is given, each array is placed with it (e.g. batch
    sharding over the mesh's data axis), so the train step never blocks on
    host->device transfer.
    """
    q: "queue.Queue" = queue.Queue(maxsize=buffer_size)
    err: list = []
    multihost = jax.process_count() > 1

    def put(batch):
        if sharding is not None:
            if multihost:
                # each process loads its own rows; assemble the global
                # batch-sharded array from the per-process shards (the
                # SPMD analog of DDP's per-worker sampling)
                import numpy as np

                def to_global(x):
                    x = np.asarray(x)
                    global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
                    return jax.make_array_from_process_local_data(
                        sharding, x, global_shape
                    )

                return jax.tree.map(to_global, batch)
            return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    def worker():
        try:
            for batch in batches:
                q.put(put(batch))
        except Exception as e:  # surface loader errors on the consumer side
            err.append(e)
        finally:
            q.put(_SENTINEL)

    thread = threading.Thread(target=worker, daemon=True)
    thread.start()

    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item
