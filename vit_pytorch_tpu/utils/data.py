"""Host→device input pipeline.

A jitted TPU step should never wait on the host: while step k computes,
batch k+1 should already be crossing the host→device link.  The reference
has no loader of its own — it feeds models from torch DataLoaders
(reference examples/train_vit_decorr.py:29-41 builds a torchvision CIFAR
loader); this module is the TPU-native equivalent for feeding jitted
steps, single-chip or sharded over a mesh.

Two overlap mechanisms compose:

- ``jax.device_put`` is asynchronous — :func:`prefetch_to_device` issues
  the transfer for up to ``depth`` upcoming batches before the consumer
  asks for them, so the h2d DMA overlaps device compute.
- ``host_workers=True`` additionally pulls the wrapped iterator on a
  daemon thread, so host-side batch construction (decode, augmentation,
  collation) overlaps both the DMA and the compute.
"""

from __future__ import annotations

import collections
import queue as queue_mod
import threading
from typing import Iterable, Iterator

import jax
import numpy as np

__all__ = ["minibatches", "prefetch_to_device", "process_local_slice"]


def process_local_slice(data, process_index=None, process_count=None):
    """This process's contiguous row-slice of a global row-aligned pytree
    (multi-host data parallelism: each process loads/keeps 1/Nth of every
    global batch; ``prefetch_to_device(..., mesh=...)`` reassembles the
    global array via ``jax.make_array_from_process_local_data``).

    Every process must hold the SAME logical global data (or an identically
    shuffled view — seed per-epoch rngs identically across processes, as
    ``minibatches`` callers do) so the slices tile the global batch.
    """
    idx = jax.process_index() if process_index is None else process_index
    cnt = jax.process_count() if process_count is None else process_count
    leaves = jax.tree.leaves(data)
    if not leaves or cnt == 1:
        return data
    n = leaves[0].shape[0]
    if n % cnt:
        raise ValueError(
            f"process_local_slice: leading dim {n} must divide by "
            f"process_count {cnt}"
        )
    per = n // cnt
    return jax.tree.map(lambda a: a[idx * per : (idx + 1) * per], data)


def minibatches(data, batch_size: int, *, rng=None, drop_last: bool = True):
    """Yield minibatch pytrees sliced from row-aligned host arrays.

    ``data`` is any pytree of arrays sharing the same leading dimension
    (e.g. ``{"images": x, "labels": y}``).  When ``rng`` (a
    ``numpy.random.Generator``) is given, rows are visited in a fresh
    shuffled order; pass a fresh ``rng`` (or reuse one statefully) per
    epoch.  ``drop_last`` drops the ragged tail batch so every yielded
    batch has a static shape — one compiled executable, no end-of-epoch
    recompile.
    """
    leaves = jax.tree.leaves(data)
    if not leaves:
        return
    n = leaves[0].shape[0]
    for leaf in leaves:
        if leaf.shape[0] != n:
            raise ValueError(
                f"minibatches: leading dims disagree ({leaf.shape[0]} vs {n})"
            )
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    end = n - (n % batch_size) if drop_last else n
    if rng is None:
        # contiguous zero-copy views — no per-batch host memcpy
        for start in range(0, end, batch_size):
            stop = start + batch_size
            yield jax.tree.map(lambda a: a[start:stop], data)
        return
    order = np.arange(n)
    rng.shuffle(order)
    for start in range(0, end, batch_size):
        sel = order[start : start + batch_size]
        yield jax.tree.map(lambda a: a[sel], data)


def _host_thread_iter(it: Iterator, size: int) -> Iterator:
    """Run ``it`` on a daemon thread with a bounded handoff queue.

    Exceptions raised by the producer are re-raised in the consumer at the
    point they interrupt the stream.  If the consumer abandons the
    generator early (break / exception / GC), its ``finally`` signals the
    producer to stop, so the thread exits instead of blocking forever on a
    full queue while pinning batches in memory.
    """
    q: queue_mod.Queue = queue_mod.Queue(maxsize=max(1, size))
    end = object()
    stop = threading.Event()
    errs: list = []

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue_mod.Full:
                continue
        return False

    def run():
        try:
            for item in it:
                if not _put(item):
                    return
        except BaseException as e:  # noqa: BLE001 — forwarded to consumer
            errs.append(e)
        finally:
            _put(end)

    threading.Thread(target=run, daemon=True, name="vit-tpu-host-prefetch").start()
    try:
        while True:
            item = q.get()
            if item is end:
                if errs:
                    raise errs[0]
                return
            yield item
    finally:
        stop.set()


def prefetch_to_device(
    iterator: Iterable,
    *,
    depth: int = 2,
    sharding=None,
    mesh=None,
    host_workers: bool = False,
) -> Iterator:
    """Wrap an iterator of host-array pytrees; yield device-array pytrees
    with up to ``depth`` batches already transferred ahead of the consumer.

    ``sharding`` places every leaf (a single ``jax.sharding.Sharding``, or
    a pytree of them matching the batch structure).  ``mesh`` is the common
    shortcut: place batches leading-axis-sharded over the mesh's ``data``
    axis (``parallel.mesh.batch_sharding``), matching what
    ``make_sharded_train_step`` expects.  With neither, leaves go to the
    default device.

    ``host_workers=True`` pulls ``iterator`` on a background thread (see
    module docstring).  Lookahead bound: without ``host_workers`` the
    wrapped iterator is consumed at most ``depth + 1`` batches ahead of
    what has been yielded; with it, the producer thread buffers up to
    ``depth`` more host batches in its handoff queue (``2 * depth + 2``
    total) — size ``depth`` against host memory accordingly.

    Argument validation happens at call time (this returns a started
    generator), so a bad ``depth`` or a ``mesh``+``sharding`` conflict
    raises here, not at the first ``next()`` deep inside a training loop.
    """
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    if mesh is not None:
        if sharding is not None:
            raise ValueError("pass sharding or mesh, not both")
        from ..parallel.mesh import batch_sharding

        sharding = batch_sharding(mesh)

    # multi-process: each process holds only its local rows, so global
    # arrays are assembled from per-process shards instead of device_put
    # (which requires the full global value on every host)
    multiproc = jax.process_count() > 1

    def _put(a, s):
        if s is None:
            return jax.device_put(a)
        if multiproc and isinstance(s, jax.sharding.NamedSharding):
            return jax.make_array_from_process_local_data(s, np.asarray(a))
        return jax.device_put(a, s)

    if sharding is None or isinstance(sharding, jax.sharding.Sharding):
        place = lambda batch: jax.tree.map(lambda a: _put(a, sharding), batch)
    else:
        place = lambda batch: jax.tree.map(_put, batch, sharding)

    it = iter(iterator)
    if host_workers:
        it = _host_thread_iter(it, size=depth)

    def _stream() -> Iterator:
        in_flight: collections.deque = collections.deque()
        for batch in it:
            in_flight.append(place(batch))
            if len(in_flight) > depth:
                yield in_flight.popleft()
        while in_flight:
            yield in_flight.popleft()

    return _stream()
