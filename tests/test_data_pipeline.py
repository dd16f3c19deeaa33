"""Host→device input pipeline (utils/data.py): batching, ordering,
prefetch equivalence, mesh placement, and producer-thread error
propagation.  The reference has no loader of its own (it trains from
torch DataLoaders — reference examples/train_vit_decorr.py:29-41); these
tests pin the TPU-native replacement's contract."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vit_pytorch_tpu.utils.data import minibatches, prefetch_to_device


def _data(n=20):
    return {
        "images": np.arange(n * 6, dtype=np.float32).reshape(n, 2, 3),
        "labels": np.arange(n, dtype=np.int32),
    }


def test_minibatches_covers_rows_in_order():
    data = _data()
    batches = list(minibatches(data, 8))
    # drop_last: 20 rows -> two full batches of 8
    assert len(batches) == 2
    got = np.concatenate([b["labels"] for b in batches])
    np.testing.assert_array_equal(got, np.arange(16))
    for b in batches:
        np.testing.assert_array_equal(
            b["images"][:, 0, 0], b["labels"].astype(np.float32) * 6
        )


def test_minibatches_keep_tail():
    batches = list(minibatches(_data(), 8, drop_last=False))
    assert [b["labels"].shape[0] for b in batches] == [8, 8, 4]


def test_minibatches_shuffles_whole_epoch():
    data = _data()
    rng = np.random.default_rng(0)
    batches = list(minibatches(data, 5, rng=rng))
    got = np.concatenate([b["labels"] for b in batches])
    assert sorted(got.tolist()) == list(range(20))
    assert got.tolist() != list(range(20))
    # rows stay aligned across leaves under the shuffle
    for b in batches:
        np.testing.assert_array_equal(
            b["images"][:, 0, 0], b["labels"].astype(np.float32) * 6
        )


def test_minibatches_rejects_misaligned_leaves():
    with pytest.raises(ValueError, match="leading dims"):
        next(minibatches({"a": np.zeros((4, 2)), "b": np.zeros((5,))}, 2))


@pytest.mark.parametrize("host_workers", [False, True])
@pytest.mark.parametrize("depth", [1, 2, 5])
def test_prefetch_preserves_stream(depth, host_workers):
    data = _data(24)
    want = list(minibatches(data, 8))
    got = list(
        prefetch_to_device(
            minibatches(data, 8), depth=depth, host_workers=host_workers
        )
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert isinstance(g["images"], jax.Array)
        np.testing.assert_array_equal(np.asarray(g["images"]), w["images"])
        np.testing.assert_array_equal(np.asarray(g["labels"]), w["labels"])


def test_prefetch_empty_iterator():
    assert list(prefetch_to_device(iter([]), depth=3)) == []


def test_prefetch_mesh_places_batch_on_data_axis():
    from vit_pytorch_tpu.parallel.mesh import batch_sharding, make_mesh

    mesh = make_mesh(data=4, model=2, devices=jax.devices("cpu"))
    data = _data(16)
    out = list(prefetch_to_device(minibatches(data, 8), mesh=mesh))
    assert len(out) == 2
    want_sh = batch_sharding(mesh)
    for b in out:
        for leaf in jax.tree.leaves(b):
            assert leaf.sharding.is_equivalent_to(want_sh, leaf.ndim)
    got = np.concatenate([np.asarray(b["labels"]) for b in out])
    np.testing.assert_array_equal(got, np.arange(16))


def test_prefetch_sharding_pytree():
    cpu = jax.devices("cpu")[0]
    sh = jax.sharding.SingleDeviceSharding(cpu)
    data = _data(8)
    shardings = {"images": sh, "labels": sh}
    out = list(prefetch_to_device(minibatches(data, 4), sharding=shardings))
    assert all(b["images"].sharding == sh for b in out)


def test_prefetch_propagates_producer_errors():
    def broken():
        yield {"x": np.zeros((2,))}
        raise RuntimeError("decode failed")

    with pytest.raises(RuntimeError, match="decode failed"):
        list(prefetch_to_device(broken(), depth=2, host_workers=True))
    with pytest.raises(RuntimeError, match="decode failed"):
        list(prefetch_to_device(broken(), depth=2, host_workers=False))


def test_prefetch_host_thread_stops_when_abandoned():
    """A consumer that stops early must not leave the producer thread
    blocked on a full queue pinning batches for the process lifetime."""
    import gc
    import threading
    import time

    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield {"x": np.full((4,), i, dtype=np.float32)}

    stream = prefetch_to_device(gen(), depth=2, host_workers=True)
    next(stream)
    next(stream)
    stream.close()
    del stream
    gc.collect()

    def alive():
        return any(
            t.name == "vit-tpu-host-prefetch" and t.is_alive()
            for t in threading.enumerate()
        )

    deadline = time.time() + 5.0
    while time.time() < deadline and alive():
        time.sleep(0.05)
    assert not alive(), "producer thread still running after consumer left"
    assert len(produced) < 1000, "producer drained the whole stream anyway"


def test_prefetch_validates_eagerly():
    """Bad arguments raise at call time, not at the first next()."""
    with pytest.raises(ValueError, match="depth"):
        prefetch_to_device(iter([]), depth=0)


def test_minibatches_unshuffled_yields_views():
    """Without rng, batches are zero-copy views of the source arrays."""
    data = {"x": np.arange(32, dtype=np.float32).reshape(8, 4)}
    batch = next(minibatches(data, 4))
    assert batch["x"].base is not None  # a view, not a copy
    assert np.shares_memory(batch["x"], data["x"])


def test_prefetch_bad_args():
    with pytest.raises(ValueError, match="depth"):
        next(prefetch_to_device(iter([]), depth=0))
    from vit_pytorch_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=8, devices=jax.devices("cpu"))
    cpu = jax.devices("cpu")[0]
    with pytest.raises(ValueError, match="not both"):
        next(
            prefetch_to_device(
                iter([]),
                mesh=mesh,
                sharding=jax.sharding.SingleDeviceSharding(cpu),
            )
        )


def test_prefetch_feeds_a_jitted_step():
    """End-to-end shape: a tiny jitted 'train step' consumes the prefetched
    stream and sees every batch exactly once."""
    data = _data(32)

    @jax.jit
    def step(acc, batch):
        return acc + jnp.sum(batch["labels"])

    acc = jnp.int32(0)
    for batch in prefetch_to_device(minibatches(data, 8), depth=2):
        acc = step(acc, batch)
    assert int(acc) == sum(range(32))
