"""Multi-host input pipeline on a virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from yolo_dbl_tpu.parallel.input import (
    MultiHostLoader,
    host_shard_indices,
    make_global_batch,
)
from yolo_dbl_tpu.parallel.mesh import make_mesh


def _cpu_mesh(n=8):
    devs = jax.devices("cpu")[:n]
    return make_mesh(n_data=len(devs), devices=devs)


def test_host_shard_indices_disjoint_and_complete():
    shards = [host_shard_indices(103, seed=1, epoch=2, process_index=i, process_count=4)
              for i in range(4)]
    lens = {len(s) for s in shards}
    assert lens == {26}  # ceil(103/4), padded
    allidx = np.concatenate(shards)
    assert set(allidx.tolist()) == set(range(103))
    # same epoch → same permutation; next epoch differs
    again = host_shard_indices(103, seed=1, epoch=2, process_index=0, process_count=4)
    np.testing.assert_array_equal(shards[0], again)
    other = host_shard_indices(103, seed=1, epoch=3, process_index=0, process_count=4)
    assert not np.array_equal(shards[0], other)


def test_make_global_batch_sharded_on_data_axis():
    mesh = _cpu_mesh()
    batch = {"img": np.arange(8 * 4 * 4 * 3, dtype=np.float32).reshape(8, 4, 4, 3),
             "gt_cls": np.zeros((8, 5), np.int32)}
    out = make_global_batch(batch, mesh)
    assert out["img"].shape == (8, 4, 4, 3)
    # sharded over 8 devices on dim 0
    assert len(out["img"].addressable_shards) == 8
    assert out["img"].addressable_shards[0].data.shape == (1, 4, 4, 3)
    np.testing.assert_array_equal(np.asarray(out["img"]), batch["img"])


def test_multihost_loader_batches():
    mesh = _cpu_mesh()
    ds = [{"img": np.full((4, 4, 3), i, np.float32), "y": np.int32(i)} for i in range(20)]
    loader = MultiHostLoader(ds, global_batch=8, mesh=mesh, seed=0)
    batches = list(loader)
    assert len(batches) == len(loader) == 2
    assert batches[0]["img"].shape == (8, 4, 4, 3)
    # a jitted mean over the sharded batch runs on the mesh
    f = jax.jit(lambda b: b["img"].mean())
    assert np.isfinite(float(f(batches[0])))
    loader.set_epoch(1)
    b2 = list(loader)[0]
    assert not np.allclose(np.asarray(b2["img"]), np.asarray(batches[0]["img"]))
