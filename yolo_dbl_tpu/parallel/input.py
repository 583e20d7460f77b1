"""Multi-host input pipeline.

TPU-native replacement for the reference's DistributedSampler + per-rank
DataLoader (reference data/build.py InfiniteDataLoader + utils/dist.py): in a
multi-host SPMD program each host loads only its shard of every global batch
and the shards are assembled into one global jax.Array via
`jax.make_array_from_process_local_data`. Single-host meshes degrade to a
plain device_put.
"""

from __future__ import annotations

from typing import Dict, Iterable, Iterator, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed (the torch.distributed.init_process_group
    equivalent). No-op when single-process or already initialized."""
    if num_processes in (None, 1):
        return
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError:
        pass  # already initialized


def host_shard_indices(n_samples: int, seed: int = 0, epoch: int = 0,
                       shuffle: bool = True,
                       process_index: Optional[int] = None,
                       process_count: Optional[int] = None) -> np.ndarray:
    """This host's sample indices for one epoch (the DistributedSampler
    contract: same permutation everywhere, disjoint contiguous shards,
    padded so every host sees the same count)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    rng = np.random.default_rng(seed + epoch)
    order = rng.permutation(n_samples) if shuffle else np.arange(n_samples)
    per = -(-n_samples // pc)  # ceil
    pad = per * pc - n_samples
    if pad:
        order = np.concatenate([order, order[:pad]])
    return order[pi * per:(pi + 1) * per]


def make_global_batch(batch: Dict[str, np.ndarray], mesh: Mesh,
                      data_axis: str = "data") -> Dict[str, jax.Array]:
    """Per-host batch shard → global batch-sharded jax.Arrays.

    Each host passes its LOCAL shard (global_batch / process_count rows);
    the returned arrays are globally (data)-sharded over the mesh. On a
    single-host mesh this is a plain sharded device_put.
    """
    spec_of = {k: P(data_axis) if getattr(v, "ndim", 0) >= 1 else P()
               for k, v in batch.items()}
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        sharding = NamedSharding(mesh, spec_of[k])
        if jax.process_count() == 1:
            out[k] = jax.device_put(v, sharding)
        else:
            out[k] = jax.make_array_from_process_local_data(sharding, v)
    return out


class MultiHostLoader:
    """Wrap a per-sample dataset into host-sharded global batches.

    Args:
        dataset: indexable yielding dicts of numpy arrays (fixed shapes).
        global_batch: total batch size across all hosts.
        mesh: ('data', …) mesh; arrays come back sharded on `data`.
    """

    def __init__(self, dataset, global_batch: int, mesh: Mesh, *, seed: int = 0,
                 shuffle: bool = True, collate=None, data_axis: str = "data"):
        assert global_batch % jax.process_count() == 0, \
            "global batch must divide evenly across hosts"
        self.dataset = dataset
        self.global_batch = global_batch
        self.local_batch = global_batch // jax.process_count()
        self.mesh = mesh
        self.seed = seed
        self.shuffle = shuffle
        self.collate = collate or (lambda samples: {
            k: np.stack([s[k] for s in samples]) for k in samples[0]
        })
        self.data_axis = data_axis
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        per_host = len(host_shard_indices(len(self.dataset), self.seed, self.epoch,
                                          self.shuffle))
        return per_host // self.local_batch

    def __iter__(self) -> Iterator[Dict[str, jax.Array]]:
        idx = host_shard_indices(len(self.dataset), self.seed, self.epoch, self.shuffle)
        for i in range(len(self)):
            rows = [self.dataset[int(j)] for j in idx[i * self.local_batch:(i + 1) * self.local_batch]]
            yield make_global_batch(self.collate(rows), self.mesh, self.data_axis)
