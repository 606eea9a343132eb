"""Multi-host data loading: per-process slice loading + global batch
assembly (countr_tpu/data/loader.py process_index/process_count,
parallel/mesh.make_global_batch).

True multi-process meshes can't run in one pytest process; these tests
pin the pieces that make the multi-host path correct: (a) the loaders
of all processes partition each global batch deterministically and
disjointly, (b) make_global_batch produces the same sharded values as
the single-host device_put path when process_count == 1.
"""

import numpy as np
import pytest

from countr_tpu.data.loader import DataLoader
from countr_tpu.parallel.mesh import (
    batch_sharding, get_mesh, global_any, make_global_batch, shard_batch,
)


class IdxDataset:
    """Returns its index so batch contents identify the samples."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"image": np.full((2, 2, 3), i, np.float32), "idx": i}


def _batches(n_samples, batch, pi, pc, shuffle=True, drop_last=True):
    dl = DataLoader(
        IdxDataset(n_samples), batch, shuffle=shuffle, num_workers=2,
        drop_last=drop_last, seed=3, process_index=pi, process_count=pc,
    )
    return [b["idx"] for b in dl.epoch(epoch=1)]


def test_process_slices_partition_each_batch():
    pc = 4
    per_proc = [_batches(37, 8, pi, pc) for pi in range(pc)]
    solo = _batches(37, 8, 0, 1)
    assert all(len(b) == len(solo) for b in per_proc)
    for step, global_idxs in enumerate(solo):
        got = [i for pi in range(pc) for i in per_proc[pi][step]]
        # concatenating the process slices in rank order reproduces the
        # global batch exactly (order matters: slice p lands on the
        # devices process p addresses)
        assert got == list(global_idxs)
        assert len(set(got)) == len(got)


def test_ragged_tail_dropped_only_multiproc():
    # 10 samples, batch 8, no drop_last: tail of 2 isn't divisible by 4
    solo = _batches(10, 8, 0, 1, shuffle=False, drop_last=False)
    assert sum(len(b) for b in solo) == 10
    multi = [_batches(10, 8, pi, 4, shuffle=False, drop_last=False) for pi in range(4)]
    assert all(len(m) == 1 for m in multi)  # ragged tail skipped
    assert sorted(i for m in multi for b in m for i in b) == list(range(8))


def test_indivisible_batch_rejected():
    with pytest.raises(ValueError):
        DataLoader(IdxDataset(8), 6, process_index=0, process_count=4)


def test_make_global_batch_matches_shard_batch():
    mesh = get_mesh(8)
    batch = {
        "image": np.arange(8 * 4 * 4 * 3, dtype=np.float32).reshape(8, 4, 4, 3),
        "boxes": np.arange(8 * 3, dtype=np.float32).reshape(8, 3),
    }
    a = make_global_batch(mesh, batch)
    b = shard_batch(mesh, batch)
    for k in batch:
        assert a[k].sharding == batch_sharding(mesh)
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_worker_pool_persists_across_epochs():
    # per-epoch pools would throw away worker-side caches; the pool
    # must be created once and reused
    dl = DataLoader(IdxDataset(8), 4, num_workers=2)
    list(dl.epoch(0))
    pool0 = dl._pool
    assert pool0 is not None
    list(dl.epoch(1))
    assert dl._pool is pool0
    dl.close()
    assert dl._pool is None


def test_global_any_single_process():
    assert global_any(np.array([0, 0, 1], np.int32)) is True
    assert global_any(np.array([0, 0, 0], np.int32)) is False
