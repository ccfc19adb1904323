"""Dataset: cached graph construction + bucketed static-shape batching.

Replaces the reference's PyG ``InMemoryDataset`` wrapper
(/root/reference/src/torch_m3gnet/data/dataset.py:18-91): content-addressed
on-disk cache keyed by (cutoff, threebody_cutoff) like dataset.py:59-65,
multi-process graph construction like the joblib pool at dataset.py:78-81, and
— new here, required for XLA — bucketed padding so every batch compiles to one
of a small fixed set of shapes.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from concurrent.futures import ProcessPoolExecutor
from dataclasses import dataclass
from typing import Iterator, Optional, Sequence

import numpy as np

from torch_m3gnet_tpu.data.graph import (
    GraphBatch,
    batch_graphs,
    graph_from_structure,
    pad_batch,
    round_up,
)
from torch_m3gnet_tpu.data.structure import Structure


def _build_one(args) -> GraphBatch:
    structure, cutoff, threebody_cutoff = args
    return graph_from_structure(structure, cutoff, threebody_cutoff)


class GraphDataset:
    """In-memory list of unpadded graphs with a disk cache."""

    def __init__(
        self,
        structures: Sequence[Structure],
        cutoff: float,
        threebody_cutoff: float,
        cache_dir: Optional[str] = None,
        num_workers: int = 0,
        name: str = "dataset",
    ):
        self.cutoff = cutoff
        self.threebody_cutoff = threebody_cutoff
        key = hashlib.sha1(
            f"{name}:{len(structures)}:{cutoff}:{threebody_cutoff}".encode()
        ).hexdigest()[:8]
        cache_path = (
            os.path.join(cache_dir, f"graphs_{name}_{key}.pkl") if cache_dir else None
        )
        if cache_path and os.path.exists(cache_path):
            with open(cache_path, "rb") as f:
                self.graphs: list[GraphBatch] = pickle.load(f)
            return

        jobs = [(s, cutoff, threebody_cutoff) for s in structures]
        if num_workers > 1:
            with ProcessPoolExecutor(max_workers=num_workers) as ex:
                self.graphs = list(ex.map(_build_one, jobs, chunksize=16))
        else:
            self.graphs = [_build_one(j) for j in jobs]

        if cache_path:
            os.makedirs(cache_dir, exist_ok=True)
            with open(cache_path, "wb") as f:
                pickle.dump(self.graphs, f)

    def __len__(self) -> int:
        return len(self.graphs)

    def __getitem__(self, i: int) -> GraphBatch:
        return self.graphs[i]


@dataclass(frozen=True)
class BucketSpec:
    """Static padded sizes for one batch shape (one XLA compilation)."""

    max_nodes: int
    max_edges: int
    max_triplets: int
    max_graphs: int

    @classmethod
    def for_batches(
        cls,
        graphs: Sequence[GraphBatch],
        batch_size: int,
        pad_multiple: int = 128,
        safety: float = 1.0,
    ) -> "BucketSpec":
        """Worst-case bucket: sum of the ``batch_size`` largest graphs.

        Guarantees any shuffled batch fits (no recompiles, no drops) at the
        cost of some padding; tighten with ``safety`` < 1 only with a fallback.
        """
        k = min(batch_size, len(graphs))
        nodes = sorted((g.num_nodes for g in graphs), reverse=True)[:k]
        edges = sorted((g.num_edges for g in graphs), reverse=True)[:k]
        trips = sorted((g.num_triplets for g in graphs), reverse=True)[:k]
        return cls(
            max_nodes=round_up(int(sum(nodes) * safety) + 1, pad_multiple),
            max_edges=round_up(int(sum(edges) * safety) + 1, pad_multiple),
            max_triplets=round_up(int(sum(trips) * safety) + 1, pad_multiple),
            max_graphs=batch_size,
        )


def batch_iterator(
    graphs: Sequence[GraphBatch],
    batch_size: int,
    bucket: BucketSpec,
    rng: Optional[np.random.Generator] = None,
    drop_last: bool = False,
) -> Iterator[GraphBatch]:
    """Yield shuffled, padded batches with static shapes.

    The final short batch is padded with empty graphs up to ``max_graphs`` so
    every batch has identical shapes (single compilation).
    """
    order = np.arange(len(graphs))
    if rng is not None:
        rng.shuffle(order)
    for start in range(0, len(order), batch_size):
        idx = order[start : start + batch_size]
        if len(idx) < batch_size and drop_last:
            return
        cat = batch_graphs([graphs[i] for i in idx])
        yield pad_batch(
            cat, bucket.max_nodes, bucket.max_edges, bucket.max_triplets, bucket.max_graphs
        )


@dataclass(frozen=True)
class BucketLadder:
    """Multiple size-class buckets for heterogeneous datasets (e.g. MPF).

    A single worst-case bucket wastes padding when structure sizes span orders
    of magnitude; a ladder groups graphs into size classes (by triplet count,
    the dominant axis) and pads each class's batches to its own bucket —
    one XLA compilation per class.
    """

    buckets: tuple  # tuple[BucketSpec, ...] small -> large
    assignments: np.ndarray  # (num_graphs,) class index

    @classmethod
    def build(
        cls,
        graphs: Sequence[GraphBatch],
        batch_size: int,
        num_classes: int = 3,
        pad_multiple: int = 128,
    ) -> "BucketLadder":
        sizes = np.array([g.num_triplets for g in graphs])
        edges = np.argsort(sizes)
        splits = np.array_split(edges, num_classes)
        assignments = np.zeros(len(graphs), dtype=np.int64)
        buckets = []
        for ci, idx in enumerate(splits):
            if len(idx) == 0:
                continue
            assignments[idx] = len(buckets)
            buckets.append(
                BucketSpec.for_batches(
                    [graphs[i] for i in idx], batch_size, pad_multiple
                )
            )
        return cls(buckets=tuple(buckets), assignments=assignments)

    def padding_efficiency(self, graphs: Sequence[GraphBatch], batch_size: int) -> float:
        """Real triplets / padded triplet slots over one epoch (upper bound 1)."""
        total_real = sum(g.num_triplets for g in graphs)
        total_slots = 0
        for ci, b in enumerate(self.buckets):
            n = int((self.assignments == ci).sum())
            n_batches = -(-n // batch_size)
            total_slots += n_batches * b.max_triplets
        return total_real / max(total_slots, 1)


def ladder_batch_iterator(
    graphs: Sequence[GraphBatch],
    batch_size: int,
    ladder: BucketLadder,
    rng: Optional[np.random.Generator] = None,
) -> Iterator[GraphBatch]:
    """Shuffled batches drawn within size classes, padded per-class."""
    for ci, bucket in enumerate(ladder.buckets):
        idx = np.nonzero(ladder.assignments == ci)[0]
        if rng is not None:
            rng.shuffle(idx)
        for start in range(0, len(idx), batch_size):
            sel = idx[start : start + batch_size]
            cat = batch_graphs([graphs[i] for i in sel])
            yield pad_batch(
                cat,
                bucket.max_nodes,
                bucket.max_edges,
                bucket.max_triplets,
                bucket.max_graphs,
            )


def sharded_batch_iterator(
    graphs: Sequence[GraphBatch],
    per_device_batch: int,
    n_devices: int,
    bucket: BucketSpec,
    rng: Optional[np.random.Generator] = None,
) -> Iterator[GraphBatch]:
    """Yield device-stacked batches for the data-parallel path.

    Each yielded batch has a leading ``n_devices`` axis of identically padded
    shards (see parallel/dp.py). Trailing graphs that do not fill a full
    global batch are padded with empty graphs.
    """
    order = np.arange(len(graphs))
    if rng is not None:
        rng.shuffle(order)
    global_bs = per_device_batch * n_devices
    for start in range(0, len(order), global_bs):
        idx = order[start : start + global_bs]
        yield stack_global_batch(
            [graphs[i] for i in idx], per_device_batch, n_devices, bucket
        )


def stack_global_batch(
    graphs: Sequence[GraphBatch],
    per_device_batch: int,
    n_devices: int,
    bucket: BucketSpec,
) -> GraphBatch:
    """Pad + device-stack a (possibly short) graph list into the dp layout.

    Splits ``graphs`` into ``n_devices`` contiguous shards of
    ``per_device_batch``, pads each to the shared bucket, and stacks along a
    new leading device axis (parallel/dp.py batch layout). When the list is
    short, trailing shards are emitted fully padded with every mask (and the
    real-graph count) zeroed so the dp step's weighted psum ignores them.
    Shared by the in-memory ``sharded_batch_iterator`` and the streaming
    ``stream_sharded_batches`` (data/streaming.py).
    """
    from torch_m3gnet_tpu.parallel.dp import shard_stack

    shards = []
    for d in range(n_devices):
        sel = graphs[d * per_device_batch : (d + 1) * per_device_batch]
        cat = batch_graphs(list(sel) if sel else [graphs[0]])
        padded = pad_batch(
            cat,
            bucket.max_nodes,
            bucket.max_edges,
            bucket.max_triplets,
            bucket.max_graphs,
        )
        if not sel:
            padded = padded.replace(
                node_mask=np.zeros_like(np.asarray(padded.node_mask)),
                edge_mask=np.zeros_like(np.asarray(padded.edge_mask)),
                triplet_mask=np.zeros_like(np.asarray(padded.triplet_mask)),
                graph_mask=np.zeros_like(np.asarray(padded.graph_mask)),
                num_graphs_real=0,
            )
        shards.append(padded)
    return shard_stack(shards)


def split_dataset(
    n: int, val_ratio: float, test_ratio: float, seed: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Random index split (train, val, test)."""
    rng = np.random.default_rng(seed)
    order = rng.permutation(n)
    n_val = int(n * val_ratio)
    n_test = int(n * test_ratio)
    return order[n_val + n_test :], order[:n_val], order[n_val : n_val + n_test]
