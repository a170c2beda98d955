"""Dataset registry + loader (reference: data/__init__.py:20-95).

Same import-by-name convention: --dataset_mode foo -> module
neuroclear_tpu.data.foo_dataset, class FooDataset (case-insensitive,
subclass of BaseDataset).
"""

from __future__ import annotations

import importlib
import threading
import queue as _queue

import numpy as np

from .base_dataset import BaseDataset


def find_dataset_using_name(dataset_name: str):
    module_name = f"neuroclear_tpu.data.{dataset_name}_dataset"
    datasetlib = importlib.import_module(module_name)
    target = dataset_name.replace("_", "") + "dataset"
    for name, cls in datasetlib.__dict__.items():
        if name.lower() == target.lower() and issubclass(cls, BaseDataset):
            return cls
    raise NotImplementedError(
        f"In {module_name}.py, there should be a subclass of BaseDataset with "
        f"class name that matches {target} in lowercase.")


def get_option_setter(dataset_name: str):
    return find_dataset_using_name(dataset_name).modify_commandline_options


def create_dataset(opt):
    """Wrap the dataset in a (optionally prefetching) iterable with batching
    — the reference used torch DataLoader (data/__init__.py:64-81); here a
    light thread prefetcher keeps host augmentation off the critical path."""
    return CustomDatasetDataLoader(opt)


class CustomDatasetDataLoader:
    def __init__(self, opt):
        self.opt = opt
        dataset_class = find_dataset_using_name(opt.dataset_mode)
        self.dataset = dataset_class(opt)
        print(f"dataset [{type(self.dataset).__name__}] was created")
        self.batch_size = opt.batch_size
        self.serial = getattr(opt, "serial_batches", False)
        self.num_threads = getattr(opt, "num_threads", 0)
        self.max_size = getattr(opt, "max_dataset_size", float("inf"))

    def load_data(self):
        return self

    def __len__(self):
        return min(len(self.dataset), self.max_size)

    def _indices(self):
        n = len(self.dataset)
        order = np.arange(n)
        if not self.serial:
            np.random.shuffle(order)
        return order

    def _collate(self, items):
        out = {}
        for k in items[0]:
            vals = [it[k] for it in items]
            if isinstance(vals[0], np.ndarray):
                out[k] = np.stack(vals, axis=0)
            else:
                out[k] = vals if len(vals) > 1 else vals[0]
        return out

    def __iter__(self):
        order = self._indices()
        batches = [order[i:i + self.batch_size]
                   for i in range(0, len(order), self.batch_size)]

        def produce(idx_batch):
            return self._collate([self.dataset[int(i)] for i in idx_batch])

        count = 0
        if self.num_threads <= 0:
            for b in batches:
                if count * self.batch_size >= self.max_size:
                    return
                count += 1
                yield produce(b)
            return

        q: _queue.Queue = _queue.Queue(maxsize=max(2, self.num_threads))
        stop = object()

        def worker():
            for b in batches:
                q.put(produce(b))
            q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                return
            if count * self.batch_size >= self.max_size:
                return
            count += 1
            yield item
