"""Threaded prefetch loader: ordering, completeness, bounded buffering."""

import numpy as np

import monosowa_tpu.data.kitti_dataset as kd


class _DS:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((2,), i, np.float32)}


def test_prefetch_loader_order_and_coverage(monkeypatch):
    monkeypatch.setattr(kd, "collate",
                        lambda items: {"x": np.stack([i["x"] for i in items])})
    from tools.train_val import build_loader
    it = build_loader(_DS(10), 3, shuffle=False)
    batches = list(it())
    assert len(batches) == 3
    assert (batches[0]["x"][:, 0] == [0, 1, 2]).all()
    assert (batches[2]["x"][:, 0] == [6, 7, 8]).all()
    # second epoch works (iterator factory, not one-shot)
    assert len(list(it())) == 3


def test_prefetch_loader_shuffles(monkeypatch):
    monkeypatch.setattr(kd, "collate",
                        lambda items: {"x": np.stack([i["x"] for i in items])})
    from tools.train_val import build_loader
    it = build_loader(_DS(64), 8, shuffle=True, seed=1)
    e1 = np.concatenate([b["x"][:, 0] for b in it()])
    e2 = np.concatenate([b["x"][:, 0] for b in it()])
    assert sorted(e1) == list(range(64))
    assert not (e1 == e2).all()          # reshuffled between epochs
