#!/usr/bin/env python
"""Detector training / evaluation driver.

CLI contract (MonoDETR/tools/train_val.py:36-122): ``--config <yaml>``
(reference-format monodetr.yaml) and ``-e/--evaluate_only``; seeds,
dataloader/model/optimizer/scheduler construction, epoch loop with
per-epoch checkpoints and periodic evaluation, best-by-Car-moderate-AP
tracking.

TPU execution: the jitted data-parallel train step from
monosowa_tpu.train.trainer over the global device mesh; host-side numpy
dataloading (threaded prefetch); orbax checkpoints.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser("monosowa-tpu detector train/val")
    p.add_argument("--config", required=True)
    p.add_argument("-e", "--evaluate_only", action="store_true")
    p.add_argument("--ckpt", default=None, help="checkpoint to evaluate")
    return p.parse_args(argv)


def build_loader(ds, batch_size, shuffle, seed=444, prefetch=4, workers=4):
    """Shuffled epoch iterator with a thread pool assembling batches ahead
    of the device step (the reference's torch DataLoader(num_workers=4)
    role, train_val.py:60-66)."""
    import queue
    import threading
    from concurrent.futures import ThreadPoolExecutor

    from monosowa_tpu.data.kitti_dataset import collate

    rng = np.random.default_rng(seed)

    def make_batch(idxs):
        return collate([ds[int(j)] for j in idxs])

    def epoch_iter():
        order = np.arange(len(ds))
        if shuffle:
            rng.shuffle(order)
        starts = list(range(0, len(order) - batch_size + 1, batch_size))
        q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        pool = ThreadPoolExecutor(max_workers=workers)

        def producer():
            # sliding window: at most `prefetch` batches in flight/buffered
            from collections import deque
            window: deque = deque()
            it = iter(starts)
            for _ in range(prefetch):
                s = next(it, None)
                if s is None:
                    break
                window.append(pool.submit(make_batch, order[s:s + batch_size]))
            while window:
                q.put(window.popleft().result())
                s = next(it, None)
                if s is not None:
                    window.append(
                        pool.submit(make_batch, order[s:s + batch_size]))
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                b = q.get()
                if b is None:
                    break
                yield b
        finally:
            pool.shutdown(wait=False, cancel_futures=True)

    return epoch_iter


def evaluate(model, state, val_ds, cfg, logger=print):
    from monosowa_tpu.train.tester import test
    return test(model, state, val_ds, cfg, logger)


def main(argv=None):
    args = parse_args(argv)

    import jax

    from monosowa_tpu.config import load_yaml
    from monosowa_tpu.data.kitti_dataset import KittiDetectionDataset
    from monosowa_tpu.models.monodetr import build_monodetr
    from monosowa_tpu.parallel import make_mesh, replicated_sharding, shard_batch
    from monosowa_tpu.train import checkpoint as ckpt
    from monosowa_tpu.train.optim import make_optimizer
    from monosowa_tpu.train.trainer import (criterion_config_from_yaml,
                                            init_state, make_train_step)

    cfg = load_yaml(args.config)
    np.random.seed(int(cfg.get("random_seed", 444)))

    ds_cfg = dict(cfg["dataset"])
    root = ds_cfg["root_dir"]
    train_ds = KittiDetectionDataset(root, ds_cfg.get("train_split", "train"),
                                     ds_cfg)
    val_ds = KittiDetectionDataset(root, ds_cfg.get("test_split", "val"),
                                   ds_cfg)

    model = build_monodetr(cfg["model"])
    batch_size = int(ds_cfg.get("batch_size", 16))
    steps_per_epoch = max(len(train_ds) // batch_size, 1)

    opt_cfg = cfg.get("optimizer", {})
    sch_cfg = cfg.get("lr_scheduler", {})
    tx = make_optimizer(
        base_lr=float(opt_cfg.get("lr", 2e-4)),
        weight_decay=float(opt_cfg.get("weight_decay", 1e-4)),
        steps_per_epoch=steps_per_epoch,
        decay_epochs=tuple(sch_cfg.get("decay_list", (125, 165))),
        decay_rate=float(sch_cfg.get("decay_rate", 0.1)),
        warmup_epochs=5 if sch_cfg.get("warmup", False) else 0)

    sample = train_ds[0]
    from monosowa_tpu.data.kitti_dataset import collate
    state = init_state(model, tx, collate([sample]))

    save_path = cfg["trainer"].get("save_path", "outputs")
    os.makedirs(save_path, exist_ok=True)
    start_epoch = 0
    resume = args.ckpt or (ckpt.latest_checkpoint(save_path)
                           if cfg.get("continue_train", False) else None)
    if resume:
        state, start_epoch = ckpt.restore_checkpoint(resume, state)
        print(f"resumed from {resume} (epoch {start_epoch})")

    if args.evaluate_only:
        # tester.mode 'all' (tester_helper.py:28-78): evaluate the best
        # checkpoint first when present, then EVERY epoch checkpoint in
        # epoch order; 'single' evaluates the resumed/--ckpt state only
        mode = str(cfg.get("tester", {}).get("mode", "single"))
        if mode == "all" and not args.ckpt:
            best = ckpt.latest_checkpoint(save_path, tag="best")
            sweep = ([best] if best else []) + \
                ckpt.list_checkpoints(save_path)
            for path in sweep:
                state, ep = ckpt.restore_checkpoint(path, state)
                print(f"== evaluating {os.path.basename(path)} "
                      f"(epoch {ep}) ==")
                evaluate(model, state, val_ds, cfg)
        else:
            evaluate(model, state, val_ds, cfg)
        return

    # data-parallel mesh over the largest device count dividing the batch
    # (torch DataParallel scatters any batch; pjit shards need divisibility)
    all_devices = jax.devices()
    n_dev = max(d for d in range(1, len(all_devices) + 1)
                if batch_size % d == 0)
    mesh = make_mesh(("data",), devices=all_devices[:n_dev])
    state = jax.device_put(state, replicated_sharding(mesh))
    train_step = make_train_step(model,
                                 criterion_config_from_yaml(model,
                                                            cfg["model"]))
    loader = build_loader(train_ds, batch_size, shuffle=True)
    max_epoch = int(cfg["trainer"].get("max_epoch", 195))
    save_freq = int(cfg["trainer"].get("save_frequency", 1))
    best_ap = -1.0

    key = jax.random.PRNGKey(int(cfg.get("random_seed", 444)))
    for epoch in range(start_epoch, max_epoch):
        t0 = time.time()
        losses = {}
        for i, batch in enumerate(loader()):
            key, sub = jax.random.split(key)
            batch = shard_batch({k: np.asarray(v) for k, v in batch.items()
                                 if k != "objects"}, mesh)
            state, losses = train_step(state, batch, sub)
            if i % 30 == 0:
                msg = " ".join(f"{k}={float(v):.3f}"
                               for k, v in sorted(losses.items())
                               if not k[-1].isdigit())
                print(f"epoch {epoch} step {i}/{steps_per_epoch}: {msg}")
        print(f"epoch {epoch} done in {time.time() - t0:.0f}s")
        if (epoch + 1) % save_freq == 0:
            ckpt.save_checkpoint(save_path, state, epoch + 1)
            res = evaluate(model, state, val_ds, cfg)
            ap_mod = res.get("car_3d_strict", {}).get("ap40", [0, 0, 0])[1]
            if ap_mod > best_ap:
                best_ap = ap_mod
                ckpt.save_checkpoint(save_path, state, epoch + 1,
                                     best_ap=best_ap, tag="best")


if __name__ == "__main__":
    main()
