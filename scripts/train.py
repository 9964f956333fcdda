#!/usr/bin/env python
"""Training CLI — flag parity with the reference scripts/train.py:17-33.

Example:
    python scripts/train.py --train data/train --val data/val \
        --keypoints config/valve.json --batch-size 8 --lr 4e-3
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def read_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workers", "-w", type=int, default=1,
                        help="Prefetch buffer depth (loading is threaded, not process-based).")
    parser.add_argument("--train", type=str, required=True, help="Path to training dataset.")
    parser.add_argument("--val", type=str, required=True, help="Path to validation dataset.")
    parser.add_argument("--fp16", action="store_true",
                        help="Half precision (bfloat16 on TPU).")
    parser.add_argument("--pool", default=1000, type=int,
                        help="How many examples to use in shuffle pool.")
    parser.add_argument("--keypoints", default="config/cups.json",
                        help="Keypoint configuration file.")
    parser.add_argument("--batch-size", default=8, type=int)
    parser.add_argument("--weight-decay", default=0.01, type=float)
    parser.add_argument("--features", default=128, type=int,
                        help="Intermediate features in network.")
    parser.add_argument("--center-weight", default=1.0, type=float,
                        help="Weight for center loss vs. heatmap loss.")
    parser.add_argument("--depth-weight", default=10.0, type=float,
                        help="Weight for depth loss vs. heatmap loss (the "
                        "reference hard-codes 10.0, loss.py:6; exposed here "
                        "because the measured 3D error is depth-dominated).")
    parser.add_argument("--lr", default=4e-3, type=float, help="Learning rate.")
    parser.add_argument("--dropout", default=0.1, type=float)
    parser.add_argument("--resume", default=None)
    parser.add_argument("--epochs", default=10, type=int)
    parser.add_argument("--out", default="runs/keypoints", help="Output/checkpoint directory.")
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--tensorboard", action="store_true",
                        help="Also write a TensorBoard event file under --out "
                        "(the reference's Lightning logger behavior).")
    parser.add_argument("--ckpt-every", default=1, type=int,
                        help="Write the on-disk checkpoint every N epochs (best "
                        "tracking still happens every epoch; orbax IO is ~30s "
                        "per save on this host).")
    return parser.parse_args()


def main():
    flags = read_args()
    with open(flags.keypoints) as f:
        keypoint_config = json.load(f)["keypoint_config"]

    # Multi-host launch path (the reference's mp.spawn/NCCL analog,
    # corner_net_lite/train.py:241-247): run one copy of this CLI per host
    # with COORDINATOR_ADDRESS=host:port NUM_PROCESSES=n PROCESS_ID=i set;
    # the mesh then spans every process's devices (jax.devices() is global
    # after initialize) and XLA shards the batch over all of them.
    # No-op when COORDINATOR_ADDRESS is unset. Exercised by
    # tests/test_multihost.py.
    from object_keypoints_tpu.parallel import initialize_distributed

    initialize_distributed()

    from object_keypoints_tpu.training.loop import TrainConfig, train

    config = TrainConfig(
        train=flags.train,
        val=flags.val,
        keypoint_config=keypoint_config,
        batch_size=flags.batch_size,
        lr=flags.lr,
        weight_decay=flags.weight_decay,
        features=flags.features,
        center_weight=flags.center_weight,
        depth_weight=flags.depth_weight,
        dropout=flags.dropout,
        pool=flags.pool,
        epochs=flags.epochs,
        bf16=flags.fp16,
        seed=flags.seed,
        out_dir=flags.out,
        resume=flags.resume,
        ckpt_every=flags.ckpt_every,
        tensorboard=flags.tensorboard,
    )
    result = train(config)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
