#!/usr/bin/env python
"""CornerNet detection training CLI — the vendored corner_net_lite/train.py
entry point.

Loads a paired system/db JSON (object_keypoints_tpu/configs/*.json), builds
the model named by the config file, streams COCO-format batches through the
corner-target renderer, and runs the iteration-based trainer (step LR
decay, periodic snapshots).
"""

import argparse
import os
import pathlib
import sys
import threading
import queue

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def read_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("cfg_file", help="Config name, e.g. CornerNet_Squeeze.")
    parser.add_argument("--annotations", required=True, help="COCO annotation json.")
    parser.add_argument("--images", required=True, help="Image directory.")
    parser.add_argument("--iter", dest="start_iter", type=int, default=0,
                        help="Resume from iteration (rebuilds the decayed LR).")
    parser.add_argument("--batch-size", type=int, default=None,
                        help="Override config batch size (no chunk_sizes needed).")
    parser.add_argument("--snapshot-dir", default="cache/nnet")
    parser.add_argument("--workers", type=int, default=2,
                        help="Prefetch threads (vendored uses processes).")
    parser.add_argument("--max-iter", type=int, default=None,
                        help="Override the config's max_iter.")
    parser.add_argument("--lr", type=float, default=None,
                        help="Override the config's learning_rate.")
    parser.add_argument("--snapshot-every", type=int, default=None,
                        help="Override the config's snapshot cadence.")
    parser.add_argument("--tiny", action="store_true",
                        help="Shrink the model + input contract (matches "
                        "evaluate_detector.py --tiny) for smoke/accuracy "
                        "gates on hosts where the full compile is minutes.")
    return parser.parse_args()


def batch_stream(dataset, db_config, batch_size, workers, saccade=False):
    """Threaded COCO batch producer (replaces the vendored prefetch
    processes + pinned-memory thread, corner_net_lite/train.py:49-87).
    With ``saccade=True`` it runs the crop-around-object zoom sampler
    (sample/cornernet_saccade.py) instead of the plain cornernet one."""
    import cv2
    import jax.numpy as jnp

    from object_keypoints_tpu.data.detection_augment import (
        clip_detections,
        color_jitter,
        lighting,
        random_crop,
        resize_image,
    )
    from object_keypoints_tpu.data.detection_targets import (
        render_corner_targets,
        saccade_sample,
    )
    from object_keypoints_tpu.inference.detector import COCO_MEAN, COCO_STD

    input_size = db_config["input_size"]
    output_size = db_config["output_sizes"][0]
    categories = db_config["categories"]

    q: "queue.Queue" = queue.Queue(maxsize=4)

    def producer(seed):
        rng = np.random.default_rng(seed)
        while True:
            images, targets = [], []
            for _ in range(batch_size):
                ind = int(rng.integers(len(dataset)))
                img = cv2.imread(dataset.image_path(ind))
                dets = dataset.detections(ind).copy()
                if saccade:
                    # geometric part (zoom, crop around a ref object, flip,
                    # attention/validity targets) lives in the sampler
                    img, t = saccade_sample(img, dets, db_config, rng)
                else:
                    # sampler pipeline (sample/cornernet.py:76-99)
                    if db_config["rand_crop"]:
                        img, dets = random_crop(
                            img, dets, db_config["rand_scales"], input_size,
                            border=db_config["border"], rng=rng,
                        )
                    img, dets = resize_image(img, dets, input_size)
                    dets = clip_detections(img, dets)
                    if rng.uniform() > 0.5:  # random horizontal flip
                        img = np.ascontiguousarray(img[:, ::-1])
                        if len(dets):
                            width = img.shape[1]
                            dets[:, [0, 2]] = width - dets[:, [2, 0]] - 1
                    t = None
                img = img[..., ::-1].astype(np.float32) / 255.0  # bgr -> rgb
                if db_config["rand_color"]:
                    img = color_jitter(img, rng)
                    if db_config["lighting"]:
                        img = lighting(img, rng)
                img = (img - COCO_MEAN) / COCO_STD
                images.append(img)
                targets.append(
                    t if t is not None else render_corner_targets(
                        dets, categories, input_size, output_size,
                        gaussian_bump=db_config["gaussian_bump"],
                        gaussian_iou=db_config["gaussian_iou"],
                        gaussian_rad=db_config["gaussian_radius"],
                    )
                )
            batch = {"images": jnp.asarray(np.stack(images))}
            for key in targets[0]:
                if key == "attentions":
                    batch[key] = tuple(
                        jnp.asarray(np.stack([t[key][i] for t in targets]))
                        for i in range(len(targets[0][key]))
                    )
                else:
                    batch[key] = jnp.asarray(np.stack([t[key] for t in targets]))
            q.put(batch)

    for i in range(workers):
        threading.Thread(target=producer, args=(i,), daemon=True).start()
    while True:
        yield q.get()


def main():
    flags = read_args()

    import jax
    import jax.numpy as jnp

    from object_keypoints_tpu.data.coco import CocoDetectionDataset
    from object_keypoints_tpu.models.cornernet import (
        cornernet,
        cornernet_saccade,
        cornernet_squeeze,
    )
    from object_keypoints_tpu.training.detection import (
        saccade_train_step,
        train_detector,
    )
    from object_keypoints_tpu.utils.config import DetectionConfig, SystemConfig, load_cfg

    cfg_path = os.path.join(
        os.path.dirname(__file__), "..", "object_keypoints_tpu", "configs",
        flags.cfg_file + ".json",
    )
    sys_cfg_json, db_cfg_json = load_cfg(cfg_path)
    if flags.tiny:
        from object_keypoints_tpu.utils.config import tiny_db_overrides

        db_cfg_json = dict(db_cfg_json, **tiny_db_overrides(flags.cfg_file))
    system_config = SystemConfig(**{"snapshot_name": flags.cfg_file}).update_config(sys_cfg_json)
    if flags.max_iter is not None:
        system_config.update_config({"max_iter": flags.max_iter})
    if flags.lr is not None:
        system_config.update_config({"learning_rate": flags.lr})
    if flags.snapshot_every is not None:
        system_config.update_config({"snapshot": flags.snapshot_every})
    db_config = DetectionConfig(db_cfg_json)
    batch_size = flags.batch_size or system_config.batch_size

    dataset = CocoDetectionDataset(flags.annotations, flags.images)

    if flags.tiny:
        from object_keypoints_tpu.models.cornernet import tiny_cornernet

        model = tiny_cornernet(flags.cfg_file,
                               categories=db_config["categories"])
    else:
        factory = {
            "CornerNet": cornernet,
            "CornerNet_Squeeze": cornernet_squeeze,
            "CornerNet_Saccade": cornernet_saccade,
        }[flags.cfg_file.split("-")[0]]
        model = factory(categories=db_config["categories"], dtype=jnp.bfloat16)

    dummy = jnp.zeros((1, db_config["input_size"][0], db_config["input_size"][1], 3),
                      model.dtype)
    variables = model.init({"params": jax.random.key(0)}, dummy)

    os.makedirs(flags.snapshot_dir, exist_ok=True)
    saccade = flags.cfg_file.split("-")[0] == "CornerNet_Saccade"
    batches = batch_stream(dataset, db_config, batch_size, flags.workers,
                           saccade=saccade)
    train_detector(
        model, variables, system_config, batches,
        start_iter=flags.start_iter, snapshot_dir=flags.snapshot_dir,
        train_step_fn=saccade_train_step if saccade else None,
    )


if __name__ == "__main__":
    main()
