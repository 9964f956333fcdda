#!/usr/bin/env python
"""Convert a reference torch checkpoint into a serving artifact.

The reference's pretrained backbone lives in ``./models/corner_net.pkl``
(perception/models.py:69-78, a torch state_dict pickle); Lightning
checkpoints carry the full KeypointNet under ``state_dict``. Either maps
onto our flax tree via serving.torch_import and exports the same artifact
layout scripts/package_model.py writes.
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def read_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint", help=".pkl / .ckpt torch checkpoint")
    parser.add_argument("--out", required=True, help="Output artifact directory")
    parser.add_argument("--keypoints", required=True,
                        help="Keypoint topology JSON (config/valve.json)")
    parser.add_argument("--features", type=int, default=128)
    return parser.parse_args()


def load_state_dict(path: str) -> dict:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:  # Lightning checkpoint
        obj = obj["state_dict"]
        # Lightning prefixes module attrs with 'model.'
        obj = {k.removeprefix("model."): v for k, v in obj.items()}
    if not isinstance(obj, dict):
        obj = obj.state_dict()
    # bare backbone (net.model.module.hg) -> prefix like the full net
    if any(k.startswith("pre.") for k in obj):
        obj = {f"backbone.{k}": v for k, v in obj.items()}
    return obj


def main():
    flags = read_args()

    from object_keypoints_tpu.serving.export import export_model
    from object_keypoints_tpu.serving.torch_import import import_keypoint_net

    with open(flags.keypoints, "rt") as f:
        keypoint_config = json.load(f)["keypoint_config"]

    state_dict = load_state_dict(flags.checkpoint)
    variables = import_keypoint_net(state_dict)
    model_config = {
        "heatmaps_out": len(keypoint_config) + 1,
        "features": flags.features,
        "dropout": 0.0,
        "keypoint_config": keypoint_config,
    }
    export_model(flags.out, model_config, variables)
    n_params = sum(
        v.size for v in __import__("jax").tree.leaves(variables["params"])
    )
    print(json.dumps({"out": flags.out, "imported_params": int(n_params)}))


if __name__ == "__main__":
    main()
