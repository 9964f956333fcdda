#!/usr/bin/env python
"""Target visualization harness — the reference DataloadingTest.ipynb
semantics: render one example's heatmap / center-quiver / depth targets
over the frame as image files.
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("sequence", help="Sequence directory.")
    parser.add_argument("--keypoints", default="config/valve.json")
    parser.add_argument("--out", default="dataloading_vis")
    parser.add_argument("--frames", type=int, default=3)
    flags = parser.parse_args()

    import json
    import os

    import numpy as np
    from matplotlib import pyplot

    from object_keypoints_tpu.data.scene import SceneDataset

    with open(flags.keypoints) as f:
        config = json.load(f)
    ds = SceneDataset(flags.sequence, config)
    os.makedirs(flags.out, exist_ok=True)

    for i, example in enumerate(ds):
        if i >= flags.frames:
            break
        fig, axes = pyplot.subplots(1, 4, figsize=(20, 5))
        axes[0].imshow(SceneDataset.to_image(example["frame"]))
        axes[0].set_title("frame")
        axes[1].imshow(example["heatmaps"].sum(axis=-1), cmap="inferno")
        axes[1].set_title("heatmaps (sum)")
        centers = example["centers"]  # (64, 64, T, 2)
        mag = np.linalg.norm(centers, axis=-1).sum(axis=-1)
        ys, xs = np.nonzero(mag > 0)
        axes[2].imshow(mag, cmap="viridis")
        if len(xs):
            u = centers[ys, xs, :, 0].sum(axis=-1)
            v = centers[ys, xs, :, 1].sum(axis=-1)
            axes[2].quiver(xs, ys, u, v, color="w", scale=60)
        axes[2].set_title("center-offset field")
        axes[3].imshow(example["depth"].max(axis=-1), cmap="magma")
        axes[3].set_title("depth discs")
        for ax in axes:
            ax.axis("off")
        fig.savefig(os.path.join(flags.out, f"frame_{i:03d}.jpg"), bbox_inches="tight")
        pyplot.close(fig)
        print(f"wrote {flags.out}/frame_{i:03d}.jpg")


if __name__ == "__main__":
    main()
