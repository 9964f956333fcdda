"""Model export: the serving artifact and its inference contract.

Reference: scripts/package_model.py traces the Lightning checkpoint to
TorchScript with a (2, 3, 511, 511) stereo dummy and the contract
``frames -> (sigmoid(heatmap[-1]), depth[-1], centers[-1])``
(package_model.py:26-42), consumed by pipeline.InferenceComponent.

Here the artifact is a directory:
    config.json   — model hyperparameters + keypoint config
    params.msgpack — flax params + batch_stats (float32)

``load_inference_fn`` rebuilds the model and returns a jitted function with
the *same* contract and layouts as the reference TorchScript module: input
(N, 3, H, W) float32, outputs (N, K, h, w) sigmoid heatmaps, (N, K, h, w)
depth, (N, T, 2, h, w) center offsets — so the downstream pipeline code is
drop-in. Internally everything runs NHWC/bf16-capable.
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
from flax import serialization

from object_keypoints_tpu.models import KeypointNet
from object_keypoints_tpu.models.keypoint_net import nhwc_outputs_to_reference

CONFIG_NAME = "config.json"
PARAMS_NAME = "params.msgpack"
QUANT_NAME = "quant.json"


def model_from_config(config: dict, dtype=jnp.float32) -> KeypointNet:
    return KeypointNet(
        heatmaps_out=config["heatmaps_out"],
        features=config.get("features", 128),
        dropout=config.get("dropout", 0.1),
        stacks=config.get("stacks", 2),
        levels=config.get("levels", 4),
        dims=tuple(config.get("dims", (256, 256, 384, 384, 512))),
        mods=tuple(config.get("mods", (2, 2, 2, 2, 4))),
        stem_features=tuple(config.get("stem_features", (128, 256))),
        cnv_dim=config.get("cnv_dim", 256),
        dtype=dtype,
    )


def export_model(path: str, config: dict, variables, quant_scales: dict = None) -> None:
    """Write the serving artifact (jit-reloadable params + config).

    ``quant_scales`` (optional): per-conv activation max-abs from
    serving.quantize.calibrate_activation_scales — stored alongside so the
    artifact can serve int8 (the reference's TorchScript artifact has no
    quantized analog; this is the TPU-native extra, ~1.3x on v5e)."""
    os.makedirs(path, exist_ok=True)
    if quant_scales:
        with open(os.path.join(path, QUANT_NAME), "wt") as f:
            json.dump(quant_scales, f, indent=2, sort_keys=True)
    to_save = {
        "params": jax.tree.map(lambda x: np.asarray(x, np.float32), variables["params"]),
        "batch_stats": jax.tree.map(
            lambda x: np.asarray(x, np.float32), variables.get("batch_stats", {})
        ),
    }
    with open(os.path.join(path, CONFIG_NAME), "wt") as f:
        json.dump(config, f, indent=2)
    # atomic write: a killed process must not leave a truncated artifact
    tmp = os.path.join(path, PARAMS_NAME + ".tmp")
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(to_save))
    os.replace(tmp, os.path.join(path, PARAMS_NAME))


def load_model(path: str, dtype=jnp.float32):
    """Load (model, variables, config) from an exported artifact."""
    with open(os.path.join(path, CONFIG_NAME), "rt") as f:
        config = json.load(f)
    model = model_from_config(config, dtype=dtype)
    dummy = jnp.zeros((1, config.get("input_size", 511), config.get("input_size", 511), 3))
    template = model.init({"params": jax.random.key(0)}, dummy, train=False)
    template = {
        "params": template["params"],
        "batch_stats": template.get("batch_stats", {}),
    }
    with open(os.path.join(path, PARAMS_NAME), "rb") as f:
        restored = serialization.from_bytes(template, f.read())
    return model, restored, config


def load_quant_scales(path: str):
    """Per-conv activation scales saved with the artifact, or None."""
    qpath = os.path.join(path, QUANT_NAME)
    if not os.path.exists(qpath):
        return None
    with open(qpath, "rt") as f:
        return json.load(f)


def make_inference_fn(model: KeypointNet, variables, dtype=jnp.float32,
                      quant_scales: dict = None):
    """Jitted reference-contract inference: NCHW in, NCHW-style out.

    With ``quant_scales`` the eligible convs run int8 (serving.quantize)."""
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    def apply_model(x):
        v = {"params": params, "batch_stats": batch_stats}
        if quant_scales:
            from object_keypoints_tpu.serving.quantize import quantized_apply

            return quantized_apply(model, v, quant_scales, x, train=False)
        return model.apply(v, x, train=False)

    @jax.jit
    def infer(frames):
        x = jnp.transpose(jnp.asarray(frames, dtype), (0, 2, 3, 1))  # NCHW -> NHWC
        outs = apply_model(x)
        heat, depth, centers = nhwc_outputs_to_reference(outs, stack=-1)
        return (
            heat.astype(jnp.float32),
            depth.astype(jnp.float32),
            centers.astype(jnp.float32),
        )

    return infer


def load_inference_fn(path: str, dtype=jnp.float32, quantize: str = "auto"):
    """quantize: "auto" (int8 iff quant.json exists), "never", or "require"."""
    model, variables, _ = load_model(path, dtype=dtype)
    scales = None if quantize == "never" else load_quant_scales(path)
    if quantize == "require" and not scales:
        raise FileNotFoundError(f"no {QUANT_NAME} in artifact {path}")
    return make_inference_fn(model, variables, dtype=dtype, quant_scales=scales)
