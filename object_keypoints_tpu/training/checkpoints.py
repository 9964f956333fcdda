"""Checkpointing via Orbax: best-on-val + resumable train state.

Reference behavior (SURVEY.md §5.4): Lightning ModelCheckpoint keeps top-1
on val_loss with hparams.yaml alongside (scripts/train.py:170-172,53);
--resume restores weights under new hyperparameters (train.py:163-168).
Here: Orbax PyTreeCheckpointer under <dir>/best and <dir>/last plus
hparams.json; the exported serving artifact is written separately
(serving.export).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import numpy as np
import jax
import orbax.checkpoint as ocp


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


class CheckpointManager:
    def __init__(self, directory: str, hparams: Optional[dict] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckpt = ocp.PyTreeCheckpointer()
        self.best_val = float("inf")
        self._best_payload = None  # stashed best, not yet flushed to disk
        # Re-runs/resumes into the same directory must not let an early
        # (worse) validation overwrite a previously stored best: recover
        # the stored best_val from the sidecar written on every flush.
        sidecar = os.path.join(self.directory, "best_val.json")
        if os.path.exists(sidecar):
            with open(sidecar, "rt") as f:
                self.best_val = float(json.load(f)["val_loss"])
        if hparams is not None:
            with open(os.path.join(self.directory, "hparams.json"), "wt") as f:
                json.dump(hparams, f, indent=2)

    def _save(self, name: str, payload: Any):
        path = os.path.join(self.directory, name)
        payload = _to_host(payload)
        if jax.process_count() > 1:
            # Orbax runs cross-process sync barriers inside save() — a
            # rank-0-only call deadlocks the cluster (observed: shutdown
            # barrier timeout). Multi-host saves go through plain msgpack
            # from process 0 instead; restore() reads either format.
            if jax.process_index() == 0:
                from flax import serialization

                tmp = path + ".msgpack.tmp"
                with open(tmp, "wb") as f:
                    f.write(serialization.to_bytes(payload))
                os.replace(tmp, path + ".msgpack")
            return
        self._ckpt.save(path, payload, force=True)

    def save_last(self, state, step: int):
        self._save("last", {"params": state.params, "batch_stats": state.batch_stats,
                            "opt_state": state.opt_state, "step": step})

    def save_if_best(self, state, step: int, val_loss: float,
                     defer: bool = False) -> bool:
        """Keep top-1 on val_loss (ModelCheckpoint save_top_k=1 parity).

        The best payload holds the SERVING state (params/batch_stats/step/
        val_loss) — resume always goes through ``last``, which keeps the
        optimizer. With ``defer=True`` the payload is stashed as a
        DEVICE-side copy and only fetched to the host on the next
        :meth:`flush_best`, so the training loop can track the best EVERY
        epoch while amortizing both the (slow) disk save and the
        device->host transfer to its checkpoint cadence — on a tunneled
        accelerator the eager ~100 MB state fetch cost ~60 s per improving
        epoch (measured round 4). ``jnp.copy`` gives fresh buffers, so the
        stash survives the train step's donated-state buffer reuse."""
        if val_loss < self.best_val:
            import jax.numpy as jnp

            self.best_val = val_loss
            payload = {"params": state.params, "batch_stats": state.batch_stats,
                       "step": step, "val_loss": val_loss}
            if defer:
                self._best_payload = jax.tree.map(
                    lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x,
                    payload,
                )
            else:
                self._best_payload = _to_host(payload)
                self.flush_best()
            return True
        return False

    def flush_best(self):
        """Write any stashed best payload (see ``save_if_best(defer=True)``)."""
        if self._best_payload is None:
            return
        self._save("best", self._best_payload)
        if jax.process_index() == 0:
            tmp = os.path.join(self.directory, "best_val.json.tmp")
            with open(tmp, "wt") as f:
                json.dump({"val_loss": self.best_val}, f)
            os.replace(tmp, os.path.join(self.directory, "best_val.json"))
        self._best_payload = None

    def restore(self, name: str = "last", template: Optional[Any] = None):
        path = os.path.join(self.directory, name)
        msgpack_path = path + ".msgpack"
        use_msgpack = os.path.exists(msgpack_path)
        if use_msgpack and os.path.exists(path):
            # Both formats present (e.g. a multi-host msgpack left next to a
            # newer single-host Orbax save): restore whichever is newer so a
            # stale msgpack never silently shadows fresh training state.
            use_msgpack = os.path.getmtime(msgpack_path) >= os.path.getmtime(path)
            import warnings

            warnings.warn(
                f"both {msgpack_path} and {path} exist; restoring the newer "
                f"({'msgpack' if use_msgpack else 'orbax'}) artifact"
            )
        if use_msgpack:
            from flax import serialization

            with open(msgpack_path, "rb") as f:
                raw = f.read()
            if template is not None:
                return serialization.from_bytes(_to_host(template), raw)
            return serialization.msgpack_restore(raw)
        if template is not None:
            return self._ckpt.restore(path, item=_to_host(template))
        return self._ckpt.restore(path)

    @staticmethod
    def load_hparams(directory: str) -> dict:
        with open(os.path.join(directory, "hparams.json"), "rt") as f:
            return json.load(f)
