"""Checkpointing: Orbax pytree checkpoints + Keras ``.h5`` interop.

Improvements over the reference, by design (SURVEY §5 "Checkpoint / resume"):

- The **full train state** (params, optimizer moments, step counter, PRNG key)
  is checkpointed — the reference saves weights only
  (``src/UtilsFiles.py:153-164``), silently resetting Adam moments on resume.
- An atomic ``latest`` step pointer (Orbax-managed) so preempted jobs restart
  cleanly without config edits.
- ``.h5`` import/export retains byte-parity interop with the reference's
  ``saved_weights/NeRF_model_epoch_{:03}.h5`` convention (``src/NeRF.py:18-19,
  :342-351``) so reference-trained weights drive the parity harness.

Keras layer mapping (verified against the committed reference checkpoint
``Results/50px_.../NeRF_model_epoch_095.h5``): each sub-model stores 11 Dense
layers in creation order — 8 trunk layers (the 5th has the 289-wide skip
input), then rgb_hidden (280->128), rgb_out (128->3), sigma_out (280->1) for
the view-dir variant; for the xyz-only variant (``src/NeRF.py:248-288``) the
order is trunk x8, rgb_hidden0 (256->256), rgb_hidden (256->128),
rgb_out (128->3), sigma_out (256->1).
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerf_and_dietnerf_tpu.models.mlp import MLPConfig, N_TRUNK_LAYERS

Params = Dict[str, Any]

WEIGHTS_DIRNAME = "saved_weights"                       # reference src/NeRF.py:18
H5_FILENAME_FORMAT = "NeRF_model_epoch_{:03d}.h5"       # reference src/NeRF.py:19
PSNR_DIRNAME = "saved_test_train_psnrs"                 # reference src/UtilsPlots.py:26-28
PSNR_FILENAME_FORMAT = "psnrs_train_test_{:03d}.npy"


def nerf_h5_path(save_location, epoch: int) -> Path:
    """Weight-file path convention (reference ``src/NeRF.py:342-351``)."""
    return Path(save_location) / WEIGHTS_DIRNAME / H5_FILENAME_FORMAT.format(epoch)


def psnr_path(save_location, epoch: int) -> Path:
    """PSNR-history path convention (reference ``src/UtilsPlots.py:234-242``)."""
    return Path(save_location) / PSNR_DIRNAME / PSNR_FILENAME_FORMAT.format(epoch)


# --------------------------------------------------------------------------- #
# Keras .h5 interop                                                            #
# --------------------------------------------------------------------------- #

def _mlp_leaf_order(config: MLPConfig):
    """Parameter-dict keys in Keras Dense creation order."""
    trunk = [("trunk", i) for i in range(N_TRUNK_LAYERS)]
    if config.uses_view_dirs:
        return trunk + [("rgb_hidden",), ("rgb_out",), ("sigma_out",)]
    return trunk + [("rgb_hidden0",), ("rgb_hidden",), ("rgb_out",), ("sigma_out",)]


def _get_leaf(params: Params, key):
    return params[key[0]][key[1]] if len(key) == 2 else params[key[0]]


def _set_leaf(params: Params, key, value):
    if len(key) == 2:
        params[key[0]][key[1]] = value
    else:
        params[key[0]] = value


def load_keras_h5(path, config: MLPConfig, has_fine: bool = True) -> Params:
    """Load a reference-format ``.h5`` checkpoint into our parameter pytree.

    :param path: the ``.h5`` file written by the reference (or by
        :func:`save_keras_h5`).
    :return: ``{"coarse": ..., "fine": ... | None}``.
    """
    import h5py

    def dense_index(name: str) -> int:
        m = re.search(r"dense(?:_(\d+))?$", name)
        return int(m.group(1)) if m and m.group(1) else 0

    out: Params = {}
    with h5py.File(path, "r") as f:
        model_groups = sorted(
            (k for k in f.keys() if len(f[k].keys()) > 0),
            key=lambda k: (len(k), k),  # "model" < "model_1"
        )
        names = ["coarse", "fine"]
        for which, group_name in zip(names, model_groups):
            group = f[group_name]
            layers = sorted(group.keys(), key=dense_index)
            params_one: Params = {"trunk": [None] * N_TRUNK_LAYERS}
            for key, layer in zip(_mlp_leaf_order(config), layers):
                kernel = jnp.asarray(np.array(group[layer]["kernel:0"]))
                bias = jnp.asarray(np.array(group[layer]["bias:0"]))
                _set_leaf(params_one, key, {"kernel": kernel, "bias": bias})
            out[which] = params_one
    if "coarse" not in out:
        raise ValueError(f"no model groups found in {path}")
    out.setdefault("fine", None)
    if not has_fine:
        out["fine"] = None
    return out


def save_keras_h5(path, params: Params, config: MLPConfig) -> None:
    """Write our parameters in the reference's ``.h5`` layout (Keras
    ``save_weights`` format) so the TF reference can load them back."""
    import h5py

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    groups = [("model", params["coarse"])]
    if params.get("fine") is not None:
        groups.append(("model_1", params["fine"]))

    dense_counter = 0
    with h5py.File(path, "w") as f:
        f.attrs["backend"] = "tensorflow"
        f.attrs["layer_names"] = np.array(
            [g[0] for g in groups], dtype=h5py.string_dtype()
        )
        for group_name, params_one in groups:
            g = f.create_group(group_name)
            for key in _mlp_leaf_order(config):
                leaf = _get_leaf(params_one, key)
                layer_name = "dense" if dense_counter == 0 else f"dense_{dense_counter}"
                dense_counter += 1
                lg = g.create_group(layer_name)
                lg.create_dataset("kernel:0", data=np.asarray(leaf["kernel"], np.float32))
                lg.create_dataset("bias:0", data=np.asarray(leaf["bias"], np.float32))


# --------------------------------------------------------------------------- #
# Orbax full-train-state checkpoints                                           #
# --------------------------------------------------------------------------- #

class CheckpointManager:
    """Thin Orbax wrapper: per-epoch full-train-state saves with an atomic
    latest pointer; multi-host safe (Orbax coordinates across processes)."""

    def __init__(self, directory, max_to_keep: Optional[int] = None):
        import orbax.checkpoint as ocp

        self._dir = Path(directory).absolute()
        self._dir.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state) -> None:
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None, template=None):
        import orbax.checkpoint as ocp

        step = self.latest_step() if step is None else step
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()


# --------------------------------------------------------------------------- #
# PSNR history files (reference-compatible npy layout)                         #
# --------------------------------------------------------------------------- #

def save_psnr_history(save_location, epoch: int, psnrs_test, psnrs_train) -> None:
    """Persist the ``(2, E)`` [test; train] PSNR history
    (reference ``src/UtilsFiles.py:167-179``; row order per ``:178``)."""
    path = psnr_path(save_location, epoch)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.save(str(path), (np.asarray(psnrs_test), np.asarray(psnrs_train)))


def load_psnr_history(save_location, epoch: int):
    """Load PSNR history for a resume, or empty lists when absent
    (reference ``src/UtilsFiles.py:197-209``)."""
    path = psnr_path(save_location, epoch)
    if path.exists():
        test, train = np.load(str(path))
        return list(test), list(train)
    return [], []
