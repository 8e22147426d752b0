"""Checkpoint persistence and run-directory conventions.

Capability parity with reference src/checkpoint.py and the naming scheme in
main.py:194-206: pickle files ``epoch_%06d.pkl`` / ``params_van.pkl``, with
all run hyperparameters encoded in the directory name (parsed back by
``coulombgas_tpu.analysis.utils.parse_filename``).

Arrays are gathered to host numpy before pickling (device/sharding-agnostic),
and re-committed to the mesh by the training driver on load — the analogue of
the reference's strip-device-axis-on-save / re-shard-on-load
(main.py:222-223, 377-381).
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np

__all__ = [
    "save_data",
    "load_data",
    "ckpt_filename",
    "pretrained_model_filename",
    "to_host",
]


def to_host(pytree):
    """Gather any sharded/device pytree to host numpy for pickling.

    Multi-host safe: arrays that are not fully addressable from this process
    (batch-sharded walkers on a pod slice) are all-gathered across processes
    first — which makes this a COLLECTIVE under multi-host; every process
    must call it (the driver does, and only process 0 writes the file).
    """

    def gather(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(jax.device_get(x))

    return jax.tree.map(gather, pytree)


def save_data(data, filename: str) -> None:
    with open(filename, "wb") as f:
        pickle.dump(to_host(data), f)


def load_data(filename: str):
    with open(filename, "rb") as f:
        return pickle.load(f)


def ckpt_filename(epoch: int, path: str) -> str:
    return os.path.join(path, "epoch_%06d.pkl" % epoch)


def pretrained_model_filename(path: str) -> str:
    return os.path.join(path, "params_van.pkl")
