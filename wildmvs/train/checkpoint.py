"""Checkpoint save/resume — orbax with self-describing metadata.

Parity: train.py:202-210 (save {epoch, model, optimizer, architecture} every
save_freq epochs), :149-164 (resume from the highest-numbered checkpoint /
warm-start from an explicit one), evaluation/pipeline_utils.py:114-131 (eval
loads the latest checkpoint and reads the architecture string from it).
"""
from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

_CKPT_RE = re.compile(r"model_(\d+)$")


def save_checkpoint(logdir: str | Path, epoch: int, state, architecture: str,
                    extra_meta: Optional[dict] = None) -> Path:
    """Write `model_{epoch:06d}/` (orbax pytree) + metadata.json."""
    logdir = Path(logdir)
    logdir.mkdir(parents=True, exist_ok=True)
    path = (logdir / f"model_{epoch:06d}").resolve()
    ckptr = ocp.StandardCheckpointer()
    tree = {"params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state, "step": state.step}
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    meta = {"epoch": epoch, "architecture": architecture}
    meta.update(extra_meta or {})
    (path / "metadata.json").write_text(json.dumps(meta))
    return path


def save_params(out_dir: str | Path, params, batch_stats, architecture: str,
                epoch: int = 0) -> Path:
    """Write a model-variables-only checkpoint (no optimizer state) in the
    standard layout — used by the torch-checkpoint importer; loadable via
    restore_params / the eval pipeline's load_network."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    path = (out_dir / f"model_{epoch:06d}").resolve()
    ckptr = ocp.StandardCheckpointer()
    tree = {"params": params, "batch_stats": batch_stats}
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    (path / "metadata.json").write_text(json.dumps(
        {"epoch": epoch, "architecture": architecture,
         "imported_from": "torch"}))
    return path


def latest_checkpoint(logdir: str | Path) -> Optional[Path]:
    """Highest-numbered model_* dir. Parity: train.py:151-155."""
    logdir = Path(logdir)
    if not logdir.exists():
        return None
    cands = [(int(m.group(1)), p) for p in logdir.iterdir()
             if (m := _CKPT_RE.match(p.name)) and p.is_dir()]
    if not cands:
        return None
    return max(cands)[1]


def resolve_checkpoint(model_dir: str | Path) -> tuple[Path, str]:
    """Latest checkpoint under a model dir (or the dir itself when it IS a
    checkpoint) plus its self-describing architecture. One place for the
    eval-side loading recipe (parity pipeline_utils.py:114-131), shared by
    the pipeline's load_network and the serving Predictor."""
    ckpt = latest_checkpoint(model_dir) or Path(model_dir)
    return ckpt, load_metadata(ckpt)["architecture"]


def load_metadata(path: str | Path) -> dict:
    return json.loads((Path(path) / "metadata.json").read_text())


def restore_checkpoint(path: str | Path, state):
    """Restore a TrainState's arrays from `path` (structure from `state`)."""
    ckptr = ocp.StandardCheckpointer()
    template = {"params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state, "step": state.step}
    template = jax.tree.map(np.asarray, template)
    tree = ckptr.restore(Path(path).resolve(), template)
    return state.replace(params=tree["params"],
                         batch_stats=tree["batch_stats"],
                         opt_state=tree["opt_state"], step=tree["step"])


def restore_params(path: str | Path, params_template, batch_stats_template):
    """Restore only model variables (eval-time warm start;
    parity train.py:160-164 --loadckpt)."""
    ckptr = ocp.StandardCheckpointer()
    meta = load_metadata(path)
    # restore the raw tree (no template — templated partial restore is not
    # available on all orbax versions) and select the model subtrees
    restored = ckptr.restore(Path(path).resolve())
    params = jax.tree.map(lambda t, r: np.asarray(r).astype(t.dtype),
                          params_template, restored["params"])
    batch_stats = jax.tree.map(lambda t, r: np.asarray(r).astype(t.dtype),
                               batch_stats_template, restored["batch_stats"])
    return params, batch_stats, meta


def save_params_npz(path: str | Path, params, batch_stats,
                    architecture: str, extra_meta: Optional[dict] = None
                    ) -> Path:
    """Single-file model-variables checkpoint (npz) — the git-committable
    form used for in-repo reference weights (e.g. the bench's trained
    production-regime nets).  Same information as save_params, different
    container: flattened "params/..."/"stats/..." keys + a JSON metadata
    entry."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arrs = {}
    for prefix, tree in (("params", params), ("stats", batch_stats)):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        for kp, leaf in flat:
            key = prefix + "/" + "/".join(
                k.key if hasattr(k, "key") else str(k) for k in kp)
            arrs[key] = np.asarray(leaf)
    meta = {"architecture": architecture}
    meta.update(extra_meta or {})
    arrs["__metadata__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrs)
    return path


def load_params_npz(path: str | Path):
    """Inverse of save_params_npz -> (params, batch_stats, metadata)."""
    z = np.load(Path(path))
    meta = json.loads(bytes(z["__metadata__"]).decode())

    def unflatten(prefix):
        root: dict = {}
        for key in z.files:
            if not key.startswith(prefix + "/"):
                continue
            *mods, leaf = key[len(prefix) + 1:].split("/")
            node = root
            for m in mods:
                node = node.setdefault(m, {})
            node[leaf] = z[key]
        return root

    return unflatten("params"), unflatten("stats"), meta
