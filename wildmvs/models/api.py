"""The uniform model contract shared by all architectures.

Parity: the reference's single calling convention (SURVEY §1): every model is
called as  model(imgs, K, R, t, depth_min, depth_max, reference_frame=0, **kw)
and returns the dict
    {"depth":                  [B, H', W'] finest depth estimate,
     "depth_est_list":         list of per-scale depths (finest first),
     "depth_pair_list":        list (per scale) of per-source-pair
                               (depth [B,1,h,w], (uncertainty [B,1,h,w],))
                               entries (empty for non-Vis architectures),
     "photometric_confidence": [B, H', W'] or [B, S, H', W'] confidence}
(models/MVSNet/model.py:178-218, models/VisMVSNet/frontend.py:26-109,
models/CVP_MVSNet/frontend.py:10-38.)

Inputs here are channels-last: imgs [B, N, H, W, 3]; K/R [B, N, 3, 3];
t [B, N, 3, 1]; depth_min/max [B, N]. `reference_frame` must be a static
python int (it selects views at trace time, as in the reference where it is
the process rank).

`imgs` may instead be a list/tuple of per-view [B, Hi, Wi, 3] arrays with
HETEROGENEOUS sizes — the in-the-wild eval contract (the reference accepts
lists at model.py:179-182 / frontend.py:43-44, and its MegaDepth/YFCC test
samples genuinely carry per-view sizes, md_yao.py:126). Views are unbound
at trace time, so every shape stays static for XLA.
"""
from __future__ import annotations

from typing import Any, Callable, Dict

MODEL_REGISTRY: Dict[str, Callable[..., Any]] = {}


def view_list(imgs):
    """Normalize the `imgs` input to (views, ragged): a per-view list of
    [B, Hi, Wi, C] arrays plus whether sizes differ across views. Uniform
    lists are NOT restacked — callers stack when they want the batched
    path."""
    if isinstance(imgs, (list, tuple)):
        views = list(imgs)
        ragged = len({tuple(v.shape[1:3]) for v in views}) > 1
        return views, ragged
    return [imgs[:, i] for i in range(imgs.shape[1])], False


def register_model(name: str):
    def deco(cls):
        MODEL_REGISTRY[name] = cls
        return cls
    return deco


def build_model(architecture: str, **kwargs):
    """Instantiate a model by the reference's architecture string
    (mvsnet | mvsnet-s | vis_mvsnet | cvp_mvsnet; train.py:263)."""
    if architecture == "mvsnet":
        return MODEL_REGISTRY["mvsnet"](aggregation="variance", **kwargs)
    if architecture == "mvsnet-s":
        return MODEL_REGISTRY["mvsnet"](aggregation="softmin", **kwargs)
    if architecture in MODEL_REGISTRY:
        return MODEL_REGISTRY[architecture](**kwargs)
    raise ValueError(f"unknown architecture: {architecture}")
