"""Import reference (torch) checkpoints into wildmvs parameter trees.

The reference saves `{epoch, model: state_dict, optimizer, architecture}`
(train.py:205-210) with torch's NCHW/OIHW tensor layouts and DDP's optional
`module.` prefix. Our modules were named to mirror the reference's
(feature.conv0 -> params/feature/conv0/...), so conversion is a mechanical
path-canonicalization + per-leaf transpose:

  torch Conv2d   weight [O, I, kh, kw]        -> kernel [kh, kw, I, O]
  torch Conv3d   weight [O, I, kd, kh, kw]    -> kernel [kd, kh, kw, I, O]
  torch ConvTranspose2d/3d weight [I, O, k..] -> kernel [k.., I, O]
  torch BatchNorm weight/bias/running_mean/running_var
                                              -> bn scale/bias + stats

(the permutations are the inverses of the golden-test oracles in
tests/test_nn_blocks.py). Paths are matched via a canonical form that drops
wrapper layers on both sides: our flax blocks nest an inner `conv`/`deconv`/
`bn` module, torch's Sequential deconvs use numeric indices
(cost_regularization.conv7.0 / .1, models/MVSNet/model.py:57-70).

Entry points:
  convert_state_dict(sd, params, batch_stats) -> (params, batch_stats)
  load_torch_checkpoint(path) -> (state_dict, architecture, epoch)
CLI: python -m wildmvs.train.torch_import <ref.ckpt> <out_dir>
"""
from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

# leaf kinds: how a torch tensor maps onto a flax leaf
_CONV_PERM = {4: (2, 3, 1, 0), 5: (2, 3, 4, 1, 0)}
_DECONV_PERM = {4: (2, 3, 0, 1), 5: (2, 3, 4, 0, 1)}


def _canon_tokens(tokens):
    """Canonicalize a module path: drop numeric segments (torch Sequential
    indices) and wrapper tokens ('module' from DDP, 'model' from the Vis/CVP
    Frontend nesting), collapse repeated segments (our conv/conv, bn/bn
    nesting), drop a trailing structural wrapper segment, and strip _bn/
    _conv suffixes so e.g. `downsample_bn` matches torch's Sequential
    index."""
    out = []
    for tok in tokens:
        if tok.isdigit() or tok in ("module", "model"):
            continue
        if out and out[-1] == tok:
            continue
        out.append(tok)
    while out and out[-1] in ("conv", "deconv", "bn"):
        out.pop()
    return tuple(re.sub(r"_(bn|conv)$", "", t) for t in out)


# Reference naming quirks rewritten into our naming before canonical
# matching. Vis-MVSNet's UNet registers blocks under ListModule string keys
# f"{prefix}{scale}_{idx}" (nn_utils.py:209-255) and BasicBlock keeps
# conv/bn as siblings (nn_utils.py:123-171); CVP camelCases featurePyramid
# (net.py:91). The patterns are specific enough to be applied to every
# architecture's keys unconditionally.
_REWRITES = [
    # UNet enc/bottom blocks: enc_blocks.<prefix><scale>_<idx>.<j>. ->
    # enc<idx>.block<j>.   (bottom blocks share the running idx)
    (re.compile(r"(?:bottom|enc)_blocks\.[^.]*_(\d+)\.(\d+)\."),
     r"enc\1.block\2."),
    # UNet dec blocks: .0 deconv / .1 post-concat conv / .2.<j> res blocks
    (re.compile(r"(?:dec|head)_blocks\.[^.]*_(\d+)\.0\."), r"dec\1_deconv."),
    (re.compile(r"(?:dec|head)_blocks\.[^.]*_(\d+)\.1\."), r"dec\1_conv."),
    (re.compile(r"(?:dec|head)_blocks\.[^.]*_(\d+)\.2\.(\d+)\."),
     r"dec\1_res.block\2."),
    # BasicBlock siblings -> our fused blocks
    (re.compile(r"\.bn1\."), ".conv1.bn."),
    (re.compile(r"\.bn2\."), ".conv2.bn."),
    (re.compile(r"\.downsample\.0\."), ".downsample_conv."),
    (re.compile(r"\.downsample\.1\."), ".downsample_bn."),
    # FeatExt / UncertNet Sequential(conv, bn, relu) wrappers
    (re.compile(r"\.init_conv\.0\."), ".init_conv.conv."),
    (re.compile(r"\.init_conv\.1\."), ".init_conv.bn."),
    (re.compile(r"\.head_convs\.(\d+)\."), r".head\1."),
    # RegPair is a bare conv here (model_cas.py:51-59)
    (re.compile(r"\.reg_pair\.final_conv\."), ".reg_pair."),
    # CVP camelCase
    (re.compile(r"\.featurePyramid\."), ".feature_pyramid."),
    (re.compile(r"^featurePyramid\."), "feature_pyramid."),
]


def _rewrite_key(key: str) -> str:
    for pat, repl in _REWRITES:
        key = pat.sub(repl, key)
    return key


def _index_torch(sd: Dict[str, np.ndarray]):
    """Group torch tensors by canonical module path and leaf kind."""
    rewritten = {k: _rewrite_key(k) for k in sd}
    # find BN modules: parents owning a running_mean
    bn_parents = {v.rsplit(".", 1)[0] for v in rewritten.values()
                  if v.endswith("running_mean")}
    table = {}
    for orig, val in sd.items():
        key = rewritten[orig]
        if key.endswith("num_batches_tracked"):
            continue
        parent, leaf = key.rsplit(".", 1) if "." in key else ("", key)
        tokens = [t for t in parent.split(".") if t]
        canon = _canon_tokens(tokens)
        val = np.asarray(val)
        if parent in bn_parents:
            kind = {"weight": "bn_scale", "bias": "bn_bias",
                    "running_mean": "bn_mean",
                    "running_var": "bn_var"}[leaf]
        elif leaf == "weight" and val.ndim >= 4:
            kind = "conv_kernel"
        elif leaf == "bias":
            kind = "conv_bias"
        else:
            kind = "param"  # bare parameters, e.g. the softmin `temp`
            canon = canon + (leaf,) if leaf not in ("weight",) else canon
        if (canon, kind) in table:
            raise ValueError(f"ambiguous torch key {orig} -> {canon}/{kind}")
        table[(canon, kind)] = (orig, val)
    return table


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,))
    else:
        yield prefix, tree


def _unflatten(leaves):
    root: dict = {}
    for path, val in leaves:
        node = root
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = val
    return root


def _our_leaf_kind(path):
    """(canonical module path, kind, is_deconv) for one of our leaves."""
    *mods, leaf = path
    deconv = "deconv" in mods
    if leaf in ("scale", "bias") and "bn" in mods:
        kind = "bn_scale" if leaf == "scale" else "bn_bias"
    elif leaf == "mean":
        kind = "bn_mean"
    elif leaf == "var":
        kind = "bn_var"
    elif leaf == "kernel":
        kind = "conv_kernel"
    elif leaf == "bias":
        kind = "conv_bias"
    else:
        kind = "param"
    canon = _canon_tokens(list(mods))
    if kind == "param":
        canon = canon + (leaf,)
    deconv = deconv or any(m.endswith("deconv") for m in mods)
    return canon, kind, deconv


def convert_state_dict(sd: Dict[str, np.ndarray], params, batch_stats,
                       strict: bool = True) -> Tuple[dict, dict]:
    """Fill our (params, batch_stats) template trees from a torch
    state_dict. Shapes are checked after the layout transpose; with
    strict=True every template leaf must be matched."""
    table = _index_torch(sd)
    used = set()
    missing = []

    def fill(tree):
        out = []
        for path, tmpl in _flatten(tree):
            canon, kind, deconv = _our_leaf_kind(path)
            hit = table.get((canon, kind))
            if hit is None:
                missing.append("/".join(path))
                out.append((path, tmpl))
                continue
            key, val = hit
            used.add(key)
            if kind == "conv_kernel":
                perm = (_DECONV_PERM if deconv else _CONV_PERM)[val.ndim]
                val = val.transpose(perm)
            tmpl_arr = np.asarray(tmpl)
            if val.shape != tmpl_arr.shape:
                if kind == "param" and val.size == tmpl_arr.size:
                    val = val.reshape(tmpl_arr.shape)  # (1,)-scalars etc.
                else:
                    raise ValueError(
                        f"shape mismatch importing {key} -> "
                        f"{'/'.join(path)}: {val.shape} vs {tmpl_arr.shape}")
            out.append((path, np.asarray(val, dtype=tmpl_arr.dtype)))
        return _unflatten(out)

    new_params = fill(params)
    new_stats = fill(batch_stats)
    if strict:
        unused = [k for k in sd
                  if k not in used
                  and not k.endswith("num_batches_tracked")]
        if missing or unused:
            raise ValueError(
                f"torch import mismatch: {len(missing)} unmatched template "
                f"leaves {missing[:8]}, {len(unused)} unused torch keys "
                f"{unused[:8]}")
    return new_params, new_stats


def load_torch_checkpoint(path):
    """Read a reference checkpoint file -> (state_dict as numpy,
    architecture, epoch). Parity: train.py:205-210's dict layout."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model"] if "model" in ckpt else ckpt
    sd = {k: v.detach().cpu().numpy() for k, v in sd.items()
          if hasattr(v, "detach")}
    return sd, ckpt.get("architecture"), ckpt.get("epoch", -1)


def import_checkpoint(ckpt_path, out_dir, architecture: str | None = None,
                      num_depth: int = 192):
    """Convert a reference .ckpt into an orbax checkpoint our CLIs load."""
    import jax
    import jax.numpy as jnp
    from ..models.api import build_model
    from .checkpoint import save_params

    sd, arch, epoch = load_torch_checkpoint(ckpt_path)
    architecture = architecture or arch
    assert architecture, "checkpoint has no architecture key; pass one"
    kwargs = {"num_depth": num_depth} if architecture.startswith("mvsnet") \
        else {}
    model = build_model(architecture, **kwargs)
    b, n, h, w = 1, 3, 64, 64
    imgs = jnp.zeros((b, n, h, w, 3))
    K = jnp.tile(jnp.eye(3) * 50, (b, n, 1, 1)).at[..., 2, 2].set(1.0)
    R = jnp.tile(jnp.eye(3), (b, n, 1, 1))
    t = jnp.zeros((b, n, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), imgs, K, R, t,
                           jnp.ones((b, n)), jnp.full((b, n), 2.0),
                           train=False)
    params, stats = convert_state_dict(sd, variables["params"],
                                       variables.get("batch_stats", {}))
    save_params(out_dir, params, stats, architecture, epoch=max(epoch, 0))
    return architecture


def main(argv=None):
    import argparse
    import os
    p = argparse.ArgumentParser(
        description="convert a reference torch .ckpt to a wildmvs "
                    "checkpoint")
    p.add_argument("ckpt", help="reference model_*.ckpt file")
    p.add_argument("out_dir", help="output checkpoint directory")
    p.add_argument("--architecture", default=None)
    p.add_argument("--num_depth", type=int, default=192)
    a = p.parse_args(argv)
    # conversion is pure host work — never compile on the TPU for it
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    arch = import_checkpoint(a.ckpt, a.out_dir, a.architecture, a.num_depth)
    print(f"imported {a.ckpt} ({arch}) -> {a.out_dir}")


if __name__ == "__main__":
    main()
