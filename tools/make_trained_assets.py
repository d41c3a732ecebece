"""Convert a train-CLI orbax checkpoint into a committable npz asset.

The bench's production-regime fields (e.g. vis_eval_1184x1600_N5_trained)
load a trained network from assets/*.npz — single-file, git-friendly,
restored via train.checkpoint.load_params_npz.  This tool takes the
latest checkpoint under a --logdir produced by
`python -m wildmvs.train.cli ...` and writes that asset, recording the
training recipe in the npz metadata for provenance.

Usage: JAX_PLATFORMS=cpu python tools/make_trained_assets.py \
    --logdir /tmp/vis_train --out assets/vis_synth_trained.npz \
    --recipe "synthetic 240ep lr1e-3"
"""
import argparse
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--logdir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--recipe", default="")
    args = p.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import orbax.checkpoint as ocp
    from wildmvs.train.checkpoint import (latest_checkpoint, load_metadata,
                                          save_params_npz)

    ckpt = latest_checkpoint(args.logdir)
    assert ckpt is not None, f"no checkpoint under {args.logdir}"
    meta = load_metadata(ckpt)
    tree = ocp.StandardCheckpointer().restore(Path(ckpt).resolve())
    out = save_params_npz(
        REPO / args.out, tree["params"], tree["batch_stats"],
        meta["architecture"],
        extra_meta={"epoch": meta.get("epoch"), "recipe": args.recipe,
                    "source": "wildmvs.train.cli"})
    print(f"{out} ({out.stat().st_size / 1e6:.2f} MB) "
          f"arch={meta['architecture']} epoch={meta.get('epoch')}")


if __name__ == "__main__":
    main()
