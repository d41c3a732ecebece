"""wildmvs — a TPU-native deep multi-view-stereo framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the reference
"Deep MVS Gone Wild" research harness (fdarmon/wild_deep_mvs): four plane-sweep
MVS architectures (MVSNet-variance, MVSNet-softmin, Vis-MVSNet, CVP-MVSNet),
supervised + unsupervised (photometric SSIM) training, and a 3-stage 3D
reconstruction pipeline (depthmap inference -> geometric filtering -> fusion ->
chamfer metrics).

Design principles (TPU-first):
  * channels-last layouts everywhere (NHWC images / features, BDHWC volumes)
  * pure functional geometry (vmap/jit friendly, no data-dependent shapes)
  * plane-sweep warp + aggregation as fused streaming ops (Pallas on TPU)
  * SPMD via jax.sharding Mesh axes (data, view) instead of gloo collectives
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level conveniences (PEP 562) — keep `import wildmvs` light
    if name == "Predictor":
        from .infer import Predictor
        return Predictor
    if name == "build_model":
        from .models import build_model
        return build_model
    raise AttributeError(name)
