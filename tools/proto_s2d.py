"""Prototype: space-to-depth packed execution of MVSNet's FeatureNet.

Measured (BASELINE.md round 2): a [.., 8]-minor bf16 activation occupies
16x its logical bytes under (16,128) lane tiling — a pure elementwise pass
over a "15.7 MB" [3,512,640,8] tensor costs the same 1.65 ms as a real
252 MB one. The low-channel featurizer stacks are therefore IO-bound on
padding. Packing p x p pixel blocks into channels makes every layer's
channel count >= 128 (zero padding waste) at a modest FLOP overhead.

Transform: with input packing pin and output packing pout = pin / s_blk
chosen so the BLOCK grid advances an integer number of input blocks per
output block, a k x k stride-s conv becomes a (th x tw) conv over packed
blocks with weights W'[t, pin^2*Ci, pout^2*Co] scattered from the original
kernel — identical math (checked exactly here vs the unpacked forward).

Usage: timeout 1800 python tools/proto_s2d.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import sys
sys.path.insert(0, "/root/repo")


def space_to_depth(x, p):
    """[B, H, W, C] -> [B, H/p, W/p, p*p*C], subpixel-major channel order."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // p, p, w // p, p, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
        b, h // p, w // p, p * p * c)


def depth_to_space(x, p):
    b, hb, wb, pc = x.shape
    c = pc // (p * p)
    x = x.reshape(b, hb, wb, p, p, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
        b, hb * p, wb * p, c)


def pack_conv_kernel(w, pin, pout, stride, pad):
    """[k, k, Ci, Co] -> (W2 [th, tw, pin^2*Ci, pout^2*Co], tmin).

    Output block Y covers out pixels pout*Y + u; input pixel for (u, ky) is
    s*(pout*Y + u) + ky - pad = pin*(bs*Y) + (s*u + ky - pad), with
    bs = s*pout/pin blocks per step (must be an integer). The in-block
    offset t = floor((s*u + ky - pad)/pin) spans [tmin, tmax]; the caller
    pads the packed input by (-tmin, tmax - bs + 1) blocks.
    """
    k, k2, ci, co = w.shape
    assert k == k2
    assert (stride * pout) % pin == 0
    offs = [stride * u + ky - pad for u in range(pout) for ky in range(k)]
    tmin = min(o // pin for o in offs)
    tmax = max(o // pin for o in offs)
    th = tmax - tmin + 1
    w2 = jnp.zeros((th, th, pin * pin * ci, pout * pout * co), w.dtype)
    for uy in range(pout):
        for ux in range(pout):
            for ky in range(k):
                for kx in range(k):
                    oy = stride * uy + ky - pad
                    ox = stride * ux + kx - pad
                    ty, vy = oy // pin - tmin, oy % pin
                    tx, vx = ox // pin - tmin, ox % pin
                    cin0 = (vy * pin + vx) * ci
                    cout0 = (uy * pout + ux) * co
                    w2 = w2.at[ty, tx, cin0:cin0 + ci,
                               cout0:cout0 + co].add(w[ky, kx])
    return w2, tmin


def packed_conv(xp, w, pin, pout, stride, pad):
    """Packed conv: xp [B, Hb, Wb, pin^2*Ci] -> [B, Hb', Wb', pout^2*Co]."""
    w2, tmin = pack_conv_kernel(w, pin, pout, stride, pad)
    th = w2.shape[0]
    bs = (stride * pout) // pin
    # pad the block grid so tap index 0 aligns with block tmin
    xp = jnp.pad(xp, ((0, 0), (-tmin, max(th - bs + tmin, 0)),
                      (-tmin, max(th - bs + tmin, 0)), (0, 0)))
    dn = jax.lax.conv_dimension_numbers(xp.shape, w2.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        xp, w2, window_strides=(bs, bs), padding=[(0, 0), (0, 0)],
        dimension_numbers=dn)


def bn_relu_packed(x, p, scale, bias, mean, var, relu=True):
    shp = x.shape
    c = shp[-1] // (p * p)
    xv = x.reshape(shp[:-1] + (p * p, c))
    inv = scale / jnp.sqrt(var + 1e-5)
    y = (xv - mean) * inv + bias
    if relu:
        y = jnp.maximum(y, 0)
    return y.reshape(shp)


def main():
    from wildmvs.models.mvsnet import FeatureNet

    rng = np.random.default_rng(0)
    B, H, W = 3, 512, 640
    x = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.bfloat16)
    net = FeatureNet(dtype=jnp.bfloat16)
    v = net.init(jax.random.PRNGKey(0), x, False)
    params = v["params"]
    stats = v["batch_stats"]

    # layer specs: (name, k, s, p, relu, bn)
    layers = [("conv0", 3, 1, 1), ("conv1", 3, 1, 1), ("conv2", 5, 2, 2),
              ("conv3", 3, 1, 1), ("conv4", 3, 1, 1), ("conv5", 5, 2, 2),
              ("conv6", 3, 1, 1)]

    def packed_forward(x, pin=4):
        xp = space_to_depth(x, pin)
        p = pin
        for name, k, s, pad in layers:
            w = params[name]["conv"]["conv"]["kernel"].astype(jnp.bfloat16)
            pout = p  # keep packing factor; block grid shrinks on stride
            xp = packed_conv(xp, w, p, pout, s, pad)
            bnp = params[name]["bn"]["bn"]
            bns = stats[name]["bn"]["bn"]
            xp = bn_relu_packed(xp, pout,
                                bnp["scale"].astype(jnp.bfloat16),
                                bnp["bias"].astype(jnp.bfloat16),
                                bns["mean"].astype(jnp.bfloat16),
                                bns["var"].astype(jnp.bfloat16))
            p = pout
        wf = params["feature"]["conv"]["kernel"].astype(jnp.bfloat16)
        bf = params["feature"]["conv"]["bias"].astype(jnp.bfloat16)
        xp = packed_conv(xp, wf, p, p, 1, 1)
        xp = (xp.reshape(xp.shape[:-1] + (p * p, wf.shape[-1]))
              + bf).reshape(xp.shape)
        return depth_to_space(xp, p)

    ref = net.apply(v, x, False)
    got = packed_forward(x)
    err = float(jnp.abs(got.astype(jnp.float32)
                        - ref.astype(jnp.float32)).max())
    scale = float(jnp.abs(ref.astype(jnp.float32)).max())
    print(f"max |packed - ref| = {err:.5f} (feature scale {scale:.3f})",
          flush=True)

    def timeit(name, fn, iters=10):
        @jax.jit
        def chain(x):
            def body(c, eps):
                o = fn(x + eps)
                return c + o.sum().astype(jnp.float32), None
            tot, _ = jax.lax.scan(
                body, jnp.zeros(()),
                jnp.arange(iters, dtype=x.dtype) * jnp.bfloat16(1e-5))
            return tot
        float(chain(x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(x))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best / iters * 1e3:.2f} ms", flush=True)

    timeit("featurenet unpacked", lambda xx: net.apply(v, xx, False))
    timeit("featurenet packed p4", packed_forward)


if __name__ == "__main__":
    main()
