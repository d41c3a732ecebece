"""NN building blocks — flax.linen, channels-last, torch-parity semantics.

Every MVS architecture in the reference is assembled from four primitives:
Conv+BN+ReLU (2D/3D), plain Conv, transposed Conv+BN(+ReLU), and ResNet-style
BasicBlocks (models/MVSNet/module.py:21-108, models/VisMVSNet/nn_utils.py:123-278,
models/CVP_MVSNet/models/modules.py:24-28,296-334).  This module provides them
with torch-matching numerics:

  * convolutions use explicit symmetric padding (torch pads (p, p); XLA 'SAME'
    can split padding asymmetrically for strided convs, which changes results)
  * transposed convolutions reproduce torch's ConvTranspose exactly via
    conv_general_dilated (lhs_dilation = stride, padding (k-1-p, k-1-p+op),
    spatially flipped kernel)
  * BatchNorm uses eps 1e-5 / momentum 0.9 (torch's 0.1 complement)

Layouts: 2D tensors [B, H, W, C]; 3D volumes [B, D, H, W, C].
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _tup(v, n):
    return (v,) * n if isinstance(v, int) else tuple(v)


def _conv3d_via_2d(x, kernel, strides, padding):
    """conv3d as kd depth taps of batched 2D convs + shifted adds.

    XLA's TPU conv3d underuses the MXU at MVS channel counts (~8x slower
    than the equivalent conv2d work on v5e); with depth folded into the
    batch dim each tap is a well-tiled 2D conv and the depth accumulation
    is a few shifted adds. Exact (f32 accumulation-order differences only).

    Args:
      x: [B, D, H, W, Ci]; kernel: [kd, kh, kw, Ci, Co];
      strides/padding: 3-tuples (depth first).
    """
    b, d, h, w, ci = x.shape
    kd = kernel.shape[0]
    sd, pd = strides[0], padding[0]
    dn = jax.lax.conv_dimension_numbers(
        (b * d, h, w, ci), kernel.shape[1:], ("NHWC", "HWIO", "NHWC"))
    d_out = (d + 2 * pd - kd) // sd + 1
    out = None
    for t in range(kd):
        y = jax.lax.conv_general_dilated(
            x.reshape(b * d, h, w, ci), kernel[t],
            window_strides=strides[1:],
            padding=[(padding[1], padding[1]), (padding[2], padding[2])],
            dimension_numbers=dn)
        y = y.reshape((b, d) + y.shape[1:])
        yp = jnp.pad(y, ((0, 0), (pd, pd), (0, 0), (0, 0), (0, 0)))
        contrib = yp[:, t:t + sd * d_out:sd]
        out = contrib if out is None else out + contrib
    return out


def space_to_depth(x, p: int):
    """[B, H, W, C] -> [B, H/p, W/p, p*p*C] (subpixel-major channels)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // p, p, w // p, p, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
        b, h // p, w // p, p * p * c)


def depth_to_space(x, p: int):
    b, hb, wb, pc = x.shape
    c = pc // (p * p)
    x = x.reshape(b, hb, wb, p, p, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
        b, hb * p, wb * p, c)


def _pack_kernel_s2d(w, pin, pout, stride, pad):
    """[k, k, Ci, Co] -> (W2 [th, tw, pin^2*Ci, pout^2*Co], tmin, bs).

    The space-to-depth conv transform: output block Y holds out pixels
    pout*Y + u; the input pixel for (u, ky) is pin*(bs*Y) + (s*u + ky -
    pad) with bs = s*pout/pin whole blocks per step. Identical math (the
    scattered entries are the original weights; the rest are zeros); the
    dense fill factor is k^2*pout^2 / (th^2*pin^2*pout^2), so this only
    pays off where lane padding of the UNPACKED activations wastes more —
    the C <= 16 layers (a [.., 8]-minor bf16 tensor occupies 16x its
    logical bytes; see BASELINE.md round 2).
    """
    k, k2, ci, co = w.shape
    assert k == k2 and (stride * pout) % pin == 0
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
                    w2 = w2.at[ty, tx,
                               (vy * pin + vx) * ci:(vy * pin + vx + 1) * ci,
                               (uy * pout + ux) * co:
                               (uy * pout + ux + 1) * co].add(w[ky, kx])
    return w2, tmin, (stride * pout) // pin


def _conv_s2d(xp, kernel, pin, pout, stride, pad):
    """Packed conv: [B, Hb, Wb, pin^2*Ci] -> [B, Hb', Wb', pout^2*Co]."""
    w2, tmin, bs = _pack_kernel_s2d(kernel, pin, pout, stride, pad)
    th = w2.shape[0]
    grow = max(th - bs + tmin, 0)
    xp = jnp.pad(xp, ((0, 0), (-tmin, grow), (-tmin, grow), (0, 0)))
    dn = jax.lax.conv_dimension_numbers(xp.shape, w2.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        xp, w2, window_strides=(bs, bs), padding=[(0, 0), (0, 0)],
        dimension_numbers=dn)


def _block_halo(x, ci, hl, hr):
    """[B, Db, H, W, p*Ci] -> [B, Db, H, W, (hl+p+hr)*Ci]: prepend the last
    hl planes of the previous block and append the first hr planes of the
    next (zeros at the volume edges — the conv3d's depth zero-padding)."""
    if hl == 0 and hr == 0:
        return x
    parts = []
    if hl:
        prev = jnp.pad(x[:, :-1, :, :, -hl * ci:],
                       ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
        parts.append(prev)
    parts.append(x)
    if hr:
        nxt = jnp.pad(x[:, 1:, :, :, :hr * ci],
                      ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
        parts.append(nxt)
    return jnp.concatenate(parts, -1)


def _pack_kernel3d_block(kernel, p, sd, pd):
    """3D kernel [kd, kh, kw, Ci, Co] -> halo-block 2D kernel for the
    BLOCK-depth-packed conv (see TorchConv.packed_block): depth folded into
    channels in blocks of p planes, block count constant across the net
    (stride-2 depth halves p). Returns (w2 [kh, kw, (hl+p+hr)*Ci, pout*Co],
    hl, hr, pout) with pout = p // sd and hl/hr the neighbor-plane halo."""
    kd, kh, kw, ci, co = kernel.shape
    assert p % sd == 0, (p, sd)
    pout = p // sd
    offs = [uo * sd - pd + kdi for uo in range(pout) for kdi in range(kd)]
    hl, hr = max(0, -min(offs)), max(0, max(offs) - (p - 1))
    assert hl <= p and hr <= p, (hl, hr, p)  # only immediate neighbors
    w2 = jnp.zeros((kh, kw, (hl + p + hr) * ci, pout * co), kernel.dtype)
    for uo in range(pout):
        for kdi in range(kd):
            d = uo * sd - pd + kdi + hl
            w2 = w2.at[:, :, d * ci:(d + 1) * ci,
                       uo * co:(uo + 1) * co].set(kernel[kdi])
    return w2, hl, hr, pout


def _pack_kernel3d_block_transpose(kernel, p, sd, pd, opd):
    """Transposed-conv analogue of `_pack_kernel3d_block`: input plane d
    feeds output plane d*sd + kd' - pd; pout = p*sd (requires
    kd + opd - 2*pd == sd so blocks stay aligned)."""
    kd, kh, kw, ci, co = kernel.shape
    assert kd + opd - 2 * pd == sd, (kd, opd, pd, sd)
    pout = p * sd
    entries = []
    for uo in range(pout):
        for kdi in range(kd):
            num = uo + pd - kdi
            if num % sd:
                continue
            entries.append((num // sd, kdi, uo))
    ds = [d for d, _, _ in entries]
    hl, hr = max(0, -min(ds)), max(0, max(ds) - (p - 1))
    assert hl <= p and hr <= p, (hl, hr, p)
    w2 = jnp.zeros((kh, kw, (hl + p + hr) * ci, pout * co), kernel.dtype)
    for d, kdi, uo in entries:
        w2 = w2.at[:, :, (d + hl) * ci:(d + hl + 1) * ci,
                   uo * co:(uo + 1) * co].set(kernel[kdi])
    return w2, hl, hr, pout


def _packed_out_depth(D, kd, sd, pd):
    """Output depth of a packed conv3d (see TorchConv.packed_depth)."""
    return (D + 2 * pd - kd) // sd + 1


def _packed_out_depth_transpose(D, kd, sd, pd, opd):
    return (D - 1) * sd - 2 * pd + kd + opd


def _pack_kernel3d(kernel, D, sd, pd):
    """3D kernel [kd, kh, kw, Ci, Co] -> block-banded 2D kernel
    [kh, kw, D*Ci, Dout*Co] for the depth-packed conv (see TorchConv)."""
    kd, kh, kw, ci, co = kernel.shape
    dout = (D + 2 * pd - kd) // sd + 1
    w2 = jnp.zeros((kh, kw, D * ci, dout * co), kernel.dtype)
    for do in range(dout):
        for kdi in range(kd):
            d = do * sd - pd + kdi
            if 0 <= d < D:
                w2 = w2.at[:, :, d * ci:(d + 1) * ci,
                           do * co:(do + 1) * co].set(kernel[kdi])
    return w2, dout


def _pack_kernel3d_transpose(kernel, D, sd, pd, opd):
    """Transposed-conv analogue of `_pack_kernel3d`: input slab d feeds
    output slab d*sd + kd' - pd."""
    kd, kh, kw, ci, co = kernel.shape
    dout = (D - 1) * sd - 2 * pd + kd + opd
    w2 = jnp.zeros((kh, kw, D * ci, dout * co), kernel.dtype)
    for d in range(D):
        for kdi in range(kd):
            do = d * sd + kdi - pd
            if 0 <= do < dout:
                w2 = w2.at[:, :, d * ci:(d + 1) * ci,
                           do * co:(do + 1) * co].set(kernel[kdi])
    return w2, dout


class TorchConv(nn.Module):
    """Conv with torch-style explicit symmetric padding.

    kernel layout [*k, in, out]; bias optional (reference convs are bias-free
    except CVP's LeakyReLU convs and the probability heads).

    Depth-packed mode (``packed_depth=D``): the input is a 3D volume with
    its depth FOLDED INTO CHANNELS, [B, H, W, D*Ci] (d-major). The 3x3x3
    conv runs as ONE dense 3x3 conv2d with a block-banded [kh, kw, D*Ci,
    Dout*Co] kernel built from the same [kd, kh, kw, Ci, Co] parameter —
    identical math (the off-band blocks are zero), identical param shapes/
    paths, but the MXU sees D*Ci>=128 contraction/output dims instead of
    the 16-channel matmuls that run at ~3% utilization (the measured CVP
    regnet bottleneck, BASELINE.md round 2). Dense-vs-banded FLOP overhead
    is D/3 per conv, a bargain for small D. Returns packed [B, H', W',
    Dout*Co]."""
    features: int
    kernel_size: Sequence[int] | int = 3
    strides: Sequence[int] | int = 1
    padding: Sequence[int] | int = 1
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, packed_depth: int | None = None,
                 packed_s2d: tuple | None = None,
                 packed_block: int | None = None):
        nd = 3 if (packed_depth is not None or packed_block is not None) \
            else x.ndim - 2
        k = _tup(self.kernel_size, nd)
        s = _tup(self.strides, nd)
        p = _tup(self.padding, nd)
        if packed_block is not None:
            # BLOCK-depth-packed conv3d: input [B, Db, H, W, p*Ci] with the
            # depth folded into channels in Db blocks of p planes. One dense
            # 2D conv per call (blocks batched) with a halo-plane concat for
            # the cross-block depth taps — same params/math as the unpacked
            # conv3d, but the MXU contracts (hl+p+hr)*Ci >= 128 channels
            # instead of the tiny-C matmuls that run at ~3% utilization.
            pb = packed_block
            b, db, h, w, pc = x.shape
            ci = pc // pb
            kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                k + (ci, self.features), jnp.float32)
            w2, hl, hr, pout = _pack_kernel3d_block(
                kernel.astype(self.dtype), pb, s[0], p[0])
            xh = _block_halo(x.astype(self.dtype), ci, hl, hr)
            dn = jax.lax.conv_dimension_numbers(
                (b * db,) + xh.shape[2:], w2.shape, ("NHWC", "HWIO", "NHWC"))
            y = jax.lax.conv_general_dilated(
                xh.reshape((b * db,) + xh.shape[2:]), w2,
                window_strides=s[1:],
                padding=[(p[1], p[1]), (p[2], p[2])], dimension_numbers=dn)
            y = y.reshape((b, db) + y.shape[1:])
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros,
                                  (self.features,), jnp.float32)
                y = y + jnp.tile(bias.astype(self.dtype), pout)
            return y
        if packed_depth is not None:
            D = packed_depth
            ci = x.shape[-1] // D
            kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                k + (ci, self.features), jnp.float32)
            w2, dout = _pack_kernel3d(kernel.astype(self.dtype), D, s[0], p[0])
            dn = jax.lax.conv_dimension_numbers(
                x.shape, w2.shape, ("NHWC", "HWIO", "NHWC"))
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), w2, window_strides=s[1:],
                padding=[(p[1], p[1]), (p[2], p[2])], dimension_numbers=dn)
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros,
                                  (self.features,), jnp.float32)
                y = y + jnp.tile(bias.astype(self.dtype), dout)
            return y
        if packed_s2d is not None:
            # space-to-depth packed 2D conv (see _pack_kernel_s2d): the
            # input is [B, H/pin, W/pin, pin^2*Ci]. Parameters live at the
            # usual nn.Conv path — materialized by a dummy call (DCE'd)
            # and read back for the block-scattered kernel.
            pin, pout = packed_s2d
            assert k[0] == k[1] and s[0] == s[1] and p[0] == p[1]
            ci = x.shape[-1] // (pin * pin)
            conv = nn.Conv(self.features, kernel_size=k, strides=s,
                           padding=[(pi, pi) for pi in p],
                           use_bias=self.use_bias, dtype=self.dtype,
                           name="conv")
            _ = conv(jnp.zeros((1,) + k + (ci,), x.dtype))
            kernel = conv.variables["params"]["kernel"].astype(self.dtype)
            y = _conv_s2d(x.astype(self.dtype), kernel, pin, pout,
                          s[0], p[0])
            if self.use_bias:
                bias = conv.variables["params"]["bias"].astype(self.dtype)
                y = y + jnp.tile(bias, pout * pout)
            return y
        if nd == 3:
            # XLA's conv3d runs ~8x below its conv2d on these shapes (v5e);
            # decompose over depth taps into batched 2D convs + shifted adds
            in_ch = x.shape[-1]
            kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                k + (in_ch, self.features), jnp.float32)
            y = _conv3d_via_2d(x.astype(self.dtype), kernel.astype(self.dtype),
                               s, p)
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros,
                                  (self.features,), jnp.float32)
                y = y + bias.astype(self.dtype)
            return y
        return nn.Conv(self.features, kernel_size=k, strides=s,
                       padding=[(pi, pi) for pi in p], use_bias=self.use_bias,
                       dtype=self.dtype, name="conv")(x)


def _conv3d_transpose_via_2d(x, kernel, strides, padding, output_padding):
    """Transposed conv3d as kd depth taps of 2D transposed convs + strided
    scatter-adds over the output depth (same motivation as _conv3d_via_2d).

    Args:
      x: [B, D, H, W, Ci]; kernel: [kd, kh, kw, Ci, Co] (unflipped);
      strides/padding/output_padding: 3-tuples (depth first).
    """
    b, d, h, w, ci = x.shape
    kd = kernel.shape[0]
    sd, pd, opd = strides[0], padding[0], output_padding[0]
    d_out = (d - 1) * sd - 2 * pd + kd + opd
    k2 = jnp.flip(kernel, axis=(1, 2))
    dn = jax.lax.conv_dimension_numbers(
        (b * d, h, w, ci), kernel.shape[1:], ("NHWC", "HWIO", "NHWC"))
    pads2 = [(kernel.shape[i + 1] - 1 - padding[i + 1],
              kernel.shape[i + 1] - 1 - padding[i + 1] + output_padding[i + 1])
             for i in range(2)]
    out = None
    for t in range(kd):
        y = jax.lax.conv_general_dilated(
            x.reshape(b * d, h, w, ci), k2[t],
            window_strides=(1, 1), padding=pads2,
            lhs_dilation=strides[1:], rhs_dilation=(1, 1),
            dimension_numbers=dn)
        y = y.reshape((b, d) + y.shape[1:])
        if out is None:
            out = jnp.zeros((b, d_out) + y.shape[2:], y.dtype)
        # x[i] contributes kernel tap t to out[sd*i + t - pd]
        od0 = t - pd
        # find first i with 0 <= sd*i + od0 < d_out
        i_start = 0
        while sd * i_start + od0 < 0:
            i_start += 1
        i_end = d
        while i_end > i_start and sd * (i_end - 1) + od0 >= d_out:
            i_end -= 1
        if i_end <= i_start:
            continue
        sl_out = slice(sd * i_start + od0, sd * (i_end - 1) + od0 + 1, sd)
        out = out.at[:, sl_out].add(y[:, i_start:i_end])
    return out


class TorchConvTranspose(nn.Module):
    """Transposed convolution with torch ConvTranspose semantics.

    out_size = (in - 1) * stride - 2 * padding + kernel + output_padding.
    Implemented as conv_general_dilated(lhs_dilation=stride) with pad
    (k-1-p, k-1-p+op) and a spatially-flipped kernel — the literal definition
    of transposed convolution, bit-matching torch (verified in
    tests/test_nn_blocks.py).
    """
    features: int
    kernel_size: Sequence[int] | int = 3
    strides: Sequence[int] | int = 2
    padding: Sequence[int] | int = 1
    output_padding: Sequence[int] | int = 1
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, packed_depth: int | None = None,
                 packed_block: int | None = None):
        nd = 3 if (packed_depth is not None or packed_block is not None) \
            else x.ndim - 2
        k = _tup(self.kernel_size, nd)
        s = _tup(self.strides, nd)
        p = _tup(self.padding, nd)
        op = _tup(self.output_padding, nd)
        if packed_depth is not None:
            in_ch = x.shape[-1] // packed_depth
        elif packed_block is not None:
            in_ch = x.shape[-1] // packed_block
        else:
            in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), k + (in_ch, self.features),
            jnp.float32)
        if packed_block is not None:
            # block-depth-packed transposed conv3d (see TorchConv)
            pb = packed_block
            b, db, h, w, _ = x.shape
            w2, hl, hr, pout = _pack_kernel3d_block_transpose(
                kernel.astype(self.dtype), pb, s[0], p[0], op[0])
            w2 = jnp.flip(w2, axis=(0, 1))
            xh = _block_halo(x.astype(self.dtype), in_ch, hl, hr)
            pads = [(k[i] - 1 - p[i], k[i] - 1 - p[i] + op[i]) for i in (1, 2)]
            dn = jax.lax.conv_dimension_numbers(
                (b * db,) + xh.shape[2:], w2.shape, ("NHWC", "HWIO", "NHWC"))
            y = jax.lax.conv_general_dilated(
                xh.reshape((b * db,) + xh.shape[2:]), w2,
                window_strides=(1, 1), padding=pads, lhs_dilation=s[1:],
                dimension_numbers=dn)
            y = y.reshape((b, db) + y.shape[1:])
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros,
                                  (self.features,), jnp.float32)
                y = y + jnp.tile(bias.astype(self.dtype), pout)
            return y
        if packed_depth is not None:
            # depth-packed transposed conv3d (see TorchConv.packed_depth)
            D = packed_depth
            w2, dout = _pack_kernel3d_transpose(
                kernel.astype(self.dtype), D, s[0], p[0], op[0])
            w2 = jnp.flip(w2, axis=(0, 1))
            pads = [(k[i] - 1 - p[i], k[i] - 1 - p[i] + op[i])
                    for i in (1, 2)]
            dn = jax.lax.conv_dimension_numbers(
                x.shape, w2.shape, ("NHWC", "HWIO", "NHWC"))
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), w2, window_strides=(1, 1),
                padding=pads, lhs_dilation=s[1:], dimension_numbers=dn)
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros,
                                  (self.features,), jnp.float32)
                y = y + jnp.tile(bias.astype(self.dtype), dout)
            return y
        if nd == 3:
            y = _conv3d_transpose_via_2d(
                x.astype(self.dtype), kernel.astype(self.dtype), s, p, op)
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros,
                                  (self.features,), jnp.float32)
                y = y + bias.astype(self.dtype)
            return y
        kernel = jnp.flip(kernel, axis=tuple(range(nd)))
        pads = [(k[i] - 1 - p[i], k[i] - 1 - p[i] + op[i]) for i in range(nd)]
        spatial = "".join("DHW"[3 - nd + i] for i in range(nd))
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape,
            (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C"))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(1,) * nd, padding=pads,
            lhs_dilation=s, rhs_dilation=(1,) * nd, dimension_numbers=dn)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,),
                              jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class BatchNorm(nn.Module):
    """BatchNorm matching torch defaults (eps 1e-5, momentum 0.1)."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, packed_depth: int | None = None):
        bn = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, dtype=self.dtype, name="bn")
        if packed_depth is None:
            return bn(x)
        # depth-packed input [B, H, W, D*C] (see TorchConv): view as
        # [B, H, W, D, C] so statistics/params stay per-C — a free
        # minor-dim reshape, identical math and parameter shapes
        shp = x.shape
        xv = x.reshape(shp[:-1] + (packed_depth, shp[-1] // packed_depth))
        return bn(xv).reshape(shp)


class ConvBnReLU(nn.Module):
    """Conv -> BN -> ReLU. Parity: models/MVSNet/module.py:21-28 (2D) and
    :41-48 (3D); rank inferred from the input."""
    features: int
    kernel_size: Sequence[int] | int = 3
    strides: Sequence[int] | int = 1
    padding: Sequence[int] | int = 1
    relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False,
                 packed_depth: int | None = None,
                 packed_s2d: tuple | None = None,
                 packed_block: int | None = None):
        x = TorchConv(self.features, self.kernel_size, self.strides,
                      self.padding, dtype=self.dtype, name="conv")(
            x, packed_depth=packed_depth, packed_s2d=packed_s2d,
            packed_block=packed_block)
        if packed_depth is not None:
            packed_depth = _packed_out_depth(
                packed_depth, _tup(self.kernel_size, 3)[0],
                _tup(self.strides, 3)[0], _tup(self.padding, 3)[0])
        elif packed_s2d is not None:
            packed_depth = packed_s2d[1] ** 2  # BN groups = out subpixels
        elif packed_block is not None:
            packed_depth = packed_block // _tup(self.strides, 3)[0]
        x = BatchNorm(dtype=self.dtype, name="bn")(x, train,
                                                   packed_depth=packed_depth)
        return nn.relu(x) if self.relu else x


class ConvTransposeBnReLU(nn.Module):
    """ConvTranspose -> BN -> (ReLU). Parity: models/MVSNet/model.py:57-70."""
    features: int
    kernel_size: Sequence[int] | int = 3
    strides: Sequence[int] | int = 2
    padding: Sequence[int] | int = 1
    output_padding: Sequence[int] | int = 1
    relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False,
                 packed_depth: int | None = None,
                 packed_block: int | None = None):
        x = TorchConvTranspose(self.features, self.kernel_size, self.strides,
                               self.padding, self.output_padding,
                               dtype=self.dtype, name="deconv")(
            x, packed_depth=packed_depth, packed_block=packed_block)
        if packed_depth is not None:
            packed_depth = _packed_out_depth_transpose(
                packed_depth, _tup(self.kernel_size, 3)[0],
                _tup(self.strides, 3)[0], _tup(self.padding, 3)[0],
                _tup(self.output_padding, 3)[0])
        elif packed_block is not None:
            packed_depth = packed_block * _tup(self.strides, 3)[0]
        x = BatchNorm(dtype=self.dtype, name="bn")(x, train,
                                                   packed_depth=packed_depth)
        return nn.relu(x) if self.relu else x


class BasicBlock(nn.Module):
    """ResNet BasicBlock with optional 1x1 downsample projection.

    Parity: models/VisMVSNet/nn_utils.py:123-171 (conv-bn-relu, conv-bn,
    projection shortcut when stride != 1 or channels change, final relu).
    """
    features: int
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False,
                 packed_depth: int | None = None):
        residual = x
        in_ch = x.shape[-1] if packed_depth is None \
            else x.shape[-1] // packed_depth
        pd_out = packed_depth if packed_depth is None else \
            _packed_out_depth(packed_depth, 3, self.strides, 1)
        out = ConvBnReLU(self.features, 3, self.strides, 1, dtype=self.dtype,
                         name="conv1")(x, train, packed_depth=packed_depth)
        out = ConvBnReLU(self.features, 3, 1, 1, relu=False, dtype=self.dtype,
                         name="conv2")(out, train, packed_depth=pd_out)
        if self.strides != 1 or in_ch != self.features:
            residual = TorchConv(self.features, 1, self.strides, 0,
                                 dtype=self.dtype, name="downsample_conv")(
                x, packed_depth=packed_depth)
            residual = BatchNorm(dtype=self.dtype, name="downsample_bn")(
                residual, train, packed_depth=pd_out)
        return nn.relu(out + residual)


class ResLayer(nn.Module):
    """Sequence of BasicBlocks (first may be strided).
    Parity: models/VisMVSNet/nn_utils.py:175-191 (`_make_layer`)."""
    features: int
    blocks: int
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False,
                 packed_depth: int | None = None):
        x = BasicBlock(self.features, self.strides, dtype=self.dtype,
                       name="block0")(x, train, packed_depth=packed_depth)
        if packed_depth is not None:
            packed_depth = _packed_out_depth(packed_depth, 3, self.strides, 1)
        for i in range(1, self.blocks):
            x = BasicBlock(self.features, 1, dtype=self.dtype,
                           name=f"block{i}")(x, train,
                                             packed_depth=packed_depth)
        return x


class UNet(nn.Module):
    """Configurable UNet over 2D or 3D (rank inferred from input).

    Parity: models/VisMVSNet/nn_utils.py:194-278. Encoder: ResLayers with
    stride 2 after the first; decoder: deconv + concat-skip + 3x3 conv
    (+ optional ResLayer); `multi_scale` returns the last k decoder outputs
    (coarsest..finest), mirroring `forward(..., multi_scale=k)`.
    """
    enc_blocks_per_stage: int
    dec_blocks_per_stage: int
    filters: Sequence[int]
    bottom_filters: Sequence[int] = ()
    head_filters: Sequence[int] = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, multi_scale: int = 1,
                 packed_depth: int | None = None):
        pd = packed_depth
        idx = 0
        for f in self.bottom_filters:
            s = 1 if idx == 0 else 2
            x = ResLayer(f, self.enc_blocks_per_stage, s,
                         dtype=self.dtype, name=f"bottom{idx}")(
                x, train, packed_depth=pd)
            if pd is not None:
                pd = _packed_out_depth(pd, 3, s, 1)
            idx += 1
        enc_out = []
        enc_pd = []
        for f in self.filters:
            s = 1 if idx == 0 else 2
            x = ResLayer(f, self.enc_blocks_per_stage, s,
                         dtype=self.dtype, name=f"enc{idx}")(
                x, train, packed_depth=pd)
            if pd is not None:
                pd = _packed_out_depth(pd, 3, s, 1)
            enc_out.append(x)
            enc_pd.append(pd)
            idx += 1
        dec_out = [x]
        for i, f in enumerate(list(self.filters[-2::-1])):
            x = TorchConvTranspose(f, 3, 2, 1, 1, dtype=self.dtype,
                                   name=f"dec{idx}_deconv")(
                x, packed_depth=pd)
            if pd is not None:
                pd = _packed_out_depth_transpose(pd, 3, 2, 1, 1)
                # packed concat must interleave per depth slab: channel
                # index is (d, c)-major, so concat on the C axis of the
                # [.., D, C] view (a free minor-dim reshape)
                skip = enc_out[-2 - i]
                a = x.reshape(x.shape[:-1] + (pd, x.shape[-1] // pd))
                b = skip.reshape(skip.shape[:-1]
                                 + (pd, skip.shape[-1] // pd))
                x = jnp.concatenate([a, b], axis=-1).reshape(
                    x.shape[:-1] + (-1,))
            else:
                x = jnp.concatenate([x, enc_out[-2 - i]], axis=-1)
            x = TorchConv(f, 3, 1, 1, dtype=self.dtype,
                          name=f"dec{idx}_conv")(x, packed_depth=pd)
            if self.dec_blocks_per_stage > 0:
                x = ResLayer(f, self.dec_blocks_per_stage, 1,
                             dtype=self.dtype, name=f"dec{idx}_res")(
                    x, train, packed_depth=pd)
            dec_out.append(x)
            idx += 1
        for f in self.head_filters:
            x = TorchConvTranspose(f, 3, 2, 1, 1, dtype=self.dtype,
                                   name=f"head{idx}_deconv")(x)
            if self.dec_blocks_per_stage > 0:
                x = ResLayer(f, self.dec_blocks_per_stage, 1, dtype=self.dtype,
                             name=f"head{idx}_res")(x, train)
            dec_out.append(x)
            idx += 1
        if multi_scale == 1:
            return x
        return dec_out[-multi_scale:]
