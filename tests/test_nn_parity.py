"""Parity tests: flax modules vs torch oracles through the .pth converter.

Each test builds a torch module with the reference's exact Sequential
layout (so state_dict keys match published checkpoints), randomizes its
weights, converts them with `compat.torch_import`, and compares forward
outputs. This validates the modules AND the checkpoint converter at once.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F
import jax.numpy as jnp

from wacv23_tsnet_tpu import compat
from wacv23_tsnet_tpu.nn import (Decoder, Encoder, FuseNet,
                                 PatchDiscriminator)

torch.manual_seed(0)
RNG = np.random.default_rng(1)


class Wrap(tnn.Module):
    """Attach named children so state_dict keys mirror the reference."""

    def __init__(self, **mods):
        super().__init__()
        for k, v in mods.items():
            setattr(self, k, v)


class TResBlock(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv_block = tnn.Sequential(
            tnn.ReflectionPad2d(1), tnn.Conv2d(dim, dim, 3),
            tnn.InstanceNorm2d(dim), tnn.ReLU(True),
            tnn.ReflectionPad2d(1), tnn.Conv2d(dim, dim, 3),
            tnn.InstanceNorm2d(dim))

    def forward(self, x):
        return x + self.conv_block(x)


def t_encoder(in_ch, ngf, nd, nb):
    layers = [tnn.ReflectionPad2d(3), tnn.Conv2d(in_ch, ngf, 7),
              tnn.InstanceNorm2d(ngf), tnn.ReLU(True)]
    for i in range(nd):
        m = 2 ** i
        layers += [tnn.Conv2d(ngf * m, ngf * m * 2, 3, 2, 1),
                   tnn.InstanceNorm2d(ngf * m * 2), tnn.ReLU(True)]
    for _ in range(nb):
        layers.append(TResBlock(ngf * 2 ** nd))
    return Wrap(model=tnn.Sequential(*layers))


def t_decoder(out_ch, ngf, nd, nb):
    mods = {"map_conv": tnn.Conv2d(ngf * 2 ** nd * 2, ngf * 2 ** nd, 1)}
    for j in range(nb):
        mods[f"model{j}"] = tnn.Sequential(TResBlock(ngf * 2 ** nd))
    for i in range(nd):
        m = 2 ** (nd - i)
        mods[f"model{nb + i}"] = tnn.Sequential(
            tnn.Upsample(scale_factor=2, mode="bilinear", align_corners=False),
            tnn.ReflectionPad2d(1), tnn.Conv2d(ngf * m, ngf * m // 2, 3),
            tnn.InstanceNorm2d(ngf * m // 2), tnn.ReLU(True))
    mods[f"model{nb + nd}"] = tnn.Sequential(
        tnn.ReflectionPad2d(3), tnn.Conv2d(ngf, out_ch, 7), tnn.Tanh())
    return Wrap(**mods)


def to_torch(x):
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def coord_cat(x_nhwc):
    b, h, w, _ = x_nhwc.shape
    xx = (np.arange(w, dtype=np.float32) / (w - 1) * 2 - 1)[None, :].repeat(h, 0)
    yy = (np.arange(h, dtype=np.float32) / (h - 1) * 2 - 1)[:, None].repeat(w, 1)
    rr = np.sqrt(xx ** 2 + yy ** 2)
    extra = np.stack([xx, yy, rr], -1)[None].repeat(b, 0)
    return np.concatenate([x_nhwc, extra], -1)


@pytest.mark.parametrize("normalization", [False, True])
def test_encoder_parity(normalization):
    in_ch, ngf, nd, nb = 5, 8, 2, 2
    oracle = t_encoder(in_ch + 3, ngf, nd, nb).eval()
    x = RNG.standard_normal((2, 32, 32, in_ch), dtype=np.float32)

    with torch.no_grad():
        want = oracle.model(to_torch(coord_cat(x)))
        if normalization:
            want = F.normalize(want, p=2, dim=1)

    params = compat.encoder_params_from_torch(oracle.state_dict(), nd, nb)
    enc = Encoder(ngf=ngf, n_downsampling=nd, n_blocks=nb, addcoords=True,
                  normalization=normalization)
    got = enc.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), nhwc(want), atol=2e-4)


def test_decoder_parity():
    ngf, nd, nb = 8, 2, 1
    feat = ngf * 2 ** nd
    oracle = t_decoder(3, ngf, nd, nb).eval()
    prop = RNG.standard_normal((2, 8, 8, feat), dtype=np.float32)
    syn = RNG.standard_normal((2, 8, 8, feat), dtype=np.float32)

    with torch.no_grad():
        res = oracle.map_conv(torch.cat([to_torch(prop), to_torch(syn)], 1))
        for n in range(nb + nd):
            res = getattr(oracle, f"model{n}")(res)
        want_img = getattr(oracle, f"model{nb + nd}")(res)

    params = compat.decoder_params_from_torch(oracle.state_dict(), nd, nb)
    dec = Decoder(output_nc=3, ngf=ngf, n_downsampling=nd, n_blocks=nb)
    got_img, got_fea = dec.apply({"params": params}, jnp.asarray(prop),
                                 jnp.asarray(syn))
    np.testing.assert_allclose(np.asarray(got_fea), nhwc(res), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_img), nhwc(want_img), atol=2e-4)


def test_fusenet_parity():
    width = 32
    oracle = Wrap(model=tnn.Sequential(TResBlock(width)),
                  conv=tnn.Conv2d(width, width // 2, 1)).eval()
    a = RNG.standard_normal((2, 8, 8, width // 2), dtype=np.float32)
    b = RNG.standard_normal((2, 8, 8, width // 2), dtype=np.float32)
    with torch.no_grad():
        want = oracle.conv(oracle.model(torch.cat([to_torch(a), to_torch(b)], 1)))
    params = compat.fusenet_params_from_torch(oracle.state_dict())
    net = FuseNet(ngf=width)
    got = net.apply({"params": params}, jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(got), nhwc(want), atol=2e-4)


def test_discriminator_parity():
    in_ch, ndf, nl = 5, 8, 3
    mods = {"model0": tnn.Sequential(tnn.Conv2d(in_ch, ndf, 4, 2, 1),
                                     tnn.LeakyReLU(0.2, True))}
    nf = 1
    for n in range(1, nl):
        nf_prev, nf = nf, min(2 ** n, 8)
        mods[f"model{n}"] = tnn.Sequential(
            tnn.Conv2d(ndf * nf_prev, ndf * nf, 4, 2, 1),
            tnn.InstanceNorm2d(ndf * nf), tnn.LeakyReLU(0.2, True))
    nf_prev, nf = nf, min(2 ** nl, 8)
    mods[f"model{nl}"] = tnn.Sequential(
        tnn.Conv2d(ndf * nf_prev, ndf * nf, 4, 1, 1),
        tnn.InstanceNorm2d(ndf * nf), tnn.LeakyReLU(0.2, True))
    mods[f"model{nl + 1}"] = tnn.Sequential(tnn.Conv2d(ndf * nf, 1, 4, 1, 1))
    oracle = Wrap(**mods).eval()

    x = RNG.standard_normal((2, 64, 64, in_ch), dtype=np.float32)
    with torch.no_grad():
        res = to_torch(x)
        wants = []
        for n in range(nl + 2):
            res = getattr(oracle, f"model{n}")(res)
            wants.append(res)

    params = compat.discriminator_params_from_torch(oracle.state_dict(), nl)
    net = PatchDiscriminator(ndf=ndf, n_layers=nl)
    gots = net.apply({"params": params}, jnp.asarray(x))
    assert len(gots) == len(wants)
    for got, want in zip(gots, wants):
        np.testing.assert_allclose(np.asarray(got), nhwc(want), atol=2e-4)
